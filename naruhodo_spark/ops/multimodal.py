"""Multimodal-column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs.

The decode step is STUBBED (no image/audio libraries exist in this
container — import-gated per the build contract): `decode_media` raises
NotImplementedError unless a decoder is injected, and
`fake_media_features` is the deterministic stand-in that keeps the whole
Spark-side pipeline (schema, partitioning, UDF signature, Arrow batch
shape) real and testable.

At scale: media bytes live in object storage referenced by `media_ref`;
fetching happens inside mapInPandas per batch (executor-side, no driver
I/O), so the operator parallelizes with the document partitioning.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("span_idx", T.IntegerType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # img|aud|vid
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
    ]
)

MEDIA_FEATURES = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("span_idx", T.IntegerType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
        T.StructField("feat_norm", T.FloatType(), False),
    ]
)


def media_spans(docs_spans: DataFrame) -> DataFrame:
    """Extract media spans into the typed metadata table. The payload is
    null here (bytes live behind media_ref); a fetch stage would fill it
    batch-wise inside the featurizer."""
    return (
        docs_spans.select(
            "doc_id", F.posexplode("spans").alias("span_idx", "span")
        )
        .where(F.col("span.kind") == "media")
        .select(
            "doc_id",
            "span_idx",
            F.col("span.media_ref").alias("media_ref"),
            F.element_at(F.split(F.col("span.media_ref"), "://"), 1).alias(
                "media_type"
            ),
            F.lit(None).cast("binary").alias("payload"),
        )
    )


def decode_media(payload: bytes, media_type: str):  # pragma: no cover - stub
    """REAL decode (PIL/librosa/ffmpeg) — unavailable in this container."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "environment; inject a decoder via featurize_media(decoder=...)"
    )


def _fake_feature(ref: str, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in feature: bytes of md5(ref) scaled to [0,1)."""
    h = hashlib.md5(ref.encode()).digest()
    return np.frombuffer(h[:dim], dtype=np.uint8).astype(np.float32) / 255.0


def featurize_media(
    media: DataFrame,
    dim: int = 8,
    decoder: Callable | None = None,
) -> DataFrame:
    """mapInPandas featurizer. With a real `decoder` it would decode the
    payload and run the model per Arrow batch; without one it emits the
    deterministic fake feature so schema/partitioning/batching are
    exercised end-to-end."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for ref, payload, mtype in zip(
                pdf["media_ref"], pdf["payload"], pdf["media_type"]
            ):
                if decoder is not None:
                    feats.append(decoder(payload, mtype))
                else:
                    feats.append(_fake_feature(str(ref), dim))
            out = pdf[["doc_id", "span_idx", "media_ref", "media_type"]].copy()
            out["feature"] = [f.tolist() for f in feats]
            out["feat_norm"] = [float(np.linalg.norm(f)) for f in feats]
            yield out

    return media.mapInPandas(fn, schema=MEDIA_FEATURES)
