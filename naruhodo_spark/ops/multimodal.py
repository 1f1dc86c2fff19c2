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
    ordered = F.array_sort(
        F.transform(
            F.col("spans"),
            lambda sp: F.struct(
                sp["offset"].alias("offset"),
                sp["kind"].alias("kind"),
                sp["media_ref"].alias("media_ref"),
            ),
        )
    )
    # span_idx counts in OFFSET order — the repo-wide document-order
    # convention (normalize.split_sentences, media.media_adjacency), so
    # media rows key consistently with the NLP side's span ordinals even
    # when a writer stored the array out of order
    return (
        docs_spans.select(
            "doc_id", F.posexplode(ordered).alias("span_idx", "span")
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
    """Deterministic stand-in feature: md5(ref) bytes scaled to [0,1).
    One digest is 16 bytes; larger dims chain counter-suffixed digests
    so the output ALWAYS has exactly ``dim`` values (h[:dim] silently
    truncated dims > 16)."""
    buf = b""
    i = 0
    while len(buf) < dim:
        suffix = b"" if i == 0 else f"#{i}".encode()
        buf += hashlib.md5(ref.encode() + suffix).digest()
        i += 1
    return np.frombuffer(buf[:dim], dtype=np.uint8).astype(np.float32) / 255.0


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


RESIZED = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("span_idx", T.IntegerType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def resize_images(
    media: DataFrame,
    width: int = 64,
    height: int = 64,
    resizer: Callable | None = None,
) -> DataFrame:
    """Image resize as an Arrow-batched mapInPandas stage. With a real
    `resizer` (PIL — absent here) it re-encodes each payload; without
    one, the deterministic stand-in payload is md5(ref|w|h) bytes so the
    binary-out schema, batch shape, and downstream partitioning are
    exercised for real. Only img-typed rows are resized; others pass
    through the filter upstream."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["doc_id", "span_idx", "media_ref"]].copy()
            out["width"] = np.int32(width)
            out["height"] = np.int32(height)
            if resizer is not None:
                out["payload"] = [
                    resizer(p, width, height) for p in pdf["payload"]
                ]
            else:
                out["payload"] = [
                    hashlib.md5(f"{r}|{width}|{height}".encode()).digest()
                    for r in pdf["media_ref"]
                ]
            yield out

    return media.where(F.col("media_type") == "img").mapInPandas(
        fn, schema=RESIZED
    )


FRAMES = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("span_idx", T.IntegerType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.IntegerType(), False),
        T.StructField("frame_ref", T.StringType(), False),
    ]
)


def sample_frames(
    media: DataFrame,
    n_frames: int = 4,
    frame_gap_ms: int = 1000,
    prober: Callable | None = None,
) -> DataFrame:
    """Video frame sampling as a 1→N UDTF (mapInPandas emitting several
    rows per input video — the batch shape a real ffmpeg sampler has).
    A real `prober` would return per-video frame payloads; the stand-in
    emits deterministic frame refs at a fixed cadence so the row fan-out,
    schema, and per-document partitioning are real and tested."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, span_idx, ref, payload in zip(
                pdf["doc_id"], pdf["span_idx"], pdf["media_ref"], pdf["payload"]
            ):
                frames = (
                    prober(payload, n_frames)
                    if prober is not None
                    else [
                        (i, i * frame_gap_ms, f"{ref}#f{i}")
                        for i in range(n_frames)
                    ]
                )
                rows.extend(
                    (doc_id, int(span_idx), ref, int(fi), int(ts), fref)
                    for fi, ts, fref in frames
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "span_idx", "media_ref",
                    "frame_idx", "ts_ms", "frame_ref",
                ],
            )

    return media.where(F.col("media_type") == "vid").mapInPandas(
        fn, schema=FRAMES
    )


PHASHED = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("span_idx", T.IntegerType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),  # 64-bit signature
    ]
)


def phash_media(media: DataFrame, hasher: Callable | None = None) -> DataFrame:
    """Perceptual 64-bit hash per media span, Arrow-batched mapInPandas.

    A real `hasher(payload, media_ref, media_type) -> int64` computes
    dHash/pHash from decoded pixels (image libs absent here — same
    injectable-stub contract as featurize_media); the stand-in hashes
    the ref (md5 first 8 bytes, signed big-endian), which keeps the
    schema, batching, and signedness handling real: identical refs
    collide at Hamming 0, unrelated refs land ~32 bits apart.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if hasher is not None:
                vals = [
                    int(hasher(p, r, t))
                    for p, r, t in zip(
                        pdf["payload"], pdf["media_ref"], pdf["media_type"]
                    )
                ]
            else:
                vals = [
                    int.from_bytes(
                        hashlib.md5(f"phash|{r}".encode()).digest()[:8],
                        "big",
                        signed=True,
                    )
                    for r in pdf["media_ref"]
                ]
            out = pdf[["doc_id", "span_idx", "media_ref", "media_type"]].copy()
            out["phash"] = pd.Series(vals, dtype="int64", index=pdf.index)
            yield out

    return media.mapInPandas(fn, schema=PHASHED)


def media_near_dups(
    hashed: DataFrame, max_hamming: int = 4, bucket_cap: int = 1_000
) -> DataFrame:
    """(ref_a, ref_b, hamming) near-duplicate media assets — the image
    analog of text simhash dedup (re-encoded/resized copies of one
    image land a few bits apart under dHash/pHash). One hash per
    DISTINCT media_ref (an asset reused across documents is one node,
    its hash is ref-functional), then the shared banded Hamming join
    (ops/dedup.hamming_near_dups): equi-join candidates, popcount
    filter, hot-bucket skew guard — nothing all-pairs at 10^12 docs.
    """
    from naruhodo_spark.ops.dedup import hamming_near_dups

    sigs = hashed.select("media_ref", "phash").distinct()
    return hamming_near_dups(
        sigs, "media_ref", "phash", max_hamming, bucket_cap=bucket_cap
    ).select(
        F.col("id_a").alias("ref_a"),
        F.col("id_b").alias("ref_b"),
        "hamming",
    )


def caption_pairs(
    docs_spans: DataFrame,
    sides: str = "both",
    max_chars: "int | None" = None,
) -> DataFrame:
    """(doc_id, media_ref, caption, side) — one row per (media span,
    adjacent text span) with the RAW text: the contrastive
    image/text training-pair shape (CLIP-style weak supervision from
    interleaved documents; media_adjacency keeps only entity mentions,
    this keeps the caption surface itself).

    ``sides``: 'before', 'after', or 'both' — which neighboring text
    span(s) to pair. ``max_chars`` truncates captions JVM-side so the
    downstream tokenizer batch is bounded.

    Scale shape: all positional arithmetic runs INSIDE each row's spans
    array via higher-order functions (transform with index + slice /
    filter prefix scans) — zero shuffle, zero Python, no window. The
    output is document-partitioned like its input; dedup/quota/tokenize
    compose downstream (ops/dedup, ops/textstats).
    """
    if sides not in ("before", "after", "both"):
        raise ValueError(f"sides must be before|after|both, got {sides!r}")
    ordered = F.array_sort(
        F.transform(
            F.col("spans"),
            lambda s: F.struct(
                s["offset"].alias("offset"),
                s["kind"].alias("kind"),
                s["media_ref"].alias("media_ref"),
                s["text"].alias("text"),
            ),
        )
    )
    # per media element: the nearest text span strictly before / after
    # in offset order (element_at(-1) of the preceding text slice;
    # element_at(1) of the following one)
    ann = F.transform(
        F.col("_ord"),
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["media_ref"].alias("media_ref"),
            # try_element_at: ANSI mode is on — out-of-bounds must be
            # null (no preceding/following text span), not an error
            F.try_element_at(
                F.filter(
                    F.slice(F.col("_ord"), 1, i),
                    lambda p: p["kind"] == F.lit("text"),
                ),
                F.lit(-1),
            )["text"].alias("before"),
            F.try_element_at(
                F.filter(
                    # slice beyond array end is legal: returns empty
                    F.slice(F.col("_ord"), i + 2, F.size(F.col("_ord"))),
                    lambda p: p["kind"] == F.lit("text"),
                ),
                F.lit(1),
            )["text"].alias("after"),
        ),
    )
    media = (
        docs_spans.withColumn("_ord", ordered)
        .select("doc_id", F.explode(ann).alias("m"))
        .where(F.col("m.kind") == "media")
    )
    outs = []
    for side in ("before", "after"):
        if sides in (side, "both"):
            cap = F.col(f"m.{side}")
            if max_chars is not None:
                cap = F.substring(cap, 1, max_chars)
            outs.append(
                media.where(
                    F.col(f"m.{side}").isNotNull()
                    & (F.col(f"m.{side}") != "")
                ).select(
                    "doc_id",
                    F.col("m.media_ref").alias("media_ref"),
                    cap.alias("caption"),
                    F.lit(side).alias("side"),
                )
            )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
