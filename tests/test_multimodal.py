"""Multimodal plumbing: opaque binary columns + typed metadata through
Arrow-batched pandas UDFs. Decode is stubbed (no media libs in this
environment) — these tests pin the REAL parts: span extraction, schema,
batch shape, 1→N fan-out, and injection points for real decoders."""

import pytest

from pyspark.sql import functions as F

from naruhodo_spark import synth
from naruhodo_spark.ops import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    return MM.media_spans(synth.synth_documents(spark, 120)).localCheckpoint()


def test_media_spans_extraction(spark, media):
    rows = media.collect()
    assert len(rows) > 0
    assert all(r["media_type"] == "img" for r in rows)
    assert all(r["media_ref"].startswith("img://") for r in rows)
    assert all(r["payload"] is None for r in rows)  # bytes live behind the ref


def test_featurize_deterministic(spark, media):
    a = {(r["media_ref"], tuple(r["feature"])) for r in MM.featurize_media(media).collect()}
    b = {(r["media_ref"], tuple(r["feature"])) for r in MM.featurize_media(media).collect()}
    assert a == b and len(a) == media.count()


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        MM.decode_media(b"\x00", "img")


def test_resize_stub_payloads(spark, media):
    out = MM.resize_images(media, width=32, height=16).collect()
    assert len(out) == media.count()
    assert all(r["width"] == 32 and r["height"] == 16 for r in out)
    assert all(len(r["payload"]) == 16 for r in out)  # md5 stand-in bytes
    # deterministic across runs
    again = MM.resize_images(media, width=32, height=16).collect()
    assert {(r["media_ref"], bytes(r["payload"])) for r in out} == {
        (r["media_ref"], bytes(r["payload"])) for r in again
    }
    # injected resizer is used verbatim
    injected = MM.resize_images(
        media.limit(3), width=8, height=8, resizer=lambda p, w, h: b"x" * (w * h)
    ).collect()
    assert all(bytes(r["payload"]) == b"x" * 64 for r in injected)


def test_sample_frames_fanout(spark, media):
    vids = media.withColumn("media_type", F.lit("vid"))
    n_vids = vids.count()
    frames = MM.sample_frames(vids, n_frames=4, frame_gap_ms=500)
    rows = frames.collect()
    assert len(rows) == 4 * n_vids  # 1→N UDTF fan-out
    one = sorted(
        (r["frame_idx"], r["ts_ms"], r["frame_ref"])
        for r in rows
        if r["media_ref"] == rows[0]["media_ref"]
    )
    assert [f[0] for f in one] == [0, 1, 2, 3]
    assert [f[1] for f in one] == [0, 500, 1000, 1500]
    assert all(f[2].endswith(f"#f{f[0]}") for f in one)
    # non-video rows never reach the sampler
    assert MM.sample_frames(media).count() == 0


# ---------------------------------------------------------------------
# caption_pairs: CLIP-style (media_ref, adjacent raw text) pairs
# ---------------------------------------------------------------------

def _caption_mirror(rows, sides="both", max_chars=None):
    """Exact python mirror over collected (doc_id, spans) rows."""
    out = []
    for doc_id, spans in rows:
        sp = sorted(spans, key=lambda s: s["offset"])
        for i, s in enumerate(sp):
            if s["kind"] != "media":
                continue
            before = next(
                (p["text"] for p in reversed(sp[:i]) if p["kind"] == "text"),
                None,
            )
            after = next(
                (p["text"] for p in sp[i + 1:] if p["kind"] == "text"), None
            )
            for side, cap in (("before", before), ("after", after)):
                if sides not in (side, "both"):
                    continue
                if cap:
                    if max_chars is not None:
                        cap = cap[:max_chars]
                    out.append((doc_id, s["media_ref"], cap, side))
    return sorted(out)


def test_caption_pairs_mirror(spark):
    from naruhodo_spark import synth
    from naruhodo_spark.ops.multimodal import caption_pairs

    docs = synth.synth_documents(spark, 120)
    got = sorted(
        tuple(r) for r in caption_pairs(docs).collect()
    )
    rows = [(r["doc_id"], [s.asDict() for s in r["spans"]])
            for r in docs.collect()]
    assert got == _caption_mirror(rows)
    assert len(got) > 0


def test_caption_pairs_sides_and_truncation(spark):
    from naruhodo_spark import synth
    from naruhodo_spark.ops.multimodal import caption_pairs

    docs = synth.synth_documents(spark, 60)
    rows = [(r["doc_id"], [s.asDict() for s in r["spans"]])
            for r in docs.collect()]
    for sides in ("before", "after"):
        got = sorted(tuple(r) for r in caption_pairs(docs, sides=sides).collect())
        assert got == _caption_mirror(rows, sides=sides)
        assert all(t[3] == sides for t in got)
    trunc = sorted(
        tuple(r) for r in caption_pairs(docs, max_chars=12).collect()
    )
    assert trunc == _caption_mirror(rows, max_chars=12)
    assert all(len(t[2]) <= 12 for t in trunc)


def test_caption_pairs_media_first_and_last(spark):
    """A media span with no text before (or after) yields only the
    other side — no nulls, no ANSI index errors."""
    from naruhodo_spark.ops.multimodal import caption_pairs
    from naruhodo_spark import schemas as S

    docs = spark.createDataFrame(
        [
            ("d1", [
                {"kind": "media", "text": "", "media_ref": "img://a", "offset": 0},
                {"kind": "text", "text": "tail caption.", "media_ref": "", "offset": 1},
            ]),
            ("d2", [
                {"kind": "text", "text": "head caption.", "media_ref": "", "offset": 0},
                {"kind": "media", "text": "", "media_ref": "img://b", "offset": 14},
            ]),
            ("d3", [
                {"kind": "media", "text": "", "media_ref": "img://c", "offset": 0},
            ]),
        ],
        S.DOCUMENTS_SPANS,
    )
    got = sorted(tuple(r) for r in caption_pairs(docs).collect())
    assert got == [
        ("d1", "img://a", "tail caption.", "after"),
        ("d2", "img://b", "head caption.", "before"),
    ]


def test_caption_pairs_no_python_no_shuffle(spark):
    from naruhodo_spark import synth
    from naruhodo_spark.ops.multimodal import caption_pairs

    docs = synth.synth_documents(spark, 30)
    plan = caption_pairs(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan          # zero shuffle
    assert "PythonUDF" not in plan         # zero per-row python
