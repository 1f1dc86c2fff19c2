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
