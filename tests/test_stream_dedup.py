"""Streaming ingest with the incremental near-dup gate (ops/incdedup.py
wired into streaming.incremental_ingest via dedup_threshold).

The production composition at corpus scale: each micro-batch is checked
against the persisted MinHash signature index BEFORE extraction — flagged
docs contribute no triples but are marked seen; survivors grow the index.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from naruhodo_spark import storage, synth
from naruhodo_spark.streaming import incremental_ingest


@pytest.fixture()
def tmp_out(tmp_path):
    return str(tmp_path)


def test_cross_batch_near_dup_is_gated(spark, tmp_out):
    docs = synth.synth_documents(spark, 10).persist()
    in_dir, out = f"{tmp_out}/din", f"{tmp_out}/dout"
    docs.coalesce(4).write.mode("append").parquet(in_dir)
    incremental_ingest(
        spark, in_dir, out, checkpoint=f"{tmp_out}/dck", dedup_threshold=0.9
    )
    assert storage.table_exists(spark, "dedup_sigs", out)
    sigs_b1 = {
        r["doc_id"]
        for r in storage.read_table(spark, "dedup_sigs", out).collect()
    }
    assert "doc-000003" in sigs_b1  # survivors' signatures persisted

    # batch 2: an exact copy of a committed doc under a NEW id, plus one
    # genuinely new doc
    dup = docs.where("doc_id = 'doc-000003'").withColumn(
        "doc_id", F.lit("dup-000003")
    )
    fresh = synth.synth_documents(spark, 11).where("doc_id = 'doc-000010'")
    dup.unionByName(fresh).coalesce(1).write.mode("append").parquet(in_dir)
    incremental_ingest(
        spark, in_dir, out, checkpoint=f"{tmp_out}/dck", dedup_threshold=0.9
    )

    flags = storage.read_table(spark, "dup_flags", out)
    got = {(r["new_doc_id"], r["dup_of"]) for r in flags.collect()}
    assert ("dup-000003", "doc-000003") in got
    # identical text → the estimator is exact
    assert (
        flags.where("new_doc_id = 'dup-000003'").first()["est_jaccard"] == 1.0
    )

    raw_ids = {
        r["doc_id"]
        for r in storage.read_table(spark, "triples_raw", out)
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert "dup-000003" not in raw_ids  # gated before extraction
    assert "doc-000010" in raw_ids  # the fresh doc went through

    sigs = {
        r["doc_id"]
        for r in storage.read_table(spark, "dedup_sigs", out).collect()
    }
    assert "dup-000003" not in sigs  # rejected docs never grow the index
    assert "doc-000010" in sigs

    seen = {
        r["doc_id"]
        for r in storage.read_table(spark, "doc_ids_seen", out).collect()
    }
    # the dup is processed-and-rejected, not pending: it is marked seen,
    # so a re-delivery never re-runs the gate on it
    assert "dup-000003" in seen and "doc-000010" in seen

    # idempotency: draining again with nothing new changes nothing
    before = sorted(
        map(
            tuple,
            storage.read_table(spark, "triples_raw", out)
            .drop("epoch")
            .collect(),
        )
    )
    incremental_ingest(
        spark, in_dir, out, checkpoint=f"{tmp_out}/dck", dedup_threshold=0.9
    )
    after = sorted(
        map(
            tuple,
            storage.read_table(spark, "triples_raw", out)
            .drop("epoch")
            .collect(),
        )
    )
    assert before == after
    docs.unpersist()


def test_gate_off_is_unchanged_and_writes_no_dedup_tables(spark, tmp_out):
    docs = synth.synth_documents(spark, 6)
    in_dir, out = f"{tmp_out}/nin", f"{tmp_out}/nout"
    docs.coalesce(2).write.mode("append").parquet(in_dir)
    incremental_ingest(spark, in_dir, out, checkpoint=f"{tmp_out}/nck")
    assert not storage.table_exists(spark, "dedup_sigs", out)
    assert not storage.table_exists(spark, "dup_flags", out)
    assert storage.read_table(spark, "triples_raw", out).count() > 0


def test_gated_stream_matches_batch_over_survivors(spark, tmp_out):
    """Final graph from a gated stream == batch build_kg over exactly the
    surviving docs (the gate changes WHICH docs flow, never the
    extraction semantics)."""
    from naruhodo_spark.pipeline import build_kg

    docs = synth.synth_documents(spark, 8).persist()
    dup = docs.where("doc_id = 'doc-000001'").withColumn(
        "doc_id", F.lit("dup-000001")
    )
    in_dir, out = f"{tmp_out}/ein", f"{tmp_out}/eout"
    docs.coalesce(2).write.mode("append").parquet(in_dir)
    incremental_ingest(
        spark, in_dir, out, checkpoint=f"{tmp_out}/eck", dedup_threshold=0.9
    )
    dup.coalesce(1).write.mode("append").parquet(in_dir)
    incremental_ingest(
        spark, in_dir, out, checkpoint=f"{tmp_out}/eck", dedup_threshold=0.9
    )
    flagged = {
        r["new_doc_id"]
        for r in storage.read_table(spark, "dup_flags", out).collect()
    }
    assert "dup-000001" in flagged
    surv = docs  # every original doc survived; only the dup was gated
    want = build_kg(surv)["ksg_edges"]
    got = storage.read_table(spark, "ksg_edges", out)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    docs.unpersist()
