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


def test_composed_crash_dedup_and_sketches_converge(
    spark, tmp_out, monkeypatch
):
    """VERDICT r03 next-round #7 — the composed kill drill: a crash
    DURING a dedup-gated epoch (after its triples_raw + sketch-panel +
    dup_flags writes, before its dedup_sigs write and seen-commit) must
    leave a store that the checkpoint-resume repairs to EXACTLY the
    crash-free outcome across all epoch tables (triples_raw, dup_flags,
    dedup_sigs, sketch_panel) and the as-of distinct estimates."""
    import naruhodo_spark.streaming as STR
    from naruhodo_spark.streaming import distinct_stats_asof

    docs = synth.synth_documents(spark, 10).persist()
    # per-store input dirs with IDENTICAL file sequences — a shared dir
    # would let the second store drain both batches in one epoch
    in_clean, in_crash = f"{tmp_out}/kin1", f"{tmp_out}/kin2"
    for d in (in_clean, in_crash):
        docs.coalesce(4).write.mode("append").parquet(d)
    # epoch 2 payload: one near-dup of a committed doc + one fresh doc
    dup = docs.where("doc_id = 'doc-000003'").withColumn(
        "doc_id", F.lit("dup-000003")
    )
    fresh = synth.synth_documents(spark, 11).where("doc_id = 'doc-000010'")
    batch2 = dup.unionByName(fresh).coalesce(1)

    def run(in_dir, out, ck):
        incremental_ingest(
            spark, in_dir, out, checkpoint=ck, dedup_threshold=0.9
        )

    # ---- clean reference store: two drains, no crash
    clean = f"{tmp_out}/kclean"
    run(in_clean, clean, f"{tmp_out}/kckc")
    batch2.write.mode("append").parquet(in_clean)
    run(in_clean, clean, f"{tmp_out}/kckc")

    def snap(out):
        t = {}
        for name in ("triples_raw", "dup_flags", "dedup_sigs",
                     "doc_ids_seen", "ksg_edges"):
            t[name] = sorted(
                map(tuple, storage.read_table(spark, name, out).collect())
            )
        panel = storage.read_table(spark, "sketch_panel", out)
        t["panel_epochs"] = sorted(
            map(tuple, panel.select("epoch", "metric").collect())
        )
        max_ep = panel.agg(F.max("epoch")).head()[0]
        t["asof"] = sorted(
            map(tuple, distinct_stats_asof(spark, out, max_ep).collect())
        )
        return t

    want = snap(clean)
    assert any("dup-000003" in str(r) for r in want["dup_flags"])

    # ---- crashed store: epoch 1 commits, epoch 2 dies mid-tables
    out, ck = f"{tmp_out}/kout", f"{tmp_out}/kck"
    run(in_crash, out, ck)  # epoch 1 clean
    batch2.write.mode("append").parquet(in_crash)

    real_write = storage.write_table

    def crashing_write(df, name, base, **kw):
        if name == "dedup_sigs" and base == out:
            raise RuntimeError("injected crash before sigs write")
        return real_write(df, name, base, **kw)

    monkeypatch.setattr(STR.storage, "write_table", crashing_write)
    with pytest.raises(Exception, match="injected crash"):
        run(in_crash, out, ck)
    monkeypatch.setattr(STR.storage, "write_table", real_write)

    # the crash landed inside the window: this epoch's flags exist but
    # its sigs/seen-commit do not — the dup is flagged yet not committed
    seen_mid = {
        r["doc_id"]
        for r in storage.read_table(spark, "doc_ids_seen", out).collect()
    }
    assert "doc-000010" not in seen_mid and "dup-000003" not in seen_mid

    # resume from the same checkpoint: the epoch re-runs end-to-end
    run(in_crash, out, ck)
    got = snap(out)
    assert got == want
    docs.unpersist()
