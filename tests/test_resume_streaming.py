"""Kill-resume (O21/O36) and incremental-ingest (O24) tests."""

import shutil

import pyspark.sql.functions as F
import pytest

from naruhodo_spark import storage, synth
from naruhodo_spark.pipeline import run_partitioned
from naruhodo_spark.streaming import incremental_ingest, windowed_event_counts


@pytest.fixture()
def tmp_out(tmp_path):
    return str(tmp_path)


def test_kill_resume_produces_identical_tables(spark, tmp_out):
    docs = synth.synth_documents(spark, 60).persist()
    aliases = synth.alias_dictionary(spark)
    out_a, out_b = f"{tmp_out}/resumed", f"{tmp_out}/clean"

    # "killed" first run: only half the partitions got processed
    half = docs.where(F.pmod(F.xxhash64("doc_id"), F.lit(8)) < 4)
    r1 = run_partitioned(spark, half, out_a, n_parts=8, aliases=aliases)
    assert 0 < r1["parts_processed"] <= 4

    # resume with the full input: only pending parts run
    r2 = run_partitioned(spark, docs, out_a, n_parts=8, aliases=aliases)
    assert r2["parts_processed"] == 8 - r1["parts_processed"]

    # third run is a no-op
    r3 = run_partitioned(spark, docs, out_a, n_parts=8, aliases=aliases)
    assert r3["parts_processed"] == 0

    run_partitioned(spark, docs, out_b, n_parts=8, aliases=aliases)
    a = storage.read_table(spark, "ksg_edges", out_a)
    b = storage.read_table(spark, "ksg_edges", out_b)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    docs.unpersist()


def test_resume_reprocesses_changed_partitions(spark, tmp_out):
    """Lineage-aware resume (O38): a partition whose input documents
    changed since the manifest row was written must be reprocessed; the
    final tables must equal a clean run over the new input."""
    out = f"{tmp_out}/lineage"
    docs_v1 = synth.synth_documents(spark, 40, seed=42).persist()
    docs_v2 = synth.synth_documents(spark, 40, seed=99).persist()  # changed

    r1 = run_partitioned(spark, docs_v1, out, n_parts=4)
    assert r1["parts_processed"] == 4
    r2 = run_partitioned(spark, docs_v2, out, n_parts=4)
    assert r2["parts_processed"] == 4  # fingerprints differ → redo all

    clean = f"{tmp_out}/lineage_clean"
    run_partitioned(spark, docs_v2, clean, n_parts=4)
    a = storage.read_table(spark, "ksg_edges", out)
    b = storage.read_table(spark, "ksg_edges", clean)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()

    # unchanged input → still a no-op
    r3 = run_partitioned(spark, docs_v2, out, n_parts=4)
    assert r3["parts_processed"] == 0
    docs_v1.unpersist(); docs_v2.unpersist()


def test_incremental_ingest_matches_batch(spark, tmp_out):
    docs = synth.synth_documents(spark, 40).persist()
    # stream input: two file batches
    in_dir = f"{tmp_out}/in"
    docs.where(F.xxhash64("doc_id") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    docs.where(F.xxhash64("doc_id") % 2 != 0).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)

    out = f"{tmp_out}/stream_out"
    incremental_ingest(
        spark, in_dir, out, checkpoint=f"{tmp_out}/ckpt"
    )
    got = storage.read_table(spark, "ksg_edges", out)

    from naruhodo_spark.pipeline import build_kg

    want = build_kg(docs)["ksg_edges"]
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()
    docs.unpersist()


def test_stateful_doc_dedup_across_batches(spark, tmp_out):
    """applyInPandasWithState: a doc_id re-delivered in a later micro-batch
    must NOT be emitted twice."""
    from naruhodo_spark import schemas as S
    from naruhodo_spark.streaming import stateful_doc_dedup

    docs = synth.synth_documents(spark, 20)
    in_dir = f"{tmp_out}/sin"
    docs.coalesce(1).write.mode("append").parquet(in_dir)   # batch 1
    docs.coalesce(1).write.mode("append").parquet(in_dir)   # batch 2: dup
    stream = (
        spark.readStream.schema(S.DOCUMENTS_SPANS)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        stateful_doc_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", f"{tmp_out}/sckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("SELECT doc_id FROM dedup_out").collect()
    ids = [r["doc_id"] for r in out]
    assert sorted(ids) == sorted(set(ids))
    assert len(ids) == 20


def test_watermarked_doc_dedup(spark, tmp_out):
    """dropDuplicatesWithinWatermark: a doc_id re-delivered within the
    watermark horizon is suppressed; dedup state is watermark-bounded."""
    from naruhodo_spark.streaming import watermarked_doc_dedup

    docs = synth.synth_documents(spark, 20).withColumn(
        "ingest_ts", F.to_timestamp(F.lit("2026-01-01 12:00:00"))
    )
    in_dir = f"{tmp_out}/win"
    docs.coalesce(1).write.mode("append").parquet(in_dir)   # batch 1
    docs.coalesce(1).write.mode("append").parquet(in_dir)   # batch 2: dup
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        watermarked_doc_dedup(stream)
        .select("doc_id")
        .writeStream.format("memory")
        .queryName("wm_dedup_out")
        .option("checkpointLocation", f"{tmp_out}/wmckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ids = [r["doc_id"] for r in spark.sql("SELECT doc_id FROM wm_dedup_out").collect()]
    assert sorted(ids) == sorted(set(ids)) and len(ids) == 20


def test_windowed_event_counts_batch_parity(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = windowed_event_counts(ev)
    total = out.agg(F.sum("n")).first()[0]
    assert total == ev.count()


def test_wave_commits_survive_midrun_kill(spark, tmp_out, monkeypatch):
    """wave_parts: the manifest is appended after EVERY wave, so a job
    killed mid-run loses at most one wave of work (the true
    [B BASELINE.json:6] kill semantics — a single end-of-job commit
    would lose everything pending). Simulated by making the SECOND
    triples_raw write raise."""
    from naruhodo_spark import pipeline as P

    docs = synth.synth_documents(spark, 80).persist()
    aliases = synth.alias_dictionary(spark)
    out = f"{tmp_out}/waves"

    real_write = storage.write_table
    calls = {"triples_raw": 0}

    def exploding_write(df, name, out_dir, **kw):
        if name == "triples_raw":
            calls["triples_raw"] += 1
            if calls["triples_raw"] == 2:
                raise RuntimeError("simulated mid-run kill")
        return real_write(df, name, out_dir, **kw)

    monkeypatch.setattr(P.storage, "write_table", exploding_write)
    try:
        run_partitioned(
            spark, docs, out, n_parts=8, aliases=aliases, wave_parts=3
        )
        raise AssertionError("expected the simulated kill to propagate")
    except RuntimeError:
        pass
    monkeypatch.setattr(P.storage, "write_table", real_write)

    # wave 1 (3 parts) must already be durable in the manifest
    manifest = storage.read_table(spark, "_manifest", out)
    assert manifest.select("part_id").distinct().count() == 3

    # resume completes only the remaining parts
    r2 = run_partitioned(
        spark, docs, out, n_parts=8, aliases=aliases, wave_parts=3
    )
    assert r2["parts_processed"] == 5

    clean = f"{tmp_out}/waves_clean"
    run_partitioned(spark, docs, clean, n_parts=8, aliases=aliases)
    a = storage.read_table(spark, "ksg_edges", out)
    b = storage.read_table(spark, "ksg_edges", clean)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    docs.unpersist()


def test_incremental_ingest_redelivery_uses_compact_seen_table(
    spark, tmp_out, monkeypatch
):
    """Re-delivery suppression must anti-join the COMPACT doc_ids_seen
    table, never scan all-time triples_raw (r01 VERDICT finding #7 —
    per-batch cost grew with corpus history). A full re-delivery (same
    input, fresh checkpoint) must read doc_ids_seen, not triples_raw,
    and add zero new triples."""
    from naruhodo_spark import streaming as STR

    docs = synth.synth_documents(spark, 30).persist()
    in_dir = f"{tmp_out}/rin"
    docs.coalesce(1).write.mode("append").parquet(in_dir)
    out = f"{tmp_out}/rout"

    incremental_ingest(spark, in_dir, out, checkpoint=f"{tmp_out}/rck1")
    seen = storage.read_table(spark, "doc_ids_seen", out)
    assert seen.columns == ["doc_id"]
    assert seen.distinct().count() == 30
    raw1 = storage.read_table(spark, "triples_raw", out).count()
    edges1 = storage.read_table(spark, "ksg_edges", out).collect()

    reads = []
    real_read = storage.read_table

    def spy_read(sp, name, base):
        reads.append(name)
        return real_read(sp, name, base)

    monkeypatch.setattr(STR.storage, "read_table", spy_read)
    # fresh checkpoint → the stream re-delivers every file
    incremental_ingest(spark, in_dir, out, checkpoint=f"{tmp_out}/rck2")
    monkeypatch.setattr(STR.storage, "read_table", real_read)

    assert "doc_ids_seen" in reads
    assert "triples_raw" not in reads
    assert storage.read_table(spark, "triples_raw", out).count() == raw1
    edges2 = storage.read_table(spark, "ksg_edges", out).collect()
    assert sorted(map(tuple, edges1)) == sorted(map(tuple, edges2))
    docs.unpersist()


def test_incremental_ingest_legacy_layout_persists_rebuilt_seen(
    spark, tmp_out
):
    """Legacy out_dir (triples_raw exists, NO doc_ids_seen): the
    recovery branch must PERSIST the rebuilt seen set, so a
    re-delivery that spans multiple micro-batches still suppresses
    every legacy doc (pre-fix: batch 2+ anti-joined only batch 1's ids
    and re-processed the legacy corpus — duplicate triples, doubled
    edge weights)."""
    import shutil

    docs = synth.synth_documents(spark, 30).persist()
    in_dir = f"{tmp_out}/lin"
    docs.coalesce(12).write.mode("append").parquet(in_dir)  # >8 files → 2+ batches
    out = f"{tmp_out}/lout"

    incremental_ingest(spark, in_dir, out, checkpoint=f"{tmp_out}/lck1")
    raw1 = storage.read_table(spark, "triples_raw", out).count()
    edges1 = storage.read_table(spark, "ksg_edges", out).collect()

    # simulate the legacy layout: drop the compact id table
    shutil.rmtree(f"{out}/doc_ids_seen")

    # fresh checkpoint → full re-delivery across multiple micro-batches
    incremental_ingest(spark, in_dir, out, checkpoint=f"{tmp_out}/lck2")

    assert storage.read_table(spark, "triples_raw", out).count() == raw1
    edges2 = storage.read_table(spark, "ksg_edges", out).collect()
    assert sorted(map(tuple, edges1)) == sorted(map(tuple, edges2))
    seen = storage.read_table(spark, "doc_ids_seen", out)
    assert seen.distinct().count() == 30
    docs.unpersist()


def test_reprocessed_zero_triple_part_drops_stale_rows(spark, tmp_out):
    """Changed-input reprocessing where the NEW extraction yields zero
    triples: dynamic partition overwrite writes nothing for that part,
    so without the pre-delete its stale triples would survive and
    finalize would aggregate deleted content (review finding). The
    resume run must equal a clean run on the new input."""
    from pyspark.sql import functions as F

    from naruhodo_spark.pipeline import run_partitioned, with_part_id

    docs = synth.synth_documents(spark, 30).persist()
    n_parts = 6
    out = f"{tmp_out}/zp_out"
    run_partitioned(spark, docs, out, n_parts=n_parts)
    parts_with_rows = {
        r["part_id"]
        for r in storage.read_table(spark, "triples_raw", out)
        .select("part_id").distinct().collect()
    }
    target = sorted(parts_with_rows)[0]

    # v2: every doc in the target part becomes empty → extracts nothing
    emptied = F.transform(
        F.col("spans"),
        lambda s: F.struct(
            s["kind"].alias("kind"),
            F.lit("").alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )
    docs2 = (
        with_part_id(docs, n_parts)
        .withColumn(
            "spans",
            F.when(F.col("part_id") == target, emptied).otherwise(F.col("spans")),
        )
        .drop("part_id")
        .persist()
    )
    run_partitioned(spark, docs2, out, n_parts=n_parts)

    raw2 = storage.read_table(spark, "triples_raw", out)
    assert raw2.where(F.col("part_id") == target).count() == 0, (
        "stale triples survived the zero-triple reprocess"
    )
    clean = f"{tmp_out}/zp_clean"
    run_partitioned(spark, docs2, clean, n_parts=n_parts)
    a = storage.read_table(spark, "ksg_edges", out)
    b = storage.read_table(spark, "ksg_edges", clean)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    docs.unpersist(); docs2.unpersist()


def test_streaming_epoch_partitioned_raw_and_repair(spark, tmp_out):
    """The restructured upsert protocol: triples_raw is epoch-partitioned
    (idempotent per-epoch overwrite), and rebuild_aggregates recovers the
    graph tables from raw after a simulated double-merge (the documented
    at-least-once window: crash between a completed merge and the
    doc_ids_seen commit)."""
    from naruhodo_spark.streaming import rebuild_aggregates

    docs = synth.synth_documents(spark, 30).persist()
    in_dir = f"{tmp_out}/ein"
    docs.coalesce(12).write.mode("append").parquet(in_dir)  # ≥2 epochs
    out = f"{tmp_out}/eout"
    incremental_ingest(spark, in_dir, out, checkpoint=f"{tmp_out}/eck")

    raw = storage.read_table(spark, "triples_raw", out)
    assert "epoch" in raw.columns
    assert raw.select("epoch").distinct().count() >= 2

    clean_edges = sorted(
        map(tuple, storage.read_table(spark, "ksg_edges", out).collect())
    )

    # simulate the crash window: one batch's aggregates merged TWICE
    edges = storage.read_table(spark, "ksg_edges", out)
    doubled = (
        edges.unionByName(edges.limit(5))
        .groupBy("subj", "pred", "obj")
        .agg(
            F.sum("weight").alias("weight"),
            F.max("negative").alias("negative"),
            F.max("passive").alias("passive"),
        )
        .localCheckpoint()
    )
    storage.write_table(doubled, "ksg_edges", out)
    assert sorted(
        map(tuple, storage.read_table(spark, "ksg_edges", out).collect())
    ) != clean_edges

    rebuild_aggregates(spark, out)
    assert sorted(
        map(tuple, storage.read_table(spark, "ksg_edges", out).collect())
    ) == clean_edges
    docs.unpersist()


def test_crash_between_merge_and_seen_commit_is_repaired(
    spark, tmp_out, monkeypatch
):
    """VERDICT r02 next-round #5 — REAL crash injection in the documented
    at-least-once window: epoch 2's ksg merges commit, then the stream
    dies BEFORE its doc_ids_seen append (the commit point). The epoch
    must be ≥2: a first-epoch crash is closed by the legacy-recovery path
    (seen rebuilt from the exactly-once raw), so the double-merge window
    only exists once a previous epoch's seen ids are already committed.
    The restarted stream re-runs epoch 2 (its docs were never marked
    seen) and merges its aggregates a SECOND time; rebuild_aggregates
    must restore exact counts from raw."""
    import naruhodo_spark.streaming as STR
    from naruhodo_spark.streaming import rebuild_aggregates

    docs = synth.synth_documents(spark, 30).persist()
    in_dir = f"{tmp_out}/cin"
    # maxFilesPerTrigger=8 → 12 files = 2 epochs
    docs.coalesce(12).write.mode("append").parquet(in_dir)

    # the clean single-pass truth
    clean = f"{tmp_out}/cclean"
    incremental_ingest(spark, in_dir, clean, checkpoint=f"{tmp_out}/cckc")
    clean_edges = sorted(
        map(tuple, storage.read_table(spark, "ksg_edges", clean).collect())
    )

    out = f"{tmp_out}/cout"
    real_write = storage.write_table
    state = {"seen_writes": 0}

    def crashing_write(df, name, base, **kw):
        if name == "doc_ids_seen" and base == out:
            state["seen_writes"] += 1
            if state["seen_writes"] == 2:  # epoch 2's commit point
                raise RuntimeError("injected crash before seen-commit")
        return real_write(df, name, base, **kw)

    monkeypatch.setattr(STR.storage, "write_table", crashing_write)
    with pytest.raises(Exception, match="injected crash"):
        incremental_ingest(spark, in_dir, out, checkpoint=f"{tmp_out}/cck")
    monkeypatch.setattr(STR.storage, "write_table", real_write)
    # epoch 1 committed, epoch 2's merges landed but its commit did not
    assert storage.table_exists(spark, "ksg_edges", out)
    seen1 = storage.read_table(spark, "doc_ids_seen", out).count()
    assert 0 < seen1 < 30

    # restart with the SAME checkpoint: epoch 2 re-runs end-to-end and
    # double-merges its aggregates (the known at-least-once window)
    incremental_ingest(spark, in_dir, out, checkpoint=f"{tmp_out}/cck")
    doubled = sorted(
        map(tuple, storage.read_table(spark, "ksg_edges", out).collect())
    )
    assert doubled != clean_edges  # the window is real, not hypothetical

    rebuild_aggregates(spark, out)
    assert sorted(
        map(tuple, storage.read_table(spark, "ksg_edges", out).collect())
    ) == clean_edges
    # raw stayed exactly-once through crash + retry
    assert sorted(
        map(
            tuple,
            storage.read_table(spark, "triples_raw", out)
            .drop("epoch")
            .collect(),
        )
    ) == sorted(
        map(
            tuple,
            storage.read_table(spark, "triples_raw", clean)
            .drop("epoch")
            .collect(),
        )
    )
    docs.unpersist()


def test_retried_epoch_with_zero_triples_drops_stale_partition(
    spark, tmp_out, monkeypatch
):
    """ADVICE r02 — a retried epoch whose re-run legitimately extracts
    ZERO triples must not leave the failed attempt's partial rows in
    triples_raw: dynamic overwrite only replaces partitions present in
    the written frame, so the upsert pre-drops the epoch partition.
    Epoch ≥2 for the same reason as the crash-repair test (a first-epoch
    retry is suppressed by the legacy seen-rebuild)."""
    import naruhodo_spark.pipeline as PIPE
    import naruhodo_spark.streaming as STR

    docs = synth.synth_documents(spark, 30).persist()
    in_dir = f"{tmp_out}/zin"
    docs.coalesce(12).write.mode("append").parquet(in_dir)  # 2 epochs
    out = f"{tmp_out}/zout"

    # attempt 1: epoch 2's raw partition written, crash before its commit
    real_write = storage.write_table
    state = {"seen_writes": 0}

    def crashing_write(df, name, base, **kw):
        if name == "doc_ids_seen" and base == out:
            state["seen_writes"] += 1
            if state["seen_writes"] == 2:
                raise RuntimeError("injected crash before seen-commit")
        return real_write(df, name, base, **kw)

    monkeypatch.setattr(STR.storage, "write_table", crashing_write)
    with pytest.raises(Exception, match="injected crash"):
        incremental_ingest(spark, in_dir, out, checkpoint=f"{tmp_out}/zck")
    monkeypatch.setattr(STR.storage, "write_table", real_write)
    raw = storage.read_table(spark, "triples_raw", out)
    epochs_before = {r["epoch"] for r in raw.select("epoch").distinct().collect()}
    assert len(epochs_before) == 2  # both epochs' raw landed

    seen = storage.read_table(spark, "doc_ids_seen", out)
    committed = raw.join(seen, "doc_id", "left_semi").count()
    stale = raw.count() - committed
    assert stale > 0  # epoch 2's rows are the uncommitted attempt

    # attempt 2 (same checkpoint → epoch 2 retried): extraction now
    # yields zero triples (e.g. the profile changed between attempts)
    real_build = PIPE.build_kg

    def empty_build(batch, prof=None, **kw):
        kg = real_build(batch, prof=prof, **kw)
        return {**kg, "triples": kg["triples"].limit(0)}

    monkeypatch.setattr(PIPE, "build_kg", empty_build)
    incremental_ingest(spark, in_dir, out, checkpoint=f"{tmp_out}/zck")
    monkeypatch.setattr(PIPE, "build_kg", real_build)

    # the stale attempt-1 rows are gone — only epoch 1's committed rows
    # remain (the retry wrote nothing for epoch 2)
    raw_after = storage.read_table(spark, "triples_raw", out)
    assert raw_after.count() == committed
    docs.unpersist()


def test_checkpoint_loss_redelivery_preserves_committed_epochs(
    spark, tmp_out
):
    """r03 review: an epoch-counter COLLISION after checkpoint loss must
    not destroy committed raw triples. A fresh-checkpoint restart
    re-lists every committed file as epoch 0 plus one genuinely new doc;
    the colliding partition holds committed rows for docs the anti-join
    just suppressed. The survivor-union write keeps them — the previous
    whole-partition pre-drop erased them whenever the re-delivered batch
    contained >=1 new doc."""
    docs = synth.synth_documents(spark, 20).persist()
    in_dir = f"{tmp_out}/lin"
    docs.coalesce(4).write.mode("append").parquet(in_dir)
    out = f"{tmp_out}/lout"
    incremental_ingest(spark, in_dir, out, checkpoint=f"{tmp_out}/lck1")
    committed = sorted(
        map(
            tuple,
            storage.read_table(spark, "triples_raw", out)
            .drop("epoch")
            .collect(),
        )
    )
    assert len(committed) > 0

    # one new doc arrives; the checkpoint directory is LOST (fresh dir)
    new_doc = synth.synth_documents(spark, 21).where("doc_id = 'doc-000020'")
    assert new_doc.count() == 1
    new_doc.coalesce(1).write.mode("append").parquet(in_dir)
    incremental_ingest(spark, in_dir, out, checkpoint=f"{tmp_out}/lck2")

    after = sorted(
        map(
            tuple,
            storage.read_table(spark, "triples_raw", out)
            .drop("epoch")
            .collect(),
        )
    )
    # committed rows survived the collision and the new doc landed once:
    # the result equals a clean single-pass run over all 21 docs
    clean = f"{tmp_out}/lclean"
    incremental_ingest(spark, in_dir, clean, checkpoint=f"{tmp_out}/lck3")
    want = sorted(
        map(
            tuple,
            storage.read_table(spark, "triples_raw", clean)
            .drop("epoch")
            .collect(),
        )
    )
    assert after == want
    assert set(t[0] for t in committed).issubset(set(t[0] for t in after))
    seen = storage.read_table(spark, "doc_ids_seen", out)
    assert seen.select("doc_id").distinct().count() == 21
    docs.unpersist()


def test_epoch_diff_changelog(spark, tmp_out):
    """epoch_diff: as-of states from the epoch-partitioned raw table,
    diffed into the added/changed changelog (removal is impossible —
    states are cumulative — and must not appear)."""
    from naruhodo_spark import storage
    from naruhodo_spark.streaming import epoch_diff

    e0 = spark.createDataFrame(
        [("a", "likes", "b", 0), ("c", "sees", "d", 0)],
        "subj string, pred string, obj string, epoch int",
    )
    e1 = spark.createDataFrame(
        [("a", "likes", "b", 1), ("x", "adds", "y", 1)],
        "subj string, pred string, obj string, epoch int",
    )
    storage.write_table(
        e0.unionByName(e1), "triples_raw", tmp_out,
        mode="overwrite", partition_by=["epoch"],
    )
    d = {
        (r["subj"], r["pred"], r["obj"]): r
        for r in epoch_diff(spark, tmp_out, 0, 1).collect()
    }
    assert d[("a", "likes", "b")]["change"] == "changed"  # weight 1 -> 2
    assert d[("a", "likes", "b")]["weight_delta"] == 1
    assert d[("c", "sees", "d")]["change"] == "same"
    assert d[("x", "adds", "y")]["change"] == "added"
    assert not [r for r in d.values() if r["change"] == "removed"]
    # identical epochs diff to all-same
    same = epoch_diff(spark, tmp_out, 1, 1)
    assert {r["change"] for r in same.collect()} == {"same"}


def test_sketch_panel_asof_tracks_raw(spark, tmp_out):
    """The per-epoch HLL sketch panel: written alongside each epoch's
    raw partition, folded by distinct_stats_asof into cumulative
    distinct counts that match exact recounts of triples_raw within
    sketch error — without rescanning raw."""
    from naruhodo_spark.streaming import distinct_stats_asof

    docs = synth.synth_documents(spark, 60).persist()
    in_dir = f"{tmp_out}/in"
    out = f"{tmp_out}/out"
    first = docs.where(F.xxhash64("doc_id") % 2 == 0)
    second = docs.where(F.xxhash64("doc_id") % 2 != 0)

    first.coalesce(1).write.mode("append").parquet(in_dir)
    incremental_ingest(spark, in_dir, out, checkpoint=f"{tmp_out}/ckpt")
    second.coalesce(1).write.mode("append").parquet(in_dir)
    incremental_ingest(spark, in_dir, out, checkpoint=f"{tmp_out}/ckpt")

    panel = storage.read_table(spark, "sketch_panel", out)
    epochs = sorted(r["epoch"] for r in panel.select("epoch").distinct().collect())
    assert len(epochs) == 2
    raw = storage.read_table(spark, "triples_raw", out)
    for i, e in enumerate(epochs):
        asof = {
            r["metric"]: r["n_distinct_est"]
            for r in distinct_stats_asof(spark, out, e).collect()
        }
        upto = raw.where(F.col("epoch") <= e)
        for m in ("subj", "pred", "obj", "doc_id"):
            exact = upto.select(m).distinct().count()
            assert abs(asof[m] - exact) <= max(1, 0.05 * exact), (e, m, asof[m], exact)
    # the as-of view is strictly monotone as the corpus grows
    d0 = {r["metric"]: r["n_distinct_est"]
          for r in distinct_stats_asof(spark, out, epochs[0]).collect()}
    d1 = {r["metric"]: r["n_distinct_est"]
          for r in distinct_stats_asof(spark, out, epochs[1]).collect()}
    assert d1["doc_id"] > d0["doc_id"]
    docs.unpersist()


def test_distinct_stats_guard_and_panel_backfill(spark, tmp_out):
    """A pre-panel store (triples_raw only) gets a clear error from
    distinct_stats_asof, and rebuild_sketch_panel backfills every epoch
    from raw so the as-of folds match exact recounts."""
    import pytest as _pt

    from naruhodo_spark.streaming import (
        distinct_stats_asof,
        rebuild_sketch_panel,
    )

    raw = spark.createDataFrame(
        [(f"s{i % 7}", "p", f"o{i % 5}", f"d{i}", i % 3)
         for i in range(60)],
        "subj string, pred string, obj string, doc_id string, epoch int",
    )
    storage.write_table(
        raw, "triples_raw", tmp_out, mode="overwrite", partition_by=["epoch"]
    )
    with _pt.raises(ValueError, match="rebuild_sketch_panel"):
        distinct_stats_asof(spark, tmp_out, 2)
    rebuild_sketch_panel(spark, tmp_out)
    for e in (0, 1, 2):
        asof = {
            r["metric"]: r["n_distinct_est"]
            for r in distinct_stats_asof(spark, tmp_out, e).collect()
        }
        upto = raw.where(F.col("epoch") <= e)
        for m in ("subj", "pred", "obj", "doc_id"):
            exact = upto.select(m).distinct().count()
            assert abs(asof[m] - exact) <= max(1, 0.05 * exact), (e, m)


def test_rebuild_sketch_panel_drops_ghost_epochs(spark, tmp_out):
    """Ghost panel partitions for epochs raw no longer holds must be
    removed by the rebuild, or as-of folds would overcount."""
    from naruhodo_spark.streaming import (
        distinct_stats_asof,
        rebuild_sketch_panel,
    )

    raw = spark.createDataFrame(
        [(f"s{i % 5}", "p", f"o{i % 3}", f"d{i}", i % 4) for i in range(40)],
        "subj string, pred string, obj string, doc_id string, epoch int",
    )
    storage.write_table(
        raw, "triples_raw", tmp_out, mode="overwrite", partition_by=["epoch"]
    )
    rebuild_sketch_panel(spark, tmp_out)
    # raw loses epochs 2-3 (partial restore); panel still has them
    storage.write_table(
        raw.where(F.col("epoch") <= 1), "triples_raw", tmp_out,
        mode="overwrite", partition_by=["epoch"],
    )
    # note: dynamic overwrite keeps epochs 2-3 in raw; delete explicitly
    storage.delete_partitions(spark, "triples_raw", tmp_out, "epoch", [2, 3])
    rebuild_sketch_panel(spark, tmp_out)
    panel = storage.read_table(spark, "sketch_panel", tmp_out)
    assert {r["epoch"] for r in panel.select("epoch").distinct().collect()} == {0, 1}
    asof = {r["metric"]: r["n_distinct_est"]
            for r in distinct_stats_asof(spark, tmp_out, 3).collect()}
    upto = raw.where(F.col("epoch") <= 1)
    for m in ("subj", "obj", "doc_id"):
        exact = upto.select(m).distinct().count()
        assert abs(asof[m] - exact) <= max(1, 0.05 * exact), (m, asof[m], exact)


def test_quantile_panel_asof_tracks_raw(spark, tmp_out):
    """The per-epoch DDSketch quantile panel: written alongside each
    epoch's raw partition, folded by quantile_stats_asof into
    cumulative triples-per-doc quantiles matching exact recomputes
    within the sketch's relative error — without rescanning raw."""
    import numpy as np

    from naruhodo_spark.streaming import quantile_stats_asof

    docs = synth.synth_documents(spark, 60).persist()
    in_dir = f"{tmp_out}/in"
    out = f"{tmp_out}/out"
    first = docs.where(F.xxhash64("doc_id") % 2 == 0)
    second = docs.where(F.xxhash64("doc_id") % 2 != 0)

    first.coalesce(1).write.mode("append").parquet(in_dir)
    incremental_ingest(spark, in_dir, out, checkpoint=f"{tmp_out}/ckpt")
    second.coalesce(1).write.mode("append").parquet(in_dir)
    incremental_ingest(spark, in_dir, out, checkpoint=f"{tmp_out}/ckpt")

    raw = storage.read_table(spark, "triples_raw", out)
    epochs = sorted(
        r["epoch"] for r in raw.select("epoch").distinct().collect()
    )
    assert len(epochs) == 2
    for e in epochs:
        got = {
            r["q"]: r["value"]
            for r in quantile_stats_asof(spark, out, e).collect()
        }
        counts = np.array([
            r["n"]
            for r in raw.where(F.col("epoch") <= e)
            .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
        ], dtype=float)
        for q in (0.5, 0.9, 0.99):
            true = float(np.quantile(counts, q))
            # 1% sketch rel-err + quantile-rank granularity on a small n
            assert abs(got[q] - true) <= max(0.02 * true, 1.5), (
                e, q, got[q], true
            )
    docs.unpersist()


def test_quantile_panel_backfill(spark, tmp_out):
    """rebuild_sketch_panel also backfills the quantile panel on a
    pre-panel store, and quantile_stats_asof errors clearly before."""
    import numpy as np
    import pytest as _pt

    from naruhodo_spark.streaming import (
        quantile_stats_asof,
        rebuild_sketch_panel,
    )

    # store invariant: each doc_id lives in exactly ONE epoch (the
    # ingest dedups docs across epochs) — the panel fold relies on it
    raw = spark.createDataFrame(
        [(f"s{i}", "p", f"o{i}", f"d{i % 13}", (i % 13) % 3)
         for i in range(120)],
        "subj string, pred string, obj string, doc_id string, epoch int",
    )
    storage.write_table(
        raw, "triples_raw", tmp_out, mode="overwrite", partition_by=["epoch"]
    )
    with _pt.raises(ValueError, match="rebuild_sketch_panel"):
        quantile_stats_asof(spark, tmp_out, 1)
    rebuild_sketch_panel(spark, tmp_out)
    got = {
        r["q"]: r["value"]
        for r in quantile_stats_asof(spark, tmp_out, 2).collect()
    }
    counts = np.array([
        r["n"] for r in raw.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    ], dtype=float)
    true = float(np.quantile(counts, 0.5))
    assert abs(got[0.5] - true) <= max(0.02 * true, 1.0)


def test_asof_raises_on_partial_panel(spark, tmp_out):
    """ADVICE r04: a store upgraded AFTER some epochs were ingested has
    panel rows only for post-upgrade epochs — as-of folds over earlier
    epochs must raise the rebuild hint, not silently aggregate a
    partial epoch range. (Only the table-entirely-absent case raised
    before.)"""
    import pytest as _pt

    from naruhodo_spark.streaming import (
        distinct_stats_asof,
        quantile_stats_asof,
        rebuild_sketch_panel,
    )

    raw = spark.createDataFrame(
        [(f"s{i}", "p", f"o{i}", f"d{i % 9}", (i % 9) % 3)
         for i in range(90)],
        "subj string, pred string, obj string, doc_id string, epoch int",
    )
    storage.write_table(
        raw, "triples_raw", tmp_out, mode="overwrite", partition_by=["epoch"]
    )
    rebuild_sketch_panel(spark, tmp_out)
    # simulate the pre-upgrade store: epoch 0's panel partitions missing
    storage.delete_partitions(spark, "quantile_panel", tmp_out, "epoch", [0])
    storage.delete_partitions(spark, "sketch_panel", tmp_out, "epoch", [0])
    with _pt.raises(ValueError, match=r"missing epochs \[0\]"):
        quantile_stats_asof(spark, tmp_out, 2)
    with _pt.raises(ValueError, match=r"missing epochs \[0\]"):
        distinct_stats_asof(spark, tmp_out, 2)
    # backfill repairs both; as-of runs again
    rebuild_sketch_panel(spark, tmp_out)
    assert quantile_stats_asof(spark, tmp_out, 2).count() > 0
    assert distinct_stats_asof(spark, tmp_out, 2).count() == 4
