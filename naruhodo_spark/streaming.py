"""O24–O26 — incremental ingest as Structured Streaming.

The reference's ``parser.add()`` semantics are *incremental
accumulation*: the graph grows monotonically as documents arrive
[PK naruhodo/parser.py]. The Spark analog: a streaming read over the
documents table, ``foreachBatch`` running the batch pipeline on each
micro-batch, and a MERGE-style upsert into the graph tables (Iceberg
MERGE in prod; anti-join+union emulation locally — storage.py).

Node counts / edge weights are additive, so late or re-delivered data
merges commutatively; the only state needed is doc_id dedup, bounded by
a watermark in a real deployment (``dropDuplicatesWithinWatermark``).
Cross-batch subject carryover is unnecessary because documents are atomic
within a batch (SURVEY.md O26); if documents ever spanned batches, the
keyed-state path is ``applyInPandasWithState`` on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from naruhodo_spark import schemas as S
from naruhodo_spark import storage
from naruhodo_spark.operators import agg as O_agg
from naruhodo_spark.operators import canon as O_canon
from naruhodo_spark.operators import link as O_link


def _spans_text(docs_spans: DataFrame) -> DataFrame:
    """(doc_id, text) from a spans frame: offset-sorted text spans joined
    with single spaces — the content view the dedup gate shingles. Media
    spans are invisible to dedup by construction (their bytes live behind
    media_ref; near-dup text with different media still flags, which is
    the Gopher/RefinedWeb-style intent for interleaved corpora)."""
    text_spans = F.array_sort(
        F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("text")),
        lambda a, b: F.when(a["offset"] < b["offset"], -1)
        .when(a["offset"] > b["offset"], 1)
        .otherwise(0),
    )
    return docs_spans.select(
        "doc_id",
        F.array_join(
            F.transform(text_spans, lambda s: s["text"]), " "
        ).alias("text"),
    )


def _epoch_idempotent_write(
    spark: SparkSession,
    name: str,
    out_dir: str,
    frame: DataFrame,
    epoch_id: int,
    batch_keys: DataFrame,
    key_col: str = "doc_id",
) -> None:
    """Write ``frame`` as this epoch's partition of ``name`` so that BOTH
    failure modes of epoch-partitioned streaming output are safe:

    - RETRY of this epoch (same epoch_id, same batch): rows keyed to this
      batch are replaced wholesale — a zero-row re-run leaves nothing
      stale behind (pre-drop when the final frame is empty).
    - Epoch-counter COLLISION after checkpoint loss: committed rows in
      the colliding partition whose key is NOT in this batch are read out
      (materialized before the overwrite rewrites their files) and ride
      along as survivors.

    ``batch_keys`` is a 1-column (key_col) frame of this batch's keys.
    Cost: one partition-pruned read per call."""
    frame = frame.withColumn("epoch", F.lit(int(epoch_id)))
    if storage.table_exists(spark, name, out_dir):
        keys = batch_keys.toDF(key_col)
        survivors = (
            storage.read_table(spark, name, out_dir)
            .where(F.col("epoch") == int(epoch_id))
            .join(keys, key_col, "left_anti")
            .localCheckpoint()
        )
        frame = frame.unionByName(survivors)
    if frame.isEmpty():
        storage.delete_partitions(
            spark, name, out_dir, "epoch", [int(epoch_id)]
        )
    else:
        storage.write_table(
            frame, name, out_dir, mode="overwrite", partition_by=["epoch"]
        )


def _write_epoch_sketches(
    spark: SparkSession, out_dir: str, epoch_id: int
) -> None:
    """Per-epoch HLL distinct panel (ops/sketches.py) for the store:
    4 rows (subj/pred/obj/doc_id) × ~2 KB per epoch, derived from the
    exactly-once ``triples_raw`` partition just written — read back
    partition-pruned, so the panel inherits raw's retry/collision
    story instead of inventing its own. Cumulative distinct counts
    as-of any epoch then fold O(epochs) sketch rows
    (:func:`distinct_stats_asof`) instead of rescanning raw."""
    from naruhodo_spark.ops import sketches as SK

    if not storage.table_exists(spark, "triples_raw", out_dir):
        return  # zero-triple epoch on a fresh store: nothing to track
    raw_e = (
        storage.read_table(spark, "triples_raw", out_dir)
        .where(F.col("epoch") == int(epoch_id))
        .drop("epoch")
    )
    if raw_e.isEmpty():
        # the raw partition was dropped (zero-triple retry): both panel
        # partitions must go too
        storage.delete_partitions(
            spark, "sketch_panel", out_dir, "epoch", [int(epoch_id)]
        )
        storage.delete_partitions(
            spark, "quantile_panel", out_dir, "epoch", [int(epoch_id)]
        )
        return
    panel = SK.entity_sketch_panel(raw_e, epoch_id).localCheckpoint()
    storage.write_table(
        panel, "sketch_panel", out_dir, mode="overwrite",
        partition_by=["epoch"],
    )
    # quantile panel rides the same raw partition: per-epoch DDSketch of
    # triples-per-doc (the doc-complexity distribution), mergeable
    # as-of any epoch without a rescan (quantile_stats_asof)
    qpanel = SK.quantile_sketch(
        raw_e.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("double").alias("triples_per_doc")
        ),
        [], "triples_per_doc",
    ).withColumn("epoch", F.lit(int(epoch_id))).localCheckpoint()
    storage.write_table(
        qpanel, "quantile_panel", out_dir, mode="overwrite",
        partition_by=["epoch"],
    )


def _assert_panel_epochs(
    spark: SparkSession, out_dir: str, panel: str, epoch: int
) -> None:
    """Raise when ``panel`` is missing epochs ≤ ``epoch`` that the
    exactly-once ``triples_raw`` record has (ADVICE r04: a store created
    before a panel existed and then upgraded has panel rows only for
    post-upgrade epochs, so an as-of fold over earlier epochs would
    silently aggregate a PARTIAL epoch range). Both distinct-epoch
    scans are partition-column reads — O(epochs) rows, bounded."""
    if not storage.table_exists(spark, "triples_raw", out_dir):
        return  # no raw record to audit against (legacy store): fold as-is
    want = {
        r["epoch"]
        for r in storage.read_table(spark, "triples_raw", out_dir)
        .where(F.col("epoch") <= int(epoch))
        .select("epoch").distinct().collect()
    }
    have = {
        r["epoch"]
        for r in storage.read_table(spark, panel, out_dir)
        .where(F.col("epoch") <= int(epoch))
        .select("epoch").distinct().collect()
    }
    missing = sorted(want - have)
    if missing:
        raise ValueError(
            f"{panel} at {out_dir} is missing epochs {missing} that "
            "triples_raw has (store predates the panel or a partial "
            "restore dropped them) — run rebuild_sketch_panel(spark, "
            "out_dir) to backfill before as-of queries"
        )


def distinct_stats_asof(
    spark: SparkSession, out_dir: str, epoch: int
) -> DataFrame:
    """(metric, n_distinct_est) — distinct subjects / predicates /
    objects / documents in the KG as-of ``epoch``, from the per-epoch
    sketch panel: one partition-pruned read of ≤4×(epoch+1) two-KB rows
    folded with hll_union_agg. At 10^12 docs this is the ONLY viable
    shape for "how many entities so far" — exact recount means a full
    raw rescan per checkpoint; ±1.6 % (lgk=12) is the standard trade."""
    from naruhodo_spark.ops import sketches as SK

    if not storage.table_exists(spark, "sketch_panel", out_dir):
        raise ValueError(
            f"no sketch_panel table at {out_dir}: the store predates the "
            "panel (or every epoch had zero triples) — run "
            "rebuild_sketch_panel(spark, out_dir) to backfill from "
            "triples_raw"
        )
    _assert_panel_epochs(spark, out_dir, "sketch_panel", epoch)
    panel = storage.read_table(spark, "sketch_panel", out_dir).where(
        F.col("epoch") <= int(epoch)
    )
    return SK.estimate_distinct(SK.merge_sketches(panel, ["metric"])).select(
        "metric", "n_distinct_est"
    )


def quantile_stats_asof(
    spark: SparkSession, out_dir: str, epoch: int,
    quantiles: "list[float] | None" = None,
) -> DataFrame:
    """(metric, q, value) — triples-per-doc quantiles in the KG as-of
    ``epoch``: a partition-pruned read of the per-epoch DDSketch panel
    folded with a groupBy sum (ops/sketches.merge_quantile_sketches),
    then a sketch-sized quantile walk — never a rescan, never a sort
    over data. Same panel contract as distinct_stats_asof.

    The fold is exact-by-construction only because the store guarantees
    each doc_id lives in exactly ONE epoch (ingest dedups docs across
    epochs): per-epoch per-doc counts are therefore whole-doc counts,
    and unioning the epochs' distributions IS the all-time
    distribution. A store violating that invariant would double-count
    split docs."""
    from naruhodo_spark.ops import sketches as SK

    if not storage.table_exists(spark, "quantile_panel", out_dir):
        raise ValueError(
            f"no quantile_panel table at {out_dir}: the store predates "
            "the panel (or every epoch had zero triples) — run "
            "rebuild_sketch_panel(spark, out_dir) to backfill from "
            "triples_raw"
        )
    _assert_panel_epochs(spark, out_dir, "quantile_panel", epoch)
    panel = storage.read_table(spark, "quantile_panel", out_dir).where(
        F.col("epoch") <= int(epoch)
    ).drop("epoch")
    merged = SK.merge_quantile_sketches(panel, [])
    return SK.estimate_quantiles(merged, quantiles or [0.5, 0.9, 0.99])


def rebuild_sketch_panel(spark: SparkSession, out_dir: str) -> None:
    """Backfill/repair the per-epoch sketch panel from the exactly-once
    ``triples_raw`` record: one grouped pass computes every epoch's
    4 sketches (the upgrade path for stores written before the panel
    existed, and the recovery after restoring out_dir from a backup —
    same role rebuild_aggregates plays for the graph tables). Without
    the backfill, an upgraded store's as-of folds would silently
    undercount epochs ingested pre-upgrade."""
    from naruhodo_spark.ops import sketches as SK

    raw = storage.read_table(spark, "triples_raw", out_dir)
    panels = [
        SK.sketch_distinct(raw.select("epoch", m), ["epoch"], m)
        for m in ("subj", "pred", "obj", "doc_id")
        if m in raw.columns
    ]
    panel = panels[0]
    for p in panels[1:]:
        panel = panel.unionByName(p)
    panel = panel.select("epoch", "metric", "sketch").localCheckpoint()
    # the dynamic overwrite below only replaces partitions PRESENT in
    # the frame — ghost panel partitions for epochs raw no longer has
    # (partial restore, deleted raw partitions) must be dropped first,
    # or as-of folds would silently overcount with stale sketches
    if storage.table_exists(spark, "sketch_panel", out_dir):
        raw_epochs = {r["epoch"] for r in raw.select("epoch").distinct().collect()}
        existing = {
            r["epoch"]
            for r in storage.read_table(spark, "sketch_panel", out_dir)
            .select("epoch").distinct().collect()
        }
        stale = sorted(existing - raw_epochs)
        if stale:
            storage.delete_partitions(
                spark, "sketch_panel", out_dir, "epoch", stale
            )
    storage.write_table(
        panel, "sketch_panel", out_dir, mode="overwrite",
        partition_by=["epoch"],
    )
    # the quantile panel backfills from the same raw record (and gets
    # the same ghost-partition sweep)
    qpanel = SK.quantile_sketch(
        raw.groupBy("epoch", "doc_id").agg(
            F.count(F.lit(1)).cast("double").alias("triples_per_doc")
        ),
        ["epoch"], "triples_per_doc",
    ).select("epoch", "metric", "bucket", "count").localCheckpoint()
    if storage.table_exists(spark, "quantile_panel", out_dir):
        raw_epochs = {r["epoch"] for r in raw.select("epoch").distinct().collect()}
        existing_q = {
            r["epoch"]
            for r in storage.read_table(spark, "quantile_panel", out_dir)
            .select("epoch").distinct().collect()
        }
        stale_q = sorted(existing_q - raw_epochs)
        if stale_q:
            storage.delete_partitions(
                spark, "quantile_panel", out_dir, "epoch", stale_q
            )
    storage.write_table(
        qpanel, "quantile_panel", out_dir, mode="overwrite",
        partition_by=["epoch"],
    )


def incremental_ingest(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    prof: dict | None = None,
    aliases: DataFrame | None = None,
    checkpoint: str | None = None,
    dedup_threshold: float | None = None,
):
    """Drain all available input files through the pipeline and upsert
    the graph tables once per micro-batch. Returns the finished query.

    availableNow trigger → processes the backlog then stops; swap for
    processingTime in continuous deployments.

    ``dedup_threshold``: when set, each micro-batch is near-dup-gated
    against the persisted ``dedup_sigs`` MinHash index (ops/incdedup.py)
    BEFORE extraction: flagged docs contribute no triples (but are still
    marked seen — a near-dup is processed-and-rejected, not pending),
    flag pairs land in ``dup_flags`` (epoch-partitioned), and survivors'
    signatures grow the index. This is the production shape at corpus
    scale — dedup cost per batch is O(batch + matched buckets), never
    O(corpus), because only the compact signature table is read.
    """
    stream = (
        spark.readStream.schema(S.DOCUMENTS_SPANS)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    # alias CC labels computed ONCE per query, not per micro-batch — the
    # previous shape (build_kg(aliases=...) inside foreachBatch) collected
    # and broadcast the alias dictionary on every batch and never
    # destroyed the broadcasts (unbounded driver/executor accumulation on
    # a long-running stream)
    labels = (
        O_canon.alias_cc_labels(aliases).localCheckpoint()
        if aliases is not None
        else None
    )

    def _merge_edges(existing: DataFrame, batch: DataFrame) -> DataFrame:
        return (
            existing.unionByName(batch)
            .groupBy("subj", "pred", "obj")
            .agg(
                F.sum("weight").alias("weight"),
                F.max("negative").alias("negative"),
                F.max("passive").alias("passive"),
            )
        )

    def _merge_nodes(existing: DataFrame, batch: DataFrame) -> DataFrame:
        return (
            existing.unionByName(batch)
            .groupBy("node_id")
            .agg(
                F.min("rep").alias("rep"),
                F.max("etype").alias("etype"),
                F.max("pro").alias("pro"),
                F.sum("count").alias("count"),
            )
            .withColumn("name", F.col("node_id"))
            .select("node_id", "name", "rep", "etype", "pro", "count")
        )

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        """Per-batch cost is O(batch + |aggregated tables| + |seen ids|):
        the batch's partial aggregates merge into the stored edge/node
        tables (weights/counts are additive — the commutative-merge
        property the module docstring relies on). With Iceberg this
        becomes a single MERGE INTO; the parquet emulation rewrites the
        aggregated tables, which stay small relative to the raw stream.

        Re-delivery suppression anti-joins against a COMPACT
        ``doc_ids_seen`` table (one row per all-time doc_id), never the
        raw triples table — scanning ``triples_raw`` would make every
        batch pay for the full corpus history (r01 VERDICT finding #7).
        The production-streaming form of this guard is
        ``watermarked_doc_dedup`` (bounded state); the seen-ids table is
        the batch-emulation equivalent and is what resume reads.

        Crash-consistency protocol (parquet emulation — Iceberg makes
        steps 1+3 single transactions):
        1. triples_raw is written as a DYNAMIC OVERWRITE of this epoch's
           partition — Structured Streaming re-runs a failed epoch under
           the SAME epoch_id, so a retry overwrites its own partial
           output instead of appending duplicates (raw is exactly-once).
        2. edge/node merges run next; extraction is NOT repeated — both
           aggregates derive from the one localCheckpointed triples
           frame (previously each merge's lazy plan re-ran the full
           sentence-split→chunk→extract pipeline).
        3. the doc_ids_seen append is the COMMIT POINT and goes LAST: a
           crash anywhere before it re-runs the whole batch on restart.
           The only remaining at-least-once window is a crash BETWEEN a
           completed additive merge and the seen append (double-merged
           weights); Iceberg MERGE closes it, and the parquet emulation
           repairs it with :func:`rebuild_aggregates` (raw is always
           exactly-once, so the aggregates are always recoverable)."""
        from naruhodo_spark.pipeline import build_kg

        batch = batch_df.dropDuplicates(["doc_id"])
        if storage.table_exists(spark, "doc_ids_seen", out_dir):
            seen = storage.read_table(spark, "doc_ids_seen", out_dir)
        elif storage.table_exists(spark, "triples_raw", out_dir):
            # recovery / legacy layout: rebuild the compact id table from
            # raw ONCE and persist it immediately — these ids are already
            # in triples_raw, so marking them seen is correct no matter
            # where a crash lands; without the write, batch 2 would
            # anti-join against batch 1's ids only and re-process every
            # legacy doc
            seen = (
                storage.read_table(spark, "triples_raw", out_dir)
                .select("doc_id")
                .distinct()
                .localCheckpoint()
            )
            storage.write_table(seen, "doc_ids_seen", out_dir, mode="append")
        else:
            seen = None
        if seen is not None:
            batch = batch.join(seen, "doc_id", "left_anti")  # re-delivery
        batch_ids = batch.select("doc_id").localCheckpoint()
        if batch_ids.isEmpty():
            # fully-suppressed re-delivery (e.g. a fresh-checkpoint
            # restart re-listing committed files): nothing to extract,
            # write, or mark seen — and returning HERE keeps the
            # re-delivery path from ever touching triples_raw (the
            # compact-seen contract pinned by the redelivery spy test)
            return
        # Optional near-dup gate vs the persisted signature index. The
        # index read excludes THIS batch's ids — on a retry, the failed
        # attempt's sig partition may already hold them, and comparing a
        # doc against its own earlier signature would self-flag the whole
        # batch. Excluding them restores first-attempt semantics exactly.
        extract_batch = batch
        dd = None
        if dedup_threshold is not None:
            from naruhodo_spark.ops import incdedup as INC

            texts = _spans_text(batch)
            index = None
            if storage.table_exists(spark, "dedup_sigs", out_dir):
                index = (
                    storage.read_table(spark, "dedup_sigs", out_dir)
                    .drop("epoch")
                    .join(batch_ids, "doc_id", "left_anti")
                )
            dd = INC.incremental_near_dups(
                texts, index, threshold=dedup_threshold
            )
            dd["flags"] = dd["flags"].localCheckpoint()
            surv_ids = (
                batch_ids.join(
                    dd["flags"]
                    .select(F.col("new_doc_id").alias("doc_id"))
                    .distinct(),
                    "doc_id",
                    "left_anti",
                )
                .localCheckpoint()
            )
            extract_batch = batch.join(surv_ids, "doc_id")
            dd["surv_sigs"] = dd["new_sigs"].join(surv_ids, "doc_id")
        kg = build_kg(extract_batch, prof=prof)  # extraction — ONE job
        new_triples = kg["triples"].localCheckpoint()
        # Epoch-partitioned writes must survive a RETRY of this epoch
        # (the failed attempt's rows for this batch's docs must go — a
        # zero-row re-run would otherwise leave them behind under
        # dynamic overwrite) AND an epoch-counter COLLISION after
        # checkpoint loss (the restarted counter's partition can hold
        # COMMITTED rows for docs the anti-join just suppressed — those
        # must survive). _epoch_idempotent_write implements the
        # survivor-union protocol for all three epoch tables.
        _epoch_idempotent_write(
            spark, "triples_raw", out_dir, new_triples, epoch_id, batch_ids
        )
        # distinct-sketch panel rides on the raw partition (see helper);
        # before the seen-commit, so any crash re-derives it with raw
        _write_epoch_sketches(spark, out_dir, epoch_id)
        if dd is not None:
            _epoch_idempotent_write(
                spark, "dup_flags", out_dir, dd["flags"], epoch_id,
                batch_ids, key_col="new_doc_id",
            )
            _epoch_idempotent_write(
                spark, "dedup_sigs", out_dir, dd["surv_sigs"], epoch_id,
                batch_ids,
            )
        linked = O_link.link_entities(new_triples, aliases)
        if labels is not None:
            linked = O_canon.apply_canonical_labels(linked, labels)
        for name, batch_tbl, merge in [
            ("ksg_edges", O_agg.aggregate_edges(linked), _merge_edges),
            ("ksg_nodes", O_agg.aggregate_nodes(linked), _merge_nodes),
        ]:
            if storage.table_exists(spark, name, out_dir):
                merged = merge(storage.read_table(spark, name, out_dir), batch_tbl)
            else:
                merged = batch_tbl
            storage.write_table(merged.localCheckpoint(), name, out_dir)
        # commit point: once this lands, the batch never re-runs
        storage.write_table(batch_ids, "doc_ids_seen", out_dir, mode="append")

    writer = stream.writeStream.foreachBatch(upsert).trigger(availableNow=True)

    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()
    return q


def rebuild_aggregates(
    spark: SparkSession,
    out_dir: str,
    aliases: DataFrame | None = None,
) -> None:
    """Repair path for the at-least-once merge window: recompute
    ksg_edges/ksg_nodes from triples_raw, which the epoch-partitioned
    dynamic overwrite keeps exactly-once (upsert docstring, step 1).
    Also the correct rebuild after restoring an out_dir from backup."""
    raw = storage.read_table(spark, "triples_raw", out_dir)
    for c in ("epoch", "part_id"):
        if c in raw.columns:
            raw = raw.drop(c)
    linked = O_link.link_entities(raw, aliases)
    if aliases is not None:
        linked = O_canon.apply_canonical_labels(
            linked, O_canon.alias_cc_labels(aliases)
        )
    storage.write_table(
        O_agg.aggregate_edges(linked).localCheckpoint(), "ksg_edges", out_dir
    )
    storage.write_table(
        O_agg.aggregate_nodes(linked).localCheckpoint(), "ksg_nodes", out_dir
    )


def stateful_doc_dedup(stream_docs: DataFrame) -> DataFrame:
    """O26 — custom stateful operator: emit each doc_id the FIRST time it
    is seen across micro-batches (re-delivery suppression), via
    ``applyInPandasWithState`` keyed by doc_id. In production the state
    is bounded with a watermark timeout; here NoTimeout keeps the demo
    deterministic."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        n_new = 0
        for pdf in pdfs:
            n_new += len(pdf)
        if state.exists:
            (seen,) = state.get
            state.update((seen + n_new,))
            return iter(())  # already emitted once
        state.update((n_new,))
        return iter([pd.DataFrame({"doc_id": [key[0]]})])

    return stream_docs.groupBy("doc_id").applyInPandasWithState(
        fn,
        outputStructType="doc_id string",
        stateStructType="seen long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def watermarked_doc_dedup(
    stream_docs: DataFrame, ts_col: str = "ingest_ts", delay: str = "1 hour"
) -> DataFrame:
    """O25 — watermark-bounded re-delivery suppression via
    ``dropDuplicatesWithinWatermark``: doc_id dedup state is kept only
    for the watermark horizon, so state size is bounded by the
    re-delivery window instead of growing with the all-time document
    count. This is the scale-correct production form of
    stateful_doc_dedup (whose NoTimeout state grows forever — kept as
    the deterministic applyInPandasWithState demo, O26)."""
    return stream_docs.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        ["doc_id"]
    )


def windowed_event_counts(events: DataFrame) -> DataFrame:
    """Harness coverage for watermark + tumbling window aggregation over
    the events table (the reference has no event-time concept — this is
    the engine's streaming-agg surface, SURVEY.md O26)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n",
            "total",
        )
    )


def epoch_diff(
    spark: SparkSession,
    out_dir: str,
    epoch_a: int,
    epoch_b: int,
) -> DataFrame:
    """What changed in the graph between two ingest checkpoints: the
    edge changelog (operators/kgdiff.diff_edges) between the KG state
    as-of ``epoch_a`` and as-of ``epoch_b`` (state = every triples_raw
    partition with epoch ≤ e — triples_raw is the exactly-once record,
    see upsert step 1, so as-of states are exact regardless of the
    aggregate tables' at-least-once window).

    Scale shape: the epoch predicates are PARTITION PRUNING on the
    epoch-partitioned table — the a-side scan reads only epochs ≤
    min(a, b) ∪ nothing extra, and diff_edges pre-aggregates each side
    before its single full-outer join."""
    from naruhodo_spark.operators import kgdiff as KD

    raw = storage.read_table(spark, "triples_raw", out_dir)

    def snap(e: int) -> DataFrame:
        s = raw.where(F.col("epoch") <= int(e)).select(
            "subj", "pred", "obj"
        )
        return s.withColumn("weight", F.lit(1))

    return KD.diff_edges(snap(epoch_a), snap(epoch_b))
