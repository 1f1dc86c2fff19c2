"""End-to-end KG construction pipeline (SURVEY.md §3.2 EP1′/EP2′).

Dataflow: spans documents → normalize/split (Catalyst) → chunker
(mapInPandas) → triples (relational join+agg) → pronoun windows →
carryover → broadcast alias linking → CC canonicalization → node/edge
aggregation → graph tables, with per-partition manifest rows for
kill-resume [B BASELINE.json:6].
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from naruhodo_spark import lang as L
from naruhodo_spark import storage
from naruhodo_spark.operators import agg as O_agg
from naruhodo_spark.operators import canon as O_canon
from naruhodo_spark.operators import chunk as O_chunk
from naruhodo_spark.operators import coref as O_coref
from naruhodo_spark.operators import fused as O_fused
from naruhodo_spark.operators import link as O_link
from naruhodo_spark.operators import normalize as O_norm
from naruhodo_spark.operators import triples as O_triples


def extract_document_triples(
    docs_spans: DataFrame,
    prof: dict | None = None,
    triple_plan: str = "relational",
    persist_chunks: bool = True,
) -> dict[str, DataFrame]:
    """Stages O7–O18: documents → chunks/DSG/raw-resolved triples."""
    prof = prof or L.get_profile("en")
    sents = O_norm.split_sentences(docs_spans, prof)
    chunks = O_chunk.chunk_sentences(sents, prof)
    if persist_chunks:
        # chunks feed DSG + triples + occurrence windows (SURVEY.md §4.4:
        # one of exactly two persisted frontiers)
        chunks = chunks.persist(StorageLevel.MEMORY_AND_DISK)

    dsg_nodes, dsg_edges = O_triples.dsg_tables(chunks)
    if triple_plan == "pandas":
        t = O_triples.extract_triples_pandas(chunks, prof)
    else:
        t = O_triples.extract_triples(chunks, prof)

    occ = O_coref.resolve_pronouns(O_coref.entity_occurrences(chunks))
    t = O_coref.attach_resolution(t, occ)
    t = O_coref.carryover_subjects(t)
    return {
        "sentences": sents,
        "chunks": chunks,
        "dsg_nodes": dsg_nodes,
        "dsg_edges": dsg_edges,
        "triples": t,
    }


def build_kg(
    docs_spans: DataFrame,
    prof: dict | None = None,
    aliases: DataFrame | None = None,
    salted: bool | str = False,
    salt_buckets: int = 16,
    triple_plan: str = "fused",
    num_partitions: int | None = None,
) -> dict[str, DataFrame]:
    """Full KSG+DSG build; returns every stage as a lazy DataFrame.

    triple_plan:
    - "fused" (default, production): one mapInPandas pass per document —
      zero shuffles before the global aggregation (operators/fused.py).
    - "relational": join + window plan (O12a/O13/O14) — the independently
      implemented twin used for cross-verification and operator demos.
    - "pandas": applyInPandas per-document grouping (O12b).

    num_partitions: explicit doc_id repartition before extraction
    [B BASELINE.json:6 "over document partitions"]. Leave None when the
    source table is already well-partitioned (Iceberg bucket(doc_id));
    set it when reading few/large files whose split count is below the
    cluster's parallelism.
    """
    prof = prof or L.get_profile("en")
    if num_partitions:
        docs_spans = docs_spans.repartition(num_partitions, "doc_id")

    linked = None
    if triple_plan == "fused":
        canon_bc = None
        if aliases is not None and not aliases.isStreaming:
            # ONE probe job: collect up to threshold+1 rows; small dicts
            # reuse the same rows for the union-find (no second scan)
            head = aliases.select("alias", "canonical_id", "etype").limit(
                O_canon.DRIVER_CC_THRESHOLD + 1
            ).collect()
            if len(head) <= O_canon.DRIVER_CC_THRESHOLD:
                # O19+O20 fused into the map pass: the alias dictionary is
                # broadcast-sized by contract, so link+canonicalize via a
                # broadcast variable — no join, no extra shuffle.
                canon_bc = docs_spans.sparkSession.sparkContext.broadcast(
                    O_canon.alias_canonical_map_rows(head)
                )
        t = O_fused.extract_triples_fused(docs_spans, prof, canon_bc).drop(
            "subj_id", "obj_id"
        )
        if canon_bc is not None:
            # linked view: alias-derived etypes replace the tagger's;
            # the pre-link `triples` stage keeps raw etypes (identical
            # across plans and alias-dictionary sizes)
            linked = (
                t.drop("subj_ne", "obj_ne")
                .withColumnRenamed("subj_ne_linked", "subj_ne")
                .withColumnRenamed("obj_ne_linked", "obj_ne")
            )
            t = t.drop("subj_ne_linked", "obj_ne_linked", "subj_canon", "obj_canon")
        # sentence/chunk/DSG surfaces stay available lazily via the
        # unfused operators (only executed if the caller materializes them)
        sents = O_norm.split_sentences(docs_spans, prof)
        chunks = O_chunk.chunk_sentences(sents, prof)
        dsg_nodes, dsg_edges = O_triples.dsg_tables(chunks)
        stages = {
            "sentences": sents,
            "chunks": chunks,
            "dsg_nodes": dsg_nodes,
            "dsg_edges": dsg_edges,
            "triples": t,
        }
    else:
        stages = extract_document_triples(docs_spans, prof, triple_plan)

    if linked is None:
        linked = O_link.link_entities(stages["triples"], aliases)
        if aliases is not None:
            labels = O_canon.alias_cc_labels(aliases)
            linked = O_canon.apply_canonical_labels(linked, labels)
    stages["triples_linked"] = linked
    t = linked
    if salted == "auto":
        # eager skew probe at CALL time — opt-in for build_kg, whose
        # default contract stays fully lazy; the stored-triples paths
        # (finalize/run_partitioned) default to auto. The probe sits at
        # the END of the extraction DAG, so the linked triples are
        # lazily local-checkpointed FIRST: the probe's sampled job
        # materializes the extraction once and every downstream
        # aggregation reuses the checkpoint instead of re-running
        # sentence-split → chunk → extract a second time.
        t = t.localCheckpoint(eager=False)
        stages["triples_linked"] = t
        salted = O_agg.should_salt_edges(t)
    stages["ksg_edges"] = (
        O_agg.aggregate_edges_salted(t, salt_buckets)
        if salted
        else O_agg.aggregate_edges(t)
    )
    stages["ksg_nodes"] = O_agg.aggregate_nodes(t)
    stages["edge_provenance"] = O_agg.edge_provenance(t)
    return stages


# ---------------------------------------------------------------------
# Partitioned run with manifest + kill-resume (O21/O36–O38)
# ---------------------------------------------------------------------

def with_part_id(docs: DataFrame, n_parts: int) -> DataFrame:
    """Stable partition id: content hash of doc_id — identical across
    runs, cluster sizes, and input orderings (never
    monotonically_increasing_id, SURVEY.md §7.3)."""
    return docs.withColumn(
        "part_id",
        F.pmod(F.xxhash64("doc_id"), F.lit(n_parts)).cast("int"),
    )


def _fingerprint_col():
    """Order-independent CONTENT fingerprint of a partition's documents
    (bit_xor of per-doc hashes over id + spans — commutative, and unlike
    sum() safe under ANSI overflow checking)."""
    return F.format_string("%016x", F.expr("bit_xor(xxhash64(doc_id, spans))"))


def pending_parts(spark: SparkSession, docs_p: DataFrame, out_dir: str) -> DataFrame:
    """O21 resume anti-join, lineage-aware (O38): a partition is done only
    if the manifest has a row for it AND the recorded input fingerprint
    still matches the current input — a partition whose documents changed
    since the last run is reprocessed, not skipped."""
    if not storage.table_exists(spark, "_manifest", out_dir):
        return docs_p
    manifest = storage.read_table(spark, "_manifest", out_dir)
    # latest manifest row per part (parts can be re-recorded after a
    # changed-input rerun)
    latest = (
        manifest.groupBy("part_id")
        .agg(F.max(F.struct("ts", "input_fingerprint")).alias("m"))
        .select("part_id", F.col("m.input_fingerprint").alias("done_fp"))
    )
    current = docs_p.groupBy("part_id").agg(_fingerprint_col().alias("cur_fp"))
    done = (
        current.join(F.broadcast(latest), "part_id")
        .where(F.col("cur_fp") == F.col("done_fp"))
        .select("part_id")
    )
    return docs_p.join(F.broadcast(done), "part_id", "left_anti")


def _manifest_total_triples(spark: SparkSession, out_dir: str) -> int:
    if not storage.table_exists(spark, "_manifest", out_dir):
        return 0
    row = (
        storage.read_table(spark, "_manifest", out_dir)
        .groupBy("part_id")  # latest row per part (reruns append)
        .agg(F.max(F.struct("ts", "triple_count")).alias("m"))
        .agg(F.sum("m.triple_count"))
        .first()
    )
    return int(row[0] or 0)


def run_partitioned(
    spark: SparkSession,
    docs_spans: DataFrame,
    out_dir: str,
    n_parts: int = 32,
    prof: dict | None = None,
    aliases: DataFrame | None = None,
    salted: bool | str = "auto",
    run_id: str | None = None,
    wave_parts: int | None = None,
    provenance: bool = False,
) -> dict[str, int]:
    """EP1′/EP2′: process only not-yet-done partitions, append their raw
    triples (partitioned by part_id — dynamic partition overwrite makes a
    re-run of a half-written partition idempotent), record manifest rows
    with lineage fingerprint + counters, then finalize the aggregated
    graph tables from ALL triples (cheap re-agg).

    ``wave_parts``: commit granularity. None = one wave (one Spark job
    for all pending partitions; manifest committed at the end — a kill
    mid-job reprocesses everything pending). Setting it processes the
    pending partitions in WAVES of that many parts, appending the
    manifest after each wave, so a killed job loses at most one wave of
    work instead of the whole run [B BASELINE.json:6 "killed job resumes
    without recomputation"]. Wave cost is one extra Spark job + manifest
    append each — keep waves ≳ the cluster's core count of partitions.

    Returns counters {parts_processed, docs, triples}.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    # dynamic partition overwrite is scoped per-writer inside
    # storage.write_table — never set session-globally (it would change
    # the semantics of the caller's own unrelated overwrites)

    docs_p = with_part_id(docs_spans, n_parts)
    todo = pending_parts(spark, docs_p, out_dir)
    # Materialize the pending per-part doc stats driver-side ONCE (≤ n_parts
    # rows) — everything downstream must not lazily re-read `_manifest`
    # after we append to it (re-evaluation would see its own output).
    part_stats = {
        r["part_id"]: (r["doc_count"], r["input_fingerprint"])
        for r in todo.groupBy("part_id")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            # O38 lineage: order-independent content fingerprint of inputs
            # (bit_xor: commutative, no ANSI long-overflow unlike sum)
            _fingerprint_col().alias("input_fingerprint"),
        )
        .collect()
    }
    if not part_stats:
        finalize(spark, out_dir, aliases=aliases, salted=salted,
                 provenance=provenance)
        return {
            "parts_processed": 0,
            "docs": 0,
            "triples": _manifest_total_triples(spark, out_dir),
        }

    prof = prof or L.get_profile("en")
    pending_ids = sorted(part_stats)
    wave_n = wave_parts or len(pending_ids)
    waves = [
        pending_ids[i : i + wave_n] for i in range(0, len(pending_ids), wave_n)
    ]
    todo = todo.persist(StorageLevel.MEMORY_AND_DISK) if len(waves) > 1 else todo
    for wave in waves:
        wave_df = (
            todo if len(waves) == 1 else todo.where(F.col("part_id").isin(wave))
        )
        wave_df = wave_df.repartition(min(n_parts, len(wave)), "part_id")
        raw = O_fused.extract_triples_fused(wave_df.drop("part_id"), prof).drop(
            "subj_id", "obj_id"
        )
        triples = with_part_id(raw, n_parts).persist()
        # pre-drop the wave's partitions: dynamic overwrite only replaces
        # partitions PRESENT in the written frame, so a reprocessed part
        # whose new input extracts zero triples would otherwise keep its
        # stale rows from the previous run (a crash between the delete
        # and the write is safe — the manifest still marks those parts
        # pending, so resume re-extracts them)
        storage.delete_partitions(spark, "triples_raw", out_dir, "part_id", wave)
        storage.write_table(
            triples, "triples_raw", out_dir, mode="overwrite",
            partition_by=["part_id"],
        )
        # exactly-once accounting from the persisted frame we just wrote
        triple_counts = {
            r["part_id"]: r["n"]
            for r in triples.groupBy("part_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        manifest_rows = [
            (int(pid), int(part_stats[pid][0]),
             int(triple_counts.get(pid, 0)), part_stats[pid][1], run_id)
            for pid in wave
        ]
        manifest = spark.createDataFrame(
            manifest_rows,
            schema="part_id int, doc_count long, triple_count long,"
            " input_fingerprint string, run_id string",
        ).withColumn("ts", F.current_timestamp())
        # the wave is durable once this append lands — a kill after this
        # point never reprocesses the wave's partitions
        storage.write_table(manifest, "_manifest", out_dir, mode="append")
        triples.unpersist()
    if len(waves) > 1:
        todo.unpersist()
    finalize(spark, out_dir, aliases=aliases, salted=salted,
             provenance=provenance)
    return {
        "parts_processed": len(pending_ids),
        "docs": int(sum(dc for dc, _ in part_stats.values())),
        "triples": _manifest_total_triples(spark, out_dir),
    }


def finalize(
    spark: SparkSession,
    out_dir: str,
    aliases: DataFrame | None = None,
    salted: bool | str = "auto",
    provenance: bool = False,
) -> None:
    """Aggregate ALL raw triples into the canonical graph tables.

    ``salted="auto"`` (default — the production setting): a cheap skew
    probe (operators/agg.should_salt_edges — one sampled map pass + a
    sample-sized aggregation) picks the salted two-phase plan when the
    hottest canonical edge would hog a reduce task, the plain
    single-shuffle plan otherwise. Pass True/False to force either.

    ``provenance=True`` additionally writes the edge_provenance lineage
    table (operators/agg.edge_provenance)."""
    if not storage.table_exists(spark, "triples_raw", out_dir):
        return
    t = storage.read_table(spark, "triples_raw", out_dir)
    # O37: pipeline counters ride the write action itself (no extra job);
    # visible to QueryExecutionListeners and the Spark UI
    t = t.observe(
        "finalize_counters",
        F.count(F.lit(1)).alias("n_triples"),
        F.approx_count_distinct("doc_id").alias("n_docs_approx"),
        F.approx_count_distinct("subj").alias("n_subjects_approx"),
    )
    t = O_link.link_entities(t, aliases)
    if aliases is not None:
        labels = O_canon.alias_cc_labels(aliases)
        t = O_canon.apply_canonical_labels(t, labels)
    if salted == "auto":
        salted = O_agg.should_salt_edges(t)
    edges = (
        O_agg.aggregate_edges_salted(t) if salted else O_agg.aggregate_edges(t)
    )
    nodes = O_agg.aggregate_nodes(t)
    storage.write_table(edges, "ksg_edges", out_dir)
    storage.write_table(nodes, "ksg_nodes", out_dir)
    if provenance:
        storage.write_table(
            O_agg.edge_provenance(t), "edge_provenance", out_dir
        )
