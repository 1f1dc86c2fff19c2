"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit", "queries": {name: sec}, "sf", ...}.

Headliners:
- kg_pipeline: the full text→KG build (normalize → chunk → triples →
  coref → link → canonicalize → aggregate) over the sf documents table
  lifted to spans and replicated ×REPLICATE for a meaningful working set.
  The spans input is pre-materialized as a multi-file parquet table
  OUTSIDE the timer — the shape a production Iceberg bucket(doc_id)
  table has — so the timed region measures the pipeline, not a
  single-file scan bottleneck (same protocol as BENCH/bench_scale.py).
- relational: TPC-H-ish q1/q3/q5 on the sf lineitem (600k rows at sf0.1).
- dedup + similarity + textstats sweeps over documents/embeddings.

All timings are wall-clock around a terminal no-op write (format("noop"))
so the full plan executes without driver-side collection. Each query runs
RUNS times and the minimum is reported (standard warm-path protocol;
run-to-run variance on a shared box is otherwise the dominant signal).
Persisted RDDs (lazy localCheckpoints inside the dedup plans) are
unpersisted between queries so one query's cache pressure cannot poison
the next.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
# 96 × 5000 = 480k docs: large enough that the pipeline's ~2-3 s of
# fixed job overhead stops dominating the docs/sec readout
REPLICATE = int(os.environ.get("BENCH_REPLICATE", "96"))
RUNS = int(os.environ.get("BENCH_RUNS", "3"))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _clear_persisted(spark) -> None:
    """Unpersist every persisted RDD (incl. lazy localCheckpoints)."""
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rdd in list(jmap.values()):
            rdd.unpersist(False)
    except Exception:
        pass
    spark.catalog.clearCache()


#: per-query raw walls + the 1-min load average sampled before each
#: query, exported into the JSON so a round-over-round comparison can
#: adjudicate box-load noise from the artifact alone (VERDICT r04
#: "What's wrong #1" — the quiet-box reconciliation used to live in an
#: out-of-band note). Reset by run()/run_kg() callers via main().
RUN_DETAIL: dict[str, list[float]] = {}
LOAD_DETAIL: dict[str, float] = {}


def _timed(fn, runs: int = RUNS, cleanup=None, name: str | None = None) -> float:
    """min-of-runs wall clock; ``cleanup`` runs BETWEEN repetitions
    (outside the timer) so run N's lazy localCheckpoints don't stack
    cached state under run N+1 — at larger SF the stale copies caused
    eviction/spill in the later runs, distorting the warm-path signal.
    When ``name`` is given, every run's wall and the pre-query 1-min
    load average are recorded for the JSON artifact."""
    if name is not None:
        try:
            LOAD_DETAIL[name] = round(os.getloadavg()[0], 2)
        except OSError:
            pass
    walls: list[float] = []
    for i in range(runs):
        t0 = time.time()
        fn()
        walls.append(round(time.time() - t0, 3))
        if cleanup is not None and i < runs - 1:
            cleanup()
    if name is not None:
        RUN_DETAIL[name] = walls
    return round(min(walls), 3)


def materialize_docs(spark, sf_dir: str, replicate: int, path: str):
    """Replicated spans corpus → multi-file parquet (NOT timed)."""
    from naruhodo_spark import synth
    from naruhodo_spark.operators.normalize import flat_to_spans

    flat = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = flat_to_spans(flat)
    if replicate > 1:
        docs = synth.replicate_docs(docs, replicate)
    cores = spark.sparkContext.defaultParallelism
    docs.repartition(cores * 3, "doc_id").write.mode("overwrite").parquet(path)
    out = spark.read.parquet(path)
    return out.count(), out


def run_kg(spark, sf_dir: str = SF_DIR, replicate: int = REPLICATE) -> dict:
    """KG pipeline timing (input materialization + count OUTSIDE the
    timer). Run on the task.cpus=2 session — see main()."""
    from pyspark.sql import functions as F

    from naruhodo_spark import synth
    from naruhodo_spark.pipeline import build_kg

    out: dict[str, float] = {}
    tmp = tempfile.mkdtemp(prefix="bench_docs_")
    try:
        n_docs, docs = materialize_docs(spark, sf_dir, replicate, tmp)
        aliases = synth.alias_dictionary(spark)
        # triple count rides the timed runs as an OBSERVATION on the
        # noop write (pipeline.finalize's O37 pattern) — previously a
        # fifth full pipeline execution ran after timing just to count
        last_count = {}

        def run_once():
            from pyspark.sql import Observation

            obs = Observation()
            edges = build_kg(docs, aliases=aliases)["ksg_edges"]
            _noop(edges.observe(obs, F.sum("weight").alias("w")))
            last_count["triples"] = int(obs.get["w"] or 0)

        kg_sec = _timed(run_once, name="kg_pipeline")
        out["kg_pipeline"] = kg_sec
        n_triples = last_count["triples"]
        out["kg_docs"] = n_docs
        out["kg_triples"] = n_triples
        out["kg_docs_per_sec"] = round(n_docs / kg_sec, 1)
        out["kg_triples_per_sec"] = round(n_triples / kg_sec, 1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    _clear_persisted(spark)
    return out


def run(spark, sf_dir: str = SF_DIR, replicate: int = REPLICATE,
        kg_result: dict | None = None) -> dict:
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    if kg_result is None:
        kg_result = run_kg(spark, sf_dir, replicate)
    timings["kg_pipeline"] = kg_result["kg_pipeline"]
    extras.update(
        {k: v for k, v in kg_result.items() if k != "kg_pipeline"}
    )

    from naruhodo_spark import queries as Q

    # --- headline operator queries ---
    for name in [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_region_revenue",
        "win_running_total",
        "win_sessionize",
        "agg_cube_events",
        "dd_minhash_lsh_pairs",
        "dd_ngram_jaccard_pairs",
        "dd_near_dup_groups",
        "ts_quality",
        "ts_langid",
        "td_decontam",
        "ts_source_quota",
        # added r03 (total is not like-for-like vs r02 — see
        # BENCH/BASELINE.md protocol notes)
        "ts_mix_corpus",
        "dd_dup_spans",
        "sim_semantic_dedup",
        "td_dsir_scores",
        "dd_incremental",
        "ts_bpe_pieces",
        "ts_lm_perplexity",
        "kg_snapshot_diff",
        "kg_entity_split",
        "td_walk_pairs",
        "kg_predicate_synonyms",
        "td_contrastive_pairs",
        "kg_triangle_stats",
        "ts_corpus_report",
        "sim_pq_topk",
        # added late-r03
        "dd_simhash_near_dups",
        # added r04 (query-set change — not like-for-like vs r03 totals)
        "kg_motif_peers",
        "mm_caption_pairs",
        "ts_length_quantiles",
        "td_hard_negatives",
        "kg_incremental_cc",
        "kg_event_graph",
        # added r05 (query-set change — not like-for-like vs r04 totals)
        "kg_hearst_hypernyms",
        "er_blocked_matches",
        "kg_graph_summary",
        "kg_ntriples_lines",
        # added r05 session-3 (query-set change — not like-for-like vs
        # earlier totals)
        "kg_inferred_edges",
        "kg_sparql_select",
        "kg_top_facts",
        # added r05 session-4 (query-set change — not like-for-like vs
        # earlier totals)
        "kg_sparql_analytics",
        "kg_sparql_construct",
        "kg_fused_facts",
        "kg_truth_finding",
        "kg_cardinality_violations",
        # added r05 session-6 (query-set change — not like-for-like vs
        # earlier totals)
        "kg_sparql_closure",
        "kg_rdfs_entailed",
        "kg_shacl_report",
        "kg_smushed_graph",
        "kg_k_core",
        "kg_owl_entailed",
        # added r05 session-7 (query-set change — not like-for-like vs
        # earlier totals)
        "kg_quotient_summary",
        "kg_modularity_roles",
        "kg_allen_relations",
        "kg_aligned_entities",
        "kg_link_scores",
        "kg_k_truss",
    ]:
        timings[name] = _timed(
            lambda: _noop(Q.QUERIES[name](spark, sf_dir)),
            cleanup=lambda: _clear_persisted(spark),
            name=name,
        )
        _clear_persisted(spark)

    # sim paths timed individually (the registry's sim_topk_ivf surface
    # unions both paths for the correctness check — here we want each
    # path's own number: Catalyst array folds vs per-cell BLAS GEMM)
    from naruhodo_spark.ops import similarity as SIM

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    for name, fn in [
        ("sim_topk_ivf", SIM.topk_ivf),
        ("sim_topk_ivf_blas", SIM.topk_ivf_blas),
    ]:
        timings[name] = _timed(lambda fn=fn: _noop(fn(emb, k=3)), name=name)
        _clear_persisted(spark)

    total = round(sum(timings.values()), 3)
    return {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        # noise-adjudication detail (VERDICT r04): every wall of every
        # min-of-RUNS query, plus the pre-query 1-min load average — a
        # row whose best wall regressed but whose own walls spread >20%
        # (or whose loadavg exceeded the core count) is box load, not a
        # plan change, and the artifact now shows that by itself
        "query_runs": dict(RUN_DETAIL),
        "query_loadavg": dict(LOAD_DETAIL),
        "runs_per_query": RUNS,
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        **extras,
    }


def _warmup(spark, cpus: int) -> None:
    """JVM codegen, parquet reader, AND the Python worker pool + Arrow
    path (a small fused pipeline forks the pandas workers and imports
    numpy/pandas on every core) — all outside the timings."""
    from naruhodo_spark import synth
    from naruhodo_spark.pipeline import build_kg

    spark.range(1000000).selectExpr("sum(id)").collect()
    wdocs = synth.synth_documents(spark, 256, num_partitions=cpus)
    build_kg(wdocs, aliases=synth.alias_dictionary(spark))[
        "ksg_edges"
    ].write.format("noop").mode("overwrite").save()


def main() -> None:
    from naruhodo_spark.session import get_spark

    cpus = int(CPUS)
    # Phase 1 — the KG pipeline, with spark.task.cpus=2: a pandas-UDF
    # task occupies one JVM thread AND one Python worker, so admitting
    # `cores` concurrent tasks on a `cores`-vcpu box double-subscribes
    # the CPU (measured here: 30k docs/s at local[32]/task.cpus=1 vs
    # 74k at local[32]/task.cpus=2 vs 62k at local[16] — same workload).
    # Same setting a production cluster uses for pandas-UDF-heavy jobs.
    spark = get_spark(
        app_name="naruhodo_spark-bench-kg", master=f"local[{cpus}]",
        shuffle_partitions=cpus, extra_conf={"spark.task.cpus": "2"},
    )
    _warmup(spark, cpus)
    kg_result = run_kg(spark)
    spark.stop()

    # Phase 2 — everything else (Catalyst-dominated): plain task sizing
    spark = get_spark(
        app_name="naruhodo_spark-bench", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    _warmup(spark, cpus)
    result = run(spark, kg_result=kg_result)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
