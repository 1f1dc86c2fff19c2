"""Physical-plan regression guards (docs/PLANS.md made executable):
the scale properties the 100 TB design assumes — filters reaching the
parquet scan, column pruning, broadcast joins for small sides, subquery
decorrelation — asserted on the compiled plans so a refactor that
silently loses one fails here, not on a cluster."""

import pytest

from naruhodo_spark import queries as Q

SF = "/root/testdata/sf0.01"


def _plan(spark, name: str) -> str:
    df = Q.QUERIES[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_pushdown_and_pruning(spark):
    p = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in p
    # projection pruning: the 7 referenced columns only — l_orderkey and
    # l_partkey must NOT be read
    assert "ReadSchema" in p
    sch = p.split("ReadSchema:", 1)[1]
    assert "l_returnflag" in sch and "l_orderkey" not in sch


def test_q6_all_predicates_pushed(spark):
    p = _plan(spark, "q6_forecast_revenue")
    for c in ("l_shipdate", "l_discount", "l_quantity"):
        assert f"IsNotNull({c})" in p or c in p.split("PushedFilters", 1)[1]


def test_q3_broadcasts_dimensions(spark):
    assert "BroadcastHashJoin" in _plan(spark, "q3_shipping_priority")


def test_q4_exists_decorrelates_to_semijoin(spark):
    p = _plan(spark, "q4_priority_exists")
    assert "LeftSemi" in p


def test_q17_scalar_subquery_decorrelates(spark):
    p = _plan(spark, "q17_small_qty_revenue")
    # correlated scalar subquery → per-part aggregate joined back, no
    # per-row subquery node
    assert "avg(l_quantity)" in p and "Subquery" not in p


def test_asof_join_is_single_window_no_cross_product(spark):
    p = _plan(spark, "join_asof_attribution")
    assert "Window" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_range_join_stays_equi_join(spark):
    p = _plan(spark, "join_range_activation")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_mix_corpus_is_map_only(spark):
    # domain-weight mixing is one narrow explode over the scan: any
    # Exchange here means the upsampling started shuffling the corpus
    p = _plan(spark, "ts_mix_corpus")
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_dup_spans_no_cross_product_no_python(spark):
    # exact-substring span dedup must stay pure Catalyst (window hashing
    # + uniform-key aggs + equi-joins); no all-pairs node, no Python UDF
    p = _plan(spark, "dd_dup_spans")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_semantic_dedup_no_cross_product(spark):
    # the only pair generation is the same-cell equi-join inside
    # embedding_near_dups; CC + group-size join are equi-joins too
    p = _plan(spark, "sim_semantic_dedup")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_incremental_dedup_no_cross_product_no_python(spark):
    # incremental near-dup vs the signature index: every pair-producing
    # stage is a (band_idx, band_hash) equi-join — uniform md5 key by
    # construction — and the estimator is a column expression over the
    # joined signature vectors; no all-pairs node, no Python UDF, and no
    # corpus-text access on the index side
    p = _plan(spark, "dd_incremental")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_bpe_encode_python_only_on_distinct_words(spark):
    # BPE encoding: the MapInPandas encoder must sit DOWNSTREAM of the
    # distinct-words aggregation (Python bounded by |vocab|, never the
    # corpus); the corpus re-join is an equi-join — no all-pairs node
    from naruhodo_spark.ops import bpe as B

    docs = Q._t(spark, SF, "documents").select("doc_id", "text")
    df = B.bpe_encode(docs, [("t", "h"), ("th", "e"), ("the", "</w>")])
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "MapInPandas" in p or "ArrowEvalPython" in p
    # the Python stage's subtree must contain the distinct-words
    # HashAggregate, i.e. Python never reads the raw scan directly
    python_subtree = p.split("MapInPandas", 1)[1] if "MapInPandas" in p \
        else p.split("ArrowEvalPython", 1)[1]
    assert "HashAggregate" in python_subtree


def test_lm_scoring_pure_catalyst_no_cross_product(spark):
    # Stupid-Backoff scoring: 2n−1 equi-joins against the model table +
    # one bounded per-doc agg — no Python nodes, no all-pairs join; the
    # only crossJoin is the 1-row broadcast total
    p = _plan(spark, "ts_lm_perplexity")
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "MapInPandas" not in p


def test_kg_snapshot_diff_full_outer_no_python(spark):
    # the diff is ONE null-safe full-outer equi-join over pre-aggregated
    # sides — no all-pairs node, no Python, and the join really is
    # FullOuter (a refactor to inner+anti unions would triple the scans)
    p = _plan(spark, "kg_snapshot_diff")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "MapInPandas" not in p
    assert "FullOuter" in p


def test_kg_entity_split_no_cross_product_no_python(spark):
    # entity-partitioned LSH + candidate-only Jaccard + CC: banding and
    # verification are equi-joins keyed by (entity, ...); no Python node
    # anywhere (the CC dispatch may run driver-side union-find, which
    # appears as a LocalTableScan of labels, not a Python eval)
    p = _plan(spark, "kg_entity_split")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "MapInPandas" not in p


def test_td_walk_pairs_no_cross_product_no_python(spark):
    # walk growth = bounded equi-joins on (cur, idx); pair expansion =
    # in-array HOFs — no all-pairs node, no Python anywhere
    p = _plan(spark, "td_walk_pairs")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "MapInPandas" not in p


def test_kg_predicate_synonyms_no_cross_product_no_python(spark):
    # inverted index on the hashed argument pair + candidate-only
    # Jaccard + CC — no all-pairs predicate join, no Python node
    p = _plan(spark, "kg_predicate_synonyms")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "MapInPandas" not in p


def test_td_contrastive_pairs_no_cross_product_no_python(spark):
    # positives: two bounded aggs + joins on group_id; negatives:
    # bucket equi-join + min_by — no all-pairs node, no Python
    p = _plan(spark, "td_contrastive_pairs")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "MapInPandas" not in p


def test_kg_triangle_stats_no_cross_product_no_python(spark):
    # degree-ordered orientation: wedge join + closure join are
    # equi-joins; no all-pairs node, no Python
    p = _plan(spark, "kg_triangle_stats")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "MapInPandas" not in p


def test_topk_global_takeordered(spark):
    # global top-k must compile to TakeOrderedAndProject (per-partition
    # heaps + driver merge of k rows), never a full global Sort
    p = _plan(spark, "topk_global_orders")
    assert "TakeOrderedAndProject" in p


def test_sim_pq_topk_scan_reads_codes_only(spark):
    # the ADC scan must be map-only over (vec_id, codes): no join, no
    # Python, and TakeOrderedAndProject for the top-k
    p = _plan(spark, "sim_pq_topk")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "MapInPandas" not in p
    assert "TakeOrderedAndProject" in p


def test_dd_simhash_near_dups_banded_equi_join(spark):
    # candidates come from an equi-join on (band_idx, band_val) — never
    # an all-pairs node; the only Python is the one simhash signature
    # MapInPandas; the Hamming filter is JVM bit_count
    p = _plan(spark, "dd_simhash_near_dups")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # the signature MapInPandas runs ONCE behind a lazy localCheckpoint
    # (4 consumers: two self-join sides + two hot-bucket probes)
    assert p.count("MapInPandas") <= 1
    assert "bit_count" in p


def test_kg_distinct_sketches_partial_agg(spark):
    # HLL sketches must partial-aggregate (map-side combine) so shuffle
    # volume is n_groups × ~2KB, and nothing touches Python
    p = _plan(spark, "kg_distinct_sketches")
    assert "hll_sketch_agg" in p and "hll_union_agg" in p
    assert "partial_hll" in p.lower() or "partial" in p.lower()
    assert "CartesianProduct" not in p


def test_kg_landmark_distances_no_cross_product_no_python(spark):
    # each BFS round is a frontier equi-join + anti-join on the
    # (node, landmark) composite key — no all-pairs, no Python beyond
    # the pipeline's extraction stage
    p = _plan(spark, "kg_landmark_distances")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_td_quality_classifier_scoring_no_python(spark):
    # scoring = one features⋈weights join + one per-doc agg, pure JVM
    p = _plan(spark, "td_quality_classifier")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "MapInPandas" not in p


def test_td_transe_eval_rank_as_count_plan(spark):
    # rank-as-a-count over the whole entity table: the candidate scan
    # is the intended broadcast(queries) nested-loop — the eval-set
    # side broadcast (BuildRight), the 10^9-entity side streamed once —
    # NEVER a CartesianProduct, and exactly ONE such scan per side
    # family; no row-at-a-time Python. (MapInPandas appears upstream in
    # the synth KG extraction feeding the model, not in the evaluator —
    # the evaluator's Catalyst path adds none.)
    p = _plan(spark, "td_transe_eval")
    assert p.count("BroadcastNestedLoopJoin") == 1
    assert "BuildRight" in p.split("BroadcastNestedLoopJoin", 1)[1][:60]
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # the count is map-side combinable: partial_count under the qid agg
    assert "partial_count" in p


def test_td_hard_negatives_cell_equi_join_no_python(spark):
    # candidates must come from the IVF cell equi-join — never a cross
    # product — and the whole mine stays JVM-side
    p = _plan(spark, "td_hard_negatives")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_ts_length_quantiles_pruned_scan_partial_agg(spark):
    # the sketch build reads only (source, text) and its bucket count
    # has map-side partial aggregation before the shuffle
    p = _plan(spark, "ts_length_quantiles")
    sch = p.split("ReadSchema:", 1)[1].split("\n", 1)[0]
    assert "text" in sch and "doc_id" not in sch
    assert "partial_count" in p or "HashAggregate" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_kg_motif_peers_pred_filter_pushed(spark):
    # the literal-predicate steps filter before joining; no cross joins
    p = _plan(spark, "kg_motif_peers")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_kg_entity_pmi_linked_alias_join_broadcasts(spark):
    # O19's link_entities must compile to broadcast hash joins for BOTH
    # alias lookups (subj + obj side) — an alias dictionary is
    # model-sized by construction, so a shuffled SortMergeJoin here
    # would be the 100 TB scale bug the operator exists to avoid. The
    # pair stage stays JVM-side (in-array pair generation, no Python).
    p = _plan(spark, "kg_entity_pmi_linked")
    assert p.count("BroadcastHashJoin") >= 2, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "MapInPandas" not in p


def test_kg_inferred_edges_broadcast_rules_no_python(spark):
    # apply_rules: the rules table and its predicate semi-filters are
    # broadcast (|preds|^2-bounded by construction), known-head removal
    # is a left-anti join, and there is no cross product or Python in
    # the plan — the body self-join on the shared variable is the only
    # row-multiplying step and it is an equi-join.
    p = _plan(spark, "kg_inferred_edges")
    assert p.count("BroadcastHashJoin") >= 3, p
    assert "LeftAnti" in p, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_kg_sparql_select_compiles_to_equi_joins(spark):
    # the SPARQL compiler must produce exactly the motif engine's plan
    # class: equi-joins only, NOT EXISTS as ONE left-anti join, no
    # Python anywhere (the parser runs on the query string, driver-side)
    p = _plan(spark, "kg_sparql_select")
    assert "LeftAnti" in p, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "MapInPandas" not in p


def test_kg_top_facts_windows_are_partitioned(spark):
    # both row_number windows must be hash-partitioned on their entity
    # keys — a global (unpartitioned) window would single-task the
    # whole fact table; ties are broken in-window, no global sort
    p = _plan(spark, "kg_top_facts")
    assert "Window" in p, p
    assert "hashpartitioning(subj" in p, p
    assert "SinglePartition" not in p.split("TakeOrdered")[0], p
