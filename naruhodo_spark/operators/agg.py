"""O27/O28 node-count & edge-weight aggregation, O30 salted two-phase agg.

Reference behavior: ``_addNode`` increments a node ``count`` attr and
``_addEdge`` bumps an edge ``weight`` on re-occurrence
[PK naruhodo/core/KnowledgeCoreJa.py]. In Spark that incremental mutation
becomes re-aggregation: hash aggregate with map-side partial aggregation
(free), plus an explicit salted two-phase variant for hot-entity skew
[B BASELINE.json:6 "salted repartitioning to defuse hot-entity skew"] —
AQE splits skewed *join* partitions but not skewed groupBy keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_edges(triples: DataFrame) -> DataFrame:
    """ksg_edges: (subj, pred, obj, weight, negative, passive)."""
    return (
        triples.where(F.col("subj_canon").isNotNull())
        .groupBy(
            F.col("subj_canon").alias("subj"),
            F.col("pred").alias("pred"),
            F.coalesce(F.col("obj_canon"), F.lit("")).alias("obj"),
        )
        .agg(
            F.count(F.lit(1)).alias("weight"),
            F.max("negative").alias("negative"),
            F.max("passive").alias("passive"),
        )
    )


def aggregate_edges_salted(triples: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """Two-phase salted variant of aggregate_edges. Phase 1 splits each hot
    (subj,pred,obj) key into `salt_buckets` partial groups keyed by a hash
    of doc_id; phase 2 merges partials. Same result, bounded per-task
    group size."""
    salted = triples.where(F.col("subj_canon").isNotNull()).withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt_buckets))
    )
    phase1 = salted.groupBy(
        F.col("subj_canon").alias("subj"),
        F.col("pred").alias("pred"),
        F.coalesce(F.col("obj_canon"), F.lit("")).alias("obj"),
        "salt",
    ).agg(
        F.count(F.lit(1)).alias("w"),
        F.max("negative").alias("n"),
        F.max("passive").alias("p"),
    )
    return phase1.groupBy("subj", "pred", "obj").agg(
        F.sum("w").alias("weight"),
        F.max("n").alias("negative"),
        F.max("p").alias("passive"),
    )


def edge_skew_share(
    triples: DataFrame, fraction: float = 0.02, min_sample: int = 2000
) -> float:
    """ONE small probe job: the hottest canonical-edge key's share of a
    sampled triple count. A sample smaller than ``min_sample`` can't
    judge skew, but it also means the corpus is at most
    min_sample/fraction triples — small enough that a FULL probe is one
    trivial aggregation, so we re-probe at fraction 1.0 instead of
    guessing. Cost at scale: a map-only sampled pass + one aggregation
    over the sample — no full-corpus shuffle."""
    s = triples.where(F.col("subj_canon").isNotNull()).select(
        "subj_canon", "pred", "obj_canon"
    )
    if fraction < 1.0:
        s = s.sample(fraction=fraction, seed=42)
    row = (
        s.groupBy("subj_canon", "pred", "obj_canon")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").alias("top"), F.sum("c").alias("total"))
        .first()
    )
    # escalation FIRST: an empty sample (total None/0) is the extreme
    # under-min_sample case and must take the documented full re-probe,
    # not an early "no skew" verdict
    if fraction < 1.0 and (
        row is None or row["total"] is None or row["total"] < min_sample
    ):
        return edge_skew_share(triples, fraction=1.0, min_sample=min_sample)
    if row is None or row["total"] is None or row["total"] == 0:
        return 0.0
    return float(row["top"]) / float(row["total"])


def should_salt_edges(
    triples: DataFrame,
    shuffle_partitions: int | None = None,
    factor: float = 2.0,
    fraction: float = 0.02,
    min_sample: int = 2000,
) -> bool:
    """Skew-probe decision for the production edge aggregation
    (VERDICT r02 next-round #6): salt when the hottest key would receive
    more than ``factor``× a uniform reduce task's share (1/P of rows).
    Map-side partial aggregation absorbs most groupBy skew, so the
    threshold errs toward the plain single-shuffle plan; a 'god edge'
    holding tens of percent of the corpus clears it decisively."""
    p = shuffle_partitions or int(
        triples.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    return edge_skew_share(triples, fraction, min_sample) > factor / max(p, 1)


def aggregate_edges_auto(
    triples: DataFrame, salt_buckets: int = 16, **probe_kw
) -> DataFrame:
    """aggregate_edges with the plan picked by the skew probe."""
    if should_salt_edges(triples, **probe_kw):
        return aggregate_edges_salted(triples, salt_buckets)
    return aggregate_edges(triples)


def aggregate_nodes(triples: DataFrame) -> DataFrame:
    """ksg_nodes: entities (subject/object occurrences) + predicate nodes.

    node_id = canonical id; rep = deterministic representative surface
    (lexicographic min, mirroring the reference's first-seen surface in a
    partitioning-independent way); count = occurrence count."""
    subj = triples.where(F.col("subj_canon").isNotNull()).select(
        F.col("subj_canon").alias("node_id"),
        F.col("subj").alias("surface"),
        F.col("subj_ne").alias("etype"),
        F.col("subj_pro").alias("pro"),
    )
    obj = triples.where(F.col("obj_canon").isNotNull()).select(
        F.col("obj_canon").alias("node_id"),
        F.col("obj").alias("surface"),
        F.col("obj_ne").alias("etype"),
        F.col("obj_pro").alias("pro"),
    )
    pred = triples.select(
        F.concat(F.lit("pred:"), F.col("pred")).alias("node_id"),
        F.col("pred").alias("surface"),
        F.lit(0).alias("etype"),
        F.lit(-1).alias("pro"),
    )
    occ = subj.unionByName(obj).unionByName(pred)
    return occ.groupBy("node_id").agg(
        F.min("surface").alias("rep"),
        F.max("etype").alias("etype"),
        F.max("pro").alias("pro"),
        F.count(F.lit(1)).alias("count"),
    ).withColumn("name", F.col("node_id")).select(
        "node_id", "name", "rep", "etype", "pro", "count"
    )


def edge_provenance(triples: DataFrame) -> DataFrame:
    """Per-canonical-edge lineage: (subj, pred, obj, n_docs, n_mentions,
    first_doc, last_doc) — which documents support each KSG edge.

    Skew-safe by construction: the distinct-document count is the
    standard two-phase distinct — pre-aggregate on (edge, doc_id) so a
    hot edge's mentions combine map-side per document before the
    per-edge reduce. A direct ``countDistinct(doc_id)`` would funnel
    every mention of a 'god edge' into a single task's hash set; here
    the second phase sees one row per supporting document, bounded by
    corpus doc count, never by mention multiplicity.
    """
    per_doc = (
        triples.where(F.col("subj_canon").isNotNull())
        .groupBy(
            F.col("subj_canon").alias("subj"),
            F.col("pred").alias("pred"),
            F.coalesce(F.col("obj_canon"), F.lit("")).alias("obj"),
            "doc_id",
        )
        .agg(F.count(F.lit(1)).alias("mentions"))
    )
    return per_doc.groupBy("subj", "pred", "obj").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("mentions").alias("n_mentions"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def edge_target():
    """The node-identity contract for graph consumers: an objectless
    triple's edge targets the ``pred:<pred>`` node ``aggregate_nodes``
    mints (reference behavior: subject→predicate edge when the object
    slot is empty). Every consumer (export, plot, PageRank/k-hop) MUST
    resolve targets through this one expression so they can never
    disagree with the exported graph."""
    return F.when(
        F.col("obj") == "", F.concat(F.lit("pred:"), F.col("pred"))
    ).otherwise(F.col("obj"))
