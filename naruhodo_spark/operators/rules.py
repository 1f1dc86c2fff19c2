"""Path-rule mining over the KSG — AMIE-style horn rules
(Galárraga et al., WWW 2013): discover compositions
``r1(x, y) ∧ r2(y, z) ⇒ r3(x, z)`` ("born_in ∘ located_in ⇒
citizen_of") with support and confidence, the standard KG-completion /
curation signal (high-confidence rules predict missing edges; rules
with confidence ≈ 1 often indicate redundant predicates to collapse).

Plan shape at 10^9 edges:
- the 2-hop body is ONE self-equi-join on the shared variable y. Hub
  intermediates are the skew cliff: a y with in-degree a and out-degree
  b mints a·b body rows, so intermediates whose degree product exceeds
  ``hub_cap`` are EXCLUDED from composition and audited
  (:func:`hub_intermediates` — the no-silent-caps policy; AMIE's own
  in-memory mining applies the same functionality heuristic).
- body groundings reduce to DISTINCT (r1, r2, x, z) before the head
  join (a pair reachable via many y must count once).
- the head check is an equi-join on (x, z) against the edge table;
  support / body counts are two uniform groupBys.

Deterministic: pure joins + counting. Output confidence is standard
confidence (support / body size); swap in a PCA denominator upstream
if the KG's incompleteness profile warrants it (Galárraga §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HUB_CAP = 10_000  # max in_degree × out_degree for a composition pivot


def _pairs(ksg_edges: DataFrame) -> DataFrame:
    return (
        ksg_edges.where(F.col("obj") != "")
        .select("subj", "pred", "obj")
        .distinct()
    )


def hub_intermediates(
    ksg_edges: DataFrame, hub_cap: int = HUB_CAP
) -> DataFrame:
    """(node, in_degree, out_degree, body_rows) — pivots excluded from
    rule composition because they would mint more than ``hub_cap``
    body rows. Non-empty output = the mining deliberately ignored
    compositions through these hubs (observable, never implicit)."""
    e = _pairs(ksg_edges)
    ins = e.groupBy(F.col("obj").alias("node")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    outs = e.groupBy(F.col("subj").alias("node")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    return (
        ins.join(outs, "node")
        .withColumn("body_rows", F.col("in_degree") * F.col("out_degree"))
        .where(F.col("body_rows") > hub_cap)
    )


def mine_path_rules(
    ksg_edges: DataFrame,
    min_support: int = 3,
    min_confidence: float = 0.5,
    hub_cap: int = HUB_CAP,
) -> DataFrame:
    """(r1, r2, r3, support, n_body, confidence) — every rule
    r1(x,y) ∧ r2(y,z) ⇒ r3(x,z) with ``support`` distinct (x, z)
    groundings confirmed by an r3 edge, out of ``n_body`` distinct
    body groundings; confidence = support / n_body. Trivial self-loops
    (x == z) are excluded from the body — x citizen_of x is never the
    intended grounding and reflexive pairs inflate rules through
    symmetric predicates."""
    e = _pairs(ksg_edges).localCheckpoint(eager=False)  # 4 consumers
    # hub audit is bounded-small by construction; eager-checkpoint it
    # so the two broadcast anti-joins reuse one computation instead of
    # re-deriving the degree aggregation per broadcast exchange
    hot = hub_intermediates(ksg_edges, hub_cap).select("node").localCheckpoint()
    left = e.select(
        F.col("subj").alias("x"), F.col("pred").alias("r1"),
        F.col("obj").alias("y"),
    ).join(F.broadcast(hot.withColumnRenamed("node", "y")), "y", "left_anti")
    right = e.select(
        F.col("subj").alias("y"), F.col("pred").alias("r2"),
        F.col("obj").alias("z"),
    ).join(F.broadcast(hot.withColumnRenamed("node", "y")), "y", "left_anti")
    body = (
        left.join(right, "y")
        .where(F.col("x") != F.col("z"))
        .select("r1", "r2", "x", "z")
        .distinct()
    )
    n_body = body.groupBy("r1", "r2").agg(
        F.count(F.lit(1)).alias("n_body")
    )
    heads = e.select(
        F.col("subj").alias("x"), F.col("pred").alias("r3"),
        F.col("obj").alias("z"),
    )
    support = (
        body.join(heads, ["x", "z"])
        .groupBy("r1", "r2", "r3")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= int(min_support))
    )
    return (
        support.join(n_body, ["r1", "r2"])
        .select(
            "r1", "r2", "r3", "support", "n_body",
            (F.col("support") / F.col("n_body")).alias("confidence"),
        )
        .where(F.col("confidence") >= float(min_confidence))
    )


def apply_rules(
    ksg_edges: DataFrame,
    rules: DataFrame,
    hub_cap: int = HUB_CAP,
    min_confidence: float = 0.0,
) -> DataFrame:
    """One forward-chaining round of KG completion: ground every rule
    ``r1(x, y) ∧ r2(y, z) ⇒ r3(x, z)`` from ``rules`` (columns r1, r2,
    r3, confidence — :func:`mine_path_rules` output or a curated table)
    against the edge table and emit the predicted edges that are NOT
    already present, as ``(subj, pred, obj, confidence, n_rules)``.
    ``confidence`` is the max over the rules that predicted the edge,
    ``n_rules`` how many distinct rule bodies did. This is the standard
    rule-based KG-completion step (AMIE's prediction mode, Galárraga
    et al. WWW 2013 §7): run after mining, feed the output to curation
    or to link-prediction training as weak positives.

    Plan shape at 10^9 edges (mirrors :func:`mine_path_rules`):

    - the rules table is |preds|²-bounded → **broadcast**, and its
      distinct r1/r2 predicate sets are broadcast semi-filters applied
      BEFORE the body self-join, so only edges whose predicate appears
      in some rule ever reach the shuffle.
    - hub pivots (in_degree × out_degree > ``hub_cap``) are excluded
      and auditable via :func:`hub_intermediates` — inference through a
      god entity would mint a·b candidate rows (same cliff, same guard
      as mining; predictions through excluded hubs are deliberately
      not made, observable, never silent).
    - groundings dedupe to DISTINCT (x, rule, z) before aggregation (a
      pair reachable via many y must count once per rule), then ONE
      uniform groupBy(x, r3, z) folds multi-rule predictions.
    - known edges are removed by ONE left-anti equi-join on the full
      (subj, pred, obj) key.

    Deterministic: joins + max/count aggregation, no RNG, no windows.
    """
    e = _pairs(ksg_edges).localCheckpoint(eager=False)  # 3 consumers
    # collapse duplicate (r1, r2, r3) rows to their best confidence so
    # n_rules counts distinct rule BODIES, not input rows
    r = (
        rules.where(F.col("confidence") >= float(min_confidence))
        .groupBy("r1", "r2", "r3")
        .agg(F.max("confidence").alias("confidence"))
    )
    # hub audit is bounded-small by construction; eager-checkpoint it
    # so the two broadcast anti-joins reuse one computation instead of
    # re-deriving the degree aggregation per broadcast exchange
    hot = hub_intermediates(ksg_edges, hub_cap).select("node").localCheckpoint()
    left = (
        e.select(
            F.col("subj").alias("x"), F.col("pred").alias("r1"),
            F.col("obj").alias("y"),
        )
        .join(F.broadcast(r.select("r1").distinct()), "r1")
        .join(F.broadcast(hot.withColumnRenamed("node", "y")), "y", "left_anti")
    )
    right = (
        e.select(
            F.col("subj").alias("y"), F.col("pred").alias("r2"),
            F.col("obj").alias("z"),
        )
        .join(F.broadcast(r.select("r2").distinct()), "r2")
        .join(F.broadcast(hot.withColumnRenamed("node", "y")), "y", "left_anti")
    )
    grounded = (
        left.join(right, "y")
        .where(F.col("x") != F.col("z"))
        .join(F.broadcast(r), ["r1", "r2"])
        .select("x", "r1", "r2", "r3", "z", "confidence")
        .distinct()
    )
    predicted = grounded.groupBy(
        F.col("x").alias("subj"),
        F.col("r3").alias("pred"),
        F.col("z").alias("obj"),
    ).agg(
        F.max("confidence").alias("confidence"),
        F.count(F.lit(1)).alias("n_rules"),
    )
    return predicted.join(e, ["subj", "pred", "obj"], "left_anti")
