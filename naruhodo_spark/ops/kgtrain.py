"""Link-prediction training data from the KSG: filtered negative
sampling (the KG-embedding training staple — TransE et al. corrupt each
positive triple's head or tail with a random entity, excluding
corruptions that happen to be true triples).

Determinism contract: everything derives from xxhash64 of row content —
no RNG state, so the sample is resume-stable, repartition-invariant and
reproducible across cluster sizes, like every sampling op in this repo
(ops/textstats.hash_split).

Plan shape at 10^12 docs / 10^9 entities:

- the entity table gets a hash BUCKET id sized to ~32 entities per
  bucket (one count() to size it — a driver scalar);
- each (positive, i) corruption row computes a target bucket from its
  own hash and equi-joins the entity table on bucket: uniform keys both
  sides, ~32 candidate rows per corruption, no skew, no global sort,
  no asof machinery;
- one candidate is chosen per corruption by min(xxhash64(candidate,
  corruption)) — a map-side-combinable min_by aggregation;
- corruptions that equal the true entity or reproduce an existing
  positive are dropped (filtered sampling), so a positive can yield
  slightly fewer than k negatives; an empty target bucket also drops
  the corruption, with probability e^-32 ≈ 1e-14 per row — both
  documented, neither silent (the output carries (pos, i) so callers
  can count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def entity_table(ksg_edges: DataFrame) -> DataFrame:
    """(entity) — distinct subjects and non-empty objects."""
    return (
        ksg_edges.select(F.col("subj").alias("entity"))
        .unionByName(
            ksg_edges.where(F.col("obj") != "").select(
                F.col("obj").alias("entity")
            )
        )
        .distinct()
    )


def negative_samples(
    ksg_edges: DataFrame,
    k: int = 2,
    seed: str = "neg42",
    bucket_target: int = 32,
    with_origin: bool = False,
) -> DataFrame:
    """(subj, pred, obj, neg_i, corrupted) — up to k corrupted triples
    per positive; even neg_i corrupts the object (tail), odd corrupts
    the subject (head). ``corrupted`` = 'head' | 'tail'.

    ``with_origin=True`` appends ``orig`` — the entity the corruption
    replaced — so a caller can reconstruct the (positive, negative)
    PAIR each row came from (TransE-style margin losses train on the
    pair, not the bare negative: ops/kgembed.py).
    """
    schema = (
        "subj string, pred string, obj string, neg_i int, corrupted string"
    )
    if with_origin:
        schema += ", orig string"
    empty = ksg_edges.sparkSession.createDataFrame([], schema)
    if k <= 0:
        # sequence(0, k-1) would count DOWN (the repo-documented
        # descending-sequence pitfall) and mint neg_i=-1 rows
        return empty
    # reused twice each (count + join / corr + anti-join): pin like the
    # other iterative graph ops so the distinct-scan runs once
    ents = entity_table(ksg_edges).localCheckpoint()
    n = ents.count()
    if n == 0:
        return empty
    nb = max(1, n // bucket_target)
    ent_b = ents.withColumn(
        "bucket", F.pmod(F.xxhash64(F.lit(seed), "entity"), F.lit(nb))
    )

    # objectless triples (obj="") are excluded: "" is not in the entity
    # vocabulary, so head-corrupting one would emit a negative with a
    # nonexistent tail and tail-corrupting would assert a claim the
    # positive never made
    pos = (
        ksg_edges.where(F.col("obj") != "")
        .select("subj", "pred", "obj")
        .distinct()
        .localCheckpoint()
    )
    corr = pos.select(
        "subj", "pred", "obj",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("neg_i"),
    ).withColumn(
        "bucket",
        F.pmod(
            F.xxhash64(F.lit(seed), "subj", "pred", "obj", "neg_i"),
            F.lit(nb),
        ),
    )

    pick = F.xxhash64(F.lit(seed), "entity", "subj", "pred", "obj", "neg_i")
    chosen = (
        corr.join(ent_b, "bucket")
        .groupBy("subj", "pred", "obj", "neg_i")
        .agg(F.min_by("entity", pick).alias("replacement"))
    )

    tail = F.col("neg_i") % 2 == 0
    negs = chosen.select(
        F.when(tail, F.col("subj")).otherwise(F.col("replacement")).alias("n_subj"),
        F.col("pred").alias("n_pred"),
        F.when(tail, F.col("replacement")).otherwise(F.col("obj")).alias("n_obj"),
        "neg_i",
        F.when(tail, F.lit("tail")).otherwise(F.lit("head")).alias("corrupted"),
        # self-corruption guard: replacement must differ from the slot
        F.when(tail, F.col("obj")).otherwise(F.col("subj")).alias("_orig"),
        "replacement",
    ).where(F.col("replacement") != F.col("_orig"))

    if with_origin:
        negs = negs.withColumn("orig", F.col("_orig"))
    negs = negs.drop("_orig", "replacement")

    # filtered sampling: a corruption that IS a true triple is not a
    # negative — anti-join against the positive set
    return (
        negs.withColumnsRenamed(
            {"n_subj": "subj", "n_pred": "pred", "n_obj": "obj"}
        )
        .join(pos, ["subj", "pred", "obj"], "left_anti")
    )
