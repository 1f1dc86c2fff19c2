"""Link-prediction evaluation for trained KG embeddings (the standard
companion to ops/kgembed.py's TransE trainer): filtered mean rank /
MRR / Hits@k under the ranking protocol of Bordes et al. 2013
("Translating Embeddings...", NeurIPS) — for every test triple
(h, r, t), rank the true entity against ALL entities as candidate
replacements on each side, excluding (filtered setting) candidates
that form some OTHER known-true triple.

Why this must be distributed: the candidate set is the WHOLE entity
table (10^9 names at web scale — never driver-resident), so "rank of
the true entity" is computed as a COUNT, not a sort:

    rank = 1 + |{e : dist(q, e) < dist(q, true)}| − |known-true better|

which is one scan over the entity table per evaluation — no global
sort, no per-query top-k materialization. Two twin implementations
share that shape (the topk_bruteforce / topk_ivf_blas pattern from
ops/similarity.py):

- ``rank_candidates(path="catalyst")``: the test-query frame (small by
  protocol — eval sets are thousands of triples) broadcast against the
  entity table, distance via zip_with/aggregate HOFs, one groupBy
  count. Pure Catalyst — the oracle-checkable baseline.
- ``rank_candidates(path="blas")``: mapInPandas over entity-table
  batches with the query matrix in the task closure (one bounded
  collect, ``max_queries``-guarded — eval-set-sized, the same "model-
  sized collect is honest" category as k-means centroids); per batch
  ONE |batch|×|Q| GEMM producing partial better-counts, then the same
  groupBy sum. The scale path: at 10^9 entities the distance pass is
  the entire cost and BLAS beats elementwise expression evaluation by
  an order of magnitude.

Both sides of the protocol use the |e − q|² distance form with the
side's own query vector (tail side: q = h + r; head side: q = t − r),
and the TRUE entity's distance is computed with the SAME formula, so
each rank is self-consistent under floating-point reassociation. The
true entity is excluded from its own candidate count BY NAME (not by
strict inequality) so the GEMM expansion's ulp-level differences can
never count it.

The filtered correction is exact and shared by both paths: known-true
triples join the entity table for their candidate distance (equi-join
on entity name), join their test queries on the (anchor, relation)
key — per-query fan-out bounded by the anchor's degree — and
strictly-better known candidates are subtracted per query.

No silent caps: test triples whose h/r/t lack an embedding keep their
row with rank NULL (left joins throughout), and metrics report the
unranked count in an `n_unranked` audit column.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from naruhodo_spark.ops.kgembed import _sqnorm, _vadd, _vsub

_QID = "_lp_qid"


def _queries(
    test: DataFrame,
    ent_emb: DataFrame,
    rel_emb: DataFrame,
    sides: Sequence[str],
) -> DataFrame:
    """(qid, subj, pred, obj, side, anchor, true_name, qvec, true_dist):
    one ranking query per (test triple, side). qvec is the side's
    query point (tail: h+r, head: t−r); true_dist is the true entity's
    |e − qvec|² under the SAME formula the candidate scan uses.
    Missing embeddings leave qvec/true_dist NULL (row kept).

    The test frame is deduplicated on (subj, pred, obj) first: the qid
    is a content hash, so a dirty eval set with repeated rows would
    collapse duplicates onto one qid and SUM their better-counts —
    doubling every duplicate's rank. A ranking query set is a set."""
    test = test.select("subj", "pred", "obj").distinct()
    j = (
        test.select("subj", "pred", "obj")
        .join(
            ent_emb.select(
                F.col("name").alias("subj"), F.col("vec").alias("hv")
            ),
            "subj",
            "left",
        )
        .join(
            ent_emb.select(
                F.col("name").alias("obj"), F.col("vec").alias("tv")
            ),
            "obj",
            "left",
        )
        .join(
            rel_emb.select(
                F.col("name").alias("pred"), F.col("vec").alias("rv")
            ),
            "pred",
            "left",
        )
    )
    parts = []
    if "tail" in sides:
        qv = _vadd(F.col("hv"), F.col("rv"))
        parts.append(
            j.select(
                "subj",
                "pred",
                "obj",
                F.lit("tail").alias("side"),
                F.col("subj").alias("anchor"),
                F.col("obj").alias("true_name"),
                qv.alias("qvec"),
                F.when(
                    F.col("hv").isNotNull()
                    & F.col("rv").isNotNull()
                    & F.col("tv").isNotNull(),
                    _sqnorm(_vsub(F.col("tv"), qv)),
                ).alias("true_dist"),
            )
        )
    if "head" in sides:
        qv = _vsub(F.col("tv"), F.col("rv"))
        parts.append(
            j.select(
                "subj",
                "pred",
                "obj",
                F.lit("head").alias("side"),
                F.col("obj").alias("anchor"),
                F.col("subj").alias("true_name"),
                qv.alias("qvec"),
                F.when(
                    F.col("tv").isNotNull()
                    & F.col("rv").isNotNull()
                    & F.col("hv").isNotNull(),
                    _sqnorm(_vsub(F.col("hv"), qv)),
                ).alias("true_dist"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn(
        _QID,
        F.xxhash64(
            F.col("subj"), F.col("pred"), F.col("obj"), F.col("side")
        ),
    )


def _better_counts_catalyst(queries: DataFrame, ent_emb: DataFrame) -> DataFrame:
    """(qid, n_better): strictly-better candidate count per query via
    broadcast(queries) ⋈ entity table — a BroadcastNestedLoopJoin whose
    big side streams once per executor core, distance in JVM HOFs. The
    query side is eval-set-sized by protocol; the entity side never
    moves."""
    q = queries.where(F.col("true_dist").isNotNull()).select(
        _QID, "qvec", "true_dist", "true_name"
    )
    pairs = ent_emb.select(
        F.col("name").alias("_cand"), F.col("vec").alias("_cvec")
    ).join(
        F.broadcast(q),
        (F.col("_cand") != F.col("true_name"))
        & (_sqnorm(_vsub(F.col("_cvec"), F.col("qvec"))) < F.col("true_dist")),
        "inner",
    )
    return pairs.groupBy(_QID).agg(F.count("*").alias("n_better"))


def _better_counts_blas(
    queries: DataFrame, ent_emb: DataFrame, max_queries: int
) -> DataFrame:
    """(qid, n_better) via one GEMM per entity batch: the query matrix
    rides the task closure (bounded collect — ``max_queries`` guard),
    each batch emits |Q| partial counts, one groupBy sums them. Partial
    rows are (batches × |Q|), independent of entity count."""
    import numpy as np

    rows = (
        queries.where(F.col("true_dist").isNotNull())
        .select(_QID, "qvec", "true_dist", "true_name")
        .collect()
    )
    if len(rows) > max_queries:
        raise ValueError(
            f"link-prediction blas path: {len(rows)} ranking queries exceed "
            f"max_queries={max_queries}; shard the test set (hash_split) "
            "and evaluate shards independently — ranks are per-triple, so "
            "sharding is exact"
        )
    spark = queries.sparkSession
    if not rows:
        return spark.createDataFrame([], f"{_QID} long, n_better long")
    qids = np.array([r[_QID] for r in rows], dtype=np.int64)
    Q = np.stack([np.asarray(r["qvec"], dtype=np.float64) for r in rows])
    td = np.array([r["true_dist"] for r in rows], dtype=np.float64)
    tnames = np.array([r["true_name"] for r in rows], dtype=object)
    qsq = (Q * Q).sum(axis=1)

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            E = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["vec"]]
            )
            names = pdf["name"].to_numpy()
            esq = (E * E).sum(axis=1)
            # |e − q|² = |e|² − 2 e·q + |q|², one GEMM per batch
            D = esq[:, None] - 2.0 * (E @ Q.T) + qsq[None, :]
            better = D < td[None, :]
            # the true entity is excluded BY NAME — the GEMM expansion
            # differs from the elementwise form by ulps, so strict <
            # alone could count the true entity itself
            better &= names[:, None] != tnames[None, :]
            yield pd.DataFrame(
                {_QID: qids, "n_better": better.sum(axis=0).astype("int64")}
            )

    partial = ent_emb.select("name", "vec").mapInPandas(
        per_batch, schema=f"{_QID} long, n_better long"
    )
    return partial.groupBy(_QID).agg(F.sum("n_better").alias("n_better"))


def _known_better_counts(
    queries: DataFrame, ent_emb: DataFrame, known: DataFrame
) -> DataFrame:
    """(qid, n_known_better): among KNOWN-true triples sharing the
    query's (anchor, relation, side), how many candidate entities rank
    strictly better than the true one — the exact filtered-setting
    correction. Per-query fan-out is the anchor's (anchor, relation)
    degree; the entity join is a uniform equi-join on name."""
    k = known.select("subj", "pred", "obj")
    cand = (
        k.select(
            F.col("subj").alias("anchor"),
            "pred",
            F.col("obj").alias("_cand"),
            F.lit("tail").alias("side"),
        )
        .unionByName(
            k.select(
                F.col("obj").alias("anchor"),
                "pred",
                F.col("subj").alias("_cand"),
                F.lit("head").alias("side"),
            )
        )
        .distinct()
        .join(
            ent_emb.select(
                F.col("name").alias("_cand"), F.col("vec").alias("_cvec")
            ),
            "_cand",
        )
    )
    q = queries.where(F.col("true_dist").isNotNull()).select(
        _QID, "anchor", "pred", "side", "qvec", "true_dist", "true_name"
    )
    hit = q.join(cand, ["anchor", "pred", "side"]).where(
        (F.col("_cand") != F.col("true_name"))
        & (_sqnorm(_vsub(F.col("_cvec"), F.col("qvec"))) < F.col("true_dist"))
    )
    return hit.groupBy(_QID).agg(F.count("*").alias("n_known_better"))


def rank_candidates(
    test: DataFrame,
    ent_emb: DataFrame,
    rel_emb: DataFrame,
    known: DataFrame | None = None,
    sides: Sequence[str] = ("tail", "head"),
    path: str = "catalyst",
    max_queries: int = 20_000,
) -> DataFrame:
    """(subj, pred, obj, side, rank, n_known_filtered) — the filtered
    rank of every test triple's true entity on each requested side.
    ``known=None`` gives the RAW (unfiltered) setting; pass the union
    of train+valid+test triples for the standard filtered protocol.
    rank is NULL (row kept) when any of the triple's three embeddings
    is missing from the model."""
    if path not in ("catalyst", "blas"):
        raise ValueError(f"rank_candidates: unknown path {path!r}")
    if not sides:
        raise ValueError("rank_candidates: sides must be non-empty")
    for s in sides:
        if s not in ("tail", "head"):
            raise ValueError(f"rank_candidates: unknown side {s!r}")
    q = _queries(test, ent_emb, rel_emb, sides)
    return _rank_from_queries(q, ent_emb, known, path, max_queries)


def _rank_from_queries(
    q: DataFrame,
    ent_emb: DataFrame,
    known: DataFrame | None,
    path: str,
    max_queries: int,
) -> DataFrame:
    """The model-agnostic half of the ranking protocol: any model
    whose distance takes the |candidate − qvec|² form can rank through
    here by supplying its own query frame (qid, subj, pred, obj, side,
    anchor, true_name, qvec, true_dist) — TransE's q = h+r / t−r
    above, RotatE's q = h∘r / conj(r)∘t (rotation is unitary, so the
    head side folds into the same form; ops/rotate.py)."""
    q = q.localCheckpoint(eager=False)  # shared by count paths below
    if path == "catalyst":
        better = _better_counts_catalyst(q, ent_emb)
    else:
        better = _better_counts_blas(q, ent_emb, max_queries)
    out = q.join(better, _QID, "left").withColumn(
        "n_better", F.coalesce(F.col("n_better"), F.lit(0))
    )
    if known is not None:
        kb = _known_better_counts(q, ent_emb, known)
        out = out.join(kb, _QID, "left").withColumn(
            "n_known_better", F.coalesce(F.col("n_known_better"), F.lit(0))
        )
    else:
        out = out.withColumn("n_known_better", F.lit(0))
    return out.select(
        "subj",
        "pred",
        "obj",
        "side",
        F.when(
            F.col("true_dist").isNotNull(),
            # clamp at 1: n_better (blas path: GEMM-expanded distance)
            # and n_known_better (elementwise form) can disagree by one
            # on ulp-level ties, and a 0 rank would 1/rank-divide by
            # zero downstream; the clamp bounds the tie skew at the
            # definitionally-correct floor
            F.greatest(
                F.lit(1),
                F.lit(1) + F.col("n_better") - F.col("n_known_better"),
            ),
        )
        .cast("long")
        .alias("rank"),
        F.col("n_known_better").cast("long").alias("n_known_filtered"),
    )


def link_prediction_metrics(
    ranks: DataFrame, ks: Sequence[int] = (1, 3, 10)
) -> DataFrame:
    """One row per side plus an 'all' rollup: n, n_unranked (NULL-rank
    audit — triples the model has no embeddings for), mean rank, MRR,
    and hits@k for each requested k. A single pass (rollup agg over the
    bounded ranks frame)."""
    aggs = [
        F.count("*").alias("n"),
        F.sum(F.col("rank").isNull().cast("long")).alias("n_unranked"),
        F.avg("rank").alias("mr"),
        F.avg(F.lit(1.0) / F.col("rank")).alias("mrr"),
    ]
    for k in ks:
        aggs.append(
            F.avg((F.col("rank") <= k).cast("double")).alias(f"hits_{k}")
        )
    return (
        ranks.rollup("side")
        .agg(*aggs)
        .select(F.coalesce(F.col("side"), F.lit("all")).alias("side"), *[
            a for a in [
                F.col("n"), F.col("n_unranked"), F.col("mr"), F.col("mrr"),
            ] + [F.col(f"hits_{k}") for k in ks]
        ])
    )
