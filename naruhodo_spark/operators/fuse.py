"""Knowledge fusion: resolve conflicting (subj, pred) → obj claims.

A KG built from 10^12 documents asserts the same attribute many times
with different values — extraction noise, stale sources, genuine
disagreement. The reference pipeline keeps every edge; fusing them to
one canonical value per (subject, predicate) with a confidence is the
standard "knowledge fusion" step of web-scale KG construction
(Dong et al., KDD 2014 "Knowledge Vault"; Li et al., VLDB 2014 survey
on conflicting-data fusion).

Two resolvers, both deterministic and driver-light:

- :func:`majority_vote` — one-round uniform-trust fusion: each source
  gets one vote per (subj, pred, obj) claim; the object with the most
  distinct supporting sources wins, ties broken by the
  lexicographically smallest object. Pure Catalyst — two uniform
  groupBys and a max-struct argmax, no windows, no iteration — and
  ANSI-SQL-expressible, so it carries the exact DuckDB mirror for the
  family (tests/test_entry_contract.py EXTRA_MIRRORS).

- :func:`fuse_claims` — iterative source-trust fusion, the "Sums"
  fixpoint of Pasternack & Roth (COLING 2010), the hub/authority
  recursion specialized to claims: a fact is believable if trusted
  sources assert it, a source is trustworthy if it asserts believable
  facts. Per round: ONE equi-join + ONE uniform groupBy in each
  direction, max-normalized with O(1) driver scalars (the same
  1-scalar-collect discipline as graphstats.personalized_pagerank),
  localCheckpoint per round truncating lineage. State is two tables —
  (fact, score) and (source, trust) — never driver-resident; at
  10^12 docs both are data-sized DataFrames and the loop depth is a
  constant (default 6), so total cost is O(iters × claims) with
  map-side-combinable aggregates throughout.

Exact pure-python mirror (same normalization, same tie-breaks) pinned
in tests/test_fuse.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["majority_vote", "fuse_claims"]

#: claims contract: one row per assertion
_CLAIM_COLS = ("subj", "pred", "obj", "source")


def _check(claims: DataFrame) -> DataFrame:
    missing = [c for c in _CLAIM_COLS if c not in claims.columns]
    if missing:
        raise ValueError(
            f"claims table needs columns {list(_CLAIM_COLS)}, missing "
            f"{missing} (got {claims.columns})"
        )
    # a source repeating the identical claim gets ONE vote — dedupe on
    # the full claim key (uniform key: one hash aggregate)
    return claims.select(*_CLAIM_COLS).distinct()


def majority_vote(claims: DataFrame) -> DataFrame:
    """Uniform-trust fusion → one row per (subj, pred):
    (subj, pred, obj, confidence, n_sources, n_candidates).

    ``obj`` is the candidate with the most distinct supporting
    sources (ties → lexicographically smallest obj);
    ``confidence`` = winner votes / total votes across candidates
    (rounded to 4 dp); ``n_sources`` = winner votes; ``n_candidates``
    = number of distinct objects claimed for the slot.

    Shape: two groupBys on uniform keys ((s,p,o) then (s,p)) with a
    min-struct argmax — no windows, no skew surface beyond genuinely
    hot (subj, pred) slots, which a vote count cannot avoid reading.
    """
    votes = (
        _check(claims)
        .groupBy("subj", "pred", "obj")
        .agg(F.count(F.lit(1)).alias("n_src"))
    )
    # argmax by (votes desc, obj asc) as ONE min(struct(-votes, obj))
    return (
        votes.groupBy("subj", "pred")
        .agg(
            F.min(
                F.struct(
                    (-F.col("n_src")).alias("neg"), F.col("obj").alias("obj")
                )
            ).alias("win"),
            F.sum("n_src").alias("total"),
            F.count(F.lit(1)).alias("n_candidates"),
        )
        .select(
            "subj",
            "pred",
            F.col("win.obj").alias("obj"),
            F.round(-F.col("win.neg") / F.col("total"), 4).alias(
                "confidence"
            ),
            (-F.col("win.neg")).alias("n_sources"),
            "n_candidates",
        )
    )


def fuse_claims(
    claims: DataFrame, iterations: int = 6
) -> dict[str, DataFrame]:
    """Iterative source-trust fusion (Pasternack-Roth "Sums") →
    ``{"fused", "facts", "trust"}``.

    - ``trust``: (source, trust) — max-normalized to [0, 1].
    - ``facts``: (subj, pred, obj, score, n_sources) — claim
      believability, max-normalized.
    - ``fused``: one row per (subj, pred):
      (subj, pred, obj, confidence, n_sources, n_candidates) where
      ``obj`` is the highest-scoring candidate (ties →
      lexicographically smallest) and ``confidence`` = winner score /
      Σ candidate scores (4 dp).

    The recursion: score(f) = Σ_{s asserts f} trust(s);
    trust(s) = mean_{f asserted by s} score(f); both sides divided by
    their max each round (the fixpoint is the principal eigenvector —
    normalization only fixes the scale, so iteration order and
    partitioning cannot change the result). ``iterations`` is a small
    constant; each round is two equi-joins + two uniform aggregates +
    two 1-scalar collects.
    """
    if iterations < 1:
        raise ValueError("fuse_claims needs iterations >= 1")
    cl = _check(claims).localCheckpoint()  # read 2× per round
    trust = cl.select("source").distinct().select(
        "source", F.lit(1.0).alias("trust")
    )
    facts = None
    prev_f = prev_t = None
    for _ in range(iterations):
        facts = (
            cl.join(trust, "source")
            .groupBy("subj", "pred", "obj")
            .agg(
                F.sum("trust").alias("score"),
                F.count(F.lit(1)).alias("n_sources"),
            )
        )
        f_max = facts.agg(F.max("score")).collect()[0][0] or 1.0
        facts = facts.withColumn(
            "score", F.col("score") / F.lit(float(f_max))
        ).localCheckpoint()
        trust = (
            cl.join(facts, ["subj", "pred", "obj"])
            .groupBy("source")
            .agg(F.avg("score").alias("trust"))
        )
        t_max = trust.agg(F.max("trust")).collect()[0][0] or 1.0
        trust = trust.withColumn(
            "trust", F.col("trust") / F.lit(float(t_max))
        ).localCheckpoint()
        for old in (prev_f, prev_t):
            if old is not None:
                old.unpersist()
        prev_f, prev_t = facts, trust
    fused = (
        facts.groupBy("subj", "pred")
        .agg(
            F.min(
                F.struct(
                    (-F.col("score")).alias("neg"),
                    F.col("obj").alias("obj"),
                    F.col("n_sources").alias("n_sources"),
                )
            ).alias("win"),
            F.sum("score").alias("total"),
            F.count(F.lit(1)).alias("n_candidates"),
        )
        .select(
            "subj",
            "pred",
            F.col("win.obj").alias("obj"),
            F.round(-F.col("win.neg") / F.col("total"), 4).alias(
                "confidence"
            ),
            F.col("win.n_sources").alias("n_sources"),
            "n_candidates",
        )
    )
    return {"fused": fused, "facts": facts, "trust": trust}
