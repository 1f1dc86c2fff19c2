"""KG snapshot diff — incremental graph maintenance between two builds.

A production KG over a growing corpus is rebuilt (or incrementally
extended — streaming.py) per batch; the operational question after every
build is "what changed": which (subj, pred, obj) edges appeared, which
disappeared, which merely re-weighted. The reference workflow answers it
by exporting both graphs and diffing JSON in driver memory; at web scale
the diff must itself be a distributed join.

Scale shape: ONE full-outer equi-join on the composite edge key.
The key is uniform by construction (entity canonicalization collapses
aliases BEFORE aggregation, so no single (subj, pred, obj) row is hot —
hot ENTITIES fan out across their predicates/objects), and both
snapshots of a production deployment live in the same Iceberg table
layout bucketed by the edge key, so the sort-merge join runs
exchange-free. NULL key components (partial triples keep NULL obj) are
matched with null-safe equality — a plain equi-join would silently
report every NULL-keyed edge as simultaneously added and removed.

Determinism: pure join + arithmetic; no RNG; repartition-invariant.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_KEY = ("subj", "pred", "obj")


def diff_edges(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str] = DEFAULT_KEY,
    weight_col: str = "weight",
) -> DataFrame:
    """(key..., change, old_weight, new_weight, weight_delta): the edge
    delta between two snapshots. ``change`` is one of:

      * ``added``    — edge exists only in ``new``;
      * ``removed``  — edge exists only in ``old``;
      * ``changed``  — both, ``weight`` differs;
      * ``same``     — both, ``weight`` equal (kept so the output is a
        complete keyed view; filter it out for a compact changelog).

    Duplicate keys on either side are aggregated (sum of weights) before
    the join — the diff is defined over the edge SET, and pre-aggregation
    also keeps the join one-to-one (no accidental fan-out)."""
    missing = [
        c
        for c in (*key_cols, weight_col)
        for side, df in (("old", old), ("new", new))
        if c not in df.columns
    ]
    if missing:
        raise ValueError(
            f"diff_edges: input missing column(s) {sorted(set(missing))}; "
            f"need key {tuple(key_cols)} + weight '{weight_col}'"
        )
    keys = list(key_cols)
    # rename per side BEFORE the join: old/new snapshots of the same KG
    # typically share lineage (two slices of one build), and identically
    # named columns across a self-join are ambiguous to the analyzer
    o = old.groupBy(*keys).agg(F.sum(weight_col).alias("old_weight"))
    o = o.select(
        *[F.col(k).alias(f"_o_{k}") for k in keys],
        "old_weight",
        F.lit(True).alias("_in_old"),
    )
    n = new.groupBy(*keys).agg(F.sum(weight_col).alias("new_weight"))
    n = n.select(
        *[F.col(k).alias(f"_n_{k}") for k in keys],
        "new_weight",
        F.lit(True).alias("_in_new"),
    )
    cond = None
    for k in keys:
        c = F.col(f"_o_{k}").eqNullSafe(F.col(f"_n_{k}"))
        cond = c if cond is None else (cond & c)
    j = o.join(n, cond, "full_outer")
    # coalesce each key component across sides (exactly one side may be
    # all-NULL columns for added/removed rows)
    key_sel = [
        F.coalesce(F.col(f"_o_{k}"), F.col(f"_n_{k}")).alias(k) for k in keys
    ]
    # classification uses the same NULL-coalesced values as weight_delta
    # (a side present with NULL weight would otherwise compare as NULL →
    # 'same' while weight_delta is nonzero — inconsistent row)
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(
            F.coalesce("old_weight", F.lit(0))
            != F.coalesce("new_weight", F.lit(0)),
            F.lit("changed"),
        )
        .otherwise(F.lit("same"))
    )
    return j.select(
        *key_sel,
        change.alias("change"),
        "old_weight",
        "new_weight",
        (F.coalesce("new_weight", F.lit(0)) - F.coalesce("old_weight", F.lit(0))).alias(
            "weight_delta"
        ),
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """(change, n_edges, total_weight_delta) — one bounded row per change
    class; the scalar health signal an incremental build publishes to its
    run manifest (pipeline.py counters)."""
    return (
        diff.groupBy("change")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.sum("weight_delta").alias("total_weight_delta"),
        )
        .orderBy("change")
    )
