"""Temporal KG — validity intervals from timestamped assertions, as-of
snapshots, and interval-level diffs. Completes the epoch tier
(streaming.py's epoch panels, kgdiff.py's snapshot diff,
canon.incremental_cc) with PER-EDGE time semantics: when was a triple
true, what did the graph look like at time t, what changed between two
instants.

Model: an edge-observation stream (subj, pred, obj, ts) — e.g. each
extraction run stamps the triples it saw. A triple's validity is the
coalescing of its observations under a gap threshold: observations
separated by more than ``gap`` open a NEW interval (the triple was
retracted/unobserved in between). This is the standard snapshot-
reconstruction reading of observation logs; an explicit
assert/retract log can be converted by emitting observations at
assert-time and nothing after retract-time.

Execution shape — the win_sessionize pattern lifted to per-triple keys:
ONE window (partitionBy the triple key, orderBy ts) for the lag-gap
flag, a running cumsum for the interval id, ONE groupBy for the
interval bounds. Two shuffles total on the uniform (subj, pred, obj)
key at any scale; hot triples are bounded by their own observation
count, not the corpus. as-of and diff are filters/joins over the
interval table, which is |distinct triple × interval| sized — the
compact temporal index a 10^12-observation log compresses into.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

_KEY = ["subj", "pred", "obj"]


def validity_intervals(
    observations: DataFrame, gap_minutes: float = 30.0
) -> DataFrame:
    """(subj, pred, obj, valid_from, valid_to, n_obs) — one row per
    maximal observation run: consecutive observations of the same
    triple ≤ ``gap_minutes`` apart share an interval; a larger silence
    closes it (valid_to = last observation of the run) and the next
    observation opens a new one."""
    w = W.partitionBy(*_KEY).orderBy("ts")
    gap_s = float(gap_minutes) * 60.0
    # NTZ-safe epoch seconds (parquet event logs read as TIMESTAMP_NTZ,
    # which Spark 4 refuses to cast straight to double); the session-tz
    # offset a tz-cast introduces cancels in the difference
    epoch = F.col("ts").cast("timestamp").cast("double")
    flagged = observations.select(
        *_KEY,
        "ts",
        F.when(
            epoch - F.lag(epoch).over(w) > gap_s,
            1,
        )
        .otherwise(0)
        .alias("new_interval"),
    )
    numbered = flagged.withColumn(
        "interval_id", F.sum("new_interval").over(w)
    )
    return numbered.groupBy(*_KEY, "interval_id").agg(
        F.min("ts").alias("valid_from"),
        F.max("ts").alias("valid_to"),
        F.count(F.lit(1)).alias("n_obs"),
    ).drop("interval_id")


def asof_snapshot(intervals: DataFrame, at) -> DataFrame:
    """(subj, pred, obj) — the graph as of instant ``at`` (a timestamp
    literal or Column): triples with an interval covering it. A plain
    filter over the compact interval table — composes with every graph
    operator (pagerank/communities/diff of the graph 'as of last
    Tuesday')."""
    t = F.lit(at).cast("timestamp")
    return (
        intervals.where(
            (F.col("valid_from") <= t) & (F.col("valid_to") >= t)
        )
        .select(*_KEY)
        .distinct()
    )


def snapshot_diff_at(
    intervals: DataFrame, t_old, t_new
) -> DataFrame:
    """(subj, pred, obj, change) — edges 'added' (valid at t_new, not
    t_old) and 'removed' (valid at t_old, not t_new): two as-of filters
    + two anti-joins over the interval table."""
    old = asof_snapshot(intervals, t_old)
    new = asof_snapshot(intervals, t_new)
    added = new.join(old, _KEY, "left_anti").select(
        *_KEY, F.lit("added").alias("change")
    )
    removed = old.join(new, _KEY, "left_anti").select(
        *_KEY, F.lit("removed").alias("change")
    )
    return added.unionByName(removed)


def interval_stats(intervals: DataFrame) -> DataFrame:
    """One row — temporal-index health: n_triples, n_intervals,
    intervals per triple, mean/max interval seconds. The audit a
    gap-threshold choice is judged by (gap too small → interval count
    explodes; too large → retractions vanish)."""
    per = intervals.groupBy(*_KEY).agg(
        F.count(F.lit(1)).alias("n_int")
    )
    a = intervals.agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.round(
            F.avg(
                F.col("valid_to").cast("timestamp").cast("double")
                - F.col("valid_from").cast("timestamp").cast("double")
            ),
            2,
        ).alias("mean_interval_s"),
        F.round(
            F.max(
                F.col("valid_to").cast("timestamp").cast("double")
                - F.col("valid_from").cast("timestamp").cast("double")
            ),
            2,
        ).alias("max_interval_s"),
    )
    b = per.agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.round(F.avg("n_int"), 4).alias("intervals_per_triple"),
    )
    return b.crossJoin(a)
