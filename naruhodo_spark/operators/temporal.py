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


def allen_relations(
    intervals: DataFrame,
    key: "list[str] | None" = None,
    max_per_key: int | None = 1000,
):
    """(intervals ⟶ pairwise temporal structure): classify every pair
    of validity intervals sharing ``key`` (default ["subj"] — facts
    about the same entity) into Allen's interval algebra (Allen, CACM
    1983): before / meets / overlaps / starts / during / finishes /
    equals. Returns ``(pairs, audit)``:

    - pairs: (key…, pred_a, obj_a, from_a, to_a, pred_b, obj_b,
      from_b, to_b, relation) — ONE row per unordered interval pair,
      the A side being the lexicographically smaller
      (valid_from, valid_to, pred, obj) tuple, so the 6 inverse
      relations never appear (read them by swapping sides); the
      relation names are A-relative-to-B.
    - audit: (key…, n_intervals) for key groups larger than
      ``max_per_key``, which are EXCLUDED from pairs (the self-join is
      n² per key; a god-entity with 10^6 facts would be 10^12 pairs).
      Empty when nothing was dropped — callers MUST check (repo
      policy: no silent drops). ``max_per_key=None`` uncaps.

    Shape: one per-key count groupBy + ONE self-equi-join on the
    uniform key (hub keys removed beforehand by the cap), CASE
    expression for the relation — pairs per key bounded by
    max_per_key², all JVM-side.
    """
    key = list(key) if key is not None else ["subj"]
    # fact columns = the triple parts NOT in the pairing key (pairing
    # by [subj, pred] leaves only obj to carry per side)
    facts = [c for c in ("pred", "obj") if c not in key]
    iv = intervals.select(
        *key,
        *facts,
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    sizes = iv.groupBy(*key).agg(F.count(F.lit(1)).alias("n_intervals"))
    if max_per_key is not None:
        audit = sizes.where(F.col("n_intervals") > int(max_per_key))
        iv = iv.join(
            audit.select(*key), key, "left_anti"
        )
    else:
        audit = sizes.where(F.lit(False))

    def _side(s):
        return iv.select(
            *key,
            *[F.col(c).alias(f"{c}_{s}") for c in facts],
            F.col("valid_from").alias(f"from_{s}"),
            F.col("valid_to").alias(f"to_{s}"),
        )

    a, b = _side("a"), _side("b")
    # deterministic side assignment: A = smaller (from, to, facts…)
    tup_a = F.struct("from_a", "to_a", *[f"{c}_a" for c in facts])
    tup_b = F.struct("from_b", "to_b", *[f"{c}_b" for c in facts])
    joined = a.join(b, key).where(tup_a < tup_b)
    fa, ta, fb, tb = (
        F.col("from_a"), F.col("to_a"), F.col("from_b"), F.col("to_b")
    )
    relation = (
        F.when((fa == fb) & (ta == tb), "equals")
        .when(ta < fb, "before")
        .when(ta == fb, "meets")
        .when((fa == fb) & (ta < tb), "starts")
        # A's side tuple being smaller means fa <= fb, and when
        # fa == fb also ta <= tb — so the inverse relations with A
        # starting later are unreachable; the rest split on A's right
        # edge relative to B's
        .when(ta > tb, "during_inv")    # B during A
        .when(ta == tb, "finishes_inv")  # B finishes A
        .otherwise("overlaps")
    )
    pairs = joined.select(
        *key,
        *[f"{c}_a" for c in facts],
        "from_a", "to_a",
        *[f"{c}_b" for c in facts],
        "from_b", "to_b",
        relation.alias("relation"),
    )
    return pairs, audit
