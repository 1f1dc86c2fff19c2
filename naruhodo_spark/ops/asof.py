"""As-of join — beyond the reference (naruhodo has no temporal joins,
SURVEY.md O23) but a staple of event/feature pipelines: for each left
row, attach the latest right row with right.ts <= left.ts per key.

Plan shape (the 100 TB-safe one): tag the sides, unionByName, ONE window
pass per key ordered by (ts, side) carrying the right payload forward
with last(ignorenulls). A single sort-shuffle on the key — never the
range cross-product a naive `l.ts >= r.ts` theta join explodes into, and
no per-key driver loops. DuckDB's native ASOF JOIN is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def join_range(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    start: str = "start",
    end: str = "end",
    ts: str = "ts",
    bucket: int = 3600,
) -> DataFrame:
    """Interval-containment join (half-open [start, end), integral
    numeric bounds): each left interval is exploded into the fixed-width
    buckets it overlaps, right rows equi-join on (key, bucket(ts)), and
    the exact containment filter runs on the co-located pairs — the
    bucketized plan that keeps a temporal join an EQUI-join (shuffle on
    a uniform composite key) instead of the theta-join cross-product per
    key. Each matching pair surfaces exactly once (a ts lives in exactly
    one bucket), so no dedup pass is needed. Pick `bucket` near the
    typical interval width: wider buckets explode fewer rows, narrower
    ones co-locate less dead weight.

    Malformed intervals (end <= start — empty by the half-open contract)
    are dropped BEFORE the explode: F.sequence defaults to step −1 when
    stop < start, so a bad interval like (10^9, 0) would otherwise
    explode into ~start/bucket rows (executor-OOM-sized) only to be
    discarded by the containment filter."""
    l2 = left.where(F.col(end) > F.col(start)).withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(start) / bucket), F.floor((F.col(end) - 1) / bucket)
            )
        ),
    )
    r2 = right.withColumn("_b", F.floor(F.col(ts) / bucket))
    return (
        l2.join(r2, [key, "_b"])
        .where((F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end)))
        .drop("_b")
    )


def join_asof(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join. `right` must be unique per (key, ts) — the
    deterministic contract native ASOF implementations share; pre-
    aggregate duplicates away. Right's non-key columns come back
    prefixed; rows with no prior right row get nulls.

    The right payload rides as ONE struct so all its columns come from
    the SAME matched row (independent per-column last() fills could mix
    rows when payload columns contain nulls).

    Right rows with a NULL ts are dropped: Spark sorts nulls first, so
    such a row would otherwise become a universal 'earliest' match —
    diverging from DuckDB ASOF / pandas merge_asof, which never match
    NULL timestamps. (A LEFT row with NULL ts needs no handling: it
    sorts to the partition head and finds no prior right row → null
    payload, same as the native implementations.)"""
    # NULL join keys never match (DuckDB ASOF / pandas merge_asof
    # semantics) — Window.partitionBy would otherwise group all NULL
    # keys into one partition and match them to each other
    right = right.where(F.col(ts).isNotNull() & F.col(key).isNotNull())
    rpay = [c for c in right.columns if c != key]
    payload = F.struct(*[F.col(c) for c in rpay])
    l = left.withColumn("_lr", F.lit(1)).withColumn(
        "_pay", F.lit(None).cast(right.select(payload).schema[0].dataType)
    )
    r = right.select(
        F.col(key),
        F.col(ts).alias("_ord_ts"),
        F.lit(0).alias("_lr"),
        payload.alias("_pay"),
    )
    for c in left.columns:
        if c != key:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    l = l.withColumn("_ord_ts", F.col(ts))
    u = l.select(*l.columns).unionByName(r.select(*l.columns))
    # right rows (_lr=0) sort before left rows at equal ts, so a right
    # row AT the left timestamp is visible to it (<= semantics)
    w = (
        W.partitionBy(key)
        .orderBy("_ord_ts", "_lr")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = u.withColumn("_match", F.last("_pay", ignorenulls=True).over(w))
    return filled.where(F.col("_lr") == 1).select(
        *left.columns,
        *[F.col("_match").getField(c).alias(prefix + c) for c in rpay],
    )
