"""Edge-case guards on the temporal joins (ADVICE r01 items 2 and 3)."""

import pyspark.sql.functions as F

from naruhodo_spark.ops.asof import join_asof, join_range


def test_join_range_inverted_interval_yields_nothing(spark):
    """end <= start is empty under the half-open contract and must NOT
    explode a descending F.sequence (step −1 from 10^9 would build an
    executor-OOM-sized bucket array before the containment filter)."""
    left = spark.createDataFrame(
        [(1, 1_000_000_000, 0), (1, 0, 3600), (2, 500, 500)],
        "user_id long, start long, end long",
    )
    right = spark.createDataFrame(
        [(1, 100), (2, 500)], "user_id long, ts long"
    )
    got = join_range(left, right).collect()
    # only the valid [0, 3600) interval matches; the inverted and the
    # zero-width ones contribute nothing (and build no bucket rows)
    assert [(r["user_id"], r["ts"]) for r in got] == [(1, 100)]


def test_join_asof_null_right_ts_never_matches(spark):
    """A right row with NULL ts sorts first in the ascending window and
    would otherwise become a universal 'earliest' match; DuckDB ASOF and
    pandas merge_asof never match NULL timestamps."""
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 5, "b")], "user_id long, ts long, tag string"
    )
    right = spark.createDataFrame(
        [(1, None, 999.0), (1, 7, 1.5)],
        "user_id long, ts long, payload double",
    )
    got = {
        (r["tag"]): (r["asof_ts"], r["asof_payload"])
        for r in join_asof(left, right).collect()
    }
    assert got["a"] == (7, 1.5)        # matches the real prior row
    assert got["b"] == (None, None)    # NOT the NULL-ts row's payload


def test_join_asof_null_left_ts_gets_no_match(spark):
    left = spark.createDataFrame(
        [(1, None, "x")], "user_id long, ts long, tag string"
    )
    right = spark.createDataFrame(
        [(1, 7, 1.5)], "user_id long, ts long, payload double"
    )
    rows = join_asof(left, right).collect()
    assert len(rows) == 1
    assert rows[0]["asof_ts"] is None and rows[0]["asof_payload"] is None
