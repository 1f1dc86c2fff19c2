"""Temporal-KG validity intervals — gap-coalescing goldens, as-of
snapshot semantics, diff, boundary inclusivity, and the two-shuffle
plan bound."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from naruhodo_spark.operators import temporal as TP

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _obs(spark, rows):
    """rows: (subj, pred, obj, minutes_after_t0)"""
    return spark.createDataFrame(
        [(s, p, o, T0 + timedelta(minutes=m)) for s, p, o, m in rows],
        "subj string, pred string, obj string, ts timestamp",
    )


def test_gap_coalescing_golden(spark):
    obs = _obs(spark, [
        ("a", "works_at", "acme", 0),
        ("a", "works_at", "acme", 10),
        ("a", "works_at", "acme", 20),
        # 100-minute silence → retraction, new interval after
        ("a", "works_at", "acme", 120),
        ("a", "works_at", "acme", 125),
        ("b", "works_at", "acme", 5),
    ])
    got = sorted(
        (r["subj"], r["valid_from"], r["valid_to"], r["n_obs"])
        for r in TP.validity_intervals(obs, gap_minutes=30).collect()
    )
    assert got == [
        ("a", T0, T0 + timedelta(minutes=20), 3),
        ("a", T0 + timedelta(minutes=120), T0 + timedelta(minutes=125), 2),
        ("b", T0 + timedelta(minutes=5), T0 + timedelta(minutes=5), 1),
    ]


def test_gap_boundary_is_inclusive(spark):
    """An observation EXACTLY gap minutes after the previous one stays
    in the same interval (strict > opens a new one)."""
    obs = _obs(spark, [("a", "p", "o", 0), ("a", "p", "o", 30),
                       ("a", "p", "o", 60.001)])
    ints = TP.validity_intervals(obs, gap_minutes=30).collect()
    assert len(ints) == 2  # 0+30 coalesce; 60.001 is > 30 past 30


def test_asof_snapshot_and_diff(spark):
    obs = _obs(spark, [
        ("a", "works_at", "acme", 0),
        ("a", "works_at", "acme", 20),
        ("a", "works_at", "globex", 120),
        ("a", "works_at", "globex", 140),
        ("b", "lives_in", "tokyo", 0),
        ("b", "lives_in", "tokyo", 20),
        ("b", "lives_in", "tokyo", 130),   # separate intervals (gap 30)
    ])
    ints = TP.validity_intervals(obs, gap_minutes=30)
    at10 = {(r["subj"], r["obj"]) for r in
            TP.asof_snapshot(ints, T0 + timedelta(minutes=10)).collect()}
    assert at10 == {("a", "acme"), ("b", "tokyo")}
    # t=125: only globex valid (tokyo's 2nd interval starts at 130)
    at125 = {(r["subj"], r["obj"]) for r in
             TP.asof_snapshot(ints, T0 + timedelta(minutes=125)).collect()}
    assert at125 == {("a", "globex")}
    diff = {(r["subj"], r["obj"], r["change"]) for r in TP.snapshot_diff_at(
        ints, T0 + timedelta(minutes=10), T0 + timedelta(minutes=125)
    ).collect()}
    assert diff == {
        ("a", "globex", "added"),
        ("a", "acme", "removed"),
        ("b", "tokyo", "removed"),
    }


def test_asof_boundaries_inclusive(spark):
    obs = _obs(spark, [("a", "p", "o", 10), ("a", "p", "o", 20)])
    ints = TP.validity_intervals(obs, gap_minutes=30)
    assert TP.asof_snapshot(ints, T0 + timedelta(minutes=10)).count() == 1
    assert TP.asof_snapshot(ints, T0 + timedelta(minutes=20)).count() == 1
    assert TP.asof_snapshot(ints, T0 + timedelta(minutes=21)).count() == 0


def test_interval_stats(spark):
    obs = _obs(spark, [
        ("a", "p", "o", 0), ("a", "p", "o", 10),
        ("a", "p", "o", 100),
        ("b", "p", "o", 0),
    ])
    [row] = TP.interval_stats(
        TP.validity_intervals(obs, gap_minutes=30)
    ).collect()
    assert row["n_triples"] == 2
    assert row["n_intervals"] == 3
    assert row["intervals_per_triple"] == 1.5
    assert row["max_interval_s"] == 600.0


def test_two_shuffles_total(spark):
    """One window + one groupBy on the same triple key: the interval
    build must not exceed two Exchanges (the scale bound)."""
    obs = _obs(spark, [("a", "p", "o", 0)])
    plan = TP.validity_intervals(obs)._jdf.queryExecution().executedPlan(
    ).toString()
    assert plan.count("Exchange") <= 2, plan
