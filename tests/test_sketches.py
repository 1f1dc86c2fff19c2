"""Mergeable-sketch operators (ops/sketches.py): HLL distinct panels
(estimate accuracy, merge associativity, as-of-epoch folding) and the
Count-Min frequency sketch with its driver-side point-query mirror
(CMS overestimate-only guarantee vs exact counts)."""

import pyspark.sql.functions as F
import pytest

from naruhodo_spark.ops import sketches as SK


@pytest.fixture(scope="module")
def events(spark):
    # 3 sources × skewed keys: key k appears (k % 97) + 1 times
    return spark.range(0, 20_000).select(
        (F.col("id") % 3).cast("string").alias("source"),
        F.concat(F.lit("u"), (F.col("id") % 4_000).cast("string")).alias("user"),
    )


def test_hll_estimate_within_error(spark, events):
    est = SK.estimate_distinct(
        SK.sketch_distinct(events, ["source"], "user")
    ).collect()
    exact = {
        r["source"]: r["n"]
        for r in events.groupBy("source")
        .agg(F.countDistinct("user").alias("n"))
        .collect()
    }
    assert len(est) == 3
    for r in est:
        true = exact[r["source"]]
        assert abs(r["n_distinct_est"] - true) / true < 0.05, (r, true)


def test_hll_merge_matches_full_and_is_order_invariant(spark, events):
    # split into 4 "epochs", sketch each, merge — vs one sketch over all
    epochs = [
        SK.sketch_distinct(
            events.where(F.pmod(F.xxhash64("user"), F.lit(4)) == i), [], "user"
        ).withColumn("part", F.lit(i))
        for i in range(4)
    ]
    stacked = epochs[0]
    for e in epochs[1:]:
        stacked = stacked.unionByName(e)
    merged = SK.estimate_distinct(
        SK.merge_sketches(stacked, ["metric"])
    ).head()["n_distinct_est"]
    full = SK.estimate_distinct(
        SK.sketch_distinct(events, [], "user")
    ).head()["n_distinct_est"]
    exact = events.select("user").distinct().count()
    assert abs(merged - exact) / exact < 0.05
    # order invariance: reversed stacking gives the identical estimate
    stacked_rev = epochs[3]
    for e in (epochs[2], epochs[1], epochs[0]):
        stacked_rev = stacked_rev.unionByName(e)
    merged_rev = SK.estimate_distinct(
        SK.merge_sketches(stacked_rev, ["metric"])
    ).head()["n_distinct_est"]
    assert merged == merged_rev
    # sketch-of-union ≈ union-of-sketches (both within error of exact)
    assert abs(full - exact) / exact < 0.05


def test_entity_sketch_panel_asof_epoch(spark):
    def triples(epoch, n):
        return spark.range(0, n).select(
            F.concat(F.lit(f"s{epoch}-"), (F.col("id") % 50).cast("string"))
            .alias("subj"),
            F.lit("visited").alias("pred"),
            F.concat(F.lit("o"), (F.col("id") % 30).cast("string"))
            .alias("obj"),
            F.concat(F.lit(f"d{epoch}-"), F.col("id").cast("string"))
            .alias("doc_id"),
        )

    t0, t1 = triples(0, 400), triples(1, 600)
    panel = SK.entity_sketch_panel(t0, 0).unionByName(
        SK.entity_sketch_panel(t1, 1)
    )
    assert panel.count() == 8  # 4 metrics × 2 epochs
    asof1 = {
        r["metric"]: r["n_distinct_est"]
        for r in SK.estimate_distinct(
            SK.merge_sketches(panel.where(F.col("epoch") <= 1), ["metric"])
        ).collect()
    }
    both = t0.unionByName(t1)
    for m in ("subj", "pred", "obj", "doc_id"):
        exact = both.select(m).distinct().count()
        assert abs(asof1[m] - exact) <= max(1, 0.05 * exact), (m, asof1[m], exact)


def test_cms_point_query_mirrors_spark(spark):
    # skewed frame: key "hot" ~ half the rows, tail keys once each
    df = spark.range(0, 5_000).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("t"), F.col("id").cast("string")))
        .alias("k")
    )
    sk = SK.freq_sketch(df, "k", eps=0.001, confidence=0.99).head()
    exact = {r["k"]: r["n"] for r in
             df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    probe = ["hot", "t1", "t3", "t4001", "never-seen"]
    est = SK.cms_estimate(
        sk["sketch"], SK.xxhash64_map(spark, probe)
    )
    n = sk["n_rows"]
    for k in probe:
        true = exact.get(k, 0)
        assert est[k] >= true, (k, est[k], true)  # CMS never undercounts
        assert est[k] <= true + 0.001 * n + 1, (k, est[k], true)
    # the hot key is cleanly separable from the tail — the skew-probe use
    assert est["hot"] > 10 * max(est["t1"], est["t3"], 1)


def test_cms_typed_keys_roundtrip(spark):
    # boolean/float keys must hash through Spark's cast rules, not
    # Python str() — 'true' vs 'True', '1.0E-7' vs '1e-07'
    df = spark.createDataFrame(
        [(True,)] * 30 + [(False,)] * 5, ["k"]
    )
    sk = SK.freq_sketch(df, "k", eps=0.01, confidence=0.99).head()
    est = SK.cms_estimate(sk["sketch"], SK.xxhash64_map(spark, [True, False]))
    assert est[True] >= 30 and est[False] >= 5
    assert est[True] <= 30 + 0.01 * 35 + 1


def test_cms_null_key_distinct_from_empty_string(spark):
    """ADVICE r03: NULL and '' must occupy distinct CMS cells — the
    coalesce-to-'' shape merged their counts, overestimating both
    beyond the eps·N bound. 40 NULLs + 3 empties: each estimate must
    stay within its own eps·N envelope, not the merged 43."""
    df = spark.createDataFrame(
        [(None,)] * 40 + [("",)] * 3 + [("x",)] * 7,
        "k string",
    )
    sk = SK.freq_sketch(df, "k", eps=0.001, confidence=0.99).head()
    est = SK.cms_estimate(
        sk["sketch"], SK.xxhash64_map(spark, [None, "", "x"])
    )
    n = sk["n_rows"]
    assert n == 50
    assert 40 <= est[None] <= 40 + 0.001 * n + 1
    assert 3 <= est[""] <= 3 + 0.001 * n + 1  # NOT 43
    assert 7 <= est["x"] <= 7 + 0.001 * n + 1


# ---------------------------------------------------------------------
# DDSketch-style quantile sketches
# ---------------------------------------------------------------------

def test_quantile_sketch_relative_error_bound(spark):
    import numpy as np
    from naruhodo_spark.ops import sketches as SK

    rng = np.random.default_rng(9)
    vals = np.concatenate([
        rng.lognormal(3.0, 1.5, 4000),        # heavy-tailed positives
        rng.uniform(0.001, 2.0, 1000),
    ])
    df = spark.createDataFrame(
        [(float(v),) for v in vals], "x double"
    ).withColumn("g", __import__("pyspark.sql.functions", fromlist=["lit"]).lit("all"))
    sk = SK.quantile_sketch(df, ["g"], "x", rel_err=0.01)
    got = {
        r["q"]: r["value"]
        for r in SK.estimate_quantiles(sk, [0.5, 0.9, 0.99], ["g"],
                                       rel_err=0.01).collect()
    }
    for q in (0.5, 0.9, 0.99):
        true = float(np.quantile(vals, q))
        assert abs(got[q] - true) / true <= 0.011 + 2.0 / len(vals), (
            q, got[q], true
        )


def test_quantile_sketch_merge_equals_whole(spark):
    import numpy as np
    from pyspark.sql import functions as F
    from naruhodo_spark.ops import sketches as SK

    rng = np.random.default_rng(3)
    vals = rng.exponential(50.0, 3000)
    df = spark.createDataFrame(
        [(float(v), int(i % 4)) for i, v in enumerate(vals)],
        "x double, epoch int",
    ).withColumn("g", F.lit("all"))
    # per-epoch panels folded == one-shot sketch
    panel = SK.quantile_sketch(df, ["g", "epoch"], "x").drop("epoch")
    folded = sorted(
        map(tuple, SK.merge_quantile_sketches(panel, ["g"]).collect())
    )
    whole = sorted(map(tuple, SK.quantile_sketch(df, ["g"], "x").collect()))
    assert folded == whole


def test_quantile_sketch_zero_negative_and_groups(spark):
    from naruhodo_spark.ops import sketches as SK

    rows = [("a", -100.0), ("a", -1.0), ("a", 0.0), ("a", 1.0), ("a", 100.0),
            ("b", 10.0), ("b", 20.0), ("b", 30.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    sk = SK.quantile_sketch(df, ["g"], "x")
    got = {
        (r["g"], r["q"]): r["value"]
        for r in SK.estimate_quantiles(sk, [0.0, 0.5, 1.0], ["g"]).collect()
    }
    # group a: median is the zero bucket; min is ~-100 (1% rel err)
    assert got[("a", 0.5)] == 0.0
    assert abs(got[("a", 0.0)] + 100.0) <= 1.5
    assert abs(got[("a", 1.0)] - 100.0) <= 1.5
    # group b: median ~20
    assert abs(got[("b", 0.5)] - 20.0) <= 0.5


def test_quantile_sketch_bad_args(spark):
    import pytest as _pt
    from naruhodo_spark.ops import sketches as SK

    df = spark.createDataFrame([(1.0,)], "x double")
    with _pt.raises(ValueError, match="rel_err"):
        SK.quantile_sketch(df, [], "x", rel_err=0.0)
    sk = SK.quantile_sketch(df.withColumn("g", df.x), ["g"], "x")
    with _pt.raises(ValueError, match="outside"):
        SK.estimate_quantiles(sk, [1.5], ["g"]).collect()
