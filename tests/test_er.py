"""Entity-resolution blocking + edit distance — exact python mirror,
multi-pass blocking, cap audit, cluster closure, and plan shape."""

import itertools

import pytest
from pyspark.sql import functions as F

from naruhodo_spark.operators import er


def _recs(spark, names):
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "rid long, name string"
    )


NAMES = [
    "red widget",
    "Red  Widget",   # exact dup after normalization
    "red widgit",    # typo, same block (widgit ≠ widget block!) — see test
    "blue widget",
    "bleu widget",
    "red gear",
    "hot gear",
    "standalone",
]


def _python_mirror(names, max_distance, block_fn):
    """Brute-force reference: normalize, collapse, block, pairwise
    Levenshtein (textbook DP)."""

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    import re

    norm = {}
    for n in names:
        key = re.sub(r"\s+", " ", n.strip().lower())
        norm[key] = norm.get(key, 0) + 1
    out = set()
    for a, b in itertools.combinations(sorted(norm), 2):
        if block_fn(a) == block_fn(b) and lev(a, b) <= max_distance:
            out.add((a, b, lev(a, b)))
    return out


def test_matches_equal_python_mirror(spark):
    got, audit = er.blocked_matches(_recs(spark, NAMES), "rid", "name", 3)
    want = _python_mirror(NAMES, 3, lambda s: s.split()[-1])
    assert {
        (r["name_a"], r["name_b"], r["distance"]) for r in got.collect()
    } == want
    assert audit.count() == 0


def test_exact_collapse_counts_records(spark):
    reps = {
        r["name"]: r["n_records"]
        for r in er.name_representatives(_recs(spark, NAMES), "rid", "name").collect()
    }
    assert reps["red widget"] == 2  # 'Red  Widget' normalized in
    assert reps["standalone"] == 1


def test_blocking_misses_cross_block_pair_single_pass(spark):
    """'red widget' vs 'red widgit' differ in the BLOCK token — a
    single last-token pass must miss it (that's the blocking trade)."""
    got, _ = er.blocked_matches(_recs(spark, NAMES), "rid", "name", 3)
    pairs = {(r["name_a"], r["name_b"]) for r in got.collect()}
    assert ("red widget", "red widgit") not in pairs
    assert ("bleu widget", "red widget") in pairs  # same block, d=3


def test_multi_pass_blocking_recovers_cross_block_pair(spark):
    first_token = lambda c: F.regexp_extract(c, r"^(\S+)", 1)
    got, _ = er.blocked_matches(
        _recs(spark, NAMES), "rid", "name", 3,
        block=[er.last_token_block, first_token],
    )
    pairs = {(r["name_a"], r["name_b"]) for r in got.collect()}
    assert ("red widget", "red widgit") in pairs
    # deduped across passes: no pair twice
    assert got.count() == got.dropDuplicates(["name_a", "name_b"]).count()


def test_max_block_cap_drops_loudly(spark):
    # 'widget' block has 3 distinct names; cap at 2 → dropped + audited
    got, audit = er.blocked_matches(
        _recs(spark, NAMES), "rid", "name", 3, max_block=2
    )
    pairs = {(r["name_a"], r["name_b"]) for r in got.collect()}
    assert not any("widget" in a for a, _ in pairs)
    rows = audit.collect()
    assert [(r["block_key"], r["n_names"]) for r in rows] == [("widget", 3)]


def test_sim_formula(spark):
    got, _ = er.blocked_matches(
        _recs(spark, ["abcd", "abce"]), "rid", "name", 1,
        block=lambda c: F.lit("one"),
    )
    [r] = got.collect()
    assert r["distance"] == 1 and r["sim"] == pytest.approx(0.75)


def test_clusters_transitive_closure(spark):
    # chain: a-b (d=1), b-c (d=1), a-c (d=2): all one cluster even at
    # max_distance=1 via CC closure
    names = ["gears", "bears", "beads", "other"]
    out = {
        r["name"]: r["cluster"]
        for r in er.match_clusters(
            _recs(spark, names), "rid", "name", max_distance=1,
            block=lambda c: F.lit("one"),
        ).collect()
    }
    assert out["gears"] == out["bears"] == out["beads"] == "beads"
    assert out["other"] == "other"  # singleton keeps itself


def test_no_self_or_reversed_pairs(spark):
    got, _ = er.blocked_matches(_recs(spark, NAMES), "rid", "name", 10)
    for r in got.collect():
        assert r["name_a"] < r["name_b"]


def test_levenshtein_stays_jvm_side(spark):
    got, _ = er.blocked_matches(_recs(spark, NAMES), "rid", "name", 3)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "levenshtein" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
