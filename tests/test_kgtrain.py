"""Filtered negative sampling (ops/kgtrain.py): structural properties +
determinism. The exact picks are xxhash64-derived (not reproducible in
pure Python), so the contract is pinned by properties: corruption side,
no self-corruption, no positive leakage, per-positive bounds,
repartition invariance, and a uniformity sanity bound."""

from collections import Counter

from pyspark.sql import functions as F

from naruhodo_spark.ops import kgtrain as K


def _edges(spark, triples):
    return spark.createDataFrame(
        [(s, p, o, 1, False, False) for (s, p, o) in triples],
        "subj string, pred string, obj string, weight long,"
        " negative boolean, passive boolean",
    )


def _fixture(spark):
    triples = [
        (f"e{i}", "rel", f"e{(i * 7 + 3) % 40}")
        for i in range(40)
        if i != (i * 7 + 3) % 40
    ]
    return _edges(spark, triples), set(triples)


def test_negative_samples_properties(spark):
    df, pos = _fixture(spark)
    k = 4
    out = K.negative_samples(df, k=k).collect()
    assert len(out) > 0
    per_pos = Counter()
    for r in out:
        t = (r["subj"], r["pred"], r["obj"])
        assert t not in pos, "negative reproduces a positive"
        assert r["corrupted"] in ("head", "tail")
        # even neg_i corrupts tail, odd corrupts head
        assert r["corrupted"] == ("tail" if r["neg_i"] % 2 == 0 else "head")
        per_pos[(r["neg_i"],)] += 1
    # every neg_i slot produced SOME negatives (drops are rare)
    assert set(i for (i,) in per_pos) == set(range(k))
    # ≤ k per positive: len(out) ≤ k · |pos|
    assert len(out) <= k * len(pos)
    # drops are bounded: ≥ 80% of the k·|pos| corruptions survive
    assert len(out) >= 0.8 * k * len(pos)


def test_negative_samples_deterministic_and_repartition_invariant(spark):
    df, _ = _fixture(spark)
    a = sorted(map(tuple, K.negative_samples(df, k=2).collect()))
    b = sorted(
        map(
            tuple,
            K.negative_samples(
                _edges(
                    spark,
                    [  # same triples, different input order + partitioning
                        (r["subj"], r["pred"], r["obj"])
                        for r in df.orderBy(F.desc("subj")).collect()
                    ],
                ).repartition(13),
                k=2,
            ).collect(),
        )
    )
    assert a == b


def test_negative_samples_replacements_spread(spark):
    """Uniformity sanity: across many corruptions, the replacement
    entities are not concentrated on a handful of nodes."""
    df, pos = _fixture(spark)
    out = K.negative_samples(df, k=8).collect()
    repl = Counter()
    for r in out:
        repl[r["subj"] if r["corrupted"] == "head" else r["obj"]] += 1
    assert len(repl) >= 20  # at least half the 40-entity vocabulary used
    assert max(repl.values()) <= len(out) * 0.2


def test_negative_samples_empty(spark):
    df = _edges(spark, [])
    assert K.negative_samples(df).count() == 0


def test_negative_samples_k_zero_and_objectless(spark):
    """k<=0 returns nothing (sequence(0,-1) would count down); objectless
    positives never produce negatives (no empty-string tails, no
    invented tails for claims the positive never made)."""
    df = _edges(spark, [("a", "run", ""), ("a", "rel", "b"), ("c", "rel", "d")])
    assert K.negative_samples(df, k=0).count() == 0
    out = K.negative_samples(df, k=4).collect()
    assert len(out) > 0
    for r in out:
        assert r["obj"] != "", r
        assert (r["subj"], r["pred"], r["obj"]) != ("a", "run", "")
        assert r["neg_i"] >= 0
