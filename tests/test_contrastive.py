"""Contrastive pair sampling (ops/contrastive.py): positive/negative
structure vs a python mirror of the deterministic rules, singleton
handling, filtered-sampling guarantees, and determinism."""

import pytest
from pyspark.sql import functions as F

from naruhodo_spark import queries as Q
from naruhodo_spark.ops import contrastive as C

SF = "/root/testdata/sf0.001"


def _groups(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, group_id string")


@pytest.fixture(scope="module")
def grouped(spark):
    # two real groups + two singletons
    return _groups(
        spark,
        [
            ("d0", "gA"), ("d1", "gA"), ("d2", "gA"),
            ("d3", "gB"), ("d4", "gB"),
            ("d5", "g5"), ("d6", "g6"),
        ],
    )


def test_positive_structure(spark, grouped):
    out = C.contrastive_pairs(grouped, k_neg=0).collect()
    got = {(r["anchor"], r["other"]) for r in out}
    # every multi-group member anchors once; pos = group min (or second
    # least for the min itself); singletons never anchor
    assert got == {
        ("d0", "d1"), ("d1", "d0"), ("d2", "d0"),
        ("d3", "d4"), ("d4", "d3"),
    }
    assert all(r["label"] == "pos" and r["neg_i"] is None for r in out)


def test_negatives_never_same_group(spark, grouped):
    out = C.contrastive_pairs(grouped, k_neg=3)
    group_of = {r["doc_id"]: r["group_id"] for r in grouped.collect()}
    negs = [r for r in out.collect() if r["label"] == "neg"]
    assert negs  # sampling produced something
    for r in negs:
        assert group_of[r["other"]] != group_of[r["anchor"]]
        assert r["other"] != r["anchor"]
        assert 0 <= r["neg_i"] < 3
    # at most k per anchor
    per_anchor = {}
    for r in negs:
        per_anchor[r["anchor"]] = per_anchor.get(r["anchor"], 0) + 1
    assert all(v <= 3 for v in per_anchor.values())
    # singletons CAN appear as negatives
    others = {r["other"] for r in negs}
    assert others  # non-empty; membership of singletons is corpus-luck


def test_deterministic_across_partitionings(spark, grouped):
    a = C.contrastive_pairs(grouped, k_neg=2)
    b = C.contrastive_pairs(grouped.repartition(9), k_neg=2)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_all_singletons_yields_empty(spark):
    g = _groups(spark, [("a", "g1"), ("b", "g2"), ("c", "g3")])
    assert C.contrastive_pairs(g, k_neg=2).count() == 0


def test_k_neg_zero_and_negative(spark, grouped):
    out = C.contrastive_pairs(grouped, k_neg=0)
    assert {r["label"] for r in out.collect()} == {"pos"}
    with pytest.raises(ValueError):
        C.contrastive_pairs(grouped, k_neg=-1)


def test_query_surface_runs(spark):
    out = Q.QUERIES["td_contrastive_pairs"](spark, SF)
    rows = out.collect()
    assert set(out.columns) == {"anchor", "other", "label", "neg_i"}
    labels = {r["label"] for r in rows}
    assert "pos" in labels  # sf0.001 has planted near-dups


def test_negatives_distinct_per_anchor(spark, grouped):
    """Duplicate negatives (two neg_i picks resolving to one candidate)
    collapse to the lowest neg_i — every (anchor, other) pair unique."""
    out = C.contrastive_pairs(grouped, k_neg=4)
    negs = [r for r in out.collect() if r["label"] == "neg"]
    seen = set()
    for r in negs:
        assert (r["anchor"], r["other"]) not in seen
        seen.add((r["anchor"], r["other"]))


# ---------------------------------------------------------------------
# hard negatives (DPR-style ANN mining with false-negative guards)
# ---------------------------------------------------------------------

def _emb_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id string, embedding array<double>, label int, grp string"
    )


def _np_hard_negatives(rows, k, thr, grouped):
    import numpy as np

    out = {}
    for vid, e, cell, grp in rows:
        cands = []
        for vid2, e2, cell2, grp2 in rows:
            if vid2 == vid or cell2 != cell:
                continue
            if grouped and grp2 == grp:
                continue
            a, b = np.array(e), np.array(e2)
            cos = round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 4)
            if cos >= thr:
                continue
            cands.append((-cos, vid2, cos))
        cands.sort()
        out[vid] = [(v, c) for _, v, c in cands[:k]]
    return out


def test_hard_negatives_matches_bruteforce(spark):
    from naruhodo_spark.ops.contrastive import hard_negatives

    rows = [
        ("v1", [1.0, 0.0], 0, "g1"),
        ("v2", [0.9, 0.1], 0, "g1"),   # same group as v1: excluded for v1
        ("v3", [0.8, 0.3], 0, "g2"),
        ("v4", [0.0, 1.0], 0, "g3"),
        ("v5", [1.0, 0.01], 0, "g4"),  # near-dup of v1: threshold-excluded
        ("v6", [0.5, 0.5], 1, "g5"),   # different cell: never a candidate
        ("v7", [0.4, 0.6], 1, "g6"),
    ]
    got = {}
    res = hard_negatives(
        _emb_df(spark, rows), k=2, exclude_threshold=0.995, group_col="grp"
    ).collect()
    for r in res:
        got.setdefault(r["anchor"], []).append((r["negative"], r["cosine"]))
    for a in got:
        got[a].sort(key=lambda t: (-t[1], t[0]))
    want = _np_hard_negatives(rows, k=2, thr=0.995, grouped=True)
    want = {a: v for a, v in want.items() if v}
    assert got == want


def test_hard_negatives_without_groups(spark):
    from naruhodo_spark.ops.contrastive import hard_negatives

    rows = [
        ("v1", [1.0, 0.0], 0, "x"),
        ("v2", [0.0, 1.0], 0, "x"),
        ("v3", [0.7, 0.7], 0, "x"),
    ]
    res = hard_negatives(
        _emb_df(spark, rows).drop("grp"), k=1, exclude_threshold=0.999
    ).collect()
    # every vector gets exactly its single hardest neighbor
    assert {(r["anchor"], r["rank"]) for r in res} == {
        ("v1", 1), ("v2", 1), ("v3", 1)
    }


def test_hard_negatives_float32_matches_float64_mirror(spark):
    """ADVICE r04: the dot product must cast to double BEFORE
    multiplying (similarity._dot convention) — float32 inputs whose
    products accumulate in single precision can cross the 4-dp rounding
    or exclude_threshold boundary away from the float64 mirror."""
    import numpy as np

    from naruhodo_spark.ops.contrastive import hard_negatives

    rng = np.random.RandomState(7)
    rows = [
        (f"v{i}", [float(np.float32(x)) for x in rng.randn(16)], i % 2, "x")
        for i in range(24)
    ]
    f32 = spark.createDataFrame(
        rows, "vec_id string, embedding array<float>, label int, grp string"
    ).drop("grp")
    got = {
        (r["anchor"], r["negative"]): r["cosine"]
        for r in hard_negatives(f32, k=3, exclude_threshold=0.98).collect()
    }
    want = _np_hard_negatives(
        [(v, e, c, g) for v, e, c, g in rows], k=3, thr=0.98, grouped=False
    )
    flat = {(a, v): c for a, lst in want.items() for v, c in lst}
    assert got == flat


def test_hard_negatives_bad_k(spark):
    import pytest as _pt
    from naruhodo_spark.ops.contrastive import hard_negatives

    with _pt.raises(ValueError, match="k must be"):
        hard_negatives(_emb_df(spark, [("v", [1.0], 0, "g")]), k=0)
