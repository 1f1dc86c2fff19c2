"""Deterministic random walks (ops/walks.py): structural validity
(every consecutive pair is a true edge), exact walk counts, dead-end
truncation, determinism across partitionings, the skew-safe neighbor
cap, and a python mirror for skip-gram pair extraction."""

import pytest
from pyspark.sql import functions as F

from naruhodo_spark import queries as Q
from naruhodo_spark.ops import walks as W

SF = "/root/testdata/sf0.001"


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


@pytest.fixture(scope="module")
def diamond(spark):
    # a -> {b, c} -> d -> e ; f is a source with one dead-end neighbor
    return _edges(
        spark,
        [
            ("a", "b"),
            ("a", "c"),
            ("b", "d"),
            ("c", "d"),
            ("d", "e"),
            ("f", "g"),
        ],
    )


def test_walks_are_paths_in_the_graph(spark, diamond):
    walks = W.random_walks(diamond, walks_per_node=3, length=4)
    edge_set = {(r["src"], r["dst"]) for r in diamond.collect()}
    for r in walks.collect():
        w = r["walk"]
        assert 1 <= len(w) <= 4
        assert w[0] == r["start"]
        for u, v in zip(w, w[1:]):
            assert (u, v) in edge_set


def test_walk_counts_and_starts(spark, diamond):
    walks = W.random_walks(diamond, walks_per_node=3, length=4)
    # every node with an out-neighbor starts exactly walks_per_node walks
    per_start = {
        r["start"]: r["n"]
        for r in walks.groupBy("start").agg(F.count("*").alias("n")).collect()
    }
    assert per_start == {k: 3 for k in ["a", "b", "c", "d", "f"]}
    assert walks.select("walk_id").distinct().count() == 15


def test_dead_end_truncation(spark, diamond):
    walks = W.random_walks(diamond, walks_per_node=1, length=10)
    by_start = {r["start"]: r["walk"] for r in walks.collect()}
    # g and e have no out-edges: any walk reaching them stops there
    assert by_start["f"] == ["f", "g"]
    assert by_start["d"] == ["d", "e"]
    # a full walk from a: a -> (b|c) -> d -> e, length 4 < 10
    assert len(by_start["a"]) == 4 and by_start["a"][-1] == "e"


def test_walks_deterministic_across_partitionings(spark, diamond):
    a = W.random_walks(diamond, walks_per_node=2, length=5)
    b = W.random_walks(diamond.repartition(7), walks_per_node=2, length=5)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_seed_changes_walks(spark, diamond):
    a = W.random_walks(diamond, walks_per_node=2, length=5, seed="s1")
    b = W.random_walks(diamond, walks_per_node=2, length=5, seed="s2")
    # same shape, (almost surely) different neighbor choices at 'a'
    assert a.count() == b.count()
    pa = {r["walk_id"]: tuple(r["walk"]) for r in a.collect()}
    pb = {r["walk_id"]: tuple(r["walk"]) for r in b.collect()}
    assert pa != pb  # at least one walk picks a different branch at 'a'


def test_neighbor_cap_bounds_adjacency(spark):
    hub = _edges(spark, [("hub", f"n{i:03d}") for i in range(200)])
    adj = W._capped_adjacency(hub, neighbor_cap=32, seed="s")
    n = adj.count()
    # expected ~deg/ratio = 200/7 ≈ 29 survivors; the bound is the cap
    # times a small variance factor, never the raw degree
    assert 0 < n <= 64
    # dense contiguous index
    rows = adj.orderBy("idx").collect()
    assert [r["idx"] for r in rows] == list(range(n))
    assert all(r["n_nbrs"] == n for r in rows)
    # under the cap: nothing dropped
    small = W._capped_adjacency(
        _edges(spark, [("h", f"n{i}") for i in range(10)]), 32, "s"
    )
    assert small.count() == 10


def test_parallel_edges_and_self_loops_ignored(spark):
    g = _edges(
        spark, [("a", "b"), ("a", "b"), ("a", "a"), ("b", "c")]
    )
    walks = W.random_walks(g, walks_per_node=4, length=3)
    for r in walks.collect():
        w = r["walk"]
        for u, v in zip(w, w[1:]):
            assert u != v  # self-loop never taken


def _py_pairs(walk, window):
    out = []
    for i, c in enumerate(walk):
        for o in range(-window, window + 1):
            j = i + o
            if o != 0 and 0 <= j < len(walk):
                out.append((c, walk[j], o))
    return out


def test_skipgram_pairs_vs_python(spark):
    data = [("w1", "x", ["x", "y", "z", "x"]), ("w2", "q", ["q"])]
    walks = spark.createDataFrame(
        data, "walk_id string, start string, walk array<string>"
    )
    got = sorted(
        (r["center"], r["context"], r["offset"])
        for r in W.skipgram_pairs(walks, window=2).collect()
    )
    want = sorted(
        p for _, _, w in data for p in _py_pairs(w, 2)
    )
    assert got == want
    # the boundary guard: element_at(-1) wrap-around would mint
    # ("x", "x", -1) (center pos 0 reading the LAST element) — absent
    assert ("x", "x", -1) not in got
    assert ("q", "q", -1) not in got


def test_bad_args_raise(spark, diamond):
    with pytest.raises(ValueError):
        W.random_walks(diamond, walks_per_node=0)
    with pytest.raises(ValueError):
        W.random_walks(diamond, length=0)
    with pytest.raises(ValueError):
        W.skipgram_pairs(None, window=0)


def test_query_surface_runs(spark):
    out = Q.QUERIES["td_walk_pairs"](spark, SF)
    rows = out.collect()
    assert {"center", "context", "offset"} <= set(out.columns)
    assert len(rows) > 0


# ---------------------------------------------------------------------
# node2vec biased walks
# ---------------------------------------------------------------------

def _cycle(spark, n=6):
    """Undirected cycle v0..v{n-1} (both edge directions)."""
    pairs = []
    for i in range(n):
        a, b = f"v{i}", f"v{(i + 1) % n}"
        pairs.extend([(a, b), (b, a)])
    return _edges(spark, pairs)


def test_biased_walks_are_paths(spark, diamond):
    adj = {(r["src"], r["dst"]) for r in diamond.collect()}
    for r in W.biased_walks(diamond, p=2.0, q=0.5, length=4).collect():
        w = r["walk"]
        assert w[0] == r["start"]
        for u, v in zip(w, w[1:]):
            assert (u, v) in adj


def test_biased_walks_deterministic_across_partitionings(spark, diamond):
    a = sorted(map(tuple, W.biased_walks(diamond.repartition(1), length=5).collect()))
    b = sorted(map(tuple, W.biased_walks(diamond.repartition(13), length=5).collect()))
    assert a == b


def test_biased_walks_extreme_q_always_advances(spark):
    """q→0 makes distance-2 candidates overwhelm; on an undirected
    cycle the walk must always move forward, never return."""
    cyc = _cycle(spark, 6)
    for r in W.biased_walks(
        cyc, p=1.0, q=1e-12, walks_per_node=1, length=5
    ).collect():
        w = r["walk"]
        assert len(w) == 5
        # consecutive distinct, and no immediate backtrack anywhere
        for i in range(2, len(w)):
            assert w[i] != w[i - 2], f"backtracked: {w}"


def test_biased_walks_extreme_p_always_returns(spark):
    """p→0 makes the return candidate overwhelm: after the first step
    the walk oscillates between its first two nodes."""
    cyc = _cycle(spark, 6)
    for r in W.biased_walks(
        cyc, p=1e-12, q=1e12, walks_per_node=1, length=6
    ).collect():
        w = r["walk"]
        assert len(w) == 6
        for i in range(2, len(w)):
            assert w[i] == w[i - 2], f"did not return: {w}"


def test_biased_walks_uniform_matches_second_order_uniform(spark, diamond):
    """p=q=1 weighs every candidate 1 — validity + full length on the
    diamond's non-dead-end starts."""
    got = {r["start"]: r["walk"]
           for r in W.biased_walks(diamond, p=1.0, q=1.0,
                                   walks_per_node=1, length=3).collect()}
    assert set(got) == {"a", "b", "c", "d", "f"}
    assert got["a"][0] == "a" and len(got["a"]) == 3


def test_biased_walks_bad_args(spark, diamond):
    with pytest.raises(ValueError, match="p and q"):
        W.biased_walks(diamond, p=0.0)
    with pytest.raises(ValueError, match="length"):
        W.biased_walks(diamond, length=0)
