"""Neighborhood-overlap link prediction (graphstats.link_scores):
parity with networkx on all three methods, known-edge exclusion, hub
cap audit, top-k determinism."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from naruhodo_spark.operators.graphstats import link_scores

GRAPH = [
    ("a", "r", "b", 1.0),
    ("a", "r", "c", 1.0),
    ("b", "r", "c", 1.0),
    ("b", "r", "d", 1.0),
    ("c", "r", "d", 1.0),
    ("d", "r", "e", 1.0),
    ("c", "r", "e", 1.0),
]


def _edges(spark, rows=GRAPH):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, weight double"
    )


def _nx_graph(rows=GRAPH):
    g = nx.Graph()
    for s, _, o, _ in rows:
        g.add_edge(s, o)
    return g


def _nx_scores(fn, rows=GRAPH):
    g = _nx_graph(rows)
    non_edges = list(nx.non_edges(g))
    return {
        tuple(sorted((u, v))): s
        for u, v, s in fn(g, non_edges)
        if s > 0
    }


@pytest.mark.parametrize(
    "method,nx_fn",
    [
        ("adamic_adar", nx.adamic_adar_index),
        ("resource_allocation", nx.resource_allocation_index),
        (
            "common_neighbors",
            lambda g, pairs: (
                (u, v, float(len(list(nx.common_neighbors(g, u, v)))))
                for u, v in pairs
            ),
        ),
    ],
)
def test_matches_networkx(spark, method, nx_fn):
    scored, audit = link_scores(_edges(spark), method=method)
    assert audit.isEmpty()
    got = {
        (r["node_a"], r["node_b"]): r["score"] for r in scored.collect()
    }
    exp = _nx_scores(nx_fn)
    assert set(got) == set(exp)
    for k, v in exp.items():
        assert got[k] == pytest.approx(v, abs=1e-5), (method, k)


def test_existing_edges_never_scored(spark):
    scored, _ = link_scores(_edges(spark))
    got = {(r["node_a"], r["node_b"]) for r in scored.collect()}
    known = {tuple(sorted((s, o))) for s, _, o, _ in GRAPH}
    assert not got & known


def test_hub_cap_audits_and_damps(spark):
    # star center 'hub' connects everyone; capping it removes its
    # wedge contributions but keeps the other centers'
    rows = [("hub", "r", x, 1.0) for x in "a b c d e".split()] + [
        ("a", "r", "c", 1.0),
        ("b", "r", "c", 1.0),
    ]
    scored, audit = link_scores(
        _edges(spark, rows), method="common_neighbors", max_hub_degree=4
    )
    rec = audit.collect()
    assert len(rec) == 1
    assert rec[0]["z"] == "hub" and rec[0]["degree"] == 5
    got = {
        (r["node_a"], r["node_b"]): r["n_common"] for r in scored.collect()
    }
    # with the hub capped, only the wedge through c survives, and the
    # hub's own contribution to (a, b) is gone (2 -> 1)
    assert got == {("a", "b"): 1}
    full, _ = link_scores(_edges(spark, rows), method="common_neighbors")
    fg = {
        (r["node_a"], r["node_b"]): r["n_common"] for r in full.collect()
    }
    assert fg[("a", "b")] == 2          # c AND hub
    assert fg[("d", "e")] == 1          # hub-only pair reappears


def test_top_k_is_deterministic_and_bounded(spark):
    s1, _ = link_scores(_edges(spark), top_k=2)
    s2, _ = link_scores(_edges(spark), top_k=2)
    r1 = [tuple(r) for r in s1.collect()]
    r2 = [tuple(r) for r in s2.collect()]
    assert r1 == r2 and len(r1) == 2
    # and they are the global best by score
    full, _ = link_scores(_edges(spark))
    best = sorted(
        full.collect(),
        key=lambda r: (-r["score"], r["node_a"], r["node_b"]),
    )[:2]
    assert r1 == [tuple(r) for r in best]


def test_unknown_method_raises(spark):
    with pytest.raises(ValueError, match="unknown method"):
        link_scores(_edges(spark), method="jaccard_tanimoto")
