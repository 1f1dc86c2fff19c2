"""k-core decomposition (graphstats.k_core): parity with networkx on
clique+periphery, cascading peels, directed/multi-edge collapse,
empty-core and max_rounds behavior."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from naruhodo_spark.operators.graphstats import k_core


def _ksg(spark, pairs):
    return spark.createDataFrame(
        [(a, "rel", b, 1) for a, b in pairs],
        "subj string, pred string, obj string, weight int",
    )


def _nx_core(pairs, k):
    g = nx.Graph()
    g.add_edges_from(pairs)
    g.remove_edges_from(nx.selfloop_edges(g))
    core = nx.k_core(g, k)
    return {(n, d) for n, d in core.degree()}


CLIQUE_PLUS_TAIL = [
    ("a", "b"), ("a", "c"), ("a", "d"),
    ("b", "c"), ("b", "d"), ("c", "d"),      # K4
    ("d", "t1"), ("t1", "t2"), ("t2", "t3"),  # dangling tail
    ("x", "x"),                               # self-loop, dropped
]


@pytest.mark.parametrize("k", [1, 2, 3])
def test_matches_networkx(spark, k):
    got = {
        (r["node"], r["degree"])
        for r in k_core(_ksg(spark, CLIQUE_PLUS_TAIL), k).collect()
    }
    assert got == _nx_core(CLIQUE_PLUS_TAIL, k)


def test_three_core_is_the_clique(spark):
    got = sorted(
        r["node"] for r in k_core(_ksg(spark, CLIQUE_PLUS_TAIL), 3).collect()
    )
    assert got == ["a", "b", "c", "d"]


def test_cascading_peel(spark):
    """A path has NO 2-core — peeling cascades from both ends."""
    path = [(f"n{i}", f"n{i + 1}") for i in range(9)]
    assert k_core(_ksg(spark, path), 2).count() == 0
    assert _nx_core(path, 2) == set()
    # ...and the cascade depth can exceed a tight round budget
    with pytest.raises(RuntimeError, match="max_rounds"):
        k_core(_ksg(spark, path), 2, max_rounds=2)


def test_direction_and_multiplicity_collapse(spark):
    """Reciprocal and repeated edges count once (simple graph)."""
    pairs = [("a", "b"), ("b", "a"), ("a", "b"), ("b", "c"), ("c", "a")]
    got = {
        (r["node"], r["degree"]) for r in k_core(_ksg(spark, pairs), 2).collect()
    }
    assert got == {("a", 2), ("b", 2), ("c", 2)}


def test_k_validation(spark):
    with pytest.raises(ValueError, match="k must be"):
        k_core(_ksg(spark, CLIQUE_PLUS_TAIL), 0)
