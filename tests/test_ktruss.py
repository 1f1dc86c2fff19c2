"""k-truss decomposition (graphstats.k_truss): parity with networkx,
cascading peels, truss-inside-core, directed/multi-edge collapse,
empty-truss and rejection behavior."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from naruhodo_spark.operators.graphstats import k_core, k_truss


def _ksg(spark, pairs):
    return spark.createDataFrame(
        [(a, "rel", b, 1) for a, b in pairs],
        "subj string, pred string, obj string, weight int",
    )


def _nx_truss_edges(pairs, k):
    g = nx.Graph()
    g.add_edges_from(pairs)
    g.remove_edges_from(nx.selfloop_edges(g))
    t = nx.k_truss(g, k)
    return {tuple(sorted(e)) for e in t.edges()}


# K5 with a pendant triangle and a tail: the K5 is a 4-truss (each
# edge in 3 triangles), the pendant triangle only a 3-truss
K5 = [(a, b) for i, a in enumerate("abcde") for b in "abcde"[i + 1:]]
GRAPH = K5 + [("e", "p1"), ("e", "p2"), ("p1", "p2"),  # pendant triangle
              ("p2", "t1"), ("t1", "t2")]              # tail


@pytest.mark.parametrize("k", [3, 4, 5])
def test_matches_networkx(spark, k):
    got = {
        tuple(sorted((r["node_a"], r["node_b"])))
        for r in k_truss(_ksg(spark, GRAPH), k).collect()
    }
    assert got == _nx_truss_edges(GRAPH, k)


def test_support_is_within_truss(spark):
    rows = k_truss(_ksg(spark, GRAPH), 4).collect()
    # the 4-truss is exactly K5; every edge sits in 3 triangles there
    assert len(rows) == 10
    assert all(r["support"] == 3 for r in rows)


def test_cascade_peel(spark):
    # two triangles sharing an edge: a 3-truss; asking for 4 peels
    # everything (each edge is in <=2 triangles)
    bowtie = [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d")]
    assert k_truss(_ksg(spark, bowtie), 3).count() == 5
    assert k_truss(_ksg(spark, bowtie), 4).isEmpty()


def test_truss_sits_inside_the_core(spark):
    t = k_truss(_ksg(spark, GRAPH), 4)
    t_nodes = {
        r["n"]
        for r in t.select(
            F.explode(F.array("node_a", "node_b")).alias("n")
        ).collect()
    }
    core_nodes = {r["node"] for r in k_core(_ksg(spark, GRAPH), 3).collect()}
    assert t_nodes <= core_nodes  # k-truss ⊆ (k−1)-core


def test_direction_and_multiplicity_collapse(spark):
    tri = [("a", "b"), ("b", "a"), ("b", "c"), ("a", "c"), ("c", "c")]
    got = {
        tuple(sorted((r["node_a"], r["node_b"])))
        for r in k_truss(_ksg(spark, tri), 3).collect()
    }
    assert got == {("a", "b"), ("a", "c"), ("b", "c")}


def test_k_below_three_raises(spark):
    with pytest.raises(ValueError, match="k must be >= 3"):
        k_truss(_ksg(spark, GRAPH), 2)
