"""Quotient-graph summarization + Newman modularity
(graphstats.quotient_graph / graphstats.modularity): exact expected
super-edges, no-silent-drop sentinel routing, duplicate-assignment
collapse, and modularity parity with networkx on planted partitions."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from naruhodo_spark.operators.graphstats import modularity, quotient_graph


def _edges(spark, rows):
    return spark.createDataFrame(
        [(s, p, o, w) for s, p, o, w in rows],
        "subj string, pred string, obj string, weight double",
    )


EDGES = [
    ("a1", "likes", "b1", 1.0),
    ("a1", "likes", "b2", 2.0),
    ("a2", "likes", "b1", 1.0),
    ("b1", "made", "a1", 1.0),
    ("a1", "knows", "a2", 1.0),
    ("a1", "likes", "zz", 1.0),  # zz has no group
]

GROUPS = [("a1", "A"), ("a2", "A"), ("b1", "B"), ("b2", "B")]


@pytest.fixture(scope="module")
def qg(spark):
    groups = spark.createDataFrame(GROUPS, "name string, group string")
    return {
        r["src_group"] + ">" + r["dst_group"]: r
        for r in quotient_graph(_edges(spark, EDGES), groups).collect()
    }


def test_super_edge_aggregates(qg):
    ab = qg["A>B"]
    assert ab["n_edges"] == 3
    assert ab["total_weight"] == 4.0
    assert ab["n_src_nodes"] == 2  # a1, a2
    assert ab["n_dst_nodes"] == 2  # b1, b2
    ba = qg["B>A"]
    assert (ba["n_edges"], ba["total_weight"]) == (1, 1.0)
    aa = qg["A>A"]
    assert (aa["n_edges"], aa["n_src_nodes"], aa["n_dst_nodes"]) == (1, 1, 1)


def test_ungrouped_sentinel_keeps_every_edge(qg):
    # zz is not in the group table: its edge survives in the sentinel
    # group rather than vanishing (no-silent-drops policy)
    assert qg["A>_ungrouped"]["n_edges"] == 1
    assert sum(r["n_edges"] for r in qg.values()) == len(EDGES)


def test_by_pred_splits_super_edges(spark):
    groups = spark.createDataFrame(GROUPS, "name string, group string")
    got = {
        (r["src_group"], r["dst_group"], r["pred"]): r["n_edges"]
        for r in quotient_graph(
            _edges(spark, EDGES), groups, by_pred=True
        ).collect()
    }
    assert got[("A", "B", "likes")] == 3
    assert got[("A", "A", "knows")] == 1
    assert ("A", "A", "likes") not in got


def test_duplicate_group_rows_do_not_multiply_edges(spark):
    groups = spark.createDataFrame(
        GROUPS + [("a1", "A")], "name string, group string"
    )
    total = (
        quotient_graph(_edges(spark, EDGES), groups)
        .agg(F.sum("n_edges"))
        .head()[0]
    )
    assert total == len(EDGES)


# ------------------------------------------------------------- modularity

TWO_CLIQUES = [
    # clique 1: x1..x4 (K4), clique 2: y1..y4 (K4), one bridge
    ("x1", "r", "x2", 1.0), ("x1", "r", "x3", 1.0), ("x1", "r", "x4", 1.0),
    ("x2", "r", "x3", 1.0), ("x2", "r", "x4", 1.0), ("x3", "r", "x4", 1.0),
    ("y1", "r", "y2", 1.0), ("y1", "r", "y3", 1.0), ("y1", "r", "y4", 1.0),
    ("y2", "r", "y3", 1.0), ("y2", "r", "y4", 1.0), ("y3", "r", "y4", 1.0),
    ("x4", "r", "y1", 1.0),
]


def _nx_modularity(pairs, part):
    g = nx.Graph()
    for a, _, b, w in pairs:
        g.add_edge(a, b, weight=w)
    comms = {}
    for n, c in part.items():
        comms.setdefault(c, set()).add(n)
    return nx.community.modularity(
        g, comms.values(), weight="weight"
    )


def test_modularity_matches_networkx(spark):
    part = {n: ("X" if n.startswith("x") else "Y")
            for n in "x1 x2 x3 x4 y1 y2 y3 y4".split()}
    com = spark.createDataFrame(
        list(part.items()), "node string, community string"
    )
    rows = modularity(_edges(spark, TWO_CLIQUES), com).collect()
    q = sum(r["contribution"] for r in rows)
    assert q == pytest.approx(_nx_modularity(TWO_CLIQUES, part), abs=1e-4)
    by_c = {r["community"]: r for r in rows}
    assert by_c["X"]["n_nodes"] == 4 and by_c["Y"]["n_nodes"] == 4
    assert by_c["X"]["internal_weight"] == 6.0
    # X holds the bridge endpoint: strength 13, Y 13 as well
    assert by_c["X"]["total_strength"] == 13.0


def test_modularity_everything_in_one_community_is_zero(spark):
    com = spark.createDataFrame(
        [(n, "ALL") for n in "x1 x2 x3 x4 y1 y2 y3 y4".split()],
        "node string, community string",
    )
    q = (
        modularity(_edges(spark, TWO_CLIQUES), com)
        .agg(F.sum("contribution"))
        .head()[0]
    )
    assert q == pytest.approx(0.0, abs=1e-6)


def test_unassigned_nodes_become_singletons(spark):
    part = {n: "X" for n in "x1 x2 x3 x4".split()}  # y* unassigned
    com = spark.createDataFrame(
        list(part.items()), "node string, community string"
    )
    rows = modularity(_edges(spark, TWO_CLIQUES), com).collect()
    names = {r["community"] for r in rows}
    # each y-node is its own community under its node name
    assert {"X", "y1", "y2", "y3", "y4"} <= names
    nx_part = dict(part, **{f"y{i}": f"y{i}" for i in range(1, 5)})
    q = sum(r["contribution"] for r in rows)
    assert q == pytest.approx(_nx_modularity(TWO_CLIQUES, nx_part), abs=1e-4)


def test_parallel_directed_edges_collapse_to_max(spark):
    # a->b 1.0 and b->a 3.0 collapse to one undirected pair w=3
    edges = [("a", "r", "b", 1.0), ("b", "r", "a", 3.0)]
    com = spark.createDataFrame(
        [("a", "C"), ("b", "C")], "node string, community string"
    )
    row = modularity(_edges(spark, edges), com).collect()[0]
    assert row["internal_weight"] == 3.0
    assert row["total_strength"] == 6.0


# ------------------------------------------------- Louvain refinement

def _q(spark, edges, assign):
    from naruhodo_spark.operators.graphstats import modularity

    return (
        modularity(_edges(spark, edges), assign)
        .agg(F.sum("contribution"))
        .head()[0]
    )


def test_refine_fixes_a_mislabeled_node(spark):
    from naruhodo_spark.operators.graphstats import refine_communities

    part = {n: ("X" if n.startswith("x") else "Y")
            for n in "x1 x2 x3 x4 y1 y2 y3 y4".split()}
    part["x2"] = "Y"  # perturb one clique member
    a0 = spark.createDataFrame(
        list(part.items()), "node string, community string"
    )
    out = refine_communities(_edges(spark, TWO_CLIQUES), a0, rounds=4)
    got = {r["node"]: r["community"] for r in out.collect()}
    assert got["x2"] == "X"  # pulled back into its clique
    assert _q(spark, TWO_CLIQUES, out) > _q(spark, TWO_CLIQUES, a0)


def test_refine_from_singletons_improves_modularity(spark):
    from naruhodo_spark.operators.graphstats import refine_communities

    singletons = spark.createDataFrame(
        [(n, n) for n in "x1 x2 x3 x4 y1 y2 y3 y4".split()],
        "node string, community string",
    )
    out = refine_communities(_edges(spark, TWO_CLIQUES), None, rounds=10)
    q0 = _q(spark, TWO_CLIQUES, singletons)
    q1 = _q(spark, TWO_CLIQUES, out)
    assert q0 < 0  # all-singleton Q is negative
    assert q1 > 0.2  # consolidated well past noise
    # and it never merges the two cliques into one community
    n_comms = out.select("community").distinct().count()
    assert 2 <= n_comms <= 4


def test_refine_is_deterministic(spark):
    from naruhodo_spark.operators.graphstats import refine_communities

    a = refine_communities(_edges(spark, TWO_CLIQUES), None, rounds=6)
    b = refine_communities(_edges(spark, TWO_CLIQUES), None, rounds=6)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_refine_nochange_when_everything_is_one_community(spark):
    # a single community has no neighboring community to move to:
    # phase-1 refinement cannot split (documented Louvain behavior)
    from naruhodo_spark.operators.graphstats import refine_communities

    one = spark.createDataFrame(
        [(n, "ALL") for n in "x1 x2 x3 x4 y1 y2 y3 y4".split()],
        "node string, community string",
    )
    out = refine_communities(_edges(spark, TWO_CLIQUES), one, rounds=3)
    assert {r["community"] for r in out.collect()} == {"ALL"}


def test_refine_unassigned_nodes_start_as_singletons(spark):
    from naruhodo_spark.operators.graphstats import refine_communities

    partial = spark.createDataFrame(
        [("x1", "X")], "node string, community string"
    )
    out = refine_communities(_edges(spark, TWO_CLIQUES), partial, rounds=6)
    got = {r["node"]: r["community"] for r in out.collect()}
    assert len(got) == 8  # every edge endpoint assigned something
    assert _q(spark, TWO_CLIQUES, out) > 0
