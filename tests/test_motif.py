"""Motif matcher (operators/motif.py) vs an exhaustive python mirror.

The mirror enumerates every variable binding by brute force over the
edge list (bag semantics: one result per edge-tuple embedding), so any
compilation bug — join key, predicate pushdown, anti-join, distinct
filter — shows up as a multiset mismatch.
"""

from itertools import product

import pytest
from pyspark.sql import functions as F

from naruhodo_spark.operators.motif import cap_hubs, match_motif

EDGES = [
    # a small scale-free-ish KG: h is a hub
    ("alice", "knows", "bob"),
    ("alice", "knows", "carol"),
    ("bob", "knows", "carol"),
    ("carol", "works_at", "acme"),
    ("bob", "works_at", "acme"),
    ("alice", "works_at", "initech"),
    ("acme", "in", "tokyo"),
    ("initech", "in", "tokyo"),
    ("dave", "knows", "dave"),       # self loop
    ("alice", "knows", "bob"),       # parallel edge (bag semantics)
    ("h", "knows", "alice"),
    ("h", "knows", "bob"),
    ("h", "knows", "carol"),
    ("h", "knows", "dave"),
]


def mirror(pattern, anti=None, distinct_nodes=True, edges=EDGES):
    """Exhaustive embedding enumeration; returns a sorted list of
    tuples in (node-vars first-appearance, then pred-vars) order."""
    node_vars, pred_vars = [], []
    for u, p, v in pattern:
        for nv in (u, v):
            if nv not in node_vars:
                node_vars.append(nv)
        if isinstance(p, str) and p.startswith("?"):
            pred_vars.append(p[1:])

    def edge_ok(binding, u, p, v, e):
        if binding.get(u, e[0]) != e[0] or binding.get(v, e[2]) != e[2]:
            return False
        if u == v and e[0] != e[2]:
            return False
        if p is None or p.startswith("?"):
            return True
        return e[1] == p

    out = []
    for combo in product(range(len(edges)), repeat=len(pattern)):
        binding = {}
        ok = True
        for (u, p, v), ei in zip(pattern, combo):
            e = edges[ei]
            if not edge_ok(binding, u, p, v, e):
                ok = False
                break
            binding[u], binding[v] = e[0], e[2]
            if isinstance(p, str) and p.startswith("?"):
                pv = p[1:]
                if binding.get(pv, e[1]) != e[1]:
                    ok = False
                    break
                binding[pv] = e[1]
        if not ok:
            continue
        if distinct_nodes and len({binding[n] for n in node_vars}) < len(
            node_vars
        ):
            continue
        if any(
            any(
                binding[u] == e[0]
                and binding[v] == e[2]
                and (p is None or e[1] == p)
                for e in edges
            )
            for (u, p, v) in (anti or [])
        ):
            continue
        out.append(tuple(binding[x] for x in node_vars + pred_vars))
    return sorted(out)


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, ["src", "pred", "dst"]).cache()


def run(edges_df, pattern, **kw):
    df = match_motif(edges_df, pattern, **kw)
    return sorted(tuple(r) for r in df.collect())


def test_two_hop_chain(edges_df):
    pat = [("a", "knows", "b"), ("b", "works_at", "c")]
    assert run(edges_df, pat) == mirror(pat)


def test_backward_edge_and_three_hops(edges_df):
    # d -> c joins on an already-bound DST variable
    pat = [
        ("a", "knows", "b"),
        ("b", "works_at", "c"),
        ("d", "works_at", "c"),
    ]
    assert run(edges_df, pat) == mirror(pat)


def test_predicate_variable_bound(edges_df):
    pat = [("a", "?r", "b"), ("b", "in", "c")]
    got = run(edges_df, pat)
    assert got == mirror(pat)
    assert all(len(t) == 4 for t in got)  # a, b, c + r


def test_wildcard_predicate(edges_df):
    pat = [("a", None, "b"), ("b", None, "c")]
    assert run(edges_df, pat) == mirror(pat)


def test_anti_edge(edges_df):
    # coworkers of alice who do NOT know alice back... via shared employer
    pat = [("a", "works_at", "c"), ("b", "works_at", "c")]
    anti = [("a", "knows", "b")]
    assert run(edges_df, pat, anti=anti) == mirror(pat, anti=anti)


def test_distinct_nodes_off_allows_homomorphic(edges_df):
    pat = [("a", "knows", "b"), ("b", "knows", "c")]
    hom = run(edges_df, pat, distinct_nodes=False)
    iso = run(edges_df, pat, distinct_nodes=True)
    assert hom == mirror(pat, distinct_nodes=False)
    assert iso == mirror(pat, distinct_nodes=True)
    assert len(hom) > len(iso)  # dave->dave->dave style bindings exist


def test_self_loop_pattern(edges_df):
    pat = [("a", "knows", "a")]
    assert run(edges_df, pat, distinct_nodes=False) == [("dave",)]


def test_parallel_edges_bag_semantics(edges_df):
    # alice-knows->bob appears twice; a 1-edge motif must return 2 rows
    pat = [("a", "knows", "b")]
    got = run(edges_df, pat)
    assert got.count(("alice", "bob")) == 2
    assert got == mirror(pat)


def test_disconnected_pattern_raises(edges_df):
    with pytest.raises(ValueError, match="disconnected"):
        match_motif(edges_df, [("a", None, "b"), ("x", None, "y")])


def test_anti_unbound_raises(edges_df):
    with pytest.raises(ValueError, match="unbound"):
        match_motif(edges_df, [("a", None, "b")], anti=[("a", None, "z")])


def test_node_pred_clash_raises(edges_df):
    with pytest.raises(ValueError, match="both node and predicate"):
        match_motif(edges_df, [("a", "?b", "b")])


def test_cap_hubs_drops_and_audits(edges_df):
    kept, dropped = cap_hubs(edges_df, cap=3)
    drops = {r["node"]: r["degree"] for r in dropped.collect()}
    assert "h" in drops and drops["h"] == 4
    kept_rows = [tuple(r) for r in kept.collect()]
    assert all("h" not in (s, d) for s, _, d in kept_rows)
    assert kept.columns == ["src", "pred", "dst"]
    # degree counts both directions: alice has out 3 (one parallel) + in 1
    assert drops.get("alice") == 4 or "alice" in drops


def test_no_cross_product_in_plan(edges_df):
    pat = [
        ("a", "knows", "b"),
        ("b", "works_at", "c"),
        ("d", "works_at", "c"),
    ]
    plan = match_motif(edges_df, pat)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ksg_adapter_and_facade(spark):
    """match_motif_ksg agrees with the graphstats edge contract
    (objectless triples point at the predicate node) and parser.find
    exposes the same result over a built KG."""
    from naruhodo_spark import synth
    from naruhodo_spark.api import parser as NParser
    from naruhodo_spark.operators.motif import match_motif_ksg
    from naruhodo_spark.pipeline import build_kg

    docs = synth.synth_documents(spark, 60)
    kg = build_kg(docs, aliases=synth.alias_dictionary(spark))
    pat = [("a", None, "b"), ("b", None, "c")]
    direct = match_motif_ksg(kg["ksg_edges"], pat)
    assert direct.columns == ["a", "b", "c"]
    n = direct.count()
    assert n > 0
    # facade path builds the same KG from the same corpus
    p = NParser(spark)
    p.add_documents(docs)
    via_api = p.find(pat)
    assert via_api.columns == ["a", "b", "c"]
    assert via_api.count() == n
