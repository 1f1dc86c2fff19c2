"""Facade + viewer-export parity tests (reference parser API, D7)."""

import json

from naruhodo_spark.api import parser
from naruhodo_spark import synth


def test_parser_facade_add_and_export(spark, tmp_path):
    p = parser(spark, lang="en")
    p.add("alice visited bob. she praised carol.")
    p.add_all(["dave moved to tokyo.", "the castle is ancient."])
    edges = {(r["subj"], r["pred"], r["obj"]) for r in p.edges.collect()}
    assert ("alice", "visit", "bob") in edges
    # 'she' resolves to the NEAREST preceding person (bob), per the
    # reference's backwards entityList scan semantics
    assert ("bob", "praise", "carol") in edges
    assert ("dave", "move", "") in edges  # oblique 'to tokyo' is not obj
    assert ("castle", "ancient", "") in edges

    obj = p.export_obj()
    assert set(obj) == {"nodes", "links"}
    ids = {n["id"] for n in obj["nodes"]}
    assert {"alice", "bob", "carol"} <= ids

    out = tmp_path / "g.json"
    p.export_json(str(out))
    loaded = json.loads(out.read_text())
    assert loaded["nodes"] and loaded["links"]


def test_parser_accumulates_like_reference(spark):
    p = parser(spark, lang="en")
    p.add("alice visited bob.")
    w1 = {(r["subj"], r["pred"], r["obj"]): r["weight"] for r in p.edges.collect()}
    p.add("alice visited bob.")
    w2 = {(r["subj"], r["pred"], r["obj"]): r["weight"] for r in p.edges.collect()}
    assert w2[("alice", "visit", "bob")] == w1[("alice", "visit", "bob")] + 1


def test_dsg_gtype(spark):
    p = parser(spark, lang="en", gtype="d")
    p.add("alice visited bob.")
    assert p.edges.count() == 2  # alice→visited, bob→visited
    assert p.nodes.count() == 3


def test_ja_facade(spark):
    p = parser(spark, lang="ja")
    p.add("彼女 は 本 を 読んだ 。")
    edges = {(r["subj"], r["pred"], r["obj"]) for r in p.edges.collect()}
    assert ("彼女", "読んだ", "本") in edges


def test_plot_sink_svg_and_figure(spark, tmp_path):
    """O6: show()/plotToFile() — bounded subgraph, deterministic seeded
    layout, well-formed SVG, plotly-shaped figure dict."""
    import xml.etree.ElementTree as ET

    from naruhodo_spark import plot as PL

    p = parser(spark, lang="en")
    p.add("alice visited bob. she praised carol.")
    p.add("dave moved to tokyo.")

    fig = p.show(max_nodes=50)
    assert set(fig) == {"data", "layout"}
    edge_trace, node_trace = fig["data"]
    assert node_trace["mode"] == "markers+text"
    n = len(node_trace["x"])
    assert n == p.nodes.count() <= 50
    assert len(node_trace["marker"]["size"]) == n
    # every edge segment references a laid-out coordinate triple (x0,x1,None)
    assert len(edge_trace["x"]) % 3 == 0
    json.dumps(fig)  # figure must be pure-JSON serializable

    # determinism: same seed -> identical layout
    fig2 = p.show(max_nodes=50)
    assert fig["data"][1]["x"] == fig2["data"][1]["x"]

    out = tmp_path / "g.svg"
    p.plot_to_file(str(out))
    root = ET.parse(out).getroot()
    assert root.tag.endswith("svg")
    tags = [c.tag.split("}")[-1] for c in root]
    assert tags.count("circle") == n
    assert "line" in tags

    jout = tmp_path / "g.json"
    p.plot_to_file(str(jout))
    assert json.loads(jout.read_text())["data"]


def test_plot_top_subgraph_bounds(spark):
    """max_nodes truly bounds the collect; induced edges keep both
    endpoints inside the selection (checked vs a driver recomputation)."""
    from naruhodo_spark import plot as PL

    p = parser(spark, lang="en")
    p.add_all(
        [f"user{i} praised item{i % 3}." for i in range(20)]
        + ["alice visited bob."] * 5
    )
    node_rows, edge_rows = PL.top_subgraph(p.nodes, p.edges, max_nodes=6)
    assert len(node_rows) == 6
    all_counts = sorted((r["count"] for r in p.nodes.collect()), reverse=True)
    assert sorted((r["count"] for r in node_rows), reverse=True) == all_counts[:6]
    kept = {r["node_id"] for r in node_rows}
    for e in edge_rows:
        assert e["source"] in kept and e["target"] in kept


def test_plot_dsg_guard(spark):
    import pytest as _pytest

    p = parser(spark, lang="en", gtype="d")
    p.add("alice visited bob.")
    with _pytest.raises(NotImplementedError):
        p.show()
    with _pytest.raises(NotImplementedError):
        p.plot_to_file("/tmp/never.svg")


def test_write_graphml(spark, tmp_path):
    """GraphML sink: well-formed XML, node/edge parity with export_obj,
    every edge endpoint declared as a node."""
    import xml.etree.ElementTree as ET

    from naruhodo_spark import export as EX

    p = parser(spark, lang="en")
    p.add("alice visited bob. she praised carol.")
    kg = p.build()
    out = tmp_path / "g.graphml"
    EX.write_graphml(kg["ksg_nodes"], kg["ksg_edges"], str(out))
    root = ET.parse(out).getroot()
    ns = "{http://graphml.graphdrawing.org/xmlns}"
    graph = root.find(f"{ns}graph")
    xml_nodes = graph.findall(f"{ns}node")
    xml_edges = graph.findall(f"{ns}edge")
    obj = p.export_obj()
    assert len(xml_nodes) == len(obj["nodes"])
    assert len(xml_edges) == len(obj["links"])
    ids = {n.get("id") for n in xml_nodes}
    for e in xml_edges:
        assert e.get("source") in ids and e.get("target") in ids


def test_facade_graph_analytics(spark):
    import pytest as _pytest

    p = parser(spark, lang="en")
    p.add_all(["alice visited bob."] * 2 + ["carol praised dave."] * 2)
    pr = {r["node"]: r["rank"] for r in p.pagerank(iterations=3).collect()}
    assert sum(pr.values()) == _pytest.approx(1.0, abs=1e-9)
    deg = {r["node"]: r["out_degree"] for r in p.degree_stats().collect()}
    assert deg["alice"] == 1
    nodes, _ = p.k_hop(["alice"], k=1, direction="out")
    assert {r["node"] for r in nodes.collect()} == {"alice", "bob"}
    comm = {r["entity"]: r["community"] for r in p.communities().collect()}
    assert comm["alice"] == comm["bob"] != comm["carol"]
    negs = p.negative_samples(k=2)
    assert negs.count() > 0

    d = parser(spark, lang="en", gtype="d")
    d.add("alice visited bob.")
    with _pytest.raises(NotImplementedError):
        d.pagerank()


def test_conjunction_keeps_predicate_adjective(spark):
    """'the castle is ancient but the garden is quiet' must extract BOTH
    predications (review finding: the conj branch dropped the buffered
    'is ancient', losing (castle, ancient) and mis-attaching castle to
    the other clause's predicate)."""
    p = parser(spark, lang="en")
    p.add("the castle is ancient but the garden is quiet.")
    edges = {(r["subj"], r["pred"], r["obj"]) for r in p.edges.collect()}
    assert ("castle", "ancient", "") in edges
    assert ("garden", "quiet", "") in edges


def test_export_surface_query_invariants(spark):
    """The driver-registered kg_export_surface rows actually carry the
    invariants the docstring claims: every endpoint resolves FK-style,
    endpoint id count is bounded by node count, non-vacuous rows."""
    from naruhodo_spark.queries import QUERIES

    rows = QUERIES["kg_export_surface"](spark, "unused").collect()
    assert len(rows) > 100
    assert all(r["src_resolved"] and r["dst_resolved"] for r in rows)
    assert rows[0]["n_link_endpoint_ids"] <= rows[0]["n_nodes"]
