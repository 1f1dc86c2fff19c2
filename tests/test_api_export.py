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
