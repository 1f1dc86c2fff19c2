"""Facade methods added in r03 (api.parser.predicate_synonyms / diff /
random_walks) — drive each through the public API on a small synth
corpus and check shape + basic semantics."""

from naruhodo_spark.api import parser


def test_facade_new_graph_methods(spark):
    p = parser(spark, lang="en")
    p.add_all(
        [
            "alice visited bob.",
            "alice visited bob.",
            "carol praised dave.",
            "erin moved.",
        ]
    )
    syn = p.predicate_synonyms(min_support=1, threshold=0.99)
    assert set(syn.columns) == {"pred", "canon_pred"}
    assert syn.count() > 0

    q = parser(spark, lang="en")
    q.add_all(["alice visited bob.", "erin moved."])
    d = p.diff(q)
    assert {"change", "weight_delta"} <= set(d.columns)
    changes = {r["change"] for r in d.collect()}
    assert "added" in changes or "changed" in changes

    w = p.random_walks(walks_per_node=1, length=3)
    rows = w.collect()
    assert all(1 <= len(r["walk"]) <= 3 for r in rows)
    assert len(rows) > 0


def test_facade_add_urls(spark):
    p = parser(spark, lang="en")
    urls = [f"https://example.org/page{i}" for i in range(5)]
    p.add_urls(urls, n_partitions=2)
    docs = p._docs()
    rows = {r["doc_id"]: r["spans"] for r in docs.collect()}
    assert set(rows) == set(urls)
    # stub fetch content flows into the spans schema unchanged
    assert all(s[0]["kind"] == "text" and s[0]["text"] for s in rows.values())
    # and the staged urls build into a graph alongside plain add()
    p.add("alice visited bob.")
    edges = p.edges
    assert edges.count() > 0


def test_facade_entity_and_pro_lists(spark):
    p = parser(spark, lang="en")
    p.add_all(
        [
            "alice visited bob.",
            "alice praised carol. she met dave.",
        ]
    )
    ents = p.entity_list().collect()
    names = [r["node_id"] for r in ents]
    assert "alice" in names and "dave" in names
    assert not any(n.startswith("pred:") for n in names)
    # ordered by count desc; alice and carol (2 mentions each) lead
    assert {ents[0]["node_id"], ents[1]["node_id"]} == {"alice", "carol"}
    # "she" resolved to carol -> carol is the pronoun-linked node
    pros = p.pro_list().collect()
    assert [r["node_id"] for r in pros] == ["carol"]
    assert pros[0]["pro"] == 0  # PRO_PERSONAL


def test_add_urls_rejects_pipes(spark):
    import pytest as _pt

    p = parser(spark, lang="en")
    with _pt.raises(ValueError, match=r"\|"):
        p.add_urls(["https://e.org/w?title=A|B"])


def test_entity_list_is_ksg_only(spark):
    import pytest as _pt

    p = parser(spark, lang="en", gtype="d")
    p.add("alice visited bob.")
    with _pt.raises(NotImplementedError):
        p.entity_list()
    with _pt.raises(NotImplementedError):
        p.pro_list()


def test_facade_hits_and_summary(spark):
    p = parser(spark, lang="en")
    p.add_all(["alice visited bob.", "bob praised carol.",
               "carol met alice."])
    h = {r["node"]: r for r in p.hits(iterations=5).collect()}
    assert len(h) >= 3
    assert all(r["hub"] >= 0 and r["authority"] >= 0 for r in h.values())
    s = {r["stat"]: r["value"] for r in p.summary().collect()}
    assert s["n_nodes"] >= 3 and s["n_edges"] == 3
    assert s["n_predicates"] == 3 and s["max_degree"] >= 1
    assert s["p50_degree"] <= s["p95_degree"] <= s["max_degree"]
