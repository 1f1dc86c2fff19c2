"""Graph-RAG context retrieval (ops/rag.py): seed locality, caps,
scoring mirror, objectless-triple contract, determinism, rendering,
and the facade path."""

import pytest
from pyspark.sql import functions as F

from naruhodo_spark.ops.rag import context_text, graph_rag_context


def _edges(spark, triples):
    return spark.createDataFrame(
        [(s, p, o, w, False, False) for (s, p, o, w) in triples],
        "subj string, pred string, obj string, weight long,"
        " negative boolean, passive boolean",
    )


def _two_cliques(spark):
    """Two symmetric 4-cliques bridged by one edge; seeds live in
    clique A (PPR follows edge direction, so the cliques are stored
    bidirectionally to model an undirected social graph)."""
    a = ["a1", "a2", "a3", "a4"]
    b = ["b1", "b2", "b3", "b4"]
    rows = []
    for grp in (a, b):
        for x in grp:
            for y in grp:
                if x != y:
                    rows.append((x, "knows", y, 1))
    rows.append(("a4", "knows", "b1", 1))
    return _edges(spark, rows)


def test_seed_locality_and_caps(spark):
    df = _two_cliques(spark)
    ctx = graph_rag_context(df, ["a1"], top_k=4, max_facts=5).collect()
    assert len(ctx) == 5
    nodes = {r["subj"] for r in ctx} | {r["obj"] for r in ctx}
    # the seed's clique dominates the selected neighborhood
    assert nodes <= {"a1", "a2", "a3", "a4"}
    assert [r["fact_order"] for r in ctx] == [1, 2, 3, 4, 5]
    # scores are non-increasing in fact_order
    scores = [r["score"] for r in sorted(ctx, key=lambda r: r["fact_order"])]
    assert scores == sorted(scores, reverse=True)


def test_score_is_endpoint_ppr_sum(spark):
    from naruhodo_spark.operators.graphstats import personalized_pagerank

    df = _two_cliques(spark)
    ranks = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(
            df, ["a1"], iterations=10
        ).collect()
    }
    ctx = graph_rag_context(df, ["a1"], top_k=4, max_facts=3).collect()
    for r in ctx:
        assert abs(
            r["score"] - (ranks[r["subj"]] + ranks[r["obj"]])
        ) < 1e-9


def test_objectless_triples_use_edge_target(spark):
    df = _edges(spark, [("alice", "run", "", 3), ("alice", "know", "bob", 1)])
    ctx = graph_rag_context(df, ["alice"], top_k=3, max_facts=5)
    rows = {(r["subj"], r["pred"], r["obj"]): r for r in ctx.collect()}
    # the objectless fact survives only if its pred node is selected
    assert ("alice", "run", "") in rows
    assert rows[("alice", "run", "")]["sentence"] == "alice run"
    assert rows[("alice", "know", "bob")]["sentence"] == "alice know bob"


def test_partition_invariance_and_render(spark):
    df = _two_cliques(spark)
    a = graph_rag_context(df, ["a2"], top_k=4, max_facts=4)
    b = graph_rag_context(
        _edges(spark, [tuple(r) for r in
                       df.select("subj", "pred", "obj", "weight")
                       .collect()]).repartition(7),
        ["a2"], top_k=4, max_facts=4,
    )
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]
    text = context_text(a)
    assert text.count(".") == 4 and "knows" in text


def test_validation_and_facade(spark):
    df = _two_cliques(spark)
    with pytest.raises(ValueError):
        graph_rag_context(df, ["a1"], top_k=0)
    with pytest.raises(ValueError):
        graph_rag_context(df, [], top_k=2)  # PPR rejects empty seeds
    from naruhodo_spark.api import parser

    p = parser(spark, lang="en").add_all(
        ["alice visits bob.", "bob visits carol.", "dave visits erin."]
    )
    ctx = p.rag_context(["alice"], top_k=3, max_facts=4)
    got = {(r["subj"], r["obj"]) for r in ctx.collect()}
    assert ("alice", "bob") in got
    assert all(s in ("alice", "bob", "carol") and o in ("alice", "bob", "carol")
               for s, o in got)
