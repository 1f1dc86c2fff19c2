"""Facade methods added in r05 session-7 (api.parser.modularity /
quotient / align_with, plus train_embeddings gaining the model=
dispatch) — each driven through the public API on a small synth
corpus."""

import pytest
from pyspark.sql import functions as F

from naruhodo_spark.api import parser


def _p(spark, texts=None):
    return parser(spark, lang="en").add_all(
        texts
        or [
            "alice visited bob.",
            "bob visited carol.",
            "dave praised alice.",
        ]
    )


def test_facade_modularity_default_lpa(spark):
    p = _p(spark)
    rows = p.modularity().collect()
    assert rows
    q = sum(r["contribution"] for r in rows)
    assert -1.0 <= q <= 1.0  # Newman Q is bounded


def test_facade_quotient_default_communities(spark):
    p = _p(spark)
    out = p.quotient()
    total = out.agg(F.sum("n_edges")).head()[0]
    # every KSG edge lands in exactly one super-edge
    assert total == p.edges.count()


def test_facade_align_with(spark):
    p1 = _p(spark, ["alice visited bob.", "carol praised bob."])
    p2 = _p(spark, ["alice visited bob.", "dave praised bob."])
    matches, audit = p1.align_with(
        p2, rounds=1, min_score=0.1, mutual_best=True
    )
    got = {(r["name_1"], r["name_2"]) for r in matches.collect()}
    # the shared literal facts recover the common entities
    assert ("alice", "alice") in got
    assert audit.isEmpty()


@pytest.mark.parametrize("model", ["transe", "distmult", "complex", "rotate"])
def test_facade_train_embeddings_dispatch(spark, model):
    p = _p(spark)
    out = p.train_embeddings(dim=4, iters=1, model=model)
    assert set(out) == {"ent_emb", "rel_emb"}
    assert out["ent_emb"].columns == ["name", "vec"]
    n = out["ent_emb"].count()
    assert n > 0


def test_facade_train_embeddings_unknown_model(spark):
    p = _p(spark)
    with pytest.raises(ValueError, match="unknown embedding model"):
        p.train_embeddings(model="hyperboloid")


def test_facade_align_predicates_with(spark):
    p1 = _p(spark, ["alice visited bob.", "carol visited bob."])
    p2 = _p(spark, ["alice visited bob.", "carol visited bob."])
    out = p1.align_predicates_with(p2, min_support=1, min_score=0.1)
    rows = {(r["pred_1"], r["pred_2"]): r["score"] for r in out.collect()}
    assert rows  # identical graphs: every grounded predicate subsumes
    assert all(s == 1.0 for s in rows.values())


def test_facade_refine_communities(spark):
    p = _p(spark)
    refined = p.refine_communities(rounds=4)
    assert refined.columns == ["node", "community"]
    q = sum(
        r["contribution"] for r in p.modularity(refined).collect()
    )
    assert -1.0 <= q <= 1.0


def test_facade_predict_links(spark):
    p = _p(spark, ["alice visited bob.", "carol visited bob.",
                   "alice praised dave.", "carol praised dave."])
    scored, audit = p.predict_links(method="common_neighbors")
    assert audit.isEmpty()
    got = {(r["node_a"], r["node_b"]): r["n_common"]
           for r in scored.collect()}
    # alice and carol share two neighbors (bob, dave) but no edge
    assert got.get(("alice", "carol")) == 2


def test_facade_spread_types(spark):
    p = _p(spark, ["Alice visited Tokyo.", "Alice praised Bob."])
    out = p.spread_types(rounds=5, top_k=1)
    assert out.columns == ["node", "label", "score"]
    got = {r["node"]: r["label"] for r in out.collect()}
    # gazetteer-typed seeds keep their own type
    assert got  # labels spread to at least the seeds themselves
    assert all(lab.startswith("etype:") for lab in got.values())


def test_facade_type_disagreements(spark):
    p = _p(spark, ["Alice visited Tokyo.", "Bob praised Alice."])
    out = p.type_disagreements(min_support=1)
    assert out.columns == [
        "node", "sdtype_label", "sdtype_score",
        "spread_label", "spread_score",
    ]
    # every surfaced row genuinely disagrees
    assert out.where(
        F.col("sdtype_label") == F.col("spread_label")
    ).isEmpty()
