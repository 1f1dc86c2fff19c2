"""Link-prediction evaluation (ops/kglinkpred.py): exhaustive numpy
mirror of the filtered Bordes-2013 ranking protocol (both corruption
sides), Catalyst ≡ BLAS twin equality, filtered ≤ raw, the NULL-rank
audit for model-coverage gaps, and the learning property that a
trained TransE model out-ranks its own random init."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from naruhodo_spark.ops import kgembed as KE
from naruhodo_spark.ops import kglinkpred as LP

DIM = 8


def _emb(spark, names, seed="emb42"):
    return KE.init_embeddings(
        spark.createDataFrame([(n,) for n in names], ["name"]),
        dim=DIM,
        seed=seed,
    )


def _fixture(spark):
    ents = [f"e{i}" for i in range(30)]
    rels = ["r0", "r1", "r2"]
    ent_emb = _emb(spark, ents).localCheckpoint()
    rel_emb = _emb(spark, rels, seed="emb42/rel").localCheckpoint()
    # deterministic triple set: test = every 3rd, known = all
    triples = [
        (ents[(7 * i) % 30], rels[i % 3], ents[(11 * i + 5) % 30])
        for i in range(45)
    ]
    triples = sorted(set(triples))
    test = triples[::3]
    known = spark.createDataFrame(
        triples, "subj string, pred string, obj string"
    )
    test_df = spark.createDataFrame(
        test, "subj string, pred string, obj string"
    )
    return ents, rels, ent_emb, rel_emb, triples, test, known, test_df


def _numpy_ranks(ent_vecs, rel_vecs, triples, test, filtered):
    """Exhaustive mirror: for each test triple and side, count entities
    with strictly smaller |e − q|² (q = h+r tail / t−r head), excluding
    the true entity by name and (filtered) known-true corruptions."""
    known_tail = {}
    known_head = {}
    for s, p, o in triples:
        known_tail.setdefault((s, p), set()).add(o)
        known_head.setdefault((o, p), set()).add(s)
    out = {}
    names = sorted(ent_vecs)
    for s, p, o in test:
        for side in ("tail", "head"):
            if side == "tail":
                q = ent_vecs[s] + rel_vecs[p]
                true = o
                banned = known_tail[(s, p)] - {o} if filtered else set()
            else:
                q = ent_vecs[o] - rel_vecs[p]
                true = s
                banned = known_head[(o, p)] - {s} if filtered else set()
            td = float(((ent_vecs[true] - q) ** 2).sum())
            n = 0
            for e in names:
                if e == true or e in banned:
                    continue
                if float(((ent_vecs[e] - q) ** 2).sum()) < td:
                    n += 1
            out[(s, p, o, side)] = n + 1
    return out


@pytest.mark.parametrize("path", ["catalyst", "blas"])
@pytest.mark.parametrize("filtered", [False, True])
def test_ranks_match_exhaustive_mirror(spark, path, filtered):
    _, _, ent_emb, rel_emb, triples, test, known, test_df = _fixture(spark)
    ranks = LP.rank_candidates(
        test_df,
        ent_emb,
        rel_emb,
        known=known if filtered else None,
        path=path,
    )
    got = {
        (r["subj"], r["pred"], r["obj"], r["side"]): r["rank"]
        for r in ranks.collect()
    }
    ev = {r["name"]: np.array(r["vec"]) for r in ent_emb.collect()}
    rv = {r["name"]: np.array(r["vec"]) for r in rel_emb.collect()}
    want = _numpy_ranks(ev, rv, triples, test, filtered)
    assert got == want


def test_blas_equals_catalyst(spark):
    _, _, ent_emb, rel_emb, _t, _e, known, test_df = _fixture(spark)
    a = LP.rank_candidates(test_df, ent_emb, rel_emb, known, path="catalyst")
    b = LP.rank_candidates(test_df, ent_emb, rel_emb, known, path="blas")
    key = ["subj", "pred", "obj", "side"]
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert a.select(*key).distinct().count() == a.count()


def test_filtered_rank_never_exceeds_raw(spark):
    _, _, ent_emb, rel_emb, _t, _e, known, test_df = _fixture(spark)
    raw = LP.rank_candidates(test_df, ent_emb, rel_emb, None).select(
        "subj", "pred", "obj", "side", F.col("rank").alias("raw_rank")
    )
    filt = LP.rank_candidates(test_df, ent_emb, rel_emb, known)
    j = filt.join(raw, ["subj", "pred", "obj", "side"]).collect()
    assert len(j) == filt.count()
    for r in j:
        assert 1 <= r["rank"] <= r["raw_rank"]


def test_missing_embedding_keeps_row_with_null_rank(spark):
    _, _, ent_emb, rel_emb, _t, _e, _k, _df = _fixture(spark)
    test_df = spark.createDataFrame(
        [("e0", "r0", "e1"), ("GHOST", "r0", "e1"), ("e0", "NOREL", "e2")],
        "subj string, pred string, obj string",
    )
    ranks = LP.rank_candidates(test_df, ent_emb, rel_emb).collect()
    assert len(ranks) == 6  # 3 triples × 2 sides, nothing dropped
    ok = [r for r in ranks if r["subj"] == "e0" and r["pred"] == "r0"]
    assert len(ok) == 2 and all(r["rank"] is not None for r in ok)
    assert all(r["rank"] is None for r in ranks if r["subj"] == "GHOST")
    assert all(r["rank"] is None for r in ranks if r["pred"] == "NOREL")
    m = {r["side"]: r for r in LP.link_prediction_metrics(
        LP.rank_candidates(test_df, ent_emb, rel_emb)
    ).collect()}
    assert m["all"]["n"] == 6
    assert m["all"]["n_unranked"] == 4


def test_metrics_exact_arithmetic(spark):
    ranks = spark.createDataFrame(
        [("a", "r", "b", "tail", 1, 0), ("a", "r", "b", "head", 4, 0),
         ("c", "r", "d", "tail", 2, 0), ("c", "r", "d", "head", 10, 0)],
        "subj string, pred string, obj string, side string, "
        "rank long, n_known_filtered long",
    )
    m = {r["side"]: r for r in
         LP.link_prediction_metrics(ranks, ks=(1, 3)).collect()}
    assert m["all"]["n"] == 4
    assert abs(m["all"]["mr"] - (1 + 4 + 2 + 10) / 4) < 1e-12
    assert abs(m["all"]["mrr"] - (1 + 0.25 + 0.5 + 0.1) / 4) < 1e-12
    assert abs(m["all"]["hits_1"] - 0.25) < 1e-12
    assert abs(m["all"]["hits_3"] - 0.5) < 1e-12
    assert abs(m["tail"]["mrr"] - (1 + 0.5) / 2) < 1e-12


def test_trained_model_beats_random_init(spark):
    """Learning property: filtered MRR of the trained TransE model on
    held-out-style triples beats the untrained init on the same
    protocol (planted structure: visit/host edges, tests/test_kgembed
    fixture shape)."""
    rows = []
    for i in range(12):
        rows.append((f"person{i}", "visit", f"place{i % 4}"))
    for i in range(4):
        rows.append((f"place{i}", "host", f"event{i % 2}"))
    edges = spark.createDataFrame(
        [(s, p, o, 1.0) for s, p, o in rows],
        "subj string, pred string, obj string, weight double",
    )
    known = edges.select("subj", "pred", "obj")
    model = KE.train_transe(edges, dim=DIM, iters=15, lr=0.1, k_neg=2)
    from naruhodo_spark.ops import kgtrain as KT

    ents = KT.entity_table(edges).select(F.col("entity").alias("name"))
    rels = edges.select(F.col("pred").alias("name")).distinct()
    e0 = KE.init_embeddings(ents, DIM)
    r0 = KE.init_embeddings(rels, DIM, seed="emb42/rel")

    def mrr(ent_emb, rel_emb):
        m = LP.link_prediction_metrics(
            LP.rank_candidates(known, ent_emb, rel_emb, known)
        )
        return m.where(F.col("side") == "all").first()["mrr"]

    assert mrr(model["ent_emb"], model["rel_emb"]) > mrr(e0, r0)


def test_facade_evaluate_embeddings(spark):
    """Public-surface drive: parser.train_embeddings() model evaluated
    via parser.evaluate_embeddings() on the KSG's own edges."""
    from naruhodo_spark.api import parser

    p = parser(spark, lang="en")
    p.add_all(
        [
            "alice visited bob.",
            "carol praised dave.",
            "dave praised alice.",
            "erin visited carol.",
        ]
    )
    model = p.train_embeddings(dim=8, iters=5)
    edges = model["ent_emb"].sparkSession.createDataFrame(
        [("alice", "visit", "bob")], "subj string, pred string, obj string"
    )
    m = p.evaluate_embeddings(model, edges)
    rows = {r["side"]: r for r in m.collect()}
    assert {"tail", "head", "all"} <= set(rows)
    assert rows["all"]["n"] == 2
    for r in rows.values():
        assert r["mrr"] is None or 0.0 < r["mrr"] <= 1.0
