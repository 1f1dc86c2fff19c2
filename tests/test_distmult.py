"""Distributed DistMult (ops/distmult.py): exact numpy mirror of the
full-batch margin GD (same hash init, same pairs, same mean-gradient
update), the learning property (positives score above corruptions),
the symmetric-relation property TransE cannot express, and the
no-silent-drop scoring contract."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from naruhodo_spark.ops import distmult as DM
from naruhodo_spark.ops import kgembed as KE

DIM = 8


def _edges(spark):
    rows = []
    for i in range(12):
        rows.append((f"person{i}", "visit", f"place{i % 4}", 1.0))
    for i in range(4):
        rows.append((f"place{i}", "host", f"event{i % 2}", 1.0))
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, weight double"
    )


@pytest.fixture(scope="module")
def trained(spark):
    edges = _edges(spark)
    model = DM.train_distmult(
        edges, dim=DIM, iters=15, lr=0.1, margin=1.0, k_neg=2
    )
    return edges, model


def test_distmult_matches_numpy_mirror(spark, trained):
    edges, model = trained
    pairs = [
        (r["h"], r["r"], r["t"], r["nh"], r["nt"])
        for r in KE.training_pairs(edges, k_neg=2).collect()
    ]
    from naruhodo_spark.ops import kgtrain as KT

    ents = [r["entity"] for r in KT.entity_table(edges).collect()]
    rels = [r["name"] for r in
            edges.select(F.col("pred").alias("name")).distinct().collect()]
    e0 = {
        r["name"]: np.array(r["vec"])
        for r in KE.init_embeddings(
            spark.createDataFrame([(e,) for e in ents], ["entity"]),
            DIM, seed="dm42",
        ).collect()
    }
    r0 = {
        r["name"]: np.array(r["vec"])
        for r in KE.init_embeddings(
            spark.createDataFrame([(x,) for x in rels], ["name"]),
            DIM, seed="dm42/rel", normalize=False,
        ).collect()
    }

    def norm(v):
        n = np.sqrt((v * v).sum())
        return v / n if n > 0 else v

    E = {k: v.copy() for k, v in e0.items()}
    R = {k: v.copy() for k, v in r0.items()}
    lr, margin = 0.1, 1.0
    for _ in range(15):
        ge = {k: np.zeros(DIM) for k in E}
        ce = {k: 0 for k in E}
        gr = {k: np.zeros(DIM) for k in R}
        cr = {k: 0 for k in R}
        for h, r, t, nh, nt in pairs:
            sp = (E[h] * R[r] * E[t]).sum()
            sn = (E[nh] * R[r] * E[nt]).sum()
            if margin - sp + sn > 0:
                ge[h] -= R[r] * E[t]; ce[h] += 1
                ge[t] -= R[r] * E[h]; ce[t] += 1
                ge[nh] += R[r] * E[nt]; ce[nh] += 1
                ge[nt] += R[r] * E[nh]; ce[nt] += 1
                gr[r] += E[nh] * E[nt] - E[h] * E[t]; cr[r] += 1
        E = {k: norm(E[k] - lr * (ge[k] / max(ce[k], 1))) for k in E}
        R = {k: R[k] - lr * (gr[k] / max(cr[k], 1)) for k in R}

    got_e = {r["name"]: np.array(r["vec"])
             for r in model["ent_emb"].collect()}
    got_r = {r["name"]: np.array(r["vec"])
             for r in model["rel_emb"].collect()}
    assert set(got_e) == set(E) and set(got_r) == set(R)
    for k in E:
        np.testing.assert_allclose(got_e[k], E[k], atol=1e-9, err_msg=k)
    for k in R:
        np.testing.assert_allclose(got_r[k], R[k], atol=1e-9, err_msg=k)


def test_distmult_learns_margin(spark, trained):
    edges, model = trained
    pairs = KE.training_pairs(edges, k_neg=2)
    pos = pairs.select(
        F.col("h").alias("subj"), F.col("r").alias("pred"),
        F.col("t").alias("obj"))
    neg = pairs.select(
        F.col("nh").alias("subj"), F.col("r").alias("pred"),
        F.col("nt").alias("obj"))

    def mean_score(triples, ent, rel):
        return (
            DM.score_triples_distmult(triples, ent, rel)
            .agg(F.avg("score")).head()[0]
        )

    from naruhodo_spark.ops import kgtrain as KT
    ent0 = KE.init_embeddings(KT.entity_table(edges), DIM, seed="dm42")
    rel0 = KE.init_embeddings(
        edges.select(F.col("pred").alias("name")).distinct(),
        DIM, seed="dm42/rel", normalize=False)
    # HIGHER = more plausible: the pos-minus-neg gap must open
    sep0 = mean_score(pos, ent0, rel0) - mean_score(neg, ent0, rel0)
    sep1 = (mean_score(pos, model["ent_emb"], model["rel_emb"])
            - mean_score(neg, model["ent_emb"], model["rel_emb"]))
    assert sep1 > sep0 + 0.3, (sep0, sep1)
    assert mean_score(pos, model["ent_emb"], model["rel_emb"]) > mean_score(
        neg, model["ent_emb"], model["rel_emb"])


def test_distmult_scores_symmetric_relations(spark, trained):
    """s(h,r,t) == s(t,r,h) by construction — the model property that
    motivates having DistMult next to TransE."""
    edges, model = trained
    fwd = spark.createDataFrame(
        [("person1", "visit", "place1")], "subj string, pred string, obj string"
    )
    rev = spark.createDataFrame(
        [("place1", "visit", "person1")], "subj string, pred string, obj string"
    )
    sf = DM.score_triples_distmult(fwd, model["ent_emb"], model["rel_emb"]).head()["score"]
    sr = DM.score_triples_distmult(rev, model["ent_emb"], model["rel_emb"]).head()["score"]
    assert sf == pytest.approx(sr, abs=1e-9)


def test_score_keeps_uncovered_triples_as_null(spark, trained):
    edges, model = trained
    triples = spark.createDataFrame(
        [("person1", "visit", "place1"), ("ghost", "visit", "place1")],
        "subj string, pred string, obj string",
    )
    rows = {r["subj"]: r["score"] for r in DM.score_triples_distmult(
        triples, model["ent_emb"], model["rel_emb"]).collect()}
    assert rows["person1"] is not None
    assert rows["ghost"] is None  # left joins: coverage gap ≠ implausible


def test_minibatch_shards_converge(spark):
    edges = _edges(spark)
    metrics = []
    DM.train_distmult(
        edges, dim=DIM, iters=6, lr=0.1, k_neg=2, n_shards=2,
        round_metrics=metrics,
    )
    assert len(metrics) == 6
    assert metrics[-1]["loss"] < metrics[0]["loss"]


def test_loss_decreases_full_batch(spark, trained):
    edges, model = trained
    pairs = KE.training_pairs(edges, k_neg=2)
    from naruhodo_spark.ops import kgtrain as KT
    ent0 = KE.init_embeddings(KT.entity_table(edges), DIM, seed="dm42")
    rel0 = KE.init_embeddings(
        edges.select(F.col("pred").alias("name")).distinct(),
        DIM, seed="dm42/rel", normalize=False)
    l0 = DM.distmult_loss(pairs, ent0, rel0)
    l1 = DM.distmult_loss(pairs, model["ent_emb"], model["rel_emb"])
    assert l1 < l0


def test_rank_candidates_matches_numpy_exhaustive(spark, trained):
    """Filtered ranks vs brute-force numpy over ALL entities on both
    sides — the bilinear twin of the TransE evaluator's mirror."""
    edges, model = trained
    test = edges.select("subj", "pred", "obj").distinct().limit(8)
    known = edges.select("subj", "pred", "obj").distinct()
    got = {
        (r["subj"], r["pred"], r["obj"], r["side"]): r["rank"]
        for r in DM.rank_candidates_distmult(
            test, model["ent_emb"], model["rel_emb"], known=known
        ).collect()
    }
    E = {r["name"]: np.array(r["vec"]) for r in model["ent_emb"].collect()}
    R = {r["name"]: np.array(r["vec"]) for r in model["rel_emb"].collect()}
    K = {(r["subj"], r["pred"], r["obj"]) for r in known.collect()}
    for (s, p, o, side), rank in got.items():
        if side == "tail":
            q = E[s] * R[p]
            true_sc = float(q @ E[o])
            n_b = sum(
                1 for e, v in E.items()
                if e != o and float(q @ v) > true_sc
            )
            n_kb = sum(
                1 for e, v in E.items()
                if e != o and (s, p, e) in K and float(q @ v) > true_sc
            )
        else:
            q = R[p] * E[o]
            true_sc = float(q @ E[s])
            n_b = sum(
                1 for e, v in E.items()
                if e != s and float(q @ v) > true_sc
            )
            n_kb = sum(
                1 for e, v in E.items()
                if e != s and (e, p, o) in K and float(q @ v) > true_sc
            )
        assert rank == max(1, 1 + n_b - n_kb), (s, p, o, side)


def test_trained_beats_init_mrr(spark, trained):
    from naruhodo_spark.ops import kglinkpred as LPR
    from naruhodo_spark.ops import kgtrain as KT

    edges, model = trained
    test = edges.select("subj", "pred", "obj").distinct()
    ent0 = KE.init_embeddings(KT.entity_table(edges), DIM, seed="dm42")
    rel0 = KE.init_embeddings(
        edges.select(F.col("pred").alias("name")).distinct(),
        DIM, seed="dm42/rel", normalize=False)

    def mrr(ent, rel):
        ranks = DM.rank_candidates_distmult(test, ent, rel, known=test)
        [row] = LPR.link_prediction_metrics(ranks).where(
            "side = 'all'").collect()
        return row["mrr"]

    assert mrr(model["ent_emb"], model["rel_emb"]) > mrr(ent0, rel0)


def test_rank_null_for_uncovered_triple(spark, trained):
    edges, model = trained
    test = spark.createDataFrame(
        [("ghost", "visit", "place1")], "subj string, pred string, obj string"
    )
    rows = DM.rank_candidates_distmult(
        test, model["ent_emb"], model["rel_emb"]
    ).collect()
    assert len(rows) == 2 and all(r["rank"] is None for r in rows)
