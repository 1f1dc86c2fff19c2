"""Distributed ComplEx (ops/complexe.py): exact numpy mirror of the
full-batch margin GD (componentwise real arithmetic matching the Spark
formulas), the margin-learning property, the ASYMMETRY capability
DistMult lacks, and the NULL-coverage scoring contract."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from naruhodo_spark.ops import complexe as CX
from naruhodo_spark.ops import kgembed as KE

DIM = 6


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
    model = CX.train_complex(
        edges, dim=DIM, iters=15, lr=0.1, margin=1.0, k_neg=2
    )
    return edges, model


def _np_score(h, r, t):
    d = len(h) // 2
    hr, hi = h[:d], h[d:]
    rr, ri = r[:d], r[d:]
    tr, ti = t[:d], t[d:]
    return float(
        (hr * rr * tr).sum() + (hi * rr * ti).sum()
        + (hr * ri * ti).sum() - (hi * ri * tr).sum()
    )


def test_complex_matches_numpy_mirror(spark, trained):
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
            2 * DIM, seed="cx42",
        ).collect()
    }
    r0 = {
        r["name"]: np.array(r["vec"])
        for r in KE.init_embeddings(
            spark.createDataFrame([(x,) for x in rels], ["name"]),
            2 * DIM, seed="cx42/rel", normalize=False,
        ).collect()
    }

    def norm(v):
        n = np.sqrt((v * v).sum())
        return v / n if n > 0 else v

    def g_h(r, t):
        d = DIM
        rr, ri, tr, ti = r[:d], r[d:], t[:d], t[d:]
        return np.concatenate([rr * tr + ri * ti, rr * ti - ri * tr])

    def g_t(r, h):
        d = DIM
        rr, ri, hr, hi = r[:d], r[d:], h[:d], h[d:]
        return np.concatenate([rr * hr - ri * hi, rr * hi + ri * hr])

    def g_r(h, t):
        d = DIM
        hr, hi, tr, ti = h[:d], h[d:], t[:d], t[d:]
        return np.concatenate([hr * tr + hi * ti, hr * ti - hi * tr])

    E = {k: v.copy() for k, v in e0.items()}
    R = {k: v.copy() for k, v in r0.items()}
    lr, margin = 0.1, 1.0
    for _ in range(15):
        ge = {k: np.zeros(2 * DIM) for k in E}
        ce = {k: 0 for k in E}
        gr = {k: np.zeros(2 * DIM) for k in R}
        cr = {k: 0 for k in R}
        for h, r, t, nh, nt in pairs:
            sp = _np_score(E[h], R[r], E[t])
            sn = _np_score(E[nh], R[r], E[nt])
            if margin - sp + sn > 0:
                ge[h] -= g_h(R[r], E[t]); ce[h] += 1
                ge[t] -= g_t(R[r], E[h]); ce[t] += 1
                ge[nh] += g_h(R[r], E[nt]); ce[nh] += 1
                ge[nt] += g_t(R[r], E[nh]); ce[nt] += 1
                gr[r] += g_r(E[nh], E[nt]) - g_r(E[h], E[t]); cr[r] += 1
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


def test_complex_learns_margin(spark, trained):
    edges, model = trained
    pairs = KE.training_pairs(edges, k_neg=2)
    pos = pairs.select(
        F.col("h").alias("subj"), F.col("r").alias("pred"),
        F.col("t").alias("obj"))
    neg = pairs.select(
        F.col("nh").alias("subj"), F.col("r").alias("pred"),
        F.col("nt").alias("obj"))

    def mean_score(triples):
        return CX.score_triples_complex(
            triples, model["ent_emb"], model["rel_emb"], dim=DIM
        ).agg(F.avg("score")).head()[0]

    assert mean_score(pos) > mean_score(neg)


def test_complex_can_be_asymmetric(spark, trained):
    """s(h,r,t) != s(t,r,h) generically — the capability DistMult lacks
    (its score is symmetric by construction)."""
    edges, model = trained
    fwd = spark.createDataFrame(
        [("person1", "visit", "place1")], "subj string, pred string, obj string"
    )
    rev = spark.createDataFrame(
        [("place1", "visit", "person1")], "subj string, pred string, obj string"
    )
    sf = CX.score_triples_complex(
        fwd, model["ent_emb"], model["rel_emb"], dim=DIM).head()["score"]
    sr = CX.score_triples_complex(
        rev, model["ent_emb"], model["rel_emb"], dim=DIM).head()["score"]
    assert sf != pytest.approx(sr, abs=1e-6)


def test_complex_loss_decreases(spark, trained):
    edges, model = trained
    pairs = KE.training_pairs(edges, k_neg=2)
    from naruhodo_spark.ops import kgtrain as KT
    ent0 = KE.init_embeddings(KT.entity_table(edges), 2 * DIM, seed="cx42")
    rel0 = KE.init_embeddings(
        edges.select(F.col("pred").alias("name")).distinct(),
        2 * DIM, seed="cx42/rel", normalize=False)
    l0 = CX.complex_loss(pairs, ent0, rel0, dim=DIM)
    l1 = CX.complex_loss(pairs, model["ent_emb"], model["rel_emb"], dim=DIM)
    assert l1 < l0


def test_complex_score_null_for_uncovered(spark, trained):
    edges, model = trained
    triples = spark.createDataFrame(
        [("ghost", "visit", "place1")], "subj string, pred string, obj string"
    )
    [r] = CX.score_triples_complex(
        triples, model["ent_emb"], model["rel_emb"], dim=DIM).collect()
    assert r["score"] is None
