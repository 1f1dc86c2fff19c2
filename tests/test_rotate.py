"""Distributed RotatE (ops/rotate.py): exact numpy mirror of the
full-batch margin GD, the zero-distance rotation identity, phase
2π-invariance, margin learning, and the NULL-coverage contract."""

import math

import numpy as np
import pyspark.sql.functions as F
import pytest

from naruhodo_spark.ops import kgembed as KE
from naruhodo_spark.ops import rotate as RT

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
    model = RT.train_rotate(
        edges, dim=DIM, iters=15, lr=0.05, margin=1.0, k_neg=2
    )
    return edges, model


def _np_rot(h, th):
    hr, hi = h[:DIM], h[DIM:]
    c, s = np.cos(th), np.sin(th)
    return hr * c - hi * s, hr * s + hi * c


def _np_dist(h, th, t):
    rr, ri = _np_rot(h, th)
    ur, ui = rr - t[:DIM], ri - t[DIM:]
    return float((ur * ur).sum() + (ui * ui).sum())


def _np_grads(h, th, t):
    c, s = np.cos(th), np.sin(th)
    rr, ri = _np_rot(h, th)
    ur, ui = rr - t[:DIM], ri - t[DIM:]
    gh = 2.0 * np.concatenate([ur * c + ui * s, ui * c - ur * s])
    gt = -2.0 * np.concatenate([ur, ui])
    gth = 2.0 * (ui * rr - ur * ri)
    return gh, gt, gth


def test_rotate_matches_numpy_mirror(spark, trained):
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
            2 * DIM, seed="rot42",
        ).collect()
    }
    r0 = {
        r["name"]: np.array(r["vec"])
        for r in spark.createDataFrame([(x,) for x in rels], ["name"])
        .select(
            "name",
            KE._rand_vec(F.col("name"), DIM, "rot42/rel", math.pi).alias(
                "vec"
            ),
        )
        .collect()
    }

    def norm(v):
        n = np.sqrt((v * v).sum())
        return v / n if n > 0 else v

    E = {k: v.copy() for k, v in e0.items()}
    R = {k: v.copy() for k, v in r0.items()}
    lr, margin = 0.05, 1.0
    for _ in range(15):
        ge = {k: np.zeros(2 * DIM) for k in E}
        ce = {k: 0 for k in E}
        gr = {k: np.zeros(DIM) for k in R}
        cr = {k: 0 for k in R}
        for h, r, t, nh, nt in pairs:
            dp = _np_dist(E[h], R[r], E[t])
            dn = _np_dist(E[nh], R[r], E[nt])
            if margin + dp - dn > 0:
                gph, gpt, gpr = _np_grads(E[h], R[r], E[t])
                gnh, gnt, gnr = _np_grads(E[nh], R[r], E[nt])
                ge[h] += gph; ce[h] += 1
                ge[t] += gpt; ce[t] += 1
                ge[nh] -= gnh; ce[nh] += 1
                ge[nt] -= gnt; ce[nt] += 1
                gr[r] += gpr - gnr; cr[r] += 1
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


def test_exact_rotation_scores_zero(spark):
    """d(h, r, h∘r) = 0 — a tail equal to the rotated head sits at
    distance exactly 0 (the composition identity RotatE is built on)."""
    h = np.array([0.3, -0.2, 0.5, 0.1, 0.0, 0.4,
                  0.1, 0.2, -0.3, 0.0, 0.5, -0.1])
    th = np.array([0.5, -1.2, 2.0, 0.0, 3.0, -0.7])
    rr, ri = _np_rot(h, th)
    t = np.concatenate([rr, ri])
    ent = spark.createDataFrame(
        [("h", h.tolist()), ("t", t.tolist())], "name string, vec array<double>"
    )
    rel = spark.createDataFrame(
        [("r", th.tolist())], "name string, vec array<double>"
    )
    triples = spark.createDataFrame(
        [("h", "r", "t")], "subj string, pred string, obj string"
    )
    [row] = RT.score_triples_rotate(triples, ent, rel, dim=DIM).collect()
    assert row["dist"] == pytest.approx(0.0, abs=1e-9)


def test_phase_wraparound_invariance(spark, trained):
    """θ and θ+2π are the same rotation — scores identical."""
    edges, model = trained
    rel2 = model["rel_emb"].select(
        "name",
        F.transform("vec", lambda x: x + 2.0 * math.pi).alias("vec"),
    )
    t = spark.createDataFrame(
        [("person1", "visit", "place1")], "subj string, pred string, obj string"
    )
    d1 = RT.score_triples_rotate(
        t, model["ent_emb"], model["rel_emb"], dim=DIM).head()["dist"]
    d2 = RT.score_triples_rotate(
        t, model["ent_emb"], rel2, dim=DIM).head()["dist"]
    assert d1 == pytest.approx(d2, abs=1e-9)


def test_rotate_learns_margin(spark, trained):
    edges, model = trained
    pairs = KE.training_pairs(edges, k_neg=2)
    pos = pairs.select(
        F.col("h").alias("subj"), F.col("r").alias("pred"),
        F.col("t").alias("obj"))
    neg = pairs.select(
        F.col("nh").alias("subj"), F.col("r").alias("pred"),
        F.col("nt").alias("obj"))

    def mean_dist(triples):
        return RT.score_triples_rotate(
            triples, model["ent_emb"], model["rel_emb"], dim=DIM
        ).agg(F.avg("dist")).head()[0]

    assert mean_dist(pos) < mean_dist(neg)  # lower = more plausible


def test_rotate_loss_decreases(spark, trained):
    edges, model = trained
    pairs = KE.training_pairs(edges, k_neg=2)
    from naruhodo_spark.ops import kgtrain as KT
    ent0 = KE.init_embeddings(KT.entity_table(edges), 2 * DIM, seed="rot42")
    rel0 = (
        edges.select(F.col("pred").alias("name")).distinct()
        .select(
            "name",
            KE._rand_vec(F.col("name"), DIM, "rot42/rel", math.pi).alias(
                "vec"
            ),
        )
    )
    l0 = RT.rotate_loss(pairs, ent0, rel0, dim=DIM)
    l1 = RT.rotate_loss(pairs, model["ent_emb"], model["rel_emb"], dim=DIM)
    assert l1 < l0


def test_rotate_dist_null_for_uncovered(spark, trained):
    edges, model = trained
    triples = spark.createDataFrame(
        [("ghost", "visit", "place1")], "subj string, pred string, obj string"
    )
    [r] = RT.score_triples_rotate(
        triples, model["ent_emb"], model["rel_emb"], dim=DIM).collect()
    assert r["dist"] is None


# ------------------------------------------------------------------ eval

def test_rotate_ranks_match_numpy_both_sides(spark, trained):
    """Engine ranks ≡ brute-force numpy under the DIRECT distance
    d(c) = |c∘r − t|² / |h∘r − c|² — proving the head side's unitary
    conj(r) reduction, filtered correction included."""
    edges, model = trained
    E = {r["name"]: np.array(r["vec"])
         for r in model["ent_emb"].collect()}
    R = {r["name"]: np.array(r["vec"])
         for r in model["rel_emb"].collect()}
    test = [("person1", "visit", "place1"), ("place2", "host", "event0")]
    known = [(r["subj"], r["pred"], r["obj"]) for r in edges.collect()]

    def d_tail(h, th, c):
        return _np_dist(h, th, c)

    def d_head(c, th, t):
        return _np_dist(c, th, t)

    exp = {}
    for s, p, o in test:
        dt = d_tail(E[s], R[p], E[o])
        better = [c for c in E if c != o and d_tail(E[s], R[p], E[c]) < dt]
        kb = [c for c in better
              if (s, p, c) in set(known)]
        exp[(s, p, o, "tail")] = max(1, 1 + len(better) - len(kb))
        dh = d_head(E[s], R[p], E[o])
        better = [c for c in E if c != s and d_head(E[c], R[p], E[o]) < dh]
        kb = [c for c in better if (c, p, o) in set(known)]
        exp[(s, p, o, "head")] = max(1, 1 + len(better) - len(kb))

    tdf = spark.createDataFrame(
        test, "subj string, pred string, obj string"
    )
    got = {
        (r["subj"], r["pred"], r["obj"], r["side"]): r["rank"]
        for r in RT.rank_candidates_rotate(
            tdf, model["ent_emb"], model["rel_emb"], known=edges, dim=DIM
        ).collect()
    }
    assert got == exp


def test_rotate_blas_path_matches_catalyst(spark, trained):
    edges, model = trained
    tdf = spark.createDataFrame(
        [("person1", "visit", "place1"), ("person3", "visit", "place3")],
        "subj string, pred string, obj string",
    )
    a = RT.rank_candidates_rotate(
        tdf, model["ent_emb"], model["rel_emb"], path="catalyst", dim=DIM
    )
    b = RT.rank_candidates_rotate(
        tdf, model["ent_emb"], model["rel_emb"], path="blas", dim=DIM
    )
    key = ["subj", "pred", "obj", "side"]
    ra = {tuple(r[k] for k in key): r["rank"] for r in a.collect()}
    rb = {tuple(r[k] for k in key): r["rank"] for r in b.collect()}
    assert ra == rb


def test_rotate_rank_null_for_uncovered(spark, trained):
    edges, model = trained
    tdf = spark.createDataFrame(
        [("ghost", "visit", "place1")], "subj string, pred string, obj string"
    )
    rows = RT.rank_candidates_rotate(
        tdf, model["ent_emb"], model["rel_emb"], dim=DIM
    ).collect()
    assert len(rows) == 2  # both sides kept
    assert all(r["rank"] is None for r in rows)
