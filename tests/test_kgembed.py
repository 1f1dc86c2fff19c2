"""Distributed TransE (ops/kgembed.py): exact numpy mirror of the
full-batch margin GD (same init, same pairs, same update — collected
from Spark so the hash-derived values are bit-identical), plus a
learning property: true triples score closer than corruptions after
training."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from naruhodo_spark.ops import kgembed as KE

DIM = 8


def _edges(spark):
    # bipartite-ish planted structure: people 'visit' places,
    # places 'host' events — enough entities for negatives to exist
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
    model = KE.train_transe(
        edges, dim=DIM, iters=15, lr=0.1, margin=1.0, k_neg=2
    )
    return edges, model


def test_transe_matches_numpy_mirror(spark, trained):
    edges, model = trained
    # identical inputs, straight from Spark
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
            spark.createDataFrame([(e,) for e in ents], ["entity"]), DIM
        ).collect()
    }
    r0 = {
        r["name"]: np.array(r["vec"])
        for r in KE.init_embeddings(
            spark.createDataFrame([(x,) for x in rels], ["name"]),
            DIM, seed="emb42/rel",
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
            sp = E[h] + R[r] - E[t]
            sn = E[nh] + R[r] - E[nt]
            if margin + (sp * sp).sum() - (sn * sn).sum() > 0:
                # mean gradient per name: accumulate sum + count, like
                # _grad_mean's per-dim F.avg
                ge[h] += 2 * sp; ce[h] += 1
                ge[t] -= 2 * sp; ce[t] += 1
                ge[nh] -= 2 * sn; ce[nh] += 1
                ge[nt] += 2 * sn; ce[nt] += 1
                gr[r] += 2 * sp - 2 * sn; cr[r] += 1
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


def test_transe_learns_margin(spark, trained):
    edges, model = trained
    pairs = KE.training_pairs(edges, k_neg=2)
    pos = pairs.select(
        F.col("h").alias("subj"), F.col("r").alias("pred"),
        F.col("t").alias("obj"))
    neg = pairs.select(
        F.col("nh").alias("subj"), F.col("r").alias("pred"),
        F.col("nt").alias("obj"))

    def mean_dist(triples, ent, rel):
        return (
            KE.score_triples(triples, ent, rel)
            .agg(F.avg("dist")).head()[0]
        )

    from naruhodo_spark.ops import kgtrain as KT
    ent0 = KE.init_embeddings(KT.entity_table(edges), DIM)
    rel0 = KE.init_embeddings(
        edges.select(F.col("pred").alias("name")).distinct(),
        DIM, seed="emb42/rel")
    sep0 = mean_dist(neg, ent0, rel0) - mean_dist(pos, ent0, rel0)
    sep1 = (mean_dist(neg, model["ent_emb"], model["rel_emb"])
            - mean_dist(pos, model["ent_emb"], model["rel_emb"]))
    # training must open the positive/negative gap substantially
    assert sep1 > sep0 + 0.3, (sep0, sep1)
    # and positives end up closer than negatives in absolute terms
    assert mean_dist(pos, model["ent_emb"], model["rel_emb"]) < mean_dist(
        neg, model["ent_emb"], model["rel_emb"])


def test_negative_samples_with_origin_reconstructs_positive(spark):
    from naruhodo_spark.ops import kgtrain as KT

    edges = _edges(spark)
    pos = {(r["subj"], r["pred"], r["obj"])
           for r in edges.select("subj", "pred", "obj").distinct().collect()}
    negs = KT.negative_samples(edges, k=2, with_origin=True).collect()
    assert len(negs) > 0
    for r in negs:
        if r["corrupted"] == "tail":
            assert (r["subj"], r["pred"], r["orig"]) in pos
        else:
            assert (r["orig"], r["pred"], r["obj"]) in pos
        assert (r["subj"], r["pred"], r["obj"]) not in pos


def test_warm_start_keeps_trained_and_inits_new(spark, trained):
    edges, model = trained
    # second "epoch": one new entity + reuse of existing ones
    new_edges = _edges(spark).unionByName(
        spark.createDataFrame(
            [("person0", "visit", "newplace", 1.0)],
            "subj string, pred string, obj string, weight double",
        )
    )
    warm = KE.train_transe(
        new_edges, dim=DIM, iters=0, k_neg=2,
        init_ent=model["ent_emb"], init_rel=model["rel_emb"],
    )
    prev = {r["name"]: tuple(r["vec"]) for r in model["ent_emb"].collect()}
    got = {r["name"]: tuple(r["vec"]) for r in warm["ent_emb"].collect()}
    # iters=0 -> warm entities keep their exact trained vectors
    for name, vec in prev.items():
        assert got[name] == vec, name
    # the new entity exists and got the deterministic hash init
    fresh = {
        r["name"]: tuple(r["vec"])
        for r in KE.init_embeddings(
            spark.createDataFrame([("newplace",)], ["entity"]), DIM
        ).collect()
    }
    assert got["newplace"] == fresh["newplace"]
    # and training from the warm start still runs
    warm2 = KE.train_transe(
        new_edges, dim=DIM, iters=2, k_neg=2,
        init_ent=model["ent_emb"], init_rel=model["rel_emb"],
    )
    assert warm2["ent_emb"].count() == len(got)


def test_minibatch_sgd_matches_numpy_mirror(spark):
    """n_shards=2: per-shard sequential updates, mirrored exactly in
    numpy using Spark's own shard assignment."""
    edges = _edges(spark)
    model = KE.train_transe(
        edges, dim=DIM, iters=4, lr=0.1, margin=1.0, k_neg=2, n_shards=2
    )
    pairs_df = KE.training_pairs(edges, k_neg=2)
    shard_col = F.pmod(
        F.xxhash64(F.lit("emb42"), "h", "r", "t", "nh", "nt"), F.lit(2)
    )
    pairs = [
        (r["h"], r["r"], r["t"], r["nh"], r["nt"], r["shard"])
        for r in pairs_df.withColumn("shard", shard_col).collect()
    ]
    assert {s for *_, s in pairs} == {0, 1}  # both shards non-empty
    from naruhodo_spark.ops import kgtrain as KT

    ents = [r["entity"] for r in KT.entity_table(edges).collect()]
    rels = [r["name"] for r in
            edges.select(F.col("pred").alias("name")).distinct().collect()]
    E = {
        r["name"]: np.array(r["vec"])
        for r in KE.init_embeddings(
            spark.createDataFrame([(e,) for e in ents], ["entity"]), DIM
        ).collect()
    }
    R = {
        r["name"]: np.array(r["vec"])
        for r in KE.init_embeddings(
            spark.createDataFrame([(x,) for x in rels], ["name"]),
            DIM, seed="emb42/rel",
        ).collect()
    }

    def norm(v):
        n = np.sqrt((v * v).sum())
        return v / n if n > 0 else v

    lr, margin = 0.1, 1.0
    for _ in range(4):
        for shard in (0, 1):
            ge = {k: np.zeros(DIM) for k in E}
            ce = {k: 0 for k in E}
            gr = {k: np.zeros(DIM) for k in R}
            cr = {k: 0 for k in R}
            for h, r, t, nh, nt, s in pairs:
                if s != shard:
                    continue
                sp = E[h] + R[r] - E[t]
                sn = E[nh] + R[r] - E[nt]
                if margin + (sp * sp).sum() - (sn * sn).sum() > 0:
                    ge[h] += 2 * sp; ce[h] += 1
                    ge[t] -= 2 * sp; ce[t] += 1
                    ge[nh] -= 2 * sn; ce[nh] += 1
                    ge[nt] += 2 * sn; ce[nt] += 1
                    gr[r] += 2 * sp - 2 * sn; cr[r] += 1
            E = {k: norm(E[k] - lr * (ge[k] / max(ce[k], 1))) for k in E}
            R = {k: R[k] - lr * (gr[k] / max(cr[k], 1)) for k in R}

    got_e = {r["name"]: np.array(r["vec"])
             for r in model["ent_emb"].collect()}
    for k in E:
        np.testing.assert_allclose(got_e[k], E[k], atol=1e-9, err_msg=k)


def test_warm_start_dim_mismatch_fails_fast(spark, trained):
    import pytest as _pt

    edges, model = trained
    with _pt.raises(ValueError, match="dim"):
        KE.train_transe(edges, dim=DIM * 2, iters=1, init_ent=model["ent_emb"])


def test_score_triples_keeps_unseen_with_null_dist(spark, trained):
    edges, model = trained
    t = spark.createDataFrame(
        [("person0", "visit", "place0"), ("ghost", "visit", "place0")],
        "subj string, pred string, obj string",
    )
    rows = {r["subj"]: r["dist"]
            for r in KE.score_triples(t, model["ent_emb"], model["rel_emb"]).collect()}
    assert set(rows) == {"person0", "ghost"}  # nothing silently dropped
    assert rows["person0"] is not None and rows["ghost"] is None


def test_stats_reset_private_api_still_exists(spark):
    """The fast `_truncate` path rides private classic-session JVM API
    (`_jsparkSession.internalCreateDataFrame` over `toRdd()`). This pin
    makes a pyspark upgrade that removes/renames the signature fail
    LOUDLY here instead of silently degrading every training loop to
    the slow-planning fallback (ADVICE r03; VERDICT r03 'What's wrong'
    #1)."""
    df = spark.range(4).select(F.col("id").cast("string").alias("name"))
    out = KE._truncate(df)
    assert out._nh_stats_reset is True, (
        "private stats-reset API gone on this pyspark build — "
        "re-derive the rebuild or accept the slow fallback explicitly"
    )
    assert out.count() == 4
    KE._release(out)


def test_truncate_fallback_trains_identically(spark, trained, monkeypatch):
    """With the private rebuild unavailable (Spark Connect / API bump),
    `_truncate` must fall back to the plain checkpoint and training
    must produce BIT-IDENTICAL vectors (the rebuild only resets
    planner statistics — never data)."""
    edges, _ = trained

    def fast():
        return KE.train_transe(edges, dim=DIM, iters=3, k_neg=2)

    ref = {r["name"]: tuple(r["vec"])
           for r in fast()["ent_emb"].collect()}

    def boom(ck):
        raise RuntimeError("simulated Spark Connect: no _jsparkSession")

    monkeypatch.setattr(KE, "_stats_reset_rebuild", boom)
    probe = KE._truncate(
        spark.range(2).select(F.col("id").cast("string").alias("name")))
    assert probe._nh_stats_reset is False  # fallback path engaged
    got = {r["name"]: tuple(r["vec"])
           for r in fast()["ent_emb"].collect()}
    assert got == ref


def test_minibatch_sgd_converges(spark):
    """VERDICT r03 task #6: the web-scale batch size (n_shards > 1)
    must still LEARN — after a mini-batch run the positive/corruption
    separation opens vs the untrained model, and positives score
    closer in absolute terms."""
    from naruhodo_spark.ops import kgtrain as KT

    edges = _edges(spark)
    model = KE.train_transe(
        edges, dim=DIM, iters=6, lr=0.1, margin=1.0, k_neg=2, n_shards=4
    )
    pairs = KE.training_pairs(edges, k_neg=2)
    pos = pairs.select(F.col("h").alias("subj"), F.col("r").alias("pred"),
                       F.col("t").alias("obj"))
    neg = pairs.select(F.col("nh").alias("subj"), F.col("r").alias("pred"),
                       F.col("nt").alias("obj"))

    def mean_dist(triples, ent, rel):
        return (KE.score_triples(triples, ent, rel)
                .agg(F.avg("dist")).head()[0])

    ent0 = KE.init_embeddings(KT.entity_table(edges), DIM)
    rel0 = KE.init_embeddings(
        edges.select(F.col("pred").alias("name")).distinct(),
        DIM, seed="emb42/rel")
    sep0 = mean_dist(neg, ent0, rel0) - mean_dist(pos, ent0, rel0)
    sep1 = (mean_dist(neg, model["ent_emb"], model["rel_emb"])
            - mean_dist(pos, model["ent_emb"], model["rel_emb"]))
    assert sep1 > sep0 + 0.3, (sep0, sep1)
    assert mean_dist(pos, model["ent_emb"], model["rel_emb"]) < mean_dist(
        neg, model["ent_emb"], model["rel_emb"])


def test_round_metrics_loss_decreases(spark):
    """The instrumented convergence surface (round_metrics +
    transe_loss): per-iteration full-corpus margin loss must be
    monotone-ish downward — last iteration strictly below the first —
    and wall entries must cover every iteration."""
    edges = _edges(spark)
    metrics: list = []
    KE.train_transe(
        edges, dim=DIM, iters=5, lr=0.1, k_neg=2, n_shards=2,
        round_metrics=metrics,
    )
    assert [m["iter"] for m in metrics] == list(range(5))
    losses = [m["loss"] for m in metrics]
    assert losses[-1] < losses[0], losses
    assert all(m["wall_s"] > 0 for m in metrics)


def test_minibatch_converges_faster_per_round(spark):
    """The drill claim recorded in BENCH/BASELINE.md (r04 TransE
    convergence section): at equal round counts, hash-sharded
    mini-batch SGD (k sequential model updates per round) ends at a
    strictly lower full-corpus margin loss than full-batch GD."""
    edges = _edges(spark)
    full_m: list = []
    mini_m: list = []
    KE.train_transe(edges, dim=DIM, iters=4, lr=0.1, k_neg=2,
                    n_shards=1, round_metrics=full_m)
    KE.train_transe(edges, dim=DIM, iters=4, lr=0.1, k_neg=2,
                    n_shards=4, round_metrics=mini_m)
    assert mini_m[-1]["loss"] < full_m[-1]["loss"], (
        [m["loss"] for m in full_m],
        [m["loss"] for m in mini_m],
    )
