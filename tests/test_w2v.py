"""SGNS trainer (ops/w2v.py) vs an exact numpy mirror of the identical
full-batch update (same init, same training rows, same mean-gradient
rule), plus learning-dynamics properties."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from naruhodo_spark.ops import w2v as W2V

DIM = 8


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "center string, context string")


@pytest.fixture(scope="module")
def clique_pairs(spark):
    """Two token cliques that co-occur internally, never across."""
    a = ["a1", "a2", "a3"]
    b = ["b1", "b2", "b3"]
    rows = []
    for grp in (a, b):
        for u in grp:
            for v in grp:
                if u != v:
                    rows.append((u, v))
    return _pairs(spark, rows * 3)  # duplicates = training weight


def _numpy_sgns(rows, in0, out0, lr, iters):
    """Mirror of train_sgns: simultaneous full-batch update with
    per-name MEAN gradients."""
    vin = {k: np.array(v, dtype=float) for k, v in in0.items()}
    vout = {k: np.array(v, dtype=float) for k, v in out0.items()}
    for _ in range(iters):
        gin, gout = {}, {}
        for c, w, label in rows:
            s = 1.0 / (1.0 + math.exp(-float(vin[c] @ vout[w])))
            g = s - label
            gin.setdefault(c, []).append(g * vout[w])
            gout.setdefault(w, []).append(g * vin[c])
        for k, gs in gin.items():
            vin[k] = vin[k] - lr * np.mean(gs, axis=0)
        for k, gs in gout.items():
            vout[k] = vout[k] - lr * np.mean(gs, axis=0)
    return vin, vout


def test_sgns_matches_numpy_mirror(spark, clique_pairs):
    rows_df = W2V.sgns_training_rows(clique_pairs, k_neg=2).localCheckpoint()
    rows = [(r["center"], r["word"], r["label"]) for r in rows_df.collect()]
    assert any(lab == 0.0 for _, _, lab in rows)  # negatives exist

    from naruhodo_spark.ops.kgembed import init_embeddings

    in0 = {
        r["name"]: r["vec"]
        for r in init_embeddings(
            rows_df.select(F.col("center").alias("name")).distinct(),
            DIM, seed="sgns42:in", normalize=False,
        ).collect()
    }
    out0 = {
        r["name"]: r["vec"]
        for r in init_embeddings(
            rows_df.select(F.col("word").alias("name")).distinct(),
            DIM, seed="sgns42:out", normalize=False,
        ).collect()
    }
    model = W2V.train_sgns(
        clique_pairs, dim=DIM, iterations=4, lr=0.4,
        training_rows=rows_df,
    )
    got_in = {r["name"]: r["vec"] for r in model["in_emb"].collect()}
    got_out = {r["name"]: r["vec"] for r in model["out_emb"].collect()}
    want_in, want_out = _numpy_sgns(rows, in0, out0, lr=0.4, iters=4)
    assert set(got_in) == set(want_in)
    for k in want_in:
        assert got_in[k] == pytest.approx(list(want_in[k]), abs=1e-9)
    for k in want_out:
        assert got_out[k] == pytest.approx(list(want_out[k]), abs=1e-9)


def test_sgns_loss_decreases(spark, clique_pairs):
    rows = W2V.sgns_training_rows(clique_pairs, k_neg=2).localCheckpoint()
    from naruhodo_spark.ops.kgembed import init_embeddings

    in0 = init_embeddings(
        rows.select(F.col("center").alias("name")).distinct(),
        DIM, seed="sgns42:in", normalize=False,
    )
    out0 = init_embeddings(
        rows.select(F.col("word").alias("name")).distinct(),
        DIM, seed="sgns42:out", normalize=False,
    )
    before = W2V.sgns_loss(rows, in0, out0)
    model = W2V.train_sgns(
        clique_pairs, dim=DIM, iterations=12, lr=0.5, training_rows=rows
    )
    after = W2V.sgns_loss(rows, model["in_emb"], model["out_emb"])
    assert after < before


def test_sgns_separates_cliques(spark, clique_pairs):
    model = W2V.train_sgns(clique_pairs, dim=DIM, iterations=25, lr=0.8, k_neg=3)
    vin = {r["name"]: np.array(r["vec"]) for r in model["in_emb"].collect()}
    vout = {r["name"]: np.array(r["vec"]) for r in model["out_emb"].collect()}
    within = np.mean([
        float(vin[c] @ vout[w])
        for c in vin for w in vout
        if c[0] == w[0] and c != w
    ])
    across = np.mean([
        float(vin[c] @ vout[w]) for c in vin for w in vout if c[0] != w[0]
    ])
    assert within > across


def test_training_rows_filter_true_pairs_and_are_deterministic(spark):
    pairs = _pairs(spark, [("x", "y"), ("x", "y"), ("y", "z")])
    a = sorted(map(tuple, W2V.sgns_training_rows(pairs.repartition(1), k_neg=4).collect()))
    b = sorted(map(tuple, W2V.sgns_training_rows(pairs.repartition(7), k_neg=4).collect()))
    assert a == b
    # a negative never reproduces its row's true context... the label-0
    # rows for center x must not pair x with y
    for c, w, lab in a:
        if lab == 0.0 and c == "x":
            assert w != "y"


def test_k_neg_zero_is_positives_only(spark):
    pairs = _pairs(spark, [("x", "y")])
    rows = W2V.sgns_training_rows(pairs, k_neg=0).collect()
    assert [(r["center"], r["word"], r["label"]) for r in rows] == [("x", "y", 1.0)]
    with pytest.raises(ValueError, match="k_neg"):
        W2V.sgns_training_rows(pairs, k_neg=-1)


def test_sgns_minibatch_matches_numpy_mirror(spark, clique_pairs):
    """n_shards=2: the per-shard sequential updates must match a numpy
    mirror that walks the same hash-disjoint shards in order."""
    from pyspark.sql import functions as F
    from naruhodo_spark.ops.kgembed import init_embeddings

    rows_df = W2V.sgns_training_rows(clique_pairs, k_neg=2).localCheckpoint()
    sharded = rows_df.withColumn(
        "shard",
        F.pmod(F.xxhash64(F.lit("sgns42"), "center", "word", "label"), F.lit(2)),
    )
    rows = [
        (r["center"], r["word"], r["label"], r["shard"])
        for r in sharded.collect()
    ]
    in0 = {
        r["name"]: r["vec"]
        for r in init_embeddings(
            rows_df.select(F.col("center").alias("name")).distinct(),
            DIM, seed="sgns42:in", normalize=False,
        ).collect()
    }
    out0 = {
        r["name"]: r["vec"]
        for r in init_embeddings(
            rows_df.select(F.col("word").alias("name")).distinct(),
            DIM, seed="sgns42:out", normalize=False,
        ).collect()
    }

    vin = {k: np.array(v, dtype=float) for k, v in in0.items()}
    vout = {k: np.array(v, dtype=float) for k, v in out0.items()}
    lr = 0.4
    for _ in range(2):                     # iterations
        for shard in (0, 1):               # shards in order
            gin, gout = {}, {}
            for c, w, label, s in rows:
                if s != shard:
                    continue
                sc = 1.0 / (1.0 + math.exp(-float(vin[c] @ vout[w])))
                g = sc - label
                gin.setdefault(c, []).append(g * vout[w])
                gout.setdefault(w, []).append(g * vin[c])
            for k, gs in gin.items():
                vin[k] = vin[k] - lr * np.mean(gs, axis=0)
            for k, gs in gout.items():
                vout[k] = vout[k] - lr * np.mean(gs, axis=0)

    model = W2V.train_sgns(
        clique_pairs, dim=DIM, iterations=2, lr=lr,
        training_rows=rows_df, n_shards=2,
    )
    got_in = {r["name"]: r["vec"] for r in model["in_emb"].collect()}
    for k in vin:
        assert got_in[k] == pytest.approx(list(vin[k]), abs=1e-9)


def test_sgns_bad_shards(spark, clique_pairs):
    with pytest.raises(ValueError, match="n_shards"):
        W2V.train_sgns(clique_pairs, n_shards=0)
