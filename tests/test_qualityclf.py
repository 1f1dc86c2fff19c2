"""Hashed-feature quality classifier (ops/qualityclf.py): exact
numpy mirror of the full-batch GD (same features, same update),
separation on a planted good/bad corpus, scoring of unlabeled and
empty documents."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from naruhodo_spark.ops import qualityclf as QC

DIM = 1 << 12  # small dim keeps the mirror dense-array cheap


def _corpus(spark):
    good_vocab = ["theorem", "analysis", "citation", "methodology",
                  "approach", "study", "we", "show", "results"]
    bad_vocab = ["click", "winner", "free", "casino", "xxx", "buy",
                 "now", "cheap", "pills"]
    shared = ["the", "and", "of"]
    rows = []
    for i in range(60):
        g = [good_vocab[(i + j) % len(good_vocab)] for j in range(6)]
        rows.append((f"good-{i}", " ".join(g + shared[: i % 3]), 1.0))
    for i in range(60):
        b = [bad_vocab[(i + 2 * j) % len(bad_vocab)] for j in range(6)]
        rows.append((f"bad-{i}", " ".join(b + shared[: i % 3]), 0.0))
    docs = spark.createDataFrame(
        [(d, t) for d, t, _ in rows], ["doc_id", "text"]
    )
    labels = spark.createDataFrame(
        [(d, y) for d, _, y in rows], ["doc_id", "label"]
    )
    return docs, labels


@pytest.fixture(scope="module")
def trained(spark):
    docs, labels = _corpus(spark)
    w = QC.train_quality_classifier(
        docs, labels, dim=DIM, iters=25, lr=2.0, reg=1e-6
    )
    return docs, labels, w


def test_separates_planted_corpus(spark, trained):
    docs, labels, w = trained
    scored = QC.score_quality(docs, w, dim=DIM).join(labels, "doc_id")
    rows = scored.collect()
    acc = np.mean([
        (r["p_good"] >= 0.5) == (r["label"] == 1.0) for r in rows
    ])
    assert acc >= 0.95, acc
    # an unseen doc made of good vocab scores higher than junk
    unseen = spark.createDataFrame(
        [("u-good", "we show results of the analysis"),
         ("u-bad", "click now free casino pills")],
        ["doc_id", "text"],
    )
    s = {r["doc_id"]: r["p_good"]
         for r in QC.score_quality(unseen, w, dim=DIM).collect()}
    assert s["u-good"] > 0.5 > s["u-bad"]


def test_gd_matches_numpy_mirror(spark, trained):
    docs, labels, w_spark = trained
    # identical features (Spark's own hashing) -> dense numpy matrix
    feats = QC.hashed_features(docs, dim=DIM).collect()
    y_map = {r["doc_id"]: r["label"] for r in labels.collect()}
    doc_ids = sorted(y_map)
    didx = {d: i for i, d in enumerate(doc_ids)}
    X = np.zeros((len(doc_ids), DIM + 1))  # col DIM = bias bucket -1
    for r in feats:
        col = DIM if r["bucket"] == QC._BIAS else r["bucket"]
        X[didx[r["doc_id"]], col] = r["x"]
    yv = np.array([y_map[d] for d in doc_ids])
    n, lr, reg = len(doc_ids), 2.0, 1e-6
    wv = np.zeros(DIM + 1)
    for _ in range(25):
        p = 1.0 / (1.0 + np.exp(-(X @ wv)))
        g = X.T @ (p - yv) / n
        wv = wv * (1.0 - lr * reg) - lr * g
    got = {r["bucket"]: r["weight"] for r in w_spark.collect()}
    for bucket, weight in got.items():
        col = DIM if bucket == QC._BIAS else bucket
        assert abs(weight - wv[col]) < 1e-9, (bucket, weight, wv[col])
    # every numpy-nonzero weight exists in the Spark table too
    nz = {i for i in np.nonzero(wv)[0]}
    have = {DIM if b == QC._BIAS else b for b in got}
    assert nz <= have


def test_empty_doc_scores_prior(spark, trained):
    _, _, w = trained
    empty = spark.createDataFrame(
        [("e1", ""), ("e2", None)], ["doc_id", "text"]
    )
    rows = QC.score_quality(empty, w, dim=DIM).collect()
    assert len(rows) == 2  # bias row keeps empty docs alive
    bias_w = {r["bucket"]: r["weight"] for r in w.collect()}.get(QC._BIAS, 0.0)
    prior = 1.0 / (1.0 + np.exp(-bias_w))
    for r in rows:
        assert abs(r["p_good"] - prior) < 1e-9


def test_labels_superset_and_duplicates_do_not_skew(spark):
    docs, labels = _corpus(spark)
    clean = QC.train_quality_classifier(
        docs, labels, dim=DIM, iters=5, lr=2.0
    ).collect()
    # stale superset (1000 labels with no doc) + duplicated rows
    import pyspark.sql.functions as F
    stale = spark.range(1000).select(
        F.concat(F.lit("ghost-"), F.col("id").cast("string")).alias("doc_id"),
        F.lit(1.0).alias("label"),
    )
    messy = labels.unionByName(labels).unionByName(stale)
    dirty = QC.train_quality_classifier(
        docs, messy, dim=DIM, iters=5, lr=2.0
    ).collect()
    w_clean = {r["bucket"]: r["weight"] for r in clean}
    w_dirty = {r["bucket"]: r["weight"] for r in dirty}
    assert set(w_clean) == set(w_dirty)
    for b, w in w_clean.items():
        assert abs(w - w_dirty[b]) < 1e-12, b


def test_conflicting_labels_resolve_deterministically(spark):
    docs, labels = _corpus(spark)
    # add a CONFLICTING label for one doc: max() must win, same as if
    # only the 1.0 row existed
    conflict = labels.unionByName(
        spark.createDataFrame([("bad-0", 1.0)], ["doc_id", "label"])
    )
    resolved = labels.withColumn(
        "label",
        F.when(F.col("doc_id") == "bad-0", 1.0).otherwise(F.col("label")),
    )
    w_c = {r["bucket"]: r["weight"] for r in QC.train_quality_classifier(
        docs, conflict, dim=DIM, iters=4, lr=2.0).collect()}
    w_r = {r["bucket"]: r["weight"] for r in QC.train_quality_classifier(
        docs, resolved, dim=DIM, iters=4, lr=2.0).collect()}
    assert set(w_c) == set(w_r)
    for b in w_c:
        assert abs(w_c[b] - w_r[b]) < 1e-12, b
