"""Hashed bag-of-words quality classifier — the fastText-style filter
of the GPT-3 / LLaMA data pipelines ("train a classifier to separate a
high-quality reference corpus from raw crawl, keep docs it scores
high"; Brown 2020 §A, Touvron 2023), complementing the CCNet
perplexity filter in ops/lm.py.

Model = logistic regression over hashing-trick token features. The
critical scale property: the MODEL IS A DATAFRAME — a (bucket, weight)
table bounded by the hash dimension (default 2^18 rows ≈ 2 MB), never
by the corpus or vocabulary. Training is full-batch gradient descent
where each iteration is:

    features ⋈ weights (bucket)   → per-token contribution
    groupBy doc_id sum            → logits
    ⋈ labels, sigmoid − y         → per-doc error (one narrow column)
    features ⋈ errors (doc_id)    → per-bucket gradient via groupBy sum

— four uniform-key shuffles per iteration, all map-side combinable, no
driver-side vectors, no per-row Python. Features are localCheckpointed
once and reused across iterations; the weights table is
localCheckpointed per round to truncate the iterative lineage (the
CC/PageRank loop discipline).

Determinism: hashing is xxhash64, init is zeros, full-batch GD has no
sampling — reruns agree to float-sum reassociation (~1e-12), pinned
against a pure-python mirror in tests/test_qualityclf.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_DIM = 1 << 18
_BIAS = -1  # bias term rides as a synthetic always-on bucket


def hashed_features(
    docs: DataFrame, dim: int = DEFAULT_DIM, text_col: str = "text"
) -> DataFrame:
    """(doc_id, bucket, x) — L1-normalized hashed token frequencies plus
    the bias bucket. Normalizing by doc length keeps long documents
    from dominating the gradient (fastText's mean-of-embeddings
    analog); empty/NULL docs keep their bias row so they score the
    prior instead of disappearing."""
    toks = docs.select(
        "doc_id",
        F.explode_outer(
            F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
        ).alias("tok"),
    ).where(F.col("tok") != "")
    counts = toks.groupBy(
        "doc_id", F.pmod(F.xxhash64("tok"), F.lit(int(dim))).alias("bucket")
    ).agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    totals = counts.groupBy("doc_id").agg(F.sum("cnt").alias("tot"))
    tf = counts.join(totals, "doc_id").select(
        "doc_id", "bucket", (F.col("cnt") / F.col("tot")).alias("x")
    )
    bias = docs.select(
        "doc_id", F.lit(_BIAS).cast("bigint").alias("bucket"),
        F.lit(1.0).alias("x"),
    )
    return tf.unionByName(bias)


def train_quality_classifier(
    docs: DataFrame,
    labels: DataFrame,
    dim: int = DEFAULT_DIM,
    iters: int = 30,
    lr: float = 2.0,
    reg: float = 1e-6,
    text_col: str = "text",
) -> DataFrame:
    """Fit the logistic model; returns the (bucket, weight) table.

    ``labels``: (doc_id, label) with label ∈ {0.0, 1.0} — 1 = the
    high-quality reference side (e.g. curated corpus), 0 = raw crawl.
    Docs without a label row are ignored for training (score them
    afterwards with :func:`score_quality`).
    """
    spark = docs.sparkSession
    # dedupe labels (max(label) — deterministic even when the same
    # doc_id carries CONFLICTING labels, where dropDuplicates would
    # pick a partitioning-dependent row and break the module's
    # determinism contract) and keep only labels whose doc exists: a
    # stale or superset label table would otherwise inflate the
    # gradient denominator (silent underfit), and duplicate label rows
    # would double-weight their doc via inner-join fan-out
    y = (
        labels.select("doc_id", F.col("label").cast("double").alias("y"))
        .groupBy("doc_id")
        .agg(F.max("y").alias("y"))
        .join(docs.select("doc_id"), "doc_id", "left_semi")
        .localCheckpoint()
    )
    feats = (
        hashed_features(docs, dim, text_col)
        .join(y.select("doc_id"), "doc_id", "left_semi")
        .localCheckpoint()
    )
    n = y.count()
    if n == 0:
        raise ValueError("no labeled documents to train on")
    weights = spark.createDataFrame([], "bucket bigint, weight double")
    for _ in range(int(iters)):
        logits = (
            feats.join(weights, "bucket", "left")
            .groupBy("doc_id")
            .agg(
                F.sum(F.col("x") * F.coalesce(F.col("weight"), F.lit(0.0)))
                .alias("logit")
            )
        )
        errs = logits.join(y, "doc_id").select(
            "doc_id",
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit"))) - F.col("y"))
            .alias("err"),
        )
        grad = (
            feats.join(errs, "doc_id")
            .groupBy("bucket")
            .agg((F.sum(F.col("x") * F.col("err")) / F.lit(float(n))).alias("g"))
        )
        weights = (
            weights.join(grad, "bucket", "full")
            .select(
                "bucket",
                (
                    F.coalesce(F.col("weight"), F.lit(0.0))
                    * (1.0 - float(lr) * float(reg))
                    - F.lit(float(lr)) * F.coalesce(F.col("g"), F.lit(0.0))
                ).alias("weight"),
            )
            .localCheckpoint()
        )
    return weights


def score_quality(
    docs: DataFrame,
    weights: DataFrame,
    dim: int = DEFAULT_DIM,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, quality_logit, p_good) for every input document — one
    features ⋈ weights join + one per-doc sum. The weights side is
    dim-bounded, so AQE broadcasts it at the default dim; pair with a
    threshold or the Pareto-style keep-probability the GPT-3 appendix
    uses."""
    feats = hashed_features(docs, dim, text_col)
    return (
        feats.join(weights, "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("x") * F.coalesce(F.col("weight"), F.lit(0.0)))
            .alias("quality_logit")
        )
        .select(
            "doc_id",
            "quality_logit",
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("quality_logit"))))
            .alias("p_good"),
        )
    )
