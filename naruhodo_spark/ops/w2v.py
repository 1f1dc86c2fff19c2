"""Distributed skip-gram-with-negative-sampling (SGNS, Mikolov et al.,
NeurIPS 2013) over (center, context) pair corpora — the trainer that
turns DeepWalk/node2vec walk pairs (ops/walks.py) into node embeddings,
and token co-occurrence pairs into word vectors, entirely on the
cluster (a 10^9-node vocabulary never fits a driver).

Model state = two DataFrames: ``in_emb(name, vec array<double>)`` for
center vectors and ``out_emb(name, vec)`` for context vectors — the
standard two-matrix SGNS factorization. One full-batch iteration
compiles to a fixed, driver-free plan:

    rows ⋈ in_emb ⋈ out_emb      (2 uniform equi-joins on name)
    g = σ(u·v) − label           (F.aggregate dot product, JVM-side)
    per-name gradients           (union of 2 slot frames → ONE groupBy
                                  with d element-wise F.avg aggs)
    update                       (left join + HOF arithmetic)

The ops/kgembed.py trainer discipline applies verbatim: mean (not
summed) per-name gradients keep a hub word's step O(lr) regardless of
frequency; `_truncate` per iteration resets Catalyst stats so planning
cost stays constant across rounds; superseded checkpoints release
eagerly. Negatives reuse the kgtrain hash-bucket pick (uniform
equi-join on ~32-candidate buckets, no global sort) against the
CONTEXT vocabulary, with true-pair filtering — and everything derives
from xxhash64 of row content, so the sample and init are resume-stable
and repartition-invariant. Exact numpy mirror in tests/test_w2v.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from naruhodo_spark.ops.kgembed import (
    DIM,
    _grad_mean,
    _release,
    _truncate,
    _vscale,
    init_embeddings,
)


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )


def _sigmoid(x):
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-x))


def sgns_training_rows(
    pairs: DataFrame,
    k_neg: int = 3,
    seed: str = "sgns42",
    bucket_target: int = 32,
) -> DataFrame:
    """(center, word, label) — every positive (center, context) pair
    with label 1.0 plus up to ``k_neg`` hash-picked negatives with
    label 0.0 drawn from the context vocabulary (kgtrain's bucket-join
    shape: uniform keys, ~bucket_target candidates per pick, no global
    sort). A negative that reproduces the row's true context is
    dropped (filtered sampling), so a pair can yield slightly fewer
    than k_neg negatives — never a wrong label.

    ``pairs``: (center, context) string columns; parallel duplicates
    are legitimate training weight and are kept.
    """
    if k_neg < 0:
        raise ValueError(f"k_neg must be >= 0, got {k_neg}")
    pos = pairs.select(
        "center", F.col("context").alias("word"), F.lit(1.0).alias("label")
    )
    if k_neg == 0:
        return pos
    vocab = pairs.select(F.col("context").alias("cand")).distinct().localCheckpoint()
    n = vocab.count()
    if n == 0:
        return pos
    nb = max(1, n // bucket_target)
    vocab_b = vocab.withColumn(
        "bucket", F.pmod(F.xxhash64(F.lit(seed), "cand"), F.lit(nb))
    )
    # pair_uid disambiguates duplicate (center, context) rows so each
    # occurrence draws its own negatives — derived from a groupBy count
    # + sequence explode, NOT monotonically_increasing_id (which is
    # partition-dependent and would break the module's determinism /
    # repartition-invariance contract)
    numbered = (
        pairs.groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n_dup"))
        .select(
            "center", "context",
            F.explode(F.sequence(F.lit(1), F.col("n_dup"))).alias("pair_uid"),
        )
    )
    draws = numbered.select(
        "center", "context", "pair_uid",
        F.explode(F.sequence(F.lit(0), F.lit(k_neg - 1))).alias("neg_i"),
    ).withColumn(
        "bucket",
        F.pmod(
            F.xxhash64(F.lit(seed), "center", "context", "pair_uid", "neg_i"),
            F.lit(nb),
        ),
    )
    # pair_uid participates in the pick: without it, duplicate pairs
    # whose draws land in the same bucket would select the identical
    # negative, defeating the per-occurrence draw
    pick = F.xxhash64(
        F.lit(seed), "cand", "center", "context", "pair_uid", "neg_i"
    )
    negs = (
        draws.join(vocab_b, "bucket")
        .groupBy("center", "context", "pair_uid", "neg_i")
        .agg(F.min_by("cand", pick).alias("word"))
        .where(F.col("word") != F.col("context"))
        .select("center", "word", F.lit(0.0).alias("label"))
    )
    return pos.unionByName(negs)


def train_sgns(
    pairs: DataFrame,
    dim: int = DIM,
    iterations: int = 10,
    lr: float = 0.5,
    k_neg: int = 3,
    seed: str = "sgns42",
    training_rows: "DataFrame | None" = None,
    n_shards: int = 1,
) -> dict:
    """SGNS gradient descent → {'in_emb', 'out_emb'} (name, vec)
    DataFrames. ``pairs``: (center, context).

    Per step, for each row with score s = σ(v_center·u_word) and
    g = s − label:  v_center −= lr·mean(g·u_word),
    u_word −= lr·mean(g·v_center) — simultaneous update from the same
    step's model (classic GD, exactly mirrorable).
    ``training_rows`` overrides the (center, word, label) frame (the
    mirror test injects the collected sample; production callers leave
    it None).

    ``n_shards`` > 1 is mini-batch SGD, the 10^12-pair batch size
    (train_transe's protocol verbatim): each iteration walks the
    hash-disjoint row shards in order, one model update per shard —
    n_shards updates per data pass, per-step join volume |rows|/n_shards.
    Sharding is xxhash64 of the full row content: deterministic,
    partition-invariant, every row in exactly one shard.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    rows = (
        training_rows
        if training_rows is not None
        else sgns_training_rows(pairs, k_neg=k_neg, seed=seed)
    ).localCheckpoint()
    if n_shards > 1:
        rows = rows.withColumn(
            "shard",
            F.pmod(
                F.xxhash64(F.lit(seed), "center", "word", "label"),
                F.lit(int(n_shards)),
            ),
        )
    in_emb = _truncate(
        init_embeddings(
            rows.select(F.col("center").alias("name")).distinct(),
            dim, seed=f"{seed}:in", normalize=False,
        )
    )
    out_emb = _truncate(
        init_embeddings(
            rows.select(F.col("word").alias("name")).distinct(),
            dim, seed=f"{seed}:out", normalize=False,
        )
    )
    steps = [
        (i, s) for i in range(int(iterations)) for s in range(int(n_shards))
    ]
    for _i, shard in steps:
        batch = rows.where(F.col("shard") == shard) if n_shards > 1 else rows
        j = (
            batch.join(
                in_emb.select(F.col("name").alias("center"),
                              F.col("vec").alias("cv")),
                "center",
            )
            .join(
                out_emb.select(F.col("name").alias("word"),
                               F.col("vec").alias("wv")),
                "word",
            )
            .withColumn("g", _sigmoid(_dot(F.col("cv"), F.col("wv"))) - F.col("label"))
        )
        gin = _grad_mean(
            j.select(
                F.col("center").alias("name"),
                _vscale(F.col("wv"), F.col("g")).alias("g"),
            ),
            dim,
        )
        gout = _grad_mean(
            j.select(
                F.col("word").alias("name"),
                _vscale(F.col("cv"), F.col("g")).alias("g"),
            ),
            dim,
        )
        nxt_in = _truncate(
            in_emb.join(gin, "name", "left").select(
                "name",
                F.when(
                    F.col("g").isNotNull(),
                    F.zip_with("vec", "g", lambda v, g: v - F.lit(lr) * g),
                ).otherwise(F.col("vec")).alias("vec"),
            )
        )
        nxt_out = _truncate(
            out_emb.join(gout, "name", "left").select(
                "name",
                F.when(
                    F.col("g").isNotNull(),
                    F.zip_with("vec", "g", lambda v, g: v - F.lit(lr) * g),
                ).otherwise(F.col("vec")).alias("vec"),
            )
        )
        _release(in_emb)
        _release(out_emb)
        in_emb, out_emb = nxt_in, nxt_out
    return {"in_emb": in_emb, "out_emb": out_emb}


def sgns_loss(rows: DataFrame, in_emb: DataFrame, out_emb: DataFrame) -> float:
    """Full-corpus negative log likelihood
    −Σ [label·log σ(s) + (1−label)·log σ(−s)] — the convergence metric;
    one forward pass, values never leave the executors."""
    j = (
        rows.join(
            in_emb.select(F.col("name").alias("center"), F.col("vec").alias("cv")),
            "center",
        )
        .join(
            out_emb.select(F.col("name").alias("word"), F.col("vec").alias("wv")),
            "word",
        )
        .withColumn("s", _dot(F.col("cv"), F.col("wv")))
    )
    # numerically safe: log σ(s) = −log(1+e^−s), with the exponent
    # clamped to ±30 (beyond that the term is exact to 1e-13 anyway and
    # an unclamped e^709 overflows to inf — uselessly — exactly when a
    # diverging run most needs a finite loss readout)
    s_c = F.greatest(F.lit(-30.0), F.least(F.lit(30.0), F.col("s")))
    nll = F.when(
        F.col("label") > 0.5, F.log(F.lit(1.0) + F.exp(-s_c))
    ).otherwise(F.log(F.lit(1.0) + F.exp(s_c)))
    out = j.agg(F.sum(nll).alias("loss")).head()[0]
    return float(out or 0.0)
