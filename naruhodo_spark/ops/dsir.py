"""DSIR-style data selection (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling", arXiv:2302.03169): score raw
documents by how target-like they are under hashed n-gram bag-of-words
models of a TARGET corpus vs the RAW corpus, then keep the high-scoring
fraction. The hashed feature space is a FIXED number of buckets, which
is the whole scale story: the fitted model is n_buckets rows no matter
how large either corpus is, so scoring is a broadcast map-side join —
no shuffle grows with the corpus except the uniform per-doc sum.

Determinism contract (same as the rest of the repo): buckets come from
md5 of the n-gram (engine-portable — a DuckDB/python mirror computes the
identical bucket), selection uses a quantile threshold rather than the
paper's Gumbel-noise resampling (documented deviation: no RNG, so the
kept set is resume-stable and repartition-invariant; the paper's noise
exists to diversify ties, which the md5 tie-break below provides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from naruhodo_spark.ops.textstats import _hash_bucket, md5_48, norm_text

N_BUCKETS = 8192


def _gram_bucket(gram, n_buckets: int, seed: str):
    return md5_48(F.concat(F.lit(seed + "|"), gram)) % n_buckets


def feature_buckets(
    docs: DataFrame, n_buckets: int = N_BUCKETS, seed: str = "dsir"
) -> DataFrame:
    """(doc_id, bucket): one row per unigram AND word-bigram occurrence
    (the paper's hashed n-gram featurization), bucket = md5(seed|gram) %
    n_buckets. Grams are built from k shifted array slices (the CSE-safe
    shingles pattern) — map-only, ≈2 rows per corpus token."""
    toks_col = F.split(norm_text(F.col("text")), r"\s+")
    base = docs.select("doc_id", toks_col.alias("toks"))
    m = F.greatest(F.size("toks") - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(F.col("toks"), 1, m),
        F.slice(F.col("toks"), 2, m),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    grams = base.select(
        "doc_id", F.explode(F.concat(F.col("toks"), bigrams)).alias("gram")
    ).where(F.col("gram") != "")
    return grams.select(
        "doc_id", _gram_bucket(F.col("gram"), n_buckets, seed).alias("bucket")
    )


def dsir_log_ratios(
    target: DataFrame,
    raw: DataFrame,
    n_buckets: int = N_BUCKETS,
    seed: str = "dsir",
) -> DataFrame:
    """Fit the importance model: per-bucket log(p_target / p_raw) with
    add-one smoothing over the n_buckets-cell simplex. The output is
    DENSE — exactly n_buckets rows (a spark.range spine left-joined with
    both count sides) — so every possible feature bucket carries its
    smoothed log ratio, including buckets unseen in either fitting
    corpus: scoring a NEW corpus then never silently drops a feature.
    Two uniform-key aggs down to ≤n_buckets rows each; the scalar totals
    ride 1-row broadcast crossJoins (the repo's standard pattern — no
    driver collect in the plan)."""

    def side(docs, name):
        cnt = (
            feature_buckets(docs, n_buckets, seed)
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(f"c_{name}"))
        )
        tot = cnt.agg(
            F.coalesce(F.sum(f"c_{name}"), F.lit(0)).alias(f"t_{name}")
        )
        return cnt, tot

    tc, tt = side(target, "t")
    rc, rt = side(raw, "r")
    spine = target.sparkSession.range(n_buckets).select(
        F.col("id").alias("bucket")
    )
    joined = (
        spine.join(tc, "bucket", "left")
        .join(rc, "bucket", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(rt))
    )
    smooth_t = (F.coalesce("c_t", F.lit(0)) + 1) / (F.col("t_t") + n_buckets)
    smooth_r = (F.coalesce("c_r", F.lit(0)) + 1) / (F.col("t_r") + n_buckets)
    return joined.select(
        "bucket", F.log(smooth_t / smooth_r).alias("log_ratio")
    )


def dsir_scores(
    docs: DataFrame,
    log_ratios: DataFrame,
    n_buckets: int = N_BUCKETS,
    seed: str = "dsir",
) -> DataFrame:
    """Score EVERY doc: sum of per-feature log ratios (the importance
    log-weight), plus the feature count. The model side is exactly
    n_buckets rows (dsir_log_ratios is dense) → explicit broadcast and
    the inner join can never drop a feature; scoring is map-side + one
    bounded groupBy(doc_id). Featureless docs score 0.0 with n_features
    0 (left join back — no silent deletion)."""
    feats = feature_buckets(docs, n_buckets, seed)
    scored = (
        feats.join(F.broadcast(log_ratios), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("log_ratio").alias("dsir_score"),
            F.count(F.lit(1)).alias("n_features"),
        )
    )
    return docs.select("doc_id").join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("dsir_score", F.lit(0.0)).alias("dsir_score"),
        F.coalesce("n_features", F.lit(0)).cast("int").alias("n_features"),
    )


def dsir_select(
    scored: DataFrame, rate: float, seed: str = "dsir-sel"
) -> DataFrame:
    """Keep ≈rate of docs, preferring high dsir_score: the threshold is
    the (1-rate) approx-quantile of the score (driver-side O(1) scalar —
    the paper's Gumbel top-k needs a global sort; a quantile cut is the
    shuffle-free equivalent at a fixed rate). Docs tied AT the threshold
    are rate-trimmed by the shared md5 bucketing at the RESIDUAL
    fraction — (rate·n − n_above) / n_at, not rate — so a plateaued
    score distribution (e.g. half the corpus at one score) still
    realizes ≈rate instead of over-keeping the whole tie class. Costs
    two driver-side scalar actions (quantile + one count agg), both
    O(1) in result size."""
    if not 0.0 < rate <= 1.0:
        raise ValueError(f"dsir_select: rate must be in (0, 1], got {rate}")
    if rate == 1.0:
        return scored
    q = scored.approxQuantile("dsir_score", [1.0 - rate], 0.001)
    if not q:  # empty input: nothing to threshold, nothing to keep
        return scored
    thr = q[0]
    row = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("dsir_score") > thr).cast("long")).alias("n_above"),
        F.sum((F.col("dsir_score") == thr).cast("long")).alias("n_at"),
    ).first()
    n, n_above, n_at = row["n"], row["n_above"] or 0, row["n_at"] or 0
    residual = max(0, int(round(rate * n)) - n_above)
    frac_at = min(1.0, residual / n_at) if n_at else 0.0
    above = F.col("dsir_score") > thr
    at = (F.col("dsir_score") == thr) & (
        _hash_bucket(seed) < F.lit(int(round(frac_at * 10000)))
    )
    return scored.where(above | at)
