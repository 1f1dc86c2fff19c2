"""Distributed n-gram language-model perplexity scoring — the CCNet
quality-filter shape (Wenzek et al. 2020, "CCNet: Extracting High
Quality Monolingual Datasets from Web Crawl Data", arXiv:1911.00359:
score web documents by the perplexity of an LM trained on a trusted
corpus, then bucket head/middle/tail). The smoothing is Stupid Backoff
(Brants et al. 2007, "Large Language Models in Machine Translation" —
the original MapReduce-scale LM estimation paper): s(w|ctx) =
count(ctx·w)/count(ctx) when seen, else α·s(w|shorter ctx), terminating
in the unigram relative frequency; α = 0.4 as published. Scores are not
normalized probabilities — Brants' point is that at corpus scale the
ranking quality survives dropping the expensive Kneser-Ney normalization,
which is exactly the trade an engine makes at 100 TB.

Scale shape: the MODEL is a (gram, order, count) table — distributed,
never collected, never required to fit in a broadcast (at web scale an
n-gram table is itself billions of rows; every use below is a uniform
equi-join on the gram string that AQE may broadcast when the fitted
corpus is small). FITTING is one map-only gram explode + one uniform-key
groupBy per order. SCORING explodes the target corpus to one row per
token position, joins the count table once per backoff level (2n−1
uniform equi-joins for an order-n model — bounded, corpus-sized left
side, no Python anywhere), and aggregates one row per doc. Determinism:
pure counting + arithmetic, no RNG, repartition-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from naruhodo_spark.ops.textstats import norm_text

BOS = "<s>"
EOS = "</s>"
ALPHA = 0.4
DEFAULT_N = 3


def _tok_arrays(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, toks): normalized tokens padded with n−1 BOS markers and
    one EOS — every real token AND the end-of-document event get scored
    with a full-width context."""
    toks = F.filter(
        F.split(norm_text(F.col("text")), r"\s+"), lambda t: t != ""
    )
    pad = F.array(*[F.lit(BOS) for _ in range(n - 1)])
    return docs.select(
        "doc_id",
        F.concat(pad, toks, F.array(F.lit(EOS))).alias("toks"),
    )


def _gram_col(k: int, end_offset: int = 0):
    """Space-joined k-gram ENDING at scoring position `pos` (shifted
    left by end_offset): built from the materialized toks column with
    slice — 1-based Spark slice indexing."""
    start = F.col("pos") + 2 - k - end_offset  # pos is 0-based
    return F.array_join(F.slice(F.col("toks"), start, k), " ")


def ngram_counts(docs: DataFrame, n: int = DEFAULT_N) -> DataFrame:
    """Fit the model: (gram, order, count) for every order 1..n over
    the BOS/EOS-padded token stream. One shifted-slice zip per order
    (map-only, the shingles CSE-safe pattern), one uniform-key groupBy
    each, unioned. Total rows ≤ n × corpus tokens before reduction."""
    base = _tok_arrays(docs, n).localCheckpoint(eager=False)
    legs = []
    for k in range(1, n + 1):
        m = F.greatest(F.size("toks") - (k - 1), F.lit(0))
        sh = F.slice(F.col("toks"), 1, m)
        for j in range(1, k):
            sh = F.zip_with(
                sh,
                F.slice(F.col("toks"), j + 1, m),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        legs.append(
            base.select(F.explode(sh).alias("gram")).select(
                "gram", F.lit(k).alias("order")
            )
        )
    grams = legs[0]
    for leg in legs[1:]:
        grams = grams.unionByName(leg)
    return grams.groupBy("gram", "order").agg(
        F.count(F.lit(1)).alias("count")
    )


def perplexity_scores(
    docs: DataFrame,
    model: DataFrame,
    n: int = DEFAULT_N,
    alpha: float = ALPHA,
) -> DataFrame:
    """(doc_id, n_scored, log10_ppl, ppl): Stupid-Backoff per-token
    scores averaged per document. Positions n−1 … len−1 of the padded
    stream are scored (every real token plus EOS; a fully-empty doc
    scores its EOS event, so no row is silently dropped).

    Backoff chain per position, highest order first:
      count(g_k)/count(ctx_k) if count(g_k) > 0, else α·(next level),
    ending at count(g_1)/total, with a documented OOV floor of
    α^(n−1)/total for words the fitted corpus never saw. One uniform
    equi-join per needed key (grams g_1..g_n and contexts ctx_2..ctx_n =
    2n−1 joins); the model side is never forced into a broadcast.

    Docs with NULL text cannot be scored (no token stream, not even
    EOS): they keep their row with n_scored=0 and NULL log10_ppl/ppl —
    NOT a coalesced 0.0, which would hand junk rows the best possible
    perplexity and defeat the filter."""
    # materialize the model once: 2n−1 joins + the total each push a
    # different order==k filter through the lazy fit pipeline, which
    # would re-run the corpus-scale explode+groupBy per join (the
    # cc_labels_auto re-evaluation lesson, operators/canon.py r03)
    model = model.localCheckpoint(eager=False)
    total_row = model.where(F.col("order") == 1).agg(
        F.sum("count").cast("double").alias("lm_total")
    )
    base = _tok_arrays(docs, n)
    pos = base.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(n - 1), F.size("toks") - 1)
        ).alias("pos"),
    )
    keyed = pos.select(
        "doc_id",
        "pos",
        *[_gram_col(k).alias(f"g{k}") for k in range(1, n + 1)],
        *[_gram_col(k - 1, 1).alias(f"ctx{k}") for k in range(2, n + 1)],
    )
    for k in range(1, n + 1):
        cnt = model.where(F.col("order") == k).select(
            F.col("gram").alias(f"g{k}"), F.col("count").alias(f"c{k}")
        )
        keyed = keyed.join(cnt, f"g{k}", "left")
    for k in range(2, n + 1):
        ctx = model.where(F.col("order") == k - 1).select(
            F.col("gram").alias(f"ctx{k}"), F.col("count").alias(f"x{k}")
        )
        keyed = keyed.join(ctx, f"ctx{k}", "left")
    keyed = keyed.crossJoin(F.broadcast(total_row))  # 1-row scalar ride

    score = (F.col("c1") / F.col("lm_total")) * (alpha ** (n - 1))
    score = F.coalesce(score, F.lit(alpha ** (n - 1)) / F.col("lm_total"))
    for k in range(2, n + 1):
        level = (F.col(f"c{k}") / F.col(f"x{k}")) * (alpha ** (n - k))
        score = F.when(
            F.col(f"c{k}").isNotNull() & F.col(f"x{k}").isNotNull(), level
        ).otherwise(score)
    scored = keyed.select("doc_id", F.log10(score).alias("lp"))
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_scored"),
        (-F.avg("lp")).alias("log10_ppl"),
    )
    return docs.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_scored", F.lit(0)).alias("n_scored"),
        F.round("log10_ppl", 4).alias("log10_ppl"),
        F.round(F.pow(F.lit(10.0), F.col("log10_ppl")), 4).alias("ppl"),
    )


def perplexity_buckets(
    scored: DataFrame,
    cuts: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
) -> DataFrame:
    """CCNet's head/middle/tail labeling: two approx-quantile cuts over
    log10_ppl (driver-side O(1) scalars), label by comparison — lowest
    perplexity (most target-like) is "head". Unscoreable docs (NULL
    log10_ppl, i.e. NULL text) go to "tail": a quality filter must
    fail-closed on rows it cannot score. Deterministic given the
    scores; no sort, no shuffle beyond what scoring already did."""
    lo, hi = scored.approxQuantile("log10_ppl", list(cuts), 0.001) or [
        0.0,
        0.0,
    ]
    return scored.withColumn(
        "ppl_bucket",
        F.when(F.col("log10_ppl").isNull(), "tail")
        .when(F.col("log10_ppl") <= lo, "head")
        .when(F.col("log10_ppl") <= hi, "middle")
        .otherwise("tail"),
    )
