"""Benchmark decontamination: flag training documents that overlap an
evaluation set by any shared n-gram (the GPT-3 / PaLM / Gopher
"13-gram" protocol — Brown et al. 2020 §C, Rae et al. 2021 §A.4).

Plan shape at 100 TB:

- the benchmark side is SMALL by construction (eval suites are
  thousands of documents) → its distinct n-gram hash set is built once
  and **broadcast**; the 100 TB training side streams through a
  map-only stage (normalize → token array → shifted-slice n-grams →
  xxhash64) and a broadcast hash semi-join — NO shuffle of corpus data;
- the only shuffle is the final per-doc match-count aggregation, which
  has map-side partial aggregation on uniform doc_id keys;
- n-grams are compared as xxhash64 of the space-joined window (64-bit
  collisions at eval-suite scale: negligible, and collisions only
  OVER-flag — the safe direction for decontamination).

Normalization matches ops/textstats.norm_text (lowercase, whitespace
collapse) so quality / dedup / decontamination all agree on tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from naruhodo_spark.ops.textstats import norm_text


def _ngram_hashes(toks_col, n: int):
    """xxhash64 per n-token window over a MATERIALIZED token-array
    column. ``toks_col`` must be a bound column (withColumn), never an
    inlined split expression: Catalyst does no common-subexpression
    elimination inside HOF lambdas, so an inlined ``split(norm_text(…))``
    re-normalizes and re-splits the whole document PER WINDOW — O(T²)
    per doc (measured 4 s for 250k windows at sf0.1; ~40× faster with
    the column bound; same pitfall ops/textstats.chunk_windows
    documents)."""
    n_windows = F.size(toks_col) - F.lit(n - 1)
    # sequence(1, 0) counts DOWN in Spark (step defaults to -1 when
    # stop < start) — short docs must yield an empty array, not [1, 0]
    return F.when(
        n_windows >= 1,
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda i: F.xxhash64(F.array_join(F.slice(toks_col, i, n), " ")),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def _exploded_ngrams(df: DataFrame, n: int, keep: list[str]):
    """df(text, …) → keep-columns + one ``ngram_hash`` row per window."""
    return (
        df.withColumn("_toks", F.split(norm_text(F.col("text")), " "))
        .select(
            *keep, F.explode(_ngram_hashes(F.col("_toks"), n)).alias("ngram_hash")
        )
    )


def benchmark_ngram_hashes(bench: DataFrame, n: int = 13) -> DataFrame:
    """Distinct n-gram hashes of the eval set → (ngram_hash). Small by
    contract; callers broadcast it."""
    return _exploded_ngrams(bench, n, keep=[]).distinct()


def contamination_flags(
    docs: DataFrame, bench: DataFrame, n: int = 13
) -> DataFrame:
    """(doc_id, n_matches, contaminated) for EVERY training doc.

    n_matches counts matching n-gram POSITIONS in the doc (a benchmark
    n-gram occurring twice counts twice); contaminated = n_matches > 0.
    Docs shorter than n tokens cannot match and come back with 0.
    """
    bset = F.broadcast(benchmark_ngram_hashes(bench, n))
    doc_grams = _exploded_ngrams(docs, n, keep=["doc_id"])
    matches = (
        doc_grams.join(bset, "ngram_hash", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )
    return (
        docs.select("doc_id")
        .join(matches, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
            (F.coalesce("n_matches", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate(docs: DataFrame, bench: DataFrame, n: int = 13) -> DataFrame:
    """The filter form: training docs with every contaminated doc
    removed — an anti-join composition of contamination_flags, kept as
    one lazy plan."""
    flags = contamination_flags(docs, bench, n)
    return docs.join(
        flags.where(F.col("contaminated")).select("doc_id"),
        "doc_id",
        "left_anti",
    )
