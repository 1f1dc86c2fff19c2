"""Hearst-pattern hypernym extraction (Hearst, COLING 1992) — lexical
is-a patterns over raw sentence text, emitting (hyponym, is_a,
hypernym) candidate edges for the KG's taxonomy layer.

This is the textbook bootstrap for taxonomic edges a dependency-triple
extractor misses: "X such as A, B and C" asserts is_a(A..C, X) without
any verb triple. Patterns implemented (the four highest-precision of
Hearst's original six; token-level NPs — the chunker-grade NP
grammar lives in operators/chunk.py, this operator is deliberately
lexical so it runs on unparsed text):

- ``H such as L``            (P1)
- ``such H as L``            (P2)
- ``L and other H`` / ``L or other H``   (P3)
- ``H including L`` / ``H especially L`` (P4)

where H is one token and L is a comma/and/or-coordinated token list;
every list member yields one edge.

Execution shape: pure Catalyst — sentence split (explode), per-pattern
``regexp_extract_all`` with the H/L capture groups re-paired via
``arrays_zip`` (parallel group arrays, so MULTIPLE matches per
sentence all survive), list split + second explode. Map-only end to
end: zero shuffles, whole-stage codegen, trivially 10^12-doc
partitionable; the caller aggregates/dedups on (hyponym, hypernym)
downstream where a real shuffle is warranted.

The regex dialect is the RE2/Java common subset (no backrefs, no
lookbehind) so the driver's DuckDB oracle can run the IDENTICAL
patterns — queries.kg_hearst_hypernyms interpolates PATTERNS verbatim
into the SQL mirror.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# one token: letters/digits/underscore/hyphen (covers the synth corpus
# and TPC-H-ish names; swap for a chunker-fed NP column when parsed
# text is available)
_T = r"[A-Za-z0-9_-]+"
# coordinated list: "a, b, c and d" / "a or b" / bare "a"
_L = rf"{_T}(?:, {_T})*(?:,? (?:and|or) {_T})?"

# (pattern_id, regex, hypernym_group, list_group) — group numbers are
# per-regex; the list side is always split with _SPLIT afterwards.
PATTERNS: list[tuple[str, str, int, int]] = [
    ("such_as", rf"({_T}) such as ({_L})", 1, 2),
    ("such_h_as", rf"such ({_T}) as ({_L})", 1, 2),
    ("and_other", rf"({_L}),? (?:and|or) other ({_T})", 2, 1),
    ("including", rf"({_T}),? (?:including|especially) ({_L})", 1, 2),
]

# list-member separator (mirrors _L's joiners)
_SPLIT = r",? (?:and|or) |, "


def extract_hypernyms(
    docs: DataFrame, text_col: str = "text", doc_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, hyponym, pred='is_a', hypernym, pattern) — one row per
    coordinated list member per pattern match per sentence."""
    sents = docs.select(
        F.col(doc_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), r"[.!?]")).alias("sent"),
    )
    outs = []
    for pid, rx, hg, lg in PATTERNS:
        pairs = sents.select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.regexp_extract_all("sent", F.lit(rx), hg).alias("hyper"),
                    F.regexp_extract_all("sent", F.lit(rx), lg).alias("hypo_list"),
                )
            ).alias("m"),
        )
        outs.append(
            pairs.select(
                "doc_id",
                F.explode(F.split(F.col("m.hypo_list"), _SPLIT)).alias("hyponym"),
                F.lit("is_a").alias("pred"),
                F.col("m.hyper").alias("hypernym"),
                F.lit(pid).alias("pattern"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.where(
        (F.col("hyponym") != "") & (F.col("hypernym") != "")
    )


def taxonomy_edges(
    docs: DataFrame,
    min_count: int = 1,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """(hyponym, pred, hypernym, n_mentions, n_docs, patterns) — the
    aggregated taxonomy candidates: ONE uniform groupBy over the
    map-only extraction (map-side combinable; hot hypernyms like
    'country' are real Zipf skew the session's AQE skew handling
    absorbs). ``min_count`` gates low-evidence pairs."""
    cand = extract_hypernyms(docs, text_col=text_col, doc_col=doc_col)
    return (
        cand.groupBy("hyponym", "pred", "hypernym")
        .agg(
            F.count(F.lit(1)).alias("n_mentions"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.array_sort(F.collect_set("pattern")).alias("patterns"),
        )
        .where(F.col("n_mentions") >= min_count)
    )
