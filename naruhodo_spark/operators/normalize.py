"""O7 text normalization + O8 sentence split — pure Catalyst expressions.

Reference behavior: ``parser._preprocessText`` strips newlines/spaces,
normalizes width, drops bracketed spans, then splits on 。！？
[PK naruhodo/parser.py]. Here both are Catalyst expressions so they stay
inside whole-stage codegen: no Python touches a row until the chunker.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Bracketed spans the reference removes (ASCII + CJK brackets).
_BRACKET_RE = r"(《[^》]*》|【[^】]*】|（[^）]*）|\([^)]*\)|\[[^\]]*\])"

# Characters-per-sentence-ordinal stride: sent_id = span_pos * STRIDE +
# sent_pos keeps a strictly increasing per-document sentence ordinal
# without a window shuffle (documents are bounded well under STRIDE
# sentences per span).
SENT_STRIDE = 1000


def clean_text(col: Column, lowercase: bool = True) -> Column:
    """Reference `_preprocessText` analog [PK naruhodo/parser.py]."""
    c = F.regexp_replace(col, _BRACKET_RE, "")
    c = F.regexp_replace(c, r"[\n\r\t]+", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    c = F.trim(c)
    return F.lower(c) if lowercase else c


def flat_to_spans(flat_docs: DataFrame) -> DataFrame:
    """Lift the flat testdata ``documents`` table (doc_id:int64, text, …)
    into the normative spans shape [B BASELINE.json:15]: one text span at
    offset 0 (SURVEY.md §5.3)."""
    return flat_docs.select(
        F.format_string("doc-%06d", F.col("doc_id")).alias("doc_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("text").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            )
        ).alias("spans"),
    )


def split_sentences(docs_spans: DataFrame, profile: dict) -> DataFrame:
    """spans → (doc_id, sent_id, sentence) rows.

    Media spans (kind='media') are *not* projected into the NLP path —
    they pass through untouched on the original table, which is how the
    span-sequence invariant holds [B BASELINE.json:15] (SURVEY.md O22).

    sent_id = span_pos * SENT_STRIDE + sent_pos: strictly increasing in
    document order with zero shuffles (vs a row_number window).

    Document order is OFFSET order, not storage order (same rule as
    span_sequences): the text spans are offset-sorted before position
    numbering, so sent_id div SENT_STRIDE is the text-span ordinal every
    downstream consumer (media adjacency, DSG ids) can rely on even when
    a writer stored the spans array out of order.
    """
    lowercase = profile.get("lang") != "ja"
    text_spans = F.array_sort(
        F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("text")),
        lambda a, b: F.when(a["offset"] < b["offset"], -1)
        .when(a["offset"] > b["offset"], 1)
        .otherwise(0),
    )
    return (
        docs_spans.select(
            "doc_id", F.posexplode(text_spans).alias("span_pos", "span")
        )
        .select(
            "doc_id",
            "span_pos",
            F.posexplode(
                F.split(
                    clean_text(F.col("span.text"), lowercase),
                    profile["sentence_re"],
                )
            ).alias("sent_pos", "sentence"),
        )
        .withColumn("sentence", F.trim("sentence"))
        .where(F.col("sentence") != "")
        .select(
            "doc_id",
            (F.col("span_pos") * SENT_STRIDE + F.col("sent_pos"))
            .cast("int")
            .alias("sent_id"),
            "sentence",
        )
    )


def span_sequences(docs_spans: DataFrame) -> DataFrame:
    """Per-doc ordered (kind, text, media_ref) sequence — the exact-equality
    invariant surface [B BASELINE.json:15]. ``array_sort`` on offset makes
    the ordering explicit rather than relying on array layout."""
    ordered = F.array_sort(
        F.transform(
            F.col("spans"),
            lambda s: F.struct(
                s["offset"].alias("offset"),
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
            ),
        )
    )
    return docs_spans.select(
        "doc_id",
        F.transform(
            ordered,
            lambda s: F.struct(
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
            ),
        ).alias("span_seq"),
    )
