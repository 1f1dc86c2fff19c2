"""End-to-end training-corpus preparation — the composition a user of
the individual ops actually runs. Every stage is one of the oracled
operators from this package; the composition itself stays a single lazy
plan (no action until the caller writes/collects), so Catalyst prunes
columns and pushes filters across stage boundaries.

Stage order matters at scale and is the standard one:
1. redact FIRST (dedup must see scrubbed text so two docs differing only
   in a masked email still collapse);
2. dedup on the scrubbed text, keeping each group's representative;
3. cheap quality gates (length/distinct + repetition) AFTER dedup so the
   expensive LSH never runs on docs a filter would have kept anyway but
   duplicates inflate;
4. optional benchmark decontamination (ops/decontam.py) on the scrubbed
   survivors — after dedup so the broadcast n-gram join scans each
   surviving text once, before the split so no contaminated doc leaks
   into ANY split;
5. optional per-source quota (ops/textstats.source_quota) next — mix
   control belongs after every content filter so the cap reflects the
   corpus that will actually be trained on;
6. split LAST so train/val/test stay leak-free across near-duplicates
   (both members of a near-dup pair land in the same group, and the
   group representative carries the whole group into one split).

An optional model-based quality gate (ops/qualityclf.py) runs with the
cheap gates in stage 3: given a trained (bucket, weight) table, docs
scoring below ``quality_threshold`` are dropped and every survivor
carries ``p_good`` — the GPT-3 §A reference-vs-crawl filter slotted
into the standard pipeline order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from naruhodo_spark.ops import dedup as D
from naruhodo_spark.ops import textstats as TS


def prepare_corpus(
    docs: DataFrame,
    min_tokens: int = 8,
    max_top_bigram_frac: float = 0.5,
    train: float = 0.9,
    val: float = 0.05,
    bench: DataFrame | None = None,
    decontam_n: int = 13,
    source_cap: int | None = None,
    quality_weights: DataFrame | None = None,
    quality_threshold: float = 0.5,
    quality_dim: int | None = None,
) -> DataFrame:
    """documents(doc_id, text, …) → one row per SURVIVING doc:
    (doc_id, text_redacted, group_id, group_size, n_tokens,
    top_bigram_frac, split).

    Survivors are near-dup group representatives (min doc_id per group)
    that pass the token-count and repetition gates; `group_size` keeps
    the dedup multiplicity for loss-weighting schemes.

    Requires a ``source`` column on ``docs`` when ``source_cap`` is set
    (the per-source quota has nothing to key on otherwise), and NUMERIC
    doc_ids (near_dup_groups' group ids are bigint by contract)."""
    if source_cap is not None and "source" not in docs.columns:
        raise ValueError(
            "prepare_corpus(source_cap=...) requires a 'source' column on "
            f"the input; got columns {docs.columns}"
        )
    red = TS.redact_pii(docs).select(
        "doc_id", F.col("text_redacted").alias("text")
    ).localCheckpoint(eager=False)
    # lazy checkpoint: red fans out to 5 consumers (dedup, token counts,
    # repetition, split, final join) — without the barrier each branch
    # re-scans the input and re-runs the redaction regexes (the same
    # fan-out fix dedup.py applies to its shingle index)
    groups = D.near_dup_groups(red).localCheckpoint(eager=False)
    sizes = groups.groupBy("group_id").agg(F.count(F.lit(1)).alias("group_size"))
    reps = (
        groups.where(F.col("doc_id") == F.col("group_id"))
        .join(sizes, "group_id")
        .select("doc_id", "group_id", "group_size")
    )
    qual = TS.token_counts(red).select("doc_id", "n_tokens")
    rep_sc = TS.repetition_scores(red).select("doc_id", "top_bigram_frac")
    split = TS.hash_split(red, train=train, val=val)
    out = (
        red.join(reps, "doc_id")
        .join(qual, "doc_id")
        .join(rep_sc, "doc_id")
        .join(split, "doc_id")
        .where(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("top_bigram_frac") <= max_top_bigram_frac)
        )
    )
    extra_cols = []
    if quality_weights is not None:
        # model-based gate rides the scrubbed text (same content every
        # other stage sees); scoring is one join against the dim-bounded
        # weights table + one per-doc agg (ops/qualityclf.score_quality).
        # Scored frame = the SURVIVORS so far (out), not the full
        # pre-dedup corpus — on a dup-heavy crawl scoring red would
        # re-tokenize every duplicate the pipeline already discarded.
        from naruhodo_spark.ops import qualityclf as QC

        if quality_dim is None:
            # the weights table does not carry its training dim; a
            # silent fallback to the default would hash tokens into a
            # different bucket space than the model was trained on and
            # gate documents on sigmoid(bias + collision noise)
            raise ValueError(
                "prepare_corpus(quality_weights=...) requires quality_dim "
                "= the dim train_quality_classifier was called with"
            )
        scores = QC.score_quality(
            out.select("doc_id", "text"), quality_weights, dim=quality_dim
        ).select("doc_id", "p_good")
        out = out.join(scores, "doc_id").where(
            F.col("p_good") >= float(quality_threshold)
        )
        extra_cols = ["p_good"]
    out = out.select(
        "doc_id",
        F.col("text").alias("text_redacted"),
        "group_id",
        "group_size",
        "n_tokens",
        "top_bigram_frac",
        "split",
        *extra_cols,
    )
    if bench is not None:
        from naruhodo_spark.ops import decontam as DC

        # Redact the bench side with the SAME pass the corpus got —
        # decontam compares exact n-grams, so a benchmark window
        # overlapping a PII span (email/phone) could never match the
        # corpus's <EMAIL>/<NUM> placeholders if one side stayed raw.
        bench_red = bench.withColumn("text", TS.redact_text(F.col("text")))
        out = out.withColumnRenamed("text_redacted", "text")
        out = DC.decontaminate(out, bench_red, n=decontam_n).withColumnRenamed(
            "text", "text_redacted"
        )
    if source_cap is not None:
        # quota needs the source column back (the survivors projection
        # dropped it); join from the input on doc_id, cap, then re-prune
        out = (
            TS.source_quota(
                out.join(docs.select("doc_id", "source"), "doc_id"),
                cap=source_cap,
            ).drop("source")
        )
    return out
