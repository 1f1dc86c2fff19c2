"""KG → text verbalization (KELM-style, Agarwal et al. NAACL 2021):
render knowledge-graph triples back into natural-language training
sentences, so the curated KG feeds LM pretraining alongside the raw
corpus — the loop-closing op of a KG+corpus engine (Agarwal et al.
report verbalized Wikidata improving LM factuality when mixed in).

The reference's users do this driver-side over the exported networkx
graph; here it is two aggregations:

1. per-triple sentence rendering — pure Catalyst string expressions
   honoring the edge flags the extractor recorded (negation → "does
   not", passivity → "is ... by", objectless triples verbalize the
   bare predicate);
2. per-subject grouping — one groupBy(subj) with a sort_array over
   (pred, obj) collect_list, so each entity yields ONE deterministic
   paragraph regardless of partitioning (KELM groups by Wikidata
   entity the same way).

Scale shape: one uniform shuffle on subj; paragraph size is bounded by
an explicit per-entity cap with an audit column (hub entities would
otherwise build unbounded strings — the no-silent-caps policy:
``n_facts``/``n_facts_kept`` make the truncation observable). Output
is documents-shaped (doc_id, text), so every downstream corpus op
(dedup, quality, packing, mixing) consumes it unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _clause(subj, pred, obj, negative, passive):
    """One rendered clause. Templates are deliberately simple and
    deterministic (the KELM paper fine-tunes a T5 verbalizer; the
    template form is its ablation baseline and the only dependency-free
    option here)."""
    base_np = F.concat(subj, F.lit(" "), pred, F.lit(" "), obj)
    neg_np = F.concat(subj, F.lit(" does not "), pred, F.lit(" "), obj)
    base_p = F.concat(subj, F.lit(" is "), pred, F.lit(" by "), obj)
    neg_p = F.concat(subj, F.lit(" is not "), pred, F.lit(" by "), obj)
    base_obj0 = F.concat(subj, F.lit(" "), pred)
    neg_obj0 = F.concat(subj, F.lit(" does not "), pred)
    has_obj = obj != ""
    return (
        F.when(passive & negative & has_obj, neg_p)
        .when(passive & has_obj, base_p)
        .when(negative & has_obj, neg_np)
        .when(has_obj, base_np)
        .when(negative, neg_obj0)
        .otherwise(base_obj0)
    )


def verbalize_triples(
    ksg_edges: DataFrame, max_facts: int = 50
) -> DataFrame:
    """(doc_id, text, n_facts, n_facts_kept) — one synthetic document
    per subject entity: its facts rendered as clauses, sorted by
    (pred, obj) for partition-invariant output, joined with ". ".
    ``doc_id`` is ``kg:<subj>`` (resume-stable, content-derived like
    every id in this repo). Facts beyond ``max_facts`` per entity are
    dropped deterministically (lexicographic order) and the audit
    columns record how many."""
    neg = (
        F.col("negative")
        if "negative" in ksg_edges.columns
        else F.lit(False)
    )
    pas = (
        F.col("passive") if "passive" in ksg_edges.columns else F.lit(False)
    )
    clauses = ksg_edges.select(
        F.col("subj"),
        F.struct(
            F.col("pred"),
            F.col("obj"),
            _clause(F.col("subj"), F.col("pred"), F.col("obj"), neg, pas)
            .alias("clause"),
        ).alias("fact"),
    )
    grouped = clauses.groupBy("subj").agg(
        F.sort_array(F.collect_list("fact")).alias("facts")
    )
    kept = F.slice(F.col("facts"), 1, int(max_facts))
    return grouped.select(
        F.concat(F.lit("kg:"), F.col("subj")).alias("doc_id"),
        F.concat(
            F.array_join(
                F.transform(kept, lambda f: f["clause"]), ". "
            ),
            F.lit("."),
        ).alias("text"),
        F.size("facts").alias("n_facts"),
        F.least(F.size("facts"), F.lit(int(max_facts))).alias("n_facts_kept"),
    )


def qa_pairs(
    ksg_edges: DataFrame,
    max_distractors: int = 0,
    seed: str = "qa42",
) -> DataFrame:
    """(question, answer, subj, pred, obj, direction) — template QA
    training rows from KG triples (the KELM-adjacent SFT shape; KGQA
    datasets like WebQSP/SimpleQuestions are exactly single-triple
    questions). Two directions per objectful triple:

    - forward:  "What does <subj> <pred>?"       → <obj>
    - backward: "What <pred> <obj>?"             → <subj>
      (passive edges render "What is <pred> by <obj>?" forward and
      "What does <subj> ... ?" accordingly; negated triples are
      SKIPPED — "what does X not eat" invites hallucinated answers)

    Deterministic, pure Catalyst string templates — one map-only pass,
    no shuffle; downstream corpus ops (dedup/mix/pack) consume the
    question/answer columns unchanged.

    ``max_distractors`` > 0 appends hash-picked wrong answers from the
    same predicate's object vocabulary (multiple-choice form) — one
    bounded groupBy per predicate + a broadcastable join; a predicate
    with fewer distinct objects than requested yields fewer
    distractors (never a duplicate of the answer).
    """
    # same column-presence guard as verbalize_triples (ADVICE r04: the
    # two ops share the ksg_edges input contract, so edge frames without
    # the optional flag columns must verbalize, not AnalysisException)
    for flag in ("negative", "passive"):
        if flag not in ksg_edges.columns:
            ksg_edges = ksg_edges.withColumn(flag, F.lit(False))
    base = ksg_edges.where(
        F.col("obj").isNotNull() & (F.col("obj") != "")
        & ~F.col("negative")
    )
    fwd_q = F.when(
        F.col("passive"),
        F.concat(F.lit("What is "), F.col("pred"), F.lit(" by "),
                 F.col("obj"), F.lit("?")),
    ).otherwise(
        F.concat(F.lit("What does "), F.col("subj"), F.lit(" "),
                 F.col("pred"), F.lit("?"))
    )
    fwd_a = F.when(F.col("passive"), F.col("subj")).otherwise(F.col("obj"))
    bwd_q = F.when(
        F.col("passive"),
        F.concat(F.lit("What does "), F.col("subj"), F.lit(" "),
                 F.col("pred"), F.lit("?")),
    ).otherwise(
        F.concat(F.lit("What "), F.col("pred"), F.lit(" "),
                 F.col("obj"), F.lit("?"))
    )
    bwd_a = F.when(F.col("passive"), F.col("obj")).otherwise(F.col("subj"))
    out = base.select(
        fwd_q.alias("question"), fwd_a.alias("answer"),
        "subj", "pred", "obj", F.lit("forward").alias("direction"),
        "passive",
    ).unionByName(
        base.select(
            bwd_q.alias("question"), bwd_a.alias("answer"),
            "subj", "pred", "obj", F.lit("backward").alias("direction"),
            "passive",
        )
    )
    if max_distractors <= 0:
        return out.drop("passive")
    # distractors come from the ANSWER-SIDE vocabulary — a backward (or
    # passive-forward) question's answer is a SUBJECT, so its wrong
    # options must be subjects too, or the multiple-choice row is
    # trivially gameable (the one non-object option is the answer).
    # Per (pred, side): hash-rank the distinct values and take the
    # first max_distractors+1 (≥ max_distractors survive dropping the
    # true answer) — bounded per-key lists, broadcast-sized
    ans_side = F.when(
        (F.col("direction") == "forward") == F.col("passive"),
        F.lit("subj"),
    ).otherwise(F.lit("obj"))
    vocab = (
        base.select("pred", F.col("obj").alias("val"),
                    F.lit("obj").alias("side"))
        .unionByName(
            base.select("pred", F.col("subj").alias("val"),
                        F.lit("subj").alias("side"))
        )
        .distinct()
        # md5 (not xxhash64) so the pick renders identically in DuckDB —
        # the whole surface is driver-oracled incl. distractors (r05);
        # \x1f separator = the repo's reserved injective-concat byte
        .withColumn(
            "hrank",
            F.md5(F.concat_ws("\x1f", F.lit(seed), "pred", "side", "val")),
        )
    )
    from pyspark.sql import Window as _W

    w = _W.partitionBy("pred", "side").orderBy("hrank", "val")
    picked = (
        vocab.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= max_distractors + 1)
        .groupBy("pred", "side")
        .agg(F.sort_array(F.collect_list("val")).alias("cand"))
    )
    return (
        out.withColumn("side", ans_side)
        .join(F.broadcast(picked), ["pred", "side"], "left")
        .withColumn(
            "distractors",
            F.slice(
                F.filter(
                    F.coalesce("cand", F.array().cast("array<string>")),
                    lambda c: c != F.col("answer"),
                ),
                1, max_distractors,
            ),
        )
        .drop("cand", "side", "passive")
    )
