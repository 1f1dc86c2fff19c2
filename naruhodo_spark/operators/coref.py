"""O13 pronoun resolution + O14 omitted-subject (zero-anaphora) carryover.

Reference behavior: pronoun chunks resolve to the nearest *preceding*
entity of a compatible entity type by scanning ``entityList`` backwards;
a sentence whose predicate has no explicit subject inherits the most
recent explicit subject (the ``sub`` bookkeeping)
[PK naruhodo/core/KnowledgeCoreJa.py _resolvePronoun & subject tracking,
pronoun classes in naruhodo/utils/dicts.py].

Spark mapping (SURVEY.md O13/O14): the positional side-indexes become
**window analytics** over ``partitionBy(doc_id) ORDER BY (sent_id,
chunk_id)`` with ``F.last(..., ignorenulls=True)`` over
``rowsBetween(unboundedPreceding, -1)`` — one shuffle on doc_id, no
driver state, scales with document count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from naruhodo_spark import schemas as S

_ARG_TYPES = (S.CTYPE_NOUN, S.CTYPE_PRONOUN)


def entity_occurrences(chunks: DataFrame) -> DataFrame:
    """Noun/pronoun chunk occurrences — the window-function replacement for
    the reference's entityList/proList side-indexes (SURVEY.md D6)."""
    return chunks.where(F.col("ctype").isin(*_ARG_TYPES)).select(
        "doc_id", "sent_id", "chunk_id", "main", "ne_type", "pro"
    )


def resolve_pronouns(occ: DataFrame) -> DataFrame:
    """Adds ``resolved`` (antecedent main) and ``resolved_ne`` columns.

    Compatibility (mirrors the reference's pronoun classes):
    personal → nearest preceding PERSON entity;
    demonstrative → nearest preceding non-person entity;
    locative → nearest preceding LOCATION entity;
    each falls back to nearest preceding entity of any type, then to the
    pronoun surface itself (unresolvable pronoun stays itself, as the
    reference keeps unresolved pronouns as their own nodes)."""
    w = (
        W.partitionBy("doc_id")
        .orderBy("sent_id", "chunk_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    is_ent = F.col("pro") == S.PRO_NONE
    ent = F.struct(F.col("main"), F.col("ne_type"))

    last_person = F.last(
        F.when(is_ent & (F.col("ne_type") == S.ETYPE_PERSON), ent), True
    ).over(w)
    last_nonperson = F.last(
        F.when(is_ent & (F.col("ne_type") != S.ETYPE_PERSON), ent), True
    ).over(w)
    last_location = F.last(
        F.when(is_ent & (F.col("ne_type") == S.ETYPE_LOCATION), ent), True
    ).over(w)
    last_any = F.last(F.when(is_ent, ent), True).over(w)

    pick = (
        F.when(F.col("pro") == S.PRO_PERSONAL, F.coalesce(last_person, last_any))
        .when(F.col("pro") == S.PRO_DEMONSTRATIVE, F.coalesce(last_nonperson, last_any))
        .when(F.col("pro") == S.PRO_LOCATIVE, F.coalesce(last_location, last_any))
    )
    return (
        occ.withColumn("ante", pick)
        .withColumn(
            "resolved",
            F.when(F.col("pro") == S.PRO_NONE, F.col("main")).otherwise(
                F.coalesce(F.col("ante.main"), F.col("main"))
            ),
        )
        .withColumn(
            "resolved_ne",
            F.when(F.col("pro") == S.PRO_NONE, F.col("ne_type")).otherwise(
                F.coalesce(F.col("ante.ne_type"), F.col("ne_type"))
            ),
        )
        .drop("ante")
    )


def attach_resolution(triples: DataFrame, occ_resolved: DataFrame) -> DataFrame:
    """Swap resolved antecedents into triple subject/object slots (O18).
    Left joins on the argument occurrence key — co-partitioned with the
    triples on doc_id, so AQE keeps these local after one shuffle."""
    subj_side = occ_resolved.select(
        F.col("doc_id").alias("s_doc"),
        F.col("sent_id").alias("s_sent"),
        F.col("chunk_id").alias("s_chunk"),
        F.col("resolved").alias("subj_resolved"),
        F.col("resolved_ne").alias("subj_ne"),
        F.col("pro").alias("subj_pro"),
    )
    obj_side = occ_resolved.select(
        F.col("doc_id").alias("o_doc"),
        F.col("sent_id").alias("o_sent"),
        F.col("chunk_id").alias("o_chunk"),
        F.col("resolved").alias("obj_resolved"),
        F.col("resolved_ne").alias("obj_ne"),
        F.col("pro").alias("obj_pro"),
    )
    out = (
        triples.join(
            subj_side,
            on=[
                triples.doc_id == subj_side.s_doc,
                triples.sent_id == subj_side.s_sent,
                triples.subj_id == subj_side.s_chunk,
            ],
            how="left",
        )
        .drop("s_doc", "s_sent", "s_chunk")
        .join(
            obj_side,
            on=[
                triples.doc_id == obj_side.o_doc,
                triples.sent_id == obj_side.o_sent,
                triples.obj_id == obj_side.o_chunk,
            ],
            how="left",
        )
        .drop("o_doc", "o_sent", "o_chunk")
    )
    return (
        out.withColumn("subj", F.coalesce("subj_resolved", "subj"))
        .withColumn("obj", F.coalesce("obj_resolved", "obj"))
        .withColumn("subj_ne", F.coalesce("subj_ne", F.lit(S.ETYPE_UNKNOWN)))
        .withColumn("obj_ne", F.coalesce("obj_ne", F.lit(S.ETYPE_UNKNOWN)))
        .withColumn("subj_pro", F.coalesce("subj_pro", F.lit(S.PRO_NONE)))
        .withColumn("obj_pro", F.coalesce("obj_pro", F.lit(S.PRO_NONE)))
        .drop("subj_resolved", "obj_resolved")
    )


def carryover_subjects(triples: DataFrame) -> DataFrame:
    """O14 — predicates with no explicit subject inherit the most recent
    explicit subject within the document (reference `sub` carryover)."""
    w = (
        W.partitionBy("doc_id")
        .orderBy("sent_id", "pred_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    # struct so the entity type travels with the name; the when() guard is
    # required because a struct of nulls is itself non-null
    carried = F.last(
        F.when(F.col("subj").isNotNull(), F.struct("subj", "subj_ne")), True
    ).over(w)
    return (
        triples.withColumn("carried", carried)
        .withColumn(
            "subj_ne",
            F.when(F.col("subj").isNull(), F.coalesce("carried.subj_ne", "subj_ne"))
            .otherwise(F.col("subj_ne")),
        )
        .withColumn("subj", F.coalesce("subj", "carried.subj"))
        .drop("carried")
    )
