"""KG schema induction: per-predicate domain/range type signatures and
violation flagging — the statistical-typing pass (SDType-style, Paulheim
& Bizer ISWC'13) users run to find extraction errors in a built KG.

The reference types entities per mention via its NE dictionary
[PK naruhodo/utils/dicts.py] but never checks predicates for type
consistency; at 10^12 documents the consistency check IS the error
detector — a predicate whose subjects are 95% person suddenly asserted
on a date is almost surely a mis-extraction.

Plan shape: two uniform groupBys ((pred, type) histogram → per-pred
argmax via one max(struct) agg — no rank window), then one broadcastable
join back onto the triples for violations. Everything is
predicate-keyed; predicates are few (thousands), so the signature table
is broadcast-sized by construction while the scan side stays
triple-partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def predicate_signatures(
    triples: DataFrame, min_support: int = 3
) -> DataFrame:
    """(pred, dom_type, dom_conf, range_type, range_conf, support) —
    the majority subject/object entity type per predicate with its
    confidence (share of typed occurrences). Untyped occurrences
    (etype ≤ 0, the gazetteer's unknown) are excluded from the vote but
    counted in ``support``; predicates below ``min_support`` typed
    occurrences on a slot get a NULL signature for it (no evidence ≠
    type anything-goes)."""
    base = triples.where(F.col("obj").isNotNull() & (F.col("obj") != ""))

    def _slot(col_ne: str, out: str) -> DataFrame:
        hist = (
            base.where(F.col(col_ne) > 0)
            .groupBy("pred", F.col(col_ne).alias("etype"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        tot = hist.groupBy("pred").agg(F.sum("n").alias("n_typed"))
        best = hist.groupBy("pred").agg(
            F.max(F.struct("n", "etype")).alias("b")
        )
        return (
            best.join(tot, "pred")
            .where(F.col("n_typed") >= min_support)
            .select(
                "pred",
                F.col("b.etype").alias(f"{out}_type"),
                F.round(F.col("b.n") / F.col("n_typed"), 4).alias(f"{out}_conf"),
            )
        )

    support = base.groupBy("pred").agg(F.count(F.lit(1)).alias("support"))
    return (
        support.join(_slot("subj_ne", "dom"), "pred", "left")
        .join(_slot("obj_ne", "range"), "pred", "left")
        .select(
            "pred", "dom_type", "dom_conf", "range_type", "range_conf",
            "support",
        )
    )


def type_violations(
    triples: DataFrame,
    signatures: "DataFrame | None" = None,
    min_conf: float = 0.8,
    min_support: int = 3,
) -> DataFrame:
    """(doc_id, subj, pred, obj, slot, found_type, expected_type) — the
    triples whose typed subject/object contradicts a CONFIDENT
    predicate signature (conf ≥ min_conf): the mis-extraction review
    queue. Untyped arguments never violate (absence of evidence), and
    predicates without a confident signature are skipped entirely.

    One broadcast-sized join (signatures are predicate-keyed) + a
    filter; the triples side is never shuffled."""
    sig = (
        signatures
        if signatures is not None
        else predicate_signatures(triples, min_support=min_support)
    )
    base = triples.where(F.col("obj").isNotNull() & (F.col("obj") != ""))
    j = base.join(F.broadcast(sig), "pred", "left")
    out = []
    for slot, ne_col, t_col, c_col in (
        ("subj", "subj_ne", "dom_type", "dom_conf"),
        ("obj", "obj_ne", "range_type", "range_conf"),
    ):
        out.append(
            j.where(
                (F.col(c_col) >= min_conf)
                & (F.col(ne_col) > 0)
                & (F.col(ne_col) != F.col(t_col))
            ).select(
                "doc_id", "subj", "pred", "obj",
                F.lit(slot).alias("slot"),
                F.col(ne_col).alias("found_type"),
                F.col(t_col).alias("expected_type"),
            )
        )
    return out[0].unionByName(out[1])


def predicate_functionality(
    triples: DataFrame, min_support: int = 3
) -> DataFrame:
    """(pred, functionality, inv_functionality, n_slots, n_inv_slots,
    support) — AMIE-style functionality scores (Galárraga WWW'13 §3.2):
    ``functionality`` = #distinct subjects / #distinct (subj, obj)
    pairs — 1.0 means every subject asserts exactly one object (a
    functional attribute like birth_date), lower means multi-valued.
    ``inv_functionality`` is the same with the roles swapped.

    Shape: ONE distinct on the (pred, subj, obj) key (uniform — this
    is the two-phase distinct; a hot predicate's duplicate mentions
    combine map-side), then ONE groupBy(pred) counting both distinct
    slot projections via count_distinct over the already-distinct
    rows. Predicates below ``min_support`` distinct pairs are dropped
    (no evidence). The output is predicate-keyed, i.e.
    broadcast-sized."""
    pairs = (
        triples.where(F.col("obj").isNotNull() & (F.col("obj") != ""))
        .select("pred", "subj", "obj")
        .distinct()
    )
    return (
        pairs.groupBy("pred")
        .agg(
            F.count_distinct("subj").alias("n_slots"),
            F.count_distinct("obj").alias("n_inv_slots"),
            F.count(F.lit(1)).alias("support"),
        )
        .where(F.col("support") >= min_support)
        .select(
            "pred",
            F.round(F.col("n_slots") / F.col("support"), 4).alias(
                "functionality"
            ),
            F.round(F.col("n_inv_slots") / F.col("support"), 4).alias(
                "inv_functionality"
            ),
            "n_slots",
            "n_inv_slots",
            "support",
        )
    )


def cardinality_violations(
    triples: DataFrame,
    functionality: "DataFrame | None" = None,
    min_functionality: float = 0.95,
    min_support: int = 3,
) -> DataFrame:
    """(pred, subj, n_objects, obj_min, obj_max, functionality) — the
    subjects asserting MULTIPLE distinct objects for a predicate that
    is otherwise (near-)functional: the multi-value review queue that
    complements :func:`type_violations` (a 0.99-functional predicate
    with a 5-object subject is almost surely a mis-extraction or an
    unresolved entity split).

    Skew-proof witnesses: instead of collecting the offending object
    set (unbounded on an adversarial hub), each slot reports its
    distinct-object COUNT plus the lexicographic min/max objects —
    O(1) per-group state, fully map-side combinable. One distinct +
    one uniform groupBy + one broadcast join against the
    predicate-keyed functionality table."""
    fun = (
        functionality
        if functionality is not None
        else predicate_functionality(triples, min_support=min_support)
    )
    fun = fun.where(
        (F.col("functionality") >= min_functionality)
        & (F.col("functionality") < 1.0)  # 1.0 has no violators
    ).select("pred", "functionality")
    pairs = (
        triples.where(F.col("obj").isNotNull() & (F.col("obj") != ""))
        .select("pred", "subj", "obj")
        .distinct()
    )
    slots = (
        pairs.join(F.broadcast(fun), "pred")
        .groupBy("pred", "subj", "functionality")
        .agg(
            F.count(F.lit(1)).alias("n_objects"),
            F.min("obj").alias("obj_min"),
            F.max("obj").alias("obj_max"),
        )
        .where(F.col("n_objects") > 1)
    )
    return slots.select(
        "pred", "subj", "n_objects", "obj_min", "obj_max", "functionality"
    )


def infer_entity_types(
    triples: DataFrame,
    signatures: "DataFrame | None" = None,
    min_conf: float = 0.0,
    min_support: int = 3,
) -> DataFrame:
    """(entity, etype, score, n_evidence) — statistical type inference
    for UNTYPED entities (SDType, Paulheim & Bizer ISWC'13, with the
    signature confidence standing in for SDType's per-predicate weight):
    an entity none of whose mentions carry a gazetteer type collects
    one vote per mention from the predicate signature of the slot it
    fills — subject mentions vote the predicate's domain type weighted
    by ``dom_conf``, object mentions its range type weighted by
    ``range_conf`` — and the max-weight type wins (ties → smallest
    type id). ``score`` = winning weight / total vote weight (4 dp);
    ``n_evidence`` = number of votes behind the winner.

    Entities with ANY typed mention are excluded — the gazetteer
    outranks inference; this operator fills the gaps it leaves.

    Shape: two map-only slot projections unioned, one uniform groupBy
    for the typedness gate, one broadcast join against the
    predicate-keyed signature table, two uniform groupBys for the
    vote + argmax (min-struct, no windows). The triples side is
    scanned twice and shuffled on entity keys only.
    """
    sig = (
        signatures
        if signatures is not None
        else predicate_signatures(triples, min_support=min_support)
    )
    base = triples.where(F.col("obj").isNotNull() & (F.col("obj") != ""))
    mentions = (
        base.select(
            F.col("subj").alias("entity"),
            F.col("subj_ne").alias("ne"),
            "pred",
            F.lit("dom").alias("slot"),
        )
        .unionByName(
            base.select(
                F.col("obj").alias("entity"),
                F.col("obj_ne").alias("ne"),
                "pred",
                F.lit("range").alias("slot"),
            )
        )
    )
    untyped = (
        mentions.groupBy("entity")
        .agg(F.max("ne").alias("max_ne"))
        .where(F.col("max_ne") <= 0)
        .select("entity")
    )
    votes = (
        mentions.join(untyped, "entity")
        .join(F.broadcast(sig), "pred")
        .select(
            "entity",
            F.when(F.col("slot") == "dom", F.col("dom_type"))
            .otherwise(F.col("range_type"))
            .alias("etype"),
            F.when(F.col("slot") == "dom", F.col("dom_conf"))
            .otherwise(F.col("range_conf"))
            .alias("conf"),
        )
        .where(F.col("etype").isNotNull() & (F.col("conf") >= min_conf))
    )
    per_type = votes.groupBy("entity", "etype").agg(
        F.sum("conf").alias("w"), F.count(F.lit(1)).alias("n")
    )
    return (
        per_type.groupBy("entity")
        .agg(
            F.min(
                F.struct(
                    (-F.col("w")).alias("neg"),
                    F.col("etype").alias("etype"),
                    F.col("n").alias("n"),
                )
            ).alias("win"),
            F.sum("w").alias("total"),
        )
        .select(
            "entity",
            F.col("win.etype").alias("etype"),
            F.round(-F.col("win.neg") / F.col("total"), 4).alias("score"),
            F.col("win.n").alias("n_evidence"),
        )
    )
