"""Cross-KG entity alignment — PARIS-style probabilistic instance
matching (Suchanek, Abiteboul & Senellart, VLDB 2012 "PARIS:
Probabilistic Alignment of Relations, Instances, and Schema"),
restated as a bounded-round DataFrame fixpoint.

Two KGs extracted from different corpora (or different epochs /
languages / sources) name the same real-world entities differently;
alignment is what makes fuse/smush/kgdiff meaningful ACROSS stores
rather than within one. PARIS's core signal: x ≡ x' is likely when
they share an object y under a predicate p whose object nearly
determines its subject — quantified by p's INVERSE FUNCTIONALITY
fun⁻(p) = #distinct objects / #facts. Evidence combines as independent
noisy-or:

    P(x ≡ x') = 1 − Π_{shared (p,y)} (1 − fun⁻(p))

computed in log space (sum of ln(1−f), f clamped below 1 so a
perfectly-functional predicate stays finite evidence, not certainty).

Round 1 matches objects literally (shared names — dates, numbers,
canonical strings). Later rounds feed the previous round's accepted
matches back in as object equivalences (y ≈ y' when y↔y' matched), so
evidence propagates structurally: two differently-named people align
because they share a literally-named employer AND a structurally-
matched city. Bounded rounds, threshold-gated acceptance, optional
mutual-best filter — the standard PARIS loop without its schema-
alignment leg (predicates here are a shared extraction vocabulary; a
pred-mapping join composes in front when they are not).

Shape per round: functionalities = ONE uniform groupBy per KG;
candidates = ONE equi-join on the (pred, object) key with a hot-key
cap + loud audit (a god object like a country name would pair every
citizen of KG1 with every citizen of KG2 — n·m per key); scoring =
ONE groupBy on the (x, x') pair; acceptance = one max_by argmax per
side. Everything shuffles on uniform keys after the cap; no driver
state beyond the round loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EPS = 1e-6


def inverse_functionality(kg: DataFrame) -> DataFrame:
    """(pred, fun_inv) — #distinct objects / #distinct (subj, obj)
    facts per predicate, the PARIS inverse functionality. 1.0 means an
    object pins its subject uniquely (ssn-like); near 0 means the
    object is shared by everyone (country-like). Duplicate assertions
    of one fact don't dilute (distinct first)."""
    facts = kg.select("subj", "pred", "obj").distinct()
    return facts.groupBy("pred").agg(
        (
            F.countDistinct("obj") / F.count(F.lit(1))
        ).alias("fun_inv")
    )


def align_entities(
    kg1: DataFrame,
    kg2: DataFrame,
    rounds: int = 2,
    min_score: float = 0.5,
    max_per_object: int | None = 1000,
    mutual_best: bool = True,
):
    """Align KG1 subjects with KG2 subjects; returns ``(matches,
    audit)``:

    - matches: (name_1, name_2, score, n_shared) — accepted pairs
      (score ≥ ``min_score``; with ``mutual_best`` each side keeps
      only its argmax partner and a pair survives only when the choice
      is reciprocal — the PARIS acceptance rule that kills hub
      absorption).
    - audit: (pred, obj_key, n_1, n_2, round) — (pred, object) blocks
      whose KG1×KG2 candidate product exceeded ``max_per_object`` and
      were EXCLUDED from evidence that round (no silent drops; empty
      when uncapped or nothing was hot). Capped blocks are exactly the
      low-fun⁻ god objects whose evidence is weakest, so the cap
      biases recall, not precision.

    Evidence weight for a shared (p, y): the MEAN of p's fun⁻ in the
    two KGs (both sides' determinacy matters; a predicate functional
    in KG1 but promiscuous in KG2 is middling evidence).
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    f1 = inverse_functionality(kg1).select(
        "pred", F.col("fun_inv").alias("f1")
    )
    f2 = inverse_functionality(kg2).select(
        "pred", F.col("fun_inv").alias("f2")
    )
    weights = (
        f1.join(f2, "pred")
        .select(
            "pred",
            F.least(
                (F.col("f1") + F.col("f2")) / 2.0, F.lit(1.0 - _EPS)
            ).alias("w"),
        )
    )

    t1 = kg1.select("subj", "pred", "obj").distinct().localCheckpoint(
        eager=False
    )
    t2 = kg2.select("subj", "pred", "obj").distinct().localCheckpoint(
        eager=False
    )

    matches = None
    audit_frames = []
    for rnd in range(int(rounds)):
        # object keys: literal identity always; plus the previous
        # round's accepted entity matches as cross-KG equivalences
        s1 = t1.select("subj", "pred", F.col("obj").alias("obj_key"))
        s2 = t2.select("subj", "pred", F.col("obj").alias("obj_key"))
        if matches is not None:
            eq = matches.select(
                F.col("name_1").alias("m1"), F.col("name_2").alias("m2")
            )
            # rewrite KG2 objects onto their matched KG1 name so the
            # equi-join key unifies; literal rows stay as-is
            s2 = (
                t2.join(eq, t2.obj == eq.m2, "left")
                .select(
                    "subj",
                    "pred",
                    F.coalesce("m1", "obj").alias("obj_key"),
                )
            )
        n1 = s1.groupBy("pred", "obj_key").agg(
            F.countDistinct("subj").alias("n_1")
        )
        n2 = s2.groupBy("pred", "obj_key").agg(
            F.countDistinct("subj").alias("n_2")
        )
        sizes = n1.join(n2, ["pred", "obj_key"])
        hot = sizes.where(
            F.lit(False)
            if max_per_object is None
            else F.col("n_1") * F.col("n_2") > int(max_per_object)
        )
        audit_frames.append(hot.withColumn("round", F.lit(rnd)))
        if max_per_object is not None:
            s1 = s1.join(
                hot.select("pred", "obj_key"), ["pred", "obj_key"],
                "left_anti",
            )
            s2 = s2.join(
                hot.select("pred", "obj_key"), ["pred", "obj_key"],
                "left_anti",
            )
        cands = (
            s1.select(
                F.col("subj").alias("name_1"), "pred", "obj_key"
            )
            .join(
                s2.select(
                    F.col("subj").alias("name_2"), "pred", "obj_key"
                ),
                ["pred", "obj_key"],
            )
            .join(F.broadcast(weights), "pred")
        )
        scored = (
            cands.groupBy("name_1", "name_2")
            .agg(
                F.round(
                    1.0 - F.exp(F.sum(F.log(1.0 - F.col("w")))), 6
                ).alias("score"),
                F.count(F.lit(1)).alias("n_shared"),
            )
            .where(F.col("score") >= float(min_score))
        )
        if mutual_best:
            # argmax per side via max_by on (score, partner) — the
            # partner tiebreak keeps the argmax deterministic
            best1 = scored.groupBy("name_1").agg(
                F.expr(
                    "max_by(name_2, struct(score, name_2))"
                ).alias("name_2")
            )
            best2 = scored.groupBy("name_2").agg(
                F.expr(
                    "max_by(name_1, struct(score, name_1))"
                ).alias("name_1")
            )
            scored = scored.join(
                best1, ["name_1", "name_2"], "left_semi"
            ).join(best2, ["name_1", "name_2"], "left_semi")
        matches = scored.localCheckpoint(eager=False)

    audit = audit_frames[0]
    for fr in audit_frames[1:]:
        audit = audit.unionByName(fr)
    return matches, audit


def predicate_alignment(
    kg1: DataFrame,
    kg2: DataFrame,
    matches: DataFrame,
    min_support: int = 2,
    min_score: float = 0.0,
) -> DataFrame:
    """(pred_1, pred_2, n_shared, n_grounded, score) — PARIS's SCHEMA
    leg: estimate P(r ⊑ r') between the two KGs' predicate
    vocabularies, given the instance ``matches`` the entity leg
    produced. A KG1 fact r(x, y) is GROUNDED when x has a match x' in
    KG2 (objects translate through their match when they have one and
    pass through literally otherwise — dates and strings compare by
    value); it SUPPORTS r ⊑ r' when KG2 asserts r'(x', y'). score =
    n_shared / n_grounded, the subsumption frequency over the
    comparable sample (Suchanek VLDB'12 §5; their recursive refinement
    folds this back into the entity scores — here one pass, composed
    by the caller if wanted).

    Direction matters: this scores KG1-under-KG2; swap arguments (and
    the matches' columns) for the reverse. Rows below ``min_support``
    shared groundings or ``min_score`` are dropped — score estimates
    from tiny samples are noise, and the threshold is the documented
    contract, not a silent cap.

    Shape: matches is alignment-output-sized (≤ min(|E1|, |E2|)) and
    joins twice on uniform entity keys; the support join is ONE
    (subj, obj) pair equi-join against KG2's facts; two uniform
    groupBys finish. Nothing is ever all-pairs on predicates.
    """
    eq = matches.select(
        F.col("name_1").alias("m1"), F.col("name_2").alias("m2")
    ).distinct()
    t1 = kg1.select("subj", "pred", "obj").distinct()
    grounded = (
        t1.join(eq.withColumnsRenamed({"m1": "subj", "m2": "subj_2"}), "subj")
        .join(
            eq.withColumnsRenamed({"m1": "obj", "m2": "obj_match"}),
            "obj",
            "left",
        )
        .select(
            F.col("pred").alias("pred_1"),
            "subj_2",
            F.coalesce("obj_match", "obj").alias("obj_2"),
        )
    )
    denom = grounded.groupBy("pred_1").agg(
        F.countDistinct("subj_2", "obj_2").alias("n_grounded")
    )
    t2 = kg2.select(
        F.col("subj").alias("subj_2"),
        F.col("pred").alias("pred_2"),
        F.col("obj").alias("obj_2"),
    ).distinct()
    shared = (
        grounded.join(t2, ["subj_2", "obj_2"])
        .groupBy("pred_1", "pred_2")
        .agg(F.countDistinct("subj_2", "obj_2").alias("n_shared"))
    )
    return (
        shared.join(denom, "pred_1")
        .where(F.col("n_shared") >= int(min_support))
        .select(
            "pred_1",
            "pred_2",
            "n_shared",
            "n_grounded",
            F.round(F.col("n_shared") / F.col("n_grounded"), 6).alias(
                "score"
            ),
        )
        .where(F.col("score") >= float(min_score))
    )
