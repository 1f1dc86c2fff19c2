"""RDFS entailment materialization — the ρdf core (Muñoz, Pérez &
Gutierrez, JWS 2009 "Simple and Efficient Minimal RDFS") over the
distributed edge table: given instance edges plus schema edges
(subClassOf / subPropertyOf / domain / range), derive every triple the
RDFS rules entail and return the closed graph. This is the standard
KG-construction enrichment step (DBpedia/Wikidata pipelines materialize
it so downstream queries don't re-derive types per query).

Rules implemented (W3C RDF 1.1 Semantics §9.2.1 numbering):

- rdfs5 / rdfs11 — subPropertyOf and subClassOf are TRANSITIVE: both
  closures via :func:`~naruhodo_spark.operators.closure.transitive_closure`.
- rdfs7  — (a p b) ∧ (p subPropertyOf q) ⇒ (a q b)  ["edge lift"].
- rdfs2  — (a p b) ∧ (p domain c) ⇒ (a type c).
- rdfs3  — (a p b) ∧ (p range c)  ⇒ (b type c).
- rdfs9  — (x type c) ∧ (c subClassOf d) ⇒ (x type d).

ρdf deliberately drops the reflexive tautology rules (rdfs6/8/10 —
``c subClassOf c`` etc.) and the axiomatic container/datatype triples;
so does this operator.

STRATIFICATION, not instance-level fixpoint: the only recursion lives
in the two SCHEMA closures (vocabulary-sized inputs). The instance
data is then touched by exactly four broadcast joins in dependency
order — lift (rdfs7) → domain/range typing over LIFTED edges
(rdfs2/3 consume rdfs7's output) → subclass inheritance over ALL type
triples including the derived ones (rdfs9 consumes rdfs2/3) — which is
complete for ρdf because no rule derives new subPropertyOf/subClassOf
edges from instance triples. ``p subPropertyOf subclass_of`` IS
handled (the subclass closure is computed from the LIFTED graph), as
is ``p subPropertyOf type``. What breaks the single pass is
meta-vocabulary modeling — a schema predicate itself appearing in a
subPropertyOf pair, or carrying a domain/range declaration (e.g.
``type subPropertyOf q``: DERIVED type triples would need re-lifting,
re-opening the fixpoint at instance scale). Those graphs RAISE loudly
(the WebPIE stratification, Urbani et al. ESWC 2010, makes the same
cut) — never a silent under-derivation.

Scale shape at 10^12 instance edges:

- the schema (subClassOf/subPropertyOf/domain/range edges) is
  vocabulary-sized — its closures are computed once and BROADCAST, so
  every instance-side derivation is a map-side join: the instance
  table is never shuffled, and the output unions are map-only over it;
- the final ``distinct`` is the one instance-scale shuffle (unavoidable
  — entailed graphs are sets); callers that tolerate a bag (e.g. a
  downstream groupBy) can pass ``dedupe=False`` and skip it;
- derived volume is the honest cost: each instance edge fans out by
  its predicate's superproperty count, each typed node by its class's
  superclass count — Zipf-bounded by schema depth, not by data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from naruhodo_spark.operators.closure import transitive_closure

TYPE = "is_a"
SUBCLASS = "subclass_of"
SUBPROPERTY = "subproperty_of"
DOMAIN = "domain"
RANGE = "range"


def rdfs_entailment(
    edges: DataFrame,
    type_pred: str = TYPE,
    subclass_pred: str = SUBCLASS,
    subproperty_pred: str = SUBPROPERTY,
    domain_pred: str = DOMAIN,
    range_pred: str = RANGE,
    max_rounds: int = 30,
    dedupe: bool = True,
) -> DataFrame:
    """(src, pred, dst) — the input graph closed under the ρdf RDFS
    rules (module docstring). Schema triples are ordinary edges whose
    predicate is one of the four schema predicates; the closure of
    subClassOf / subPropertyOf is part of the output (rdfs5/11 derive
    real triples). ``dedupe=False`` returns the same graph as a bag
    (skips the final instance-scale distinct)."""
    edges = edges.select("src", "pred", "dst")

    # rdfs5: subPropertyOf closure — schema-sized, broadcast everywhere
    sp = transitive_closure(
        edges.where(F.col("pred") == subproperty_pred).select("src", "dst"),
        max_rounds=max_rounds,
    ).localCheckpoint()

    # meta-vocabulary guard (docstring): a schema predicate inside a
    # subPropertyOf pair, or carrying its own domain/range declaration,
    # re-opens the fixpoint at instance scale — raise, never
    # under-derive. Both probes are schema-sized.
    meta = [type_pred, subclass_pred, subproperty_pred, domain_pred, range_pred]
    # unsafe: a schema predicate as the SUB-property (its derived
    # triples would need re-lifting), or a lift INTO subPropertyOf /
    # domain / range (those relations were snapshotted before the
    # lift). Lifts into type/subClassOf are SAFE — both are consumed
    # from the lifted graph below.
    offending = (
        sp.where(
            F.col("src").isin(meta)
            | F.col("dst").isin(subproperty_pred, domain_pred, range_pred)
        )
        .unionByName(
            edges.where(
                F.col("pred").isin(domain_pred, range_pred)
                & F.col("src").isin(meta)
            ).select("src", "dst")
        )
        .limit(5)
        .collect()
    )
    if offending:
        raise ValueError(
            "rdfs_entailment: meta-vocabulary modeling is out of scope "
            f"(schema predicates inside schema declarations): {offending!r}"
        )

    # rdfs7: lift every instance edge along the superproperty closure.
    # Schema predicates are excluded from lifting INTO (a lift target
    # that is itself 'domain' etc. would be meta-modeling; a lift of a
    # schema edge along subPropertyOf likewise) — but a lift target of
    # `type_pred` is supported and feeds rdfs9 below.
    lift = sp.select(F.col("src").alias("pred"), F.col("dst").alias("_q"))
    lifted_new = (
        edges.join(F.broadcast(lift), "pred")
        .select("src", F.col("_q").alias("pred"), "dst")
    )
    lifted = edges.unionByName(lifted_new).unionByName(
        sp.select("src", F.lit(subproperty_pred).alias("pred"), "dst")
    )

    # rdfs11: subClassOf closure — from the LIFTED graph, so subclass
    # edges arriving via rdfs7 participate
    cc = transitive_closure(
        lifted.where(F.col("pred") == subclass_pred).select("src", "dst"),
        max_rounds=max_rounds,
    ).localCheckpoint()
    # 4 consumers below (output union, domain, range, type collection)
    # — lazily checkpoint so the lifted frame materializes once instead
    # of re-scanning the instance tables per consumer
    lifted = lifted.unionByName(
        cc.select("src", F.lit(subclass_pred).alias("pred"), "dst")
    ).localCheckpoint(eager=False)

    # rdfs2/3: domain/range typing over the lifted edges
    dom = edges.where(F.col("pred") == domain_pred).select(
        F.col("src").alias("pred"), F.col("dst").alias("_c")
    )
    rng = edges.where(F.col("pred") == range_pred).select(
        F.col("src").alias("pred"), F.col("dst").alias("_c")
    )
    typed_dom = (
        lifted.join(F.broadcast(dom), "pred")
        .select("src", F.lit(type_pred).alias("pred"), F.col("_c").alias("dst"))
    )
    typed_rng = (
        lifted.join(F.broadcast(rng), "pred")
        .select(
            F.col("dst").alias("src"),
            F.lit(type_pred).alias("pred"),
            F.col("_c").alias("dst"),
        )
    )

    # rdfs9: inherit types up the subclass closure — over ALL type
    # triples, asserted and derived
    all_types = (
        lifted.where(F.col("pred") == type_pred)
        .unionByName(typed_dom)
        .unionByName(typed_rng)
    )
    up = cc.select(F.col("src").alias("dst"), F.col("dst").alias("_d"))
    inherited = (
        all_types.join(F.broadcast(up), "dst")
        .select("src", "pred", F.col("_d").alias("dst"))
    )

    out = (
        lifted.unionByName(typed_dom)
        .unionByName(typed_rng)
        .unionByName(inherited)
    )
    return out.distinct() if dedupe else out


def rdfs_entailment_delta(
    new_edges: DataFrame,
    schema_edges: DataFrame,
    **kw,
) -> DataFrame:
    """Incremental maintenance: the entailed triples contributed by a
    batch of NEW instance edges under a FIXED schema — O(|delta|), the
    streaming-epoch companion to :func:`rdfs_entailment` (the
    incremental-CC / incdedup discipline).

    This is exact, not approximate, because every ρdf instance rule
    has at most ONE instance antecedent (the other antecedent is a
    schema triple): no rule joins two instance triples, so entailment
    distributes over instance-edge union —
    ``entail(old ∪ new ∪ S) = entail(old ∪ S) ∪ entail(new ∪ S)``
    (as sets; pinned by tests/test_entail.py). A batch that tries to
    CHANGE the schema (carrying subClassOf / subPropertyOf / domain /
    range triples) breaks the premise and raises — schema evolution is
    a full re-entailment, never a silent partial one.
    """
    subclass_pred = kw.get("subclass_pred", SUBCLASS)
    subproperty_pred = kw.get("subproperty_pred", SUBPROPERTY)
    domain_pred = kw.get("domain_pred", DOMAIN)
    range_pred = kw.get("range_pred", RANGE)
    schema_preds = [subclass_pred, subproperty_pred, domain_pred, range_pred]
    offending = (
        new_edges.where(F.col("pred").isin(schema_preds)).limit(5).collect()
    )
    if offending:
        raise ValueError(
            "rdfs_entailment_delta: the delta batch carries SCHEMA "
            f"triples {offending!r} — schema changes invalidate every "
            "prior entailment; run rdfs_entailment over the full graph"
        )
    return rdfs_entailment(
        new_edges.select("src", "pred", "dst").unionByName(
            schema_edges.select("src", "pred", "dst")
        ),
        **kw,
    )
