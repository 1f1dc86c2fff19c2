"""OWL property-semantics materialization — the three property
characteristics that dominate real KG ontologies (the "RDFS-Plus" /
OWL 2 RL property tier; Allemang & Hendler, "Semantic Web for the
Working Ontologist", ch. 7): inverse properties, symmetric properties,
and transitive properties. The companion to operators/entail.py's ρdf
class tier — together they cover the entailment profile Wikidata-style
pipelines actually materialize.

Schema edges (ordinary triples in the graph, mirroring entail.py):

- ``(p, inverse_of, q)``            — (a p b) ⇔ (b q a)  [owl:inverseOf]
- ``(p, is_a, symmetric_property)`` — (a p b) ⇒ (b p a)  [owl:SymmetricProperty]
- ``(p, is_a, transitive_property)``— p+ ⊆ p             [owl:TransitiveProperty]

Completeness WITHOUT an instance-scale fixpoint: the inverse/symmetric
rules only ever relate whole predicates with a direction parity, so
the rule interplay lives entirely in the vocabulary-sized schema. We
BFS the predicate/parity implication graph ON THE DRIVER (states =
(predicate, flipped?); an inverseOf hop flips parity, a symmetric mark
is a parity-flipping self-loop — inverse CHAINS of any depth and
sym∘inv compositions all collapse into one reachability map), then:

1. ONE broadcast map-side lift applies every implied (q, flip) to
   every instance edge;
2. each declared-transitive predicate's slice goes through the
   semi-naive :func:`~naruhodo_spark.operators.closure.transitive_closure`
   (a predicate parity-related to a transitive one is closed
   transitively too, because its edges were lifted INTO the declared
   predicate before the closure);
3. one more broadcast lift over the closure output — complete because
   closure and inverse commute: ``(p⁻¹)+ = (p+)⁻¹``.

Scale shape: schema slices are vocabulary-sized (their collect is
bounded by the ontology, never the data); both lifts are broadcast
map-side joins over the never-shuffled instance frame; the closures
are diameter-bounded per transitive predicate; the final ``distinct``
is the one instance-scale shuffle (``dedupe=False`` skips it, the
entail.py contract).

Out of scope, raising loudly (entail.py's meta-guard discipline): a
schema predicate (``inverse_of`` / the type predicate) itself declared
inverse/symmetric/transitive — that re-opens the fixpoint at instance
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from naruhodo_spark.operators.closure import transitive_closure

INVERSE_OF = "inverse_of"
TYPE = "is_a"
SYMMETRIC = "symmetric_property"
TRANSITIVE = "transitive_property"


def _implication_map(
    inv_pairs: list[tuple[str, str]], sym_preds: set[str]
) -> list[tuple[str, str, bool]]:
    """Driver-side BFS over the predicate/parity graph → every
    (p, q, flipped) with (q, flipped) reachable from (p, even) and
    ≠ (p, even). Inputs are vocabulary-sized by construction."""
    adj: dict[str, set[str]] = {}
    for a, b in inv_pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    preds = set(adj) | set(sym_preds)
    out: list[tuple[str, str, bool]] = []
    for p in sorted(preds):
        seen = {(p, False)}
        frontier = [(p, False)]
        while frontier:
            nxt = []
            for q, par in frontier:
                steps = [(r, not par) for r in adj.get(q, ())]
                if q in sym_preds:
                    steps.append((q, not par))
                for state in steps:
                    if state not in seen:
                        seen.add(state)
                        nxt.append(state)
            frontier = nxt
        out.extend(
            (p, q, par) for q, par in sorted(seen) if (q, par) != (p, False)
        )
    return out


def owl_entailment(
    edges: DataFrame,
    inverse_pred: str = INVERSE_OF,
    type_pred: str = TYPE,
    symmetric_class: str = SYMMETRIC,
    transitive_class: str = TRANSITIVE,
    max_rounds: int = 30,
    dedupe: bool = True,
) -> DataFrame:
    """(src, pred, dst) — the graph closed under owl:inverseOf,
    owl:SymmetricProperty, and owl:TransitiveProperty (module
    docstring). Schema triples stay in the output unchanged."""
    spark = edges.sparkSession
    edges = edges.select("src", "pred", "dst")

    inv_pairs = [
        (r["src"], r["dst"])
        for r in edges.where(F.col("pred") == inverse_pred)
        .select("src", "dst")
        .distinct()
        .collect()
    ]
    sym_preds = {
        r["src"]
        for r in edges.where(
            (F.col("pred") == type_pred) & (F.col("dst") == symmetric_class)
        )
        .select("src")
        .distinct()
        .collect()
    }
    trans_preds = sorted(
        r["src"]
        for r in edges.where(
            (F.col("pred") == type_pred) & (F.col("dst") == transitive_class)
        )
        .select("src")
        .distinct()
        .collect()
    )

    meta = {inverse_pred, type_pred}
    offending = sorted(
        (set(p for pair in inv_pairs for p in pair) | sym_preds
         | set(trans_preds)) & meta
    )
    if offending:
        raise ValueError(
            "owl_entailment: meta-vocabulary modeling is out of scope "
            f"(schema predicates inside property declarations): "
            f"{offending!r}"
        )

    imap = _implication_map(inv_pairs, sym_preds)

    def lift(frame: DataFrame) -> DataFrame:
        """frame ∪ every implied rewrite of it, via ONE broadcast join."""
        if not imap:
            return frame
        m = spark.createDataFrame(
            imap, "pred string, _q string, _flip boolean"
        )
        lifted = frame.join(F.broadcast(m), "pred").select(
            F.when(F.col("_flip"), F.col("dst"))
            .otherwise(F.col("src"))
            .alias("src"),
            F.col("_q").alias("pred"),
            F.when(F.col("_flip"), F.col("src"))
            .otherwise(F.col("dst"))
            .alias("dst"),
        )
        return frame.unionByName(lifted)

    cur = lift(edges).localCheckpoint(eager=False)

    out = cur
    for p in trans_preds:
        rel = cur.where(F.col("pred") == p).select("src", "dst")
        cdf = transitive_closure(rel, max_rounds=max_rounds)
        extra = cdf.select("src", F.lit(p).alias("pred"), "dst")
        # post-closure lift: (p+)⁻¹ = (p⁻¹)+ — one application completes
        out = out.unionByName(lift(extra))
    return out.distinct() if dedupe else out
