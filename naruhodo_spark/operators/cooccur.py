"""Entity co-occurrence edges with PMI scores — the implicit
"related_to" relations a KG gains beyond its explicit triples.

Two entities mentioned in the same document are related in proportion to
how much their co-mention rate exceeds chance:
PMI(a,b) = log( P(a,b) / (P(a)·P(b)) ) over document-level mention
events. This is the standard distributional enrichment for KGs built
from text (the reference's users compute it off the exported graph; at
10^12 docs it must be a DataFrame program).

Plan shape at 100 TB:

- mention lists are built per document (distinct (doc_id, entity) —
  map-side-combined aggregation on per-doc keys, skew-free);
- the quadratic step — pair generation — happens INSIDE each doc's
  entity array with higher-order functions, and is bounded by an
  explicit ``max_entities_per_doc`` cap: a listing page mentioning 10k
  entities would otherwise emit 50M pairs by itself. Dropped docs are
  observable via :func:`oversized_docs` (no silent truncation);
- pair counts aggregate with map-side partials; the PMI join hits two
  aggregated per-entity count tables, which AQE broadcasts when small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from naruhodo_spark.operators.media import triple_mentions


def _doc_entities(triples: DataFrame) -> DataFrame:
    """(doc_id, ents: sorted distinct entity array)."""
    return (
        triple_mentions(triples)
        .select("doc_id", "entity")
        .distinct()
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("entity")).alias("ents"))
    )


def oversized_docs(
    triples: DataFrame, max_entities_per_doc: int = 50
) -> DataFrame:
    """(doc_id, n_entities) for docs the cap excludes — the audit
    surface for the documented truncation."""
    return (
        _doc_entities(triples)
        .select("doc_id", F.size("ents").alias("n_entities"))
        .where(F.col("n_entities") > max_entities_per_doc)
    )


def entity_cooccurrence(
    triples: DataFrame,
    max_entities_per_doc: int = 50,
    min_pair_docs: int = 1,
) -> DataFrame:
    """(e1, e2, n_docs, pmi) with e1 < e2 lexicographically.

    n_docs = #documents mentioning both; pmi over document events with
    N = #docs carrying ≥1 entity mention (cap-surviving docs only, so
    the probability space matches the pair space).
    """
    docs_ents = _doc_entities(triples).where(
        F.size("ents") <= max_entities_per_doc
    )
    docs_ents = docs_ents.localCheckpoint()  # reused 3× below

    n_total = docs_ents.count()
    if n_total == 0:
        return triples.sparkSession.createDataFrame(
            [], "e1 string, e2 string, n_docs long, pmi double"
        )

    # in-array pair generation: for sorted ents a, all (a[i], a[j]) i<j
    pairs_col = F.flatten(
        F.transform(
            F.col("ents"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("ents"), i + 2, F.greatest(F.size("ents") - i - 1, F.lit(1))
                ),
                lambda y: F.struct(x.alias("e1"), y.alias("e2")),
            ),
        )
    )
    pair_counts = (
        docs_ents.select(F.explode(pairs_col).alias("p"))
        .groupBy(F.col("p.e1").alias("e1"), F.col("p.e2").alias("e2"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_pair_docs)
    )
    ent_counts = (
        docs_ents.select(F.explode("ents").alias("entity"))
        .groupBy("entity")
        .agg(F.count(F.lit(1)).alias("n_ent"))
    )
    c1 = ent_counts.select(F.col("entity").alias("e1"), F.col("n_ent").alias("n1"))
    c2 = ent_counts.select(F.col("entity").alias("e2"), F.col("n_ent").alias("n2"))
    return (
        pair_counts.join(c1, "e1")
        .join(c2, "e2")
        .select(
            "e1",
            "e2",
            "n_docs",
            F.log(
                F.col("n_docs").cast("double") * F.lit(float(n_total))
                / (F.col("n1") * F.col("n2"))
            ).alias("pmi"),
        )
    )


def entity_communities(
    triples: DataFrame,
    min_pmi: float = 0.0,
    min_pair_docs: int = 2,
    max_entities_per_doc: int = 50,
) -> DataFrame:
    """(entity, community) — connected components over the PMI graph
    thresholded at (pmi >= min_pmi, n_docs >= min_pair_docs): entities
    that co-occur more than chance cluster into topical communities.

    Pure composition: the PMI edges come from :func:`entity_cooccurrence`
    and the clustering is the size-gated CC dispatch the canonicalizer
    uses (operators/canon.cc_labels_auto — driver union-find for small
    graphs, diameter-independent star contraction beyond the threshold),
    so the 100 TB argument is inherited rather than re-made. Community
    id = lexicographic min entity of the component, deterministic.
    """
    from naruhodo_spark.operators.canon import cc_labels_auto

    pmi_edges = entity_cooccurrence(
        triples,
        max_entities_per_doc=max_entities_per_doc,
        min_pair_docs=min_pair_docs,
    ).where(F.col("pmi") >= min_pmi)
    labels = cc_labels_auto(
        pmi_edges.select(F.col("e1").alias("src"), F.col("e2").alias("dst"))
    )
    return labels.select(
        F.col("node").alias("entity"), F.col("label").alias("community")
    )
