"""Media–entity co-occurrence edges over interleaved documents.

The north rule's input is an Iceberg table of *interleaved text + media*
documents [B BASELINE.json input_hint]; the reference pipeline only
consumes the text. This operator makes the media spans first-class graph
citizens: each media span becomes a ``media:<ref>`` node linked with an
``appears_with`` edge to every entity mentioned in the ADJACENT text
spans (the text span immediately before and immediately after the media
span in document offset order) — the standard weak-supervision heuristic
for image/caption grounding in multimodal KG construction.

Plan shape at 100 TB:

- the span-position arithmetic happens INSIDE each row's ``spans`` array
  with higher-order functions (``transform`` with index + ``slice`` /
  ``filter`` prefix counts) — zero shuffle, no window function;
- entity mentions come from the already-extracted triples, whose
  ``sent_id`` encodes the text-span ordinal (``sent_id div SENT_STRIDE``,
  operators/normalize.py) — no re-parse;
- the only shuffles are the (doc_id, text_ordinal) equi-join — keys are
  per-document, so no hot entities regardless of corpus skew — and the
  final (entity, media_ref) count aggregation, which has map-side
  partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from naruhodo_spark import schemas as S
from naruhodo_spark.operators.normalize import SENT_STRIDE

ETYPE_MEDIA = 9


def media_adjacency(docs_spans: DataFrame) -> DataFrame:
    """(doc_id, media_ref, text_ordinal) — one row per (media span,
    adjacent text span) pair.

    ``text_ordinal`` is the 0-based index of the text span among the
    doc's text spans in offset order — the same ordinal ``sent_id div
    SENT_STRIDE`` encodes for every extracted triple.
    """
    ordered = F.array_sort(
        F.transform(
            F.col("spans"),
            lambda s: F.struct(
                s["offset"].alias("offset"),
                s["kind"].alias("kind"),
                s["media_ref"].alias("media_ref"),
            ),
        )
    )
    # per element: how many TEXT spans strictly precede it (prefix count
    # via slice+filter — O(n²) inside the array, n = spans per doc, tiny;
    # buys zero-shuffle instead of a row_number window)
    ann = F.transform(
        F.col("_ord"),
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["media_ref"].alias("media_ref"),
            F.size(
                F.filter(
                    F.slice(F.col("_ord"), 1, i),
                    lambda p: p["kind"] == F.lit("text"),
                )
            ).alias("tbefore"),
        ),
    )
    media = (
        docs_spans.withColumn("_ord", ordered)
        .select("doc_id", F.explode(ann).alias("m"))
        .where(F.col("m.kind") == "media")
        .select(
            "doc_id",
            F.col("m.media_ref").alias("media_ref"),
            F.col("m.tbefore").alias("tbefore"),
        )
    )
    # adjacent text ordinals: the text span just before (tbefore-1) and
    # just after (tbefore) the media span
    return (
        media.select(
            "doc_id",
            "media_ref",
            F.explode(
                F.array(F.col("tbefore") - 1, F.col("tbefore"))
            ).alias("text_ordinal"),
        )
        .where(F.col("text_ordinal") >= 0)
        # NO distinct: a media_ref appearing twice in a doc co-occurs
        # twice, and each media span emits two DISTINCT ordinals anyway —
        # keeping this dedup-free keeps the stage shuffle-free
    )


def triple_mentions(triples: DataFrame) -> DataFrame:
    """(doc_id, text_ordinal, entity, etype) — every non-empty
    subject/object surface with the text-span ordinal recovered from
    sent_id. Pronoun mentions arrive already RESOLVED to their
    antecedent surface (operators/coref.py runs upstream; pro>=0 rows
    carry the antecedent, so they are genuine entity mentions); a
    pronoun that found no antecedent keeps its pronoun surface and is
    counted as-is — acceptable weak-supervision noise, same stance the
    KSG node aggregation takes."""
    ordinal = (F.col("sent_id") / SENT_STRIDE).cast("int").alias("text_ordinal")
    # CANONICAL ids when the triples are linked (subj_canon columns
    # present), raw surfaces otherwise — linked input keys the media
    # edges by the same node ids ksg_nodes mints, so graph consumers
    # (export/plot/pagerank) resolve them instead of dangling
    s_col = "subj_canon" if "subj_canon" in triples.columns else "subj"
    o_col = "obj_canon" if "obj_canon" in triples.columns else "obj"
    subj = triples.where(F.col(s_col) != "").select(
        "doc_id", ordinal, F.col(s_col).alias("entity"),
        F.col("subj_ne").alias("etype"),
    )
    obj = triples.where(
        F.col(o_col).isNotNull() & (F.col(o_col) != "")
    ).select(
        "doc_id", ordinal, F.col(o_col).alias("entity"),
        F.col("obj_ne").alias("etype"),
    )
    return subj.unionByName(obj)


def media_entity_edges(
    docs_spans: DataFrame, triples: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Returns (media_nodes, appears_with_edges) in KSG table shapes.

    Edges: (subj=entity, pred='appears_with', obj='media:<ref>',
    weight=#co-occurrences, negative=false, passive=false).
    Nodes:  (node_id='media:<ref>', name=<ref>, rep=<ref>,
    etype=ETYPE_MEDIA, pro=0, count=#adjacent mentions).
    """
    adj = media_adjacency(docs_spans)
    mentions = triple_mentions(triples)
    pairs = adj.join(mentions, ["doc_id", "text_ordinal"]).select(
        "entity",
        "etype",
        F.concat(F.lit("media:"), F.col("media_ref")).alias("media_node"),
        F.col("media_ref"),
    )
    edges = pairs.groupBy("entity", "media_node").agg(
        F.count(F.lit(1)).alias("weight")
    ).select(
        F.col("entity").alias("subj"),
        F.lit("appears_with").alias("pred"),
        F.col("media_node").alias("obj"),
        "weight",
        F.lit(False).alias("negative"),
        F.lit(False).alias("passive"),
    )
    nodes = pairs.groupBy("media_node", "media_ref").agg(
        F.count(F.lit(1)).alias("count")
    ).select(
        F.col("media_node").alias("node_id"),
        F.col("media_ref").alias("name"),
        F.col("media_ref").alias("rep"),
        F.lit(ETYPE_MEDIA).cast("int").alias("etype"),
        F.lit(0).cast("int").alias("pro"),
        F.col("count").cast("long").alias("count"),
    )
    return nodes, edges
