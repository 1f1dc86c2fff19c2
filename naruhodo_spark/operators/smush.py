"""owl:sameAs smushing — collapse co-referent entities onto canonical
representatives, the standard Linked-Data consolidation step (the LOD
community calls it "smushing"; Ding et al., "owl:sameAs and Linked
Data", WWW 2010 analyze exactly this closure). After entity resolution
/ fusion asserts (a, same_as, b) links, downstream queries want ONE
node per real-world entity: every edge is rewritten onto the
representative, the sameAs links themselves drop out, and a membership
table keeps the original ids recoverable.

sameAs is symmetric-transitive, so the equivalence classes are the
CONNECTED COMPONENTS of the sameAs subgraph — computed with the shared
size-gated star contraction (operators/canon.connected_components: the
same kernel the KG canonicalizer and the ER closure use), label = the
lexicographic-min member (deterministic, partition-invariant).

Scale shape at 10^12 edges:

- the sameAs subgraph is a predicate-filtered slice (pushdown) and is
  typically vastly smaller than the graph; CC runs on it alone;
- the rewrite is TWO equi-joins of the edge table against the
  (node, label) membership — src then dst — each a plain shuffle on a
  node key; nodes outside any sameAs class pass through a left join +
  coalesce untouched (membership is NOT broadcast by default: at web
  scale the co-reference table can be billions of rows; Spark's AQE
  still broadcasts it when it measures small);
- output weights: parallel edges that become identical after the
  rewrite are NOT merged here (bag semantics, same contract as the
  motif engine) — callers aggregate downstream where their weight
  semantics live. ``dedupe=True`` opts into a distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from naruhodo_spark.operators.canon import connected_components

SAME_AS = "same_as"


def sameas_classes(
    edges: DataFrame, sameas_pred: str = SAME_AS
) -> DataFrame:
    """(node, label) — every node mentioned in a sameAs link, labeled
    by its equivalence class's lexicographic-min member."""
    links = edges.where(F.col("pred") == sameas_pred).select("src", "dst")
    return connected_components(links)


def smush(
    edges: DataFrame,
    sameas_pred: str = SAME_AS,
    dedupe: bool = False,
) -> dict[str, DataFrame]:
    """Collapse the graph onto sameAs representatives.

    Returns dict:
      - ``edges``: (src, pred, dst) with every endpoint rewritten to
        its class label and the sameAs links removed; self-loops that
        ARISE FROM the rewrite (two linked entities also sharing an
        ordinary edge) are kept — dropping them silently would lose
        asserted facts; ``dedupe=True`` applies a distinct.
      - ``classes``: (node, label) membership for every smushed node
        (recoverability / provenance).
    """
    classes = sameas_classes(edges, sameas_pred).localCheckpoint(
        eager=False
    )
    rest = edges.where(F.col("pred") != sameas_pred)
    by_src = classes.select(
        F.col("node").alias("src"), F.col("label").alias("_src_label")
    )
    by_dst = classes.select(
        F.col("node").alias("dst"), F.col("label").alias("_dst_label")
    )
    out = (
        rest.join(by_src, "src", "left")
        .join(by_dst, "dst", "left")
        .select(
            F.coalesce("_src_label", "src").alias("src"),
            "pred",
            F.coalesce("_dst_label", "dst").alias("dst"),
        )
    )
    if dedupe:
        out = out.distinct()
    return {"edges": out, "classes": classes}
