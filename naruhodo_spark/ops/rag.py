"""Graph-RAG context retrieval: seed entities → relevance-ranked
subgraph → verbalized context block for an LLM prompt.

This is the composed retrieval primitive of the GraphRAG line of work
(Edge et al. 2024's local-search mode; He et al. 2024 G-Retriever's
PCST step plays the same role): given the entities mentioned in a
query, select the most *relevant* — not merely nearest — neighborhood
of the KG and render it as text the generator can condition on. The
pieces already exist in this engine; this module composes them
end-to-end so users get one call instead of four:

1. relevance = personalized PageRank from the seed set
   (operators/graphstats.personalized_pagerank — restart AND dangling
   mass return to the seeds, so scores are 'relevance to the
   question', not global importance),
2. entity selection = top_k nodes by rank (TakeOrderedAndProject —
   a k-row result, never a global sort),
3. fact selection = edges of the induced subgraph (both endpoints
   selected), scored by endpoint relevance and capped at max_facts,
4. rendering = the KELM-ablation clause templates
   (ops/verbalize._clause), one sentence per kept fact.

Scale shape: the PPR loop is one equi-join + one map-side-combinable
aggregation per iteration (graphstats' discipline); everything after
it touches only k-row frames — the selected-node set rides two
BROADCAST semi-joins into the edge table, so a 10^12-edge KSG is
filtered map-only; the final cap is TakeOrderedAndProject over the
induced edges. Deterministic: ties break on (node) / (subj, pred,
obj) lexicographic order everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from naruhodo_spark.operators.agg import edge_target
from naruhodo_spark.operators.graphstats import personalized_pagerank
from naruhodo_spark.ops.verbalize import _clause


def graph_rag_context(
    ksg_edges: DataFrame,
    seeds: list[str],
    top_k: int = 20,
    max_facts: int = 30,
    damping: float = 0.85,
    iterations: int = 10,
) -> DataFrame:
    """(fact_order, score, subj, pred, obj, sentence) — the retrieval
    context for ``seeds``: facts of the top_k-relevant entity
    neighborhood, most relevant first. ``score`` is the sum of the two
    endpoints' personalized-PageRank mass (objectless triples target
    their predicate node, the shared edge_target contract, so scores
    agree with every other graph consumer). Feed ``sentence`` to a
    prompt builder (:func:`context_text`) or keep the triple columns
    for structured conditioning."""
    if top_k < 1 or max_facts < 1:
        raise ValueError(
            f"top_k and max_facts must be >= 1, got {top_k}, {max_facts}"
        )
    ranks = personalized_pagerank(
        ksg_edges, seeds, damping=damping, iterations=iterations
    )
    top = ranks.orderBy(F.desc("rank"), F.asc("node")).limit(int(top_k))
    neg = (
        F.col("negative") if "negative" in ksg_edges.columns
        else F.lit(False)
    )
    pas = (
        F.col("passive") if "passive" in ksg_edges.columns
        else F.lit(False)
    )
    edges = ksg_edges.select(
        "subj", "pred", "obj",
        edge_target().alias("_dst"),
        _clause(F.col("subj"), F.col("pred"), F.col("obj"), neg, pas)
        .alias("sentence"),
    )
    s_rank = F.broadcast(top.select(
        F.col("node").alias("subj"), F.col("rank").alias("_s_rank")
    ))
    d_rank = F.broadcast(top.select(
        F.col("node").alias("_dst"), F.col("rank").alias("_d_rank")
    ))
    induced = (
        edges.join(s_rank, "subj")
        .join(d_rank, "_dst")
        .select(
            "subj", "pred", "obj", "sentence",
            (F.col("_s_rank") + F.col("_d_rank")).alias("score"),
        )
    )
    kept = induced.orderBy(
        F.desc("score"), F.asc("subj"), F.asc("pred"), F.asc("obj")
    ).limit(int(max_facts))
    from pyspark.sql import Window as W

    order = W.orderBy(
        F.desc("score"), F.asc("subj"), F.asc("pred"), F.asc("obj")
    )
    return kept.select(
        F.row_number().over(order).alias("fact_order"),
        F.round("score", 9).alias("score"),
        "subj", "pred", "obj", "sentence",
    )


def context_text(context: DataFrame, sep: str = " ") -> str:
    """Render :func:`graph_rag_context` output as one prompt-ready
    string, sentences in fact_order. Driver-side but bounded by
    construction: the input is already capped at max_facts rows."""
    rows = context.select("fact_order", "sentence").collect()
    return sep.join(
        r["sentence"] + "." for r in sorted(rows, key=lambda r: r[0])
    )
