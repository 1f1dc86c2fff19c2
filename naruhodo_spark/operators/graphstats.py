"""Graph analytics over the materialized KSG — entity salience and
degree structure.

The reference exposes its graph to networkx, where users run salience /
centrality ad hoc [PK naruhodo exposes ``parser.G`` as a networkx
DiGraph]. At 10^12-document scale the KSG never fits one machine, so the
two most-used analyses are reimplemented as DataFrame programs:

- :func:`pagerank` — weighted PageRank by power iteration. Each round is
  one equi-join (ranks ⋈ edges on src) + one aggregation (sum by dst):
  both shuffle on the node key, and AQE's skew-join splitting handles
  hub nodes (the KSG is scale-free; 'god entities' are the norm, not the
  exception). Dangling mass is a one-scalar driver aggregate per round —
  O(1) driver traffic. ``localCheckpoint`` every round truncates the
  iterative lineage exactly like the CC loop (operators/canon.py).
- :func:`degree_stats` — in/out degree + strength per node in one
  full-outer aggregation pass.

Convergence note: fixed iteration count (default 15 ≈ what a damping of
0.85 needs for rank ordering to stabilize on scale-free graphs) rather
than an L1-delta test — a delta test costs an extra join per round and
the consumers here (top-k entity salience) only need ordering stability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _edge_pairs(ksg_edges: DataFrame) -> DataFrame:
    """(src, dst, weight) directed pairs; objectless triples point at the
    predicate node via the shared contract (operators/agg.edge_target)."""
    from naruhodo_spark.operators.agg import edge_target

    dst = edge_target()
    return ksg_edges.select(
        F.col("subj").alias("src"), dst.alias("dst"),
        F.col("weight").cast("double").alias("weight"),
    )


def pagerank(
    ksg_edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 15,
) -> DataFrame:
    """Weighted PageRank over KSG edges → (node, rank), sum(rank)=1.

    rank_{t+1}(v) = (1-d)/N + d * (Σ_{u→v} rank_t(u)·w(u,v)/W_out(u)
                                   + dangling_t/N)
    """
    spark = ksg_edges.sparkSession
    edges = _edge_pairs(ksg_edges)
    # normalized transition weights: one agg + one join, reused all rounds
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("w_out"))
    trans = (
        edges.join(out_w, "src")
        .select("src", "dst", (F.col("weight") / F.col("w_out")).alias("p"))
        .localCheckpoint()
    )

    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return spark.createDataFrame([], "node string, rank double")

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    has_out = out_w.select(F.col("src").alias("node"))

    for _ in range(iterations):
        # dangling mass: total rank parked on nodes with no out-edges
        dangling = (
            ranks.join(has_out, "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        contrib = (
            trans.join(ranks, trans["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("rank")).alias("c"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
                 ).alias("rank"),
            )
            .localCheckpoint()  # truncate lineage every round
        )
    return ranks


def degree_stats(ksg_edges: DataFrame) -> DataFrame:
    """(node, out_degree, in_degree, out_strength, in_strength) — one
    aggregation per direction + one full-outer merge."""
    edges = _edge_pairs(ksg_edges)
    outs = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_degree"),
        F.sum("weight").alias("out_strength"),
    )
    ins = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("in_degree"),
        F.sum("weight").alias("in_strength"),
    )
    return (
        outs.join(ins, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            F.coalesce("out_strength", F.lit(0.0)).alias("out_strength"),
            F.coalesce("in_strength", F.lit(0.0)).alias("in_strength"),
        )
    )


def k_hop_subgraph(
    ksg_edges: DataFrame,
    sources: list[str],
    k: int = 2,
    direction: str = "both",
) -> tuple[DataFrame, DataFrame]:
    """K-hop neighborhood extraction → (nodes(node, dist), induced edges).

    The reference exposes its graph to networkx, where this is
    ``nx.ego_graph`` / ``descendants`` — driver-bound. Here each hop is
    one equi-join of the frontier against the edge table (AQE picks a
    broadcast build side while the frontier is small — the usual case
    for entity-centric queries; a frontier that outgrows broadcast
    degrades to a shuffle join rather than an OOM, which is why the
    hint is NOT forced) followed by an anti-join against the visited
    set; k is a hard bound
    so the plan is k joins deep, ``localCheckpoint`` per hop truncates
    lineage exactly like the CC/PageRank loops. The induced edge set is
    a double semi-join against the visited nodes, identical to the plot
    sink's rule.

    direction: 'out' follows subj→obj, 'in' follows obj→subj, 'both'
    unions the two (undirected neighborhood).
    """
    if direction not in ("out", "in", "both"):
        raise ValueError(f"direction must be out/in/both, got {direction!r}")
    spark = ksg_edges.sparkSession
    pairs = _edge_pairs(ksg_edges)
    hops = pairs.select("src", "dst")
    if direction == "in":
        hops = hops.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    elif direction == "both":
        hops = hops.unionByName(
            hops.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    hops = hops.distinct().localCheckpoint()

    visited = spark.createDataFrame(
        [(s, 0) for s in sources], "node string, dist int"
    )
    frontier = visited.select("node")
    for depth in range(1, k + 1):
        nxt = (
            hops.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(
            nxt.select("node", F.lit(depth).alias("dist"))
        ).localCheckpoint()
        frontier = nxt

    keep = visited.select("node")
    induced = (
        pairs.join(keep.withColumnRenamed("node", "src"), "src", "left_semi")
        .join(keep.withColumnRenamed("node", "dst"), "dst", "left_semi")
        .select("src", "dst", "weight")
    )
    return visited, induced
