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


def triangle_counts(ksg_edges: DataFrame) -> DataFrame:
    """(node, triangles, degree, clustering): per-node triangle counts
    and local clustering coefficient over the UNDIRECTED simple graph
    (direction and parallel edges dropped — a triangle is a topology
    fact, not a predicate fact).

    Algorithm: degree-ordered edge orientation (Suri & Vassilvitskii,
    WWW 2011 "Counting Triangles and the Curse of the Last Reducer" —
    public literature): orient every undirected edge from the
    (degree, node)-smaller endpoint to the larger, then join oriented
    wedges (a→b, a→c with b<c under the same order) against the
    oriented edge set. Each triangle is found exactly once, at its
    lowest-ordered vertex, and — the scale point — the wedge fan-out of
    a node is bounded by its HIGHER-ordered neighbors only, which caps
    total wedges at O(m^{3/2}) regardless of hot-node degree: the "last
    reducer" that enumerates a celebrity node's full neighbor square
    never exists under this orientation.

    Output covers every node of the graph (0-triangle rows kept);
    clustering = 2·T / (deg·(deg−1)), 0.0 where degree < 2.
    Deterministic, repartition-invariant."""
    raw = _edge_pairs(ksg_edges)
    und = (
        raw.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)  # degree pass + 3 join scans
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    # orientation key: (degree, node) totally orders nodes
    da = deg.select(
        F.col("node").alias("a"), F.col("degree").alias("deg_a")
    )
    db = deg.select(
        F.col("node").alias("b"), F.col("degree").alias("deg_b")
    )
    keyed = und.join(da, "a").join(db, "b")
    lo_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    ori = keyed.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
    ).localCheckpoint(eager=False)  # wedge self-join reads it twice
    # wedges at the lowest-ordered vertex: (lo, u, v) with u < v in the
    # plain string order (canonical wedge id — both are higher-ordered
    # than lo already, so any total order dedups the pair)
    w1 = ori.select(F.col("lo"), F.col("hi").alias("u"))
    w2 = ori.select(F.col("lo"), F.col("hi").alias("v"))
    wedges = w1.join(w2, "lo").where(F.col("u") < F.col("v"))
    # close the wedge: (u, v) must be an edge. Wedges enforce u < v in
    # plain string order and und is already canonical (a = least <
    # b = greatest), so the closing edge can ONLY match as (a→u, b→v) —
    # no swapped leg needed (a union here would double the build side
    # of the heaviest join for zero extra matches)
    closed = wedges.join(
        und.select(F.col("a").alias("u"), F.col("b").alias("v")),
        ["u", "v"],
    )
    # each closed wedge is one triangle touching lo, u and v once each
    per_node = (
        closed.select(F.explode(F.array("lo", "u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return deg.join(per_node, "node", "left").select(
        "node",
        F.coalesce("triangles", F.lit(0)).alias("triangles"),
        "degree",
        F.when(
            F.col("degree") >= 2,
            F.round(
                2.0
                * F.coalesce("triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1)),
                4,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering"),
    )


def landmark_distances(
    ksg_edges: DataFrame,
    landmarks: list[str],
    max_dist: int = 6,
    direction: str = "both",
) -> DataFrame:
    """(node, landmark, dist) — BFS distance from every node to each
    landmark, all landmarks in ONE labeled frontier sweep.

    This is the landmark/distance-sketch primitive (Das Sarma et al.,
    WSDM'10): with L landmarks precomputed, any-pair shortest-path
    queries are answered driver-free as min over landmarks of
    d(u,l)+d(l,v) (:func:`approx_distance`) — the networkx
    ``shortest_path_length`` analog that works when the graph doesn't
    fit one machine. Each round is one frontier equi-join + one
    anti-join against the visited table, both keyed on (node, landmark)
    — node alone would be a hot key when frontiers from different
    landmarks overlap; the composite key keeps the shuffle uniform.
    max_dist bounds plan depth like k in k_hop_subgraph;
    localCheckpoint per round truncates the iterative lineage.
    """
    if direction not in ("out", "in", "both"):
        raise ValueError(f"direction must be out/in/both, got {direction!r}")
    spark = ksg_edges.sparkSession
    hops = _edge_pairs(ksg_edges).select("src", "dst")
    if direction == "in":
        hops = hops.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    elif direction == "both":
        hops = hops.unionByName(
            hops.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    hops = hops.distinct().localCheckpoint()

    # seed only landmarks that exist in the graph: a typo'd landmark
    # must be ABSENT from the output, not asserted present at dist 0;
    # distinct() also collapses duplicated landmark names
    seeds = spark.createDataFrame(
        [(lm, lm, 0) for lm in landmarks],
        "node string, landmark string, dist int",
    ).distinct()
    graph_nodes = hops.select("src").union(hops.select("dst")).distinct()
    visited = seeds.join(
        graph_nodes.withColumnRenamed("src", "node"), "node", "left_semi"
    ).localCheckpoint()
    frontier = visited.select("node", "landmark")
    for depth in range(1, max_dist + 1):
        nxt = (
            hops.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), "landmark")
            .distinct()
            .join(
                visited.select("node", "landmark"),
                ["node", "landmark"],
                "left_anti",
            )
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(
            nxt.select("node", "landmark", F.lit(depth).alias("dist"))
        ).localCheckpoint()
        frontier = nxt
    return visited


def approx_distance(dists: DataFrame, pairs: DataFrame) -> DataFrame:
    """(u, v, dist_ub) — landmark upper bound min_l d(u,l)+d(l,v) for
    each requested (u, v) pair, as two equi-joins of the pairs frame
    against the precomputed landmark table + one groupBy. Exact when
    some shortest u–v path passes a landmark; an upper bound otherwise
    (the standard landmark-sketch trade). Pairs whose endpoints share
    no reachable landmark are absent from the output (disconnected as
    far as the sketch can see)."""
    du = dists.select(
        F.col("node").alias("u"), "landmark", F.col("dist").alias("d_u")
    )
    dv = dists.select(
        F.col("node").alias("v"), "landmark", F.col("dist").alias("d_v")
    )
    return (
        pairs.join(du, "u")
        .join(dv, ["v", "landmark"])
        .groupBy("u", "v")
        .agg(F.min(F.col("d_u") + F.col("d_v")).alias("dist_ub"))
    )


def hits(
    ksg_edges: DataFrame,
    iterations: int = 20,
) -> DataFrame:
    """(node, hub, authority) — Kleinberg's HITS by power iteration,
    the same loop discipline as :func:`pagerank`: each round is one
    equi-join + one aggregation per direction (authority(v) = Σ hub(u)
    over u→v, then hub(u) = Σ authority(v) over u→v), with L2
    normalization from a single collected scalar per direction (O(1)
    driver traffic) and localCheckpoint lineage truncation. Stats
    growth is linear in rounds (one self-reference per update — the
    safe shape, see ops/kgembed._truncate for the compounding case).
    Deterministic: init 1/√n, fixed iteration count."""
    spark = ksg_edges.sparkSession
    pairs = (
        _edge_pairs(ksg_edges).select("src", "dst").distinct()
        .localCheckpoint()
    )
    nodes = (
        pairs.select(F.col("src").alias("node"))
        .union(pairs.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return spark.createDataFrame(
            [], "node string, hub double, authority double"
        )
    init = 1.0 / (n ** 0.5)
    hub = nodes.select("node", F.lit(init).alias("s")).localCheckpoint()

    def _norm(df):
        tot = df.agg(F.sum(F.col("s") * F.col("s"))).head()[0] or 0.0
        if tot <= 0:
            return df
        return df.select("node", (F.col("s") / float(tot ** 0.5)).alias("s"))

    auth = hub
    for _ in range(int(iterations)):
        auth = _norm(
            pairs.join(hub.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("s").alias("s"))
            # sink-only/source-only nodes keep a 0 row so the output
            # always covers every node
            .join(nodes, "node", "right")
            .select("node", F.coalesce("s", F.lit(0.0)).alias("s"))
        ).localCheckpoint()
        hub = _norm(
            pairs.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("s").alias("s"))
            .join(nodes, "node", "right")
            .select("node", F.coalesce("s", F.lit(0.0)).alias("s"))
        ).localCheckpoint()
    return hub.select("node", F.col("s").alias("hub")).join(
        auth.select("node", F.col("s").alias("authority")), "node"
    )


def label_propagation(
    ksg_edges: DataFrame,
    max_iterations: int = 10,
) -> DataFrame:
    """Community detection by synchronous weighted label propagation
    (Raghavan 2007) → (node, label); label = the community's
    max-member-id representative.

    Each round every node adopts the label with the highest total
    incident edge weight among its neighbors (undirected view); ties
    break to the lexicographically larger label, which together with
    synchronous updates makes the result deterministic and
    repartition-invariant. Synchronous LPA can oscillate on bipartite
    substructures, so the loop stops at ``max_iterations`` even if not
    converged (converged = zero labels changed, an O(1) driver scalar).

    Scale shape: one equi-join (labels ⋈ undirected edges) + one
    two-column aggregation per round — the same linear per-round cost
    as pagerank/hits; localCheckpoint truncates lineage every round and
    the superseded round's blocks are unpersisted eagerly.
    """
    spark = ksg_edges.sparkSession
    edges = _edge_pairs(ksg_edges)
    und = (
        edges.unionByName(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"),
                "weight",
            )
        )
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
        .localCheckpoint()
    )
    nodes = und.select(F.col("src").alias("node")).distinct().localCheckpoint()
    labels = nodes.select("node", F.col("node").alias("label"))

    prev_ck = None
    for _ in range(max_iterations):
        # each node's neighbor labels, weighted; pick (max weight, then
        # max label) — max(struct(...)) is one partial-aggregable agg
        neigh = (
            und.join(labels, und["dst"] == labels["node"])
            .groupBy("src", "label")
            .agg(F.sum("weight").alias("w"))
            .groupBy("src")
            .agg(F.max(F.struct("w", "label")).alias("best"))
            .select(F.col("src").alias("node"), F.col("best.label").alias("new_label"))
        )
        nxt = (
            labels.join(neigh, "node", "left")
            .select(
                "node",
                F.coalesce("new_label", "label").alias("label"),
                (F.coalesce("new_label", "label") != F.col("label")).alias("_chg"),
            )
            .localCheckpoint()
        )
        changed = nxt.agg(F.sum(F.col("_chg").cast("int"))).collect()[0][0]
        if prev_ck is not None:
            prev_ck.unpersist()
        prev_ck, labels = nxt, nxt.select("node", "label")
        if not changed:
            break
    return labels


def personalized_pagerank(
    ksg_edges: DataFrame,
    seeds: list[str],
    damping: float = 0.85,
    iterations: int = 15,
) -> DataFrame:
    """Personalized PageRank → (node, rank), sum(rank)=1: random walk
    with restart to the ``seeds`` set — 'relevance to these entities',
    the standard seed-expansion / related-entity primitive.

    Identical loop shape to :func:`pagerank` (one equi-join + one agg
    per round, O(1) driver scalars, localCheckpoint per round); the
    teleport vector is 1/len(seeds) on seeds and 0 elsewhere, so both
    the restart mass and the dangling mass return to the seeds instead
    of spreading uniformly.
    """
    if not seeds:
        raise ValueError("personalized_pagerank needs at least one seed")
    spark = ksg_edges.sparkSession
    edges = _edge_pairs(ksg_edges)
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
    if nodes.count() == 0:
        return spark.createDataFrame([], "node string, rank double")
    # teleport only to seeds that EXIST in the graph, renormalized over
    # the matches: a typo'd seed must not silently leak restart mass
    # (half-lost mass skews comparisons across seed sets; all seeds
    # unknown would return all-zero ranks with no error)
    matched = [
        r["node"]
        for r in nodes.where(F.col("node").isin(list(set(seeds)))).collect()
    ]
    if not matched:
        raise ValueError(
            f"personalized_pagerank: none of the {len(set(seeds))} seeds "
            "exist as graph nodes — check canonicalized node names"
        )
    tele = F.when(
        F.col("node").isin(matched), F.lit(1.0 / len(matched))
    ).otherwise(F.lit(0.0))

    ranks = nodes.select("node", tele.alias("rank"))
    has_out = out_w.select(F.col("src").alias("node"))

    prev_ck = None
    for _ in range(iterations):
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
        restart = 1.0 - damping + damping * dangling
        nxt = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (tele * F.lit(restart)
                 + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
                 ).alias("rank"),
            )
            .localCheckpoint()
        )
        if prev_ck is not None:
            prev_ck.unpersist()
        prev_ck = ranks = nxt
    return ranks


def betweenness_sampled(
    ksg_edges: DataFrame,
    n_sources: int = 16,
    max_dist: int = 6,
    direction: str = "both",
    seed: str = "bc42",
) -> DataFrame:
    """Sampled Brandes betweenness centrality → (node, betweenness):
    the classic bridge-detector (Brandes 2001), estimated from a
    deterministic hash-picked source sample (Brandes & Pich 2007) —
    exact when ``n_sources`` ≥ the node count, an unbiased
    n/|sample|-scaled estimate otherwise.

    Two frontier phases, both keyed (source, node) like
    landmark_distances (composite keys keep overlapping frontiers
    uniform — node alone would be a hot key):

    - FORWARD (≤ max_dist rounds): BFS accumulating σ (shortest-path
      counts, one groupBy sum per round) and the shortest-path DAG
      edges (pred at depth d−1 → node first reached at depth d);
    - BACKWARD (≤ max_dist rounds, deepest level first): dependency
      accumulation δ(v) += (σ_v/σ_w)·(1+δ(w)) over DAG edges into the
      level being retired — one equi-join + one groupBy per level.

    Driver traffic: the source sample (n_sources rows) and one depth
    scalar; every other structure stays distributed. localCheckpoint
    per round truncates the iterative lineage.
    """
    if direction not in ("out", "in", "both"):
        raise ValueError(f"direction must be out/in/both, got {direction!r}")
    if n_sources < 1:
        raise ValueError(f"n_sources must be >= 1, got {n_sources}")
    spark = ksg_edges.sparkSession
    hops = _edge_pairs(ksg_edges).select("src", "dst")
    if direction == "in":
        hops = hops.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    elif direction == "both":
        hops = hops.unionByName(
            hops.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    hops = hops.where(F.col("src") != F.col("dst")).distinct().localCheckpoint()

    nodes = (
        hops.select(F.col("src").alias("node"))
        .unionByName(hops.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return spark.createDataFrame([], "node string, betweenness double")
    # deterministic sample: k smallest content hashes (bounded top-k —
    # TakeOrderedAndProject, never a full sort materialization)
    k = min(int(n_sources), n_nodes)
    sources = [
        r["node"]
        for r in nodes.orderBy(
            F.xxhash64(F.lit(seed), "node"), F.col("node")
        ).limit(k).collect()
    ]
    scale = n_nodes / float(k)

    visited = spark.createDataFrame(
        [(s, s, 0, 1.0) for s in sources],
        "source string, node string, dist int, sigma double",
    ).localCheckpoint()
    frontier = visited
    dag = None  # (source, pred, node, depth)
    max_depth = 0
    for depth in range(1, max_dist + 1):
        cand = (
            hops.join(
                frontier.select(
                    "source", F.col("node").alias("src"),
                    F.col("sigma").alias("sigma_pred"),
                ),
                "src",
            )
            .select(
                "source", F.col("src").alias("pred"),
                F.col("dst").alias("node"), "sigma_pred",
            )
            # only edges into nodes NOT yet visited (first reached now)
            .join(
                visited.select("source", "node"),
                ["source", "node"], "left_anti",
            )
            .localCheckpoint()
        )
        if cand.isEmpty():
            break
        max_depth = depth
        new_nodes = cand.groupBy("source", "node").agg(
            F.sum("sigma_pred").alias("sigma")
        ).select("source", "node", F.lit(depth).alias("dist"), "sigma")
        dag_d = cand.select(
            "source", "pred", "node", F.lit(depth).alias("depth")
        )
        dag = dag_d if dag is None else dag.unionByName(dag_d)
        visited = visited.unionByName(new_nodes).localCheckpoint()
        frontier = new_nodes

    # backward dependency accumulation, deepest level first
    delta = visited.select("source", "node", F.lit(0.0).alias("delta"))
    if dag is not None:
        dag = dag.localCheckpoint()
        sig = visited.select("source", "node", "sigma")
        for depth in range(max_depth, 0, -1):
            contribs = (
                dag.where(F.col("depth") == depth)
                .join(
                    delta.select(
                        "source", "node", F.col("delta").alias("delta_w")
                    ),
                    ["source", "node"],
                )
                .join(
                    sig.select(
                        "source", "node", F.col("sigma").alias("sigma_w")
                    ),
                    ["source", "node"],
                )
                .join(
                    sig.select(
                        "source", F.col("node").alias("pred"),
                        F.col("sigma").alias("sigma_v"),
                    ),
                    ["source", "pred"],
                )
                .groupBy("source", F.col("pred").alias("node"))
                .agg(
                    F.sum(
                        (F.col("sigma_v") / F.col("sigma_w"))
                        * (F.lit(1.0) + F.col("delta_w"))
                    ).alias("d_add")
                )
            )
            delta = (
                delta.join(contribs, ["source", "node"], "left")
                .select(
                    "source", "node",
                    (F.col("delta") + F.coalesce("d_add", F.lit(0.0))
                     ).alias("delta"),
                )
                .localCheckpoint()
            )
    bc = (
        delta.where(F.col("source") != F.col("node"))
        .groupBy("node")
        .agg((F.sum("delta") * F.lit(scale)).alias("betweenness"))
    )
    # nodes never reached (or with zero dependency) still appear, at 0
    return (
        nodes.join(bc, "node", "left")
        .select("node", F.coalesce("betweenness", F.lit(0.0)).alias("betweenness"))
    )


def shortest_path(
    ksg_edges: DataFrame,
    src: str,
    dst: str,
    max_dist: int = 6,
    direction: str = "both",
) -> "list[str]":
    """One shortest path src→dst as a node list ([] if none within
    ``max_dist``) — the networkx ``shortest_path(G, a, b)`` analog for
    a graph that doesn't fit one machine.

    Forward BFS with parent pointers (min parent per node for
    determinism), stopping the moment ``dst`` is labeled; the
    reconstruction then walks ≤ max_dist parent lookups against the
    checkpointed visited table — path-length-many bounded driver
    round-trips, never a collect of the visited set (which at 10^12
    scale is the whole reachable component). For many-pair workloads
    use landmark_distances/approx_distance instead: per-pair exact BFS
    is inherently a per-query scan."""
    if direction not in ("out", "in", "both"):
        raise ValueError(f"direction must be out/in/both, got {direction!r}")
    spark = ksg_edges.sparkSession
    hops = _edge_pairs(ksg_edges).select("src", "dst")
    if direction == "in":
        hops = hops.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    elif direction == "both":
        hops = hops.unionByName(
            hops.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    hops = hops.distinct().localCheckpoint()
    if src == dst:
        return [src]

    visited = spark.createDataFrame(
        [(src, 0, None)], "node string, dist int, parent string"
    ).localCheckpoint()
    frontier = visited.select("node")
    found = False
    for depth in range(1, max_dist + 1):
        nxt = (
            hops.join(frontier.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("src").alias("parent"))
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(depth).alias("dist"), "parent")
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        if nxt.where(F.col("node") == dst).count() > 0:
            found = True
            break
        frontier = nxt.select("node")
    if not found:
        return []
    path = [dst]
    cur = dst
    for _ in range(max_dist):
        row = visited.where(F.col("node") == cur).select("parent").head()
        if row is None or row["parent"] is None:
            break
        cur = row["parent"]
        path.append(cur)
    return list(reversed(path))


def degree_assortativity(
    ksg_edges: DataFrame, _und_deg: tuple | None = None
) -> DataFrame:
    """One row (assortativity double) — Newman's degree assortativity
    (Newman, PRL 2002) over the undirected simple graph: the Pearson
    correlation of endpoint degrees with each edge counted in both
    orientations (the undirected convention; correlation is
    shift-invariant, so the remaining-degree −1 makes no difference).

    Plan: the und/deg canonicalization (one distinct + one uniform
    groupBy), two degree joins, ONE moment aggregate — all map-side
    combinable; no iteration. A zero-variance degree sequence (regular
    graph) yields NULL on every engine rather than an ANSI-mode raise
    or an engine-dependent NaN. ``_und_deg``: pass precomputed
    (und, deg) frames to share the canonicalization with a caller that
    already built them (graph_summary) instead of re-scanning."""
    if _und_deg is not None:
        und, deg = _und_deg
    else:
        raw = _edge_pairs(ksg_edges)
        und = (
            raw.select(
                F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"),
            )
            .where(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=False)  # degree pass + join scan
        )
        deg = (
            und.select(F.col("a").alias("node"))
            .unionByName(und.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("degree"))
        )
    keyed = (
        und.join(deg.select(F.col("node").alias("a"), F.col("degree").alias("deg_a")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("degree").alias("deg_b")), "b")
        .select("deg_a", "deg_b")
    )
    sym = keyed.unionByName(
        keyed.select(F.col("deg_b").alias("deg_a"), F.col("deg_a").alias("deg_b"))
    )
    # Pearson from moments rather than F.corr: ANSI mode makes corr
    # RAISE on zero variance (regular graphs), and the explicit formula
    # is arithmetic-identical to the SQL mirror. nullif guards the
    # degenerate case to NULL on every engine.
    m = sym.agg(
        F.avg(F.col("deg_a") * F.col("deg_b")).alias("mxy"),
        F.avg("deg_a").alias("mx"),
        F.avg("deg_b").alias("my"),
        F.stddev_pop("deg_a").alias("sx"),
        F.stddev_pop("deg_b").alias("sy"),
    )
    return m.select(
        F.round(
            (F.col("mxy") - F.col("mx") * F.col("my"))
            / F.nullif(F.col("sx") * F.col("sy"), F.lit(0.0)),
            4,
        ).alias("assortativity")
    )


def graph_summary(ksg_edges: DataFrame) -> DataFrame:
    """One-row topology report over the undirected simple graph:
    (n_nodes, n_edges, avg_degree, max_degree, n_triangles,
    transitivity, avg_clustering, assortativity) — the KG counterpart
    of ts_corpus_report.

    Everything except assortativity is ONE aggregate over
    :func:`triangle_counts` (which already bounds wedge fan-out at
    O(m^1.5) via degree-ordered orientation); assortativity rides in
    as a 1-row scalar crossJoin (the repo's accepted scalar-ride
    shape) and SHARES the degree table triangle_counts already
    computed (its und canonicalization is rebuilt once — one distinct
    — rather than re-running the degree groupBy too). transitivity =
    3·T / wedges computed as Σ per-node triangles / Σ deg·(deg−1)/2 —
    identical arithmetic to the SQL mirror; avg_clustering averages
    the 4-dp-rounded per-node coefficients so both engines round at
    the same point."""
    tc = triangle_counts(ksg_edges).localCheckpoint(eager=False)
    wedges = F.sum(F.col("degree") * (F.col("degree") - 1)) / 2.0
    summary = tc.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum("degree") / 2).cast("long").alias("n_edges"),
        F.round(F.avg("degree"), 4).alias("avg_degree"),
        F.max("degree").alias("max_degree"),
        (F.sum("triangles") / 3).cast("long").alias("n_triangles"),
        F.when(
            wedges > 0, F.round(F.sum("triangles") / wedges, 4)
        ).otherwise(F.lit(0.0)).alias("transitivity"),
        F.round(F.avg("clustering"), 4).alias("avg_clustering"),
    )
    raw = _edge_pairs(ksg_edges)
    und = (
        raw.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = tc.select("node", "degree")
    return summary.crossJoin(
        degree_assortativity(ksg_edges, _und_deg=(und, deg))
    )


def top_facts(ksg_edges: DataFrame, k: int = 5) -> DataFrame:
    """(subj, pred, obj, weight, fact_rank) — the k most salient facts
    per entity, predicate-DIVERSE: facts are ranked per (subj, pred) by
    weight first, then interleaved across predicates, so an entity with
    900 'visit' edges and 3 'is_a' edges still surfaces its types in
    the top k. This is the entity-summarization primitive (the 'info
    panel' selection problem, cf. Thalhammer-Rettinger RELIN/SUMMARUM
    line of work) and the per-entity context selector for RAG prompts.

    Plan: two row_number windows, both hash-partitioned on subj (the
    second) and (subj, pred) (the first) — uniform keys, no global
    sort. Per-task work is bounded by entity degree; god entities
    should be capped upstream (motif.cap_hubs) like every other
    degree-quadratic consumer. Ties break deterministically on
    (pred, obj) lexicographic order, so output is partition-invariant.
    """
    from pyspark.sql import Window as W

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    per_pred = W.partitionBy("subj", "pred").orderBy(
        F.desc("weight"), F.asc("obj")
    )
    across = W.partitionBy("subj").orderBy(
        F.asc("pred_rank"), F.desc("weight"), F.asc("pred"), F.asc("obj")
    )
    return (
        ksg_edges.select("subj", "pred", "obj", "weight")
        .withColumn("pred_rank", F.row_number().over(per_pred))
        .withColumn("fact_rank", F.row_number().over(across))
        .where(F.col("fact_rank") <= int(k))
        .drop("pred_rank")
    )


def k_core(ksg_edges: DataFrame, k: int, max_rounds: int = 100) -> DataFrame:
    """(node, degree) — the k-core of the UNDIRECTED simple graph: the
    maximal induced subgraph where every node keeps degree >= k
    (Seidman, Social Networks 1983; the standard KG-curation trim —
    peel the sparse periphery, keep the dense backbone that carries the
    signal for embedding training and community work). ``degree`` is
    the node's degree INSIDE the core.

    Algorithm: distributed iterative peeling — per round ONE uniform
    degree groupBy + TWO semi-joins restricting the edge list to
    surviving endpoints; rounds = peeling depth (bounded by the
    longest chain of cascading removals, usually << diameter), with a
    loud RuntimeError at ``max_rounds`` (never a silent partial peel).
    The edge frame localCheckpoints per round (CC discipline) so
    lineage and Catalyst stats stay flat; the convergence probe is one
    COUNT of the surviving-node frame — O(1) driver traffic per round.

    Empty result when no k-core exists. Directionality and edge
    multiplicity are deliberately collapsed (core theory is about the
    simple undirected graph); self-loops are dropped.
    """
    if k < 1:
        raise ValueError(f"k_core: k must be >= 1, got {k}")
    pairs = _edge_pairs(ksg_edges).select("src", "dst")
    und = (
        pairs.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .localCheckpoint()
    )
    prev_nodes = -1
    for _ in range(max_rounds):
        deg = (
            und.select(F.col("a").alias("node"))
            .unionByName(und.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("degree"))
        )
        keep = deg.where(F.col("degree") >= k).localCheckpoint()
        n = keep.count()
        if n == prev_nodes:
            return keep
        if n == 0:
            return keep
        prev_nodes = n
        und = (
            und.join(
                keep.select(F.col("node").alias("a")), "a", "left_semi"
            )
            .join(keep.select(F.col("node").alias("b")), "b", "left_semi")
            .localCheckpoint()
        )
    raise RuntimeError(
        f"k_core did not stabilize in {max_rounds} rounds — raise "
        "max_rounds (rounds track the cascade depth of peeled nodes)"
    )


def quotient_graph(
    ksg_edges: DataFrame,
    groups: DataFrame,
    by_pred: bool = False,
    ungrouped: str = "_ungrouped",
) -> DataFrame:
    """(src_group, dst_group[, pred], n_edges, total_weight,
    n_src_nodes, n_dst_nodes) — the typed quotient (SNAP-style)
    summary of the KSG under a node→group assignment (Tian et al.,
    SIGMOD 2008 "Efficient Aggregation for Graph Summarization"):
    collapse every node into its group and aggregate the edges between
    groups. THE way to look at a 10^12-document KSG at all — the
    summary is |groups|² ≤ (and in practice ≪) |edges| sized, and the
    group column composes with everything that emits one
    (entity types from linking, LPA communities, k-means clusters,
    SDType inferences).

    ``groups``: (name, group). Nodes missing from it land in the
    ``ungrouped`` sentinel group (left joins + coalesce — the
    no-silent-drops policy; pass a closed-world table and filter the
    sentinel out downstream if drops are wanted). Duplicate names in
    ``groups`` would row-multiply edges — collapsed here with max()
    exactly like link.py's alias guard.

    Shape: two uniform equi-joins on the node key (group table is
    node-sized, shuffles uniformly; hub GROUPS are fine — the skew is
    absorbed by the map-side-combinable final groupBy) + ONE groupBy.
    Distinct endpoint counts ride the same aggregate as
    count_distinct — no extra pass.
    """
    g = groups.groupBy("name").agg(F.max("group").alias("group"))
    e = ksg_edges.select(
        "subj",
        "pred",
        "obj",
        F.coalesce(F.col("weight").cast("double"), F.lit(1.0)).alias(
            "weight"
        ),
    )
    e = (
        e.join(
            g.select(
                F.col("name").alias("subj"), F.col("group").alias("src_group")
            ),
            "subj",
            "left",
        )
        .join(
            g.select(
                F.col("name").alias("obj"), F.col("group").alias("dst_group")
            ),
            "obj",
            "left",
        )
        .withColumn("src_group", F.coalesce("src_group", F.lit(ungrouped)))
        .withColumn("dst_group", F.coalesce("dst_group", F.lit(ungrouped)))
    )
    keys = ["src_group", "dst_group"] + (["pred"] if by_pred else [])
    return e.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.round(F.sum("weight"), 4).alias("total_weight"),
        F.countDistinct("subj").alias("n_src_nodes"),
        F.countDistinct("obj").alias("n_dst_nodes"),
    )


def modularity(
    ksg_edges: DataFrame, communities: DataFrame
) -> DataFrame:
    """(community, n_nodes, internal_weight, total_strength,
    contribution) — Newman weighted modularity per community over the
    UNDIRECTED simple projection of the KSG (Newman, PRE 2004):
    Q = Σ_c [ w_c/m − (s_c/2m)² ] with m the total undirected edge
    weight, w_c community c's internal weight and s_c its total
    strength; ``contribution`` is c's bracket term, so
    sum(contribution) IS Q. The quality gauge for label_propagation /
    k-means / any (node, community) assignment — run it after LPA and
    a near-zero Q says the partition is noise, not structure.

    Projection matches k_core: parallel directed edges collapse to one
    undirected pair (weight = max across directions — multiplicity is
    extraction repetition, not strength), self-loops drop. Unassigned
    endpoints take the node name as a singleton community (left join +
    coalesce — no silent drops; singletons with no internal edges
    contribute −(s/2m)², the standard penalty reading).

    Shape: pair symmetrize + ONE distinct-pair groupBy, two node-keyed
    assignment joins, then ONE community groupBy over the endpoint
    rows carrying strength + internal + distinct-node-count together
    (strength rides both endpoint rows, the internal weight only the
    first — one shuffle where a naive plan runs three), and m falls
    out of the |communities|-sized result for free (Σ_c s_c = 2m) —
    a driver-free 1-row broadcast. Every shuffle is on a uniform key
    and every aggregate map-side combines; the result is
    |communities|-sized.
    """
    com = communities.groupBy(F.col("node").alias("name")).agg(
        F.max("community").alias("community")
    )
    pairs = (
        _edge_pairs(ksg_edges)
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.coalesce(F.col("weight").cast("double"), F.lit(1.0)).alias(
                "w"
            ),
        )
        .groupBy("a", "b")
        .agg(F.max("w").alias("w"))
    )
    ca = com.select(F.col("name").alias("a"), F.col("community").alias("c_a"))
    cb = com.select(F.col("name").alias("b"), F.col("community").alias("c_b"))
    labeled = (
        pairs.join(ca, "a", "left")
        .join(cb, "b", "left")
        .withColumn("c_a", F.coalesce("c_a", F.col("a")))
        .withColumn("c_b", F.coalesce("c_b", F.col("b")))
        .localCheckpoint(eager=False)
    )
    same = F.col("c_a") == F.col("c_b")
    endpoint = labeled.select(
        F.col("c_a").alias("community"),
        F.col("a").alias("name"),
        F.col("w"),
        # internal weight rides the FIRST endpoint row only — exact
        # for any float w, and the b-row contributes 0
        F.when(same, F.col("w")).otherwise(F.lit(0.0)).alias("iw"),
    ).unionByName(
        labeled.select(
            F.col("c_b").alias("community"),
            F.col("b").alias("name"),
            F.col("w"),
            F.lit(0.0).alias("iw"),
        )
    )
    per = endpoint.groupBy("community").agg(
        F.sum("w").alias("total_strength"),
        F.sum("iw").alias("internal_weight"),
        F.countDistinct("name").alias("n_nodes"),
    )
    # Σ_c strength = 2m (each pair credits w to both endpoints), so m
    # comes from the already-|communities|-sized frame, not the pairs
    m = per.agg((F.sum("total_strength") / 2.0).alias("m")).select(
        F.lit(1).alias("_k"), "m"
    )
    out = per.withColumn("_k", F.lit(1)).join(F.broadcast(m), "_k").drop("_k")
    return out.select(
        "community",
        "n_nodes",
        F.round("internal_weight", 4).alias("internal_weight"),
        F.round("total_strength", 4).alias("total_strength"),
        F.round(
            F.col("internal_weight") / F.col("m")
            - F.pow(F.col("total_strength") / (2.0 * F.col("m")), F.lit(2.0)),
            6,
        ).alias("contribution"),
    )


def refine_communities(
    ksg_edges: DataFrame,
    assignment: DataFrame | None = None,
    rounds: int = 5,
    min_gain: float = 1e-9,
) -> DataFrame:
    """(node, community) — Louvain-style local-move refinement
    (Blondel et al., J. Stat. Mech. 2008, phase 1 restated
    synchronously): each round, every ACTIVE node evaluates moving to
    each neighboring community and takes the best strictly-positive
    modularity gain

        ΔQ(i: D→C) = (k_{i,C} − k_{i,D\\i}) / m
                     − k_i · (Σ_tot(C) − (Σ_tot(D) − k_i)) / (2m²)

    over the same undirected simple projection modularity() scores
    (parallel edges collapse to max weight, self-loops drop), so
    modularity(edges, refine_communities(edges, a)) ≥
    modularity(edges, a) holds on the same footing. ``assignment``
    defaults to singletons (every node its own community — classic
    Louvain start); pass label_propagation's output to polish it.

    Synchronous-move oscillation (two adjacent nodes swapping into
    each other's OLD community forever) is broken the standard
    distributed way: a node is ACTIVE only when xxhash64(node) parity
    matches the round parity, so adjacent same-round moves are halved
    and alternate rounds see each other's results — the Louvain
    guarantee weakens from per-move monotone to
    empirically-monotone-per-round (pinned by tests against
    modularity(); exact sequential Louvain does not distribute).

    Shape per round: ONE adjacency⋈assignment equi-join + ONE
    (node, neighbor-community) groupBy for the k_{i,C} link weights, a
    |communities|-sized strength aggregate joined back BROADCAST, a
    max_by argmax per node, and a left-join apply — every shuffle on
    the uniform node key, no driver state, localCheckpoint per round
    (the CC loop discipline). Convergence: stops early when a round
    moves nothing (one O(1) count).
    """
    pairs = (
        _edge_pairs(ksg_edges)
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.coalesce(F.col("weight").cast("double"), F.lit(1.0)).alias(
                "w"
            ),
        )
        .groupBy("a", "b")
        .agg(F.max("w").alias("w"))
    )
    adj = (
        pairs.select(F.col("a").alias("i"), F.col("b").alias("j"), "w")
        .unionByName(
            pairs.select(F.col("b").alias("i"), F.col("a").alias("j"), "w")
        )
        .localCheckpoint(eager=False)
    )
    k = adj.groupBy("i").agg(F.sum("w").alias("k_i")).localCheckpoint(
        eager=False
    )
    m_row = pairs.agg(F.sum("w").alias("m")).select(
        F.lit(1).alias("_k"), "m"
    )
    if assignment is None:
        assign = k.select("i", F.col("i").alias("community"))
    else:
        assign = (
            k.select("i")
            .join(
                assignment.groupBy(F.col("node").alias("i")).agg(
                    F.max("community").alias("community")
                ),
                "i",
                "left",
            )
            .withColumn("community", F.coalesce("community", F.col("i")))
        )
    assign = assign.localCheckpoint()

    for rnd in range(int(rounds)):
        sigma = (
            assign.join(k, "i")
            .groupBy("community")
            .agg(F.sum("k_i").alias("sigma_tot"))
        )
        links = (
            adj.join(
                assign.select(
                    F.col("i").alias("j"), F.col("community").alias("c_j")
                ),
                "j",
            )
            .groupBy("i", "c_j")
            .agg(F.sum("w").alias("k_ic"))
        )
        cur = assign.select("i", F.col("community").alias("c_cur"))
        own = links.join(
            cur,
            (links["i"] == cur["i"]) & (links["c_j"] == cur["c_cur"]),
            "left_semi",
        ).select(F.col("i").alias("_i"), F.col("k_ic").alias("k_icur"))
        cand = (
            links.join(cur, "i")
            .where(F.col("c_j") != F.col("c_cur"))
            .join(own, links["i"] == own["_i"], "left")
            .drop("_i")
            .withColumn("k_icur", F.coalesce("k_icur", F.lit(0.0)))
            .join(
                F.broadcast(
                    sigma.select(
                        F.col("community").alias("c_j"),
                        F.col("sigma_tot").alias("sigma_c"),
                    )
                ),
                "c_j",
            )
            .join(
                F.broadcast(
                    sigma.select(
                        F.col("community").alias("c_cur"),
                        F.col("sigma_tot").alias("sigma_cur"),
                    )
                ),
                "c_cur",
            )
            .join(k, "i")
            .withColumn("_k", F.lit(1))
            .join(F.broadcast(m_row), "_k")
            .drop("_k")
        )
        gain = (
            (F.col("k_ic") - F.col("k_icur")) / F.col("m")
            - F.col("k_i")
            * (F.col("sigma_c") - (F.col("sigma_cur") - F.col("k_i")))
            / (2.0 * F.col("m") * F.col("m"))
        )
        moves = (
            cand.withColumn("_gain", gain)
            .where(
                (F.col("_gain") > float(min_gain))
                & (
                    F.pmod(F.xxhash64("i"), F.lit(2))
                    == F.lit(rnd % 2)
                )
            )
            .groupBy("i")
            .agg(
                F.expr("max_by(c_j, struct(_gain, c_j))").alias("_new")
            )
        )
        n_moves = moves.count()
        if n_moves == 0 and rnd > 0:
            break
        prev = assign
        assign = (
            prev.join(moves, "i", "left")
            .select(
                "i",
                F.coalesce("_new", "community").alias("community"),
            )
            .localCheckpoint()
        )
        prev.unpersist()
    return assign.select(F.col("i").alias("node"), "community")


def link_scores(
    ksg_edges: DataFrame,
    method: str = "adamic_adar",
    max_hub_degree: int = 10_000,
    top_k: int | None = None,
):
    """(node_a, node_b, score, n_common) — neighborhood-overlap link
    prediction over the UNDIRECTED simple projection (the classic
    non-embedding KG-completion baselines; Liben-Nowell & Kleinberg,
    CIKM 2003): score every NON-EDGE pair at distance 2 by

    - ``common_neighbors``: |N(a) ∩ N(b)|
    - ``adamic_adar``:      Σ_z 1/ln(deg z)   (z the common neighbors)
    - ``resource_allocation``: Σ_z 1/deg z    (Zhou et al. 2009)

    Returns ``(scores, audit)``; node_a < node_b lexicographically,
    existing edges removed by an anti-join (predicting KNOWN edges is
    vacuous). The complement of embedding scorers: no training, exact,
    and the standard sanity baseline a TransE/RotatE eval should beat.

    Shape: candidate pairs come from ONE wedge self-join through the
    shared neighbor z — Σ_z deg(z)² rows, so hubs above
    ``max_hub_degree`` are EXCLUDED as wedge centers with a loud
    (node, degree) audit (a 10^6-degree god entity would mint 10^12
    wedges; dropping it as a CENTER only removes its contribution to
    OTHER pairs' scores — exactly the term 1/ln(deg) already damps to
    nothing). One pair groupBy finishes; ``top_k`` (global, by score)
    caps the result through one TakeOrderedAndProject when set, never
    a full sort.
    """
    methods = ("common_neighbors", "adamic_adar", "resource_allocation")
    if method not in methods:
        raise ValueError(
            f"link_scores: unknown method {method!r} — one of {methods}"
        )
    pairs = (
        _edge_pairs(ksg_edges)
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    adj = pairs.select(
        F.col("a").alias("z"), F.col("b").alias("n")
    ).unionByName(pairs.select(F.col("b").alias("z"), F.col("a").alias("n")))
    deg = adj.groupBy("z").agg(F.count(F.lit(1)).alias("degree"))
    audit = deg.where(F.col("degree") > int(max_hub_degree))
    centers = adj.join(audit.select("z"), "z", "left_anti").join(
        deg, "z"
    )
    left = centers.select("z", F.col("n").alias("node_a"), "degree")
    right = centers.select("z", F.col("n").alias("node_b"))
    wedges = left.join(right, "z").where(
        F.col("node_a") < F.col("node_b")
    )
    if method == "common_neighbors":
        contrib = F.lit(1.0)
    elif method == "adamic_adar":
        # deg 1 would divide by ln(1)=0 — but a degree-1 wedge center
        # cannot form a wedge at all, so the branch is unreachable;
        # kept as a guard for weighted variants
        contrib = 1.0 / F.log(F.col("degree"))
    else:
        contrib = 1.0 / F.col("degree")
    scored = (
        wedges.groupBy("node_a", "node_b")
        .agg(
            F.round(F.sum(contrib), 6).alias("score"),
            F.count(F.lit(1)).alias("n_common"),
        )
        .join(
            pairs.select(
                F.col("a").alias("node_a"), F.col("b").alias("node_b")
            ),
            ["node_a", "node_b"],
            "left_anti",
        )
    )
    if top_k is not None:
        scored = scored.orderBy(
            F.desc("score"), "node_a", "node_b"
        ).limit(int(top_k))
    return scored, audit


def _edge_support(und: DataFrame) -> DataFrame:
    """(a, b, support) — per-edge triangle count over a canonical
    (a < b) undirected edge frame, by the same degree-ordered wedge
    closure triangle_counts uses (O(m^{3/2}) wedges, no last-reducer
    hot node); edges in no triangle keep a 0 row."""
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("deg_b"))
    keyed = und.join(da, "a").join(db, "b")
    lo_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    ori = keyed.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
    ).localCheckpoint(eager=False)
    w1 = ori.select("lo", F.col("hi").alias("u"))
    w2 = ori.select("lo", F.col("hi").alias("v"))
    wedges = w1.join(w2, "lo").where(F.col("u") < F.col("v"))
    closed = wedges.join(
        und.select(F.col("a").alias("u"), F.col("b").alias("v")),
        ["u", "v"],
    )
    tri_edges = closed.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("lo", "u").alias("a"),
                    F.greatest("lo", "u").alias("b"),
                ),
                F.struct(
                    F.least("lo", "v").alias("a"),
                    F.greatest("lo", "v").alias("b"),
                ),
                F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
            )
        ).alias("e")
    ).select("e.a", "e.b")
    sup = tri_edges.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("support")
    )
    return und.join(sup, ["a", "b"], "left").select(
        "a", "b", F.coalesce("support", F.lit(0)).alias("support")
    )


def k_truss(ksg_edges: DataFrame, k: int, max_rounds: int = 100) -> DataFrame:
    """(node_a, node_b, support) — the k-truss of the UNDIRECTED
    simple graph: the maximal subgraph whose every EDGE sits in at
    least k−2 triangles of that subgraph (Cohen, NSA TR 2008; the edge
    analog of k_core and the sharper cohesion trim — a k-truss is
    always inside the (k−1)-core, but bridges and barely-attached
    nodes that survive coring fall out of trussing). ``support`` is
    the edge's triangle count INSIDE the truss.

    Algorithm: iterative support peeling — per round ONE
    degree-ordered wedge-closure support pass (O(m^{3/2}) wedges,
    shared with triangle_counts) + one filter; rounds = cascade depth
    with a loud max_rounds raise; the convergence probe is one O(1)
    edge count. Direction/multiplicity collapse and self-loops drop
    per truss theory; k < 3 rejected (every edge is trivially in a
    2-truss).
    """
    if k < 3:
        raise ValueError(f"k_truss: k must be >= 3, got {k}")
    und = (
        _edge_pairs(ksg_edges)
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .localCheckpoint()
    )
    prev = -1
    for _ in range(max_rounds):
        sup = _edge_support(und).localCheckpoint()
        keep = sup.where(F.col("support") >= k - 2)
        n = keep.count()
        if n == prev or n == 0:
            return keep.select(
                F.col("a").alias("node_a"),
                F.col("b").alias("node_b"),
                "support",
            )
        prev = n
        und = keep.select("a", "b").localCheckpoint()
    raise RuntimeError(
        f"k_truss did not stabilize in {max_rounds} rounds — raise "
        "max_rounds (rounds track the cascade depth of peeled edges)"
    )


def spread_labels(
    ksg_edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 10,
    alpha: float = 0.8,
    top_k: int = 1,
    min_score: float = 1e-4,
) -> DataFrame:
    """(node, label, score) — semi-supervised label spreading over the
    UNDIRECTED weighted projection (Zhou et al., NIPS 2003 "Learning
    with Local and Global Consistency", the row-normalized variant):
    seed nodes carry known labels (gazetteer-typed entities, curated
    classes) and every node iterates

        f ← α · D⁻¹ A f  +  (1−α) · f⁰

    so types flow to UNTYPED entities along co-mention structure — the
    graph-native complement of schema_induct's SDType voting (which
    uses predicate signatures; this uses topology, and the two
    disagree exactly where a curation pass should look). Seeds keep a
    (1−α) anchor to their known label every round rather than hard
    clamping — the standard spreading/label-smoothing trade.

    ``seeds``: (node, label[, score]) — score defaults to 1.0;
    multiple labels per seed allowed (soft seeds). Output keeps the
    ``top_k`` labels per node by final score (ties to the
    lexicographically larger label, deterministic), scores < min_score
    pruned DURING iteration so the state stays sparse — at KG scale
    the (node, label) frame would otherwise densify to
    |nodes|·|labels|.

    Shape per round: ONE adjacency⋈state equi-join on the node key +
    ONE (node, label) groupBy (both uniform; the degree normalization
    rides the adjacency frame, computed once) + a broadcast-free union
    with the anchored seeds; localCheckpoint per round (CC
    discipline). State is output-sized, never driver-resident.
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    pairs = (
        _edge_pairs(ksg_edges)
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.coalesce(F.col("weight").cast("double"), F.lit(1.0)).alias(
                "w"
            ),
        )
        .groupBy("a", "b")
        .agg(F.max("w").alias("w"))
    )
    adj = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "w"
    ).unionByName(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w")
    )
    deg = adj.groupBy("src").agg(F.sum("w").alias("w_tot"))
    # row-normalized transition, computed once and reused all rounds
    trans = (
        adj.join(deg, "src")
        .select("src", "dst", (F.col("w") / F.col("w_tot")).alias("p"))
        .localCheckpoint()
    )
    score_col = (
        F.col("score").cast("double")
        if "score" in seeds.columns
        else F.lit(1.0)
    )
    seed0 = (
        seeds.select("node", "label", score_col.alias("score"))
        .groupBy("node", "label")
        .agg(F.max("score").alias("score"))
        .localCheckpoint()
    )
    anchored = seed0.select(
        "node", "label", (F.col("score") * (1.0 - alpha)).alias("score")
    )
    state = seed0
    for _ in range(int(rounds)):
        propagated = (
            trans.join(
                state.select(
                    F.col("node").alias("src"), "label", "score"
                ),
                "src",
            )
            .select(
                F.col("dst").alias("node"),
                "label",
                (F.lit(float(alpha)) * F.col("p") * F.col("score")).alias(
                    "score"
                ),
            )
        )
        prev = state
        state = (
            propagated.unionByName(anchored)
            .groupBy("node", "label")
            .agg(F.sum("score").alias("score"))
            .where(F.col("score") >= float(min_score))
            .localCheckpoint()
        )
        prev.unpersist()
    from pyspark.sql import Window as W

    ranked = state.withColumn(
        "_rk",
        F.row_number().over(
            W.partitionBy("node").orderBy(
                F.desc("score"), F.desc("label")
            )
        ),
    )
    return ranked.where(F.col("_rk") <= int(top_k)).select(
        "node", "label", F.round("score", 6).alias("score")
    )
