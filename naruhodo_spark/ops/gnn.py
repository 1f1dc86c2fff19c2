"""GNN mini-batch neighbor sampling over the KG edge table —
GraphSAGE-style fixed-fanout blocks (Hamilton et al., NeurIPS 2017) as
training rows for downstream graph neural nets.

A "block" is the sampled computation graph of one seed node: for hop
h = 1..len(fanouts), every frontier node keeps at most ``fanouts[h-1]``
of its neighbors, and the kept edges are emitted as
(seed, hop, src, dst) rows. Exporting blocks as a flat DataFrame is the
collector-friendly shape: one groupBy(seed) feeds a trainer, and the
per-hop rows are exactly DGL/PyG's MFG (message-flow-graph) edge lists.

Determinism contract (repo standard, ops/walks.py): the per-node
neighbor subsample is the shared hash-capped adjacency — xxhash64
content hashes, no RNG — with a HARD fanout bound applied on the capped
list's dense index (idx < fanout), so every (node, hop) samples the
identical neighbor set on any cluster size, any partitioning, any
resume. The index is ORDERED by xxhash64(hop_seed, src, dst)
(hash_index=True), so the ``idx < fanout`` prefix is a uniform sample
and a fresh hash seed per hop decorrelates the hops — a dst-ordered
index would deterministically keep the lexicographically-smallest
neighbors at every hop (ADVICE r04).

Plan shape at 10^9 nodes:

- one :func:`~naruhodo_spark.ops.walks._capped_adjacency` per hop
  (len(fanouts) is 2-3 in practice): a uniform groupBy + a map-side
  hash filter + a window bounded at ~cap rows per key — hot entities
  never sort their raw 10^8-edge neighbor lists;
- each hop is ONE equi-join frontier ⋈ capped-adjacency on the node
  key + one distinct for the next frontier — len(fanouts) bounded
  rounds, lazy localCheckpoint per hop truncates lineage;
- the output is seed-partitioned: downstream per-seed collection
  (groupBy seed) shuffles once on a key whose cardinality the caller
  controls (their training batch), never on entity degree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from naruhodo_spark.ops.walks import NEIGHBOR_CAP, _capped_adjacency


def sample_blocks(
    edges: DataFrame,
    seeds: list[str],
    fanouts: list[int],
    direction: str = "out",
    seed: str = "sage42",
) -> DataFrame:
    """(seed, hop, src, dst) — fixed-fanout sampled neighborhood blocks
    around each seed node. ``fanouts[h-1]`` bounds hop h's per-node
    neighbor count (hard bound). ``direction``: 'out' follows src→dst,
    'in' follows dst→src (GraphSAGE aggregates FROM neighbors, so 'in'
    matches message passing on a directed KG; 'both' symmetrizes).

    edges: (src, dst) string columns; parallel edges and self-loops are
    dropped by the shared adjacency builder.
    """
    if not seeds:
        raise ValueError("sample_blocks needs at least one seed node")
    if not fanouts or any(f < 1 for f in fanouts):
        raise ValueError(f"fanouts must be non-empty positives, got {fanouts}")
    if direction not in ("out", "in", "both"):
        raise ValueError(f"direction must be out|in|both, got {direction!r}")
    spark = edges.sparkSession
    if direction == "in":
        edges = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    elif direction == "both":
        edges = edges.select("src", "dst").unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )

    # one capped adjacency per hop (fresh hash seed decorrelates hops);
    # the hard fanout bound rides the dense idx the builder already
    # computes — idx < fanout is exact, not expected-size
    frontier = spark.createDataFrame(
        [(s,) for s in sorted(set(seeds))], "node string"
    ).select(F.col("node").alias("block_seed"), F.col("node"))

    out = None
    for h, fanout in enumerate(fanouts, start=1):
        # the builder's hash pre-filter keeps an EXPECTED ~cap neighbors
        # — called at cap=fanout it would thin nodes with degree just
        # above fanout to ~deg/2 (and occasionally to zero). A 4×
        # headroom cap makes the pre-filter a no-op for deg ≤ 4·fanout
        # and leaves ~4·fanout candidates otherwise; the dense-index
        # bound below is the exact fanout, and hash_index orders the
        # index by the hop-seeded hash so the prefix IS the sample.
        adj = (
            _capped_adjacency(
                edges, max(4 * fanout, 1), f"{seed}:h{h}", hash_index=True
            )
            .where(F.col("idx") < fanout)
            .select("src", "dst")
        )
        hop_edges = (
            frontier.join(adj, frontier["node"] == adj["src"])
            .select(
                "block_seed",
                F.lit(h).alias("hop"),
                "src",
                "dst",
            )
            .localCheckpoint(eager=False)
        )
        out = hop_edges if out is None else out.unionByName(hop_edges)
        frontier = hop_edges.select(
            "block_seed", F.col("dst").alias("node")
        ).distinct()
    return out.select(F.col("block_seed").alias("seed"), "hop", "src", "dst")


def block_node_sets(blocks: DataFrame) -> DataFrame:
    """(seed, nodes array<string>) — every node appearing in each
    seed's block (the feature-fetch list a trainer gathers before
    message passing). One explode + one groupBy(seed); sorted for
    determinism."""
    nodes = blocks.select(
        "seed", F.explode(F.array("src", "dst")).alias("node")
    ).distinct()
    return nodes.groupBy("seed").agg(
        F.array_sort(F.collect_list("node")).alias("nodes")
    )
