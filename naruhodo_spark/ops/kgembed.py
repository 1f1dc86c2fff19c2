"""Distributed KG-embedding training (TransE, Bordes 2013) as a
DataFrame program — the training loop the reference's users run on
exported graphs, kept ON the cluster because a 10^9-entity embedding
table never fits a driver.

Model state = two DataFrames: ``ent_emb(name, vec array<double>)`` and
``rel_emb(name, vec)``. One full-batch margin-loss iteration compiles
to a fixed, driver-free plan:

    pairs ⋈ embeddings          (5 uniform equi-joins on entity/pred)
    violation mask + gradients  (zip_with / transform HOFs, JVM-side)
    per-entity gradient         (union of 4 slot frames → ONE groupBy
                                 with d element-wise F.avg aggs — no
                                 explode-by-dimension row blowup)
    update + L2-normalize       (left join + HOF arithmetic)

Shuffle keys are entity/pred names — hub entities are real skew, which
AQE's skew-join splitting handles (session.py); the gradient groupBy
is map-side combinable. ``localCheckpoint`` per iteration truncates
the iterative lineage (the CC/PageRank/classifier loop discipline).

Determinism: init vectors derive per-(name, dim) from xxhash64 — no
RNG; negatives come from ops/kgtrain.negative_samples(with_origin=True)
(hash-derived, filtered); full-batch GD has no sampling. Reruns agree
to float reassociation; pinned against an exact numpy mirror in
tests/test_kgembed.py.

Loss (squared-distance variant): for positive (h, r, t) and its
corruption (h', r, t'),  L = Σ max(0, margin + |h+r−t|² − |h'+r−t'|²),
entity vectors re-normalized to unit L2 every iteration (Bordes' own
protocol); relations normalized at init only.

At 10^12-doc scale full-batch is the wrong batch size — shard the pairs
frame by hash into mini-epochs and run this loop per shard (the update
rule is unchanged); the operator keeps full batch because it is exactly
mirrorable and the plan shape per step is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIM = 16


def _stats_reset_rebuild(ck: DataFrame) -> DataFrame:
    """Rebuild a checkpointed frame over its own materialized
    InternalRow RDD via the (private) classic-session JVM API. Isolated
    so tests can (a) assert the signature still exists on this pyspark
    build and (b) monkeypatch it away to exercise the fallback."""
    spark = ck.sparkSession
    jdf = spark._jsparkSession.internalCreateDataFrame(
        ck._jdf.queryExecution().toRdd(), ck._jdf.schema(), False
    )
    return DataFrame(jdf, spark)


def _truncate(df: DataFrame) -> DataFrame:
    """localCheckpoint + REBUILD over the materialized InternalRow RDD.

    Plain localCheckpoint truncates the logical plan but its LogicalRDD
    KEEPS the origin plan's Catalyst statistics. In a loop whose round
    joins the model table several times, join stats multiply child
    sizeInBytes, so the carried BigInteger's digit count compounds
    ~(joins-per-round)× per iteration — measured here: 19 → 132 → 580 →
    2371 → 9537 digits in 5 rounds, after which the driver spends its
    time in BigInteger.multiply inside SizeInBytesOnlyStatsPlanVisitor
    (iteration wall went 0.3 s → 172 s by round 8). PageRank/CC never
    hit this because one join per round grows digits linearly.
    Rebuilding via internalCreateDataFrame over the SAME checkpointed
    RDD (no data movement, no Python round-trip) resets stats to the
    default, making every iteration's planning cost constant.

    The rebuild uses private JVM API (no `_jsparkSession` under Spark
    Connect; the signature is unpinned across pyspark versions), so it
    is capability-guarded: on ANY failure we fall back to the plain
    checkpoint — correct, just slower planning in long loops. The
    result carries `_nh_stats_reset` (which path ran; pinned by
    tests/test_kgembed.py so a Spark bump that silently kills the fast
    path fails loudly) and `_nh_ck` (the checkpoint handle, so loops
    can `_release` superseded iterations' cached blocks)."""
    ck = df.localCheckpoint()
    try:
        out = _stats_reset_rebuild(ck)
        out._nh_stats_reset = True
    except Exception:
        out = ck
        out._nh_stats_reset = False
    out._nh_ck = ck
    return out


def _release(df: DataFrame | None) -> None:
    """Unpersist the cached blocks behind a `_truncate` result once a
    successor checkpoint has fully materialized (learn_bpe's
    prev.unpersist() discipline — without it a long training run
    accumulates one superseded model copy per iteration in storage
    memory until the ContextCleaner happens to run)."""
    ck = getattr(df, "_nh_ck", None)
    if ck is not None:
        try:
            ck.unpersist()
        except Exception:
            pass


def _rand_vec(name_col, dim: int, seed: str, scale: float):
    """array<double> of ``dim`` hash-derived uniforms in [-scale, scale]
    — the xavier-style TransE init (scale = 6/sqrt(dim)) without RNG
    state."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            F.pmod(F.xxhash64(F.lit(seed), name_col, i), F.lit(1_000_000))
            / 500_000.0
            - 1.0
        )
        * scale,
    )


def _l2_normalize(vec):
    nrm = F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return F.when(nrm > 0, F.transform(vec, lambda x: x / nrm)).otherwise(vec)


def init_embeddings(
    names: DataFrame, dim: int = DIM, seed: str = "emb42", normalize=True
) -> DataFrame:
    """(name, vec) — deterministic init for a 1-column names frame."""
    scale = 6.0 / (dim ** 0.5)
    col = names.columns[0]
    vec = _rand_vec(F.col(col), dim, seed, scale)
    if normalize:
        vec = _l2_normalize(vec)
    return names.select(F.col(col).alias("name"), vec.alias("vec"))


def _vadd(a, b):
    return F.zip_with(a, b, lambda x, y: x + y)


def _vsub(a, b):
    return F.zip_with(a, b, lambda x, y: x - y)


def _vscale(a, c):
    return F.transform(a, lambda x: x * c)


def _sqnorm(a):
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)


def training_pairs(ksg_edges: DataFrame, k_neg: int = 2) -> DataFrame:
    """(h, r, t, nh, nt) — each positive with one of its filtered
    hash-corruptions (ops/kgtrain.negative_samples carries the replaced
    entity back via with_origin, so the pair is exact)."""
    from naruhodo_spark.ops import kgtrain as KT

    negs = KT.negative_samples(ksg_edges, k=k_neg, with_origin=True)
    tail = F.col("corrupted") == "tail"
    return negs.select(
        F.when(tail, F.col("subj")).otherwise(F.col("orig")).alias("h"),
        F.col("pred").alias("r"),
        F.when(tail, F.col("orig")).otherwise(F.col("obj")).alias("t"),
        F.col("subj").alias("nh"),
        F.col("obj").alias("nt"),
    )


def _grad_mean(contribs: DataFrame, dim: int) -> DataFrame:
    """(name, g) — element-wise MEAN of gradient arrays per name: d
    column-wise F.avg aggs (columnar, map-side combinable), never an
    explode-by-dimension. Mean, not sum: in full batch a hub entity /
    frequent relation collects thousands of contributions, and a summed
    step scales with its frequency — measured to blow relation norms to
    ~10^4 and invert the margin. The mean keeps every step O(lr)
    regardless of degree (per-name normalized gradient)."""
    return contribs.groupBy("name").agg(
        F.array(
            *[F.avg(F.element_at("g", i + 1)) for i in range(dim)]
        ).alias("g")
    )


def _joined(batch: DataFrame, ent: DataFrame, rel: DataFrame) -> DataFrame:
    """pairs ⋈ model: the 5 uniform equi-joins both the training step
    and the loss evaluation ride."""
    return (
        batch
        .join(ent.select(F.col("name").alias("h"),
                         F.col("vec").alias("hv")), "h")
        .join(ent.select(F.col("name").alias("t"),
                         F.col("vec").alias("tv")), "t")
        .join(ent.select(F.col("name").alias("nh"),
                         F.col("vec").alias("nhv")), "nh")
        .join(ent.select(F.col("name").alias("nt"),
                         F.col("vec").alias("ntv")), "nt")
        .join(rel.select(F.col("name").alias("r"),
                         F.col("vec").alias("rv")), "r")
        .withColumn("sp", _vsub(_vadd(F.col("hv"), F.col("rv")),
                                F.col("tv")))
        .withColumn("sn", _vsub(_vadd(F.col("nhv"), F.col("rv")),
                                F.col("ntv")))
    )


def transe_loss(
    pairs: DataFrame, ent: DataFrame, rel: DataFrame, margin: float = 1.0
) -> float:
    """Full-corpus margin loss Σ max(0, margin + |h+r−t|² − |h'+r−t'|²)
    under the given model — the convergence metric. One forward pass
    (the 5 equi-joins + a single agg); the per-pair values never leave
    the executors. Pairs touching entities/relations absent from the
    model drop out (inner joins) — score coverage is the caller's
    concern (score_triples is the no-silent-drop surface)."""
    j = _joined(pairs.select("h", "r", "t", "nh", "nt"), ent, rel)
    val = F.lit(float(margin)) + _sqnorm(F.col("sp")) - _sqnorm(F.col("sn"))
    out = j.agg(
        F.sum(F.when(val > 0, val).otherwise(F.lit(0.0))).alias("loss")
    ).head()[0]
    return float(out or 0.0)


def train_transe(
    ksg_edges: DataFrame,
    dim: int = DIM,
    iters: int = 20,
    lr: float = 0.1,
    margin: float = 1.0,
    k_neg: int = 2,
    seed: str = "emb42",
    init_ent: DataFrame | None = None,
    init_rel: DataFrame | None = None,
    n_shards: int = 1,
    round_metrics: list | None = None,
) -> dict[str, DataFrame]:
    """Fit TransE over KSG edges; returns {"ent_emb", "rel_emb"}
    (name, vec array<double>) DataFrames.

    ``init_ent``/``init_rel`` warm-start from a previous model (e.g.
    the last streaming epoch's tables): entities/relations present
    there keep their trained vectors, names NEW to this edge set get
    the hash init — the incremental-epoch protocol, so per-epoch
    training cost follows the epoch, not the all-time graph. Stale
    names (in the init but absent from these edges) are dropped; union
    the previous table back in afterwards if they should persist.

    ``n_shards`` > 1 is mini-batch SGD, the web-scale batch size: each
    iteration walks the hash-disjoint pair shards in order, applying
    one update per shard (n_shards model updates per epoch instead of
    one), so convergence per data pass improves while per-step join
    volume drops to |pairs|/n_shards. Sharding is xxhash64 on the full
    pair content — deterministic, partition-invariant, every pair in
    exactly one shard.

    ``round_metrics``: when a list is passed, one dict per completed
    iteration is appended: {"iter", "loss" (FULL-corpus margin loss
    under the post-iteration model — one extra forward pass, computed
    only when requested), "wall_s"} — the mini-batch-vs-full-batch
    convergence evidence (BENCH/bench_scale_kgembed.py)."""
    import time as _time

    from naruhodo_spark.ops import kgtrain as KT

    pairs = _truncate(training_pairs(ksg_edges, k_neg))
    ents = KT.entity_table(ksg_edges)
    rels = ksg_edges.select(F.col("pred").alias("name")).distinct()

    def _init(names, s, warm):
        fresh = init_embeddings(names, dim, s)
        if warm is None:
            return _truncate(fresh)
        if not warm.where(F.size("vec") != dim).isEmpty():
            # a dim-mismatched warm table would flow nulls through
            # zip_with padding and corrupt every touched vector silently
            raise ValueError(
                f"warm-start table has vectors whose length != dim={dim}"
            )
        keep = warm.join(
            names.toDF("name"), "name", "left_semi"
        ).select("name", "vec")
        new = fresh.join(warm.select("name"), "name", "left_anti")
        return _truncate(keep.unionByName(new))

    ent = _init(ents, seed, init_ent)
    rel = _init(rels, seed + "/rel", init_rel)

    if n_shards > 1:
        pairs = pairs.withColumn(
            "shard",
            F.pmod(
                F.xxhash64(F.lit(seed), "h", "r", "t", "nh", "nt"),
                F.lit(int(n_shards)),
            ),
        )
    steps = [
        (i, s) for i in range(int(iters)) for s in range(int(n_shards))
    ]
    iter_t0 = _time.time()
    for _i, shard in steps:
        batch = (
            pairs.where(F.col("shard") == shard) if n_shards > 1 else pairs
        )
        j = (
            batch
            .join(ent.select(F.col("name").alias("h"),
                             F.col("vec").alias("hv")), "h")
            .join(ent.select(F.col("name").alias("t"),
                             F.col("vec").alias("tv")), "t")
            .join(ent.select(F.col("name").alias("nh"),
                             F.col("vec").alias("nhv")), "nh")
            .join(ent.select(F.col("name").alias("nt"),
                             F.col("vec").alias("ntv")), "nt")
            .join(rel.select(F.col("name").alias("r"),
                             F.col("vec").alias("rv")), "r")
        )
        j = j.withColumn("sp", _vsub(_vadd(F.col("hv"), F.col("rv")),
                                     F.col("tv")))
        j = j.withColumn("sn", _vsub(_vadd(F.col("nhv"), F.col("rv")),
                                     F.col("ntv")))
        viol = (
            j.where(F.lit(float(margin)) + _sqnorm(F.col("sp"))
                    - _sqnorm(F.col("sn")) > 0)
            .select("h", "r", "t", "nh", "nt", "sp", "sn")
            .localCheckpoint()  # 5 gradient consumers below; stats reset
            # happens at the ent/rel _truncate below, so this plain
            # checkpoint cannot compound across rounds
        )
        two_sp = _vscale(F.col("sp"), F.lit(2.0))
        two_sn = _vscale(F.col("sn"), F.lit(2.0))
        ent_contribs = (
            viol.select(F.col("h").alias("name"), two_sp.alias("g"))
            .unionByName(
                viol.select(F.col("t").alias("name"),
                            _vscale(F.col("sp"), F.lit(-2.0)).alias("g")))
            .unionByName(
                viol.select(F.col("nh").alias("name"),
                            _vscale(F.col("sn"), F.lit(-2.0)).alias("g")))
            .unionByName(
                viol.select(F.col("nt").alias("name"), two_sn.alias("g")))
        )
        rel_contribs = viol.select(
            F.col("r").alias("name"), _vsub(two_sp, two_sn).alias("g")
        )
        eg = _grad_mean(ent_contribs, dim)
        rg = _grad_mean(rel_contribs, dim)

        def step(emb: DataFrame, grad: DataFrame, normalize: bool):
            upd = emb.join(grad, "name", "left").select(
                "name",
                F.when(
                    F.col("g").isNotNull(),
                    F.zip_with(
                        "vec", "g",
                        lambda v, g: v - F.lit(float(lr)) * g
                    ),
                ).otherwise(F.col("vec")).alias("vec"),
            )
            if normalize:
                upd = upd.select(
                    "name", _l2_normalize(F.col("vec")).alias("vec")
                )
            return _truncate(upd)

        prev_ent, prev_rel = ent, rel
        ent = step(ent, eg, normalize=True)
        rel = step(rel, rg, normalize=False)
        # the new checkpoints are eagerly materialized inside step();
        # the superseded model copies and this step's violation frame
        # are now dead weight in storage memory — free them
        _release(prev_ent)
        _release(prev_rel)
        viol.unpersist()
        if round_metrics is not None and shard == int(n_shards) - 1:
            wall = _time.time() - iter_t0  # training only, loss excluded
            loss = transe_loss(
                pairs.select("h", "r", "t", "nh", "nt"), ent, rel, margin
            )
            round_metrics.append({
                "iter": _i, "loss": round(loss, 4),
                "wall_s": round(wall, 3),
            })
            iter_t0 = _time.time()
    return {"ent_emb": ent, "rel_emb": rel}


def score_triples(
    triples: DataFrame, ent_emb: DataFrame, rel_emb: DataFrame
) -> DataFrame:
    """(subj, pred, obj, dist) — TransE plausibility |h+r−t|² per input
    triple (lower = more plausible); three equi-joins + HOF arithmetic,
    the link-prediction scoring path. EVERY input triple keeps its row:
    a triple touching an entity/relation absent from the model gets
    dist NULL (left joins — the no-silent-caps policy; an inner join
    would make coverage gaps indistinguishable from plausibility)."""
    j = (
        triples.select("subj", "pred", "obj")
        .join(ent_emb.select(F.col("name").alias("subj"),
                             F.col("vec").alias("hv")), "subj", "left")
        .join(ent_emb.select(F.col("name").alias("obj"),
                             F.col("vec").alias("tv")), "obj", "left")
        .join(rel_emb.select(F.col("name").alias("pred"),
                             F.col("vec").alias("rv")), "pred", "left")
    )
    return j.select(
        "subj", "pred", "obj",
        F.when(
            F.col("hv").isNotNull()
            & F.col("tv").isNotNull()
            & F.col("rv").isNotNull(),
            _sqnorm(_vsub(_vadd(F.col("hv"), F.col("rv")), F.col("tv"))),
        ).alias("dist"),
    )
