"""Distributed DistMult KG-embedding training (Yang et al., ICLR 2015
"Embedding Entities and Relations for Learning and Inference in
Knowledge Bases") — the bilinear-diagonal complement to ops/kgembed.py's
translational TransE, sharing its entire loop discipline.

Score: s(h, r, t) = Σ_i h_i·r_i·t_i (HIGHER = more plausible — the
opposite sign convention to TransE's distance; both scorers surface it
in their docstrings and tests pin it). DistMult models symmetric
relations exactly where TransE cannot (s(h,r,t) = s(t,r,h) by
construction), at the cost of not distinguishing edge direction — the
standard trade the two models split.

Margin ranking loss over (positive, filtered hash-corruption) pairs:
L = Σ max(0, margin − s(h,r,t) + s(h',r,t')). For a violating pair the
gradients are the bilinear products

    ∂L/∂h = −r∘t    ∂L/∂t = −r∘h    ∂L/∂nh = +r∘nt   ∂L/∂nt = +r∘nh
    ∂L/∂r = −h∘t + nh∘nt

applied as x ← x − lr·mean(g) via the shared per-name mean-gradient
aggregate (kgembed._grad_mean — hub-degree-invariant step size), with
entity vectors re-normalized to unit L2 per step (Yang's protocol;
relations unconstrained).

Everything scale-shaped is inherited: model = two (name, vec)
DataFrames never driver-resident; per-step plan = 5 uniform equi-joins
+ HOF arithmetic + ONE map-side-combinable groupBy; lineage truncated
per step through kgembed._truncate (stats-reset localCheckpoint) with
superseded checkpoints released; negatives/init hash-derived, no RNG;
``n_shards`` mini-batch SGD over hash-disjoint pair shards. Exact
numpy mirror in tests/test_distmult.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from naruhodo_spark.ops.kgembed import (
    DIM,
    _grad_mean,
    _l2_normalize,
    _release,
    _truncate,
    init_embeddings,
    training_pairs,
)


def _vmul(a, b):
    return F.zip_with(a, b, lambda x, y: x * y)


def _dot3(a, b, c):
    """Σ_i a_i·b_i·c_i — the DistMult trilinear form, JVM-side."""
    return F.aggregate(
        _vmul(_vmul(a, b), c), F.lit(0.0), lambda acc, x: acc + x
    )


def _neg(a):
    return F.transform(a, lambda x: -x)


def distmult_loss(
    pairs: DataFrame, ent: DataFrame, rel: DataFrame, margin: float = 1.0
) -> float:
    """Full-corpus margin ranking loss under the given model (one
    forward pass: 5 equi-joins + a single agg). Pairs touching names
    absent from the model drop out (inner joins) — coverage is
    score_triples_distmult's concern."""
    j = _join_model(pairs.select("h", "r", "t", "nh", "nt"), ent, rel)
    val = (
        F.lit(float(margin))
        - _dot3(F.col("hv"), F.col("rv"), F.col("tv"))
        + _dot3(F.col("nhv"), F.col("rv"), F.col("ntv"))
    )
    out = j.agg(
        F.sum(F.when(val > 0, val).otherwise(F.lit(0.0))).alias("loss")
    ).head()[0]
    return float(out or 0.0)


def _join_model(batch: DataFrame, ent: DataFrame, rel: DataFrame) -> DataFrame:
    return (
        batch
        .join(ent.select(F.col("name").alias("h"), F.col("vec").alias("hv")), "h")
        .join(ent.select(F.col("name").alias("t"), F.col("vec").alias("tv")), "t")
        .join(ent.select(F.col("name").alias("nh"), F.col("vec").alias("nhv")), "nh")
        .join(ent.select(F.col("name").alias("nt"), F.col("vec").alias("ntv")), "nt")
        .join(rel.select(F.col("name").alias("r"), F.col("vec").alias("rv")), "r")
    )


def train_distmult(
    ksg_edges: DataFrame,
    dim: int = DIM,
    iters: int = 20,
    lr: float = 0.1,
    margin: float = 1.0,
    k_neg: int = 2,
    seed: str = "dm42",
    init_ent: DataFrame | None = None,
    init_rel: DataFrame | None = None,
    n_shards: int = 1,
    round_metrics: list | None = None,
) -> dict[str, DataFrame]:
    """Fit DistMult over KSG edges; returns {"ent_emb", "rel_emb"}
    (name, vec array<double>). Warm-start / sharding / metrics contract
    identical to kgembed.train_transe (same incremental-epoch
    protocol; see its docstring)."""
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
            raise ValueError(
                f"warm-start table has vectors whose length != dim={dim}"
            )
        keep = warm.join(names.toDF("name"), "name", "left_semi").select(
            "name", "vec"
        )
        new = fresh.join(warm.select("name"), "name", "left_anti")
        return _truncate(keep.unionByName(new))

    ent = _init(ents, seed, init_ent)
    # relations NOT normalized at init (unconstrained in Yang's setup)
    rel = (
        _truncate(init_embeddings(rels, dim, seed + "/rel", normalize=False))
        if init_rel is None
        else _init(rels, seed + "/rel", init_rel)
    )

    if n_shards > 1:
        pairs = pairs.withColumn(
            "shard",
            F.pmod(
                F.xxhash64(F.lit(seed), "h", "r", "t", "nh", "nt"),
                F.lit(int(n_shards)),
            ),
        )
    steps = [(i, s) for i in range(int(iters)) for s in range(int(n_shards))]
    iter_t0 = _time.time()
    for _i, shard in steps:
        batch = pairs.where(F.col("shard") == shard) if n_shards > 1 else pairs
        j = _join_model(batch, ent, rel)
        viol = (
            j.where(
                F.lit(float(margin))
                - _dot3(F.col("hv"), F.col("rv"), F.col("tv"))
                + _dot3(F.col("nhv"), F.col("rv"), F.col("ntv"))
                > 0
            )
            .select("h", "r", "t", "nh", "nt", "hv", "tv", "nhv", "ntv", "rv")
            .localCheckpoint()  # 5 gradient consumers; stats reset happens
            # at the ent/rel _truncate below (kgembed discipline)
        )
        ent_contribs = (
            viol.select(
                F.col("h").alias("name"),
                _neg(_vmul(F.col("rv"), F.col("tv"))).alias("g"),
            )
            .unionByName(
                viol.select(
                    F.col("t").alias("name"),
                    _neg(_vmul(F.col("rv"), F.col("hv"))).alias("g"),
                )
            )
            .unionByName(
                viol.select(
                    F.col("nh").alias("name"),
                    _vmul(F.col("rv"), F.col("ntv")).alias("g"),
                )
            )
            .unionByName(
                viol.select(
                    F.col("nt").alias("name"),
                    _vmul(F.col("rv"), F.col("nhv")).alias("g"),
                )
            )
        )
        rel_contribs = viol.select(
            F.col("r").alias("name"),
            F.zip_with(
                _vmul(F.col("hv"), F.col("tv")),
                _vmul(F.col("nhv"), F.col("ntv")),
                lambda p, n: n - p,
            ).alias("g"),
        )
        eg = _grad_mean(ent_contribs, dim)
        rg = _grad_mean(rel_contribs, dim)

        def step(emb: DataFrame, grad: DataFrame, normalize: bool):
            upd = emb.join(grad, "name", "left").select(
                "name",
                F.when(
                    F.col("g").isNotNull(),
                    F.zip_with(
                        "vec", "g", lambda v, g: v - F.lit(float(lr)) * g
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
        _release(prev_ent)
        _release(prev_rel)
        viol.unpersist()
        if round_metrics is not None and shard == int(n_shards) - 1:
            wall = _time.time() - iter_t0
            loss = distmult_loss(
                pairs.select("h", "r", "t", "nh", "nt"), ent, rel, margin
            )
            round_metrics.append(
                {"iter": _i, "loss": round(loss, 4), "wall_s": round(wall, 3)}
            )
            iter_t0 = _time.time()
    return {"ent_emb": ent, "rel_emb": rel}


def score_triples_distmult(
    triples: DataFrame, ent_emb: DataFrame, rel_emb: DataFrame
) -> DataFrame:
    """(subj, pred, obj, score) — DistMult plausibility Σ h∘r∘t per
    input triple (HIGHER = more plausible; the opposite convention to
    kgembed.score_triples' distance). EVERY input triple keeps its
    row: names absent from the model yield score NULL (left joins —
    the no-silent-caps policy)."""
    he = ent_emb.select(F.col("name").alias("subj"), F.col("vec").alias("hv"))
    te = ent_emb.select(F.col("name").alias("obj"), F.col("vec").alias("tv"))
    re_ = rel_emb.select(F.col("name").alias("pred"), F.col("vec").alias("rv"))
    return (
        triples.select("subj", "pred", "obj")
        .join(he, "subj", "left")
        .join(te, "obj", "left")
        .join(re_, "pred", "left")
        .select(
            "subj",
            "pred",
            "obj",
            F.when(
                F.col("hv").isNotNull()
                & F.col("rv").isNotNull()
                & F.col("tv").isNotNull(),
                F.round(_dot3(F.col("hv"), F.col("rv"), F.col("tv")), 6),
            ).alias("score"),
        )
    )


# ------------------------------------------------------------------ eval
# Bilinear twin of ops/kglinkpred.py's rank-as-count protocol: a
# DistMult ranking query is a DOT-product comparison (higher = better)
# instead of a distance comparison, so the query point is the
# element-wise product h∘r (tail side) / r∘t (head side) and a
# candidate e ranks better when dot(e, qvec) > true_score. Shapes are
# identical to the TransE evaluator: queries are eval-set-sized and
# broadcast, the entity table never moves, rank = 1 + strictly-better
# COUNT (never a sort), and the filtered correction joins only the
# anchor's known candidates. Metrics reuse
# kglinkpred.link_prediction_metrics unchanged.

_QID = "_lp_qid"


def _dot(a, b):
    return F.aggregate(_vmul(a, b), F.lit(0.0), lambda acc, x: acc + x)


def _dm_queries(test, ent, rel, sides):
    test = test.select("subj", "pred", "obj").distinct()
    j = (
        test
        .join(ent.select(F.col("name").alias("subj"),
                         F.col("vec").alias("hv")), "subj", "left")
        .join(ent.select(F.col("name").alias("obj"),
                         F.col("vec").alias("tv")), "obj", "left")
        .join(rel.select(F.col("name").alias("pred"),
                         F.col("vec").alias("rv")), "pred", "left")
    )
    parts = []
    if "tail" in sides:
        qv = _vmul(F.col("hv"), F.col("rv"))
        parts.append(j.select(
            "subj", "pred", "obj", F.lit("tail").alias("side"),
            F.col("subj").alias("anchor"), F.col("obj").alias("true_name"),
            qv.alias("qvec"),
            F.when(
                F.col("hv").isNotNull() & F.col("rv").isNotNull()
                & F.col("tv").isNotNull(),
                _dot(F.col("tv"), qv),
            ).alias("true_score"),
        ))
    if "head" in sides:
        qv = _vmul(F.col("rv"), F.col("tv"))
        parts.append(j.select(
            "subj", "pred", "obj", F.lit("head").alias("side"),
            F.col("obj").alias("anchor"), F.col("subj").alias("true_name"),
            qv.alias("qvec"),
            F.when(
                F.col("hv").isNotNull() & F.col("rv").isNotNull()
                & F.col("tv").isNotNull(),
                _dot(F.col("hv"), qv),
            ).alias("true_score"),
        ))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn(
        _QID,
        F.xxhash64(F.col("subj"), F.col("pred"), F.col("obj"), F.col("side")),
    )


def rank_candidates_distmult(
    test: DataFrame,
    ent_emb: DataFrame,
    rel_emb: DataFrame,
    known: DataFrame | None = None,
    sides=("tail", "head"),
) -> DataFrame:
    """(subj, pred, obj, side, rank, n_known_filtered) — filtered rank
    of each test triple's true entity under DistMult (rank = 1 +
    #candidates scoring strictly HIGHER; ``known`` = union of
    train/valid/test for the standard filtered protocol; rank NULL
    with the row kept when any embedding is missing). Compose with
    kglinkpred.link_prediction_metrics for MRR/hits@k."""
    for s in sides:
        if s not in ("tail", "head"):
            raise ValueError(f"unknown side {s!r}")
    if not sides:
        raise ValueError("sides must be non-empty")
    q = _dm_queries(test, ent_emb, rel_emb, sides).localCheckpoint(
        eager=False
    )
    ql = q.where(F.col("true_score").isNotNull()).select(
        _QID, "qvec", "true_score", "true_name", "anchor", "pred", "side"
    )
    better = (
        ent_emb.select(F.col("name").alias("_cand"),
                       F.col("vec").alias("_cvec"))
        .join(
            F.broadcast(ql.select(_QID, "qvec", "true_score", "true_name")),
            (F.col("_cand") != F.col("true_name"))
            & (_dot(F.col("_cvec"), F.col("qvec")) > F.col("true_score")),
            "inner",
        )
        .groupBy(_QID)
        .agg(F.count("*").alias("n_better"))
    )
    out = q.join(better, _QID, "left").withColumn(
        "n_better", F.coalesce(F.col("n_better"), F.lit(0))
    )
    if known is not None:
        k = known.select("subj", "pred", "obj")
        cand = (
            k.select(F.col("subj").alias("anchor"), "pred",
                     F.col("obj").alias("_cand"), F.lit("tail").alias("side"))
            .unionByName(
                k.select(F.col("obj").alias("anchor"), "pred",
                         F.col("subj").alias("_cand"),
                         F.lit("head").alias("side")))
            .distinct()
            .join(ent_emb.select(F.col("name").alias("_cand"),
                                 F.col("vec").alias("_cvec")), "_cand")
        )
        kb = (
            ql.join(cand, ["anchor", "pred", "side"])
            .where(
                (F.col("_cand") != F.col("true_name"))
                & (_dot(F.col("_cvec"), F.col("qvec")) > F.col("true_score"))
            )
            .groupBy(_QID)
            .agg(F.count("*").alias("n_known_better"))
        )
        out = out.join(kb, _QID, "left").withColumn(
            "n_known_better", F.coalesce(F.col("n_known_better"), F.lit(0))
        )
    else:
        out = out.withColumn("n_known_better", F.lit(0))
    return out.select(
        "subj", "pred", "obj", "side",
        F.when(
            F.col("true_score").isNotNull(),
            F.greatest(
                F.lit(1),
                F.lit(1) + F.col("n_better") - F.col("n_known_better"),
            ),
        ).cast("long").alias("rank"),
        F.col("n_known_better").cast("long").alias("n_known_filtered"),
    )
