"""Distributed RotatE KG-embedding training (Sun et al., ICLR 2019
"RotatE: Knowledge Graph Embedding by Relational Rotation in Complex
Space") — the rotational member of the embedding family: TransE
(translation, ops/kgembed.py), DistMult (symmetric bilinear,
ops/distmult.py), ComplEx (complex bilinear, ops/complexe.py), RotatE
(complex ROTATION — models symmetry, antisymmetry, inversion AND
composition, the only one of the four that gets all of them).

Representation: entities are complex vectors packed exactly like
ComplEx — one array<double> of length 2·dim, (re | im) halves.
Relations are PHASE vectors θ of length dim; the rotation
r_j = e^{iθ_j} has |r_j| = 1 BY CONSTRUCTION (the paper's modulus
constraint costs nothing when you store the phase, not the point).

Score: d(h, r, t) = |h ∘ r − t|²  (squared L2 over the complex
components, LOWER = more plausible — kgembed's squared-distance
convention, which also keeps every gradient division-free):

    (h∘r)_re = hr·cosθ − hi·sinθ      u_re = (h∘r)_re − tr
    (h∘r)_im = hr·sinθ + hi·cosθ      u_im = (h∘r)_im − ti
    d = Σ_j u_re² + u_im²

Margin ranking loss over filtered hash-corruption pairs,
L = Σ max(0, margin + d_pos − d_neg); for a violating pair

    ∂d/∂h = 2·( u_re∘cosθ + u_im∘sinθ | −u_re∘sinθ + u_im∘cosθ )
          (= 2·conj(r)∘u — rotate the residual back)
    ∂d/∂t = −2·( u_re | u_im )
    ∂d/∂θ = 2·( −u_re∘(h∘r)_im + u_im∘(h∘r)_re )

(∂L adds the positive's gradient and subtracts the corruption's; the
phase collects both). Entities re-normalize to unit L2 over the full
2·dim vector per step — the repo's margin-loss protocol, a documented
deviation from the paper's self-adversarial setup, pinned by the
mirror; phases are unconstrained (they are angles — wrap-around is
harmless under cos/sin).

Scale shape identical to the rest of the family: model = two
(name, vec) DataFrames never driver-resident; one step = 5 uniform
equi-joins + HOF arithmetic + ONE map-side-combinable mean-gradient
groupBy; `_truncate`/`_release` lineage hygiene; hash-derived
init/negatives, no RNG anywhere. Exact numpy mirror in
tests/test_rotate.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from naruhodo_spark.ops.complexe import _im, _re, _vadd, _vsub
from naruhodo_spark.ops.distmult import _vmul
from naruhodo_spark.ops.kgembed import (
    DIM,
    _grad_mean,
    _l2_normalize,
    _rand_vec,
    _release,
    _truncate,
    init_embeddings,
    training_pairs,
)


def _cos(theta):
    return F.transform(theta, lambda x: F.cos(x))


def _sin(theta):
    return F.transform(theta, lambda x: F.sin(x))


def _sq_sum(a):
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)


def _rot(h, theta, dim: int):
    """(h∘r)_re, (h∘r)_im given packed h and the phase vector."""
    hr, hi = _re(h, dim), _im(h, dim)
    c, s = _cos(theta), _sin(theta)
    return (
        _vsub(_vmul(hr, c), _vmul(hi, s)),
        _vadd(_vmul(hr, s), _vmul(hi, c)),
    )


def _dist(h, theta, t, dim: int):
    """|h∘r − t|² over packed complex vectors, JVM-side."""
    rot_re, rot_im = _rot(h, theta, dim)
    u_re = _vsub(rot_re, _re(t, dim))
    u_im = _vsub(rot_im, _im(t, dim))
    return _sq_sum(u_re) + _sq_sum(u_im)


def _scale2(a):
    return F.transform(a, lambda x: 2.0 * x)


def _grads(h, theta, t, dim: int):
    """(grad_h packed 2·dim, grad_t packed 2·dim, grad_theta dim) of
    the squared distance — shared subexpressions built once."""
    c, s = _cos(theta), _sin(theta)
    rot_re, rot_im = _rot(h, theta, dim)
    u_re = _vsub(rot_re, _re(t, dim))
    u_im = _vsub(rot_im, _im(t, dim))
    g_h = _scale2(
        F.concat(
            _vadd(_vmul(u_re, c), _vmul(u_im, s)),
            _vsub(_vmul(u_im, c), _vmul(u_re, s)),
        )
    )
    g_t = F.transform(F.concat(u_re, u_im), lambda x: -2.0 * x)
    g_theta = _scale2(
        _vsub(_vmul(u_im, rot_re), _vmul(u_re, rot_im))
    )
    return g_h, g_t, g_theta


def rotate_loss(
    pairs: DataFrame,
    ent: DataFrame,
    rel: DataFrame,
    dim: int = DIM,
    margin: float = 1.0,
) -> float:
    """Full-corpus margin ranking loss under the given model (one
    forward pass: 5 equi-joins + a single agg)."""
    j = _join_model(pairs.select("h", "r", "t", "nh", "nt"), ent, rel)
    val = (
        F.lit(float(margin))
        + _dist(F.col("hv"), F.col("rv"), F.col("tv"), dim)
        - _dist(F.col("nhv"), F.col("rv"), F.col("ntv"), dim)
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


def train_rotate(
    ksg_edges: DataFrame,
    dim: int = DIM,
    iters: int = 20,
    lr: float = 0.1,
    margin: float = 1.0,
    k_neg: int = 2,
    seed: str = "rot42",
    n_shards: int = 1,
    round_metrics: list | None = None,
) -> dict[str, DataFrame]:
    """Fit RotatE over KSG edges; returns {"ent_emb" (name, packed
    2·dim array<double>), "rel_emb" (name, dim phase array<double>)}.
    Sharding/metrics contract identical to kgembed.train_transe;
    phases init hash-uniform in [−π, π]."""
    import time as _time

    from naruhodo_spark.ops import kgtrain as KT

    pairs = _truncate(training_pairs(ksg_edges, k_neg))
    ents = KT.entity_table(ksg_edges)
    rels = ksg_edges.select(F.col("pred").alias("name")).distinct()
    ent = _truncate(init_embeddings(ents, 2 * dim, seed))
    rel = _truncate(
        rels.select(
            "name",
            _rand_vec(F.col("name"), dim, seed + "/rel", math.pi).alias(
                "vec"
            ),
        )
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
                + _dist(F.col("hv"), F.col("rv"), F.col("tv"), dim)
                - _dist(F.col("nhv"), F.col("rv"), F.col("ntv"), dim)
                > 0
            )
            .select("h", "r", "t", "nh", "nt", "hv", "tv", "nhv", "ntv", "rv")
            .localCheckpoint()  # gradient consumers below; stats reset
            # happens at the ent/rel _truncate (kgembed discipline)
        )
        gp_h, gp_t, gp_r = _grads(F.col("hv"), F.col("rv"), F.col("tv"), dim)
        gn_h, gn_t, gn_r = _grads(
            F.col("nhv"), F.col("rv"), F.col("ntv"), dim
        )
        neg = lambda a: F.transform(a, lambda x: -x)  # noqa: E731
        ent_contribs = (
            viol.select(F.col("h").alias("name"), gp_h.alias("g"))
            .unionByName(
                viol.select(F.col("t").alias("name"), gp_t.alias("g"))
            )
            .unionByName(
                viol.select(F.col("nh").alias("name"), neg(gn_h).alias("g"))
            )
            .unionByName(
                viol.select(F.col("nt").alias("name"), neg(gn_t).alias("g"))
            )
        )
        rel_contribs = viol.select(
            F.col("r").alias("name"), _vsub(gp_r, gn_r).alias("g")
        )
        eg = _grad_mean(ent_contribs, 2 * dim)
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
            loss = rotate_loss(
                pairs.select("h", "r", "t", "nh", "nt"), ent, rel, dim, margin
            )
            round_metrics.append(
                {"iter": _i, "loss": round(loss, 4), "wall_s": round(wall, 3)}
            )
            iter_t0 = _time.time()
    return {"ent_emb": ent, "rel_emb": rel}


def score_triples_rotate(
    triples: DataFrame,
    ent_emb: DataFrame,
    rel_emb: DataFrame,
    dim: int = DIM,
) -> DataFrame:
    """(subj, pred, obj, dist) — RotatE plausibility |h∘r − t|² per
    input triple (LOWER = more plausible; kgembed.score_triples'
    convention). EVERY input triple keeps its row: names absent from
    the model yield dist NULL (left joins — the no-silent-caps
    policy)."""
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
                F.round(
                    _dist(F.col("hv"), F.col("rv"), F.col("tv"), dim), 6
                ),
            ).alias("dist"),
        )
    )


# ------------------------------------------------------------------ eval
# RotatE twin of ops/kglinkpred.py's rank-as-count protocol. The key
# reduction: rotation is UNITARY, so both sides' distances take the
# |candidate − qvec|² form the shared machinery already counts —
#   tail: |h∘r − c|² → qvec = h∘r
#   head: |c∘r − t|² = |c − r⁻¹∘t|² → qvec = conj(r)∘t
# and everything downstream (Catalyst scan, BLAS GEMM twin, filtered
# correction, metrics) is reused verbatim via _rank_from_queries.

_QID = "_lp_qid"


def _neg_theta(theta):
    return F.transform(theta, lambda x: -x)


def _pack_rot(h, theta, dim: int):
    rot_re, rot_im = _rot(h, theta, dim)
    return F.concat(rot_re, rot_im)


def _rot_queries(test, ent, rel, sides, dim: int):
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
    covered = (
        F.col("hv").isNotNull()
        & F.col("rv").isNotNull()
        & F.col("tv").isNotNull()
    )
    parts = []
    if "tail" in sides:
        qv = _pack_rot(F.col("hv"), F.col("rv"), dim)
        parts.append(j.select(
            "subj", "pred", "obj", F.lit("tail").alias("side"),
            F.col("subj").alias("anchor"), F.col("obj").alias("true_name"),
            qv.alias("qvec"),
            F.when(
                covered, _sq_sum(_vsub(F.col("tv"), qv))
            ).alias("true_dist"),
        ))
    if "head" in sides:
        qv = _pack_rot(F.col("tv"), _neg_theta(F.col("rv")), dim)
        parts.append(j.select(
            "subj", "pred", "obj", F.lit("head").alias("side"),
            F.col("obj").alias("anchor"), F.col("subj").alias("true_name"),
            qv.alias("qvec"),
            F.when(
                covered, _sq_sum(_vsub(F.col("hv"), qv))
            ).alias("true_dist"),
        ))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn(
        _QID,
        F.xxhash64(F.col("subj"), F.col("pred"), F.col("obj"), F.col("side")),
    )


def rank_candidates_rotate(
    test: DataFrame,
    ent_emb: DataFrame,
    rel_emb: DataFrame,
    known: DataFrame | None = None,
    sides=("tail", "head"),
    path: str = "catalyst",
    max_queries: int = 20_000,
    dim: int = DIM,
) -> DataFrame:
    """(subj, pred, obj, side, rank, n_known_filtered) — filtered rank
    of each test triple's true entity under RotatE (rank = 1 +
    #candidates at strictly SMALLER |c − qvec|²; ``known`` = union of
    train/valid/test for the standard filtered protocol; rank NULL
    with the row kept when any embedding is missing). Both the
    Catalyst scan and the BLAS GEMM twin come from kglinkpred
    unchanged; compose with kglinkpred.link_prediction_metrics for
    MRR/hits@k."""
    from naruhodo_spark.ops import kglinkpred as KL

    if path not in ("catalyst", "blas"):
        raise ValueError(f"rank_candidates_rotate: unknown path {path!r}")
    if not sides:
        raise ValueError("rank_candidates_rotate: sides must be non-empty")
    for s in sides:
        if s not in ("tail", "head"):
            raise ValueError(f"rank_candidates_rotate: unknown side {s!r}")
    q = _rot_queries(test, ent_emb, rel_emb, sides, dim)
    return KL._rank_from_queries(q, ent_emb, known, path, max_queries)
