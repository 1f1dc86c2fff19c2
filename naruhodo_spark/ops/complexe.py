"""Distributed ComplEx KG-embedding training (Trouillon et al., ICML
2016 "Complex Embeddings for Simple Link Prediction") — the
ASYMMETRIC bilinear member of the embedding family: TransE
(translation, ops/kgembed.py) ⊂ DistMult (symmetric bilinear,
ops/distmult.py) ⊂ ComplEx (complex bilinear — models both symmetric
AND antisymmetric relations, which DistMult provably cannot).

Representation: one array<double> of length 2·dim per name — the first
dim entries are the real part, the last dim the imaginary part (one
column, so every kgembed join/update/normalize helper applies
unchanged). Score (Trouillon eq. 11, expanded to real arithmetic):

    s(h, r, t) = Re⟨h, r, conj(t)⟩
               = Σ hr·rr·tr + hi·rr·ti + hr·ri·ti − hi·ri·tr

HIGHER = more plausible (DistMult's convention). Margin ranking loss
over filtered hash-corruption pairs; for a violating pair the
per-component gradients are

    ∂s/∂h = (rr∘tr + ri∘ti | rr∘ti − ri∘tr)
    ∂s/∂t = (rr∘hr − ri∘hi | rr∘hi + ri∘hr)
    ∂s/∂r = (hr∘tr + hi∘ti | hr∘ti − hi∘tr)

(∂L = −∂s on the positive triple, +∂s on the corruption; the relation
collects both). Entities re-normalize to unit L2 over the full 2·dim
vector per step (the repo's margin-loss protocol — Trouillon's own
setup regularizes instead; documented deviation, pinned by the
mirror); relations unconstrained.

Scale shape identical to kgembed/distmult: model = two (name, vec)
DataFrames; one step = 5 uniform equi-joins + HOF arithmetic + ONE
mean-gradient groupBy; `_truncate`/`_release` lineage hygiene; no RNG
anywhere. Exact numpy mirror in tests/test_complexe.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from naruhodo_spark.ops.distmult import _vmul
from naruhodo_spark.ops.kgembed import (
    DIM,
    _grad_mean,
    _l2_normalize,
    _release,
    _truncate,
    init_embeddings,
    training_pairs,
)


def _re(v, dim: int):
    return F.slice(v, 1, dim)


def _im(v, dim: int):
    return F.slice(v, dim + 1, dim)


def _dot(a, b):
    return F.aggregate(_vmul(a, b), F.lit(0.0), lambda acc, x: acc + x)


def _score(h, r, t, dim: int):
    """Re⟨h, r, conj(t)⟩ over packed (re|im) arrays, JVM-side."""
    hr, hi = _re(h, dim), _im(h, dim)
    rr, ri = _re(r, dim), _im(r, dim)
    tr, ti = _re(t, dim), _im(t, dim)
    return (
        _dot(hr, _vmul(rr, tr))
        + _dot(hi, _vmul(rr, ti))
        + _dot(hr, _vmul(ri, ti))
        - _dot(hi, _vmul(ri, tr))
    )


def _vadd(a, b):
    return F.zip_with(a, b, lambda x, y: x + y)


def _vsub(a, b):
    return F.zip_with(a, b, lambda x, y: x - y)


def _grad_h(r, t, dim: int):
    rr, ri = _re(r, dim), _im(r, dim)
    tr, ti = _re(t, dim), _im(t, dim)
    return F.concat(
        _vadd(_vmul(rr, tr), _vmul(ri, ti)),
        _vsub(_vmul(rr, ti), _vmul(ri, tr)),
    )


def _grad_t(r, h, dim: int):
    rr, ri = _re(r, dim), _im(r, dim)
    hr, hi = _re(h, dim), _im(h, dim)
    return F.concat(
        _vsub(_vmul(rr, hr), _vmul(ri, hi)),
        _vadd(_vmul(rr, hi), _vmul(ri, hr)),
    )


def _grad_r(h, t, dim: int):
    hr, hi = _re(h, dim), _im(h, dim)
    tr, ti = _re(t, dim), _im(t, dim)
    return F.concat(
        _vadd(_vmul(hr, tr), _vmul(hi, ti)),
        _vsub(_vmul(hr, ti), _vmul(hi, tr)),
    )


def _neg2(a):
    return F.transform(a, lambda x: -x)


def train_complex(
    ksg_edges: DataFrame,
    dim: int = DIM,
    iters: int = 20,
    lr: float = 0.1,
    margin: float = 1.0,
    k_neg: int = 2,
    seed: str = "cx42",
    n_shards: int = 1,
    round_metrics: list | None = None,
) -> dict[str, DataFrame]:
    """Fit ComplEx over KSG edges; returns {"ent_emb", "rel_emb"} with
    (name, vec array<double> of length 2·dim). Sharding/metrics
    contract identical to kgembed.train_transe."""
    import time as _time

    from naruhodo_spark.ops import kgtrain as KT

    pairs = _truncate(training_pairs(ksg_edges, k_neg))
    ents = KT.entity_table(ksg_edges)
    rels = ksg_edges.select(F.col("pred").alias("name")).distinct()
    ent = _truncate(init_embeddings(ents, 2 * dim, seed))
    rel = _truncate(
        init_embeddings(rels, 2 * dim, seed + "/rel", normalize=False)
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
        j = (
            batch
            .join(ent.select(F.col("name").alias("h"), F.col("vec").alias("hv")), "h")
            .join(ent.select(F.col("name").alias("t"), F.col("vec").alias("tv")), "t")
            .join(ent.select(F.col("name").alias("nh"), F.col("vec").alias("nhv")), "nh")
            .join(ent.select(F.col("name").alias("nt"), F.col("vec").alias("ntv")), "nt")
            .join(rel.select(F.col("name").alias("r"), F.col("vec").alias("rv")), "r")
        )
        sp = _score(F.col("hv"), F.col("rv"), F.col("tv"), dim)
        sn = _score(F.col("nhv"), F.col("rv"), F.col("ntv"), dim)
        viol = (
            j.where(F.lit(float(margin)) - sp + sn > 0)
            .select("h", "r", "t", "nh", "nt", "hv", "tv", "nhv", "ntv", "rv")
            .localCheckpoint()
        )
        ent_contribs = (
            viol.select(
                F.col("h").alias("name"),
                _neg2(_grad_h(F.col("rv"), F.col("tv"), dim)).alias("g"),
            )
            .unionByName(viol.select(
                F.col("t").alias("name"),
                _neg2(_grad_t(F.col("rv"), F.col("hv"), dim)).alias("g"),
            ))
            .unionByName(viol.select(
                F.col("nh").alias("name"),
                _grad_h(F.col("rv"), F.col("ntv"), dim).alias("g"),
            ))
            .unionByName(viol.select(
                F.col("nt").alias("name"),
                _grad_t(F.col("rv"), F.col("nhv"), dim).alias("g"),
            ))
        )
        rel_contribs = viol.select(
            F.col("r").alias("name"),
            _vsub(
                _grad_r(F.col("nhv"), F.col("ntv"), dim),
                _grad_r(F.col("hv"), F.col("tv"), dim),
            ).alias("g"),
        )
        eg = _grad_mean(ent_contribs, 2 * dim)
        rg = _grad_mean(rel_contribs, 2 * dim)

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
            loss = complex_loss(
                pairs.select("h", "r", "t", "nh", "nt"), ent, rel, dim, margin
            )
            round_metrics.append(
                {"iter": _i, "loss": round(loss, 4), "wall_s": round(wall, 3)}
            )
            iter_t0 = _time.time()
    return {"ent_emb": ent, "rel_emb": rel}


def complex_loss(
    pairs: DataFrame,
    ent: DataFrame,
    rel: DataFrame,
    dim: int = DIM,
    margin: float = 1.0,
) -> float:
    """Full-corpus margin ranking loss under the given model."""
    j = (
        pairs.select("h", "r", "t", "nh", "nt")
        .join(ent.select(F.col("name").alias("h"), F.col("vec").alias("hv")), "h")
        .join(ent.select(F.col("name").alias("t"), F.col("vec").alias("tv")), "t")
        .join(ent.select(F.col("name").alias("nh"), F.col("vec").alias("nhv")), "nh")
        .join(ent.select(F.col("name").alias("nt"), F.col("vec").alias("ntv")), "nt")
        .join(rel.select(F.col("name").alias("r"), F.col("vec").alias("rv")), "r")
    )
    val = (
        F.lit(float(margin))
        - _score(F.col("hv"), F.col("rv"), F.col("tv"), dim)
        + _score(F.col("nhv"), F.col("rv"), F.col("ntv"), dim)
    )
    out = j.agg(
        F.sum(F.when(val > 0, val).otherwise(F.lit(0.0))).alias("loss")
    ).head()[0]
    return float(out or 0.0)


def score_triples_complex(
    triples: DataFrame,
    ent_emb: DataFrame,
    rel_emb: DataFrame,
    dim: int = DIM,
) -> DataFrame:
    """(subj, pred, obj, score) — Re⟨h, r, conj(t)⟩ per input triple
    (HIGHER = more plausible). Every input triple keeps its row; names
    absent from the model yield score NULL (left joins)."""
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
                    _score(F.col("hv"), F.col("rv"), F.col("tv"), dim), 6
                ),
            ).alias("score"),
        )
    )
