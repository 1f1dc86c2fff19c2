"""Similarity search over an embedding column (array<float>).

- **brute-force cosine top-k** — the correctness baseline: pairwise
  cosine via JVM-side array expressions (zip_with/aggregate — no Python),
  window row_number ≤ k. O(n²) pairs; fine for correctness tiers.
- **IVF (coarse-quantized) top-k** — the scale path: restrict candidate
  pairs to the same coarse cell (here the `label` column acts as the
  trained IVF assignment; in production the assignment comes from a
  k-means broadcast). Join key = cell id → pairs per cell only.
- **LSH (random hyperplane) buckets** — sign-bit sketches from
  deterministic pseudo-random hyperplanes; bucket join for candidates.

All cosine math is double-precision and rounded to 4 places so the
DuckDB oracle hashes identically.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def with_cosine(pairs: DataFrame, col_a: str = "emb_a", col_b: str = "emb_b") -> DataFrame:
    a, b = F.col(col_a), F.col(col_b)
    return pairs.withColumn(
        "cosine", F.round(_dot(a, b) / (_norm(a) * _norm(b)), 4)
    )


def _normed(embeddings: DataFrame, id_alias: str, emb_alias: str, norm_alias: str, extra=()):
    """Project (id, embedding, ||embedding||): norms are computed ONCE per
    vector before the pair join instead of per pair (3× less arithmetic
    in the O(n²) stage)."""
    cols = [
        F.col("vec_id").alias(id_alias),
        F.col("embedding").alias(emb_alias),
        _norm(F.col("embedding")).alias(norm_alias),
    ]
    cols.extend(F.col(c) for c in extra)
    return embeddings.select(*cols)


def _topk_from_pairs(pairs: DataFrame, k: int) -> DataFrame:
    cos = F.round(
        _dot(F.col("emb_a"), F.col("emb_b")) / (F.col("na") * F.col("nb")), 4
    )
    scored = pairs.withColumn("cosine", cos).select(
        "vec_id", "neighbor_id", "cosine"
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "cosine", "rank")
    )


def topk_bruteforce(embeddings: DataFrame, k: int = 3) -> DataFrame:
    """Top-k cosine neighbors per vector (excluding self). Deterministic
    tie-break: (cosine desc, neighbor id asc)."""
    l = _normed(embeddings, "vec_id", "emb_a", "na")
    r = _normed(embeddings, "neighbor_id", "emb_b", "nb")
    pairs = l.join(r, F.col("vec_id") != F.col("neighbor_id"))
    return _topk_from_pairs(pairs, k)


def topk_ivf(embeddings: DataFrame, k: int = 3, cell_col: str = "label") -> DataFrame:
    """IVF-style top-k: candidates restricted to the same coarse cell.
    The pair join is an equi-join on the cell id — at 100 TB this is the
    difference between n² and Σ_cell n_cell² (with cells balanced by the
    quantizer)."""
    l = _normed(embeddings, "vec_id", "emb_a", "na", extra=[cell_col]).withColumnRenamed(cell_col, "cell")
    r = _normed(embeddings, "neighbor_id", "emb_b", "nb", extra=[cell_col]).withColumnRenamed(cell_col, "cell_r")
    pairs = (
        l.join(r, F.col("cell") == F.col("cell_r"))
        .where(F.col("vec_id") != F.col("neighbor_id"))
    )
    return _topk_from_pairs(pairs, k)


def hyperplane_sketch(embeddings: DataFrame, n_planes: int = 8) -> DataFrame:
    """Random-hyperplane LSH sign sketch, fully deterministic: plane p's
    coefficient for dimension d is a pseudo-random value in [-3, 3]
    derived from md5_48(p‖d) — the repo's engine-portable hash idiom
    (was xxhash64 through r03; switched so the DuckDB driver oracle can
    reproduce the buckets bit-for-bit). Stays JVM-side (no UDF):
    coefficient = f(pos) inside a zip_with over the embedding array; the
    dot fold is left-to-right in array order, which DuckDB's
    list_reduce mirrors exactly (same float addition order → same
    sign)."""
    from naruhodo_spark.ops.textstats import md5_48

    dim_idx = F.sequence(F.lit(0), F.size("embedding") - 1)
    bits = []
    for p in range(n_planes):
        coef = lambda pos, _p=p: (
            (F.pmod(md5_48(F.concat_ws(":", F.lit(_p), pos.cast("string"))), F.lit(7)) - 3)
        ).cast("double")
        dot = F.aggregate(
            F.zip_with(
                F.col("embedding"), dim_idx,
                lambda x, pos: x.cast("double") * coef(pos),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)).cast("string"))
    return embeddings.select(
        "vec_id", F.concat(*bits).alias("bucket")
    )


def lsh_candidate_pairs(embeddings: DataFrame, n_planes: int = 8) -> DataFrame:
    """Candidate pairs = same LSH bucket. Bucket key is uniform-ish →
    balanced shuffle; candidates then get exact cosine downstream."""
    sk = hyperplane_sketch(embeddings, n_planes)
    l = sk.select(F.col("vec_id").alias("vec_a"), "bucket")
    r = sk.select(F.col("vec_id").alias("vec_b"), "bucket")
    return (
        l.join(r, "bucket")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", "bucket")
    )


def _sq_dist_to(centroid: list[float]):
    cent = F.array(*[F.lit(float(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(
            F.col("embedding"), cent,
            lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def kmeans_fit(
    embeddings: DataFrame, k: int = 8, iters: int = 5
) -> list[list[float]]:
    """Lloyd's k-means over DataFrame ops — the trained coarse quantizer
    for IVF. Iterative driver loop (like the CC loop): assignment is a
    Catalyst argmin over k broadcast centroids; the update step aggregates
    per-(cell, dimension) means (k×dim rows to the driver — the quantizer
    is driver-sized by definition). Deterministic: hash-seeded init,
    centroids rounded each iteration so float summation order cannot flip
    assignments across partitionings."""
    head = embeddings.select("embedding").first()
    if head is None:
        return []  # empty input → no centroids (callers emit empty results)
    dim = len(head["embedding"])
    init = (
        embeddings.select("vec_id", "embedding")
        .orderBy(F.xxhash64(F.col("vec_id").cast("string")))
        .limit(k)
        .collect()
    )
    cents = [[round(float(v), 6) for v in r["embedding"]] for r in init]
    for _ in range(iters):
        assigned = assign_cells(embeddings, cents)
        rows = (
            assigned.select("cell", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .collect()
        )
        new = [list(c) for c in cents]  # empty cells keep old centroid
        acc: dict[int, list[float]] = {}
        for r in rows:
            acc.setdefault(r["cell"], [0.0] * dim)[r["pos"]] = round(r["m"], 6)
        for cell, vec in acc.items():
            new[cell] = vec
        if new == cents:
            break
        cents = new
    return cents


def assign_cells(embeddings: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Nearest-centroid assignment, pure Catalyst: array of squared
    distances → array_position of the minimum (ties → lowest cell id)."""
    dists = F.array(*[_sq_dist_to(c) for c in centroids])
    cell = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    return embeddings.withColumn("cell", cell)


def topk_ivf_trained(
    embeddings: DataFrame, k: int = 3, n_cells: int = 8, iters: int = 3
) -> DataFrame:
    """IVF top-k with a TRAINED quantizer (vs topk_ivf which reuses the
    dataset's label column as the cell assignment)."""
    cents = kmeans_fit(embeddings, n_cells, iters)
    if not cents:
        return embeddings.sparkSession.createDataFrame([], _TOPK_SCHEMA)
    assigned = assign_cells(embeddings, cents)
    return topk_ivf(assigned.drop("label"), k=k, cell_col="cell")


def embedding_near_dups(embeddings: DataFrame, threshold: float = 0.99) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the semantic dedup tier):
    ALL same-cell pairs above the threshold — no top-k cap, which would
    silently drop pairs in dense duplicate clusters."""
    l = _normed(embeddings, "vec_a", "emb_a", "na", extra=["label"]).withColumnRenamed("label", "cell")
    r = _normed(embeddings, "vec_b", "emb_b", "nb", extra=["label"]).withColumnRenamed("label", "cell_r")
    pairs = l.join(r, F.col("cell") == F.col("cell_r")).where(
        F.col("vec_a") < F.col("vec_b")
    )
    cos = F.round(
        _dot(F.col("emb_a"), F.col("emb_b")) / (F.col("na") * F.col("nb")), 4
    )
    return (
        pairs.withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


def semantic_dedup(
    embeddings: DataFrame, threshold: float = 0.99, cell_col: str = "label"
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): embeddings are coarse-quantized into cells
    (k-means in the paper — compose with kmeans_fit/assign_cells for a
    trained quantizer; any precomputed assignment column works),
    near-duplicate PAIRS are all same-cell pairs with cosine ≥
    threshold (embedding_near_dups — deliberately uncapped), and
    duplicate GROUPS are the transitive closure of those pairs via the
    size-gated connected components (operators/canon.py: driver
    union-find for tiny pair sets, distributed star contraction beyond).
    One deterministic representative — min vec_id — survives per group;
    the paper keeps the doc farthest from its centroid, min-id is chosen
    instead so output is invariant to quantizer retraining (documented
    deviation; swap the keep rule downstream if centroid distance
    matters).

    Returns (vec_id, rep_id, group_size, is_rep) for EVERY input row —
    singletons carry themselves with group_size 1 — so the caller's
    keep-filter is ``where(is_rep)`` and drop-volume audits are one
    groupBy away (no silent deletion).

    Scale shape: the only quadratic term is Σ n_cell² inside cells,
    bounded by the quantizer (same contract as topk_ivf); CC runs only
    on the near-dup pair set, tiny relative to the corpus; the final
    group-size join is an agg + equi-join on rep_id, AQE-broadcastable.
    """
    from naruhodo_spark.operators.canon import (
        cc_labels_auto,
        pad_signed_id,
        unpad_signed_id,
    )

    emb = (
        embeddings
        if cell_col == "label"
        else embeddings.drop("label").withColumnRenamed(cell_col, "label")
    )
    pairs = embedding_near_dups(emb, threshold=threshold)
    # signed padding: vec_ids may be hash-derived (xxhash64 is negative
    # half the time) and pad_numeric_id's contract excludes negatives —
    # '-' sorts before '0', which would silently break the min-id rep
    edges = pairs.select(
        pad_signed_id("vec_a").alias("src"), pad_signed_id("vec_b").alias("dst")
    )
    labels = cc_labels_auto(edges).select(
        unpad_signed_id("node").alias("vec_id"),
        unpad_signed_id("label").alias("rep_id"),
    )
    every = embeddings.select(F.col("vec_id").cast("bigint").alias("vec_id"))
    member = every.join(labels, "vec_id", "left").select(
        "vec_id", F.coalesce(F.col("rep_id"), F.col("vec_id")).alias("rep_id")
    )
    sizes = member.groupBy("rep_id").agg(F.count(F.lit(1)).alias("group_size"))
    return member.join(sizes, "rep_id").select(
        "vec_id",
        "rep_id",
        "group_size",
        (F.col("vec_id") == F.col("rep_id")).alias("is_rep"),
    )


_TOPK_SCHEMA = "vec_id long, neighbor_id long, cosine double, rank int"


def topk_ivf_blas(embeddings: DataFrame, k: int = 3, cell_col: str = "label") -> DataFrame:
    """IVF top-k with a BLAS kernel: ``applyInPandas`` per coarse cell,
    one normalized gram matrix (X@X.T) per cell, vectorized composite-key
    row sort for the (cosine desc, neighbor_id asc) tie-break on the
    ROUNDED cosine — semantics identical to topk_ivf, arithmetic done by
    the matrix engine instead of per-pair Catalyst array folds.

    This is the SCALE path: per-cell cost is one n_cell×n_cell GEMM
    (the quantizer bounds n_cell), and cells fan out across executors —
    at 100 TB the pairwise stage is the entire cost, and BLAS beats
    elementwise expression evaluation by an order of magnitude. The
    Catalyst twin (topk_ivf) remains the oracle-checkable baseline;
    tests assert the two agree exactly at the correctness tier.
    """
    import numpy as np

    def per_cell(pdf: "pd.DataFrame") -> "pd.DataFrame":
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {"vec_id": pd.Series([], dtype="int64"),
                 "neighbor_id": pd.Series([], dtype="int64"),
                 "cosine": pd.Series([], dtype="float64"),
                 "rank": pd.Series([], dtype="int32")}
            )
        X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        norms = np.sqrt((X * X).sum(axis=1))
        S = (X @ X.T) / np.outer(norms, norms)
        # HALF_UP rounding to match Spark's F.round EXACTLY: np.round is
        # half-to-EVEN, so an exactly-representable tie like cosine
        # 1/32 = 0.03125 rounds 0.0312 in numpy but 0.0313 in Spark,
        # silently breaking the asserted equality with the Catalyst
        # twin. floor(|S|·10⁴ + 0.5) is HALF_UP for binary-exact values;
        # the rare doubles sitting within 1e-9 of a .5 boundary are
        # re-rounded through their shortest decimal repr, which is what
        # Spark's Round (BigDecimal of Double.toString) actually does.
        A = np.abs(S) * 1e4
        base = np.floor(A + 0.5)
        sus = np.abs(A - np.floor(A) - 0.5) < 1e-9
        if sus.any():
            import decimal

            q = decimal.Decimal("0.0001")
            for i, j in np.argwhere(sus):
                d = decimal.Decimal(repr(float(S[i, j]))).quantize(
                    q, rounding=decimal.ROUND_HALF_UP
                )
                base[i, j] = float(abs(d) * 10000)
        prim = np.copysign(base, S).astype(np.int64)
        S = prim / 1e4
        ids = pdf["vec_id"].to_numpy().astype(np.int64)
        # (cosine desc, id asc) tie-break via lexsort on the ROUNDED
        # cosine (an exact integer in [-10^4, 10^4], so its negation is
        # overflow-free) — no packed composite key, so arbitrary int64
        # vec_ids (negative, xxhash64-sized) order correctly and the
        # path stays exactly equal to the Catalyst twin's row_number
        # ordering
        neg = -prim
        np.fill_diagonal(neg, np.iinfo(np.int64).max)  # exclude self
        kk = min(k, n - 1)
        order = np.lexsort((np.broadcast_to(ids, neg.shape), neg))
        top = order[:, :kk]
        cos = np.take_along_axis(S, top, axis=1)
        return pd.DataFrame(
            {
                "vec_id": np.repeat(ids, kk),
                "neighbor_id": ids[top].ravel(),
                "cosine": cos.ravel(),
                "rank": np.tile(np.arange(1, kk + 1, dtype=np.int32), n),
            }
        )

    return embeddings.groupBy(cell_col).applyInPandas(per_cell, schema=_TOPK_SCHEMA)


def topk_bruteforce_blas(embeddings: DataFrame, k: int = 3) -> DataFrame:
    """Brute-force cosine top-k via the BLAS kernel: one global cell.
    The n×n gram matrix makes this the small-n correctness baseline only
    — the scale paths are topk_ivf_blas (bounded cells) and LSH."""
    return topk_ivf_blas(
        embeddings.withColumn("_cell", F.lit(0)), k=k, cell_col="_cell"
    )


# ---------------------------------------------------------------------
# Product quantization (Jégou, Douze, Schmid, TPAMI 2011: "Product
# Quantization for Nearest Neighbor Search") — the memory side of
# billion-scale ANN: a d-dim float vector becomes m uint8-ish codes
# (one per subspace), so 10^9 vectors fit where the raw floats cannot,
# and query distances are computed Asymmetrically (ADC): the query
# precomputes one m×ksub lookup table, every database distance is then
# m array lookups — no float vector is touched at scan time.
# ---------------------------------------------------------------------


def pq_train(
    embeddings: DataFrame, m: int = 4, ksub: int = 16, iters: int = 4
) -> list[list[list[float]]]:
    """Codebooks[m][ksub][dsub]: independent k-means per subspace over
    the sliced sub-vectors. Driver-sized by definition (m·ksub·dsub
    floats — the PQ model IS small; the data never is).

    All m subspace k-means run JOINTLY: each iteration is ONE job that
    assigns every subspace's cell in one select and aggregates every
    (subspace, cell, dim) mean in one groupBy — m separate kmeans_fit
    loops would launch m·iters near-empty jobs whose latency, not their
    data, dominates (profiled 14 s → ~3 s at sf0.1). Update rules are
    kmeans_fit's exactly: hash-seeded init rows (shared across
    subspaces, each sliced), per-iteration 6-dp rounding, empty cells
    keep their centroid. dim must divide evenly by m (explicit error —
    a silent remainder subspace would desync encode and ADC)."""
    head = embeddings.select("embedding").first()
    if head is None:
        return []
    dim = len(head["embedding"])
    if dim % m != 0:
        raise ValueError(f"pq_train: dim {dim} not divisible by m {m}")
    dsub = dim // m
    init = (
        embeddings.select("vec_id", "embedding")
        .orderBy(F.xxhash64(F.col("vec_id").cast("string")))
        .limit(ksub)
        .collect()
    )
    books = [
        [
            [round(float(v), 6) for v in r["embedding"][j * dsub:(j + 1) * dsub]]
            for r in init
        ]
        for j in range(m)
    ]
    # the codebooks ride as ONE nested-array literal per subspace and
    # all per-centroid math runs inside transform/aggregate HOFs — an
    # unrolled per-centroid expression tree (m·ksub·dsub literal nodes,
    # thousands of py4j calls) costs more to BUILD driver-side than the
    # whole job costs to run (profiled: expression construction, not
    # jobs, dominated the first implementation)
    for _ in range(iters):
        cells = [_pq_sub_code(books, j, dsub) for j in range(m)]
        assigned = embeddings.select(
            "embedding", F.array(*cells).alias("cells")
        )
        rows = (
            assigned.select(
                "cells", F.posexplode("embedding").alias("pos", "v")
            )
            .groupBy(
                (F.col("pos") / dsub).cast("int").alias("j"),
                F.element_at(
                    "cells", (F.col("pos") / dsub).cast("int") + 1
                ).alias("cell"),
                (F.col("pos") % dsub).alias("p"),
            )
            .agg(F.avg(F.col("v").cast("double")).alias("mean"))
            .collect()  # m·ksub·dsub = model-sized driver traffic
        )
        new = [[list(c) for c in b] for b in books]
        for r in rows:
            new[r["j"]][r["cell"]][r["p"]] = round(r["mean"], 6)
        if new == books:
            break
        books = new
    return books


def _pq_sub_code(
    books: list[list[list[float]]], j: int, dsub: int
) -> "F.Column":
    """code_j: argmin centroid of subspace j (ties → lowest code). The
    codebook is a single nested-array literal; distances are a
    transform over it — O(1) expression nodes regardless of ksub."""
    sub = F.slice("embedding", j * dsub + 1, dsub)
    dists = F.transform(
        F.lit([[float(c) for c in cent] for cent in books[j]]),
        lambda cent: F.aggregate(
            F.zip_with(
                sub,
                cent,
                lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def pq_encode(
    embeddings: DataFrame, codebooks: list[list[list[float]]]
) -> DataFrame:
    """(vec_id, codes array<int>): nearest-centroid code per subspace —
    pure Catalyst (m·ksub bounded distance expressions over sliced
    sub-vectors; ties → lowest code, same rule as assign_cells)."""
    m = len(codebooks)
    if m == 0:
        return embeddings.sparkSession.createDataFrame(
            [], "vec_id long, codes array<int>"
        )
    dsub = len(codebooks[0][0])
    return embeddings.select(
        "vec_id",
        F.array(
            *[_pq_sub_code(codebooks, j, dsub) for j in range(m)]
        ).alias("codes"),
    )


def pq_topk(
    encoded: DataFrame,
    query: list[float],
    codebooks: list[list[list[float]]],
    k: int = 3,
) -> DataFrame:
    """(neighbor_id, adc_dist, rank): approximate k nearest neighbors of
    ``query`` by asymmetric distance. The m×ksub lookup table is
    computed DRIVER-side from the query (model-sized), shipped as
    literal arrays; each database row costs m element_at lookups over
    its code array — a map-only scan + TakeOrderedAndProject, no join,
    no float vectors read (the scan column set is (vec_id, codes):
    that projection is the entire point of PQ at 100 TB)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0]) if m else 0
    if m == 0 or len(query) != m * dsub:
        raise ValueError(
            f"pq_topk: query dim {len(query)} != m*dsub {m * dsub}"
        )
    luts = []
    for j in range(m):
        q = query[j * dsub : (j + 1) * dsub]
        luts.append(
            [
                sum((float(x) - float(c)) ** 2 for x, c in zip(q, cent))
                for cent in codebooks[j]
            ]
        )
    lut_lit = F.lit([[round(v, 9) for v in row] for row in luts])
    dist = F.lit(0.0)
    for j in range(m):
        dist = dist + F.element_at(
            F.element_at(lut_lit, j + 1), F.element_at("codes", j + 1) + 1
        )
    return (
        encoded.select(
            F.col("vec_id").alias("neighbor_id"),
            F.round(dist, 6).alias("adc_dist"),
        )
        .orderBy(F.col("adc_dist").asc(), F.col("neighbor_id").asc())
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(
                W.orderBy(F.col("adc_dist").asc(), F.col("neighbor_id").asc())
            ),
        )
    )


def bitext_pairs(
    embeddings: DataFrame,
    lang_col: str = "lang",
    k: int = 4,
    margin_threshold: float = 1.05,
    cell_col: str = "label",
) -> DataFrame:
    """(vec_a, lang_a, vec_b, lang_b, cosine, margin) — mined parallel
    pairs across languages by MARGIN scoring (Artetxe & Schwenk 2019,
    the CCMatrix/LASER recipe): a pair qualifies when its cosine stands
    out against both endpoints' neighborhoods,
    margin = cos(x,y) / (½·(avgtop_k(x) + avgtop_k(y))), computed over
    cross-language candidates only. Plain cosine thresholds over-mine
    hubs (vectors close to everything); the margin is the published
    fix and falls out of two bounded windows here.

    Scale shape: candidates from the IVF cell equi-join (Σ_cell n²,
    never all-pairs, same as topk_ivf/hard_negatives); avgtop_k is a
    rank window per vector over its cell-bounded cross-language
    candidate list; one output row per unordered pair (lang_a < lang_b
    lexicographically).
    """
    if k < 1:
        raise ValueError(f"bitext_pairs: k must be >= 1, got {k}")
    l = _normed(embeddings, "vec_a", "emb_a", "na", extra=[cell_col, lang_col])
    l = l.withColumnRenamed(cell_col, "cell").withColumnRenamed(lang_col, "lang_a")
    r = _normed(embeddings, "vec_b", "emb_b", "nb", extra=[cell_col, lang_col])
    r = r.withColumnRenamed(cell_col, "cell_r").withColumnRenamed(lang_col, "lang_b")
    cos = F.round(
        _dot(F.col("emb_a"), F.col("emb_b")) / (F.col("na") * F.col("nb")), 6
    )
    # DIRECTED cross-language candidates (x → every other-language y in
    # x's cell): both orientations present, so one avgtop_k window keyed
    # by (vec_a) covers every vector's neighborhood
    cand = (
        l.join(r, F.col("cell") == F.col("cell_r"))
        .where(F.col("lang_a") != F.col("lang_b"))
        .select("vec_a", "lang_a", "vec_b", "lang_b", cos.alias("cosine"))
        .localCheckpoint(eager=False)
    )
    w = W.partitionBy("vec_a").orderBy(F.desc("cosine"), F.asc("vec_b"))
    topk_avg = (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .groupBy("vec_a")
        .agg(F.avg("cosine").alias("avg_topk"))
    )
    scored = (
        cand.where(F.col("lang_a") < F.col("lang_b"))  # one row per pair
        .join(topk_avg.withColumnRenamed("vec_a", "vec_a_key")
              .withColumnRenamed("avg_topk", "m_a"),
              F.col("vec_a") == F.col("vec_a_key"))
        .join(topk_avg.withColumnRenamed("vec_a", "vec_b_key")
              .withColumnRenamed("avg_topk", "m_b"),
              F.col("vec_b") == F.col("vec_b_key"))
        .withColumn(
            "margin",
            F.round(
                F.col("cosine")
                / (F.lit(0.5) * (F.col("m_a") + F.col("m_b"))),
                6,
            ),
        )
        # the ratio margin assumes POSITIVE neighborhood similarities:
        # a negative/near-zero denominator flips the sign or explodes
        # (cos −0.3 over avg −0.2 would "pass" at 1.5) — gate both the
        # pair similarity and the denominator before thresholding
        .where(
            (F.col("cosine") > 0)
            & (F.col("m_a") + F.col("m_b") > 0)
            & (F.col("margin") >= margin_threshold)
        )
        .select("vec_a", "lang_a", "vec_b", "lang_b", "cosine", "margin")
    )
    return scored
