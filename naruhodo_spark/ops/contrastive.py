"""Contrastive training pairs from near-duplicate structure — the
text-embedding training staple (SimCSE/E5-style: an anchor document,
one semantically-equivalent positive, k unrelated negatives). The
near-dup groups the dedup tier already computes (ops/dedup.
near_dup_groups) ARE the positive supervision: two documents in one
group are near-duplicates, i.e. a free positive pair; negatives are
hash-sampled from other groups.

Input is the GROUPS frame (doc_id, group_id), decoupled from how the
groups were made (MinHash tiers, SemDeDup cells, exact fingerprints —
any grouping works), so the op composes with every dedup surface and
the test mirror only has to model the sampling, not the LSH.

Determinism contract (repo standard): positives are the group's two
lexicographically-least members paired with each anchor; negatives use
the kgtrain hash-BUCKET pattern — a corruption row equi-joins a ~32-doc
bucket of the doc table and keeps the min-hash candidate — so there is
no RNG, no global sort, no per-anchor scan of the corpus, and the
output is repartition-invariant and resume-stable.

Scale shape: one groupBy over the groups frame (uniform), one
bucket-equi-join for negatives (uniform keys both sides, ~bucket_target
candidate rows per corruption), one anti-join back to the anchor's own
group. Nothing is corpus-quadratic; group size never matters because
each anchor takes ONE positive (the group min, or the second-least for
the min itself), not all-pairs-within-group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def contrastive_pairs(
    groups: DataFrame,
    k_neg: int = 2,
    seed: str = "ctr42",
    bucket_target: int = 32,
) -> DataFrame:
    """(anchor, other, label, neg_i): for every doc in a group of ≥2,
    one positive row (label='pos', neg_i NULL — the group's least
    member, or the second-least when the anchor IS the least) and up to
    ``k_neg`` negative rows (label='neg') hash-sampled from other
    groups. Singleton-group docs serve as negatives but are not
    anchors (no positive exists for them).

    A negative whose sampled bucket only contains same-group docs is
    dropped (filtered sampling, same contract as
    kgtrain.negative_samples) — output carries neg_i so callers can
    count shortfalls."""
    if k_neg < 0:
        raise ValueError(f"contrastive_pairs: k_neg must be >= 0, got {k_neg}")
    g = groups.select(
        F.col("doc_id").cast("string").alias("doc_id"), "group_id"
    ).localCheckpoint(eager=False)  # scanned by anchors, buckets, anti-join

    # per group: the two least members. min-above-min can't nest inside
    # one aggregate, so: min first, join it back, then a conditional min
    # — both aggregations are O(1) state per group (never a group-sized
    # collect)
    heads = (
        g.join(
            g.groupBy("group_id").agg(F.min("doc_id").alias("g_min")),
            "group_id",
        )
        .groupBy("group_id", "g_min")
        .agg(
            F.min(
                F.when(F.col("doc_id") != F.col("g_min"), F.col("doc_id"))
            ).alias("g_second"),
            F.count(F.lit(1)).alias("g_size"),
        )
    )
    anchors = (
        g.join(heads, "group_id")
        .where(F.col("g_size") >= 2)
        .select(
            "group_id",
            F.col("doc_id").alias("anchor"),
            F.when(
                F.col("doc_id") == F.col("g_min"), F.col("g_second")
            )
            .otherwise(F.col("g_min"))
            .alias("pos"),
        )
        .localCheckpoint(eager=False)  # reused by pos rows + neg fan-out
    )
    pos_rows = anchors.select(
        "anchor",
        F.col("pos").alias("other"),
        F.lit("pos").alias("label"),
        F.lit(None).cast("int").alias("neg_i"),
    )
    if k_neg == 0:
        return pos_rows

    n = g.count()
    nb = max(1, n // bucket_target)
    doc_b = g.select(
        F.col("doc_id").alias("cand"),
        F.col("group_id").alias("cand_group"),
        F.pmod(F.xxhash64(F.lit(seed), "doc_id"), F.lit(nb)).alias("bucket"),
    )
    corr = anchors.select(
        "group_id",
        "anchor",
        F.explode(F.sequence(F.lit(0), F.lit(k_neg - 1))).alias("neg_i"),
    ).withColumn(
        "bucket",
        F.pmod(F.xxhash64(F.lit(seed), "anchor", "neg_i"), F.lit(nb)),
    )
    pick = F.xxhash64(F.lit(seed), "cand", "anchor", "neg_i")
    neg_rows = (
        corr.join(doc_b, "bucket")
        .where(F.col("cand_group") != F.col("group_id"))  # other groups only
        .groupBy("anchor", "neg_i")
        .agg(F.min_by("cand", pick).alias("other"))
        # two neg_i picks can land in the same bucket and choose the
        # same candidate (certain when nb == 1 on tiny corpora) — a
        # duplicate negative shrinks the effective k with no training
        # value, so collapse to the lowest neg_i; the output therefore
        # carries up to k DISTINCT negatives, possibly fewer (the same
        # documented shortfall contract as the empty-bucket drop)
        .groupBy("anchor", "other")
        .agg(F.min("neg_i").alias("neg_i"))
        .select(
            "anchor", "other", F.lit("neg").alias("label"), "neg_i"
        )
    )
    return pos_rows.unionByName(neg_rows)


def hard_negatives(
    embeddings: DataFrame,
    k: int = 3,
    exclude_threshold: float = 0.98,
    cell_col: str = "label",
    group_col: "str | None" = None,
) -> DataFrame:
    """(anchor, negative, cosine, rank) — the k HARDEST negatives per
    vector for retrieval/contrastive training: nearest non-positive
    neighbors by cosine (Karpukhin DPR 2020's hard-negative recipe over
    an ANN index instead of BM25).

    Two false-negative guards, both standard and both audited by the
    caller's own inputs:

    - rows sharing ``group_col`` (same source doc / near-dup group /
      known positive set) are never paired;
    - candidates with cosine ≥ ``exclude_threshold`` are dropped — an
      unlabeled near-duplicate is almost surely a positive, and
      training on it as a negative poisons the loss.

    Scale shape: candidates come from the IVF cell equi-join
    (``cell_col``, same as similarity.topk_ivf) — Σ_cell n_cell², never
    n²; the top-k window partitions by anchor over cell-bounded
    candidate lists. embeddings: (vec_id, embedding, cell_col[,
    group_col]).
    """
    from naruhodo_spark.ops.similarity import _dot, _normed

    if k < 1:
        raise ValueError(f"hard_negatives: k must be >= 1, got {k}")
    extra = [cell_col] + ([group_col] if group_col else [])
    l = _normed(embeddings, "anchor", "emb_a", "na", extra=extra)
    r = _normed(embeddings, "negative", "emb_b", "nb", extra=extra)
    for c in extra:
        l = l.withColumnRenamed(c, f"l_{c}")
        r = r.withColumnRenamed(c, f"r_{c}")
    pairs = l.join(
        r, F.col(f"l_{cell_col}") == F.col(f"r_{cell_col}")
    ).where(F.col("anchor") != F.col("negative"))
    if group_col:
        pairs = pairs.where(
            ~F.col(f"l_{group_col}").eqNullSafe(F.col(f"r_{group_col}"))
        )
    # _dot casts both sides to double BEFORE multiplying (module
    # convention): a float32 product accumulated in single precision can
    # diverge from the float64 mirror near the 4-dp rounding or the
    # exclude_threshold boundary (ADVICE r04)
    cos = F.round(
        _dot(F.col("emb_a"), F.col("emb_b")) / (F.col("na") * F.col("nb")),
        4,
    )
    scored = (
        pairs.withColumn("cosine", cos)
        .where(F.col("cosine") < exclude_threshold)
        .select("anchor", "negative", "cosine")
    )
    w = Window.partitionBy("anchor").orderBy(
        F.desc("cosine"), F.asc("negative")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
