"""Incremental near-duplicate detection against a persisted MinHash index.

At web scale you never re-dedupe the whole corpus: each incoming batch is
checked against a COMPACT persisted index of what the corpus already
contains, and the index grows by the batch's survivors. The index here is
the MinHash signature table — n_hashes longs per document (~100 bytes/doc;
a 10^12-doc corpus indexes in ~100 TB-of-text → ~0.1 PB-of-index ratio,
i.e. ~0.1 % of corpus bytes) — NOT the inverted shingle index, which is
one row per corpus token and would cost as much as the corpus itself.

Consequence, stated honestly: candidates pulled from the band join are
verified by SIGNATURE-ESTIMATED Jaccard (fraction of agreeing minhash
components — the unbiased estimator the signatures exist to provide), not
the exact shingle-set Jaccard of `dedup.minhash_lsh_pairs` (whose verify
re-reads the shingle index it just built — affordable inside one batch
job, not across a persisted corpus). With the repo's 12-hash family the
estimate is coarse (granularity 1/12); callers wanting exact verification
on the flagged pairs can re-read just those docs' texts (the flagged set
is tiny) — `verify_pairs_exact` does exactly that.

Batch-vs-incremental equivalence: the banding key and the signature family
are byte-identical to `dedup.minhash_signatures` (shared helper), so
running batches B1, B2 incrementally flags exactly the pairs the same-key
band join would produce over B1 ∪ B2 restricted to pairs with at least one
endpoint in B2 (pinned in tests/test_incdedup.py).

Scale shape: the band join is an equi-join on (band_idx, band_hash) —
uniform by construction (md5 of the band's signature slice). The index side
arrives pre-banded from storage (a map-only explode of the signature
table), so the per-batch cost is O(|batch| + matching buckets), never
O(|corpus|): with the index partitioned/bucketed on band_hash the join
prunes to the buckets the batch actually touches, and AQE broadcasts the
batch side when it is small. Intra-batch pairs take the same plan over the
batch's own bands (both-sides-new), so no duplicate slips through the gap
between "old vs new" and "new vs new".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from naruhodo_spark.ops.dedup import (
    N_BANDS,
    N_MINHASH,
    SHINGLE_K,
    _signatures_from_shingles,
    shingles,
)


def minhash_index(
    docs: DataFrame,
    n_hashes: int = N_MINHASH,
    k: int = SHINGLE_K,
) -> DataFrame:
    """The persistable corpus index: (doc_id, sig_0..sig_{n-1}).
    Byte-identical family to `dedup.minhash_signatures` (shared helper) —
    an index built last month verifies against signatures computed today."""
    return _signatures_from_shingles(shingles(docs, k), n_hashes)


def band_buckets(
    sigs: DataFrame, n_hashes: int = N_MINHASH, n_bands: int = N_BANDS
) -> DataFrame:
    """Map-only explode of a signature table into LSH band buckets:
    (doc_id, band_idx, band_hash). Same banding as `minhash_lsh_pairs`."""
    rows_per_band = n_hashes // n_bands
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
        bands.append(
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(F.concat_ws("|", *cols)).alias("band_hash"),
            )
        )
    return sigs.select("doc_id", F.explode(F.array(*bands)).alias("band")).select(
        "doc_id", "band.band_idx", "band.band_hash"
    )


def _estimated_jaccard(left_sigs, right_sigs, pairs, n_hashes):
    """Join both signature vectors onto candidate pairs and score by the
    fraction of agreeing components — the standard unbiased MinHash
    estimator of Jaccard similarity."""
    a = left_sigs.select(
        F.col("doc_id").alias("new_doc_id"),
        *[F.col(f"sig_{i}").alias(f"a{i}") for i in range(n_hashes)],
    )
    b = right_sigs.select(
        F.col("doc_id").alias("dup_of"),
        *[F.col(f"sig_{i}").alias(f"b{i}") for i in range(n_hashes)],
    )
    agree = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(n_hashes)
    )
    return (
        pairs.join(a, "new_doc_id")
        .join(b, "dup_of")
        .withColumn("est_jaccard", F.round(agree / F.lit(n_hashes), 4))
        .select("new_doc_id", "dup_of", "est_jaccard")
    )


def incremental_near_dups(
    new_docs: DataFrame,
    index_sigs: DataFrame | None,
    n_hashes: int = N_MINHASH,
    n_bands: int = N_BANDS,
    k: int = SHINGLE_K,
    threshold: float = 0.5,
) -> dict[str, DataFrame]:
    """Check a batch against the corpus index WITHOUT touching corpus text.

    Returns a dict of lazy frames:
      - ``flags``: (new_doc_id, dup_of, est_jaccard) — one row per flagged
        (new doc, prior-or-batch doc) pair with estimated Jaccard ≥
        threshold. ``dup_of`` < ``new_doc_id`` lexicographically when both
        are new (each intra-batch pair surfaces once); index docs appear
        only as ``dup_of``.
      - ``new_sigs``: the batch's signature rows — union onto the stored
        index (the caller owns the write, typically
        ``storage.write_table(..., mode="append")`` inside the same
        foreachBatch transaction as the seen-ids append).
      - ``survivors``: new docs with NO flagged pair (the rows a dedup
        gate admits to the corpus).

    ``index_sigs=None`` (bootstrap) degrades to intra-batch LSH only.
    """
    new_sigs = minhash_index(new_docs, n_hashes, k).localCheckpoint(eager=False)
    nb = band_buckets(new_sigs, n_hashes, n_bands)

    # new vs index: plain equi-join, index side only ever probed
    legs = []
    if index_sigs is not None:
        ib = band_buckets(index_sigs, n_hashes, n_bands)
        legs.append(
            nb.alias("l")
            .join(
                ib.alias("r"),
                on=[
                    F.col("l.band_idx") == F.col("r.band_idx"),
                    F.col("l.band_hash") == F.col("r.band_hash"),
                ],
            )
            .select(
                F.col("l.doc_id").alias("new_doc_id"),
                F.col("r.doc_id").alias("dup_of"),
            )
        )
    # new vs new: same plan over the batch's own bands, ordered so each
    # pair surfaces once
    legs.append(
        nb.alias("l")
        .join(
            nb.alias("r"),
            on=[
                F.col("l.band_idx") == F.col("r.band_idx"),
                F.col("l.band_hash") == F.col("r.band_hash"),
                F.col("l.doc_id") > F.col("r.doc_id"),
            ],
        )
        .select(
            F.col("l.doc_id").alias("new_doc_id"),
            F.col("r.doc_id").alias("dup_of"),
        )
    )
    candidates = legs[0]
    for leg in legs[1:]:
        candidates = candidates.unionByName(leg)
    candidates = candidates.distinct()

    right = (
        new_sigs
        if index_sigs is None
        else index_sigs.unionByName(new_sigs)
    )
    flags = _estimated_jaccard(new_sigs, right, candidates, n_hashes).where(
        F.col("est_jaccard") >= threshold
    )
    survivors = new_docs.join(
        flags.select(F.col("new_doc_id").alias("doc_id")).distinct(),
        "doc_id",
        "left_anti",
    )
    return {"flags": flags, "new_sigs": new_sigs, "survivors": survivors}


def verify_pairs_exact(
    flags: DataFrame,
    texts: DataFrame,
    k: int = SHINGLE_K,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact shingle-set Jaccard for an already-flagged pair set: reads
    ONLY the flagged docs' texts (semi-join pushdown on doc_id), shingles
    that small frame, and intersects per pair. ``texts`` is the corpus
    text table — at scale a point-lookup-friendly store; here any
    (doc_id, text) frame. Output: (new_doc_id, dup_of, est_jaccard,
    jaccard) with the exact value appended; rows below threshold exactly
    are retained with their exact score so the caller sees estimator
    disagreement instead of silent drops."""
    ids = (
        flags.select(F.col("new_doc_id").alias("doc_id"))
        .unionByName(flags.select(F.col("dup_of").alias("doc_id")))
        .distinct()
    )
    sh = shingles(texts.join(ids, "doc_id"), k).localCheckpoint(eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("set_size"))
    sh_a = sh.select(F.col("doc_id").alias("new_doc_id"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("dup_of"), "shingle")
    inter = (
        flags.select("new_doc_id", "dup_of")
        .join(sh_a, "new_doc_id")
        .join(sh_b, ["dup_of", "shingle"])
        .groupBy("new_doc_id", "dup_of")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("new_doc_id"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("dup_of"), F.col("set_size").alias("size_b"))
    return (
        flags.join(inter, ["new_doc_id", "dup_of"], "left")
        .join(sa, "new_doc_id", "left")
        .join(sb, "dup_of", "left")
        .select(
            "new_doc_id",
            "dup_of",
            "est_jaccard",
            F.round(
                F.coalesce(F.col("n_inter"), F.lit(0))
                / (F.col("size_a") + F.col("size_b") - F.coalesce(F.col("n_inter"), F.lit(0))),
                4,
            ).alias("jaccard"),
        )
    )
