"""Incremental near-dup detection vs a persisted MinHash index.

The load-bearing pin: running batches B1 then B2 incrementally must flag
exactly the pairs the one-shot band join over B1 ∪ B2 produces restricted
to pairs with ≥1 endpoint in B2 — same signature family, same banding,
same estimator, so incremental adoption cannot change what gets flagged.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from naruhodo_spark.ops import incdedup as INC
from naruhodo_spark.ops.dedup import N_MINHASH

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


def _split(docs):
    """Deterministic half-split on doc_id hash parity."""
    h = F.abs(F.xxhash64("doc_id")) % 2
    return docs.where(h == 0), docs.where(h == 1)


def _one_shot_flags(spark, docs, new_ids_df, threshold=0.5):
    """Reference: full-corpus banding + estimator, restricted to pairs
    with at least one NEW endpoint, re-keyed (new_doc_id, dup_of) the way
    the incremental op reports them."""
    sigs = INC.minhash_index(docs).localCheckpoint(eager=False)
    b = INC.band_buckets(sigs)
    pairs = (
        b.alias("l")
        .join(
            b.alias("r"),
            on=[
                F.col("l.band_idx") == F.col("r.band_idx"),
                F.col("l.band_hash") == F.col("r.band_hash"),
                F.col("l.doc_id") > F.col("r.doc_id"),
            ],
        )
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )
    new_ids = {r["doc_id"] for r in new_ids_df.collect()}
    rows = []
    for r in pairs.collect():
        a_new, b_new = r["a"] in new_ids, r["b"] in new_ids
        if not (a_new or b_new):
            continue
        if a_new and b_new:
            rows.append((max(r["a"], r["b"]), min(r["a"], r["b"])))
        elif a_new:
            rows.append((r["a"], r["b"]))
        else:
            rows.append((r["b"], r["a"]))
    dt = docs.schema["doc_id"].dataType.simpleString()
    cand = (
        docs.sparkSession.createDataFrame(
            [(str(a), str(b)) for a, b in rows] or [("__none__", "__none__")],
            "new_doc_id string, dup_of string",
        )
        .where(F.col("new_doc_id") != "__none__")
        .select(
            F.col("new_doc_id").cast(dt).alias("new_doc_id"),
            F.col("dup_of").cast(dt).alias("dup_of"),
        )
        .distinct()
    )
    scored = INC._estimated_jaccard(
        sigs.withColumnRenamed("doc_id", "doc_id"), sigs, cand, N_MINHASH
    )
    return scored.where(F.col("est_jaccard") >= threshold)


def test_incremental_matches_one_shot_band_join(spark):
    docs = _docs(spark)
    old, new = _split(docs)
    idx = INC.minhash_index(old).localCheckpoint(eager=False)
    got = INC.incremental_near_dups(new, idx)["flags"]
    want = _one_shot_flags(spark, docs, new.select("doc_id"))
    g = {(r["new_doc_id"], r["dup_of"], r["est_jaccard"]) for r in got.collect()}
    w = {(r["new_doc_id"], r["dup_of"], r["est_jaccard"]) for r in want.collect()}
    assert g == w
    assert len(g) > 0  # non-vacuous: sf0.001 has planted near-dups


def test_bootstrap_equals_intra_batch_lsh(spark):
    # index_sigs=None must equal "everything is new" over the same batch
    docs = _docs(spark)
    boot = INC.incremental_near_dups(docs, None)["flags"]
    want = _one_shot_flags(spark, docs, docs.select("doc_id"))
    g = {(r["new_doc_id"], r["dup_of"]) for r in boot.collect()}
    w = {(r["new_doc_id"], r["dup_of"]) for r in want.collect()}
    assert g == w and len(g) > 0


def test_survivors_plus_flagged_cover_batch(spark):
    docs = _docs(spark)
    old, new = _split(docs)
    out = INC.incremental_near_dups(new, INC.minhash_index(old))
    n_new = new.count()
    flagged = out["flags"].select("new_doc_id").distinct().count()
    assert out["survivors"].count() == n_new - flagged
    # new_sigs covers the whole batch — the index grows by every new doc
    assert out["new_sigs"].count() == n_new


def test_index_roundtrip_through_parquet(spark, tmp_path):
    # signatures written last "month" verify against today's computation
    docs = _docs(spark)
    old, new = _split(docs)
    p = str(tmp_path / "sig_index")
    INC.minhash_index(old).write.parquet(p)
    via_disk = INC.incremental_near_dups(new, spark.read.parquet(p))["flags"]
    direct = INC.incremental_near_dups(new, INC.minhash_index(old))["flags"]
    assert via_disk.exceptAll(direct).count() == 0
    assert direct.exceptAll(via_disk).count() == 0


def test_exact_verify_appends_true_jaccard(spark):
    docs = _docs(spark)
    old, new = _split(docs)
    flags = INC.incremental_near_dups(new, INC.minhash_index(old))["flags"]
    verified = INC.verify_pairs_exact(flags, docs).collect()
    assert len(verified) == flags.count()
    for r in verified:
        assert r["jaccard"] is not None
        # the estimator is coarse (1/12 grid) but must not be wildly off
        # on planted near-dups; allow the standard MinHash error band
        assert abs(r["jaccard"] - r["est_jaccard"]) <= 0.5


def test_estimator_exact_on_identical_and_disjoint(spark):
    rows = [
        ("a", "the quick brown fox jumps over the lazy dog today"),
        ("b", "the quick brown fox jumps over the lazy dog today"),
        ("c", "completely different words appear in this sentence here now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = INC.incremental_near_dups(docs, None)["flags"].collect()
    got = {(r["new_doc_id"], r["dup_of"]): r["est_jaccard"] for r in out}
    assert got == {("b", "a"): 1.0}  # identical → 1.0; disjoint never flagged
