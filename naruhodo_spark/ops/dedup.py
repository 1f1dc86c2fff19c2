"""Deduplication operators for training-data pipelines.

Four tiers, cheapest → most semantic:

- **exact**: hash-groupBy on the normalized-content fingerprint. One
  shuffle on a uniform hash key; scales linearly.
- **n-gram Jaccard**: word-shingle explode → inverted-index self-join →
  per-pair intersection count / union. The self-join is on the shingle
  key, so hot shingles are the skew risk — the exploded index drops
  shingles above a document-frequency cap (standard practice; mirrored in
  the oracle).
- **MinHash + LSH**: per-seed minimum of md5(seed‖shingle) (lexicographic
  min of a cryptographic hash is a valid min-wise permutation and is
  engine-portable — DuckDB computes the identical md5, so signatures are
  oracle-checkable). Banding buckets candidates; only candidates get the
  exact Jaccard check.
- **SimHash**: 64-bit sign-aggregated token hashes via a vectorized
  pandas UDF; near-dups = small Hamming distance.

Embedding-cosine near-dup lives in similarity.py (same machinery).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from naruhodo_spark.ops.textstats import norm_text

SHINGLE_K = 3
N_MINHASH = 12
N_BANDS = 4  # 3 rows per band
DF_CAP = 100  # drop shingles appearing in more docs than this (skew guard)


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Groups of byte-identical (post-normalization) documents.
    Returns one row per duplicate group: representative (min doc_id),
    group size. Deterministic; oracle-checkable."""
    return (
        docs.select("doc_id", F.md5(norm_text(F.col("text"))).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .where(F.col("group_size") > 1)
    )


def shingles(docs: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """Distinct word k-shingles per doc: (doc_id, shingle). Sliding window
    as a zip_with of k shifted token arrays — pure Catalyst, and O(k)
    evaluations of the tokenizer subtree per row. (The naive
    ``transform(sequence(0, n-k), i -> slice(toks, i+1, k))`` form
    re-evaluates the split/normalize subtree once per POSITION — no
    common-subexpression elimination crosses a higher-order-function
    lambda — which made shingling quadratic per document: measured 10.4 s
    → 1.5 s at sf0.1 for the identical output.)"""
    toks = F.split(norm_text(F.col("text")), r"\s+")
    m = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    sh = F.slice(toks, 1, m)
    for j in range(1, k):
        sh = F.zip_with(
            sh, F.slice(toks, j + 1, m), lambda x, y: F.concat(x, F.lit(" "), y)
        )
    return docs.select("doc_id", F.explode(sh).alias("shingle")).distinct()


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.5, k: int = SHINGLE_K, df_cap: int = DF_CAP
) -> DataFrame:
    """All doc pairs with shingle-set Jaccard ≥ threshold.

    Inverted-index plan: explode shingles → drop ultra-common shingles
    (document frequency > df_cap — they contribute candidates
    quadratically but little signal) → self-join on shingle → count
    intersections → |A∩B| / (|A|+|B|−|A∩B|)."""
    # one materialization feeds sizes, the df-cap filter, and both join
    # sides (lazy checkpoint — computed on first use, reused after)
    sh = shingles(docs, k).localCheckpoint(eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("set_size"))
    rare = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= df_cap)
        .select("shingle")
    )
    sh = sh.join(rare, "shingle")
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            on=[
                F.col("a.shingle") == F.col("b.shingle"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return _jaccard_filter(inter, sizes, threshold, keep_inter=True)


def _jaccard_filter(inter, sizes, threshold, keep_inter):
    """Shared tail of both exact-Jaccard paths: join per-doc set sizes
    onto (doc_a, doc_b, n_inter) and threshold on
    n_inter / (|A| + |B| - n_inter). The paths differ only in HOW the
    intersections are produced (all-pairs over df-capped shingles vs
    LSH-candidate-restricted over the full sets) — the formula must stay
    in one place so a rounding/threshold change cannot drift."""
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("set_size").alias("size_b"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("size_a") + F.col("size_b") - F.col("n_inter")),
                4,
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )
    cols = ["doc_a", "doc_b"] + (["n_inter"] if keep_inter else []) + ["jaccard"]
    return out.select(*cols)


# modulus for the affine minhash family: largest prime < 2^48, so
# h1 + i*h2 stays far below 2^63 (no ANSI overflow) in both engines
MINHASH_P = 281474976710597


def minhash_signatures(
    docs: DataFrame, n_hashes: int = N_MINHASH, k: int = SHINGLE_K
) -> DataFrame:
    """MinHash signature per doc via the standard affine family
    g_i(s) = (h1(s) + i·h2(s)) mod P with h1/h2 drawn from two md5
    substrings — ONE md5 per shingle instead of one per (seed, shingle),
    and still engine-portable (DuckDB computes the identical md5 hex and
    hex→int cast, verified). Output: (doc_id, sig_0..sig_{n-1}: long)."""
    return _signatures_from_shingles(shingles(docs, k), n_hashes)


def _signatures_from_shingles(
    sh: DataFrame,
    n_hashes: int,
    key_cols: tuple[str, ...] = ("doc_id",),
    item_col: str = "shingle",
) -> DataFrame:
    """THE affine MinHash family of this repo — single definition so the
    document tier (key=doc_id, item=shingle) and the entity-context tier
    (entsplit: key=(entity, mention), item=token) can never drift. Any
    change to the hash derivation (e.g. the MINHASH_P ANSI-overflow
    bound) lands in both automatically."""
    keys = list(key_cols)
    h1 = F.conv(F.substring(F.md5(item_col), 1, 12), 16, 10).cast("long")
    h2 = (
        F.conv(F.substring(F.md5(item_col), 13, 12), 16, 10).cast("long") * 2 + 1
    )  # odd multiplier
    sh = sh.select(*keys, h1.alias("h1"), h2.alias("h2"))
    aggs = [
        F.min((F.col("h1") + F.lit(i) * F.col("h2")) % F.lit(MINHASH_P)).alias(
            f"sig_{i}"
        )
        for i in range(n_hashes)
    ]
    return sh.groupBy(*keys).agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    n_hashes: int = N_MINHASH,
    n_bands: int = N_BANDS,
    k: int = SHINGLE_K,
    threshold: float = 0.5,
) -> DataFrame:
    """LSH banding: hash each band of the signature; docs sharing any
    band bucket are candidates; candidates get the exact Jaccard check.
    The band join key is (band_idx, band_hash) — uniformly distributed,
    so the shuffle is balanced by construction."""
    rows_per_band = n_hashes // n_bands
    # the shingle index feeds BOTH the signatures and the exact-Jaccard
    # verify; a lazy localCheckpoint materializes it once instead of
    # recomputing the scan+explode per consumer
    sh_cached = shingles(docs, k).localCheckpoint(eager=False)
    sig = _signatures_from_shingles(sh_cached, n_hashes)
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
        bands.append(
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(F.concat_ws("|", *cols)).alias("band_hash"),
            )
        )
    buckets = sig.select(
        "doc_id", F.explode(F.array(*bands)).alias("band")
    ).select("doc_id", "band.band_idx", "band.band_hash")
    l, r = buckets.alias("l"), buckets.alias("r")
    candidates = (
        l.join(
            r,
            on=[
                F.col("l.band_idx") == F.col("r.band_idx"),
                F.col("l.band_hash") == F.col("r.band_hash"),
                F.col("l.doc_id") < F.col("r.doc_id"),
            ],
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )
    # exact Jaccard for CANDIDATES ONLY (that is the whole point of LSH:
    # the full O(n²) verify never runs) — intersect each candidate pair's
    # shingle sets via two joins against the inverted index.
    sh = sh_cached
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("set_size"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        candidates.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return _jaccard_filter(inter, sizes, threshold, keep_inter=False)


def near_dup_groups(
    docs: DataFrame,
    n_hashes: int = N_MINHASH,
    n_bands: int = N_BANDS,
    k: int = SHINGLE_K,
    threshold: float = 0.5,
) -> DataFrame:
    """The production dedup deliverable: (doc_id, group_id) for EVERY
    doc, where group_id = min doc_id over the transitive closure of the
    exact-duplicate and LSH-near-duplicate relations. CONTRACT: doc_id
    must be numeric (castable to bigint — the repo-wide id policy);
    non-numeric ids fail the final cast with CAST_INVALID_INPUT under
    ANSI mode.

    Tiered for scale: byte-identical docs collapse onto one
    representative FIRST (one balanced shuffle on the content
    fingerprint), and the LSH banding join runs over representatives
    only. Identical docs have identical minhash signatures, so a
    web-scale exact-dup cluster of d docs would otherwise put d copies
    into the same band bucket and pay d²/2 candidate pairs in EVERY band
    — the tier removes that cliff by construction (the band-bucket key
    is uniform over DISTINCT contents). Exact membership edges + rep
    near-dup pairs then merge transitively via connected components
    (size-gated: driver union-find for small edge sets, distributed star
    contraction beyond DRIVER_CC_THRESHOLD — operators/canon.py)."""
    from naruhodo_spark.operators.canon import (
        cc_labels_auto,
        pad_signed_id,
        unpad_signed_id,
    )

    fp = docs.select("doc_id", F.md5(norm_text(F.col("text"))).alias("fp"))
    rep = fp.groupBy("fp").agg(F.min("doc_id").alias("rep_id"))
    memb = fp.join(rep, "fp").select("doc_id", "rep_id").localCheckpoint(eager=False)
    reps = docs.join(
        memb.where(F.col("doc_id") == F.col("rep_id")).select("doc_id"), "doc_id"
    )
    pairs = minhash_lsh_pairs(
        reps, n_hashes=n_hashes, n_bands=n_bands, k=k, threshold=threshold
    )
    # signed pad: doc_ids are numeric by contract but often
    # hash-derived (xxhash64 is negative half the time — the composed
    # kg2td drill's corpus ids); pad_numeric_id's '-' would sort before
    # '0' AND the final bigint cast throws on the padded string. Same
    # fix as similarity.embedding_near_dups. Non-negative ids decode
    # identically, so the dd_near_dup_groups oracle is unchanged.
    pad = pad_signed_id
    edges = memb.select(pad("doc_id").alias("src"), pad("rep_id").alias("dst")).unionByName(
        pairs.select(pad("doc_a").alias("src"), pad("doc_b").alias("dst"))
    )
    return cc_labels_auto(edges).select(
        unpad_signed_id("node").alias("doc_id"),
        unpad_signed_id("label").alias("group_id"),
    )


DUP_SPAN_N = 50  # Lee et al. 2022 use 50-token windows at web scale


def duplicate_ngram_spans(docs: DataFrame, n: int = DUP_SPAN_N) -> DataFrame:
    """Exact-substring deduplication at token n-gram granularity (the
    ExactSubstr dedup of Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better", arXiv:2107.06499 — suffix-array exact
    match approximated by fixed-width token windows, which is how the
    criterion is usually deployed on an engine without a distributed
    suffix array): any n-token window whose hash occurs more than once in
    the corpus is a duplicated span; the FIRST occurrence (min
    (doc_id, position)) is kept, every other occurrence is marked for
    removal. Intra-document repeats count too (a doc repeating its own
    boilerplate keeps one copy).

    Returns one row per input doc (left join — no silent deletion):
    (doc_id, n_tokens, dup_windows, spans_removed:array<struct<s,e>>,
    n_tokens_removed, text_deduped) where spans are merged 0-based
    inclusive token ranges over the NORMALIZED token stream and
    text_deduped is that stream with removed tokens dropped, rejoined
    with single spaces (the op normalizes whitespace/case exactly like
    the fingerprint tier — byte-faithful reconstruction would need
    original offsets, which the spans provide).

    Scale shape: windows are built once per doc from k shifted array
    slices (zip_with — the shingles() CSE-safe pattern) and posexploded,
    so the occurrence table is ≈ one row per corpus token; the frequency
    agg is a uniform hash-key groupBy with map-side partial counts (a
    boilerplate window duplicated 10⁹× is ONE reduced row, not a hot
    collect); the join back is an equi-join on the same uniform key; the
    per-doc span merge is a collect_list bounded by document length.
    Nothing is all-pairs and no stage is corpus-quadratic.
    """
    toks_col = F.split(norm_text(F.col("text")), r"\s+")
    base = docs.select("doc_id", toks_col.alias("toks")).localCheckpoint(
        eager=False
    )
    m = F.greatest(F.size(F.col("toks")) - (n - 1), F.lit(0))
    sh = F.slice(F.col("toks"), 1, m)
    for j in range(1, n):
        sh = F.zip_with(
            sh,
            F.slice(F.col("toks"), j + 1, m),
            lambda x, y: F.concat(x, F.lit(" "), y),
        )
    occ = base.select(
        "doc_id", F.posexplode(sh).alias("pos", "window")
    ).select("doc_id", "pos", F.xxhash64("window").alias("h"))
    freq = occ.groupBy("h").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(F.struct("doc_id", "pos")).alias("keeper"),
    )
    marked = (
        occ.join(freq.where(F.col("cnt") > 1), "h")
        .where(
            (F.col("doc_id") != F.col("keeper.doc_id"))
            | (F.col("pos") != F.col("keeper.pos"))
        )
        .groupBy("doc_id")
        .agg(
            F.sort_array(F.collect_list("pos")).alias("starts"),
        )
    )
    # merge overlapping/adjacent [p, p+n-1] windows into disjoint spans
    merged = F.expr(
        f"""
        aggregate(
          starts,
          cast(array() as array<struct<s:int,e:int>>),
          (acc, p) -> CASE
            WHEN size(acc) = 0 OR p > element_at(acc, -1).e + 1
              THEN concat(acc, array(struct(p AS s, p + {n - 1} AS e)))
            ELSE concat(
              slice(acc, 1, size(acc) - 1),
              array(struct(element_at(acc, -1).s AS s,
                           greatest(element_at(acc, -1).e,
                                    p + {n - 1}) AS e)))
          END)
        """
    )
    spans = marked.select(
        "doc_id",
        F.size("starts").alias("dup_windows"),
        merged.alias("spans_removed"),
    )
    out = base.join(spans, "doc_id", "left").select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.coalesce("dup_windows", F.lit(0)).alias("dup_windows"),
        F.coalesce(
            "spans_removed",
            F.expr("cast(array() as array<struct<s:int,e:int>>)"),
        ).alias("spans_removed"),
        F.col("toks"),
    )
    covered = F.expr(
        "filter(toks, (t, i) -> NOT exists(spans_removed,"
        " r -> i >= r.s AND i <= r.e))"
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "dup_windows",
        "spans_removed",
        F.expr(
            "aggregate(spans_removed, 0, (a, r) -> a + r.e - r.s + 1)"
        ).alias("n_tokens_removed"),
        F.array_join(covered, " ").alias("text_deduped"),
    )


_SIMHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("simhash", T.LongType(), False),
    ]
)


def simhash(docs: DataFrame) -> DataFrame:
    """64-bit SimHash over word tokens, vectorized pandas UDF
    (mapInPandas). Token hashes are the first 8 bytes of md5 — portable
    and deterministic. Near-dups = Hamming distance ≤ 3 (downstream).

    Batch body is factorize-then-scatter (the vchunk.py trick), not a
    per-token Python loop: tokens across the whole Arrow batch are
    factorized once, each UNIQUE token is md5-hashed once, and the ±1
    bit contributions land via one np.add.at scatter per batch — web
    text repeats tokens heavily, so unique-token hashing plus pure-numpy
    accumulation is ~10× the per-(doc,token) hashlib loop it replaced
    (r01 VERDICT finding #6), with bit-identical output (md5 contract
    unchanged, verified by the unchanged dd_simhash oracle)."""
    import hashlib

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_docs = len(pdf)
            if n_docs == 0:
                yield pd.DataFrame(
                    {"doc_id": pd.Series([], dtype="int64"),
                     "simhash": pd.Series([], dtype="int64")}
                )
                continue
            # NULL text == empty text == zero tokens → simhash 0; every
            # doc keeps its row (the oracle re-attaches via LEFT JOIN)
            tok_lists = [
                ("" if t is None else str(t)).lower().split()
                for t in pdf["text"]
            ]
            counts = np.fromiter(
                (len(t) for t in tok_lists), dtype=np.int64, count=n_docs
            )
            flat = [t for toks in tok_lists for t in toks]
            doc_idx = np.repeat(np.arange(n_docs), counts)
            codes, uniques = pd.factorize(pd.Index(flat)) if flat else (
                np.array([], dtype=np.int64), [])
            # one md5 per UNIQUE token; 64 bits → (n_unique, 64) ±1 matrix
            uhash = np.array(
                [
                    np.frombuffer(hashlib.md5(u.encode()).digest()[:8], np.uint8)
                    for u in uniques
                ],
                dtype=np.uint8,
            ).reshape(len(uniques), 8)
            ubits = (
                np.unpackbits(uhash, axis=1).astype(np.int64) * 2 - 1
            )  # MSB-first, matching the hex-substring oracle
            acc = np.zeros((n_docs, 64), dtype=np.int64)
            np.add.at(acc, doc_idx, ubits[codes])
            packed = np.packbits(acc > 0, axis=1)  # big-endian bytes
            vals = [
                int.from_bytes(row.tobytes(), "big", signed=True) for row in packed
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64").to_numpy(),
                    "simhash": np.array(vals, dtype=np.int64),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(fn, schema=_SIMHASH_SCHEMA)


# -- banded Hamming join (simhash / phash near-dup candidates) ---------------

def _default_bands(max_hamming: int, bands_per_key: int) -> int:
    """Fewest blocks that keep the pigeonhole recall guarantee: at most
    max_hamming blocks can differ, so >= bands_per_key clean blocks need
    max_hamming + bands_per_key blocks total. Fewest blocks = widest
    slices = fewest random key collisions."""
    n = max_hamming + bands_per_key
    if n > 64:
        raise ValueError(
            f"max_hamming={max_hamming} + bands_per_key={bands_per_key} "
            "exceeds the 64-bit signature"
        )
    return n


def _sig_block_keys(
    sigs: DataFrame, id_col: str, sig_col: str, n_bands: int,
    bands_per_key: int,
):
    """Explode a 64-bit signature into (id, sig, band_idx, band_val)
    candidate-key rows — one row per combination of ``bands_per_key``
    of the ``n_bands`` bit blocks (Manku WWW'07 table scheme; block
    widths may be uneven when n_bands does not divide 64).
    shiftrightunsigned keeps negative (sign-bit-set) signatures
    correct — blocks are raw bit slices, never sign-extended."""
    import itertools

    widths = [
        64 // n_bands + (1 if i < 64 % n_bands else 0)
        for i in range(n_bands)
    ]
    offsets = [sum(widths[:i]) for i in range(n_bands)]
    sig = F.col(sig_col)
    # a 64-bit-wide block (n_bands=1, the max_hamming=0 exact-signature
    # config) needs no mask — and (1 << 64) - 1 would overflow LongType
    blocks = [
        F.shiftrightunsigned(sig, offsets[i])
        .bitwiseAND(F.lit((1 << widths[i]) - 1))
        if widths[i] < 64
        else sig
        for i in range(n_bands)
    ]
    # combo key = xxhash64 of the selected block values: one narrow
    # 64-bit join key instead of a concatenated string. A hash collision
    # only ADDS a candidate pair (popcount filters it) — recall is
    # unaffected, and at ~2^64 key space collision volume is negligible.
    entries = [
        F.struct(
            F.lit(ci).alias("band_idx"),
            F.xxhash64(*[blocks[b] for b in combo]).alias("band_val"),
        )
        for ci, combo in enumerate(
            itertools.combinations(range(n_bands), bands_per_key)
        )
    ]
    return sigs.select(
        F.col(id_col).alias("id"),
        sig.alias("sig"),
        F.explode(F.array(*entries)).alias("b"),
    ).select("id", "sig", F.col("b.band_idx"), F.col("b.band_val"))


def _check_banding(max_hamming: int, n_bands: int, bands_per_key: int):
    if not 1 <= bands_per_key <= n_bands:
        raise ValueError(
            f"bands_per_key={bands_per_key} out of range for "
            f"n_bands={n_bands}"
        )
    if n_bands - max_hamming < bands_per_key:
        raise ValueError(
            f"n_bands={n_bands} - max_hamming={max_hamming} < "
            f"bands_per_key={bands_per_key} loses the pigeonhole recall "
            "guarantee"
        )
    if n_bands > 64:
        raise ValueError(f"n_bands={n_bands} exceeds the 64-bit signature")


def hamming_hot_buckets(
    sigs: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    max_hamming: int = 3,
    n_bands: int | None = None,
    bucket_cap: int = 1_000,
    bands_per_key: int = 1,
) -> DataFrame:
    """Audit surface for hamming_near_dups' skew guard: the
    (band_idx, band_val, n_members) buckets whose candidate generation
    was dropped. Non-empty output means near-identical signatures above
    the cap — exact-dedup those upstream (the repo's no-silent-caps
    policy: the drop is observable, never implicit).

    NOTE: this standalone form recomputes the banding (and whatever
    feeds ``sigs``) from scratch — for production use prefer
    ``hamming_near_dups(..., return_audit=True)``, which returns the
    same frame from the already-checkpointed bands."""
    n_bands = n_bands or _default_bands(max_hamming, bands_per_key)
    _check_banding(max_hamming, n_bands, bands_per_key)
    bands = _sig_block_keys(sigs, id_col, sig_col, n_bands, bands_per_key)
    return (
        bands.groupBy("band_idx", "band_val")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .where(F.col("n_members") > bucket_cap)
    )


def hamming_near_dups(
    sigs: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    max_hamming: int = 3,
    n_bands: int | None = None,
    bucket_cap: int = 1_000,
    bands_per_key: int = 1,
    return_audit: bool = False,
) -> "DataFrame | tuple[DataFrame, DataFrame]":
    """(id_a, id_b, hamming) pairs with Hamming(sig_a, sig_b) <=
    max_hamming over 64-bit signatures — the downstream simhash()
    promised ("near-dups = Hamming <= 3") and the same machinery media
    perceptual hashes use (ops/multimodal.media_near_dups).

    Block-combination candidates, not all-pairs (Manku, Jain & Das
    Sarma, WWW'07 — the Google web-dedup design): split the signature
    into n_bands bit blocks; a pair within max_hamming differs in at
    most max_hamming blocks, so it agrees EXACTLY on every combination
    of bands_per_key blocks drawn from its >= n_bands - max_hamming
    clean ones (pigeonhole — recall is exact, unlike probabilistic
    MinHash banding). Candidates come from an equi-join on
    (combination_id, concatenated block values); only candidates pay
    the popcount check (F.bit_count(xor), JVM-side).

    bands_per_key trades candidate volume against key fan-out:
    - 1 (default): n_bands = max_hamming+1 wide blocks, one key each —
      right up to ~10^5-10^6 signatures, after which random collisions
      on a single ~16-bit block dominate the join.
    - Manku's production point for max_hamming=3 is n_bands=6,
      bands_per_key=3: C(6,3)=20 keys per signature but ~32 effective
      key bits, so expected random-collision volume stays ~n^2/2^32 —
      the 10^12-scale configuration (measured: BENCH/BASELINE.md).

    Skew guard: a key bucket with B members yields B^2/2 candidates —
    near-identical signatures (e.g. simhash 0 for empty docs) would go
    quadratic. Buckets above bucket_cap are dropped from candidate
    generation (``return_audit=True`` returns (pairs, dropped_buckets)
    computed from the SAME checkpointed bands — the standalone
    hamming_hot_buckets recomputes the signature stage and exists for
    ad-hoc inspection only); exact-dedup upstream is the right tool for
    identical content. At 10^12 docs everything here is equi-join +
    groupBy on uniform hash-slice keys.
    """
    n_bands = n_bands or _default_bands(max_hamming, bands_per_key)
    _check_banding(max_hamming, n_bands, bands_per_key)
    # one signature computation for all four consumers (both self-join
    # sides + both hot-bucket probes): without the checkpoint the plan
    # re-runs the upstream signature MapInPandas per branch — the
    # expensive stage x4 (caught by the plan pin in tests/test_plans.py)
    bands = _sig_block_keys(
        sigs, id_col, sig_col, n_bands, bands_per_key
    ).localCheckpoint(eager=False)
    hot_full = (
        bands.groupBy("band_idx", "band_val")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .where(F.col("n_members") > bucket_cap)
    )
    hot = hot_full.select("band_idx", "band_val")
    bands = bands.join(F.broadcast(hot), ["band_idx", "band_val"], "left_anti")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()  # a pair can match on several keys
    )
    out = cand.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"),
    ).where(F.col("hamming") <= max_hamming)
    return (out, hot_full) if return_audit else out


def simhash_near_dups(
    docs: DataFrame, max_hamming: int = 3, bucket_cap: int = 1_000,
    n_bands: int | None = None, bands_per_key: int = 1,
) -> DataFrame:
    """simhash() + block-combination Hamming join: (id_a, id_b, hamming)
    text near-dup pairs. n_bands/bands_per_key select the banding —
    (6, 3) is the Manku web-scale configuration. (Explicit parameters,
    not **kwargs: forwarding return_audit here would break this
    function's pairs-frame contract.)"""
    return hamming_near_dups(
        simhash(docs), "doc_id", "simhash", max_hamming,
        n_bands=n_bands, bucket_cap=bucket_cap, bands_per_key=bands_per_key,
    )
