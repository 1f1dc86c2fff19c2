"""Banded Hamming near-dup join (ops/dedup.hamming_near_dups) and the
media perceptual-hash near-dup built on it (ops/multimodal.phash_media /
media_near_dups): exact-recall pigeonhole guarantee vs a brute-force
python mirror, signedness handling, the hot-bucket skew guard + audit,
and the end-to-end simhash/media paths."""

import hashlib

import pyspark.sql.functions as F

from naruhodo_spark.ops import dedup as DD
from naruhodo_spark.ops import multimodal as MM

M64 = (1 << 64) - 1


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def _clustered_sigs():
    """12 md5-derived base patterns (several with the sign bit set),
    each with variants at Hamming 0–6 — deterministic, no RNG."""
    sigs = []
    for c in range(12):
        base = int.from_bytes(
            hashlib.md5(f"cluster-{c}".encode()).digest()[:8], "big"
        )
        sigs.append((f"c{c}-v0", _to_signed(base)))
        for v, nbits in enumerate([1, 2, 3, 4, 6], start=1):
            flipped = base
            for b in range(nbits):
                flipped ^= 1 << ((7 * v + 13 * b + c) % 64)
            sigs.append((f"c{c}-v{v}", _to_signed(flipped)))
    return sigs


def _brute_pairs(sigs, max_hamming):
    out = set()
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            a, b = sigs[i], sigs[j]
            ida, idb = (a[0], b[0]) if a[0] < b[0] else (b[0], a[0])
            h = bin(((a[1] ^ b[1]) & M64)).count("1")
            if h <= max_hamming:
                out.add((ida, idb, h))
    return out


def test_hamming_near_dups_matches_bruteforce(spark):
    sigs = _clustered_sigs()
    df = spark.createDataFrame(sigs, ["doc_id", "simhash"])
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in DD.hamming_near_dups(df, max_hamming=3).collect()
    }
    want = _brute_pairs(sigs, 3)
    assert got == want
    assert len(want) > 10  # non-vacuous: the clusters really overlap
    # boundary: every hamming == 3 pair is present (exact recall),
    # nothing above 3 leaks through
    assert any(h == 3 for _, _, h in got)
    assert all(h <= 3 for _, _, h in got)


def test_hamming_hot_bucket_guard_and_audit(spark):
    # 50 identical signatures + one clean pair: the identical blob is
    # dropped from candidate generation, the clean pair survives
    rows = [(f"dup-{i}", 1234567) for i in range(50)]
    rows += [("keep-a", 1 << 40), ("keep-b", (1 << 40) ^ 3)]
    df = spark.createDataFrame(rows, ["doc_id", "simhash"])
    pairs = DD.hamming_near_dups(df, max_hamming=3, bucket_cap=10).collect()
    assert {(r["id_a"], r["id_b"], r["hamming"]) for r in pairs} == {
        ("keep-a", "keep-b", 2)
    }
    audit = DD.hamming_hot_buckets(df, max_hamming=3, bucket_cap=10)
    assert audit.count() >= 4  # the dup blob is hot in every band
    # the hottest bucket is the dup blob's zero high band, which keep-a
    # and keep-b also share (their high bits are zero too): 50 + 2
    assert audit.agg(F.max("n_members")).head()[0] == 52


def test_simhash_near_dups_e2e(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely unrelated content about spark shuffles"),
        ],
        ["doc_id", "text"],
    )
    pairs = DD.simhash_near_dups(docs, max_hamming=3).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in pairs] == [(1, 2, 0)]


def test_media_near_dups_with_injected_hasher(spark):
    # synth media spans; inject a hasher simulating a perceptual hash:
    # content cluster = md5(doc-group), variant bits from the span idx
    from naruhodo_spark.synth import synth_documents

    media = MM.media_spans(synth_documents(spark, 200, num_partitions=8))

    def near_hasher(payload, ref, mtype):
        doc = int(ref.split("://")[1].split("/")[0])
        span = int(ref.rsplit("/", 1)[1].split(".")[0])
        base = int.from_bytes(
            hashlib.md5(f"asset-{doc % 6}".encode()).digest()[:8], "big"
        )
        for b in range(span % 3):  # 0–2 flipped bits within a cluster
            base ^= 1 << ((11 * span + b) % 64)
        return _to_signed(base)

    hashed = MM.phash_media(media, hasher=near_hasher)
    pairs = MM.media_near_dups(hashed, max_hamming=4)
    rows = pairs.collect()
    assert len(rows) > 0
    # mirror exactly against the same hasher applied to the distinct refs
    refs = [r["media_ref"] for r in media.select("media_ref").distinct().collect()]
    sigs = [(ref, near_hasher(None, ref, "img")) for ref in refs]
    want = {(a, b, h) for a, b, h in _brute_pairs(sigs, 4)}
    got = {(r["ref_a"], r["ref_b"], r["hamming"]) for r in rows}
    assert got == want


def test_phash_standin_deterministic(spark):
    from naruhodo_spark.synth import synth_documents

    media = MM.media_spans(synth_documents(spark, 50, num_partitions=8))
    h1 = {r["media_ref"]: r["phash"] for r in MM.phash_media(media).collect()}
    h2 = {r["media_ref"]: r["phash"] for r in MM.phash_media(media).collect()}
    assert h1 == h2 and len(h1) > 0


def test_manku_block_combinations_match_bruteforce(spark):
    """The Manku WWW'07 configuration (n_bands=6, bands_per_key=3 —
    C(6,3)=20 keys of ~32 effective bits) finds exactly the same pairs
    as single-band banding and the brute-force mirror."""
    sigs = _clustered_sigs()
    df = spark.createDataFrame(sigs, ["doc_id", "simhash"])
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in DD.hamming_near_dups(
            df, max_hamming=3, n_bands=6, bands_per_key=3
        ).collect()
    }
    assert got == _brute_pairs(sigs, 3)


def test_banding_guard_rejects_bad_configs(spark):
    import pytest as _pt

    df = spark.createDataFrame([("a", 1)], ["doc_id", "simhash"])
    with _pt.raises(ValueError):
        DD.hamming_near_dups(df, max_hamming=3, n_bands=5, bands_per_key=3)
    with _pt.raises(ValueError):
        DD.hamming_near_dups(df, max_hamming=3, n_bands=3)


def test_max_hamming_zero_exact_signatures(spark):
    # n_bands=1 -> one 64-bit block; the mask path must not overflow
    df = spark.createDataFrame(
        [("a", 7), ("b", 7), ("c", -7), ("d", -7), ("e", 9)],
        ["doc_id", "simhash"],
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in DD.hamming_near_dups(df, max_hamming=0).collect()
    }
    assert got == {("a", "b"), ("c", "d")}


def test_return_audit_shares_bands(spark):
    rows = [(f"dup-{i}", 1234567) for i in range(50)]
    rows += [("keep-a", 1 << 40), ("keep-b", (1 << 40) ^ 3)]
    df = spark.createDataFrame(rows, ["doc_id", "simhash"])
    pairs, audit = DD.hamming_near_dups(
        df, max_hamming=3, bucket_cap=10, return_audit=True
    )
    assert pairs.count() == 1
    assert audit.agg(F.max("n_members")).head()[0] == 52
