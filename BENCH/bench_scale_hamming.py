"""Scale drill for the block-combination Hamming join
(ops/dedup.hamming_near_dups): 2M 64-bit signatures with planted
near-dup clusters, run at local[32] in two configurations —

- bands_per_key=1 (n_bands=4, 16-bit single-block keys): the simple
  banding that is fine at 10^5–10^6 signatures but whose random key
  collisions grow ~n²/2^16 per band;
- Manku WWW'07 (n_bands=6, bands_per_key=3): C(6,3)=20 keys per
  signature with ~32 effective key bits — collision volume ~n²/2^32,
  the 10^12-scale configuration.

Both must return the IDENTICAL pair set (pigeonhole recall is exact in
both); the drill measures the candidate-volume difference. Signatures
are generated JVM-side (xxhash64 arithmetic, no Python, no RNG):
cluster base = xxhash64(cluster_id), variant v of 4 flips v bits at
deterministic positions, so every cluster contributes C(4,2)=6
planted pairs at Hamming <= 6 of which those <= max_hamming survive.

Usage: python BENCH/bench_scale_hamming.py [--n 2000000] [--runs 1]
Prints one JSON line per config; paste into the manual section of
BENCH/BASELINE.md (this script does not rewrite it).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_sigs(spark, n: int):
    from pyspark.sql import functions as F

    base = spark.range(0, n, numPartitions=64).select(
        F.col("id").alias("doc_id"),
        (F.col("id") / 4).cast("bigint").alias("cluster"),
        (F.col("id") % 4).cast("int").alias("v"),
    )
    sig = F.xxhash64(F.col("cluster"))
    # flip bit b (b < v) at position pmod(xxhash64(cluster, b), 64):
    # distinct positions w.h.p. -> variant v sits at Hamming v from base
    for b in range(3):
        mask = F.expr(
            f"shiftleft(1L, cast(pmod(xxhash64(cluster, {b}), 64) as int))"
        )
        sig = F.when(F.col("v") > b, sig.bitwiseXOR(mask)).otherwise(sig)
    return base.select("doc_id", sig.alias("simhash"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--max-hamming", type=int, default=3)
    args = ap.parse_args()

    from naruhodo_spark.ops.dedup import hamming_near_dups
    from naruhodo_spark.session import get_spark

    spark = get_spark(
        app_name="hamming-scale", master="local[32]", shuffle_partitions=64
    )
    sigs = make_sigs(spark, args.n).localCheckpoint()  # gen outside timer
    counts = {}
    for label, kw in [
        ("single_band", dict(n_bands=args.max_hamming + 1, bands_per_key=1)),
        ("manku_6c3", dict(n_bands=6, bands_per_key=3)),
    ]:
        best, pairs = float("inf"), None
        for _ in range(args.runs):
            t0 = time.time()
            pairs = hamming_near_dups(
                sigs, max_hamming=args.max_hamming, bucket_cap=1_000, **kw
            ).count()
            best = min(best, time.time() - t0)
        counts[label] = pairs
        print(json.dumps({
            "config": label, **kw, "n_sigs": args.n,
            "pairs": pairs, "best_wall_sec": round(best, 2),
            "sigs_per_sec": round(args.n / best, 1),
        }))
    assert len(set(counts.values())) == 1, counts  # identical recall
    spark.stop()


if __name__ == "__main__":
    main()
