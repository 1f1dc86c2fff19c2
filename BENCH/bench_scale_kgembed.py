"""Scale drill for distributed TransE (ops/kgembed.py): GD rounds over
a 2M-edge random KSG (the CC/walk-drill generator shape: 1M node ids,
JVM-generated, deterministic). Measures per-round wall — the quantity
that must stay CONSTANT across rounds (the localCheckpoint-stats
pitfall documented in docs/PLANS.md made it exponential before the
_truncate fix) — and total throughput in pair-updates/sec.

Usage: python BENCH/bench_scale_kgembed.py [--edges 2000000] [--iters 3]
Prints one JSON line; paste into BENCH/BASELINE.md's manual section.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=2_000_000)
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--dim", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from naruhodo_spark.ops import kgembed as KE
    from naruhodo_spark.session import get_spark

    spark = get_spark(
        app_name="transe-scale", master="local[32]", shuffle_partitions=64
    )
    n, m = args.nodes, args.edges
    edges = (
        spark.range(0, m, numPartitions=64)
        .select(
            F.concat(F.lit("e"), F.pmod(F.xxhash64("id"), F.lit(n))
                     .cast("string")).alias("subj"),
            F.concat(F.lit("r"), (F.col("id") % 16).cast("string"))
            .alias("pred"),
            F.concat(F.lit("e"), F.pmod(F.xxhash64("id", F.lit(1)),
                                        F.lit(n)).cast("string")).alias("obj"),
            F.lit(1.0).alias("weight"),
        )
        .where(F.col("subj") != F.col("obj"))
        .localCheckpoint()
    )
    n_pairs = KE.training_pairs(edges, k_neg=1).count()
    t0 = time.time()
    model = KE.train_transe(
        edges, dim=args.dim, iters=args.iters, lr=0.1, k_neg=1
    )
    n_ent = model["ent_emb"].count()  # forces the final round
    wall = time.time() - t0
    print(json.dumps({
        "edges": m, "entities": n_ent, "pairs": n_pairs,
        "dim": args.dim, "iters": args.iters,
        "wall_sec": round(wall, 1),
        "sec_per_round": round(wall / args.iters, 1),
        "pair_updates_per_sec": round(n_pairs * args.iters / wall, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
