"""Scale drill for distributed TransE (ops/kgembed.py): GD rounds over
a 2M-edge random KSG (the CC/walk-drill generator shape: 1M node ids,
JVM-generated, deterministic). Measures per-round wall — the quantity
that must stay CONSTANT across rounds (the localCheckpoint-stats
pitfall documented in docs/PLANS.md made it exponential before the
_truncate fix) — and total throughput in pair-updates/sec.

r04 (VERDICT r03 next-round #6): also runs the SAME edge set with
``--shards`` mini-batch SGD (the web-scale batch size) and records
full-corpus margin loss per iteration for both, so the drill shows
convergence-per-wall, not just throughput.

Usage: python BENCH/bench_scale_kgembed.py [--edges 2000000] [--iters 3]
                                           [--shards 8]
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
    ap.add_argument("--shards", type=int, default=8)
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

    def run(n_shards: int) -> dict:
        metrics: list = []
        t0 = time.time()
        model = KE.train_transe(
            edges, dim=args.dim, iters=args.iters, lr=0.1, k_neg=1,
            n_shards=n_shards, round_metrics=metrics,
        )
        n_ent = model["ent_emb"].count()  # forces the final round
        wall = time.time() - t0
        train_wall = sum(r["wall_s"] for r in metrics)
        return {
            "n_shards": n_shards, "entities": n_ent,
            "wall_sec": round(wall, 1),
            "train_sec_per_round": round(train_wall / args.iters, 1),
            "loss_per_round": [r["loss"] for r in metrics],
            "pair_updates_per_sec": round(
                n_pairs * args.iters / max(train_wall, 1e-9), 1
            ),
        }

    full = run(1)
    mini = run(args.shards)
    print(json.dumps({
        "edges": m, "pairs": n_pairs, "dim": args.dim,
        "iters": args.iters,
        "full_batch": full, "minibatch": mini,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
