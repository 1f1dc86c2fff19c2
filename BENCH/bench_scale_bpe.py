"""BPE production-batch drill (VERDICT r03 next-round #8): learn_bpe's
scale cost is DRIVER ROUNDS (one vocab aggregation + one bounded
collect per round = n_merges / batch rounds), so the production knob is
``batch``. Measure wall for a fixed merge budget across batch sizes on
the sf0.1 corpus and record merge-quality drift (batched greedy picks
disjoint pairs per round, so the learned rule LIST can differ from
batch=1's strict ranking — the overlap column quantifies how far).

Usage: python BENCH/bench_scale_bpe.py [--merges 1024]
                                       [--batches 1,8,64]
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
    ap.add_argument("--merges", type=int, default=1024)
    ap.add_argument("--batches", default="1,8,64")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from naruhodo_spark.ops import bpe as B
    from naruhodo_spark.session import get_spark

    spark = get_spark(
        app_name="bpe-scale", master="local[32]", shuffle_partitions=32
    )
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    docs = docs.localCheckpoint()  # input off the table for all configs

    results = []
    ref_rules: set | None = None
    for batch in [int(b) for b in args.batches.split(",")]:
        t0 = time.time()
        merges = B.learn_bpe(docs, n_merges=args.merges, batch=batch)
        wall = time.time() - t0
        rules = set(merges)
        if ref_rules is None:
            ref_rules = rules
        rounds = -(-len(merges) // batch)  # ceil
        results.append({
            "batch": batch,
            "merges_learned": len(merges),
            "driver_rounds": rounds,
            "wall_sec": round(wall, 1),
            "sec_per_merge": round(wall / max(len(merges), 1), 3),
            "rule_overlap_vs_batch1": round(
                len(rules & ref_rules) / max(len(ref_rules), 1), 4
            ),
        })
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps({
        "corpus": args.sf_dir,
        "n_merges": args.merges,
        "results": results,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
