"""spark-submit entry point (SURVEY.md EP1′/EP2′).

    spark-submit --master <cluster> --py-files naruhodo_spark.zip \
        build_kg.py --input <docs_table_or_parquet> --out <warehouse> \
        [--n-parts 4096] [--lang en] [--salted]

Resume is implicit: running the same command twice skips partitions
already recorded in the `_manifest` via anti-join (kill-resume,
[B BASELINE.json:6]) — no flag needed.
Without --input, a deterministic synth corpus of --n-docs documents is
generated (useful for scale drills).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet path / Iceberg table of spans docs")
    ap.add_argument("--flat-input", help="parquet with flat (doc_id, text) docs")
    ap.add_argument("--n-docs", type=int, default=1000, help="synth corpus size")
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-parts", type=int, default=None)
    ap.add_argument("--lang", default="en")
    ap.add_argument("--salted", action="store_true")
    ap.add_argument(
        "--wave-parts", type=int, default=None,
        help="commit manifest every N partitions (kill loses ≤ one wave; "
        "default: single wave)",
    )
    ap.add_argument(
        "--provenance", action="store_true",
        help="also write the edge_provenance lineage table",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from naruhodo_spark import lang as L
    from naruhodo_spark import synth
    from naruhodo_spark.operators.normalize import flat_to_spans
    from naruhodo_spark.pipeline import run_partitioned
    from naruhodo_spark.session import get_spark

    spark = get_spark(app_name="build_kg", master=args.master)
    sc_cores = spark.sparkContext.defaultParallelism
    n_parts = args.n_parts or max(32, sc_cores * 2)

    if args.input:
        docs = spark.read.parquet(args.input)
    elif args.flat_input:
        docs = flat_to_spans(spark.read.parquet(args.flat_input))
    else:
        docs = synth.synth_documents(spark, args.n_docs)

    t0 = time.time()
    counters = run_partitioned(
        spark,
        docs,
        args.out,
        n_parts=n_parts,
        prof=L.get_profile(args.lang),
        aliases=synth.alias_dictionary(spark),
        salted=args.salted,
        wave_parts=args.wave_parts,
        provenance=args.provenance,
    )
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "out": args.out,
                "wall_sec": round(wall, 2),
                "cores": sc_cores,
                **counters,
                "docs_per_sec": round(counters["docs"] / wall, 1)
                if counters["docs"]
                else 0.0,
            }
        )
    )


if __name__ == "__main__":
    main()
