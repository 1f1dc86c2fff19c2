"""Scale drill for link-prediction evaluation (ops/kglinkpred.py):
rank N_q test queries against an N_e-entity embedding table — the
quantity that explodes at web scale is the candidate scan
(N_q × N_e distance evaluations), so the drill measures both twins on
the same deterministic inputs:

- catalyst: broadcast(queries) nested-loop, JVM HOF distances — the
  oracle-checkable baseline;
- blas: one GEMM per entity batch (mapInPandas, query matrix in the
  task closure) — the scale path.

Entities/relations use init_embeddings' hash-derived vectors (no RNG,
JVM-generated names); test triples are hash-picked from the entity
space, known-filter = the test set itself (exercises the correction
joins). Reported unit: million candidate-pair evaluations per second.

Usage: python BENCH/bench_scale_linkpred.py [--entities 1000000]
                                            [--queries 2000] [--dim 64]
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
    ap.add_argument("--entities", type=int, default=1_000_000)
    ap.add_argument("--queries", type=int, default=2_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--paths", default="blas,catalyst")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from naruhodo_spark.ops import kgembed as KE
    from naruhodo_spark.ops import kglinkpred as LP
    from naruhodo_spark.session import get_spark

    spark = get_spark(
        app_name="linkpred-scale", master="local[32]", shuffle_partitions=64
    )
    n_e, n_q = args.entities, args.queries
    ents = spark.range(0, n_e, numPartitions=64).select(
        F.concat(F.lit("e"), F.col("id")).alias("name")
    )
    ent_emb = KE.init_embeddings(ents, dim=args.dim).localCheckpoint()
    rels = spark.createDataFrame([("r0",), ("r1",)], ["name"])
    rel_emb = KE.init_embeddings(
        rels, dim=args.dim, seed="emb42/rel"
    ).localCheckpoint()
    test = (
        spark.range(0, n_q, numPartitions=8)
        .select(
            F.concat(F.lit("e"), F.pmod(F.xxhash64("id"), F.lit(n_e)))
            .alias("subj"),
            F.concat(F.lit("r"), F.pmod(F.xxhash64("id") + 7, F.lit(2))
                     .cast("string")).alias("pred"),
            F.concat(F.lit("e"), F.pmod(F.xxhash64("id") + 13, F.lit(n_e)))
            .alias("obj"),
        )
        .localCheckpoint()
    )

    out = {"entities": n_e, "queries": n_q, "dim": args.dim, "paths": {}}
    # 2 sides per test triple -> ranking queries = 2 * n_q
    pair_evals = 2.0 * n_q * n_e
    for path in args.paths.split(","):
        t0 = time.time()
        ranks = LP.rank_candidates(
            test, ent_emb, rel_emb, known=test, path=path
        )
        ranks.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        out["paths"][path] = {
            "wall_sec": round(wall, 1),
            "mpair_evals_per_sec": round(pair_evals / wall / 1e6, 1),
        }
        print(f"# {path}: {wall:.1f}s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
