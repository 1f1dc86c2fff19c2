"""Scale drill for ops/walks.py — random walks over a multi-million-edge
graph (the CC/PageRank drill protocol: deterministic xxhash64-generated
graph, one session, wall-clock per phase printed; results recorded in
BENCH/BASELINE.md's manual section).

Run: python BENCH/bench_scale_walks.py [n_edges] [length]
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from naruhodo_spark.session import get_spark
from naruhodo_spark.ops import walks as W

N_EDGES = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
N_NODES = N_EDGES // 2
LENGTH = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def main():
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    # deterministic random graph: 2M edges over 1M node ids (same shape
    # as the CC drill) — includes hot nodes by construction (poisson-ish
    # in-degree, max out-degree bounded by the hash spread)
    e = (
        spark.range(N_EDGES)
        .select(
            F.concat(
                F.lit("n"),
                F.pmod(F.xxhash64("id", F.lit("s")), F.lit(N_NODES)),
            ).alias("src"),
            F.concat(
                F.lit("n"),
                F.pmod(F.xxhash64("id", F.lit("d")), F.lit(N_NODES)),
            ).alias("dst"),
        )
        .localCheckpoint()
    )
    t0 = time.time()
    walks = W.random_walks(e, walks_per_node=1, length=LENGTH)
    n_walks = walks.count()
    t_walk = time.time() - t0
    t0 = time.time()
    n_pairs = W.skipgram_pairs(walks, window=2).count()
    t_pairs = time.time() - t0
    total_hops = walks.agg(F.sum(F.size("walk"))).collect()[0][0]
    print(
        f"edges={N_EDGES} length={LENGTH} walks={n_walks} "
        f"hops={total_hops} walk_s={t_walk:.1f} "
        f"hops_per_sec={total_hops / t_walk:.0f} "
        f"pairs={n_pairs} pairs_s={t_pairs:.1f}"
    )


if __name__ == "__main__":
    main()
