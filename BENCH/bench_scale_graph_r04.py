"""Scale drill for the r04 graph additions — motif matching, label
propagation, personalized PageRank, node2vec biased walks, GraphSAGE
blocks, SGNS training — over the shared multi-million-edge
deterministic graph (CC/PageRank drill protocol; results recorded in
BENCH/BASELINE.md's manual section).

Run: python BENCH/bench_scale_graph_r04.py [n_edges] [master]
     (master e.g. 'local[8]' for the scaling pair; default local[32])
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from naruhodo_spark.session import get_spark

N_EDGES = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
MASTER = sys.argv[2] if len(sys.argv) > 2 else "local[32]"
N_NODES = N_EDGES // 2


def _graph(spark):
    return (
        spark.range(N_EDGES)
        .select(
            F.concat(
                F.lit("n"),
                F.pmod(F.xxhash64("id", F.lit("s")), F.lit(N_NODES)),
            ).alias("src"),
            F.lit("rel").alias("pred"),
            F.concat(
                F.lit("n"),
                F.pmod(F.xxhash64("id", F.lit("d")), F.lit(N_NODES)),
            ).alias("dst"),
        )
        .localCheckpoint()
    )


def _ksg(edges):
    # (subj, pred, obj, weight) shape for the graphstats entry points
    return edges.select(
        F.col("src").alias("subj"), "pred", F.col("dst").alias("obj"),
        F.lit(1).cast("long").alias("weight"),
        F.lit(False).alias("negative"), F.lit(False).alias("passive"),
    )


def main():
    cpus = MASTER.split("[")[1].rstrip("]")
    spark = get_spark(master=MASTER, shuffle_partitions=int(cpus))
    edges = _graph(spark)
    ksg = _ksg(edges).localCheckpoint()
    print(f"master={MASTER} edges={N_EDGES} nodes<={N_NODES}")

    from naruhodo_spark.operators.motif import cap_hubs, match_motif

    t0 = time.time()
    capped, dropped = cap_hubs(edges, cap=64)
    n2hop = match_motif(
        capped, [("a", None, "b"), ("b", None, "c")]
    ).count()
    print(f"motif_2hop: embeddings={n2hop} dropped_hubs={dropped.count()} "
          f"wall={time.time() - t0:.1f}s")

    from naruhodo_spark.operators import graphstats as GS

    t0 = time.time()
    n_lab = GS.label_propagation(ksg, max_iterations=5).count()
    print(f"lpa_5_rounds: nodes={n_lab} wall={time.time() - t0:.1f}s")

    t0 = time.time()
    n_ppr = (
        GS.personalized_pagerank(ksg, ["n1", "n2", "n3"], iterations=5)
        .where(F.col("rank") > 0)
        .count()
    )
    print(f"ppr_5_rounds: reached={n_ppr} wall={time.time() - t0:.1f}s")

    t0 = time.time()
    n_bc = (
        GS.betweenness_sampled(ksg, n_sources=8, max_dist=4)
        .where(F.col("betweenness") > 0)
        .count()
    )
    print(f"betweenness_8src_d4: nonzero={n_bc} wall={time.time() - t0:.1f}s")

    from naruhodo_spark.ops import walks as W

    # the walk trainer phases run on a quarter subgraph (their cost is
    # per-step windows / per-iteration joins, not scan-bound) — each
    # line prints its own scale, so the numbers stay honest
    sub_edges = N_EDGES // 4
    sub = edges.limit(sub_edges).localCheckpoint()
    print(f"walk/sgns subgraph: edges={sub_edges}")
    t0 = time.time()
    bw = W.biased_walks(
        sub, p=4.0, q=0.5, walks_per_node=1, length=6
    ).localCheckpoint()
    hops = bw.agg(F.sum(F.size("walk"))).collect()[0][0]
    t_bw = time.time() - t0
    print(f"biased_walks_l6: walks={bw.count()} hops={hops} "
          f"wall={t_bw:.1f}s hops_per_sec={hops / t_bw:.0f}")

    from naruhodo_spark.ops import gnn as GNN

    seeds = [f"n{i}" for i in range(10_000)]
    t0 = time.time()
    n_blk = GNN.sample_blocks(edges, seeds, [10, 5]).count()
    print(f"gnn_blocks_10k_seeds_f10x5: rows={n_blk} "
          f"wall={time.time() - t0:.1f}s")

    from naruhodo_spark.ops import w2v as W2V

    pairs = (
        W.skipgram_pairs(bw, window=2)
        .select("center", "context")
        .localCheckpoint()
    )
    n_pairs = pairs.count()
    t0 = time.time()
    model = W2V.train_sgns(pairs, dim=16, iterations=3, k_neg=2)
    n_vec = model["in_emb"].count()
    t_sgns = time.time() - t0
    print(f"sgns_3_iters_dim16: pairs={n_pairs} vectors={n_vec} "
          f"wall={t_sgns:.1f}s pairs_per_iter_sec={3 * n_pairs / t_sgns:.0f}")

    spark.stop()


if __name__ == "__main__":
    main()
