"""Scale drill for the r05 session-7 additions — quotient-graph
summarization + Newman modularity (operators/graphstats.py) and
PARIS-style cross-KG alignment (operators/align.py) — over a
deterministic synthetic graph at two parallelism levels (the north
rule's N-vs-4N scaling evidence; results recorded in
BENCH/BASELINE.md's manual section).

The inputs model the operators' real shapes:

- quotient + modularity: a community-structured graph — N nodes in
  N/1000 planted communities, each a wrap-around double-ring
  (intra-community degree 4) plus one inter-community bridge per 10
  nodes. The quotient collapses N nodes / ~2.2·N directed edges into
  a ~(N/1000)-row super-graph; modularity on the planted assignment
  is strongly positive (the partition IS the structure), so the drill
  also sanity-checks the sign at scale.
- alignment: two KGs of N/10 entities each, 4 attribute facts per
  entity with hash-bucketed literal values sized to ~4 subjects per
  (pred, value) block per side — the evidence join is
  Σ_block n_1·n_2, never |KG1|×|KG2|, and the planted twin (same
  entity id in both halves) shares all 4 facts while impostors share
  ~1, so mutual-best recovers the diagonal.

Run: python BENCH/bench_scale_r05s7.py [n] [master]
     (master e.g. 'local[8]' for the scaling pair; default local[32])
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from naruhodo_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
MASTER = sys.argv[2] if len(sys.argv) > 2 else "local[32]"
# optional 3rd arg 'only=<op>' runs a single op — the 4-concurrent-JVM
# hardware-ceiling probe (BASELINE.md protocol) uses it
ONLY = None
for a in sys.argv[3:]:
    if a.startswith("only="):
        ONLY = a.split("=", 1)[1]
COMM = 1000  # nodes per planted community


def _community_edges(spark):
    """(subj, pred, obj, weight): per-community double ring + sparse
    bridges; community of node id = id // COMM (hash-free,
    partition-invariant)."""
    base = spark.range(N).select(
        F.col("id"),
        F.floor(F.col("id") / COMM).alias("c"),
        (F.col("id") % COMM).alias("i"),
    )

    def ring(offset):
        return base.select(
            F.concat(F.lit("p"), F.col("id")).alias("subj"),
            F.lit("knows").alias("pred"),
            F.concat(
                F.lit("p"),
                F.col("c") * COMM + (F.col("i") + offset) % COMM,
            ).alias("obj"),
            F.lit(1.0).alias("weight"),
        )

    bridges = base.where((F.col("i") % 10 == 0) & (F.col("c") > 0)).select(
        F.concat(F.lit("p"), F.col("id")).alias("subj"),
        F.lit("bridge").alias("pred"),
        F.concat(
            F.lit("p"), (F.col("c") - 1) * COMM + F.col("i")
        ).alias("obj"),
        F.lit(1.0).alias("weight"),
    )
    return ring(1).unionByName(ring(2)).unionByName(bridges).localCheckpoint()


def _groups(spark):
    return spark.range(N).select(
        F.concat(F.lit("p"), F.col("id")).alias("name"),
        F.concat(F.lit("g"), F.floor(F.col("id") / COMM)).alias("group"),
    ).localCheckpoint()


def _align_kgs(spark):
    """Two KGs over N/10 entities, 4 hash-bucketed attribute facts
    each; value buckets sized to ~4 subjects per (pred, value) block
    per side."""
    m = N // 10
    ents = spark.range(m)
    frames = []
    for half in (0, 1):
        facts = None
        for k in range(4):
            f = ents.select(
                F.concat(F.lit("e"), F.col("id")).alias("subj"),
                F.lit(f"attr{k}").alias("pred"),
                # attr3 is salted per half, so the planted twin shares
                # 3 of its 4 facts — alignment evidence, not identity
                F.concat(
                    F.lit(f"v{k}_"),
                    F.pmod(
                        F.xxhash64(
                            "id",
                            F.lit(f"a{k}_{half if k == 3 else 0}"),
                        ),
                        F.lit(m // 4),
                    ),
                ).alias("obj"),
            )
            facts = f if facts is None else facts.unionByName(f)
        frames.append(facts.localCheckpoint())
    return frames


def _timed(label, fn):
    t0 = time.time()
    n = fn()
    wall = time.time() - t0
    print(f"{label}: {wall:.2f} s ({n} rows)", flush=True)
    return wall


def main():
    cpus = MASTER.split("[")[1].rstrip("]")
    spark = get_spark(master=MASTER, shuffle_partitions=int(cpus))
    edges = _community_edges(spark)
    edges.count()
    groups = _groups(spark)
    groups.count()
    kg1, kg2 = _align_kgs(spark)
    kg1.count(), kg2.count()
    print(f"master={MASTER} n={N}", flush=True)

    from naruhodo_spark.operators.align import align_entities
    from naruhodo_spark.operators.graphstats import (
        modularity,
        quotient_graph,
    )

    walls = {}
    if ONLY in (None, "quotient"):
        walls["quotient"] = _timed(
            "quotient", lambda: quotient_graph(edges, groups).count()
        )

    def _mod():
        rows = modularity(
            edges,
            groups.select(
                F.col("name").alias("node"),
                F.col("group").alias("community"),
            ),
        )
        q = rows.agg(F.sum("contribution")).head()[0]
        print(f"  modularity Q = {q:.4f}", flush=True)
        assert q > 0.5, "planted partition must score strongly positive"
        return rows.count()

    if ONLY in (None, "modularity"):
        walls["modularity"] = _timed("modularity", _mod)

    def _align():
        matches, audit = align_entities(
            kg1, kg2, rounds=1, min_score=0.5, max_per_object=None
        )
        n = matches.count()
        assert audit.isEmpty()
        return n

    if ONLY in (None, "align"):
        walls["align"] = _timed("align", _align)

    if ONLY in (None, "refine"):
        from naruhodo_spark.operators.graphstats import (
            modularity,
            refine_communities,
        )

        def _refine():
            # singleton start, 3 rounds over the community graph —
            # the Louvain consolidation workload; Q must come out
            # strongly positive on the planted structure
            ref = refine_communities(edges, None, rounds=3)
            q = (
                modularity(edges, ref)
                .agg(F.sum("contribution"))
                .head()[0]
            )
            print(f"  refined Q = {q:.4f}", flush=True)
            assert q > 0.3
            return ref.count()

        walls["refine"] = _timed("refine", _refine)

    if ONLY in (None, "linkpred"):
        from naruhodo_spark.operators.graphstats import link_scores

        def _linkpred():
            scored, audit = link_scores(
                edges, method="adamic_adar", top_k=10_000
            )
            n = scored.count()
            assert audit.isEmpty()  # ring degrees are far below the cap
            return n

        walls["linkpred"] = _timed("linkpred", _linkpred)
    total = sum(walls.values())
    print(
        f"TOTAL {total:.2f} s — "
        + " ".join(f"{k}={v:.2f}" for k, v in walls.items()),
        flush=True,
    )


if __name__ == "__main__":
    main()
