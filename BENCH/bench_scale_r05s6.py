"""Scale drill for the r05 session-6 additions — the semi-naive
transitive-closure fixpoint (operators/closure.py), RDFS entailment
materialization (operators/entail.py), and SHACL shape validation
(operators/shacl.py) — over a deterministic synthetic graph at two
parallelism levels (the north rule's N-vs-4N scaling evidence;
results recorded in BENCH/BASELINE.md's manual section).

The graph models the operators' real shapes:

- closure: N/8 succession chains of length 8 (the diameter the
  driver-oracled query caps at) → the fixpoint runs 7 delta rounds
  and emits 3.5·N reachability pairs;
- entailment: N persons live in 500 cities; the schema lifts
  lives_in ⊑ located_in, types persons/cities via domain/range, and
  inherits through a 3-deep subclass chain — every rule fires at
  instance scale, and the final distinct folds ~6 derived rows per
  person;
- SHACL: shapes validate the ENTAILED graph (class checks need the
  derived types): 1/3 of persons have no email (minCount violations),
  and 1/5 of the emails break the pattern — the report is ~0.46·N
  rows, exercising the violation-sized-output claim;
- k-core: a wrap-around 4-regular knows-ring over 90% of the nodes (a
  stable 3-core) plus a degree-≤2 chain tail — the peel touches O(N)
  edges and the core survives intact (deep cascades are pinned in
  pytest; a drill-sized cascade would serialize into O(N) rounds by
  construction, which is the pathology the operator's max_rounds
  guard reports, not a throughput measurement).

smush/owl_entailment are not drilled separately: their instance-scale
kernels (star-contraction CC, the closure fixpoint, broadcast lifts)
are each covered by this drill or the canon/graph drills already in
BASELINE.md.

Run: python BENCH/bench_scale_r05s6.py [n] [master]
     (master e.g. 'local[8]' for the scaling pair; default local[32])
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from naruhodo_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
MASTER = sys.argv[2] if len(sys.argv) > 2 else "local[32]"

SCHEMA = [
    ("lives_in", "subproperty_of", "located_in"),
    ("lives_in", "domain", "Person"),
    ("lives_in", "range", "City"),
    ("email", "domain", "Person"),
    ("City", "subclass_of", "Place"),
    ("Person", "subclass_of", "Agent"),
    ("Agent", "subclass_of", "Entity"),
]

SHAPES = [
    ("PersonShape", "Person", "email", "minCount", "1"),
    ("PersonShape", "Person", "email", "pattern", "^[a-z0-9]+@ex\\.com$"),
    ("PersonShape", "Person", "lives_in", "class", "City"),
]


def _chain_edges(spark):
    """(src, dst): N/8 succession chains of length 8, hash-free ids
    (chain = id//8), partition-invariant."""
    return (
        spark.range(N)
        .where(F.col("id") % 8 != 7)
        .select(
            F.concat(F.lit("p"), F.col("id")).alias("src"),
            F.concat(F.lit("p"), F.col("id") + 1).alias("dst"),
        )
        .localCheckpoint()
    )


def _kg_edges(spark):
    """(src, pred, dst): lives_in for every person, email for 2/3 of
    them (1/5 of those malformed), plus the schema triples."""
    persons = spark.range(N).select(
        F.concat(F.lit("p"), F.col("id")).alias("person"),
        F.pmod(F.xxhash64("id", F.lit("c")), F.lit(500)).alias("city_i"),
        F.pmod(F.xxhash64("id", F.lit("e")), F.lit(3)).alias("e3"),
        F.pmod(F.xxhash64("id", F.lit("m")), F.lit(5)).alias("m5"),
    )
    lives = persons.select(
        F.col("person").alias("src"),
        F.lit("lives_in").alias("pred"),
        F.concat(F.lit("c"), F.col("city_i")).alias("dst"),
    )
    email = persons.where(F.col("e3") != 0).select(
        F.col("person").alias("src"),
        F.lit("email").alias("pred"),
        F.when(
            F.col("m5") == 0, F.concat(F.lit("BAD "), F.col("person"))
        )
        .otherwise(F.concat(F.col("person"), F.lit("@ex.com")))
        .alias("dst"),
    )
    schema = spark.createDataFrame(
        SCHEMA, "src string, pred string, dst string"
    )
    return lives.unionByName(email).unionByName(schema).localCheckpoint()


def _ring_edges(spark):
    """KSG-shaped knows graph: a WRAP-AROUND ring over the first 90%
    of nodes with both i→(i+1)%M and i→(i+2)%M edges (undirected
    degree exactly 4 — a stable 3-core whose survival never depends on
    the periphery), plus a degree-≤2 chain tail over the last 10% that
    peels in the first rounds. Peeling work is O(N), core is 0.9·N."""
    m = int(N * 0.9)
    ring = spark.range(m).select(
        F.concat(F.lit("p"), F.col("id")).alias("subj"),
        F.lit("knows").alias("pred"),
        F.concat(F.lit("p"), (F.col("id") + 1) % m).alias("obj"),
        F.lit(1).alias("weight"),
    ).unionByName(
        spark.range(m).select(
            F.concat(F.lit("p"), F.col("id")).alias("subj"),
            F.lit("knows").alias("pred"),
            F.concat(F.lit("p"), (F.col("id") + 2) % m).alias("obj"),
            F.lit(1).alias("weight"),
        )
    )
    tail = spark.range(m, N - 1).select(
        F.concat(F.lit("p"), F.col("id")).alias("subj"),
        F.lit("knows").alias("pred"),
        F.concat(F.lit("p"), F.col("id") + 1).alias("obj"),
        F.lit(1).alias("weight"),
    )
    return ring.unionByName(tail).localCheckpoint()


def _timed(label, fn):
    t0 = time.time()
    n = fn()
    wall = time.time() - t0
    print(f"{label}: {wall:.2f} s ({n} rows)", flush=True)
    return wall


def main():
    cpus = MASTER.split("[")[1].rstrip("]")
    spark = get_spark(master=MASTER, shuffle_partitions=int(cpus))
    chains = _chain_edges(spark)
    chains.count()
    kg = _kg_edges(spark)
    kg.count()
    print(f"master={MASTER} n={N}", flush=True)

    from naruhodo_spark.operators.closure import transitive_closure
    from naruhodo_spark.operators.entail import rdfs_entailment
    from naruhodo_spark.operators.shacl import validate_shapes

    walls = {}
    walls["closure"] = _timed(
        "closure", lambda: transitive_closure(chains).count()
    )
    # entailed graph is consumed twice (count + shacl) — build once
    entailed = rdfs_entailment(kg).localCheckpoint(eager=False)
    walls["entailment"] = _timed("entailment", lambda: entailed.count())
    walls["shacl"] = _timed(
        "shacl", lambda: validate_shapes(entailed, SHAPES).count()
    )
    from naruhodo_spark.operators.graphstats import k_core

    ring = _ring_edges(spark)
    ring.count()
    walls["k_core"] = _timed(
        "k_core", lambda: k_core(ring, 3).count()
    )
    total = sum(walls.values())
    print(f"TOTAL {MASTER}: {total:.2f} s", flush=True)


if __name__ == "__main__":
    main()
