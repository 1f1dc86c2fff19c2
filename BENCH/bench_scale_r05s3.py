"""Scale drill for the r05 session-3 additions — rule-based KG
completion (apply_rules), the SPARQL SELECT compiler, predicate-diverse
entity summarization (top_facts), and graph-RAG context retrieval —
over a deterministic synthetic KG at two parallelism levels (the north
rule's N-vs-4N scaling evidence; results recorded in
BENCH/BASELINE.md's manual section).

The graph models the operators' real shape: P persons live in 500
cities, cities sit in 50 countries, and two thirds of the persons
already carry the citizen_of edge the lives_in ∘ located_in ⇒
citizen_of rule predicts — so completion must ground P body rows,
fold them, and anti-join 2/3 of them away. City pivots have
in-degree P/500 × out-degree 1, safely under the hub cap (the
drill exercises the guarded path, not the audit).

Run: python BENCH/bench_scale_r05s3.py [n_persons] [master]
     (master e.g. 'local[8]' for the scaling pair; default local[32])
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from naruhodo_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
MASTER = sys.argv[2] if len(sys.argv) > 2 else "local[32]"


def _geo_edges(spark):
    """(subj, pred, obj): P lives_in + 500 located_in + ~2P/3
    citizen_of rows, all hash-derived (no RNG, partition-invariant)."""
    persons = spark.range(N).select(
        F.concat(F.lit("p"), F.col("id")).alias("person"),
        F.pmod(F.xxhash64("id", F.lit("c")), F.lit(500)).alias("city_i"),
    )
    persons = persons.withColumn(
        "country_i", F.pmod(F.xxhash64("city_i"), F.lit(50))
    )
    lives = persons.select(
        F.col("person").alias("subj"),
        F.lit("lives_in").alias("pred"),
        F.concat(F.lit("c"), F.col("city_i")).alias("obj"),
    )
    located = (
        persons.select("city_i", "country_i")
        .distinct()
        .select(
            F.concat(F.lit("c"), F.col("city_i")).alias("subj"),
            F.lit("located_in").alias("pred"),
            F.concat(F.lit("k"), F.col("country_i")).alias("obj"),
        )
    )
    citizen = (
        persons.where(F.pmod(F.xxhash64("person"), F.lit(3)) != 0)
        .select(
            F.col("person").alias("subj"),
            F.lit("citizen_of").alias("pred"),
            F.concat(F.lit("k"), F.col("country_i")).alias("obj"),
        )
    )
    return lives.unionByName(located).unionByName(citizen).localCheckpoint()


def _fact_edges(spark):
    """Weighted fact table for top_facts: N facts over N/50 entities,
    3 predicates, hash weights — real per-entity fanout (~50)."""
    return (
        spark.range(N)
        .select(
            F.concat(F.lit("e"), F.pmod(F.xxhash64("id", F.lit("s")),
                                        F.lit(N // 50))).alias("subj"),
            F.element_at(
                F.array(F.lit("visited"), F.lit("rated"), F.lit("bought")),
                (F.pmod(F.xxhash64("id", F.lit("p")), F.lit(3)) + 1)
                .cast("int"),
            ).alias("pred"),
            F.concat(F.lit("o"), F.col("id")).alias("obj"),
            F.pmod(F.xxhash64("id", F.lit("w")), F.lit(1000))
            .alias("weight"),
        )
        .localCheckpoint()
    )


def _timed(label, fn):
    t0 = time.time()
    n = fn()
    wall = time.time() - t0
    print(f"{label}: {wall:.2f} s ({n} rows)", flush=True)
    return wall


def main():
    cpus = MASTER.split("[")[1].rstrip("]")
    spark = get_spark(master=MASTER, shuffle_partitions=int(cpus))
    edges = _geo_edges(spark)
    edges.count()
    facts = _fact_edges(spark)
    facts.count()
    print(f"master={MASTER} n={N}", flush=True)

    from naruhodo_spark.operators.graphstats import top_facts
    from naruhodo_spark.operators.rules import apply_rules
    from naruhodo_spark.ops.rag import graph_rag_context
    from naruhodo_spark.sparql import sparql_select

    rules = spark.createDataFrame(
        [("lives_in", "located_in", "citizen_of", 0.9)],
        "r1 string, r2 string, r3 string, confidence double",
    )
    walls = {}
    walls["apply_rules"] = _timed(
        "apply_rules", lambda: apply_rules(edges, rules).count()
    )
    walls["sparql_select"] = _timed(
        "sparql_select",
        lambda: sparql_select(
            edges.select(F.col("subj").alias("src"), "pred",
                         F.col("obj").alias("dst")),
            "SELECT ?p ?c ?k WHERE { ?p lives_in ?c . ?c located_in ?k ."
            "  FILTER NOT EXISTS { ?p citizen_of ?k } }",
        ).count(),
    )
    walls["top_facts"] = _timed(
        "top_facts", lambda: top_facts(facts, k=3).count()
    )
    weighted = edges.withColumn("weight", F.lit(1))
    walls["rag_context"] = _timed(
        "rag_context",
        lambda: graph_rag_context(
            weighted, seeds=["p0", "p1", "p2"], top_k=50, max_facts=100,
            iterations=5,
        ).count(),
    )
    total = sum(walls.values())
    print(f"TOTAL {MASTER}: {total:.2f} s", flush=True)


if __name__ == "__main__":
    main()
