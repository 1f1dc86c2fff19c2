"""Scale drill for the r05 session-2 additions — Hearst taxonomy
extraction, blocked entity resolution, N-Triples format+parse
roundtrip, temporal validity intervals, and the graph summary — over
deterministic synthetic inputs at two parallelism levels (the north
rule's N-vs-4N scaling evidence; results recorded in
BENCH/BASELINE.md's manual section).

Run: python BENCH/bench_scale_r05ops.py [n_docs] [master]
     (master e.g. 'local[8]' for the scaling pair; default local[32])
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from naruhodo_spark.session import get_spark

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
MASTER = sys.argv[2] if len(sys.argv) > 2 else "local[32]"

NOUNS = ["widget", "gadget", "sprocket", "flange", "gear", "bolt",
         "anvil", "lever", "pulley", "valve"]
ADJS = ["red", "blue", "green", "cold", "hot", "old", "new", "small",
        "big", "odd"]


def _docs(spark):
    """Deterministic Hearst-bearing corpus: every doc states one
    such-as list + one and-other sentence over hash-derived names."""
    h = lambda s: F.pmod(F.xxhash64("id", F.lit(s)), F.lit(10)).cast("int")
    name = lambda s: F.concat(
        F.element_at(F.array(*[F.lit(a) for a in ADJS]), h(s + "a") + 1),
        F.lit("_"),
        F.element_at(F.array(*[F.lit(n) for n in NOUNS]), h(s + "n") + 1),
    )
    cls = F.element_at(F.array(*[F.lit(n + "s") for n in NOUNS]), h("c") + 1)
    return (
        spark.range(N_DOCS)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(
                cls, F.lit(" such as "), name("x"), F.lit(", "), name("y"),
                F.lit(" and "), name("z"), F.lit(" ship. "),
                name("p"), F.lit(" and other "), cls, F.lit(" rust."),
            ).alias("text"),
        )
        .localCheckpoint()
    )


def _er_records(spark):
    """Corpus-sized mention records with a 100-name two-token
    vocabulary (adjective + head noun) — the ER tier-1 collapse target;
    near-dup pairs exist across adjectives within each noun block."""
    h = lambda s: F.pmod(F.xxhash64("id", F.lit(s)), F.lit(10)).cast("int")
    return (
        spark.range(N_DOCS)
        .select(
            F.col("id").alias("rid"),
            F.concat(
                F.element_at(F.array(*[F.lit(a) for a in ADJS]), h("a") + 1),
                F.lit(" "),
                F.element_at(F.array(*[F.lit(n) for n in NOUNS]), h("n") + 1),
            ).alias("name"),
        )
        .localCheckpoint()
    )


def _events(spark):
    """Observation stream: N_DOCS rows, hash-spread over 50k triples
    and a 30-day span (real skew: triple popularity is hash-Zipf-ish)."""
    return (
        spark.range(N_DOCS)
        .select(
            F.concat(F.lit("e"), F.pmod(F.xxhash64("id", F.lit("s")),
                                        F.lit(50_000))).alias("subj"),
            F.lit("did").alias("pred"),
            F.concat(F.lit("t"), F.pmod(F.xxhash64("id", F.lit("o")),
                                        F.lit(40))).alias("obj"),
            F.timestamp_seconds(
                F.lit(1700000000)
                + F.pmod(F.xxhash64("id", F.lit("t")), F.lit(2_592_000))
            ).alias("ts"),
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
    docs = _docs(spark)
    docs.count()
    events = _events(spark)
    events.count()
    print(f"master={MASTER} docs={N_DOCS}", flush=True)

    from naruhodo_spark import rdf
    from naruhodo_spark.operators import er, hearst
    from naruhodo_spark.operators import temporal as TP

    walls = {}
    walls["hearst_taxonomy"] = _timed(
        "hearst_taxonomy",
        lambda: hearst.taxonomy_edges(docs, min_count=2).count(),
    )
    # ER over corpus-sized mention records (tier-1 collapse makes the
    # pair tier vocab-sized by construction)
    mentions = _er_records(spark)
    mentions.count()
    walls["er_blocked_matches"] = _timed(
        "er_blocked_matches",
        lambda: er.blocked_matches(mentions, "rid", "name", 3)[0].count(),
    )
    # materialize OUTSIDE the timer: the roundtrip row measures
    # format+parse, not a re-run of the upstream extraction
    edges = hearst.extract_hypernyms(docs).select(
        F.col("hyponym").alias("subj"), "pred",
        F.col("hypernym").alias("obj"),
    ).localCheckpoint()
    edges.count()
    # the roundtrip crosses a file boundary in real use (write→read);
    # the checkpoint models it — a fully LAZY format→parse would let
    # projection collapse inline the 42-replace format expression into
    # each of parse's ~8 column references (~8x re-eval, measured 3x
    # wall; the td_hard_negatives double-eval class)
    def _roundtrip():
        lines = rdf.format_ntriples(edges).localCheckpoint()
        try:
            return rdf.parse_ntriples(lines).where("NOT malformed").count()
        finally:
            lines.unpersist()

    walls["ntriples_roundtrip"] = _timed("ntriples_roundtrip", _roundtrip)
    walls["temporal_intervals"] = _timed(
        "temporal_intervals",
        lambda: TP.validity_intervals(events, gap_minutes=30).count(),
    )
    total = sum(walls.values())
    print(f"TOTAL {MASTER}: {total:.2f} s", flush=True)


if __name__ == "__main__":
    main()
