"""Second-workload scaling evidence: the tiered dedup job at two
parallelism levels (same protocol as bench_scale.py — identical input,
separate JVMs, min-of-runs). The KG pipeline's scaling number alone could
be dismissed as cherry-picked (its fused extraction is embarrassingly
parallel); dedup is the shuffle-heavy counterpoint — fingerprint groupBy,
shingle explode, signature agg, LSH band self-join, CC closure.

Input: the sf documents table replicated ×replicate with doc_ids remapped
(doc_id*R + rep). Even reps keep the text byte-identical (exact-dup tier
work: R/2-sized fingerprint groups per content), odd reps append a small
variant marker (near-dup tier work: distinct fingerprints, high Jaccard).
Both tiers of near_dup_groups therefore carry real load at scale.

Usage:  python BENCH/bench_scale_dedup.py [--replicate 16] [--runs 3]
Prints one JSON line per config + a summary; paste the table into the
manual section of BENCH/BASELINE.md (this script does not rewrite it).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PREP = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from naruhodo_spark.session import get_spark

spark = get_spark(app_name="dedup-scale-prep", master="local[32]")
flat = spark.read.parquet({sf_dir!r} + "/documents.parquet").select(
    "doc_id", "text")
R = {replicate}
reps = spark.range(R).select(F.col("id").alias("rep"))
docs = (
    flat.crossJoin(reps)
    .select(
        (F.col("doc_id") * R + F.col("rep")).alias("doc_id"),
        F.when(F.col("rep") % 2 == 0, F.col("text"))
        .otherwise(F.concat(F.col("text"), F.lit(" v"),
                            F.col("rep").cast("string")))
        .alias("text"),
    )
)
docs.repartition({n_files}, "doc_id").write.mode("overwrite").parquet({inp!r})
"""

_JOB = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from naruhodo_spark.session import get_spark
from naruhodo_spark.ops.dedup import near_dup_groups

cores = {cores}
spark = get_spark(app_name="dedup-scale", master=f"local[{{cores}}]",
                  shuffle_partitions=cores)
docs = spark.read.parquet({inp!r})
n = docs.count()

def once():
    near_dup_groups(docs).write.format("noop").mode("overwrite").save()
    # clear the lazy localCheckpoints the plan creates
    for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        rdd.unpersist(False)
    spark.catalog.clearCache()

once()  # warmup
walls = []
for _ in range({runs}):
    t0 = time.time()
    near_dup_groups(docs).write.format("noop").mode("overwrite").save()
    walls.append(time.time() - t0)
    for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        rdd.unpersist(False)
    spark.catalog.clearCache()
print("RESULT " + json.dumps({{"cores": cores, "docs": n, "walls": walls}}))
"""

N_FILES = 96
INPUT_DIR = "/tmp/naruhodo_scale_dedup_input"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--replicate", type=int, default=16)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--small", type=int, default=4)
    ap.add_argument("--large", type=int, default=16)
    args = ap.parse_args()

    code = _PREP.format(repo=REPO, sf_dir=args.sf_dir,
                        replicate=args.replicate, n_files=N_FILES,
                        inp=INPUT_DIR)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=1800)
    if out.returncode != 0:
        raise RuntimeError(f"prep failed: {out.stderr[-2000:]}")

    res = {}
    for cores in (args.small, args.large):
        code = _JOB.format(repo=REPO, cores=cores, runs=args.runs,
                           inp=INPUT_DIR)
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=1800)
        parsed = None
        for line in r.stdout.splitlines():
            if line.startswith("RESULT "):
                parsed = json.loads(line[len("RESULT "):])
        if parsed is None:
            raise RuntimeError(f"no RESULT; stderr: {r.stderr[-2000:]}")
        parsed["best_wall"] = min(parsed["walls"])
        parsed["docs_per_sec"] = parsed["docs"] / parsed["best_wall"]
        res[cores] = parsed
        print(json.dumps(parsed))

    small, large = res[args.small], res[args.large]
    factor = args.large / args.small
    eff = large["docs_per_sec"] / (factor * small["docs_per_sec"])
    print(json.dumps({"workload": "near_dup_groups",
                      "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
