"""End-to-end LLM-corpus prepare scaling drill (VERDICT r03 next-round
#5): the COMPOSED `prepare_corpus` product path — PII redaction →
tiered near-dup dedup → token/repetition gates → quality-classifier
gate → benchmark decontamination → per-source quota → hash split —
run as ONE lazy plan over the 1.28M-doc replicated corpus at two
parallelism levels in separate JVMs (the sandbox proxy for the north
rule's N → 4N criterion; same protocol as BENCH/bench_scale.py).

The replicated corpus is an honest dedup workload: every base doc
gains 255 byte-identical copies, so the exact-fingerprint tier
collapses 1.28M → ~5k representatives before LSH ever runs — the
tiered design's whole point. The map-heavy stages (redaction regexes,
token stats, hashing, quality scoring) still scan all 1.28M rows, so
the scaling signal reflects the full-corpus cost, not the collapsed
tail.

The quality model is trained ONCE per JVM on the fixed planted
good/bad corpus (the td_quality_classifier fixture) OUTSIDE the timed
region — at production scale the classifier is fitted once and reused
across prepare runs, so timing it would charge a one-time cost to
every run.

Usage: python BENCH/bench_scale_prepare.py [--replicate 256] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_FILES = 96
INPUT_DIR = "/tmp/naruhodo_scale_prepare_input"

_PREP = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from naruhodo_spark.session import get_spark

spark = get_spark(app_name="prep", master="local[32]")
flat = spark.read.parquet({sf_dir!r} + "/documents.parquet").select(
    "doc_id", "text", "source"
)
reps = spark.range({replicate}).select(F.col("id").alias("rep"))
docs = flat.crossJoin(F.broadcast(reps)).select(
    (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
    "text",
    "source",
)
docs.repartition({n_files}, "doc_id").write.mode("overwrite").parquet({inp!r})
"""

_JOB = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from naruhodo_spark.session import get_spark
from naruhodo_spark.ops import qualityclf as QC
from naruhodo_spark.ops.prepare import prepare_corpus

cores = {cores}
spark = get_spark(app_name="scale-prepare", master=f"local[{{cores}}]",
                  shuffle_partitions=cores)
docs = spark.read.parquet({inp!r})
n = docs.count()

# one-time model fit (outside the timed region; see module docstring)
good = ["theorem", "analysis", "citation", "methodology", "approach",
        "study", "we", "show", "results"]
bad = ["click", "winner", "free", "casino", "buy", "now", "cheap"]
rows = []
for i in range(80):
    rows.append((f"good-{{i}}", " ".join(good[(i + j) % len(good)] for j in range(6)), 1.0))
    rows.append((f"bad-{{i}}", " ".join(bad[(i + 2 * j) % len(bad)] for j in range(6)), 0.0))
qdocs = spark.createDataFrame([(d, t) for d, t, _ in rows], ["doc_id", "text"])
qlabels = spark.createDataFrame([(d, y) for d, _, y in rows], ["doc_id", "label"])
DIM = 1 << 12
w = QC.train_quality_classifier(qdocs, qlabels, dim=DIM, iters=20, lr=2.0)
w = w.localCheckpoint()

# benchmark set for decontam: token windows of every 997th base doc
bench = docs.where(F.col("doc_id") % 997 == 0).select(
    F.concat(F.lit("b-"), F.col("doc_id").cast("string")).alias("doc_id"),
    F.array_join(F.slice(F.split(F.trim(F.lower("text")), r"\s+"), 3, 13), " ").alias("text"),
).localCheckpoint()

def run_once():
    t0 = time.time()
    out = prepare_corpus(
        docs,
        min_tokens=8,
        max_top_bigram_frac=0.9,
        bench=bench,
        decontam_n=13,
        source_cap=50_000,
        quality_weights=w,
        quality_threshold=0.1,
        quality_dim=DIM,
    )
    out.write.format("noop").mode("overwrite").save()
    return time.time() - t0, out

wall0, out = run_once()  # warmup (JVM/codegen/python workers)
survivors = out.count()
walls = []
for _ in range({runs}):
    wall, _o = run_once()
    walls.append(wall)
print("RESULT " + json.dumps(
    {{"cores": cores, "docs": n, "survivors": survivors, "walls": walls}}))
"""


def run_cfg(cores: int, runs: int, timeout: int = 7200) -> dict:
    code = _JOB.format(repo=REPO, cores=cores, inp=INPUT_DIR, runs=runs)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=timeout,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from cores={cores}:\n{out.stderr[-4000:]}")


def run_ceiling(k: int, runs: int, timeout: int = 7200) -> dict:
    """Hardware-ceiling measurement (the tiered-dedup drill protocol,
    BENCH/BASELINE.md "Second-workload scaling"): K CONCURRENT,
    fully independent local[2] JVMs over the same input. They share
    nothing but the box, so any per-job slowdown vs a solo local[2]
    run is the machine's memory-bandwidth/LLC wall — the denominator
    that does not compound across real multi-node executors."""
    code = _JOB.format(repo=REPO, cores=2, inp=INPUT_DIR, runs=runs)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code], stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        for _ in range(k)
    ]
    walls = []
    for p in procs:
        out, err = p.communicate(timeout=timeout)
        got = None
        for line in out.splitlines():
            if line.startswith("RESULT "):
                got = json.loads(line[len("RESULT "):])
        if got is None:
            raise RuntimeError(f"no RESULT from ceiling job:\n{err[-4000:]}")
        walls.append(min(got["walls"]))
    return {"k": k, "per_job_best_walls": [round(w, 2) for w in walls]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=256)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--skip-prep", action="store_true")
    ap.add_argument(
        "--ceiling", type=int, default=0, metavar="K",
        help="instead of the 2→8 sweep, run K concurrent independent "
        "local[2] jobs (hardware-ceiling protocol) and print per-job walls",
    )
    args = ap.parse_args()

    if not args.skip_prep:
        code = _PREP.format(
            repo=REPO, sf_dir=args.sf_dir, replicate=args.replicate,
            n_files=N_FILES, inp=INPUT_DIR,
        )
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=1800)
        if r.returncode != 0:
            raise RuntimeError(r.stderr[-4000:])

    if args.ceiling:
        print(json.dumps(run_ceiling(args.ceiling, args.runs)))
        return

    res = {}
    for cores in (2, 8):
        res[cores] = run_cfg(cores, args.runs)
        print(cores, res[cores], flush=True)

    best2 = min(res[2]["walls"])
    best8 = min(res[8]["walls"])
    n = res[2]["docs"]
    th2, th8 = n / best2, n / best8
    eff = th8 / (4 * th2)
    print(json.dumps({
        "docs": n,
        "survivors": res[2]["survivors"],
        "local2_best_s": round(best2, 2),
        "local8_best_s": round(best8, 2),
        "docs_per_s_local2": round(th2, 1),
        "docs_per_s_local8": round(th8, 1),
        "efficiency_2_to_8": round(eff, 3),
        "walls2": [round(w, 2) for w in res[2]["walls"]],
        "walls8": [round(w, 2) for w in res[8]["walls"]],
    }))


if __name__ == "__main__":
    main()
