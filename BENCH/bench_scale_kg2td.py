"""KG → training-data END-TO-END composition scaling drill (VERDICT
r04 next-round #6): the whole product story as ONE lazy plan —

    build_kg (fused extraction + broadcast alias linking)
      → schema induction (predicate_signatures over linked triples)
      → QA-pair generation (qa_pairs, gated on induced predicate
        support ≥ 3 — the curation step schema induction exists for)
      → KELM verbalization (verbalize_triples)
      → prepare_corpus (PII redaction → tiered near-dup dedup →
        token/repetition gates → per-source quota → hash split)

over the 1.28M-doc replicated corpus at two parallelism levels in
separate JVMs (the sandbox proxy for the north rule's N → 4N executor
criterion; same protocol as BENCH/bench_scale.py: pre-materialized
96-file spans input, 3 runs per config after a warmup, best wall).

Plan-shape notes (why this composes without re-extraction):
- ``triples_linked`` is lazily local-checkpointed ONCE per run; the
  edge aggregation, schema induction, and both corpus generators all
  read the checkpoint instead of re-running sentence-split → chunk →
  extract per consumer (the prepare_corpus fan-out discipline).
- the induced-signature gate is a broadcast semi-join on ``pred``
  (signatures are a per-predicate table — thousands of rows at any
  corpus size, broadcastable by construction).
- QA/KELM doc_ids are xxhash64 of content (numeric, the
  near_dup_groups contract), never monotonically_increasing_id.

Usage: python BENCH/bench_scale_kg2td.py [--replicate 256] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_FILES = 96
INPUT_DIR = "/tmp/naruhodo_scale_kg2td_input"

_PREP = r"""
import sys
sys.path.insert(0, {repo!r})
from naruhodo_spark.session import get_spark
from naruhodo_spark import synth
from naruhodo_spark.operators.normalize import flat_to_spans

spark = get_spark(app_name="prep", master="local[32]")
flat = spark.read.parquet({sf_dir!r} + "/documents.parquet").select(
    "doc_id", "text"
)
docs = synth.replicate_docs(flat_to_spans(flat), {replicate})
docs.repartition({n_files}, "doc_id").write.mode("overwrite").parquet({inp!r})
"""

_JOB = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from naruhodo_spark.session import get_spark
from naruhodo_spark import synth
from naruhodo_spark.operators import agg as O_agg
from naruhodo_spark.operators import schema_induct as SI
from naruhodo_spark.ops import verbalize as VB
from naruhodo_spark.ops.prepare import prepare_corpus
from naruhodo_spark.pipeline import build_kg

cores = {cores}
spark = get_spark(app_name="scale-kg2td", master=f"local[{{cores}}]",
                  shuffle_partitions=cores)
docs = spark.read.parquet({inp!r})
n = docs.count()
aliases = synth.alias_dictionary(spark)


def compose():
    kg = build_kg(docs, aliases=aliases)
    # ONE extraction per run: everything downstream reads this barrier
    t = kg["triples_linked"].localCheckpoint(eager=False)
    edges = O_agg.aggregate_edges(t).localCheckpoint(eager=False)
    sigs = SI.predicate_signatures(t)
    keep = sigs.where(F.col("support") >= 3).select("pred")
    qa = VB.qa_pairs(
        edges.join(F.broadcast(keep), "pred", "semi"), max_distractors=3
    )
    kelm = VB.verbalize_triples(edges)
    corpus = kelm.select(
        F.xxhash64("doc_id").alias("doc_id"),
        "text",
        F.lit("kelm").alias("source"),
    ).unionByName(qa.select(
        F.xxhash64("question", "answer").alias("doc_id"),
        F.concat_ws(" ", "question", "answer").alias("text"),
        F.lit("qa").alias("source"),
    ))
    return qa, prepare_corpus(
        corpus,
        min_tokens=4,
        max_top_bigram_frac=0.95,
        source_cap=10_000_000,
    )


# warmup (JVM/codegen/python workers) + structure counts for the report
qa, out = compose()
out.write.format("noop").mode("overwrite").save()
qa_n = qa.count()
survivors = out.count()

walls = []
for _ in range({runs}):
    t0 = time.time()
    _qa, out = compose()
    out.write.format("noop").mode("overwrite").save()
    walls.append(time.time() - t0)
print("RESULT " + json.dumps({{
    "cores": cores, "docs": n, "qa_pairs": qa_n,
    "survivors": survivors, "walls": walls}}))
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=256)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--skip-prep", action="store_true")
    ap.add_argument("--cores", type=int, nargs=2, default=(2, 8),
                    metavar=("N", "4N"))
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

    lo, hi = args.cores
    res = {}
    for cores in (lo, hi):
        res[cores] = run_cfg(cores, args.runs)
        print(cores, res[cores], flush=True)

    best_lo = min(res[lo]["walls"])
    best_hi = min(res[hi]["walls"])
    n = res[lo]["docs"]
    qa_n = res[lo]["qa_pairs"]
    th_lo, th_hi = n / best_lo, n / best_hi
    eff = th_hi / ((hi / lo) * th_lo)
    print(json.dumps({
        "docs": n,
        "qa_pairs": qa_n,
        "survivors": res[lo]["survivors"],
        f"local{lo}_best_s": round(best_lo, 2),
        f"local{hi}_best_s": round(best_hi, 2),
        f"docs_per_s_local{lo}": round(th_lo, 1),
        f"docs_per_s_local{hi}": round(th_hi, 1),
        f"qa_pairs_per_s_local{hi}": round(qa_n / best_hi, 1),
        f"efficiency_{lo}_to_{hi}": round(eff, 3),
        f"walls{lo}": [round(w, 2) for w in res[lo]["walls"]],
        f"walls{hi}": [round(w, 2) for w in res[hi]["walls"]],
    }))


if __name__ == "__main__":
    main()
