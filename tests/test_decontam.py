"""Benchmark decontamination (ops/decontam.py): exact n-gram overlap
semantics vs a pure-Python reference, plus a DuckDB string-n-gram
mirror over the real sf0.001 corpus (hash-free, so it cross-checks the
xxhash64 path end-to-end)."""

import re

import duckdb
from pyspark.sql import functions as F


def _norm(t):
    return re.sub(r"\s+", " ", t.lower()).strip()


def _py_matches(doc_text, bench_texts, n):
    bset = set()
    for b in bench_texts:
        tb = _norm(b).split(" ")
        for i in range(len(tb) - n + 1):
            bset.add(" ".join(tb[i : i + n]))
    td = _norm(doc_text).split(" ")
    return sum(
        1 for i in range(len(td) - n + 1) if " ".join(td[i : i + n]) in bset
    )


def test_contamination_flags_exact(spark):
    from naruhodo_spark.ops import decontam as D

    bench_texts = ["the quick brown fox jumps", "alpha beta gamma delta"]
    docs_texts = {
        "d-hit": "prefix the QUICK  brown fox jumps suffix",  # case+ws robust
        "d-double": "alpha beta gamma delta and alpha beta gamma delta",
        "d-miss": "completely unrelated text about spark plans",
        "d-short": "too short",
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in docs_texts.items()], "doc_id string, text string"
    )
    bench = spark.createDataFrame(
        [(f"b{i}", t) for i, t in enumerate(bench_texts)],
        "doc_id string, text string",
    )
    n = 4
    got = {
        r["doc_id"]: (r["n_matches"], r["contaminated"])
        for r in D.contamination_flags(docs, bench, n=n).collect()
    }
    assert set(got) == set(docs_texts)  # every doc present, even 0-match
    for did, text in docs_texts.items():
        want = _py_matches(text, bench_texts, n)
        assert got[did] == (want, want > 0), did
    assert got["d-double"][0] == 2  # positional counting, not distinct

    kept = {
        r["doc_id"] for r in D.decontaminate(docs, bench, n=n).collect()
    }
    assert kept == {"d-miss", "d-short"}


def test_decontam_duckdb_mirror_on_real_corpus(spark):
    """Hash-free cross-check: DuckDB joins raw n-gram STRINGS; Spark
    joins xxhash64 of them. Per-doc match counts must agree on the real
    corpus with a benchmark carved from its own documents (guaranteed
    non-vacuous contamination)."""
    from naruhodo_spark.ops import decontam as D

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    # benchmark: token windows 3..10 of every 7th doc
    bench = (
        docs.where(F.col("doc_id").cast("long") % 7 == 0)
        .select(
            F.concat(F.lit("b-"), "doc_id").alias("doc_id"),
            F.array_join(
                F.slice(F.split(F.trim(F.lower("text")), r"\s+"), 3, 8), " "
            ).alias("text"),
        )
    )
    n = 5
    got = {
        r["doc_id"]: r["n_matches"]
        for r in D.contamination_flags(docs, bench, n=n).collect()
    }

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    rows = con.execute(f"""
        WITH docs AS (
          SELECT CAST(doc_id AS VARCHAR) doc_id,
                 string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') toks
          FROM documents
        ),
        bench AS (
          SELECT list_slice(toks, 3, 10) toks FROM docs
          WHERE CAST(doc_id AS BIGINT) % 7 = 0
        ),
        bgrams AS (
          SELECT DISTINCT unnest([array_to_string(list_slice(toks, i, i + {n - 1}), ' ')
                                  for i in range(1, len(toks) - {n - 1} + 1)]) g
          FROM bench
        ),
        dgrams AS (
          SELECT doc_id, unnest([array_to_string(list_slice(toks, i, i + {n - 1}), ' ')
                                 for i in range(1, len(toks) - {n - 1} + 1)]) g
          FROM docs
        )
        SELECT doc_id, count(*) n FROM dgrams
        WHERE g IN (SELECT g FROM bgrams) GROUP BY doc_id
    """).fetchall()
    want = {d: c for d, c in rows}
    n_docs = docs.count()
    assert len(got) == n_docs
    contaminated = {d: m for d, m in got.items() if m > 0}
    assert contaminated == want
    assert len(contaminated) > 0  # non-vacuous by construction


def test_decontam_plan_is_broadcast_no_corpus_shuffle(spark):
    """The benchmark set must reach the corpus side as a broadcast —
    the doc-grams stage must not hash-exchange before the join."""
    from naruhodo_spark.ops import decontam as D

    docs = spark.createDataFrame([("d", "a b c d e f")], "doc_id string, text string")
    bench = spark.createDataFrame([("b", "a b c d")], "doc_id string, text string")
    plan = (
        D.contamination_flags(docs, bench, n=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_decontam_randomized_vs_python(spark):
    """150 random docs + 10 random benchmark snippets, one Spark call,
    exact per-doc match counts vs the pure-Python reference — exercises
    shared shingles, repeats, short docs, and messy whitespace."""
    import numpy as np

    from naruhodo_spark.ops import decontam as D

    rng = np.random.default_rng(99)
    vocab = [f"w{i}" for i in range(30)]

    def sentence(lo, hi):
        k = int(rng.integers(lo, hi))
        ws = [vocab[int(rng.integers(30))] for _ in range(k)]
        # messy whitespace + case to exercise normalization
        return "  ".join(w.upper() if rng.random() < 0.3 else w for w in ws)

    bench_texts = [sentence(4, 9) for _ in range(10)]
    docs_texts = {}
    for i in range(150):
        t = sentence(1, 25)
        if i % 10 == 0:  # plant a benchmark snippet → guaranteed hits
            t = t + " " + bench_texts[int(rng.integers(10))]
        docs_texts[f"d{i:03d}"] = t
    n = 4

    docs = spark.createDataFrame(
        list(docs_texts.items()), "doc_id string, text string"
    )
    bench = spark.createDataFrame(
        [(f"b{i}", t) for i, t in enumerate(bench_texts)],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: r["n_matches"]
        for r in D.contamination_flags(docs, bench, n=n).collect()
    }
    assert set(got) == set(docs_texts)
    for did, text in docs_texts.items():
        assert got[did] == _py_matches(text, bench_texts, n), did
    assert any(v > 0 for v in got.values())  # non-vacuous
