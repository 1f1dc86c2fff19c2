"""Document sources (sources.py): JSONL/CSV/raw-text ingest normalized
to flat or spans shape, malformed-row tolerance, deterministic
path-derived ids, and end-to-end into build_kg."""

import json
import os

import pytest

from naruhodo_spark import sources as SRC
from naruhodo_spark.pipeline import build_kg


@pytest.fixture()
def tmpdir_files(tmp_path):
    return str(tmp_path)


def test_jsonl_reader_and_malformed_rows(spark, tmpdir_files):
    p = os.path.join(tmpdir_files, "docs.jsonl")
    with open(p, "w") as f:
        f.write(json.dumps({"doc_id": "a", "text": "alice visited bob."}) + "\n")
        f.write("{not valid json\n")
        f.write(json.dumps({"doc_id": "b"}) + "\n")  # missing text
        f.write(json.dumps({"doc_id": "c", "text": "carol praised dave."}) + "\n")
    out = SRC.read_documents_jsonl(spark, p)
    rows = {r["doc_id"]: r["text"] for r in out.collect()}
    assert rows == {
        "a": "alice visited bob.",
        "c": "carol praised dave.",
    }
    spans = SRC.read_documents_jsonl(spark, p, to_spans=True)
    assert spans.columns == ["doc_id", "spans"]
    s = {r["doc_id"]: r["spans"] for r in spans.collect()}
    assert s["a"][0]["kind"] == "text" and s["a"][0]["offset"] == 0


def test_csv_reader_with_quoted_multiline(spark, tmpdir_files):
    p = os.path.join(tmpdir_files, "docs.csv")
    with open(p, "w") as f:
        f.write('doc_id,text\n')
        f.write('a,"alice visited bob."\n')
        f.write('b,"line one\nline two"\n')
        f.write(',missing id row\n')
    out = SRC.read_documents_csv(spark, p)
    rows = {r["doc_id"]: r["text"] for r in out.collect()}
    assert rows["a"] == "alice visited bob."
    assert rows["b"] == "line one\nline two"
    assert None not in rows and len(rows) == 2


def test_text_reader_one_doc_per_file(spark, tmpdir_files):
    d = os.path.join(tmpdir_files, "articles")
    os.makedirs(d)
    for name, body in [("one.txt", "alice visited bob."),
                       ("two.txt", "carol praised dave.")]:
        with open(os.path.join(d, name), "w") as f:
            f.write(body)
    out = SRC.read_documents_text(spark, d)
    rows = out.collect()
    assert len(rows) == 2
    assert {r["text"] for r in rows} == {
        "alice visited bob.", "carol praised dave."
    }
    assert all(r["doc_id"].startswith("txt-") for r in rows)
    assert all(r["source_file"].endswith(".txt") for r in rows)
    # deterministic ids: re-read gives the identical id set
    again = SRC.read_documents_text(spark, d)
    assert {r["doc_id"] for r in rows} == {r["doc_id"] for r in again.collect()}


def test_sources_feed_build_kg(spark, tmpdir_files):
    p = os.path.join(tmpdir_files, "kg.jsonl")
    with open(p, "w") as f:
        for i, t in enumerate(
            ["alice visited bob.", "carol praised dave.", "erin moved."]
        ):
            f.write(json.dumps({"doc_id": f"d{i}", "text": t}) + "\n")
    docs = SRC.read_documents_jsonl(spark, p, to_spans=True)
    kg = build_kg(docs)
    edges = kg["ksg_edges"].collect()
    assert len(edges) > 0
    assert {"alice", "carol"} <= {r["subj"] for r in edges}


def test_corpus_report_vs_duckdb(spark):
    """Exact columns (n_docs, n_tokens, n_chars, mean, dup share)
    mirrored in DuckDB; approximate percentiles bracketed by the exact
    min/max token counts per group."""
    import duckdb

    from naruhodo_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    out = {(r["source"], r["lang"]): r
           for r in Q.QUERIES["ts_corpus_report"](spark, sf).collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    mirror = con.execute(r"""
        WITH t AS (
          SELECT source, lang,
                 len(string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+')) AS n_tokens,
                 length(text) AS n_chars,
                 md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
          FROM documents)
        SELECT source, lang, count(*) AS n_docs, sum(n_tokens) AS n_tokens,
               sum(n_chars) AS n_chars,
               round(avg(n_tokens), 2) AS mean_tokens,
               min(n_tokens) AS min_t, max(n_tokens) AS max_t,
               round(1.0 - count(DISTINCT fp)::DOUBLE / count(*), 4) AS pct_dup
        FROM t GROUP BY 1, 2
    """).fetchdf()
    assert len(out) == len(mirror)
    for _, m in mirror.iterrows():
        r = out[(m["source"], m["lang"])]
        assert r["n_docs"] == m["n_docs"]
        assert r["n_tokens"] == m["n_tokens"]
        assert r["n_chars"] == m["n_chars"]
        assert float(r["mean_tokens"]) == pytest.approx(float(m["mean_tokens"]), abs=0.01)
        assert float(r["pct_dup_text"]) == pytest.approx(float(m["pct_dup"]), abs=1e-6)
        assert m["min_t"] <= r["p50_tokens"] <= r["p95_tokens"] <= m["max_t"]


def test_events_to_triples_adapter(spark):
    """Structured-event → KG edges: weights count interactions, NULL
    objects drop, output is ksg_edges-shaped (graph stack consumable)."""
    from naruhodo_spark.sources import events_to_triples

    ev = spark.createDataFrame(
        [
            (1, "click", '{"k": 7}'),
            (1, "click", '{"k": 7}'),
            (1, "view", '{"k": 9}'),
            (2, "click", '{"x": 1}'),   # no k: dropped
        ],
        "user_id int, event_type string, props string",
    )
    got = {(r["subj"], r["pred"], r["obj"]): r["weight"]
           for r in events_to_triples(ev).collect()}
    assert got == {
        ("user:1", "click", "item:7"): 2,
        ("user:1", "view", "item:9"): 1,
    }
    # edges feed the graph stack unchanged
    from naruhodo_spark.operators import graphstats as GS

    deg = {r["node"]: r["out_degree"]
           for r in GS.degree_stats(events_to_triples(ev)).collect()}
    assert deg["user:1"] == 2


def test_events_to_triples_multi_edge(spark):
    """edge_specs lifts multiple edge types in ONE pass (VERDICT r04
    #7): result ≡ the union of per-spec single calls, NULL extractions
    drop per-spec (a row missing one key still yields its other
    edges), and the plan holds the one-groupBy shape (no extra
    shuffle per edge type)."""
    from naruhodo_spark.sources import events_to_triples

    ev = spark.createDataFrame(
        [
            (1, "click", '{"item": 7, "shop": "a"}'),
            (1, "click", '{"item": 7, "shop": "a"}'),
            (1, "view", '{"item": 9}'),          # no shop: edge 2 only
            (2, "click", '{"shop": "b"}'),       # no item: edge 1 only
        ],
        "user_id int, event_type string, props string",
    )
    specs = [
        ("bought", "get_json_object(props, '$.item')"),
        ("visited", "get_json_object(props, '$.shop')"),
    ]
    multi = events_to_triples(ev, edge_specs=specs)
    got = {(r["subj"], r["pred"], r["obj"]): r["weight"]
           for r in multi.collect()}
    assert got == {
        ("user:1", "bought", "item:7"): 2,
        ("user:1", "bought", "item:9"): 1,
        ("user:1", "visited", "item:a"): 2,
        ("user:2", "visited", "item:b"): 1,
    }
    # union-equivalence with k single-spec passes (pred_col overridden
    # per spec via a constant column)
    from pyspark.sql import functions as F

    singles = {}
    for pred, ex in specs:
        one = events_to_triples(
            ev.withColumn("event_type", F.lit(pred)), obj_expr=ex
        )
        for r in one.collect():
            singles[(r["subj"], r["pred"], r["obj"])] = r["weight"]
    assert got == singles
    # one shuffle total: exactly one Exchange below the final agg
    # (AQE appends the initial plan after the final one — count only
    # the final section)
    plan = multi._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1, plan
