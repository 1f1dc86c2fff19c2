"""Golden end-to-end gates (SURVEY.md §5.2 tier 2):

- triple P/R ≥ 0.95 vs the executable-spec goldens ([B] BASELINE.json:2)
- exact span-sequence equality per doc ([B] BASELINE.json:15)
- KSG edge weights equal the spec's expected counters

Goldens are written to tests/golden/ on first run (regenerable artifacts
— SURVEY.md §5.1) and loaded thereafter, so regressions show up as
diffs against committed files.
"""

import json
import os
from collections import Counter

import pyspark.sql.functions as F
import pytest

from naruhodo_spark import synth
from naruhodo_spark.pipeline import build_kg
from tests import golden_spec

N_DOCS = 120
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _golden_path(name):
    return os.path.join(GOLDEN_DIR, name)


@pytest.fixture(scope="module")
def golden():
    trip_p = _golden_path(f"synth{N_DOCS}.triples.jsonl")
    edge_p = _golden_path(f"synth{N_DOCS}.ksg_edges.jsonl")
    span_p = _golden_path(f"synth{N_DOCS}.spans.jsonl")
    if not (os.path.exists(trip_p) and os.path.exists(edge_p) and os.path.exists(span_p)):
        triples, edges, spans = golden_spec.expected_corpus(N_DOCS)
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(trip_p, "w") as f:
            for t in triples:
                f.write(json.dumps(t, sort_keys=True) + "\n")
        with open(edge_p, "w") as f:
            for (s, p, o), w in sorted(edges.items()):
                f.write(json.dumps({"subj": s, "pred": p, "obj": o, "weight": w}) + "\n")
        with open(span_p, "w") as f:
            for d, seq in sorted(spans.items()):
                f.write(json.dumps({"doc_id": d, "seq": seq}) + "\n")
    with open(trip_p) as f:
        triples = [json.loads(l) for l in f]
    with open(edge_p) as f:
        edges = Counter(
            {(r["subj"], r["pred"], r["obj"]): r["weight"]
             for r in (json.loads(l) for l in f)}
        )
    with open(span_p) as f:
        spans = {r["doc_id"]: [tuple(x) for x in r["seq"]]
                 for r in (json.loads(l) for l in f)}
    return triples, edges, spans


@pytest.fixture(scope="module")
def kg(spark):
    docs = synth.synth_documents(spark, N_DOCS)
    return build_kg(docs, aliases=synth.alias_dictionary(spark))


def _pr(emitted: Counter, expected: Counter):
    inter = sum((emitted & expected).values())
    p = inter / max(sum(emitted.values()), 1)
    r = inter / max(sum(expected.values()), 1)
    return p, r


def test_triples_precision_recall(kg, golden):
    exp_triples, _, _ = golden
    expected = Counter(
        (t["doc_id"], t["sent_id"], t["subj"], t["pred"], t["obj"],
         t["negative"], t["passive"])
        for t in exp_triples
    )
    rows = kg["triples"].collect()
    emitted = Counter(
        (r["doc_id"], r["sent_id"], r["subj"], r["pred"], r["obj"],
         r["negative"], r["passive"])
        for r in rows
    )
    p, r = _pr(emitted, expected)
    assert p >= 0.95 and r >= 0.95, f"P={p:.4f} R={r:.4f}"
    # the spec and the pipeline should in fact agree exactly
    assert p == 1.0 and r == 1.0, f"P={p:.4f} R={r:.4f}"


def test_ksg_edge_weights_match_spec(kg, golden):
    _, exp_edges, _ = golden
    got = Counter(
        {(r["subj"], r["pred"], r["obj"]): r["weight"]
         for r in kg["ksg_edges"].collect()}
    )
    missing = {k: v for k, v in exp_edges.items() if got.get(k) != v}
    extra = {k: v for k, v in got.items() if exp_edges.get(k) != v}
    assert not missing and not extra, (
        f"missing={list(missing.items())[:5]} extra={list(extra.items())[:5]}"
    )


def test_span_sequences_exact(spark, golden):
    _, _, exp_spans = golden
    from naruhodo_spark.operators.normalize import span_sequences

    docs = synth.synth_documents(spark, N_DOCS)
    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"]) for s in r["span_seq"]]
        for r in span_sequences(docs).collect()
    }
    assert got == exp_spans


def test_hot_entity_skew_counts(spark):
    """Skew fixture (FIXTURES.md): one hot entity in ~50% of triples —
    salted aggregation must produce the same counts as the plain path."""
    from naruhodo_spark.operators.agg import aggregate_edges, aggregate_edges_salted

    docs = synth.synth_documents(spark, 80, hot_frac=0.5)
    kg = build_kg(docs, aliases=synth.alias_dictionary(spark))
    t = kg["triples_linked"]
    plain = {tuple(r) for r in aggregate_edges(t).collect()}
    salted = {tuple(r) for r in aggregate_edges_salted(t, 13).collect()}
    assert plain == salted
    # and the hot entity actually dominates
    top = max(plain, key=lambda r: r[3])
    assert top[0] == "alice"
