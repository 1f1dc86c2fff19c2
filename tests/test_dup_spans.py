"""duplicate_ngram_spans (ops/dedup.py): exact Python reference mirror
on the real sf0.01 documents plus planted-duplicate structural cases
(cross-doc span, full-doc dup, intra-doc repeat, first-occurrence keep
rule, merged overlapping windows)."""

import re

from pyspark.sql import functions as F

from naruhodo_spark.ops import dedup as D

SF = "/root/testdata/sf0.01"


def _norm_tokens(text):
    return re.sub(r"\s+", " ", text.lower()).strip().split(" ")


def _py_dup_spans(rows, n):
    """Reference: window-hash occurrence counting, min-(doc_id,pos)
    keeper, overlap-or-adjacent span merge, token-drop reconstruction."""
    toks = {d: _norm_tokens(t) for d, t in rows}
    occ = {}
    for d in sorted(toks):
        tk = toks[d]
        for p in range(len(tk) - n + 1):
            occ.setdefault(" ".join(tk[p : p + n]), []).append((d, p))
    starts = {d: [] for d in toks}
    for _, places in occ.items():
        if len(places) > 1:
            keeper = min(places)
            for d, p in places:
                if (d, p) != keeper:
                    starts[d].append(p)
    out = {}
    for d, tk in toks.items():
        spans = []
        for p in sorted(starts[d]):
            if spans and p <= spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], max(spans[-1][1], p + n - 1))
            else:
                spans.append((p, p + n - 1))
        removed = set()
        for s, e in spans:
            removed.update(range(s, e + 1))
        out[d] = (
            len(tk),
            len(starts[d]),
            spans,
            sum(e - s + 1 for s, e in spans),
            " ".join(t for i, t in enumerate(tk) if i not in removed),
        )
    return out


def _collect(df):
    return {
        r["doc_id"]: (
            r["n_tokens"],
            r["dup_windows"],
            [(s["s"], s["e"]) for s in r["spans_removed"]],
            r["n_tokens_removed"],
            r["text_deduped"],
        )
        for r in df.collect()
    }


def test_dup_spans_matches_python_mirror_on_sf001(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = _collect(D.duplicate_ngram_spans(docs, n=8))
    rows = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
    want = _py_dup_spans(rows, 8)
    assert got == want
    # the sf0.01 corpus actually exercises the op (it has exact-dup docs)
    assert sum(1 for v in got.values() if v[1] > 0) > 0


def test_dup_spans_planted_structures(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog and runs away fast"),
        (1, "intro text then the quick brown fox jumps over the lazy dog and more"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),
        (3, "alpha beta gamma delta epsilon zeta eta theta"),
        (4, "self repeat one two three four five six seven eight "
            "one two three four five six seven eight tail"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _collect(D.duplicate_ngram_spans(df, n=8))
    assert got == _py_dup_spans(rows, 8)
    # keep rule: doc 0 is the first occurrence — untouched
    assert got[0][1] == 0 and got[0][4].startswith("the quick brown fox")
    # doc 1 loses the shared 10-token run (3 overlapping windows → 1 span)
    assert got[1][2] == [(3, 12)] and got[1][4] == "intro text then more"
    # full-doc duplicate: doc 3 fully removed, doc 2 kept
    assert got[3][4] == "" and got[2][1] == 0
    # intra-doc repeat keeps the FIRST copy
    assert got[4][2] == [(10, 17)]


def test_dup_spans_short_and_empty_docs_pass_through(spark):
    rows = [(0, "too short"), (1, ""), (2, "one two three four five six seven")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _collect(D.duplicate_ngram_spans(df, n=8))
    for d in (0, 1, 2):
        assert got[d][1] == 0 and got[d][3] == 0
    assert got[2][4] == "one two three four five six seven"


def test_dup_spans_token_accounting_is_exact(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = D.duplicate_ngram_spans(docs, n=8)
    bad = out.where(
        F.size(F.split("text_deduped", r"\s+"))
        != F.col("n_tokens") - F.col("n_tokens_removed")
    ).where(F.col("text_deduped") != "").count()
    assert bad == 0
