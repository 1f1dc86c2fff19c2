"""Stupid-Backoff n-gram LM (ops/lm.py) vs an exact python mirror, plus
the CCNet discrimination property: an LM fitted on an in-domain slice
assigns lower perplexity to in-domain text than to out-of-domain noise.
"""

import math
from collections import Counter

import pytest

from naruhodo_spark.ops.lm import (
    ALPHA,
    BOS,
    EOS,
    ngram_counts,
    perplexity_buckets,
    perplexity_scores,
)

FIT = [
    ("f1", "the cat sat on the mat"),
    ("f2", "the cat ate the fish"),
    ("f3", "a dog sat on a log"),
    ("f4", "the dog ate the bone"),
]
SCORE = FIT + [
    ("s1", "the cat sat on the log"),  # in-domain recombination
    ("s2", "zyx qwv plk jjh wqx"),  # pure OOV
    ("s3", ""),  # empty doc: EOS event only
]


def _pad(text, n):
    return [BOS] * (n - 1) + [t for t in text.lower().split() if t] + [EOS]


def _ref_counts(rows, n):
    cnt = Counter()
    for _, text in rows:
        toks = _pad(text, n)
        for k in range(1, n + 1):
            for i in range(len(toks) - k + 1):
                cnt[(" ".join(toks[i : i + k]), k)] += 1
    return cnt


def _ref_score_doc(text, cnt, n, alpha=ALPHA):
    toks = _pad(text, n)
    total = sum(c for (_, k), c in cnt.items() if k == 1)
    lps = []
    for pos in range(n - 1, len(toks)):
        s = None
        for k in range(n, 0, -1):
            g = " ".join(toks[pos - k + 1 : pos + 1])
            c = cnt.get((g, k))
            if not c:
                continue
            if k == 1:
                s = (c / total) * alpha ** (n - 1)
            else:
                ctx = " ".join(toks[pos - k + 1 : pos])
                s = (c / cnt[(ctx, k - 1)]) * alpha ** (n - k)
            break
        if s is None:
            s = alpha ** (n - 1) / total
        lps.append(math.log10(s))
    return len(lps), -sum(lps) / len(lps)


@pytest.fixture(scope="module")
def frames(spark):
    fit = spark.createDataFrame(FIT, "doc_id string, text string")
    score = spark.createDataFrame(SCORE, "doc_id string, text string")
    return fit, score


def test_ngram_counts_match_reference(spark, frames):
    fit, _ = frames
    for n in (2, 3):
        got = {
            (r["gram"], r["order"]): r["count"]
            for r in ngram_counts(fit, n=n).collect()
        }
        assert got == dict(_ref_counts(FIT, n)), n


def test_perplexity_matches_reference(spark, frames):
    fit, score = frames
    n = 3
    model = ngram_counts(fit, n=n)
    got = {
        r["doc_id"]: r for r in perplexity_scores(score, model, n=n).collect()
    }
    cnt = _ref_counts(FIT, n)
    for doc_id, text in SCORE:
        n_scored, log10_ppl = _ref_score_doc(text, cnt, n)
        assert got[doc_id]["n_scored"] == n_scored, doc_id
        assert got[doc_id]["log10_ppl"] == pytest.approx(
            round(log10_ppl, 4), abs=2e-4
        ), doc_id
        assert got[doc_id]["ppl"] == pytest.approx(
            10 ** log10_ppl, rel=1e-3
        ), doc_id


def test_in_domain_beats_noise(spark, frames):
    fit, score = frames
    model = ngram_counts(fit, n=3)
    got = {
        r["doc_id"]: r["log10_ppl"]
        for r in perplexity_scores(score, model, n=3).collect()
    }
    assert got["s1"] < got["s2"]  # recombined in-domain ≪ OOV noise
    for doc_id, _ in FIT:  # training docs score best of all
        assert got[doc_id] < got["s1"]


def test_buckets_cover_and_order(spark, frames):
    fit, score = frames
    model = ngram_counts(fit, n=3)
    scored = perplexity_scores(score, model, n=3)
    rows = perplexity_buckets(scored).collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["ppl_bucket"], []).append(r["log10_ppl"])
    assert set(by_bucket) <= {"head", "middle", "tail"}
    assert len(rows) == len(SCORE)
    if "head" in by_bucket and "tail" in by_bucket:
        assert max(by_bucket["head"]) <= min(by_bucket["tail"])
    # the OOV doc lands in the worst occupied bucket
    worst = max(r["log10_ppl"] for r in rows)
    oov = next(r for r in rows if r["doc_id"] == "s2")
    assert oov["log10_ppl"] == worst


def test_real_corpus_smoke(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(300)
    )
    fit = docs.where("doc_id % 5 = 0")
    model = ngram_counts(fit, n=3)
    out = perplexity_scores(docs, model, n=3)
    rows = out.collect()
    assert len(rows) == docs.count()
    assert all(r["n_scored"] >= 1 for r in rows)


def test_null_text_doc_fails_closed(spark):
    """NULL-text docs are unscoreable: NULL ppl (never a coalesced
    best-possible 0.0) and bucketed 'tail' — the filter fails closed."""
    from naruhodo_spark.ops import lm as LM

    docs = spark.createDataFrame(
        [(0, "the quick fox"), (1, None), (2, "the quick fox jumps")],
        "doc_id long, text string",
    )
    model = LM.ngram_counts(docs.where("doc_id = 0"), n=2)
    out = LM.perplexity_buckets(LM.perplexity_scores(docs, model, n=2))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["n_scored"] == 0
    assert rows[1]["log10_ppl"] is None and rows[1]["ppl"] is None
    assert rows[1]["ppl_bucket"] == "tail"
    assert rows[0]["ppl_bucket"] != "tail" or rows[2]["ppl_bucket"] != "tail"
