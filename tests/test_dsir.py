"""DSIR importance scoring (ops/dsir.py): exact Python md5 mirror of the
fit+score pipeline on the real sf0.01 documents, a planted two-domain
discrimination property, and the deterministic quantile selection."""

import hashlib
import math
import re

import pytest

from naruhodo_spark.ops import dsir as DS

SF = "/root/testdata/sf0.01"
B = 512  # small feature space so the smoothing term actually matters


def _toks(text):
    t = re.sub(r"\s+", " ", text.lower()).strip()
    return [x for x in t.split(" ") if x != ""]


def _bucket(gram, n_buckets, seed="dsir"):
    h = hashlib.md5(f"{seed}|{gram}".encode()).hexdigest()[:12]
    return int(h, 16) % n_buckets


def _features(text, n_buckets):
    tk = _toks(text)
    grams = tk + [f"{a} {b}" for a, b in zip(tk, tk[1:])]
    return [_bucket(g, n_buckets) for g in grams]


def _py_dsir(target_rows, raw_rows, all_rows, n_buckets):
    ct, cr = {}, {}
    tt = tr = 0
    for _, text in target_rows:
        for b in _features(text, n_buckets):
            ct[b] = ct.get(b, 0) + 1
            tt += 1
    for _, text in raw_rows:
        for b in _features(text, n_buckets):
            cr[b] = cr.get(b, 0) + 1
            tr += 1
    # the fitted model is DENSE: every bucket carries its smoothed ratio
    lr = {
        b: math.log(
            ((ct.get(b, 0) + 1) / (tt + n_buckets))
            / ((cr.get(b, 0) + 1) / (tr + n_buckets))
        )
        for b in range(n_buckets)
    }
    out = {}
    for d, text in all_rows:
        feats = _features(text, n_buckets)
        out[d] = (sum(lr[b] for b in feats), len(feats))
    return out


def test_dsir_matches_python_mirror_on_sf001(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    target = docs.where("doc_id % 5 = 0")
    lr = DS.dsir_log_ratios(target, docs, n_buckets=B)
    got = {
        r["doc_id"]: (r["dsir_score"], r["n_features"])
        for r in DS.dsir_scores(docs, lr, n_buckets=B).collect()
    }
    rows = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
    want = _py_dsir(
        [(d, t) for d, t in rows if d % 5 == 0], rows, rows, B
    )
    assert set(got) == set(want)
    for d in want:
        assert got[d][1] == want[d][1], f"n_features doc {d}"
        assert got[d][0] == pytest.approx(want[d][0], rel=1e-9), f"score doc {d}"


def test_dsir_discriminates_planted_domains(spark):
    # target speaks vocab A; raw is a 50/50 mix — every A-doc must
    # outscore every B-doc
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b = "uno dos tres cuatro cinco seis siete ocho nueve diez"
    rows = [(i, a if i < 10 else b) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(rows[:5], "doc_id long, text string")
    lr = DS.dsir_log_ratios(target, docs, n_buckets=B)
    got = {
        r["doc_id"]: r["dsir_score"]
        for r in DS.dsir_scores(docs, lr, n_buckets=B).collect()
    }
    assert min(got[d] for d in range(10)) > max(got[d] for d in range(10, 20))


def test_dsir_select_rate_and_score_preference(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    target = docs.where("doc_id % 5 = 0")
    lr = DS.dsir_log_ratios(target, docs, n_buckets=B)
    scored = DS.dsir_scores(docs, lr, n_buckets=B)
    kept = DS.dsir_select(scored, rate=0.2)
    n, k = scored.count(), kept.count()
    assert abs(k - 0.2 * n) <= 0.05 * n  # quantile cut lands near rate
    # kept docs dominate: the lowest kept score >= the highest dropped
    # score is too strong under tie-break, but mean-kept > mean-all holds
    mean_all = scored.agg({"dsir_score": "avg"}).collect()[0][0]
    mean_kept = kept.agg({"dsir_score": "avg"}).collect()[0][0]
    assert mean_kept > mean_all
    # determinism: second evaluation identical
    again = DS.dsir_select(scored, rate=0.2)
    assert kept.exceptAll(again).count() == 0 and again.exceptAll(kept).count() == 0


def test_dsir_scores_unseen_corpus_gets_smoothed_contribution(spark):
    # fit on A/B, score corpus C whose grams appear in NEITHER fitting
    # corpus: every feature must still contribute the smoothed default
    # ratio (dense model) — not silently vanish from the join
    fit = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    c = spark.createDataFrame(
        [(10, "totally novel words here")], "doc_id long, text string"
    )
    lr = DS.dsir_log_ratios(fit, fit, n_buckets=B)
    got = DS.dsir_scores(c, lr, n_buckets=B).collect()[0]
    assert got["n_features"] == 7  # 4 unigrams + 3 bigrams — none dropped
    rows = [(r["doc_id"], r["text"]) for r in fit.collect()]
    want = _py_dsir(rows, rows, [(10, "totally novel words here")], B)
    assert got["dsir_score"] == pytest.approx(want[10][0], rel=1e-9)


def test_dsir_select_plateau_realizes_rate(spark):
    # half the corpus ties at one score: the residual tie-break must
    # realize ≈rate overall, not keep rate-fraction of the whole plateau
    rows = [(i, 1.0 if i < 500 else 0.0) for i in range(1000)]
    scored = spark.createDataFrame(rows, "doc_id long, dsir_score double")
    kept = DS.dsir_select(scored, rate=0.6)
    k = kept.count()
    assert abs(k - 600) <= 40  # 500 high + ≈100 of the 0.0 plateau
    assert kept.where("dsir_score = 1.0").count() == 500


def test_dsir_select_empty_input_is_empty_not_crash(spark):
    scored = spark.createDataFrame([], "doc_id long, dsir_score double")
    assert DS.dsir_select(scored, rate=0.5).count() == 0


def test_dsir_select_rejects_bad_rate(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with pytest.raises(ValueError):
        DS.dsir_select(docs.selectExpr("doc_id", "0.0 AS dsir_score"), 0.0)


def test_dsir_empty_docs_score_zero(spark):
    rows = [(0, "alpha beta"), (1, ""), (2, "   ")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    lr = DS.dsir_log_ratios(docs, docs, n_buckets=B)
    got = {
        r["doc_id"]: (r["dsir_score"], r["n_features"])
        for r in DS.dsir_scores(docs, lr, n_buckets=B).collect()
    }
    assert got[1] == (0.0, 0) and got[2] == (0.0, 0)
    assert got[0][1] == 3  # 2 unigrams + 1 bigram
