"""Unigram-LM tokenizer (ops/unigram.py): exact pure-python mirror of
seed→EM→prune (independent Counter-based implementation), coverage and
determinism properties, compression sanity vs characters, and the
distinct-words-only Python plan shape."""

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from naruhodo_spark.ops import unigram as U

TEXTS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "a cat and a dog sat",
    "dogs and cats and dogs",
    "the dog sat on a log",
    "low lower lowest low low",
]


def _docs(spark, texts=TEXTS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ---------------------------------------------------------------- mirror


def _norm(t):
    return re.sub(r"\s+", " ", t.strip().lower())


def _py_word_counts(texts):
    c = Counter()
    for t in texts:
        for w in _norm(t).split(" "):
            if w:
                c[w] += 1
    return dict(c)


def _py_seed(words, max_len, seed_size):
    freq = Counter()
    for w, c in words.items():
        for i in range(len(w)):
            for ln in range(1, min(max_len, len(w) - i) + 1):
                freq[w[i:i + ln]] += c
    chars = [(p, f) for p, f in freq.items() if len(p) == 1]
    multi = sorted(
        ((p, f) for p, f in freq.items() if len(p) > 1),
        key=lambda pf: (-pf[1], pf[0]),
    )[:seed_size]
    return chars + multi


def _py_viterbi(word, logp, max_len):
    n = len(word)
    best = [None] * (n + 1)
    best[0] = (0.0, 0, "", 0)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            if best[j] is None:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                continue
            cand = (best[j][0] + lp, best[j][1] + 1, piece, j)
            cur = best[i]
            if (
                cur is None
                or cand[0] > cur[0] + 1e-12
                or (
                    abs(cand[0] - cur[0]) <= 1e-12
                    and (cand[1] < cur[1]
                         or (cand[1] == cur[1] and cand[2] < cur[2]))
                )
            ):
                best[i] = cand
    out, i = [], n
    while i > 0:
        _, _, piece, j = best[i]
        out.append(piece)
        i = j
    return list(reversed(out))


def _py_train(texts, vocab_size, iters, max_len, seed_size):
    words = _py_word_counts(texts)
    seed = _py_seed(words, max_len, seed_size)

    def logprobs(counts):
        total = sum(c for _, c in counts)
        return {p: math.log(c / total) for p, c in counts if c > 0}

    logp = logprobs(seed)
    n_multi = sum(1 for p, _ in seed if len(p) > 1)
    for it in range(iters):
        cnt = Counter()
        for w, c in words.items():
            for piece in _py_viterbi(w, logp, max_len):
                cnt[piece] += c
        frac = (it + 1) / iters
        keep_k = max(vocab_size, int(n_multi - frac * (n_multi - vocab_size)))
        chars = [(p, c) for p, c in cnt.items() if len(p) == 1]
        multi = sorted(
            ((p, c) for p, c in cnt.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )[:keep_k]
        seen = {p for p, _ in chars}
        chars += [(p, 1) for p, _ in seed if len(p) == 1 and p not in seen]
        logp = logprobs(chars + multi)
    return sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))


# ----------------------------------------------------------------- tests


def test_train_matches_python_mirror(spark):
    got = U.train_unigram(
        _docs(spark), vocab_size=20, iters=3, max_piece_len=4, seed_size=50
    )
    want = _py_train(TEXTS, 20, 3, 4, 50)
    assert [p for p, _ in got] == [p for p, _ in want]
    for (gp, gl), (wp, wl) in zip(got, want):
        assert gl == pytest.approx(wl, abs=1e-12), gp


def test_seed_includes_all_chars_and_respects_window(spark):
    words = U.word_counts(_docs(spark))
    seed = dict(U.seed_vocab(words, max_piece_len=3, seed_size=10))
    corpus_chars = set("".join(_py_word_counts(TEXTS)))
    assert corpus_chars <= {p for p in seed if len(p) == 1}
    assert all(len(p) <= 3 for p in seed)
    assert sum(1 for p in seed if len(p) > 1) == 10


def test_encode_covers_every_word_roundtrip(spark):
    pieces = U.train_unigram(
        _docs(spark), vocab_size=15, iters=2, max_piece_len=4, seed_size=40
    )
    enc = {r["doc_id"]: r for r in U.unigram_encode(_docs(spark), pieces).collect()}
    for i, t in enumerate(TEXTS):
        joined = "".join(enc[i]["pieces"])
        assert joined == _norm(t).replace(" ", "")
        assert enc[i]["n_pieces"] == len(enc[i]["pieces"])


def test_encode_compresses_vs_chars(spark):
    pieces = U.train_unigram(
        _docs(spark), vocab_size=20, iters=3, max_piece_len=4, seed_size=50
    )
    enc = U.unigram_encode(_docs(spark), pieces)
    n_pieces = enc.agg(F.sum("n_pieces")).head()[0]
    n_chars = sum(len(_norm(t).replace(" ", "")) for t in TEXTS)
    assert n_pieces < n_chars  # multi-char pieces actually used


def test_empty_doc_keeps_row(spark):
    pieces = U.train_unigram(_docs(spark), vocab_size=10, iters=1,
                             max_piece_len=3, seed_size=20)
    docs = spark.createDataFrame(
        [(0, "the cat"), (1, "   ")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in U.unigram_encode(docs, pieces).collect()}
    assert rows[1]["pieces"] == [] and rows[1]["n_pieces"] == 0
    assert rows[0]["n_pieces"] > 0


def test_determinism_across_partitionings(spark):
    d1 = _docs(spark).repartition(1)
    d13 = _docs(spark).repartition(13)
    p1 = U.train_unigram(d1, vocab_size=15, iters=2, max_piece_len=4,
                         seed_size=40)
    p13 = U.train_unigram(d13, vocab_size=15, iters=2, max_piece_len=4,
                          seed_size=40)
    assert p1 == p13


def test_python_only_touches_distinct_words(spark):
    """The corpus-side reassembly must be JVM-only: the single
    mapInPandas in the encode plan reads the distinct-word frame, so
    exactly one Arrow node appears (no corpus-sized Python)."""
    pieces = U.train_unigram(_docs(spark), vocab_size=10, iters=1,
                             max_piece_len=3, seed_size=20)
    plan = U.unigram_encode(_docs(spark), pieces)._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("MapInPandas") == 1
