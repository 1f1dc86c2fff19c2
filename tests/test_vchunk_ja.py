"""JA columnar chunker / fused parity: chunk_arrays_ja and the SOV
branch of fused_batch must equal the row-wise spec (chunk_sentence_ja +
doc_triples) row for row — fixtures, randomized token streams, raw and
pre-segmented input. Pure-pandas tests (no Spark session) except the
final dispatch check."""

import random

import numpy as np
import pandas as pd
import pytest

from naruhodo_spark import lang as L
from naruhodo_spark import schemas as S
from naruhodo_spark.operators import vchunk as V
from naruhodo_spark.operators.chunk import chunk_sentence_ja
from naruhodo_spark.operators.fused import _COLS, doc_triples

PROF = L.get_profile("ja")
STOP = set(PROF.get("stop_mains", ()))

FIXTURES = [
    "彼女 は 本 を 読んだ 。",
    "太郎 が 花子 に 手紙 を 渡した 。",
    "それ は 古い 寺 だ 。",
    "彼女は本を読んだ",            # raw
    "太郎が花子に手紙を渡した",      # raw
    "それは古い寺だ",              # raw
    "ここで彼がアメリカから来た",     # raw, pronoun + katakana
    "が は を",                   # particles only: first emits as noun
    "読まない",                    # negation suffix
    "本 が 盗まれた",               # passive
    "する こと",                   # stop mains (light verbs)
    "",                           # empty sentence
]


def _spec_frame(sents):
    rows = []
    for seg, s in enumerate(sents):
        for c in chunk_sentence_ja(s, PROF):
            rows.append(
                (seg, c["chunk_id"], c["parent"], c["surface"], c["main"],
                 c["func"], c["ctype"], c["ne_type"], c["pro"],
                 c["negative"], c["passive"], c["tense"])
            )
    cols = ["seg", "chunk_id", "parent", "surface", "main", "func",
            "ctype", "ne_type", "pro", "negative", "passive", "tense"]
    return pd.DataFrame(rows, columns=cols)


def _assert_chunk_parity(sents):
    seg = np.arange(len(sents))
    got = V.chunk_arrays_ja(seg, pd.Series(sents, dtype=object), PROF)
    want = _spec_frame(sents)
    got = got[want.columns].reset_index(drop=True)
    assert len(got) == len(want), f"{len(got)} vs {len(want)} chunks"
    for col in want.columns:
        a = got[col].tolist()
        b = want[col].tolist()
        assert a == b, f"column {col}: {a[:8]} vs {b[:8]}"


def test_fixture_parity():
    _assert_chunk_parity(FIXTURES)


def _random_sentences(n, seed, presegmented):
    rng = random.Random(seed)
    vocab = (
        list(L.JA_CASE_PARTICLES)
        + list(L.JA_PRON)
        + list(L.JA_STOP_MAINS)
        + ["太郎", "花子", "本", "手紙", "寺", "読んだ", "渡した", "来た",
           "盗まれた", "読まない", "食べられる", "アメリカ", "東京",
           "古い", "だ", "です", "ず", "せぬ"]
    )
    sents = []
    for _ in range(n):
        k = rng.randint(0, 9)
        toks = [rng.choice(vocab) for _ in range(k)]
        sents.append(" ".join(toks) if presegmented else "".join(toks))
    return sents


def test_randomized_presegmented_parity():
    _assert_chunk_parity(_random_sentences(300, seed=7, presegmented=True))


def test_randomized_raw_parity():
    """Raw concatenations: both paths run the same segmenter, so parity
    checks the columnar chunking, not segmentation quality."""
    _assert_chunk_parity(_random_sentences(300, seed=13, presegmented=False))


def _docs_pdf(texts, prefix="jad"):
    return pd.DataFrame(
        {
            "doc_id": [f"{prefix}-{i:03d}" for i in range(len(texts))],
            "spans": [
                [{"kind": "text", "text": t, "media_ref": "", "offset": 0}]
                for t in texts
            ],
        }
    )


def test_fused_batch_parity():
    texts = [
        "彼女は本を読んだ。太郎が来た。",
        "それは古い寺だ。彼は本を渡した。",   # carryover + pronoun
        "太郎 が 花子 に 手紙 を 渡した 。",
        "",
    ] + ["。".join(_random_sentences(3, seed=i, presegmented=False))
         for i in range(40)]
    pdf = _docs_pdf(texts)
    got = V.fused_batch(pdf, PROF, STOP, None)
    want_rows = []
    for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
        want_rows.extend(doc_triples(doc_id, spans, PROF, STOP))
    want = pd.DataFrame(want_rows, columns=_COLS)
    assert len(got) == len(want)
    norm = lambda v: "∅" if pd.isna(v) else float(v) if isinstance(
        v, (int, float, np.integer, np.floating)
    ) and not isinstance(v, bool) else v
    for col in _COLS:
        a = [norm(v) for v in got[col].tolist()]
        b = [norm(v) for v in want[col].tolist()]
        assert a == b, f"column {col}: {a[:6]} vs {b[:6]}"


def test_spark_dispatch_uses_columnar_ja(spark):
    """chunk_sentences / build_kg route JA through the vectorized path
    and still match the row-wise plan end to end."""
    from naruhodo_spark.operators.chunk import chunk_sentences
    from naruhodo_spark.operators.normalize import split_sentences

    rows = [
        (f"ja-{i:03d}",
         [{"kind": "text", "text": t, "media_ref": "", "offset": 0}])
        for i, t in enumerate(
            ["彼女は本を読んだ。", "太郎 が 花子 に 手紙 を 渡した 。"]
        )
    ]
    docs = spark.createDataFrame(rows, schema=S.DOCUMENTS_SPANS)
    sents = split_sentences(docs, PROF)
    vec = chunk_sentences(sents, PROF, vectorized=True).collect()
    row = chunk_sentences(sents, PROF, vectorized=False).collect()
    key = lambda r: (r["doc_id"], r["sent_id"], r["chunk_id"])
    assert sorted(map(tuple, vec)) == sorted(map(tuple, row))
    assert len(vec) > 0
