"""Parity suite: the columnar batch chunker / fused extractor
(operators/vchunk.py) must be ROW-IDENTICAL to the per-sentence /
per-document executable spec (operators/chunk.py, operators/fused.py)
on every corpus — golden synth, real testdata, and adversarial
randomized sentences exercising every state-machine transition
(buffer attachment, conj resets, dangling tails, punctuation-only
tokens, empty sentences, NUL-sentinel fallback)."""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pytest

from naruhodo_spark import lang as L
from naruhodo_spark.operators import vchunk as V
from naruhodo_spark.operators.chunk import chunk_sentence_en
from naruhodo_spark.operators.fused import _COLS, doc_triples, split_doc_sentences

PROF = L.get_profile("en")
STOP = set(PROF.get("stop_mains", ()))


def _ref_chunks(sents):
    rows = []
    for doc_id, sid, s in sents:
        for c in chunk_sentence_en(s, PROF):
            rows.append(
                (doc_id, int(sid), c["chunk_id"], c["parent"], c["surface"],
                 c["main"], c["func"], c["ctype"], c["ne_type"], c["pro"],
                 c["negative"], c["passive"], c["tense"])
            )
    return pd.DataFrame(
        rows,
        columns=["doc_id", "sent_id", "chunk_id", "parent", "surface", "main",
                 "func", "ctype", "ne_type", "pro", "negative", "passive",
                 "tense"],
    )


def _assert_chunks_equal(sents):
    sdf = pd.DataFrame(sents, columns=["doc_id", "sent_id", "sentence"])
    vec = V.chunk_batch(sdf, PROF).reset_index(drop=True)
    ref = _ref_chunks(sents).reset_index(drop=True)
    assert len(vec) == len(ref)
    pd.testing.assert_frame_equal(
        ref.astype(str), vec.astype(str), check_dtype=False
    )


def _norm_triples(df):
    df = df.copy().reset_index(drop=True)
    for c in ["pred_id", "subj_id", "obj_id", "subj_ne", "obj_ne",
              "subj_pro", "obj_pro", "sent_id"]:
        df[c] = pd.to_numeric(df[c], errors="coerce").astype("float64")
    df["doc_id"] = df["doc_id"].astype(str)
    return df


def _assert_fused_equal(pdf, canon=None):
    vec = V.fused_batch_en(pdf, PROF, STOP, canon)
    rows = []
    for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
        rows.extend(doc_triples(doc_id, spans, PROF, STOP))
    if canon is None:
        ref = pd.DataFrame(rows, columns=_COLS)
        cols = _COLS
    else:
        # row-wise linking mirror (fused.extract_triples_fused body)
        linked = []
        for r in rows:
            subj, obj, subj_ne, obj_ne = r[4], r[6], r[11], r[12]
            subj_canon = obj_canon = None
            if subj is not None:
                subj_canon = subj.lower()
                hit = canon.get(subj_canon)
                if hit is not None:
                    subj_canon = hit[0]
                    if hit[1] is not None:
                        subj_ne = hit[1]
            if obj is not None:
                obj_canon = obj.lower()
                hit = canon.get(obj_canon)
                if hit is not None:
                    obj_canon = hit[0]
                    if hit[1] is not None:
                        obj_ne = hit[1]
            linked.append(r + (subj_ne, obj_ne, subj_canon, obj_canon))
        cols = _COLS + ["subj_ne_linked", "obj_ne_linked", "subj_canon",
                        "obj_canon"]
        ref = pd.DataFrame(linked, columns=cols)
    a, b = _norm_triples(ref), _norm_triples(vec[cols])
    for c in ("subj", "obj", "subj_canon", "obj_canon"):
        if c in a.columns:
            a[c] = a[c].astype(object).where(a[c].notna(), None)
            b[c] = b[c].astype(object).where(b[c].notna(), None)
    pd.testing.assert_frame_equal(
        a.astype(str), b.astype(str), check_dtype=False
    )


def _spans(text):
    return [{"kind": "text", "text": text, "media_ref": None, "offset": 0}]


@pytest.fixture(scope="module")
def testdata_pdf():
    import pyarrow.parquet as pq

    tbl = pq.read_table("/root/testdata/sf0.01/documents.parquet").to_pandas()
    return pd.DataFrame(
        {
            "doc_id": tbl["doc_id"].astype(str),
            "spans": [_spans(t) for t in tbl["text"]],
        }
    )


def test_chunk_parity_testdata(testdata_pdf):
    sents = []
    for doc_id, spans in zip(testdata_pdf["doc_id"], testdata_pdf["spans"]):
        for sid, s in split_doc_sentences(spans, PROF):
            sents.append((doc_id, sid, s))
    _assert_chunks_equal(sents)


def test_fused_parity_testdata(testdata_pdf):
    _assert_fused_equal(testdata_pdf)


def test_fused_parity_with_canon(testdata_pdf):
    canon = {
        "query": ("QUERY", 3), "window": ("win", None), "alice": ("alice#1", 1),
    }
    _assert_fused_equal(testdata_pdf, canon)


def test_fused_parity_synth_corpus(spark):
    from naruhodo_spark import synth

    docs = synth.synth_documents(spark, 150).toPandas()
    _assert_fused_equal(docs)


# ------------------------------------------------------------------
# Adversarial randomized sentences: draw from every token class so the
# buffering/reset/tail transitions all fire, plus degenerate shapes.
# ------------------------------------------------------------------
_VOCAB = (
    L.EN_DETERMINERS + L.EN_ADJECTIVES + L.EN_AUX + L.EN_NEGATIONS
    + L.EN_PREPOSITIONS + L.EN_CONJUNCTIONS + list(L.EN_VERB_FORMS)[:10]
    + ["walked", "zed"] + L.EN_PERSONS[:4] + L.EN_LOCATIONS[:3]
    + L.EN_PRON_PERSONAL[:3] + L.EN_PRON_DEMONSTRATIVE[:2]
    + L.EN_PRON_LOCATIVE + L.EN_THINGS[:4] + ["thing", "...", "!!", "(x)"]
)

_EDGE_SENTENCES = [
    "",
    "...",
    "the",
    "the big",
    "is not",
    "the big is not",
    "in",
    "in of at",
    "and",
    "and and and",
    "the castle is ancient",
    "alice visited the old bridge and bob",
    "not praised",
    "he saw it there",
    "was not seen by alice",
    "big the and old bob",
    "in the park alice walked",
    "alice and",
    "bob the",
    "\x00",
    "a \x00 b",
]


def test_chunk_parity_edge_sentences():
    sents = [("d0", i, s) for i, s in enumerate(_EDGE_SENTENCES)]
    _assert_chunks_equal(sents)


def test_chunk_parity_randomized():
    rng = random.Random(42)
    sents = []
    for i in range(800):
        n = rng.randint(0, 14)
        sents.append(
            ("d%d" % (i % 50), i, " ".join(rng.choice(_VOCAB) for _ in range(n)))
        )
    _assert_chunks_equal(sents)


def test_fused_parity_randomized_docs():
    rng = random.Random(7)
    docs = []
    for d in range(120):
        n_sent = rng.randint(0, 5)
        text = ". ".join(
            " ".join(rng.choice(_VOCAB) for _ in range(rng.randint(0, 12)))
            for _ in range(n_sent)
        )
        docs.append(("doc%03d" % d, _spans(text)))
    pdf = pd.DataFrame(docs, columns=["doc_id", "spans"])
    _assert_fused_equal(pdf)
    _assert_fused_equal(pdf, {"alice": ("ALICE", 1), "tokyo": ("TOKYO", None)})


def test_fused_empty_batch():
    pdf = pd.DataFrame({"doc_id": pd.Series([], dtype=object),
                        "spans": pd.Series([], dtype=object)})
    out = V.fused_batch_en(pdf, PROF, STOP, None)
    assert len(out) == 0 and list(out.columns) == _COLS


def test_fused_media_only_doc():
    pdf = pd.DataFrame(
        {
            "doc_id": ["m1"],
            "spans": [[{"kind": "media", "text": None,
                        "media_ref": "img://1", "offset": 0}]],
        }
    )
    assert len(V.fused_batch_en(pdf, PROF, STOP, None)) == 0


def test_unicode_whitespace_fused_equals_relational(spark):
    """U+3000 / NBSP inside spans: the Python mirrors must use Java-\\s
    (ASCII) semantics like the Catalyst normalize path, or the fused and
    relational plans diverge on Japanese/web text (review finding)."""
    from naruhodo_spark import lang as L
    from naruhodo_spark import schemas as S
    from naruhodo_spark.operators.fused import extract_triples_fused
    from naruhodo_spark.pipeline import extract_document_triples

    texts = [
        "alice　visited bob.",          # ideographic space
        "carol praised dave. erin waved.",  # NBSP
        "　",                            # whitespace-only (U+3000)
        "frank  moved\tto tokyo.",           # ASCII ws mix (control)
    ]
    rows = [
        (f"u{i}", [{"kind": "text", "text": t, "media_ref": "", "offset": 0}])
        for i, t in enumerate(texts)
    ]
    docs = spark.createDataFrame(rows, schema=S.DOCUMENTS_SPANS)
    prof = L.get_profile("en")
    cols = ["doc_id", "sent_id", "pred_id", "pred", "subj", "obj",
            "negative", "passive", "tense"]
    a = extract_triples_fused(docs, prof).select(cols)
    b = extract_document_triples(docs, prof, triple_plan="relational")[
        "triples"
    ].select(cols)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    # the relational sentences table agrees with the fused mirror too
    from naruhodo_spark.operators.normalize import split_sentences

    sents = {(r["doc_id"], r["sent_id"], r["sentence"])
             for r in split_sentences(docs, prof).collect()}
    from naruhodo_spark.operators.fused import split_doc_sentences

    mirror = set()
    for doc_id, spans in rows:
        for sid, sent in split_doc_sentences(spans, prof):
            mirror.add((doc_id, sid, sent))
    assert sents == mirror


def test_conjunction_flush_parity_randomized():
    """600 random token salads dense in conjunctions/mods/aux: columnar
    chunker ≡ spec including the flush-at-conjunction path (review
    finding: the old reset dropped buffered predicate adjectives)."""
    import numpy as np
    import pandas as pd

    from naruhodo_spark import lang as L
    from naruhodo_spark.operators.chunk import chunk_sentence_en
    from naruhodo_spark.operators.vchunk import chunk_arrays_en

    prof = L.get_profile("en")
    rng = np.random.default_rng(17)
    vocab = (
        ["but", "and", "or", "is", "was", "not", "the", "a", "ancient",
         "quiet", "big", "to", "in"]
        + ["alice", "bob", "castle", "garden", "visited", "praised", "ran"]
    )
    sents = [
        " ".join(vocab[int(rng.integers(len(vocab)))]
                 for _ in range(int(rng.integers(1, 12))))
        for _ in range(600)
    ]
    df = chunk_arrays_en(np.arange(len(sents)), pd.Series(sents), prof)
    cols = ["chunk_id", "parent", "surface", "main", "func", "ctype",
            "negative", "passive", "tense"]
    for i, s_ in enumerate(sents):
        want = [
            tuple(str(c[k]) for k in cols) for c in chunk_sentence_en(s_, prof)
        ]
        got = [
            tuple(map(str, r))
            for r in df[df["seg"] == i].sort_values("chunk_id")[cols]
            .itertuples(index=False)
        ]
        assert got == want, (i, s_)
