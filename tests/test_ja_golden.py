"""JA golden corpus (VERDICT r02 next-round #4): the 3-sentence JA demo
becomes a 120-sentence synthetic corpus with AUTHORED gold token
boundaries (naruhodo_spark.synth.ja_golden_corpus — the same
regenerable-golden policy the EN corpus uses). Pins:

1. segment_ja reproduces every gold segmentation exactly — including
   the particle-prefixed hiragana nouns (にわとり-class) the r03
   lexicon growth targets;
2. the full RAW-JA Spark pipeline (build_kg under the ja profile)
   reaches P/R ≥ 0.95 on (subj, pred, obj, negative, passive) triples
   vs the pre-segmented row-wise spec (chunk_sentence_ja +
   triples_from_chunklist) — the driver metric's gate [B BASELINE.json:2];
3. raw input ≡ pre-segmented input through the engine, row for row.
"""

from collections import Counter

from naruhodo_spark import lang as L
from naruhodo_spark import synth
from naruhodo_spark.operators.chunk import chunk_sentence_ja
from naruhodo_spark.operators.jaseg import segment_ja
from naruhodo_spark.operators.triples import triples_from_chunklist
from naruhodo_spark.pipeline import build_kg

PROF = L.get_profile("ja")


def test_gold_segmentations_exact():
    corpus = synth.ja_golden_corpus(120)
    assert len(corpus) == 120
    for raw, gold in corpus:
        assert segment_ja(raw, PROF) == gold, raw
    # the particle-prefixed mis-split classes are actually represented
    text = "".join(r for r, _ in corpus)
    assert any(w in text for w in ("にわとり", "はなし", "ともだち"))


def _expected_triples() -> Counter:
    """Pre-segmented row-wise spec over the gold tokens, with the O14
    subject-carryover mirrored per doc (a predicate with no attached
    subject inherits the nearest preceding one — single-sentence docs,
    so carryover never crosses documents)."""
    stop = set(PROF.get("stop_mains", ()))
    exp: Counter = Counter()
    for i, (_, gold) in enumerate(synth.ja_golden_corpus(120)):
        chunks = chunk_sentence_ja(" ".join(gold), PROF)
        for c in chunks:
            c["doc_id"], c["sent_id"] = f"ja-{i:04d}", 0
        carried = None
        for (_d, _s, _pid, pred, subj, _sc, obj, _oc, neg, pas, _t) in (
            triples_from_chunklist(chunks, "sov", stop)
        ):
            if subj is None and carried is not None:
                subj = carried
            if subj is not None:
                carried = subj
            exp[(subj, pred, obj, neg, pas)] += 1
    return exp


def _pr(emitted: Counter, expected: Counter):
    tp = sum(min(n, expected[k]) for k, n in emitted.items())
    p = tp / max(sum(emitted.values()), 1)
    r = tp / max(sum(expected.values()), 1)
    return p, r


def test_raw_ja_pipeline_pr_gate(spark):
    docs = synth.ja_golden_documents(spark, 120)
    got = Counter(
        (r["subj"], r["pred"], r["obj"], r["negative"], r["passive"])
        for r in build_kg(docs, prof=PROF)["triples"].collect()
    )
    exp = _expected_triples()
    assert sum(exp.values()) >= 100  # every sentence contributes
    p, r = _pr(got, exp)
    assert p >= 0.95 and r >= 0.95, (p, r)


def test_raw_equals_presegmented_through_engine(spark):
    raw = build_kg(
        synth.ja_golden_documents(spark, 120), prof=PROF
    )["triples"].drop("doc_id")
    seg = build_kg(
        synth.ja_golden_documents(spark, 120, segmented=True), prof=PROF
    )["triples"].drop("doc_id")
    assert raw.exceptAll(seg).isEmpty() and seg.exceptAll(raw).isEmpty()


# ---------------------------------------------------------------------
# Multi-sentence JA goldens (VERDICT r03 next-round #4): O13 pronoun
# resolution (彼/それ/あそこ classes, discriminating via the r04 JA NE
# gazetteer) and O14 subject carryover ACROSS sentence boundaries.
# ---------------------------------------------------------------------

import naruhodo_spark.schemas as S

N_MULTI = 48  # r05: 8 templates (M6/M7 exercise the new lexicon classes)


def test_gold_multi_segmentations_exact():
    corpus = synth.ja_golden_multi_corpus(N_MULTI)
    assert len(corpus) == N_MULTI
    for raw, sents in corpus:
        assert len(sents) >= 2  # every doc is multi-sentence
        # raw text round-trips: sentence split on 。 + segment_ja
        raws = [s for s in raw.split("。") if s]
        assert len(raws) == len(sents)
        for rs, gold in zip(raws, sents):
            assert segment_ja(rs, PROF) == gold, rs
    # r05 corpus-size gate (VERDICT r04 #5): ≥200 authored gold
    # sentences across the single-sentence and multi-sentence corpora
    n_multi_sents = sum(len(sents) for _, sents in corpus)
    assert 120 + n_multi_sents >= 200, n_multi_sents


def _expected_multi_triples() -> Counter:
    """Row-wise spec: chunk each sentence, mirror resolve_pronouns'
    class rules (nearest preceding PERSON / non-person / LOCATION with
    nearest-any fallback), swap resolutions into subj/obj, then the O14
    carryover — all in document (sent_id, chunk_id) order."""
    stop = set(PROF.get("stop_mains", ()))
    exp: Counter = Counter()
    for i, (_raw, sents) in enumerate(synth.ja_golden_multi_corpus(N_MULTI)):
        doc = f"jam-{i:04d}"
        all_chunks = []
        for sid, toks in enumerate(sents):
            chunks = chunk_sentence_ja(" ".join(toks), PROF)
            for c in chunks:
                c["doc_id"], c["sent_id"] = doc, sid
            all_chunks.append(chunks)
        res = {}
        last_p = last_np = last_loc = last_any = None
        for sid, chunks in enumerate(all_chunks):
            for c in chunks:
                if c["ctype"] not in (S.CTYPE_NOUN, S.CTYPE_PRONOUN):
                    continue
                if c["pro"] == S.PRO_NONE:
                    res[(sid, c["chunk_id"])] = c["main"]
                    last_any = c["main"]
                    if c["ne_type"] == S.ETYPE_PERSON:
                        last_p = c["main"]
                    else:
                        last_np = c["main"]
                    if c["ne_type"] == S.ETYPE_LOCATION:
                        last_loc = c["main"]
                else:
                    if c["pro"] == S.PRO_PERSONAL:
                        a = last_p if last_p is not None else last_any
                    elif c["pro"] == S.PRO_DEMONSTRATIVE:
                        a = last_np if last_np is not None else last_any
                    else:
                        a = last_loc if last_loc is not None else last_any
                    res[(sid, c["chunk_id"])] = a if a is not None else c["main"]
        carried = None
        for sid, chunks in enumerate(all_chunks):
            for (_d, _s, _pid, pred, subj, sc, obj, oc, neg, pas, _t) in (
                triples_from_chunklist(chunks, "sov", stop)
            ):
                if subj is not None:
                    subj = res.get((sid, sc), subj)
                if obj is not None:
                    obj = res.get((sid, oc), obj)
                if subj is None and carried is not None:
                    subj = carried
                if subj is not None:
                    carried = subj
                exp[(subj, pred, obj, neg, pas)] += 1
    return exp


def test_multi_sentence_pipeline_pr_gate(spark):
    docs = synth.ja_golden_multi_documents(spark, N_MULTI)
    got = Counter(
        (r["subj"], r["pred"], r["obj"], r["negative"], r["passive"])
        for r in build_kg(docs, prof=PROF)["triples"].collect()
    )
    exp = _expected_multi_triples()
    assert sum(exp.values()) >= 2 * N_MULTI  # >= 2 triples per doc
    p, r = _pr(got, exp)
    assert p >= 0.95 and r >= 0.95, (p, r)


def test_pronoun_classes_discriminate(spark):
    """The planted discrimination cases, asserted directly on engine
    output (not via the mirror): 彼 skips a nearer non-person entity to
    reach the PERSON antecedent (M4); それ skips a nearer PERSON to
    reach the non-person one (M5)."""
    docs = synth.ja_golden_multi_documents(spark, N_MULTI)
    rows = build_kg(docs, prof=PROF)["triples"].collect()
    by_doc: dict[str, set] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(
            (r["subj"], r["pred"], r["obj"])
        )
    corpus = synth.ja_golden_multi_corpus(N_MULTI)
    checked_m4 = checked_m5 = checked_m6 = checked_m7 = 0
    for i, (_raw, sents) in enumerate(corpus):
        doc, t = f"jam-{i:04d}", i % 8
        got = by_doc.get(doc, set())
        if t == 4:
            s, (o3, v3) = sents[0][0], (sents[2][2], sents[2][4])
            assert (s, v3, o3) in got, (doc, got)
            assert not any(su == "彼" for su, _p, _o in got), doc
            checked_m4 += 1
        elif t == 5:
            o, s = sents[0][0], sents[0][2]
            cop = sents[1][2]
            assert (o, "だ", cop) in got or (o, "だ", None) in got, (doc, got)
            assert not any(su in ("それ", s) and p == "だ"
                           for su, p, _o in got), (doc, got)
            checked_m5 += 1
        elif t == 2:
            # O14 across sentences: the subject-less 2nd sentence
            # inherits sentence 1's subject
            s, (o2, v2) = sents[0][0], (sents[1][0], sents[1][2])
            assert (s, v2, o2) in got, (doc, got)
        elif t == 6:
            # r05 rule 2a: the kanji-abutting STRONG noun split off its
            # prefix and carried the を case into the object slot
            s, strong, v = sents[0][0], sents[0][3], sents[0][5]
            assert (s, v, strong) in got, (doc, got)
            checked_m6 += 1
        elif t == 7:
            # r05 clean-boundary class: a new-lexicon particle-initial
            # noun opens the document AND is the carryover subject
            hs, (o, v) = sents[0][0], (sents[0][2], sents[0][4])
            (o2, v2) = (sents[1][0], sents[1][2])
            assert (hs, v, o) in got, (doc, got)
            assert (hs, v2, o2) in got, (doc, got)
            checked_m7 += 1
    assert checked_m4 >= 5 and checked_m5 >= 5
    assert checked_m6 >= 5 and checked_m7 >= 5
