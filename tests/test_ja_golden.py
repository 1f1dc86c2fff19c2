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
