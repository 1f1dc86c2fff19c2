"""Raw-Japanese segmentation (operators/jaseg.py): the longest-match
segmenter must make UNSEGMENTED input behave identically to the r01
pre-segmented fixtures, end to end through the triple extractor
(VERDICT r01 next-round item #6)."""

import pytest

from naruhodo_spark import lang as L
from naruhodo_spark import schemas as S
from naruhodo_spark.operators.chunk import chunk_sentence_ja
from naruhodo_spark.operators.jaseg import segment_ja
from naruhodo_spark.pipeline import build_kg

PROF = L.get_profile("ja")

# (raw, expected tokens == the pre-segmented fixture tokenization)
SEG_CASES = [
    ("彼女は本を読んだ", ["彼女", "は", "本", "を", "読んだ"]),
    ("太郎が花子に手紙を渡した",
     ["太郎", "が", "花子", "に", "手紙", "を", "渡した"]),
    ("それは古い寺だ", ["それ", "は", "古い", "寺", "だ"]),
    # okurigana stays attached; katakana run is one token; two-char
    # particle から longest-matches before any single-char candidate
    ("ここで彼がアメリカから来た",
     ["ここ", "で", "彼", "が", "アメリカ", "から", "来た"]),
    # possessive の at a hiragana-run start splits; the い of 古い does not
    ("彼女の古い本", ["彼女", "の", "古い", "本"]),
    # copula です splits off the preceding noun
    ("これは本です", ["これ", "は", "本", "です"]),
    # CJK comma is a boundary and is dropped
    ("太郎は、本を読んだ", ["太郎", "は", "本", "を", "読んだ"]),
    ("", []),
    # r05 rule 2a (strong content nouns split off an abutting
    # kanji/katakana word instead of attaching as okurigana)…
    ("太郎は生たまごを食べた",
     ["太郎", "は", "生", "たまご", "を", "食べた"]),
    ("花子がテレビでんわを買った",
     ["花子", "が", "テレビ", "でんわ", "を", "買った"]),
    ("女ともだちが来た", ["女", "ともだち", "が", "来た"]),
    # …WITHOUT re-breaking genuine okurigana: した after 渡 is an
    # inflection, not the noun はなし mid-word, and strong nouns that
    # merely APPEAR inside an okurigana run stay attached
    ("本を渡した", ["本", "を", "渡した"]),
    ("夏にがまんした", ["夏", "に", "がまん", "した"]),
    # r05 clean-boundary lexicon growth: new particle-initial nouns
    ("にんじんをとなりのやおやで買った",
     ["にんじん", "を", "となり", "の", "やおや", "で", "買った"]),
    ("がっこうのでぐちではんこを見た",
     ["がっこう", "の", "でぐち", "で", "はんこ", "を", "見た"]),
]


@pytest.mark.parametrize("raw,expected", SEG_CASES)
def test_segment_ja(raw, expected):
    assert segment_ja(raw, PROF) == expected


@pytest.mark.parametrize("raw,expected", SEG_CASES)
def test_raw_equals_presegmented_chunks(raw, expected):
    """chunk_sentence_ja(raw) == chunk_sentence_ja(' '.join(tokens)):
    the segmenter is invisible to the chunker spec."""
    assert chunk_sentence_ja(raw, PROF) == chunk_sentence_ja(
        " ".join(expected), PROF
    )


RAW_SENTS = [raw for raw, _ in SEG_CASES if raw]
SEG_SENTS = [" ".join(toks) for _, toks in SEG_CASES if toks]


def _spans_df(spark, sents, prefix):
    rows = [
        (f"{prefix}-{i:03d}",
         [{"kind": "text", "text": t, "media_ref": "", "offset": 0}])
        for i, t in enumerate(sents)
    ]
    return spark.createDataFrame(rows, schema=S.DOCUMENTS_SPANS)


def test_raw_ja_pipeline_triples_match_presegmented(spark):
    """End-to-end: build_kg over raw (unsegmented) JA docs emits the
    same (subj, pred, obj) triples as over the pre-segmented twins —
    doc_ids aligned so the comparison is row-exact."""
    raw = build_kg(_spans_df(spark, RAW_SENTS, "ja"), prof=PROF)["triples"]
    seg = build_kg(_spans_df(spark, SEG_SENTS, "ja"), prof=PROF)["triples"]
    cols = ["doc_id", "sent_id", "subj", "pred", "obj", "negative", "passive"]
    a = sorted(tuple(r) for r in raw.select(cols).collect())
    b = sorted(tuple(r) for r in seg.select(cols).collect())
    assert a == b
    assert len(a) > 0
