"""Deterministic synthetic spans-corpus generator (FIXTURES.md §A).

The driver contract fixes the input shape [B BASELINE.json:15]:
``(doc_id:string, spans:array<struct<kind,text,media_ref,offset:int>>)``
with interleaved text + media spans. This generator is a pure function of
(doc index, seed): identical output for any partitioning / parallelism —
the property tests depend on that. It is distributed: ``spark.range`` →
``mapInPandas`` (no driver-side materialization), so the same code
synthesizes 1k docs for smoke tests or 10^9 for a cluster soak.

The vocabulary is the EN profile's gazetteer (lang.py), so entity typing,
pronoun resolution, and subject carryover all have computable expected
outputs.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from naruhodo_spark import lang
from naruhodo_spark import schemas as S

SEED = 42

_PRON_FOR_PERSON = ["he", "she", "they"]


def _doc_rng(i: int, seed: int) -> np.random.RandomState:
    # stable 32-bit stream id per (seed, doc) — independent of partitioning
    return np.random.RandomState(zlib.crc32(f"{seed}:{i}".encode()) & 0x7FFFFFFF)


_EN_PASTS = sorted(lang.EN_VERBS.values())
_EN_ADJS = sorted(lang.EN_ADJECTIVES)


def _sentence(rng: np.random.RandomState, hot_frac: float, state: dict) -> str:
    """One sentence from a template mix that exercises every linguistic
    operator: plain SVO, prepositional obliques, pronoun subjects,
    omitted subjects (carryover), and predicate adjectives."""
    persons, locs, orgs, things = (
        lang.EN_PERSONS, lang.EN_LOCATIONS, lang.EN_ORGS, lang.EN_THINGS,
    )
    pasts = _EN_PASTS

    def person():
        if hot_frac > 0 and rng.rand() < hot_frac:
            return persons[0]  # the hot entity (skew fixture)
        return persons[rng.randint(len(persons))]

    t = rng.randint(6)
    verb = pasts[rng.randint(len(pasts))]
    if t == 0:  # SVO person-person
        s, o = person(), persons[rng.randint(len(persons))]
        state["last_person"] = o
        return f"{s} {verb} {o}"
    if t == 1:  # SVO person-thing with determiner
        s, o = person(), things[rng.randint(len(things))]
        state["last_person"] = s
        return f"{s} {verb} the {o}"
    if t == 2:  # oblique: moved to <location>
        s, l = person(), locs[rng.randint(len(locs))]
        state["last_person"] = s
        return f"{s} moved to {l}"
    if t == 3 and state.get("last_person"):  # pronoun subject → resolution
        o = orgs[rng.randint(len(orgs))]
        pr = _PRON_FOR_PERSON[rng.randint(len(_PRON_FOR_PERSON))]
        return f"{pr} joined {o}"
    if t == 4 and state.get("last_person"):  # omitted subject → carryover
        o = things[rng.randint(len(things))]
        return f"then {verb} the {o}"
    # predicate adjective
    th = things[rng.randint(len(things))]
    adj = _EN_ADJS[rng.randint(len(lang.EN_ADJECTIVES))]
    return f"the {th} is {adj}"


def make_doc(i: int, seed: int = SEED, hot_frac: float = 0.0) -> tuple[str, list]:
    """Pure function (doc index, seed, hot_frac) → (doc_id, spans)."""
    rng = _doc_rng(i, seed)
    n_spans = rng.randint(1, 9)  # 1–8 spans
    spans, offset, state = [], 0, {}
    for j in range(n_spans):
        if rng.rand() < 0.15 and j > 0:  # ~15% media, interleaved
            ref = f"img://{i:06d}/{j}.png"
            spans.append({"kind": "media", "text": "", "media_ref": ref,
                          "offset": offset})
            offset += 1
        else:
            n_sent = rng.randint(1, 6)
            text = " ".join(
                _sentence(rng, hot_frac, state) + "." for _ in range(n_sent)
            )
            spans.append({"kind": "text", "text": text, "media_ref": "",
                          "offset": offset})
            offset += len(text)
    return f"doc-{i:06d}", spans


def synth_documents(
    spark: SparkSession,
    n_docs: int,
    seed: int = SEED,
    hot_frac: float = 0.0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed generation of the spans-shaped documents table."""
    base = spark.range(0, n_docs, numPartitions=num_partitions or 32)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            docs = [make_doc(int(i), seed, hot_frac) for i in pdf["id"]]
            yield pd.DataFrame(
                {"doc_id": [d[0] for d in docs], "spans": [d[1] for d in docs]}
            )

    return base.mapInPandas(gen, schema=S.DOCUMENTS_SPANS)


def alias_rows(seed: int = SEED) -> list[tuple[str, str, int]]:
    """~200-row alias dictionary with multi-hop chains (FIXTURES.md §A):
    for each gazetteer entity E, aliases {E, E-variants} → `E@1`, plus a
    chain edge `E@1` → `E@2`, so connected-components canonicalization has
    3-node components {E, E@1, E@2} (min-label = E's surface form)."""
    rows: list[tuple[str, str, int]] = []
    groups = [
        (lang.EN_PERSONS, S.ETYPE_PERSON, ["mr-{e}", "{e}-san", "dr-{e}"]),
        (lang.EN_LOCATIONS, S.ETYPE_LOCATION, ["{e}-city", "old-{e}"]),
        (lang.EN_ORGS, S.ETYPE_ORG, ["{e}-inc", "{e}-corp", "the-{e}-group"]),
    ]
    for ents, etype, patterns in groups:
        for e in ents:
            rows.append((e, f"{e}@1", etype))
            rows.append((f"{e}@1", f"{e}@2", etype))  # chain hop
            for p in patterns:
                rows.append((p.format(e=e), f"{e}@1", etype))
    return rows


def alias_dictionary(spark: SparkSession, seed: int = SEED) -> DataFrame:
    return spark.createDataFrame(
        alias_rows(seed), schema="alias string, canonical_id string, etype int"
    )


def replicate_docs(docs: DataFrame, k: int) -> DataFrame:
    """Scale blowup for benchmarks: k deterministic copies with distinct
    doc_ids (crossJoin against a small literal range — broadcast, no
    shuffle)."""
    reps = docs.sparkSession.range(k).select(F.col("id").alias("rep"))
    return docs.crossJoin(F.broadcast(reps)).select(
        F.concat_ws("#", "doc_id", "rep").alias("doc_id"), "spans"
    )


# ---------------------------------------------------------------------
# Synthetic JA golden corpus (VERDICT r02 next-round #4): ≥100 raw
# (unsegmented) Japanese sentences with AUTHORED gold token boundaries,
# generated deterministically from templates. The gold segmentation is
# known by construction, so the corpus pins (a) segment_ja exactly and
# (b) the full raw-JA pipeline at P/R vs the pre-segmented row-wise
# spec — the same regenerable-golden policy the EN corpus uses.
# ---------------------------------------------------------------------

JA_SUBJECTS = ["太郎", "花子", "次郎", "健太", "美咲",
               "アリス", "ボブ", "キャロル", "デイブ"]
# hiragana nouns drawn from the particle-prefixed lexicon classes the
# r03 segmenter growth targets (lang.JA_HIRA_CONTENT)
JA_HIRA_NOUNS = ["にわとり", "はなし", "ともだち", "からす", "へや",
                 "でんわ", "にもつ", "のみもの", "くだもの", "たまご",
                 "さかな", "はさみ", "とけい", "おんがく"]
JA_OBJECTS = ["本", "手紙", "映画", "犬", "猫", "車", "歌声", "写真"]
JA_VERBS = ["読んだ", "渡した", "見た", "買った", "書いた",
            "作った", "売った", "食べた", "もらった", "わかった"]
JA_VERBS_NEG = ["読まない", "買わない", "食べない", "売らない"]
JA_VERBS_PASS = ["盗まれた", "売られた", "書かれた", "食べられた"]
JA_COP_NOUNS = ["寺", "庭", "宝物", "名画"]


def ja_golden_corpus(n_sents: int = 120, seed: int = SEED) -> list[tuple[str, list[str]]]:
    """[(raw_sentence_without_terminator, gold_tokens)] — deterministic.

    Templates (particles are their own gold tokens; the chunker attaches
    them to the preceding chunk itself):
      T1  S が O を V            T2  S は O を V
      T3  S が IO に O を V      T4  S は N だ        (copula)
      T5  S は O を Vneg        T6  O が Vpass       (passive)
      T7  HiraS が HiraO を V    (both args hiragana — the mis-split class)
    """
    rng = np.random.RandomState(seed)

    def pick(xs):
        return xs[int(rng.randint(len(xs)))]

    out: list[tuple[str, list[str]]] = []
    for i in range(n_sents):
        t = i % 7
        if t == 0:
            toks = [pick(JA_SUBJECTS), "が", pick(JA_OBJECTS), "を", pick(JA_VERBS)]
        elif t == 1:
            toks = [pick(JA_SUBJECTS), "は", pick(JA_HIRA_NOUNS), "を", pick(JA_VERBS)]
        elif t == 2:
            s, io = pick(JA_SUBJECTS), pick(JA_SUBJECTS)
            toks = [s, "が", io, "に", pick(JA_OBJECTS), "を", pick(JA_VERBS)]
        elif t == 3:
            toks = [pick(JA_SUBJECTS), "は", pick(JA_COP_NOUNS), "だ"]
        elif t == 4:
            toks = [pick(JA_SUBJECTS), "は", pick(JA_OBJECTS), "を", pick(JA_VERBS_NEG)]
        elif t == 5:
            toks = [pick(JA_OBJECTS), "が", pick(JA_VERBS_PASS)]
        else:
            toks = [pick(JA_HIRA_NOUNS), "が", pick(JA_HIRA_NOUNS), "を", pick(JA_VERBS)]
        out.append(("".join(toks), toks))
    return out


JA_LOCATIONS = ["東京", "京都", "大阪", "学校", "公園", "駅"]
# hiragana nouns that do NOT end in a verb-suffix character (つ/す/く…):
# the chunker's suffix heuristic classifies such enders as predicates
# (the documented jaseg/chunker limitation, operators/jaseg.py) — the
# multi-sentence templates need args that stay NOUN chunks so the
# planted antecedents are assertable directly
JA_HIRA_NOUN_ARGS = ["にわとり", "はなし", "ともだち", "へや", "でんわ",
                     "のみもの", "くだもの", "たまご", "さかな", "はさみ",
                     "とけい",
                     # r05 lexicon growth (VERDICT r04 #5) — the new
                     # particle-initial entries that don't end in a
                     # verb-suffix character
                     "にんじん", "はんこ", "はしご", "とびら", "となり",
                     "でぐち", "へいわ", "のはら", "もみじ", "やかん"]
# (kanji prefix, STRONG hiragana noun) compounds for the M6 template —
# the r05 rule-2a class: the noun abuts the kanji with NO intervening
# particle and must split instead of attaching as okurigana
JA_KANJI_STRONG_COMPOUNDS = [("生", "たまご"), ("腕", "とけい"),
                             ("女", "ともだち"), ("夏", "やさい"),
                             ("朝", "でんわ"), ("昔", "はなし")]


def ja_golden_multi_corpus(
    n_docs: int = 36, seed: int = SEED
) -> list[tuple[str, list[list[str]]]]:
    """[(raw_doc_text, [gold_tokens per sentence])] — multi-sentence JA
    documents with authored segmentations (VERDICT r03 next-round #4),
    exercising O13 pronoun resolution and O14 subject carryover ACROSS
    sentence boundaries. Each template plants an unambiguous antecedent:

      M0  [S が O を V]  [彼 は O2 を V2]          彼 → S (personal)
      M1  [S は O を V]  [それ は C だ]            それ → O (demonstrative)
      M2  [S が O を V]  [O2 を V2]                carryover: subj = S
      M3  [S が LOC に O を V]  [あそこ は C だ]   あそこ → LOC (locative)
      M4  [S が O を V]  [O2 が Vpass]  [彼 は O3 を V3]
          彼 must SKIP the nearer non-person O2 and resolve to S —
          the class-discrimination case the r04 JA NE gazetteer enables
      M5  [O を S が V]  [それ は C だ]
          それ must SKIP the nearer PERSON S and resolve to O
      M6  [S が 生たまご-compound を V]  [彼 は O2 を V2]   (r05: the
          kanji-abutting STRONG noun splits off its kanji prefix —
          jaseg rule 2a — and carries the を case)
      M7  [HiraS が O を V]  [O2 を V2]   (r05: a new-lexicon
          particle-initial noun opens the DOCUMENT — the clean-boundary
          class — and is the carryover subject for sentence 2)

    Raw text has no whitespace; sentences end with 。 so the engine's
    sentence splitter + raw segmenter run for real."""
    rng = np.random.RandomState(seed + 1)

    def pick(xs):
        return xs[int(rng.randint(len(xs)))]

    out: list[tuple[str, list[list[str]]]] = []
    for i in range(n_docs):
        t = i % 8
        s = pick(JA_SUBJECTS)
        o, o2, o3 = pick(JA_OBJECTS), pick(JA_HIRA_NOUN_ARGS), pick(JA_OBJECTS)
        v, v2, v3 = pick(JA_VERBS), pick(JA_VERBS), pick(JA_VERBS)
        if t == 0:
            sents = [[s, "が", o, "を", v], ["彼", "は", o2, "を", v2]]
        elif t == 1:
            sents = [[s, "は", o, "を", v],
                     ["それ", "は", pick(JA_COP_NOUNS), "だ"]]
        elif t == 2:
            sents = [[s, "が", o, "を", v], [o2, "を", v2]]
        elif t == 3:
            sents = [[s, "が", pick(JA_LOCATIONS), "に", o, "を", v],
                     ["あそこ", "は", pick(JA_COP_NOUNS), "だ"]]
        elif t == 4:
            sents = [[s, "が", o, "を", v],
                     [o2, "が", pick(JA_VERBS_PASS)],
                     ["彼", "は", o3, "を", v3]]
        elif t == 5:
            sents = [[o, "を", s, "が", v],
                     ["それ", "は", pick(JA_COP_NOUNS), "だ"]]
        elif t == 6:
            kp, strong = JA_KANJI_STRONG_COMPOUNDS[
                int(rng.randint(len(JA_KANJI_STRONG_COMPOUNDS)))
            ]
            sents = [[s, "が", kp, strong, "を", v],
                     ["彼", "は", o3, "を", v3]]
        else:
            hs = pick(JA_HIRA_NOUN_ARGS)
            sents = [[hs, "が", o, "を", v], [o2, "を", v2]]
        raw = "".join("".join(toks) + "。" for toks in sents)
        out.append((raw, sents))
    return out


def ja_golden_multi_documents(
    spark: SparkSession, n_docs: int = 36, seed: int = SEED
) -> DataFrame:
    """The multi-sentence corpus as a spans-shaped documents table."""
    rows = [
        (
            f"jam-{i:04d}",
            [{"kind": "text", "text": raw, "media_ref": "", "offset": 0}],
        )
        for i, (raw, _sents) in enumerate(ja_golden_multi_corpus(n_docs, seed))
    ]
    return spark.createDataFrame(rows, schema=S.DOCUMENTS_SPANS)


def ja_golden_documents(spark: SparkSession, n_sents: int = 120,
                        seed: int = SEED, segmented: bool = False) -> DataFrame:
    """The corpus as a spans-shaped documents table, one sentence per
    doc. ``segmented=True`` joins the gold tokens with spaces (the
    pre-segmented r01 contract) instead of the raw concatenation."""
    rows = [
        (
            f"ja-{i:04d}",
            [{"kind": "text",
              "text": (" ".join(toks) if segmented else raw) + "。",
              "media_ref": "", "offset": 0}],
        )
        for i, (raw, toks) in enumerate(ja_golden_corpus(n_sents, seed))
    ]
    return spark.createDataFrame(rows, schema=S.DOCUMENTS_SPANS)
