"""Language rule tables for the deterministic chunker (SURVEY.md §7.0).

The reference drives chunking through external C++ parsers (CaboCha /
JUMAN++/KNP [PK naruhodo/utils/communication.py]); those binaries do not
exist in this sandbox and per-sentence subprocesses would violate the
"no per-row Python" contract [B BASELINE.json:15]. Instead chunking is a
self-contained deterministic rule system, parameterized per language:

- ``en``  — the primary profile: closed-class word lists + light
  morphology, SVO role assignment. Exercised by both the synthesized
  spans corpus (FIXTURES.md §A) and the flat testdata documents.
- ``ja``  — a particle-table profile mirroring the reference's dicts
  ([PK naruhodo/utils/dicts.py]): case particles が/は/を/に/…, pronoun
  classes, light-verb stopwords. Operates on pre-segmented
  (whitespace-tokenized) Japanese, since no morphological analyzer is
  available; role assignment is particle-driven (SOV).

Profiles are plain dicts so they broadcast cheaply to executors.
"""

from __future__ import annotations

from naruhodo_spark import schemas as S

# ---------------------------------------------------------------- EN ----
# Gazetteers: these double as the synthetic-corpus vocabulary (synth.py),
# so entity typing has computable expected outputs (goldens).
EN_PERSONS = [
    "alice", "bob", "carol", "dave", "erin", "frank", "grace", "heidi",
    "ivan", "judy", "mallory", "oscar", "peggy", "trent", "victor", "wendy",
]
EN_LOCATIONS = [
    "tokyo", "kyoto", "paris", "london", "berlin", "osaka", "madrid",
    "rome", "lisbon", "vienna", "prague", "dublin",
]
EN_ORGS = [
    "acme", "globex", "initech", "umbrella", "hooli", "vandelay",
    "wonka", "stark", "wayne", "tyrell",
]
EN_THINGS = [
    "book", "bridge", "temple", "garden", "letter", "painting", "castle",
    "museum", "library", "factory", "statue", "market", "tower", "song",
]

EN_PRON_PERSONAL = ["he", "she", "they", "him", "her", "them"]
EN_PRON_DEMONSTRATIVE = ["it", "this", "that", "these", "those"]
EN_PRON_LOCATIVE = ["here", "there"]

EN_DETERMINERS = ["the", "a", "an", "his", "its", "their", "my", "our"]
EN_PREPOSITIONS = [
    "in", "on", "at", "to", "with", "by", "for", "from", "of", "into",
    "near", "over", "under", "about",
]
EN_CONJUNCTIONS = ["and", "but", "or", "so", "because", "while", "then"]
EN_AUX = [
    "is", "are", "was", "were", "be", "been", "being", "has", "have",
    "had", "will", "would", "can", "could", "did", "does", "do",
]
EN_NEGATIONS = ["not", "never", "no"]

# verb vocabulary: base → past (the synthetic corpus draws from these;
# the morphological fallback *ed covers unseen past forms)
EN_VERBS = {
    "visit": "visited", "meet": "met", "see": "saw", "build": "built",
    "found": "founded", "lead": "led", "know": "knew", "like": "liked",
    "move": "moved", "write": "wrote", "buy": "bought", "sell": "sold",
    "run": "ran", "own": "owned", "love": "loved", "help": "helped",
    "join": "joined", "leave": "left", "praise": "praised",
    "thank": "thanked", "admire": "admired", "paint": "painted",
}
EN_VERB_FORMS: dict[str, str] = {}
for _base, _past in EN_VERBS.items():
    EN_VERB_FORMS[_base] = _base
    EN_VERB_FORMS[_past] = _base
    EN_VERB_FORMS[_base + "s"] = _base  # 3sg present

EN_ADJECTIVES = [
    "big", "small", "fast", "slow", "old", "young", "famous", "quiet",
    "happy", "bright", "ancient", "modern",
]

# light verbs / meaningless chunks (reference MeaninglessDict analog
# [PK naruhodo/utils/dicts.py]): chunks whose main is in this list are
# dropped from the KSG (O9).
EN_STOP_MAINS = ["thing", "stuff", "something", "someone"]


def en_profile() -> dict:
    ne = {}
    for w in EN_PERSONS:
        ne[w] = S.ETYPE_PERSON
    for w in EN_LOCATIONS:
        ne[w] = S.ETYPE_LOCATION
    for w in EN_ORGS:
        ne[w] = S.ETYPE_ORG
    pro = {}
    for w in EN_PRON_PERSONAL:
        pro[w] = S.PRO_PERSONAL
    for w in EN_PRON_DEMONSTRATIVE:
        pro[w] = S.PRO_DEMONSTRATIVE
    for w in EN_PRON_LOCATIVE:
        pro[w] = S.PRO_LOCATIVE
    # single-lookup token classifier for the chunker hot loop; insertion
    # order = match priority (first class wins on overlap, mirroring the
    # chunker's original elif chain)
    cls: dict[str, str] = {}
    for words, code in [
        (EN_DETERMINERS, "det"), (EN_ADJECTIVES, "adj"), (EN_AUX, "aux"),
        (EN_NEGATIONS, "neg"), (EN_PREPOSITIONS, "prep"),
        (EN_CONJUNCTIONS, "conj"),
    ]:
        for w in words:
            cls.setdefault(w, code)
    return {
        "lang": "en",
        "order": "svo",  # args before/after predicate, func-word BEFORE noun
        "cls": cls,
        "ne": ne,
        "pro": pro,
        "determiners": set(EN_DETERMINERS),
        "prepositions": set(EN_PREPOSITIONS),
        "conjunctions": set(EN_CONJUNCTIONS),
        "aux": set(EN_AUX),
        "negations": set(EN_NEGATIONS),
        "verb_forms": dict(EN_VERB_FORMS),
        "past_forms": {p for p in EN_VERBS.values()},
        "adjectives": set(EN_ADJECTIVES),
        "stop_mains": set(EN_STOP_MAINS),
        "sentence_re": r"[.!?]+",
        "passive_aux": {"is", "are", "was", "were", "been", "being"},
    }


# ---------------------------------------------------------------- JA ----
# Particle tables mirroring the reference's dicts ([PK naruhodo/utils/
# dicts.py]); input must be pre-segmented (whitespace between bunsetsu
# tokens) because no morphological analyzer exists in this environment.
JA_CASE_PARTICLES = ["が", "は", "を", "に", "で", "と", "へ", "から", "まで", "の"]
JA_SUBJ_PARTICLES = {"が", "は"}
JA_OBJ_PARTICLES = {"を"}
JA_PRON = {
    "これ": S.PRO_DEMONSTRATIVE, "それ": S.PRO_DEMONSTRATIVE,
    "あれ": S.PRO_DEMONSTRATIVE, "彼": S.PRO_PERSONAL,
    "彼女": S.PRO_PERSONAL, "ここ": S.PRO_LOCATIVE,
    "そこ": S.PRO_LOCATIVE, "あそこ": S.PRO_LOCATIVE,
}
JA_STOP_MAINS = ["する", "なる", "ある", "いる", "こと", "もの"]
# NE gazetteer — the JA analog of the EN person/location/org lists
# (mirrors the reference's NE dictionaries [PK naruhodo/utils/
# dicts.py]); r04: without it the pronoun classes could not
# discriminate in JA (彼 → nearest PERSON, それ → nearest non-person,
# あそこ → nearest LOCATION all degraded to nearest-any)
JA_NE_PERSONS = ["太郎", "花子", "次郎", "健太", "美咲",
                 "アリス", "ボブ", "キャロル", "デイブ", "先生"]
JA_NE_LOCATIONS = ["東京", "京都", "大阪", "学校", "公園", "駅", "図書館"]
JA_NE_ORGS = ["会社", "大学", "銀行"]
# copulas split off as their own bunsetsu by the raw-text segmenter
# (operators/jaseg.py): 寺だ → 寺|だ, matching how CaboCha emits the
# copula as the sentence-final predicate
JA_COPULAS = ["だ", "です", "だった", "でした"]
# hiragana-only content words the segmenter must NOT mistake for a
# particle-led split at a token boundary (した would otherwise lose し)
JA_HIRA_CONTENT = ["する", "した", "なる", "なった", "ある", "あった",
                   "いる", "いた", "こと", "もの"]
# r03 lexicon growth (VERDICT r02 "What's wrong #3"): common hiragana
# content words whose SPELLING BEGINS WITH A PARTICLE STRING — the
# documented mis-split class (にわとり → に|わとり without the entry;
# the clean-boundary longest-match prefers content words, so one lexicon
# row fixes each word). Grouped by the particle they collide with.
# Chosen to be prefix-free against each other so greedy longest-match
# cannot split one entry by another.
JA_HIRA_CONTENT += [
    # に-initial
    "にわとり", "におい", "にもつ", "にんぎょう",
    # は-initial
    "はなし", "はさみ", "はがき", "はたけ", "はなび",
    # が-initial
    "がけ", "がまん",
    # で-initial
    "でんわ", "できごと",
    # と-initial
    "ともだち", "とけい", "とかげ",
    # へ / の / から-initial
    "へや", "のみもの", "のこぎり", "からす", "からだ",
    # particle-free everyday nouns that keep mixed-hiragana sentences
    # segmentable without morphology
    "くだもの", "たまご", "さかな", "やさい", "おかね", "おんがく",
    # hiragana-spelled verbs (classified VERB downstream by suffix)
    "わかった", "わかる", "できた", "できる", "もらった", "もらう",
    "くれた", "くれる", "あげた", "あげる",
]
# r05 lexicon growth (VERDICT r04 next-round #5): more particle-initial
# everyday nouns — same prefix-free discipline as the r03 block above
# (no entry is a prefix of another, so greedy longest-match is
# order-safe).
JA_HIRA_CONTENT += [
    # に-initial
    "にんじん", "にっき",
    # は-initial
    "はちみつ", "はんこ", "はしご", "はなみ",
    # が-initial
    "がっこう", "がいこく",
    # で-initial
    "でぐち",
    # と-initial
    "とびら", "とうふ", "となり", "とんぼ",
    # へ / の / も / や / から-initial
    "へいわ", "のはら", "もみじ", "もぐら", "やかん", "やおや",
    "からあげ",
]

# STRONG hiragana nouns (r05, VERDICT r04 next-round #5 class-2 fix):
# the subset of the content lexicon that can ALSO be recognized at the
# rule-2 position (start of a hiragana run directly after a
# kanji/katakana word) — splitting compounds like 生たまご → 生|たまご
# and テレビでんわ → テレビ|でんわ instead of attaching the noun as
# okurigana. Membership criteria (both required):
#   1. length ≥ 3 — short entries (がけ, へや, こと) are too easy to
#      find inside genuine okurigana/inflection runs;
#   2. the word is a concrete noun that never occurs as an inflection
#      suffix sequence — which is why the hiragana VERBS (わかった…)
#      and the light verbs/nominalizers (する, した, こと, もの) are
#      excluded: した after 渡 IS the okurigana of 渡した, and a rule-2
#      content match there would re-break every such verb.
JA_HIRA_STRONG = [
    "にわとり", "におい", "にもつ", "にんぎょう", "にんじん", "にっき",
    "はなし", "はさみ", "はがき", "はたけ", "はなび", "はちみつ",
    "はんこ", "はしご", "はなみ", "がまん", "がっこう", "がいこく",
    "でんわ", "できごと", "でぐち", "ともだち", "とけい", "とかげ",
    "とびら", "とうふ", "となり", "とんぼ", "へいわ", "のみもの",
    "のこぎり", "のはら", "からす", "からだ", "からあげ", "くだもの",
    "たまご", "さかな", "やさい", "おかね", "おんがく", "もみじ",
    "もぐら", "やかん", "やおや",
]


def ja_profile() -> dict:
    ne = {}
    for w in JA_NE_PERSONS:
        ne[w] = S.ETYPE_PERSON
    for w in JA_NE_LOCATIONS:
        ne[w] = S.ETYPE_LOCATION
    for w in JA_NE_ORGS:
        ne[w] = S.ETYPE_ORG
    return {
        "lang": "ja",
        "order": "sov",  # func-word (particle) AFTER noun, predicate last
        "ne": ne,
        "pro": dict(JA_PRON),
        "particles": set(JA_CASE_PARTICLES),
        "subj_particles": set(JA_SUBJ_PARTICLES),
        "obj_particles": set(JA_OBJ_PARTICLES),
        "negations": {"ない", "ぬ", "ず"},
        # lexical items that END in a negation string without negating:
        # 死ぬ is the lone modern -ぬ verb; 少ない/危ない-class i-adjectives
        # contain ない as part of the stem; 必ず/まず-class adverbs end in
        # ず. The suffix test alone flagged all of these negative
        # (e.g. (人, 少ない) came out negated).
        "neg_exceptions": {
            "死ぬ", "少ない", "危ない", "もったいない", "勿体ない",
            "切ない", "つまらない", "くだらない", "きたない", "汚ない",
            "必ず", "まず", "思わず", "相変わらず", "とりあえず",
            "ひとまず",
        },
        "stop_mains": set(JA_STOP_MAINS),
        "copulas": set(JA_COPULAS),
        "hira_content": set(JA_HIRA_CONTENT) | set(JA_PRON),
        "hira_content_strong": set(JA_HIRA_STRONG),
        "sentence_re": r"[。！？!?]+",
        "verb_suffixes": ("する", "した", "れた", "れる", "った", "う", "く",
                          "ぐ", "す", "つ", "ぬ", "ぶ", "む", "る", "た", "だ"),
    }


PROFILES = {"en": en_profile, "ja": ja_profile}


def get_profile(lang: str) -> dict:
    try:
        return PROFILES[lang]()
    except KeyError:  # unknown language → EN fallback dataflow
        return en_profile()
