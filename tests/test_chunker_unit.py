"""Unit tests for the deterministic chunker spec (SURVEY.md §5.2 tier 1).

These test the *pure-Python executable spec* directly (no Spark) — the
same functions the mapInPandas UDF calls, so the Spark path is covered by
construction plus the golden end-to-end tests.
"""

from naruhodo_spark import schemas as S
from naruhodo_spark.lang import en_profile, ja_profile
from naruhodo_spark.operators.chunk import chunk_sentence_en, chunk_sentence_ja
from naruhodo_spark.operators.triples import triples_from_chunklist

PROF = en_profile()


def _triples(sentence, prof=PROF):
    chunks = chunk_sentence_en(sentence, prof) if prof["lang"] == "en" else (
        chunk_sentence_ja(sentence, prof)
    )
    for c in chunks:
        c["doc_id"], c["sent_id"] = "d", 0
    return triples_from_chunklist(chunks, prof["order"], set(prof["stop_mains"]))


def test_svo_basic():
    chunks = chunk_sentence_en("alice visited bob", PROF)
    assert [c["main"] for c in chunks] == ["alice", "visit", "bob"]
    assert chunks[0]["parent"] == 1  # subject → verb
    assert chunks[2]["parent"] == 1  # object → verb
    assert chunks[1]["parent"] == -1  # root predicate
    (t,) = _triples("alice visited bob")
    assert (t[3], t[4], t[6]) == ("visit", "alice", "bob")
    assert t[10] == "past"


def test_determiner_folds_into_noun_chunk():
    chunks = chunk_sentence_en("alice bought the book", PROF)
    assert chunks[2]["surface"] == "the book"
    assert chunks[2]["main"] == "book"


def test_preposition_becomes_func():
    chunks = chunk_sentence_en("alice moved to tokyo", PROF)
    tokyo = [c for c in chunks if c["main"] == "tokyo"][0]
    assert tokyo["func"] == "to"
    # oblique arg is NOT the object
    (t,) = _triples("alice moved to tokyo")
    assert t[4] == "alice" and t[6] is None


def test_negation_and_tense():
    chunks = chunk_sentence_en("bob did not visit paris", PROF)
    verb = [c for c in chunks if c["ctype"] == S.CTYPE_VERB][0]
    assert verb["negative"] is True
    assert verb["main"] == "visit"


def test_passive():
    chunks = chunk_sentence_en("the temple was built", PROF)
    verb = [c for c in chunks if c["ctype"] == S.CTYPE_VERB][0]
    assert verb["passive"] is True and verb["tense"] == "past"


def test_predicate_adjective():
    chunks = chunk_sentence_en("the castle is ancient", PROF)
    adj = chunks[-1]
    assert adj["ctype"] == S.CTYPE_ADJ and adj["main"] == "ancient"
    (t,) = _triples("the castle is ancient")
    assert t[3] == "ancient" and t[4] == "castle"


def test_pronoun_class_and_ne():
    chunks = chunk_sentence_en("she joined acme", PROF)
    assert chunks[0]["pro"] == S.PRO_PERSONAL
    assert chunks[0]["ctype"] == S.CTYPE_PRONOUN
    acme = [c for c in chunks if c["main"] == "acme"][0]
    assert acme["ne_type"] == S.ETYPE_ORG


def test_two_clauses_attach_to_nearest_predicate():
    ts = _triples("alice visited bob then carol praised dave")
    assert ("visit", "alice", "bob") in [(t[3], t[4], t[6]) for t in ts]
    assert ("praise", "carol", "dave") in [(t[3], t[4], t[6]) for t in ts]


def test_no_verb_sentence_emits_no_triples():
    assert _triples("the big garden") == []


def test_word_salad_is_deterministic():
    s = "merge data table sort the table query table the order batch"
    assert chunk_sentence_en(s, PROF) == chunk_sentence_en(s, PROF)


def test_ja_particles():
    prof = ja_profile()
    chunks = chunk_sentence_ja("彼女 は 本 を 読んだ", prof)
    assert chunks[0]["func"] == "は" and chunks[0]["pro"] == S.PRO_PERSONAL
    assert chunks[1]["func"] == "を"
    assert chunks[2]["ctype"] == S.CTYPE_VERB and chunks[2]["tense"] == "past"
    for c in chunks:
        c["doc_id"], c["sent_id"] = "d", 0
    (t,) = triples_from_chunklist(chunks, "sov", set(prof["stop_mains"]))
    assert (t[4], t[6]) == ("彼女", "本")


def test_ja_negation_exceptions():
    """Lexical ない/ぬ/ず enders are NOT negations: 死ぬ (plain verb),
    少ない (i-adjective — stays a PREDICATE, just not negated), 必ず
    (adverb); real negations (ない auxiliary, ぬ archaic) still flag."""
    from naruhodo_spark import lang as L
    from naruhodo_spark.operators.chunk import chunk_sentence_ja

    prof = L.get_profile("ja")

    def neg_preds(s):
        return [(c["main"], c["negative"]) for c in chunk_sentence_ja(s, prof)
                if c["ctype"] == 1]

    assert neg_preds("彼 は 死ぬ") == [("死ぬ", False)]
    assert neg_preds("人 が 少ない") == [("少ない", False)]  # still a predicate
    assert neg_preds("本 が ない") == [("ない", True)]
    assert neg_preds("行か ない") == [("行か", False), ("ない", True)] or any(
        n for _, n in neg_preds("行か ない")
    )
    assert neg_preds("彼 は 知ら ぬ")[-1][1] is True
    assert all(not n for _, n in neg_preds("必ず 行く"))
