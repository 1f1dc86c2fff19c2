"""O11 — the dependency chunker (the heart of the pipeline).

Reference behavior: each sentence is piped through ``cabocha -f1`` (or
JUMAN++/KNP) over a persistent subprocess and the lattice output is
re-assembled into chunk (bunsetsu) objects with dependency links
[PK naruhodo/utils/communication.py, naruhodo/backends/cabocha.py
CaboChunk, naruhodo/backends/knp.py].

Our build replaces the external C++ parser with a *deterministic,
self-contained rule chunker* (SURVEY.md §7.0: no parser binaries exist in
this environment, and per-sentence subprocesses would violate the
"no per-row Python" contract [B BASELINE.json:15]). It runs as a
``mapInPandas`` UDF: Arrow batches in, chunk rows out (a UDTF in Spark
terms — 1 sentence row → N chunk rows). The pure-Python functions here
(`chunk_sentence_en` / `chunk_sentence_ja`) double as the *executable
spec* from which golden test fixtures are generated (SURVEY.md §5.1).

Chunk fields mirror the reference's CaboChunk: id, parent (-1 = root),
surface, main (content head), func (case marker / preposition), type,
NE tag, pronoun class, negative/passive/tense flags.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from naruhodo_spark import schemas as S

_PUNCT = ".,;:!?\"'()[]{}"


def _tokens(sentence: str) -> list[str]:
    out = []
    for raw in sentence.split():
        t = raw.strip(_PUNCT)
        if t:
            out.append(t)
    return out


def _assign_parents(chunks: list[dict]) -> None:
    """Dependency links. Predicates (verb/adjective chunks) chain forward,
    last predicate is root. Arguments attach to the *nearest* predicate by
    chunk distance (tie → preceding). Mirrors the reference's head links
    re-expressed positionally (the reference gets them from CaboCha's
    lattice [PK naruhodo/backends/cabocha.py])."""
    n = len(chunks)
    is_pred = [c["ctype"] in (S.CTYPE_VERB, S.CTYPE_ADJ) for c in chunks]
    # O(n) two-sweep nearest-predicate (tie → preceding predicate)
    prev_p, last = [-1] * n, -1
    for i in range(n):
        prev_p[i] = last
        if is_pred[i]:
            last = i
    next_p, nxt = [-1] * n, -1
    for i in range(n - 1, -1, -1):
        next_p[i] = nxt
        if is_pred[i]:
            nxt = i
    has_pred = last != -1
    for i, c in enumerate(chunks):
        if is_pred[i]:
            c["parent"] = next_p[i]
        elif has_pred:
            a, b = prev_p[i], next_p[i]
            if a == -1:
                c["parent"] = b
            elif b == -1:
                c["parent"] = a
            else:
                c["parent"] = a if (i - a) <= (b - i) else b
        else:
            c["parent"] = n - 1 if i != n - 1 else -1


def chunk_sentence_en(sentence: str, prof: dict) -> list[dict]:
    """SVO profile: determiners/adjectives buffer onto the next noun head,
    aux/negations buffer onto the next verb head, prepositions become the
    `func` of the following noun chunk (the EN analog of the reference's
    postpositional case particles)."""
    toks = _tokens(sentence)
    chunks: list[dict] = []
    pre_mods: list[str] = []
    pre_verb: list[str] = []
    pending_func = ""

    verb_forms = prof["verb_forms"]
    past_forms = prof["past_forms"]

    def emit(surface, main, func, ctype, ne, pro, neg, pas, tense):
        chunks.append(
            dict(
                chunk_id=len(chunks), parent=-1, surface=surface, main=main,
                func=func, ctype=ctype, ne_type=ne, pro=pro, negative=neg,
                passive=pas, tense=tense,
            )
        )

    cls = prof["cls"]

    def flush_buffers():
        # same emission the end-of-sentence path performs: buffered
        # copula+adjective become a predicate-adjective chunk, a
        # dangling aux an OTHER chunk. Called at conjunctions too — the
        # old reset-without-flush silently DROPPED the predication in
        # "the castle is ancient but the garden is quiet" (castle's
        # 'is ancient' vanished and castle mis-attached to 'is quiet').
        nonlocal pre_mods, pre_verb
        if pre_mods:
            neg = any(w in prof["negations"] for w in pre_verb)
            surface = " ".join(pre_verb + pre_mods)
            emit(surface, pre_mods[-1], "", S.CTYPE_ADJ, S.ETYPE_UNKNOWN,
                 S.PRO_NONE, neg, False, "present")
        elif pre_verb:
            emit(" ".join(pre_verb), pre_verb[-1], "", S.CTYPE_OTHER,
                 S.ETYPE_UNKNOWN, S.PRO_NONE, False, False, "present")
        pre_mods, pre_verb = [], []

    for tok in toks:
        c = cls.get(tok)
        if c == "det" or c == "adj":
            pre_mods.append(tok)
        elif c == "aux" or c == "neg":
            pre_verb.append(tok)
        elif c == "prep":
            pending_func = tok
        elif c == "conj":
            flush_buffers()
            emit(tok, tok, "", S.CTYPE_CONNECT, S.ETYPE_UNKNOWN, S.PRO_NONE,
                 False, False, "present")
            pending_func = ""
        elif tok in verb_forms or (tok.endswith("ed") and len(tok) > 3):
            lemma = verb_forms.get(tok, tok)
            is_past = tok in past_forms or tok.endswith("ed")
            neg = any(w in prof["negations"] for w in pre_verb)
            pas = is_past and any(w in prof["passive_aux"] for w in pre_verb)
            surface = " ".join(pre_verb + [tok])
            emit(surface, lemma, "", S.CTYPE_VERB, S.ETYPE_UNKNOWN,
                 S.PRO_NONE, neg, pas, "past" if is_past else "present")
            pre_verb = []
        else:
            pro = prof["pro"].get(tok, S.PRO_NONE)
            ctype = S.CTYPE_PRONOUN if pro != S.PRO_NONE else S.CTYPE_NOUN
            ne = prof["ne"].get(tok, S.ETYPE_UNKNOWN)
            surface = " ".join(pre_mods + [tok])
            emit(surface, tok, pending_func, ctype, ne, pro, False, False,
                 "present")
            pre_mods, pending_func = [], ""

    flush_buffers()  # EOS: predicate adjective / dangling aux

    _assign_parents(chunks)
    return chunks


def chunk_sentence_ja(sentence: str, prof: dict) -> list[dict]:
    """SOV particle profile. Input may be pre-segmented (whitespace
    between tokens — the r01 contract) or RAW Japanese: sentences with
    no whitespace run through the longest-match segmenter
    (operators/jaseg.py) first, replacing the CaboCha/JUMAN morphology
    the reference shells out to [PK naruhodo/backends/cabocha.py] —
    no analyzer binary exists in this environment (SURVEY.md §7.0).
    Case particles attach as `func` of the *preceding* chunk, mirroring
    [PK naruhodo/backends/cabocha.py] func extraction."""
    from naruhodo_spark.operators.jaseg import ja_tokens

    toks = ja_tokens(sentence, prof, _PUNCT)
    chunks: list[dict] = []

    def emit(surface, main, ctype, pro, neg, tense):
        # NE only on noun chunks (the EN chunker's rule): pronouns keep
        # UNKNOWN so resolve_pronouns' is_ent mask stays pronoun-free,
        # and predicates are never entities
        ne = (
            prof.get("ne", {}).get(main, S.ETYPE_UNKNOWN)
            if ctype == S.CTYPE_NOUN else S.ETYPE_UNKNOWN
        )
        chunks.append(
            dict(
                chunk_id=len(chunks), parent=-1, surface=surface, main=main,
                func="", ctype=ctype, ne_type=ne, pro=pro,
                negative=neg, passive=pas_flag(surface), tense=tense,
            )
        )

    def pas_flag(surface: str) -> bool:
        return surface.endswith(("れた", "れる", "られた", "られる"))

    for tok in toks:
        if tok in prof["particles"] and chunks:
            chunks[-1]["func"] = tok
            chunks[-1]["surface"] += tok
        elif tok in prof["pro"]:
            emit(tok, tok, S.CTYPE_PRONOUN, prof["pro"][tok], False, "present")
        elif tok.endswith(tuple(prof["negations"])):
            if tok in prof.get("neg_exceptions", ()):
                # lexical ない/ぬ enders (少ない, 死ぬ) are NON-negated
                # PREDICATES; ず-ending adverbs (必ず) fall to the noun
                # default like other adverbs
                if tok.endswith("ず"):
                    emit(tok, tok, S.CTYPE_NOUN, S.PRO_NONE, False, "present")
                else:
                    emit(tok, tok, S.CTYPE_VERB, S.PRO_NONE, False, "present")
            else:
                emit(tok, tok, S.CTYPE_VERB, S.PRO_NONE, True,
                     "past" if tok.endswith(("た", "だ")) else "present")
        elif tok.endswith(prof["verb_suffixes"]):
            emit(tok, tok, S.CTYPE_VERB, S.PRO_NONE, False,
                 "past" if tok.endswith(("た", "だ")) else "present")
        else:
            emit(tok, tok, S.CTYPE_NOUN, S.PRO_NONE, False, "present")

    _assign_parents(chunks)
    return chunks


def chunk_sentence(sentence: str, prof: dict) -> list[dict]:
    if prof.get("lang") == "ja":
        return chunk_sentence_ja(sentence, prof)
    return chunk_sentence_en(sentence, prof)


_COLS = [f.name for f in S.CHUNKS.fields]


def chunk_sentences(sents_df, prof: dict, vectorized: bool = True):
    """Spark surface: sentences DataFrame → chunks DataFrame via
    ``mapInPandas`` (iterator-of-Arrow-batches; the profile dict is
    closure-captured once per task, not per row).

    The default path is the columnar batch chunker (operators/vchunk.py
    — whole-batch numpy passes, no per-token Python; asserted
    row-identical to this module's per-sentence spec by
    tests/test_vchunk_parity.py; r2 added the JA columnar twin). The
    row-wise path remains as the executable spec."""
    use_vec = vectorized

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from naruhodo_spark.operators import vchunk as V

        for pdf in batches:
            if use_vec:
                yield V.chunk_batch(pdf, prof)
                continue
            rows = []
            for doc_id, sent_id, sentence in zip(
                pdf["doc_id"], pdf["sent_id"], pdf["sentence"]
            ):
                for c in chunk_sentence(sentence, prof):
                    rows.append(
                        (
                            doc_id, int(sent_id), c["chunk_id"], c["parent"],
                            c["surface"], c["main"], c["func"], c["ctype"],
                            c["ne_type"], c["pro"], c["negative"],
                            c["passive"], c["tense"],
                        )
                    )
            yield pd.DataFrame(rows, columns=_COLS)

    return sents_df.mapInPandas(fn, schema=S.CHUNKS)
