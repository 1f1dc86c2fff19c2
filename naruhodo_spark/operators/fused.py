"""Fused per-document extraction — the production fast path.

Every stage from sentence split through subject carryover is
*document-local* (the reference processes one document at a time in
driver memory; our windows only ever partition by doc_id). So the scale
path fuses O7–O14 into ONE ``mapInPandas`` pass over document rows:

    documents (1 row/doc) → [python: split → chunk → triples →
    pronoun-resolve → carryover] → triple rows

Zero shuffles until the global edge/node aggregation (which then salts on
hot keys). At 10^12 documents this is embarrassingly parallel: the only
cluster-wide data movement left is the final aggregate and the broadcast
alias dictionary.

Correctness containment: the window/join-based plan (triples.py +
coref.py) implements identical semantics relationally and the test suite
asserts both plans produce identical tables — the fused path never drifts
silently (tests/test_pipeline_e2e.py::test_fused_plan_agrees, plus the
independent pure-Python golden spec in tests/golden_spec.py).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from naruhodo_spark import schemas as S
from naruhodo_spark.operators.chunk import chunk_sentence
from naruhodo_spark.operators.normalize import SENT_STRIDE
from naruhodo_spark.operators.triples import triples_from_chunklist

# re.ASCII: Java's \s (the Catalyst normalize path) is ASCII-only
# [ \t\n\x0b\f\r]; Python's default \s also matches U+00A0/U+3000 etc.,
# which would make the fused mirror collapse Unicode whitespace the
# relational plan keeps — breaking the identical-output contract on
# Japanese/web text
_WS = re.compile(r"\s+", re.ASCII)
_CTRL = re.compile(r"[\n\r\t]+")
_BRACKETS = re.compile(r"(《[^》]*》|【[^】]*】|（[^）]*）|\([^)]*\)|\[[^\]]*\])")

FUSED_TRIPLES = (
    "doc_id string, sent_id int, pred_id int, pred string,"
    " subj string, subj_id int, obj string, obj_id int,"
    " negative boolean, passive boolean, tense string,"
    " subj_ne int, obj_ne int, subj_pro int, obj_pro int"
)
# linked output keeps the RAW tagger etypes in subj_ne/obj_ne and carries
# the alias-derived ones separately, so the pre-link `triples` stage is
# identical across plans and alias-dictionary sizes
FUSED_TRIPLES_LINKED = (
    FUSED_TRIPLES
    + ", subj_ne_linked int, obj_ne_linked int,"
    " subj_canon string, obj_canon string"
)


def split_doc_sentences(spans, prof: dict) -> list[tuple[int, str]]:
    """Python mirror of normalize.split_sentences (same regexes, same
    sent_id stride)."""
    lowercase = prof.get("lang") != "ja"
    sent_re = re.compile(prof["sentence_re"])
    out = []
    span_pos = -1
    # offset order == document order (same rule as normalize/span_sequences)
    for sp in sorted(spans, key=lambda sp: sp["offset"]):
        if sp["kind"] != "text":
            continue
        span_pos += 1
        txt = _BRACKETS.sub("", sp["text"] or "")
        txt = _CTRL.sub(" ", txt)
        txt = _WS.sub(" ", txt).strip(" ")  # F.trim strips spaces only
        if lowercase:
            txt = txt.lower()
        for sent_pos, sent in enumerate(sent_re.split(txt)):
            sent = sent.strip(" ")
            if sent:
                out.append((span_pos * SENT_STRIDE + sent_pos, sent))
    return out


def _compatible(pro: int):
    if pro == S.PRO_PERSONAL:
        return lambda ne: ne == S.ETYPE_PERSON
    if pro == S.PRO_LOCATIVE:
        return lambda ne: ne == S.ETYPE_LOCATION
    return lambda ne: ne != S.ETYPE_PERSON  # demonstrative


def doc_triples(doc_id: str, spans, prof: dict, stop: set) -> list[tuple]:
    """All triples of one document, resolved and carried over. Semantics
    identical to the relational plan (O12 join + O13/O14 windows)."""
    order = prof.get("order", "svo")

    # chunk all sentences
    sent_chunks: list[tuple[int, list[dict]]] = []
    for sent_id, sent in split_doc_sentences(spans, prof):
        cs = chunk_sentence(sent, prof)
        for c in cs:
            c["doc_id"], c["sent_id"] = doc_id, sent_id
        sent_chunks.append((sent_id, cs))

    # pronoun resolution over document-ordered noun/pronoun occurrences
    resolved: dict[tuple[int, int], tuple[str, int, int]] = {}
    seen: list[tuple[str, int]] = []
    for sent_id, cs in sent_chunks:
        for c in cs:
            if c["ctype"] not in (S.CTYPE_NOUN, S.CTYPE_PRONOUN):
                continue
            key = (sent_id, c["chunk_id"])
            if c["pro"] == S.PRO_NONE:
                resolved[key] = (c["main"], c["ne_type"], c["pro"])
                seen.append((c["main"], c["ne_type"]))
            else:
                want = _compatible(c["pro"])
                ante = next((e for e in reversed(seen) if want(e[1])), None)
                if ante is None and seen:
                    ante = seen[-1]
                if ante is None:
                    resolved[key] = (c["main"], c["ne_type"], c["pro"])
                else:
                    resolved[key] = (ante[0], ante[1], c["pro"])

    # triples + carryover
    out: list[tuple] = []
    carried: tuple[str, int] | None = None
    for sent_id, cs in sent_chunks:
        for t in triples_from_chunklist(cs, order, stop):
            (d, sid, pred_id, pred, subj, subj_id, obj, obj_id,
             neg, pas, tense) = t
            subj_ne = obj_ne = S.ETYPE_UNKNOWN
            subj_pro = obj_pro = S.PRO_NONE
            if subj is not None:
                subj, subj_ne, subj_pro = resolved.get(
                    (sid, subj_id), (subj, S.ETYPE_UNKNOWN, S.PRO_NONE)
                )
            elif carried is not None:
                subj, subj_ne = carried
            if obj is not None:
                obj, obj_ne, obj_pro = resolved.get(
                    (sid, obj_id), (obj, S.ETYPE_UNKNOWN, S.PRO_NONE)
                )
            if subj is not None:
                carried = (subj, subj_ne)
            out.append(
                (d, sid, pred_id, pred, subj, subj_id, obj, obj_id,
                 neg, pas, tense, subj_ne, obj_ne, subj_pro, obj_pro)
            )
    return out


_COLS = [
    "doc_id", "sent_id", "pred_id", "pred", "subj", "subj_id", "obj",
    "obj_id", "negative", "passive", "tense", "subj_ne", "obj_ne",
    "subj_pro", "obj_pro",
]
_COLS_LINKED = _COLS + ["subj_ne_linked", "obj_ne_linked", "subj_canon", "obj_canon"]


def extract_triples_fused(docs_spans, prof: dict, canon_bc=None,
                          vectorized: bool = True):
    """documents(doc_id, spans) → resolved triples, one Arrow pass.

    With ``canon_bc`` (a Spark broadcast of canon.alias_canonical_map's
    dict), entity linking + canonicalization also happen in the same
    pass — O19's broadcast dictionary shipped as a broadcast variable
    rather than a join build side. Output then includes
    subj_canon/obj_canon and alias-derived entity types.

    The default executor body is the columnar batch implementation
    (operators/vchunk.py::fused_batch — whole-batch numpy passes, no
    per-row Python [B BASELINE.json:15], both profiles — r2 added the
    JA columnar twin); this module's per-document functions are the
    executable spec it is tested identical against
    (tests/test_vchunk_parity.py)."""
    stop = set(prof.get("stop_mains", ()))
    use_vec = vectorized

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from naruhodo_spark.operators import vchunk as V

        canon = canon_bc.value if canon_bc is not None else None
        for pdf in batches:
            if use_vec:
                yield V.fused_batch(pdf, prof, stop, canon)
                continue
            rows: list[tuple] = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                rows.extend(doc_triples(doc_id, spans, prof, stop))
            if canon is None:
                yield pd.DataFrame(rows, columns=_COLS)
                continue
            linked: list[tuple] = []
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
            yield pd.DataFrame(linked, columns=_COLS_LINKED)

    schema = FUSED_TRIPLES_LINKED if canon_bc is not None else FUSED_TRIPLES
    return docs_spans.mapInPandas(fn, schema=schema)
