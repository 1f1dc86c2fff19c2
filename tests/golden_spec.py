"""Executable golden spec (SURVEY.md §5.1).

The reference library has no test corpus (its verification artifacts are
README/demo sentences and the viewer), so the "reference graphs" of the
metric are regenerable artifacts: this module is a *driver-side,
pure-Python, independent* implementation of the pipeline semantics —
sentence split, pronoun resolution, subject carryover, alias linking and
connected components are all re-implemented here without Spark (the
chunker and per-sentence triple rules are shared with the engine on
purpose: they ARE the spec, unit-tested separately).

Golden files under tests/golden/ are snapshots of this spec over the
deterministic synth corpus; the Spark pipeline is gated at P/R ≥ 0.95
against them ([B] BASELINE.json:2).
"""

from __future__ import annotations

import re
from collections import Counter

from naruhodo_spark import lang as L
from naruhodo_spark import schemas as S
from naruhodo_spark import synth
from naruhodo_spark.operators.chunk import chunk_sentence_en
from naruhodo_spark.operators.triples import triples_from_chunklist

SENT_STRIDE = 1000
_WS = re.compile(r"\s+")
_BRACKETS = re.compile(r"(《[^》]*》|【[^】]*】|（[^）]*）|\([^)]*\)|\[[^\]]*\])")


def sentences_of_doc(spans: list[dict]) -> list[tuple[int, str]]:
    out = []
    span_pos = -1
    for sp in spans:
        if sp["kind"] != "text":
            continue
        span_pos += 1
        txt = _BRACKETS.sub("", sp["text"])
        txt = _WS.sub(" ", txt).strip().lower()
        for sent_pos, sent in enumerate(re.split(r"[.!?]+", txt)):
            sent = sent.strip()
            if sent:
                out.append((span_pos * SENT_STRIDE + sent_pos, sent))
    return out


def _resolve_occurrences(occs: list[dict]) -> dict[tuple[int, int], tuple[str, int]]:
    """Mirror of the Spark window (O13): nearest preceding compatible
    entity over (sent_id, chunk_id) order."""
    resolved = {}
    seen: list[tuple[str, int]] = []  # (main, ne) of non-pronoun entities
    for o in sorted(occs, key=lambda x: (x["sent_id"], x["chunk_id"])):
        key = (o["sent_id"], o["chunk_id"])
        if o["pro"] == S.PRO_NONE:
            resolved[key] = (o["main"], o["ne_type"])
            seen.append((o["main"], o["ne_type"]))
            continue
        if o["pro"] == S.PRO_PERSONAL:
            want = lambda ne: ne == S.ETYPE_PERSON
        elif o["pro"] == S.PRO_LOCATIVE:
            want = lambda ne: ne == S.ETYPE_LOCATION
        else:  # demonstrative
            want = lambda ne: ne != S.ETYPE_PERSON
        ante = next((e for e in reversed(seen) if want(e[1])), None)
        if ante is None and seen:
            ante = seen[-1]
        resolved[key] = ante if ante else (o["main"], o["ne_type"])
    return resolved


class _UnionFind:
    def __init__(self):
        self.p: dict[str, str] = {}

    def find(self, x: str) -> str:
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def _min_label_components(edges: list[tuple[str, str]]) -> dict[str, str]:
    uf = _UnionFind()
    for a, b in edges:
        uf.union(a, b)
    # min node id per component
    members: dict[str, list[str]] = {}
    for n in list(uf.p):
        members.setdefault(uf.find(n), []).append(n)
    out = {}
    for root, ms in members.items():
        lab = min(ms)
        for m in ms:
            out[m] = lab
    return out


def expected_doc_triples(doc_id: str, spans: list[dict], prof: dict) -> list[dict]:
    """Raw triples after pronoun resolution + subject carryover (pre-link)."""
    stop = set(prof["stop_mains"])
    all_chunks = []
    for sent_id, sent in sentences_of_doc(spans):
        for c in chunk_sentence_en(sent, prof):
            c = dict(c)
            c["doc_id"], c["sent_id"] = doc_id, sent_id
            all_chunks.append(c)

    occs = [
        c for c in all_chunks if c["ctype"] in (S.CTYPE_NOUN, S.CTYPE_PRONOUN)
    ]
    res = _resolve_occurrences(occs)

    triples = []
    by_sent: dict[int, list[dict]] = {}
    for c in all_chunks:
        by_sent.setdefault(c["sent_id"], []).append(c)
    for sent_id in sorted(by_sent):
        triples.extend(
            triples_from_chunklist(by_sent[sent_id], prof["order"], stop)
        )

    out = []
    carried: tuple[str, int] | None = None
    for t in sorted(triples, key=lambda t: (t[1], t[2])):
        (d, sent_id, pred_id, pred, subj, subj_id, obj, obj_id, neg, pas, tense) = t
        subj_ne = obj_ne = S.ETYPE_UNKNOWN
        if subj is not None:
            subj, subj_ne = res.get((sent_id, subj_id), (subj, S.ETYPE_UNKNOWN))
        elif carried is not None:
            subj, subj_ne = carried
        if obj is not None:
            obj, obj_ne = res.get((sent_id, obj_id), (obj, S.ETYPE_UNKNOWN))
        if subj is not None:
            carried = (subj, subj_ne)
        out.append(
            dict(
                doc_id=d, sent_id=sent_id, pred_id=pred_id, pred=pred,
                subj=subj, obj=obj, subj_ne=subj_ne, obj_ne=obj_ne,
                negative=neg, passive=pas, tense=tense,
            )
        )
    return out


def expected_corpus(n_docs: int, hot_frac: float = 0.0):
    """(triples, ksg_edge_counter, span_seqs) for the synth corpus."""
    prof = L.get_profile("en")
    alias_map = {a: c for a, c, _ in synth.alias_rows()}
    labels = _min_label_components(
        [(a, c) for a, c, _ in synth.alias_rows()]
    )

    def canon(x: str | None) -> str | None:
        if x is None:
            return None
        base = alias_map.get(x.lower(), x.lower())
        return labels.get(base, base)

    triples: list[dict] = []
    edges: Counter = Counter()
    span_seqs: dict[str, list[tuple]] = {}
    for i in range(n_docs):
        doc_id, spans = synth.make_doc(i, synth.SEED, hot_frac)
        span_seqs[doc_id] = [
            (sp["kind"], sp["text"], sp["media_ref"]) for sp in spans
        ]
        ts = expected_doc_triples(doc_id, spans, prof)
        triples.extend(ts)
        for t in ts:
            if t["subj"] is None:
                continue
            edges[(canon(t["subj"]), t["pred"], canon(t["obj"]) or "")] += 1
    return triples, edges, span_seqs
