"""Vectorized (columnar) chunkers + fused extraction — the batch twins
of operators/chunk.py::chunk_sentence_en/_ja and operators/fused.py.

The row-wise functions are the *executable spec* (they mirror the
reference's per-sentence processing and generate the golden fixtures);
this module re-expresses the same state machine as whole-batch
pandas/numpy array passes so the Arrow batches Spark hands a pandas UDF
are processed at C speed instead of a Python loop per token:

- tokenization             → one C-level str.split over the sentinel-
  joined batch; pd.factorize so stripping/classification run once per
  UNIQUE token, then scatter by inverse index
- modifier/aux buffering   → "next emission of type X within sentence"
  via segment-biased np.maximum/minimum.accumulate scans; a buffered
  token attaches to its next same-type emission unless a conjunction
  (which resets buffers in the spec) comes first
- chunk surfaces           → contiguous-run joins (attachment targets
  are non-decreasing, so each target's tokens form one run)
- dependency links         → nearest-predicate via the same scans
- triples / pronoun windows / subject carryover (fused path)
  → flat gidx(seg, chunk_id) addressing + numpy gathers/scatters
  (ufunc.at argmax/argmin per predicate), mirroring
  triples.triples_from_chunklist and fused.doc_triples

Equality with the row-wise spec is asserted by
tests/test_vchunk_parity.py across golden, synthetic, testdata and
randomized corpora (EN), and tests/test_vchunk_ja.py (JA — r2 added the
columnar SOV twin chunk_arrays_ja, closing the last row-wise hot path).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from naruhodo_spark import schemas as S

_CAT_MOD, _CAT_VRB, _CAT_PREP, _CAT_CONJ, _CAT_VERB, _CAT_NOUN = range(6)

_PUNCT = ".,;:!?\"'()[]{}"

_CHUNK_COLS = [f.name for f in S.CHUNKS.fields]


def _ffill(seg: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Per-segment forward fill of a float array with NaN gaps, pure
    numpy: bias each value by seg*L (L dominating the value range) so a
    running maximum cannot leak across segment boundaries. seg must be
    sorted ascending. O(n), no Python per group."""
    n = len(vals)
    if n == 0:
        return vals
    L = float(n + 2)
    biased = np.where(np.isnan(vals), -1.0, vals + seg * L)
    acc = np.maximum.accumulate(biased)
    ok = acc >= seg * L  # a fill from an earlier segment is out of range
    return np.where(ok, acc - seg * L, np.nan)


def _bfill(seg: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Per-segment backward fill (next valid value), pure numpy: running
    minimum over the reversed biased array."""
    n = len(vals)
    if n == 0:
        return vals
    L = float(n + 2)
    big = (seg.max() + 2) * L
    biased = np.where(np.isnan(vals), big, vals + seg * L)
    acc = np.minimum.accumulate(biased[::-1])[::-1]
    ok = acc < (seg + 1) * L  # a fill from a later segment is out of range
    return np.where(ok, acc - seg * L, np.nan)


def _run_bounds(tgt: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Start/end indices of the contiguous equal-value runs of a sorted
    target array (attachment targets are non-decreasing by construction:
    an earlier buffered token attaches to an earlier-or-same emission)."""
    starts = np.flatnonzero(np.r_[True, tgt[1:] != tgt[:-1]])
    ends = np.r_[starts[1:], len(tgt)]
    return starts, ends


def _run_join(tgt: np.ndarray, toks: np.ndarray, sep: str = " "):
    """sep.join of each contiguous run → (run_target, joined) arrays."""
    if len(tgt) == 0:
        return tgt, np.array([], dtype=object)
    starts, ends = _run_bounds(tgt)
    lst = toks.tolist()
    joined = np.array(
        [sep.join(lst[a:b]) for a, b in zip(starts, ends)], dtype=object
    )
    return tgt[starts], joined


def _run_any(tgt: np.ndarray, flags: np.ndarray):
    if len(tgt) == 0:
        return tgt, flags
    starts, ends = _run_bounds(tgt)
    return tgt[starts], np.logical_or.reduceat(flags, starts)


def _map_onto(pos: np.ndarray, keys: np.ndarray, vals: np.ndarray, default):
    """vals[searchsorted(keys, pos)] with a default for misses — the
    vectorized replacement for Series.reindex on unique sorted keys."""
    if len(keys) == 0:
        return np.full(len(pos), default, dtype=vals.dtype)
    i = np.searchsorted(keys, pos)
    i = np.clip(i, 0, len(keys) - 1)
    hit = keys[i] == pos
    out = np.full(len(pos), default, dtype=vals.dtype)
    out[hit] = vals[i[hit]]
    return out


def _empty_chunks() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "seg": np.array([], dtype=np.int64),
            "chunk_id": np.array([], dtype=np.int32),
            "parent": np.array([], dtype=np.int32),
            "surface": pd.Series([], dtype=object),
            "main": pd.Series([], dtype=object),
            "func": pd.Series([], dtype=object),
            "ctype": np.array([], dtype=np.int32),
            "ne_type": np.array([], dtype=np.int32),
            "pro": np.array([], dtype=np.int32),
            "negative": np.array([], dtype=bool),
            "passive": np.array([], dtype=bool),
            "tense": pd.Series([], dtype=object),
        }
    )


def _attach_parents(chk: pd.DataFrame) -> pd.DataFrame:
    """Vectorized chunk._assign_parents over a (seg, chunk_id)-sorted
    chunk frame: predicates chain forward (last predicate = root),
    non-predicates attach to the nearest predicate by chunk distance
    (tie → preceding); with no predicate, everything hangs off the last
    chunk. Shared by the EN and JA columnar chunkers."""
    cseg = chk["seg"].to_numpy()
    ck = chk["chunk_id"].to_numpy().astype(np.float64)
    is_pred = chk["ctype"].isin((S.CTYPE_VERB, S.CTYPE_ADJ)).to_numpy()
    pk = np.where(is_pred, ck, np.nan)
    prev_incl = _ffill(cseg, pk)
    next_incl = _bfill(cseg, pk)
    next_strict = np.r_[next_incl[1:], np.nan]
    next_strict[np.r_[cseg[1:] != cseg[:-1], True]] = np.nan
    cstarts, cends = _run_bounds(cseg)
    sizes = cends - cstarts
    seg_size = np.repeat(sizes, sizes).astype(np.float64)
    has_pred = np.repeat(np.logical_or.reduceat(is_pred, cstarts), sizes)

    a, b = prev_incl, next_incl
    # non-predicates: nearest predicate by chunk distance, tie → preceding
    near = np.where(
        np.isnan(a),
        b,
        np.where(np.isnan(b), a, np.where((ck - a) <= (b - ck), a, b)),
    )
    parent = np.where(
        is_pred,
        np.where(np.isnan(next_strict), -1.0, next_strict),
        np.where(
            has_pred,
            near,
            np.where(ck != seg_size - 1, seg_size - 1.0, -1.0),
        ),
    )
    chk["parent"] = np.nan_to_num(parent, nan=-1.0).astype(np.int32)
    chk["chunk_id"] = chk["chunk_id"].astype(np.int32)
    return chk


def chunk_arrays_en(
    seg: np.ndarray, sentences: pd.Series, prof: dict
) -> pd.DataFrame:
    """All chunks of a batch of sentences, columnar.

    seg: int ordinal per sentence (0..n-1, ascending). Returns a frame
    with columns [seg, chunk_id, parent, surface, main, func, ctype,
    ne_type, pro, negative, passive, tense] sorted by (seg, chunk_id),
    exactly matching chunk.chunk_sentence_en per sentence.
    """
    empty = _empty_chunks()
    if len(sentences) == 0:
        return empty

    # --- tokenize: join the batch with a sentinel token so whitespace
    # splitting is ONE C-level str.split; sentinel positions recover the
    # sentence boundaries. Identical to chunk._tokens per sentence.
    # NUL is NOT str.split() whitespace (unlike \x1c-\x1f, which are!)
    # and survives the punctuation strip; if the input text ever contains
    # a bare NUL token the sentinel count breaks and we fall back to the
    # per-sentence tokenizer.
    sent_list = sentences.tolist()
    joined = " \x00 ".join(sent_list)
    raw = joined.split()
    if not raw:
        return empty
    # factorize once (C-level hashing), then strip punctuation and
    # classify only the UNIQUE raw tokens — per-token Python vanishes
    inv_all, uniq_raw = pd.factorize(np.array(raw))
    uniq_stripped = np.array([u.strip(_PUNCT) for u in uniq_raw], dtype=object)
    s_hits = np.flatnonzero(uniq_raw == "\x00")
    s_id = int(s_hits[0]) if len(s_hits) else -1
    is_break = inv_all == s_id
    if int(is_break.sum()) == len(sent_list) - 1:
        keep = (uniq_stripped[inv_all] != "") & ~is_break
        # sentence ordinal of each kept token = sentinels seen before it
        tseg = seg[np.cumsum(is_break)[keep]]
        tinv = inv_all[keep]
    else:  # pathological input (NUL tokens) — safe per-sentence path
        toks_per = [
            [t for t in (r.strip(_PUNCT) for r in s.split()) if t]
            for s in sent_list
        ]
        counts = np.fromiter(map(len, toks_per), np.int64, len(toks_per))
        tseg = np.repeat(seg, counts)
        flat = np.array([t for lst in toks_per for t in lst], dtype=object)
        tinv, uniq_o = pd.factorize(flat)
        uniq_stripped = np.asarray(uniq_o, dtype=object)
    tok = uniq_stripped[tinv]
    n = len(tok)
    if n == 0:
        return empty
    pos = np.arange(n)

    # --- classify (same priority as the row-wise elif chain)
    catd = {
        w: {"det": _CAT_MOD, "adj": _CAT_MOD, "aux": _CAT_VRB, "neg": _CAT_VRB,
            "prep": _CAT_PREP, "conj": _CAT_CONJ}[c]
        for w, c in prof["cls"].items()
    }
    vf = prof["verb_forms"]

    def _cat(t, _g=catd.get, _vf=vf):
        c = _g(t)
        if c is not None:
            return c
        if t in _vf or (len(t) > 3 and t.endswith("ed")):
            return _CAT_VERB
        return _CAT_NOUN

    # classify per UNIQUE token and scatter — real corpora draw from a
    # vocabulary orders of magnitude smaller than the token stream
    uniq, inv = uniq_stripped, tinv
    cat = np.fromiter(map(_cat, uniq), np.int8, len(uniq))[inv]

    is_em = cat >= _CAT_CONJ
    # chunk ordinal of each emission within its sentence: global emission
    # cumsum minus the segment's starting offset
    cum = np.cumsum(is_em.astype(np.int64))
    seg_start = np.flatnonzero(np.r_[True, tseg[1:] != tseg[:-1]])
    base = (cum - is_em)[seg_start]
    k_all = cum - np.repeat(base, np.diff(np.r_[seg_start, n])) - 1

    # --- next emission of each type (nan = none) — buffered tokens attach
    # to the next same-type emission unless a conj (buffer reset) is nearer
    fpos = pos.astype(np.float64)
    nxt_noun = _bfill(tseg, np.where(is_em & (cat == _CAT_NOUN), fpos, np.nan))
    nxt_verb = _bfill(tseg, np.where(cat == _CAT_VERB, fpos, np.nan))
    nxt_conj = _bfill(tseg, np.where(cat == _CAT_CONJ, fpos, np.nan))

    no_conj = np.isnan(nxt_conj)
    ok_noun = ~np.isnan(nxt_noun) & (no_conj | (nxt_noun < nxt_conj))
    ok_verb = ~np.isnan(nxt_verb) & (no_conj | (nxt_verb < nxt_conj))

    mod_attach = (cat == _CAT_MOD) & ok_noun
    mod_left = (cat == _CAT_MOD) & np.isnan(nxt_noun) & no_conj
    vrb_attach = (cat == _CAT_VRB) & ok_verb
    vrb_left = (cat == _CAT_VRB) & np.isnan(nxt_verb) & no_conj
    # buffered tokens whose next CONJ precedes their target FLUSH into a
    # predicate-adjective / dangling-aux chunk emitted just before the
    # conjunction (spec: chunk_sentence_en flush_buffers at conj — the
    # old reset dropped the "is ancient" predication in
    # "the castle is ancient but ...")
    mod_flush = (cat == _CAT_MOD) & ~ok_noun & ~no_conj
    vrb_flush = (cat == _CAT_VRB) & ~ok_verb & ~no_conj
    prep_attach = (cat == _CAT_PREP) & ok_noun

    negations = prof["negations"]
    passive_aux = prof["passive_aux"]

    # --- buffered-token joins onto their target emission position.
    # Targets are non-decreasing in token order, so each target's tokens
    # form a contiguous run — run-wise numpy ops, no per-group Python.
    mj_tgt, mj_join = _run_join(nxt_noun[mod_attach].astype(np.int64), tok[mod_attach])
    vj_tgt, vj_join = _run_join(nxt_verb[vrb_attach].astype(np.int64), tok[vrb_attach])
    vtok = tok[vrb_attach]
    vflags_neg = np.fromiter((t in negations for t in vtok), bool, len(vtok))
    vflags_pas = np.fromiter((t in passive_aux for t in vtok), bool, len(vtok))
    vn_tgt, vn_any = _run_any(nxt_verb[vrb_attach].astype(np.int64), vflags_neg)
    vp_tgt, vp_any = _run_any(nxt_verb[vrb_attach].astype(np.int64), vflags_pas)
    p_tgt_all = nxt_noun[prep_attach].astype(np.int64)
    if len(p_tgt_all):
        p_starts, p_ends = _run_bounds(p_tgt_all)
        pl_tgt, pl_tok = p_tgt_all[p_starts], tok[prep_attach][p_ends - 1]
    else:
        pl_tgt, pl_tok = p_tgt_all, np.array([], dtype=object)

    # --- emission chunks, columnar
    em = is_em
    epos = pos[em]
    ecat = cat[em]
    etok_a = tok[em]
    eseg = tseg[em]
    ek = k_all[em]
    m = len(epos)

    is_conj_e = ecat == _CAT_CONJ
    is_verb_e = ecat == _CAT_VERB
    is_noun_e = ecat == _CAT_NOUN

    past_forms = prof["past_forms"]
    prod, ned = prof["pro"], prof["ne"]
    nu = len(uniq)
    past_u = np.fromiter(
        ((t in past_forms or t.endswith("ed")) for t in uniq), bool, nu
    )
    pro_u = np.fromiter((prod.get(t, S.PRO_NONE) for t in uniq), np.int32, nu)
    ne_u = np.fromiter((ned.get(t, S.ETYPE_UNKNOWN) for t in uniq), np.int32, nu)
    einv = inv[em]
    past = past_u[einv]
    pro_v = pro_u[einv]
    ne_v = ne_u[einv]

    mod_pre = _map_onto(epos, mj_tgt, mj_join, "")
    vrb_pre = _map_onto(epos, vj_tgt, vj_join, "")
    neg_v = _map_onto(epos, vn_tgt, vn_any, False)
    pas_v = _map_onto(epos, vp_tgt, vp_any, False)
    func_v = _map_onto(epos, pl_tgt, pl_tok, "")

    surface = etok_a.copy()
    vmask = is_verb_e & (vrb_pre != "")
    surface[vmask] = [
        p + " " + t for p, t in zip(vrb_pre[vmask], etok_a[vmask])
    ]
    nmask = is_noun_e & (mod_pre != "")
    surface[nmask] = [
        p + " " + t for p, t in zip(mod_pre[nmask], etok_a[nmask])
    ]

    lemma_u = np.array([vf.get(t, t) for t in uniq], dtype=object)
    main = etok_a.copy()
    main[is_verb_e] = lemma_u[einv[is_verb_e]]

    ctype = np.where(
        is_conj_e,
        S.CTYPE_CONNECT,
        np.where(
            is_verb_e,
            S.CTYPE_VERB,
            np.where(pro_v != S.PRO_NONE, S.CTYPE_PRONOUN, S.CTYPE_NOUN),
        ),
    ).astype(np.int32)

    edf = pd.DataFrame(
        {
            "seg": eseg,
            "chunk_id": ek.astype(np.int64),
            "surface": surface,
            "main": main,
            "func": np.where(is_noun_e, func_v, ""),
            "ctype": ctype,
            "ne_type": np.where(is_noun_e, ne_v, S.ETYPE_UNKNOWN).astype(np.int32),
            "pro": np.where(is_noun_e, pro_v, S.PRO_NONE).astype(np.int32),
            "negative": np.where(is_verb_e, neg_v, False),
            "passive": np.where(is_verb_e, pas_v & past, False),
            "tense": np.where(is_verb_e & past, "past", "present"),
        }
    )

    edf["_sortpos"] = epos.astype(np.float64)

    extra_cols = ["seg", "surface", "main", "func", "ctype",
                  "ne_type", "pro", "negative", "passive", "tense",
                  "_sortpos"]
    extra_rows: list[tuple] = []

    def _buffer_rows(m_seg_or_pos_mods, m_tok, v_seg_or_pos, v_tok,
                     sortpos_of, seg_of):
        """Shared flush logic (conjunction and EOS): per group key, a
        buffered copula+adjective becomes one ADJ chunk (aux prefix,
        negation from aux), a dangling aux an OTHER chunk — exactly the
        spec's flush_buffers. Keys are non-decreasing so runs are
        contiguous; only sentences that actually buffer pay Python."""
        vj: dict[int, str] = {}
        vl_: dict[int, str] = {}
        vn: dict[int, bool] = {}
        if v_seg_or_pos.size:
            vs, ve = _run_bounds(v_seg_or_pos)
            vlst = v_tok.tolist()
            for a, b in zip(vs, ve):
                key = int(v_seg_or_pos[a])
                vj[key] = " ".join(vlst[a:b])
                vl_[key] = vlst[b - 1]
                vn[key] = any(t in negations for t in vlst[a:b])
        adj_keys: set[int] = set()
        if m_seg_or_pos_mods.size:
            ms, me = _run_bounds(m_seg_or_pos_mods)
            mlst = m_tok.tolist()
            for a, b in zip(ms, me):
                key = int(m_seg_or_pos_mods[a])
                adj_keys.add(key)
                mj = " ".join(mlst[a:b])
                surf = vj[key] + " " + mj if key in vj else mj
                extra_rows.append(
                    (seg_of(key), surf, mlst[b - 1], "", S.CTYPE_ADJ,
                     S.ETYPE_UNKNOWN, S.PRO_NONE, vn.get(key, False), False,
                     "present", sortpos_of(key))
                )
        for key, v in vj.items():
            if key not in adj_keys:
                extra_rows.append(
                    (seg_of(key), v, vl_[key], "", S.CTYPE_OTHER,
                     S.ETYPE_UNKNOWN, S.PRO_NONE, False, False, "present",
                     sortpos_of(key))
                )

    # flush-at-conjunction: keyed by the CONJ token position; the chunk
    # sorts just before the conjunction emission (spec order)
    _buffer_rows(
        nxt_conj[mod_flush].astype(np.int64), tok[mod_flush],
        nxt_conj[vrb_flush].astype(np.int64), tok[vrb_flush],
        sortpos_of=lambda p_: p_ - 0.5,
        seg_of=lambda p_: int(tseg[p_]),
    )
    # EOS tail: keyed by segment; sorts after every in-sentence position
    _buffer_rows(
        tseg[mod_left], tok[mod_left],
        tseg[vrb_left], tok[vrb_left],
        sortpos_of=lambda s_: float(n),
        seg_of=lambda s_: s_,
    )

    if extra_rows:
        tdf = pd.DataFrame(extra_rows, columns=extra_cols).astype(
            {"ctype": np.int32, "ne_type": np.int32, "pro": np.int32}
        )
        chk = pd.concat([edf.drop(columns=["chunk_id"]), tdf],
                        ignore_index=True)
    else:
        chk = edf.drop(columns=["chunk_id"])
    chk = chk.sort_values(["seg", "_sortpos"], kind="stable",
                          ignore_index=True)
    if not len(chk):
        return empty
    # renumber AFTER flush insertion so ids match the spec's emit order
    chk["chunk_id"] = chk.groupby("seg").cumcount().astype(np.int64)
    chk = chk.drop(columns=["_sortpos"])
    return _attach_parents(chk)


def chunk_arrays_ja(
    seg: np.ndarray, sentences: pd.Series, prof: dict
) -> pd.DataFrame:
    """Columnar twin of chunk.chunk_sentence_ja (the r01 VERDICT's last
    row-wise hot path): whole-batch numpy passes over the SOV particle
    profile, raw or pre-segmented input.

    - sentence-level factorize: duplicate sentences tokenize/segment once
      (segment_ja is the only per-unique-sentence Python left — it is
      char-level by nature)
    - token-level factorize: classification (particle / pronoun /
      negation / verb-suffix / noun) runs once per UNIQUE token
    - particle attachment: a particle at sentence position > 0 attaches
      to the PREVIOUS emission (after the first token a chunk always
      exists, so this is exactly the row-wise "if chunks" guard);
      attached particles form contiguous runs per emission → run-wise
      ''.join for the surface suffix, run-last for func
    - a particle AT sentence start emits as a noun chunk (the row-wise
      elif chain falls through: particles are not pronouns and match no
      negation/verb suffix)

    Equality with the row-wise spec is asserted by
    tests/test_vchunk_parity.py (fixtures + randomized token streams).
    """
    empty = _empty_chunks()
    if len(sentences) == 0:
        return empty

    from naruhodo_spark.operators.jaseg import ja_tokens

    def toks_of(s: str) -> list[str]:
        return ja_tokens(s, prof, _PUNCT)

    sinv, suniq = pd.factorize(pd.Index(sentences.tolist()))
    utoks = [toks_of(s) for s in suniq]
    toks_per = [utoks[i] for i in sinv]
    counts = np.fromiter(map(len, toks_per), np.int64, len(toks_per))
    tseg = np.repeat(seg, counts)
    flat = [t for lst in toks_per for t in lst]
    if not flat:
        return empty
    tinv, uniq_o = pd.factorize(pd.Index(flat))
    uniq = np.asarray(uniq_o, dtype=object)
    tok = uniq[tinv]
    n = len(tok)
    pos = np.arange(n)

    # --- per-unique-token classification (row-wise elif priority)
    nu = len(uniq)
    particles = prof["particles"]
    prod = prof["pro"]
    negs = tuple(prof["negations"])
    negx = prof.get("neg_exceptions", frozenset())
    sufs = tuple(prof["verb_suffixes"])
    is_part_u = np.fromiter((t in particles for t in uniq), bool, nu)
    pro_u = np.fromiter((prod.get(t, S.PRO_NONE) for t in uniq), np.int32, nu)
    ned = prof.get("ne", {})
    ne_u = np.fromiter(
        (ned.get(t, S.ETYPE_UNKNOWN) for t in uniq), np.int32, nu
    )
    # exception lexicon: lexical ない/ぬ enders stay PREDICATES but not
    # negated; ず-ending adverbs drop out of the negation class entirely
    # (they fall through to the noun default, mirroring the spec)
    is_negx_pred_u = np.fromiter(
        (t in negx and not t.endswith("ず") for t in uniq), bool, nu
    )
    is_neg_u = np.fromiter(
        (t.endswith(negs) and t not in negx for t in uniq), bool, nu
    )
    is_suf_u = np.fromiter((t.endswith(sufs) for t in uniq), bool, nu)
    past_u = np.fromiter((t.endswith(("た", "だ")) for t in uniq), bool, nu)
    pas_u = np.fromiter(
        (t.endswith(("れた", "れる", "られた", "られる")) for t in uniq), bool, nu
    )

    # first token of each sentence (segment starts)
    is_first = np.r_[True, tseg[1:] != tseg[:-1]]
    att_part = is_part_u[tinv] & ~is_first  # attaches to previous emission
    em = ~att_part

    # chunk ordinal of each emission within its sentence
    cum = np.cumsum(em.astype(np.int64))
    seg_start = np.flatnonzero(is_first)
    base = (cum - em)[seg_start]
    k_all = cum - np.repeat(base, np.diff(np.r_[seg_start, n])) - 1

    # --- particle runs onto their previous emission
    fpos = pos.astype(np.float64)
    prev_em = _ffill(tseg, np.where(em, fpos, np.nan))
    tgt = prev_em[att_part].astype(np.int64)
    pj_tgt, pj_join = _run_join(tgt, tok[att_part], sep="")
    if len(tgt):
        p_starts, p_ends = _run_bounds(tgt)
        pl_tgt, pl_tok = tgt[p_starts], tok[att_part][p_ends - 1]
    else:
        pl_tgt, pl_tok = tgt, np.array([], dtype=object)

    # --- emission chunks
    epos = pos[em]
    eseg = tseg[em]
    ek = k_all[em]
    einv = tinv[em]
    etok = tok[em]

    pro_v = pro_u[einv]
    is_pron_e = pro_v != S.PRO_NONE
    is_negv_e = ~is_pron_e & is_neg_u[einv]
    is_verb_e = is_negv_e | (
        ~is_pron_e & (is_suf_u[einv] | is_negx_pred_u[einv])
    )

    suffix = _map_onto(epos, pj_tgt, pj_join, "")
    func_v = _map_onto(epos, pl_tgt, pl_tok, "")
    surface = etok.copy()
    smask = suffix != ""
    surface[smask] = [t + s for t, s in zip(etok[smask], suffix[smask])]

    ctype = np.where(
        is_pron_e,
        S.CTYPE_PRONOUN,
        np.where(is_verb_e, S.CTYPE_VERB, S.CTYPE_NOUN),
    ).astype(np.int32)
    # tense: pronoun branch hardcodes present; negation/verb branches use
    # the た/だ suffix; nouns present
    tense = np.where(is_verb_e & past_u[einv], "past", "present")

    chk = pd.DataFrame(
        {
            "seg": eseg,
            "chunk_id": ek.astype(np.int64),
            "surface": surface,
            "main": etok,
            "func": func_v,
            "ctype": ctype,
            # NE only on noun chunks — pronoun/verb emissions keep
            # UNKNOWN, mirroring the row-wise spec's emit rule
            "ne_type": np.where(
                is_pron_e | is_verb_e, S.ETYPE_UNKNOWN, ne_u[einv]
            ).astype(np.int32),
            "pro": np.where(is_pron_e, pro_v, S.PRO_NONE).astype(np.int32),
            "negative": is_negv_e,
            # row-wise emit computes pas_flag(surface) for EVERY chunk
            # from the surface AT EMIT TIME (before particles append)
            "passive": pas_u[einv],
            "tense": tense,
        }
    )
    # already in (seg, chunk_id) order by construction
    return _attach_parents(chk)


def chunk_batch(pdf: pd.DataFrame, prof: dict) -> pd.DataFrame:
    """(doc_id, sent_id, sentence) batch → S.CHUNKS-shaped batch.
    Dispatches on the profile: EN/SVO → chunk_arrays_en, JA/SOV →
    chunk_arrays_ja."""
    seg = np.arange(len(pdf))
    arrays = chunk_arrays_ja if prof.get("lang") == "ja" else chunk_arrays_en
    chk = arrays(seg, pdf["sentence"].astype(str), prof)
    idx = chk["seg"].to_numpy()
    out = pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].to_numpy()[idx],
            "sent_id": pdf["sent_id"].to_numpy()[idx].astype(np.int32),
            "chunk_id": chk["chunk_id"],
            "parent": chk["parent"],
            "surface": chk["surface"],
            "main": chk["main"],
            "func": chk["func"],
            "ctype": chk["ctype"],
            "ne_type": chk["ne_type"],
            "pro": chk["pro"],
            "negative": chk["negative"],
            "passive": chk["passive"],
            "tense": chk["tense"],
        }
    )
    return out[_CHUNK_COLS]


# ---------------------------------------------------------------------
# Fused batch path: spans docs → resolved / carried / linked triples
# ---------------------------------------------------------------------

_WS = re.compile(r"\s+", re.ASCII)  # Java-\s semantics, see fused.py
_BRACKETS = re.compile(r"(《[^》]*》|【[^】]*】|（[^）]*）|\([^)]*\)|\[[^\]]*\])")
_BRACKET_OPEN = re.compile(r"[《【（(\[]")


def _split_sentences_batch(pdf: pd.DataFrame, prof: dict):
    """Vectorized mirror of fused.split_doc_sentences over a batch.
    Returns (doc_ord per sentence, sent_id per sentence, sentences)."""
    from naruhodo_spark.operators.normalize import SENT_STRIDE

    doc_ord: list[int] = []
    span_pos: list[int] = []
    texts: list[str] = []
    for i, spans in enumerate(pdf["spans"]):
        sp_pos = -1
        # offset order == document order (mirror of split_doc_sentences)
        for sp in sorted(spans, key=lambda sp: sp["offset"]):
            if sp["kind"] != "text":
                continue
            sp_pos += 1
            doc_ord.append(i)
            span_pos.append(sp_pos)
            texts.append(sp["text"] or "")
    if not texts:
        z = np.array([], dtype=np.int64)
        return z, z, pd.Series([], dtype=object)

    s = pd.Series(texts)
    # the bracket-strip alternation is the priciest regex; most web text
    # has no brackets, so gate it behind a single-char-class contains()
    has_br = s.str.contains(_BRACKET_OPEN, regex=True)
    if has_br.any():
        s = s.mask(has_br, s[has_br].str.replace(_BRACKETS, "", regex=True))
    # NOTE no _CTRL pass: \s+ → " " makes [\n\r\t]+ → " " a no-op prefix
    s = s.str.replace(_WS, " ", regex=True).str.strip(" ")
    if prof.get("lang") != "ja":
        s = s.str.lower()
    parts = s.str.split(prof["sentence_re"], regex=True)
    meta = pd.DataFrame({"doc": doc_ord, "span_pos": span_pos})
    exploded = parts.explode()
    exploded = exploded[exploded.notna()]
    sent = exploded.str.strip(" ")
    keep = (sent != "").to_numpy()
    span_idx = exploded.index.to_numpy()[keep]
    sent = sent.to_numpy()[keep]
    # position of the sentence within its span (re.split order)
    sent_pos = (
        pd.Series(np.ones(len(exploded), dtype=np.int64), index=None)
        .groupby(exploded.index.to_numpy())
        .cumsum()
        .to_numpy()[keep]
        - 1
    )
    d = meta["doc"].to_numpy()[span_idx]
    sid = meta["span_pos"].to_numpy()[span_idx] * SENT_STRIDE + sent_pos
    return d, sid.astype(np.int64), pd.Series(sent)


def fused_batch(
    pdf: pd.DataFrame, prof: dict, stop: set, canon: dict | None
) -> pd.DataFrame:
    """One (doc_id, spans) Arrow batch → resolved/carried(/linked) triple
    rows, columnar. Mirrors fused.doc_triples over the whole batch, for
    BOTH profiles (EN/SVO positional roles, JA/SOV particle roles).

    All per-chunk addressing goes through a flat global index
    gidx(seg, chunk_id) = seg_offset[seg] + chunk_id (chunk ids are
    0..n-1 contiguous per sentence), so argument→predicate attachment,
    the deterministic subject/object choice, pronoun resolution, and
    carryover are plain numpy gathers/scatters — no joins, no per-row
    Python."""
    d_ord, sids, sents = _split_sentences_batch(pdf, prof)
    seg = np.arange(len(sents))
    arrays = chunk_arrays_ja if prof.get("lang") == "ja" else chunk_arrays_en
    chk = arrays(seg, sents, prof)
    nck = len(chk)

    cseg = chk["seg"].to_numpy()
    ck = chk["chunk_id"].to_numpy().astype(np.int64)
    cty = chk["ctype"].to_numpy()
    cmain = chk["main"].to_numpy()
    cfunc = chk["func"].to_numpy()
    cpar = chk["parent"].to_numpy().astype(np.int64)
    cne = chk["ne_type"].to_numpy().astype(np.int64)
    cpro = chk["pro"].to_numpy().astype(np.int64)

    counts = np.bincount(cseg, minlength=len(sents)) if nck else np.zeros(
        len(sents), dtype=np.int64
    )
    offs = np.r_[0, np.cumsum(counts)[:-1]] if len(counts) else counts
    gidx = offs[cseg] + ck if nck else ck

    is_pred_c = (cty == S.CTYPE_VERB) | (cty == S.CTYPE_ADJ)
    is_arg_c = (cty == S.CTYPE_NOUN) | (cty == S.CTYPE_PRONOUN)

    # --- argument→predicate attachment (spec: triples_from_chunklist)
    # khash-backed isin, not a per-chunk Python genexpr (cmain is the
    # full chunk array — everything else loops only over factorize uniques)
    is_stop = (
        pd.Series(cmain).isin(stop).to_numpy()
        if stop
        else np.zeros(nck, dtype=bool)
    )
    att = is_arg_c & ~is_stop & (cpar >= 0)
    par_g = np.where(att, offs[cseg] + cpar, 0)
    att &= is_pred_c[par_g]

    if prof.get("order") == "sov":
        # particle-driven roles (triples._role_col): が/は → subj,
        # を → obj, regardless of position
        role_subj = att & ((cfunc == "が") | (cfunc == "は"))
        role_obj = att & (cfunc == "を")
    else:
        bare = cfunc == ""
        role_subj = att & bare & (ck < cpar)
        role_obj = att & bare & (ck > cpar)

    # deterministic choice: nearest-preceding subject (max chunk_id),
    # nearest-following object (min chunk_id), scattered per predicate
    subj_of = np.full(nck, -1, dtype=np.int64)
    np.maximum.at(subj_of, par_g[role_subj], ck[role_subj])
    obj_of = np.full(nck, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(obj_of, par_g[role_obj], ck[role_obj])

    # --- pronoun resolution (O13), scattered onto all noun/pron chunks
    res_main = cmain.copy()
    res_ne = cne.copy()
    occ_idx = np.flatnonzero(is_arg_c)
    if len(occ_idx):
        odoc = d_ord[cseg[occ_idx]]
        omain = cmain[occ_idx]
        one = cne[occ_idx]
        opro = cpro[occ_idx]
        oi = np.arange(len(occ_idx), dtype=np.float64)
        is_ent = opro == S.PRO_NONE

        def last_idx(mask):
            return _ffill(odoc, np.where(mask, oi, np.nan))

        li_person = last_idx(is_ent & (one == S.ETYPE_PERSON))
        li_loc = last_idx(is_ent & (one == S.ETYPE_LOCATION))
        li_nonp = last_idx(is_ent & (one != S.ETYPE_PERSON))
        li_any = last_idx(is_ent)
        want = np.where(
            opro == S.PRO_PERSONAL,
            li_person,
            np.where(opro == S.PRO_LOCATIVE, li_loc, li_nonp),
        )
        ante = np.where(np.isnan(want), li_any, want)
        hit = ~is_ent & ~np.isnan(ante)
        src = np.nan_to_num(ante, nan=0.0).astype(np.int64)
        r_main = omain.copy()
        r_ne = one.copy()
        r_main[hit] = omain[src[hit]]
        r_ne[hit] = one[src[hit]]
        res_main[occ_idx] = r_main
        res_ne[occ_idx] = r_ne

    # --- triple rows (predicate chunks in document order)
    pidx = np.flatnonzero(is_pred_c)
    nt = len(pidx)
    tseg_t = cseg[pidx]
    tdoc = d_ord[tseg_t] if nt else np.array([], dtype=np.int64)
    pred_id = ck[pidx]
    sid_t = subj_of[gidx[pidx]] if nt else pred_id
    oid_t = obj_of[gidx[pidx]] if nt else pred_id
    has_s = sid_t >= 0
    has_o = oid_t != np.iinfo(np.int64).max
    s_g = np.where(has_s, offs[tseg_t] + sid_t, 0)
    o_g = np.where(has_o, offs[tseg_t] + oid_t, 0)

    subj = np.where(has_s, res_main[s_g], None)
    subj_ne = np.where(has_s, res_ne[s_g], S.ETYPE_UNKNOWN).astype(np.int64)
    subj_pro = np.where(has_s, cpro[s_g], S.PRO_NONE).astype(np.int64)
    obj = np.where(has_o, res_main[o_g], None)
    obj_ne = np.where(has_o, res_ne[o_g], S.ETYPE_UNKNOWN).astype(np.int64)
    obj_pro = np.where(has_o, cpro[o_g], S.PRO_NONE).astype(np.int64)

    # --- omitted-subject carryover (O14): per-doc ffill of the resolved
    # subject row index; filled rows keep pro = NONE
    ti = np.arange(nt, dtype=np.float64)
    carry_src = _ffill(tdoc, np.where(has_s, ti, np.nan))
    fill = ~has_s & ~np.isnan(carry_src)
    csrc = np.nan_to_num(carry_src, nan=0.0).astype(np.int64)
    subj[fill] = subj[csrc[fill]]
    subj_ne[fill] = subj_ne[csrc[fill]]

    out = pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].to_numpy()[tdoc]
            if nt
            else np.array([], dtype=object),
            "sent_id": pd.array(sids[tseg_t] if nt else [], dtype="int32"),
            "pred_id": pd.array(pred_id, dtype="Int32"),
            "pred": cmain[pidx],
            "subj": subj,
            "subj_id": pd.array(
                np.where(has_s, sid_t.astype(np.float64), np.nan), dtype="Int32"
            ),
            "obj": obj,
            "obj_id": pd.array(
                np.where(has_o, oid_t.astype(np.float64), np.nan), dtype="Int32"
            ),
            "negative": chk["negative"].to_numpy()[pidx],
            "passive": chk["passive"].to_numpy()[pidx],
            "tense": chk["tense"].to_numpy()[pidx],
            "subj_ne": pd.array(subj_ne, dtype="Int32"),
            "obj_ne": pd.array(obj_ne, dtype="Int32"),
            "subj_pro": pd.array(subj_pro, dtype="Int32"),
            "obj_pro": pd.array(obj_pro, dtype="Int32"),
        }
    )

    if canon is None:
        return out

    # --- O19/O20 fused linking via the broadcast canonical map
    canon_id = {k: v[0] for k, v in canon.items()}
    canon_ne = {k: v[1] for k, v in canon.items() if v[1] is not None}
    for side, ne_col in (("subj", "subj_ne"), ("obj", "obj_ne")):
        low = out[side].str.lower()
        hit_id = low.map(canon_id)
        out[f"{side}_canon"] = hit_id.where(hit_id.notna(), low).where(
            low.notna(), None
        )
        hit_ne = low.map(canon_ne)
        out[f"{side}_ne_linked"] = pd.array(
            np.where(hit_ne.notna(), hit_ne, out[ne_col].astype("float")),
            dtype="Int32",
        )
    return out[
        [
            "doc_id", "sent_id", "pred_id", "pred", "subj", "subj_id", "obj",
            "obj_id", "negative", "passive", "tense", "subj_ne", "obj_ne",
            "subj_pro", "obj_pro", "subj_ne_linked", "obj_ne_linked",
            "subj_canon", "obj_canon",
        ]
    ]


# backward-compatible alias (pre-r2 name, EN-only then)
fused_batch_en = fused_batch
