"""Raw-Japanese segmentation (SURVEY.md O11, r01 VERDICT "What's
missing" #1).

The reference feeds raw Japanese through CaboCha/JUMAN morphological
analysis [PK naruhodo/backends/cabocha.py]; neither binary exists in
this sandbox, so the r01 JA path required pre-segmented (whitespace-
tokenized) input. This module closes most of that gap with a
deterministic longest-match segmenter over the particle / copula /
pronoun tables in lang.py plus character-class transitions — the
classical dictionary-plus-charclass heuristic (pure Python over the
tiny lexicons; it runs inside the same mapInPandas batch as the JA
row-wise chunker spec, so no extra job stages or per-row UDF calls are
added).

Rules (deliberately simple, each anchored to a fixture test):

1. A kanji / katakana / ASCII run starts a content token; a class
   transition (kanji→katakana, etc.) closes it.
2. Hiragana directly after kanji/katakana attaches as okurigana
   (読 + んだ → 読んだ) UNLESS the hiragana run STARTS with (checked
   in this order, longest match each):
   a. a STRONG content noun (profile ``hira_content_strong`` — r05,
      curated ≥3-char nouns that never occur as inflection material):
      the compound splits (生 + たまご → 生 | たまご;
      テレビ + でんわ → テレビ | でんわ). The general content lexicon
      is NOT checked here — した after 渡 is the okurigana of 渡した,
      and a plain content match would re-break every such verb;
   b. a function word (particle or copula) — then the content token
      closes and the function word becomes its own token (彼女 + は →
      彼女 | は;  寺 + だ → 寺 | だ).
   Function words are only recognized at the start of a hiragana run,
   never inside one, which is what keeps the だ of 読んだ attached.
3. At a clean boundary, hiragana longest-matches content words first
   (ここ, する, した …), then function words (で, から …), else it
   accumulates as a hiragana content token.
4. CJK/ASCII punctuation is a token boundary and is dropped (the
   sentence terminators 。！？ are already consumed upstream by
   split_sentences).

Known limits (documented, not silent — narrowed in r03 and again in
r05 by growing the lexicons in lang.py, each pinned by
tests/test_ja_golden.py):

- hiragana content words OUTSIDE the lexicons still mis-handle at
  their position's rule: at a clean boundary a particle-prefixed one
  mis-splits (に|わとり-class, fixed per word by JA_HIRA_CONTENT);
  directly after a kanji/katakana word a non-STRONG one attaches as
  okurigana (生たまご-class, fixed per word by JA_HIRA_STRONG — the
  r05 rule-2a check; before r05 this was unfixable by lexicon growth
  at all). Both residuals are single-lexicon-row fixes;
- compound verbs with internal particles are out of scope.

Pre-segmented input (any whitespace present) bypasses segmentation
entirely, so the r01 fixtures behave exactly as before.
"""

from __future__ import annotations


def _is_hira(ch: str) -> bool:
    return "぀" <= ch <= "ゟ"


def _is_kata(ch: str) -> bool:
    return "゠" <= ch <= "ヿ" or ch == "ー"


def _is_kanji(ch: str) -> bool:
    return "一" <= ch <= "鿿" or ch in "々〆"  # 々〆


def _is_ascii_word(ch: str) -> bool:
    return ch.isascii() and ch.isalnum()


def _char_class(ch: str) -> str:
    if _is_hira(ch):
        return "hira"
    if _is_kata(ch):
        return "kata"
    if _is_kanji(ch):
        return "kanji"
    if _is_ascii_word(ch):
        return "ascii"
    return "other"  # punctuation / symbols / whitespace → boundary


def _lexicons(prof: dict) -> tuple[list[str], list[str], list[str]]:
    """(content words, function words, strong content words), each
    sorted longest-first for greedy longest-match. Tiny lists (≈100
    entries) — per-call construction is noise next to the chunker
    itself."""
    content = sorted(prof.get("hira_content", ()), key=len, reverse=True)
    func = sorted(
        set(prof.get("particles", ())) | set(prof.get("copulas", ())),
        key=len,
        reverse=True,
    )
    strong = sorted(
        prof.get("hira_content_strong", ()), key=len, reverse=True
    )
    return content, func, strong


def _match(text: str, i: int, words: list[str]) -> str:
    for w in words:  # longest-first
        if text.startswith(w, i):
            return w
    return ""


def segment_ja(text: str, prof: dict) -> list[str]:
    """Segment an UNSEGMENTED Japanese sentence into bunsetsu-ish tokens
    consumable by chunk_sentence_ja. Deterministic; pure function of
    (text, profile)."""
    content_lex, func_lex, strong_lex = _lexicons(prof)
    tokens: list[str] = []
    cur = ""  # open content token
    i, n = 0, len(text)

    def flush() -> None:
        nonlocal cur
        if cur:
            tokens.append(cur)
            cur = ""

    while i < n:
        ch = text[i]
        cls = _char_class(ch)
        if cls == "other":
            flush()
            i += 1
            continue
        if not cur:
            # clean boundary: content lexicon first, then function words
            m = _match(text, i, content_lex) or _match(text, i, func_lex)
            if m:
                tokens.append(m)
                i += len(m)
                continue
            cur = ch
            i += 1
            continue
        prev_cls = _char_class(cur[-1])
        if cls == "hira":
            if prev_cls != "hira":
                # start of a hiragana run after kanji/katakana/ascii:
                # a STRONG content noun (rule 2a, r05 — never
                # inflection material by curation) or a function word
                # (rule 2b) closes the content token
                m = _match(text, i, strong_lex) or _match(text, i, func_lex)
                if m:
                    flush()
                    tokens.append(m)
                    i += len(m)
                    continue
            cur += ch  # okurigana / inflection attaches
            i += 1
            continue
        if prev_cls == cls:
            cur += ch
            i += 1
            continue
        # class transition (kanji↔katakana↔ascii, or hira→non-hira:
        # the okurigana run ended) → new content word
        flush()
        continue  # reprocess ch at the clean boundary
    flush()
    return tokens


def ja_tokens(sentence: str, prof: dict, punct: str = ".,;:!?\"'()[]{}") -> list[str]:
    """THE JA input contract, shared by the row-wise chunker
    (operators/chunk.chunk_sentence_ja) and the columnar twin
    (operators/vchunk.chunk_arrays_ja): a sentence with no whitespace is
    RAW Japanese and runs through the longest-match segmenter; anything
    else is treated as pre-segmented (whitespace tokens, edge
    punctuation stripped). Keeping the dispatch in one place is what
    lets the parity tests compare the two chunkers rather than two
    divergent tokenizations."""
    if sentence and not any(ch.isspace() for ch in sentence):
        return segment_ja(sentence, prof)
    return [t for t in (r.strip(punct) for r in sentence.split()) if t]
