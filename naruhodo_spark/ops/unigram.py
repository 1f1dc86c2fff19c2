"""Distributed unigram-LM subword tokenizer (Kudo, ACL 2018 "Subword
Regularization"; the SentencePiece unigram algorithm) — the other
major subword family next to ops/bpe.py, sharing its entire scale
shape: the corpus is touched ONCE (bpe.word_counts), training state is
the vocabulary-sized (word, count) table, Python only ever runs over
DISTINCT words (Arrow-batched mapInPandas), and encoding rejoins the
corpus with a JVM-side equi-join on the uniform word key.

Algorithm (deterministic hard-EM variant — deviations from Kudo's
soft-EM + likelihood-loss pruning are documented and mirrored):

1. **seed** — every substring of every distinct word up to
   ``max_piece_len`` chars, frequency-weighted by word count; top
   ``seed_size`` by (freq DESC, piece ASC), plus ALL single characters
   unconditionally (full coverage by construction — no UNK piece
   needed, and pruning never removes single chars).
2. **E-step** — Viterbi segmentation of each distinct word under the
   current piece log-probs (the model dict rides the task closure —
   ``seed_size``-bounded, the honest broadcast, exactly BPE's rank
   dict), accumulating count-weighted piece frequencies via ONE
   map-side-combinable groupBy. Hard EM (Viterbi counts, not
   forward-backward expectations) keeps every step exactly mirrorable
   in pure python; ties in the DP break to FEWER pieces, then to the
   lexicographically smaller piece at the split — pinned.
3. **M-step** — log-probs from normalized counts, computed on the
   collected piece-count table (vocabulary-sized driver state, the
   BPE-merge-list magnitude; never corpus-sized).
4. **prune** — after each EM round, keep the ``keep_k`` highest
   (count DESC, piece ASC) multi-char pieces + all single chars,
   annealing ``keep_k`` toward ``vocab_size`` (Kudo prunes by
   per-piece likelihood loss; count ranking is the deterministic
   simplification, pinned by the mirror).

At 10^12 docs: word_counts is the only corpus pass (uniform keys,
map-side combine); seeding explodes substrings of the VOCABULARY frame
(≤ len·max_piece_len candidates per distinct word); each EM round is
one mapInPandas + one groupBy over that same frame. Nothing is
corpus-quadratic; the driver never holds more than the piece table.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from naruhodo_spark.ops.bpe import word_counts
from naruhodo_spark.ops.textstats import norm_text

_ENCODED = "word string, pieces array<string>"


def seed_vocab(
    words: DataFrame, max_piece_len: int = 6, seed_size: int = 2000
) -> list[tuple[str, int]]:
    """[(piece, freq)] — substring seed candidates from the (word,
    count) table: top ``seed_size`` by (freq DESC, piece ASC) plus all
    single characters. The explode is bounded by the VOCABULARY size ×
    word length × max_piece_len, never the corpus. Returned collected:
    the seed IS the model-sized driver state the EM loop holds anyway."""
    sub = words.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(0), F.length("word") - 1),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(
                                F.lit(max_piece_len), F.length("word") - i
                            ),
                        ),
                        lambda ln: F.col("word").substr(i + 1, ln),
                    ),
                )
            )
        ).alias("piece"),
        "count",
    )
    freq = sub.groupBy("piece").agg(F.sum("count").alias("freq"))
    chars = freq.where(F.length("piece") == 1)
    multi = (
        freq.where(F.length("piece") > 1)
        .orderBy(F.desc("freq"), F.asc("piece"))
        .limit(seed_size)
    )
    return [
        (r["piece"], int(r["freq"]))
        for r in chars.unionByName(multi).collect()
    ]


def _viterbi(word: str, logp: dict[str, float], max_len: int) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs: maximize
    Σ logp, ties → fewer pieces, then lexicographically smaller piece
    ending at the split. Single-char coverage is guaranteed by
    construction, so every word segments."""
    n = len(word)
    # best[i] = (score, n_pieces, piece_ending_here, prev_index)
    best: list[tuple | None] = [None] * (n + 1)
    best[0] = (0.0, 0, "", 0)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            if best[j] is None:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                continue
            cand = (best[j][0] + lp, best[j][1] + 1, piece, j)
            cur = best[i]
            if (
                cur is None
                or cand[0] > cur[0] + 1e-12
                or (
                    abs(cand[0] - cur[0]) <= 1e-12
                    and (
                        cand[1] < cur[1]
                        or (cand[1] == cur[1] and cand[2] < cur[2])
                    )
                )
            ):
                best[i] = cand
    out: list[str] = []
    i = n
    while i > 0:
        _, _, piece, j = best[i]
        out.append(piece)
        i = j
    return list(reversed(out))


def _segment_words(
    words: DataFrame, logp: dict[str, float], max_len: int
) -> DataFrame:
    """(word, pieces) — Viterbi over the distinct-word frame
    (Arrow-batched; the model dict rides the closure)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "pieces": [
                        _viterbi(w, logp, max_len) for w in pdf["word"]
                    ],
                }
            )

    return words.select("word").mapInPandas(fn, schema=_ENCODED)


def _logprobs(counts: list[tuple[str, int]]) -> dict[str, float]:
    total = sum(c for _, c in counts)
    return {p: math.log(c / total) for p, c in counts if c > 0}


def train_unigram(
    docs: DataFrame,
    vocab_size: int = 500,
    iters: int = 3,
    max_piece_len: int = 6,
    seed_size: int = 2000,
) -> list[tuple[str, float]]:
    """[(piece, logprob)] sorted by (logprob DESC, piece ASC) — the
    trained unigram vocabulary (single chars always retained; length
    ``vocab_size`` + however many extra single chars coverage needs).
    Deterministic: no RNG anywhere; exact pure-python mirror in
    tests/test_unigram.py."""
    if vocab_size < 1 or iters < 1:
        raise ValueError("vocab_size and iters must be positive")
    words = word_counts(docs).localCheckpoint(eager=False)
    seed = seed_vocab(words, max_piece_len, seed_size)
    logp = _logprobs(seed)
    n_multi_start = sum(1 for p, _ in seed if len(p) > 1)
    for it in range(iters):
        seg = _segment_words(words, logp, max_piece_len)
        counts = (
            seg.join(words, "word")
            .select(F.explode("pieces").alias("piece"), "count")
            .groupBy("piece")
            .agg(F.sum("count").alias("cnt"))
            .collect()
        )
        counts = [(r["piece"], int(r["cnt"])) for r in counts]
        # prune: anneal multi-char budget linearly toward vocab_size
        frac = (it + 1) / iters
        keep_k = max(
            vocab_size,
            int(n_multi_start - frac * (n_multi_start - vocab_size)),
        )
        chars = [(p, c) for p, c in counts if len(p) == 1]
        multi = sorted(
            [(p, c) for p, c in counts if len(p) > 1],
            key=lambda pc: (-pc[1], pc[0]),
        )[:keep_k]
        # single chars never pruned — coverage; chars that fell out of
        # the Viterbi counts (absorbed into longer pieces) are re-seeded
        # at count 1 so later words can still fall back to them
        seen = {p for p, _ in chars}
        chars += [
            (p, 1) for p, _ in seed if len(p) == 1 and p not in seen
        ]
        logp = _logprobs(chars + multi)
    return sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))


def unigram_encode(
    docs: DataFrame, pieces: list[tuple[str, float]]
) -> DataFrame:
    """(doc_id, pieces array<string>, n_pieces) — the corpus tokenized
    under the trained vocabulary. Python cost bounded by |distinct
    words|; corpus side JVM-only (posexplode + equi-join on the uniform
    word key + per-doc reassembly); empty docs keep a row."""
    logp = dict(pieces)
    max_len = max((len(p) for p in logp), default=1)
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(norm_text(F.col("text")), r"\s+")).alias(
            "pos", "word"
        ),
    ).where(F.col("word") != "")
    toks = toks.localCheckpoint(eager=False)  # distinct + join, one pass
    seg = _segment_words(toks.select("word").distinct(), logp, max_len)
    per_doc = (
        toks.join(seg, "word")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "pieces"))),
                    lambda s: s["pieces"],
                )
            ).alias("pieces")
        )
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("pieces", F.array().cast("array<string>")).alias("pieces"),
        F.coalesce(F.size("pieces"), F.lit(0)).cast("int").alias("n_pieces"),
    )
