"""Distributed BPE subword-vocabulary learning + encoding (Sennrich et
al. 2016, "Neural Machine Translation of Rare Words with Subword Units",
arXiv:1508.07909; encoder loop as popularized by the GPT-2 reference
tokenizer).

The whole 100 TB story is ONE observation: BPE never needs the corpus
after the first pass. Training state is the WORD-FREQUENCY table —
(word, count), bounded by |distinct words| (10^7–10^8 at web scale, vs
10^12 corpus tokens) — and every merge round is a uniform-key groupBy
over that table plus an O(1)-row driver collect (the chosen pairs),
exactly the PageRank loop shape (operators/graphstats.py). Encoding
likewise runs Python only over DISTINCT words (Arrow-batched
mapInPandas over the vocabulary table), then rejoins the corpus with a
JVM-side equi-join on the uniform word key. Nothing in either phase is
corpus-quadratic and no Python ever touches a corpus-sized frame.

Determinism contract (repo standard — no RNG, resume-stable,
repartition-invariant):
  * candidate order is (pair_count DESC, left ASC, right ASC);
  * with ``batch=1`` the learner IS textbook BPE: the single most
    frequent pair is merged each round, leftmost-first non-overlapping
    (the fold below reproduces the classic regex-replace semantics
    exactly — pinned against a pure-python reference in
    tests/test_bpe.py);
  * with ``batch>1`` (the production setting: one corpus-table pass
    amortizes several merges) the round greedily accepts up to
    ``batch`` candidates from the top ``8*batch`` pairs whose symbols
    {left, right, left||right} are mutually disjoint — simultaneous
    application of disjoint rules cannot interact, so one fold pass
    applies them all. The 8*batch candidate window is a documented
    determinism bound (it pins WHICH valid merge subset is chosen), not
    a correctness cap. Batched BPE is a deviation from the strict
    one-pair-per-round algorithm; the variant it produces is itself a
    valid BPE vocabulary and the deviation is pinned by a mirror
    implementing the identical batched rule.

End-of-word handling: the classic ``</w>`` terminator symbol, so
"low"/"lower" share the "low" prefix pieces but differ at the boundary.
``</w>`` is multi-character and can never collide with a corpus
character symbol.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from naruhodo_spark.ops.textstats import norm_text

EOW = "</w>"
CAND_WINDOW = 8  # candidate window per accepted merge, see module doc


def word_counts(docs: DataFrame) -> DataFrame:
    """(word, count) over the normalized token stream — the single
    corpus-sized pass of BPE training. Uniform hash keys, map-side
    partial aggregation; output is vocabulary-sized."""
    return (
        docs.select(
            F.explode(F.split(norm_text(F.col("text")), r"\s+")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _init_symbols(words: DataFrame) -> DataFrame:
    """(syms array<string>, count): characters + the EOW terminator."""
    return words.select(
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(EOW))
        ).alias("syms"),
        "count",
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies weighted by word count: two shifted
    array slices zipped (the shingles CSE-safe pattern), exploded, and
    summed per pair — uniform keys, ≤ one row per vocab-table symbol."""
    m = F.greatest(F.size("syms") - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(F.col("syms"), 1, m),
        F.slice(F.col("syms"), 2, m),
        lambda a, b: F.struct(a.alias("left"), b.alias("right")),
    )
    return (
        vocab.select(F.explode(pairs).alias("p"), "count")
        .groupBy("p.left", "p.right")
        .agg(F.sum("count").alias("pair_count"))
    )


def _apply_merges(vocab: DataFrame, chosen: list[tuple[str, str]]) -> DataFrame:
    """One leftmost-first fold pass applying every chosen (disjoint)
    pair: scan symbols left to right; when (last_emitted, current)
    matches a rule, replace last_emitted with the concatenation. Column
    API only (symbols are corpus text — never interpolated into SQL
    strings). try_element_at keeps the empty-accumulator probe
    NULL-safe under ANSI."""

    def step(acc, s):
        last = F.try_element_at(acc, F.lit(-1))
        hit = F.lit(False)
        for left, right in chosen:
            hit = hit | ((last == F.lit(left)) & (s == F.lit(right)))
        merged = F.concat(
            F.slice(acc, F.lit(1), F.size(acc) - 1),
            F.array(F.concat(last, s)),
        )
        return F.when(hit, merged).otherwise(F.concat(acc, F.array(s)))

    empty = F.array().cast("array<string>")
    return vocab.select(
        F.aggregate(F.col("syms"), empty, step).alias("syms"), "count"
    )


def learn_bpe(
    docs: DataFrame,
    n_merges: int,
    batch: int = 1,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merge rules from a corpus. Returns
    the ranked merge list [(left, right), ...] — driver-sized by
    definition (the merge table IS the model, ≤ n_merges rows; the same
    bound that makes k-means centroids collectable in
    ops/similarity.py). Stops early when no pair reaches
    ``min_pair_count``.

    Per round: one vocabulary-table aggregation + one O(8*batch)-row
    collect + one fold pass; ``localCheckpoint`` truncates the growing
    fold lineage each round (PageRank idiom), with the previous round's
    checkpoint unpersisted once superseded.

    Production guidance (measured, BENCH/BASELINE.md "BPE
    production-batch drill"): per-round wall is ~0.3 s and nearly
    batch-independent — the scale cost is the ROUND COUNT
    (= n_merges / batch driver round-trips), so a 32k-merge vocabulary
    is ~2.5 h of round-trips at batch=1 vs ~4 min at batch=64.
    Batched greedy picks disjoint pairs per round from stale counts, so
    the learned list deviates from batch=1's strict frequency ranking
    where counts plateau; the honest quality metric is held-out
    COMPRESSION, not rule-list identity (equal-budget drill: batch=8
    costs +1.8% pieces/word vs batch=1, batch=64 costs +8.7%).
    Recommended production setting ``batch=8..32`` — ~8-30× fewer
    driver rounds for low-single-digit compression loss; validate
    pieces/word on a held-out split when raising ``batch`` further.
    """
    if n_merges < 0:
        raise ValueError(f"learn_bpe: n_merges must be >= 0, got {n_merges}")
    if batch < 1:
        raise ValueError(f"learn_bpe: batch must be >= 1, got {batch}")
    vocab = _init_symbols(word_counts(docs)).localCheckpoint()
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        want = min(batch, n_merges - len(merges))
        top = (
            _pair_counts(vocab)
            .where(F.col("pair_count") >= min_pair_count)
            .orderBy(
                F.col("pair_count").desc(),
                F.col("left").asc(),
                F.col("right").asc(),
            )
            .limit(CAND_WINDOW * want)
            .collect()
        )
        chosen: list[tuple[str, str]] = []
        used: set[str] = set()
        for row in top:
            if len(chosen) >= want:
                break
            symbols = {row["left"], row["right"], row["left"] + row["right"]}
            if symbols & used:
                continue
            chosen.append((row["left"], row["right"]))
            used |= symbols
        if not chosen:
            break
        prev = vocab
        vocab = _apply_merges(vocab, chosen).localCheckpoint()
        prev.unpersist()
        merges.extend(chosen)
    vocab.unpersist()
    return merges


_ENCODED_WORDS = T.StructType(
    [
        T.StructField("word", T.StringType(), False),
        T.StructField("pieces", T.ArrayType(T.StringType(), False), False),
    ]
)


def encode_words(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """(word, pieces): segment each DISTINCT word with the learned
    merges — the GPT-2-style encoder loop (repeatedly merge the
    lowest-rank pair present, leftmost-first), which reproduces the
    training segmentation for any rule set learned by ``learn_bpe``.
    Arrow-batched mapInPandas over the vocabulary-sized frame; the rank
    dict rides the task closure (≤ n_merges entries — model-sized, the
    honest broadcast)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def segment(word: str) -> list[str]:
        syms = list(word) + [EOW]
        while len(syms) > 1:
            best_rank, best_pair = None, None
            for a, b in zip(syms, syms[1:]):
                r = ranks.get((a, b))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, (a, b)
            if best_pair is None:
                break
            out: list[str] = []
            for s in syms:
                if out and (out[-1], s) == best_pair:
                    out[-1] = out[-1] + s
                else:
                    out.append(s)
            syms = out
        return syms

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "pieces": [segment(w) for w in pdf["word"]],
                }
            )

    return words.select("word").mapInPandas(fn, schema=_ENCODED_WORDS)


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """(doc_id, pieces array<string>, n_pieces): the corpus tokenized
    into subword pieces. Python cost is bounded by |distinct words|
    (encode_words); the corpus side is JVM-only — posexplode tokens,
    equi-join the piece table on the uniform word key, re-assemble per
    doc ordered by position. Empty docs keep a row (left join — no
    silent deletion)."""
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(norm_text(F.col("text")), r"\s+")).alias(
            "pos", "word"
        ),
    ).where(F.col("word") != "")
    # one tokenization pass: toks feeds BOTH the distinct-word frame and
    # the corpus-side equi-join — unmaterialized, the corpus-scale
    # normalize+split+explode would run twice (the cc_labels_auto
    # re-evaluation lesson, operators/canon.py r03)
    toks = toks.localCheckpoint(eager=False)
    pieces = encode_words(toks.select("word").distinct(), merges)
    per_doc = (
        toks.join(pieces, "word")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "pieces"))
                    ),
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
