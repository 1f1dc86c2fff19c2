"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All pure Catalyst expressions (whole-stage codegen, pushdown-friendly) —
no Python in the hot path. Each has a matching DuckDB oracle in
``__spark_entry__.py`` computed with the same deterministic formulas.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_RE = r"\s+"

# Tiny per-language stopword marker lists for the n-gram/stopword-voting
# language heuristic. Deterministic, mirrored verbatim in the oracle SQL.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "que"],
}


def norm_text(col: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def tokens(col: Column) -> Column:
    return F.split(F.trim(col), TOKEN_RE)


def md5_48(col: Column) -> Column:
    """First 48 bits of md5 as a non-negative long — THE engine-portable
    hash idiom of this repo (DuckDB renders the identical value via
    ('0x' || substr(md5(x), 1, 12))::UBIGINT). Single definition shared
    by _hash_bucket, vocab_hash_ids(md5_48) and dsir's feature buckets
    so a width/base tweak can never desynchronize one oracle mirror from
    the others."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def _hash_bucket(seed: str) -> Column:
    """md5(seed|doc_id) → bucket ∈ [0, 10000): the shared deterministic
    bucketing behind hash_split and stratified_sample. Pure function of
    the key (no RNG state) → resume-stable, shuffle-free,
    repartition-invariant, and engine-portable (md5 renders identically
    in DuckDB)."""
    return (
        md5_48(F.concat_ws("|", F.lit(seed), F.col("doc_id").cast("string")))
        % 10000
    )


def _rate_buckets(rate: float) -> int:
    """rate → bucket threshold, rounded (int() truncation turns the
    double 0.57*10000 = 5699.999… into 5699, one bucket short of the
    documented fraction — 573 of the 9999 four-decimal rates misround
    that way)."""
    return int(round(rate * 10000))


def hash_split(
    docs: DataFrame, train: float = 0.9, val: float = 0.05, seed: str = "split42"
) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent
    hash bucketing of doc_id — the properties a 100 TB split needs that
    ``df.randomSplit`` (partition-order-dependent RNG) lacks."""
    b = _hash_bucket(seed)
    split = (
        F.when(b < _rate_buckets(train), "train")
        .when(b < _rate_buckets(train + val), "val")
        .otherwise("test")
    )
    return docs.select("doc_id", split.alias("split"))


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    strat_col: str = "lang",
    default_rate: float = 1.0,
    seed: str = "strat42",
) -> DataFrame:
    """Deterministic per-stratum downsampling — the standard rebalancing
    of language/source mix in a web corpus: keep a doc iff its hash
    bucket falls under its stratum's rate. Same md5 bucketing as
    hash_split, so membership is content-stable, repartition-invariant,
    and reproducible across engines (df.sample is none of those).
    Thresholds are integer bucket counts computed driver-side — a
    `(rate * 10000).cast("long")` column would truncate double
    arithmetic (0.2 * 10000 = 1999.999… → 1999) and diverge from any
    decimal-arithmetic oracle on the boundary bucket."""
    b = _hash_bucket(seed)
    thr = F.lit(_rate_buckets(default_rate))
    for k in sorted(rates):
        thr = F.when(F.col(strat_col) == k, F.lit(_rate_buckets(rates[k]))).otherwise(
            thr
        )
    return docs.where(b < thr)


def source_quota(
    docs: DataFrame,
    cap: int,
    strat_col: str = "source",
    seed: str = "quota42",
) -> DataFrame:
    """Per-source document cap (RefinedWeb/C4-style domain quotas):
    sources under ``cap`` pass whole; over-cap sources are downsampled
    to ≈cap docs via the shared deterministic md5 bucketing.

    This is a RATE-based cap (expected size cap ± binomial noise), not
    an exact top-N — exact would require a per-source ordering, i.e. a
    sort window on a key whose skew is the entire reason the quota
    exists. The group sizes come from one map-side-combined aggregation
    kept AS A DATAFRAME (at web scale there are millions of domains —
    never driver-collected) and join back on the stratum key; the
    aggregated counts table is small relative to the corpus, so AQE
    picks a broadcast join when it fits. The keep test is integer-only:
    bucket·count < cap·10000 avoids the double-truncation boundary bug
    documented on stratified_sample.
    """
    counts = docs.groupBy(strat_col).agg(F.count(F.lit(1)).alias("_n"))
    b = _hash_bucket(seed)
    return (
        docs.join(counts, strat_col)
        .where(
            # long arithmetic throughout: cap·10000 overflows int32 for
            # any cap > 214,748 under ANSI mode (found by the composed
            # kg2td drill with a 10M no-op cap), and b·_n can overflow
            # for >200B-doc sources
            (F.col("_n") <= cap)
            | (
                b.cast("long") * F.col("_n")
                < F.lit(int(cap)).cast("long") * F.lit(10000)
            )
        )
        .drop("_n")
    )


def mix_corpus(
    docs: DataFrame,
    weights: dict[str, float],
    strat_col: str = "source",
    default_weight: float = 1.0,
    seed: str = "mix42",
) -> DataFrame:
    """Deterministic domain-weight corpus mixing — the 'data mixture'
    step before LLM pretraining (The Pile, LLaMA, DoReMi all publish
    per-domain epoch weights): a weight w for a source means each of its
    docs appears floor(w) times, plus one more copy iff the doc's hash
    bucket falls under frac(w). Expected output size is exactly
    Σ_s w_s·n_s; w < 1 downsamples, w > 1 upsamples with an ``epoch``
    column (0-based copy index) so downstream shuffles/splits see
    distinct rows rather than d identical ones.

    Membership reuses the shared md5 bucketing (_hash_bucket), so the
    mixture is content-independent, resume-stable, repartition-invariant
    and engine-portable — none of which ``df.sample``/RNG gives. Both
    per-source case columns (floor and fractional threshold) are
    integer-exact, computed driver-side from the weights dict
    (the 0.57·10000 = 5699.999… double-truncation trap documented on
    stratified_sample). Upsampling is one map-only explode of a per-row
    sequence — no shuffle, no RNG, no driver collect; sources absent
    from ``weights`` ride at ``default_weight``.
    """
    base = F.lit(int(default_weight))
    thr = F.lit(_rate_buckets(default_weight - int(default_weight)))
    for k in sorted(weights):
        wk = float(weights[k])
        if wk < 0:
            raise ValueError(f"mix weight for {k!r} must be >= 0, got {wk}")
        base = F.when(F.col(strat_col) == k, F.lit(int(wk))).otherwise(base)
        thr = F.when(
            F.col(strat_col) == k, F.lit(_rate_buckets(wk - int(wk)))
        ).otherwise(thr)
    n_copies = base + (_hash_bucket(seed) < thr).cast("int")
    # sequence(0, -1) yields a DESCENDING [0, -1] in Spark, so the
    # zero-copy case must produce an empty array, not a sequence
    copies = F.when(
        n_copies > 0, F.sequence(F.lit(0), n_copies - F.lit(1))
    ).otherwise(F.array().cast("array<int>"))
    return docs.withColumn("epoch", F.explode(copies))


def sentence_dedup(docs: DataFrame) -> DataFrame:
    """Corpus-wide sentence-level dedup (standard training-data cleaning:
    boilerplate sentences recur across pages). Emits one row per DISTINCT
    normalized sentence — its first occurrence (min (doc_id, sent_idx))
    and its corpus frequency. Downstream filters n_occurrences to drop
    boilerplate or rebuild cleaned docs.

    Arg-min via groupBy + min(struct), NOT a window over
    partitionBy(sentence): a web-scale boilerplate sentence with 10⁹
    occurrences would land in ONE window partition (window sorts have no
    partial aggregation), while the hash-agg min/count collapse hot keys
    map-side before the shuffle."""
    sents = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(norm_text(F.col("text")), r"[.!?]+")).alias(
                "sent_idx", "sentence"
            ),
        )
        .withColumn("sentence", F.trim("sentence"))
        .where(F.col("sentence") != "")
    )
    return (
        sents.groupBy("sentence")
        .agg(
            F.min(F.struct("doc_id", "sent_idx")).alias("first"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .select(
            "sentence",
            F.col("first.doc_id").alias("doc_id"),
            F.col("first.sent_idx").alias("sent_idx"),
            "n_occurrences",
        )
    )


def vocabulary(docs: DataFrame, min_df: int = 2) -> DataFrame:
    """Corpus vocabulary with document frequency and smoothed IDF
    (ln((N+1)/(df+1))). The distinct-per-doc explode keeps the shuffle
    key uniform (token), and min_df prunes the hapax tail that dominates
    vocabulary size at web scale."""
    tok = (
        docs.select(
            "doc_id", F.explode(F.split(norm_text(F.col("text")), " ")).alias("token")
        )
        .where(F.col("token") != "")
        .distinct()
    )
    # corpus size rides along as a 1-row crossJoin (broadcast NL join of
    # a single row) — an eager .count() here would scan the input at
    # PLAN-CONSTRUCTION time and again at execution
    nd = docs.agg(F.countDistinct("doc_id").alias("nd"))
    return (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_df)
        .crossJoin(F.broadcast(nd))
        .withColumn(
            "idf", F.round(F.log((F.col("nd") + 1) / (F.col("df") + 1)), 6)
        )
        .drop("nd")
    )


def vocab_ids(vocab: DataFrame, max_dense: int = 5_000_000) -> DataFrame:
    """(token, id) with DENSE id = 1-based rank in token order; 0 is
    reserved for OOV. The global row_number window sorts the whole
    vocabulary on ONE partition — fine for a tokenizer-sized vocab,
    catastrophic for a web-corpus one (min_df=2 at 100 TB still retains
    10⁸–10⁹ distinct tokens). The size gate makes that contract explicit
    instead of silently building a single-partition sort: callers who
    trip it should switch to :func:`vocab_hash_ids`, which needs no sort
    and no broadcast. The probe necessarily EXECUTES the upstream
    vocabulary plan (limit truncates rows, not the aggregation that
    produces them), so the input is lazily local-checkpointed first:
    the probe materializes it once and the returned id plan reuses the
    checkpoint instead of recomputing the corpus aggregation."""
    from pyspark.sql import Window as W

    vocab = vocab.localCheckpoint(eager=False)
    if vocab.select("token").limit(max_dense + 1).count() > max_dense:
        raise ValueError(
            f"vocab_ids: vocabulary exceeds max_dense={max_dense}; dense "
            "rank ids need a single-partition global sort and a broadcast-"
            "sized id table. Use vocab_hash_ids() for large vocabularies."
        )
    return vocab.select(
        "token", F.row_number().over(W.orderBy("token")).alias("id")
    )


def vocab_hash_ids(vocab: DataFrame, algo: str = "xxhash64") -> DataFrame:
    """(token, id) with CONTENT-DERIVED id — the web-scale form of
    vocab_ids: no global sort, no dense rank, resume-stable (a token's id
    never changes when the vocabulary grows), and computable map-side.

    - ``xxhash64`` (default): full 64-bit Spark xxhash64 — production
      path; collision odds at 10⁹ tokens ≈ n²/2⁶⁵ ≈ 2.7 %, and
      :func:`id_collisions` makes the check cheap and explicit.
    - ``md5_48``: first 48 bits of md5 — engine-portable (DuckDB computes
      the identical value), used by the driver-oracle verification.

    Ids are kept away from 0 (the OOV sentinel). md5_48 is 48-bit
    non-negative, so a +1 shift is injective and can never land on 0.
    For xxhash64 no injective ℤ64→ℤ64∖{0} map exists (pigeonhole), so
    only the exact output 0 is remapped to 1: a token hashing to 0 then
    shares id 1 with any token hashing to 1 — an ids-table collision
    that ``id_collisions`` DOES surface, unlike the previous +1 shift,
    which silently sent xxhash64 output −1 onto the OOV sentinel where
    no audit could see it."""
    if algo == "md5_48":
        raw = md5_48(F.col("token")) + F.lit(1)
    elif algo == "xxhash64":
        h = F.xxhash64("token")
        raw = F.when(h == 0, F.lit(1)).otherwise(h)
    else:
        raise ValueError(f"vocab_hash_ids: unknown algo {algo!r}")
    return vocab.select("token", raw.cast("long").alias("id"))


def id_collisions(ids: DataFrame) -> DataFrame:
    """(id, n_tokens, tokens) for every id shared by >1 token — the
    collision audit for hash-derived vocab ids. Empty means every token
    encodes uniquely. One uniform-key shuffle over vocab rows."""
    return (
        ids.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sort_array(F.collect_list("token")).alias("tokens"),
        )
        .where(F.col("n_tokens") > 1)
    )


def encode_tokens(
    docs: DataFrame, ids: DataFrame, oov_id: int = 0, broadcast_ids: bool = True
) -> DataFrame:
    """Encode each doc's token stream to integer ids against a
    (token, id) table: posexplode → hash join → positional reassembly
    via array_sort of (pos, id) structs. One shuffle, keyed by doc_id.

    ``broadcast_ids=True`` (default) broadcasts the id table — right for
    tokenizer-sized vocabularies. For web-scale vocabularies (the
    vocab_hash_ids path) pass False: the join becomes a plain shuffled
    hash join on the uniform ``token`` key, which survives an id table
    that no longer fits in executor memory.

    Docs whose normalized text yields zero tokens come back with an
    EMPTY token_ids array rather than disappearing (the groupBy only
    sees exploded rows, so a bare agg would drop them — same left-join
    re-attach pattern as repetition_scores)."""
    tok = docs.select(
        "doc_id",
        F.posexplode(F.split(norm_text(F.col("text")), " ")).alias("pos", "token"),
    ).where(F.col("token") != "")
    id_side = F.broadcast(ids) if broadcast_ids else ids
    j = tok.join(id_side, "token", "left").withColumn(
        "id", F.coalesce("id", F.lit(oov_id))
    )
    agg = j.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "id"))), lambda s: s["id"]
        ).alias("token_ids")
    )
    return docs.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("token_ids", F.array().cast("array<int>")).alias("token_ids"),
    )


def chunk_windows(
    docs: DataFrame, max_tokens: int = 64, overlap: int = 8
) -> DataFrame:
    """Context-window chunking for training pipelines: split each doc
    into ≤max_tokens-token windows advancing by (max_tokens − overlap),
    so consecutive chunks share `overlap` tokens and the tail is never
    orphaned below the overlap width. Pure Catalyst (sequence →
    posexplode → slice): one narrow pass, no UDF, no shuffle.

    The token array is materialized as a COLUMN before the explode —
    inlining the split expression into per-start slices would re-run the
    tokenizer once per window (the HOF common-subexpression pitfall,
    docs/PLANS.md)."""
    if overlap >= max_tokens:
        raise ValueError("overlap must be smaller than max_tokens")
    stride = max_tokens - overlap
    d = docs.withColumn("toks", F.split(norm_text(F.col("text")), " ")).withColumn(
        "starts",
        F.sequence(
            F.lit(1),
            F.greatest(F.size("toks") - F.lit(overlap), F.lit(1)),
            F.lit(stride),
        ),
    )
    return d.select(
        "doc_id", F.posexplode("starts").alias("chunk_idx", "s"), "toks"
    ).select(
        "doc_id",
        "chunk_idx",
        F.array_join(F.slice("toks", F.col("s"), max_tokens), " ").alias(
            "chunk_text"
        ),
        F.least(F.lit(max_tokens), F.size("toks") - F.col("s") + 1).alias(
            "n_tokens"
        ),
    )


def pack_sequences(
    docs: DataFrame, max_tokens: int = 2048, shard_docs: int = 100_000
) -> DataFrame:
    """Deterministic sequence packing for training batch prep: lay docs
    out in doc_id order and assign each to the pack where its START
    offset lands (floor(running_start / max_tokens)) — the relational
    formulation of first-fit-in-order packing; a doc straddling a pack
    boundary belongs to the pack it starts in and downstream
    splits/truncates at materialization.

    Scale shape: packing runs WITHIN doc_id shards of shard_docs docs
    (pack identity = (shard, pack_in_shard)), because packing needs
    deterministic order, not global contiguity — a single global window
    would funnel the whole corpus through one partition's sort."""
    toks = F.split(norm_text(F.col("text")), " ")
    d = docs.select(
        "doc_id",
        F.floor(F.col("doc_id") / shard_docs).alias("shard"),
        F.size(toks).alias("n_tokens"),
    )
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return d.select(
        "doc_id",
        "shard",
        start.alias("start_offset"),
        F.floor(start / max_tokens).alias("pack_in_shard"),
        "n_tokens",
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace token count + a BPE-ish subword proxy: ceil(chars/4)
    (the industry rule-of-thumb bytes-per-token constant)."""
    return docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
        F.ceil(F.length("text") / F.lit(4)).cast("long").alias("n_subwords_est"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Length / distinct-token / mean-token-length quality signals with a
    composite score — the standard cheap pre-filters for web corpora."""
    toks = tokens(F.col("text"))
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    mean_len = F.length(F.regexp_replace("text", r"\s+", "")) / n_tokens
    distinct_ratio = n_distinct / n_tokens
    score = F.round(
        F.least(n_tokens / F.lit(64.0), F.lit(1.0)) * distinct_ratio, 4
    )
    return docs.select(
        "doc_id",
        F.col("n_chars").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(mean_len, 4).alias("mean_token_len"),
        F.round(distinct_ratio, 4).alias("distinct_ratio"),
        score.alias("quality_score"),
    )


_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_URL = r"https?://[^ \t\r\n]+"  # \r excluded: CRLF text must not leak into <URL>
_PII_NUM = r"[0-9]{9,}"


def redact_text(col):
    """Column-level form of the redact_pii replacement chain — the SAME
    masking both corpus and benchmark sides must share, or decontam
    n-grams straddling a PII span can never match (prepare.py applies it
    to the bench text for exactly that reason)."""
    t1 = F.regexp_replace(col, _PII_EMAIL, "<EMAIL>")
    t2 = F.regexp_replace(t1, _PII_URL, "<URL>")
    return F.regexp_replace(t2, _PII_NUM, "<NUM>")


def redact_pii(docs: DataFrame) -> DataFrame:
    """Training-data scrubbing: mask emails, URLs, and long digit runs
    (id/phone-shaped) with typed placeholders, plus per-doc match counts
    for filter policies. Pure Catalyst regexps chosen from the
    RE2/Java/PCRE common subset so the DuckDB oracle is byte-identical."""
    email, url, num = _PII_EMAIL, _PII_URL, _PII_NUM
    # sequential: emails first, URLs on the email-redacted text, digit
    # runs last. Each count is taken on the SAME stage input its
    # replacement runs on, so n_* == number of placeholders actually
    # emitted (digits inside an already-masked URL are not re-counted).
    t0 = F.col("text")
    t1 = F.regexp_replace(t0, email, "<EMAIL>")
    t2 = F.regexp_replace(t1, url, "<URL>")
    t3 = F.regexp_replace(t2, num, "<NUM>")
    return docs.select(
        "doc_id",
        t3.alias("text_redacted"),
        F.size(F.regexp_extract_all(t0, F.lit(email), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(t1, F.lit(url), F.lit(0))).alias("n_urls"),
        F.size(F.regexp_extract_all(t2, F.lit(num), F.lit(0))).alias("n_nums"),
    )


def repetition_scores(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021, public):
    the fraction of a doc's 2-grams occupied by its single most frequent
    2-gram, and the fraction that are duplicates of an earlier one.
    High values flag boilerplate/spam. Computed by explode → per-(doc,
    gram) count — a uniform-key shuffle that scales, where the tempting
    all-in-one HOF (`filter(grams, x -> x == g)` per gram) is O(n²) per
    document and melts on long docs."""
    d = docs.withColumn("toks", F.split(norm_text(F.col("text")), " "))
    m = F.greatest(F.size("toks") - 1, F.lit(0))
    grams = F.zip_with(
        F.slice("toks", 1, m),
        F.slice("toks", 2, m),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    per = (
        d.select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = per.groupBy("doc_id").agg(
        F.sum("c").alias("total"),
        F.max("c").alias("top"),
        (F.sum("c") - F.count(F.lit(1))).alias("dups"),
    )
    return docs.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.round(F.col("top") / F.col("total"), 4), F.lit(0.0)).alias(
            "top_bigram_frac"
        ),
        F.coalesce(F.round(F.col("dups") / F.col("total"), 4), F.lit(0.0)).alias(
            "dup_bigram_frac"
        ),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Deterministic content fingerprint (md5 of normalized text) — the
    exact-dedup key and the lineage id for document-level provenance."""
    return docs.select(
        "doc_id", F.md5(norm_text(F.col("text"))).alias("fingerprint")
    )


def winnowing_fingerprints(
    docs: DataFrame, k: int = 3, w: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the standard rolling-hash dedup/plagiarism sketch):
    hash every token k-gram, slide a window of w hashes, keep each
    window's minimum, emit the distinct minima. Pure Catalyst array
    expressions (no UDF); hashes are md5-substring ints so the DuckDB
    oracle reproduces them bit-for-bit."""
    toks = F.split(norm_text(F.col("text")), " ")
    n = F.size(toks)
    # k-gram strings as a zip_with of k shifted token arrays, then one
    # elementwise transform to hashes. The naive transform(sequence(...))
    # form re-evaluated the token split per gram AND the whole gram-hash
    # array per window position (no CSE across higher-order-function
    # lambdas) — O(T^3) per document; this form is O(k·w) subtree evals.
    mg = F.greatest(n - (k - 1), F.lit(0))
    grams = F.slice(toks, 1, mg)
    for j in range(1, k):
        grams = F.zip_with(
            grams, F.slice(toks, j + 1, mg), lambda x, y: F.concat(x, F.lit(" "), y)
        )
    hs = F.transform(
        grams, lambda g: F.conv(F.substring(F.md5(g), 1, 12), 16, 10).cast("long")
    )
    # sliding-window minimum = least() over w shifted views of hs
    mw = F.greatest(F.size(hs) - (w - 1), F.lit(0))
    mins = F.slice(hs, 1, mw)
    for j in range(1, w):
        mins = F.zip_with(mins, F.slice(hs, j + 1, mw), lambda x, y: F.least(x, y))
    return (
        docs.where(n >= k + w - 1)
        .select("doc_id", F.explode(F.array_distinct(mins)).alias("fp"))
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-voting language heuristic: count marker-word hits per
    language over the token array, predict the argmax (ties broken by
    language code order via greatest-struct trick mirrored in SQL)."""
    toks = tokens(F.lower(F.col("text")))
    scores = []
    for code in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[code]])
        hits = F.size(
            F.filter(toks, lambda t: F.array_contains(markers, t))
        )
        scores.append(F.struct(hits.alias("hits"), F.lit(code).alias("code")))
    # argmax by (hits, code): greatest orders by first field then second;
    # to make ties pick the FIRST code alphabetically we invert via a
    # reversed comparison on code — instead order by (hits asc) and take
    # greatest of struct(hits, negated-rank) … simplest deterministic rule,
    # mirrored in the oracle: max (hits, code) lexicographically.
    best = F.greatest(*scores)
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_actual"),
        best["hits"].alias("marker_hits"),
        best["code"].alias("lang_pred"),
    )


def top_terms(docs: DataFrame, k: int = 5, min_df: int = 2) -> DataFrame:
    """Per-document TF-IDF keywords: (doc_id, term, tf, tfidf, rank) for
    the top-``k`` terms of each doc — the standard cheap document-tagging
    signal for corpus browsing and mixture analysis.

    Plan shape: token explode → per-(doc, term) counts (uniform keys,
    map-side partials) → join :func:`vocabulary`'s IDF (an aggregated
    table, AQE-broadcast when it fits) → rank-k window PER DOC — the
    window partitions on doc_id, whose group size is bounded by document
    length, so there is no hot-key exposure regardless of corpus skew.
    Ties break deterministically (tfidf desc, term asc).
    """
    from pyspark.sql import Window as W

    tf = (
        docs.select(
            "doc_id",
            F.explode(F.split(norm_text(F.col("text")), " ")).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = vocabulary(docs, min_df=min_df).select(
        F.col("token").alias("term"), "idf"
    )
    scored = tf.join(idf, "term").withColumn(
        "tfidf", F.round(F.col("tf") * F.col("idf"), 6)
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "tfidf", "rank")
    )


def corpus_report(docs: DataFrame) -> DataFrame:
    """(source, lang, n_docs, n_tokens, n_chars, mean_tokens, p50_tokens,
    p95_tokens, pct_dup_text): the per-(source, lang) datasheet a
    training corpus publishes (data-card reporting — Gebru et al. 2021
    "Datasheets for Datasets"). ONE aggregation pass over the corpus:
    token counts are computed inline (no join against token_counts),
    the duplicate share rides a distinct-count of the md5 fingerprint
    inside the same groupBy, and the percentiles use the t-digest-backed
    percentile_approx aggregate — nothing here is a second corpus scan
    or a driver collect beyond the bounded report rows."""
    toks = tokens(norm_text(F.col("text")))
    n_tok = F.size(toks)
    base = docs.select(
        F.coalesce(F.col("source"), F.lit("")).alias("source"),
        F.coalesce(F.col("lang"), F.lit("")).alias("lang"),
        n_tok.alias("n_tokens"),
        F.length("text").alias("n_chars"),
        F.md5(norm_text(F.col("text"))).alias("fp"),
    )
    return (
        base.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("n_chars").alias("n_chars"),
            F.round(F.avg("n_tokens"), 2).alias("mean_tokens"),
            F.percentile_approx("n_tokens", 0.5).alias("p50_tokens"),
            F.percentile_approx("n_tokens", 0.95).alias("p95_tokens"),
            F.round(
                1.0 - F.count_distinct(F.col("fp")) / F.count(F.lit(1)), 4
            ).alias("pct_dup_text"),
        )
        .orderBy("source", "lang")
    )


def cluster_balanced_mix(
    docs: DataFrame,
    doc_clusters: DataFrame,
    cluster_col: str = "cluster",
    target_share: "dict | None" = None,
    max_weight: float = 8.0,
    seed: str = "cmix42",
) -> DataFrame:
    """Cluster-balanced corpus mixing — the embedding-domain variant of
    :func:`mix_corpus` (DoReMi-lite: cluster docs by content, then
    re-weight so no latent domain dominates pretraining).

    ``doc_clusters``: (doc_id, cluster) — e.g. k-means cells over doc
    embeddings (ops/similarity.kmeans_fit + assign_cells). Weights are
    derived, not guessed: with no ``target_share``, every cluster gets
    equal mass — w_c = mean_cluster_size / n_c, capped at ``max_weight``
    so a tiny noise cluster cannot be upsampled without bound (the cap
    is an audit point, not a silent clamp: capped clusters still appear,
    just under-weighted vs the ideal). ``target_share`` overrides with
    explicit {cluster: share} fractions (need not sum to 1; they are
    normalized over the DICT's entries) — a cluster ABSENT from the
    dict gets share 0 and is dropped entirely, deliberately: an
    explicit share map is a whitelist, and the dropped clusters are
    observable by diffing output doc_ids against the input.

    Documents WITHOUT a cluster assignment (doc_id absent from
    ``doc_clusters``, or a NULL cluster) are NOT dropped (ADVICE r04 —
    the repo's no-silent-drops policy): the join is a LEFT join and
    unclustered docs ride as their own stratum at weight 1.0
    (pass-through — neither up- nor down-weighted, since they carry no
    balance signal), in both the equal-mass and the ``target_share``
    mode. Callers who want them out filter explicitly.

    Driver traffic is ONE k-row aggregate (cluster histograms are
    model-sized); the mix itself is mix_corpus's map-only floor+frac
    explode — no shuffle beyond the docs ⋈ clusters equi-join on
    doc_id, no RNG, resume-stable.
    """
    unclustered = "\x1funclustered"  # \x1f-reserved: cannot collide with
    # a real cluster value under the repo's separator discipline
    clustered = docs.join(
        doc_clusters.select(
            F.col(doc_clusters.columns[0]).alias("doc_id"),
            F.col(cluster_col).cast("string").alias("_cmix_cluster"),
        ),
        "doc_id",
        "left",
    ).withColumn(
        "_cmix_cluster", F.coalesce("_cmix_cluster", F.lit(unclustered))
    )
    hist = {
        r["_cmix_cluster"]: r["n"]
        for r in clustered.groupBy("_cmix_cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    hist.pop(unclustered, None)  # pass-through stratum: excluded from
    # the balance arithmetic, rides at mix_corpus's default_weight 1.0
    if not hist:
        return clustered.drop("_cmix_cluster").withColumn("epoch", F.lit(0))
    total = sum(hist.values())
    if target_share:
        z = sum(float(v) for v in target_share.values())
        shares = {str(c): float(v) / z for c, v in target_share.items()}
    else:
        shares = {c: 1.0 / len(hist) for c in hist}
    weights = {
        c: min(max_weight, shares.get(c, 0.0) * total / n)
        for c, n in hist.items()
    }
    return mix_corpus(
        clustered, weights, strat_col="_cmix_cluster", seed=seed
    ).drop("_cmix_cluster")
