"""Predicate synonymy clustering — relation canonicalization.

Entity canonicalization (operators/canon.py) merges alias NODES; this
operator merges synonymous EDGES: predicates that connect largely the
same (subject, object) argument pairs ("buys"/"purchases",
"works_at"/"employed_by") are distributional synonyms, and collapsing
them is the relation-side half of KG canonicalization (the DIRT
hypothesis — Lin & Pantel, KDD 2001: paths with similar argument
distributions have similar meaning).

Scale shape (the ops/dedup two-tier discipline, predicate-flavored):
  * the profile of a predicate is its DISTINCT argument-pair set —
    one uniform groupBy, never the raw triple stream;
  * candidate predicate pairs come from an INVERTED INDEX on the
    argument pair (which predicates share this (subj, obj)?) — an
    equi-join on the arg-pair key, not an all-pairs predicate join;
  * promiscuous argument pairs (shared by > df_cap predicates — think
    ("it", "that")) are dropped from the index with an audit surface,
    the same skew guard as ops/dedup.ngram_jaccard_pairs' df_cap: a
    pair shared by k predicates mints C(k, 2) candidate rows;
  * exact Jaccard on candidates only, threshold, then the size-gated
    CC dispatch (cc_labels_auto) — predicate vocabulary is tiny
    relative to the corpus, so CC almost always takes the driver path.

Determinism: counting + hashing only; canonical predicate = the
lexicographic min of each cluster. Repartition-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from naruhodo_spark.operators.canon import cc_labels_auto

MIN_SUPPORT = 3
DF_CAP = 1000
JACCARD_T = 0.5


def _arg_key(a, b):
    """Injective hash of an ORDERED argument pair. The components are
    md5'd BEFORE the separator join: hex digests cannot contain the
    \\x1f separator, so ("a\\x1fb", "c") and ("a", "b\\x1fc") get
    distinct keys (a raw concat_ws would alias them — ADVICE r03).
    Collision floor is md5's, the same bar as exact dedup."""
    return F.md5(F.concat_ws("\x1f", F.md5(a), F.md5(b)))


def predicate_profiles(triples: DataFrame) -> DataFrame:
    """(pred, arg_key, n_pairs): one row per distinct (pred, subj, obj)
    with the predicate's profile size attached. arg_key is the hashed
    argument pair (md5-of-md5s — fixed-width join keys instead of two
    strings, separator-collision-proof)."""
    base = (
        triples.where(
            F.col("subj").isNotNull()
            & F.col("pred").isNotNull()
            & F.col("obj").isNotNull()
        )
        .select(
            "pred",
            _arg_key(F.col("subj"), F.col("obj")).alias("arg_key"),
        )
        .distinct()
    )
    n = base.groupBy("pred").agg(F.count(F.lit(1)).alias("n_pairs"))
    return base.join(n, "pred")


def synonym_pairs(
    triples: DataFrame,
    min_support: int = MIN_SUPPORT,
    df_cap: int = DF_CAP,
    threshold: float = JACCARD_T,
    profiles: DataFrame | None = None,
) -> DataFrame:
    """(pred_a, pred_b, n_inter, jaccard): predicate pairs whose
    argument-pair Jaccard clears the threshold. Predicates with fewer
    than ``min_support`` distinct argument pairs are excluded (one
    shared pair between two rare predicates is noise, and DIRT-style
    similarity needs a distribution to compare). ``profiles`` lets a
    caller that already materialized the min_support-filtered profile
    table (predicate_clusters) share it."""
    # one lazy checkpoint: the profile subplan (distinct over the raw
    # triple stream) is referenced by the df-count, BOTH sides of the
    # candidate self-join, and the caller's predicate list — without
    # materialization the whole upstream extraction re-evaluates ~5×
    # (the cc_labels_auto lesson, operators/canon.py r03)
    prof = profiles if profiles is not None else (
        predicate_profiles(triples)
        .where(F.col("n_pairs") >= min_support)
        .localCheckpoint(eager=False)
    )
    # inverted index with the df_cap skew guard
    df_counts = prof.groupBy("arg_key").agg(
        F.count(F.lit(1)).alias("df")
    )
    indexed = prof.join(
        df_counts.where(F.col("df") <= df_cap).select("arg_key"), "arg_key"
    )
    inter = (
        indexed.alias("a")
        .join(
            indexed.alias("b"),
            on=[
                F.col("a.arg_key") == F.col("b.arg_key"),
                F.col("a.pred") < F.col("b.pred"),
            ],
        )
        .groupBy(
            F.col("a.pred").alias("pred_a"),
            F.col("b.pred").alias("pred_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_inter"),
            F.first(F.col("a.n_pairs")).alias("size_a"),
            F.first(F.col("b.n_pairs")).alias("size_b"),
        )
    )
    return (
        inter.withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("size_a") + F.col("size_b") - F.col("n_inter")),
                4,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("pred_a", "pred_b", "n_inter", "jaccard")
    )


def promiscuous_arg_pairs(
    triples: DataFrame,
    min_support: int = MIN_SUPPORT,
    df_cap: int = DF_CAP,
) -> DataFrame:
    """(arg_key, df): the audit surface — argument pairs the index
    dropped for exceeding df_cap. No silent truncation (the cooccur.py
    oversized_docs pattern)."""
    prof = predicate_profiles(triples).where(
        F.col("n_pairs") >= min_support
    )
    return (
        prof.groupBy("arg_key")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > df_cap)
    )


def predicate_clusters(
    triples: DataFrame,
    min_support: int = MIN_SUPPORT,
    df_cap: int = DF_CAP,
    threshold: float = JACCARD_T,
) -> DataFrame:
    """(pred, canon_pred): every predicate that survived min_support,
    mapped to its cluster's lexicographic-min member (singletons map to
    themselves). Apply with a join on pred to rewrite a triple table."""
    prof = (
        predicate_profiles(triples)
        .where(F.col("n_pairs") >= min_support)
        .localCheckpoint(eager=False)  # ONE profile evaluation total
    )
    prof_preds = prof.select("pred").distinct()
    edges = synonym_pairs(
        triples, min_support, df_cap, threshold, profiles=prof
    ).select(F.col("pred_a").alias("src"), F.col("pred_b").alias("dst"))
    labels = cc_labels_auto(edges).withColumnsRenamed(
        {"node": "pred", "label": "canon_pred"}
    )
    return prof_preds.join(labels, "pred", "left").select(
        "pred", F.coalesce("canon_pred", F.col("pred")).alias("canon_pred")
    )


def inverse_pairs(
    triples: DataFrame,
    min_support: int = MIN_SUPPORT,
    df_cap: int = DF_CAP,
    threshold: float = JACCARD_T,
) -> DataFrame:
    """(pred_a, pred_b, n_inter, jaccard, symmetric) — predicate pairs
    where pred_a's (subj, obj) profile overlaps pred_b's REVERSED
    profile: r(a,b) ⇔ r'(b,a) patterns ("buy"/"sell",
    "employs"/"works_at"), the inverse-relation half of DIRT-style
    relation canonicalization (Lin & Pantel 2001 score reversed paths
    the same way). pred_a == pred_b rows detect SYMMETRIC relations
    (r ≈ r⁻¹: "marry", "borders") and carry symmetric=true.

    Same scale shape as synonym_pairs: profiles are one uniform
    groupBy; candidates come from an equi-join of the forward index
    against the reversed index on the hashed argument-pair key (never
    an all-pairs predicate join); promiscuous keys above df_cap are
    dropped FROM BOTH SIDES — a key's candidate row count is
    df_fwd × df_rev, so capping only the forward side (the r03 shape)
    still let one promiscuous reversed pair mint df_cap × df_rev rows
    (ADVICE r03); audit via `promiscuous_inverse_keys`. Exact Jaccard
    only on candidates. |fwd(A) ∩ rev(B)| = |rev(A) ∩ fwd(B)|, so
    orientation is canonicalized to pred_a <= pred_b without losing
    pairs."""
    base = (
        triples.where(
            F.col("subj").isNotNull()
            & F.col("pred").isNotNull()
            & F.col("obj").isNotNull()
            & (F.col("obj") != "")
        )
        .select("pred", "subj", "obj")
        .distinct()
        .localCheckpoint(eager=False)  # fwd + rev + counts share it
    )
    n = base.groupBy("pred").agg(F.count(F.lit(1)).alias("n_pairs"))
    eligible = n.where(F.col("n_pairs") >= min_support)
    fwd = base.select(
        "pred", _arg_key(F.col("subj"), F.col("obj")).alias("arg_key")
    ).join(eligible, "pred")
    rev = base.select(
        "pred", _arg_key(F.col("obj"), F.col("subj")).alias("arg_key")
    ).join(eligible.select("pred"), "pred")
    fwd_df = fwd.groupBy("arg_key").agg(F.count(F.lit(1)).alias("df"))
    rev_df = rev.groupBy("arg_key").agg(F.count(F.lit(1)).alias("df"))
    fwd = fwd.join(
        fwd_df.where(F.col("df") <= df_cap).select("arg_key"), "arg_key"
    )
    rev = rev.join(
        rev_df.where(F.col("df") <= df_cap).select("arg_key"), "arg_key"
    )
    cand = (
        fwd.select("arg_key", F.col("pred").alias("pred_a"),
                   F.col("n_pairs").alias("n_a"))
        .join(rev.select("arg_key", F.col("pred").alias("pred_b")),
              "arg_key")
        .where(F.col("pred_a") <= F.col("pred_b"))
        .groupBy("pred_a", "pred_b", "n_a")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    nb = eligible.select(
        F.col("pred").alias("pred_b"), F.col("n_pairs").alias("n_b")
    )
    return (
        cand.join(nb, "pred_b")
        .select(
            "pred_a",
            "pred_b",
            "n_inter",
            (
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
            (F.col("pred_a") == F.col("pred_b")).alias("symmetric"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def promiscuous_inverse_keys(
    triples: DataFrame,
    min_support: int = MIN_SUPPORT,
    df_cap: int = DF_CAP,
) -> DataFrame:
    """(arg_key, df_fwd, df_rev): the audit surface for
    `inverse_pairs` — argument-pair keys dropped from either index side
    for exceeding df_cap. A key appears when its forward OR reversed
    document frequency is promiscuous; NULL on a side means the key
    never occurred in that orientation. No silent truncation (the
    cooccur.py oversized_docs pattern)."""
    base = (
        triples.where(
            F.col("subj").isNotNull()
            & F.col("pred").isNotNull()
            & F.col("obj").isNotNull()
            & (F.col("obj") != "")
        )
        .select("pred", "subj", "obj")
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = base.groupBy("pred").agg(F.count(F.lit(1)).alias("n_pairs"))
    eligible = n.where(F.col("n_pairs") >= min_support).select("pred")
    fwd_df = (
        base.select(
            "pred", _arg_key(F.col("subj"), F.col("obj")).alias("arg_key")
        )
        .join(eligible, "pred")
        .groupBy("arg_key")
        .agg(F.count(F.lit(1)).alias("df_fwd"))
    )
    rev_df = (
        base.select(
            "pred", _arg_key(F.col("obj"), F.col("subj")).alias("arg_key")
        )
        .join(eligible, "pred")
        .groupBy("arg_key")
        .agg(F.count(F.lit(1)).alias("df_rev"))
    )
    return fwd_df.join(rev_df, "arg_key", "full_outer").where(
        (F.coalesce("df_fwd", F.lit(0)) > df_cap)
        | (F.coalesce("df_rev", F.lit(0)) > df_cap)
    )
