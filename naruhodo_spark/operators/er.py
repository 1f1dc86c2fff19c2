"""Entity resolution by blocking + edit distance — fuzzy record
matching over a name column, the classic pre-canonicalization step for
KG entity tables whose mentions don't share an alias dictionary entry
(complements operators/link.py's exact alias broadcast join and
ops/dedup.py's set-similarity family: here the unit is the NAME STRING
and the metric is character-level Levenshtein, which catches typos and
morphological variants n-gram Jaccard tiers pass over).

Tiered shape (the dedup-family discipline, ops/dedup.near_dup_groups):

1. **exact collapse** — distinct normalized names with record counts;
   pairwise work is O(vocab²/blocks), never O(records²). At 10^12 docs
   the name vocabulary is Zipf-bounded millions, not trillions.
2. **blocking** — candidate pairs only within a block key (default:
   last whitespace token; callers pass any Column or a LIST for
   standard multi-pass blocking, unioned + deduped). Blocking is the
   textbook ER scale move (Papadakis et al., VLDB survey 2020): the
   cross product is bounded per block, hot blocks are real skew the
   session's AQE skew-join splitting absorbs, and an optional
   ``max_block`` cap drops oversized blocks LOUDLY via the returned
   audit frame (repo policy: no silent drops).
3. **match** — one equi-join per blocking pass + a JVM-side
   ``levenshtein`` filter (built-in, codegen; never a Python UDF).
4. **clusters** — CC closure over match pairs via the shared
   size-gated star-contraction machinery (operators/canon.py), so
   transitive matches canonicalize exactly like alias components.

Determinism: pairs are emitted once with name_a < name_b; cluster
labels are the lexicographic min member (canon contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from naruhodo_spark.operators import canon as O_canon


def normalize_name(col) -> Column:
    """lower + trim + collapse internal whitespace (the match unit)."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def last_token_block(col) -> Column:
    """Default block key: the last whitespace token (head noun in
    adjective+noun names; swap for soundex/prefix/length passes via
    the ``block`` parameter)."""
    return F.regexp_extract(col, r"(\S+)$", 1)


def name_representatives(
    records: DataFrame, id_col: str, name_col: str
) -> DataFrame:
    """(name, n_records, min_id) — tier-1 exact collapse: one uniform
    map-side-combinable groupBy on the normalized name."""
    return (
        records.select(
            normalize_name(F.col(name_col)).alias("name"),
            F.col(id_col).alias("_id"),
        )
        .groupBy("name")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.min("_id").alias("min_id"),
        )
    )


def blocked_matches(
    records: DataFrame,
    id_col: str,
    name_col: str,
    max_distance: int = 3,
    block=None,
    max_block: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(matches, audit): matches = (name_a, name_b, distance, sim,
    n_records_a, n_records_b) with name_a < name_b, deduped across
    blocking passes; audit = (block_key, pass_id, n_names) for blocks
    dropped by ``max_block`` (empty when uncapped — callers MUST check
    it before claiming full recall).

    ``block``: a function Column→Column, or a list of them for
    multi-pass blocking (union of per-pass candidates, distinct pairs).
    ``sim`` = 1 − distance/len(longer name), rounded to 4 dp.
    """
    if max_distance < 0:
        raise ValueError(f"max_distance must be >= 0, got {max_distance}")
    passes = block if isinstance(block, (list, tuple)) else [block or last_token_block]
    reps = name_representatives(records, id_col, name_col).localCheckpoint(
        eager=False
    )
    spark = records.sparkSession
    pair_frames, audit_frames = [], []
    for pi, blk in enumerate(passes):
        keyed = reps.select(
            blk(F.col("name")).alias("blk"), "name", "n_records"
        )
        if max_block is not None:
            sizes = keyed.groupBy("blk").agg(
                F.count(F.lit(1)).alias("n_names")
            )
            audit_frames.append(
                sizes.where(F.col("n_names") > max_block).select(
                    F.col("blk").alias("block_key"),
                    F.lit(pi).alias("pass_id"),
                    "n_names",
                )
            )
            keyed = keyed.join(
                F.broadcast(
                    sizes.where(F.col("n_names") <= max_block).select("blk")
                ),
                "blk",
            )
        a, b = keyed.alias("a"), keyed.alias("b")
        dist = F.levenshtein(F.col("a.name"), F.col("b.name"))
        pair_frames.append(
            a.join(
                b,
                (F.col("a.blk") == F.col("b.blk"))
                & (F.col("a.name") < F.col("b.name")),
            )
            .where(dist <= max_distance)
            .select(
                F.col("a.name").alias("name_a"),
                F.col("b.name").alias("name_b"),
                dist.cast("long").alias("distance"),
                F.round(
                    1.0
                    - dist
                    / F.greatest(F.length("a.name"), F.length("b.name")),
                    4,
                ).alias("sim"),
                F.col("a.n_records").alias("n_records_a"),
                F.col("b.n_records").alias("n_records_b"),
            )
        )
    matches = pair_frames[0]
    for f in pair_frames[1:]:
        matches = matches.unionByName(f)
    if len(pair_frames) > 1:
        matches = matches.dropDuplicates(["name_a", "name_b"])
    if audit_frames:
        audit = audit_frames[0]
        for f in audit_frames[1:]:
            audit = audit.unionByName(f)
    else:
        audit = spark.createDataFrame(
            [], "block_key string, pass_id int, n_names long"
        )
    return matches, audit


def match_clusters(
    records: DataFrame,
    id_col: str,
    name_col: str,
    max_distance: int = 3,
    block=None,
    max_block: int | None = None,
) -> DataFrame:
    """(name, cluster, n_records) — transitive closure of
    :func:`blocked_matches` via the shared size-gated CC (label =
    lexicographic min member name). Every name appears, matched or
    not (unmatched names are their own singleton cluster)."""
    matches, _ = blocked_matches(
        records, id_col, name_col, max_distance, block, max_block
    )
    reps = name_representatives(records, id_col, name_col)
    edges = matches.select(
        F.col("name_a").alias("src"), F.col("name_b").alias("dst")
    )
    labels = O_canon.cc_labels_auto(edges)
    return (
        reps.join(labels, reps["name"] == labels["node"], "left")
        .select(
            "name",
            F.coalesce("label", "name").alias("cluster"),
            "n_records",
        )
    )
