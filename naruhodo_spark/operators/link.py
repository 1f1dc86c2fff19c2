"""O15 entity typing + O19 broadcast alias/entity-linking join.

Reference behavior: entity typing is a dict lookup on the backend's NE
tag plus surface heuristics [PK naruhodo/utils/dicts.py]; node identity
is the canonical surface with `#n` dedup suffixes
[PK naruhodo/core/KnowledgeCoreJa.py].

Spark mapping: the alias dictionary is small (≤ millions of rows even at
10^12-doc scale) → **broadcast hash join**, zero shuffle
[B BASELINE.json:6 "broadcast entity-alias dictionary for linking"].

**Deliberate divergence from the reference (SURVEY.md §1.3, D5)**: the
reference disambiguates repeated same-surface mentions into distinct
``name#2``/``name#3`` nodes per occurrence context
[PK naruhodo/core/KnowledgeCoreJa.py]. This build canonicalizes BY
SURFACE — two mentions with the same lowercase surface (or the same
alias-dictionary canonical id) are ONE node, always. Rationale: ``#n``
splitting keys node identity on per-document mention order, which is
not stable under distributed, order-free aggregation (the same corpus
partitioned differently would mint different ``#n`` ids), and the KSG
edge weights the engine aggregates are exactly the statistic ``#n``
splitting would fragment. Cross-document entity resolution beyond
surface identity is the alias dictionary's job. Pinned by
tests/test_pipeline_e2e.py::test_same_surface_mentions_merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def link_entities(triples: DataFrame, aliases: DataFrame | None) -> DataFrame:
    """Adds subj_canon / obj_canon columns (canonical entity ids).

    ``aliases``: (alias:string lowercase, canonical_id:string, etype:int).
    Unlinked surfaces canonicalize to their own lowercase surface."""
    t = triples.withColumn("subj_canon", F.lower("subj")).withColumn(
        "obj_canon", F.lower("obj")
    )
    if aliases is None:
        return t
    # ONE row per alias, resolved deterministically (min canonical_id,
    # max etype): duplicate alias rows would row-MULTIPLY every matching
    # triple through the join, inflating edge weights — and which
    # duplicate "wins" would differ from the broadcast-dict fused path.
    # Dropping to one row is label-safe because apply_canonical_labels
    # maps every duplicate's canonical_id to the same CC component label
    # (alias_cc_labels consumes the RAW rows, so the duplicate rows'
    # merge edges still union the components).
    aliases = aliases.groupBy("alias").agg(
        F.min("canonical_id").alias("canonical_id"),
        F.max("etype").alias("etype"),
    )
    a_subj = F.broadcast(
        aliases.select(
            F.col("alias").alias("s_alias"),
            F.col("canonical_id").alias("s_canon"),
            F.col("etype").alias("s_etype"),
        )
    )
    a_obj = F.broadcast(
        aliases.select(
            F.col("alias").alias("o_alias"),
            F.col("canonical_id").alias("o_canon"),
            F.col("etype").alias("o_etype"),
        )
    )
    return (
        t.join(a_subj, t.subj_canon == a_subj.s_alias, "left")
        .join(a_obj, t.obj_canon == a_obj.o_alias, "left")
        .withColumn("subj_canon", F.coalesce("s_canon", "subj_canon"))
        .withColumn("obj_canon", F.coalesce("o_canon", "obj_canon"))
        .withColumn("subj_ne", F.coalesce("s_etype", "subj_ne"))
        .withColumn("obj_ne", F.coalesce("o_etype", "obj_ne"))
        .drop("s_alias", "s_canon", "s_etype", "o_alias", "o_canon", "o_etype")
    )
