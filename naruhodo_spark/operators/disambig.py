"""Context-based entity disambiguation — the extension of O19's
broadcast alias linking (operators/link.py) for AMBIGUOUS aliases:
when the dictionary maps one surface to several canonical entities
("paris" → paris_france / paris_texas / paris_hilton), pick per
DOCUMENT by embedding agreement between the document's context vector
and each candidate entity's vector (the standard local-compatibility
half of entity-linking systems — Milne-Witten 2008's relatedness
signal restated over embedding cosine; the global coherence half is
out of scope and composes downstream via graphstats if wanted).

Inputs are four DataFrames, all join-keyed, none driver-resident:
mentions (doc_id, alias), candidates (alias, canonical_id) with
multiple rows per ambiguous alias, doc_emb (doc_id, vec), ent_emb
(canonical_id, vec). Vectors are array<float|double>; cosine is
computed in double (the module convention of ops/similarity.py).

Shape: candidates join on the alias key with a per-alias cap + loud
audit (a pathological dictionary row fanning one alias to 10^5
entities would multiply every mention of it); then one node-keyed and
one doc-keyed equi-join for the vectors; ONE groupBy on the
(doc_id, alias) mention key whose per-group state is bounded by the
cap (a sorted cosine list of ≤ cap entries — NOT corpus-sized), from
which argmax, runner-up margin and candidate count all fall out.
No RNG; ties break to the lexicographically larger canonical_id via
the max_by struct, deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def disambiguate_mentions(
    mentions: DataFrame,
    candidates: DataFrame,
    doc_emb: DataFrame,
    ent_emb: DataFrame,
    max_candidates: int = 64,
    min_margin: float = 0.0,
):
    """Resolve each (doc_id, alias) mention to its best-scoring
    candidate; returns ``(resolved, audit)``:

    - resolved: (doc_id, alias, canonical_id, cosine, margin,
      n_candidates) — canonical_id = argmax-cosine candidate; margin =
      best − runner-up cosine (1-candidate aliases get margin = best −
      (−1), the cosine floor, so they always clear a sane
      ``min_margin``). Mentions whose alias has NO candidate rows, or
      whose doc/entity vectors are missing, KEEP their row with NULL
      canonical_id (no silent drops — unresolved is a visible state);
      resolutions under ``min_margin`` also null out (too close to
      call), keeping n_candidates/margin as the audit trail.
    - audit: (alias, n_candidates) for aliases whose candidate list
      exceeded ``max_candidates`` and were EXCLUDED from resolution
      (their mentions resolve to NULL). Empty when nothing was capped
      — callers MUST check.
    """
    cand_sizes = candidates.groupBy("alias").agg(
        F.countDistinct("canonical_id").alias("n_candidates")
    )
    audit = cand_sizes.where(
        F.col("n_candidates") > int(max_candidates)
    )
    ok_cands = candidates.join(
        audit.select("alias"), "alias", "left_anti"
    ).select("alias", "canonical_id").distinct()

    m = mentions.select("doc_id", "alias").distinct()
    scored = (
        m.join(ok_cands, "alias")
        .join(
            doc_emb.select("doc_id", F.col("vec").alias("_dvec")),
            "doc_id",
        )
        .join(
            ent_emb.select(
                F.col("canonical_id").alias("canonical_id"),
                F.col("vec").alias("_evec"),
            ),
            "canonical_id",
        )
    )
    from naruhodo_spark.ops.similarity import _dot, _norm

    cos = (
        _dot(F.col("_dvec"), F.col("_evec"))
        / (_norm(F.col("_dvec")) * _norm(F.col("_evec")))
    )
    per = (
        scored.withColumn("_cos", F.round(cos, 6))
        .groupBy("doc_id", "alias")
        .agg(
            F.expr(
                "max_by(canonical_id, struct(_cos, canonical_id))"
            ).alias("_best_id"),
            F.max("_cos").alias("cosine"),
            # runner-up from a cap-bounded sorted list — per-group
            # state ≤ max_candidates entries, never corpus-sized
            F.sort_array(F.collect_list("_cos"), asc=False).alias(
                "_all"
            ),
            F.count(F.lit(1)).alias("n_candidates"),
        )
        .withColumn(
            "margin",
            F.round(
                F.col("cosine")
                # F.get (not getItem): NULL-on-missing under ANSI mode
                # for the 1-candidate case
                - F.coalesce(
                    F.get(F.col("_all"), F.lit(1)), F.lit(-1.0)
                ),
                6,
            ),
        )
        .drop("_all")
    )
    resolved = (
        m.join(per, ["doc_id", "alias"], "left")
        .select(
            "doc_id",
            "alias",
            F.when(
                F.col("margin") >= float(min_margin), F.col("_best_id")
            ).alias("canonical_id"),
            "cosine",
            "margin",
            F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
        )
    )
    return resolved, audit


def relink_ambiguous(
    triples: DataFrame,
    resolved: DataFrame,
    side: str = "subj",
) -> DataFrame:
    """Rewrite one side of linked triples through the per-document
    resolutions: where ``resolved`` carries a non-NULL canonical_id
    for (doc_id, lower(side)), the side's canonical column takes it;
    everything else passes through untouched (left join + coalesce —
    the smush.py rewrite discipline). Requires a doc_id column on the
    triples (the pipeline's triples frames carry it)."""
    if side not in ("subj", "obj"):
        raise ValueError(f"relink_ambiguous: side must be subj|obj, not {side!r}")
    canon_col = f"{side}_canon"
    r = resolved.where(F.col("canonical_id").isNotNull()).select(
        "doc_id",
        F.col("alias").alias("_alias"),
        F.col("canonical_id").alias("_resolved"),
    )
    joined = triples.join(
        r,
        (triples["doc_id"] == r["doc_id"])
        & (F.lower(triples[side]) == r["_alias"]),
        "left",
    ).drop(r["doc_id"])
    out_canon = F.coalesce(
        F.col("_resolved"),
        F.col(canon_col) if canon_col in triples.columns else F.col(side),
    )
    return joined.withColumn(canon_col, out_canon).drop(
        "_alias", "_resolved"
    )
