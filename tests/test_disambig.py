"""Context-based entity disambiguation (operators/disambig.py):
planted-context argmax recovery, margin gating, null-state contract,
candidate-cap audit, and the triple rewrite."""

import pytest
from pyspark.sql import functions as F

from naruhodo_spark.operators.disambig import (
    disambiguate_mentions,
    relink_ambiguous,
)

# axis-aligned embeddings: doc context picks the matching candidate
DOC_EMB = [
    ("d_fr", [1.0, 0.0, 0.0]),
    ("d_tx", [0.0, 1.0, 0.0]),
    ("d_mix", [0.7, 0.7, 0.0]),
]
ENT_EMB = [
    ("paris_france", [0.9, 0.1, 0.0]),
    ("paris_texas", [0.1, 0.9, 0.0]),
    ("unique_co", [0.0, 0.0, 1.0]),
]
CANDS = [
    ("paris", "paris_france"),
    ("paris", "paris_texas"),
    ("acme", "unique_co"),
]


def _frames(spark):
    mentions = spark.createDataFrame(
        [("d_fr", "paris"), ("d_tx", "paris"), ("d_mix", "paris"),
         ("d_fr", "acme"), ("d_fr", "ghost")],
        "doc_id string, alias string",
    )
    cands = spark.createDataFrame(CANDS, "alias string, canonical_id string")
    demb = spark.createDataFrame(DOC_EMB, "doc_id string, vec array<double>")
    eemb = spark.createDataFrame(
        ENT_EMB, "canonical_id string, vec array<double>"
    )
    return mentions, cands, demb, eemb


def test_context_picks_the_right_candidate(spark):
    mentions, cands, demb, eemb = _frames(spark)
    resolved, audit = disambiguate_mentions(mentions, cands, demb, eemb)
    assert audit.isEmpty()
    got = {(r["doc_id"], r["alias"]): r for r in resolved.collect()}
    assert got[("d_fr", "paris")]["canonical_id"] == "paris_france"
    assert got[("d_tx", "paris")]["canonical_id"] == "paris_texas"
    assert got[("d_fr", "acme")]["canonical_id"] == "unique_co"
    # margins are positive and n_candidates reported
    assert got[("d_fr", "paris")]["margin"] > 0
    assert got[("d_fr", "paris")]["n_candidates"] == 2
    assert got[("d_fr", "acme")]["n_candidates"] == 1


def test_no_candidates_keeps_row_with_null(spark):
    mentions, cands, demb, eemb = _frames(spark)
    resolved, _ = disambiguate_mentions(mentions, cands, demb, eemb)
    [ghost] = [r for r in resolved.collect() if r["alias"] == "ghost"]
    assert ghost["canonical_id"] is None
    assert ghost["n_candidates"] == 0


def test_min_margin_nulls_close_calls(spark):
    mentions, cands, demb, eemb = _frames(spark)
    resolved, _ = disambiguate_mentions(
        mentions, cands, demb, eemb, min_margin=0.5
    )
    got = {(r["doc_id"], r["alias"]): r for r in resolved.collect()}
    # d_mix sits between the two paris candidates: margin ~0 -> null,
    # but the margin/n_candidates audit trail survives
    assert got[("d_mix", "paris")]["canonical_id"] is None
    assert got[("d_mix", "paris")]["n_candidates"] == 2
    # clear calls still resolve (single candidate margin = best+1)
    assert got[("d_fr", "acme")]["canonical_id"] == "unique_co"


def test_candidate_cap_audits_and_nulls(spark):
    mentions, _, demb, eemb = _frames(spark)
    fat = spark.createDataFrame(
        [("paris", f"p{i}") for i in range(5)]
        + [("acme", "unique_co")],
        "alias string, canonical_id string",
    )
    resolved, audit = disambiguate_mentions(
        mentions, fat, demb, eemb, max_candidates=3
    )
    a = audit.collect()
    assert len(a) == 1 and a[0]["alias"] == "paris"
    assert a[0]["n_candidates"] == 5
    got = {(r["doc_id"], r["alias"]): r for r in resolved.collect()}
    assert got[("d_fr", "paris")]["canonical_id"] is None
    assert got[("d_fr", "acme")]["canonical_id"] == "unique_co"


def test_relink_rewrites_only_resolved_side(spark):
    mentions, cands, demb, eemb = _frames(spark)
    resolved, _ = disambiguate_mentions(mentions, cands, demb, eemb)
    triples = spark.createDataFrame(
        [("d_fr", "Paris", "is", "nice", "paris", "nice"),
         ("d_fr", "ghost", "is", "odd", "ghost", "odd")],
        "doc_id string, subj string, pred string, obj string, "
        "subj_canon string, obj_canon string",
    )
    out = relink_ambiguous(triples, resolved, side="subj")
    got = {r["subj"]: r["subj_canon"] for r in out.collect()}
    assert got["Paris"] == "paris_france"  # rewritten through context
    assert got["ghost"] == "ghost"          # untouched pass-through
    # obj side untouched
    assert {r["obj_canon"] for r in out.collect()} == {"nice", "odd"}


def test_deterministic_tie_break(spark):
    # two candidates at identical cosine: lexicographically larger wins
    mentions = spark.createDataFrame(
        [("d", "x")], "doc_id string, alias string"
    )
    cands = spark.createDataFrame(
        [("x", "cand_a"), ("x", "cand_b")],
        "alias string, canonical_id string",
    )
    demb = spark.createDataFrame(
        [("d", [1.0, 0.0])], "doc_id string, vec array<double>"
    )
    eemb = spark.createDataFrame(
        [("cand_a", [1.0, 0.0]), ("cand_b", [1.0, 0.0])],
        "canonical_id string, vec array<double>",
    )
    resolved, _ = disambiguate_mentions(mentions, cands, demb, eemb)
    [r] = resolved.collect()
    assert r["canonical_id"] == "cand_b"
    assert r["margin"] == 0.0
