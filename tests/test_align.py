"""PARIS-style cross-KG alignment (operators/align.py): exact noisy-or
arithmetic vs a python mirror, round-2 structural propagation, the
mutual-best acceptance rule, and the hot-object cap audit."""

import math

import pytest
from pyspark.sql import functions as F

from naruhodo_spark.operators.align import (
    align_entities,
    inverse_functionality,
)

EPS = 1e-6


def _kg(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string"
    )


KG1 = [
    ("alice", "born_on", "1980-01-01"),
    ("alice", "lives_in", "tokyo"),
    ("bob", "born_on", "1975-05-05"),
    ("bob", "lives_in", "tokyo"),
    ("carol", "boss_of", "alice"),
]
KG2 = [
    ("a_smith", "born_on", "1980-01-01"),
    ("a_smith", "lives_in", "tokyo"),
    ("b_jones", "born_on", "1975-05-05"),
    ("b_jones", "lives_in", "tokyo"),
    ("c_doe", "boss_of", "a_smith"),
]


def _mirror_scores(kg1, kg2, equiv=None):
    """Python noisy-or mirror: literal object match + optional
    entity-equivalence map {kg2_obj: kg1_obj}."""
    equiv = equiv or {}

    def fun_inv(kg):
        facts = set(kg)
        by_pred = {}
        for s, p, o in facts:
            by_pred.setdefault(p, []).append((s, o))
        return {
            p: len({o for _, o in rows}) / len(rows)
            for p, rows in by_pred.items()
        }

    fi1, fi2 = fun_inv(kg1), fun_inv(kg2)
    w = {
        p: min((fi1[p] + fi2[p]) / 2.0, 1.0 - EPS)
        for p in set(fi1) & set(fi2)
    }
    evid = {}
    for s1, p, o1 in set(kg1):
        for s2, p2, o2 in set(kg2):
            if p == p2 and o1 == equiv.get(o2, o2):
                evid.setdefault((s1, s2), []).append(w[p])
    return {
        k: 1.0 - math.exp(sum(math.log(1.0 - x) for x in v))
        for k, v in evid.items()
    }


def test_inverse_functionality(spark):
    fi = {
        r["pred"]: r["fun_inv"]
        for r in inverse_functionality(_kg(spark, KG1)).collect()
    }
    assert fi["born_on"] == 1.0
    assert fi["lives_in"] == 0.5
    assert fi["boss_of"] == 1.0


def test_round1_scores_match_python_mirror(spark):
    got, audit = align_entities(
        _kg(spark, KG1), _kg(spark, KG2),
        rounds=1, min_score=0.0, mutual_best=False,
    )
    assert audit.isEmpty()
    exp = _mirror_scores(KG1, KG2)
    rows = {(r["name_1"], r["name_2"]): r for r in got.collect()}
    assert set(rows) == set(exp)
    for k, v in exp.items():
        assert rows[k]["score"] == pytest.approx(v, abs=1e-5)
    # the planted pair shares 2 facts, the cross pair only tokyo
    assert rows[("alice", "a_smith")]["n_shared"] == 2
    assert rows[("alice", "b_jones")]["n_shared"] == 1


def test_mutual_best_accepts_the_planted_pairs(spark):
    got, _ = align_entities(
        _kg(spark, KG1), _kg(spark, KG2), rounds=1, min_score=0.5
    )
    pairs = {(r["name_1"], r["name_2"]) for r in got.collect()}
    assert pairs == {("alice", "a_smith"), ("bob", "b_jones")}


def test_round2_propagates_through_matched_entities(spark):
    one, _ = align_entities(
        _kg(spark, KG1), _kg(spark, KG2), rounds=1, min_score=0.5
    )
    assert "carol" not in {r["name_1"] for r in one.collect()}
    two, _ = align_entities(
        _kg(spark, KG1), _kg(spark, KG2), rounds=2, min_score=0.5
    )
    rows = {(r["name_1"], r["name_2"]): r["score"] for r in two.collect()}
    # carol↔c_doe only becomes visible once alice↔a_smith rewrites the
    # boss_of object; boss_of is perfectly inverse-functional
    assert rows[("carol", "c_doe")] >= 0.999
    assert ("alice", "a_smith") in rows and ("bob", "b_jones") in rows


def test_hot_object_cap_audits_and_excludes(spark):
    kg1 = [(f"p{i}", "lives_in", "tokyo") for i in range(4)] + [
        ("p0", "born_on", "2000-01-01")
    ]
    kg2 = [(f"q{i}", "lives_in", "tokyo") for i in range(4)] + [
        ("q0", "born_on", "2000-01-01")
    ]
    got, audit = align_entities(
        _kg(spark, kg1), _kg(spark, kg2),
        rounds=1, min_score=0.0, max_per_object=8, mutual_best=False,
    )
    a = audit.collect()
    assert len(a) == 1
    assert (a[0]["pred"], a[0]["obj_key"]) == ("lives_in", "tokyo")
    assert a[0]["n_1"] == 4 and a[0]["n_2"] == 4
    # tokyo evidence excluded: only the birth-date pair survives
    assert {(r["name_1"], r["name_2"]) for r in got.collect()} == {
        ("p0", "q0")
    }


def test_ambiguous_hub_resolved_by_mutual_best(spark):
    # two KG1 twins share the same birthday as one KG2 entity: mutual
    # best keeps exactly one (deterministic argmax), never both
    kg1 = [
        ("twin_a", "born_on", "1990-01-01"),
        ("twin_b", "born_on", "1990-01-01"),
    ]
    kg2 = [("t_x", "born_on", "1990-01-01")]
    got, _ = align_entities(
        _kg(spark, kg1), _kg(spark, kg2), rounds=1, min_score=0.1
    )
    rows = got.collect()
    assert len(rows) == 1
    assert rows[0]["name_2"] == "t_x"
    assert rows[0]["name_1"] == "twin_b"  # struct(score, name) argmax


# ---------------------------------------------------- schema alignment

KG1_S = [
    ("a_paris", "capital_of", "a_france"),
    ("a_berlin", "capital_of", "a_germany"),
    ("a_rome", "capital_of", "a_italy"),
    ("a_paris", "pop", "2M"),
]
KG2_S = [
    ("b_paris", "city_in", "b_france"),
    ("b_berlin", "city_in", "b_germany"),
    ("b_rome", "city_in", "b_italy"),
    ("b_lyon", "city_in", "b_france"),
    ("b_paris", "pop", "2M"),
]
MATCHES = [
    ("a_paris", "b_paris"), ("a_berlin", "b_berlin"),
    ("a_rome", "b_rome"), ("a_lyon", "b_lyon"),
    ("a_france", "b_france"), ("a_germany", "b_germany"),
    ("a_italy", "b_italy"),
]


def _schema_fixtures(spark):
    from naruhodo_spark.operators.align import predicate_alignment

    kg1 = _kg(spark, KG1_S)
    kg2 = _kg(spark, KG2_S)
    m = spark.createDataFrame(MATCHES, "name_1 string, name_2 string")
    return predicate_alignment, kg1, kg2, m


def test_predicate_subsumption_forward(spark):
    pa, kg1, kg2, m = _schema_fixtures(spark)
    rows = {
        (r["pred_1"], r["pred_2"]): r
    for r in pa(kg1, kg2, m, min_support=2).collect()}
    # every grounded capital_of pair is asserted as city_in in KG2
    r = rows[("capital_of", "city_in")]
    assert (r["n_shared"], r["n_grounded"]) == (3, 3)
    assert r["score"] == 1.0
    # pop has support 1 -> dropped at min_support=2
    assert ("pop", "pop") not in rows


def test_predicate_subsumption_is_asymmetric(spark):
    pa, kg1, kg2, m = _schema_fixtures(spark)
    rev = m.select(
        F.col("name_2").alias("name_1"), F.col("name_1").alias("name_2")
    )
    rows = {
        (r["pred_1"], r["pred_2"]): r
        for r in pa(kg2, kg1, rev, min_support=2).collect()
    }
    # b_lyon grounds (it has a match) but a_lyon has no capital_of fact:
    # city_in-under-capital_of is 3/4, the subsumption is one-way
    r = rows[("city_in", "capital_of")]
    assert (r["n_shared"], r["n_grounded"]) == (3, 4)
    assert r["score"] == 0.75


def test_literal_objects_pass_through(spark):
    pa, kg1, kg2, m = _schema_fixtures(spark)
    rows = {
        (r["pred_1"], r["pred_2"]): r
        for r in pa(kg1, kg2, m, min_support=1).collect()
    }
    # "2M" has no entity match and compares by value
    r = rows[("pop", "pop")]
    assert (r["n_shared"], r["n_grounded"]) == (1, 1)
    assert r["score"] == 1.0


def test_unmatched_subjects_do_not_ground(spark):
    pa, kg1, kg2, _ = _schema_fixtures(spark)
    empty = spark.createDataFrame([], "name_1 string, name_2 string")
    assert pa(kg1, kg2, empty, min_support=1).isEmpty()
