"""sameAs smushing (operators/smush.py) and incremental RDFS
entailment (entail.rdfs_entailment_delta): class construction over
sameAs chains, edge rewriting with pass-through for unlinked nodes,
rewrite-induced self-loop retention, bag vs dedupe semantics, and the
delta-distributivity law entail(old ∪ new ∪ S) = entail(old ∪ S) ∪
entail(new ∪ S) against the naive saturation mirror."""

import pytest
from pyspark.sql import functions as F

from naruhodo_spark.operators.entail import (
    rdfs_entailment,
    rdfs_entailment_delta,
)
from naruhodo_spark.operators.smush import sameas_classes, smush


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, pred string, dst string")


GRAPH = [
    ("ibm", "same_as", "IBM"),
    ("IBM", "same_as", "intl_business_machines"),   # 3-chain
    ("alice", "works_at", "ibm"),
    ("bob", "works_at", "IBM"),
    ("intl_business_machines", "hq_in", "armonk"),
    ("carol", "works_at", "globex"),                # unlinked endpoint
    ("ibm", "rivals", "IBM"),                       # becomes a self-loop
]


def test_classes_are_cc_with_min_label(spark):
    got = {
        (r["node"], r["label"])
        for r in sameas_classes(_edges(spark, GRAPH)).collect()
    }
    assert got == {
        ("ibm", "IBM"),
        ("IBM", "IBM"),
        ("intl_business_machines", "IBM"),
    }


def test_smush_rewrites_and_drops_links(spark):
    out = smush(_edges(spark, GRAPH))
    rows = sorted(map(tuple, out["edges"].collect()))
    assert rows == sorted(
        [
            ("alice", "works_at", "IBM"),
            ("bob", "works_at", "IBM"),
            ("IBM", "hq_in", "armonk"),
            ("carol", "works_at", "globex"),   # untouched pass-through
            ("IBM", "rivals", "IBM"),          # induced self-loop KEPT
        ]
    )
    assert not any(p == "same_as" for _, p, _ in rows)


def test_smush_bag_vs_dedupe(spark):
    g = GRAPH + [("alice", "works_at", "intl_business_machines")]
    bag = smush(_edges(spark, g))["edges"]
    # alice's two assertions collapse to the same rewritten edge: bag
    # keeps both (downstream weight aggregation), dedupe folds them
    assert (
        bag.where(
            (F.col("src") == "alice") & (F.col("dst") == "IBM")
        ).count()
        == 2
    )
    dd = smush(_edges(spark, g), dedupe=True)["edges"]
    assert (
        dd.where(
            (F.col("src") == "alice") & (F.col("dst") == "IBM")
        ).count()
        == 1
    )


def test_smush_no_links_is_identity(spark):
    g = [("a", "p", "b"), ("c", "q", "d")]
    out = smush(_edges(spark, g))
    assert sorted(map(tuple, out["edges"].collect())) == sorted(g)
    assert out["classes"].count() == 0


# ------------------------------------------------- incremental entailment


SCHEMA = [
    ("works_at", "domain", "Person"),
    ("works_at", "range", "Org"),
    ("Person", "subclass_of", "Agent"),
]
OLD = [("alice", "works_at", "acme")]
NEW = [("bob", "works_at", "globex"), ("bob", "knows", "alice")]


def test_delta_distributivity(spark):
    full = set(
        map(
            tuple,
            rdfs_entailment(_edges(spark, OLD + NEW + SCHEMA)).collect(),
        )
    )
    base = set(
        map(tuple, rdfs_entailment(_edges(spark, OLD + SCHEMA)).collect())
    )
    delta = set(
        map(
            tuple,
            rdfs_entailment_delta(
                _edges(spark, NEW), _edges(spark, SCHEMA)
            ).collect(),
        )
    )
    assert base | delta == full
    # and the delta actually carries the new derivations
    assert ("bob", "is_a", "Agent") in delta
    assert ("globex", "is_a", "Org") in delta


def test_delta_rejects_schema_changes(spark):
    with pytest.raises(ValueError, match="SCHEMA"):
        rdfs_entailment_delta(
            _edges(spark, NEW + [("Org", "subclass_of", "Thing")]),
            _edges(spark, SCHEMA),
        )
