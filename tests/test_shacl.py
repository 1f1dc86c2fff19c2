"""SHACL-core validation (operators/shacl.py): each constraint's
violation and conformance cases, closed-count minCount semantics
(absent edges count 0), per-value vs per-focus report granularity, a
python reference mirror over a mixed graph, DataFrame-shapes parity,
and loud rejection of unknown constraints."""

import pytest

from naruhodo_spark.operators.shacl import conforms, validate_shapes


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, pred string, dst string")


GRAPH = [
    ("alice", "is_a", "Person"),
    ("bob", "is_a", "Person"),
    ("carol", "is_a", "Person"),
    ("acme", "is_a", "Company"),
    ("alice", "email", "alice@example.com"),
    ("alice", "works_at", "acme"),
    ("bob", "email", "not-an-email"),
    ("bob", "email", "bob@example.com"),
    ("bob", "works_at", "initech"),          # initech is untyped
    ("carol", "status", "retired"),
    ("acme", "status", "active"),
]

SHAPES = [
    ("PersonShape", "Person", "email", "minCount", "1"),
    ("PersonShape", "Person", "email", "maxCount", "1"),
    ("PersonShape", "Person", "email", "pattern", "^[^@]+@[^@]+$"),
    ("PersonShape", "Person", "works_at", "class", "Company"),
    ("PersonShape", "Person", "status", "in", "active|retired"),
    ("CompanyShape", "Company", "status", "hasValue", "active"),
]


def _report(spark, graph=GRAPH, shapes=SHAPES):
    return {
        (r["focus"], r["constraint"], r["actual"])
        for r in validate_shapes(_edges(spark, graph), shapes).collect()
    }


def test_violations_exact(spark):
    got = _report(spark)
    assert got == {
        ("carol", "minCount", "0"),            # no email at all
        ("bob", "maxCount", "2"),              # two emails
        ("bob", "pattern", "not-an-email"),    # per-value report
        ("bob", "class", "initech"),           # value not typed Company
    }
    # alice conforms entirely; acme's hasValue is satisfied
    assert not any(f == "alice" or f == "acme" for f, _, _ in got)


def test_conforming_graph(spark):
    clean = [
        ("alice", "is_a", "Person"),
        ("alice", "email", "a@b.c"),
        ("alice", "works_at", "acme"),
        ("acme", "is_a", "Company"),
        ("acme", "status", "active"),
    ]
    assert conforms(_edges(spark, clean), SHAPES)
    assert not conforms(_edges(spark, GRAPH), SHAPES)


def test_hasvalue_and_in(spark):
    graph = [
        ("acme", "is_a", "Company"),
        ("acme", "status", "dormant"),
        ("globex", "is_a", "Company"),
    ]
    shapes = [
        ("S", "Company", "status", "hasValue", "active"),
        ("S", "Company", "status", "in", "active|dormant"),
    ]
    got = _report(spark, graph, shapes)
    # both companies miss hasValue; globex has NO status edge so the
    # 'in' check has nothing to flag (SHACL: value constraints range
    # over existing values only — absence is minCount's job)
    assert got == {
        ("acme", "hasValue", "absent"),
        ("globex", "hasValue", "absent"),
    }


def test_shapes_only_bind_their_target_class(spark):
    """A Company with a mis-shaped email never trips PersonShape."""
    graph = [
        ("acme", "is_a", "Company"),
        ("acme", "email", "not-an-email"),
        ("acme", "status", "active"),
    ]
    assert conforms(_edges(spark, graph), SHAPES)


def test_python_mirror(spark):
    """Independent driver-side reference over the same semantics."""
    got = _report(spark)
    want = set()
    types = {(s, o) for s, p, o in GRAPH if p == "is_a"}
    by_pred: dict = {}
    for s, p, o in GRAPH:
        by_pred.setdefault((s, p), []).append(o)
    import re

    for sid, tc, path, cons, val in SHAPES:
        for focus, cls in types:
            if cls != tc:
                continue
            vals = by_pred.get((focus, path), [])
            if cons == "minCount" and len(vals) < int(val):
                want.add((focus, cons, str(len(vals))))
            elif cons == "maxCount" and len(vals) > int(val):
                want.add((focus, cons, str(len(vals))))
            elif cons == "pattern":
                want |= {
                    (focus, cons, v) for v in vals if not re.search(val, v)
                }
            elif cons == "in":
                want |= {
                    (focus, cons, v) for v in vals if v not in val.split("|")
                }
            elif cons == "class":
                want |= {
                    (focus, cons, v) for v in vals if (v, val) not in types
                }
            elif cons == "hasValue" and val not in vals:
                want.add((focus, cons, "absent"))
    assert got == want


def test_dataframe_shapes_input(spark):
    from naruhodo_spark.operators.shacl import SHAPE_SCHEMA

    sh = spark.createDataFrame(SHAPES, SHAPE_SCHEMA)
    a = _report(spark)
    b = {
        (r["focus"], r["constraint"], r["actual"])
        for r in validate_shapes(_edges(spark, GRAPH), sh).collect()
    }
    assert a == b


def test_unknown_constraint_raises(spark):
    with pytest.raises(ValueError, match="unknown constraints"):
        validate_shapes(
            _edges(spark, GRAPH),
            [("S", "Person", "email", "uniqueLang", "true")],
        )
