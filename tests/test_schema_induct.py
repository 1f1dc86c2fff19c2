"""Predicate type signatures + violation flagging
(operators/schema_induct.py) vs an exact python mirror."""

import pytest
from pyspark.sql import functions as F

from naruhodo_spark.operators import schema_induct as SI


def _triples(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id string, subj string, pred string, obj string,"
        " subj_ne int, obj_ne int",
    )


@pytest.fixture(scope="module")
def kg(spark):
    rows = []
    # 'works_at': person (1) → organization (3), with one violation each
    for i in range(6):
        rows.append((f"d{i}", f"p{i}", "works_at", f"org{i}", 1, 3))
    rows.append(("dx", "tokyo", "works_at", "org9", 2, 3))   # dom violation
    rows.append(("dy", "p9", "works_at", "monday", 1, 5))    # range violation
    rows.append(("dz", "unk", "works_at", "org0", 0, 3))     # untyped subj: no vote
    # 'visits': too few typed rows on the object side for a signature
    rows.append(("dv", "p0", "visits", "x", 1, 0))
    rows.append(("dw", "p1", "visits", "y", 1, 0))
    return _triples(spark, rows)


def test_signatures(spark, kg):
    sig = {r["pred"]: r.asDict() for r in SI.predicate_signatures(kg).collect()}
    wa = sig["works_at"]
    assert wa["dom_type"] == 1 and wa["range_type"] == 3
    # 8 typed subjects: 7 person (incl. the range-violation row) + 1
    # location → conf 7/8
    assert wa["dom_conf"] == pytest.approx(round(7 / 8, 4))
    # 9 typed objects: 8 org (incl. the dom-violation and untyped-subj
    # rows) + 1 datetime → conf 8/9
    assert wa["range_conf"] == pytest.approx(round(8 / 9, 4))
    assert wa["support"] == 9
    v = sig["visits"]
    assert v["dom_type"] is None  # only 2 typed < min_support=3
    assert v["range_type"] is None
    assert v["support"] == 2


def test_violations(spark, kg):
    got = {
        (r["doc_id"], r["slot"]): (r["found_type"], r["expected_type"])
        for r in SI.type_violations(kg, min_conf=0.8).collect()
    }
    assert got == {
        ("dx", "subj"): (2, 1),
        ("dy", "obj"): (5, 3),
    }
    # raising min_conf above the signature confidence silences the queue
    assert SI.type_violations(kg, min_conf=0.95).count() == 0


def test_violations_e2e_over_built_kg(spark):
    from naruhodo_spark import synth
    from naruhodo_spark.pipeline import build_kg

    kg = build_kg(synth.synth_documents(spark, 80), prof=None)
    sig = SI.predicate_signatures(kg["triples"])
    assert sig.count() > 0
    assert set(sig.columns) == {
        "pred", "dom_type", "dom_conf", "range_type", "range_conf", "support"
    }
    SI.type_violations(kg["triples"], signatures=sig).count()  # runs clean
