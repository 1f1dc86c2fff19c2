"""Allen interval algebra over temporal-KG validity intervals
(temporal.allen_relations): all 7 canonical relations hit exactly,
side-ordering determinism, hub-key cap audit, multi-column keys."""

import pytest
from pyspark.sql import functions as F

from naruhodo_spark.operators.temporal import allen_relations


def _iv(spark, rows):
    return spark.createDataFrame(
        [(s, p, o, f + ":00", t + ":00") for s, p, o, f, t in rows],
        "subj string, pred string, obj string, "
        "valid_from string, valid_to string",
    ).select(
        "subj", "pred", "obj",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )


# one subject, intervals engineered to produce each canonical relation
CASES = [
    # (pred_a, from, to) vs (pred_b, from, to) -> relation (A = smaller tuple)
    ("before",       ("p1", "2024-01-01 00:00", "2024-01-01 01:00"),
                     ("p2", "2024-01-01 02:00", "2024-01-01 03:00")),
    ("meets",        ("p1", "2024-02-01 00:00", "2024-02-01 01:00"),
                     ("p2", "2024-02-01 01:00", "2024-02-01 02:00")),
    ("overlaps",     ("p1", "2024-03-01 00:00", "2024-03-01 02:00"),
                     ("p2", "2024-03-01 01:00", "2024-03-01 03:00")),
    ("starts",       ("p1", "2024-04-01 00:00", "2024-04-01 01:00"),
                     ("p2", "2024-04-01 00:00", "2024-04-01 02:00")),
    ("during_inv",   ("p1", "2024-05-01 00:00", "2024-05-01 03:00"),
                     ("p2", "2024-05-01 01:00", "2024-05-01 02:00")),
    ("finishes_inv", ("p1", "2024-06-01 00:00", "2024-06-01 02:00"),
                     ("p2", "2024-06-01 01:00", "2024-06-01 02:00")),
    ("equals",       ("p1", "2024-07-01 00:00", "2024-07-01 01:00"),
                     ("p2", "2024-07-01 00:00", "2024-07-01 01:00")),
]


@pytest.fixture(scope="module")
def pairs(spark):
    rows = []
    for i, (_, a, b) in enumerate(CASES):
        subj = f"s{i}"
        rows.append((subj, a[0], "oa", a[1], a[2]))
        rows.append((subj, b[0], "ob", b[1], b[2]))
    got, audit = allen_relations(_iv(spark, rows))
    assert audit.isEmpty()
    return {r["subj"]: r for r in got.collect()}


@pytest.mark.parametrize("i,case", list(enumerate(CASES)))
def test_relation(pairs, i, case):
    expected = case[0]
    row = pairs[f"s{i}"]
    assert row["relation"] == expected
    # A side is always the lexicographically smaller tuple
    assert (row["from_a"], row["to_a"], row["pred_a"]) <= (
        row["from_b"], row["to_b"], row["pred_b"]
    )


def test_each_unordered_pair_emitted_once(spark):
    rows = [
        ("s", "p1", "o", "2024-01-01 00:00", "2024-01-01 01:00"),
        ("s", "p2", "o", "2024-01-01 00:30", "2024-01-01 02:00"),
        ("s", "p3", "o", "2024-01-01 03:00", "2024-01-01 04:00"),
    ]
    got, _ = allen_relations(_iv(spark, rows))
    assert got.count() == 3  # C(3,2)


def test_hub_cap_drops_loudly(spark):
    rows = [
        ("hub", f"p{i}", "o", "2024-01-01 00:00", "2024-01-01 01:00")
        for i in range(5)
    ] + [
        ("ok", "p1", "o", "2024-01-01 00:00", "2024-01-01 01:00"),
        ("ok", "p2", "o", "2024-01-01 02:00", "2024-01-01 03:00"),
    ]
    got, audit = allen_relations(_iv(spark, rows), max_per_key=3)
    a = audit.collect()
    assert len(a) == 1 and a[0]["subj"] == "hub" and a[0]["n_intervals"] == 5
    assert {r["subj"] for r in got.collect()} == {"ok"}


def test_multi_column_key(spark):
    # key=[subj, pred]: only same-predicate intervals pair up
    rows = [
        ("s", "p1", "o1", "2024-01-01 00:00", "2024-01-01 01:00"),
        ("s", "p1", "o2", "2024-01-01 02:00", "2024-01-01 03:00"),
        ("s", "p2", "o3", "2024-01-01 00:00", "2024-01-01 01:00"),
    ]
    got, _ = allen_relations(_iv(spark, rows), key=["subj", "pred"])
    out = got.collect()
    assert len(out) == 1
    assert out[0]["relation"] == "before" and out[0]["pred"] == "p1"
