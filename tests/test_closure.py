"""Transitive closure (operators/closure.py) and SPARQL unbounded
property paths ``p+`` / ``p*`` (sparql.py): fixpoint semantics on
chains / cycles / DAGs, SPARQL 1.1 §9.1-9.3 zero-length semantics,
inverse closures, composition with other patterns, and a DuckDB
``WITH RECURSIVE`` parity mirror on the TPC-H order-succession graph
(the exact program the driver oracle runs)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from naruhodo_spark.operators.closure import (
    reflexive_transitive_closure,
    transitive_closure,
)
from naruhodo_spark.sparql import SparqlError, sparql_select


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, pred string, dst string")


def _py_closure(rows):
    """Driver-side reference: Floyd-Warshall-ish saturation on a dict."""
    pairs = set(rows)
    while True:
        new = {
            (a, d)
            for a, b in pairs
            for c, d in pairs
            if b == c and (a, d) not in pairs
        }
        if not new:
            return pairs
        pairs |= new


# ---------------------------------------------------------------- operator


def test_closure_chain(spark):
    got = sorted(
        map(
            tuple,
            transitive_closure(
                _pairs(spark, [("a", "b"), ("b", "c"), ("c", "d")])
            ).collect(),
        )
    )
    assert got == [
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
    ]


def test_closure_cycle_saturates(spark):
    rows = [("a", "b"), ("b", "c"), ("c", "a")]
    got = set(map(tuple, transitive_closure(_pairs(spark, rows)).collect()))
    assert got == {(x, y) for x in "abc" for y in "abc"}
    assert got == _py_closure(rows)


def test_closure_dag_and_selfloop(spark):
    rows = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("e", "e")]
    got = set(map(tuple, transitive_closure(_pairs(spark, rows)).collect()))
    assert got == _py_closure(rows)
    assert ("e", "e") in got and ("a", "d") in got


def test_closure_duplicate_and_null_rows(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "c"), (None, "x"), ("x", None)],
        "src string, dst string",
    )
    got = sorted(map(tuple, transitive_closure(df).collect()))
    assert got == [("a", "b"), ("a", "c"), ("b", "c")]


def test_closure_max_rounds_raises_loudly(spark):
    chain = [(f"n{i}", f"n{i + 1}") for i in range(8)]
    with pytest.raises(RuntimeError, match="max_rounds"):
        transitive_closure(_pairs(spark, chain), max_rounds=2)
    # and the honest bound is enough: shortest-path diameter 8 needs <= 8
    assert transitive_closure(_pairs(spark, chain), max_rounds=8).count() == 36


def test_reflexive_closure_adds_graph_nodes(spark):
    nodes = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("lonely",)], "node string"
    )
    got = set(
        map(
            tuple,
            reflexive_transitive_closure(
                _pairs(spark, [("a", "b"), ("b", "c")]), nodes
            ).collect(),
        )
    )
    assert got == {
        ("a", "b"), ("a", "c"), ("b", "c"),
        ("a", "a"), ("b", "b"), ("c", "c"), ("lonely", "lonely"),
    }


# ---------------------------------------------------------------- SPARQL


TAXO = [
    ("poodle", "subclass_of", "dog"),
    ("dog", "subclass_of", "mammal"),
    ("mammal", "subclass_of", "animal"),
    ("cat", "subclass_of", "mammal"),
    ("rex", "is_a", "poodle"),
    ("tom", "is_a", "cat"),
]


def test_sparql_one_or_more(spark):
    got = sorted(
        map(
            tuple,
            sparql_select(
                _edges(spark, TAXO),
                "SELECT ?x WHERE { ?x subclass_of+ animal }",
            ).collect(),
        )
    )
    assert got == [("cat",), ("dog",), ("mammal",), ("poodle",)]


def test_sparql_zero_or_more_includes_identity(spark):
    got = sorted(
        r["y"]
        for r in sparql_select(
            _edges(spark, TAXO),
            "SELECT ?y WHERE { poodle subclass_of* ?y }",
        ).collect()
    )
    assert got == ["animal", "dog", "mammal", "poodle"]
    # zero-length paths bind EVERY graph node to itself, even nodes
    # with no subclass_of edge at all (rex only has is_a edges)
    diag = sparql_select(
        _edges(spark, TAXO),
        "SELECT ?x WHERE { ?x subclass_of* ?x }",
    )
    assert sorted(r["x"] for r in diag.collect()) == sorted(
        {n for s, _, o in TAXO for n in (s, o)}
    )


def test_sparql_inverse_closure(spark):
    """^subclass_of+ from mammal walks DOWN the taxonomy."""
    got = sorted(
        r["x"]
        for r in sparql_select(
            _edges(spark, TAXO),
            "SELECT ?x WHERE { mammal ^subclass_of+ ?x }",
        ).collect()
    )
    assert got == ["cat", "dog", "poodle"]


def test_sparql_closure_composes_with_patterns(spark):
    """Instances of animal = is_a composed with the subclass closure —
    the canonical RDFS-style query a closure path exists for."""
    got = sorted(
        r["i"]
        for r in sparql_select(
            _edges(spark, TAXO),
            "SELECT ?i WHERE { ?i is_a ?c . ?c subclass_of* ?k . "
            'FILTER (?k = "animal") }',
        ).collect()
    )
    assert got == ["rex", "tom"]


def test_sparql_closure_under_aggregate(spark):
    got = sparql_select(
        _edges(spark, TAXO),
        "SELECT ?k (COUNT(*) AS ?n) WHERE { ?x subclass_of+ ?k } "
        "GROUP BY ?k HAVING (?n >= 2)",
    ).collect()
    assert sorted((r["k"], r["n"]) for r in got) == [
        ("animal", 4), ("mammal", 3)
    ]


def test_sparql_closure_on_cycle_terminates(spark):
    e = _edges(
        spark,
        [("a", "next", "b"), ("b", "next", "c"), ("c", "next", "a")],
    )
    got = sparql_select(e, "SELECT ?x ?y WHERE { ?x next+ ?y }")
    assert got.count() == 9


def test_sparql_marker_predicate_cannot_be_shadowed(spark):
    """A hostile edge whose predicate starts with the internal marker
    byte is excluded from the augmented frame, not matched as closure
    rows."""
    e = _edges(
        spark,
        TAXO + [("evil", "\x1f_closure0\x1fsubclass_of+", "animal")],
    )
    got = sorted(
        r["x"]
        for r in sparql_select(
            e, "SELECT ?x WHERE { ?x subclass_of+ animal }"
        ).collect()
    )
    assert got == ["cat", "dog", "mammal", "poodle"]


def test_sparql_closure_rejects_non_const_and_sequences(spark):
    e = _edges(spark, TAXO)
    for bad in (
        "SELECT ?x WHERE { ?x ?p+ ?y }",
        "SELECT ?x WHERE { ?x ?p* ?y }",
        "SELECT ?x WHERE { ?x (subclass_of|is_a)+ ?y }",
    ):
        with pytest.raises((SparqlError, ValueError)):
            sparql_select(e, bad).collect()


# ------------------------------------------------- driver-oracle mirror


def test_duckdb_recursive_cte_parity(spark, sf_dir):
    """The exact program pair behind the kg_sparql_closure driver
    oracle: Spark = semi-naive fixpoint under the SPARQL compiler;
    DuckDB = WITH RECURSIVE over the same order-succession edges."""
    from naruhodo_spark.queries import ORACLES, QUERIES

    got = sorted(
        map(tuple, QUERIES["kg_sparql_closure"](spark, sf_dir).collect())
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'"
    )
    want = sorted(map(tuple, con.execute(ORACLES["kg_sparql_closure"]).fetchall()))
    con.close()
    assert len(got) > 0
    assert got == want
