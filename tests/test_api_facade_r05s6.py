"""Facade methods added in r05 session-6 (api.parser.entail /
validate, plus sparql() gaining unbounded property paths) — each
driven through the public API on a small synth corpus."""

from naruhodo_spark.api import parser


def _p(spark):
    return parser(spark, lang="en").add_all(
        [
            "alice visited bob.",
            "bob visited carol.",
            "dave praised alice.",
        ]
    )


def test_facade_sparql_closure(spark):
    p = _p(spark)
    got = sorted(
        map(tuple, p.sparql("SELECT ?x ?y WHERE { ?x visit+ ?y }").collect())
    )
    assert ("alice", "carol") in got          # 2-hop via the closure
    assert ("alice", "bob") in got and ("bob", "carol") in got


def test_facade_entail_with_schema(spark):
    p = _p(spark)
    out = p.entail(
        schema=[
            ("visit", "subproperty_of", "interacted_with"),
            ("visit", "domain", "Visitor"),
            ("Visitor", "subclass_of", "Agent"),
        ]
    )
    rows = set(map(tuple, out.collect()))
    assert ("alice", "interacted_with", "bob") in rows   # rdfs7
    assert ("alice", "is_a", "Visitor") in rows          # rdfs2
    assert ("alice", "is_a", "Agent") in rows            # rdfs9
    # the raw extracted edges survive into the closed graph
    assert ("alice", "visit", "bob") in rows


def test_facade_validate(spark):
    p = _p(spark)
    schema = [("visit", "domain", "Visitor")]
    shapes = [("V", "Visitor", "visit", "minCount", "1")]
    # validating the RAW graph: no is_a edges -> no focus nodes -> conforms
    assert p.validate(shapes).isEmpty()
    # validating the entailed graph: visitors typed via rdfs2, and both
    # have visit edges -> still conforms
    from naruhodo_spark.operators.shacl import validate_shapes

    assert validate_shapes(p.entail(schema=schema), shapes).isEmpty()
    # a maxCount 0 shape now trips per typed visitor
    viol = validate_shapes(
        p.entail(schema=schema),
        [("V", "Visitor", "visit", "maxCount", "0")],
    )
    assert sorted(r["focus"] for r in viol.collect()) == ["alice", "bob"]
