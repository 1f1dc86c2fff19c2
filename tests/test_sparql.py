"""SPARQL SELECT compiler (naruhodo_spark/sparql.py): parity with
hand-built motifs, SPARQL homomorphic/bag semantics, constants,
filters, NOT EXISTS, modifiers, prefix expansion, and loud rejection
of everything outside the subset."""

import pytest
from pyspark.sql import functions as F

from naruhodo_spark.sparql import SparqlError, sparql_select


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, pred string, dst string")


GRAPH = [
    ("alice", "knows", "bob"),
    ("bob", "knows", "carol"),
    ("carol", "knows", "alice"),
    ("alice", "works_at", "acme"),
    ("bob", "works_at", "acme"),
    ("carol", "works_at", "globex"),
    ("acme", "is_a", "company"),
    ("globex", "is_a", "company"),
    ("dave", "knows", "dave2"),
]


def test_parity_with_motif(spark):
    from naruhodo_spark.operators.motif import match_motif

    e = _edges(spark, GRAPH)
    got = sparql_select(
        e,
        "SELECT ?x ?y ?c WHERE { ?x knows ?y . ?x works_at ?c . "
        "?y works_at ?c }",
    )
    want = match_motif(
        e,
        [("x", "knows", "y"), ("x", "works_at", "c"),
         ("y", "works_at", "c")],
        distinct_nodes=False,
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    ) == [("alice", "bob", "acme")]


def test_homomorphic_semantics(spark):
    """SPARQL solutions may bind two variables to one node: a 2-cycle
    matches ?x knows ?y . ?y knows ?z with x = z."""
    e = _edges(spark, [("a", "knows", "b"), ("b", "knows", "a")])
    got = sorted(
        map(tuple, sparql_select(
            e, "SELECT ?x ?z WHERE { ?x knows ?y . ?y knows ?z }"
        ).collect())
    )
    assert got == [("a", "a"), ("b", "b")]


def test_constant_terms_and_star(spark):
    e = _edges(spark, GRAPH)
    got = sparql_select(
        e, 'SELECT * WHERE { ?who works_at acme . ?who knows ?other }'
    )
    assert sorted(got.columns) == ["other", "who"]
    assert sorted(map(tuple, got.collect())) == [
        ("alice", "bob"), ("bob", "carol")
    ]
    # same constant twice shares one internal slot; quoted form works
    got2 = sparql_select(
        e,
        'SELECT ?a ?b WHERE { ?a works_at "acme" . ?b works_at "acme" . '
        "?a knows ?b }",
    )
    assert [tuple(r) for r in got2.collect()] == [("alice", "bob")]


def test_predicate_variable_and_a_keyword(spark):
    e = _edges(spark, GRAPH)
    got = sparql_select(
        e, "SELECT ?what ?rel WHERE { acme ?rel ?what }"
    )
    assert sorted(map(tuple, got.collect())) == [("company", "is_a")]
    got2 = sparql_select(e, "SELECT ?org WHERE { ?org a company }")
    assert sorted(r["org"] for r in got2.collect()) == ["acme", "globex"]


def test_filters(spark):
    e = _edges(spark, GRAPH)
    got = sparql_select(
        e,
        "SELECT ?x ?y WHERE { ?x knows ?y . FILTER (?x != ?y && ?x < ?y) }",
    )
    assert sorted(map(tuple, got.collect())) == [
        ("alice", "bob"), ("bob", "carol"), ("dave", "dave2")
    ]
    # numeric filter casts the variable side
    en = _edges(spark, [("a", "score", "9"), ("b", "score", "10")])
    got2 = sparql_select(
        en, "SELECT ?v WHERE { ?v score ?s . FILTER (?s >= 10) }"
    )
    assert [r["v"] for r in got2.collect()] == ["b"]


def test_not_exists(spark):
    e = _edges(spark, GRAPH)
    # existential object: ?y that works nowhere
    got = sparql_select(
        e,
        "SELECT ?x ?y WHERE { ?x knows ?y . "
        "FILTER NOT EXISTS { ?y works_at ?c } }",
    )
    assert sorted(map(tuple, got.collect())) == [("dave", "dave2")]
    # constant object: who knows someone not at acme
    got2 = sparql_select(
        e,
        "SELECT ?x WHERE { ?x knows ?y . "
        "FILTER NOT EXISTS { ?y works_at acme } }",
    )
    assert sorted(r["x"] for r in got2.collect()) == ["bob", "dave"]


def test_distinct_order_limit(spark):
    e = _edges(spark, GRAPH)
    q = (
        "SELECT DISTINCT ?c WHERE { ?x works_at ?c } "
        "ORDER BY DESC(?c) LIMIT 1"
    )
    assert [r["c"] for r in sparql_select(e, q).collect()] == ["globex"]
    bag = sparql_select(e, "SELECT ?c WHERE { ?x works_at ?c }")
    assert bag.count() == 3  # bag semantics without DISTINCT


def test_prefix_expansion(spark):
    e = _edges(
        spark,
        [("http://ex/alice", "http://ex/knows", "http://ex/bob")],
    )
    got = sparql_select(
        e,
        "PREFIX ex: <http://ex/> "
        "SELECT ?y WHERE { ex:alice ex:knows ?y }",
    )
    assert [r["y"] for r in got.collect()] == ["http://ex/bob"]
    # undeclared default prefix degrades to the bare local name
    e2 = _edges(spark, [("alice", "knows", "bob")])
    got2 = sparql_select(e2, "SELECT ?y WHERE { :alice knows ?y }")
    assert [r["y"] for r in got2.collect()] == ["bob"]


def test_ksg_column_contract(spark):
    ksg = spark.createDataFrame(
        [("alice", "run", "", 1), ("alice", "know", "bob", 2)],
        "subj string, pred string, obj string, weight int",
    )
    got = sparql_select(ksg, "SELECT ?o WHERE { alice know ?o }")
    assert [r["o"] for r in got.collect()] == ["bob"]
    # objectless triples point at the predicate node (edge_target)
    got2 = sparql_select(ksg, "SELECT ?t WHERE { alice ?p ?t . FILTER (?p = run) }")
    assert [r["t"] for r in got2.collect()] == ["pred:run"]


def test_facade_sparql(spark):
    from naruhodo_spark.api import parser

    p = parser(spark, lang="en").add_all(
        ["alice visits bob.", "bob visits carol."]
    )
    got = p.sparql("SELECT ?z WHERE { alice visit ?y . ?y visit ?z }")
    assert [r["z"] for r in got.collect()] == ["carol"]


@pytest.mark.parametrize(
    "bad",
    [
        "SELECT ?x WHERE { ?x knows ?y . ?a knows ?b }",  # disconnected
        "SELECT ?x WHERE { }",  # no patterns
        "SELECT ?z WHERE { ?x knows ?y }",  # unbound projection
        "SELECT ?x WHERE { ?x knows ?y . FILTER (?q = ?x) }",  # unbound filter
        "SELECT ?x WHERE { ?x ?p ?y . ?y ?p ?z }",  # reused pred var
        "SELECT ?x WHERE { ?x knows ?y . "
        "FILTER NOT EXISTS { ?a knows ?b } }",  # uncorrelated NOT EXISTS
        "SELECT ?x WHERE { ?x knows ?y",  # unterminated
        "SELECT ?x WHERE { ?x knows ?y } ORDER BY ?y",  # unprojected order
        "SELECT ?x WHERE { ?x knows ?y } LIMIT ?x",  # bad limit
        "SELECT ?x WHERE { ?x knows ?y . FILTER (?x ~ ?y) }",  # bad op
        "SELECT ?x WHERE { ?x ?p+ ?y }",  # closure over a predicate var
        "SELECT ?x WHERE { ?x knows{0,2} ?y }",  # zero-length path
        "SELECT ?x WHERE { ?x knows{3,2} ?y }",  # inverted bounds
        "SELECT ?x WHERE { ?x knows{1,99} ?y }",  # bound too large
        "SELECT ?x WHERE { ?x ?p|knows ?y }",  # var in alternation
        # OPTIONAL with no shared variable
        "SELECT ?x WHERE { ?x knows ?y . OPTIONAL { ?a works_at ?b } }",
        # FILTER inside OPTIONAL
        "SELECT ?x WHERE { ?x knows ?y . "
        "OPTIONAL { ?y works_at ?c . FILTER (?c != ?x) } }",
        # UNION branches binding different variables
        "SELECT ?x WHERE { { ?x knows ?y } UNION { ?x works_at ?z } }",
        # group not at top level
        "SELECT ?x WHERE { ?x knows ?y . { ?y knows ?z } UNION "
        "{ ?y works_at ?z } }",
        "DESCRIBE ?x WHERE { ?x knows ?y }",  # unsupported form
    ],
)
def test_rejects_outside_subset(spark, bad):
    e = _edges(spark, GRAPH)
    with pytest.raises((SparqlError, ValueError)):
        sparql_select(e, bad).collect()


def test_no_cross_product_and_pushdown(spark):
    """Compiled plan: literal predicates are pushed to the scan side
    and there is no cartesian product node."""
    e = _edges(spark, GRAPH)
    plan = sparql_select(
        e, "SELECT ?x ?y WHERE { ?x knows ?y . ?y works_at ?c }"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_optional_left_join_and_bound(spark):
    e = _edges(spark, GRAPH)
    got = {
        (r["x"], r["y"], r["c"])
        for r in sparql_select(
            e,
            "SELECT ?x ?y ?c WHERE { ?x knows ?y . "
            "OPTIONAL { ?y works_at ?c } }",
        ).collect()
    }
    # dave2 works nowhere -> row kept with NULL company
    assert ("dave", "dave2", None) in got
    assert ("alice", "bob", "acme") in got
    # BOUND / !BOUND filter the optional binding
    n_bound = sparql_select(
        e,
        "SELECT ?x WHERE { ?x knows ?y . OPTIONAL { ?y works_at ?c } . "
        "FILTER (BOUND(?c)) }",
    ).count()
    n_unbound = sparql_select(
        e,
        "SELECT ?x WHERE { ?x knows ?y . OPTIONAL { ?y works_at ?c } . "
        "FILTER (!BOUND(?c)) }",
    ).count()
    assert n_bound == 3 and n_unbound == 1


def test_union_groups(spark):
    e = _edges(spark, GRAPH)
    got = sorted(
        map(tuple, sparql_select(
            e,
            "SELECT ?x ?y WHERE { { ?x knows ?y . FILTER (?x = alice) } "
            "UNION { ?x works_at ?y . FILTER (?x = alice) } }",
        ).collect())
    )
    assert got == [("alice", "acme"), ("alice", "bob")]


def test_union_trailing_filter(spark):
    """A FILTER after the UNION chain applies to the union result —
    equivalent to writing it inside each branch."""
    e = _edges(spark, GRAPH)
    outer = sorted(
        map(tuple, sparql_select(
            e,
            "SELECT ?x ?y WHERE { { ?x knows ?y } UNION "
            "{ ?x works_at ?y } FILTER (?x = alice) }",
        ).collect())
    )
    assert outer == [("alice", "acme"), ("alice", "bob")]
    # conjoined comparisons and NOT EXISTS distribute too
    outer2 = sorted(
        map(tuple, sparql_select(
            e,
            "SELECT ?x ?y WHERE { { ?x knows ?y } UNION "
            "{ ?x works_at ?y } FILTER (?x != dave) . "
            "FILTER NOT EXISTS { ?x works_at globex } }",
        ).collect())
    )
    assert ("carol", "alice") not in outer2  # carol works_at globex
    assert ("dave", "dave2") not in outer2
    assert ("alice", "bob") in outer2 and ("alice", "acme") in outer2


def test_ask(spark):
    e = _edges(spark, GRAPH)
    assert sparql_select(e, "ASK { alice knows ?y }").collect()[0]["ask"]
    assert not sparql_select(
        e, "ASK { carol knows ?y . ?y works_at globex }"
    ).collect()[0]["ask"]


def test_predicate_alternation(spark):
    e = _edges(spark, GRAPH)
    got = sorted(
        map(tuple, sparql_select(
            e, "SELECT ?what WHERE { alice knows|works_at ?what }"
        ).collect())
    )
    assert got == [("acme",), ("bob",)]


def test_bounded_path(spark):
    e = _edges(spark, GRAPH)
    # knows{2} from alice: alice->bob->carol
    got = sparql_select(
        e, "SELECT ?z WHERE { alice knows{2,2} ?z }"
    ).collect()
    assert [r["z"] for r in got] == ["carol"]
    # knows{1,3} from alice reaches bob, carol, and (via the 3-cycle)
    # alice itself at length 3 — homomorphic path semantics
    got2 = sorted(
        r["z"] for r in sparql_select(
            e, "SELECT ?z WHERE { alice knows{1,3} ?z }"
        ).collect()
    )
    assert got2 == ["alice", "bob", "carol"]
    # python mirror on the full reachability at each length
    adj = {}
    for s, p, o in GRAPH:
        if p == "knows":
            adj.setdefault(s, []).append(o)
    reach, frontier, want = set(), ["alice"], []
    for _ in range(3):
        frontier = [o for s in frontier for o in adj.get(s, [])]
        want.extend(frontier)
    assert got2 == sorted(set(want))


def test_path_and_optional_compose(spark):
    e = _edges(spark, GRAPH)
    got = {
        (r["z"], r["c"])
        for r in sparql_select(
            e,
            "SELECT ?z ?c WHERE { dave knows{1,2} ?z . "
            "OPTIONAL { ?z works_at ?c } }",
        ).collect()
    }
    assert got == {("dave2", None)}


def test_aggregates_group_by(spark):
    e = _edges(spark, GRAPH)
    got = sorted(map(tuple, sparql_select(
        e,
        "SELECT ?c (COUNT(?x) AS ?n) WHERE { ?x works_at ?c } GROUP BY ?c",
    ).collect()))
    assert got == [("acme", 2), ("globex", 1)]
    # global aggregate (no GROUP BY), two aggregates, COUNT(*)
    row = sparql_select(
        e,
        "SELECT (COUNT(*) AS ?n) (MIN(?x) AS ?lo) WHERE { ?x knows ?y }",
    ).collect()[0]
    assert (row["n"], row["lo"]) == (4, "alice")
    # COUNT(DISTINCT ?v)
    assert sparql_select(
        e, "SELECT (COUNT(DISTINCT ?c) AS ?n) WHERE { ?x works_at ?c }"
    ).collect()[0]["n"] == 2
    # GROUP BY with no aggregates = distinct group keys
    keys = sorted(r["c"] for r in sparql_select(
        e, "SELECT ?c WHERE { ?x works_at ?c } GROUP BY ?c"
    ).collect())
    assert keys == ["acme", "globex"]


def test_having_and_order_on_alias(spark):
    e = _edges(spark, GRAPH)
    got = sparql_select(
        e,
        "SELECT ?c (COUNT(?x) AS ?n) WHERE { ?x works_at ?c } "
        "GROUP BY ?c HAVING (?n >= 2)",
    ).collect()
    assert [(r["c"], r["n"]) for r in got] == [("acme", 2)]
    # ORDER BY the aggregate alias
    ordered = sparql_select(
        e,
        "SELECT ?c (COUNT(?x) AS ?n) WHERE { ?x works_at ?c } "
        "GROUP BY ?c ORDER BY DESC(?n)",
    ).collect()
    assert [r["c"] for r in ordered] == ["acme", "globex"]


def test_sum_avg_cast_to_double(spark):
    e = _edges(spark, [
        ("alice", "scored", "3"), ("alice", "scored", "5"),
        ("bob", "scored", "10"),
    ])
    got = {
        r["x"]: (r["s"], r["a"])
        for r in sparql_select(
            e,
            "SELECT ?x (SUM(?v) AS ?s) (AVG(?v) AS ?a) "
            "WHERE { ?x scored ?v } GROUP BY ?x",
        ).collect()
    }
    assert got == {"alice": (8.0, 4.0), "bob": (10.0, 10.0)}


def test_values_inline_data(spark):
    e = _edges(spark, GRAPH)
    got = sorted(map(tuple, sparql_select(
        e,
        "SELECT ?x ?c WHERE { ?x works_at ?c . VALUES ?x { alice carol } }",
    ).collect()))
    assert got == [("alice", "acme"), ("carol", "globex")]
    # multi-var form constrains the tuple jointly
    got2 = sorted(map(tuple, sparql_select(
        e,
        "SELECT ?x ?c WHERE { ?x works_at ?c . "
        "VALUES (?x ?c) { (alice acme) (carol acme) } }",
    ).collect()))
    assert got2 == [("alice", "acme")]


def test_minus(spark):
    e = _edges(spark, GRAPH)
    got = sorted(r["x"] for r in sparql_select(
        e, "SELECT ?x WHERE { ?x knows ?y . MINUS { ?x works_at globex } }"
    ).collect())
    assert got == ["alice", "bob", "dave"]  # carol removed
    # spec semantics: a MINUS sharing no variables removes nothing
    n = sparql_select(
        e, "SELECT ?x WHERE { ?x knows ?y . MINUS { ?a works_at ?b } }"
    ).count()
    assert n == 4


def test_inverse_and_sequence_paths(spark):
    e = _edges(spark, GRAPH)
    # ^works_at from acme = its employees
    got = sorted(r["x"] for r in sparql_select(
        e, "SELECT ?x WHERE { acme ^works_at ?x }"
    ).collect())
    assert got == ["alice", "bob"]
    # sequence: alice's employer's type
    assert [r["t"] for r in sparql_select(
        e, "SELECT ?t WHERE { alice works_at/is_a ?t }"
    ).collect()] == ["company"]
    # sequence with an inverted element: bob knows carol; who knows
    # carol -> bob (homomorphic: z may equal the start)
    assert [r["z"] for r in sparql_select(
        e, "SELECT ?z WHERE { bob knows/^knows ?z }"
    ).collect()] == ["bob"]
    # inverted bounded quantifier: two knows-edges walked backwards
    assert [r["z"] for r in sparql_select(
        e, "SELECT ?z WHERE { carol ^knows{2,2} ?z }"
    ).collect()] == ["alice"]


def test_triple_list_sugar(spark):
    e = _edges(spark, GRAPH)
    # ';' repeats the subject
    got = sorted(map(tuple, sparql_select(
        e, "SELECT ?o ?c WHERE { alice knows ?o ; works_at ?c . }"
    ).collect()))
    assert got == [("bob", "acme")]
    # ',' repeats subject+predicate: x works_at acme AND works_at ?c
    got2 = sorted(r["x"] for r in sparql_select(
        e, "SELECT ?x WHERE { ?x works_at acme , ?c . }"
    ).collect())
    assert got2 == ["alice", "bob"]


def test_aggregate_rejections(spark):
    e = _edges(spark, GRAPH)
    bad = [
        # projected var not a group key
        "SELECT ?x (COUNT(?y) AS ?n) WHERE { ?x knows ?y }",
        # * with GROUP BY
        "SELECT * WHERE { ?x knows ?y } GROUP BY ?x",
        # HAVING without aggregation
        "SELECT ?x WHERE { ?x knows ?y } HAVING (?x = alice)",
        # GROUP BY under ASK
        "ASK { ?x knows ?y } GROUP BY ?x",
        # unknown aggregate
        "SELECT (MEDIAN(?y) AS ?n) WHERE { ?x knows ?y }",
        # alias shadows a pattern variable
        "SELECT (COUNT(?y) AS ?x) WHERE { ?x knows ?y } GROUP BY ?x",
        # HAVING on a non-visible variable
        "SELECT ?c (COUNT(?x) AS ?n) WHERE { ?x works_at ?c } "
        "GROUP BY ?c HAVING (?x = alice)",
        # VALUES sharing no variable (cross product)
        "SELECT ?x WHERE { ?x knows ?y . VALUES ?z { a } }",
        # UNDEF rejected
        "SELECT ?x WHERE { ?x knows ?y . VALUES ?x { UNDEF } }",
        # variable predicate cannot be inverted
        "SELECT ?x WHERE { ?x ^?p ?y }",
    ]
    for q in bad:
        with pytest.raises(SparqlError):
            sparql_select(e, q)


def test_construct_basic_and_set_semantics(spark):
    """CONSTRUCT instantiates every template triple per solution and
    returns a GRAPH (set): duplicate instantiations collapse."""
    from naruhodo_spark.sparql import sparql_construct

    e = _edges(spark, GRAPH)
    g = sparql_construct(
        e,
        "CONSTRUCT { ?x colleague_of ?y . ?x a employee } "
        "WHERE { ?x works_at ?c . ?y works_at ?c . FILTER (?x != ?y) }",
    )
    got = sorted(map(tuple, g.collect()))
    assert got == [
        ("alice", "colleague_of", "bob"),
        ("alice", "is_a", "employee"),
        ("bob", "colleague_of", "alice"),
        ("bob", "is_a", "employee"),
    ]


def test_construct_template_sugar_and_constants(spark):
    """';'/',' sugar and constant subjects/objects in the template."""
    from naruhodo_spark.sparql import sparql_construct

    e = _edges(spark, GRAPH)
    g = sparql_construct(
        e,
        'CONSTRUCT { ?c org ?x , "hq" ; size 2 } '
        "WHERE { ?x works_at ?c . FILTER (?c = acme) }",
    )
    got = sorted(map(tuple, g.collect()))
    assert got == [
        ("acme", "org", "alice"),
        ("acme", "org", "bob"),
        ("acme", "org", "hq"),
        ("acme", "size", "2"),
    ]


def test_construct_optional_unbound_drops_triple(spark):
    """A template triple over an unbound OPTIONAL variable emits
    nothing for that solution; sibling template triples still emit
    (SPARQL 1.1 §16.2)."""
    from naruhodo_spark.sparql import sparql_construct

    e = _edges(
        spark,
        [("alice", "knows", "bob"), ("bob", "knows", "carol"),
         ("alice", "in", "tokyo")],
    )
    g = sparql_construct(
        e,
        "CONSTRUCT { ?x located ?c . ?x a person } "
        "WHERE { ?x knows ?y . OPTIONAL { ?x in ?c } }",
    )
    got = sorted(map(tuple, g.collect()))
    assert got == [
        ("alice", "is_a", "person"),
        ("alice", "located", "tokyo"),
        ("bob", "is_a", "person"),
    ]


def test_construct_union_where(spark):
    from naruhodo_spark.sparql import sparql_construct

    e = _edges(spark, GRAPH)
    g = sparql_construct(
        e,
        "CONSTRUCT { ?x linked ?y } WHERE "
        "{ { ?x knows ?y } UNION { ?x works_at ?y } }",
    )
    assert g.count() == len(GRAPH) - 2  # the two is_a edges don't match
    assert g.columns == ["src", "pred", "dst"]


def test_construct_map_only_above_solutions(spark):
    """Template instantiation adds NO shuffle beyond the WHERE joins +
    the final distinct: exactly the WHERE-chain joins appear, and no
    extra Exchange beyond union→distinct's single hash aggregate."""
    from naruhodo_spark.sparql import sparql_construct

    e = _edges(spark, GRAPH)
    g = sparql_construct(
        e, "CONSTRUCT { ?x p1 ?y . ?y p2 ?x } WHERE { ?x knows ?y }"
    )
    plan = g._jdf.queryExecution().executedPlan().toString()
    # one distinct over the unioned projections = one pair of
    # HashAggregates; the single-pattern WHERE has no join at all
    assert "Join" not in plan
    assert plan.count("HashAggregate") <= 4  # partial+final, pre/post-Exchange


@pytest.mark.parametrize(
    "bad",
    [
        "CONSTRUCT { ?x p ?z } WHERE { ?x knows ?y }",  # unbound template var
        "CONSTRUCT { } WHERE { ?x knows ?y }",  # empty template
        "CONSTRUCT { ?x p ?y } WHERE { ?x knows ?y } LIMIT 2",
        "CONSTRUCT { ?x p ?y } WHERE { ?x knows ?y } ORDER BY ?x",
        "CONSTRUCT { ?x p ?y } WHERE { ?x knows ?y } GROUP BY ?x",
        "CONSTRUCT { ?x knows{1,2} ?y } WHERE { ?x knows ?y }",  # path in tmpl
        "SELECT ?x WHERE { ?x knows ?y }",  # wrong form for construct
    ],
)
def test_construct_rejections(spark, bad):
    from naruhodo_spark.sparql import sparql_construct

    with pytest.raises((SparqlError, ValueError)):
        sparql_construct(_edges(spark, GRAPH), bad).collect()


def test_describe(spark):
    from naruhodo_spark.sparql import sparql_describe

    e = _edges(spark, GRAPH)
    got = sorted(map(tuple, sparql_describe(e, "DESCRIBE acme").collect()))
    assert got == [
        ("acme", "is_a", "company"),
        ("alice", "works_at", "acme"),
        ("bob", "works_at", "acme"),
    ]
    two = sparql_describe(e, "DESCRIBE acme globex")
    assert two.count() == 5
    with pytest.raises(SparqlError):
        sparql_describe(e, "DESCRIBE")
    with pytest.raises(SparqlError):
        sparql_describe(e, "SELECT ?x WHERE { ?x knows ?y }")


def test_facade_sparql_dispatch(spark):
    """parser.sparql() dispatches on the query form keyword, including
    after PREFIX declarations."""
    from naruhodo_spark.api import parser

    p = parser(spark, lang="en").add_all(
        ["alice visits bob.", "bob visits carol."]
    )
    g = p.sparql("CONSTRUCT { ?x visited_by ?y } WHERE { ?y visit ?x }")
    assert ("bob", "visited_by", "alice") in set(map(tuple, g.collect()))
    d = p.sparql("DESCRIBE alice")
    assert d.count() >= 1
    ask = p.sparql("ASK { alice visit bob }")
    assert ask.collect()[0]["ask"] is True


def test_negated_property_set(spark):
    e = _edges(spark, GRAPH)
    # every edge from alice that is NOT a knows edge
    got = sorted(
        map(
            tuple,
            sparql_select(
                e, "SELECT ?o WHERE { alice !knows ?o }"
            ).collect(),
        )
    )
    assert got == [("acme",)]
    # multi-member set: neither knows nor works_at
    got2 = sparql_select(
        e, "SELECT ?s ?o WHERE { ?s !(knows|works_at) ?o }"
    )
    assert sorted(map(tuple, got2.collect())) == [
        ("acme", "company"), ("globex", "company")
    ]


def test_negated_set_composes_and_rejects(spark):
    e = _edges(spark, GRAPH)
    got = sorted(
        r["c"]
        for r in sparql_select(
            e,
            "SELECT ?c WHERE { ?x !knows ?c . ?c is_a company }",
        ).collect()
    )
    assert got == ["acme", "acme", "globex"]  # bag semantics
    for bad in (
        "SELECT ?x WHERE { ?x !(^knows) ?y }",   # inverse member
        "SELECT ?x WHERE { ?x !?p ?y }",          # var member
    ):
        with pytest.raises((SparqlError, ValueError)):
            sparql_select(e, bad).collect()


# ------------------------------------------------------------- BIND

AGES = [
    ("alice", "age", "30"),
    ("bob", "age", "40"),
    ("alice", "knows", "bob"),
]


def test_bind_concat(spark):
    e = _edges(spark, AGES)
    got = sparql_select(
        e,
        'SELECT ?who WHERE { ?x knows ?y . '
        'BIND(CONCAT(?x, "->", ?y) AS ?who) }',
    )
    assert [r["who"] for r in got.collect()] == ["alice->bob"]


def test_bind_arithmetic_and_filter_sees_it(spark):
    e = _edges(spark, AGES)
    got = sparql_select(
        e,
        "SELECT ?x ?half WHERE { ?x age ?a . BIND(?a / 2 AS ?half) "
        "FILTER (?half > 16) }",
    )
    assert sorted(map(tuple, got.collect())) == [("bob", 20.0)]
    # subtraction needs the spaced operator (a glued '-1' lexes as a
    # negative number literal)
    got2 = sparql_select(
        e, "SELECT ?v WHERE { ?x age ?a . BIND(?a - 10 AS ?v) }"
    )
    assert sorted(r["v"] for r in got2.collect()) == [20.0, 30.0]


def test_bind_alias_and_chaining(spark):
    e = _edges(spark, AGES)
    got = sparql_select(
        e,
        "SELECT ?b WHERE { ?x age ?a . BIND(?a AS ?c) "
        "BIND(?c + 1 AS ?b) }",
    )
    assert sorted(r["b"] for r in got.collect()) == [31.0, 41.0]


def test_bind_rejections(spark):
    e = _edges(spark, AGES)
    for bad in (
        "SELECT ?x WHERE { ?x age ?a . BIND(?nope + 1 AS ?v) }",
        "SELECT ?x WHERE { ?x age ?a . BIND(1 AS ?a) }",  # rebind
        "SELECT ?x WHERE { ?x age ?a . BIND(?a + 1 AS a) }",  # no ?var
    ):
        with pytest.raises(SparqlError):
            sparql_select(e, bad).collect()


def test_group_concat_and_sample(spark):
    e = _edges(spark, [
        ("alice", "knows", "bob"), ("alice", "knows", "carol"),
        ("alice", "knows", "bob"), ("bob", "knows", "carol"),
    ])
    got = sparql_select(
        e,
        'SELECT ?x (GROUP_CONCAT(?y; SEPARATOR=", ") AS ?fs) '
        "WHERE { ?x knows ?y } GROUP BY ?x",
    )
    rows = {r["x"]: r["fs"] for r in got.collect()}
    # bag semantics + deterministic lexicographic order
    assert rows == {"alice": "bob, bob, carol", "bob": "carol"}
    got2 = sparql_select(
        e,
        "SELECT ?x (GROUP_CONCAT(DISTINCT ?y) AS ?fs) "
        "(SAMPLE(?y) AS ?one) WHERE { ?x knows ?y } GROUP BY ?x",
    )
    rows2 = {r["x"]: (r["fs"], r["one"]) for r in got2.collect()}
    assert rows2 == {
        "alice": ("bob carol", "bob"), "bob": ("carol", "carol")
    }


def test_group_concat_rejections(spark):
    e = _edges(spark, AGES)
    for bad in (
        'SELECT (SUM(?a; SEPARATOR=",") AS ?s) WHERE { ?x age ?a }',
        "SELECT (GROUP_CONCAT(?a; SEP=4) AS ?s) WHERE { ?x age ?a }",
    ):
        with pytest.raises(SparqlError):
            sparql_select(e, bad).collect()


def test_bind_if_and_coalesce(spark):
    e = _edges(spark, AGES + [("carol", "age", "17")])
    got = sparql_select(
        e,
        'SELECT ?x ?grp WHERE { ?x age ?a . '
        'BIND(IF(?a >= 18, "adult", "minor") AS ?grp) }',
    )
    rows = {r["x"]: r["grp"] for r in got.collect()}
    assert rows == {"alice": "adult", "bob": "adult", "carol": "minor"}
    # COALESCE over an OPTIONAL-unbound variable
    got2 = sparql_select(
        e,
        'SELECT ?x ?v WHERE { ?x age ?a . '
        'OPTIONAL { ?x knows ?k } '
        'BIND(COALESCE(?k, "nobody") AS ?v) }',
    )
    rows2 = {r["x"]: r["v"] for r in got2.collect()}
    assert rows2["alice"] == "bob" and rows2["carol"] == "nobody"


def test_bind_if_rejections(spark):
    e = _edges(spark, AGES)
    for bad in (
        "SELECT ?x WHERE { ?x age ?a . BIND(IF(?a ~ 3, 1, 2) AS ?v) }",
        "SELECT ?x WHERE { ?x age ?a . BIND(IF(?zz > 3, 1, 2) AS ?v) }",
    ):
        with pytest.raises(SparqlError):
            sparql_select(e, bad).collect()
