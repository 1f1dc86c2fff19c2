"""OWL property semantics (operators/owl.py): every characteristic
against a NAIVE saturation mirror (apply inverse/symmetric/transitive
rules until fixpoint), deep inverse chains, sym∘inv composition,
transitivity inherited through inverse parity, the meta-guard, and
the schema-in-output contract."""

import pytest

from naruhodo_spark.operators.owl import (
    INVERSE_OF,
    SYMMETRIC,
    TRANSITIVE,
    TYPE,
    owl_entailment,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, pred string, dst string")


def _saturate(triples):
    t = set(triples)
    while True:
        inv = {(a, b) for a, p, b in t if p == INVERSE_OF}
        inv |= {(b, a) for a, b in inv}
        sym = {a for a, p, b in t if p == TYPE and b == SYMMETRIC}
        trans = {a for a, p, b in t if p == TYPE and b == TRANSITIVE}
        new = set()
        new |= {(y, p, x) for x, p, y in t if p in sym}
        new |= {(y, q, x) for x, p, y in t for p2, q in inv if p == p2}
        for p in trans:
            pe = {(x, y) for x, pp, y in t if pp == p}
            new |= {
                (x, p, z)
                for x, y in pe
                for y2, z in pe
                if y == y2
            }
        if new <= t:
            return t
        t |= new


BASE = [
    ("alice", "married_to", "bob"),
    ("married_to", TYPE, SYMMETRIC),
    ("a", "part_of", "b"),
    ("b", "part_of", "c"),
    ("c", "part_of", "d"),
    ("part_of", TYPE, TRANSITIVE),
    ("part_of", INVERSE_OF, "has_part"),
    ("x", "child_of", "y"),
    ("child_of", INVERSE_OF, "parent_of"),
]


def test_textbook(spark):
    got = set(map(tuple, owl_entailment(_edges(spark, BASE)).collect()))
    assert got == _saturate(BASE)
    assert ("bob", "married_to", "alice") in got           # symmetric
    assert ("a", "part_of", "d") in got                    # transitive
    assert ("d", "has_part", "a") in got                   # inverse of closure
    assert ("y", "parent_of", "x") in got                  # plain inverse
    assert ("part_of", TYPE, TRANSITIVE) in got            # schema kept


@pytest.mark.parametrize(
    "rows",
    [
        # inverse edges asserted on the INVERSE side feed the closure
        [
            ("b", "has_part", "a"),
            ("c", "has_part", "b"),
            ("part_of", INVERSE_OF, "has_part"),
            ("part_of", TYPE, TRANSITIVE),
        ],
        # deep inverse chain (depth 3): r ⇔ s ⇔ t ⇔ u
        [
            ("a", "r", "b"),
            ("r", INVERSE_OF, "s"),
            ("s", INVERSE_OF, "t"),
            ("t", INVERSE_OF, "u"),
        ],
        # symmetric + transitive on one predicate (connected component
        # semantics: everything reaches everything, incl. self-pairs)
        [
            ("a", "linked", "b"),
            ("b", "linked", "c"),
            ("linked", TYPE, SYMMETRIC),
            ("linked", TYPE, TRANSITIVE),
        ],
        # transitivity declared on the predicate's INVERSE only
        [
            ("a", "above", "b"),
            ("b", "above", "c"),
            ("above", INVERSE_OF, "below"),
            ("below", TYPE, TRANSITIVE),
        ],
        # sym mark on a predicate reached via inverse
        [
            ("a", "touches", "b"),
            ("touches", INVERSE_OF, "touched_by"),
            ("touched_by", TYPE, SYMMETRIC),
        ],
        # no schema at all: identity
        [("a", "p", "b"), ("c", "q", "d")],
    ],
)
def test_matches_naive_saturation(spark, rows):
    got = set(map(tuple, owl_entailment(_edges(spark, rows)).collect()))
    assert got == _saturate(rows)


def test_meta_guard(spark):
    for rows in (
        [(INVERSE_OF, TYPE, TRANSITIVE), ("a", "p", "b")],
        [(TYPE, INVERSE_OF, "typed_as"), ("a", "p", "b")],
        [(TYPE, TYPE, SYMMETRIC), ("a", "p", "b")],
    ):
        with pytest.raises(ValueError, match="meta-vocabulary"):
            owl_entailment(_edges(spark, rows))


def test_bag_mode_and_composition_with_rdfs(spark):
    rows = BASE + [
        ("part_of", "domain", "Part"),
    ]
    from naruhodo_spark.operators.entail import rdfs_entailment

    owl_closed = owl_entailment(_edges(spark, rows))
    both = set(map(tuple, rdfs_entailment(owl_closed).collect()))
    # the OWL-derived (a part_of d) feeds the RDFS domain rule
    assert ("a", "is_a", "Part") in both
    assert ("c", "is_a", "Part") in both
    bag = owl_entailment(_edges(spark, rows), dedupe=False)
    assert set(map(tuple, bag.collect())) == _saturate(rows)
