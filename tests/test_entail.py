"""RDFS entailment (operators/entail.py): every ρdf rule against a
NAIVE python saturation mirror (apply all rules until fixpoint — the
ground truth the stratified Spark plan must equal), textbook goldens,
the rdfs7→rdfs2/3→rdfs9 feeding chains, the meta-vocabulary guard,
and bag-mode parity."""

import pytest

from naruhodo_spark.operators.entail import (
    DOMAIN,
    RANGE,
    SUBCLASS,
    SUBPROPERTY,
    TYPE,
    rdfs_entailment,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, pred string, dst string")


def _saturate(triples):
    """Naive RDFS saturation: apply rdfs2/3/5/7/9/11 until fixpoint."""
    t = set(triples)
    while True:
        sp = {(a, b) for a, p, b in t if p == SUBPROPERTY}
        sc = {(a, b) for a, p, b in t if p == SUBCLASS}
        dom = {(p, c) for p, d, c in t if d == DOMAIN}
        rng = {(p, c) for p, d, c in t if d == RANGE}
        new = set()
        new |= {(a, SUBPROPERTY, c) for a, b in sp for b2, c in sp if b == b2}
        new |= {(a, SUBCLASS, c) for a, b in sc for b2, c in sc if b == b2}
        new |= {(x, q, y) for x, p, y in t for p2, q in sp if p == p2}
        new |= {(x, TYPE, c) for x, p, y in t for p2, c in dom if p == p2}
        new |= {(y, TYPE, c) for x, p, y in t for p2, c in rng if p == p2}
        ty = {(x, c) for x, p, c in t if p == TYPE}
        new |= {(x, TYPE, d) for x, c in ty for c2, d in sc if c == c2}
        if new <= t:
            return t
        t |= new


TEXTBOOK = [
    ("rex", TYPE, "Poodle"),
    ("Poodle", SUBCLASS, "Dog"),
    ("Dog", SUBCLASS, "Mammal"),
    ("rex", "barks_at", "tom"),
    ("barks_at", SUBPROPERTY, "interacts_with"),
    ("interacts_with", SUBPROPERTY, "related_to"),
    ("barks_at", DOMAIN, "Dog"),
    ("barks_at", RANGE, "Cat"),
    ("Cat", SUBCLASS, "Mammal"),
]


def test_textbook_entailment(spark):
    got = set(map(tuple, rdfs_entailment(_edges(spark, TEXTBOOK)).collect()))
    assert got == _saturate(TEXTBOOK)
    # spot-check each rule's signature derivation
    assert ("rex", "interacts_with", "tom") in got          # rdfs7
    assert ("rex", "related_to", "tom") in got              # rdfs7 ∘ rdfs5
    assert ("Poodle", SUBCLASS, "Mammal") in got            # rdfs11
    assert ("rex", TYPE, "Dog") in got                      # rdfs2 (domain)
    assert ("tom", TYPE, "Cat") in got                      # rdfs3 (range)
    assert ("tom", TYPE, "Mammal") in got                   # rdfs3 ∘ rdfs9
    assert ("rex", TYPE, "Mammal") in got                   # rdfs9 chain
    assert ("barks_at", SUBPROPERTY, "related_to") in got   # rdfs5


@pytest.mark.parametrize(
    "rows",
    [
        # deep subproperty chain feeding a domain on the TOP property
        [
            ("a", "p0", "b"),
            ("p0", SUBPROPERTY, "p1"),
            ("p1", SUBPROPERTY, "p2"),
            ("p2", SUBPROPERTY, "p3"),
            ("p3", DOMAIN, "C"),
            ("C", SUBCLASS, "D"),
        ],
        # subclass edge arriving VIA subproperty lift (rdfs7 → rdfs11)
        [
            ("Dog", "kind_of", "Animal"),
            ("kind_of", SUBPROPERTY, SUBCLASS),
            ("rex", TYPE, "Dog"),
        ],
        # type edge arriving VIA subproperty lift (rdfs7 → rdfs9)
        [
            ("rex", "instance", "Dog"),
            ("instance", SUBPROPERTY, TYPE),
            ("Dog", SUBCLASS, "Animal"),
        ],
        # range on a lifted predicate + inheritance of the result
        [
            ("a", "likes", "b"),
            ("likes", SUBPROPERTY, "knows"),
            ("knows", RANGE, "Agent"),
            ("Agent", SUBCLASS, "Entity"),
        ],
        # diamond schema + cycle in subclass (saturates, terminates)
        [
            ("x", TYPE, "A"),
            ("A", SUBCLASS, "B"),
            ("B", SUBCLASS, "A"),
            ("A", SUBCLASS, "C"),
        ],
        # no schema at all: entailment is the identity
        [("a", "p", "b"), ("c", "q", "d")],
    ],
)
def test_matches_naive_saturation(spark, rows):
    got = set(map(tuple, rdfs_entailment(_edges(spark, rows)).collect()))
    assert got == _saturate(rows)


def test_bag_mode_same_set(spark):
    df = _edges(spark, TEXTBOOK)
    bag = rdfs_entailment(df, dedupe=False)
    assert set(map(tuple, bag.collect())) == _saturate(TEXTBOOK)
    assert bag.count() >= len(_saturate(TEXTBOOK))


def test_meta_vocabulary_raises(spark):
    for rows in (
        [("a", "p", "b"), ("p", SUBPROPERTY, TYPE),
         (TYPE, SUBPROPERTY, "q")],
        [("a", "p", "b"), (SUBCLASS, DOMAIN, "C"),
         ("x", SUBCLASS, "y")],
        [("a", "p", "b"), (TYPE, RANGE, "C")],
    ):
        with pytest.raises(ValueError, match="meta-vocabulary"):
            rdfs_entailment(_edges(spark, rows))


def test_custom_predicate_names(spark):
    rows = [
        ("rex", "rdf:type", "Dog"),
        ("Dog", "rdfs:subClassOf", "Animal"),
    ]
    got = set(
        map(
            tuple,
            rdfs_entailment(
                _edges(spark, rows),
                type_pred="rdf:type",
                subclass_pred="rdfs:subClassOf",
                subproperty_pred="rdfs:subPropertyOf",
                domain_pred="rdfs:domain",
                range_pred="rdfs:range",
            ).collect(),
        )
    )
    assert got == set(rows) | {("rex", "rdf:type", "Animal")}


def test_repartition_invariant(spark):
    df = _edges(spark, TEXTBOOK)
    a = set(map(tuple, rdfs_entailment(df.repartition(1)).collect()))
    b = set(map(tuple, rdfs_entailment(df.repartition(13)).collect()))
    assert a == b == _saturate(TEXTBOOK)
