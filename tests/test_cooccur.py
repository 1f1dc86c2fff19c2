"""Entity co-occurrence PMI (operators/cooccur.py) vs a pure-Python
reference, plus the cap-audit surface."""

import math
from itertools import combinations

import pytest
from pyspark.sql import functions as F

from naruhodo_spark.api import parser
from naruhodo_spark.operators import cooccur as C


def _py_pmi(doc_ents, cap):
    kept = [sorted(set(es)) for es in doc_ents if len(set(es)) <= cap]
    n_total = len([es for es in kept if es])
    pair_n, ent_n = {}, {}
    for es in kept:
        for e in es:
            ent_n[e] = ent_n.get(e, 0) + 1
        for a, b in combinations(es, 2):
            pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    return {
        k: (n, math.log(n * n_total / (ent_n[k[0]] * ent_n[k[1]])))
        for k, n in pair_n.items()
    }, n_total


def test_entity_cooccurrence_vs_python(spark):
    p = parser(spark, lang="en")
    p.add_all(
        [
            "alice visited bob. carol praised dave.",
            "alice visited bob.",
            "carol praised dave.",
            "alice praised carol.",
            "erin moved.",
        ]
    )
    kg = p.build()
    got = {
        (r["e1"], r["e2"]): (r["n_docs"], r["pmi"])
        for r in C.entity_cooccurrence(kg["triples_linked"]).collect()
    }
    doc_ents = [
        ["alice", "bob", "carol", "dave"],
        ["alice", "bob"],
        ["carol", "dave"],
        ["alice", "carol"],
        ["erin"],
    ]
    want, _ = _py_pmi(doc_ents, cap=50)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-9), k
    # ordering invariant
    for e1, e2 in got:
        assert e1 < e2


def test_cooccurrence_cap_and_audit(spark):
    p = parser(spark, lang="en")
    # one doc with 4 entities, one with 2
    p.add_all(
        ["alice visited bob. carol praised dave.", "erin praised frank."]
    )
    kg = p.build()
    t = kg["triples_linked"]
    # cap=3 excludes the 4-entity doc from the pair space AND from N
    out = {
        (r["e1"], r["e2"]): r["n_docs"]
        for r in C.entity_cooccurrence(t, max_entities_per_doc=3).collect()
    }
    assert set(out) == {("erin", "frank")}
    audit = C.oversized_docs(t, max_entities_per_doc=3).collect()
    assert len(audit) == 1 and audit[0]["n_entities"] == 4


def test_entity_communities(spark):
    """Two disjoint co-mention cliques → two communities; the PMI/doc
    thresholds exclude chance pairs. Verified against a python CC over
    the same thresholded python PMI graph."""
    p = parser(spark, lang="en")
    corpus = (
        ["alice visited bob."] * 3
        + ["carol praised dave."] * 3
        + ["alice visited bob. erin waved."]  # erin weakly tied to clique 1
    )
    p.add_all(corpus)
    kg = p.build()
    got = {
        r["entity"]: r["community"]
        for r in C.entity_communities(
            kg["triples_linked"], min_pair_docs=2
        ).collect()
    }
    # python reference: same thresholds over the same doc-entity sets
    doc_ents = [["alice", "bob"]] * 3 + [["carol", "dave"]] * 3 + [
        ["alice", "bob", "erin"]
    ]
    want_pmi, _ = _py_pmi(doc_ents, cap=50)
    import math as _math

    adj = {}
    for (a, b), (n, pmi) in want_pmi.items():
        if n >= 2 and pmi >= 0.0:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    # flood fill
    want = {}
    for start in sorted(adj):
        if start in want:
            continue
        comp, stack = set(), [start]
        while stack:
            u = stack.pop()
            if u in comp:
                continue
            comp.add(u)
            stack.extend(adj.get(u, ()))
        label = min(comp)
        for u in comp:
            want[u] = label
    assert got == want
    # structural: alice/bob together, carol/dave together, separate
    assert got["alice"] == got["bob"]
    assert got["carol"] == got["dave"]
    assert got["alice"] != got["carol"]
