"""Knowledge fusion (operators/fuse.py): majority-vote goldens, the
exact pure-python mirror of the Sums trust fixpoint, trust-beats-count
behavior, dedup/tie-break/partition invariants, loud contract errors."""

import pytest

from naruhodo_spark.operators.fuse import fuse_claims, majority_vote

CLAIMS = [
    # slot (e1, born_in): rome asserted by 3 sources, paris by 1
    ("e1", "born_in", "rome", "s1"),
    ("e1", "born_in", "rome", "s2"),
    ("e1", "born_in", "rome", "s3"),
    ("e1", "born_in", "paris", "s4"),
    # slot (e2, works_at): 1-1 tie -> lexicographic min wins
    ("e2", "works_at", "acme", "s1"),
    ("e2", "works_at", "zeta", "s4"),
    # slot (e3, color): single uncontested claim
    ("e3", "color", "blue", "s2"),
]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, source string"
    )


def test_majority_vote_golden(spark):
    got = {
        (r["subj"], r["pred"]): (
            r["obj"], r["confidence"], r["n_sources"], r["n_candidates"]
        )
        for r in majority_vote(_df(spark, CLAIMS)).collect()
    }
    assert got == {
        ("e1", "born_in"): ("rome", 0.75, 3, 2),
        ("e2", "works_at"): ("acme", 0.5, 1, 2),
        ("e3", "color"): ("blue", 1.0, 1, 1),
    }


def test_majority_vote_dedupes_repeated_claims(spark):
    """One source repeating a claim gets ONE vote."""
    rows = [("e", "p", "x", "s1")] * 5 + [
        ("e", "p", "y", "s2"),
        ("e", "p", "y", "s3"),
    ]
    r = majority_vote(_df(spark, rows)).collect()[0]
    assert (r["obj"], r["n_sources"], r["n_candidates"]) == ("y", 2, 2)


def test_majority_vote_no_window(spark):
    """The argmax is a min-struct aggregate, not a rank window — the
    plan must contain hash aggregates only."""
    plan = (
        majority_vote(_df(spark, CLAIMS))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "HashAggregate" in plan


def _sums_mirror(rows, iterations):
    """Pure-python Pasternack-Roth Sums with the operator's exact
    normalization and tie-breaks."""
    claims = sorted(set(rows))
    sources = sorted({s for *_, s in claims})
    trust = {s: 1.0 for s in sources}
    facts = {}
    for _ in range(iterations):
        facts = {}
        for su, p, o, s in claims:
            facts[(su, p, o)] = facts.get((su, p, o), 0.0) + trust[s]
        f_max = max(facts.values()) or 1.0
        facts = {k: v / f_max for k, v in facts.items()}
        acc = {}
        for su, p, o, s in claims:
            acc.setdefault(s, []).append(facts[(su, p, o)])
        trust = {s: sum(v) / len(v) for s, v in acc.items()}
        t_max = max(trust.values()) or 1.0
        trust = {s: v / t_max for s, v in trust.items()}
    fused = {}
    slots = {}
    for (su, p, o), sc in facts.items():
        slots.setdefault((su, p), []).append((o, sc))
    for (su, p), cands in slots.items():
        total = sum(sc for _, sc in cands)
        obj, sc = min(cands, key=lambda t: (-t[1], t[0]))
        fused[(su, p)] = (obj, round(sc / total, 4), len(cands))
    return facts, trust, fused


# a liar source (s_bad) contradicts consensus on two slots and is the
# lone voice on a third — Sums should discount its solo claim below a
# uniform-vote tie
TRUST_CLAIMS = [
    ("e1", "capital", "rome", "s1"),
    ("e1", "capital", "rome", "s2"),
    ("e1", "capital", "lie1", "s_bad"),
    ("e2", "capital", "paris", "s1"),
    ("e2", "capital", "paris", "s3"),
    ("e2", "capital", "lie2", "s_bad"),
    # the contested slot: one good source vs the liar — tied 1-1 under
    # majority vote (lexicographic accident), split by learned trust
    ("e3", "capital", "zurich", "s1"),
    ("e3", "capital", "aalie", "s_bad"),
]


def test_fuse_claims_matches_python_mirror(spark):
    out = fuse_claims(_df(spark, TRUST_CLAIMS), iterations=4)
    facts_m, trust_m, fused_m = _sums_mirror(TRUST_CLAIMS, 4)
    got_t = {r["source"]: r["trust"] for r in out["trust"].collect()}
    assert set(got_t) == set(trust_m)
    for s in trust_m:
        assert got_t[s] == pytest.approx(trust_m[s], abs=1e-9)
    got_f = {
        (r["subj"], r["pred"], r["obj"]): r["score"]
        for r in out["facts"].collect()
    }
    assert set(got_f) == set(facts_m)
    for k in facts_m:
        assert got_f[k] == pytest.approx(facts_m[k], abs=1e-9)
    got_fused = {
        (r["subj"], r["pred"]): (r["obj"], r["confidence"], r["n_candidates"])
        for r in out["fused"].collect()
    }
    assert got_fused == fused_m


def test_trust_beats_lexicographic_tie(spark):
    """On the 1-1 contested slot the liar's object sorts FIRST
    lexicographically, so majority vote picks the lie; learned trust
    overrules it."""
    df = _df(spark, TRUST_CLAIMS)
    mv = {
        (r["subj"], r["pred"]): r["obj"] for r in majority_vote(df).collect()
    }
    assert mv[("e3", "capital")] == "aalie"  # the tie-break accident
    out = fuse_claims(df, iterations=4)
    fused = {
        (r["subj"], r["pred"]): (r["obj"], r["confidence"])
        for r in out["fused"].collect()
    }
    assert fused[("e1", "capital")][0] == "rome"
    assert fused[("e2", "capital")][0] == "paris"
    assert fused[("e3", "capital")][0] == "zurich"
    trust = {r["source"]: r["trust"] for r in out["trust"].collect()}
    assert trust["s_bad"] < trust["s1"]


def test_fuse_partition_invariance(spark):
    a = fuse_claims(_df(spark, TRUST_CLAIMS).repartition(1), iterations=3)
    b = fuse_claims(_df(spark, TRUST_CLAIMS).repartition(13), iterations=3)
    rows = lambda d: sorted(  # noqa: E731
        (r["subj"], r["pred"], r["obj"], r["confidence"])
        for r in d["fused"].collect()
    )
    assert rows(a) == rows(b)


def test_fuse_contract_errors(spark):
    with pytest.raises(ValueError, match="missing"):
        majority_vote(spark.createDataFrame([("a",)], "subj string"))
    with pytest.raises(ValueError, match="iterations"):
        fuse_claims(_df(spark, CLAIMS), iterations=0)


def test_facade_fuse(spark):
    """parser.fuse() resolves per-document assertions into one value
    per (subject, predicate) slot, both vote and trust modes."""
    from naruhodo_spark.api import parser

    p = parser(spark, lang="en").add_all(
        ["alice visits tokyo.", "alice visits tokyo.", "alice visits osaka."]
    )
    mv = {
        (r["subj"], r["pred"]): (r["obj"], r["n_candidates"])
        for r in p.fuse().collect()
    }
    assert mv[("alice", "visit")][0] == "tokyo"
    assert mv[("alice", "visit")][1] == 2
    tf = {
        (r["subj"], r["pred"]): r["obj"] for r in p.fuse(iterations=2).collect()
    }
    assert tf[("alice", "visit")] == "tokyo"
