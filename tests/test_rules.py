"""AMIE-style path-rule mining (operators/rules.py): planted
compositional rule with exact support/confidence, a python mirror over
a random graph, and the hub-cap audit."""

import numpy as np
import pyspark.sql.functions as F

from naruhodo_spark.operators import rules as R


def _edges(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string"
    )


def test_planted_grandparent_rule(spark):
    rows = []
    # parent(a_i, b_i), parent(b_i, c_i), grandparent(a_i, c_i) for 6
    # families; one family missing the head edge -> confidence 6/7? no:
    # 7 bodies, 6 heads
    for i in range(7):
        rows.append((f"a{i}", "parent", f"b{i}"))
        rows.append((f"b{i}", "parent", f"c{i}"))
        if i < 6:
            rows.append((f"a{i}", "grandparent", f"c{i}"))
    got = {
        (r["r1"], r["r2"], r["r3"]): r
        for r in R.mine_path_rules(
            _edges(spark, rows), min_support=2, min_confidence=0.1
        ).collect()
    }
    rule = got[("parent", "parent", "grandparent")]
    assert rule["n_body"] == 7 and rule["support"] == 6
    assert abs(rule["confidence"] - 6 / 7) < 1e-9


def test_mirror_random_graph(spark):
    rng = np.random.default_rng(9)
    names = [f"n{i}" for i in range(12)]
    preds = ["p", "q", "s"]
    rows = sorted({
        (names[rng.integers(12)], preds[rng.integers(3)],
         names[rng.integers(12)])
        for _ in range(70)
    })
    rows = [(a, p, b) for a, p, b in rows if a != b]
    got = {
        (r["r1"], r["r2"], r["r3"]): (r["support"], r["n_body"])
        for r in R.mine_path_rules(
            _edges(spark, rows), min_support=1, min_confidence=0.0
        ).collect()
    }
    # python mirror
    edges = set(rows)
    body = {}
    for (x, r1, y) in edges:
        for (y2, r2, z) in edges:
            if y == y2 and x != z:
                body.setdefault((r1, r2), set()).add((x, z))
    want = {}
    for (r1, r2), pairs in body.items():
        for r3 in preds:
            sup = sum(1 for (x, z) in pairs if (x, r3, z) in edges)
            if sup >= 1:
                want[(r1, r2, r3)] = (sup, len(pairs))
    assert got == want


def test_hub_cap_audit(spark):
    rows = [("hub_src%d" % i, "p", "hub") for i in range(30)]
    rows += [("hub", "q", "hub_dst%d" % i) for i in range(30)]
    rows += [("a", "p", "m"), ("m", "q", "b"), ("a", "s", "b")]
    df = _edges(spark, rows)
    audit = R.hub_intermediates(df, hub_cap=100).collect()
    assert [r["node"] for r in audit] == ["hub"]
    assert audit[0]["body_rows"] == 900
    # compositions through the hub are excluded; the clean one survives
    got = {(r["r1"], r["r2"], r["r3"]): r["n_body"]
           for r in R.mine_path_rules(
               df, min_support=1, min_confidence=0.0, hub_cap=100
           ).collect()}
    assert got == {("p", "q", "s"): 1}


def test_rules_via_facade_pipeline(spark):
    """mine_rules through the full extraction pipeline: a planted
    visit∘visit⇒know composition in plain sentences."""
    from naruhodo_spark.api import parser

    sents = []
    people = [("alice", "bob", "carol"), ("dave", "erin", "frank"),
              ("grace", "heidi", "ivan")]
    for a, b, c in people:
        sents += [f"{a} visits {b}.", f"{b} visits {c}.", f"{a} knows {c}."]
    p = parser(spark, lang="en").add_all(sents)
    got = {(r["r1"], r["r2"], r["r3"]): r
           for r in p.mine_rules(min_support=2, min_confidence=0.5).collect()}
    assert ("visit", "visit", "know") in got
    rule = got[("visit", "visit", "know")]
    assert rule["support"] == 3 and rule["confidence"] == 1.0


def test_apply_rules_planted(spark):
    """Grandparent completion: families with both parent edges but no
    grandparent edge get exactly that edge predicted; the family whose
    head already exists is anti-joined away."""
    rows = []
    for i in range(7):
        rows.append((f"a{i}", "parent", f"b{i}"))
        rows.append((f"b{i}", "parent", f"c{i}"))
        if i < 6:
            rows.append((f"a{i}", "grandparent", f"c{i}"))
    df = _edges(spark, rows)
    rules = R.mine_path_rules(df, min_support=2, min_confidence=0.1)
    got = R.apply_rules(df, rules).collect()
    assert [(r["subj"], r["pred"], r["obj"]) for r in got] == [
        ("a6", "grandparent", "c6")
    ]
    assert abs(got[0]["confidence"] - 6 / 7) < 1e-9
    assert got[0]["n_rules"] == 1


def test_apply_rules_multi_rule_max_confidence(spark):
    """Two distinct rule bodies predicting the same edge fold to ONE
    output row with max confidence and n_rules=2; duplicate rule rows
    do not double-count."""
    rows = [
        ("x", "p", "m"), ("m", "q", "z"),
        ("x", "u", "n"), ("n", "v", "z"),
    ]
    df = _edges(spark, rows)
    rules = spark.createDataFrame(
        [
            ("p", "q", "head", 0.6),
            ("u", "v", "head", 0.9),
            ("u", "v", "head", 0.3),  # duplicate body+head, worse conf
        ],
        "r1 string, r2 string, r3 string, confidence double",
    )
    got = R.apply_rules(df, rules).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["subj"], r["pred"], r["obj"]) == ("x", "head", "z")
    assert abs(r["confidence"] - 0.9) < 1e-12
    assert r["n_rules"] == 2


def test_apply_rules_mirror_random_graph(spark):
    """Exact python mirror of one forward-chaining round on a random
    graph with mined rules."""
    rng = np.random.default_rng(17)
    names = [f"n{i}" for i in range(10)]
    preds = ["p", "q", "s"]
    rows = sorted({
        (names[rng.integers(10)], preds[rng.integers(3)],
         names[rng.integers(10)])
        for _ in range(60)
    })
    rows = [(a, p, b) for a, p, b in rows if a != b]
    df = _edges(spark, rows)
    rules_df = R.mine_path_rules(df, min_support=1, min_confidence=0.0)
    rules = {
        (r["r1"], r["r2"], r["r3"]): r["confidence"]
        for r in rules_df.collect()
    }
    edges = set(rows)
    want = {}
    for (x, r1, y) in edges:
        for (y2, r2, z) in edges:
            if y != y2 or x == z:
                continue
            for (br1, br2, r3), conf in rules.items():
                if (br1, br2) != (r1, r2) or (x, r3, z) in edges:
                    continue
                prev = want.get((x, r3, z))
                bodies = prev[1] if prev else set()
                bodies.add((r1, r2))
                want[(x, r3, z)] = (
                    max(conf, prev[0]) if prev else conf, bodies)
    got = {
        (r["subj"], r["pred"], r["obj"]):
            (r["confidence"], r["n_rules"])
        for r in R.apply_rules(df, rules_df).collect()
    }
    assert set(got) == set(want)
    for k, (conf, bodies) in want.items():
        assert abs(got[k][0] - conf) < 1e-9, k
        assert got[k][1] == len(bodies), k


def test_apply_rules_hub_excluded(spark):
    """Predictions THROUGH an excluded hub pivot are not made (and the
    audit frame names the hub)."""
    rows = [("hs%d" % i, "p", "hub") for i in range(30)]
    rows += [("hub", "q", "hd%d" % i) for i in range(30)]
    rows += [("a", "p", "m"), ("m", "q", "b")]
    df = _edges(spark, rows)
    rules = spark.createDataFrame(
        [("p", "q", "head", 1.0)],
        "r1 string, r2 string, r3 string, confidence double",
    )
    got = R.apply_rules(df, rules, hub_cap=100).collect()
    assert [(r["subj"], r["obj"]) for r in got] == [("a", "b")]


def test_complete_via_facade(spark):
    from naruhodo_spark.api import parser

    sents = []
    people = [("alice", "bob", "carol"), ("dave", "erin", "frank"),
              ("grace", "heidi", "ivan"), ("judy", "karl", "liam")]
    for a, b, c in people:
        sents += [f"{a} visits {b}.", f"{b} visits {c}."]
    # three of four families have the head edge -> rule mined at the
    # default min_support=3, fourth family's head predicted
    sents += ["alice knows carol.", "dave knows frank.",
              "judy knows liam."]
    p = parser(spark, lang="en").add_all(sents)
    got = [
        (r["subj"], r["pred"], r["obj"])
        for r in p.complete().collect()
    ]
    assert ("grace", "know", "ivan") in got
