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


FUN_ROWS = [
    # 'capital_of': functional except one corrupted subject (2 objs)
    ("d0", "rome", "capital_of", "italy", 2, 2),
    ("d1", "paris", "capital_of", "france", 2, 2),
    ("d2", "tokyo", "capital_of", "japan", 2, 2),
    ("d3", "berlin", "capital_of", "germany", 2, 2),
    ("d4", "berlin", "capital_of", "prussia", 2, 2),  # the violation
    ("d5", "rome", "capital_of", "italy", 2, 2),      # dup mention: no effect
    # 'visited': genuinely multi-valued — low functionality, no queue
    ("d6", "alice", "visited", "rome", 1, 2),
    ("d7", "alice", "visited", "paris", 1, 2),
    ("d8", "alice", "visited", "tokyo", 1, 2),
    ("d9", "bob", "visited", "rome", 1, 2),
]


def test_functionality_scores(spark):
    got = {
        r["pred"]: (
            r["functionality"], r["inv_functionality"],
            r["n_slots"], r["support"],
        )
        for r in SI.predicate_functionality(_triples(spark, FUN_ROWS)).collect()
    }
    # capital_of: 4 subjects / 5 distinct pairs; 5 distinct objects
    assert got["capital_of"] == (0.8, 1.0, 4, 5)
    # visited: 2 subjects / 4 pairs; 3 objects / 4 pairs
    assert got["visited"] == (0.5, 0.75, 2, 4)


def test_functionality_min_support(spark):
    rows = FUN_ROWS + [("da", "x", "rare", "y", 1, 1)]
    preds = {
        r["pred"]
        for r in SI.predicate_functionality(
            _triples(spark, rows), min_support=3
        ).collect()
    }
    assert "rare" not in preds and "capital_of" in preds


def test_cardinality_violations(spark):
    t = _triples(spark, FUN_ROWS)
    got = SI.cardinality_violations(t, min_functionality=0.75).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["pred"], r["subj"], r["n_objects"]) == ("capital_of", "berlin", 2)
    assert (r["obj_min"], r["obj_max"]) == ("germany", "prussia")
    assert r["functionality"] == 0.8
    # visited is below the functionality gate: alice's 3 objects are
    # legitimate multi-values, not violations
    assert all(x["pred"] != "visited" for x in got)


def test_cardinality_fully_functional_pred_empty(spark):
    rows = [r for r in FUN_ROWS if r[0] != "d4"]  # drop the corruption
    t = _triples(spark, rows)
    assert (
        SI.cardinality_violations(t, min_functionality=0.75).count() == 0
    )


def test_functionality_mirror_over_built_kg(spark):
    """Exact python mirror on real extractor triples."""
    from naruhodo_spark import synth
    from naruhodo_spark.pipeline import build_kg

    docs = synth.synth_documents(spark, 60)
    t = build_kg(docs)["triples"].where(
        F.col("obj").isNotNull() & (F.col("obj") != "")
    )
    rows = t.select("pred", "subj", "obj").collect()
    pairs = sorted({(r["pred"], r["subj"], r["obj"]) for r in rows})
    acc = {}
    for p, s, o in pairs:
        su, ob, n = acc.get(p, (set(), set(), 0))
        su.add(s); ob.add(o)
        acc[p] = (su, ob, n + 1)
    got = {
        r["pred"]: (r["functionality"], r["inv_functionality"], r["support"])
        for r in SI.predicate_functionality(t, min_support=1).collect()
    }
    want = {
        p: (round(len(su) / n, 4), round(len(ob) / n, 4), n)
        for p, (su, ob, n) in acc.items()
    }
    assert got == want


# typed corpus for inference: works_at is person(1)→org(3) with high
# confidence; 'ghost' and 'shadow' have only untyped mentions
INFER_ROWS = [
    ("d0", "p0", "works_at", "org0", 1, 3),
    ("d1", "p1", "works_at", "org1", 1, 3),
    ("d2", "p2", "works_at", "org2", 1, 3),
    ("d3", "p3", "works_at", "org3", 1, 3),
    # ghost: untyped subject of works_at twice -> inferred person
    ("d4", "ghost", "works_at", "org0", 0, 3),
    ("d5", "ghost", "works_at", "org1", 0, 3),
    # shadow: untyped object of works_at once -> inferred org
    ("d6", "p0", "works_at", "shadow", 1, 0),
    # mixed entity: typed once, untyped once -> gazetteer outranks,
    # NOT inferred
    ("d7", "p3", "works_at", "org9", 1, 0),
    ("d8", "p9", "works_at", "org9", 1, 3),
]


def test_infer_entity_types(spark):
    t = _triples(spark, INFER_ROWS)
    got = {
        r["entity"]: (r["etype"], r["score"], r["n_evidence"])
        for r in SI.infer_entity_types(t).collect()
    }
    assert set(got) == {"ghost", "shadow"}
    assert got["ghost"][0] == 1 and got["ghost"][2] == 2
    assert got["shadow"][0] == 3 and got["shadow"][2] == 1
    # single-signature votes -> full score
    assert got["ghost"][1] == 1.0 and got["shadow"][1] == 1.0


def test_infer_excludes_gazetteer_typed(spark):
    """org9 has one typed mention (d8) — inference must skip it even
    though d7 saw it untyped."""
    t = _triples(spark, INFER_ROWS)
    assert (
        SI.infer_entity_types(t).where(F.col("entity") == "org9").count()
        == 0
    )


def test_infer_python_mirror(spark):
    """Exact mirror of the vote/argmax on a two-predicate corpus with a
    genuinely contested untyped entity."""
    rows = INFER_ROWS + [
        # 'located_in': org(3) -> place(2), 3 typed rows
        ("e0", "org0", "located_in", "rome", 3, 2),
        ("e1", "org1", "located_in", "oslo", 3, 2),
        ("e2", "org2", "located_in", "bern", 3, 2),
        # ghost also appears as subject of located_in -> org vote
        ("e3", "ghost", "located_in", "rome", 0, 2),
    ]
    t = _triples(spark, rows)
    sig = {
        r["pred"]: (
            r["dom_type"], r["dom_conf"], r["range_type"], r["range_conf"]
        )
        for r in SI.predicate_signatures(t).collect()
    }
    mentions = []
    for _, s, p, o, sne, one in rows:
        mentions.append((s, sne, p, "dom"))
        mentions.append((o, one, p, "range"))
    typed = {}
    for e, ne, *_ in mentions:
        typed[e] = max(typed.get(e, -1), ne)
    votes = {}
    for e, ne, p, slot in mentions:
        if typed[e] > 0 or p not in sig:
            continue
        dt, dc, rt, rc = sig[p]
        ty, c = (dt, dc) if slot == "dom" else (rt, rc)
        if ty is None:
            continue
        w, n = votes.get((e, ty), (0.0, 0))
        votes[(e, ty)] = (w + c, n + 1)
    per_ent = {}
    for (e, ty), (w, n) in votes.items():
        per_ent.setdefault(e, []).append((ty, w, n))
    want = {}
    for e, cands in per_ent.items():
        total = sum(w for _, w, _ in cands)
        ty, w, n = min(cands, key=lambda t3: (-t3[1], t3[0]))
        want[e] = (ty, round(w / total, 4), n)
    got = {
        r["entity"]: (r["etype"], r["score"], r["n_evidence"])
        for r in SI.infer_entity_types(t).collect()
    }
    assert got == want
    # ghost is now contested between person (2 works_at votes) and
    # org (1 located_in vote): works_at's weight must win
    assert got["ghost"][0] == 1


def test_infer_types_facade(spark):
    """The public surface: parser.infer_types() over a built KG — the
    gazetteer-typed names stay out, untyped nouns get the dominant
    slot type of the predicates they fill."""
    from naruhodo_spark.api import parser

    p = parser(spark, lang="en")
    p.add_all(
        [
            "alice visited bob.",
            "carol visited dave.",
            "erin visited frank.",
            "alice visited the castle.",
        ]
    )
    inf = p.infer_types(min_support=1)
    got = {r["entity"]: r["etype"] for r in inf.collect()}
    # the gazetteer types person names; 'castle' is untyped and fills
    # visited's object slot, so it inherits the object-side majority
    assert "alice" not in got and "bob" not in got
    assert "castle" in got
    assert set(inf.columns) == {"entity", "etype", "score", "n_evidence"}
