"""Predicate synonymy clustering (operators/relsyn.py) vs a pure-python
mirror (exact Jaccard over argument-pair sets + union-find), plus the
df_cap audit surface, min_support gate, and determinism."""

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from naruhodo_spark import queries as Q
from naruhodo_spark.operators import relsyn as R

SF = "/root/testdata/sf0.001"


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


@pytest.fixture(scope="module")
def synonymy(spark):
    """buys/purchases share 4 of 5 argument pairs (J = 2/3);
    sells shares one pair with buys (J = 1/8 — below threshold);
    rare_pred has 1 pair (below min_support)."""
    pairs = [("alice", "car"), ("bob", "house"), ("carol", "boat"),
             ("dave", "bike"), ("erin", "vase")]
    rows = []
    for s, o in pairs:
        rows.append((s, "buys", o))
    for s, o in pairs[:4]:
        rows.append((s, "purchases", o))
    rows += [("x", "purchases", "y")]
    rows += [(s, "sells", o) for s, o in
             [("alice", "car"), ("f", "g"), ("h", "i"), ("j", "k")]]
    rows += [("solo", "rare_pred", "thing")]
    # duplicates must not inflate profiles
    rows.append(("alice", "buys", "car"))
    return _triples(spark, rows)


def _py_mirror(rows, min_support, threshold):
    prof = {}
    for s, p, o in rows:
        prof.setdefault(p, set()).add((s, o))
    prof = {p: v for p, v in prof.items() if len(v) >= min_support}
    parent = {p: p for p in prof}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    pairs = {}
    for a, b in combinations(sorted(prof), 2):
        inter = len(prof[a] & prof[b])
        if inter == 0:
            continue
        j = inter / len(prof[a] | prof[b])
        pairs[(a, b)] = round(j, 4)
        if round(j, 4) >= threshold:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    return pairs, {p: find(p) for p in prof}


def test_synonym_pairs_vs_python(spark, synonymy):
    rows = [(r["subj"], r["pred"], r["obj"]) for r in synonymy.collect()]
    want_pairs, _ = _py_mirror(rows, 3, 0.5)
    got = {
        (r["pred_a"], r["pred_b"]): r["jaccard"]
        for r in R.synonym_pairs(synonymy).collect()
    }
    want = {k: j for k, j in want_pairs.items() if j >= 0.5}
    assert got == want
    assert ("buys", "purchases") in got  # the planted synonym pair


def test_clusters_vs_python(spark, synonymy):
    rows = [(r["subj"], r["pred"], r["obj"]) for r in synonymy.collect()]
    _, want = _py_mirror(rows, 3, 0.5)
    got = {
        r["pred"]: r["canon_pred"]
        for r in R.predicate_clusters(synonymy).collect()
    }
    assert got == want
    assert got["purchases"] == "buys"  # merged, min-label canonical
    assert got["sells"] == "sells"     # below threshold: singleton
    assert "rare_pred" not in got      # below min_support: excluded


def test_df_cap_audit_and_exclusion(spark):
    # one argument pair shared by 30 predicates: with df_cap=10 it must
    # be dropped from the index AND surfaced in the audit
    rows = [("s", f"p{i:02d}", "o") for i in range(30)]
    # give each predicate 2 private pairs to clear min_support=3
    rows += [
        (f"s{i}{k}", f"p{i:02d}", f"o{i}{k}")
        for i in range(30)
        for k in range(2)
    ]
    t = _triples(spark, rows)
    audit = R.promiscuous_arg_pairs(t, min_support=3, df_cap=10).collect()
    assert len(audit) == 1 and audit[0]["df"] == 30
    # without the capped pair no two predicates share anything
    assert R.synonym_pairs(t, min_support=3, df_cap=10).count() == 0
    # raising the cap re-admits it (J = 1/5 < 0.5 → still no pairs at
    # the default threshold, but candidates exist at threshold 0)
    assert (
        R.synonym_pairs(t, min_support=3, df_cap=100, threshold=0.01).count()
        > 0
    )


def test_null_arguments_ignored(spark):
    t = _triples(
        spark,
        [("a", "p", None), ("a", "p", "b"), (None, "q", "c"), ("d", "q", "e")],
    )
    prof = R.predicate_profiles(t)
    assert prof.groupBy("pred").count().count() == 2
    assert prof.count() == 2  # one non-null pair each


def test_deterministic_across_partitionings(spark, synonymy):
    a = R.predicate_clusters(synonymy)
    b = R.predicate_clusters(synonymy.repartition(11))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_query_surface_runs(spark):
    out = Q.QUERIES["kg_predicate_synonyms"](spark, SF)
    rows = out.collect()
    assert set(out.columns) == {"pred", "canon_pred"}
    assert len(rows) > 0


def test_inverse_pairs_planted(spark):
    """inverse_pairs: planted exact inverse (buy/sell), a symmetric
    relation (marry), and an unrelated predicate (visit) — the inverse
    and the symmetric row surface with jaccard 1.0, nothing else."""
    from naruhodo_spark.operators.relsyn import inverse_pairs

    rows = []
    for i in range(8):
        rows.append((f"a{i}", "buy", f"b{i}"))
        rows.append((f"b{i}", "sell", f"a{i}"))          # exact inverse
        rows.append((f"m{i}", "marry", f"n{i}"))
        rows.append((f"n{i}", "marry", f"m{i}"))         # symmetric
        rows.append((f"a{i}", "visit", f"c{i}"))         # unrelated
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {
        (r["pred_a"], r["pred_b"]): r
        for r in inverse_pairs(t, min_support=3, threshold=0.5).collect()
    }
    assert set(got) == {("buy", "sell"), ("marry", "marry")}
    assert got[("buy", "sell")]["jaccard"] == 1.0
    assert not got[("buy", "sell")]["symmetric"]
    assert got[("marry", "marry")]["jaccard"] == 1.0
    assert got[("marry", "marry")]["symmetric"]


def test_inverse_pairs_partial_overlap_threshold(spark):
    from naruhodo_spark.operators.relsyn import inverse_pairs

    rows = []
    for i in range(10):
        rows.append((f"x{i}", "teach", f"y{i}"))
    for i in range(5):  # only half the pairs reversed
        rows.append((f"y{i}", "learn_from", f"x{i}"))
    for i in range(5, 10):
        rows.append((f"q{i}", "learn_from", f"p{i}"))
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    # jaccard = 5 / (10 + 10 - 5) = 1/3
    got = inverse_pairs(t, min_support=3, threshold=0.3).collect()
    pair = [r for r in got if {r["pred_a"], r["pred_b"]} == {"learn_from", "teach"}]
    assert len(pair) == 1 and abs(pair[0]["jaccard"] - 1 / 3) < 1e-9
    assert not inverse_pairs(t, min_support=3, threshold=0.4).where(
        "pred_a = 'learn_from' OR pred_b = 'learn_from'"
    ).count()


def test_inverse_rev_side_cap_and_audit(spark):
    """ADVICE r03: a promiscuous REVERSED argument pair must be capped
    and audited, not just the forward side. Plant one (subj, obj) pair
    that k predicates share in the forward orientation — its REVERSED
    key has df_rev = k via those same predicates' profiles — plus an
    honest inverse pair that must survive the cap."""
    rows = []
    # 6 predicates all assert p_i(x, y): the reversed key (y, x) has
    # df_rev = 6 once each predicate also carries (y, x) rows
    for i in range(6):
        rows += [(f"x{j}", f"p{i}", f"y{j}") for j in range(3)]
        rows.append(("hub_a", f"p{i}", "hub_b"))
        rows.append(("hub_b", f"p{i}", "hub_a"))
    # honest inverse pair, disjoint entities
    rows += [(f"s{j}", "buys", f"t{j}") for j in range(3)]
    rows += [(f"t{j}", "sells", f"s{j}") for j in range(3)]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")

    audit = R.promiscuous_inverse_keys(t, min_support=3, df_cap=4)
    arows = audit.collect()
    assert len(arows) >= 1  # the hub key is surfaced, not silent
    assert all(
        (r["df_fwd"] or 0) > 4 or (r["df_rev"] or 0) > 4 for r in arows
    )

    inv = R.inverse_pairs(t, min_support=3, df_cap=4, threshold=0.5)
    got = {(r["pred_a"], r["pred_b"]) for r in inv.collect()}
    assert ("buys", "sells") in got  # honest inverses survive the cap
    # the hub-only overlap between p_i predicates came solely from the
    # capped key, so no p_i/p_j pair may clear the threshold via it
    assert not any(a.startswith("p") and b.startswith("p")
                   for a, b in got if a != b)
