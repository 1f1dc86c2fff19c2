"""Entity context disambiguation (operators/entsplit.py): a planted
homonym must split into exactly its two planted context clusters, a
coherent entity must stay one cluster, and the LSH-candidate path must
agree with an exhaustive python mirror on the final clustering."""

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from naruhodo_spark import queries as Q
from naruhodo_spark.operators import entsplit as ES

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def planted(spark):
    """20 docs mentioning "mercury": 10 astronomy contexts, 10 chemistry
    contexts (disjoint vocabularies), plus 8 coherent "carbon" docs.
    Within each context family the docs share most tokens (high pairwise
    Jaccard); across families they share none."""
    astro = "planet orbit solar sun telescope astronomer"
    chem = "element metal liquid toxic thermometer alloy"
    coal = "atom diamond graphite organic bond"
    rows = []
    for i in range(10):
        rows.append((i, f"mercury {astro} probe{i % 3}"))
    for i in range(10, 20):
        rows.append((i, f"mercury {chem} lab{i % 3}"))
    for i in range(20, 28):
        rows.append((i, f"carbon {coal} sample{i % 2}"))
    return _docs(spark, rows)


def _ents(spark, names):
    return spark.createDataFrame([(n,) for n in names], "entity string")


def test_planted_homonym_splits(spark, planted):
    m = ES.mention_contexts(planted, _ents(spark, ["mercury", "carbon"]))
    clusters = ES.context_clusters(m)
    cand = {r["entity"]: r for r in ES.split_candidates(clusters).collect()}
    assert set(cand) == {"mercury"}  # carbon must NOT be flagged
    assert cand["mercury"]["n_clusters"] == 2
    assert cand["mercury"]["cluster_sizes"] == [10, 10]
    # the split must be exactly the planted doc partition
    rows = clusters.where(F.col("entity") == "mercury").collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], set()).add(int(r["mention"]))
    groups = sorted(by_cluster.values(), key=min)
    assert groups == [set(range(10)), set(range(10, 20))]


def test_coherent_entity_single_cluster(spark, planted):
    m = ES.mention_contexts(planted, _ents(spark, ["carbon"]))
    clusters = ES.context_clusters(m)
    assert clusters.select("cluster").distinct().count() == 1
    assert ES.split_candidates(clusters).count() == 0


def test_cluster_top_terms_separate_referents(spark, planted):
    m = ES.mention_contexts(planted, _ents(spark, ["mercury"]))
    clusters = ES.context_clusters(m)
    terms = ES.cluster_top_terms(m, clusters, k=3).collect()
    assert len(terms) == 2
    vocab = {tuple(sorted(r["top_terms"])) for r in terms}
    # top terms of the two clusters are disjoint (different referents)
    a, b = [set(v) for v in vocab]
    assert not (a & b)
    astro = {"planet", "orbit", "solar", "sun", "telescope", "astronomer"}
    chem = {"element", "metal", "liquid", "toxic", "thermometer", "alloy"}
    assert (a <= astro and b <= chem) or (a <= chem and b <= astro)


def _py_clusters(doc_ctx, threshold):
    """Exhaustive mirror: exact Jaccard over ALL mention pairs +
    union-find — no LSH candidate pruning."""
    parent = {m: m for m in doc_ctx}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in combinations(sorted(doc_ctx), 2):
        sa, sb = doc_ctx[a], doc_ctx[b]
        j = len(sa & sb) / len(sa | sb)
        if round(j, 4) >= threshold:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    groups = {}
    for m in doc_ctx:
        groups.setdefault(find(m), set()).add(m)
    return sorted(groups.values(), key=min)


def test_clusters_match_exhaustive_mirror(spark):
    """Randomized-ish corpus (deterministic construction): clustering
    through LSH candidates must equal the all-pairs mirror. LSH can only
    MISS pairs; with 8 bands × 2 rows at J≥0.5 the planted overlaps are
    dense enough that every true edge lands in some band, and any missed
    edge that still connects via transitivity keeps components equal."""
    base = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    rows, doc_ctx = [], {}
    for i in range(12):
        fam = i % 2
        toks = [t + str(fam) for t in base[: 5 + (i % 3)]]
        extra = [f"noise{i}"]
        rows.append((i, "ent " + " ".join(toks + extra)))
        doc_ctx[str(i)] = set(toks + extra)
    docs = _docs(spark, rows)
    m = ES.mention_contexts(docs, _ents(spark, ["ent"]))
    got_rows = ES.context_clusters(m, threshold=0.5).collect()
    got = {}
    for r in got_rows:
        got.setdefault(r["cluster"], set()).add(r["mention"])
    got_groups = sorted(got.values(), key=min)
    want = _py_clusters(doc_ctx, 0.5)
    assert got_groups == want


def test_empty_and_no_edge_inputs(spark):
    docs = _docs(spark, [(0, "solo entity doc")])
    m = ES.mention_contexts(docs, _ents(spark, ["entity"]))
    clusters = ES.context_clusters(m)
    rows = clusters.collect()
    assert len(rows) == 1 and rows[0]["cluster"] == "0"  # singleton
    none = ES.mention_contexts(docs, _ents(spark, ["absent"]))
    assert ES.context_clusters(none).count() == 0


def test_query_surface_runs(spark):
    out = Q.QUERIES["kg_entity_split"](spark, SF)
    rows = out.collect()
    assert {"entity", "mention", "cluster"} <= set(out.columns)
    assert len(rows) > 0


def test_bucket_cap_star_edges_preserve_clusters(spark):
    """Degenerate corpus (every mention near-identical context): with a
    tiny bucket_cap the oversized buckets take the star-edge path — the
    clustering must still be ONE cluster, with edge count linear in
    mentions, and must equal the uncapped clustering."""
    rows = [(i, "ent shared common tokens here again") for i in range(30)]
    docs = _docs(spark, rows)
    m = ES.mention_contexts(docs, _ents(spark, ["ent"]))
    capped = ES.context_clusters(m, bucket_cap=4)
    assert capped.select("cluster").distinct().count() == 1
    assert capped.count() == 30
    uncapped = ES.context_clusters(m, bucket_cap=10_000)
    a, b = capped.orderBy("mention"), uncapped.orderBy("mention")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # star edges really engaged: pair candidates under the cap are zero
    pairs, stars = ES._context_pairs(m, ES.N_HASHES, ES.N_BANDS, 0.3, 4)
    assert pairs.count() == 0
    assert 0 < stars.count() <= 30 * ES.N_BANDS


def test_entity_only_mention_keeps_row(spark):
    """A doc whose only token IS the entity must keep its mention row
    (ctx = []) through contexts AND clustering — no silent drop."""
    docs = _docs(spark, [(0, "mercury"), (1, "mercury planet orbit")])
    m = ES.mention_contexts(docs, _ents(spark, ["mercury"]))
    rows = {r["mention"]: r["ctx"] for r in m.collect()}
    assert rows == {"0": [], "1": ["orbit", "planet"]}
    clusters = ES.context_clusters(m)
    assert clusters.count() == 2  # both mentions present (singletons ok)


def test_separator_in_names_does_not_corrupt_clusters(spark):
    """ADVICE r03: norm_text collapses Java \\s, which excludes U+001F,
    so a mention/entity containing \\x1f used to corrupt the composite
    CC node ids (split_part mislabeled clusters). Mentions crafted to
    alias under the old raw-concat scheme must now land in their own
    correct clusters."""
    # old scheme: ('e\x1fa', 'b') and ('e', 'a\x1fb') both concat to
    # 'e\x1fa\x1fb'; here two DISTINCT mentions of one entity embed the
    # separator and must cluster by context, not by id accidents
    rows = [
        ("ent", "m\x1f1", ["planet", "orbit", "solar", "sun"]),
        ("ent", "m\x1f2", ["planet", "orbit", "solar", "telescope"]),
        ("ent", "lab1", ["metal", "toxic", "alloy", "liquid"]),
        ("ent", "lab2", ["metal", "toxic", "alloy", "thermometer"]),
    ]
    m = spark.createDataFrame(
        rows, "entity string, mention string, ctx array<string>"
    )
    out = ES.context_clusters(m, threshold=0.3)
    got = {}
    for r in out.collect():
        got.setdefault(r["cluster"], set()).add(r["mention"])
    assert set(map(frozenset, got.values())) == {
        frozenset({"m\x1f1", "m\x1f2"}),
        frozenset({"lab1", "lab2"}),
    }
    # every mention keeps its exact original string
    assert {r["mention"] for r in out.collect()} == {
        "m\x1f1", "m\x1f2", "lab1", "lab2"
    }
