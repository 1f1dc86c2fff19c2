"""KG→text verbalization (ops/verbalize.py): exact template strings for
every flag branch, partition-invariant deterministic output, and the
hub-entity fact cap with its audit columns."""

import pyspark.sql.functions as F

from naruhodo_spark.ops import verbalize as V


def _edges(spark, rows):
    return spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, weight long,"
        " negative boolean, passive boolean",
    )


def test_templates_exact(spark):
    edges = _edges(spark, [
        ("alice", "visit", "bob", 1, False, False),
        ("alice", "praise", "carol", 1, True, False),
        ("bob", "admire", "alice", 1, False, True),
        ("bob", "blame", "carol", 1, True, True),
        ("carol", "run", "", 1, False, False),
        ("carol", "sleep", "", 1, True, False),
    ])
    out = {r["doc_id"]: r for r in V.verbalize_triples(edges).collect()}
    assert out["kg:alice"]["text"] == (
        "alice does not praise carol. alice visit bob."
    )
    assert out["kg:bob"]["text"] == (
        "bob is admire by alice. bob is not blame by carol."
    )
    assert out["kg:carol"]["text"] == (
        "carol run. carol does not sleep."
    )
    assert all(r["n_facts"] == 2 and r["n_facts_kept"] == 2
               for r in out.values())


def test_partition_invariant(spark):
    rows = [
        (f"e{i % 7}", f"p{i % 5}", f"o{i % 3}", 1, i % 2 == 0, i % 3 == 0)
        for i in range(60)
    ]
    a = {r["doc_id"]: r["text"]
         for r in V.verbalize_triples(_edges(spark, rows)).collect()}
    b = {r["doc_id"]: r["text"]
         for r in V.verbalize_triples(
             _edges(spark, rows).repartition(13)).collect()}
    assert a == b and len(a) == 7


def test_hub_cap_audited(spark):
    rows = [("hub", f"p{i:03d}", f"o{i:03d}", 1, False, False)
            for i in range(80)]
    out = V.verbalize_triples(_edges(spark, rows), max_facts=10).head()
    assert out["n_facts"] == 80 and out["n_facts_kept"] == 10
    assert out["text"].count(".") == 10
    # deterministic choice: the lexicographically first facts survive
    assert "p000" in out["text"] and "p010" not in out["text"]


def test_verbalized_docs_feed_corpus_ops(spark):
    """The output is documents-shaped: the downstream text ops consume
    it unchanged (the KELM mixing path)."""
    from naruhodo_spark.ops import textstats as TS

    edges = _edges(spark, [
        ("alice", "visit", "bob", 1, False, False),
        ("carol", "praise", "dave", 1, False, False),
    ])
    docs = V.verbalize_triples(edges).select("doc_id", "text")
    counts = {r["doc_id"]: r["n_tokens"]
              for r in TS.token_counts(docs).collect()}
    assert counts == {"kg:alice": 3, "kg:carol": 3}


def test_roundtrip_reextraction_recall(spark):
    """Loop-closing property: verbalized KG text fed back through the
    extraction pipeline recovers most plain (non-negative, non-passive,
    object-ful) triples — template verbalization is the KELM ablation
    baseline, so the floor is a regression pin, not a parity claim
    (measured 0.71 on the synth KSG)."""
    from naruhodo_spark.queries import _synth, _en, build_kg

    edges = build_kg(_synth(spark), prof=_en())["ksg_edges"].localCheckpoint()
    docs = V.verbalize_triples(edges).select("doc_id", "text")
    spans = docs.select(
        "doc_id",
        F.array(F.struct(
            F.lit("text").alias("kind"), F.col("text").alias("text"),
            F.lit("").alias("media_ref"), F.lit(0).cast("int").alias("offset"),
        )).alias("spans"),
    )
    kg2 = build_kg(spans, prof=_en())
    orig = {(r["subj"], r["pred"], r["obj"]) for r in edges.where(
        ~F.col("negative") & ~F.col("passive") & (F.col("obj") != "")
    ).collect()}
    re_ex = {(r["subj"], r["pred"], r["obj"])
             for r in kg2["ksg_edges"].collect()}
    recall = len(orig & re_ex) / max(len(orig), 1)
    assert recall >= 0.6, recall


# ---------------------------------------------------------------------
# QA-pair generation
# ---------------------------------------------------------------------

def _qa_edges(spark, rows):
    return spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, weight long,"
        " negative boolean, passive boolean",
    )


def test_qa_pairs_templates_exact(spark):
    from naruhodo_spark.ops.verbalize import qa_pairs

    edges = _qa_edges(spark, [
        ("alice", "eats", "apples", 1, False, False),
        ("bob", "seen", "carol", 1, False, True),     # passive
        ("dave", "eats", "meat", 1, True, False),     # negated: skipped
        ("eve", "runs", "", 1, False, False),         # objectless: skipped
    ])
    got = {
        (r["question"], r["answer"], r["direction"])
        for r in qa_pairs(edges).collect()
    }
    assert got == {
        ("What does alice eats?", "apples", "forward"),
        ("What eats apples?", "alice", "backward"),
        ("What is seen by carol?", "bob", "forward"),
        ("What does bob seen?", "carol", "backward"),
    }


def test_qa_pairs_without_flag_columns(spark):
    """ADVICE r04: qa_pairs must share verbalize_triples' input
    contract — an edge frame WITHOUT the optional negative/passive
    columns verbalizes as all-false flags, not AnalysisException."""
    from naruhodo_spark.ops.verbalize import qa_pairs

    bare = spark.createDataFrame(
        [("alice", "eats", "apples", 1), ("bob", "likes", "tea", 1)],
        "subj string, pred string, obj string, weight long",
    )
    flagged = _qa_edges(spark, [
        ("alice", "eats", "apples", 1, False, False),
        ("bob", "likes", "tea", 1, False, False),
    ])
    got = sorted(map(tuple, qa_pairs(bare).collect()))
    want = sorted(map(tuple, qa_pairs(flagged).collect()))
    assert got == want and len(got) == 4
    # distractor path too (it references passive post-union)
    got_d = sorted(map(tuple, qa_pairs(bare, max_distractors=1).collect()))
    want_d = sorted(map(tuple, qa_pairs(flagged, max_distractors=1).collect()))
    assert got_d == want_d


def test_qa_pairs_distractors(spark):
    from naruhodo_spark.ops.verbalize import qa_pairs

    edges = _qa_edges(spark, [
        ("a", "eats", f"food{i}", 1, False, False) for i in range(6)
    ])
    rows = qa_pairs(edges, max_distractors=3).collect()
    assert len(rows) == 12  # 6 triples × 2 directions
    for r in rows:
        ds = r["distractors"]
        assert len(ds) <= 3
        assert r["answer"] not in ds
        assert len(set(ds)) == len(ds)
        if r["direction"] == "forward":
            # answer-side vocabulary: objects for forward questions
            assert all(d.startswith("food") for d in ds)
        else:
            # backward answers are subjects; the only subject is the
            # answer itself, so no type-coherent distractor exists —
            # empty beats an object-typed giveaway list
            assert ds == []
    # determinism across partitionings
    a = sorted(map(tuple, qa_pairs(edges.repartition(1), max_distractors=2).collect()))
    b = sorted(map(tuple, qa_pairs(edges.repartition(7), max_distractors=2).collect()))
    assert a == b


def test_qa_pairs_roundtrip_answerable(spark):
    """Over the built synth KG: every forward answer is the triple's
    object (or subject when passive) by construction — spot-check the
    join-back identity on real extractor output."""
    from naruhodo_spark import synth
    from naruhodo_spark.ops.verbalize import qa_pairs
    from naruhodo_spark.pipeline import build_kg

    edges = build_kg(synth.synth_documents(spark, 60))["ksg_edges"]
    qa = qa_pairs(edges)
    n = qa.count()
    assert n > 0
    bad = qa.where(
        (F.col("direction") == "forward")
        & (F.col("answer") != F.col("obj"))
        & (F.col("answer") != F.col("subj"))
    ).count()
    assert bad == 0
