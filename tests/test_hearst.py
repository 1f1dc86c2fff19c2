"""Hearst-pattern hypernym extraction — per-pattern goldens, multiple
matches per sentence, aggregation, and the map-only plan pin."""

from pyspark.sql import functions as F

from naruhodo_spark.operators import hearst


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _edges(spark, texts):
    return {
        (r["hyponym"], r["hypernym"], r["pattern"])
        for r in hearst.extract_hypernyms(_docs(spark, texts)).collect()
    }


def test_such_as_list(spark):
    got = _edges(spark, ["animals such as dogs, cats and ferrets sleep."])
    assert got == {
        ("dogs", "animals", "such_as"),
        ("cats", "animals", "such_as"),
        ("ferrets", "animals", "such_as"),
    }


def test_such_h_as(spark):
    got = _edges(spark, ["works by such authors as Herrick or Shakespeare."])
    assert got == {
        ("Herrick", "authors", "such_h_as"),
        ("Shakespeare", "authors", "such_h_as"),
    }


def test_and_other_or_other(spark):
    got = _edges(
        spark,
        ["bruises, wounds and other injuries heal.", "steel or other metals rust."],
    )
    assert got == {
        ("bruises", "injuries", "and_other"),
        ("wounds", "injuries", "and_other"),
        ("steel", "metals", "and_other"),
    }


def test_including_especially(spark):
    got = _edges(
        spark,
        [
            "countries including France and Spain vote.",
            "languages, especially Basque, resist.",
        ],
    )
    assert ("France", "countries", "including") in got
    assert ("Spain", "countries", "including") in got
    assert ("Basque", "languages", "including") in got


def test_multiple_matches_per_sentence_survive(spark):
    got = _edges(
        spark,
        ["metals such as iron rust and fluids such as water or oil flow."],
    )
    assert got == {
        ("iron", "metals", "such_as"),
        ("water", "fluids", "such_as"),
        ("oil", "fluids", "such_as"),
    }


def test_sentence_split_and_no_cross_sentence_match(spark):
    got = _edges(spark, ["animals such as dogs bark. cats chase other things."])
    assert got == {("dogs", "animals", "such_as")}


def test_no_pattern_no_rows(spark):
    assert _edges(spark, ["the quick brown fox jumps over the lazy dog."]) == set()


def test_taxonomy_edges_aggregates(spark):
    texts = [
        "animals such as dogs bark.",
        "animals such as dogs and cats play.",
        "dogs and other animals run.",
    ]
    rows = {
        r["hyponym"]: r
        for r in hearst.taxonomy_edges(_docs(spark, texts), min_count=2).collect()
    }
    assert list(rows) == ["dogs"]
    d = rows["dogs"]
    assert d["n_mentions"] == 3 and d["n_docs"] == 3
    assert d["patterns"] == ["and_other", "such_as"]


def test_extraction_plan_is_map_only(spark):
    df = hearst.extract_hypernyms(_docs(spark, ["animals such as dogs bark."]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
