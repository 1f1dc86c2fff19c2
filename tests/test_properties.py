"""Property-based tests (SURVEY.md §5.2 tier 4)."""

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from naruhodo_spark import schemas as S
from naruhodo_spark.lang import en_profile
from naruhodo_spark.operators.chunk import chunk_sentence_en
from naruhodo_spark.operators.triples import triples_from_chunklist

PROF = en_profile()

texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
)


@given(texts)
@settings(max_examples=300, deadline=None)
def test_chunker_total_and_deterministic(s):
    a = chunk_sentence_en(s, PROF)
    b = chunk_sentence_en(s, PROF)
    assert a == b
    n = len(a)
    for c in a:
        assert c["parent"] == -1 or 0 <= c["parent"] < n
        assert c["parent"] != c["chunk_id"]
        assert c["ctype"] in (0, 1, 2, 3, 4, 5)


@given(texts)
@settings(max_examples=300, deadline=None)
def test_triples_reference_valid_chunks(s):
    chunks = chunk_sentence_en(s, PROF)
    for c in chunks:
        c["doc_id"], c["sent_id"] = "d", 0
    ts = triples_from_chunklist(chunks, "svo", set(PROF["stop_mains"]))
    pred_ids = {
        c["chunk_id"] for c in chunks if c["ctype"] in (S.CTYPE_VERB, S.CTYPE_ADJ)
    }
    arg_ids = {
        c["chunk_id"]
        for c in chunks
        if c["ctype"] in (S.CTYPE_NOUN, S.CTYPE_PRONOUN)
    }
    for t in ts:
        assert t[2] in pred_ids  # pred_id
        assert t[5] is None or t[5] in arg_ids  # subj_id
        assert t[7] is None or t[7] in arg_ids  # obj_id
        # SVO: explicit subject precedes the predicate, object follows
        if t[5] is not None:
            assert t[5] < t[2]
        if t[7] is not None:
            assert t[7] > t[2]


def test_pipeline_partitioning_independent(spark):
    """Identical tables at different parallelism (the sandbox proxy for
    cluster-size independence, SURVEY.md §0)."""
    from naruhodo_spark.pipeline import build_kg
    from naruhodo_spark import synth

    a_docs = synth.synth_documents(spark, 50, num_partitions=2)
    b_docs = synth.synth_documents(spark, 50, num_partitions=29)
    a = build_kg(a_docs)["ksg_edges"]
    b = build_kg(b_docs)["ksg_edges"]
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_approx_distinct_bounded(spark):
    """approx_count_distinct (O29 sketch tier) within its documented
    relative error of the exact count on real data."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", 0.02).alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) <= 0.05 * row["exact"]


def test_weird_unicode_docs_survive(spark):
    from naruhodo_spark.pipeline import build_kg

    rows = [
        ("d1", [{"kind": "text", "text": "héllo wörld. 你好 世界! a\tb\nc", "media_ref": "", "offset": 0}]),
        ("d2", [{"kind": "media", "text": "", "media_ref": "x://1", "offset": 0}]),
        ("d3", [{"kind": "text", "text": "", "media_ref": "", "offset": 0}]),
        ("d4", [{"kind": "text", "text": "...!!!???", "media_ref": "", "offset": 0}]),
        ("d5", [{"kind": "text", "text": "alice (secretly) visited [sic] bob.", "media_ref": "", "offset": 0}]),
    ]
    docs = spark.createDataFrame(rows, schema=S.DOCUMENTS_SPANS)
    kg = build_kg(docs)
    t = kg["triples"].collect()
    # bracketed spans are stripped (O7): triple survives for d5
    d5 = [r for r in t if r["doc_id"] == "d5"]
    assert any(r["subj"] == "alice" and r["obj"] == "bob" for r in d5)


def test_simhash_empty_and_null_docs_keep_rows(spark):
    """One row per doc ALWAYS: empty and NULL text hash to 0 (and the
    dd_simhash oracle re-attaches them via LEFT JOIN — symmetric)."""
    import duckdb as _dd

    from naruhodo_spark.ops.dedup import simhash
    from tests.test_entry_contract import ROTATION_MIRRORS

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, ""), (3, None), (4, "   ")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[2] == got[3] == got[4] == 0
    assert got[1] != 0

    con = _dd.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)",
        [(1, "alpha beta gamma"), (2, ""), (3, None), (4, "   ")],
    )
    want = dict(con.execute(ROTATION_MIRRORS["dd_simhash"]).fetchall())
    assert got == want
