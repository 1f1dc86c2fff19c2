"""O3 web source: the naruhodo_web Python DataSource (network fetch
stubbed; Spark plumbing — registration, partition fan-out, spans
schema, pipeline consumption — real)."""

import pyspark.sql.functions as F
import pytest

from naruhodo_spark import schemas as S
from naruhodo_spark.websource import _SPANS_DDL, WebDocumentSource, fake_fetch


@pytest.fixture(scope="module")
def web_docs(spark):
    spark.dataSource.register(WebDocumentSource)
    urls = "|".join(f"https://example.org/page{i}" for i in range(7))
    return (
        spark.read.format("naruhodo_web")
        .option("urls", urls)
        .option("n_partitions", "3")
        .load()
    )


def test_ddl_matches_normative_schema(spark):
    """Same field names/types as schemas.DOCUMENTS_SPANS; nullability is
    not compared — a DataSource's declared schema is nullable by design
    (the engine cannot prove non-nullness of reader output)."""
    from pyspark.sql.types import _parse_datatype_string

    def shape(dt):
        return dt.simpleString()

    assert shape(_parse_datatype_string(_SPANS_DDL)) == shape(
        S.DOCUMENTS_SPANS
    )


def test_rows_and_partition_fanout(web_docs):
    assert web_docs.count() == 7
    # one task per URL bucket: 3 requested partitions → 3 input splits
    assert web_docs.rdd.getNumPartitions() == 3
    row = web_docs.where(F.col("doc_id").endswith("page3")).first()
    assert row["spans"][0]["kind"] == "text"
    assert row["spans"][0]["text"] == fake_fetch("https://example.org/page3")


def test_pipeline_consumes_web_source(web_docs):
    from naruhodo_spark.pipeline import build_kg

    triples = build_kg(web_docs)["triples"]
    rows = triples.collect()
    assert len(rows) == 7  # "alice visited pageN" → one triple per page
    assert {r["pred"] for r in rows} == {"visit"}
    assert {r["subj"] for r in rows} == {"alice"}


def test_websource_no_urls_yields_empty_frame(spark):
    """partitions() must never return [] — PySpark would substitute
    [None] and crash read(None); zero urls = one empty partition."""
    from naruhodo_spark.websource import WebDocumentSource

    spark.dataSource.register(WebDocumentSource)
    df = spark.read.format("naruhodo_web").option("urls", "").load()
    assert df.count() == 0
    assert df.schema == spark.read.format("naruhodo_web").option(
        "urls", "https://example.org/a"
    ).load().schema
