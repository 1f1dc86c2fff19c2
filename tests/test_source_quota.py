"""Per-source quota cap (ops/textstats.source_quota): DuckDB mirror of
the exact keep rule on the real corpus, plus the determinism and
under-cap-passthrough properties."""

import duckdb
from pyspark.sql import functions as F

from naruhodo_spark.ops import textstats as TS

SF = "/root/testdata/sf0.01"


def test_source_quota_duckdb_mirror(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    cap = 10
    got = {
        r["doc_id"]
        for r in TS.source_quota(docs, cap=cap).select("doc_id").collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = {
        r[0]
        for r in con.execute(f"""
            WITH counts AS (SELECT source, count(*) n FROM documents GROUP BY source)
            SELECT d.doc_id FROM documents d JOIN counts c USING (source)
            WHERE c.n <= {cap}
               OR (('0x' || substr(md5('quota42|' || d.doc_id::VARCHAR), 1, 12))::UBIGINT)::BIGINT
                  % 10000 * c.n < {cap} * 10000
        """).fetchall()
    }
    assert got == want
    assert 0 < len(got) < docs.count()  # the cap actually bit


def test_source_quota_properties(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # synthesize a hot source: clone src0's docs 20x under fresh doc_ids
    hot = docs.where(F.col("source") == "src0").crossJoin(
        spark.range(1, 21).withColumnRenamed("id", "rep")
    ).select(
        (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    docs = docs.unionByName(hot)
    sizes = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    cap = 100  # src0 is now 525 docs, every other source 25
    assert max(sizes.values()) > cap > min(sizes.values())
    out = TS.source_quota(docs, cap=cap)
    kept = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for src, n in sizes.items():
        if n <= cap:
            assert kept.get(src, 0) == n, f"under-cap source {src} must pass whole"
        else:
            # rate-based cap: expected ≈cap with binomial noise; 3σ bound
            sigma = (cap * (1 - cap / n)) ** 0.5
            assert abs(kept.get(src, 0) - cap) <= 3 * sigma + 1, (src, kept.get(src), cap)

    # determinism + repartition invariance
    again = {
        r["doc_id"]
        for r in TS.source_quota(docs.repartition(13), cap=cap)
        .select("doc_id").collect()
    }
    assert again == {r["doc_id"] for r in out.select("doc_id").collect()}
