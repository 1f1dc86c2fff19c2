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


def test_source_quota_large_cap_no_overflow(spark):
    """Regression: cap·10000 as int32 literals overflows under ANSI for
    any cap > 214,748 (ARITHMETIC_OVERFLOW at plan execution, found by
    the composed kg2td drill with a 10M no-op cap). A huge cap must be
    a clean no-op."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.count()
    assert TS.source_quota(docs, cap=10_000_000).count() == n


def test_top_terms_duckdb_mirror(spark):
    """TF-IDF keyword extraction vs an exact DuckDB mirror on the real
    corpus (same normalization, same smoothed IDF, same tie-break)."""
    import duckdb

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["tfidf"])
        for r in TS.top_terms(docs, k=3, min_df=2).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    rows = con.execute(r"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(list_filter(
                   string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                   x -> x <> '')) AS term
          FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        dfreq AS (
          SELECT term, count(*) AS df
          FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY term),
        nd AS (SELECT count(DISTINCT doc_id) AS nd FROM documents),
        idf AS (
          SELECT term, round(ln((nd + 1) / (df + 1.0)), 6) AS idf
          FROM dfreq, nd WHERE df >= 2),
        scored AS (
          SELECT tf.doc_id, tf.term, tf.tf, round(tf.tf * idf.idf, 6) AS tfidf,
                 row_number() OVER (PARTITION BY tf.doc_id
                                    ORDER BY round(tf.tf * idf.idf, 6) DESC,
                                             tf.term) AS rank
          FROM tf JOIN idf USING (term))
        SELECT doc_id, rank, term, tf, tfidf FROM scored WHERE rank <= 3
    """).fetchall()
    want = {(d, r): (t, tfv, x) for d, r, t, tfv, x in rows}
    assert got == want
    assert len(got) > 0
