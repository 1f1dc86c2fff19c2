"""Driver-contract mimic (SURVEY.md §5.2 tier 3): every oracle-backed
query must match DuckDB on row count, sorted column names, and
order-insensitive values at sf0.01 — the same comparison the grading
driver performs.

The comparison is DTYPE-FAITHFUL, mirroring the real driver's
pandas-rendered value hash: both sides go through pandas, columns are
sorted by name, rows sorted by all columns (this crashes on unhashable
array cells — exactly like the driver's canonicalizer, so array-shaped
surfaces fail HERE first), and every cell is compared via its string
rendering, under which bigint 56 != float 56.0. The r01 leniency
(rounding floats and comparing 56 == 56.0 as equal) let two
HUGEINT-vs-BIGINT oracle bugs through to the driver."""

import duckdb
import numpy as np
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()

# Never-oracled rows-only surfaces that nonetheless have an exact
# ANSI-SQL twin: mirrored HERE with the identical driver-style
# comparison (the 50-slot driver window is full; this is the same
# evidence, minus the driver's independent execution).
# the ρdf stratification (operators/entail.py) replayed as
# recursive CTEs: sp/sc closures, rdfs7 lift, domain/range typing
# over the LIFTED graph, rdfs9 inheritance over asserted + derived
# types — over the same ontology-annotated TPC-H geography
# (queries._RDFS_SCHEMA rendered as a VALUES list). Shared by the
# kg_rdfs_entailed mirror and, as a nested subquery, the
# kg_shacl_report mirror.
_RDFS_ENTAILED_SQL = """
    WITH RECURSIVE inst AS (
      SELECT 'c:' || c_custkey AS src, 'cust_from' AS pred,
             'n:' || c_nationkey AS dst FROM customer
      UNION ALL
      SELECT 'n:' || n_nationkey, 'in_region', 'r:' || n_regionkey
      FROM nation
      UNION ALL
      SELECT 's:' || s_suppkey, 'supp_from', 'n:' || s_nationkey
      FROM supplier
    ), sch(src, pred, dst) AS (
      VALUES
        ('cust_from','domain','Customer'), ('cust_from','range','Nation'),
        ('in_region','domain','Nation'), ('in_region','range','Region'),
        ('supp_from','subproperty_of','based_in'),
        ('based_in','subproperty_of','located_in'),
        ('supp_from','domain','Supplier'), ('based_in','range','Place'),
        ('Customer','subclass_of','Agent'), ('Supplier','subclass_of','Agent'),
        ('Agent','subclass_of','Entity'), ('Nation','subclass_of','Place'),
        ('Region','subclass_of','Place'), ('Place','subclass_of','Entity')
    ), edges AS (
      SELECT * FROM inst UNION ALL SELECT * FROM sch
    ), sp AS (
      SELECT src, dst FROM sch WHERE pred = 'subproperty_of'
      UNION
      SELECT a.src, b.dst FROM sp a
      JOIN (SELECT src, dst FROM sch
            WHERE pred = 'subproperty_of') b ON a.dst = b.src
    ), lifted AS (
      SELECT * FROM edges
      UNION ALL
      SELECT e.src, sp.dst AS pred, e.dst FROM edges e
      JOIN sp ON e.pred = sp.src
      UNION ALL
      SELECT src, 'subproperty_of', dst FROM sp
    ), sc AS (
      SELECT src, dst FROM lifted WHERE pred = 'subclass_of'
      UNION
      SELECT a.src, b.dst FROM sc a
      JOIN (SELECT src, dst FROM lifted
            WHERE pred = 'subclass_of') b ON a.dst = b.src
    ), lifted2 AS (
      SELECT * FROM lifted
      UNION ALL SELECT src, 'subclass_of', dst FROM sc
    ), typed AS (
      SELECT src, 'is_a' AS pred, dst FROM lifted2 WHERE pred = 'is_a'
      UNION ALL
      SELECT l.src, 'is_a', d.dst FROM lifted2 l
      JOIN sch d ON d.pred = 'domain' AND l.pred = d.src
      UNION ALL
      SELECT l.dst, 'is_a', r.dst FROM lifted2 l
      JOIN sch r ON r.pred = 'range' AND l.pred = r.src
    ), inherited AS (
      SELECT t.src, 'is_a' AS pred, sc.dst FROM typed t
      JOIN sc ON t.dst = sc.src
    )
    SELECT DISTINCT src, pred, dst FROM (
      SELECT * FROM lifted2
      UNION ALL SELECT * FROM typed
      UNION ALL SELECT * FROM inherited
    )
"""

EXTRA_MIRRORS = {
    "kg_rdfs_entailed": _RDFS_ENTAILED_SQL,
    # OWL property tier over the order-succession chains: the same
    # recursive closure as the kg_sparql_closure oracle, plus the
    # inverse flip and the schema triples
    "kg_owl_entailed": """
    WITH RECURSIVE lim AS (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ), chain AS (
      SELECT a.o_orderkey AS src, b.o_orderkey AS dst
      FROM lim a JOIN lim b
        ON a.o_custkey = b.o_custkey AND b.rn = a.rn + 1
      WHERE b.rn <= 8
    ), closure AS (
      SELECT src, dst FROM chain
      UNION
      SELECT c.src, e.dst FROM closure c JOIN chain e ON c.dst = e.src
    )
    SELECT DISTINCT src, pred, dst FROM (
      SELECT 'o:' || src AS src, 'next' AS pred, 'o:' || dst AS dst
      FROM closure
      UNION ALL
      SELECT 'o:' || dst, 'prev', 'o:' || src FROM closure
      UNION ALL
      SELECT 'next', 'is_a', 'transitive_property'
      UNION ALL
      SELECT 'next', 'inverse_of', 'prev'
    )
    """,
    # sameAs smushing: the dd_near_dup_groups reach-CTE closure over
    # the 3-chain co-reference links, then the same left-join/coalesce
    # endpoint rewrite smush() compiles to
    "kg_smushed_graph": """
    WITH RECURSIVE links AS (
      SELECT 'c:' || c_custkey AS a, 'cust#' || c_custkey AS b
      FROM customer
      UNION ALL
      SELECT 'customer-' || c_custkey, 'cust#' || c_custkey FROM customer
    ), und AS (
      SELECT a, b FROM links UNION SELECT b, a FROM links
    ), nodes AS (
      SELECT DISTINCT a AS node FROM und
    ), reach(node, anc) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT u.b, r.anc FROM reach r JOIN und u ON u.a = r.node
    ), classes AS (
      SELECT node, min(anc) AS label FROM reach GROUP BY node
    ), edges AS (
      SELECT 'c:' || c_custkey AS src, 'cust_from' AS pred,
             'n:' || c_nationkey AS dst FROM customer
      UNION ALL
      SELECT 'cust#' || c_custkey, 'in_segment', 'seg:' || c_mktsegment
      FROM customer
    )
    SELECT DISTINCT COALESCE(ls.label, e.src) AS src, e.pred,
           COALESCE(ld.label, e.dst) AS dst
    FROM edges e
    LEFT JOIN classes ls ON ls.node = e.src
    LEFT JOIN classes ld ON ld.node = e.dst
    """,
    # SHACL validation (operators/shacl.py) over the ENTAILED graph:
    # each shape of queries._SHACL_SHAPES spelled out as its relational
    # check — closed-count minCount via LEFT JOIN + COALESCE 0,
    # per-value pattern/in/class filters, per-focus hasValue NOT EXISTS
    "kg_shacl_report": f"""
    WITH entailed AS ({_RDFS_ENTAILED_SQL}),
    types AS (
      SELECT src AS focus, dst AS tc FROM entailed WHERE pred = 'is_a'
    ),
    v1 AS (
      SELECT t.focus, 'NationShape' AS shape_id, 'Nation' AS target_class,
             'located_in' AS path, 'minCount' AS "constraint",
             '1' AS expected, CAST(COALESCE(c.n, 0) AS VARCHAR) AS actual
      FROM types t LEFT JOIN (
        SELECT src, count(*) AS n FROM entailed
        WHERE pred = 'located_in' GROUP BY src
      ) c ON c.src = t.focus
      WHERE t.tc = 'Nation' AND COALESCE(c.n, 0) < 1
    ),
    v2 AS (
      SELECT t.focus, 'NationShape', 'Nation', 'in_region', 'in',
             'r:0|r:1', e.dst
      FROM types t JOIN entailed e
        ON e.src = t.focus AND e.pred = 'in_region'
      WHERE t.tc = 'Nation' AND e.dst NOT IN ('r:0', 'r:1')
    ),
    v3 AS (
      SELECT t.focus, 'SupplierShape', 'Supplier', 'supp_from', 'class',
             'Region', e.dst
      FROM types t JOIN entailed e
        ON e.src = t.focus AND e.pred = 'supp_from'
      WHERE t.tc = 'Supplier' AND NOT EXISTS (
        SELECT 1 FROM types ty
        WHERE ty.focus = e.dst AND ty.tc = 'Region')
    ),
    v4 AS (
      SELECT t.focus, 'RegionShape', 'Region', 'in_region', 'hasValue',
             'r:0', 'absent'
      FROM types t
      WHERE t.tc = 'Region' AND NOT EXISTS (
        SELECT 1 FROM entailed e
        WHERE e.src = t.focus AND e.pred = 'in_region' AND e.dst = 'r:0')
    ),
    v5 AS (
      SELECT t.focus, 'SupplierShape', 'Supplier', 'based_in', 'pattern',
             '^n:[0-9]$', e.dst
      FROM types t JOIN entailed e
        ON e.src = t.focus AND e.pred = 'based_in'
      WHERE t.tc = 'Supplier' AND NOT regexp_matches(e.dst, '^n:[0-9]$')
    )
    SELECT * FROM v1
    UNION ALL SELECT * FROM v2
    UNION ALL SELECT * FROM v3
    UNION ALL SELECT * FROM v4
    UNION ALL SELECT * FROM v5
    """,
    "kg_sparql_construct": """
    WITH sols AS (
      SELECT 'c:' || c_custkey   AS c,
             'r:' || n_regionkey AS r
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE 'c:' || c_custkey <> 'c:1'
    )
    SELECT DISTINCT src, pred, dst FROM (
      SELECT c AS src, 'in_region_via' AS pred, r AS dst FROM sols
      UNION ALL
      SELECT r AS src, 'has_customer' AS pred, c AS dst FROM sols
    )
    """,
    "kg_fused_facts": """
    WITH claims AS (
      SELECT DISTINCT 'c:' || o_custkey AS subj,
             'preferred_status'         AS pred,
             o_orderstatus              AS obj,
             'o:' || o_orderkey         AS source
      FROM orders
    ), votes AS (
      SELECT subj, pred, obj, count(*) AS n_src
      FROM claims GROUP BY 1, 2, 3
    ), ranked AS (
      SELECT subj, pred, obj, n_src,
             sum(n_src)   OVER (PARTITION BY subj, pred) AS total,
             count(*)     OVER (PARTITION BY subj, pred) AS n_candidates,
             row_number() OVER (PARTITION BY subj, pred
                                ORDER BY n_src DESC, obj) AS rn
      FROM votes
    )
    SELECT subj, pred, obj,
           round(n_src / total, 4) AS confidence,
           n_src AS n_sources, n_candidates
    FROM ranked WHERE rn = 1
    """,
    "kg_cardinality_violations": """
    WITH pairs AS (
      SELECT DISTINCT 'order_cust' AS pred,
             'o:' || o_orderkey AS subj,
             'c:' || o_custkey  AS obj
      FROM orders
      UNION
      SELECT DISTINCT 'order_cust',
             'o:' || o_orderkey,
             'c:' || (o_custkey + 1)
      FROM orders WHERE o_orderkey % 997 = 0
    ), fun AS (
      SELECT pred,
             round(count(DISTINCT subj) / count(*), 4) AS functionality
      FROM pairs GROUP BY pred
      HAVING count(*) >= 3
         AND round(count(DISTINCT subj) / count(*), 4) >= 0.95
         AND round(count(DISTINCT subj) / count(*), 4) < 1.0
    )
    SELECT p.pred, p.subj, count(*) AS n_objects,
           min(p.obj) AS obj_min, max(p.obj) AS obj_max,
           f.functionality
    FROM pairs p JOIN fun f ON p.pred = f.pred
    GROUP BY p.pred, p.subj, f.functionality
    HAVING count(*) > 1
    """,
}

# Demoted-from-the-driver-window queries that keep an exact DuckDB
# mirror HERE (rotation policy, queries.py ledger): same comparison as
# test_oracle_match, just not competing for one of the driver's 50
# verified slots.
from naruhodo_spark.queries import _langid_oracle
from naruhodo_spark.queries import _COSINE_SQL, _NORM_SQL

ROTATION_MIRRORS = {
    # demoted r05 session-7 (slots went to kg_aligned_entities,
    # kg_quotient_summary, kg_modularity_roles, kg_allen_relations):
    # the exact oracle SQL, verbatim from the r01-r04 driver oracles
    "join_asof_attribution": """
    SELECT b.event_id, b.user_id, b.ts, b.purchase_value,
           v.ts AS asof_ts, v.view_value AS asof_view_value
    FROM (SELECT event_id, user_id, ts, round(value, 2) AS purchase_value
          FROM events WHERE event_type = 'purchase') b
    ASOF LEFT JOIN (SELECT user_id, ts, round(max(value), 2) AS view_value
                    FROM events WHERE event_type = 'view'
                    GROUP BY user_id, ts) v
      ON b.user_id = v.user_id AND b.ts >= v.ts
    """,
    "ts_pack_sequences": rf"""
    WITH d AS (
      SELECT doc_id, doc_id // 100 AS shard,
             len(string_split({_NORM_SQL}, ' ')) AS n_tokens
      FROM documents),
    s AS (
      SELECT doc_id, shard, n_tokens,
             CAST(coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS start_offset
      FROM d)
    SELECT doc_id, shard, start_offset,
           CAST(start_offset // 256 AS BIGINT) AS pack_in_shard, n_tokens
    FROM s
    """,
    "sim_embedding_near_dups": f"""
    SELECT vec_a, vec_b, cosine FROM (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             {_COSINE_SQL} AS cosine
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id)
    WHERE cosine >= 0.3
    """,
    "cc_order_chains": """
    SELECT o_orderkey,
           MIN(o_orderkey) OVER (PARTITION BY o_custkey) AS component
    FROM orders
    """,
    "q6_forecast_revenue": """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    # demoted r05 session-5: the exact oracle SQL, verbatim from the
    # generator that produced the driver oracle in rounds 1-4
    "ts_langid": _langid_oracle(),
    # demoted r05 session-6 (slot went to kg_sparql_closure): the exact
    # SimHash bit-math SQL, verbatim from the r02-r04 driver oracle —
    # token hash = first 8 md5 bytes as uint64 (hex substring,
    # big-endian, matching numpy's MSB-first unpackbits); result bit j
    # = sign of Σ_tokens (2·bit_j − 1); two's-complement back to the
    # signed long the pandas UDF emits
    "dd_simhash": r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS t
      FROM documents WHERE text IS NOT NULL),
    h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 16))::UBIGINT AS hv
          FROM toks),
    b AS (
      SELECT doc_id, g.j,
             sum(CASE WHEN (hv >> g.j) & 1 = 1 THEN 1 ELSE -1 END) AS acc
      FROM h, generate_series(0, 63) AS g(j)
      GROUP BY doc_id, g.j),
    u AS (
      SELECT doc_id,
             sum(CASE WHEN acc > 0 THEN ((1::UBIGINT) << j)::HUGEINT
                 ELSE 0 END) AS uv
      FROM b GROUP BY doc_id)
    -- LEFT JOIN re-attaches empty/NULL-text docs with simhash 0,
    -- matching the UDF's one-row-per-doc contract
    SELECT d.doc_id,
           COALESCE(CAST(CASE WHEN uv >= 9223372036854775808
                              THEN uv - 18446744073709551616
                         ELSE uv END AS BIGINT), 0) AS simhash
    FROM documents d LEFT JOIN u USING (doc_id)
    """,
}


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon(pdf):
    """Driver-style canonicalization: sort columns by name, sort rows by
    all columns (pandas sort_values — unhashable cells raise, as in the
    driver), render every cell as its dtype-faithful string."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    pdf = pdf.reset_index(drop=True)

    def render(v):
        if v is None or v is pd_NaT or (isinstance(v, float) and np.isnan(v)):
            return "<null>"
        if isinstance(v, (np.floating, float)):
            # shortest-repr of the double — 56.0 renders "56.0", never "56"
            return repr(float(v))
        if isinstance(v, (np.integer, int)):
            return repr(int(v))
        return str(v)

    return [tuple(render(v) for v in row) for row in pdf.itertuples(index=False)]


import pandas as _pd

pd_NaT = _pd.NaT


def test_all_queries_have_callables():
    assert len(QUERIES) >= 30
    for name in ORACLES:
        assert name in QUERIES
    # a pytest mirror for a still-oracled query would double-test it
    # under one id — the demotion must land with the mirror
    assert not (set(ROTATION_MIRRORS) | set(EXTRA_MIRRORS)) & set(ORACLES)
    for name in (*ROTATION_MIRRORS, *EXTRA_MIRRORS):
        assert name in QUERIES


def test_all_oracled_queries_inside_driver_window():
    """The driver verifies the FIRST 50 registered queries. Every oracle
    must sit inside that window or its correctness signal is lost
    (r01: 6 oracled queries fell outside)."""
    first50 = list(QUERIES)[:50]
    outside = [n for n in ORACLES if n not in first50]
    assert outside == [], f"oracled queries outside 50-query window: {outside}"
    assert [n for n in first50 if n not in ORACLES] == []


@pytest.mark.parametrize(
    "name",
    sorted(ORACLES) + sorted(ROTATION_MIRRORS) + sorted(EXTRA_MIRRORS),
)
def test_oracle_match(spark, ddb, name):
    oracle = (
        ORACLES.get(name) or ROTATION_MIRRORS.get(name) or EXTRA_MIRRORS[name]
    )
    sdf = QUERIES[name](spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    duck_pdf = ddb.execute(oracle).df()

    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch {list(spark_pdf.columns)} vs"
        f" {list(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    a = _canon(spark_pdf)
    b = _canon(duck_pdf)
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:5]
    assert a == b, f"{name}: value mismatch at {mism}: " + "; ".join(
        f"{a[i]} != {b[i]}" for i in mism
    )


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES))
)
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
