"""KG snapshot diff (operators/kgdiff.py): classification vs a DuckDB
full-outer mirror, NULL-key matching, duplicate pre-aggregation, empty
sides, and the registered query surface."""

import duckdb
import pytest
from pyspark.sql import functions as F

from naruhodo_spark import queries as Q
from naruhodo_spark.operators import kgdiff as KD

SF = "/root/testdata/sf0.001"


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, weight long"
    )


def test_diff_classification(spark):
    old = _mk(
        spark,
        [
            ("a", "likes", "b", 2),
            ("a", "likes", "c", 1),
            ("x", "sees", "y", 5),
        ],
    )
    new = _mk(
        spark,
        [
            ("a", "likes", "b", 2),   # same
            ("a", "likes", "c", 4),   # changed +3
            ("n", "adds", "m", 1),    # added
        ],
    )
    out = {
        (r["subj"], r["pred"], r["obj"]): r
        for r in KD.diff_edges(old, new).collect()
    }
    assert out[("a", "likes", "b")]["change"] == "same"
    c = out[("a", "likes", "c")]
    assert c["change"] == "changed" and c["weight_delta"] == 3
    a = out[("n", "adds", "m")]
    assert a["change"] == "added" and a["old_weight"] is None
    r = out[("x", "sees", "y")]
    assert r["change"] == "removed" and r["weight_delta"] == -5


def test_diff_null_keys_match(spark):
    # partial triples (NULL obj) must pair up across snapshots, not
    # appear as added+removed
    old = _mk(spark, [("a", "moves", None, 3)])
    new = _mk(spark, [("a", "moves", None, 7)])
    rows = KD.diff_edges(old, new).collect()
    assert len(rows) == 1
    assert rows[0]["change"] == "changed" and rows[0]["weight_delta"] == 4


def test_diff_preaggregates_duplicate_keys(spark):
    old = _mk(spark, [("a", "p", "b", 1), ("a", "p", "b", 2)])
    new = _mk(spark, [("a", "p", "b", 3)])
    rows = KD.diff_edges(old, new).collect()
    assert len(rows) == 1 and rows[0]["change"] == "same"


def test_diff_empty_sides(spark):
    e = _mk(spark, [])
    n = _mk(spark, [("a", "p", "b", 1)])
    assert KD.diff_edges(e, n).collect()[0]["change"] == "added"
    assert KD.diff_edges(n, e).collect()[0]["change"] == "removed"
    assert KD.diff_edges(e, e).count() == 0


def test_diff_missing_column_raises(spark):
    bad = spark.createDataFrame([("a",)], "subj string")
    ok = _mk(spark, [("a", "p", "b", 1)])
    with pytest.raises(ValueError, match="missing column"):
        KD.diff_edges(bad, ok)


def test_diff_summary(spark):
    old = _mk(spark, [("a", "p", "b", 1), ("c", "p", "d", 2)])
    new = _mk(spark, [("a", "p", "b", 9), ("e", "p", "f", 1)])
    s = {r["change"]: r for r in KD.diff_summary(KD.diff_edges(old, new)).collect()}
    assert s["added"]["n_edges"] == 1 and s["added"]["total_weight_delta"] == 1
    assert s["removed"]["total_weight_delta"] == -2
    assert s["changed"]["total_weight_delta"] == 8


def test_kg_snapshot_diff_query_vs_duckdb(spark):
    """The registered query (SVO triples of the even-doc slice vs the
    full corpus) against an exact DuckDB full-outer mirror."""
    out = Q.QUERIES["kg_snapshot_diff"](spark, SF).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    mirror = con.execute(
        r"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok,
                 generate_subscripts(string_split_regex(trim(lower(text)), '\s+'), 1) AS pos
          FROM documents),
        p AS (SELECT doc_id, min(pos) AS pred_pos FROM toks
              WHERE tok IN ('scan','merge','join','filter','sort') AND pos >= 2
              GROUP BY doc_id),
        svo AS (
          SELECT t.doc_id,
                 max(CASE WHEN t.pos = 1 THEN t.tok END) AS subj,
                 max(CASE WHEN t.pos = p.pred_pos THEN t.tok END) AS pred,
                 max(CASE WHEN t.pos = p.pred_pos + 1 THEN t.tok END) AS obj
          FROM toks t JOIN p USING (doc_id) GROUP BY t.doc_id),
        old AS (SELECT subj, pred, obj, count(*) AS w FROM svo
                WHERE doc_id % 2 = 0 GROUP BY 1,2,3),
        new AS (SELECT subj, pred, obj, count(*) AS w FROM svo GROUP BY 1,2,3)
        SELECT coalesce(o.subj, n.subj) AS subj,
               coalesce(o.pred, n.pred) AS pred,
               coalesce(o.obj, n.obj) AS obj,
               CASE WHEN o.w IS NULL THEN 'added'
                    WHEN n.w IS NULL THEN 'removed'
                    WHEN o.w != n.w THEN 'changed' ELSE 'same' END AS change,
               o.w AS old_weight, n.w AS new_weight,
               coalesce(n.w, 0) - coalesce(o.w, 0) AS weight_delta
        FROM old o FULL OUTER JOIN new n
          ON o.subj IS NOT DISTINCT FROM n.subj
         AND o.pred IS NOT DISTINCT FROM n.pred
         AND o.obj IS NOT DISTINCT FROM n.obj
        """
    ).fetchdf()
    key = ["subj", "pred", "obj"]
    a = out.sort_values(key, na_position="first").reset_index(drop=True)
    b = mirror.sort_values(key, na_position="first").reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0
    assert list(a["change"]) == list(b["change"])
    assert [int(x) for x in a["weight_delta"]] == [
        int(x) for x in b["weight_delta"]
    ]
    # every even-doc triple survives into new → nothing is ever removed
    assert "removed" not in set(a["change"])


def test_diff_repartition_invariant(spark):
    a = Q.QUERIES["kg_snapshot_diff"](spark, SF)
    b = Q.QUERIES["kg_snapshot_diff"](spark, SF).repartition(13)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_null_weight_side_classified_changed(spark):
    """A side present with NULL weight must classify consistently with
    weight_delta (coalesced-0 comparison), never 'same' + nonzero delta."""
    old = spark.createDataFrame(
        [("a", "p", "b", None)],
        "subj string, pred string, obj string, weight long",
    )
    new = _mk(spark, [("a", "p", "b", 5)])
    r = KD.diff_edges(old, new).collect()[0]
    assert r["change"] == "changed" and r["weight_delta"] == 5
