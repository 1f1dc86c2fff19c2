"""Bucketed co-located join: the physical plan must contain NO shuffle
(Exchange) when both sides are bucketed on the join key — the local
stand-in for Iceberg bucket(doc_id) co-location at cluster scale."""

import pyspark.sql.functions as F

from naruhodo_spark import storage


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # managed tables land in ./spark-warehouse (gitignored); the
    # warehouse dir is a static conf and cannot move per-test
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    od = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    storage.write_bucketed(li, "li_bkt", 8, "l_orderkey")
    storage.write_bucketed(
        od.withColumnRenamed("o_orderkey", "l_orderkey"), "od_bkt", 8, "l_orderkey"
    )
    a = spark.table("li_bkt")
    b = spark.table("od_bkt")
    # disable broadcast so the join strategy question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "l_orderkey").groupBy("o_orderstatus").count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        n_exchanges_join = plan.count("Exchange")
        # the only exchange allowed is the one feeding the final groupBy
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert n_exchanges_join <= 1, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS li_bkt")
        spark.sql("DROP TABLE IF EXISTS od_bkt")
