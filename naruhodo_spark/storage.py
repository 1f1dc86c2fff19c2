"""Iceberg-or-parquet storage shim (SURVEY.md §7.0).

The north star materializes graph tables to Iceberg [B BASELINE.json:6].
No Iceberg runtime jar exists on this box (verified — SURVEY.md §0), so
every write goes through this shim: ``writeTo(...).using("iceberg")``
when an Iceberg catalog is configured on the session, plain parquet
otherwise. Prod clusters configure ``spark.sql.catalog.<name>`` via
spark-submit; the code path is identical either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CATALOG_CONF = "spark.sql.catalog.kg"


def _has_iceberg(spark: SparkSession) -> bool:
    try:
        return spark.conf.get(CATALOG_CONF) is not None
    except Exception:
        return False


def write_table(
    df: DataFrame,
    name: str,
    base: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    spark = df.sparkSession
    if _has_iceberg(spark):
        writer = df.writeTo(f"kg.{name}").using("iceberg")
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(f"{base}/{name}")


def read_table(spark: SparkSession, name: str, base: str) -> DataFrame:
    if _has_iceberg(spark):
        return spark.read.table(f"kg.{name}")
    return spark.read.parquet(f"{base}/{name}")


def table_exists(spark: SparkSession, name: str, base: str) -> bool:
    if _has_iceberg(spark):
        return spark.catalog.tableExists(f"kg.{name}")
    try:
        spark.read.parquet(f"{base}/{name}").schema
        return True
    except Exception:
        return False


def write_bucketed(
    df: DataFrame, table: str, n_buckets: int, key: str
) -> None:
    """Bucketed managed table (pyspark-guide pattern): later equi-joins on
    ``key`` between tables bucketed the same way are co-located — no
    exchange on either side (asserted by tests/test_bucketing.py). The
    Iceberg analog is ``bucket(N, key)`` partition transforms; this is
    the session-catalog fallback."""
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def merge_upsert_by_key(
    spark: SparkSession,
    incoming: DataFrame,
    name: str,
    base: str,
    keys: list[str],
) -> None:
    """MERGE-style upsert: with Iceberg this would be ``MERGE INTO``; the
    parquet emulation is anti-join + union (pyspark guide: CDC pattern).
    New rows win on key collision (idempotent re-delivery)."""
    if table_exists(spark, name, base):
        existing = read_table(spark, name, base)
        kept = existing.join(
            F.broadcast(incoming.select(*keys).distinct()), keys, "left_anti"
        )
        merged = kept.unionByName(incoming)
    else:
        merged = incoming
    # Parquet overwrite-while-reading needs a materialization barrier
    merged = merged.localCheckpoint()
    write_table(merged, name, base, mode="overwrite")
