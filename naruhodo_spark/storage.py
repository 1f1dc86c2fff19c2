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
    """Semantics both branches MUST share (pinned by duck-typed fakes in
    tests/test_storage_shim.py):

    - overwrite + partition_by = DYNAMIC partition overwrite: only the
      partitions present in ``df`` are replaced. The Iceberg branch uses
      ``overwritePartitions()`` — a plain ``createOrReplace`` would
      destroy every previously committed partition, so a second
      ``run_partitioned`` wave would erase wave 1's triples while the
      manifest still marks them done (silent half-corpus graphs).
    - the first write to a missing Iceberg table CREATES it regardless
      of mode: ``append()`` on a nonexistent table throws, and every
      fresh deployment's first manifest/raw write is an append.
    - the parquet branch scopes dynamic overwrite to THIS writer via
      ``option(...)`` — mutating the session-global conf would silently
      change the semantics of the caller's own unrelated overwrites.
    """
    spark = df.sparkSession
    if _has_iceberg(spark):
        t = f"kg.{name}"
        if not spark.catalog.tableExists(t):
            writer = df.writeTo(t).using("iceberg")
            if partition_by:
                writer = writer.partitionedBy(*[df[c] for c in partition_by])
            writer.create()
        elif mode == "append":
            df.writeTo(t).append()
        elif partition_by:
            df.writeTo(t).overwritePartitions()
        else:
            df.writeTo(t).using("iceberg").createOrReplace()
        return
    w = df.write.mode(mode)
    if mode == "overwrite" and partition_by:
        w = w.option("partitionOverwriteMode", "dynamic")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(f"{base}/{name}")


def _sql_literal(v) -> str:
    """Render a partition value as a safe SQL literal. Strings are
    single-quoted with embedded quotes doubled (ANSI escaping) — Python
    repr() would emit a double-quoted form for values containing ', which
    SQL parses as an identifier."""
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


def delete_partitions(
    spark: SparkSession,
    name: str,
    base: str,
    part_col: str,
    values: list,
) -> None:
    """Drop specific partitions — the cleanup dynamic overwrite cannot
    express: a reprocessed partition whose NEW extraction yields zero
    rows writes nothing, so its stale rows from the previous run would
    survive and finalize would aggregate deleted content. Iceberg: a
    transactional DELETE. Parquet: Hadoop-FS directory removal (scheme-
    aware, works on HDFS/S3A paths, not just local)."""
    if not values:
        return
    if _has_iceberg(spark):
        # A fresh deployment's first wave pre-drops before any table
        # exists — DELETE on a missing table would abort the whole run.
        if not spark.catalog.tableExists(f"kg.{name}"):
            return
        vals = ", ".join(_sql_literal(v) for v in values)
        spark.sql(f"DELETE FROM kg.{name} WHERE {part_col} IN ({vals})")
        return
    if not table_exists(spark, name, base):
        return
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    for v in values:
        path = jvm.org.apache.hadoop.fs.Path(f"{base}/{name}/{part_col}={v}")
        fs = path.getFileSystem(hconf)
        fs.delete(path, True)


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
