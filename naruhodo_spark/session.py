"""SparkSession factory with the engine's normative configs (SURVEY.md §4.4)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "naruhodo_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    Normative physical-layout decisions (SURVEY.md §4.4):
    - shuffle partitions ≈ cores (never the 200 default);
    - AQE on (runtime coalesce + skew-join splitting);
    - Arrow on for every pandas-UDF boundary;
    - UTC session timezone for DuckDB-oracle parity.

    On a real cluster this is launched via ``spark-submit --py-files``
    (see build_kg.py); ``master`` is then supplied by the submitter.
    """
    master = master or f"local[{DEFAULT_CPUS}]"
    cores = DEFAULT_CPUS if master.startswith("local[") else "200"
    if master.startswith("local["):
        inner = master[len("local[") : -1]
        cores = str(os.cpu_count() or 32) if inner == "*" else inner
    n_shuffle = shuffle_partitions or int(cores)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
