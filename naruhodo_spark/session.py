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
    (see build_kg.py); ``master`` is then supplied by the submitter and
    MUST win — never hardcode one over it. spark-submit's PythonRunner
    exports PYSPARK_GATEWAY_PORT; a plain ``python script.py`` does not.
    """
    under_spark_submit = "PYSPARK_GATEWAY_PORT" in os.environ
    if not under_spark_submit:
        # Local mode spawns python workers from the JVM's environment; a
        # driver script run from OUTSIDE the repo (sys.path.insert only)
        # would otherwise fail to unpickle our pandas UDFs on workers
        # (ModuleNotFoundError: naruhodo_spark). Exporting the package
        # parent dir here mirrors what --py-files does on a real cluster.
        pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        existing = os.environ.get("PYTHONPATH", "")
        if pkg_parent not in existing.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                pkg_parent + (os.pathsep + existing if existing else "")
            )
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    elif not under_spark_submit:
        builder = builder.master(f"local[{DEFAULT_CPUS}]")

    builder = (
        builder
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
    # shuffle partitions ≈ total cores (runtime-settable; resolved after
    # session start so a submitter-provided master is respected)
    n_shuffle = shuffle_partitions or spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(max(n_shuffle, 1)))
    return spark
