"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The registry lives in ``naruhodo_spark/queries.py``; this module stays a
thin adapter so the package is importable without the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full KG construction pipeline (normalize →
    chunk → triples → coref → link → canonicalize → edge agg) over the
    sf0.001 documents table lifted into the spans shape, returning the
    aggregated (subj, pred, obj, weight) KSG edge table."""
    from pyspark.sql import functions as F

    from naruhodo_spark import synth
    from naruhodo_spark.operators.normalize import flat_to_spans
    from naruhodo_spark.pipeline import build_kg

    flat = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs = flat_to_spans(flat)
    kg = build_kg(docs, aliases=synth.alias_dictionary(spark))
    return kg["ksg_edges"].orderBy(F.desc("weight"), "subj", "pred", "obj")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from naruhodo_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from naruhodo_spark.queries import ORACLES

    return dict(ORACLES)
