"""SHACL-core shape validation over the distributed edge table — the
declarative counterpart of schema_induct's INDUCED constraints: users
state the shapes (W3C SHACL, https://www.w3.org/TR/shacl/), the
validator emits a violation report. KG-curation pipelines run this
after construction/fusion to gate what ships (the same role pySHACL
plays single-node; here the data graph is 10^12 edges, so shapes are a
broadcast table and every check is a map-side join or one uniform
aggregate).

Shapes are DATA, not code — a DataFrame (or list of dicts) with
columns (shape_id, target_class, path, constraint, value):

- ``minCount`` / ``maxCount`` — per focus node, the number of ``path``
  edges must be >= / <= int(value). minCount violations REQUIRE
  seeing absent edges: counts come from a left join, null -> 0
  (SHACL's closed-count semantics).
- ``pattern``   — every ``path`` value must match the Java/RE2-common
  regex in ``value`` (rlike).
- ``in``        — every value must be one of value.split('|').
- ``hasValue``  — at least one ``path`` edge equal to ``value``.
- ``class``     — every ``path`` value must have an is_a edge to
  ``value`` (sh:class against this engine's type predicate).

Focus nodes are SHACL targetClass: nodes with (node, is_a,
target_class). The report has one row per (focus, shape_id,
constraint) violation — value-level constraints report each offending
value; count/hasValue constraints report once with the observed
count. An empty report means the graph CONFORMS.

Scale shape at 10^12 edges:

- shapes are vocabulary-sized → broadcast into every check; the edge
  table is filtered to the constrained predicates BEFORE any shuffle
  (a broadcast semi-filter, so scans prune);
- cardinality checks are ONE uniform groupBy(src, pred) count over the
  pre-filtered edges; value checks are map-side broadcast joins; the
  ``class`` check is one equi-join against the (node, type) slice —
  keys are focus/value nodes, never shape-sized intermediates;
- nothing collects to the driver; the report is a DataFrame sized by
  the violations, not the graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CONSTRAINTS = ("minCount", "maxCount", "pattern", "in", "hasValue", "class")

SHAPE_SCHEMA = (
    "shape_id string, target_class string, path string, "
    "constraint string, value string"
)


def _shape_frame(spark, shapes) -> DataFrame:
    if isinstance(shapes, DataFrame):
        return shapes.select(
            "shape_id", "target_class", "path", "constraint", "value"
        )
    return spark.createDataFrame(shapes, SHAPE_SCHEMA)


def validate_shapes(
    edges: DataFrame,
    shapes,
    type_pred: str = "is_a",
) -> DataFrame:
    """(focus, shape_id, target_class, path, constraint, expected,
    actual) — every violation of ``shapes`` (DataFrame or list of
    (shape_id, target_class, path, constraint, value) tuples) by the
    (src, pred, dst) graph. Empty result = conforms. Unknown
    constraint names raise (never silently skipped)."""
    spark = edges.sparkSession
    sh = _shape_frame(spark, shapes).localCheckpoint()
    bad = [
        r["constraint"]
        for r in sh.select("constraint").distinct().collect()
        if r["constraint"] not in CONSTRAINTS
    ]
    if bad:
        raise ValueError(
            f"validate_shapes: unknown constraints {bad!r} — "
            f"supported: {CONSTRAINTS}"
        )

    types = edges.where(F.col("pred") == type_pred).select(
        F.col("src").alias("focus"), F.col("dst").alias("target_class")
    )
    # focus × applicable shapes — broadcast the shape table
    focus = types.join(F.broadcast(sh), "target_class")

    # edges restricted to constrained predicates (broadcast semi-filter
    # BEFORE the count shuffle — scans prune to the shaped predicates)
    paths = sh.select(F.col("path").alias("pred")).distinct()
    rel = edges.join(F.broadcast(paths), "pred").select("src", "pred", "dst")

    out_cols = [
        "focus", "shape_id", "target_class", "path", "constraint",
        F.col("value").alias("expected"), "actual",
    ]

    # --- cardinality: ONE uniform count per (src, pred), then compare
    counts = rel.groupBy(
        F.col("src").alias("focus"), F.col("pred").alias("path")
    ).agg(F.count(F.lit(1)).alias("n"))
    card = (
        focus.where(F.col("constraint").isin("minCount", "maxCount"))
        .join(counts, ["focus", "path"], "left")
        .withColumn("n", F.coalesce("n", F.lit(0)))
    )
    card_viol = card.where(
        (
            (F.col("constraint") == "minCount")
            & (F.col("n") < F.col("value").cast("long"))
        )
        | (
            (F.col("constraint") == "maxCount")
            & (F.col("n") > F.col("value").cast("long"))
        )
    ).select(*out_cols[:-1], F.col("n").cast("string").alias("actual"))

    # --- per-value checks: focus ⋈ its path edges (focus-keyed join)
    vals = focus.where(
        F.col("constraint").isin("pattern", "in", "class")
    ).join(
        rel.select(
            F.col("src").alias("focus"), F.col("pred").alias("path"),
            F.col("dst").alias("actual"),
        ),
        ["focus", "path"],
    )
    pat_viol = vals.where(
        (F.col("constraint") == "pattern")
        & ~F.regexp_like(F.col("actual"), F.col("value"))
    ).select(*out_cols)
    in_viol = vals.where(
        (F.col("constraint") == "in")
        & ~F.array_contains(F.split("value", r"\|"), F.col("actual"))
    ).select(*out_cols)

    # --- class: offending values are those WITHOUT (value, is_a, C)
    typed = edges.where(F.col("pred") == type_pred).select(
        F.col("src").alias("actual"), F.col("dst").alias("value")
    )
    cls_viol = (
        vals.where(F.col("constraint") == "class")
        .join(typed, ["actual", "value"], "left_anti")
        .select(*out_cols)
    )

    # --- hasValue: focus nodes with NO (path, value) edge
    hv = focus.where(F.col("constraint") == "hasValue")
    hv_viol = hv.join(
        rel.select(
            F.col("src").alias("focus"), F.col("pred").alias("path"),
            F.col("dst").alias("value"),
        ),
        ["focus", "path", "value"],
        "left_anti",
    ).select(*out_cols[:-1], F.lit("absent").alias("actual"))

    return (
        card_viol.unionByName(pat_viol)
        .unionByName(in_viol)
        .unionByName(cls_viol)
        .unionByName(hv_viol)
    )


def conforms(edges: DataFrame, shapes, type_pred: str = "is_a") -> bool:
    """True iff the graph satisfies every shape (empty report)."""
    return validate_shapes(edges, shapes, type_pred=type_pred).isEmpty()
