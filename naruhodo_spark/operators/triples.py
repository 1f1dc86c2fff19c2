"""O12 — predicate-argument (subj, pred, obj) triple extraction.

Reference behavior: for each sentence the knowledge core finds predicate
chunks (verb/adjective), attaches argument chunks whose ``parent`` points
at the predicate, classifies the argument role by its functional word
(が/は→subject, を→object, other particles→oblique), and decorates the
predicate with negation/passive/tense [PK naruhodo/core/KnowledgeCoreJa.py
``add``].

Two equivalent plans (SURVEY.md O12), A/B-able:

- **relational (default)**: a co-partitioned self-join of chunks on
  ``(doc_id, sent_id, parent=chunk_id)`` + conditional min/max-struct
  aggregation. Pure Catalyst — whole-stage codegen, AQE-planned join,
  map-side partial agg; deterministic argument choice (nearest preceding
  subject, nearest following object) via struct-ordering min/max.
- **grouped pandas**: ``applyInPandas`` over ``(doc_id)`` groups — one
  Arrow batch per document; useful when chunks are already partitioned by
  doc and the relational shuffle would dominate.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from naruhodo_spark import schemas as S

_PRED_TYPES = (S.CTYPE_VERB, S.CTYPE_ADJ)
_ARG_TYPES = (S.CTYPE_NOUN, S.CTYPE_PRONOUN)


def _role_col(order: str):
    """Role classification from func + position. SVO: bare arg before the
    predicate is the subject, after it the object. SOV (ja): particle-
    driven (が/は subj, を obj) regardless of position."""
    if order == "sov":
        return (
            F.when(F.col("func").isin("が", "は"), F.lit("subj"))
            .when(F.col("func").isin("を"), F.lit("obj"))
            .otherwise(F.col("func"))
        )
    return (
        F.when((F.col("func") == "") & (F.col("chunk_id") < F.col("pred_id")), F.lit("subj"))
        .when((F.col("func") == "") & (F.col("chunk_id") > F.col("pred_id")), F.lit("obj"))
        .otherwise(F.col("func"))
    )


def extract_triples(chunks: DataFrame, prof: dict) -> DataFrame:
    """Relational plan. Returns the TRIPLES schema; predicates with no
    attached arguments still emit a row (null subj/obj) so omitted-subject
    carryover (O14) can fill them."""
    stop = list(prof.get("stop_mains", ()))

    preds = chunks.where(F.col("ctype").isin(*_PRED_TYPES)).select(
        "doc_id",
        "sent_id",
        F.col("chunk_id").alias("pred_id"),
        F.col("main").alias("pred"),
        "negative",
        "passive",
        "tense",
    )
    args = (
        chunks.where(F.col("ctype").isin(*_ARG_TYPES))
        .where(~F.col("main").isin(stop) if stop else F.lit(True))  # O9
        .select("doc_id", "sent_id", "chunk_id", "parent", "main", "func")
    )

    # parent-chunk self-join (O17): co-partitioned on (doc_id, sent_id);
    # explicit aliases because both sides derive from the same chunks plan
    a, p = args.alias("a"), preds.alias("p")
    attached = a.join(
        p,
        on=[
            F.col("a.doc_id") == F.col("p.doc_id"),
            F.col("a.sent_id") == F.col("p.sent_id"),
            F.col("a.parent") == F.col("p.pred_id"),
        ],
        how="inner",
    ).select(
        F.col("p.doc_id").alias("doc_id"),
        F.col("p.sent_id").alias("sent_id"),
        F.col("p.pred_id").alias("pred_id"),
        F.col("a.chunk_id").alias("chunk_id"),
        F.col("a.main").alias("main"),
        F.col("a.func").alias("func"),
    )

    role = _role_col(prof.get("order", "svo"))
    # min/max over struct(chunk_id, main): orders by chunk_id first →
    # deterministic nearest-preceding subject / nearest-following object.
    agged = (
        attached.withColumn("role", role)
        .groupBy("doc_id", "sent_id", "pred_id")
        .agg(
            F.max(
                F.when(F.col("role") == "subj", F.struct("chunk_id", "main"))
            ).alias("s"),
            F.min(
                F.when(F.col("role") == "obj", F.struct("chunk_id", "main"))
            ).alias("o"),
        )
    )

    return (
        preds.join(agged, ["doc_id", "sent_id", "pred_id"], "left")
        .select(
            "doc_id",
            "sent_id",
            "pred_id",
            "pred",
            F.col("s.main").alias("subj"),
            F.col("s.chunk_id").alias("subj_id"),
            F.col("o.main").alias("obj"),
            F.col("o.chunk_id").alias("obj_id"),
            "negative",
            "passive",
            "tense",
        )
    )


# ---------------------------------------------------------------------
# Plan B: grouped-pandas extraction (one Arrow batch per document).
# ---------------------------------------------------------------------

_TRIPLE_COLS = [f.name for f in S.TRIPLES.fields]


def triples_from_chunklist(rows: list[dict], order: str, stop: set) -> list[tuple]:
    """Pure-Python per-sentence extraction — shared by the pandas plan and
    the golden-spec generator (tests). `rows` = one sentence's chunks."""
    preds = [c for c in rows if c["ctype"] in _PRED_TYPES]
    out = []
    for p in preds:
        subj = obj = None
        for c in rows:
            if c["ctype"] not in _ARG_TYPES or c["parent"] != p["chunk_id"]:
                continue
            if c["main"] in stop:
                continue
            if order == "sov":
                r = ("subj" if c["func"] in ("が", "は")
                     else "obj" if c["func"] == "を" else c["func"])
            else:
                r = ("subj" if c["func"] == "" and c["chunk_id"] < p["chunk_id"]
                     else "obj" if c["func"] == "" and c["chunk_id"] > p["chunk_id"]
                     else c["func"])
            if r == "subj" and (subj is None or c["chunk_id"] > subj["chunk_id"]):
                subj = c
            elif r == "obj" and (obj is None or c["chunk_id"] < obj["chunk_id"]):
                obj = c
        out.append(
            (
                p["doc_id"], p["sent_id"], p["chunk_id"], p["main"],
                subj["main"] if subj else None,
                subj["chunk_id"] if subj else None,
                obj["main"] if obj else None,
                obj["chunk_id"] if obj else None,
                p["negative"], p["passive"], p["tense"],
            )
        )
    return out


def extract_triples_pandas(chunks: DataFrame, prof: dict) -> DataFrame:
    """applyInPandas plan, grouped by doc_id (bounded group size — docs
    are at most a few hundred chunks)."""
    order = prof.get("order", "svo")
    stop = set(prof.get("stop_mains", ()))

    def per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, sent in pdf.groupby("sent_id", sort=True):
            rows.extend(
                triples_from_chunklist(sent.to_dict("records"), order, stop)
            )
        return pd.DataFrame(rows, columns=_TRIPLE_COLS)

    return chunks.groupBy("doc_id").applyInPandas(per_doc, schema=S.TRIPLES)


def dsg_tables(chunks: DataFrame) -> tuple[DataFrame, DataFrame]:
    """O17/D4 — dependency-structure-graph node/edge tables.

    Reference: one networkx node per chunk occurrence, one edge
    child→parent labeled with the child's functional word
    [PK naruhodo/core/DependencyCoreJa.py]."""
    node_id = F.concat_ws(":", "doc_id", "sent_id", "chunk_id")
    nodes = chunks.select(
        node_id.alias("node_id"),
        "doc_id", "sent_id", "chunk_id", "surface", "main", "ctype",
    )
    child = chunks.alias("c")
    parent = chunks.alias("p")
    edges = (
        child.join(
            parent,
            on=[
                F.col("c.doc_id") == F.col("p.doc_id"),
                F.col("c.sent_id") == F.col("p.sent_id"),
                F.col("c.parent") == F.col("p.chunk_id"),
            ],
        )
        .select(
            F.concat_ws(":", "c.doc_id", "c.sent_id", "c.chunk_id").alias("src"),
            F.concat_ws(":", "p.doc_id", "p.sent_id", "p.chunk_id").alias("dst"),
            F.col("c.func").alias("label"),
            F.col("c.doc_id").alias("doc_id"),
            F.col("c.sent_id").alias("sent_id"),
        )
    )
    return nodes, edges
