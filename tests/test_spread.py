"""Label spreading (graphstats.spread_labels): exact numpy mirror of
the sparse anchored iteration, planted-cluster typing, soft seeds,
top-k/pruning contracts."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from naruhodo_spark.operators.graphstats import spread_labels

# two clusters bridged once; one seed per cluster
EDGES = [
    ("x1", "r", "x2", 1.0), ("x2", "r", "x3", 1.0), ("x1", "r", "x3", 1.0),
    ("y1", "r", "y2", 1.0), ("y2", "r", "y3", 1.0), ("y1", "r", "y3", 1.0),
    ("x3", "r", "y1", 1.0),
]
SEEDS = [("x1", "PERSON"), ("y2", "PLACE")]


def _edges(spark, rows=EDGES):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, weight double"
    )


def _np_mirror(edge_rows, seed_rows, rounds, alpha, min_score):
    und = {}
    for s, _, o, w in edge_rows:
        if s != o:
            und[tuple(sorted((s, o)))] = max(
                und.get(tuple(sorted((s, o))), 0.0), w
            )
    nbrs = {}
    for (a, b), w in und.items():
        nbrs.setdefault(a, {})[b] = w
        nbrs.setdefault(b, {})[a] = w
    wtot = {n: sum(ws.values()) for n, ws in nbrs.items()}
    seed0 = {}
    for n, lab in seed_rows:
        seed0[(n, lab)] = max(seed0.get((n, lab), 0.0), 1.0)
    state = dict(seed0)
    for _ in range(rounds):
        nxt = {}
        for (n, lab), sc in state.items():
            for m, w in nbrs.get(n, {}).items():
                key = (m, lab)
                nxt[key] = nxt.get(key, 0.0) + alpha * (w / wtot[n]) * sc
        for (n, lab), sc in seed0.items():
            nxt[(n, lab)] = nxt.get((n, lab), 0.0) + (1 - alpha) * sc
        state = {k: v for k, v in nxt.items() if v >= min_score}
    return state


def test_matches_numpy_mirror(spark):
    got = {
        (r["node"], r["label"]): r["score"]
        for r in spread_labels(
            _edges(spark),
            spark.createDataFrame(SEEDS, "node string, label string"),
            rounds=6, alpha=0.8, top_k=10, min_score=1e-4,
        ).collect()
    }
    exp = _np_mirror(EDGES, SEEDS, 6, 0.8, 1e-4)
    assert set(got) == set(exp)
    for k, v in exp.items():
        assert got[k] == pytest.approx(v, abs=1e-5), k
    assert len(got) > len(SEEDS)  # labels actually spread


def test_clusters_take_their_seed_type(spark):
    out = spread_labels(
        _edges(spark),
        spark.createDataFrame(SEEDS, "node string, label string"),
        rounds=10, top_k=1,
    )
    got = {r["node"]: r["label"] for r in out.collect()}
    for n in ("x1", "x2", "x3"):
        assert got[n] == "PERSON"
    for n in ("y1", "y2", "y3"):
        assert got[n] == "PLACE"


def test_soft_seed_scores_respected(spark):
    seeds = spark.createDataFrame(
        [("x1", "PERSON", 1.0), ("x1", "ORG", 0.1)],
        "node string, label string, score double",
    )
    out = spread_labels(_edges(spark), seeds, rounds=5, top_k=2)
    x2 = {r["label"]: r["score"] for r in out.collect() if r["node"] == "x2"}
    assert x2["PERSON"] > x2.get("ORG", 0.0)


def test_top_k_and_alpha_validation(spark):
    seeds = spark.createDataFrame(SEEDS, "node string, label string")
    one = spread_labels(_edges(spark), seeds, rounds=6, top_k=1)
    per_node = (
        one.groupBy("node").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert all(r["n"] == 1 for r in per_node)
    with pytest.raises(ValueError, match="alpha"):
        spread_labels(_edges(spark), seeds, alpha=1.0)
