"""O6 — plot sink: ``show()`` / ``plotToFile()`` parity.

Reference behavior: naruhodo renders the current graph with a
driver-side layout + matplotlib/plotly figure
[PK naruhodo/parser.py ``show()``/``plotToFile()``, utils/misc.py].

Spark mapping (SURVEY.md §2.1 O6): a plot is inherently a bounded-size
artifact, so the ONLY distributed work is selecting the viewer-sized
subgraph — top-k nodes by count (O33 ordering) plus the induced edges
via a broadcast semi-join — and everything after the ``collect()`` of
that ≤k-node subgraph is driver-side by design, exactly like the
reference. No plotting library exists in this environment, so the
render targets are dependency-free:

- :func:`plot_figure` — a plotly-figure-compatible dict (pure JSON:
  one edge trace, one node scatter trace, layout) that ``plotly.io``
  can show unchanged wherever plotly exists;
- :func:`plot_to_file` — a standalone SVG written with string
  templating (zero deps, opens in any browser), the ``plotToFile()``
  analog;
- :func:`layout_fr` — seeded Fruchterman–Reingold force layout in
  numpy (vectorized O(k²) pairwise forces; fine for the ≤10k-node
  plot contract, and deterministic for tests).

At 100 TB the full KSG never reaches the driver: ``top_subgraph`` is a
TopK aggregation (partial per partition, then a single k-row reduce)
and the induced-edge filter is a broadcast hash semi-join against the
k selected node ids — the collect is bounded by ``max_nodes`` no
matter the corpus size.
"""

from __future__ import annotations

import json
import math
from xml.sax.saxutils import escape as _sax_escape

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from naruhodo_spark.export import strip_xml_invalid


def escape(v) -> str:
    # SVG is XML: C0 control chars are forbidden even escaped — same
    # guard as export.write_graphml (shared stripper)
    return _sax_escape(strip_xml_invalid(v))

__all__ = ["top_subgraph", "layout_fr", "plot_figure", "plot_to_file"]

# reference palette: node color by entity type (etype int from O15)
_ETYPE_COLORS = {
    0: "#4c78a8",  # generic noun
    1: "#f58518",  # person
    2: "#54a24b",  # location
    3: "#e45756",  # organization
    4: "#72b7b2",  # temporal
    5: "#b279a2",  # numeric
}
_DEFAULT_COLOR = "#9d9d9d"


def top_subgraph(
    nodes: DataFrame, edges: DataFrame, max_nodes: int = 200,
    max_edges: int | None = None,
) -> tuple[list[dict], list[dict]]:
    """Distributed selection of the viewer subgraph.

    Top ``max_nodes`` nodes by (count desc, node_id asc) — a rank-k
    aggregation Catalyst executes as partial top-k per partition — and
    the edges whose BOTH endpoints survive, via a broadcast semi-join
    (the k-row node set is broadcast; the edge table is never
    collected). Objectless triples resolve to the predicate node, the
    same rule as export.links_json. The induced edge set is worst-case
    O(max_nodes²) on a dense subgraph, so the edge collect is ALSO
    bounded: heaviest ``max_edges`` (default 20·max_nodes) by
    (weight desc, subj, pred, obj) — another rank-k, deterministic.
    """
    if max_edges is None:
        max_edges = 20 * max_nodes
    top = nodes.orderBy(F.col("count").desc(), F.col("node_id")).limit(max_nodes)
    kept = F.broadcast(top.select(F.col("node_id").alias("_kid")))

    from naruhodo_spark.operators.agg import edge_target

    e = edges.withColumn("_dst", edge_target())
    e = (
        e.join(kept.withColumnRenamed("_kid", "subj"), "subj", "left_semi")
        .join(
            kept.withColumnRenamed("_kid", "_dst"), "_dst", "left_semi"
        )
        .orderBy(F.col("weight").desc(), "subj", "pred", "obj")
        .limit(max_edges)
    )

    node_rows = [r.asDict() for r in top.collect()]
    edge_rows = [
        {
            "source": r["subj"],
            "target": r["_dst"],
            "label": r["pred"],
            "weight": r["weight"],
        }
        for r in e.collect()
    ]
    return node_rows, edge_rows


def layout_fr(
    node_ids: list[str],
    edge_pairs: list[tuple[str, str]],
    iterations: int = 60,
    seed: int = 7,
) -> dict[str, tuple[float, float]]:
    """Seeded Fruchterman–Reingold layout, fully vectorized numpy.

    O(k²) repulsion per iteration — acceptable because the plot
    contract caps k at ``max_nodes``; determinism (fixed seed, fixed
    iteration count, no data-dependent branches) is what the tests
    pin.
    """
    n = len(node_ids)
    if n == 0:
        return {}
    idx = {v: i for i, v in enumerate(node_ids)}
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-1.0, 1.0, size=(n, 2))
    if n == 1:
        return {node_ids[0]: (0.0, 0.0)}

    pairs = [(idx[a], idx[b]) for a, b in edge_pairs if a in idx and b in idx]
    ei = np.array([p[0] for p in pairs], dtype=np.int64)
    ej = np.array([p[1] for p in pairs], dtype=np.int64)

    k = math.sqrt(4.0 / n)  # ideal spring length in a [-1,1]^2 canvas
    t = 0.1
    dt = t / (iterations + 1)
    for _ in range(iterations):
        delta = pos[:, None, :] - pos[None, :, :]
        dist = np.maximum(np.linalg.norm(delta, axis=-1), 1e-9)
        # repulsion: k^2/d for every pair
        disp = (delta / dist[..., None]) * (k * k / dist)[..., None]
        disp[np.arange(n), np.arange(n)] = 0.0
        force = disp.sum(axis=1)
        # attraction along edges: d^2/k
        if len(ei):
            dvec = pos[ei] - pos[ej]
            d = np.maximum(np.linalg.norm(dvec, axis=-1), 1e-9)
            pull = (dvec / d[:, None]) * (d * d / k)[:, None]
            np.add.at(force, ei, -pull)
            np.add.at(force, ej, pull)
        flen = np.maximum(np.linalg.norm(force, axis=-1), 1e-9)
        pos += (force / flen[:, None]) * np.minimum(flen, t)[:, None]
        pos = np.clip(pos, -1.0, 1.0)
        t -= dt
    return {v: (float(pos[i, 0]), float(pos[i, 1])) for v, i in idx.items()}


def plot_figure(
    nodes: DataFrame,
    edges: DataFrame,
    max_nodes: int = 200,
    iterations: int = 60,
    seed: int = 7,
) -> dict:
    """``show()`` analog: a plotly-figure-compatible dict.

    ``plotly.io.from_json(json.dumps(fig))`` renders it unchanged where
    plotly is installed; here it is validated structurally (tests) and
    stays a plain dict.
    """
    node_rows, edge_rows = top_subgraph(nodes, edges, max_nodes)
    ids = [r["node_id"] for r in node_rows]
    pos = layout_fr(
        ids, [(e["source"], e["target"]) for e in edge_rows], iterations, seed
    )

    ex, ey = [], []
    for e in edge_rows:
        (x0, y0), (x1, y1) = pos[e["source"]], pos[e["target"]]
        ex += [x0, x1, None]
        ey += [y0, y1, None]
    edge_trace = {
        "type": "scatter",
        "mode": "lines",
        "x": ex,
        "y": ey,
        "hoverinfo": "none",
        "line": {"width": 0.7, "color": "#c0c0c0"},
    }
    node_trace = {
        "type": "scatter",
        "mode": "markers+text",
        "x": [pos[i][0] for i in ids],
        "y": [pos[i][1] for i in ids],
        "text": [r["name"] for r in node_rows],
        "textposition": "top center",
        "marker": {
            "size": [
                6.0 + 4.0 * math.log1p(r["count"]) for r in node_rows
            ],
            "color": [
                _ETYPE_COLORS.get(r.get("etype"), _DEFAULT_COLOR)
                for r in node_rows
            ],
        },
        "customdata": [
            [r["node_id"], r["count"], r.get("etype")] for r in node_rows
        ],
        "hoverinfo": "text",
    }
    return {
        "data": [edge_trace, node_trace],
        "layout": {
            "title": {"text": "knowledge structure graph"},
            "showlegend": False,
            "xaxis": {"visible": False},
            "yaxis": {"visible": False},
            "margin": {"l": 10, "r": 10, "t": 40, "b": 10},
        },
    }


def plot_to_file(
    nodes: DataFrame,
    edges: DataFrame,
    filename: str,
    max_nodes: int = 200,
    iterations: int = 60,
    seed: int = 7,
    size: int = 900,
) -> None:
    """``plotToFile()`` analog: standalone SVG (no plotting library).

    ``filename`` ending in ``.json`` writes the plotly dict instead.
    """
    if filename.endswith(".json"):
        with open(filename, "w") as fh:
            json.dump(plot_figure(nodes, edges, max_nodes, iterations, seed), fh)
        return

    node_rows, edge_rows = top_subgraph(nodes, edges, max_nodes)
    ids = [r["node_id"] for r in node_rows]
    pos = layout_fr(
        ids, [(e["source"], e["target"]) for e in edge_rows], iterations, seed
    )

    def sx(x: float) -> float:
        return (x + 1.0) / 2.0 * (size - 80) + 40

    def sy(y: float) -> float:
        return (1.0 - y) / 2.0 * (size - 80) + 40

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{size}" '
        f'height="{size}" viewBox="0 0 {size} {size}">',
        f'<rect width="{size}" height="{size}" fill="white"/>',
    ]
    for e in edge_rows:
        (x0, y0), (x1, y1) = pos[e["source"]], pos[e["target"]]
        w = 0.5 + 0.5 * math.log1p(e["weight"])
        parts.append(
            f'<line x1="{sx(x0):.1f}" y1="{sy(y0):.1f}" x2="{sx(x1):.1f}" '
            f'y2="{sy(y1):.1f}" stroke="#c0c0c0" stroke-width="{w:.2f}"/>'
        )
        mx, my = (sx(x0) + sx(x1)) / 2, (sy(y0) + sy(y1)) / 2
        parts.append(
            f'<text x="{mx:.1f}" y="{my:.1f}" font-size="8" fill="#808080" '
            f'text-anchor="middle">{escape(e["label"])}</text>'
        )
    for r in node_rows:
        x, y = pos[r["node_id"]]
        rad = 3.0 + 2.0 * math.log1p(r["count"])
        color = _ETYPE_COLORS.get(r.get("etype"), _DEFAULT_COLOR)
        parts.append(
            f'<circle cx="{sx(x):.1f}" cy="{sy(y):.1f}" r="{rad:.1f}" '
            f'fill="{color}" stroke="#333" stroke-width="0.5"/>'
        )
        parts.append(
            f'<text x="{sx(x):.1f}" y="{sy(y) - rad - 3:.1f}" font-size="10" '
            f'fill="#222" text-anchor="middle">{escape(str(r["name"]))}</text>'
        )
    parts.append("</svg>")
    with open(filename, "w") as fh:
        fh.write("\n".join(parts))
