"""O4/D7 — viewer-compatible graph export.

Reference behavior: ``exportObj()`` / ``exportJSON(filename)`` emit a
D3-style dict ``{"nodes":[{id,name,count,...}], "links":[{source,target,
label,weight,...}]}`` consumed by the companion viewer
[PK naruhodo/utils/misc.py].

Spark mapping: stable-ordered JSON via ``to_json(struct(...))`` — a
distributed JSONL sink for big graphs, plus a driver-side dict for
viewer-sized subgraphs (top-k nodes by count, O33 ordering).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# XML 1.0 forbids most C0 control characters even when escaped — shared
# by the GraphML and SVG sinks (corpus bytes like \x01 survive
# normalization, which only strips Java \s)
import re as _re

_XML_BAD = _re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f]")


def strip_xml_invalid(v) -> str:
    return _XML_BAD.sub("", str(v))


def nodes_json(nodes: DataFrame) -> DataFrame:
    return nodes.orderBy("node_id").select(
        F.to_json(
            F.struct(
                F.col("node_id").alias("id"),
                F.col("name"),
                F.col("rep"),
                F.col("count"),
                F.col("etype").alias("type"),
                F.col("pro"),
            )
        ).alias("json")
    )


def links_json(edges: DataFrame) -> DataFrame:
    # objectless triples target the PREDICATE node via the shared
    # node-identity contract (operators/agg.edge_target), so every link
    # resolves to a real node id
    from naruhodo_spark.operators.agg import edge_target

    target = edge_target()
    return edges.orderBy("subj", "pred", "obj").select(
        F.to_json(
            F.struct(
                F.col("subj").alias("source"),
                target.alias("target"),
                F.col("pred").alias("label"),
                F.col("weight"),
                F.col("negative"),
                F.col("passive"),
            )
        ).alias("json")
    )


def write_viewer_jsonl(nodes: DataFrame, edges: DataFrame, out_dir: str) -> None:
    """Distributed sink: one JSONL dir for nodes, one for links."""
    nodes_json(nodes).write.mode("overwrite").text(f"{out_dir}/nodes")
    links_json(edges).write.mode("overwrite").text(f"{out_dir}/links")


def export_obj(nodes: DataFrame, edges: DataFrame, max_nodes: int = 10_000,
               max_links: int | None = None) -> dict:
    """Driver-side D3 dict for viewer-sized subgraphs (reference
    ``exportObj`` analog): top-`max_nodes` nodes by count, induced links.
    The induced-subgraph filter runs IN SPARK (semi-joins against the
    kept node set) so only viewer-sized data ever reaches the driver.

    The induced link set is ALSO bounded (default 20·max_nodes, heaviest
    first, deterministic order) — a dense hub neighborhood induces up to
    max_nodes² links, which would otherwise collect unbounded onto the
    driver; same rank-k rule as plot.top_subgraph."""
    if max_links is None:
        max_links = 20 * max_nodes
    top = (nodes.orderBy(F.desc("count"), "node_id").limit(max_nodes)).persist()
    node_rows = [json.loads(r["json"]) for r in nodes_json(top).collect()]
    keep_ids = top.select(F.col("node_id"))
    from naruhodo_spark.operators.agg import edge_target

    target = edge_target()
    induced = (
        edges.withColumn("_target", target)
        .join(
            F.broadcast(keep_ids.withColumnRenamed("node_id", "subj")), "subj"
        )
        .join(
            F.broadcast(keep_ids.withColumnRenamed("node_id", "_target")),
            "_target",
        )
        .drop("_target")
        .orderBy(F.col("weight").desc(), "subj", "pred", "obj")
        .limit(max_links)
    )
    link_rows = [json.loads(r["json"]) for r in links_json(induced).collect()]
    top.unpersist()
    return {"nodes": node_rows, "links": link_rows}


def export_json(nodes: DataFrame, edges: DataFrame, filename: str,
                max_nodes: int = 10_000) -> None:
    """Reference ``exportJSON`` analog (driver-side file)."""
    with open(filename, "w") as f:
        json.dump(export_obj(nodes, edges, max_nodes), f, ensure_ascii=False)


def write_graphml(nodes: DataFrame, edges: DataFrame, filename: str,
                  max_nodes: int = 10_000) -> None:
    """GraphML sink for Gephi/yEd/igraph interop — same bounded-subgraph
    contract as export_obj (top-`max_nodes` nodes, induced edges
    selected IN SPARK; only viewer-sized data reaches the driver).
    Attributes: node count/type/rep, edge label/weight/negative/passive.
    """
    from xml.sax.saxutils import escape as _esc
    from xml.sax.saxutils import quoteattr as _qa

    def escape(v):
        return _esc(strip_xml_invalid(v))

    def quoteattr(v):
        return _qa(strip_xml_invalid(v))

    obj = export_obj(nodes, edges, max_nodes)
    lines = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
        '<key id="d0" for="node" attr.name="count" attr.type="long"/>',
        '<key id="d1" for="node" attr.name="type" attr.type="int"/>',
        '<key id="d2" for="node" attr.name="rep" attr.type="string"/>',
        '<key id="d3" for="edge" attr.name="label" attr.type="string"/>',
        '<key id="d4" for="edge" attr.name="weight" attr.type="long"/>',
        '<key id="d5" for="edge" attr.name="negative" attr.type="boolean"/>',
        '<key id="d6" for="edge" attr.name="passive" attr.type="boolean"/>',
        '<graph id="ksg" edgedefault="directed">',
    ]
    for n in obj["nodes"]:
        lines.append(f"<node id={quoteattr(n['id'])}>")
        lines.append(f'<data key="d0">{n["count"]}</data>')
        lines.append(f'<data key="d1">{n["type"]}</data>')
        lines.append(f'<data key="d2">{escape(str(n["rep"]))}</data>')
        lines.append("</node>")
    for i, e in enumerate(obj["links"]):
        lines.append(
            f"<edge id=\"e{i}\" source={quoteattr(e['source'])}"
            f" target={quoteattr(e['target'])}>"
        )
        lines.append(f'<data key="d3">{escape(str(e["label"]))}</data>')
        lines.append(f'<data key="d4">{e["weight"]}</data>')
        lines.append(f'<data key="d5">{str(bool(e["negative"])).lower()}</data>')
        lines.append(f'<data key="d6">{str(bool(e["passive"])).lower()}</data>')
        lines.append("</edge>")
    lines += ["</graph>", "</graphml>"]
    with open(filename, "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
