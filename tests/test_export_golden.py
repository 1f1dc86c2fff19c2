"""Viewer-shaped export golden (VERDICT r03 next-round #9): the D3
``{nodes, links}`` export of a FIXED fixture graph, byte-stable against
schema drift (attribute renames, field reorders, type changes all fail
here first). kg_export_surface checks FK resolution; this pins the
exact wire shape.

Regenerate after an INTENTIONAL schema change with:
    python -m tests.test_export_golden --regen
then review the diff like any golden."""

import json
import os

from naruhodo_spark import synth
from naruhodo_spark.export import export_obj
from naruhodo_spark.pipeline import build_kg

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "viewer_export.synth40.json")


def _fixture_export(spark) -> str:
    kg = build_kg(
        synth.synth_documents(spark, 40),
        aliases=synth.alias_dictionary(spark),
    )
    obj = export_obj(kg["ksg_nodes"], kg["ksg_edges"], max_nodes=50)
    return json.dumps(obj, ensure_ascii=False, separators=(",", ":"),
                      indent=None) + "\n"


def test_viewer_export_matches_golden(spark):
    got = _fixture_export(spark)
    with open(GOLDEN, encoding="utf-8") as f:
        want = f.read()
    assert got == want, (
        "viewer export drifted from the golden wire shape — if the "
        "change is intentional, regenerate with "
        "`python -m tests.test_export_golden --regen` and review"
    )


def test_viewer_export_shape_invariants(spark):
    obj = json.loads(_fixture_export(spark))
    assert set(obj) == {"nodes", "links"}
    assert len(obj["nodes"]) > 0 and len(obj["links"]) > 0
    node_ids = {n["id"] for n in obj["nodes"]}
    for n in obj["nodes"]:
        assert set(n) == {"id", "name", "rep", "count", "type", "pro"}
    for l in obj["links"]:
        assert set(l) == {"source", "target", "label", "weight",
                          "negative", "passive"}
        # every link endpoint resolves inside the exported node set
        assert l["source"] in node_ids and l["target"] in node_ids


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        from naruhodo_spark.session import get_spark

        spark = get_spark(master="local[8]", shuffle_partitions=8)
        with open(GOLDEN, "w", encoding="utf-8") as f:
            f.write(_fixture_export(spark))
        print(f"regenerated {GOLDEN}")
        spark.stop()
