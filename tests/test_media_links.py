"""Media–entity co-occurrence edges (operators/media.py): exact
adjacency semantics on a hand-built interleaved document, plus the
zero-shuffle prefix-count arithmetic vs a driver recomputation."""

from pyspark.sql import functions as F

from naruhodo_spark import schemas as S
from naruhodo_spark.operators import media as M
from naruhodo_spark.pipeline import build_kg


def _doc(doc_id, spans):
    return (
        doc_id,
        [
            {"kind": k, "text": t, "media_ref": r, "offset": o}
            for (k, t, r, o) in spans
        ],
    )


def _docs(spark, rows):
    return spark.createDataFrame(rows, schema=S.DOCUMENTS_SPANS)


def test_media_adjacency_exact(spark):
    """media span between text spans 0 and 1 links to BOTH; leading
    media links only forward; trailing media only backward; offsets out
    of storage order are honored (array_sort)."""
    docs = _docs(
        spark,
        [
            _doc(
                "d1",
                [
                    ("media", "", "img://lead.png", 0),
                    ("text", "alice visited bob.", "", 1),
                    ("media", "", "img://mid.png", 2),
                    ("text", "carol praised dave.", "", 3),
                    ("media", "", "img://tail.png", 4),
                ],
            ),
            # storage order scrambled; offset order is text(0), media(1), text(2)
            _doc(
                "d2",
                [
                    ("text", "erin moved.", "", 2),
                    ("media", "", "img://x.png", 1),
                    ("text", "frank waved.", "", 0),
                ],
            ),
        ],
    )
    adj = {
        (r["doc_id"], r["media_ref"], r["text_ordinal"])
        for r in M.media_adjacency(docs).collect()
    }
    assert adj == {
        ("d1", "img://lead.png", 0),
        ("d1", "img://mid.png", 0),
        ("d1", "img://mid.png", 1),
        ("d1", "img://tail.png", 1),
        # d1 tail media: tbefore=2 → ordinals 1 and 2; 2 has no text span,
        # which the mention join later drops — adjacency keeps it
        ("d1", "img://tail.png", 2),
        ("d2", "img://x.png", 0),
        ("d2", "img://x.png", 1),
    }


def test_media_entity_edges_end_to_end(spark):
    docs = _docs(
        spark,
        [
            _doc(
                "d1",
                [
                    ("text", "alice visited bob.", "", 0),
                    ("media", "", "img://a.png", 1),
                    ("text", "carol praised dave.", "", 2),
                ],
            )
        ],
    )
    kg = build_kg(docs)
    nodes, edges = M.media_entity_edges(docs, kg["triples"])
    e = {(r["subj"], r["pred"], r["obj"]) for r in edges.collect()}
    # entities from BOTH adjacent text spans link to the media node
    assert e == {
        (s, "appears_with", "media:img://a.png")
        for s in ["alice", "bob", "carol", "dave"]
    }
    n = nodes.collect()
    assert len(n) == 1
    assert n[0]["node_id"] == "media:img://a.png"
    assert n[0]["etype"] == M.ETYPE_MEDIA
    assert n[0]["count"] == 4


def test_media_edges_aggregate_weight_across_docs(spark):
    """Same (entity, media_ref) pair in two docs → weight 2: the final
    aggregation is global, like every KSG edge weight."""
    span_set = [
        ("text", "alice visited bob.", "", 0),
        ("media", "", "img://a.png", 1),
    ]
    docs = _docs(spark, [_doc("d1", span_set), _doc("d2", span_set)])
    kg = build_kg(docs)
    _, edges = M.media_entity_edges(docs, kg["triples"])
    w = {r["subj"]: r["weight"] for r in edges.collect()}
    assert w == {"alice": 2, "bob": 2}


def test_media_edges_resolve_pronouns(spark):
    """Pronoun mentions reach the media edges as their RESOLVED
    antecedent surface — never the raw pronoun — because coref runs
    upstream of triple_mentions."""
    docs = _docs(
        spark,
        [
            _doc(
                "d1",
                [
                    ("text", "alice visited bob. she praised carol.", "", 0),
                    ("media", "", "img://a.png", 1),
                ],
            )
        ],
    )
    kg = build_kg(docs)
    _, edges = M.media_entity_edges(docs, kg["triples"])
    subs = {r["subj"] for r in edges.collect()}
    assert "she" not in subs
    # resolved antecedent (bob, per nearest-preceding-person) is present
    assert {"alice", "bob", "carol"} <= subs


def test_media_plan_has_no_window_exchange(spark):
    """The adjacency arithmetic is in-array (HOFs) — the plan before the
    mention join must contain no Window operator and no Exchange."""
    docs = _docs(
        spark,
        [_doc("d1", [("text", "alice visited bob.", "", 0),
                     ("media", "", "img://a.png", 1)])],
    )
    plan = M.media_adjacency(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Exchange" not in plan.replace("BroadcastExchange", "")


def test_media_adjacency_randomized_vs_python(spark):
    """200 random interleaved docs, one Spark call, exact set equality
    with a pure-Python recomputation of the adjacency rule."""
    import numpy as np

    rng = np.random.default_rng(42)
    rows, want = [], set()
    for d in range(200):
        doc_id = f"r{d:03d}"
        n = int(rng.integers(1, 9))
        kinds = ["media" if rng.random() < 0.4 else "text" for _ in range(n)]
        offsets = rng.permutation(100)[:n].tolist()  # scrambled storage order
        spans = [
            (k, "alice runs." if k == "text" else "",
             f"img://{d}/{j}.png" if k == "media" else "", int(offsets[j]))
            for j, k in enumerate(kinds)
        ]
        rows.append(_doc(doc_id, spans))
        # python reference: offset order, prefix text counts
        order = sorted(range(n), key=lambda j: offsets[j])
        tcount = 0
        for j in order:
            if kinds[j] == "text":
                tcount += 1
            else:
                for o in (tcount - 1, tcount):
                    if o >= 0:
                        want.add((doc_id, f"img://{d}/{j}.png", o))
    got = {
        (r["doc_id"], r["media_ref"], r["text_ordinal"])
        for r in M.media_adjacency(_docs(spark, rows)).collect()
    }
    assert got == want


def test_out_of_order_spans_pipeline_consistency(spark):
    """Storage order must not matter anywhere: a doc whose spans array
    is stored scrambled produces the SAME triples (with offset-ordered
    sent_ids) as the sorted twin, through BOTH the fused and relational
    plans, and media edges attach to the true offset-neighbors."""
    spans_sorted = [
        ("text", "alice visited bob.", "", 0),
        ("media", "", "img://a.png", 1),
        ("text", "carol praised dave.", "", 2),
    ]
    scrambled = [spans_sorted[2], spans_sorted[0], spans_sorted[1]]
    d_sorted = _docs(spark, [_doc("d1", spans_sorted)])
    d_scram = _docs(spark, [_doc("d1", scrambled)])

    for plan in ("fused", "relational"):
        a = {
            (r["sent_id"], r["subj"], r["pred"], r["obj"])
            for r in build_kg(d_sorted, triple_plan=plan)["triples"].collect()
        }
        b = {
            (r["sent_id"], r["subj"], r["pred"], r["obj"])
            for r in build_kg(d_scram, triple_plan=plan)["triples"].collect()
        }
        assert a == b, plan
        assert {s for (s, *_) in a} == {0, 1000}  # offset-ordered ordinals

    kg = build_kg(d_scram)
    _, edges = M.media_entity_edges(d_scram, kg["triples"])
    assert {r["subj"] for r in edges.collect()} == {
        "alice", "bob", "carol", "dave"
    }
