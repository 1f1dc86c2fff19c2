"""End-to-end pipeline tests on the synthesized spans corpus."""

import pyspark.sql.functions as F
import pytest

from naruhodo_spark import lang, synth
from naruhodo_spark.operators import normalize
from naruhodo_spark.pipeline import build_kg


@pytest.fixture(scope="module")
def docs(spark):
    return synth.synth_documents(spark, 60).persist()


@pytest.fixture(scope="module")
def kg(spark, docs):
    aliases = synth.alias_dictionary(spark)
    return build_kg(docs, aliases=aliases)


def test_docs_shape(docs):
    rows = docs.collect()
    assert len(rows) == 60
    kinds = {s["kind"] for r in rows for s in r["spans"]}
    assert kinds <= {"text", "media"}
    # offsets strictly increasing per doc
    for r in rows:
        offs = [s["offset"] for s in r["spans"]]
        assert offs == sorted(offs) and len(set(offs)) == len(offs)


def test_generator_is_partitioning_independent(spark):
    a = synth.synth_documents(spark, 40, num_partitions=1).collect()
    b = synth.synth_documents(spark, 40, num_partitions=13).collect()
    ka = {r["doc_id"]: r["spans"] for r in a}
    kb = {r["doc_id"]: r["spans"] for r in b}
    assert ka == kb


def test_sentences_and_chunks(kg):
    assert kg["sentences"].count() > 0
    chunks = kg["chunks"]
    assert chunks.where(F.col("ctype") == 1).count() > 0  # verbs exist
    # parent is either -1 or a valid chunk id in the same sentence
    bad = (
        chunks.alias("c")
        .join(
            chunks.alias("p"),
            on=[
                F.col("c.doc_id") == F.col("p.doc_id"),
                F.col("c.sent_id") == F.col("p.sent_id"),
                F.col("c.parent") == F.col("p.chunk_id"),
            ],
            how="left_anti",
        )
        .where(F.col("c.parent") != -1)
    )
    assert bad.count() == 0


def test_triples_nonempty_and_resolved(kg):
    t = kg["triples_linked"]
    n = t.count()
    assert n > 0
    # pronoun subjects must be resolved away when an antecedent exists:
    # resolved surfaces are entity names, so no bare pronouns should
    # survive as canonical subjects with weight dominated by pronouns
    prons = t.where(F.col("subj").isin("he", "she", "they")).count()
    assert prons < n * 0.2


def test_ksg_edges_weights(kg):
    e = kg["ksg_edges"]
    assert e.count() > 0
    assert e.agg(F.min("weight")).first()[0] >= 1
    assert set(e.columns) == {"subj", "pred", "obj", "weight", "negative", "passive"}


def test_alias_canonicalization_multi_hop(spark, kg):
    # alias chains alice → alice@1 → alice@2 form one component whose
    # min-label is 'alice' → canonical subjects never end in '@1'/'@2'
    e = kg["ksg_edges"]
    assert e.where(F.col("subj").rlike("@[12]$")).count() == 0


def test_span_sequence_invariant(docs):
    """[B BASELINE.json:15] exact span-sequence equality per document:
    the engine never mutates the spans column; the invariant surface
    must reproduce (kind, text, media_ref) in original order."""
    seq = normalize.span_sequences(docs)
    orig = {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"]) for s in r["spans"]]
            for r in docs.collect()}
    out = {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"]) for s in r["span_seq"]]
           for r in seq.collect()}
    assert orig == out


def test_triple_plans_agree(spark, docs):
    """Relational join+agg plan (O12a) ≡ grouped-pandas plan (O12b)."""
    prof = lang.get_profile("en")
    a = build_kg(docs, prof=prof, triple_plan="relational")["triples"]
    b = build_kg(docs, prof=prof, triple_plan="pandas")["triples"]
    cols = ["doc_id", "sent_id", "pred_id", "pred", "subj", "obj",
            "negative", "passive", "tense"]
    assert a.select(cols).exceptAll(b.select(cols)).isEmpty()
    assert b.select(cols).exceptAll(a.select(cols)).isEmpty()


def test_fused_plan_agrees(spark, docs):
    """Production fused mapInPandas plan ≡ the relational join+window plan
    across the FULL post-coref triple table (resolution + carryover
    included) — the containment test for the fast path."""
    from naruhodo_spark import lang
    from naruhodo_spark.operators.fused import extract_triples_fused
    from naruhodo_spark.pipeline import extract_document_triples

    prof = lang.get_profile("en")
    fused = extract_triples_fused(docs, prof)
    rel = extract_document_triples(docs, prof, triple_plan="relational")["triples"]
    cols = ["doc_id", "sent_id", "pred_id", "pred", "subj", "obj",
            "negative", "passive", "tense", "subj_ne", "obj_ne",
            "subj_pro", "obj_pro"]
    a, b = fused.select(cols), rel.select(cols)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_inmap_linking_equals_join_linking(spark, docs):
    """Fused in-map broadcast-dict linking (O19+O20 inside the map pass)
    ≡ relational broadcast-join linking + CC label application."""
    from naruhodo_spark import lang, synth
    from naruhodo_spark.pipeline import build_kg

    aliases = synth.alias_dictionary(spark)
    prof = lang.get_profile("en")
    a = build_kg(docs, prof=prof, aliases=aliases, triple_plan="fused")[
        "triples_linked"
    ]
    b = build_kg(docs, prof=prof, aliases=aliases, triple_plan="relational")[
        "triples_linked"
    ]
    cols = ["doc_id", "sent_id", "pred_id", "pred", "subj_canon", "obj_canon",
            "subj_ne", "obj_ne", "negative", "passive"]
    a, b = a.select(cols), b.select(cols)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_cc_driver_fastpath_equals_distributed(spark):
    from naruhodo_spark import synth
    from naruhodo_spark.operators.canon import alias_cc_labels

    # include an identity row (self-loop): both paths must still agree
    aliases = synth.alias_dictionary(spark).unionByName(
        spark.createDataFrame(
            [("tokyo", "tokyo", 2)],
            schema="alias string, canonical_id string, etype int",
        )
    )
    fast = alias_cc_labels(aliases)
    dist = alias_cc_labels(aliases, force_distributed=True)
    assert fast.exceptAll(dist).isEmpty() and dist.exceptAll(fast).isEmpty()


def test_triples_stage_identical_with_and_without_aliases(spark, docs):
    """The pre-link `triples` stage must not depend on the alias
    dictionary (alias etypes belong to triples_linked only)."""
    from naruhodo_spark import synth
    from naruhodo_spark.pipeline import build_kg

    cols = ["doc_id", "sent_id", "pred_id", "subj", "obj", "subj_ne", "obj_ne"]
    a = build_kg(docs)["triples"].select(cols)
    b = build_kg(docs, aliases=synth.alias_dictionary(spark))["triples"].select(cols)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_embedding_near_dups_no_topk_truncation(spark):
    """A dense duplicate cluster: ALL pairs above threshold must emerge
    (regression: a top-k cap silently dropped pairs)."""
    from naruhodo_spark.ops.similarity import embedding_near_dups

    n = 8
    rows = [(i, [1.0, 0.0, 0.0, float(i) * 1e-4], 0) for i in range(n)]
    emb = spark.createDataFrame(
        rows, schema="vec_id long, embedding array<float>, label int"
    )
    pairs = embedding_near_dups(emb, threshold=0.99)
    assert pairs.count() == n * (n - 1) // 2


def test_inclusive_merge(spark):
    """Reference `inclusive` substring merging: names containing each
    other land in one component with the shortest-lexicographic label."""
    from naruhodo_spark.operators.canon import inclusive_merge_labels

    names = spark.createDataFrame(
        [("tokyo",), ("tokyo tower",), ("tokyo tower shop",), ("paris",),
         ("paris hall",), ("kyoto",)],
        schema="name string",
    )
    labels = {r["node"]: r["label"] for r in inclusive_merge_labels(names).collect()}
    assert labels["tokyo tower shop"] == "tokyo"
    assert labels["tokyo tower"] == "tokyo"
    assert labels["paris hall"] == "paris"
    assert "kyoto" not in labels  # nothing to merge


def test_join_asof(spark):
    """As-of join semantics: latest right at-or-before each left ts per
    key; equal-ts right rows ARE visible; no prior right → nulls; all
    payload columns come from the same matched row."""
    from naruhodo_spark.ops.asof import join_asof

    left = spark.createDataFrame(
        [("u1", 100, "a"), ("u1", 205, "b"), ("u2", 50, "c"), ("u3", 10, "d")],
        "user_id string, ts long, tag string",
    )
    right = spark.createDataFrame(
        [("u1", 100, 1.0, "x"), ("u1", 200, 2.0, "y"), ("u2", 60, 3.0, "z")],
        "user_id string, ts long, v double, lbl string",
    )
    out = {
        (r["user_id"], r["ts"]): (r["asof_ts"], r["asof_v"], r["asof_lbl"])
        for r in join_asof(left, right).collect()
    }
    assert out[("u1", 100)] == (100, 1.0, "x")   # equal ts matches
    assert out[("u1", 205)] == (200, 2.0, "y")   # latest prior
    assert out[("u2", 50)] == (None, None, None)  # right is later only
    assert out[("u3", 10)] == (None, None, None)  # key absent from right


def test_join_asof_matches_pandas_merge_asof(spark):
    """Randomized equivalence against an independent reference
    implementation: pandas merge_asof(direction='backward',
    allow_exact_matches=True) computes exactly our as-of semantics."""
    import random

    import pandas as pd

    from naruhodo_spark.ops.asof import join_asof

    rng = random.Random(7)
    for trial in range(4):
        lrows = [
            (f"u{rng.randint(0, 4)}", rng.randint(0, 60), i)
            for i in range(rng.randint(1, 40))
        ]
        rpairs = {(f"u{rng.randint(0, 5)}", rng.randint(0, 60)) for _ in range(30)}
        rrows = [(k, t, rng.random()) for (k, t) in rpairs]  # unique (key, ts)
        left = spark.createDataFrame(lrows, "user_id string, ts long, row_id long")
        right = spark.createDataFrame(rrows, "user_id string, ts long, v double")
        got = {
            r["row_id"]: (r["asof_ts"], r["asof_v"])
            for r in join_asof(left, right).collect()
        }
        lp = pd.DataFrame(lrows, columns=["user_id", "ts", "row_id"]).sort_values("ts")
        rp = pd.DataFrame(rrows, columns=["user_id", "ts", "v"]).sort_values("ts")
        exp = pd.merge_asof(
            lp, rp, on="ts", by="user_id", direction="backward",
            allow_exact_matches=True, suffixes=("", "_r"),
        )
        for _, row in exp.iterrows():
            want_v = None if pd.isna(row["v"]) else row["v"]
            g_ts, g_v = got[row["row_id"]]
            assert g_v == want_v, (trial, row["row_id"], g_v, want_v)
            # no match ⇒ every payload field null, including the ts
            assert (g_ts is None) == (want_v is None)


def test_prepare_corpus(spark):
    """Composed corpus prep: dedup keeps one rep per near-dup group with
    the group multiplicity, quality/repetition gates drop junk, every
    survivor carries a split, and no near-dup pair straddles splits."""
    from naruhodo_spark.ops.prepare import prepare_corpus

    base = (
        "the quick brown fox jumps over the lazy dog near the old river "
        "bank today with mail bob@x.io attached"
    )
    rows = [
        (1, base), (2, base),                      # exact dups
        (3, base + " now"),                        # near dup of the group
        # ("today"→"tonight" has jaccard 0.7 yet deterministically misses
        # all 4 LSH bands for THIS content — banding recall is
        # probabilistic in general, fixed per text; the appended-word
        # variant (j≈0.9) bands reliably)
        (10, "spam spam spam spam spam spam spam spam spam spam"),  # repetition
        (11, "too short"),                         # length gate
        (20, "a perfectly ordinary unique document about spark plans "
             "and shuffle boundaries for testing"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in prepare_corpus(docs).collect()}
    assert set(out) == {1, 20}                     # reps that pass gates
    assert out[1]["group_size"] == 3 and out[20]["group_size"] == 1
    assert "<EMAIL>" in out[1]["text_redacted"]
    assert out[1]["split"] in ("train", "val", "test")


def test_redact_pii(spark):
    from naruhodo_spark.ops.textstats import redact_pii

    clean = "clean text with no pii at all"
    docs = spark.createDataFrame(
        [
            (1, "contact bob.smith+x@acme-corp.co.uk or https://a.io/p?q=1 now"),
            (2, "id 123456789012 and id 98765432109876 ok"),
            (3, clean),
            (4, "see https://x.io/123456789012\r\nnext line"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert out[1]["text_redacted"] == "contact <EMAIL> or <URL> now"
    assert out[1]["n_emails"] == 1 and out[1]["n_urls"] == 1
    assert out[2]["text_redacted"] == "id <NUM> and id <NUM> ok"
    assert out[2]["n_nums"] == 2
    assert out[3]["text_redacted"] == clean  # no-PII doc round-trips
    assert (out[3]["n_emails"], out[3]["n_urls"], out[3]["n_nums"]) == (0, 0, 0)
    # \r never leaks into <URL>, and digits swallowed by the URL mask are
    # NOT double-counted as <NUM> (counts == placeholders emitted)
    assert out[4]["text_redacted"] == "see <URL>\r\nnext line"
    assert (out[4]["n_urls"], out[4]["n_nums"]) == (1, 0)


def test_chunk_windows_invariants(spark):
    """Context-window chunking: full coverage (concatenating chunks minus
    overlaps reconstructs the doc), fixed overlap between consecutive
    chunks, tail never orphaned, short docs → one chunk."""
    from naruhodo_spark.ops.textstats import chunk_windows

    words = " ".join(f"w{i:03d}" for i in range(150))
    docs = spark.createDataFrame(
        [(1, words), (2, "tiny doc"), (3, "")], "doc_id long, text string"
    )
    out = chunk_windows(docs, max_tokens=64, overlap=8)
    rows = sorted(
        ((r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_tokens"])
         for r in out.collect())
    )
    long_chunks = [r for r in rows if r[0] == 1]
    # starts at 1, 57, 113 → 3 chunks of 64, 64, 38 tokens
    assert [r[3] for r in long_chunks] == [64, 64, 38]
    toks = [c[2].split(" ") for c in long_chunks]
    assert toks[0][56:] == toks[1][:8]          # fixed 8-token overlap
    assert toks[1][56:] == toks[2][:8]
    # reconstruction: chunk 0 + tails of chunks 1..n == original
    rebuilt = toks[0] + [t for c in toks[1:] for t in c[8:]]
    assert rebuilt == words.split(" ")
    assert [r[2] for r in rows if r[0] == 2] == ["tiny doc"]
    assert len([r for r in rows if r[0] == 3]) == 1  # empty doc → 1 chunk

    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_windows(docs, max_tokens=8, overlap=8)


def test_ja_profile_semantics(spark):
    """JA particle profile, semantically pinned (not rows-only): は/が
    mark subjects, を marks objects, へ stays oblique (never an object),
    ない negates, れた marks passive+past — mirroring the reference's
    particle dicts [PK naruhodo/utils/dicts.py] on pre-segmented text."""
    from naruhodo_spark import lang as L
    from naruhodo_spark import schemas as S
    from naruhodo_spark.pipeline import build_kg

    sents = [
        "彼 は 本 を 読まない 。",      # negation ない
        "手紙 が 太郎 に 渡された 。",  # passive れた
        "彼女 は 学校 へ 行った 。",    # oblique へ
    ]
    rows = [
        (f"ja-{i}", [{"kind": "text", "text": t, "media_ref": "", "offset": 0}])
        for i, t in enumerate(sents)
    ]
    docs = spark.createDataFrame(rows, schema=S.DOCUMENTS_SPANS)
    out = {
        r["doc_id"]: r
        for r in build_kg(docs, prof=L.get_profile("ja"))["triples"].collect()
    }
    neg = out["ja-0"]
    assert (neg["subj"], neg["obj"], neg["pred"]) == ("彼", "本", "読まない")
    assert neg["negative"] and not neg["passive"] and neg["tense"] == "present"
    assert neg["subj_pro"] == S.PRO_PERSONAL
    psv = out["ja-1"]
    assert (psv["subj"], psv["pred"]) == ("手紙", "渡された")
    assert psv["passive"] and psv["tense"] == "past" and not psv["negative"]
    obl = out["ja-2"]
    assert (obl["subj"], obl["pred"]) == ("彼女", "行った")
    assert obl["obj"] is None  # へ-marked 学校 must NOT become the object


def test_near_dup_groups_tiered(spark):
    """Tiered dedup (exact collapse → LSH over reps → CC closure) labels
    every doc, merges exact dups with near-dup chains transitively, and
    is semantically identical to running LSH over ALL docs (the tier is
    a plan guard against d²-per-bucket exact-dup clusters, not a
    semantics change)."""
    from naruhodo_spark.operators.canon import connected_components
    from naruhodo_spark.ops.dedup import minhash_lsh_pairs, near_dup_groups
    from pyspark.sql import functions as F

    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    near = base.replace("today", "tonight")
    rows = [
        (1, base), (2, base), (3, base),      # exact-dup cluster
        (4, near),                            # near-dup of the cluster
        (5, "completely different words about spark catalyst plans and shuffles"),
        (6, "completely different words about spark catalyst plans and shuffles"),
        (7, "short doc"),                     # < k tokens: no shingles
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    groups = {r["doc_id"]: r["group_id"] for r in near_dup_groups(docs).collect()}
    assert groups == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7}

    # naive twin: LSH over every doc, same closure
    from naruhodo_spark.operators.canon import pad_numeric_id as pad

    pairs = minhash_lsh_pairs(docs)
    e = docs.select(pad("doc_id").alias("src"), pad("doc_id").alias("dst")).unionByName(
        pairs.select(pad("doc_a").alias("src"), pad("doc_b").alias("dst"))
    )
    naive = {
        int(r["node"]): int(r["label"])
        for r in connected_components(e).collect()
    }
    assert naive == groups


def test_near_dup_groups_negative_doc_ids(spark):
    """Regression: hash-derived doc_ids (xxhash64 — negative half the
    time) broke near_dup_groups' CC node encoding (pad_numeric_id's '-'
    sorts before '0' and the final bigint cast threw CAST_INVALID_INPUT
    on '0-…' strings; found by the composed kg2td drill). Negative ids
    must label correctly and group reps must be the NUMERIC min."""
    from naruhodo_spark.ops.dedup import near_dup_groups

    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    rows = [
        (-9_000_000_000_000_000_000, base),
        (-5, base),
        (7, base),
        (3, "unrelated words about catalyst plans and arrow batches here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    groups = {r["doc_id"]: r["group_id"] for r in near_dup_groups(docs).collect()}
    assert groups == {
        -9_000_000_000_000_000_000: -9_000_000_000_000_000_000,
        -5: -9_000_000_000_000_000_000,
        7: -9_000_000_000_000_000_000,
        3: 3,
    }


def test_inclusive_merge_block_cap(spark):
    """Hot blocking keys (web-scale: every name starting with "the")
    make the pair join quadratic within the block; max_block excludes
    them from pair generation while other-key merges still fire, and
    oversized_inclusive_blocks reports exactly what was dropped."""
    from naruhodo_spark.operators.canon import (
        inclusive_merge_labels, oversized_inclusive_blocks,
    )

    rows = [("the item %03d" % i,) for i in range(30)]
    # mergeable through the hot "the" block only:
    rows += [("the castle",), ("the castle keep",)]
    # mergeable through its LAST token despite the hot first token:
    rows += [("the old abbey",), ("abbey",)]
    names = spark.createDataFrame(rows, schema="name string")

    capped = {
        r["node"]: r["label"]
        for r in inclusive_merge_labels(names, max_block=8).collect()
    }
    assert capped.get("the old abbey") == "abbey"  # survives via last token
    assert "the castle keep" not in capped  # dropped with the hot block

    over = oversized_inclusive_blocks(names, max_block=8).collect()
    assert [r["blk"] for r in over] == ["the"] and over[0]["n_names"] == 33

    full = {
        r["node"]: r["label"]
        for r in inclusive_merge_labels(names, max_block=None).collect()
    }
    assert full["the castle keep"] == "the castle"


def test_kmeans_ivf_trained(spark):
    from naruhodo_spark.ops.similarity import (
        assign_cells, kmeans_fit, topk_ivf_trained,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = kmeans_fit(emb, k=4, iters=3)
    assert len(cents) == 4 and len(cents[0]) == 64
    assigned = assign_cells(emb, cents)
    cell_counts = {
        r["cell"]: r["n"]
        for r in assigned.groupBy("cell").agg(F.count("*").alias("n")).collect()
    }
    assert sum(cell_counts.values()) == emb.count()
    top = topk_ivf_trained(emb, k=2, n_cells=4, iters=2)
    assert top.count() > 0
    # deterministic across partitionings
    emb13 = emb.repartition(13)
    cents13 = kmeans_fit(emb13, k=4, iters=3)
    assert cents == cents13


def test_export_links_resolve_to_nodes(spark):
    from naruhodo_spark.api import parser

    p = parser(spark).add("dave moved to tokyo. alice visited bob.")
    obj = p.export_obj()
    ids = {n["id"] for n in obj["nodes"]}
    for l in obj["links"]:
        assert l["source"] in ids and l["target"] in ids, l


def test_salted_agg_equals_plain(spark, docs):
    from naruhodo_spark.operators.agg import aggregate_edges, aggregate_edges_salted

    kg = build_kg(docs)
    t = kg["triples_linked"]
    plain = aggregate_edges(t)
    salted = aggregate_edges_salted(t, salt_buckets=7)
    assert plain.exceptAll(salted).isEmpty() and salted.exceptAll(plain).isEmpty()


def test_auto_salt_probe_engages_on_skew(spark, tmp_path, monkeypatch):
    """VERDICT r02 next-round #6 e2e: finalize defaults to salted="auto" —
    a hot-entity corpus engages the salted two-phase plan WITHOUT a flag,
    a uniform corpus keeps the plain single-shuffle plan, and the skewed
    result is identical either way."""
    import naruhodo_spark.pipeline as PIPE
    from naruhodo_spark import storage, synth
    from naruhodo_spark.operators import agg as O_agg
    from naruhodo_spark.pipeline import run_partitioned

    calls = {"salted": 0, "plain": 0}
    real_salted, real_plain = (
        O_agg.aggregate_edges_salted, O_agg.aggregate_edges,
    )

    def spy_salted(t, *a, **kw):
        calls["salted"] += 1
        return real_salted(t, *a, **kw)

    def spy_plain(t, *a, **kw):
        calls["plain"] += 1
        return real_plain(t, *a, **kw)

    monkeypatch.setattr(PIPE.O_agg, "aggregate_edges_salted", spy_salted)
    monkeypatch.setattr(PIPE.O_agg, "aggregate_edges", spy_plain)

    # skew corpus: one god edge carries ~95% of all triples (clears the
    # 2/P probe threshold decisively); probe min_sample lowered via a
    # full-fraction sample by keeping the corpus big enough
    hot = [(i, "alice likes bob.") for i in range(3000)]
    cold = [(3000 + i, f"carol{i} visited dave{i}.") for i in range(150)]
    from naruhodo_spark.operators.normalize import flat_to_spans

    skew_docs = flat_to_spans(
        spark.createDataFrame(hot + cold, "doc_id long, text string")
    )
    out_skew = str(tmp_path / "skew")
    run_partitioned(spark, skew_docs, out_skew, n_parts=8)
    assert calls["salted"] == 1 and calls["plain"] == 0

    # the auto-salted result equals a forced-plain run
    out_plain = str(tmp_path / "plain")
    run_partitioned(spark, skew_docs, out_plain, n_parts=8, salted=False)
    a = storage.read_table(spark, "ksg_edges", out_skew)
    b = storage.read_table(spark, "ksg_edges", out_plain)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()

    # uniform corpus: probe declines, plain plan runs (the forced-plain
    # run above already bumped calls["plain"])
    calls["salted"] = calls["plain"] = 0
    uni = flat_to_spans(
        spark.createDataFrame(
            [(i, f"u{i}s visited u{i}o.") for i in range(2500)],
            "doc_id long, text string",
        )
    )
    run_partitioned(spark, uni, str(tmp_path / "uni"), n_parts=8)
    assert calls["plain"] == 1 and calls["salted"] == 0


def test_topk_ivf_blas_equals_catalyst(spark):
    """The BLAS applyInPandas kernel (scale path) must agree EXACTLY —
    values, tie-breaks, ranks — with the Catalyst join+window twin
    (oracle-checkable baseline) on the real embeddings table."""
    from naruhodo_spark.ops.similarity import topk_ivf, topk_ivf_blas

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    a = topk_ivf(emb, k=3)
    b = topk_ivf_blas(emb, k=3)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    # singleton / tiny cells: n=1 cells emit nothing, n=2 emit 1 neighbor
    tiny = emb.limit(3).withColumn("label", emb.vec_id % 2)
    a2, b2 = topk_ivf(tiny, k=3), topk_ivf_blas(tiny, k=3)
    assert a2.exceptAll(b2).isEmpty() and b2.exceptAll(a2).isEmpty()


def test_cc_long_chain_and_cycle(spark):
    """Star-contraction CC must be DIAMETER-INDEPENDENT: plain min-label
    propagation needs O(diameter) rounds and silently returned 34 wrong
    labels on this 60-node chain at max_iter=25 (regression)."""
    from naruhodo_spark.operators.canon import (
        connected_components, connected_components_driver,
    )

    chain = spark.createDataFrame(
        [("n%03d" % i, "n%03d" % (i + 1)) for i in range(59)],
        "src string, dst string",
    )
    labels = connected_components(chain).collect()
    assert all(r["label"] == "n000" for r in labels) and len(labels) == 60

    cycle = spark.createDataFrame(
        [("c%02d" % i, "c%02d" % ((i + 1) % 40)) for i in range(40)],
        "src string, dst string",
    )
    l2 = connected_components(cycle).collect()
    assert all(r["label"] == "c00" for r in l2) and len(l2) == 40

    import random

    rng = random.Random(11)
    pairs = [
        ("r%03d" % rng.randint(0, 150), "r%03d" % rng.randint(0, 150))
        for _ in range(220)
    ] + [("iso", "iso")]  # self-loop-only node keeps a label row
    e = spark.createDataFrame(pairs, "src string, dst string")
    a = {(r["node"], r["label"]) for r in connected_components(e).collect()}
    b = {(r["node"], r["label"]) for r in connected_components_driver(e).collect()}
    assert a == b


def test_same_surface_mentions_merge(spark):
    """Deliberate divergence from the reference's #n node splitting
    (operators/link.py docstring; SURVEY.md §1.3 D5): two mentions with
    the same surface in DIFFERENT documents are ONE canonical node, so
    their edge weights aggregate instead of minting alice / alice#2.
    This is the distributed-stable choice — #n identity depends on
    per-document mention order, which no order-free aggregation can
    reproduce."""
    from naruhodo_spark import schemas as S

    mk = lambda i, t: (
        f"d-{i:03d}",
        [{"kind": "text", "text": t, "media_ref": "", "offset": 0}],
    )
    docs = spark.createDataFrame(
        [mk(0, "alice visited tokyo."), mk(1, "alice visited tokyo.")],
        schema=S.DOCUMENTS_SPANS,
    )
    kg = build_kg(docs)
    edges = kg["ksg_edges"].collect()
    nodes = {r["node_id"] for r in kg["ksg_nodes"].collect()}
    # one merged edge with weight 2 — not two #n-split alice nodes
    e = [r for r in edges if r["subj"] == "alice" and r["obj"] == "tokyo"]
    assert len(e) == 1 and e[0]["weight"] == 2
    assert "alice" in nodes
    assert not any("#" in n for n in nodes)


def test_blas_topk_handles_extreme_vec_ids(spark):
    """ADVICE r01: the packed composite sort key silently broke for
    negative ids (ordering flip) and ids >= 2^42 (int64 overflow). The
    lexsort replacement must keep the BLAS path exactly equal to the
    Catalyst twin for xxhash64-sized and negative ids, including on
    cosine TIES (all-equal vectors) where the id tie-break decides."""
    from naruhodo_spark.ops.similarity import topk_ivf, topk_ivf_blas

    ids = [-(2**62), -7, 0, 3, 2**42, 2**62 + 11]
    rows = [
        # three identical vectors → cosine ties broken purely by id asc
        (ids[0], 0, [1.0, 0.0, 0.0]),
        (ids[1], 0, [1.0, 0.0, 0.0]),
        (ids[4], 0, [1.0, 0.0, 0.0]),
        (ids[2], 0, [0.9, 0.1, 0.0]),
        (ids[3], 1, [0.0, 1.0, 0.0]),
        (ids[5], 1, [0.0, 0.9, 0.1]),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    a = sorted(map(tuple, topk_ivf(emb, k=2).collect()))
    b = sorted(map(tuple, topk_ivf_blas(emb, k=2).collect()))
    assert a == b and len(a) > 0


def test_prepare_corpus_decontam_and_quota(spark):
    """Extended composition: a benchmark doc knocks out the matching
    survivor BEFORE the split; the source cap then bounds a hot source —
    both stages optional and off by default (prior test unchanged)."""
    from naruhodo_spark.ops.prepare import prepare_corpus

    uniq = (
        "a perfectly ordinary unique document about spark plans "
        "and shuffle boundaries for testing"
    )
    rows = [(1, uniq, "srcA")] + [
        # fully disjoint vocab per doc so near-dup grouping keeps them apart
        (100 + i, " ".join(f"tok{i}x{j}" for j in range(12)), "srcB")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    # no options: everything survives (each doc is its own group)
    base = prepare_corpus(docs)
    assert base.count() == 41

    bench = spark.createDataFrame(
        [("b1", "document about spark plans and shuffle boundaries")],
        "doc_id string, text string",
    )
    out = prepare_corpus(docs, bench=bench, decontam_n=5, source_cap=10)
    got = out.collect()
    ids = {r["doc_id"] for r in got}
    assert 1 not in ids                      # decontaminated away
    n_b = len([i for i in ids if i >= 100])  # quota bit the hot source
    assert 0 < n_b < 40
    assert set(out.columns) == set(base.columns)


def test_prepare_corpus_source_cap_requires_source_column(spark):
    """ADVICE r02: source_cap over an input without a `source` column
    must fail fast with a clear error, not an AnalysisException deep in
    the quota join."""
    import pytest as _pytest

    from naruhodo_spark.ops.prepare import prepare_corpus

    docs = spark.createDataFrame(
        [(1, "some text here for the gate")], "doc_id long, text string"
    )
    with _pytest.raises(ValueError, match="source"):
        prepare_corpus(docs, source_cap=5)


def test_prepare_corpus_decontam_sees_through_pii_redaction(spark):
    """ADVICE r02: the corpus side is decontaminated AFTER PII
    redaction, so a benchmark n-gram straddling an email/phone span
    could never match a raw bench side — prepare redacts the bench text
    with the same pass, making both sides tokenize identically."""
    from naruhodo_spark.ops.prepare import prepare_corpus

    contaminated = (
        "please contact alice@example.com for the secret benchmark answer "
        "key that was leaked into training data somehow"
    )
    rows = [(1, contaminated, "s")] + [
        (100 + i, " ".join(f"pad{i}w{j}" for j in range(12)), "s")
        for i in range(5)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # the bench window SPANS the email — raw-vs-redacted tokens disagree
    bench = spark.createDataFrame(
        [("b1", "contact alice@example.com for the secret benchmark answer")],
        "doc_id string, text string",
    )
    out = prepare_corpus(docs, bench=bench, decontam_n=5)
    assert 1 not in {r["doc_id"] for r in out.collect()}


def test_blas_topk_half_tie_rounding_matches_catalyst(spark):
    """Exactly-representable half-tie cosines (1/32 = 0.03125) round
    HALF_UP in Spark's F.round but half-to-EVEN in np.round — the BLAS
    kernel must follow Spark (review finding). Also checks an empty
    embeddings frame through the trained-IVF path."""
    from naruhodo_spark.ops.similarity import (
        topk_ivf,
        topk_ivf_blas,
        topk_ivf_trained,
    )

    rows = [
        (1, [32.0, 0.0, 0.0, 0.0, 0.0], 0),
        (2, [1.0, 31.0, 7.0, 3.0, 2.0], 0),   # cosine(1,2) = 1/32 exactly
        (3, [0.0, 32.0, 0.0, 0.0, 0.0], 0),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    a = sorted(map(tuple, topk_ivf(emb, k=2).collect()))
    b = sorted(map(tuple, topk_ivf_blas(emb, k=2).collect()))
    assert a == b
    tie = [r for r in a if set(r[:2]) == {1, 2}]
    assert tie and all(r[2] == 0.0313 for r in tie)  # HALF_UP, not 0.0312

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )
    assert topk_ivf_trained(empty, k=2).count() == 0


def test_duplicate_alias_rows_no_row_multiplication(spark):
    """A dirty alias dictionary (same alias, two canonical_ids, two
    etypes) must neither duplicate triples through the linking join nor
    diverge between the fused broadcast-dict path and the relational
    join path (review finding: join row-multiplied, dict last-won
    non-deterministically)."""
    from naruhodo_spark.pipeline import build_kg

    rows = [("d1", [{"kind": "text", "text": "acme hired alice.",
                     "media_ref": "", "offset": 0}])]
    docs = spark.createDataFrame(rows, schema=__import__(
        "naruhodo_spark.schemas", fromlist=["DOCUMENTS_SPANS"]
    ).DOCUMENTS_SPANS)
    dirty = spark.createDataFrame(
        [("acme", "acme-corp", 3), ("acme", "acme-inc", 1)],
        "alias string, canonical_id string, etype int",
    )
    base_n = build_kg(docs)["triples_linked"].count()
    cols = ["doc_id", "sent_id", "pred", "subj_canon", "obj_canon",
            "subj_ne", "obj_ne"]
    a = build_kg(docs, aliases=dirty, triple_plan="fused")["triples_linked"]
    b = build_kg(docs, aliases=dirty, triple_plan="relational")["triples_linked"]
    assert a.count() == base_n  # no multiplication
    assert b.count() == base_n
    av, bv = a.select(cols), b.select(cols)
    assert av.exceptAll(bv).isEmpty() and bv.exceptAll(av).isEmpty()
    # both canonical ids collapsed into ONE component label
    subj = {r["subj_canon"] for r in a.collect()}
    assert len(subj & {"acme-corp", "acme-inc", "acme"}) == 1
    # etype resolved deterministically to max (3)
    et = {r["subj_ne"] for r in a.where(F.col("subj") == "acme").collect()}
    assert et == {3}


def test_prepare_corpus_quality_gate(spark):
    """prepare_corpus(quality_weights=...): docs the trained classifier
    scores below threshold are dropped and survivors carry p_good; the
    pipeline without the gate is unchanged."""
    from naruhodo_spark.ops import qualityclf as QC
    from naruhodo_spark.ops.prepare import prepare_corpus

    good_text = "we show results of the analysis and the methodology here"
    bad_text = "click now to buy cheap casino pills winner free bonus now"
    train_docs = spark.createDataFrame(
        [(f"g{i}", good_text + f" variant{i}") for i in range(20)]
        + [(f"b{i}", bad_text + f" variant{i}") for i in range(20)],
        ["doc_id", "text"],
    )
    labels = spark.createDataFrame(
        [(f"g{i}", 1.0) for i in range(20)] + [(f"b{i}", 0.0) for i in range(20)],
        ["doc_id", "label"],
    )
    w = QC.train_quality_classifier(
        train_docs, labels, dim=1 << 12, iters=15, lr=2.0
    )
    # numeric doc_ids: near_dup_groups' group ids are bigint by
    # contract (dedup.py pad_numeric_id)
    docs = spark.createDataFrame(
        [(str(i), (good_text if i % 2 else bad_text) + f" unique{i} filler")
         for i in range(30)],
        ["doc_id", "text"],
    )
    gated = prepare_corpus(
        docs, quality_weights=w, quality_threshold=0.5, quality_dim=1 << 12
    ).collect()
    assert len(gated) > 0
    assert all(r["p_good"] >= 0.5 for r in gated)
    ids = {r["doc_id"] for r in gated}
    assert all(int(i) % 2 == 1 for i in ids)  # only good-style docs
    # without the gate both styles survive and no p_good column exists
    base = prepare_corpus(docs)
    assert "p_good" not in base.columns
    assert base.count() > len(gated)


def test_prepare_quality_gate_requires_dim(spark):
    import pytest as _pt

    from naruhodo_spark.ops import qualityclf as QC
    from naruhodo_spark.ops.prepare import prepare_corpus

    docs = spark.createDataFrame(
        [(str(i), f"some text {i}") for i in range(4)], ["doc_id", "text"]
    )
    labels = spark.createDataFrame(
        [(str(i), float(i % 2)) for i in range(4)], ["doc_id", "label"]
    )
    w = QC.train_quality_classifier(docs, labels, dim=1 << 10, iters=1)
    with _pt.raises(ValueError, match="quality_dim"):
        prepare_corpus(docs, quality_weights=w)


# ---------------------------------------------------------------------
# incremental CC: epoch-over-epoch canonicalization state
# ---------------------------------------------------------------------

def test_incremental_cc_equals_full_recompute(spark):
    import numpy as np
    from naruhodo_spark.operators.canon import cc_labels_auto, incremental_cc

    rng = np.random.default_rng(5)
    names = [f"e{i:02d}" for i in range(40)]

    def _edges(pairs):
        return spark.createDataFrame(pairs, "src string, dst string")

    epochs = []
    for _ in range(3):
        pairs = []
        for _ in range(25):
            u, v = rng.choice(40, size=2, replace=False)
            pairs.append((names[u], names[v]))
        epochs.append(pairs)

    # incremental: fold each epoch into the carried (node, label) state
    state = None
    for pairs in epochs:
        state = incremental_cc(state, _edges(pairs))
    inc = sorted((r["node"], r["label"]) for r in state.collect())

    full = sorted(
        (r["node"], r["label"])
        for r in cc_labels_auto(
            _edges([p for e in epochs for p in e])
        ).collect()
    )
    assert inc == full


def test_incremental_cc_carries_untouched_singletons(spark):
    from naruhodo_spark.operators.canon import incremental_cc

    e1 = spark.createDataFrame([("a", "a"), ("b", "c")], "src string, dst string")
    state = incremental_cc(None, e1)
    # epoch 2 never mentions a / b / c
    e2 = spark.createDataFrame([("x", "y")], "src string, dst string")
    got = dict(
        (r["node"], r["label"]) for r in incremental_cc(state, e2).collect()
    )
    assert got["a"] == "a" and got["b"] == "b" and got["c"] == "b"
    assert got["x"] == "x" and got["y"] == "x"


def test_incremental_cc_merges_across_epochs(spark):
    from naruhodo_spark.operators.canon import incremental_cc

    e1 = spark.createDataFrame([("m", "n"), ("p", "q")], "src string, dst string")
    state = incremental_cc(None, e1)
    # the bridge edge merges both prior components
    e2 = spark.createDataFrame([("n", "p")], "src string, dst string")
    got = dict(
        (r["node"], r["label"]) for r in incremental_cc(state, e2).collect()
    )
    assert len(set(got.values())) == 1
    assert set(got) == {"m", "n", "p", "q"}
    assert set(got.values()) == {"m"}
