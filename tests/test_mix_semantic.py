"""Corpus mixing (ops/textstats.mix_corpus) and SemDeDup-style semantic
dedup (ops/similarity.semantic_dedup): exact DuckDB / numpy mirrors on
the real sf0.01 tables, plus the structural properties each contract
promises (epoch contiguity, expected mixture size, min-id reps,
keep-filter audit identity)."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from naruhodo_spark.ops import similarity as SIM
from naruhodo_spark.ops import textstats as TS

SF = "/root/testdata/sf0.01"

WEIGHTS = {"src1": 2.5, "src2": 0.3, "src3": 0.0, "src4": 3.0}


def test_mix_corpus_duckdb_mirror(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(
        (r["doc_id"], r["epoch"])
        for r in TS.mix_corpus(docs, WEIGHTS).select("doc_id", "epoch").collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = sorted(
        (r[0], r[1])
        for r in con.execute("""
            WITH w AS (
              SELECT doc_id,
                     CASE source WHEN 'src1' THEN 2 WHEN 'src2' THEN 0
                                 WHEN 'src3' THEN 0 WHEN 'src4' THEN 3
                                 ELSE 1 END
                   + CASE WHEN (('0x' || substr(md5('mix42|' || doc_id::VARCHAR), 1, 12))::UBIGINT)::BIGINT % 10000
                          < CASE source WHEN 'src1' THEN 5000 WHEN 'src2' THEN 3000
                                        WHEN 'src3' THEN 0 WHEN 'src4' THEN 0
                                        ELSE 0 END
                          THEN 1 ELSE 0 END AS n
              FROM documents)
            SELECT doc_id, unnest(generate_series(0, n - 1)) AS epoch
            FROM w WHERE n > 0
        """).fetchall()
    )
    assert got == want
    assert len(got) > 0


def test_mix_corpus_properties(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = TS.mix_corpus(docs, WEIGHTS).select("doc_id", "source", "epoch")
    per_source = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    n_in = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # zero-weight source vanishes; integral weight is exact replication
    assert "src3" not in per_source
    assert per_source["src4"] == 3 * n_in["src4"]
    # fractional weights land within binomial noise of w·n (25 docs/source
    # at sf0.01 → ±5σ ≈ ±12 is a safe non-flaky bound)
    assert abs(per_source["src1"] - 2.5 * n_in["src1"]) <= 12
    assert abs(per_source["src2"] - 0.3 * n_in["src2"]) <= 12
    # unlisted sources ride at default weight 1.0, epochs all zero
    assert per_source["src0"] == n_in["src0"]
    # epochs are contiguous 0..n-1 per doc
    bad = (
        out.groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.min("epoch").alias("lo"), F.max("epoch").alias("hi"))
        .where((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1))
        .count()
    )
    assert bad == 0
    # determinism: same plan twice → identical rows
    again = TS.mix_corpus(docs, WEIGHTS).select("doc_id", "source", "epoch")
    assert out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0


def test_mix_corpus_rejects_negative_weight(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with pytest.raises(ValueError):
        TS.mix_corpus(docs, {"src1": -1.0})


def _numpy_semantic_groups(ids, embs, cells, threshold):
    """Reference: exact same-cell pairwise cosine + union-find, min-id rep."""
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    norms = np.linalg.norm(embs, axis=1)
    for cell in set(cells):
        idx = [i for i, c in enumerate(cells) if c == cell]
        for ai in range(len(idx)):
            for bi in range(ai + 1, len(idx)):
                a, b = idx[ai], idx[bi]
                cos = round(
                    float(np.dot(embs[a], embs[b]) / (norms[a] * norms[b])), 4
                )
                if cos >= threshold:
                    union(ids[a], ids[b])
    reps = {i: find(i) for i in ids}
    # path-compress fully so rep is the true min of the component
    reps = {i: find(i) for i in ids}
    return reps


def test_semantic_dedup_numpy_mirror(spark):
    # plant duplicate clusters: 3 exact copies of vec 0, a 0.999-cosine
    # neighbour of vec 1, and an across-cell near-identical pair that must
    # NOT merge (quantizer contract: only same-cell pairs are candidates)
    rng = np.random.RandomState(7)
    base = rng.randn(20, 8).astype("float64")
    base[1] = base[0]
    base[2] = base[0]
    base[4] = base[3] + 0.001 * rng.randn(8)
    base[6] = base[5]  # same vector but planted in a DIFFERENT cell below
    cells = [i % 3 for i in range(20)]
    cells[0] = cells[1] = cells[2] = 0
    cells[3] = cells[4] = 1
    cells[5], cells[6] = 0, 1
    ids = list(range(20))
    rows = [
        (int(i), [float(x) for x in base[i]], int(cells[i])) for i in ids
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    got = {
        r["vec_id"]: (r["rep_id"], r["group_size"], r["is_rep"])
        for r in SIM.semantic_dedup(df, threshold=0.99).collect()
    }
    reps = _numpy_semantic_groups(ids, base, cells, 0.99)
    sizes = {}
    for i, rep in reps.items():
        sizes[rep] = sizes.get(rep, 0) + 1
    assert len(got) == 20
    for i in ids:
        rep = reps[i]
        assert got[i] == (rep, sizes[rep], i == rep), f"vec {i}"
    # the planted structures actually exercised the op
    assert got[1][0] == 0 and got[2][0] == 0 and got[0][1] == 3
    assert got[4][0] == 3
    assert got[6][0] == 6  # cross-cell twin NOT merged


def test_semantic_dedup_keep_filter_is_audit_exact(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = SIM.semantic_dedup(emb, threshold=0.999)
    n = emb.count()
    assert out.count() == n  # every row accounted for — no silent deletion
    survivors = out.where("is_rep")
    assert survivors.count() == out.select("rep_id").distinct().count()
    # drop volume audit: sum of group sizes over reps == corpus size
    total = survivors.agg(F.sum("group_size")).collect()[0][0]
    assert total == n


def test_semantic_dedup_handles_negative_hash_ids(spark):
    # hash-derived vec_ids (xxhash64 is negative half the time): the
    # signed padding must keep rep = NUMERIC min, not lexicographic —
    # '-' sorts before '0', which broke pad_numeric_id's contract
    rows = [
        (-7, [1.0, 0.0], 0),
        (-5, [1.0, 0.0], 0),
        (3, [1.0, 0.0], 0),
        (9, [0.0, 1.0], 0),  # singleton
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    got = {
        r["vec_id"]: (r["rep_id"], r["group_size"], r["is_rep"])
        for r in SIM.semantic_dedup(df, threshold=0.99).collect()
    }
    assert got[-7] == (-7, 3, True)
    assert got[-5] == (-7, 3, False)
    assert got[3] == (-7, 3, False)
    assert got[9] == (9, 1, True)


# ---------------------------------------------------------------------
# cluster-balanced mixing (embedding-domain re-weighting)
# ---------------------------------------------------------------------

def test_cluster_balanced_mix_equalizes_masses(spark):
    """Skewed planted clusters come out near-equal: each cluster's
    output mass ≈ mean input cluster size (floor+frac determinism makes
    the expectation exact up to hash-bucket granularity)."""
    rows = (
        [(f"a{i}", "A") for i in range(400)]
        + [(f"b{i}", "B") for i in range(100)]
        + [(f"c{i}", "C") for i in range(25)]
    )
    docs = spark.createDataFrame(
        [(d, f"text {d}") for d, _ in rows], "doc_id string, text string"
    )
    clusters = spark.createDataFrame(rows, "doc_id string, cluster string")
    out = TS.cluster_balanced_mix(docs, clusters)
    got = {
        r["c"]: r["n"]
        for r in out.join(clusters, "doc_id")
        .groupBy(F.col("cluster").alias("c"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    mean = (400 + 100 + 25) / 3
    for c in ("A", "B", "C"):
        assert abs(got[c] - mean) <= 0.2 * mean, (c, got[c], mean)
    # deterministic: same input, same output
    again = TS.cluster_balanced_mix(docs, clusters)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_cluster_balanced_mix_cap_and_target_share(spark):
    rows = [(f"a{i}", "A") for i in range(200)] + [("tiny0", "T")]
    docs = spark.createDataFrame(
        [(d, "x") for d, _ in rows], "doc_id string, text string"
    )
    clusters = spark.createDataFrame(rows, "doc_id string, cluster string")
    # equal-share ideal weight for T would be ~100x — the cap bounds it
    out = TS.cluster_balanced_mix(docs, clusters, max_weight=3.0)
    n_t = out.where(F.col("doc_id") == "tiny0").count()
    assert n_t <= 3
    # explicit shares: everything to A
    out2 = TS.cluster_balanced_mix(
        docs, clusters, target_share={"A": 1.0, "T": 0.0}
    )
    assert out2.where(F.col("doc_id") == "tiny0").count() == 0
    assert out2.count() > 0


def test_cluster_balanced_mix_unclustered_pass_through(spark):
    """ADVICE r04: docs absent from doc_clusters (or NULL cluster) must
    NOT silently vanish — they ride as a pass-through stratum at weight
    1.0 (exactly one copy each), in both modes, and the clustered
    arithmetic is unchanged by their presence."""
    rows = [(f"a{i}", "A") for i in range(40)] + [(f"b{i}", "B") for i in range(10)]
    docs = spark.createDataFrame(
        [(d, "x") for d, _ in rows] + [(f"u{i}", "x") for i in range(7)],
        "doc_id string, text string",
    )
    clusters = spark.createDataFrame(rows, "doc_id string, cluster string")
    out = TS.cluster_balanced_mix(docs, clusters)
    un = out.where(F.col("doc_id").startswith("u"))
    # every unclustered doc exactly once, epoch 0
    assert sorted(r["doc_id"] for r in un.collect()) == [f"u{i}" for i in range(7)]
    assert {r["epoch"] for r in un.collect()} == {0}
    # clustered masses identical to the run WITHOUT the unclustered docs
    base = TS.cluster_balanced_mix(
        docs.where(~F.col("doc_id").startswith("u")), clusters
    )
    key = lambda df: sorted(
        map(tuple, df.where(~F.col("doc_id").startswith("u")).collect())
    )
    assert key(out) == key(base)
    # target_share mode: whitelist drops cluster B, keeps pass-through
    out2 = TS.cluster_balanced_mix(docs, clusters, target_share={"A": 1.0})
    assert out2.where(F.col("doc_id").startswith("b")).count() == 0
    assert out2.where(F.col("doc_id").startswith("u")).count() == 7
    # NULL cluster value routes to pass-through too
    withnull = spark.createDataFrame(
        rows + [("u0", None)], "doc_id string, cluster string"
    )
    out3 = TS.cluster_balanced_mix(docs, withnull)
    assert out3.where(F.col("doc_id") == "u0").count() == 1


def test_cluster_balanced_mix_end_to_end_kmeans(spark):
    """The composition surface: k-means cells over the real embeddings
    → balanced mix of the real documents (vec_id ≡ doc_id in the
    testdata contract)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    cents = SIM.kmeans_fit(emb, k=4, iters=3)
    cells = SIM.assign_cells(emb, cents).select(
        F.col("vec_id").cast("string").alias("doc_id"),
        F.col("cell").alias("cluster"),
    )
    out = TS.cluster_balanced_mix(
        docs.withColumn("doc_id", F.col("doc_id").cast("string")), cells
    )
    assert out.count() > 0
    assert "epoch" in out.columns
