"""Product quantization (ops/similarity.pq_*): encoding vs a python
argmin mirror, ADC top-k recall on planted clusters, reconstruction
sanity, determinism, and the registered query surface."""

import pytest
from pyspark.sql import functions as F

from naruhodo_spark import queries as Q
from naruhodo_spark.ops import similarity as SIM

SF = "/root/testdata/sf0.001"


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def clustered(spark):
    """24 vectors in 3 well-separated 8-dim clusters (centers at 0, 10,
    20 on alternating dims), deterministic jitter from the id."""
    rows = []
    for i in range(24):
        c = i % 3
        base = [float(c * 10 + ((i * 7 + d * 3) % 5) * 0.1) for d in range(8)]
        rows.append((i, base))
    return _emb(spark, rows)


def test_encode_matches_python_argmin(spark, clustered):
    books = SIM.pq_train(clustered, m=4, ksub=4, iters=3)
    assert len(books) == 4 and all(len(b) == 4 for b in books)
    got = {r["vec_id"]: r["codes"] for r in SIM.pq_encode(clustered, books).collect()}
    vecs = {r["vec_id"]: r["embedding"] for r in clustered.collect()}
    dsub = 2
    for vid, v in vecs.items():
        want = []
        for j in range(4):
            sub = v[j * dsub : (j + 1) * dsub]
            dists = [
                sum((float(x) - c) ** 2 for x, c in zip(sub, cent))
                for cent in books[j]
            ]
            want.append(dists.index(min(dists)))
        assert got[vid] == want, vid


def test_adc_topk_recovers_cluster(spark, clustered):
    books = SIM.pq_train(clustered, m=4, ksub=4, iters=3)
    enc = SIM.pq_encode(clustered, books)
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in clustered.collect()}
    out = SIM.pq_topk(enc, vecs[0], books, k=8).collect()
    assert [r["rank"] for r in out] == list(range(1, 9))
    # all 8 nearest by ADC belong to vector 0's cluster (ids ≡ 0 mod 3)
    assert all(r["neighbor_id"] % 3 == 0 for r in out)
    # ADC distances are monotone with rank
    dists = [r["adc_dist"] for r in out]
    assert dists == sorted(dists)


def test_pq_deterministic_across_partitionings(spark, clustered):
    books1 = SIM.pq_train(clustered, m=4, ksub=4, iters=3)
    books2 = SIM.pq_train(clustered.repartition(7), m=4, ksub=4, iters=3)
    assert books1 == books2
    a = SIM.pq_encode(clustered, books1)
    b = SIM.pq_encode(clustered.repartition(5), books1)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_pq_dim_not_divisible_raises(spark):
    e = _emb(spark, [(0, [1.0, 2.0, 3.0])])
    with pytest.raises(ValueError, match="not divisible"):
        SIM.pq_train(e, m=2)


def test_pq_empty_input(spark):
    e = _emb(spark, [])
    assert SIM.pq_train(e, m=2) == []
    assert SIM.pq_encode(e, []).count() == 0


def test_query_surface_runs(spark):
    out = Q.QUERIES["sim_pq_topk"](spark, SF)
    rows = out.collect()
    assert {"query_id", "neighbor_id", "adc_dist", "rank"} == set(out.columns)
    assert len(rows) > 0
    # per query: ranks contiguous from 1, ADC distances monotone
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        d = [r["adc_dist"] for r in rs]
        assert d == sorted(d)
