"""Token-id encoding at web scale — the hash-derived id path
(VERDICT r02 "What's wrong #1"): dense row_number ids + a broadcast id
table assume the vocabulary stays broadcast-sized, which a 100 TB corpus
breaks. These tests pin:

- vocab_hash_ids: deterministic, sort-free, resume-stable ids (both the
  Spark-only xxhash64 and the DuckDB-portable md5_48 family), never
  colliding with the OOV sentinel 0;
- encode_tokens(broadcast_ids=False): identical output through a plain
  shuffled join — the plan that survives a non-broadcast-sized vocab;
- vocab_ids: the dense path now FAILS FAST past its size gate instead of
  silently building a single-partition global sort;
- id_collisions: the explicit collision audit for hash ids;
- a DuckDB mirror of the exact md5_48 ids (same arithmetic the driver
  oracle uses for ts_encode_tokens).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from naruhodo_spark.ops import textstats as TS


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("d1", "alpha beta gamma alpha"),
        ("d2", "beta gamma delta"),
        ("d3", "alpha beta unique_hapax"),
        ("d4", ""),  # empty doc must keep an empty token_ids array
        ("d5", "Gamma, ALPHA beta!"),  # normalization folds to shared tokens
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def _collect_ids(df):
    return {r["token"]: r["id"] for r in df.collect()}


def test_hash_ids_deterministic_and_nonzero(spark, docs):
    vocab = TS.vocabulary(docs, min_df=2)
    for algo in ("xxhash64", "md5_48"):
        ids1 = _collect_ids(TS.vocab_hash_ids(vocab, algo=algo))
        ids2 = _collect_ids(TS.vocab_hash_ids(vocab, algo=algo))
        assert ids1 == ids2
        assert all(i != 0 for i in ids1.values())  # 0 is the OOV sentinel
        # resume-stability: an id depends only on the token, not the
        # vocabulary it was derived from — grow the corpus, ids persist
        grown = docs.union(
            spark.createDataFrame([("d9", "alpha zeta zeta")], docs.schema)
        )
        ids_grown = _collect_ids(
            TS.vocab_hash_ids(TS.vocabulary(grown, min_df=2), algo=algo)
        )
        for tok, i in ids1.items():
            assert ids_grown[tok] == i


def test_encode_broadcast_and_shuffle_join_agree(spark, docs):
    vocab = TS.vocabulary(docs, min_df=2)
    ids = TS.vocab_hash_ids(vocab, algo="xxhash64")
    enc_b = TS.encode_tokens(docs, ids, broadcast_ids=True)
    enc_s = TS.encode_tokens(docs, ids, broadcast_ids=False)
    rows_b = {r["doc_id"]: r["token_ids"] for r in enc_b.collect()}
    rows_s = {r["doc_id"]: r["token_ids"] for r in enc_s.collect()}
    assert rows_b == rows_s
    assert rows_b["d4"] == []  # empty doc kept, not dropped
    # hapax (min_df=2 prunes it) encodes as OOV 0
    d3 = rows_b["d3"]
    assert d3[-1] == 0 and all(i != 0 for i in d3[:-1])


def test_shuffle_join_plan_has_no_forced_broadcast(spark, docs):
    """broadcast_ids=False must not FORCE a broadcast of the id table —
    that is the whole point of the flag at web scale. (Catalyst may
    still auto-broadcast a small table under its size threshold — the
    right call at small scale — so the contract is asserted with the
    auto-threshold disabled: True hints the broadcast through anyway,
    False falls back to a shuffled join.)"""
    ids = TS.vocab_hash_ids(TS.vocabulary(docs, min_df=2))
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        def plan_of(broadcast_ids):
            df = TS.encode_tokens(docs, ids, broadcast_ids=broadcast_ids)
            return df._jdf.queryExecution().executedPlan().toString()

        assert "BroadcastHashJoin" not in plan_of(False)
        assert "BroadcastHashJoin" in plan_of(True)  # hint wins over -1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)


def test_dense_vocab_ids_size_gate(spark, docs):
    vocab = TS.vocabulary(docs, min_df=2)
    # under the gate: dense ids still work and are 1..n in token order
    ids = _collect_ids(TS.vocab_ids(vocab, max_dense=100))
    assert sorted(ids.values()) == list(range(1, len(ids) + 1))
    assert [t for t, _ in sorted(ids.items(), key=lambda kv: kv[1])] == sorted(ids)
    # over the gate: fail fast with the remediation in the message
    with pytest.raises(ValueError, match="vocab_hash_ids"):
        TS.vocab_ids(vocab, max_dense=1)


def test_id_collisions_audit(spark):
    vocab = spark.createDataFrame([("a",), ("b",), ("c",)], "token string")
    ids = TS.vocab_hash_ids(vocab)
    assert TS.id_collisions(ids).count() == 0
    # a forged collision is surfaced with both tokens listed
    forged = ids.withColumn("id", F.lit(7))
    rows = TS.id_collisions(forged).collect()
    assert len(rows) == 1 and rows[0]["tokens"] == ["a", "b", "c"]


def test_md5_48_ids_match_duckdb(spark, docs):
    """The exact cross-engine contract the driver oracle relies on."""
    vocab = TS.vocabulary(docs, min_df=2)
    spark_ids = _collect_ids(TS.vocab_hash_ids(vocab, algo="md5_48"))
    con = duckdb.connect()
    duck = dict(
        con.execute(
            "SELECT token, (('0x' || substr(md5(token), 1, 12))::UBIGINT)::BIGINT + 1 "
            "FROM (SELECT unnest(?) AS token)",
            [list(spark_ids)],
        ).fetchall()
    )
    assert spark_ids == duck
