"""GraphSAGE neighbor-sampling blocks (ops/gnn.py): structural
properties + determinism (the subsample itself is hash-defined, so the
pins are exact-set invariants, not distributions)."""

import pytest

from naruhodo_spark.ops import gnn as G


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


@pytest.fixture(scope="module")
def star_chain(spark):
    # hub h0 with 6 out-neighbors; each neighbor chains to two leaves
    pairs = []
    for i in range(6):
        pairs.append(("h0", f"m{i}"))
        pairs.append((f"m{i}", f"l{i}a"))
        pairs.append((f"m{i}", f"l{i}b"))
    return _edges(spark, pairs)


def test_blocks_are_valid_edges_and_hops(spark, star_chain):
    adj = {(r["src"], r["dst"]) for r in star_chain.collect()}
    rows = G.sample_blocks(star_chain, ["h0"], [3, 2]).collect()
    assert {r["hop"] for r in rows} == {1, 2}
    for r in rows:
        assert r["seed"] == "h0"
        assert (r["src"], r["dst"]) in adj


def test_fanout_is_a_hard_bound(spark, star_chain):
    rows = G.sample_blocks(star_chain, ["h0"], [3, 2]).collect()
    from collections import Counter

    per_src = Counter((r["hop"], r["src"]) for r in rows)
    for (hop, _), n in per_src.items():
        assert n <= (3 if hop == 1 else 2)
    # hop-1 srcs are exactly the seed
    assert {r["src"] for r in rows if r["hop"] == 1} == {"h0"}


def test_hop2_frontier_comes_from_hop1_dsts(spark, star_chain):
    rows = G.sample_blocks(star_chain, ["h0"], [2, 2]).collect()
    d1 = {r["dst"] for r in rows if r["hop"] == 1}
    s2 = {r["src"] for r in rows if r["hop"] == 2}
    assert s2 <= d1


def test_multiple_seeds_and_determinism(spark, star_chain):
    a = sorted(
        map(tuple, G.sample_blocks(
            star_chain.repartition(1), ["h0", "m1"], [2, 2]).collect())
    )
    b = sorted(
        map(tuple, G.sample_blocks(
            star_chain.repartition(13), ["h0", "m1"], [2, 2]).collect())
    )
    assert a == b
    assert {t[0] for t in a} == {"h0", "m1"}


def test_direction_in_and_both(spark):
    e = _edges(spark, [("a", "b"), ("c", "b")])
    # 'in' from seed b follows reversed edges
    rows = G.sample_blocks(e, ["b"], [5], direction="in").collect()
    assert {(r["src"], r["dst"]) for r in rows} == {("b", "a"), ("b", "c")}
    # 'both' from seed a reaches b either way
    rows = G.sample_blocks(e, ["a"], [5], direction="both").collect()
    assert ("a", "b") in {(r["src"], r["dst"]) for r in rows}


def test_block_node_sets(spark, star_chain):
    blocks = G.sample_blocks(star_chain, ["h0"], [2, 1])
    ns = {r["seed"]: r["nodes"] for r in G.block_node_sets(blocks).collect()}
    got = set(ns["h0"])
    flat = {x for r in blocks.collect() for x in (r["src"], r["dst"])}
    assert got == flat
    assert ns["h0"] == sorted(ns["h0"])


def test_bad_args(spark, star_chain):
    with pytest.raises(ValueError, match="seed"):
        G.sample_blocks(star_chain, [], [2])
    with pytest.raises(ValueError, match="fanouts"):
        G.sample_blocks(star_chain, ["h0"], [])
    with pytest.raises(ValueError, match="direction"):
        G.sample_blocks(star_chain, ["h0"], [2], direction="sideways")
