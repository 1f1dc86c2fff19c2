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


def test_fanout_prefix_is_hash_ordered_not_lexicographic(spark):
    """ADVICE r04: with deg <= 4*fanout the hash pre-filter is a no-op,
    so a dst-ordered dense index made `idx < fanout` keep the
    lexicographically-smallest neighbors at EVERY hop. The fix orders
    the index by xxhash64(hop_seed, src, dst): the kept set must (a)
    differ from the lexicographic prefix for at least one seed, and
    (b) differ across hop seeds (decorrelation)."""
    from naruhodo_spark.ops.walks import _capped_adjacency

    e = _edges(spark, [("hub", f"n{i:02d}") for i in range(20)])

    def kept(seed):
        return frozenset(
            r["dst"]
            for r in _capped_adjacency(e, 4 * 5, seed, hash_index=True)
            .where("idx < 5").collect()
        )

    lex = frozenset(f"n{i:02d}" for i in range(5))
    samples = {s: kept(s) for s in ("sage42:h1", "sage42:h2", "sage42:h3")}
    # every sample is a valid 5-subset
    for s, ks in samples.items():
        assert len(ks) == 5 and all(k.startswith("n") for k in ks), (s, ks)
    # not the name-biased prefix, and not all identical across hop seeds
    assert any(ks != lex for ks in samples.values())
    assert len(set(samples.values())) > 1
    # index stays dense and set-complete regardless of ordering
    rows = _capped_adjacency(e, 64, "x", hash_index=True).collect()
    assert sorted(r["idx"] for r in rows) == list(range(20))
    assert {r["dst"] for r in rows} == {f"n{i:02d}" for i in range(20)}


def test_bad_args(spark, star_chain):
    with pytest.raises(ValueError, match="seed"):
        G.sample_blocks(star_chain, [], [2])
    with pytest.raises(ValueError, match="fanouts"):
        G.sample_blocks(star_chain, ["h0"], [])
    with pytest.raises(ValueError, match="direction"):
        G.sample_blocks(star_chain, ["h0"], [2], direction="sideways")
