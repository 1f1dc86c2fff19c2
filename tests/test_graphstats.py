"""PageRank / degree stats (operators/graphstats.py) vs a dense numpy
power iteration implementing the identical update rule."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from naruhodo_spark.operators import graphstats as G


def _edges_df(spark, triples):
    return spark.createDataFrame(
        [(s, p, o, w, False, False) for (s, p, o, w) in triples],
        "subj string, pred string, obj string, weight long,"
        " negative boolean, passive boolean",
    )


def _numpy_pagerank(pairs, d=0.85, iters=15):
    nodes = sorted({u for u, v, w in pairs} | {v for u, v, w in pairs})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    W = np.zeros((n, n))
    for u, v, w in pairs:
        W[idx[u], idx[v]] += w
    out = W.sum(axis=1)
    P = np.divide(W, out[:, None], out=np.zeros_like(W), where=out[:, None] > 0)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[out == 0].sum()
        r = (1 - d) / n + d * (P.T @ r + dangling / n)
    return {v: r[i] for v, i in idx.items()}


def test_pagerank_matches_numpy(spark):
    rng = np.random.default_rng(3)
    names = [f"n{i}" for i in range(12)]
    triples = []
    for _ in range(30):
        u, v = rng.choice(12, size=2, replace=False)
        triples.append((names[u], "rel", names[v], int(rng.integers(1, 5))))
    # a dangling node: appears only as an object
    triples.append((names[0], "rel", "sink", 3))

    df = _edges_df(spark, triples)
    got = {r["node"]: r["rank"] for r in G.pagerank(df).collect()}
    want = _numpy_pagerank([(s, o, w) for (s, p, o, w) in triples])
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_objectless_triples_target_pred_node(spark):
    df = _edges_df(spark, [("alice", "run", "", 2)])
    got = {r["node"] for r in G.pagerank(df, iterations=3).collect()}
    assert got == {"alice", "pred:run"}


def test_pagerank_empty(spark):
    df = _edges_df(spark, [])
    assert G.pagerank(df).count() == 0


def test_degree_stats(spark):
    df = _edges_df(
        spark,
        [("a", "r", "b", 2), ("a", "r", "c", 1), ("b", "r", "c", 4)],
    )
    got = {r["node"]: r.asDict() for r in G.degree_stats(df).collect()}
    assert got["a"]["out_degree"] == 2 and got["a"]["in_degree"] == 0
    assert got["a"]["out_strength"] == 3.0
    assert got["c"]["in_degree"] == 2 and got["c"]["in_strength"] == 5.0
    assert got["b"]["out_strength"] == 4.0 and got["b"]["in_strength"] == 2.0


def test_edge_provenance(spark):
    """edge_provenance (operators/agg.py): two-phase distinct-doc
    support counts per canonical edge, vs a driver recomputation; and
    n_mentions must equal aggregate_edges' weight for every edge."""
    from naruhodo_spark.operators import agg as A
    from naruhodo_spark.api import parser

    p = parser(spark, lang="en")
    p.add_all(
        ["alice visited bob."] * 3       # doc0..2: 3 docs, 1 mention each
        + ["alice visited bob. alice visited bob."]  # doc3: 2 mentions
        + ["carol praised dave."]
    )
    kg = p.build()
    prov = {
        (r["subj"], r["pred"], r["obj"]): r.asDict()
        for r in A.edge_provenance(kg["triples_linked"]).collect()
    }
    e = prov[("alice", "visit", "bob")]
    assert e["n_docs"] == 4 and e["n_mentions"] == 5
    assert prov[("carol", "praise", "dave")]["n_docs"] == 1

    weights = {
        (r["subj"], r["pred"], r["obj"]): r["weight"]
        for r in kg["ksg_edges"].collect()
    }
    assert set(prov) == set(weights)
    for k in weights:
        assert prov[k]["n_mentions"] == weights[k], k


def test_k_hop_subgraph_vs_python_bfs(spark):
    """k_hop_subgraph distances and induced edges vs a python BFS on a
    random directed graph, for all three directions and k in {1, 2}."""
    from collections import deque

    import numpy as np

    rng = np.random.default_rng(7)
    names = [f"n{i}" for i in range(15)]
    triples = []
    for _ in range(35):
        u, v = rng.choice(15, size=2, replace=False)
        triples.append((names[u], "rel", names[v], int(rng.integers(1, 4))))
    df = _edges_df(spark, triples)

    def py_bfs(adj, srcs, k):
        dist = {s: 0 for s in srcs}
        q = deque(srcs)
        while q:
            u = q.popleft()
            if dist[u] == k:
                continue
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        return dist

    pairs = [(s, o) for (s, p, o, w) in triples]
    adjs = {
        "out": {},
        "in": {},
        "both": {},
    }
    for u, v in pairs:
        adjs["out"].setdefault(u, set()).add(v)
        adjs["in"].setdefault(v, set()).add(u)
        adjs["both"].setdefault(u, set()).add(v)
        adjs["both"].setdefault(v, set()).add(u)

    from naruhodo_spark.operators.graphstats import k_hop_subgraph

    for direction in ("out", "in", "both"):
        for k in (1, 2):
            srcs = [names[0], names[7]]
            nodes, induced = k_hop_subgraph(df, srcs, k=k, direction=direction)
            got = {r["node"]: r["dist"] for r in nodes.collect()}
            want = py_bfs(adjs[direction], srcs, k)
            assert got == want, (direction, k)
            kept = set(got)
            want_edges = {
                (u, v) for u, v in pairs if u in kept and v in kept
            }
            assert {
                (r["src"], r["dst"]) for r in induced.collect()
            } == want_edges, (direction, k)


def test_k_hop_rejects_unknown_direction(spark):
    import pytest as _pytest

    from naruhodo_spark.operators.graphstats import k_hop_subgraph

    df = _edges_df(spark, [("a", "r", "b", 1)])
    with _pytest.raises(ValueError):
        k_hop_subgraph(df, ["a"], direction="undirected")


def test_triangle_counts_vs_python(spark):
    """Degree-ordered triangle counting vs brute-force enumeration on a
    mixed graph: a K4 (4 triangles), a pendant, a disjoint triangle,
    plus parallel/directed duplicates that must not double-count."""
    from itertools import combinations

    from naruhodo_spark.operators.graphstats import triangle_counts

    und = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
           ("c", "d"),                       # K4
           ("d", "e"),                       # pendant
           ("x", "y"), ("y", "z"), ("x", "z")]  # disjoint triangle
    rows = [(s, "rel", o, 1.0) for s, o in und]
    rows += [("b", "rel2", "a", 2.0), ("c", "rel", "a", 1.0)]  # dups/reverse
    edges = spark.createDataFrame(
        rows, "subj string, pred string, obj string, weight double"
    )
    got = {r["node"]: r for r in triangle_counts(edges).collect()}

    adj = {}
    for s, o in und:
        adj.setdefault(s, set()).add(o)
        adj.setdefault(o, set()).add(s)
    tri = {n: 0 for n in adj}
    for trio in combinations(sorted(adj), 3):
        if all(b in adj[a] for a, b in combinations(trio, 2)):
            for n in trio:
                tri[n] += 1
    assert set(got) == set(adj)
    for n in adj:
        assert got[n]["triangles"] == tri[n], n
        assert got[n]["degree"] == len(adj[n])
        d = len(adj[n])
        want_c = round(2 * tri[n] / (d * (d - 1)), 4) if d >= 2 else 0.0
        assert got[n]["clustering"] == pytest.approx(want_c)
    # K4 interior: clustering 1.0; pendant e: 0 triangles, degree 1
    assert got["a"]["clustering"] == 1.0
    assert got["e"]["triangles"] == 0 and got["e"]["clustering"] == 0.0


def test_triangle_counts_empty_and_triangle_free(spark):
    from naruhodo_spark.operators.graphstats import triangle_counts

    empty = spark.createDataFrame(
        [], "subj string, pred string, obj string, weight double"
    )
    assert triangle_counts(empty).count() == 0
    path = spark.createDataFrame(
        [("a", "r", "b", 1.0), ("b", "r", "c", 1.0)],
        "subj string, pred string, obj string, weight double",
    )
    rows = triangle_counts(path).collect()
    assert all(r["triangles"] == 0 for r in rows)
    assert len(rows) == 3


def test_landmark_distances_vs_python_bfs(spark):
    """landmark_distances: per-landmark BFS distances on a random graph
    vs single-source python BFS, plus the approx_distance upper-bound
    property (>= true distance; exact when a landmark sits on a
    shortest path)."""
    from collections import deque

    import numpy as np

    rng = np.random.default_rng(11)
    names = [f"n{i}" for i in range(18)]
    triples = []
    for _ in range(40):
        u, v = rng.choice(18, size=2, replace=False)
        triples.append((names[u], "rel", names[v], int(rng.integers(1, 3))))
    df = _edges_df(spark, triples)

    adj = {}
    for u, p, v, w in triples:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)

    def py_bfs(src, cap):
        dist = {src: 0}
        q = deque([src])
        while q:
            x = q.popleft()
            if dist[x] == cap:
                continue
            for y in adj.get(x, ()):
                if y not in dist:
                    dist[y] = dist[x] + 1
                    q.append(y)
        return dist

    from naruhodo_spark.operators.graphstats import (
        approx_distance,
        landmark_distances,
    )

    landmarks = [names[0], names[9]]
    cap = 4
    got = {}
    for r in landmark_distances(df, landmarks, max_dist=cap).collect():
        got[(r["node"], r["landmark"])] = r["dist"]
    want = {
        (node, lm): d
        for lm in landmarks
        for node, d in py_bfs(lm, cap).items()
    }
    assert got == want

    # upper-bound property over every reachable pair
    dists = landmark_distances(df, landmarks, max_dist=6)
    all_pairs = [
        (a, b) for a in names for b in names if a < b
    ]
    pairs_df = spark.createDataFrame(all_pairs, "u string, v string")
    ub = {
        (r["u"], r["v"]): r["dist_ub"]
        for r in approx_distance(dists, pairs_df).collect()
    }
    true = {n: py_bfs(n, 99) for n in names}
    for (a, b), est in ub.items():
        t = true[a].get(b)
        assert t is not None and est >= t, (a, b, est, t)
    # endpoint-exactness: pairs (lm, x) have dist_ub == true distance
    # (the landmark itself sits on the path, d(lm,lm)=0)
    for lm in landmarks:
        for x in names:
            if x == lm:
                continue
            key = (min(lm, x), max(lm, x))
            t = true[lm].get(x)
            if t is not None and t <= 6 and key in ub:
                assert ub[key] == t, (key, ub[key], t)


def test_landmark_missing_and_duplicate_landmarks(spark):
    df = _edges_df(spark, [("a", "rel", "b", 1), ("b", "rel", "c", 1)])
    from naruhodo_spark.operators.graphstats import landmark_distances

    d = landmark_distances(df, ["a", "a", "no-such-node"], max_dist=3)
    rows = [(r["node"], r["landmark"], r["dist"]) for r in d.collect()]
    # a typo'd landmark is absent, not asserted at dist 0; duplicate
    # landmark names collapse to one BFS
    assert all(lm == "a" for _, lm, _ in rows)
    assert sorted(rows) == [("a", "a", 0), ("b", "a", 1), ("c", "a", 2)]


def test_hits_matches_numpy(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    names = [f"n{i}" for i in range(14)]
    triples = []
    for _ in range(30):
        u, v = rng.choice(14, size=2, replace=False)
        triples.append((names[u], "rel", names[v], 1))
    df = _edges_df(spark, triples)
    got = {r["node"]: (r["hub"], r["authority"])
           for r in G.hits(df, iterations=12).collect()}

    pairs = sorted({(s, o) for (s, p, o, w) in triples})
    nodes = sorted({u for u, v in pairs} | {v for u, v in pairs})
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for u, v in pairs:
        A[idx[u], idx[v]] = 1.0
    h = np.full(len(nodes), 1.0 / np.sqrt(len(nodes)))

    def norm(x):
        s = np.sqrt((x * x).sum())
        return x / s if s > 0 else x

    a = h.copy()
    for _ in range(12):
        a = norm(A.T @ h)
        h = norm(A @ a)
    assert set(got) == set(nodes)
    for v in nodes:
        assert got[v][0] == pytest.approx(h[idx[v]], abs=1e-9), v
        assert got[v][1] == pytest.approx(a[idx[v]], abs=1e-9), v


def test_hits_empty(spark):
    assert G.hits(_edges_df(spark, []), iterations=2).count() == 0


# ---------------------------------------------------------------------
# label propagation (synchronous, weighted, max-(w,label) tie-break)
# ---------------------------------------------------------------------

def _python_lpa(pairs, max_iterations=10):
    """Exact mirror of graphstats.label_propagation: undirected weight
    sums, synchronous update, argmax by (total weight, label)."""
    und = {}
    for u, v, w in pairs:
        und[(u, v)] = und.get((u, v), 0) + w
        und[(v, u)] = und.get((v, u), 0) + w
    nodes = sorted({u for u, _ in und})
    labels = {v: v for v in nodes}
    for _ in range(max_iterations):
        nxt = {}
        for v in nodes:
            acc = {}
            for (a, b), w in und.items():
                if a == v:
                    acc[labels[b]] = acc.get(labels[b], 0) + w
            nxt[v] = max(acc.items(), key=lambda kv: (kv[1], kv[0]))[0]
        if nxt == labels:
            labels = nxt
            break
        labels = nxt
    return labels


def test_label_propagation_matches_python(spark):
    rng = np.random.default_rng(7)
    names = [f"n{i}" for i in range(14)]
    triples = []
    for _ in range(40):
        u, v = rng.choice(14, size=2, replace=False)
        triples.append((names[u], "rel", names[v], int(rng.integers(1, 5))))
    df = _edges_df(spark, triples)
    got = {r["node"]: r["label"] for r in G.label_propagation(df).collect()}
    want = _python_lpa([(s, o, w) for (s, p, o, w) in triples])
    assert got == want


def test_label_propagation_two_planted_clusters(spark):
    # two dense cliques bridged by one weak edge → two communities
    a = [f"a{i}" for i in range(5)]
    b = [f"b{i}" for i in range(5)]
    triples = []
    for grp in (a, b):
        for i in range(5):
            for j in range(i + 1, 5):
                triples.append((grp[i], "rel", grp[j], 5))
    triples.append((a[0], "rel", b[0], 1))
    got = {r["node"]: r["label"]
           for r in G.label_propagation(_edges_df(spark, triples)).collect()}
    assert len({got[x] for x in a}) == 1
    assert len({got[x] for x in b}) == 1
    assert got[a[0]] != got[b[0]]


def test_label_propagation_repartition_invariant(spark):
    triples = [("a", "r", "b", 2), ("b", "r", "c", 1), ("d", "r", "e", 3),
               ("c", "r", "a", 2), ("e", "r", "d", 1)]
    df1 = _edges_df(spark, triples).repartition(1)
    df13 = _edges_df(spark, triples).repartition(13)
    g1 = sorted(tuple(r) for r in G.label_propagation(df1).collect())
    g13 = sorted(tuple(r) for r in G.label_propagation(df13).collect())
    assert g1 == g13


# ---------------------------------------------------------------------
# personalized PageRank (restart to seed set)
# ---------------------------------------------------------------------

def _numpy_ppr(pairs, seeds, d=0.85, iters=15):
    nodes = sorted({u for u, v, w in pairs} | {v for u, v, w in pairs})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    W = np.zeros((n, n))
    for u, v, w in pairs:
        W[idx[u], idx[v]] += w
    out = W.sum(axis=1)
    P = np.divide(W, out[:, None], out=np.zeros_like(W), where=out[:, None] > 0)
    t = np.zeros(n)
    for s in set(seeds):
        t[idx[s]] = 1.0 / len(set(seeds))
    r = t.copy()
    for _ in range(iters):
        dangling = r[out == 0].sum()
        r = t * (1 - d + d * dangling) + d * (P.T @ r)
    return {v: r[i] for v, i in idx.items()}


def test_personalized_pagerank_matches_numpy(spark):
    rng = np.random.default_rng(11)
    names = [f"n{i}" for i in range(12)]
    triples = []
    for _ in range(30):
        u, v = rng.choice(12, size=2, replace=False)
        triples.append((names[u], "rel", names[v], int(rng.integers(1, 5))))
    triples.append((names[1], "rel", "sink", 2))
    seeds = [names[0], names[3]]
    df = _edges_df(spark, triples)
    got = {r["node"]: r["rank"]
           for r in G.personalized_pagerank(df, seeds).collect()}
    want = _numpy_ppr([(s, o, w) for (s, p, o, w) in triples], seeds)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_personalized_pagerank_concentrates_on_seed_side(spark):
    # two components; all mass must stay in the seed's component
    triples = [("a", "r", "b", 1), ("b", "r", "a", 1),
               ("x", "r", "y", 1), ("y", "r", "x", 1)]
    got = {r["node"]: r["rank"]
           for r in G.personalized_pagerank(_edges_df(spark, triples), ["a"]).collect()}
    assert got["x"] == 0.0 and got["y"] == 0.0
    assert got["a"] + got["b"] == pytest.approx(1.0, abs=1e-9)


def test_personalized_pagerank_requires_seeds(spark):
    with pytest.raises(ValueError, match="seed"):
        G.personalized_pagerank(_edges_df(spark, [("a", "r", "b", 1)]), [])


# ---------------------------------------------------------------------
# sampled Brandes betweenness
# ---------------------------------------------------------------------

def _python_brandes(pairs, sources, undirected=True):
    """Textbook Brandes from the given sources (unnormalized,
    directed-accumulation — each ordered (s,t) pair counted)."""
    from collections import defaultdict, deque

    adj = defaultdict(set)
    for u, v in pairs:
        if u == v:
            continue
        adj[u].add(v)
        if undirected:
            adj[v].add(u)
    nodes = set(adj) | {w for vs in adj.values() for w in vs}
    bc = {v: 0.0 for v in nodes}
    for s in sources:
        if s not in nodes:
            continue
        dist = {s: 0}
        sigma = {s: 1.0}
        preds = defaultdict(list)
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in sorted(adj[v]):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] = sigma.get(w, 0.0) + sigma[v]
                    preds[w].append(v)
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def test_betweenness_exact_matches_python(spark):
    rng = np.random.default_rng(13)
    names = [f"n{i}" for i in range(12)]
    pairs = set()
    while len(pairs) < 20:
        u, v = rng.choice(12, size=2, replace=False)
        pairs.add((names[u], names[v]))
    triples = [(u, "rel", v, 1) for u, v in pairs]
    df = _edges_df(spark, triples)
    # n_sources >= n: exact (scale = 1)
    got = {r["node"]: r["betweenness"]
           for r in G.betweenness_sampled(df, n_sources=50, max_dist=12).collect()}
    nodes = {u for u, v in pairs} | {v for u, v in pairs}
    want = _python_brandes(list(pairs), sorted(nodes))
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_betweenness_bridge_dominates(spark):
    # two cliques joined by one bridge node: the bridge has the
    # highest betweenness by construction
    a = [f"a{i}" for i in range(4)]
    b = [f"b{i}" for i in range(4)]
    triples = []
    for grp in (a, b):
        for i in range(4):
            for j in range(i + 1, 4):
                triples.append((grp[i], "rel", grp[j], 1))
    triples += [(a[0], "rel", "bridge", 1), ("bridge", "rel", b[0], 1)]
    got = {r["node"]: r["betweenness"]
           for r in G.betweenness_sampled(
               _edges_df(spark, triples), n_sources=100, max_dist=8
           ).collect()}
    assert got["bridge"] == max(got.values())


def test_betweenness_sampled_estimate_and_determinism(spark):
    rng = np.random.default_rng(4)
    names = [f"n{i}" for i in range(20)]
    triples = [
        (names[u], "rel", names[v], 1)
        for u, v in {tuple(rng.choice(20, size=2, replace=False)) for _ in range(40)}
    ]
    df = _edges_df(spark, triples)
    e1 = sorted(map(tuple, G.betweenness_sampled(df.repartition(1), n_sources=5).collect()))
    e2 = sorted(map(tuple, G.betweenness_sampled(df.repartition(9), n_sources=5).collect()))
    assert e1 == e2
    with pytest.raises(ValueError, match="n_sources"):
        G.betweenness_sampled(df, n_sources=0)


# ---------------------------------------------------------------------
# shortest path extraction
# ---------------------------------------------------------------------

def test_shortest_path_matches_networkx(spark):
    import networkx as nx

    rng = np.random.default_rng(17)
    names = [f"n{i}" for i in range(15)]
    pairs = {tuple(rng.choice(15, size=2, replace=False)) for _ in range(30)}
    triples = [(names[u], "rel", names[v], 1) for u, v in pairs]
    df = _edges_df(spark, triples)
    g = nx.Graph()
    g.add_edges_from((names[u], names[v]) for u, v in pairs)
    adj = {frozenset((names[u], names[v])) for u, v in pairs}
    for a, b in [("n0", "n7"), ("n3", "n12"), ("n1", "n14")]:
        got = G.shortest_path(df, a, b, max_dist=10)
        if not nx.has_path(g, a, b):
            assert got == []
            continue
        want_len = nx.shortest_path_length(g, a, b)
        assert len(got) == want_len + 1, (a, b, got)
        assert got[0] == a and got[-1] == b
        for u, v in zip(got, got[1:]):
            assert frozenset((u, v)) in adj


def test_shortest_path_edge_cases(spark):
    df = _edges_df(spark, [("a", "r", "b", 1), ("b", "r", "c", 1)])
    assert G.shortest_path(df, "a", "a") == ["a"]
    assert G.shortest_path(df, "a", "c") == ["a", "b", "c"]
    # out-direction only: c is reachable from a, a is NOT from c
    assert G.shortest_path(df, "c", "a", direction="out") == []
    assert G.shortest_path(df, "a", "zzz") == []
    # max_dist too small → no path reported
    assert G.shortest_path(df, "a", "c", max_dist=1) == []


def _edge_frame(spark, und):
    return spark.createDataFrame(
        [(s, "rel", o, 1.0) for s, o in und],
        "subj string, pred string, obj string, weight double",
    )


def test_degree_assortativity_vs_numpy(spark):
    """Newman assortativity vs a direct numpy Pearson over both-way
    endpoint degrees on a star-plus-clique mix (negative assortativity
    expected: hubs attach to leaves)."""
    und = [("hub", x) for x in ["a", "b", "c", "d", "e"]] + [
        ("p", "q"), ("q", "r"), ("p", "r")
    ]
    [row] = G.degree_assortativity(_edge_frame(spark, und)).collect()

    deg = {}
    for s, o in und:
        deg[s] = deg.get(s, 0) + 1
        deg[o] = deg.get(o, 0) + 1
    xs, ys = [], []
    for s, o in und:
        xs += [deg[s], deg[o]]
        ys += [deg[o], deg[s]]
    want = round(float(np.corrcoef(xs, ys)[0, 1]), 4)
    assert row["assortativity"] == pytest.approx(want, abs=1e-4)
    assert row["assortativity"] < 0  # star dominates


def test_degree_assortativity_regular_graph_is_null(spark):
    """Zero degree variance (a cycle: every node degree 2) must yield
    NULL, not an engine-dependent NaN."""
    und = [("a", "b"), ("b", "c"), ("c", "a")]
    [row] = G.degree_assortativity(_edge_frame(spark, und)).collect()
    assert row["assortativity"] is None


def test_graph_summary_vs_python(spark):
    und = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
           ("c", "d"), ("d", "e"), ("x", "y"), ("y", "z"), ("x", "z")]
    [row] = G.graph_summary(_edge_frame(spark, und)).collect()
    deg = {}
    for s, o in und:
        deg[s] = deg.get(s, 0) + 1
        deg[o] = deg.get(o, 0) + 1
    assert row["n_nodes"] == len(deg)
    assert row["n_edges"] == len(und)
    assert row["avg_degree"] == pytest.approx(
        round(sum(deg.values()) / len(deg), 4)
    )
    assert row["max_degree"] == max(deg.values())
    assert row["n_triangles"] == 5  # K4 has 4 + disjoint triangle
    wedges = sum(d * (d - 1) / 2 for d in deg.values())
    assert row["transitivity"] == pytest.approx(round(3 * 5 / wedges, 4))
    assert row["assortativity"] is not None
    # avg_clustering averages the 4dp-rounded per-node values
    tc = {r["node"]: r["clustering"]
          for r in G.triangle_counts(_edge_frame(spark, und)).collect()}
    assert row["avg_clustering"] == pytest.approx(
        round(sum(tc.values()) / len(tc), 4)
    )


def test_graph_summary_triangle_free(spark):
    [row] = G.graph_summary(
        _edge_frame(spark, [("a", "b"), ("b", "c")])
    ).collect()
    assert row["n_triangles"] == 0 and row["transitivity"] == 0.0


def _python_top_facts(rows, k):
    """Exact mirror: per-(subj,pred) rank by (-weight, obj), then
    per-subj rank by (pred_rank, -weight, pred, obj)."""
    from collections import defaultdict

    per_pred = defaultdict(list)
    for s, p, o, w in rows:
        per_pred[(s, p)].append((-w, o, p))
    pred_rank = {}
    for (s, p), facts in per_pred.items():
        for i, (nw, o, _) in enumerate(sorted(facts), start=1):
            pred_rank[(s, p, o)] = i
    by_subj = defaultdict(list)
    for s, p, o, w in rows:
        by_subj[s].append((pred_rank[(s, p, o)], -w, p, o, w))
    out = {}
    for s, facts in by_subj.items():
        for i, (pr, nw, p, o, w) in enumerate(sorted(facts), start=1):
            if i <= k:
                out[(s, p, o)] = (w, i)
    return out


def test_top_facts_predicate_diversity(spark):
    """An entity drowning in one predicate still surfaces its rarer
    predicates in the top k."""
    rows = [("e", "visit", f"v{i}", 100 - i) for i in range(10)]
    rows += [("e", "is_a", "person", 1), ("e", "born_in", "oslo", 1)]
    got = [
        (r["pred"], r["obj"], r["fact_rank"])
        for r in G.top_facts(_edges_df(spark, rows), k=4)
        .orderBy("fact_rank").collect()
    ]
    assert got == [
        ("visit", "v0", 1),       # best fact of the dominant predicate
        ("born_in", "oslo", 2),   # each predicate's best comes next
        ("is_a", "person", 3),
        ("visit", "v1", 4),       # only then the dominant one's 2nd
    ]


def test_top_facts_mirror_and_partition_invariance(spark):
    rng = np.random.default_rng(23)
    rows = sorted({
        (f"s{rng.integers(6)}", f"p{rng.integers(4)}",
         f"o{rng.integers(30)}")
        for _ in range(150)
    })
    rows = [(s, p, o, int(rng.integers(1, 9))) for s, p, o in rows]
    want = _python_top_facts(rows, k=3)
    df = _edges_df(spark, rows)
    got = {
        (r["subj"], r["pred"], r["obj"]): (r["weight"], r["fact_rank"])
        for r in G.top_facts(df, k=3).collect()
    }
    assert got == want
    got1 = {
        (r["subj"], r["pred"], r["obj"]): (r["weight"], r["fact_rank"])
        for r in G.top_facts(df.repartition(13), k=3).collect()
    }
    assert got1 == want


def test_top_facts_k_validation_and_facade(spark):
    with pytest.raises(ValueError):
        G.top_facts(_edges_df(spark, [("a", "p", "b", 1)]), k=0)
    from naruhodo_spark.api import parser

    p = parser(spark, lang="en").add_all(
        ["alice visits bob.", "alice visits carol.", "alice knows dave."]
    )
    got = p.top_facts(k=2).collect()
    assert all(r["fact_rank"] <= 2 for r in got)
    alice = [r for r in got if r["subj"] == "alice"]
    assert {r["pred"] for r in alice} == {"visit", "know"}
