"""Declarative subgraph-motif matching over the KSG edge table.

The reference exposes its graph to networkx, where users hand-roll
pattern searches (``for n in G: if ...``) over the in-memory DiGraph
[PK naruhodo exposes ``parser.G``]. At 10^12-document scale the KSG
never fits one machine, so this module compiles a GraphFrames-style
motif — a conjunction of edge patterns over node/predicate variables —
into a chain of Catalyst equi-joins over the distributed edge table.

Scale design:

- **Every step is an equi-join on a node key.** The pattern is
  re-ordered greedily so each edge after the first shares at least one
  already-bound variable; a disconnected pattern raises instead of
  silently cross-joining. There is NO cross product anywhere in the
  compiled plan (pinned in tests/test_plans.py).
- **Predicate literals push into the scan.** A ``("a", "placed", "b")``
  step filters the edge table BEFORE the join, so Parquet row-group
  pruning / partition pruning on ``pred`` applies.
- **Bag semantics, shuffle-free output.** One output row per edge
  embedding (parallel edges multiply, exactly like the SQL self-join
  mirror); no ``distinct`` is forced on users who aggregate downstream
  anyway.
- **Hub safety.** On a scale-free KSG a k-hop pattern through a 'god
  entity' explodes combinatorially; :func:`cap_hubs` pre-drops nodes
  above a degree cap and returns the dropped nodes as an audit frame —
  the same guard+audit discipline as ops/dedup's band caps.

Variables: a plain string (``"a"``) is a node variable; the predicate
slot takes a literal string (exact match), ``None`` (wildcard, not
bound), or ``"?r"`` (bound and returned as output column ``r``).
``anti`` patterns are negated edge constraints compiled to left-anti
joins (their node variables must already be bound by positive edges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EdgePattern = tuple[str, "str | None", str]


def _pred_var(p: "str | None") -> "str | None":
    if isinstance(p, str) and p.startswith("?"):
        name = p[1:]
        if not name:
            raise ValueError("empty predicate variable '?'")
        return name
    return None


def _order_connected(pattern: list[EdgePattern]) -> list[EdgePattern]:
    """Greedy re-order so each edge shares >=1 node var with the bound
    set — guarantees every join step is an equi-join."""
    remaining = list(pattern)
    ordered = [remaining.pop(0)]
    bound = {ordered[0][0], ordered[0][2]}
    while remaining:
        for i, (u, _, v) in enumerate(remaining):
            if u in bound or v in bound:
                e = remaining.pop(i)
                bound.update((e[0], e[2]))
                ordered.append(e)
                break
        else:
            raise ValueError(
                f"disconnected motif: {remaining} share no variable with "
                f"{sorted(bound)} — a cross join is never compiled"
            )
    return ordered


def _edge_step(
    edges: DataFrame, u: str, p: "str | None", v: str
) -> tuple[DataFrame, list[str]]:
    """Project one pattern edge to (u, v[, pred-var]) columns, pushing a
    literal-predicate filter into the scan. Self-loop (u == v) becomes a
    src = dst filter with a single output column."""
    e = edges
    pv = _pred_var(p)
    if p is not None and pv is None:
        e = e.where(F.col("pred") == F.lit(p))
    if u == v:
        e = e.where(F.col("src") == F.col("dst"))
        cols = [F.col("src").alias(u)]
        names = [u]
    else:
        cols = [F.col("src").alias(u), F.col("dst").alias(v)]
        names = [u, v]
    if pv is not None:
        cols.append(F.col("pred").alias(pv))
        names.append(pv)
    return e.select(*cols), names


def match_motif(
    edges: DataFrame,
    pattern: list[EdgePattern],
    anti: "list[EdgePattern] | None" = None,
    distinct_nodes: bool = True,
) -> DataFrame:
    """Find all embeddings of ``pattern`` in ``edges`` (src, pred, dst).

    Returns one column per node variable (first-appearance order) then
    one per ``?``-bound predicate variable; one row per embedding (bag
    semantics — mirror a SQL self-join chain exactly).

    ``distinct_nodes=True`` adds pairwise ``!=`` filters across all node
    variables (isomorphic matching, the GraphFrames convention is the
    opposite homomorphic default — here KG queries almost always want
    distinct entities, so it is the default and a flag, not a caller
    burden).
    """
    if not pattern:
        raise ValueError("empty motif pattern")
    node_vars: list[str] = []
    pred_vars: list[str] = []
    for u, p, v in pattern:
        for nv in (u, v):
            if nv not in node_vars:
                node_vars.append(nv)
        pv = _pred_var(p)
        if pv is not None:
            if pv in pred_vars:
                raise ValueError(f"duplicate predicate variable ?{pv}")
            pred_vars.append(pv)
    clash = set(node_vars) & set(pred_vars)
    if clash:
        raise ValueError(f"variable used as both node and predicate: {clash}")

    ordered = _order_connected(pattern)
    u0, p0, v0 = ordered[0]
    acc, bound_list = _edge_step(edges, u0, p0, v0)
    bound = set(bound_list)
    for u, p, v in ordered[1:]:
        step, names = _edge_step(edges, u, p, v)
        keys = [n for n in names if n in bound]
        acc = acc.join(step, on=keys, how="inner")
        bound.update(names)

    for u, p, v in anti or []:
        if _pred_var(p) is not None:
            raise ValueError("predicate variables are not allowed in anti edges")
        if u not in bound or v not in bound:
            raise ValueError(
                f"anti edge ({u},{p},{v}) uses unbound variables — bind "
                "them with a positive edge first"
            )
        step, names = _edge_step(edges, u, p, v)
        # an anti edge asserts NON-existence: dedupe the probe side so
        # the anti join stays a set test whatever the edge multiplicity
        acc = acc.join(step.distinct(), on=names, how="left_anti")

    if distinct_nodes:
        for i in range(len(node_vars)):
            for j in range(i + 1, len(node_vars)):
                acc = acc.where(F.col(node_vars[i]) != F.col(node_vars[j]))
    return acc.select(*node_vars, *pred_vars)


def match_motif_ksg(
    ksg_edges: DataFrame,
    pattern: list[EdgePattern],
    anti: "list[EdgePattern] | None" = None,
    distinct_nodes: bool = True,
) -> DataFrame:
    """:func:`match_motif` over a KSG edge table (subj, pred, obj) —
    renames to the (src, pred, dst) contract; objectless triples point
    at the predicate node via the shared edge_target contract, exactly
    like graphstats' `_edge_pairs`, so motif results agree with
    PageRank/k-hop over the same graph."""
    from naruhodo_spark.operators.agg import edge_target

    edges = ksg_edges.select(
        F.col("subj").alias("src"), F.col("pred").alias("pred"),
        edge_target().alias("dst"),
    )
    return match_motif(edges, pattern, anti=anti, distinct_nodes=distinct_nodes)


def cap_hubs(
    edges: DataFrame, cap: int
) -> tuple[DataFrame, DataFrame]:
    """Drop every edge touching a node with total degree > ``cap``.

    Returns ``(kept_edges, dropped_nodes)`` where ``dropped_nodes`` is
    the (node, degree) audit frame — the caller decides whether the
    dropped hubs are acceptable (same discipline as the LSH band caps).
    One degree aggregation + two broadcast-able anti joins; no per-row
    Python.
    """
    deg = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    dropped = deg.where(F.col("degree") > cap)
    hot = dropped.select("node")
    kept = (
        edges.join(hot.withColumnRenamed("node", "src"), "src", "left_anti")
        .join(hot.withColumnRenamed("node", "dst"), "dst", "left_anti")
        .select(*edges.columns)
    )
    return kept, dropped
