"""O20 — canonicalization via connected components over iterative
DataFrame self-joins.

Reference behavior: node merging is sequential, in driver memory —
``inclusive(a, b)`` substring checks and name dedup with `#n` suffixes
[PK naruhodo/utils/misc.py, naruhodo/core/KnowledgeCoreJa.py].

Spark mapping [B BASELINE.json:6 "connected-components-based node merging
via iterative DataFrame self-joins"]: min-label propagation (the
MapReduce CC algorithm of Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14 — public literature). Each iteration is
two shuffles; labels converge in O(log n) iterations on real alias
graphs (alias chains are short). ``localCheckpoint`` truncates lineage
per iteration so the plan does not grow (SURVEY.md §4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _star_contract(e: DataFrame, max_iter: int) -> DataFrame:
    """Alternating large-star / small-star contraction (Kiveris et al.)
    over an oriented undirected pair set (hi > lo, any orderable type).
    Returns the fixpoint edge set — a star forest (child=hi →
    component-min=lo). Converges in O(log n) rounds on ANY graph shape —
    unlike plain min-label propagation, whose round count is the
    component DIAMETER: a 60-node alias chain silently returned 34 wrong
    labels under propagation with the old max_iter=25. Raises if
    max_iter is hit (log₂-ish rounds make 50 unreachable for any real
    input) rather than returning non-converged labels."""

    def _sig(df: DataFrame):
        # convergence = equal (count, bit_xor-of-row-hashes) signatures
        # for successive edge sets: one cheap agg instead of the exact
        # exceptAll diff (an extra join per round). A collision between
        # two DIFFERENT successive sets (~2⁻⁶⁴/round) would exit the
        # loop early with wrong labels — accepted, same order of risk as
        # the node-hash-collision guard in connected_components, and the
        # star forest the labels are read from is still internally
        # consistent. Swap for an exceptAll-based check if that risk
        # ever matters more than a per-round join.
        r = df.agg(F.count(F.lit(1)), F.expr("bit_xor(xxhash64(hi, lo))")).first()
        return (r[0], r[1])

    sig = _sig(e)
    if sig[0] == 0:
        return e
    for _ in range(max_iter):
        # LARGE-STAR: m(u) = min(neighbors(u) ∪ {u}); every neighbor
        # v > u is rewired to m(u). (Needs the symmetric neighbor
        # view; v > u ≥ m(u) keeps the output oriented hi > lo.)
        sym = e.select(F.col("hi").alias("u"), F.col("lo").alias("v")).union(
            e.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("mn", F.col("u")).alias("m"))
        )
        large = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .where(F.col("hi") != F.col("lo"))
            .distinct()
        )
        # SMALL-STAR: per node hi, m = min of its smaller neighbors;
        # hi and every smaller neighbor collapse onto m.
        mins2 = large.groupBy("hi").agg(F.min("lo").alias("m"))
        j = large.join(mins2, "hi")
        small = j.select(F.col("hi").alias("a"), F.col("m").alias("b")).union(
            j.where(F.col("lo") != F.col("m")).select(
                F.col("lo").alias("a"), F.col("m").alias("b")
            )
        )
        e = (
            small.select(
                F.greatest("a", "b").alias("hi"),
                F.least("a", "b").alias("lo"),
            )
            .where(F.col("hi") != F.col("lo"))
            .distinct()
            .localCheckpoint()  # truncate lineage every round
        )
        new_sig = _sig(e)
        if new_sig == sig:
            return e
        sig = new_sig
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Returns (node:string, label:string) — label = lexicographic min
    node id of the component. Deterministic across runs and partitionings.

    The contraction loop (_star_contract) runs over xxhash64-encoded
    LONG node ids, not the strings: every round shuffles the edge
    frontier ~4×, and 8-byte keys roughly halve that traffic vs typical
    node-id strings. Hashes are only component plumbing — the public
    label is recovered afterwards as min(node string) per component, so
    output is bit-identical to a string-keyed contraction. A collision
    among node hashes (p ≈ n²/2⁶⁵ — negligible, but it would silently
    merge two components) is detected upfront by count vs countDistinct
    and falls back to contracting on the raw strings."""
    raw = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # node set from the UNFILTERED edges, so self-loop-only nodes still
    # get a (node, node) label row (parity with the driver union-find)
    nodes = (
        raw.select(F.col("src").alias("node"))
        .union(raw.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    chk = nodes.agg(
        F.count(F.lit(1)), F.countDistinct(F.xxhash64("node"))
    ).first()
    if chk[0] != chk[1]:
        # hash collision: contract on the strings (label = min directly)
        e = (
            raw.where(F.col("src") != F.col("dst"))
            .select(
                F.greatest("src", "dst").alias("hi"),
                F.least("src", "dst").alias("lo"),
            )
            .distinct()
            .localCheckpoint()
        )
        star = _star_contract(e, max_iter)
        return nodes.join(
            star.select(F.col("hi").alias("node"), F.col("lo").alias("label")),
            "node",
            "left",
        ).select("node", F.coalesce("label", "node").alias("label"))

    hs, hd = F.xxhash64("src"), F.xxhash64("dst")
    e = (
        raw.where(F.col("src") != F.col("dst"))
        .select(F.greatest(hs, hd).alias("hi"), F.least(hs, hd).alias("lo"))
        .distinct()
        .localCheckpoint()
    )
    star = _star_contract(e, max_iter)
    # membership: node → component id (root hash); roots map to themselves
    memb = (
        nodes.withColumn("h", F.xxhash64("node"))
        .join(star, F.col("h") == F.col("hi"), "left")
        .select("node", F.coalesce("lo", "h").alias("comp"))
    )
    rep = memb.groupBy("comp").agg(F.min("node").alias("label"))
    return memb.join(rep, "comp").select("node", "label")


def connected_components_driver(edges: DataFrame) -> DataFrame:
    """Collects the edge list and delegates (see _rows variant)."""
    return connected_components_driver_rows(edges.collect(), edges.sparkSession)


def connected_components_driver_rows(rows, spark) -> DataFrame:
    """Driver-side union-find for *broadcast-sized* graphs. The alias
    dictionary is broadcast-sized by contract [B BASELINE.json:6], so
    collect + union-find (O(E α(E))) beats ~log(n) iterations of
    distributed shuffles by seconds of fixed latency per run. Identical
    output (min-label per component) to connected_components — asserted
    by tests."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        ra, rb = find(r[0]), find(r[1])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    labels = [(n, find(n)) for n in list(parent)]
    return spark.createDataFrame(labels, schema="node string, label string")


# above this many alias rows, use the distributed iterative-self-join CC
DRIVER_CC_THRESHOLD = 200_000


def alias_canonical_map(aliases: DataFrame) -> dict[str, tuple[str, int | None]]:
    """Collects the alias table and delegates to alias_canonical_map_rows."""
    return alias_canonical_map_rows(
        aliases.select("alias", "canonical_id", "etype").collect()
    )


def alias_canonical_map_rows(rows) -> dict[str, tuple[str, int | None]]:
    """Driver-side composition of linking (O19) + canonicalization (O20)
    for broadcast-sized alias dictionaries: returns
    {surface → (component-min-label, etype-or-None)} covering every alias
    AND every alias-graph node, exactly reproducing
    link_entities ∘ apply_canonical_labels. Ship it to executors as a
    Spark broadcast variable (pipeline fused path) — one dict lookup per
    argument instead of four broadcast hash joins."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        ra, rb = find(r["alias"]), find(r["canonical_id"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    label = {n: find(n) for n in list(parent)}
    out: dict[str, tuple[str, int | None]] = {
        n: (lab, None) for n, lab in label.items()
    }
    best: dict[str, int | None] = {}
    for r in rows:
        # alias match also overrides the entity type (link_entities).
        # Duplicate alias rows resolve to max(etype) — DETERMINISTIC, and
        # the same rule link_entities applies, so the dict path and the
        # join path stay identical on dirty dictionaries (last-wins here
        # used to depend on collect() row order).
        a, e = r["alias"], r["etype"]
        if a not in best or (
            e is not None and (best[a] is None or e > best[a])
        ):
            best[a] = e
        out[a] = (label[a], best[a])
    return out


def pad_numeric_id(col_name: str):
    """Zero-pad a NON-NEGATIVE integral id to 20 chars so lexicographic
    min == numeric min inside the contraction (int64 max is 19 digits —
    never truncates; a 12-char pad would silently truncate ids ≥ 10^12,
    e.g. hash-derived ones, colliding distinct nodes). Negative ids are
    not supported ('-' sorts before '0')."""
    return F.lpad(F.col(col_name).cast("string"), 20, "0")


def pad_signed_id(col_name: str):
    """Order-preserving 20-char encoding of ANY bigint, negatives
    included: value + 2⁶³ in DECIMAL(20,0) space maps ℤ64 onto
    [0, 2⁶⁴) where zero-padded lexicographic order == numeric order.
    Use when ids may be hash-derived (xxhash64 is negative half the
    time); decode with unpad_signed_id — a plain bigint cast of the
    padded string yields the SHIFTED value, not the id."""
    return F.lpad(
        F.expr(
            f"CAST(CAST({col_name} AS DECIMAL(20,0)) + "
            "9223372036854775808BD AS DECIMAL(20,0))"
        ).cast("string"),
        20,
        "0",
    )


def unpad_signed_id(col_name: str):
    """Inverse of pad_signed_id: padded string → original bigint."""
    return F.expr(
        f"CAST(CAST({col_name} AS DECIMAL(21,0)) - "
        "9223372036854775808BD AS BIGINT)"
    )


def cc_labels_auto(edges: DataFrame, force_distributed: bool = False) -> DataFrame:
    """Size-gated CC dispatch: edge sets up to DRIVER_CC_THRESHOLD rows
    take the driver union-find (O(E α(E)) beats ~log n rounds of
    distributed shuffles by seconds of fixed latency); larger graphs (or
    force_distributed) run the star-contraction loop. The size probe
    collects up to threshold+1 rows ONCE and reuses them for the
    union-find (no second scan); the input is lazily checkpointed first
    so the probe and the distributed path's two scans (node set +
    contraction seed) share ONE evaluation of the upstream plan — for
    near_dup_groups that upstream is the whole LSH pipeline, which a
    naive dispatch re-evaluated ~3× (r03 profile: 2× end-to-end wall).
    Outputs are asserted identical by tests, so the gate is purely a
    physical-plan choice."""
    if force_distributed:
        return connected_components(edges)
    # Materialize the edge frame ONCE (lazy local checkpoint) before any
    # scan: the size probe below plus connected_components' two passes
    # (node set + contraction seed) would otherwise re-evaluate the whole
    # upstream plan ~3× — for near_dup_groups that upstream is the full
    # LSH banding pipeline, and the re-evaluation dominated the job
    # (profiled at 2× end-to-end wall, r03). Partitions the probe already
    # computed stay cached; the rest materialize on first full scan.
    edges = edges.localCheckpoint(eager=False)
    head = edges.limit(DRIVER_CC_THRESHOLD + 1).collect()
    if len(head) > DRIVER_CC_THRESHOLD:
        return connected_components(edges)
    # driver path: the collected rows ARE the input now — release the
    # partial cache so per-wave/per-epoch callers don't accumulate it
    result = connected_components_driver_rows(head, edges.sparkSession)
    edges.unpersist()
    return result


def alias_cc_labels(aliases: DataFrame, force_distributed: bool = False) -> DataFrame:
    """Components over the alias dictionary's (alias → canonical_id) edges,
    merging multi-hop alias chains (a→b, b→c ⇒ {a,b,c} one entity).
    Broadcast-sized dicts take the driver union-find fast path; larger
    graphs (or force_distributed) use the iterative self-join CC."""
    edges = aliases.select(
        F.col("alias").alias("src"), F.col("canonical_id").alias("dst")
    )
    return cc_labels_auto(edges, force_distributed=force_distributed)


def _inclusive_blocks(names: DataFrame, col: str = "name") -> DataFrame:
    """(name, blk) blocking-key pairs for inclusive_merge_labels:
    first AND last token of each distinct non-empty name (covers
    head-final NPs like "the castle" ⊃ "castle" as well as prefixes like
    "tokyo tower" ⊃ "tokyo"); each name appears under ≤2 keys."""
    n = names.select(F.col(col).alias("name")).where(F.col("name") != "").distinct()
    toks = F.split("name", " ")
    return n.select(
        "name",
        F.explode(
            F.array_distinct(
                F.array(F.element_at(toks, 1), F.element_at(toks, -1))
            )
        ).alias("blk"),
    )


def oversized_inclusive_blocks(
    names: DataFrame, col: str = "name", max_block: int = 10_000
) -> DataFrame:
    """Audit companion to inclusive_merge_labels: the blocking keys whose
    member count exceeds max_block, with counts — the blocks whose
    candidate pairs the capped merge drops. Callers wanting the no-
    silent-caps accounting aggregate/log this alongside the merge."""
    return (
        _inclusive_blocks(names, col)
        .groupBy("blk")
        .agg(F.count(F.lit(1)).alias("n_names"))
        .where(F.col("n_names") > max_block)
    )


def inclusive_merge_labels(
    names: DataFrame, col: str = "name", max_block: int | None = 10_000
) -> DataFrame:
    """Reference ``inclusive(a, b)`` analog [PK naruhodo/utils/misc.py]:
    merge entity names where one strictly contains the other (e.g.
    "tokyo tower" ⊃ "tokyo"). The reference checks every new node against
    all existing ones in driver memory; at scale that O(n²) becomes a
    *blocked* pair join — candidates must share their first or last
    token — followed by a substring filter and connected components.
    Returns (node, label) for merged names only.

    The pair join is quadratic WITHIN a block, so a hot blocking key
    (every name starting with "the", a web-scale certainty) turns one
    block into a cross-join; blocks larger than max_block are excluded
    from pair generation (names in them can still merge through their
    other key). The cap trades recall inside stop-word-headed blocks for
    a bounded plan — audit what a given corpus loses with
    oversized_inclusive_blocks(); pass max_block=None to disable."""
    keyed = _inclusive_blocks(names, col)
    if max_block is not None:
        sizes = keyed.groupBy("blk").agg(F.count(F.lit(1)).alias("n_names"))
        keyed = (
            keyed.join(
                F.broadcast(sizes.where(F.col("n_names") > max_block)),
                "blk",
                "left_anti",
            )
        )
    a = keyed.select(F.col("name").alias("a"), "blk")
    b = keyed.select(F.col("name").alias("b"), "blk")
    pairs = (
        a.join(b, "blk")
        .where(
            (F.col("a") != F.col("b"))
            & (F.length("b") >= 3)
            & (F.length("a") > F.length("b"))
            & F.col("a").contains(F.col("b"))
        )
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .distinct()
    )
    return connected_components(pairs)


def apply_canonical_labels(triples: DataFrame, labels: DataFrame) -> DataFrame:
    """Rewrite subj_canon/obj_canon to their component label. The label set
    is alias-dictionary-sized → broadcast, no shuffle."""
    s_lab = F.broadcast(
        labels.select(F.col("node").alias("s_node"), F.col("label").alias("s_label"))
    )
    o_lab = F.broadcast(
        labels.select(F.col("node").alias("o_node"), F.col("label").alias("o_label"))
    )
    return (
        triples.join(s_lab, triples.subj_canon == s_lab.s_node, "left")
        .join(o_lab, triples.obj_canon == o_lab.o_node, "left")
        .withColumn("subj_canon", F.coalesce("s_label", "subj_canon"))
        .withColumn("obj_canon", F.coalesce("o_label", "obj_canon"))
        .drop("s_node", "s_label", "o_node", "o_label")
    )


def incremental_cc(
    prev_labels: "DataFrame | None",
    new_edges: DataFrame,
    force_distributed: bool = False,
) -> DataFrame:
    """Connected components over an INCREMENTALLY growing merge graph →
    (node, label), identical to recomputing CC over all historical
    edges plus ``new_edges`` (equivalence pinned in tests).

    ``prev_labels`` is a previous CC output (node, label). Each old
    component enters the new computation as its depth-1 star
    (node → label edges): stars preserve the old connectivity exactly
    while replacing E historical raw edges with N per-node rows, and
    they contract in one round instead of the old component's diameter.
    The epoch-over-epoch canonicalization shape: state carried between
    runs is one bounded (node, label) table, never the raw edge
    history.
    """
    stars = (
        prev_labels.where(F.col("node") != F.col("label")).select(
            F.col("node").alias("src"), F.col("label").alias("dst")
        )
        if prev_labels is not None
        else None
    )
    edges = new_edges.select("src", "dst")
    if stars is not None:
        edges = edges.unionByName(stars)
    labels = cc_labels_auto(edges, force_distributed=force_distributed)
    if prev_labels is None:
        return labels
    # singleton nodes from prior epochs (label == node, no new edge)
    # don't appear in the star edges — carry them through untouched so
    # the output covers every node ever seen, like a full recompute over
    # the whole history would
    carried = prev_labels.join(labels, "node", "left_anti")
    return labels.unionByName(carried)
