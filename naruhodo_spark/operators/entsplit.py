"""Entity context disambiguation — detect over-merged canonical nodes.

Canonicalization (operators/canon.py) merges surface aliases into one
node by string evidence alone, so homonyms conflate: "mercury" the
planet and "mercury" the element collapse into one entity whose edges
mix two real-world referents. This operator flags such nodes by
clustering each entity's MENTION CONTEXTS (the token sets the entity
co-occurs with, per document): a clean entity's contexts form one
connected similarity cluster; a conflated one splits into ≥2 clusters
with near-zero cross-cluster overlap.

Scale shape — the whole point is that nothing is per-entity quadratic:
  * signatures: the MinHash affine family from ops/dedup (one md5 per
    distinct context token), aggregated per (entity, mention) — uniform
    keys;
  * candidate pairs: LSH band buckets keyed by (entity, band_idx,
    band_hash) — the entity is PART of the bucket key, so banding never
    compares mentions of different entities and a hot entity's mentions
    only meet when their contexts actually collide in a band;
  * verification: exact Jaccard on the candidate pairs only (the
    ops/dedup two-tier discipline);
  * clustering: the size-gated connected-components dispatch
    (cc_labels_auto) over composite "entity␟mention" node ids — CC
    edges never cross entities, so components stay entity-local by
    construction.

Determinism: md5/xxhash-derived signatures, no RNG; cluster ids are the
lexicographic min mention id of each cluster. Repartition-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from naruhodo_spark.operators.canon import cc_labels_auto
from naruhodo_spark.ops.dedup import _signatures_from_shingles
from naruhodo_spark.ops.textstats import norm_text

SEP = "\x1f"  # unit separator between md5 HEX digests (see _node_id)
N_HASHES = 16
# 8 bands × 2 rows: recall-first banding. At candidate-Jaccard 0.7 a
# pair misses all bands with p = (1 − 0.7²)^8 ≈ 0.004 (vs 0.22 for
# 4 × 4) — and false candidates only cost the exact-Jaccard check,
# which filters them anyway. The md5-derived signatures make any given
# corpus's outcome deterministic, not probabilistic.
N_BANDS = 8
JACCARD_T = 0.3
# A band bucket holding more than BUCKET_CAP mentions would generate
# O(n²) candidate pairs — the one way this operator could go quadratic
# (a degenerate corpus where every mention of an entity has near-equal
# context). Oversized buckets instead emit STAR edges (every member →
# the bucket's min mention): identical CC connectivity, O(n) edges.
# Star edges skip the exact-Jaccard verification — acceptable because
# membership in a shared 2-row band bucket already certifies matching
# minhash minima, and the failure direction (spuriously CONNECTING two
# referents, i.e. missing a split) needs a cross-referent minhash
# collision, not just any hash accident. The cap is a skew guard in the
# df_cap tradition of ops/dedup.ngram_jaccard_pairs.
BUCKET_CAP = 64


def mention_contexts(docs: DataFrame, entities: DataFrame) -> DataFrame:
    """(entity, mention, ctx array<string>): one mention per (entity,
    doc) where the entity token occurs in the doc; ctx = the doc's OTHER
    distinct tokens. ``entities`` is a 1-column (entity) frame — a
    vocabulary-bounded dimension, broadcast-joined against the exploded
    token stream (the alias-dictionary pattern, operators/link.py)."""
    toks = docs.select(
        F.col("doc_id").cast("string").alias("mention"),
        F.explode(
            F.array_distinct(F.split(norm_text(F.col("text")), r"\s+"))
        ).alias("tok"),
    ).where(F.col("tok") != "")
    hits = toks.join(
        F.broadcast(entities.select(F.col("entity").alias("tok"))), "tok"
    ).select(F.col("tok").alias("entity"), "mention")
    # inner join always matches (the entity token itself is in toks);
    # the entity is excluded from ctx INSIDE the aggregate (collect_set
    # drops the NULLs the when() mints) so a mention whose only token
    # IS the entity keeps its row with ctx = [] instead of vanishing
    ctx = (
        hits.join(toks, "mention")
        .groupBy("entity", "mention")
        .agg(
            F.array_sort(
                F.collect_set(
                    F.when(F.col("tok") != F.col("entity"), F.col("tok"))
                )
            ).alias("ctx")
        )
    )
    return ctx


def _context_pairs(
    mentions: DataFrame,
    n_hashes: int,
    n_bands: int,
    threshold: float,
    bucket_cap: int = BUCKET_CAP,
):
    """Returns (pairs, star_edges): LSH-candidate mention pairs within
    each entity whose exact context Jaccard clears the threshold —
    pairwise only inside buckets of ≤ bucket_cap mentions — plus star
    edges (entity, hub, member) for oversized buckets (see BUCKET_CAP).
    Same two-tier shape as ops/dedup.minhash_lsh_pairs, with the entity
    riding every key."""
    # tok fans out to four consumers (signatures, set sizes, both sides
    # of the exact-Jaccard intersection join) — deliberately NOT
    # checkpointed: mention_contexts ends in a groupBy, so Catalyst
    # already shares its shuffle output across the consumers
    # (ReusedExchange); an r05 experiment that checkpointed here AND at
    # the band table measured ~1 s SLOWER at sf0.1 (two materializations
    # of state the exchange reuse was providing for free)
    tok = mentions.select(
        "entity", "mention", F.explode("ctx").alias("token")
    )
    # the repo's single affine MinHash family (ops/dedup), keyed by
    # (entity, mention) instead of doc_id — no duplicated hash math
    sigs = _signatures_from_shingles(
        tok, n_hashes, key_cols=("entity", "mention"), item_col="token"
    )
    rows = n_hashes // n_bands
    bands = sigs.select(
        "entity",
        "mention",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[f"sig_{b * rows + r}" for r in range(rows)]
                        ).alias("bh"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("entity", "mention", "bk.band", "bk.bh")
    bucket_n = bands.groupBy("entity", "band", "bh").agg(
        F.count(F.lit(1)).alias("bucket_n"),
        F.min("mention").alias("hub"),
    )
    bands = bands.join(bucket_n, ["entity", "band", "bh"])
    star_edges = (
        bands.where(
            (F.col("bucket_n") > bucket_cap) & (F.col("mention") != F.col("hub"))
        )
        .select("entity", "hub", "mention")
        .distinct()
    )
    small = bands.where(F.col("bucket_n") <= bucket_cap).select(
        "entity", "mention", "band", "bh"
    )
    cand = (
        small.alias("a")
        .join(
            small.alias("b"),
            on=[
                F.col("a.entity") == F.col("b.entity"),
                F.col("a.band") == F.col("b.band"),
                F.col("a.bh") == F.col("b.bh"),
                F.col("a.mention") < F.col("b.mention"),
            ],
        )
        .select(
            F.col("a.entity").alias("entity"),
            F.col("a.mention").alias("mention_a"),
            F.col("b.mention").alias("mention_b"),
        )
        .distinct()
    )
    # exact Jaccard on candidates only: join the distinct-token streams
    sizes = tok.groupBy("entity", "mention").agg(
        F.count(F.lit(1)).alias("set_size")
    )
    ta = tok.select(
        "entity", F.col("mention").alias("mention_a"), "token"
    )
    tb = tok.select(
        "entity", F.col("mention").alias("mention_b"), "token"
    )
    inter = (
        cand.join(ta, ["entity", "mention_a"])
        .join(tb, ["entity", "mention_b", "token"])
        .groupBy("entity", "mention_a", "mention_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(
        "entity", F.col("mention").alias("mention_a"), F.col("set_size").alias("size_a")
    )
    sb = sizes.select(
        "entity", F.col("mention").alias("mention_b"), F.col("set_size").alias("size_b")
    )
    return (
        inter.join(sa, ["entity", "mention_a"])
        .join(sb, ["entity", "mention_b"])
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("size_a") + F.col("size_b") - F.col("n_inter")),
                4,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("entity", "mention_a", "mention_b", "jaccard")
    ), star_edges


def context_clusters(
    mentions: DataFrame,
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
    threshold: float = JACCARD_T,
    bucket_cap: int = BUCKET_CAP,
) -> DataFrame:
    """(entity, mention, cluster): connected-components clustering of
    each entity's mentions under context similarity. Every input mention
    keeps a row — mentions with no similar peer become singleton
    clusters labeled by themselves."""
    pairs, stars = _context_pairs(
        mentions, n_hashes, n_bands, threshold, bucket_cap
    )

    # CC node id: hex(xxhash64(entity)) SEP hex(xxhash64(mention)). The
    # r03 shape was the raw 'entity\x1fmention' concat recovered with
    # split_part — wrong whenever an entity or mention itself contains
    # \x1f (norm_text collapses Java \s, which does NOT include U+001F —
    # ADVICE r03), silently mislabeling clusters. Hex digests cannot
    # contain the separator, so the composite is injective as long as
    # the component hashes are collision-free over the observed values;
    # r04 used md5 (128-bit, unconditional) and paid ~2 s at sf0.1 for
    # it (VERDICT r04 #4) — r05 uses ≤16-char xxhash64 hex keys with an
    # upfront count-vs-countDistinct guard per component (the
    # connected_components discipline, canon.py) that falls back to md5
    # on a raw collision, so correctness never rides on 2⁻⁶⁴.
    # (entity, mention) is recovered by an equi-join against the
    # distinct mention frame instead of string surgery.
    ids_base = mentions.select("entity", "mention").distinct().localCheckpoint(
        eager=False
    )
    chk = ids_base.agg(
        F.count(F.lit(1)),
        F.count_distinct(F.xxhash64("entity"), F.xxhash64("mention")),
    ).first()
    if chk[0] != chk[1]:
        def _node_id(ent, men):  # 64-bit collision observed: 128-bit ids
            return F.concat_ws(SEP, F.md5(ent), F.md5(men))
    else:
        def _node_id(ent, men):
            return F.concat_ws(
                SEP, F.hex(F.xxhash64(ent)), F.hex(F.xxhash64(men))
            )

    edges = pairs.select(
        _node_id(F.col("entity"), F.col("mention_a")).alias("src"),
        _node_id(F.col("entity"), F.col("mention_b")).alias("dst"),
    ).unionByName(
        stars.select(
            _node_id(F.col("entity"), F.col("hub")).alias("src"),
            _node_id(F.col("entity"), F.col("mention")).alias("dst"),
        )
    )
    labels = cc_labels_auto(edges)  # (node, label), entity-local
    ids = ids_base.select(
        "entity",
        "mention",
        _node_id(F.col("entity"), F.col("mention")).alias("node"),
    )
    # cluster label = lexicographic-min MENTION in the component (the
    # r03 semantics: min over 'entity\x1fmention' strings within one
    # entity ordered by mention) — an agg over recovered mentions, not
    # a parse of the opaque min node id
    lab = labels.join(ids, "node").select("entity", "mention", "label")
    rep = lab.groupBy("entity", "label").agg(
        F.min("mention").alias("cluster")
    )
    lab = lab.join(rep, ["entity", "label"]).select(
        "entity", "mention", "cluster"
    )
    return (
        mentions.select("entity", "mention")
        .join(lab, ["entity", "mention"], "left")
        .select(
            "entity",
            "mention",
            F.coalesce("cluster", F.col("mention")).alias("cluster"),
        )
    )


def split_candidates(
    clusters: DataFrame, min_cluster_size: int = 2
) -> DataFrame:
    """(entity, n_clusters, cluster_sizes): entities whose mentions form
    ≥2 context clusters of at least ``min_cluster_size`` mentions — the
    over-merge review queue. cluster_sizes is descending then by cluster
    id, so the output is deterministic."""
    per_cluster = clusters.groupBy("entity", "cluster").agg(
        F.count(F.lit(1)).alias("n_mentions")
    )
    big = per_cluster.where(F.col("n_mentions") >= min_cluster_size)
    return (
        big.groupBy("entity")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_clusters"),
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col("n_mentions")).alias("neg"),
                            F.col("cluster"),
                            F.col("n_mentions"),
                        )
                    )
                ),
                lambda s: s["n_mentions"],
            ).alias("cluster_sizes"),
        )
        .where(F.col("n_clusters") >= 2)
    )


def cluster_top_terms(
    mentions: DataFrame, clusters: DataFrame, k: int = 5
) -> DataFrame:
    """(entity, cluster, top_terms): the k most frequent context tokens
    per cluster — the human-readable evidence for WHY two clusters are
    different referents. Rank window is bounded per (entity, cluster)
    group (top-k discipline, never a global sort)."""
    from pyspark.sql import Window

    tok = (
        mentions.join(clusters, ["entity", "mention"])
        .select("entity", "cluster", F.explode("ctx").alias("token"))
        .groupBy("entity", "cluster", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.partitionBy("entity", "cluster").orderBy(
        F.col("tf").desc(), F.col("token").asc()
    )
    return (
        tok.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .groupBy("entity", "cluster")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rk", "token"))
                ),
                lambda s: s["token"],
            ).alias("top_terms")
        )
    )
