"""Mergeable sketches for incremental corpus / KG statistics.

At 10^12 documents you cannot recount "distinct entities so far" by
rescanning every epoch — the scan IS the cost. The standard fix is
mergeable sketches: each epoch reduces to a few-KB binary summary, and
"as-of epoch E" statistics are a fold over E tiny rows instead of a
rescan of E full partitions.

Two sketch families, both computed by Spark's built-in JVM aggregates
(Apache DataSketches HLL and the stream-lib-derived Count-Min — no
Python in the aggregation path):

- **HLL distinct sketches** (`sketch_distinct` / `merge_sketches` /
  `estimate_distinct`): per-group `hll_sketch_agg` binaries that union
  associatively via `hll_union_agg`. Relative error ≈ 1.04/√(2^lgk)
  (~1.6 % at the default lgk=12, 2 KB per group). Used for the
  per-epoch entity/doc distinct panel (`entity_sketch_panel`).
- **Count-Min frequency sketch** (`freq_sketch` / `cms_estimate`):
  one (depth × width) counter table for the whole frame, point-queryable
  on the driver without any further cluster work. `cms_estimate` is a
  pure-Python mirror of Spark's CountMinSketchImpl long-key hash
  (stream-lib lineage: hashA affine → mod 2^31−1 → mod width), verified
  against exact counts in tests/test_sketches.py. This is the cheap
  hot-key probe shape: estimate candidate-key frequencies from a
  few-hundred-KB binary instead of running an aggregation per probe —
  guaranteed to overestimate only (CMS property), so a "key below skew
  threshold" answer is certain.

Epoch-panel contract: sketches are stored per epoch (a normal table
write, partitioned like everything else in streaming.py); cumulative
"as-of" views fold with `merge_sketches` over `epoch <= E`. Re-running
an epoch replaces its one sketch row — the panel inherits the store's
exactly-once story instead of inventing its own.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LGK = 12  # ~1.6% rel. err, ~2KB per sketch


# -- HLL distinct sketches ---------------------------------------------------

def sketch_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """(group_cols..., metric, sketch) — one HLL binary per group.

    One uniform groupBy (HLL update/merge is JVM-side, partial-agg
    friendly: map-side combine reduces each partition to one sketch per
    group before the shuffle, so shuffle volume is n_groups × ~2KB
    regardless of row count).
    """
    return (
        df.groupBy(*group_cols)
        .agg(F.hll_sketch_agg(F.col(value_col).cast("string"), F.lit(lgk))
             .alias("sketch"))
        .withColumn("metric", F.lit(value_col))
    )


def merge_sketches(df: DataFrame, group_cols: list[str]) -> DataFrame:
    """Fold sketch rows (e.g. across epochs) into one per group via
    `hll_union_agg` — associative + commutative, so any partial merge
    order gives the identical estimate."""
    return df.groupBy(*group_cols).agg(
        F.hll_union_agg("sketch", F.lit(True)).alias("sketch")
    )


def estimate_distinct(df: DataFrame) -> DataFrame:
    """Attach `n_distinct_est` (bigint) to a sketch frame."""
    return df.withColumn(
        "n_distinct_est", F.hll_sketch_estimate("sketch")
    )


def entity_sketch_panel(
    triples: DataFrame, epoch: int, lgk: int = DEFAULT_LGK
) -> DataFrame:
    """Per-epoch KG distinct panel: one row per metric
    (epoch, metric, sketch) over a triples frame
    (subj, pred, obj, doc_id ...). Cumulative distincts as-of any epoch
    = merge_sketches over epoch <= E, grouped by metric — O(epochs)
    2KB rows, never a rescan."""
    metrics = [c for c in ("subj", "pred", "obj", "doc_id")
               if c in triples.columns]
    if not metrics:
        raise ValueError(
            "entity_sketch_panel needs at least one of subj/pred/obj/"
            f"doc_id; got columns {triples.columns}"
        )
    panels = [
        sketch_distinct(triples.select(m), [], m, lgk=lgk) for m in metrics
    ]
    out = panels[0]
    for p in panels[1:]:
        out = out.unionByName(p)
    return out.select(F.lit(int(epoch)).alias("epoch"), "metric", "sketch")


# -- Count-Min frequency sketch ----------------------------------------------

def freq_sketch(
    df: DataFrame,
    key_col: str,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """One-row frame (sketch binary, n_rows) — Count-Min over
    xxhash64(key). Keys are pre-hashed to int64 so the point-query
    mirror below only needs the long-key hash path (strings go through
    Murmur3 inside the JVM, which we deliberately avoid re-implementing).

    width = ceil(2/eps) counters × depth = ceil(log2(1/(1−confidence)))
    rows of 8 bytes — eps=0.001/conf=0.99 is 7×2000×8 ≈ 110 KB, driver-
    safe at any corpus size. Map-side partial aggregation means the
    shuffle moves one sketch per partition, not the rows.

    NULL keys hash to a reserved sentinel (`_NULL_KEY_HASH`) rather
    than coalescing to '' — the r03 shape merged NULL and
    empty-string counts into one cell, an overestimate beyond the
    eps·N bound for either key (ADVICE r03). A real key colliding with
    the sentinel requires an exact 64-bit xxhash64 hit (p = 2⁻⁶⁴).
    """
    return df.select(_key_hash(F.col(key_col)).alias("__k")).agg(
        F.count_min_sketch(
            "__k", F.lit(float(eps)), F.lit(float(confidence)),
            F.lit(int(seed))
        ).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_PRIME_MODULUS = (1 << 31) - 1
_M64 = (1 << 64) - 1

# reserved CMS key for NULL — keeps NULL distinct from '' (and every
# other string, up to a 2^-64 xxhash64 collision)
_NULL_KEY_HASH = -(1 << 63)


def _key_hash(col):
    """int64 CMS key: xxhash64 of the string cast, with NULL pinned to
    the reserved sentinel. Shared by freq_sketch (aggregation) and
    xxhash64_map (probes) so both sides hit the same cells."""
    return F.when(col.isNull(), F.lit(_NULL_KEY_HASH)).otherwise(
        F.xxhash64(col.cast("string"))
    )


def _cms_parse(b: bytes) -> tuple[int, int, int, list[list[int]], list[int]]:
    """Parse Spark's CountMinSketchImpl serialization: big-endian
    version(i32)=1, totalCount(i64), depth(i32), width(i32),
    hashA[depth] i64s, then table[depth][width] i64s (field order and
    the hash arithmetic verified empirically — a 1-item sketch puts its
    count in exactly the cells this mirror predicts; re-pinned against
    exact counts in tests/test_sketches.py)."""
    ver, total, depth, width = struct.unpack(">iqii", b[:20])
    if ver != 1:
        raise ValueError(f"unsupported CountMinSketch version {ver}")
    off = 20
    hash_a = list(struct.unpack(f">{depth}q", b[off:off + 8 * depth]))
    off += 8 * depth
    table = []
    for _ in range(depth):
        row = struct.unpack(f">{width}q", b[off:off + 8 * width])
        table.append(list(row))
        off += 8 * width
    return total, depth, width, table, hash_a


def _cms_hash(item: int, a: int, width: int) -> int:
    """stream-lib / Spark long-key CMS hash: 64-bit wrapping affine,
    fold-add the high word, mask to 2^31−1, mod width."""
    h = (a * (item & _M64)) & _M64
    # Java `hash += hash >> 32` is an arithmetic shift on the signed view
    signed = h - (1 << 64) if h >= (1 << 63) else h
    signed += signed >> 32
    h = signed & _M64
    h &= _PRIME_MODULUS
    return int(h % width)


def cms_estimate(sketch: bytes, key_hashes: dict) -> dict:
    """Driver-side point queries against a `freq_sketch` binary.

    ``key_hashes`` maps each ORIGINAL key to its xxhash64(str(key))
    int64 — build it with `xxhash64_map(spark, keys)` so the hashing is
    bit-identical to what the sketch aggregated. Returns
    {key: estimated_count}; CMS guarantees estimate >= true count and
    <= true + eps·N with probability `confidence`.
    """
    total, depth, width, table, hash_a = _cms_parse(bytes(sketch))
    out = {}
    for key, h64 in key_hashes.items():
        est = min(
            table[i][_cms_hash(h64, hash_a[i], width)] for i in range(depth)
        )
        out[key] = int(est)
    return out


def xxhash64_map(spark, keys: list) -> dict:
    """{key: hash} via one local Spark job over the tiny key list,
    applying the IDENTICAL expression freq_sketch aggregates
    (`_key_hash`: xxhash64 of the string cast, NULL → reserved
    sentinel) to the TYPED values — so boolean/float keys round-trip
    through Spark's own cast rules ('true', '1.0E-7', …), not Python's
    str(), and probes hit the same cells the sketch filled."""
    # one partition so monotonically_increasing_id preserves list order
    df = spark.createDataFrame([(k,) for k in keys], ["k"]).coalesce(1)
    rows = (
        df.select(
            F.monotonically_increasing_id().alias("i"),
            _key_hash(F.col("k")).alias("h"),
        )
        .orderBy("i")
        .collect()
    )
    return {k: r["h"] for k, r in zip(keys, rows)}


# -- DDSketch-style quantile sketches ----------------------------------------

def quantile_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    rel_err: float = 0.01,
) -> DataFrame:
    """(group_cols..., metric, bucket, count) — a mergeable
    relative-error quantile sketch (DDSketch, Masson VLDB'19): positive
    values land in log-spaced buckets i = ceil(log_γ(x)) with
    γ = (1+α)/(1−α), zero and negatives in reserved buckets. Any
    quantile read off the sketch is within relative error α of a true
    value (pinned in tests/test_sketches.py).

    Completes the epoch-panel family (HLL distinct + CMS frequency):
    one uniform groupBy with map-side combine — shuffle volume is
    n_groups × n_occupied_buckets (log-spaced, so ~2.3k buckets span
    1e-9..1e9 at α=1%) — and panels fold associatively with
    :func:`merge_quantile_sketches` (a groupBy sum), so "doc-length
    p99 as of epoch E" is a fold over tiny rows, never a rescan, and
    NEVER a global sort.
    """
    if not 0 < rel_err < 1:
        raise ValueError(f"rel_err must be in (0,1), got {rel_err}")
    gamma = (1.0 + rel_err) / (1.0 - rel_err)
    x = F.col(value_col).cast("double")
    # reserved buckets: NULL never counted; 0 → INT_MIN+1; negatives
    # mirror positives below INT_MIN/2 (kept exact enough for corpus
    # stats where negatives are rare)
    bucket = (
        F.when(x > 0, F.ceil(F.log(x) / F.lit(float(__import__("math").log(gamma)))))
        .when(x == 0, F.lit(-(2**29)))  # sorts between the negative
        # bucket range (~ -2^30 ± log-span) and the positive one (≥ -log-span)
        .otherwise(
            -F.ceil(F.log(-x) / F.lit(float(__import__("math").log(gamma))))
            - F.lit(2**31 // 2)
        )
        .cast("long")
    )
    return (
        df.where(x.isNotNull())
        .groupBy(*group_cols, bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            *group_cols,
            F.lit(value_col).alias("metric"),
            "bucket",
            "count",
        )
    )


def merge_quantile_sketches(df: DataFrame, group_cols: list[str]) -> DataFrame:
    """Fold sketch panels (e.g. per-epoch rows) into one sketch per
    group: a plain groupBy sum — associative, commutative, re-runnable."""
    return df.groupBy(*group_cols, "metric", "bucket").agg(
        F.sum("count").alias("count")
    )


def estimate_quantiles(
    df: DataFrame,
    quantiles: list[float],
    group_cols: list[str] | None = None,
    rel_err: float = 0.01,
) -> DataFrame:
    """(group_cols..., metric, q, value) — read quantiles off a
    quantile_sketch frame. The cumulative walk is a window over the
    BUCKET LIST of one group — bounded at the sketch's occupied-bucket
    count (log-spaced ⇒ thousands at most), so the sort inside each
    group is sketch-sized, never data-sized. ``rel_err`` must match the
    sketch's. Bucket i estimates value 2γ^i/(γ+1) (DDSketch midpoint);
    the zero bucket reads 0, negative buckets mirror."""
    from pyspark.sql import Window

    gamma = (1.0 + rel_err) / (1.0 - rel_err)
    gcols = list(group_cols or [])
    w = Window.partitionBy(*gcols, "metric").orderBy("bucket")
    tot = Window.partitionBy(*gcols, "metric")
    cum = df.withColumn("cum", F.sum("count").over(w)).withColumn(
        "total", F.sum("count").over(tot)
    )
    est = (
        F.when(F.col("bucket") == -(2**29), F.lit(0.0))
        .when(
            F.col("bucket") < -(2**29),
            -F.pow(F.lit(gamma), -(F.col("bucket") + F.lit(2**31 // 2)))
            * F.lit(2.0 * gamma / (gamma + 1.0)) / F.lit(gamma),
        )
        .otherwise(
            F.pow(F.lit(gamma), F.col("bucket"))
            * F.lit(2.0 / (gamma + 1.0))
        )
    )
    outs = []
    for q in quantiles:
        if not 0 <= q <= 1:
            raise ValueError(f"quantile {q} outside [0,1]")
        rank = F.ceil(F.lit(float(q)) * F.col("total"))
        picked = (
            cum.where(F.col("cum") >= F.greatest(rank, F.lit(1)))
            .groupBy(*gcols, "metric")
            .agg(F.min_by(est, F.col("bucket")).alias("value"))
            .select(*gcols, "metric", F.lit(float(q)).alias("q"), "value")
        )
        outs.append(picked)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
