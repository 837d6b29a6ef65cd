"""Mergeable sketches: single-pass distribution stats under the
incremental ingest contract.

Two families live here:

* the exact-grain HISTOGRAM sketch (a11/i6/a12) — quantiles from a
  fixed-grain integer histogram;
* the KMV (k-minimum-values) DISTINCT sketch (a13/i7) — distinct
  counts from the k smallest 60-bit value hashes (Bar-Yossef et al.
  2002; the Theta-sketch family's deterministic core).

The 100 TB answer for quantiles is a mergeable sketch, not a sort:
one corpus pass builds per-partition partial histograms that combine
map-side, and arriving batches fold into the stored state with one
tiny full-outer sum — the i1-i5 contract (state is O(value_range /
grain), corpus-size-independent; the corpus is never rescanned).
t-digest/KLL give approximate ranks and engine-specific merges; the
FIXED-GRAIN integer histogram gives exact bucket-resolution answers
(quantile = the grain-aligned lower bound of the bucket holding the
target rank) from arithmetic both engines reproduce bit-exactly —
which is what keeps the operator under the DuckDB hash gate instead
of a weaker rows-only check.

Every quantity is int64: bucket = FLOOR(value / grain) as
floor-of-double division (engine-identical for |value| < 2^53, the
r8 rule — plain integer div truncates toward zero and diverges on
negatives), target rank = ceil(q*N/100) as FLOOR((q*N + 99) / 100),
answer bucket = MIN(bucket) with cumulative count >= target.

Scale shape: the histogram build is one map-side-combined groupBy
(the only corpus-sized shuffle, and it moves <= n_buckets rows per
task); the quantile pass runs entirely on the sketch. All three
operators take optional ``group_cols`` — the GROUPED sketch (the
"p99 per tenant" production ask) keeps state O(groups x buckets),
folds the same way on the composite key, and its cumulative window
is PARTITIONED by group (scales with groups; only the ungrouped form
uses the documented sketch-sized global window, the w5 class).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_QS = (1, 5, 25, 50, 75, 90, 95, 99)


def fixed_grain_histogram(
    df: DataFrame,
    value_col: str,
    grain: int,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(*group_cols, bucket, cnt) over an int64 value column: the
    persisted sketch state. NULL values carry no distribution
    information and are excluded (both engines agree: GROUP BY would
    keep a NULL bucket, so the filter is explicit). Callers scale
    non-integer measures to an integer grain first (e.g. dollars ->
    cents)."""
    v = F.col(value_col)
    return (
        df.filter(v.isNotNull())
        .select(
            *group_cols,
            F.floor(v.cast("double") / F.lit(grain))
            .cast("long")
            .alias("bucket"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def histogram_fold(
    base: DataFrame,
    delta: DataFrame,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Fold a delta histogram into the stored one: one full-outer sum
    over <= 2 x state rows — O(state), corpus-independent, associative
    and commutative (counts are additive), so any split of the corpus
    folds to the same sketch as one pass over the union. Grouped
    sketches fold on the composite (group, bucket) key."""
    keys = [*group_cols, "bucket"]
    b = base.select(*keys, F.col("cnt").alias("__b"))
    d = delta.select(*keys, F.col("cnt").alias("__d"))
    return b.join(d, keys, "full").select(
        *keys,
        (
            F.coalesce(F.col("__b"), F.lit(0))
            + F.coalesce(F.col("__d"), F.lit(0))
        ).alias("cnt"),
    )


def histogram_quantiles(
    hist: DataFrame,
    grain: int,
    qs: tuple[int, ...] = DEFAULT_QS,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exact-grain quantiles from the sketch: for each integer
    percentage q (and each group, if grouped), the smallest bucket
    whose cumulative count reaches rank ceil(q*N/100) (the
    inverse-CDF / lower-bound convention), with N the (per-group)
    total count.

    Output: (*group_cols, q, target_rank, bucket, lo) — ``lo`` =
    bucket * grain is the grain-aligned lower bound of the value range
    holding the target rank; all non-group columns BIGINT. Empty input
    yields no rows.

    Runs on sketch-sized input only. Ungrouped, the cumulative window
    is the documented sketch-sized global window (w5 class: O(n_buckets)
    rows regardless of corpus); grouped, it is PARTITIONED by the
    group columns and scales with them."""
    spark = hist.sparkSession
    gcols = list(group_cols)
    w = (
        Window.partitionBy(*gcols) if gcols else Window
    ).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        *gcols, "bucket", F.sum("cnt").over(w).cast("long").alias("cum")
    )
    if gcols:
        totals = hist.groupBy(*gcols).agg(
            F.sum("cnt").cast("long").alias("total")
        )
    else:
        totals = hist.agg(F.sum("cnt").cast("long").alias("total"))
    qdf = spark.createDataFrame([(int(q),) for q in qs], "q long")
    targets = totals.crossJoin(F.broadcast(qdf)).select(
        *gcols,
        "q",
        F.floor(
            (F.col("q") * F.col("total") + F.lit(99)).cast("double")
            / F.lit(100)
        )
        .cast("long")
        .alias("target_rank"),
    )
    if gcols:
        joined = cum.join(
            targets, gcols
        ).filter(F.col("cum") >= F.col("target_rank"))
    else:
        joined = cum.join(
            F.broadcast(targets), F.col("cum") >= F.col("target_rank")
        )
    return (
        joined.groupBy(*gcols, "q", "target_rank")
        .agg(F.min("bucket").cast("long").alias("bucket"))
        .select(
            *gcols,
            "q",
            "target_rank",
            "bucket",
            (F.col("bucket") * F.lit(grain)).cast("long").alias("lo"),
        )
    )


# ---------------------------------------------------------------------------
# KMV distinct sketch (a13/i7): k smallest distinct 60-bit hashes.
# ---------------------------------------------------------------------------

# 60-bit hash space: conv(substring(md5(x),1,15),16,10) — the house
# cross-engine hash (t20/d19 pattern: DuckDB mirrors it with
# CAST('0x'||substring(md5(x),1,15) AS BIGINT)). 60 bits keep birthday
# collisions negligible (~N^2/2^61) while every derived quantity stays
# inside exact int64/decimal arithmetic in BOTH engines.
KMV_HASH_SCALE = 1 << 60  # 1152921504606846976


def _kmv_hash(value_col: str):
    return F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
    ).cast("long")


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    k: int,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(*group_cols, rank, h): the k smallest DISTINCT 60-bit hashes
    of ``value_col`` per group — the persisted sketch state
    (<= k rows per group, corpus-size-independent). NULL values carry
    no cardinality information and are excluded.

    Scale shape: ONE corpus-sized shuffle. Rows first pass a
    per-(group, upstream-partition) prune — dense_rank over each cell
    keeps only that cell's k smallest distinct hashes, so at most
    k x n_partitions candidate values (plus their duplicates) survive
    to the sketch-sized distinct + final ranking. The global k
    smallest distinct hashes are each among their own cell's k
    smallest, so the prune is lossless under ANY partitioning — the
    output is partitioning-invariant (pinned by test). The ungrouped
    final window is the documented sketch-sized global-window class
    (w5/a11): O(k x n_partitions) rows regardless of corpus."""
    gcols = list(group_cols)
    hashed = df.filter(F.col(value_col).isNotNull()).select(
        *gcols, _kmv_hash(value_col).alias("h")
    )
    cell = Window.partitionBy(*gcols, "__pid").orderBy("h")
    cand = (
        hashed.withColumn("__pid", F.spark_partition_id())
        .withColumn("__dr", F.dense_rank().over(cell))
        .filter(F.col("__dr") <= k)
        .select(*gcols, "h")
        .distinct()
    )
    w = (Window.partitionBy(*gcols) if gcols else Window).orderBy("h")
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(*gcols, "rank", "h")
    )


def kmv_fold(
    base: DataFrame,
    delta: DataFrame,
    k: int,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Fold a delta sketch into the stored one: set-union of the two
    hash sets, keep the k smallest — O(state) work over <= 2k rows per
    group, corpus-independent. The fold is associative, commutative,
    AND idempotent (union of sets): re-folding an already-absorbed
    delta is a no-op, so a replayed micro-batch cannot corrupt the
    state — unlike the additive histogram fold, which needs replay
    markers (streaming/sinks.py HistogramSink)."""
    gcols = list(group_cols)
    u = (
        base.select(*gcols, "h")
        .union(delta.select(*gcols, "h"))
        .distinct()
    )
    w = (Window.partitionBy(*gcols) if gcols else Window).orderBy("h")
    return (
        u.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(*gcols, "rank", "h")
    )


def kmv_estimate(
    sketch: DataFrame,
    k: int,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(*group_cols, sketch_n, kth_hash, n_distinct_est) from the
    sketch state. With fewer than k distinct values the sketch IS the
    distinct set (estimate = sketch_n, exact); at capacity the
    unbiased KMV estimator is (k-1) * 2^60 / h_(k), evaluated with
    EXACT integer arithmetic both engines reproduce bit-identically:
    Spark DECIMAL(38,0) `div` == DuckDB HUGEINT `//` (truncating
    integral division; all operands positive). Relative error ~
    1/sqrt(k-2). GREATEST(kth_hash, 1) guards the 2^-60 h=0 corner
    without changing any realizable estimate (h=0 would make rank-1
    smaller anyway). Runs on sketch-sized input only."""
    gcols = list(group_cols)
    aggs = [
        F.coalesce(F.max("rank"), F.lit(0)).cast("long").alias("sketch_n"),
        F.max("h").cast("long").alias("kth_hash"),
    ]
    agg = sketch.groupBy(*gcols).agg(*aggs) if gcols else sketch.agg(*aggs)
    est_at_capacity = F.expr(
        f"CAST(CAST({k - 1} AS DECIMAL(38,0))"
        f" * CAST({KMV_HASH_SCALE} AS DECIMAL(38,0)) AS DECIMAL(38,0))"
        " div GREATEST(kth_hash, 1)"
    ).cast("long")
    return agg.select(
        *gcols,
        "sketch_n",
        "kth_hash",
        F.when(F.col("sketch_n") < k, F.col("sketch_n"))
        .otherwise(est_at_capacity)
        .cast("long")
        .alias("n_distinct_est"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch (a14/i8): fixed-size additive frequency grid.
# ---------------------------------------------------------------------------

CMS_DEPTH = 3


def _cms_bucket(value, j: int, width: int):
    """Row-j bucket for a value: salted 60-bit md5 hash mod width.
    The salt prefix makes the depth rows independent hash functions;
    both engines reproduce the hash (house md5 pattern) and the mod
    (non-negative operands) bit-identically."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{j}:"), value.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_sketch(
    df: DataFrame,
    value_col: str,
    width: int,
    depth: int = CMS_DEPTH,
    group_cols: tuple[str, ...] = (),
    weight_col: str | None = None,
) -> DataFrame:
    """(row_j, bucket, cnt): the count-min grid (Cormode & Muthukrishnan
    2005) — depth x width int64 counters, the persisted sketch state.
    Point-frequency estimates min over the depth rows; overestimates
    only (collisions add, never subtract), error <= 2N/width with
    probability 1 - (1/2)^depth.

    Scale shape: one map-side-combined groupBy over the posexploded
    (row, bucket) pairs — each task emits <= depth x width partial rows
    no matter the corpus; state is corpus-size-independent. Folds
    additively (histogram_fold class: NOT idempotent — streaming faces
    need replay markers).

    ``weight_col`` sketches a PRE-AGGREGATED (value, weight) frame:
    cnt becomes SUM(weight) per cell, which equals counting the raw
    occurrences the weights summarize (integer addition is
    associative). a14/a17 use it to sketch their per-term count frame
    — the corpus posting is exploded once for the counts and never
    again for the grid."""
    gcols = list(group_cols)
    v = F.col(value_col)
    grid = F.array(*[_cms_bucket(v, j, width) for j in range(depth)])
    base = df.filter(v.isNotNull()).select(
        *gcols,
        *([weight_col] if weight_col else []),
        F.posexplode(grid).alias("row_j", "bucket"),
    )
    cnt = (
        F.count(F.lit(1)) if weight_col is None else F.sum(weight_col)
    )
    return (
        base.select(
            *gcols,
            *([weight_col] if weight_col else []),
            F.col("row_j").cast("long").alias("row_j"),
            "bucket",
        )
        .groupBy(*gcols, "row_j", "bucket")
        .agg(cnt.cast("long").alias("cnt"))
    )


def cms_fold(
    base: DataFrame,
    delta: DataFrame,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Fold a delta grid into the stored one: full-outer sum on
    (*group_cols, row_j, bucket) — O(groups x depth x width),
    corpus-independent, associative and commutative (counts are
    additive). Grouped grids fold on the composite key."""
    keys = [*group_cols, "row_j", "bucket"]
    b = base.select(*keys, F.col("cnt").alias("__b"))
    d = delta.select(*keys, F.col("cnt").alias("__d"))
    return b.join(d, keys, "full").select(
        *keys,
        (
            F.coalesce(F.col("__b"), F.lit(0))
            + F.coalesce(F.col("__d"), F.lit(0))
        ).alias("cnt"),
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    value_col: str,
    width: int,
    depth: int = CMS_DEPTH,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(value_col, n_cms) for each query value: min over the value's
    depth bucket counters (0 when a counter was never touched — only
    possible for values absent from the sketched corpus). Sketch-sized
    work: queries x depth probe rows joined against the broadcast
    depth x width grid."""
    gcols = list(group_cols)
    v = F.col(value_col)
    grid = F.array(*[_cms_bucket(v, j, width) for j in range(depth)])
    probes = queries.select(
        *gcols, value_col, F.posexplode(grid).alias("row_j", "bucket")
    ).select(
        *gcols,
        value_col,
        F.col("row_j").cast("long").alias("row_j"),
        "bucket",
    )
    return (
        probes.join(
            F.broadcast(sketch), [*gcols, "row_j", "bucket"], "left"
        )
        .groupBy(*gcols, value_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("n_cms")
        )
    )


def kmv_set_overlap(
    sketch_a: DataFrame, sketch_b: DataFrame, k: int
) -> DataFrame:
    """One row of set-algebra estimates from two KMV sketches (the
    Theta-sketch use case: audience overlap between corpora that never
    co-shuffle): (sketch_n, kth_hash, n_union_est, n_both,
    n_intersect_est).

    The folded union sketch's k smallest hashes are a uniform sample
    of A ∪ B; ``n_both`` of them appearing in BOTH input sketches
    estimates the Jaccard fraction, so |A ∩ B| ~= n_both * |A ∪ B| /
    sketch_n — evaluated with the same exact DECIMAL-div arithmetic as
    the cardinality estimator (bit-identical cross-engine). Under
    capacity the union sketch IS the union set and every figure is
    exact. All inputs are sketch-sized; every join broadcasts."""
    union = kmv_fold(sketch_a, sketch_b, k)
    a = sketch_a.select("h", F.lit(1).alias("__a"))
    b = sketch_b.select("h", F.lit(1).alias("__b"))
    marked = union.join(F.broadcast(a), "h", "left").join(
        F.broadcast(b), "h", "left"
    )
    agg = marked.agg(
        F.coalesce(F.max("rank"), F.lit(0)).cast("long").alias("sketch_n"),
        F.max("h").cast("long").alias("kth_hash"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("__a").isNotNull() & F.col("__b").isNotNull(), 1
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("n_both"),
    )
    union_est = F.expr(
        f"CAST(CAST({k - 1} AS DECIMAL(38,0))"
        f" * CAST({KMV_HASH_SCALE} AS DECIMAL(38,0)) AS DECIMAL(38,0))"
        " div GREATEST(kth_hash, 1)"
    ).cast("long")
    with_union = agg.select(
        "sketch_n",
        "kth_hash",
        "n_both",
        F.when(F.col("sketch_n") < k, F.col("sketch_n"))
        .otherwise(union_est)
        .cast("long")
        .alias("n_union_est"),
    )
    return with_union.select(
        "sketch_n",
        "kth_hash",
        "n_union_est",
        "n_both",
        F.expr(
            "CAST(CAST(n_both AS DECIMAL(38,0))"
            " * CAST(n_union_est AS DECIMAL(38,0)) AS DECIMAL(38,0))"
            " div GREATEST(sketch_n, 1)"
        )
        .cast("long")
        .alias("n_intersect_est"),
    )
