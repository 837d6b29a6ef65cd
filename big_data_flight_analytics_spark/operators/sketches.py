"""Mergeable exact-grain histogram sketch: single-pass distribution
stats under the incremental ingest contract (a11/i6/a12).

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
