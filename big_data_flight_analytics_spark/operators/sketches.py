"""Mergeable exact-grain histogram sketch: single-pass distribution
stats under the incremental ingest contract (a11/i6).

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
task); the quantile pass runs entirely on the sketch — the global
cumulative-sum window is over O(value_range/grain) rows no matter
the corpus (the w5 class: a documented unpartitioned window over
state-sized, not data-sized, input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_QS = (1, 5, 25, 50, 75, 90, 95, 99)


def fixed_grain_histogram(
    df: DataFrame, value_col: str, grain: int
) -> DataFrame:
    """(bucket, cnt) over an int64 value column: the persisted sketch
    state. NULL values carry no distribution information and are
    excluded (both engines agree: GROUP BY would keep a NULL bucket,
    so the filter is explicit). Callers scale non-integer measures to
    an integer grain first (e.g. dollars -> cents)."""
    v = F.col(value_col)
    return (
        df.filter(v.isNotNull())
        .select(
            F.floor(v.cast("double") / F.lit(grain))
            .cast("long")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def histogram_fold(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a delta histogram into the stored one: one full-outer sum
    over <= 2 x n_buckets sparse rows — O(state), corpus-independent,
    associative and commutative (counts are additive), so any split
    of the corpus folds to the same sketch as one pass over the
    union."""
    b = base.select("bucket", F.col("cnt").alias("__b"))
    d = delta.select("bucket", F.col("cnt").alias("__d"))
    return b.join(d, "bucket", "full").select(
        "bucket",
        (
            F.coalesce(F.col("__b"), F.lit(0))
            + F.coalesce(F.col("__d"), F.lit(0))
        ).alias("cnt"),
    )


def histogram_quantiles(
    hist: DataFrame, grain: int, qs: tuple[int, ...] = DEFAULT_QS
) -> DataFrame:
    """Exact-grain quantiles from the sketch: for each integer
    percentage q, the smallest bucket whose cumulative count reaches
    rank ceil(q*N/100) (the inverse-CDF / lower-bound convention).

    Output: (q, target_rank, bucket, lo) — ``lo`` = bucket * grain is
    the grain-aligned lower bound of the value range holding the
    target rank; all BIGINT. Empty input yields no rows.

    Runs on sketch-sized input only: the cumulative window and the
    one-row total are over O(n_buckets) rows regardless of corpus
    size — the documented global-window exception (w5 class)."""
    spark = hist.sparkSession
    cum = hist.select(
        "bucket",
        F.sum("cnt")
        .over(
            Window.orderBy("bucket").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .cast("long")
        .alias("cum"),
    )
    total = hist.agg(F.sum("cnt").cast("long").alias("total"))
    targets = (
        spark.createDataFrame([(int(q),) for q in qs], "q long")
        .crossJoin(F.broadcast(total))
        .select(
            "q",
            F.floor(
                (F.col("q") * F.col("total") + F.lit(99)).cast("double")
                / F.lit(100)
            )
            .cast("long")
            .alias("target_rank"),
        )
    )
    return (
        cum.join(F.broadcast(targets), F.col("cum") >= F.col("target_rank"))
        .groupBy("q", "target_rank")
        .agg(F.min("bucket").cast("long").alias("bucket"))
        .select(
            "q",
            "target_rank",
            "bucket",
            (F.col("bucket") * F.lit(grain)).cast("long").alias("lo"),
        )
    )
