"""Distributed global ranking — total-order analytics WITHOUT an
unpartitioned window.

``Window.orderBy(...)`` with no partitionBy funnels the whole dataset
through ONE task — the classic 100 TB killer. This operator computes
exact global row numbers with only distributed shuffles:

1. ``repartitionByRange`` on the order key — each partition holds a
   contiguous key range (Spark samples ranges; data stays distributed);
2. per-partition local row numbers — a window PARTITIONED by the range
   partition id (hash exchange on pid keeps partitions intact and every
   task ranks only its own slice);
3. per-partition counts -> cumulative offsets (one tiny row per
   partition, aggregated on the driver-sized side and broadcast back);
4. global row number = partition offset + local row number.

Rank-family analytics (ntile, percent_rank, cume_dist) then derive
arithmetically from (row_number, total) when the order is total (no
ties) — integer ratios, bit-exact across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_numbers(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global row numbers by ``order_cols`` (must be a
    total order for deterministic output), no single-task sort."""
    parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    ranged = df.repartitionByRange(
        int(parts), *[F.col(c).asc() for c in order_cols]
    ).withColumn("__pid", F.spark_partition_id())
    w_local = Window.partitionBy("__pid").orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    local = ranged.withColumn("__lrn", F.row_number().over(w_local))
    # one row PER PARTITION (32-ish rows): the cumulative window below
    # is over partition ids, not data — driver-scale, not a funnel
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        local.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn("__off", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)))
        .select("__pid", "__off")
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.col("__off") + F.col("__lrn"))
        .drop("__pid", "__lrn", "__off")
    )


def ntile_from_rn(rn: Column, n: Column, buckets: int) -> Column:
    """SQL-standard ntile from a (ties-free) row number and total count:
    the first ``n % buckets`` tiles get ``n div buckets + 1`` rows."""
    q = F.floor(n / buckets)
    r = n % buckets
    cut = r * (q + 1)
    return (
        F.when(rn <= cut, F.floor((rn - 1) / (q + 1)) + 1)
        .otherwise(r + F.floor((rn - cut - 1) / q) + 1)
        .cast("int")
    )
