"""Skew-mitigation operators: salted aggregation and salted joins.

At 100 TB a handful of hot keys (one mega-airline, one mega-customer)
can make a single reducer the whole job's critical path. AQE's skew-join
splitting handles sort-merge joins at runtime; for aggregations and
pre-AQE planning the classic remedy is salting:

- salted aggregation: two-stage — group on (key, salt) for partial
  results spread over N reducers, then re-group on key to combine.
  Results are identical to the direct groupBy (both paths are tested
  equal); only the shuffle layout changes.
- salted broadcast-side join: replicate the small side N times with a
  salt column so a hot fact key spreads over N partitions.

For algebraic measures (count/sum/min/max) the two-stage combine is
exact. Non-decomposable measures (exact distinct, medians) need a
different strategy (e.g. two-level distinct: dedup on (key, value)
first).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_group_count(
    df: DataFrame, keys: Sequence[str], alias: str = "cnt", salt_buckets: int = 16
) -> DataFrame:
    """Exact group-count via two-stage salted aggregation.

    Stage 1 groups on (keys..., salt) — a hot key's rows spread over
    ``salt_buckets`` reducers; stage 2 sums the partials per key. The
    result equals ``group_count`` exactly.
    """
    salt = (F.spark_partition_id() % salt_buckets).alias("__salt")
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("__partial").alias(alias))


def salted_group_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    combine_aggs: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """General two-stage salted aggregation for algebraic measures.

    ``partial_aggs``: name -> agg expression for stage 1 (per key+salt).
    ``combine_aggs``: name -> agg expression over the stage-1 columns.
    e.g. sum -> sum(partial_sum); count -> sum(partial_count);
    min -> min(partial_min); avg -> sum(partial_sum)/sum(partial_count).
    """
    salt = (F.spark_partition_id() % salt_buckets).alias("__salt")
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[expr.alias(name) for name, expr in partial_aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in combine_aggs.items()]
    )


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "left",
) -> DataFrame:
    """Equi-join with the dim side replicated per salt bucket.

    For shuffle joins with one hot fact key: fact rows get a random-ish
    deterministic salt; the dim side is exploded into every salt value
    so each (key, salt) partition finds its match. With a broadcast dim
    this is usually unnecessary (no shuffle at all) — provided for the
    case where the dim exceeds broadcast size but a fact key is hot.

    Only ``inner`` and ``left`` are supported: the dim side exists
    ``salt_buckets`` times, so right/full outer modes would emit each
    unmatched dim row once per salt value.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_broadcast_join supports how='inner'|'left', got {how!r}: "
            "the replicated dim side would duplicate unmatched rows in "
            "outer modes"
        )
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    salted_dim = dim.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<long>")),
    )
    out = salted_fact.join(salted_dim, [key, "__salt"], how)
    return out.drop("__salt")
