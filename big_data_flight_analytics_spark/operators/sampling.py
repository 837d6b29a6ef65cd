"""Deterministic sampling operators (training-data pipeline).

Reproducible corpus subsampling: every decision is a pure function of
the row key (md5-bucket), never of partitioning, task order, or an RNG
— rerunning the pipeline on re-shuffled input selects the identical
rows, which is what makes dataset cards and ablations reproducible.
Contrast with ``DataFrame.sample``/``sampleBy``, whose Bernoulli draw
depends on partition layout.

Map-only except for the broadcast of the (tiny) per-stratum rate table
— at 100 TB this is a single pass over the scan with no shuffle.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 100


def md5_bucket(key: Column, buckets: int = BUCKETS) -> Column:
    """Deterministic [0, buckets) bucket from a key column: first 4 hex
    digits of md5, decoded. Same construction as the train/val split
    (``t2``), so one hash family governs all sampling decisions."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10).cast("long")
        % buckets
    )


def stratified_sample(
    df: DataFrame,
    rates: Mapping[str, int],
    key_col: str = "doc_id",
    strata_col: str = "lang",
    default_pct: int = 100,
) -> DataFrame:
    """Keep ``rates[stratum]`` percent of each stratum (default
    ``default_pct`` for unlisted strata), chosen deterministically by
    key hash.

    The standard corpus-rebalancing op: downsample the dominant
    language/source without touching the rest. The rate table is a
    broadcast dimension (one row per stratum), so the plan is
    scan → broadcast-left-join → filter: no shuffle of the fact side,
    and Catalyst pushes column pruning through.
    """
    spark = df.sparkSession
    rates_df = spark.createDataFrame(
        [(k, int(v)) for k, v in sorted(rates.items())],
        f"{strata_col} string, pct int",
    )
    kept = (
        df.join(F.broadcast(rates_df), strata_col, "left")
        .withColumn("pct", F.coalesce(F.col("pct"), F.lit(int(default_pct))))
        .where(md5_bucket(F.col(key_col)) < F.col("pct"))
        .drop("pct")
    )
    # restore the caller's column order (the join moved strata_col first)
    return kept.select(*df.columns)
