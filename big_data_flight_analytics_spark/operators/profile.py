"""Table profiling: per-column stats in ONE pass over the data.

``profile`` canonicalizes every column to a comparable string, unpivots
(col_name, value) via a generator expression, and aggregates per
column — one scan + one shuffle regardless of column count, instead of
the naive one-job-per-column loop. At 100 TB the unpivot multiplies
rows by the column count but stays embarrassingly parallel and
map-side partial-aggregated; for very wide tables, profile column
groups in slices.

Canonicalization contract (keeps cross-engine parity and avoids
engine-specific float/timestamp formatting):
- integers/strings: plain string form;
- doubles: DECIMAL(18,2) string form;
- timestamps: epoch-micros string form.
min/max are therefore LEXICOGRAPHIC on the canonical form — a
documented profiling contract, not numeric min/max.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, TimestampNTZType, TimestampType


def canonical_string(df: DataFrame, col: str) -> Column:
    dt = df.schema[col].dataType
    c = F.col(col)
    if isinstance(dt, DoubleType):
        return c.cast("decimal(18,2)").cast("string")
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        return F.unix_micros(c.cast("timestamp")).cast("string")
    return c.cast("string")


def profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row per column: n_rows, n_nulls, n_distinct (exact, nulls
    excluded), lexicographic min/max of the canonical string form."""
    cols = cols or df.columns
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                canonical_string(df, c).alias("v"),
            )
            for c in cols
        ]
    )
    unpivoted = df.select(F.explode(entries).alias("e")).select(
        "e.col_name", "e.v"
    )
    return unpivoted.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).alias("n_nulls"),
        F.count_distinct(F.col("v")).alias("n_distinct"),
        F.min("v").alias("min_val"),
        F.max("v").alias("max_val"),
    )
