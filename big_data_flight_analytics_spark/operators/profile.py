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
    # Two-level distinct instead of count_distinct-alongside-other-aggs:
    # a mixed distinct/non-distinct aggregate makes Catalyst insert an
    # Expand that doubles every unpivoted row through the shuffle. The
    # per-(col, value) pre-aggregate carries all the same information
    # (row count = sum of value counts, nulls = the null group's count,
    # distinct = surviving non-null groups, min/max unchanged over
    # distinct values), map-side-combines low-cardinality columns
    # heavily, and never Expands. Measured ~1.9x on the 6-col orders
    # profile at sf0.1.
    per_value = unpivoted.groupBy("col_name", "v").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    return per_value.groupBy("col_name").agg(
        F.sum("__cnt").alias("n_rows"),
        F.sum(F.when(F.col("v").isNull(), F.col("__cnt")).otherwise(0)).alias(
            "n_nulls"
        ),
        F.count(F.when(F.col("v").isNotNull(), 1)).alias("n_distinct"),
        F.min("v").alias("min_val"),
        F.max("v").alias("max_val"),
    )
