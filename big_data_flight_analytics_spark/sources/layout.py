"""Multi-dimensional data layout: Z-order (Morton) clustered writes.

A table sorted by one column prunes scans on that column only; a
100 TB fact table is filtered on several. Z-ordering interleaves the
bits of the rank-normalized dimension values so rows close in ANY
filtered dimension land in the same files/row-groups — every
dimension's min/max file statistics become selective, which is the
whole mechanism behind Delta/Iceberg `OPTIMIZE ZORDER BY`.

Everything stays in-plan: per-column min/max come from one aggregate
crossJoined (broadcast) back onto the rows — no driver collect — and
the interleave is a pure JVM bit expression, so the only extra cost
over a plain sorted write is the range shuffle that clustering needs
anyway. The written files carry ordinary parquet min/max stats;
readers prune with zero reader-side cooperation (verified in
tests/test_layout.py by intersecting row-group stats with box
predicates).
"""

from __future__ import annotations

import functools
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _normalize(col: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Rank the value into [0, 2^bits): affine per the column's range.

    Constant columns map to 0 (the span guard); the top value maps to
    2^bits - 1 (LEAST clamp — floor((x-mn)/(mx-mn) * 2^bits) would hit
    2^bits exactly at x == mx). NULL values map to cell 0 explicitly —
    without the guard they would ride F.least's null-skipping into the
    TOP cell, widening that file's min/max stats on every dimension.
    """
    top = (1 << bits) - 1
    span = mx.cast("double") - mn.cast("double")
    scaled = F.floor(
        (col.cast("double") - mn.cast("double")) / span * F.lit(1 << bits)
    ).cast("long")
    return (
        F.when(col.isNull() | (span <= 0), F.lit(0))
        .otherwise(F.least(scaled, F.lit(top)))
    )


def _interleave(norm_cols: Sequence[Column], bits: int) -> Column:
    """Morton-interleave: bit b of column i -> output bit b*n + i."""
    n = len(norm_cols)
    terms = [
        F.shiftleft(
            F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + i
        )
        for b in range(bits)
        for i, c in enumerate(norm_cols)
    ]
    return functools.reduce(lambda a, t: a.bitwiseOR(t), terms)


def zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int = 16, out_col: str = "__zkey"
) -> DataFrame:
    """Attach the Morton key for ``cols`` (double-castable numerics;
    pre-derive date/timestamp dimensions to epoch numbers first —
    Spark does not cast DATE to DOUBLE).

    ``bits`` per dimension; total key width bits*len(cols) must stay
    <= 63 (2 cols x 16 bits = 32-bit keys is plenty — the key only
    needs enough resolution to separate file-sized buckets).
    """
    if bits * len(cols) > 63:
        raise ValueError("zorder key exceeds 63 bits; lower bits/cols")
    stats = df.agg(
        *[
            m(c).alias(f"__{name}_{c}")
            for c in cols
            for name, m in (("mn", F.min), ("mx", F.max))
        ]
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    norms = [
        _normalize(
            F.col(c), F.col(f"__mn_{c}"), F.col(f"__mx_{c}"), bits
        )
        for c in cols
    ]
    return with_stats.withColumn(out_col, _interleave(norms, bits)).drop(
        *[f"__{n}_{c}" for c in cols for n in ("mn", "mx")]
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    num_files: int,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``num_files`` parquet files clustered by Z-order.

    Range-partitioning on the Morton key gives each file a contiguous
    key interval, i.e. a small hyper-rectangle of the dimension space —
    that locality is what narrows every column's per-file min/max. At
    100 TB, set ``num_files`` from target file size (~1 GB), exactly
    like ``compact_parquet`` sizes its output.
    """
    keyed = zorder_key(df, cols, bits=bits)
    (
        keyed.repartitionByRange(num_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .parquet(path)
    )
