"""Core relational operators (SURVEY §2.2-2.7).

Design rules for 100 TB:
- aggregation stays partial+final (map-side combine) — never collect;
- global statistics join back via ``crossJoin(broadcast(agg))`` instead
  of an unpartitioned analytic window (``over ()`` forces ALL rows into
  one partition — the reference does this at batch_process.py:65-69 and
  it would not survive scale);
- top-k goes through ``orderBy().limit()`` which Catalyst executes as
  TakeOrderedAndProject (per-partition heaps + driver merge of k rows,
  no total sort).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def count_if(pred: Column, alias: str | None = None) -> Column:
    """Conditional count: ``count(when(pred, 1))`` — nulls/False excluded.

    Exact null semantics of the reference's conditional counts
    (reference: batch_process.py:19,104,146,174,190,196): a null
    predicate contributes nothing.
    """
    c = F.count(F.when(pred, F.lit(1)))
    return c.alias(alias) if alias else c


def group_count(df: DataFrame, keys: Sequence[str], alias: str = "cnt") -> DataFrame:
    """Hash-aggregate count per key group (partial+final via Catalyst)."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(alias))


def having(df: DataFrame, pred: Column) -> DataFrame:
    """Post-aggregation filter (HAVING). Catalyst keeps it after the agg.

    reference: batch_process.py:21,42,59,110,147,177,197,232 —
    ``.filter(FlightCount > MIN_FLIGHTS_THRESHOLD)``.
    """
    return df.filter(pred)


def add_global_stats(
    df: DataFrame,
    stats: dict[str, Column],
    use_window: bool = False,
) -> DataFrame:
    """Attach global aggregates (min/max/sum over the whole frame) as columns.

    Scale path (default): compute the 1-row aggregate and
    ``crossJoin(broadcast(...))`` — stays fully partitioned. The
    ``use_window=True`` path reproduces the reference's unpartitioned
    ``over ()`` window (reference: batch_process.py:65-69) for parity
    testing; it funnels every row through a single partition and must not
    be used at scale.
    """
    if use_window:
        w = Window.partitionBy()
        out = df
        for name, col in stats.items():
            out = out.withColumn(name, col.over(w))
        return out
    agg_row = df.agg(*[col.alias(name) for name, col in stats.items()])
    return df.crossJoin(F.broadcast(agg_row))


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Top-k rows by compound order -> Catalyst TakeOrderedAndProject.

    Pass a deterministic tie-break (e.g. the key ascending) so results
    are stable for oracle comparison.
    reference: batch_process.py:85 (``orderBy(desc).limit(10)``).
    """
    return df.orderBy(*order).limit(k)


def unpivot(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "name",
    value_name: str = "value",
    labels: dict[str, str] | None = None,
) -> DataFrame:
    """k measure columns -> (label, value) rows via ``stack`` (R1/R2).

    reference: batch_process.py:125-135 (delay reasons) and 216-228
    (Div1..Div5 airports). Generates a single projection — no shuffle,
    no explode of intermediate arrays.
    """
    labels = labels or {}
    pairs = ", ".join(
        f"'{labels.get(c, c)}', `{c}`" for c in value_cols
    )
    stack_expr = f"stack({len(value_cols)}, {pairs}) as (`{var_name}`, `{value_name}`)"
    return df.select(*id_cols, F.expr(stack_expr))


def bucketize(
    df: DataFrame,
    col: str,
    edges: Sequence[float],
    labels: Sequence[str],
    out: str = "bucket",
) -> DataFrame:
    """Right-exclusive binning of a continuous column into labeled buckets.

    Matches ml.feature.Bucketizer semantics the reference uses
    (reference: batch_process.py:160-170): bucket i covers
    [edges[i], edges[i+1]); the last bucket may be open-ended
    (edges[-1] = inf). Implemented as a native when-chain so it stays in
    codegen and is expressible as oracle CASE SQL (the ml.Bucketizer
    would be a black box to the oracle).
    """
    assert len(labels) == len(edges) - 1
    c = F.col(col)
    expr: Column | None = None
    for i, label in enumerate(labels):
        lo, hi = edges[i], edges[i + 1]
        cond = (c >= lo) if hi == float("inf") else (c >= lo) & (c < hi)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    assert expr is not None
    return df.withColumn(out, expr)


def minmax_normalize(
    df: DataFrame,
    col: str,
    out: str,
    dp: int = 4,
    use_window: bool = False,
) -> DataFrame:
    """Min-max normalize a column to [0,1] with span guard (A8).

    reference: aircrafts_lookup_to_kafka.py:47-59 — two-pass
    collect-then-apply there; here one plan via broadcast cross join
    (or the window path for parity testing). Span guarded to 1.0 when
    max <= min; null inputs coalesce to 0 before normalizing.
    """
    from big_data_flight_analytics_spark.functions.scalar import minmax_normalize_expr

    c = F.col(col)
    df2 = add_global_stats(
        df,
        {"__mn": F.min(c), "__mx": F.max(c)},
        use_window=use_window,
    )
    return df2.withColumn(
        out, minmax_normalize_expr(c, F.col("__mn"), F.col("__mx"), dp)
    ).drop("__mn", "__mx")


def mode_per_group(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    tie_break: Sequence[Column] | None = None,
    carry: dict[str, Column] | None = None,
) -> DataFrame:
    """Most frequent ``value`` per key group with deterministic tie-break (A9).

    reference: flights_lookup_to_kafka.py:30-46 — count per (key, value),
    then ``row_number() over (partition by key order by cnt desc,
    value asc)`` and keep rn = 1. ``carry`` aggregates extra columns
    through the count (reference uses ``F.first``).

    Scale note: two shuffles (count, then window by key). The window
    partitions by the group key — never unpartitioned — so it scales with
    key cardinality.
    """
    carry = carry or {}
    counted = df.groupBy(*keys, value).agg(
        F.count(F.lit(1)).alias("__cnt"),
        *[expr.alias(name) for name, expr in carry.items()],
    )
    order = [F.col("__cnt").desc()] + list(tie_break or [F.col(value).asc()])
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        counted.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__cnt")
    )
