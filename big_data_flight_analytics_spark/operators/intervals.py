"""Interval (range) join: facts whose timestamp falls inside intervals.

Spark has no native range-join optimization, so a naive
``facts.join(intervals, ts BETWEEN start AND end)`` plans as a
nested-loop join — fine when the interval side broadcasts, quadratic
disaster otherwise. Two modes, same results:

- broadcast mode (small interval tables): BroadcastNestedLoopJoin with
  the BETWEEN predicate — each fact partition scans the in-memory
  interval list, no shuffle.
- grain mode (the 100 TB path): every interval is exploded into the
  calendar grains (days) it covers and facts carry their grain, turning
  the theta join into an EQUI-join on grain + exact BETWEEN residual.
  Work scales with |facts| + |intervals| * span/grain, and the join
  shuffles hash-partitioned on grain like any equi-join. (The same
  bucketing trick as the latitude-banded geo join — `operators/geo.py`.)

Intervals spanning many grains multiply the exploded side only (facts
never duplicate); pick the grain so typical spans cover tens of grains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# above this many intervals, default to the grain equi-join
BROADCAST_INTERVAL_THRESHOLD = 10_000


def interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str = "iv_start",
    end_col: str = "iv_end",
    use_grain: bool | None = None,
    interval_count: int | None = None,
) -> DataFrame:
    """Inner-join facts to every interval containing ``ts_col``
    (inclusive bounds). Output: fact columns + interval columns.

    ``use_grain=None`` decides from ``interval_count`` (pass it from
    catalog statistics at scale) or a one-off count job.
    """
    if use_grain is None:
        if interval_count is None:
            interval_count = intervals.count()
        use_grain = interval_count > BROADCAST_INTERVAL_THRESHOLD

    between = (F.col(ts_col) >= F.col(start_col)) & (
        F.col(ts_col) <= F.col(end_col)
    )
    if not use_grain:
        return facts.crossJoin(F.broadcast(intervals)).filter(between)

    # inverted intervals (end < start) match nothing in broadcast mode;
    # filter them here too, because sequence() THROWS on a negative
    # span — both modes must agree that they are simply empty
    grains = intervals.filter(F.col(start_col) <= F.col(end_col)).withColumn(
        "__grain",
        F.explode(
            F.sequence(
                F.date_trunc("day", F.col(start_col)),
                F.date_trunc("day", F.col(end_col)),
                F.expr("INTERVAL 1 DAY"),
            )
        ),
    )
    keyed = facts.withColumn("__grain", F.date_trunc("day", F.col(ts_col)))
    return keyed.join(grains, "__grain").filter(between).drop("__grain")
