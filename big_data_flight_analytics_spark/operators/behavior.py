"""Behavioral analytics over event streams: ordered funnels and
cohort retention.

Both are classic product-analytics jobs that a general analytics
engine is expected to run over raw event logs at full scale (the
reference's events surface stops at windowed counts — these extend it
the way the dedup/ANN family extends the documents surface).

Scale shapes:

- ``ordered_funnel`` — one user-keyed aggregation per funnel step,
  each preceded by an event-type filter that pushes to the scan.
  Every stage frame is keyed by user id, so the step joins are
  co-partitioned after the first shuffle and AQE is free to broadcast
  the (shrinking) reached-user frames. Steps are strictly ORDERED:
  step k counts only events after the user's step-(k-1) timestamp —
  the semantics min-per-type-then-compare gets wrong whenever a user
  has the later event type both before and after the earlier step.
- ``weekly_retention`` — two user-keyed aggregations (first-seen day,
  distinct active days) and one small-key aggregation over
  (cohort, offset). Day-grain dedup happens BEFORE the join, so the
  join input is bounded by users x active-days, not raw event volume.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ordered_funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Count users reaching each step of an ordered event funnel.

    A user reaches step k iff they have a ``steps[k]`` event strictly
    after their (earliest-completion) step k-1 timestamp; the earliest
    such event becomes their step-k timestamp. Earliest-completion
    timestamps make the funnel deterministic and give each user the
    best possible chance of completing later steps.

    Output: one row per step — (step_idx, step, n_users).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    stage = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t"))
    )
    counts = [stage]
    for step in steps[1:]:
        stage = (
            events.filter(F.col(type_col) == step)
            .join(stage.select(user_col, F.col("__t").alias("__prev")), user_col)
            .filter(F.col(ts_col) > F.col("__prev"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("__t"))
        )
        counts.append(stage)
    rows = [
        frame.agg(
            F.lit(i + 1).cast("int").alias("step_idx"),
            F.lit(step).alias("step"),
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
        )
        for i, (step, frame) in enumerate(zip(steps, counts))
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def weekly_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix at week granularity.

    Users are cohorted by their first active DAY (calendar-agnostic:
    week offsets are ``floor(days_since_first / 7)``, so the matrix
    never depends on engine-specific week-start conventions). A user
    counts as retained in offset w iff they were active on any day in
    ``[first + 7w, first + 7w + 7)``.

    Output: (cohort_day, week_offset, n_users).
    """
    day = F.to_date(F.col(ts_col))
    first = events.groupBy(user_col).agg(F.min(day).alias("cohort_day"))
    active = events.select(F.col(user_col), day.alias("__day")).distinct()
    return (
        active.join(first, user_col)
        .select(
            F.col(user_col),
            F.col("cohort_day"),
            F.floor(F.datediff(F.col("__day"), F.col("cohort_day")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .groupBy("cohort_day", "week_offset")
        .agg(F.countDistinct(user_col).cast("bigint").alias("n_users"))
    )
