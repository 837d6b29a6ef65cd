"""Behavioral analytics over event streams: ordered funnels and
cohort retention.

Both are classic product-analytics jobs that a general analytics
engine is expected to run over raw event logs at full scale (the
reference's events surface stops at windowed counts — these extend it
the way the dedup/ANN family extends the documents surface).

Scale shapes:

- ``ordered_funnel`` — ONE shuffle total: prefilter to funnel event
  types (pushes to the scan), hash once by user, then one unordered
  whole-partition window per step plus the per-user collapse, all
  reusing the same Exchange. Steps are strictly ORDERED: step k
  counts only events after the user's step-(k-1) timestamp — the
  semantics min-per-type-then-compare gets wrong whenever a user has
  the later event type both before and after the earlier step.
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
    from pyspark.sql import Window

    # Single-shuffle formulation: prefilter to funnel event types, hash
    # the events once by user, then derive each step's per-user
    # timestamp with an unordered whole-partition window — Catalyst
    # reuses one Exchange for every window AND the per-user collapse
    # (same partitioning key), so the funnel costs ONE shuffle of the
    # relevant events regardless of step count. The naive alternative
    # (one groupBy + join per step) shuffles the event table per step.
    w = Window.partitionBy(user_col)
    cur = events.filter(F.col(type_col).isin(*steps)).select(
        user_col, type_col, ts_col
    )
    prev = None
    for i, step in enumerate(steps):
        reach = F.col(type_col) == step
        if prev is not None:
            reach = reach & F.col(prev).isNotNull() & (F.col(ts_col) > F.col(prev))
        col = f"__t{i}"
        cur = cur.withColumn(col, F.min(F.when(reach, F.col(ts_col))).over(w))
        prev = col
    per_user = cur.groupBy(user_col).agg(
        *[F.first(f"__t{i}").alias(f"__t{i}") for i in range(len(steps))]
    )
    totals = per_user.agg(
        *[
            F.count(f"__t{i}").cast("bigint").alias(f"__n{i}")
            for i in range(len(steps))
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).cast("int").alias("step_idx"),
                F.lit(step).alias("step"),
                F.col(f"__n{i}").alias("n_users"),
            )
            for i, step in enumerate(steps)
        ]
    )
    return totals.select(F.explode(rows).alias("r")).select("r.*")


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


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
) -> DataFrame:
    """First-order transition counts between consecutive events.

    For each user's event sequence (ordered by ``ts_col``, ties broken
    on ``tie_col`` so the matrix is deterministic under replay), count
    (from_type -> to_type) pairs — the Markov transition matrix that
    drives next-action analysis and anomaly scoring over clickstreams.

    Output: (from_type, to_type, n_transitions).

    Plan: one user-partitioned ``lead`` window (sort within partition)
    and one small-key aggregation over type pairs with map-side
    partial combine. Window partitions are per-user event sequences —
    bounded by user activity, never corpus-sized.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(tie_col).asc()
    )
    return (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_transitions"))
    )


def top_paths(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    order: Sequence[str] = ("ts", "event_id"),
    k_steps: int = 5,
    sep: str = ">",
) -> DataFrame:
    """Count users by their first-``k_steps`` ordered event path.

    The navigation-analysis staple: each user's journey prefix
    ("click>view>purchase...") tallied across the population. Ordering
    must include a unique tie-break column (``order`` defaults to
    ``(ts, event_id)``) so the path string is deterministic.

    Plan shape: the row_number window, the per-user path collapse, and
    nothing else touch fact rows — both are partitioned by the user
    hash, so Catalyst reuses ONE Exchange for the window AND the
    groupBy; the final path tally shuffles only one row per user.
    Per-user state is bounded by ``k_steps`` (the collect_list runs on
    the <= k_steps surviving rows, never the full history), so the
    collapse is skew-safe even for pathological single-user feeds.
    """
    from pyspark.sql import Window as _Window

    w = _Window.partitionBy(user_col).orderBy(
        *[F.col(c).asc() for c in order]
    )
    firstk = (
        events.select(user_col, type_col, *order)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k_steps)
    )
    ordered_struct = F.array_sort(
        F.collect_list(F.struct(*[F.col(c) for c in order], F.col(type_col)))
    )
    paths = firstk.groupBy(user_col).agg(
        F.array_join(
            F.transform(ordered_struct, lambda x: x[type_col]), sep
        ).alias("path")
    )
    return paths.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_users")
    )
