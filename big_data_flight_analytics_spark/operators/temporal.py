"""Temporal operators: as-of join and gap sessionization.

Both are built on the union-window pattern rather than range joins:

- ``asof_join`` tags left (probe) and right (reference) rows, unions
  them, and takes ``last(payload, ignorenulls=True)`` over a window
  partitioned by key and ordered by event time. This is the scalable
  as-of strategy: ONE shuffle on the join key, no time-range candidate
  explosion, no per-key driver loop — at 100 TB both sides shuffle once
  and every partition resolves its keys independently. (A broadcast
  range join would replicate the reference side; a theta join would be
  quadratic per key.)
- ``sessionize`` derives gap-based session ids with lag + a running sum
  over the same per-key window — the standard distributed
  sessionization; one shuffle on the user key, state bounded by the
  window frame (growing frames over sorted runs are streaming-friendly
  in Tungsten's window operator).

Determinism rules (oracle parity): every window order includes explicit
tie-break columns, and at equal timestamps reference rows sort BEFORE
probe rows so the as-of semantics are inclusive (reference.time <=
probe.time), with the largest tie-break reference row winning among
equal-time references.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _micros(col_name: str):
    """Epoch-micros of a timestamp column, NTZ-tolerant.

    ``unix_micros`` requires TIMESTAMP (LTZ); parquet written with
    naive micros reads as TIMESTAMP_NTZ under Spark >= 4.1. The cast is
    an identity under the engine's pinned UTC session timezone and a
    no-op on already-LTZ columns, so it is safe unconditionally.
    """
    return F.unix_micros(F.col(col_name).cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload: dict[str, str],
    right_tie: str,
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the most recent right row per key.

    ``payload`` maps right-side column -> output alias. Matching is
    inclusive (``right_time <= left_time``); among right rows sharing
    the as-of timestamp the one with the largest ``right_tie`` wins.
    Left rows with no prior right row keep NULL payloads (left-outer
    as-of semantics).

    Implementation: union the two sides with a side tag, then
    ``last(payload, ignorenulls=True)`` over
    ``partitionBy(on).orderBy(time, side, tie)`` with an
    unbounded-preceding running frame; right rows carry the payload,
    left rows carry NULL, so the running "last non-null" at each left
    row is exactly the as-of match. One shuffle total.
    """
    lt = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tie"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in payload],
    )
    rt = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c != on],
        F.col(on),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(right_tie).cast("long").alias("__tie"),
        *[F.col(c).alias(f"__p_{c}") for c in payload],
    )
    u = lt.unionByName(rt)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *[F.col(c) for c in left.columns],
        F.col("__side"),
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(alias)
            for c, alias in payload.items()
        ],
    )
    return filled.filter(F.col("__side") == 1).drop("__side")


def sessionize(
    events: DataFrame,
    key_col: str | list[str],
    ts_col: str,
    gap_seconds: int,
    tie_col: str,
) -> DataFrame:
    """Assign gap-based session indexes per key.

    A new session starts when the micros-exact gap to the previous event
    of the same key exceeds ``gap_seconds`` (or there is none).
    Output: input columns + ``session_idx`` (1-based per key, in time
    order). Gap arithmetic runs on ``unix_micros`` BIGINTs so engines
    cannot disagree on sub-second rounding.

    ``key_col`` may be a list of columns: sessions are then scoped to
    the composite key, exactly as if each key-group were sessionized
    alone (the window partitions on all keys). i11 uses this to build
    both halves of a time-split state in ONE shuffle+sort pass.
    """
    keys = [key_col] if isinstance(key_col, str) else list(key_col)
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).asc(), F.col(tie_col).asc()
    )
    us = _micros(ts_col)
    prev = F.lag(us).over(w)
    new_flag = F.when(
        prev.isNull() | ((us - prev) > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    run = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).asc(), F.col(tie_col).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("session_idx", F.sum(new_flag).over(run))


def session_stats(
    events: DataFrame,
    key_col: str | list[str],
    ts_col: str,
    gap_seconds: int,
    tie_col: str,
) -> DataFrame:
    """Per-session aggregates: bounds (epoch micros), size, duration.

    Same single shuffle as ``sessionize`` — the groupBy keys are a
    superset of the window partition key, so AQE reuses the exchange.
    ``key_col`` may be a list (composite-key sessions; see
    :func:`sessionize`).
    """
    keys = [key_col] if isinstance(key_col, str) else list(key_col)
    s = sessionize(events, keys, ts_col, gap_seconds, tie_col)
    us = _micros(ts_col)
    return (
        s.groupBy(*keys, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(us).alias("start_us"),
            F.max(us).alias("end_us"),
        )
        .withColumn("duration_us", F.col("end_us") - F.col("start_us"))
    )


def gap_fill(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step_s: int = 3600,
    tie_col: str = "event_id",
    method: str = "locf",
) -> DataFrame:
    """Regularize an irregular time series: fixed ``step_s`` grid per
    key, empty buckets filled by ``method`` — the hypertable
    resample/gap-fill operation (sensor feeds, metric rollups) a
    time-series store does natively.

    ``method``: ``"locf"`` carries the last observation forward
    (gauges, state-like series); ``"linear"`` interpolates between the
    surrounding observations — ``prev + (next - prev) * frac`` with the
    multiply/divide in that fixed association, and the interpolated
    value rounded to 6dp, so a SQL oracle phrasing the same expression
    hashes bit-exact. Observed buckets pass their value through
    unmodified under both methods.

    Per (key, bucket) the LATEST observation wins (max (ts, tie) —
    deterministic under replay); the grid spans each key's own
    [first, last] observed bucket, so a key absent for a while is
    filled, not a key never seen (and under ``linear`` every gap has
    both neighbors — the edges of the grid are always observed).
    Output: (key, bucket_start_s, value, is_observed).

    Plan: one (key, bucket) row_number window to pick winners, one
    per-key min/max agg, one ``sequence`` explode to build the grid
    (grid rows ≈ span/step per key — generated, never shuffled raw),
    one key-bucket left join, one key-partitioned LOCF window. Every
    window partitions by key; grid generation is map-side from the
    tiny bounds frame. At 100 TB the expensive input collapses to one
    row per observed bucket BEFORE any join, and that collapsed frame
    is eagerly checkpointed — it feeds both the bounds/grid side and
    the final join, and without the pin the window pipeline would
    execute twice. once_checkpoint, not persist (r16): the cached-plan
    path measured ~0.9 s slower on ts2 (2.6 vs 1.7 s warm) — an
    InMemoryRelation re-materializes per consumer while the
    checkpointed frame is scanned directly.
    """
    from big_data_flight_analytics_spark.cache import once_checkpoint

    us = _micros(ts_col)
    bucket = F.floor(us / (step_s * 1_000_000)).cast("bigint")
    w_pick = Window.partitionBy(key_col, "__bucket").orderBy(
        F.col(ts_col).desc(), F.col(tie_col).desc()
    )
    observed = once_checkpoint(
        df.select(
            F.col(key_col),
            bucket.alias("__bucket"),
            F.col(ts_col),
            F.col(tie_col),
            F.col(value_col).alias("__val"),
        )
        .withColumn("__rn", F.row_number().over(w_pick))
        .filter(F.col("__rn") == 1)
        .select(key_col, "__bucket", "__val")
    )
    bounds = observed.groupBy(key_col).agg(
        F.min("__bucket").alias("__mn"), F.max("__bucket").alias("__mx")
    )
    grid = bounds.select(
        F.col(key_col),
        F.explode(
            F.sequence(F.col("__mn"), F.col("__mx"))
        ).alias("__bucket"),
    )
    if method not in ("locf", "linear"):
        raise ValueError(f"method must be 'locf' or 'linear', got {method!r}")
    w_back = (
        Window.partitionBy(key_col)
        .orderBy(F.col("__bucket").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = grid.join(observed, [key_col, "__bucket"], "left")
    if method == "locf":
        value = F.last("__val", ignorenulls=True).over(w_back)
    else:
        w_fwd = (
            Window.partitionBy(key_col)
            .orderBy(F.col("__bucket").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        obs_bucket = F.when(
            F.col("__val").isNotNull(), F.col("__bucket")
        )
        prev_v = F.last("__val", ignorenulls=True).over(w_back)
        prev_b = F.last(obs_bucket, ignorenulls=True).over(w_back)
        next_v = F.first("__val", ignorenulls=True).over(w_fwd)
        next_b = F.first(obs_bucket, ignorenulls=True).over(w_fwd)
        interp = prev_v + (next_v - prev_v) * (
            (F.col("__bucket") - prev_b) / (next_b - prev_b)
        )
        value = F.when(
            F.col("__val").isNotNull(), F.col("__val")
        ).otherwise(F.round(interp, 6))
    return joined.select(
        F.col(key_col),
        (F.col("__bucket") * step_s).alias("bucket_start_s"),
        value.alias(value_col),
        F.col("__val").isNotNull().alias("is_observed"),
    )


def rolling_zscore(
    df: DataFrame,
    key: str,
    order: Sequence[str],
    int_value_col: str,
    window: int | None = 5,
    min_periods: int = 3,
    out_col: str = "zscore",
    dp: int | None = 6,
) -> DataFrame:
    """Trailing-window z-score per key: distributed anomaly detection.

    For each row, scores ``int_value_col`` against the PRECEDING
    ``window`` rows of its key (current row excluded — the classic
    online-anomaly frame where a spike must not mask itself); pass
    ``window=None`` for an EXPANDING frame (all prior rows — the batch
    mirror of ``streaming.stateful.running_zscore``'s state). Rows with
    fewer than ``min_periods`` trailing observations, or a
    zero-variance trail, get NULL.

    Exactness contract (what makes this oracle-checkable bit-for-bit):
    the value column must be an exact INTEGER grain (e.g. cents, not
    dollars-as-double). count/sum/sum-of-squares over the frame are
    then exact int64 arithmetic in any accumulation order, and the
    float work collapses to ONE cast chain:

        z = (x*n - s) / sqrt(n*ss - s*s)        -- == (x - mean)/stddev_pop

    — two exact int64 -> double casts, one IEEE sqrt (correctly
    rounded), one IEEE division, rounded to 6dp. Every engine computes
    identical bits. Exactness bound (matters for ``window=None``
    expanding frames): ``n * sum_sq`` over the frame must stay under
    2^62 — that product bounds every int64 intermediate (``var_num <=
    n*ss``; ``s^2 <= n*ss`` by Cauchy-Schwarz), where a bound on ss
    alone would not (cents ~1e7 over a few hundred rows pushes n*ss
    past 2^63 while ss passes). The plan asserts the bound per row
    (in-codegen, no extra shuffle) and raises instead of wrapping —
    Spark would wrap where DuckDB raises, silently breaking oracle
    parity at extremes. The streaming counterpart enforces the same
    bound. A double-valued input would instead make the frame
    SUM depend on accumulation order (Spark recomputes sliding frames;
    DuckDB uses segment trees), which diverges in the last ulp.

    Scale shape: ONE shuffle on ``key``; the frame is O(window) state
    per row inside Tungsten's window operator — no self-join, no
    per-key collect. At 100 TB this is the plan you want for per-entity
    telemetry scoring.
    """
    from pyspark.sql import Window as _Window

    frame = (
        _Window.partitionBy(key)
        .orderBy(*[F.col(c).asc() for c in order])
        .rowsBetween(
            _Window.unboundedPreceding if window is None else -window, -1
        )
    )
    v = F.col(int_value_col)
    n = F.count(v).over(frame)
    s = F.sum(v).over(frame)
    ss = F.sum(v * v).over(frame)
    # overflow guard BEFORE any int64 product can wrap: the double
    # product of two exact int64 casts has ~1e-16 relative error, and
    # the 2x headroom between the 2^62 bound and int64's 2^63 absorbs
    # it. assert_true returns NULL when the bound holds (raises
    # otherwise), so anchoring the result on .isNull() keeps the check
    # inside whole-stage codegen with zero effect on passing rows.
    # coalesce: an empty frame has NULL ss, and assert_true(NULL) raises
    bound_ok = F.assert_true(
        F.coalesce(n.cast("double") * ss.cast("double"), F.lit(0.0))
        <= F.lit(float(1 << 62)),
        F.lit(
            "rolling_zscore: n * frame sum-of-squares exceeds 2^62; "
            "rescale the integer value grain (see docstring)"
        ),
    )
    var_num = n * ss - s * s
    z = (v * n - s).cast("double") / F.sqrt(var_num.cast("double"))
    if dp is not None:
        # HALF_UP like every other catalog rounding; pass dp=None for
        # the raw IEEE quotient (bit-comparable with any engine that
        # runs the same int64 -> double cast/sqrt/divide chain, e.g.
        # the streaming running_zscore differential).
        z = F.round(z, dp)
    return df.withColumn(
        out_col,
        F.when(
            bound_ok.isNull() & (n >= min_periods) & (var_num > 0), z
        ),
    )


def ohlc_state(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    step_s: int = 3600,
) -> DataFrame:
    """Mergeable per-(key, bucket) OHLC state: endpoint values WITH
    their selection keys — (first_us, first_id, open), (last_us,
    last_id, close) — plus high/low/n_obs. Selection rides Spark's
    lexicographic struct min/max ((us, id, v): ids are unique, so the
    value field never decides an ordering), which makes the whole
    build ONE map-combined groupBy — no window, no sort. Carrying the
    endpoint keys is exactly what makes the aggregate MERGEABLE:
    disjoint row subsets fold by re-selecting min/max over their
    endpoint structs (ohlc_fold), the i1-contract for resampling."""
    us = _micros(ts_col)
    bucket = F.floor(us / F.lit(step_s * 1_000_000.0)).cast("long")
    base = events.filter(
        F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(key_col).alias("key"),
        bucket.alias("bucket"),
        us.alias("__us"),
        F.col(id_col).alias("__id"),
        F.col(value_col).alias("v"),
    )
    return base.groupBy("key", "bucket").agg(
        F.min(F.struct("__us", "__id", "v")).alias("__o"),
        F.max(F.struct("__us", "__id", "v")).alias("__c"),
        F.max("v").alias("high"),
        F.min("v").alias("low"),
        F.count(F.lit(1)).cast("long").alias("n_obs"),
    ).select(
        "key",
        "bucket",
        F.col("__o.__us").alias("first_us"),
        F.col("__o.__id").alias("first_id"),
        F.col("__o.v").alias("open"),
        "high",
        "low",
        F.col("__c.__us").alias("last_us"),
        F.col("__c.__id").alias("last_id"),
        F.col("__c.v").alias("close"),
        "n_obs",
    )


def ohlc_fold(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold two disjoint-subset OHLC states — see :func:`ohlc_refold`
    for the N-way form (associative and commutative, NOT idempotent:
    n_obs is additive, so streaming faces are marker-guarded)."""
    return ohlc_refold(base.unionByName(delta))


def ohlc_refold(parts: DataFrame) -> DataFrame:
    """N-way fold of stacked disjoint-subset OHLC state partials:
    re-select the earliest (first_us, first_id) / latest (last_us,
    last_id) endpoints across parts, combine extremes, sum counts —
    ONE map-combined groupBy however many partials are stacked. This
    is what lets the streaming face store per-batch partials
    append-only (delta-dir layout) and fold lazily at read/compaction
    instead of rewriting O(state) per trigger."""
    return parts.groupBy("key", "bucket").agg(
        F.min(F.struct("first_us", "first_id", "open")).alias("__o"),
        F.max(F.struct("last_us", "last_id", "close")).alias("__c"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.sum("n_obs").cast("long").alias("n_obs"),
    ).select(
        "key",
        "bucket",
        F.col("__o.first_us").alias("first_us"),
        F.col("__o.first_id").alias("first_id"),
        F.col("__o.open").alias("open"),
        "high",
        "low",
        F.col("__c.last_us").alias("last_us"),
        F.col("__c.last_id").alias("last_id"),
        F.col("__c.close").alias("close"),
        "n_obs",
    )


def ohlc_finalize(
    state: DataFrame, key_col: str = "event_type", step_s: int = 3600
) -> DataFrame:
    """Public bar columns off the mergeable state (endpoint selection
    keys dropped)."""
    return state.select(
        F.col("key").alias(key_col),
        (F.col("bucket") * F.lit(step_s)).cast("long").alias(
            "bucket_start_s"
        ),
        "open",
        "high",
        "low",
        "close",
        "n_obs",
    )


def ohlc_bars(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    step_s: int = 3600,
) -> DataFrame:
    """Per-(key, time-bucket) OHLC resampling bars: open/close are the
    values at the earliest/latest observation in the bucket (ties
    broken by ``id_col``), high/low the extremes, plus the count.
    Selection-only semantics — no float arithmetic happens, so double
    values hash bit-exactly cross-engine regardless of summation
    order. Built on the mergeable state (ohlc_state/ohlc_fold): ONE
    map-combined groupBy, no window, no sort."""
    return ohlc_finalize(
        ohlc_state(events, key_col, ts_col, value_col, id_col, step_s),
        key_col,
        step_s,
    )


def session_fold(
    base: DataFrame,
    delta: DataFrame,
    key_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Fold two sessionized states split at a TIME boundary: every
    base session ends at or before the boundary, every delta session
    starts after it — the shape incremental ingest actually has
    (arriving data is later than ingested data; the watermark IS the
    boundary). Inputs are session_stats-shaped states
    (key, start_us, end_us, n_events); session_idx is recomputed.

    The only possible merge is the boundary pair per key: the
    latest-ending base session absorbs the earliest delta session when
    the cross-boundary gap <= timeout. No cascade can follow — the
    merged session keeps the delta session's end, and gaps WITHIN each
    part already exceed the timeout by construction — so the fold is
    one per-key join over <= 2 state rows per key plus a re-rank:
    O(sessions), never O(events). Proven equal to from-scratch
    sessionization of the union (i11, same oracle as s4)."""
    g = gap_seconds * 1_000_000
    cols = [key_col, "start_us", "end_us", "n_events"]
    b = base.select(*cols)
    d = delta.select(*cols)
    w_last = Window.partitionBy(key_col).orderBy(
        F.col("end_us").desc(), F.col("start_us").desc()
    )
    w_first = Window.partitionBy(key_col).orderBy(
        F.col("start_us").asc(), F.col("end_us").asc()
    )
    last_b = (
        b.withColumn("__r", F.row_number().over(w_last))
        .filter(F.col("__r") == 1)
        .drop("__r")
    )
    first_d = (
        d.withColumn("__r", F.row_number().over(w_first))
        .filter(F.col("__r") == 1)
        .drop("__r")
    )
    bridge = (
        last_b.select(
            key_col,
            F.col("start_us").alias("__a_start"),
            F.col("end_us").alias("__a_end"),
            F.col("n_events").alias("__a_n"),
        )
        .join(
            first_d.select(
                key_col,
                F.col("start_us").alias("__b_start"),
                F.col("end_us").alias("__b_end"),
                F.col("n_events").alias("__b_n"),
            ),
            key_col,
        )
        .filter((F.col("__b_start") - F.col("__a_end")) <= g)
    )
    merged = bridge.select(
        key_col,
        F.col("__a_start").alias("start_us"),
        F.col("__b_end").alias("end_us"),
        (F.col("__a_n") + F.col("__b_n")).cast("long").alias("n_events"),
    )
    drop_a = bridge.select(
        key_col, F.col("__a_start").alias("start_us")
    )
    drop_b = bridge.select(
        key_col, F.col("__b_start").alias("start_us")
    )
    kept = (
        b.join(drop_a, [key_col, "start_us"], "left_anti")
        .unionByName(d.join(drop_b, [key_col, "start_us"], "left_anti"))
        .unionByName(merged)
    )
    w_rank = Window.partitionBy(key_col).orderBy("start_us")
    return kept.select(
        key_col,
        F.row_number().over(w_rank).cast("long").alias("session_idx"),
        F.col("n_events").cast("long").alias("n_events"),
        "start_us",
        "end_us",
        (F.col("end_us") - F.col("start_us")).alias("duration_us"),
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload: dict[str, str],
    right_tie: str,
) -> DataFrame:
    """For each left row, attach the NEXT right row per key — the
    forward-looking mirror of ``asof_join`` (kdb ``aj`` backward vs
    the "next event after" lookup that time-to-event analyses need).

    Matching is inclusive (``right_time >= left_time``); among right
    rows sharing the timestamp the SMALLEST ``right_tie`` wins; left
    rows with nothing after keep NULL payloads. Same union-window
    physical shape as the backward join — one shuffle on the key —
    with the frame flipped: ``first(payload, ignorenulls=True)`` over
    ``[currentRow, unboundedFollowing)``, left rows tagged to sort
    BEFORE right rows at equal timestamps so an exactly-simultaneous
    right row is still "next".
    """
    lt = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast("long").alias("__tie"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}")
            for c in payload
        ],
    )
    rt = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c != on
        ],
        F.col(on),
        F.col(right_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.col(right_tie).cast("long").alias("__tie"),
        *[F.col(c).alias(f"__p_{c}") for c in payload],
    )
    u = lt.unionByName(rt)
    w = (
        Window.partitionBy(on)
        .orderBy(
            F.col("__t").asc(), F.col("__side").asc(), F.col("__tie").asc()
        )
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = u.select(
        *[F.col(c) for c in left.columns],
        F.col("__side"),
        *[
            F.first(f"__p_{c}", ignorenulls=True).over(w).alias(alias)
            for c, alias in payload.items()
        ],
    )
    return filled.filter(F.col("__side") == 0).drop("__side")
