"""Stream-stream join: correlate two live streams within a time bound.

Beyond the reference's stream-static (GlobalKTable) joins: a watermarked
inner join between two event streams — e.g. position reports correlated
with the alert/event stream for the same aircraft that fired within the
preceding N minutes.

Spark semantics (the scale contract):
- BOTH sides declare watermarks, so the state store evicts buffered rows
  once the other side can no longer produce a match — state is bounded
  by (rate x join window), not stream length.
- The join condition MUST carry the event-time bound (here
  ``[alert_time, alert_time + N]``); an unbounded stream-stream join
  would buffer forever and Spark rejects it in append mode.
- The equi-key (icao24) hash-partitions both sides identically, so each
  state-store partition joins locally — the same co-partitioned shape a
  KStreams windowed join uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "event_time",
    right_ts: str = "event_time",
    lower: str = "0 seconds",
    upper: str = "5 minutes",
    watermark: str = "0 seconds",
    how: str = "inner",
) -> DataFrame:
    """Generic time-bounded stream-stream equi-join (attribution shape).

    A right row matches a left row with the same ``key`` when
    ``right_ts`` falls in ``[left_ts + lower, left_ts + upper]`` — e.g.
    left = impressions, right = conversions, upper = the attribution
    window. Works identically on batch frames (watermark is a no-op in
    batch), which is what the stream/batch differential test exploits.

    State contract at scale: both sides are watermarked and the join
    condition carries the event-time bound, so each side's state store
    holds at most (rate x (upper - lower + watermark)) rows per
    partition and evicts the rest — without the bound Spark rejects the
    append-mode join outright. The equi-key hash-partitions both sides
    identically; each state-store partition joins locally.

    Column contract: non-key column names must not collide across
    sides (select/alias before joining); the key column is emitted
    once. ``positions_near_alerts`` below is the flight-domain instance
    of this shape.
    """
    l_wm = left.withWatermark(left_ts, watermark)
    r_wm = right.withWatermark(right_ts, watermark)
    cond = (
        (l_wm[key] == r_wm[key])
        & (r_wm[right_ts] >= l_wm[left_ts] + F.expr(f"INTERVAL {lower}"))
        & (r_wm[right_ts] <= l_wm[left_ts] + F.expr(f"INTERVAL {upper}"))
    )
    return l_wm.join(r_wm, cond, how).drop(r_wm[key])


def positions_near_alerts(
    positions: DataFrame,
    alerts: DataFrame,
    within: str = "5 minutes",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Inner-join position reports to alerts of the same aircraft where
    the position is within ``[alert_time, alert_time + within]``.

    ``positions`` needs (icao24, event_time, latitude, longitude);
    ``alerts`` needs (icao24, event_time, alert_kind). Emits one row per
    (position, matching alert).
    """
    pos = (
        positions.withWatermark("event_time", watermark)
        .select(
            F.col("icao24"),
            F.col("event_time").alias("pos_time"),
            "latitude",
            "longitude",
        )
    )
    al = (
        alerts.withWatermark("event_time", watermark)
        .select(
            F.col("icao24").alias("al_icao24"),
            F.col("event_time").alias("alert_time"),
            "alert_kind",
        )
    )
    joined = pos.join(
        al,
        (F.col("icao24") == F.col("al_icao24"))
        & (F.col("pos_time") >= F.col("alert_time"))
        & (F.col("pos_time") <= F.col("alert_time") + F.expr(f"INTERVAL {within}")),
        "inner",
    )
    return joined.select(
        "icao24",
        F.unix_millis(F.col("pos_time")).alias("pos_time_ms"),
        F.unix_millis(F.col("alert_time")).alias("alert_time_ms"),
        "alert_kind",
        "latitude",
        "longitude",
    )
