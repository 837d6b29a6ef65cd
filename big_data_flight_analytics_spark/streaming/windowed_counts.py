"""S2-S5: windowed distinct-aircraft counts.

Reference semantics (AirlineAircraftCountStream.java:34-53,
AirportAircraftCountStream.java:45-77): per key, 1-minute aligned
tumbling windows with NO grace — late records dropped at window close —
accumulating an exact HashSet of icao24, emitting exactly once per
(key, window) after the window closes.

Spark mapping: ``withWatermark(event_time, "0 seconds")`` + ``F.window``
+ append output mode. Append mode IS emit-on-close; watermark 0 IS
no-grace. Exact distinct = size(collect_set); the HLL scale path
(``exact=False``) swaps in approx_count_distinct — bounded state at
100 TB-scale cardinality where a per-window set would not fit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.constants import (
    AIRPORT_RADIUS_KM,
    STREAM_WATERMARK,
    STREAM_WINDOW,
)
from big_data_flight_analytics_spark.functions.scalar import (
    airline_code_from_callsign,
    haversine_km,
)


def _distinct_count(exact: bool):
    return (
        F.size(F.collect_set("icao24")) if exact
        else F.approx_count_distinct("icao24")
    )


def windowed_distinct_counts(
    stream: DataFrame,
    key_col: str,
    id_col: str,
    exact: bool = True,
    window: str = STREAM_WINDOW,
    watermark: str = STREAM_WATERMARK,
    ts_col: str = "event_time",
) -> DataFrame:
    """Distinct ``id_col`` per ``key_col`` per tumbling window — the S2
    shape generalized to any keyed event stream (the airline/airport
    operators below are this pattern with domain key derivation).

    Streaming cannot use ``count_distinct`` (unsupported on streaming
    aggregations); ``size(collect_set(...))`` is the exact equivalent
    (both ignore nulls), ``approx_count_distinct`` the bounded-state
    scale path. The same plan runs in batch, where it IS the batch
    windowed-distinct query — the stream/batch differential test pins
    that equivalence on real data.
    """
    keyed = stream.withWatermark(ts_col, watermark)
    agg = keyed.groupBy(
        F.window(ts_col, window).alias("w"), key_col
    ).agg(
        (
            F.size(F.collect_set(id_col)) if exact
            else F.approx_count_distinct(id_col)
        ).alias("distinct_count"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return agg.select(
        F.col(key_col),
        F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
        F.col("distinct_count").cast("int").alias("distinct_count"),
        F.col("n_events"),
    )


KEEPALIVE_KEY = "__KEEPALIVE__"


def airline_aircraft_counts(
    stream: DataFrame,
    exact: bool = True,
    window: str = STREAM_WINDOW,
    watermark: str = STREAM_WATERMARK,
    keepalive: bool = False,
) -> DataFrame:
    """Distinct aircraft per airline code per window.

    Key rules (AirlineAircraftCountStream.java:74-101): messages whose
    callsign field is missing/null are DROPPED (extractAirlineCodeFromValue
    returns null -> filter); blank-but-present callsigns map to UNKNOWN;
    'N...' to PRIVATE; short to themselves; else first-3 uppercased.
    Output shape mirrors airlineCountToKeyValue (:103-116).

    ``keepalive``: the default filter drops null-callsign records BELOW
    the EventTimeWatermark node (Catalyst pushes deterministic filters
    there), so they never advance Spark's watermark — if ALL incoming
    records are filtered, open windows stall forever (unlike KStreams,
    where stream time advances on every record; verified by
    TestWatermarkStall). With ``keepalive=True``, null-callsign records
    are instead mapped to a reserved key so they flow THROUGH the
    watermark and aggregate — advancing event time and flushing open
    windows — and their groups are removed after aggregation. Cost: one
    extra group per window. Use it for replayed backfills/feeds where
    the filtered class can dominate; the default matches the reference's
    drop semantics exactly.
    """
    keyed = stream.withWatermark("event_time", watermark)
    if keepalive:
        keyed = keyed.withColumn(
            "airline",
            F.when(F.col("callsign").isNull(), F.lit(KEEPALIVE_KEY)).otherwise(
                airline_code_from_callsign(F.col("callsign"))
            ),
        )
    else:
        # Tests and replayed backfills must flush windows with sentinel
        # records that SURVIVE this filter (non-null callsign) — see
        # replay.py — or pass keepalive=True.
        keyed = keyed.filter(F.col("callsign").isNotNull()).withColumn(
            "airline", airline_code_from_callsign(F.col("callsign"))
        )
    agg = keyed.groupBy(
        F.window("event_time", window).alias("w"), "airline"
    ).agg(_distinct_count(exact).alias("aircraft_count"))
    if keepalive:
        # The predicate must reference an aggregate output: a key-only
        # filter (airline != KEY) is deterministic and Catalyst pushes
        # it through the Aggregate and below the EventTimeWatermark —
        # silently recreating the stall this flag exists to fix. The
        # CASE couples the key test to aircraft_count (which doesn't
        # exist below the Aggregate), so it cannot be pushed down; the
        # count<0 arm is never true, making it exactly "drop the
        # keepalive group".
        agg = agg.filter(
            F.when(
                F.col("airline") == KEEPALIVE_KEY, F.col("aircraft_count") < 0
            ).otherwise(F.lit(True))
        )
    return agg.select(
        F.col("airline").alias("_id"),
        "airline",
        F.col("aircraft_count").cast("int").alias("aircraft_count"),
        F.unix_millis(F.col("w.end")).alias("window_end_ms"),
    )


def session_counts(
    stream: DataFrame,
    key_col: str = "icao24",
    gap: str = "30 minutes",
    watermark: str = STREAM_WATERMARK,
) -> DataFrame:
    """Gap-based session aggregation per key (streaming counterpart of
    operators/temporal.sessionize).

    ``F.session_window`` merges events within ``gap`` of each other into
    one growing window per key; append mode + watermark emits each
    session exactly once, ``gap`` after its last event. State per key is
    one open session (merged incrementally), so memory is bounded by
    live-key cardinality, not event volume — the scale-safe shape for
    100 TB streams. Window bounds are [first_event, last_event + gap);
    the batch operator reports last_event instead of last+gap, which is
    the only intended difference.
    """
    keyed = stream.withWatermark("event_time", watermark).filter(
        F.col(key_col).isNotNull()
    )
    agg = keyed.groupBy(
        F.session_window("event_time", gap).alias("w"), key_col
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return agg.select(
        F.col(key_col),
        F.unix_millis(F.col("w.start")).alias("session_start_ms"),
        F.unix_millis(F.col("w.end")).alias("session_end_ms"),
        F.col("n_events").cast("int").alias("n_events"),
    )


def airport_aircraft_counts(
    stream: DataFrame,
    airports_lookup: DataFrame,
    radius_km: float = AIRPORT_RADIUS_KM,
    exact: bool = True,
    window: str = STREAM_WINDOW,
    watermark: str = STREAM_WATERMARK,
) -> DataFrame:
    """Distinct aircraft within ``radius_km`` of each airport per window.

    Reference (AirportAircraftCountStream.java): per-record scan of the
    global airports store emitting (airport, icao24) within 50 km
    (:201-237), windowed distinct count (:62-75), then re-enrichment
    with airport metadata from the same store (:239-286). Spark shape:
    broadcast cross join + haversine filter (the idiomatic plan for a
    dimension-scale airport table — BroadcastNestedLoopJoin), windowed
    agg, broadcast metadata join after the agg. One record can match
    many airports, matching reference multi-emit.
    """
    # Watermark attached before the position filter. Caveat vs the
    # reference: KStreams stream time advances on EVERY record, but
    # Catalyst pushes this deterministic filter below the
    # EventTimeWatermark node, so position-less records do not advance
    # Spark's watermark — a stall risk if positions vanish entirely,
    # not a correctness difference in emitted window contents.
    pos = stream.withWatermark("event_time", watermark).filter(
        F.col("latitude").isNotNull() & F.col("longitude").isNotNull()
    )
    sites = F.broadcast(
        airports_lookup.select(
            F.col("AirportCode"),
            F.col("latitude").alias("__site_lat"),
            F.col("longitude").alias("__site_lon"),
        )
    )
    matched = (
        pos.crossJoin(sites)
        .withColumn(
            "__dist",
            haversine_km(
                F.col("latitude"), F.col("longitude"),
                F.col("__site_lat"), F.col("__site_lon"),
            ),
        )
        .filter(F.col("__dist") <= radius_km)
        .select("AirportCode", "icao24", "event_time")
    )
    agg = matched.groupBy(
        F.window("event_time", window).alias("w"), "AirportCode"
    ).agg(_distinct_count(exact).alias("aircraft_count"))
    meta = F.broadcast(
        airports_lookup.select("AirportCode", "AirportName", "CityName", "StateName")
    )
    return (
        agg.select(
            F.col("AirportCode").alias("_id"),
            "AirportCode",
            F.col("aircraft_count").cast("int").alias("aircraft_count"),
            F.unix_millis(F.col("w.end")).alias("window_end_ms"),
        )
        .join(meta, "AirportCode", "left")
    )


def windowed_key_counts(
    stream: DataFrame,
    key_col: str,
    window: str = STREAM_WINDOW,
    watermark: str = STREAM_WATERMARK,
    ts_col: str = "event_time",
) -> DataFrame:
    """Event counts per (tumbling window, key) — emit-final input for
    sink-side ranking (``rank_topk``). Append mode + watermark emits
    each closed window's rows exactly once, all in the batch where the
    watermark passes the window end — which is what makes ranking in
    the SINK sound (see windowed_topk_query)."""
    keyed = stream.withWatermark(ts_col, watermark)
    return (
        keyed.groupBy(F.window(ts_col, window).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            F.col(key_col),
            "n_events",
        )
    )


def rank_topk(
    batch_df: DataFrame, k: int = 3, key_col: str = "event_type"
) -> DataFrame:
    """Per-window top-k by count (count desc, key asc tie-break) — the
    foreachBatch half of streaming windowed top-k."""
    from pyspark.sql import Window as W

    w = W.partitionBy("window_start_epoch").orderBy(
        F.col("n_events").desc(), F.col(key_col).asc()
    )
    return (
        batch_df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def windowed_topk_query(
    stream: DataFrame,
    key_col: str,
    sink,
    k: int = 3,
    window: str = STREAM_WINDOW,
    watermark: str = STREAM_WATERMARK,
    ts_col: str = "event_time",
    checkpoint: str | None = None,
):
    """Continuous per-window top-k keys: the streaming leaderboard.

    A rank over a streaming aggregate is two stateful operators — not
    supported, and unnecessary: in append mode a window's count rows
    are emitted exactly once, TOGETHER, in the micro-batch where the
    watermark passes the window end. Ranking inside ``foreachBatch``
    therefore sees every closed window complete, so the sink-side
    ``rank_topk`` is exact, with zero extra streaming state. ``sink``
    receives the ranked batch (e.g. a ParquetUpsertSink keyed on
    (window, rank), or any callable(batch_df, batch_id)).
    """
    counts = windowed_key_counts(stream, key_col, window, watermark, ts_col)

    def _emit(batch_df: DataFrame, batch_id: int) -> None:
        sink(rank_topk(batch_df, k, key_col), batch_id)

    writer = counts.writeStream.foreachBatch(_emit).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer
