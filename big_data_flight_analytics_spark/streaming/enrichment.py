"""S1: stream enrichment pipeline (StreamProcessor.java:38-54,112-183).

Kafka Streams shape: re-key by icao24 -> leftJoin aircrafts GlobalKTable
-> leftJoin flights GlobalKTable by callsign -> output topic. Spark
shape: derived key column + two stream-static broadcast left joins. The
lookup sides are batch DataFrames (the L1/L2 lookup outputs) — Spark
re-reads them per micro-batch, which reproduces the GlobalKTable
"latest snapshot" behavior when the lookup path is overwritten by the
batch layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.schemas import OPENSKY_SCHEMA


def parse_opensky(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Schemaless JSON message -> typed columns + event_time.

    The Java layer parses defensively field-by-field
    (StreamProcessor.java:70-110); ``from_json`` with nullable fields is
    the typed equivalent (malformed fields -> null). Event time =
    epoch-second ``timestamp`` (producer.py:73).
    """
    parsed = raw.select(
        F.from_json(F.col(value_col).cast("string"), OPENSKY_SCHEMA).alias("m")
    ).select("m.*")
    return parsed.withColumn(
        "event_time", F.timestamp_seconds(F.col("timestamp"))
    )


def transformed_stream(parsed: DataFrame) -> DataFrame:
    """Re-key by normalized icao24, drop blank keys
    (StreamProcessor.java:38-40, 70-93: trim + lowercase, null/blank
    dropped)."""
    keyed = parsed.withColumn("icao24", F.lower(F.trim(F.col("icao24"))))
    return keyed.filter(F.col("icao24").isNotNull() & (F.col("icao24") != ""))


def enrich_stream(
    stream: DataFrame,
    aircrafts_lookup: DataFrame,
    flights_lookup: DataFrame,
) -> DataFrame:
    """Two-stage GlobalKTable-style enrichment (left joins).

    Stage 1 (StreamProcessor.java:42-46,112-155): join by icao24; adds
    avg_carrier_delay_minutes, lookup_flight_count, delay_score_01;
    sets _id = icao24.
    Stage 2 (:47-51,157-183): join by trimmed callsign; adds
    AirlineName, CRSArrTime, CRSDepTime.
    """
    ac = F.broadcast(
        aircrafts_lookup.select(
            F.col("icao24"),
            F.col("AvgCarrierDelayMinutes").alias("avg_carrier_delay_minutes"),
            F.col("FlightCount").alias("lookup_flight_count"),
            F.col("DelayScore01").alias("delay_score_01"),
        )
    )
    fl = F.broadcast(
        flights_lookup.select(
            F.col("callsign").alias("__cs_key"),
            F.col("AirlineName"),
            F.col("CRSArrTime"),
            F.col("CRSDepTime"),
        )
    )
    step1 = stream.join(ac, "icao24", "left").withColumn("_id", F.col("icao24"))
    step2 = (
        step1.withColumn("__cs_key", F.trim(F.col("callsign")))
        .join(fl, "__cs_key", "left")
        .drop("__cs_key")
    )
    return step2
