"""Brokerless Kafka wire-format parity (IO8 parse path).

`streaming.kafka_shape` constructs the EXACT frame the Kafka source
emits (binary key/value + topic/partition/offset/timestamp/
timestampType) and pushes it through the same parse path the broker
path uses — so options/schema handling downstream of
``readStream.format("kafka").load()`` is exercised on every pytest
run, not only when SPARK_GRAFT_KAFKA names a broker. The rate-source
stream test uses ``rate-micro-batch`` + availableNow, which emits
exactly one deterministic batch.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.streaming.kafka_shape import (
    KAFKA_WIRE_SCHEMA,
    opensky_from_kafka,
    to_kafka_wire,
)


def _opensky_rows(spark, n=4):
    return spark.createDataFrame(
        [
            Row(
                timestamp=1_700_000_000 + i,
                icao24=f"ab{i:04x}",
                callsign=f"DAL{i:03d} ",
                origin_country="USA",
                longitude=10.0 + i,
                latitude=50.0 + i,
                geo_altitude=1000.0,
                velocity=200.0,
                true_track=90.0,
                vertical_rate=0.0,
                on_ground=False,
                baro_altitude=990.0,
            )
            for i in range(n)
        ]
    )


class TestKafkaWireShape:
    def test_wire_schema_matches_kafka_source_contract(self, spark):
        wire = to_kafka_wire(_opensky_rows(spark), "icao24", "opensky")
        # names + types define the wire contract; nullability differs
        # trivially (literals are non-null) and Kafka's own converter
        # marks metadata non-null too
        assert [(f.name, f.dataType) for f in wire.schema.fields] == [
            (f.name, f.dataType) for f in KAFKA_WIRE_SCHEMA.fields
        ]

    def test_batch_roundtrip_parses_identically(self, spark):
        from big_data_flight_analytics_spark.streaming.enrichment import (
            parse_opensky,
        )

        src = _opensky_rows(spark)
        via_wire = opensky_from_kafka(
            to_kafka_wire(src, "icao24", "opensky")
        )
        direct = parse_opensky(
            src.select(
                F.to_json(F.struct(*[F.col(c) for c in src.columns])).alias(
                    "value"
                )
            )
        )
        cols = sorted(via_wire.columns)
        assert cols == sorted(direct.columns)
        a = {tuple(r) for r in via_wire.select(*cols).collect()}
        b = {tuple(r) for r in direct.select(*cols).collect()}
        assert a == b

    def test_key_is_utf8_of_key_column(self, spark):
        wire = to_kafka_wire(_opensky_rows(spark, 2), "icao24", "t")
        keys = {bytes(r["key"]).decode() for r in wire.collect()}
        assert keys == {"ab0000", "ab0001"}

    def test_value_is_json_payload(self, spark):
        wire = to_kafka_wire(_opensky_rows(spark, 1), "icao24", "t")
        payload = json.loads(bytes(wire.first()["value"]).decode())
        assert payload["icao24"] == "ab0000"
        assert payload["timestamp"] == 1_700_000_000

    def test_timestamp_col_stays_in_payload_and_sets_metadata(self, spark):
        # timestamp_col must NOT be excluded from the JSON value: the
        # value bytes have to stay byte-identical to write_kafka's
        # framing (kafka_message_frame with no passthrough), and the
        # parse path must read a non-null event time back. The event
        # time additionally rides as the Kafka record timestamp.
        from big_data_flight_analytics_spark.sources.writers import (
            kafka_message_frame,
        )

        src = _opensky_rows(spark, 3).withColumn(
            "event_time", F.timestamp_seconds(F.col("timestamp"))
        )
        wire = to_kafka_wire(
            src, "icao24", "opensky", timestamp_col="event_time"
        )
        rows = wire.collect()
        # metadata timestamp == the event-time column, not wall clock
        assert {r["timestamp"].strftime("%s") for r in rows} == {
            str(1_700_000_000 + i) for i in range(3)
        }
        # value bytes identical to the write_kafka framing
        expect = {
            r["value"]
            for r in kafka_message_frame(src, "icao24").collect()
        }
        assert {bytes(r["value"]).decode() for r in rows} == expect
        # and the payload still carries the event-time field
        payload = json.loads(bytes(rows[0]["value"]).decode())
        assert "event_time" in payload

    def test_contract_violation_fails_loud(self, spark):
        # a string-typed value column (what a mis-built test double or
        # a csv source would hand over) must not silently parse
        bad = spark.createDataFrame([Row(value='{"icao24":"x"}')])
        with pytest.raises(TypeError, match="wire contract"):
            opensky_from_kafka(bad)


class TestKafkaShapedStream:
    def test_rate_source_through_the_kafka_parse_path(self, spark):
        """rate-micro-batch -> wire shape -> opensky_from_kafka ->
        transformed_stream, asserted equal to the batch computation on
        the same 20 values."""
        from big_data_flight_analytics_spark.streaming.enrichment import (
            transformed_stream,
        )

        def records(df):
            # synthesize an opensky message per rate row; every third
            # row gets a blank key (must be dropped by transform)
            return df.select(
                (F.lit(1_700_000_000) + F.col("value")).alias("timestamp"),
                F.when(F.col("value") % 3 == 0, F.lit("  "))
                .otherwise(F.format_string("AB%04d", F.col("value")))
                .alias("icao24"),
                F.format_string("DAL%03d", F.col("value")).alias("callsign"),
            )

        raw = (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", 20)
            .option("numPartitions", 2)
            .load()
        )
        stream_out = transformed_stream(
            opensky_from_kafka(to_kafka_wire(records(raw), "icao24", "sky"))
        ).select("icao24", "callsign", "timestamp", "event_time")
        q = (
            stream_out.writeStream.format("memory")
            .queryName("kafka_shape_rate")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["icao24"], r["callsign"], r["timestamp"])
            for r in spark.sql("select * from kafka_shape_rate").collect()
        }

        batch = spark.range(20).select(F.col("id").alias("value"))
        want = {
            (r["icao24"], r["callsign"], r["timestamp"])
            for r in transformed_stream(
                opensky_from_kafka(
                    to_kafka_wire(records(batch), "icao24", "sky")
                )
            ).collect()
        }
        assert got == want
        assert len(got) == 13  # 20 minus the 7 blank-key rows (0,3,..18)
        assert all(k.startswith("ab") for k, _, _ in got)  # lowercased
