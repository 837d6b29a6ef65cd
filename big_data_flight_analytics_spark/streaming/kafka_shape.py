"""Kafka wire-format contract, testable without a broker (IO8 support).

``readStream.format("kafka").load()`` always yields the same seven
columns — key/value as BINARY plus topic/partition/offset/timestamp/
timestampType metadata. Everything downstream of the source (binary ->
string cast, JSON parse, event-time extraction) is plain DataFrame
code, so the parse path can be exercised brokerlessly by constructing
that exact frame from any source (rate, file replay, in-memory rows).
The broker-gated smoke (`tests/test_kafka_smoke.py`) covers the
connector itself; this module covers everything after ``.load()`` —
previously only exercised when ``SPARK_GRAFT_KAFKA`` was set.

reference: StreamProcessor.java:36-54 (the consumed record's
key/value/timestamp are the same wire triplet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from big_data_flight_analytics_spark.sources.writers import (
    kafka_message_frame,
)
from big_data_flight_analytics_spark.streaming.enrichment import (
    parse_opensky,
)

# The exact schema the Kafka source emits (spark-sql-kafka-0-10's
# KafkaRecordToRowConverter, minus optional headers).
KAFKA_WIRE_SCHEMA = StructType(
    [
        StructField("key", BinaryType(), True),
        StructField("value", BinaryType(), True),
        StructField("topic", StringType(), True),
        StructField("partition", IntegerType(), True),
        StructField("offset", LongType(), True),
        StructField("timestamp", TimestampType(), True),
        StructField("timestampType", IntegerType(), True),
    ]
)


def to_kafka_wire(
    df: DataFrame,
    key_col: str,
    topic: str,
    timestamp_col: str | None = None,
) -> DataFrame:
    """Any keyed frame -> the exact Kafka source wire shape.

    Framing reuses ``kafka_message_frame`` (key = string key, value =
    JSON of all columns) so the brokerless wire is byte-identical to
    what ``write_kafka`` would produce and a broker would hand back.
    Works on batch and streaming frames alike (pure projection).
    partition/offset are synthesized (0 / monotonic id in batch, 0/0 in
    streams where monotonic ids are unsupported) — consumers must not
    depend on them, which is itself part of the contract this shape
    tests.
    """
    offset = (
        F.lit(0).cast("long")
        if df.isStreaming
        else F.monotonically_increasing_id()
    )
    # The event-time column must stay INSIDE the JSON payload (so the
    # value bytes really are what write_kafka would produce and the
    # parse path reads a non-null timestamp); only a DUPLICATE of it
    # rides as passthrough to become the Kafka record timestamp.
    if timestamp_col:
        src = df.withColumn(
            "__wire_ts", F.col(timestamp_col).cast("timestamp")
        )
        kv = kafka_message_frame(src, key_col, passthrough=("__wire_ts",))
        ts = F.col("__wire_ts")
    else:
        kv = kafka_message_frame(df, key_col)
        ts = F.current_timestamp()
    return kv.select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        F.lit(0).cast("int").alias("partition"),
        offset.alias("offset"),
        ts.alias("timestamp"),
        F.lit(0).cast("int").alias("timestampType"),
    )


def opensky_from_kafka(raw: DataFrame) -> DataFrame:
    """Kafka wire frame -> typed OpenSky columns (the IO8 parse path).

    Validates the wire contract FIRST (fail loud on source drift — a
    string-typed value column would silently change cast semantics),
    then runs the same ``parse_opensky`` the file-replay tests use:
    binary value -> string cast -> from_json -> event_time. Kafka
    metadata columns are dropped after the parse so downstream
    operators see the same schema from any source.
    """
    by_name = {f.name: f.dataType for f in raw.schema.fields}
    for field in KAFKA_WIRE_SCHEMA.fields:
        got = by_name.get(field.name)
        if got != field.dataType:
            raise TypeError(
                "kafka wire contract violation: column "
                f"{field.name!r} is {got}, expected {field.dataType}"
            )
    return parse_opensky(raw, value_col="value")
