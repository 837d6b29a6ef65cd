"""IO6/IO8/IO10 end-to-end Kafka smoke — gated on a real broker.

The sandbox has no broker, so the whole module skips unless
``SPARK_GRAFT_KAFKA=<host:port>`` names one. With a broker, the round
trip exercises the three Kafka-facing surfaces against real topics:
batch write (IO6), batch + streaming read (IO8), streaming write
(IO10). The session pulls the Kafka connector for the running
Spark/Scala version via ``spark.jars.packages`` (needs network or a
populated ivy cache — expected wherever a broker exists).
"""

from __future__ import annotations

import os
import uuid

import pytest

KAFKA = os.environ.get("SPARK_GRAFT_KAFKA")

pytestmark = pytest.mark.skipif(
    not KAFKA,
    reason="no Kafka broker configured (set SPARK_GRAFT_KAFKA=host:port)",
)


@pytest.fixture(scope="module")
def kafka_spark():
    import pyspark
    from pyspark.sql import SparkSession

    pkg = f"org.apache.spark:spark-sql-kafka-0-10_2.13:{pyspark.__version__}"
    s = (
        SparkSession.builder.master("local[4]")
        .appName("kafka-smoke")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.jars.packages", pkg)
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def _read_topic(spark, topic):
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", KAFKA)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    )


class TestTopicEnsure:
    def test_io7_ensure_topic_real_broker(self):
        from big_data_flight_analytics_spark.sources.writers import ensure_topic

        topic = f"spark_graft_ensure_{uuid.uuid4().hex[:8]}"
        assert ensure_topic(topic, KAFKA) is True  # created
        assert ensure_topic(topic, KAFKA) is False  # already there


class TestKafkaRoundTrip:
    def test_io6_batch_write_then_io8_batch_read(self, kafka_spark):
        from pyspark.sql import Row, functions as F

        from big_data_flight_analytics_spark.sources.writers import write_kafka

        topic = f"spark_graft_smoke_{uuid.uuid4().hex[:8]}"
        df = kafka_spark.createDataFrame(
            [Row(icao24="aaa111", n=1), Row(icao24="bbb222", n=2)]
        )
        write_kafka(df, topic, KAFKA, key_col="icao24")

        got = _read_topic(kafka_spark, topic).select(
            F.col("key").cast("string").alias("key"),
            F.get_json_object(F.col("value").cast("string"), "$.n").alias("n"),
        )
        rows = {(r["key"], r["n"]) for r in got.collect()}
        assert rows == {("aaa111", "1"), ("bbb222", "2")}

    def test_io8_stream_read_io10_stream_write(self, kafka_spark, tmp_path):
        from pyspark.sql import Row, functions as F

        from big_data_flight_analytics_spark.sources.writers import write_kafka

        src_topic = f"spark_graft_smoke_{uuid.uuid4().hex[:8]}"
        dst_topic = f"spark_graft_smoke_{uuid.uuid4().hex[:8]}"
        df = kafka_spark.createDataFrame(
            [Row(icao24=f"ac{i:04d}", n=i) for i in range(10)]
        )
        write_kafka(df, src_topic, KAFKA, key_col="icao24")

        # IO8: stream from the source topic; IO10: stream into the
        # destination topic — uppercase the key in between so the sink
        # provably saw the transformed stream
        stream = (
            kafka_spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", KAFKA)
            .option("subscribe", src_topic)
            .option("startingOffsets", "earliest")
            .load()
            .select(
                F.upper(F.col("key").cast("string")).alias("key"),
                F.col("value").cast("string").alias("value"),
            )
        )
        q = (
            stream.writeStream.format("kafka")
            .option("kafka.bootstrap.servers", KAFKA)
            .option("topic", dst_topic)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        keys = {
            r["key"]
            for r in _read_topic(kafka_spark, dst_topic)
            .select(F.col("key").cast("string").alias("key"))
            .collect()
        }
        assert keys == {f"AC{i:04d}" for i in range(10)}
