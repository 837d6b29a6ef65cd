"""Writers and sinks (IO4-IO6, IO10-IO11).

Scale stance vs the reference:
- parquet: default is a partitioned parallel write; the reference's
  ``coalesce(1)`` single-file pattern (transform.py:67-70) kills write
  parallelism and is kept only behind ``single_file=True``;
- kafka-shaped output: the reference collect()s whole DataFrames to the
  driver and loops a Python producer (flights_lookup_to_kafka.py:57-88)
  — here rows are serialized distributedly to (key, value-JSON) columns,
  which ``.write.format("kafka")`` ships executor-side (no driver
  funnel); in tests the same frame is written to parquet;
- upsert sink: reproduces the Kafka-Connect ReplaceOne-by-_id upsert
  (connectors/mongodb-*-sink.json) as a foreachBatch merge for any
  key-value store; the test double keeps latest-per-key parquet state.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    single_file: bool = False,
) -> None:
    writer = df.coalesce(1).write if single_file else df.write
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.mode(mode).parquet(path)


def kafka_message_frame(
    df: DataFrame, key_col: str, passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """(key, value) frame: key = string key column, value = JSON of all
    columns — the shape ``.write.format("kafka")`` expects. Stays fully
    distributed; no driver collect (contrast IO6 reference pattern).

    ``passthrough`` columns ride alongside (key, value) WITHOUT
    entering the JSON payload — e.g. an event-time column the wire
    shape needs as Kafka record timestamp (`streaming.kafka_shape`).
    """
    payload_cols = [c for c in df.columns if c not in passthrough]
    payload = F.to_json(F.struct(*[F.col(c) for c in payload_cols]))
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        payload.alias("value"),
        *[F.col(c) for c in passthrough],
    )


def write_kafka(df: DataFrame, topic: str, bootstrap_servers: str, key_col: str) -> None:
    """Executor-side Kafka batch write (needs the kafka connector jar)."""
    (
        kafka_message_frame(df, key_col)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .save()
    )


class KafkaTopicAdmin:
    """Thin admin-client adapter behind :func:`ensure_topic` (IO7).

    Wraps whichever Kafka admin library is installed — the reference's
    ``confluent_kafka.admin.AdminClient`` first, ``kafka-python``'s
    ``KafkaAdminClient`` as a fallback — behind two calls:
    ``topic_names()`` and ``create_topic()``. Tests inject a fake with
    the same two methods, so the ensure logic is verified without a
    broker; the broker-gated smoke exercises a real client.
    """

    def __init__(self, bootstrap_servers: str, timeout_s: float = 10.0):
        self._timeout = timeout_s
        try:
            from confluent_kafka.admin import AdminClient, NewTopic

            self._impl = "confluent"
            self._new_topic = NewTopic
            self._admin = AdminClient({"bootstrap.servers": bootstrap_servers})
            return
        except ImportError:
            pass
        try:
            from kafka.admin import KafkaAdminClient, NewTopic

            self._impl = "kafka-python"
            self._new_topic = NewTopic
            self._admin = KafkaAdminClient(
                bootstrap_servers=bootstrap_servers,
                request_timeout_ms=int(timeout_s * 1000),
            )
            return
        except ImportError:
            raise ImportError(
                "ensure_topic needs a Kafka admin client "
                "(pip install confluent-kafka or kafka-python), or pass "
                "an explicit admin adapter"
            ) from None

    def topic_names(self) -> set[str]:
        if self._impl == "confluent":
            return set(self._admin.list_topics(timeout=self._timeout).topics)
        return set(self._admin.list_topics())

    def create_topic(
        self, topic: str, num_partitions: int, replication_factor: int
    ) -> None:
        if self._impl == "confluent":
            futures = self._admin.create_topics(
                [self._new_topic(topic, num_partitions, replication_factor)]
            )
            for f in futures.values():
                f.result(timeout=self._timeout * 3)
        else:
            self._admin.create_topics(
                [
                    self._new_topic(
                        name=topic,
                        num_partitions=num_partitions,
                        replication_factor=replication_factor,
                    )
                ]
            )


def ensure_topic(
    topic: str,
    bootstrap_servers: str = "",
    num_partitions: int = 3,
    replication_factor: int = 1,
    admin=None,
) -> bool:
    """Idempotently create ``topic`` if the cluster doesn't have it (IO7).

    Returns True if the topic was created, False if it already existed.
    Defaults mirror the reference's lookup-topic bootstrap
    (orchestration/src/shared.py:50-65: 3 partitions, replication 1);
    at scale, partition count should match expected consumer
    parallelism, so override ``num_partitions`` for hot topics.

    A concurrent creator racing between the existence check and the
    create is treated as success (the topic exists either way) — the
    reference would crash on that race.
    """
    if admin is None:
        admin = KafkaTopicAdmin(bootstrap_servers)
    if topic in admin.topic_names():
        return False
    try:
        admin.create_topic(topic, num_partitions, replication_factor)
    except Exception as exc:  # noqa: BLE001 — race: created concurrently
        if "exist" in str(exc).lower() or type(exc).__name__ in (
            "TopicAlreadyExistsError",
            "TopicExistsError",
        ):
            return False
        raise
    return True


def upsert_foreach_batch(
    merge_fn: Callable[[DataFrame, int], None]
) -> Callable[[DataFrame, int], None]:
    """Adapter for ``writeStream.foreachBatch`` upsert sinks (S7/IO11).

    ``merge_fn(batch_df, batch_id)`` performs the keyed merge into the
    serving store. Provided as a named hook so streaming jobs declare
    upsert intent explicitly; see streaming.sinks.ParquetUpsertSink for
    the file-based test double.
    """
    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        merge_fn(batch_df, batch_id)

    return _apply


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> None:
    """Partitioned parallel ORC write — same contract as write_parquet
    for deployments standardized on the ORC format."""
    writer = df.write
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.mode(mode).orc(path)


def write_json(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    compression: str | None = None,
) -> None:
    """Partitioned parallel NDJSON write (one object per line per
    part-file) — the interchange format for the replay/ingest path.
    JSON is a row format with no pushdown or pruning on re-read; it is
    an EXPORT format here, not a lake format — keep hot-path data in
    parquet/ORC."""
    writer = df.write
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if compression:
        writer = writer.option("compression", compression)
    writer.mode(mode).json(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    header: bool = True,
    compression: str | None = None,
) -> None:
    """Partitioned parallel CSV write — closes the loop with
    ``readers.read_csv`` (the reference ingests CSV; pipelines that
    hand results back to CSV-consuming tools need the inverse). Same
    contract as the other writers; like JSON, CSV is an EXPORT format
    (no types, no pushdown, no pruning on re-read) — keep hot-path
    data in parquet/ORC. Timestamps serialize ISO-8601 so a
    read_csv round trip with an explicit schema is lossless at
    microsecond grain."""
    writer = df.write.option("header", str(header).lower())
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if compression:
        writer = writer.option("compression", compression)
    writer = writer.option(
        "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    )
    writer.mode(mode).csv(path)
