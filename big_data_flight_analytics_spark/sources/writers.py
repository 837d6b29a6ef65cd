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


def kafka_message_frame(df: DataFrame, key_col: str) -> DataFrame:
    """(key, value) frame: key = string key column, value = JSON of all
    columns — the shape ``.write.format("kafka")`` expects. Stays fully
    distributed; no driver collect (contrast IO6 reference pattern).
    """
    payload = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    return df.select(
        F.col(key_col).cast("string").alias("key"), payload.alias("value")
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
