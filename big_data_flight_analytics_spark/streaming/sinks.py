"""S7/IO11: keyed upsert sinks via foreachBatch.

The reference serves stream results through Kafka Connect Mongo sinks
doing ReplaceOne-by-_id upserts (connectors/mongodb-*-sink.json,
ReplaceOneDefaultStrategy). Engine equivalent: a foreachBatch merge —
latest row per key wins. ``ParquetUpsertSink`` is the file-backed
store used in tests and local runs; a Mongo/JDBC production sink
implements the same ``merge`` contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ParquetUpsertSink:
    """Keyed latest-wins upsert into a parquet directory.

    Each batch: read current state, union the batch, keep the newest row
    per key (by ``version_col``, e.g. window_end_ms; ties broken by
    batch recency), atomically swap. Single-writer assumption (one
    streaming query per sink path) — same as the reference's one
    connector per topic.
    """

    def __init__(self, path: str, key_col: str, version_col: str) -> None:
        self.path = path
        self.key_col = key_col
        self.version_col = version_col

    def merge(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.withColumn("__batch", F.lit(batch_id))
        if os.path.exists(self.path):
            current = spark.read.parquet(self.path)
            merged = current.unionByName(batch, allowMissingColumns=True)
        else:
            merged = batch
        from pyspark.sql import Window

        w = (
            Window.partitionBy(self.key_col)
            .orderBy(F.col(self.version_col).desc(), F.col("__batch").desc())
        )
        latest = (
            merged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        # materialize before overwriting the path we just read
        staging = self.path + ".staging"
        latest.write.mode("overwrite").parquet(staging)
        final = spark.read.parquet(staging)
        final.write.mode("overwrite").parquet(self.path)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self.merge(batch_df, batch_id)

    def read(self, spark) -> DataFrame:
        return spark.read.parquet(self.path).drop("__batch")
