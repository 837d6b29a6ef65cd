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
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ParquetUpsertSink:
    """Keyed latest-wins upsert into a parquet directory.

    Each batch: read current state, union the batch, keep the newest row
    per key (by ``version_col``, e.g. window_end_ms; ties broken by
    batch recency), then swap the new state in via directory renames so
    a crash at any point leaves a complete store (live, or staging plus
    the previous live — never a half-written directory presented as
    live; ``_recover`` promotes/cleans on the next batch). Single-writer
    assumption (one streaming query per sink path) — same as the
    reference's one connector per topic.
    """

    def __init__(self, path: str, key_col: str, version_col: str) -> None:
        self.path = path
        self.key_col = key_col
        self.version_col = version_col

    @property
    def _staging(self) -> str:
        return self.path + ".staging"

    @property
    def _old(self) -> str:
        return self.path + ".old"

    def _recover(self) -> None:
        """Roll forward/clean up after a crash mid-swap.

        Crash windows (swap = rename live->old, rename staging->live,
        delete old):
        - before any rename: live intact, staging partial -> drop staging;
        - between the renames: live missing, staging COMPLETE (it is only
          ever renamed after a successful write, _SUCCESS present) ->
          promote staging to live;
        - after the second rename: live is the new state -> drop old.
        """
        if not os.path.exists(self.path) and os.path.exists(
            os.path.join(self._staging, "_SUCCESS")
        ):
            os.rename(self._staging, self.path)
        for leftover in (self._staging, self._old):
            if os.path.exists(leftover):
                shutil.rmtree(leftover)

    def merge(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        self._recover()
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
        # materialize the merge to staging (we are still reading the live
        # dir), then swap directories — the live path always points at a
        # complete store
        latest.write.mode("overwrite").parquet(self._staging)
        if os.path.exists(self.path):
            os.rename(self.path, self._old)
        os.rename(self._staging, self.path)
        if os.path.exists(self._old):
            shutil.rmtree(self._old)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self.merge(batch_df, batch_id)

    def read(self, spark) -> DataFrame:
        return spark.read.parquet(self.path).drop("__batch")
