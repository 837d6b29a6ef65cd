"""IO13: deterministic file-replay streaming source (test/dev harness).

The reference replays a JSON fixture into Kafka in timed batches
(producer/producer.py:100-135, --mode file --partition-size N
--interval T). Engine equivalent without a broker: write each batch as
an NDJSON file with a monotonically increasing mtime, read with the
file stream source using ``maxFilesPerTrigger=1`` — one deterministic
micro-batch per replay batch, in order, with event-time coming from the
records themselves.

Flush note for append-mode consumers: a record dropped by any pre-agg
filter never advances the watermark (Catalyst pushes deterministic
filters below the EventTimeWatermark node), so windows close only when
a *surviving* later-timestamped record arrives. Replays that should
flush final windows must end with a far-future record that passes the
job's filters (see tests/test_streaming.py SENTINEL).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession


class FileReplay:
    """Writes replay batches; builds the matching readStream."""

    def __init__(self, directory: str) -> None:
        self.directory = directory
        os.makedirs(directory, exist_ok=True)
        self._batch_no = 0
        self._base_mtime = 1_000_000_000

    def write_batch(self, records: Iterable[Mapping]) -> str:
        """One NDJSON file per batch; mtime encodes replay order."""
        path = os.path.join(self.directory, f"batch-{self._batch_no:06d}.json")
        with open(path, "w") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")
        mtime = self._base_mtime + self._batch_no
        os.utime(path, (mtime, mtime))
        self._batch_no += 1
        return path

    def stream(self, spark: SparkSession) -> DataFrame:
        """Raw value-per-line stream, one micro-batch per written file."""
        return (
            spark.readStream.schema("value string")
            .option("maxFilesPerTrigger", 1)
            .text(self.directory)
        )
