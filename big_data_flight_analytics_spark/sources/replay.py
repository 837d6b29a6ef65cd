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
    """Writes replay batches; builds the matching readStream.

    Batches appear in the watched directory ATOMICALLY (temp file
    outside the directory, utime, then rename) so a live stream never
    reads a half-written file or registers a wrong mtime. Reusing a
    directory that already holds batches continues the numbering
    instead of overwriting (FileStreamSource dedupes by path and would
    silently drop rewritten files).
    """

    def __init__(self, directory: str) -> None:
        self.directory = directory
        os.makedirs(directory, exist_ok=True)
        existing = [
            int(f[len("batch-"):-len(".json")])
            for f in os.listdir(directory)
            if f.startswith("batch-") and f.endswith(".json")
        ]
        self._batch_no = max(existing) + 1 if existing else 0
        self._base_mtime = 1_000_000_000

    def write_batch(self, records: Iterable[Mapping]) -> str:
        """One NDJSON file per batch; mtime encodes replay order."""
        name = f"batch-{self._batch_no:06d}.json"
        path = os.path.join(self.directory, name)
        tmp = os.path.join(
            os.path.dirname(self.directory.rstrip(os.sep)) or ".",
            f".{name}.tmp-{os.getpid()}",
        )
        with open(tmp, "w") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")
        mtime = self._base_mtime + self._batch_no
        os.utime(tmp, (mtime, mtime))
        os.rename(tmp, path)
        self._batch_no += 1
        return path

    def stream(self, spark: SparkSession) -> DataFrame:
        """Raw value-per-line stream, one micro-batch per written file."""
        return (
            spark.readStream.schema("value string")
            .option("maxFilesPerTrigger", 1)
            .text(self.directory)
        )
