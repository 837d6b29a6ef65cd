"""Streaming windowed top-k == batch rank, exact.

The design claim under test: in append mode a closed window's count
rows all emit in ONE micro-batch (the one whose watermark passes the
window end), so ranking inside foreachBatch sees each window complete
and needs no second stateful operator. The replay forces three
micro-batches and asserts the union of ranked emissions equals the
batch window-rank answer on the same (non-sentinel) data.
"""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.streaming.windowed_counts import (
    rank_topk,
    windowed_key_counts,
    windowed_topk_query,
)


def _mk_events(base_s: int, counts: dict[str, int], start_id: int):
    rows = []
    i = start_id
    for etype, n in counts.items():
        for j in range(n):
            rows.append(
                Row(
                    event_id=i,
                    event_time_s=base_s + (j % 50),
                    event_type=etype,
                )
            )
            i += 1
    return rows, i


class _Collector:
    def __init__(self):
        self.rows = []
        self.batches = []

    def __call__(self, ranked_df, batch_id):
        batch_rows = [tuple(r) for r in ranked_df.collect()]
        if batch_rows:
            self.batches.append(sorted(batch_rows))
        self.rows.extend(batch_rows)


def test_windowed_topk_stream_equals_batch(spark, tmp_path):
    rows0, i = _mk_events(0, {"a": 5, "b": 3, "c": 1}, 0)
    rows1, i = _mk_events(60, {"b": 4, "c": 4, "a": 1}, i)
    rows2, i = _mk_events(120, {"c": 2, "a": 2, "b": 1}, i)
    sentinel, i = _mk_events(10_000, {"__flush__": 1}, i)

    files = [rows0, rows1, rows2 + sentinel]
    replay = tmp_path / "replay"
    replay.mkdir()
    schema = None
    for n, rs in enumerate(files):
        p = str(replay / f"b{n}.parquet")
        df = spark.createDataFrame(rs)
        schema = df.schema
        df.coalesce(1).write.mode("overwrite").parquet(p + ".dir")
        src = next(
            f
            for f in os.listdir(p + ".dir")
            if f.endswith(".parquet") and not f.startswith("_")
        )
        os.rename(os.path.join(p + ".dir", src), p)
        os.utime(p, (1_000_000_000 + n, 1_000_000_000 + n))

    def with_ts(df):
        return df.withColumn(
            "event_time", F.timestamp_seconds(F.col("event_time_s"))
        )

    collector = _Collector()
    stream = with_ts(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(replay))
    )
    q = (
        windowed_topk_query(
            stream,
            "event_type",
            collector,
            k=2,
            window="1 minute",
            watermark="0 seconds",
            checkpoint=str(tmp_path / "ckpt"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(t for t in collector.rows if t[1] != "__flush__")
    batch = with_ts(spark.createDataFrame(rows0 + rows1 + rows2))
    want = sorted(
        tuple(r)
        for r in rank_topk(
            windowed_key_counts(
                batch, "event_type", window="1 minute", watermark="0 seconds"
            ),
            k=2,
            key_col="event_type",
        ).collect()
    )
    assert got == want
    assert len(want) == 6  # 3 windows x top-2
    # every window's ranked rows arrived in a single batch emission
    for b in collector.batches:
        windows_in_batch = {t[0] for t in b}
        for w in windows_in_batch:
            rows_for_w = [t for t in b if t[0] == w]
            ranks = sorted(t[3] for t in rows_for_w if t[1] != "__flush__")
            assert ranks in ([1], [1, 2])
