"""Checkpoint recovery: stateful stream restart is exactly-once.

The round-trip a production deployment actually depends on: a windowed
aggregation runs with a checkpoint, stops mid-window, and a NEW query
(fresh process in real life) resumes from the same checkpoint. Three
properties are pinned:

1. State recovery — the window's final count includes events processed
   BEFORE the restart (lost state would undercount).
2. Source exactly-once — files consumed before the restart are not
   re-read (the file-source log lives in the checkpoint).
3. Sink exactly-once — the closed window is emitted exactly once
   across all runs, and an idle restart with no new data emits nothing.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from big_data_flight_analytics_spark.sources.replay import FileReplay
from big_data_flight_analytics_spark.streaming.windowed_counts import (
    windowed_distinct_counts,
)

BASE = 1_700_000_040  # epoch-minute aligned
SCHEMA = "ts long, user_id long, event_type string"


def ev(ts, user, kind="click"):
    return {"ts": ts, "user_id": user, "event_type": kind}


def _build(raw):
    parsed = raw.select(
        F.from_json("value", SCHEMA).alias("r")
    ).select("r.*")
    events = parsed.withColumn("event_time", F.timestamp_seconds("ts"))
    return windowed_distinct_counts(
        events,
        key_col="event_type",
        id_col="user_id",
        window="1 minute",
        watermark="0 seconds",
    )


def _run_once(spark, replay, ckpt, out_path):
    """One availableNow incarnation of the query; appends emissions."""

    def sink(df, _epoch):
        rows = [r.asDict() for r in df.collect()]
        with open(out_path, "a") as fh:
            for r in rows:
                fh.write(json.dumps(r, sort_keys=True) + "\n")

    q = (
        _build(replay.stream(spark))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _emitted(out_path):
    try:
        with open(out_path) as fh:
            return [json.loads(line) for line in fh]
    except FileNotFoundError:
        return []


class TestCheckpointRecovery:
    def test_windowed_state_survives_restart_exactly_once(
        self, spark, tmp_path
    ):
        src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
        out = str(tmp_path / "emitted.jsonl")
        replay = FileReplay(src)

        # run 1: three events from two users inside one minute — the
        # window stays open (watermark hasn't passed its end), nothing
        # may be emitted yet
        replay.write_batch([
            ev(BASE + 1, 1), ev(BASE + 2, 2), ev(BASE + 3, 1),
        ])
        _run_once(spark, replay, ckpt, out)
        assert _emitted(out) == []

        # run 2 (the restart): a third user joins the SAME window, then
        # a far-future sentinel closes it. The emitted count must cover
        # all four events / three users — i.e. run-1 state was
        # recovered, and run-1's file was not re-read (re-reading would
        # double-count n_events to 7).
        replay.write_batch([ev(BASE + 30, 3)])
        replay.write_batch([ev(BASE + 7200, -1, kind="__flush__")])
        _run_once(spark, replay, ckpt, out)
        rows = [
            r for r in _emitted(out) if r["event_type"] != "__flush__"
        ]
        assert rows == [{
            "event_type": "click",
            "window_start_epoch": BASE - BASE % 60,
            "distinct_count": 3,
            "n_events": 4,
        }]

        # run 3: idle restart — no new files, no re-emission
        _run_once(spark, replay, ckpt, out)
        assert len([
            r for r in _emitted(out) if r["event_type"] != "__flush__"
        ]) == 1
