"""IO12 REST poller: loop semantics without network or wall-clock.

reference: producer/producer.py:56-98 — plus the hardening the
reference lacks (backoff, unchanged-payload dedup, bounded runs).
The end-to-end test chains poller -> FileReplay (IO13) -> Structured
Streaming, proving polled data flows into the SAME jobs the replay
tests run."""

from __future__ import annotations

import threading

from big_data_flight_analytics_spark.sources.poller import RestPoller


def immediate_sleep(calls):
    def _sleep(s):
        calls.append(s)

    return _sleep


class TestRestPoller:
    def test_batches_flow_in_order(self):
        feeds = [[{"a": 1}], [{"a": 2}, {"a": 3}], None, []]
        it = iter(feeds)
        sunk = []
        sleeps = []
        p = RestPoller(
            lambda: next(it),
            sunk.append,
            interval_s=1.0,
            max_polls=4,
            sleep=immediate_sleep(sleeps),
        )
        p.run()
        assert sunk == [[{"a": 1}], [{"a": 2}, {"a": 3}]]
        assert (p.polls, p.batches_sunk, p.records_sunk) == (4, 2, 3)
        assert p.errors == 0
        # empty/None ticks sink nothing but are normal cadence
        assert all(s == 1.0 for s in sleeps)

    def test_backoff_on_errors_and_reset_on_success(self):
        state = {"n": 0}

        def flaky():
            state["n"] += 1
            if state["n"] <= 3:
                raise RuntimeError("down")
            return [{"ok": state["n"]}]

        sunk, sleeps = [], []
        p = RestPoller(
            flaky,
            sunk.append,
            interval_s=10.0,
            backoff_base=2.0,
            max_backoff_s=35.0,
            max_polls=5,
            sleep=immediate_sleep(sleeps),
        )
        p.run()
        # 3 failures: 20, 35 (40 capped), 35 (80 capped); success: 10
        assert sleeps == [20.0, 35.0, 35.0, 10.0]
        assert p.errors == 3 and p.batches_sunk == 2

    def test_unchanged_payload_deduped(self):
        snap = [{"t": 1, "v": "same"}]
        feeds = [snap, snap, [{"t": 2}], snap]
        it = iter(feeds)
        sunk = []
        p = RestPoller(
            lambda: next(it),
            sunk.append,
            max_polls=4,
            sleep=lambda s: None,
        )
        p.run()
        # second identical snapshot skipped; the LATER repeat of the
        # first snapshot sinks again (dedup is against the immediately
        # previous payload — OpenSky's cache-window behavior)
        assert len(sunk) == 3
        assert p.skipped_unchanged == 1

    def test_dedup_off_sinks_everything(self):
        snap = [{"x": 1}]
        it = iter([snap, snap])
        sunk = []
        RestPoller(
            lambda: next(it),
            sunk.append,
            max_polls=2,
            dedup_unchanged=False,
            sleep=lambda s: None,
        ).run()
        assert len(sunk) == 2

    def test_stop_event_halts_promptly(self):
        stop = threading.Event()
        calls = {"n": 0}

        def fetch():
            calls["n"] += 1
            if calls["n"] == 2:
                stop.set()
            return [{"n": calls["n"]}]

        p = RestPoller(
            fetch, lambda b: None, stop_event=stop, sleep=lambda s: None
        )
        p.run()
        assert calls["n"] == 2  # no third poll after the event


class TestPollerToStream:
    def test_polled_batches_become_a_streaming_source(self, spark, tmp_path):
        """IO12 -> IO13 -> Structured Streaming end-to-end: the polled
        feed runs the same parse path as the replay tests."""
        from pyspark.sql import functions as F

        from big_data_flight_analytics_spark.sources.replay import FileReplay

        src = str(tmp_path / "polled")
        replay = FileReplay(src)
        feeds = iter(
            [
                [{"timestamp": 1_700_000_001, "icao24": "ab0001"}],
                [{"timestamp": 1_700_000_002, "icao24": "ab0002"}],
            ]
        )
        RestPoller(
            lambda: next(feeds),
            replay.write_batch,
            max_polls=2,
            sleep=lambda s: None,
        ).run()

        from big_data_flight_analytics_spark.streaming.enrichment import (
            parse_opensky,
            transformed_stream,
        )

        out = transformed_stream(parse_opensky(replay.stream(spark)))
        q = (
            out.select("icao24", "timestamp")
            .writeStream.format("memory")
            .queryName("polled_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["icao24"], r["timestamp"])
            for r in spark.sql("select * from polled_stream").collect()
        }
        assert got == {("ab0001", 1_700_000_001), ("ab0002", 1_700_000_002)}
