"""Driver-path timestamp regression tests.

PySpark >= 4.1 reads parquet written with naive microsecond timestamps
as TIMESTAMP_NTZ, and several builtins (``unix_micros``) reject NTZ
input. The in-memory fixtures used elsewhere in the suite always build
LTZ timestamps via ``createDataFrame``, so this file exercises the
actual parquet-read path the driver uses:

- ``load()`` must normalize an NTZ ``events.ts`` to session-zone
  TIMESTAMP (identity under the engine's pinned UTC timezone);
- the temporal operators must work when handed a raw NTZ frame that
  did NOT come through ``load()`` (library surface);
- the full catalog must run against the real driver testdata, so the
  suite can never be green while a driver-environment query is broken.
"""

from __future__ import annotations

import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

from big_data_flight_analytics_spark.operators.temporal import (
    asof_join,
    session_stats,
    sessionize,
)
from big_data_flight_analytics_spark.plans.catalog import QUERIES
from big_data_flight_analytics_spark.plans.tables import load

SF0001 = "/root/testdata/sf0.001"

NTZ_EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, "
    "event_type string, value double, props string"
)


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _ntz_events(spark):
    rows = [
        (1, ts("2024-01-01T00:00:00"), 7, "click", 1.0, "{}"),
        (2, ts("2024-01-01T00:10:00"), 7, "view", 2.0, "{}"),
        (3, ts("2024-01-01T01:00:00"), 7, "click", 3.0, "{}"),
        (4, ts("2024-01-01T00:05:00"), 8, "view", 4.0, "{}"),
    ]
    df = spark.createDataFrame(rows, NTZ_EVENTS_SCHEMA)
    assert isinstance(df.schema["ts"].dataType, TimestampNTZType)
    return df


class TestLoadNormalizesNTZ:
    def test_ntz_parquet_reads_back_as_ltz(self, spark, tmp_path):
        path = str(tmp_path / "events.parquet")
        _ntz_events(spark).write.parquet(path)
        # confirm the fixture really produces an NTZ file on disk
        raw = spark.read.parquet(path)
        assert isinstance(raw.schema["ts"].dataType, TimestampNTZType)

        df = load(spark, str(tmp_path), "events")
        assert isinstance(df.schema["ts"].dataType, TimestampType)
        # the cast is a type-tag change only under the UTC session tz:
        # wall-clock values must be preserved exactly
        got = {
            r["event_id"]: r["us"]
            for r in df.select(
                "event_id", F.unix_micros("ts").alias("us")
            ).collect()
        }
        base = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in micros
        assert got[1] == base
        assert got[2] == base + 600 * 1_000_000

    def test_driver_testdata_events_is_ltz(self, spark):
        if not os.path.exists(f"{SF0001}/events.parquet"):
            pytest.skip("driver testdata not present")
        df = load(spark, SF0001, "events")
        assert isinstance(df.schema["ts"].dataType, TimestampType)


class TestTemporalOperatorsOnRawNTZ:
    """Library surface: callers won't all come through load()."""

    def test_sessionize_on_ntz(self, spark):
        out = sessionize(
            _ntz_events(spark), "user_id", "ts", gap_seconds=1800,
            tie_col="event_id",
        )
        got = {r["event_id"]: r["session_idx"] for r in out.collect()}
        # 10-min gap keeps events 1-2 together; 50-min gap splits 3
        assert got == {1: 1, 2: 1, 3: 2, 4: 1}

    def test_session_stats_on_ntz(self, spark):
        out = session_stats(
            _ntz_events(spark), "user_id", "ts", gap_seconds=1800,
            tie_col="event_id",
        )
        by_key = {
            (r["user_id"], r["session_idx"]): (r["n_events"], r["duration_us"])
            for r in out.collect()
        }
        assert by_key[(7, 1)] == (2, 600 * 1_000_000)
        assert by_key[(7, 2)] == (1, 0)
        assert by_key[(8, 1)] == (1, 0)

    def test_gap_fill_on_ntz(self, spark):
        from big_data_flight_analytics_spark.operators.temporal import (
            gap_fill,
        )

        out = gap_fill(_ntz_events(spark), step_s=3600)
        got = {
            (r["user_id"], r["bucket_start_s"]): (
                r["value"],
                r["is_observed"],
            )
            for r in out.collect()
        }
        base = 1704067200  # 2024-01-01 00:00 UTC
        # user 7: bucket 0 latest obs is event 2 (00:10, value 2.0);
        # bucket 1 holds event 3. user 8: single bucket.
        assert got == {
            (7, base): (2.0, True),
            (7, base + 3600): (3.0, True),
            (8, base): (4.0, True),
        }

    def test_asof_join_ntz_probe_ltz_reference(self, spark):
        # mixed zoneness across the two sides — the worst case the
        # union-window pattern can see
        left = _ntz_events(spark).select("event_id", "user_id", "ts")
        right = spark.createDataFrame(
            [(7, ts("2024-01-01T00:03:00"), 500, 9.5)],
            "user_id long, rt timestamp, rid long, v double",
        )
        out = asof_join(
            left, right, on="user_id", left_time="ts", right_time="rt",
            payload={"rid": "asof_rid", "v": "asof_v"}, right_tie="rid",
        )
        got = {r["event_id"]: r["asof_rid"] for r in out.collect()}
        assert got == {1: None, 2: 500, 3: 500, 4: None}


@pytest.mark.skipif(
    not os.path.exists(f"{SF0001}/events.parquet"),
    reason="driver testdata not present",
)
class TestFullCatalogOnDriverTestdata:
    """Every catalog query must at least execute end-to-end against the
    real parquet files the driver reads — the r3 NTZ break was invisible
    to in-memory fixtures."""

    @pytest.mark.parametrize("name", sorted(QUERIES))
    def test_catalog_query_runs(self, spark, name):
        df = QUERIES[name](spark, SF0001)
        df.write.format("noop").mode("overwrite").save()
