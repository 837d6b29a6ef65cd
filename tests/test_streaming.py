"""Structured Streaming tests (SURVEY §5.4): file-source replays of
OpenSky-shaped fixtures with crafted event times.

Asserted on FINAL SINK CONTENTS, not emission timing (SURVEY §7 watch
list): exact window membership, late-record drops at watermark 0,
emit-final (one row per key per closed window), stream-batch
equivalence, keyed upsert latest-wins.

File-source mechanics: ``maxFilesPerTrigger=1`` + ``availableNow`` gives
one micro-batch per file in mtime order; the watermark advances between
batches, so windows emit in the batch after their data's file. A far-
future sentinel event in the last file flushes all real windows.
"""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.streaming.enrichment import (
    enrich_stream,
    parse_opensky,
    transformed_stream,
)
from big_data_flight_analytics_spark.streaming.sinks import ParquetUpsertSink
from big_data_flight_analytics_spark.streaming.windowed_counts import (
    airline_aircraft_counts,
    airport_aircraft_counts,
)

BASE = 1_700_000_040  # aligned to an epoch minute boundary (divisible by 60)


def sv(ts, icao, callsign=None, lat=None, lon=None, **kw):
    """OpenSky state-vector JSON record."""
    rec = {
        "timestamp": ts, "icao24": icao, "callsign": callsign,
        "origin_country": "USA", "longitude": lon, "latitude": lat,
        "geo_altitude": 1000.0, "velocity": 200.0, "true_track": 90.0,
        "vertical_rate": 0.0, "on_ground": False, "baro_altitude": 990.0,
    }
    rec.update(kw)
    return rec


_replays: dict[str, "FileReplay"] = {}


def write_file(dirpath, name, records, mtime):
    """Delegates to sources.replay.FileReplay — batch order is call
    order (the name/mtime args are legacy signature, ordering is what
    matters and every call site writes in replay order)."""
    from big_data_flight_analytics_spark.sources.replay import FileReplay

    rp = _replays.get(dirpath)
    if rp is None:
        rp = _replays[dirpath] = FileReplay(dirpath)
    return rp.write_batch(records)


def run_stream(spark, src_dir, build, sink_fn=None, query_name="q",
               output_mode="append"):
    """availableNow one-file-per-batch run; returns collected rows."""
    from big_data_flight_analytics_spark.sources.replay import FileReplay

    raw = _replays.get(src_dir, FileReplay(src_dir)).stream(spark)
    out = build(raw)
    if sink_fn is None:
        q = (
            out.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.sql(f"select * from {query_name}").collect()
    q = (
        out.writeStream.foreachBatch(sink_fn)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return None


# Flush sentinel: far-future event that survives every pre-agg filter
# (valid callsign AND valid-but-remote coordinates). Catalyst pushes
# deterministic filters below the EventTimeWatermark node, so a record
# that a pre-agg filter drops never advances the watermark.
SENTINEL = [sv(BASE + 7200, "zz9999", callsign="ZZZ999", lat=-89.0, lon=0.0)]


class TestEnrichment:
    def test_stream_static_joins(self, spark, tmp_path):
        src = str(tmp_path / "src")
        os.makedirs(src)
        write_file(src, "f1.json", [
            sv(BASE + 1, "  AB12CD ", callsign="DAL123 "),
            sv(BASE + 2, "ef56gh", callsign=None),
            sv(BASE + 3, "", callsign="X"),          # blank key -> dropped
            sv(BASE + 4, None, callsign="Y"),        # null key -> dropped
        ], BASE)
        aircrafts_lk = spark.createDataFrame([
            Row(icao24="ab12cd", AvgCarrierDelayMinutes=12.5,
                FlightCount=42, DelayScore01=0.7),
        ])
        flights_lk = spark.createDataFrame([
            Row(callsign="DAL123", AirlineName="Delta Air Lines",
                CRSArrTime="13:45", CRSDepTime="08:30"),
        ])

        rows = run_stream(
            spark, src,
            lambda raw: enrich_stream(
                transformed_stream(parse_opensky(raw)), aircrafts_lk, flights_lk
            ),
            query_name="enriched",
        )
        by_id = {r["icao24"]: r for r in rows}
        # blank/null keys dropped (StreamProcessor.java:40)
        assert set(by_id) == {"ab12cd", "ef56gh"}
        hit = by_id["ab12cd"]
        assert hit["_id"] == "ab12cd"  # lowercased + trimmed re-key
        assert hit["avg_carrier_delay_minutes"] == 12.5
        assert hit["lookup_flight_count"] == 42
        assert hit["AirlineName"] == "Delta Air Lines"  # trimmed callsign join
        assert hit["CRSArrTime"] == "13:45"
        miss = by_id["ef56gh"]  # left-join miss keeps row, null fields
        assert miss["avg_carrier_delay_minutes"] is None
        assert miss["AirlineName"] is None


class TestAirlineCounts:
    def build(self, raw, **kw):
        return airline_aircraft_counts(
            transformed_stream(parse_opensky(raw)), **kw
        )

    def test_window_membership_and_rules(self, spark, tmp_path):
        src = str(tmp_path / "src")
        os.makedirs(src)
        w1, w2 = BASE, BASE + 60
        write_file(src, "f1.json", [
            sv(w1 + 1, "aaa111", callsign="DAL123"),
            sv(w1 + 2, "aaa111", callsign="DAL456"),   # same aircraft, same window -> 1
            sv(w1 + 3, "bbb222", callsign="DAL789"),   # second DAL aircraft
            sv(w1 + 4, "ccc333", callsign="N555X"),    # PRIVATE
            sv(w1 + 5, "ddd444", callsign=""),         # blank -> UNKNOWN
            sv(w1 + 6, "eee555", callsign=None),       # null callsign -> dropped
            sv(w2 + 1, "aaa111", callsign="DAL123"),   # next window
        ], BASE)
        write_file(src, "f2.json", SENTINEL, BASE + 10)

        rows = run_stream(spark, src, self.build, query_name="airline_counts")
        got = {(r["airline"], r["window_end_ms"] // 1000): r["aircraft_count"]
               for r in rows}
        assert got[("DAL", w1 + 60)] == 2      # set-dedup of aaa111
        assert got[("PRIVATE", w1 + 60)] == 1
        assert got[("UNKNOWN", w1 + 60)] == 1
        assert got[("DAL", w2 + 60)] == 1
        # null-callsign aircraft appears nowhere
        assert all(r["aircraft_count"] <= 2 for r in rows)
        # emit-final: exactly one row per (key, window)
        keys = [(r["airline"], r["window_end_ms"]) for r in rows]
        assert len(keys) == len(set(keys))
        assert all(r["_id"] == r["airline"] for r in rows)

    def test_late_record_dropped_at_watermark_zero(self, spark, tmp_path):
        src = str(tmp_path / "src")
        os.makedirs(src)
        w1 = BASE
        write_file(src, "f1.json", [
            sv(w1 + 5, "aaa111", callsign="UAL100"),
            sv(w1 + 70, "fff000", callsign="SWA200"),  # advances watermark past w1
        ], BASE)
        # Spark applies the advanced watermark to input filtering one
        # batch later; an intermediate batch makes the drop observable
        write_file(src, "f2.json", [sv(w1 + 80, "ggg111", callsign="SWA201")],
                   BASE + 10)
        # arrives after watermark passed w1's end -> must be dropped
        write_file(src, "f3.json", [
            sv(w1 + 6, "bbb222", callsign="UAL100"),
            *SENTINEL,
        ], BASE + 20)

        rows = run_stream(spark, src, self.build, query_name="late_drop")
        got = {(r["airline"], r["window_end_ms"] // 1000): r["aircraft_count"]
               for r in rows}
        # late bbb222 NOT counted (no-grace tumbling window)
        assert got[("UAL", w1 + 60)] == 1
        # and the closed window emitted exactly once (no late re-emit)
        ual_rows = [r for r in rows
                    if r["airline"] == "UAL" and r["window_end_ms"] // 1000 == w1 + 60]
        assert len(ual_rows) == 1

    def test_streaming_matches_batch(self, spark, tmp_path):
        """The streaming aggregation must equal the same batch plan."""
        src = str(tmp_path / "src")
        os.makedirs(src)
        recs = [
            sv(BASE + i * 7, f"ac{i % 5:04d}", callsign=f"DAL{i % 3}")
            for i in range(40)
        ]
        write_file(src, "f1.json", recs, BASE)
        write_file(src, "f2.json", SENTINEL, BASE + 10)

        rows = run_stream(spark, src, self.build, query_name="sbe")
        stream_got = {
            (r["airline"], r["window_end_ms"]): r["aircraft_count"] for r in rows
        }

        # identical pipeline in batch mode, reading the same file
        batch = transformed_stream(
            parse_opensky(spark.read.text(os.path.join(src, "batch-000000.json")))
        )
        from big_data_flight_analytics_spark.functions.scalar import (
            airline_code_from_callsign,
        )
        bagg = (
            batch.filter(F.col("callsign").isNotNull())
            .withColumn("airline", airline_code_from_callsign(F.col("callsign")))
            .groupBy(F.window("event_time", "1 minute").alias("w"), "airline")
            .agg(F.size(F.collect_set("icao24")).alias("aircraft_count"))
            .select("airline", F.unix_millis(F.col("w.end")).alias("wem"),
                    "aircraft_count")
        )
        batch_got = {
            (r["airline"], r["wem"]): r["aircraft_count"] for r in bagg.collect()
        }
        assert stream_got == batch_got

    def test_approx_variant_runs(self, spark, tmp_path):
        src = str(tmp_path / "src")
        os.makedirs(src)
        write_file(src, "f1.json", [
            sv(BASE + 1, "aaa111", callsign="DAL123"),
            sv(BASE + 2, "bbb222", callsign="DAL456"),
        ], BASE)
        write_file(src, "f2.json", SENTINEL, BASE + 10)
        rows = run_stream(
            spark, src, lambda raw: self.build(raw, exact=False),
            query_name="approx_counts",
        )
        got = {r["airline"]: r["aircraft_count"] for r in rows
               if r["window_end_ms"] // 1000 == BASE + 60}
        assert got["DAL"] == 2  # HLL exact at tiny cardinality


class TestWatermarkStall:
    """The documented stall (windowed_counts caveat), verified both
    ways: records dropped by a pre-watermark filter do NOT advance the
    watermark — a feed of 100% filtered records stalls open windows
    forever — and keepalive=True routes those records through the
    aggregate so they advance event time and flush, without appearing
    in the output."""

    def build(self, raw, **kw):
        return airline_aircraft_counts(
            transformed_stream(parse_opensky(raw)), **kw
        )

    def _stalled_feed(self, tmp_path):
        src = str(tmp_path / "src")
        os.makedirs(src)
        w1 = BASE
        write_file(src, "f1.json", [
            sv(w1 + 1, "aaa111", callsign="DAL123"),
            sv(w1 + 2, "bbb222", callsign="DAL456"),
        ], BASE)
        # two hours of event time, every record null-callsign (filtered)
        write_file(src, "f2.json", [
            sv(w1 + 7200 + i, f"fff{i:03d}", callsign=None) for i in range(5)
        ], BASE + 10)
        return src, w1

    def test_all_filtered_feed_stalls_open_windows(self, spark, tmp_path):
        src, w1 = self._stalled_feed(tmp_path)
        rows = run_stream(spark, src, self.build, query_name="stall")
        # event time moved 2 h past w1's end, but every carrier record
        # was dropped below the watermark node: w1 never closes, append
        # mode emits nothing
        assert rows == []

    def test_keepalive_advances_watermark_and_flushes(self, spark, tmp_path):
        from big_data_flight_analytics_spark.streaming.windowed_counts import (
            KEEPALIVE_KEY,
        )

        src, w1 = self._stalled_feed(tmp_path)
        rows = run_stream(
            spark, src,
            lambda raw: self.build(raw, keepalive=True),
            query_name="keepalive",
        )
        got = {(r["airline"], r["window_end_ms"] // 1000): r["aircraft_count"]
               for r in rows}
        # same feed, keepalive on: w1 closed and emitted
        assert got[("DAL", w1 + 60)] == 2
        # the reserved key never reaches the output
        assert all(r["airline"] != KEEPALIVE_KEY for r in rows)
        assert all(r["_id"] != KEEPALIVE_KEY for r in rows)


class TestSessionCounts:
    def test_gap_merge_and_flush(self, spark, tmp_path):
        from big_data_flight_analytics_spark.streaming.windowed_counts import (
            session_counts,
        )

        src = str(tmp_path / "src")
        os.makedirs(src)
        # aaa111: two events 60s apart (one session at 2-min gap), then
        # one 400s later (new session); events split across files so the
        # session must MERGE across micro-batches
        write_file(src, "f1.json", [
            sv(BASE + 0, "aaa111", callsign="DAL123"),
            sv(BASE + 10, "bbb222", callsign="UAL100"),
        ], BASE)
        write_file(src, "f2.json", [sv(BASE + 60, "aaa111", callsign="DAL123")],
                   BASE + 10)
        write_file(src, "f3.json", [sv(BASE + 400, "aaa111", callsign="DAL123"),
                                    *SENTINEL], BASE + 20)

        def build(raw):
            return session_counts(
                transformed_stream(parse_opensky(raw)), gap="2 minutes"
            )

        rows = run_stream(spark, src, build, query_name="session_counts")
        got = {
            (r["icao24"], r["session_start_ms"] // 1000): r
            for r in rows if r["icao24"] != "zz9999"
        }
        first = got[("aaa111", BASE)]
        assert first["n_events"] == 2
        # session window closes gap after the LAST event
        assert first["session_end_ms"] // 1000 == BASE + 60 + 120
        second = got[("aaa111", BASE + 400)]
        assert second["n_events"] == 1
        assert second["session_end_ms"] // 1000 == BASE + 400 + 120
        assert got[("bbb222", BASE + 10)]["n_events"] == 1
        # emit-final: one row per session
        keys = [(r["icao24"], r["session_start_ms"]) for r in rows]
        assert len(keys) == len(set(keys))


class TestStatefulDedup:
    def test_first_seen_survives_batches(self, spark, tmp_path):
        from pyspark.sql import functions as F2

        from big_data_flight_analytics_spark.streaming.stateful import (
            first_seen_dedup,
        )

        src = str(tmp_path / "src")
        os.makedirs(src)
        # callsign serves as the dedup fingerprint; DAL123 repeats in a
        # LATER batch and must be suppressed by cross-batch state
        write_file(src, "f1.json", [
            sv(BASE + 5, "aaa111", callsign="DAL123"),
            sv(BASE + 1, "bbb222", callsign="DAL123"),  # same batch, earlier
            sv(BASE + 2, "ccc333", callsign="UAL100"),
        ], BASE)
        write_file(src, "f2.json", [
            sv(BASE + 60, "ddd444", callsign="DAL123"),  # repeat -> suppressed
            sv(BASE + 61, "eee555", callsign="SWA200"),  # new -> emitted
        ], BASE + 10)

        def build(raw):
            parsed = transformed_stream(parse_opensky(raw))
            keyed = parsed.filter(F2.col("callsign").isNotNull()).select(
                F2.col("callsign").alias("fingerprint"),
                "icao24",
                F2.unix_micros(F2.col("event_time")).alias("event_us"),
            )
            return first_seen_dedup(keyed)

        rows = run_stream(
            spark, src, build, query_name="stateful_dedup", output_mode="update"
        )
        got = {r["fingerprint"]: r for r in rows if r["fingerprint"] != "ZZZ999"}
        # each fingerprint exactly once, first occurrence wins
        assert set(got) == {"DAL123", "UAL100", "SWA200"}
        assert got["DAL123"]["icao24"] == "bbb222"  # earliest event_us in batch
        assert got["DAL123"]["first_seen_us"] == (BASE + 1) * 1_000_000
        assert got["SWA200"]["icao24"] == "eee555"
        assert len([r for r in rows if r["fingerprint"] == "DAL123"]) == 1


class TestWatermarkedDedup:
    def test_builtin_dedup_suppresses_within_watermark(self, spark, tmp_path):
        from pyspark.sql import functions as F2

        from big_data_flight_analytics_spark.streaming.stateful import (
            watermarked_dedup,
        )

        src = str(tmp_path / "src")
        os.makedirs(src)
        write_file(src, "f1.json", [
            sv(BASE + 1, "aaa111", callsign="DAL123"),
            sv(BASE + 2, "bbb222", callsign="UAL100"),
        ], BASE)
        write_file(src, "f2.json", [
            # repeat ~1 min after first occurrence, inside the 10-min
            # horizon -> suppressed by the JVM-side state store
            sv(BASE + 60, "ccc333", callsign="DAL123"),
            sv(BASE + 61, "ddd444", callsign="SWA200"),
        ], BASE + 10)

        def build(raw):
            parsed = transformed_stream(parse_opensky(raw))
            keyed = parsed.filter(F2.col("callsign").isNotNull()).select(
                F2.col("callsign").alias("fingerprint"),
                "icao24",
                "event_time",
            )
            return watermarked_dedup(keyed)

        rows = run_stream(spark, src, build, query_name="wm_dedup")
        got = [r for r in rows if r["fingerprint"] != "ZZZ999"]
        by_fp = {}
        for r in got:
            by_fp.setdefault(r["fingerprint"], []).append(r)
        assert set(by_fp) == {"DAL123", "UAL100", "SWA200"}
        assert all(len(v) == 1 for v in by_fp.values())
        # the FIRST arrival of the duplicated key is the one kept
        assert by_fp["DAL123"][0]["icao24"] == "aaa111"


class TestAirportCounts:
    def test_geo_match_and_metadata(self, spark, tmp_path):
        src = str(tmp_path / "src")
        os.makedirs(src)
        # JFK 40.6413,-73.7781; LGA ~17 km away; LAX far
        write_file(src, "f1.json", [
            sv(BASE + 1, "aaa111", callsign="DAL1", lat=40.70, lon=-73.80),  # near JFK+LGA
            sv(BASE + 2, "bbb222", callsign="DAL2", lat=40.6414, lon=-73.7782),  # at JFK
            sv(BASE + 3, "ccc333", callsign="UAL3", lat=33.94, lon=-118.41),  # at LAX
            sv(BASE + 4, "ddd444", callsign="UAL4", lat=0.0, lon=0.0),        # nowhere
            sv(BASE + 5, "eee555", callsign="UAL5", lat=None, lon=None),      # dropped
        ], BASE)
        write_file(src, "f2.json", SENTINEL, BASE + 10)

        airports_lk = spark.createDataFrame([
            Row(AirportCode="JFK", latitude=40.6413, longitude=-73.7781,
                AirportName="John F Kennedy", CityName="New York",
                StateName="NY", FlightCount=1000),
            Row(AirportCode="LGA", latitude=40.7769, longitude=-73.8740,
                AirportName="LaGuardia", CityName="New York",
                StateName="NY", FlightCount=900),
            Row(AirportCode="LAX", latitude=33.9425, longitude=-118.4081,
                AirportName="Los Angeles Intl", CityName="LA",
                StateName="CA", FlightCount=950),
        ])

        rows = run_stream(
            spark, src,
            lambda raw: airport_aircraft_counts(
                transformed_stream(parse_opensky(raw)), airports_lk
            ),
            query_name="airport_counts",
        )
        got = {r["AirportCode"]: r for r in rows
               if r["window_end_ms"] // 1000 == BASE + 60}
        # one aircraft matched TWO airports (multi-emit, java :224-235)
        assert got["JFK"]["aircraft_count"] == 2   # aaa111 + bbb222
        # JFK and LGA are ~17 km apart: both aircraft within 50 km of both
        assert got["LGA"]["aircraft_count"] == 2
        assert got["LAX"]["aircraft_count"] == 1
        assert got["JFK"]["AirportName"] == "John F Kennedy"
        assert got["JFK"]["_id"] == "JFK"
        assert "ddd444" not in {r["_id"] for r in rows}


class TestUpsertSink:
    def test_latest_wins_merge(self, spark, tmp_path):
        path = str(tmp_path / "state")
        sink = ParquetUpsertSink(path, key_col="_id", version_col="window_end_ms")
        b1 = spark.createDataFrame([
            Row(_id="DAL", airline="DAL", aircraft_count=2, window_end_ms=1000),
            Row(_id="UAL", airline="UAL", aircraft_count=1, window_end_ms=1000),
        ])
        b2 = spark.createDataFrame([
            Row(_id="DAL", airline="DAL", aircraft_count=5, window_end_ms=2000),
        ])
        sink.merge(b1, 0)
        sink.merge(b2, 1)
        state = {r["_id"]: r for r in sink.read(spark).collect()}
        assert state["DAL"]["aircraft_count"] == 5  # replaced
        assert state["UAL"]["aircraft_count"] == 1  # retained

    def test_crash_recovery_partial_staging(self, spark, tmp_path):
        # crash BEFORE the swap: live intact, staging half-written ->
        # the partial staging is discarded, live state survives
        path = str(tmp_path / "state")
        sink = ParquetUpsertSink(path, key_col="_id", version_col="v")
        sink.merge(spark.createDataFrame([Row(_id="A", v=1)]), 0)
        os.makedirs(path + ".staging")
        with open(os.path.join(path + ".staging", "part-junk.parquet"), "w") as f:
            f.write("not parquet")
        sink.merge(spark.createDataFrame([Row(_id="B", v=2)]), 1)
        assert not os.path.exists(path + ".staging")
        assert {r["_id"] for r in sink.read(spark).collect()} == {"A", "B"}

    def test_crash_recovery_between_renames(self, spark, tmp_path):
        # crash BETWEEN the renames: live gone, staging complete
        # (_SUCCESS present) -> staging is promoted, nothing lost
        path = str(tmp_path / "state")
        sink = ParquetUpsertSink(path, key_col="_id", version_col="v")
        sink.merge(spark.createDataFrame([Row(_id="A", v=1)]), 0)
        sink.merge(spark.createDataFrame([Row(_id="B", v=2)]), 1)
        os.rename(path, path + ".old")          # live renamed aside...
        os.rename(path + ".old", path + ".staging")  # ...new state staged
        sink.merge(spark.createDataFrame([Row(_id="C", v=3)]), 2)
        assert {r["_id"] for r in sink.read(spark).collect()} == {"A", "B", "C"}

    def test_streaming_foreach_batch_upsert(self, spark, tmp_path):
        src = str(tmp_path / "src")
        os.makedirs(src)
        w1, w2 = BASE, BASE + 60
        write_file(src, "f1.json", [
            sv(w1 + 1, "aaa111", callsign="DAL123"),
            sv(w1 + 2, "bbb222", callsign="DAL456"),
        ], BASE)
        write_file(src, "f2.json", [sv(w2 + 1, "aaa111", callsign="DAL123")], BASE + 10)
        write_file(src, "f3.json", SENTINEL, BASE + 20)

        path = str(tmp_path / "serving")
        sink = ParquetUpsertSink(path, key_col="_id", version_col="window_end_ms")
        run_stream(
            spark, src,
            lambda raw: airline_aircraft_counts(
                transformed_stream(parse_opensky(raw))
            ),
            sink_fn=sink,
        )
        state = {r["_id"]: r for r in sink.read(spark).collect()}
        # serving store holds the LATEST window per airline (upsert)
        assert state["DAL"]["window_end_ms"] == (w2 + 60) * 1000
        assert state["DAL"]["aircraft_count"] == 1


class TestStreamStreamJoin:
    def test_time_bounded_inner_join(self, spark, tmp_path):
        from big_data_flight_analytics_spark.sources.replay import FileReplay
        from big_data_flight_analytics_spark.streaming.stream_joins import (
            positions_near_alerts,
        )

        pos_dir, al_dir = str(tmp_path / "pos"), str(tmp_path / "al")
        os.makedirs(pos_dir); os.makedirs(al_dir)
        pos_rp, al_rp = FileReplay(pos_dir), FileReplay(al_dir)

        # positions: aaa111 10s and 400s after its alert; bbb222 alertless
        pos_rp.write_batch([
            sv(BASE + 10, "aaa111", callsign="DAL123", lat=10.0, lon=20.0),
            sv(BASE + 400, "aaa111", callsign="DAL123", lat=11.0, lon=21.0),
            sv(BASE + 10, "bbb222", callsign="UAL100", lat=30.0, lon=40.0),
        ])
        pos_rp.write_batch(SENTINEL)
        # alerts: one for aaa111 at BASE (callsign doubles as alert kind)
        al_rp.write_batch([sv(BASE, "aaa111", callsign="OVERSPEED")])
        al_rp.write_batch(SENTINEL)

        positions = transformed_stream(parse_opensky(pos_rp.stream(spark)))
        alerts = transformed_stream(parse_opensky(al_rp.stream(spark))).select(
            "icao24", "event_time", F.col("callsign").alias("alert_kind")
        )
        out = positions_near_alerts(positions, alerts, within="5 minutes")
        q = (
            out.writeStream.format("memory")
            .queryName("ss_join")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("select * from ss_join").collect()
        real = [r for r in rows if r["icao24"] == "aaa111"]
        # only the position 10s after the alert joins; 400s is outside
        # the 5-min bound's... wait 400 < 300? no: 400s > 300s -> excluded
        assert len(real) == 1
        r = real[0]
        assert r["pos_time_ms"] // 1000 == BASE + 10
        assert r["alert_time_ms"] // 1000 == BASE
        assert r["alert_kind"] == "OVERSPEED"
        assert r["latitude"] == 10.0
        # alertless aircraft never appears
        assert not [r for r in rows if r["icao24"] == "bbb222"]


class TestScd2Sink:
    def test_incremental_versioning_across_batches(self, spark, tmp_path):
        from big_data_flight_analytics_spark.streaming.sinks import Scd2Sink

        src = str(tmp_path / "src")
        os.makedirs(src)
        # callsign is the tracked attribute; updates arrive in 2 batches
        write_file(src, "f1.json", [
            sv(BASE + 100, "aaa111", callsign="DAL123"),
            sv(BASE + 100, "bbb222", callsign="UAL100"),
        ], BASE)
        write_file(src, "f2.json", [
            sv(BASE + 200, "aaa111", callsign="SWA999"),  # change -> version
            sv(BASE + 200, "bbb222", callsign="UAL100"),  # same -> no-op
            sv(BASE + 50, "ccc333", callsign="JBU400"),   # new key
        ], BASE + 10)

        sink = Scd2Sink(str(tmp_path / "dim"), "icao24", "callsign", "ts_us")

        def build(raw):
            parsed = transformed_stream(parse_opensky(raw))
            return parsed.select(
                "icao24", "callsign",
                F.unix_micros(F.col("event_time")).alias("ts_us"),
            )

        run_stream(spark, src, build, sink_fn=sink, query_name="scd2")
        rows = sink.read(spark).collect()
        by_key = {}
        for r in rows:
            by_key.setdefault(r["icao24"], []).append(r)
        a = sorted(by_key["aaa111"], key=lambda r: r["valid_from_us"])
        assert [(r["callsign"], r["valid_to_us"], r["is_current"]) for r in a] == [
            ("DAL123", (BASE + 200) * 1_000_000, False),
            ("SWA999", None, True),
        ]
        b = by_key["bbb222"]
        assert len(b) == 1 and b[0]["is_current"] and b[0]["callsign"] == "UAL100"
        c = by_key["ccc333"]
        assert len(c) == 1 and c[0]["valid_from_us"] == (BASE + 50) * 1_000_000

    def test_same_timestamp_conflict_resolves_deterministically(
        self, spark, tmp_path
    ):
        from pyspark.sql import Row

        from big_data_flight_analytics_spark.streaming.sinks import Scd2Sink

        # no tie column: greatest attr wins — stable under replay
        batch = spark.createDataFrame([
            Row(icao24="aaa111", callsign="AAA111", ts_us=1000),
            Row(icao24="aaa111", callsign="ZZZ999", ts_us=1000),
        ])
        sink = Scd2Sink(str(tmp_path / "dim_attr"), "icao24", "callsign", "ts_us")
        for _ in range(3):  # replaying the identical batch must agree
            sink.merge(batch, 0)
            rows = sink.read(spark).collect()
            assert len(rows) == 1 and rows[0]["callsign"] == "ZZZ999"

        # explicit tie column: its max picks the winner, not the attr
        batch2 = spark.createDataFrame([
            Row(icao24="aaa111", callsign="ZZZ999", ts_us=1000, event_id=1),
            Row(icao24="aaa111", callsign="AAA111", ts_us=1000, event_id=2),
        ])
        sink2 = Scd2Sink(
            str(tmp_path / "dim_tie"), "icao24", "callsign", "ts_us",
            tie_col="event_id",
        )
        sink2.merge(batch2, 0)
        rows = sink2.read(spark).collect()
        assert len(rows) == 1 and rows[0]["callsign"] == "AAA111"
