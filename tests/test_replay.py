from __future__ import annotations

from big_data_flight_analytics_spark.sources.replay import FileReplay
from big_data_flight_analytics_spark.streaming.enrichment import (
    parse_opensky,
    transformed_stream,
)
from big_data_flight_analytics_spark.streaming.windowed_counts import (
    airline_aircraft_counts,
)
from tests.test_streaming import BASE, SENTINEL, sv


def test_replay_batches_are_ordered_micro_batches(spark, tmp_path):
    replay = FileReplay(str(tmp_path / "replay"))
    replay.write_batch([sv(BASE + 1, "aaa111", callsign="DAL1"),
                        sv(BASE + 2, "bbb222", callsign="DAL2")])
    replay.write_batch([sv(BASE + 61, "aaa111", callsign="DAL1")])
    replay.write_batch(SENTINEL)

    out = airline_aircraft_counts(transformed_stream(parse_opensky(replay.stream(spark))))
    q = (
        out.writeStream.format("memory").queryName("replay_counts")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from replay_counts").collect()
    got = {(r["airline"], r["window_end_ms"] // 1000): r["aircraft_count"] for r in rows}
    assert got[("DAL", BASE + 60)] == 2
    assert got[("DAL", BASE + 120)] == 1
