"""Flight-domain query tests on synthesized fixtures (SURVEY §5.3-5.4).

MIN_FLIGHTS floors are lowered to fixture scale; semantics under test
are the reference's: HAVING both-sides, conditional-count nulls,
when/otherwise guards, bucket edges, mode determinism, join misses.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.plans import flight_queries as FQ
from tests.flight_fixtures import (
    build_aircrafts,
    build_airlines,
    build_airports,
    build_flights,
)

MIN = 30  # fixture-scale HAVING floor


@pytest.fixture(scope="module")
def data(spark):
    flights = build_flights(spark).cache()
    flights.count()
    return {
        "flights": flights,
        "airlines": build_airlines(spark),
        "airports": build_airports(spark),
        "aircrafts": build_aircrafts(spark),
    }


class TestAirlineStats:
    def test_columns_and_having(self, data):
        out = FQ.airline_stats(data["flights"], data["airlines"], min_flights=MIN)
        rows = out.collect()
        assert set(out.columns) == {
            "AirlineCode", "AvgErrorMinutes", "OnTimePerformance", "AirlineName"
        }
        assert 0 < len(rows) <= 10
        assert all(0 <= r["OnTimePerformance"] <= 100 for r in rows)

    def test_left_join_miss_keeps_row(self, data):
        # XX/YY are not in the airlines dim -> AirlineName null, row kept
        out = FQ.airline_stats(data["flights"], data["airlines"], min_flights=MIN)
        misses = [r for r in out.collect() if r["AirlineCode"] in ("XX", "YY")]
        assert misses and all(r["AirlineName"] is None for r in misses)

    def test_ontime_formula(self, spark, data):
        # hand-check one airline against first principles
        out = {r["AirlineCode"]: r for r in
               FQ.airline_stats(data["flights"], data["airlines"], min_flights=MIN).collect()}
        fl = data["flights"].filter(F.col("IATA") == "AA")
        total = fl.count()
        delayed = fl.filter(F.col("ArrDelayMinutes") > 15.0).count()
        expected = (1.0 - delayed / total) * 100
        assert out["AA"]["OnTimePerformance"] == pytest.approx(expected)


class TestBusiestAirports:
    def test_scores_and_guards(self, data):
        out = FQ.busiest_airports(data["flights"], data["airports"], min_flights=MIN)
        rows = out.collect()
        assert rows, "HAVING must keep some airports"
        top = max(rows, key=lambda r: r["FlightCount"])
        bottom = min(rows, key=lambda r: r["FlightCount"])
        assert top["BusynessScorePercent"] == 100.0
        assert bottom["BusynessScorePercent"] == 0.0
        share = sum(r["ShareOfTotalFlightsPercent"] for r in rows)
        assert share == pytest.approx(100.0)

    def test_crossjoin_matches_reference_window_shape(self, data):
        a = FQ.busiest_airports(data["flights"], data["airports"],
                                use_window=False, min_flights=MIN)
        b = FQ.busiest_airports(data["flights"], data["airports"],
                                use_window=True, min_flights=MIN)
        ka = {(r["AirportCode"], r["FlightCount"], r["BusynessScorePercent"],
               r["ShareOfTotalFlightsPercent"]) for r in a.collect()}
        kb = {(r["AirportCode"], r["FlightCount"], r["BusynessScorePercent"],
               r["ShareOfTotalFlightsPercent"]) for r in b.collect()}
        assert ka == kb

    def test_airport_join_miss(self, data):
        # ZZZ origin exists in flights but not the airports dim
        out = FQ.busiest_airports(data["flights"], data["airports"], min_flights=0)
        zzz = [r for r in out.collect() if r["AirportCode"] == "ZZZ"]
        assert zzz and zzz[0]["AirportName"] is None

    def test_top_k(self, data):
        out = FQ.top_busiest_airports(data["flights"], data["airports"],
                                      k=3, min_flights=MIN).collect()
        assert len(out) == 3


class TestBusiestWeeks:
    def test_percent_and_floor(self, data):
        rows = FQ.busiest_weeks(data["flights"], min_flights=5).collect()
        assert rows
        for r in rows:
            assert r["FlightCount"] > 5
            assert r["DelayedFlightPercent"] == pytest.approx(
                r["DelayedFlightCount"] / r["FlightCount"] * 100
            )


class TestDelayReasons:
    def test_unpivot_shape(self, data):
        rows = FQ.delay_reasons(data["flights"]).collect()
        assert {r["DelayReason"] for r in rows} == {
            "CarrierDelay", "WeatherDelay", "NASDelay", "SecurityDelay",
            "LateAircraftDelay",
        }
        # avg ignores nulls: security delay is rare but non-null rows exist
        sec = [r for r in rows if r["DelayReason"] == "SecurityDelay"][0]
        assert sec["AvgDelayMinutes"] is not None and sec["AvgDelayMinutes"] > 0


class TestDaysWithCancellations:
    def test_shape(self, data):
        rows = FQ.days_with_cancellations(data["flights"], min_flights=MIN).collect()
        assert 0 < len(rows) <= 7
        for r in rows:
            assert r["CancellationPercent"] == pytest.approx(
                r["CancellationCount"] / r["FlightCount"] * 100
            )


class TestDistanceDelayCorrelation:
    def test_bucket_edges_right_exclusive(self, data):
        rows = FQ.distance_delay_correlation(data["flights"], min_flights=0).collect()
        by_label = {r["DistanceBucket"]: r for r in rows}
        # fixtures put mass exactly at 250.0 and 2500.0 — they must land
        # in the RIGHT bucket (250-500, 2500+), Bucketizer semantics
        assert "0-250" in by_label and "250-500" in by_label
        assert "2500+" in by_label
        assert by_label["0-250"]["DistanceCategory"] == 0.0
        assert by_label["2500+"]["DistanceCategory"] == 10.0
        for r in rows:
            assert 0.0 <= r["ProbabilityOfDelay"] <= 1.0

    def test_avg_distance_within_bucket(self, data):
        rows = FQ.distance_delay_correlation(data["flights"], min_flights=0).collect()
        for r in rows:
            lo = 250 * r["DistanceCategory"]
            assert r["AvgDistance"] >= lo


class TestProblematicRoutes:
    def test_score_floor_and_formula(self, data):
        fl = data["flights"]
        rows = FQ.problematic_routes(fl, min_flights=10).collect()
        total = fl.count()
        delayed = fl.filter(F.col("ArrDelayMinutes") > 15.0).count()
        overall_pct = delayed / total * 100
        for r in rows:
            assert r["ProblematicScore"] >= 1.2
            assert r["Route"] == f"{r['OriginCode']}-{r['DestCode']}"
        # spot-check score of the top route
        if rows:
            top = rows[0]
            g = fl.filter(
                (F.col("Origin") == top["OriginCode"]) & (F.col("Dest") == top["DestCode"])
            )
            gc = g.count()
            gd = g.filter(F.col("ArrDelayMinutes") > 15.0).count()
            assert top["ProblematicScore"] == pytest.approx(
                (gd / gc * 100) / overall_pct
            )


class TestDivertedByAirport:
    def test_trim_empty_filtered(self, data):
        rows = FQ.diverted_flights_by_airport(
            data["flights"], data["airports"], min_flights=0
        ).collect()
        assert rows
        assert all(r["AirportCode"] and r["AirportCode"].strip() for r in rows)


class TestAircraftsLookup:
    def test_dedup_and_normalization(self, data):
        out = FQ.aircrafts_lookup(data["flights"], data["aircrafts"]).collect()
        assert out
        # dup registrations must not double rows: icao24 unique per tail
        icaos = [r["icao24"] for r in out]
        assert len(icaos) == len(set(icaos))
        scores = [r["DelayScore01"] for r in out if r["DelayScore01"] is not None]
        assert scores and min(scores) == 0.0 and max(scores) == 1.0

    def test_null_avg_gives_null_score(self, data):
        # tails whose CarrierDelay is all-null: avg null -> score null
        out = FQ.aircrafts_lookup(data["flights"], data["aircrafts"]).collect()
        nulls = [r for r in out if r["AvgCarrierDelayMinutes"] is None]
        assert all(r["DelayScore01"] is None for r in nulls)


class TestFlightsLookup:
    def test_callsign_and_modes(self, data):
        out = FQ.flights_lookup(data["flights"], data["airlines"]).collect()
        assert out
        for r in out:
            assert r["AirlineName"] is not None
            # HH:MM format
            for c in ("CRSArrTime", "CRSDepTime"):
                hh, mm = r[c].split(":")
                assert 0 <= int(hh) <= 23 and 0 <= int(mm) <= 59
        # airlines with null/blank ICAO are excluded -> no NK/F9 callsigns
        assert all(not r["callsign"].startswith(("NK", "F9")) for r in out)

    def test_mode_deterministic_tie_break(self, data):
        # run twice -> identical results (row_number tie-break, not first())
        a = FQ.flights_lookup(data["flights"], data["airlines"]).collect()
        b = FQ.flights_lookup(data["flights"], data["airlines"]).collect()
        assert a == b


class TestEtl:
    def test_one_pass_partitioned_write(self, spark, data, tmp_path):
        import csv as _csv
        # write raw-shaped CSVs for two years, run ETL, read back
        raw_dir = tmp_path / "raw"
        raw_dir.mkdir()
        flights = data["flights"]
        pdf = flights.limit(200).toPandas()
        pdf = pdf.rename(columns={"IATA": "IATA_Code_Operating_Airline"})
        for year in (2023,):
            pdf.to_csv(raw_dir / f"Flights_{year}.csv", index=False,
                       quoting=_csv.QUOTE_MINIMAL)
        raw = spark.read.option("header", True).csv(str(raw_dir / "Flights_*.csv"))
        out_dir = str(tmp_path / "curated")
        FQ.run_etl(raw, out_dir)
        back = spark.read.parquet(out_dir)
        assert back.count() == 200
        assert "file_year" in back.columns
        # partition-dir column comes back type-inferred (int)
        assert str(back.select("file_year").distinct().collect()[0][0]) == "2023"
        assert "IATA" in back.columns  # renamed
