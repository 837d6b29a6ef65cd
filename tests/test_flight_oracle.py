"""DuckDB oracle differential for the FLIGHT-domain catalog.

The driver gate covers the testdata analogs; this suite closes the loop
on the reference's own queries: flight fixtures are written to parquet,
registered in DuckDB, and each flight query is compared against an
independent SQL restatement of the reference semantics. Floats compare
with 1e-9 relative tolerance (unrounded avgs accumulate in
engine-specific order; count-ratio columns are exact anyway).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from big_data_flight_analytics_spark.plans import flight_queries as FQ
from tests.flight_fixtures import (
    build_aircrafts,
    build_airlines,
    build_airports,
    build_flights,
)

MIN = 30


@pytest.fixture(scope="module")
def ducked(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("flight_parquet")
    flights = build_flights(spark)
    data = {
        "flights": flights,
        "airlines": build_airlines(spark),
        "airports": build_airports(spark),
        "aircrafts": build_aircrafts(spark),
    }
    con = duckdb.connect()
    for name, df in data.items():
        p = str(root / f"{name}.parquet")
        df.write.mode("overwrite").parquet(p)
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}/*.parquet')")
    return data, con


def compare(sdf, rel, float_cols=()):
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    dcols = rel.columns
    drows = rel.fetchall()
    assert sorted(scols) == sorted(dcols), (scols, dcols)
    assert len(srows) == len(drows)
    order_s = sorted(range(len(scols)), key=lambda i: scols[i])
    order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])

    def canon(rows, order):
        out = []
        for row in rows:
            vals = []
            for i in order:
                v = row[i]
                if isinstance(v, float):
                    v = round(v, 6)
                vals.append((str(type(v).__name__ if v is not None else 'n'), v))
            out.append(tuple(vals))
        return sorted(out, key=repr)

    ns, nd = canon(srows, order_s), canon(drows, order_d)
    for a, b in zip(ns, nd):
        for (ta, va), (tb, vb) in zip(a, b):
            if isinstance(va, float) and isinstance(vb, float):
                assert math.isclose(va, vb, rel_tol=1e-6, abs_tol=1e-9), (a, b)
            else:
                assert va == vb, (a, b)


class TestFlightOracles:
    def test_airline_stats(self, spark, ducked):
        data, con = ducked
        sdf = FQ.airline_stats(data["flights"], data["airlines"], min_flights=MIN)
        rel = con.sql(f"""
            WITH agg AS (
                SELECT IATA AS AirlineCode,
                       AVG(ABS(ActualElapsedTime - CRSElapsedTime)) AS AvgErrorMinutes,
                       COUNT(*) AS FlightCount,
                       COUNT(CASE WHEN ArrDelayMinutes > 15.0 THEN 1 END) AS Delayed
                FROM flights GROUP BY 1 HAVING COUNT(*) > {MIN}
            )
            SELECT a.AirlineCode, a.AvgErrorMinutes,
                   (1.0 - (Delayed * 1.0 / FlightCount)) * 100 AS OnTimePerformance,
                   al.Name AS AirlineName
            FROM agg a LEFT JOIN airlines al ON a.AirlineCode = al.IATA
        """)
        compare(sdf, rel)

    def test_busiest_airports(self, spark, ducked):
        data, con = ducked
        sdf = FQ.busiest_airports(data["flights"], data["airports"], min_flights=MIN)
        rel = con.sql(f"""
            WITH counts AS (
                SELECT Origin AS AirportCode, OriginCityName AS CityName,
                       OriginStateName AS StateName, COUNT(*) AS FlightCount
                FROM flights GROUP BY 1, 2, 3 HAVING COUNT(*) > {MIN}
            ), stats AS (
                SELECT MIN(FlightCount) AS mn, MAX(FlightCount) AS mx,
                       SUM(FlightCount) AS tot FROM counts
            )
            SELECT c.AirportCode, c.CityName, c.StateName,
                   CAST(c.FlightCount AS BIGINT) AS FlightCount,
                   CASE WHEN s.mx = s.mn THEN 100.0
                        ELSE (c.FlightCount - s.mn) * 1.0 / (s.mx - s.mn) * 100
                   END AS BusynessScorePercent,
                   CASE WHEN s.tot > 0 THEN c.FlightCount * 1.0 / s.tot * 100
                        ELSE 0.0 END AS ShareOfTotalFlightsPercent,
                   ap.latitude, ap.longitude, ap.name AS AirportName
            FROM counts c CROSS JOIN stats s
            LEFT JOIN airports ap ON c.AirportCode = ap.iata
        """)
        compare(sdf, rel)

    def test_busiest_weeks(self, spark, ducked):
        data, con = ducked
        sdf = FQ.busiest_weeks(data["flights"], min_flights=5)
        rel = con.sql("""
            SELECT Month,
                   CAST(weekofyear(FlightDate) AS INTEGER) AS WeekOfYear,
                   COUNT(*) AS FlightCount,
                   COUNT(CASE WHEN ArrDelayMinutes > 15.0 THEN 1 END)
                       AS DelayedFlightCount,
                   CASE WHEN COUNT(*) > 0 THEN
                       COUNT(CASE WHEN ArrDelayMinutes > 15.0 THEN 1 END) * 1.0
                       / COUNT(*) * 100 END AS DelayedFlightPercent
            FROM flights GROUP BY 1, 2 HAVING COUNT(*) > 5
        """)
        compare(sdf, rel)

    def test_problematic_routes(self, spark, ducked):
        data, con = ducked
        sdf = FQ.problematic_routes(data["flights"], min_flights=10)
        rel = con.sql("""
            WITH overall AS (
                SELECT CASE WHEN COUNT(*) > 0 THEN
                    COUNT(CASE WHEN ArrDelayMinutes > 15.0 THEN 1 END) * 1.0
                    / COUNT(*) * 100 ELSE 0.0 END AS pct
                FROM flights
            ), routes AS (
                SELECT Origin AS OriginCode, Dest AS DestCode,
                       OriginCityName, DestCityName,
                       COUNT(*) AS FlightCount,
                       COUNT(CASE WHEN ArrDelayMinutes > 15.0 THEN 1 END) AS Delayed
                FROM flights GROUP BY 1, 2, 3, 4 HAVING COUNT(*) > 10
            )
            SELECT OriginCode || '-' || DestCode AS Route,
                   OriginCode, DestCode, OriginCityName, DestCityName,
                   FlightCount,
                   CASE WHEN o.pct > 0
                        THEN (Delayed * 1.0 / FlightCount * 100) / o.pct
                        ELSE 1.0 END AS ProblematicScore
            FROM routes CROSS JOIN overall o
            WHERE CASE WHEN o.pct > 0
                       THEN (Delayed * 1.0 / FlightCount * 100) / o.pct
                       ELSE 1.0 END >= 1.2
        """)
        compare(sdf, rel)

    def test_distance_delay_correlation(self, spark, ducked):
        data, con = ducked
        sdf = FQ.distance_delay_correlation(data["flights"], min_flights=10)
        rel = con.sql("""
            WITH b AS (
                SELECT *,
                    CASE WHEN Distance >= 2500 THEN 10.0
                         ELSE FLOOR(Distance / 250.0) END AS DistanceCategory,
                    CASE WHEN Distance >= 2500 THEN '2500+'
                         ELSE CAST(CAST(FLOOR(Distance / 250.0) * 250 AS INTEGER) AS VARCHAR)
                              || '-' ||
                              CAST(CAST(FLOOR(Distance / 250.0) * 250 + 250 AS INTEGER) AS VARCHAR)
                    END AS DistanceBucket
                FROM flights
            )
            SELECT DistanceCategory, DistanceBucket,
                   AVG(Distance) AS AvgDistance,
                   CASE WHEN COUNT(*) > 0 THEN
                       COUNT(CASE WHEN ArrDelayMinutes > 15.0 THEN 1 END) * 1.0
                       / COUNT(*) END AS ProbabilityOfDelay
            FROM b GROUP BY 1, 2 HAVING COUNT(*) > 10
        """)
        compare(sdf, rel)

    def test_delay_reasons(self, spark, ducked):
        data, con = ducked
        sdf = FQ.delay_reasons(data["flights"])
        rel = con.sql("""
            SELECT 'CarrierDelay' AS DelayReason,
                   AVG(CarrierDelay) AS AvgDelayMinutes FROM flights
            UNION ALL SELECT 'WeatherDelay', AVG(WeatherDelay) FROM flights
            UNION ALL SELECT 'NASDelay', AVG(NASDelay) FROM flights
            UNION ALL SELECT 'SecurityDelay', AVG(SecurityDelay) FROM flights
            UNION ALL SELECT 'LateAircraftDelay', AVG(LateAircraftDelay)
                FROM flights
        """)
        compare(sdf, rel)

    def test_days_with_cancellations(self, spark, ducked):
        data, con = ducked
        sdf = FQ.days_with_cancellations(data["flights"], min_flights=MIN)
        rel = con.sql(f"""
            SELECT DayOfWeek, COUNT(*) AS FlightCount,
                   COUNT(CASE WHEN Cancelled = 1 THEN 1 END)
                       AS CancellationCount,
                   CASE WHEN COUNT(*) > 0 THEN
                       COUNT(CASE WHEN Cancelled = 1 THEN 1 END) * 1.0
                       / COUNT(*) * 100 END AS CancellationPercent
            FROM flights GROUP BY 1 HAVING COUNT(*) > {MIN}
        """)
        compare(sdf, rel)

    def test_diverted_flights_by_airport(self, spark, ducked):
        data, con = ducked
        sdf = FQ.diverted_flights_by_airport(
            data["flights"], data["airports"], min_flights=10
        )
        rel = con.sql("""
            WITH unp AS (
                SELECT Div1Airport AS AirportCode FROM flights WHERE Diverted = 1
                UNION ALL
                SELECT Div2Airport FROM flights WHERE Diverted = 1
                UNION ALL
                SELECT Div3Airport FROM flights WHERE Diverted = 1
                UNION ALL
                SELECT Div4Airport FROM flights WHERE Diverted = 1
                UNION ALL
                SELECT Div5Airport FROM flights WHERE Diverted = 1
            ), counts AS (
                SELECT AirportCode, COUNT(*) AS DivertedFlightCount
                FROM unp
                WHERE AirportCode IS NOT NULL AND trim(AirportCode) <> ''
                GROUP BY 1 HAVING COUNT(*) > 10
            )
            SELECT c.AirportCode, c.DivertedFlightCount,
                   ap.latitude, ap.longitude, ap.name AS AirportName
            FROM counts c LEFT JOIN airports ap ON c.AirportCode = ap.iata
        """)
        compare(sdf, rel)

    def test_flights_lookup(self, spark, ducked):
        # the full chain: derived-key inner join -> dual mode with
        # desc-count/asc-time tie-break + first() carry -> arr x dep
        # self-join -> HHMM formatting (flights_lookup_to_kafka.py:19-54).
        # first(AirlineName) is deterministic here: fixture ICAOs are
        # unique 3-char codes, so the callsign prefix determines the
        # airline -> MIN() in SQL selects the identical value.
        data, con = ducked
        sdf = FQ.flights_lookup(data["flights"], data["airlines"])
        rel = con.sql("""
            WITH al AS (
                SELECT IATA, ICAO, Name AS AirlineName FROM airlines
                WHERE length(trim(COALESCE(ICAO, ''))) > 0
            ), j AS (
                SELECT al.ICAO || CAST(f.Flight_Number_Operating_Airline AS VARCHAR)
                           AS callsign,
                       al.AirlineName, f.CRSArrTime, f.CRSDepTime
                FROM flights f JOIN al ON f.IATA = al.IATA
            ), jf AS (
                SELECT * FROM j WHERE length(trim(callsign)) > 0
            ), arr_counts AS (
                SELECT callsign, CRSArrTime, COUNT(*) AS cnt,
                       MIN(AirlineName) AS AirlineName
                FROM jf GROUP BY 1, 2
            ), dep_counts AS (
                SELECT callsign, CRSDepTime, COUNT(*) AS cnt
                FROM jf GROUP BY 1, 2
            ), arr_mode AS (
                SELECT callsign, CRSArrTime AS mode_arr, AirlineName
                FROM (SELECT *, ROW_NUMBER() OVER (
                          PARTITION BY callsign
                          ORDER BY cnt DESC, CRSArrTime ASC) AS rn
                      FROM arr_counts)
                WHERE rn = 1
            ), dep_mode AS (
                SELECT callsign, CRSDepTime AS mode_dep
                FROM (SELECT *, ROW_NUMBER() OVER (
                          PARTITION BY callsign
                          ORDER BY cnt DESC, CRSDepTime ASC) AS rn
                      FROM dep_counts)
                WHERE rn = 1
            )
            SELECT a.callsign, a.AirlineName,
                   printf('%02d:%02d', CAST(FLOOR(a.mode_arr / 100.0) AS INTEGER),
                          a.mode_arr % 100) AS CRSArrTime,
                   printf('%02d:%02d', CAST(FLOOR(d.mode_dep / 100.0) AS INTEGER),
                          d.mode_dep % 100) AS CRSDepTime
            FROM arr_mode a JOIN dep_mode d USING (callsign)
        """)
        compare(sdf, rel)

    def test_top_busiest_airports_slice(self, spark, ducked):
        # the curated top-10 batch->stream handoff
        # (airports_lookup_to_kafka.py:17-59 reads this slice). The
        # fixture's airport counts are pairwise distinct at the k
        # boundary (asserted below), so the limit is unambiguous.
        data, con = ducked
        sdf = FQ.top_busiest_airports(data["flights"], data["airports"], k=5,
                                      min_flights=MIN)
        boundary = con.sql(f"""
            SELECT COUNT(*) FROM (
                SELECT COUNT(*) AS c FROM flights
                GROUP BY Origin, OriginCityName, OriginStateName
                HAVING COUNT(*) > {MIN}
                ORDER BY c DESC LIMIT 6
            ) t GROUP BY c HAVING COUNT(*) > 1
        """).fetchall()
        assert not boundary, "fixture tie at the k boundary; pick another k"
        rel = con.sql(f"""
            WITH counts AS (
                SELECT Origin AS AirportCode, OriginCityName AS CityName,
                       OriginStateName AS StateName, COUNT(*) AS FlightCount
                FROM flights GROUP BY 1, 2, 3 HAVING COUNT(*) > {MIN}
            ), stats AS (
                SELECT MIN(FlightCount) AS mn, MAX(FlightCount) AS mx,
                       SUM(FlightCount) AS tot FROM counts
            )
            SELECT c.AirportCode, c.CityName, c.StateName,
                   CAST(c.FlightCount AS BIGINT) AS FlightCount,
                   CASE WHEN s.mx = s.mn THEN 100.0
                        ELSE (c.FlightCount - s.mn) * 1.0 / (s.mx - s.mn) * 100
                   END AS BusynessScorePercent,
                   CASE WHEN s.tot > 0 THEN c.FlightCount * 1.0 / s.tot * 100
                        ELSE 0.0 END AS ShareOfTotalFlightsPercent,
                   ap.latitude, ap.longitude, ap.name AS AirportName
            FROM counts c CROSS JOIN stats s
            LEFT JOIN airports ap ON c.AirportCode = ap.iata
            ORDER BY BusynessScorePercent DESC, c.AirportCode ASC LIMIT 5
        """)
        compare(sdf, rel)

    def test_aircrafts_lookup(self, spark, ducked):
        data, con = ducked
        # dropDuplicates keeps an ARBITRARY row per key (reference
        # semantics, aircrafts_lookup_to_kafka.py:38) — for a
        # deterministic differential, restrict the dim to its unique
        # registrations on both sides; dup handling itself is covered by
        # test_flight_queries.TestAircraftsLookup
        from pyspark.sql import functions as F

        unique_dim = data["aircrafts"].filter(F.col("icao24").startswith("a"))
        sdf = FQ.aircrafts_lookup(data["flights"], unique_dim)
        rel = con.sql("""
            WITH agg AS (
                SELECT Tail_Number AS TailNumber,
                       ROUND(AVG(CarrierDelay), 2) AS AvgCarrierDelayMinutes,
                       COUNT(*) AS FlightCount
                FROM flights
                WHERE Tail_Number IS NOT NULL AND Tail_Number <> ''
                GROUP BY 1
            ), dim AS (
                SELECT registration AS TailNumber, icao24
                FROM aircrafts WHERE icao24 LIKE 'a%'
            ), joined AS (
                SELECT icao24, AvgCarrierDelayMinutes, FlightCount
                FROM agg JOIN dim USING (TailNumber)
            ), stats AS (
                SELECT COALESCE(MIN(AvgCarrierDelayMinutes), 0) AS mn,
                       COALESCE(MAX(AvgCarrierDelayMinutes), 0) AS mx
                FROM joined
            )
            SELECT icao24, AvgCarrierDelayMinutes,
                   CAST(FlightCount AS BIGINT) AS FlightCount,
                   ROUND((AvgCarrierDelayMinutes - s.mn) /
                         (CASE WHEN s.mx > s.mn THEN s.mx - s.mn ELSE 1.0 END), 4)
                       AS DelayScore01
            FROM joined CROSS JOIN stats s
        """)
        compare(sdf, rel)
