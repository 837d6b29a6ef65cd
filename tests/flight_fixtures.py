"""Deterministic flight-domain fixtures per FIXTURES.md.

Seeded Python-random generation; small enough for fast tests, shaped to
exercise the semantics the reference cares about: left-join misses,
null/empty tails, delay-threshold straddling, bucket-edge distances,
HHMM modes with ties, sparse Div columns, dup aircraft registrations.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import SparkSession

from big_data_flight_analytics_spark.schemas import (
    AIRCRAFTS_SCHEMA,
    AIRLINES_SCHEMA,
    AIRPORTS_SCHEMA,
    FLIGHTS_SCHEMA,
)

AIRLINE_CODES = ["AA", "DL", "UA", "WN", "B6", "AS", "NK", "F9", "XX", "YY"]
# XX/YY absent from the airlines dim -> left-join misses
DIM_AIRLINES = [
    ("AA", "AAL", "American Airlines"),
    ("DL", "DAL", "Delta Air Lines"),
    ("UA", "UAL", "United Airlines"),
    ("WN", "SWA", "Southwest Airlines"),
    ("B6", "JBU", "JetBlue Airways"),
    ("AS", "ASA", "Alaska Airlines"),
    ("NK", None, "Spirit Airlines"),      # null ICAO -> filtered in L2
    ("F9", "  ", "Frontier Airlines"),    # blank ICAO -> filtered in L2
]

AIRPORTS = [
    ("ATL", 33.6367, -84.4281, "Hartsfield-Jackson"),
    ("LAX", 33.9425, -118.4081, "Los Angeles Intl"),
    ("ORD", 41.9786, -87.9048, "Chicago O'Hare"),
    ("DFW", 32.8968, -97.0380, "Dallas Fort Worth"),
    ("DEN", 39.8617, -104.6731, "Denver Intl"),
    ("JFK", 40.6413, -73.7781, "John F Kennedy"),
    ("SFO", 37.6213, -122.3790, "San Francisco Intl"),
    ("SEA", 47.4502, -122.3088, "Seattle-Tacoma"),
    ("MIA", 25.7959, -80.2870, "Miami Intl"),
    ("PHX", 33.4343, -112.0116, "Phoenix Sky Harbor"),
]
CITY = {a[0]: (f"{a[3]} City", f"{a[0]}-State") for a in AIRPORTS}
# ZZZ appears as flight Origin but not in the airports dim
EXTRA_ORIGINS = ["ZZZ"]


def build_airlines(spark: SparkSession):
    return spark.createDataFrame(DIM_AIRLINES, AIRLINES_SCHEMA)


def build_airports(spark: SparkSession):
    return spark.createDataFrame(AIRPORTS, AIRPORTS_SCHEMA)


def build_aircrafts(spark: SparkSession, rng: random.Random | None = None):
    rng = rng or random.Random(7)
    rows = []
    for i in range(120):
        reg = f"N{10000 + i}"
        rows.append((reg, f"a{i:05x}"))
        if i % 10 == 0:  # duplicate registrations (FIXTURES.md §4)
            rows.append((reg, f"b{i:05x}"))
    return spark.createDataFrame(rows, AIRCRAFTS_SCHEMA)


def build_flights(spark: SparkSession, n: int = 2400, seed: int = 42):
    rng = random.Random(seed)
    origins = [a[0] for a in AIRPORTS] + EXTRA_ORIGINS
    base = dt.date(2023, 1, 1)
    rows = []
    for i in range(n):
        code = AIRLINE_CODES[i % len(AIRLINE_CODES)]
        # skew: first airports get more traffic (HAVING floor both sides)
        o_idx = min(int(rng.expovariate(0.35)), len(origins) - 1)
        d_idx = (o_idx + 1 + rng.randrange(len(origins) - 1)) % len(origins)
        origin, dest = origins[o_idx], origins[d_idx]
        date = base + dt.timedelta(days=rng.randrange(365))
        cancelled = 1 if rng.random() < 0.02 else 0
        diverted = 1 if rng.random() < 0.10 else 0
        arr_delay = None if cancelled else round(max(rng.gauss(12, 18), 0.0), 1)
        dep_delay = None if cancelled else round(max(rng.gauss(10, 15), 0.0), 1)
        crs_elapsed = round(rng.uniform(45, 400), 1)
        actual = None if cancelled else round(crs_elapsed + rng.gauss(0, 12), 1)
        # distances cluster around bucket edges (right-exclusive binning)
        distance = float(rng.choice(
            [249.0, 250.0, 251.0, 499.0, 500.0, 749.0, 1000.0, 1500.0,
             2499.0, 2500.0, 2600.0, rng.uniform(30, 3000)]
        ))
        tail_roll = rng.random()
        tail = (None if tail_roll < 0.03 else "" if tail_roll < 0.05
                else f"N{10000 + rng.randrange(140)}")  # some regs not in dim
        # HHMM times: few distinct values per flight number so modes + ties exist
        flight_no = 100 + (i % 40)
        arr_choices = [900 + 5 * (flight_no % 3), 1310, 1845]
        dep_choices = [800 + 10 * (flight_no % 2), 1215]
        crs_arr = rng.choice(arr_choices)
        crs_dep = rng.choice(dep_choices)
        # continuous (unquantized): quantized values make rounded-avg
        # results land exactly on .005 boundaries where engine summation
        # order flips round(), breaking oracle differentials
        carrier_delay = rng.uniform(0, 60) if rng.random() < 0.3 else None
        weather_delay = round(rng.uniform(0, 40), 1) if rng.random() < 0.1 else None
        nas_delay = round(rng.uniform(0, 30), 1) if rng.random() < 0.2 else None
        sec_delay = round(rng.uniform(0, 20), 1) if rng.random() < 0.02 else None
        late_delay = round(rng.uniform(0, 90), 1) if rng.random() < 0.25 else None
        divs = [None] * 5
        if diverted:
            divs[0] = rng.choice(origins)
            if rng.random() < 0.3:
                divs[1] = rng.choice(["", "  ", rng.choice(origins)])
            if rng.random() < 0.1:
                divs[2] = rng.choice(origins)
        rows.append((
            date, date.year, date.month, date.day, date.isoweekday(),
            code, flight_no, tail, distance,
            origin, CITY.get(origin, ("Z City", "Z-State"))[0],
            CITY.get(origin, ("Z City", "Z-State"))[1],
            dest, CITY.get(dest, ("Z City", "Z-State"))[0],
            CITY.get(dest, ("Z City", "Z-State"))[1],
            crs_arr, crs_dep, crs_elapsed, actual,
            cancelled, ("A" if cancelled else None), diverted,
            arr_delay, dep_delay,
            carrier_delay, weather_delay, nas_delay, sec_delay, late_delay,
            *divs,
        ))
    return spark.createDataFrame(rows, FLIGHTS_SCHEMA)
