"""Explicit StructType schemas for the flight domain.

The reference infers every schema (transform.py:52, shared.py:29,35 —
``inferSchema=True``), which is nondeterministic under dirty data and
costs a full extra pass at 100 TB. The engine declares schemas
explicitly; ``infer=True`` remains available on the readers as a
compatibility escape hatch. Types follow actual usage in the reference
(SURVEY §1.3 evidence table).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


# The 34 columns the reference keeps (transform.py:9-44), post-rename
# (IATA_Code_Operating_Airline -> IATA at transform.py:65).
FLIGHTS_SCHEMA = StructType([
    _f("FlightDate", DateType()),
    _f("Year", IntegerType()),
    _f("Month", IntegerType()),
    _f("DayOfMonth", IntegerType()),
    _f("DayOfWeek", IntegerType()),
    _f("IATA", StringType()),
    _f("Flight_Number_Operating_Airline", IntegerType()),
    _f("Tail_Number", StringType()),
    _f("Distance", DoubleType()),
    _f("Origin", StringType()),
    _f("OriginCityName", StringType()),
    _f("OriginStateName", StringType()),
    _f("Dest", StringType()),
    _f("DestCityName", StringType()),
    _f("DestStateName", StringType()),
    _f("CRSArrTime", IntegerType()),
    _f("CRSDepTime", IntegerType()),
    _f("CRSElapsedTime", DoubleType()),
    _f("ActualElapsedTime", DoubleType()),
    _f("Cancelled", IntegerType()),
    _f("CancellationCode", StringType()),
    _f("Diverted", IntegerType()),
    _f("ArrDelayMinutes", DoubleType()),
    _f("DepDelayMinutes", DoubleType()),
    _f("CarrierDelay", DoubleType()),
    _f("WeatherDelay", DoubleType()),
    _f("NASDelay", DoubleType()),
    _f("SecurityDelay", DoubleType()),
    _f("LateAircraftDelay", DoubleType()),
    _f("Div1Airport", StringType()),
    _f("Div2Airport", StringType()),
    _f("Div3Airport", StringType()),
    _f("Div4Airport", StringType()),
    _f("Div5Airport", StringType()),
])

# Raw CSV schema: pre-rename airline code column (transform.py:9-44).
FLIGHTS_RAW_SCHEMA = StructType([
    f if f.name != "IATA" else _f("IATA_Code_Operating_Airline", StringType())
    for f in FLIGHTS_SCHEMA.fields
])

# Airlines.csv columns actually referenced (shared.py:30,
# flights_lookup_to_kafka.py:22-23).
AIRLINES_SCHEMA = StructType([
    _f("IATA", StringType()),
    _f("ICAO", StringType()),
    _f("Name", StringType()),
])

# Airports.csv (shared.py:36).
AIRPORTS_SCHEMA = StructType([
    _f("iata", StringType()),
    _f("latitude", DoubleType()),
    _f("longitude", DoubleType()),
    _f("name", StringType()),
])

# Aircrafts.csv (aircrafts_lookup_to_kafka.py:35-38).
AIRCRAFTS_SCHEMA = StructType([
    _f("registration", StringType()),
    _f("icao24", StringType()),
])

# OpenSky state vector stream message (producer/producer.py:72-85),
# 12 fields; nullable per the defensive Java parsing
# (StreamProcessor.java:70-110).
OPENSKY_SCHEMA = StructType([
    _f("timestamp", LongType(), nullable=False),
    _f("icao24", StringType()),
    _f("callsign", StringType()),
    _f("origin_country", StringType()),
    _f("longitude", DoubleType()),
    _f("latitude", DoubleType()),
    _f("geo_altitude", DoubleType()),
    _f("velocity", DoubleType()),
    _f("true_track", DoubleType()),
    _f("vertical_rate", DoubleType()),
    _f("on_ground", BooleanType()),
    _f("baro_altitude", DoubleType()),
])
