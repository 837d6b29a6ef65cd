"""Semantics unit tests for the scalar function library (SURVEY §5.3)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.functions.scalar import (
    airline_code_from_callsign,
    haversine_km,
    hhmm_to_str,
    minmax_normalize_expr,
)
from big_data_flight_analytics_spark.functions.text import token_count
from big_data_flight_analytics_spark.functions.vector import (
    cosine_similarity,
    dot_product,
)


def one(df, col):
    return df.select(col.alias("v")).collect()[0]["v"]


class TestHaversine:
    def test_known_distance_jfk_lax(self, spark):
        # JFK (40.6413, -73.7781) to LAX (33.9416, -118.4085) ~ 3974 km
        df = spark.createDataFrame([Row(a=40.6413, b=-73.7781, c=33.9416, d=-118.4085)])
        d = one(df, haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d")))
        assert d == pytest.approx(3974, abs=10)

    def test_zero_distance(self, spark):
        df = spark.createDataFrame([Row(a=51.5, b=-0.12, c=51.5, d=-0.12)])
        assert one(df, haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d"))) == 0.0

    def test_antipodal_no_nan(self, spark):
        # clamp guard: near-antipodal points must not produce NaN
        df = spark.createDataFrame([Row(a=0.0, b=0.0, c=0.0, d=180.0)])
        d = one(df, haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d")))
        assert d == pytest.approx(20015, abs=5)


class TestHHMM:
    @pytest.mark.parametrize(
        ("hhmm", "expected"),
        [(0, "00:00"), (5, "00:05"), (945, "09:45"), (1345, "13:45"), (2359, "23:59")],
    )
    def test_codec(self, spark, hhmm, expected):
        df = spark.createDataFrame([Row(x=hhmm)])
        assert one(df, hhmm_to_str(F.col("x"))) == expected


class TestAirlineCode:
    """Truth table of AirlineAircraftCountStream.java:74-85."""

    @pytest.mark.parametrize(
        ("callsign", "expected"),
        [
            (None, "UNKNOWN"),
            ("", "UNKNOWN"),
            ("   ", "UNKNOWN"),
            ("N12345", "PRIVATE"),
            ("n123", "PRIVATE"),
            ("AB", "AB"),
            ("x", "X"),
            ("DAL123", "DAL"),
            ("ual9 ", "UAL"),
            ("  SWA45", "SWA"),
        ],
    )
    def test_rules(self, spark, callsign, expected):
        df = spark.createDataFrame([Row(cs=callsign)], "cs string")
        assert one(df, airline_code_from_callsign(F.col("cs"))) == expected


class TestMinMaxNormalize:
    def test_basic(self, spark):
        df = spark.createDataFrame([Row(x=0.0), Row(x=5.0), Row(x=10.0)])
        out = df.select(
            minmax_normalize_expr(F.col("x"), F.lit(0.0), F.lit(10.0)).alias("v")
        ).collect()
        assert [r["v"] for r in out] == [0.0, 0.5, 1.0]

    def test_span_guard_when_constant(self, spark):
        # max <= min -> span treated as 1.0 (aircrafts_lookup_to_kafka.py:54)
        df = spark.createDataFrame([Row(x=7.0)])
        v = one(df, minmax_normalize_expr(F.col("x"), F.lit(7.0), F.lit(7.0)))
        assert v == 0.0

    def test_null_input_coalesces_to_zero(self, spark):
        df = spark.createDataFrame([Row(x=None)], "x double")
        v = one(df, minmax_normalize_expr(F.col("x"), F.lit(-2.0), F.lit(2.0)))
        assert v == 0.5  # (0 - -2) / 4


class TestTokenCount:
    @pytest.mark.parametrize(
        ("text", "expected"),
        [("a b c", 3), ("  a   b ", 2), ("", 0), ("   ", 0), (None, 0), ("one", 1)],
    )
    def test_counts(self, spark, text, expected):
        df = spark.createDataFrame([Row(t=text)], "t string")
        assert one(df, token_count(F.col("t"))) == expected


class TestVector:
    def test_dot_product(self, spark):
        df = spark.createDataFrame([Row(a=[1.0, 2.0, 3.0], b=[4.0, 5.0, 6.0])])
        assert one(df, dot_product(F.col("a"), F.col("b"))) == 32.0

    def test_cosine_identical(self, spark):
        df = spark.createDataFrame([Row(a=[1.0, 2.0], b=[2.0, 4.0])])
        assert one(df, cosine_similarity(F.col("a"), F.col("b"))) == 1.0

    def test_cosine_orthogonal(self, spark):
        df = spark.createDataFrame([Row(a=[1.0, 0.0], b=[0.0, 1.0])])
        assert one(df, cosine_similarity(F.col("a"), F.col("b"))) == 0.0

    def test_cosine_zero_norm_guard(self, spark):
        df = spark.createDataFrame([Row(a=[0.0, 0.0], b=[1.0, 1.0])])
        assert one(df, cosine_similarity(F.col("a"), F.col("b"))) == 0.0
