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


class TestLangId:
    """Truth table for the char-trigram language id on natural prose.

    The profiles are tiny (12 trigrams/language), so this asserts the
    classifier contract on clearly-in-language sentences, not corpus
    accuracy; keyword-soup text is documented arbitrary-but-
    deterministic."""

    CASES = [
        ("en", "the children were singing that song for the nation "
               "and everyone there was watching his performance"),
        ("de", "der schnelle braune fuchs springt gegen den faulen hund "
               "und die katze beobachtet ihn bei der schönen unterhaltung"),
        ("fr", "les enfants mangent des pommes que leur mère avait "
               "achetées pour eux pendant une longue journée"),
        ("es", "los niños comen unas manzanas que una madre ha comprado "
               "para ellos durante el viernes por la mañana"),
        ("zh", "这是一个完整的中文句子没有任何拉丁字母"),
    ]

    def test_truth_table(self, spark):
        from pyspark.sql import Row

        from big_data_flight_analytics_spark.functions.text import lang_id_expr

        df = spark.createDataFrame(
            [Row(want=lang, text=text) for lang, text in self.CASES]
        )
        out = df.select("want", lang_id_expr(F.col("text")).alias("got")).collect()
        for r in out:
            assert r["got"] == r["want"], (r["want"], r["got"])

    def test_empty_and_null_default_en(self, spark):
        from pyspark.sql import Row

        from big_data_flight_analytics_spark.functions.text import lang_id_expr

        df = spark.createDataFrame(
            [Row(doc_id=1, text=""), Row(doc_id=2, text=None),
             Row(doc_id=3, text="zzz qqq xxx")]
        )
        got = {r["doc_id"]: r["l"] for r in
               df.select("doc_id", lang_id_expr(F.col("text")).alias("l")).collect()}
        assert got == {1: "en", 2: "en", 3: "en"}

    def test_sql_mirror_matches_spark(self, spark):
        """lang_case_sql() on the same sentences agrees with the Spark
        expression (the generator IS the oracle used by t1/t8/d8)."""
        import duckdb
        from pyspark.sql import Row

        from big_data_flight_analytics_spark.functions.text import (
            lang_case_sql,
            lang_id_expr,
        )

        df = spark.createDataFrame(
            [Row(i=i, text=t) for i, (_, t) in enumerate(self.CASES)]
        )
        spark_out = {
            r["i"]: r["l"]
            for r in df.select("i", lang_id_expr(F.col("text")).alias("l")).collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t AS SELECT * FROM (VALUES "
            + ", ".join(f"({i}, ?)" for i in range(len(self.CASES)))
            + ") v(i, text)",
            [t for _, t in self.CASES],
        )
        duck_out = dict(
            con.execute(f"SELECT i, {lang_case_sql()} FROM t").fetchall()
        )
        assert duck_out == spark_out


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
