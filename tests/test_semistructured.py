"""VariantType semi-structured fast path (Spark 4, SPARK-45891).

Parse-once/extract-many parity with the string-path functions, NULL
semantics for missing/mismatched/malformed input, and the f2 variant
drop-in differential — including a DuckDB JSON-type oracle run (the
r8 catalog candidate's oracle, pre-validated here)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from big_data_flight_analytics_spark.operators.semistructured import (
    props_metrics_variant,
    variant_fields,
    with_variant,
    with_variant_safe,
)

SF001 = "/root/testdata/sf0.01"


class TestVariantBasics:
    def _bags(self, spark):
        return spark.createDataFrame(
            [
                Row(id=1, j='{"k": 5, "name": "a", "tags": [10, 20]}'),
                Row(id=2, j='{"k": "not-a-number", "extra": true}'),
                Row(id=3, j='{"nested": {"deep": 7}}'),
            ]
        )

    def test_parse_once_extract_many(self, spark):
        out = variant_fields(
            with_variant(self._bags(spark), "j"),
            "__variant",
            {
                "k": ("$.k", "long"),
                "name": ("$.name", "string"),
                "tag1": ("$.tags[1]", "long"),
                "deep": ("$.nested.deep", "long"),
            },
        )
        rows = {r["id"]: r for r in out.collect()}
        assert (rows[1]["k"], rows[1]["name"], rows[1]["tag1"]) == (
            5,
            "a",
            20,
        )
        # type mismatch and missing path -> NULL, not error
        assert rows[2]["k"] is None and rows[2]["tag1"] is None
        assert rows[3]["deep"] == 7

    def test_malformed_json_null_vs_raise(self, spark):
        bad = spark.createDataFrame([Row(j="{nope")])
        assert (
            with_variant_safe(bad, "j").filter("__variant IS NULL").count()
            == 1
        )
        with pytest.raises(Exception):
            with_variant(bad, "j").collect()

    def test_strict_field_raises_on_type_mismatch(self, spark):
        # strict mode = variant_get: a MISSING path is NULL in both
        # modes (Spark semantics); strictness bites on cast failure
        df = with_variant(
            spark.createDataFrame([Row(j='{"a": {"b": 1}}')]), "j"
        )
        with pytest.raises(Exception):
            variant_fields(
                df, "__variant", {"a": ("!$.a", "long")}
            ).collect()
        ok = variant_fields(df, "__variant", {"b": ("!$.b", "long")})
        assert ok.first()["b"] is None


class TestF2VariantDropIn:
    def test_malformed_props_row_yields_null_bucket_not_error(self, spark):
        # ingestion-grade leniency (ADVICE r7): one malformed props row
        # must contribute a NULL bucket — get_json_object's historical
        # semantics and the oracle's json_extract — never kill the scan
        events = spark.createDataFrame(
            [
                Row(props='{"k": 7}', value=1.0),
                Row(props="{malformed", value=2.0),
            ]
        )
        rows = {r["k_bucket"]: r["n_events"]
                for r in props_metrics_variant(events).collect()}
        assert rows == {0: 1, None: 1}

    @pytest.mark.skipif(
        not os.path.exists(f"{SF001}/events.parquet"),
        reason="testdata not present",
    )
    def test_matches_f2_on_real_data(self, spark):
        from big_data_flight_analytics_spark.plans.analytic_queries import (
            f2_props_json,
        )
        from big_data_flight_analytics_spark.plans.tables import load

        events = load(spark, SF001, "events")
        via_variant = {
            tuple(r) for r in props_metrics_variant(events).collect()
        }
        via_string = {
            tuple(r) for r in f2_props_json(spark, SF001).collect()
        }
        assert via_variant == via_string

    @pytest.mark.skipif(
        not os.path.exists(f"{SF001}/events.parquet"),
        reason="testdata not present",
    )
    def test_matches_duckdb_json_oracle(self, spark):
        # the r8 catalog candidate's oracle: DuckDB's JSON type is the
        # same parse-once representation; typed extraction mirrors
        # try_variant_get's NULL-on-miss
        import duckdb

        from big_data_flight_analytics_spark.plans.tables import load

        got = {
            (r["k_bucket"], r["n_events"], r["avg_value"])
            for r in props_metrics_variant(load(spark, SF001, "events")).collect()
        }
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW events AS SELECT * FROM '{SF001}/events.parquet'"
        )
        want = {
            (r[0], r[1], r[2])
            for r in con.sql(
                """
                WITH parsed AS (
                    SELECT TRY_CAST(json_extract_string(props, '$.k')
                                    AS BIGINT) AS k, value
                    FROM events
                )
                SELECT k - k % 10 AS k_bucket,
                       CAST(COUNT(*) AS BIGINT) AS n_events,
                       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2)))
                                  AS DOUBLE) / COUNT(*), 4) AS avg_value
                FROM parsed GROUP BY k_bucket
                """
            ).fetchall()
        }
        assert got == want


class TestBagKeyStats:
    def test_heterogeneous_bags(self, spark):
        from big_data_flight_analytics_spark.operators.semistructured import (
            bag_key_stats,
        )

        df = spark.createDataFrame(
            [
                Row(j='{"a": 1, "b": "x"}'),
                Row(j='{"a": 2, "c": [1, 2]}'),
                Row(j='{"a": 1}'),
                Row(j="{malformed"),
            ]
        )
        out = {r["key"]: r for r in bag_key_stats(df, "j").collect()}
        assert set(out) == {"a", "b", "c"}
        assert out["a"]["n_rows"] == 3
        assert out["a"]["n_distinct_values"] == 2
        assert out["a"]["value_types"] == ["BIGINT"]
        assert out["c"]["value_types"] == ["ARRAY<BIGINT>"]

    def test_matches_duckdb_json_each(self, spark):
        import duckdb
        import os
        import pytest as _pytest

        if not os.path.exists(f"{SF001}/events.parquet"):
            _pytest.skip("testdata not present")

        from big_data_flight_analytics_spark.operators.semistructured import (
            bag_key_stats,
        )
        from big_data_flight_analytics_spark.plans.tables import load

        got = {
            (r["key"], r["n_rows"], r["n_distinct_values"])
            for r in bag_key_stats(load(spark, SF001, "events")).collect()
        }
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW events AS SELECT * FROM '{SF001}/events.parquet'"
        )
        want = {
            (r[0], r[1], r[2])
            for r in con.sql(
                """
                SELECT k AS key, COUNT(*) AS n_rows,
                       COUNT(DISTINCT CAST(json_extract(props,
                           '$."' || k || '"') AS VARCHAR))
                           AS n_distinct_values
                FROM (SELECT unnest(json_keys(props)) AS k, props
                      FROM events)
                GROUP BY 1
                """
            ).fetchall()
        }
        assert got == want


class TestF4VariantExtract:
    def test_catalog_entry_matches_string_path(self, spark):
        """f4's variant extract-many pipeline must equal the same
        aggregate computed straight from the source columns (no JSON
        round-trip) — the drop-in contract that makes the variant fast
        path safe to adopt."""
        from pyspark.sql import functions as F

        from big_data_flight_analytics_spark.plans.analytic_queries import (
            f4_variant_extract,
        )
        from big_data_flight_analytics_spark.plans.tables import load

        sf = "/root/testdata/sf0.001"
        got = {
            tuple(r)
            for r in f4_variant_extract(spark, sf).collect()
        }
        ev = load(spark, sf, "events")
        k = F.try_variant_get(
            F.try_parse_json(F.col("props")), "$.k", "long"
        )
        direct = (
            ev.select(
                F.col("event_type").alias("ev_type"),
                F.col("user_id").alias("uid"),
                k.alias("k"),
                (F.col("value").cast("decimal(18,2)") * 100)
                .cast("long")
                .alias("cents"),
                F.when(F.col("value") > 50, F.lit("big"))
                .otherwise(F.lit("small"))
                .alias("size_tag"),
            )
            .groupBy("ev_type", "size_tag")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_events"),
                F.sum("cents").cast("long").alias("sum_cents"),
                F.countDistinct("uid").cast("long").alias("n_users"),
                F.sum((F.col("k") >= 50).cast("long"))
                .cast("long")
                .alias("n_high_k"),
            )
        )
        assert got == {tuple(r) for r in direct.collect()}

    def test_array_index_and_nested_path(self, spark):
        """variant_fields navigates nested objects and array indices;
        out-of-range indices and missing paths yield NULL."""
        from pyspark.sql import Row

        from big_data_flight_analytics_spark.operators.semistructured import (
            variant_fields,
            with_variant_safe,
        )

        df = spark.createDataFrame(
            [
                Row(j='{"m": {"k": 7}, "tags": ["a", "b"]}'),
                Row(j='{"m": {}, "tags": ["only"]}'),
                Row(j='{"tags": []}'),
            ]
        )
        out = variant_fields(
            with_variant_safe(df, "j", "__v"),
            "__v",
            {
                "k": ("$.m.k", "long"),
                "t1": ("$.tags[1]", "string"),
            },
        ).select("k", "t1")
        assert [tuple(r) for r in out.collect()] == [
            (7, "b"),
            (None, None),
            (None, None),
        ]
