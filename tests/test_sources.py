from __future__ import annotations

import json

from pyspark.sql import Row

from big_data_flight_analytics_spark.schemas import AIRLINES_SCHEMA
from big_data_flight_analytics_spark.sources.readers import read_csv
from big_data_flight_analytics_spark.sources.writers import (
    kafka_message_frame,
    write_parquet,
)


class TestReadCsv:
    def test_explicit_schema_and_header_strip(self, spark, tmp_path):
        p = tmp_path / "Airlines.csv"
        # header with stray whitespace (reference strips: transform.py:53-54)
        p.write_text("IATA , ICAO,Name\nAA,AAL,American\nDL,DAL,Delta\n")
        df = read_csv(spark, str(p), schema=AIRLINES_SCHEMA)
        assert df.columns == ["IATA", "ICAO", "Name"]
        assert df.count() == 2
        assert df.schema == AIRLINES_SCHEMA

    def test_infer_escape_hatch(self, spark, tmp_path):
        p = tmp_path / "nums.csv"
        p.write_text("a,b\n1,2.5\n3,4.5\n")
        df = read_csv(spark, str(p), infer=True)
        assert dict(df.dtypes) == {"a": "int", "b": "double"}


class TestKafkaMessageFrame:
    def test_distributed_keyed_json(self, spark):
        df = spark.createDataFrame(
            [Row(callsign="DAL123", AirlineName="Delta", n=7)]
        )
        out = kafka_message_frame(df, "callsign").collect()
        assert out[0]["key"] == "DAL123"
        payload = json.loads(out[0]["value"])
        assert payload == {"callsign": "DAL123", "AirlineName": "Delta", "n": 7}

    def test_schema_is_kafka_shaped(self, spark):
        df = spark.createDataFrame([Row(k=1, v="x")])
        frame = kafka_message_frame(df, "k")
        assert frame.columns == ["key", "value"]
        assert dict(frame.dtypes) == {"key": "string", "value": "string"}


class TestWriteParquet:
    def test_partitioned_default(self, spark, tmp_path):
        df = spark.createDataFrame([Row(y=2022, x=1), Row(y=2023, x=2)])
        out = str(tmp_path / "o")
        write_parquet(df, out, partition_by=["y"])
        import os
        assert sorted(
            d for d in os.listdir(out) if d.startswith("y=")
        ) == ["y=2022", "y=2023"]

    def test_single_file_mode(self, spark, tmp_path):
        df = spark.createDataFrame([Row(x=i) for i in range(100)]).repartition(8)
        out = str(tmp_path / "s")
        write_parquet(df, out, single_file=True)
        import glob
        assert len(glob.glob(out + "/part-*")) == 1

    def test_partition_pruning_reaches_scan(self, spark, tmp_path):
        """A filter on the partition column must become a PartitionFilter
        (directory pruning at the source), not a post-scan Filter — the
        difference between reading one partition and reading 100 TB."""
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [Row(y=2020 + i % 4, x=i) for i in range(64)]
        )
        out = str(tmp_path / "pp")
        write_parquet(df, out, partition_by=["y"])
        read = spark.read.parquet(out).filter(F.col("y") == 2022)
        plan = read._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [isnotnull(y" in plan
        # pruned read returns exactly the one partition's rows
        assert read.count() == 16
        rows = read.select("y").distinct().collect()
        assert [r["y"] for r in rows] == [2022]


class TestOrc:
    def test_round_trip_and_pushdown(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from big_data_flight_analytics_spark.sources.readers import read_orc
        from big_data_flight_analytics_spark.sources.writers import write_orc

        df = spark.createDataFrame(
            [Row(k=i, v=f"s{i}", y=2020 + i % 2) for i in range(40)]
        )
        out = str(tmp_path / "orc")
        write_orc(df, out, partition_by=["y"])
        back = read_orc(spark, out)
        assert back.count() == 40
        filtered = back.filter(F.col("k") == 7).select("k", "v")
        plan = filtered._jdf.queryExecution().executedPlan().toString()
        # predicate reaches the ORC scan, projection is pruned
        assert "PushedFilters: [IsNotNull(k), EqualTo(k,7)" in plan
        rows = filtered.collect()
        assert len(rows) == 1 and rows[0]["v"] == "s7"


class TestJson:
    def test_ndjson_round_trip(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from big_data_flight_analytics_spark.sources.readers import read_json
        from big_data_flight_analytics_spark.sources.writers import write_json

        df = spark.createDataFrame(
            [Row(k=i, v=f"s{i}", y=2020 + i % 2) for i in range(40)]
        )
        out = str(tmp_path / "json")
        write_json(df, out, partition_by=["y"], compression="gzip")
        back = read_json(spark, out, schema=df.schema)
        assert back.count() == 40
        got = back.filter(F.col("k") == 7).collect()
        assert len(got) == 1 and got[0]["v"] == "s7" and got[0]["y"] == 2021
        # partition values survive the partitioned layout round trip
        assert back.filter(F.col("y") == 2020).count() == 20

    def test_multiline_array_file(self, spark, tmp_path):
        """OpenSky replay corpus shape: one JSON array per file."""
        from big_data_flight_analytics_spark.sources.readers import read_json

        p = tmp_path / "states.json"
        p.write_text('[{"icao24": "a1", "ts": 5}, {"icao24": "b2", "ts": 6}]')
        df = read_json(spark, str(p), multiline=True)
        rows = {r["icao24"]: r["ts"] for r in df.collect()}
        assert rows == {"a1": 5, "b2": 6}

    def test_explicit_schema_skips_inference_and_permissive_corrupt(
        self, spark, tmp_path
    ):
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        from big_data_flight_analytics_spark.sources.readers import read_json

        p = tmp_path / "data.json"
        p.write_text('{"k": 1, "v": "ok"}\n{"k": not-json\n{"k": 2, "v": "x"}\n')
        schema = StructType(
            [
                StructField("k", LongType(), True),
                StructField("v", StringType(), True),
                StructField("_corrupt_record", StringType(), True),
            ]
        )
        df = read_json(spark, str(p), schema=schema).cache()
        try:
            assert df.count() == 3
            bad = df.filter(df["_corrupt_record"].isNotNull()).collect()
            assert len(bad) == 1 and bad[0]["k"] is None
            good = {r["k"] for r in df.filter(df["k"].isNotNull()).collect()}
            assert good == {1, 2}
        finally:
            df.unpersist()


class TestCsvWrite:
    def test_partitioned_round_trip_with_schema(self, spark, tmp_path):
        import datetime as dt

        from pyspark.sql import functions as F

        from big_data_flight_analytics_spark.sources.readers import read_csv
        from big_data_flight_analytics_spark.sources.writers import write_csv

        df = spark.createDataFrame(
            [
                Row(
                    k=i,
                    v=f"s{i}",
                    ts=dt.datetime(2024, 1, 1, 0, 0, i, 123456),
                    y=2020 + i % 2,
                )
                for i in range(40)
            ]
        )
        out = str(tmp_path / "csv")
        write_csv(df, out, partition_by=["y"])
        back = read_csv(
            spark, out + "/*/*.csv", schema="k long, v string, ts timestamp"
        )
        assert back.count() == 40
        got = back.filter(F.col("k") == 7).collect()
        assert len(got) == 1 and got[0]["v"] == "s7"
        # microsecond grain survives the ISO timestamp format
        assert got[0]["ts"] == dt.datetime(2024, 1, 1, 0, 0, 7, 123456)
