"""Parity checks against Spark's own reference implementations."""

from __future__ import annotations

import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.operators.core import bucketize
from big_data_flight_analytics_spark.operators.geo import radius_join


class TestBucketizerParity:
    def test_matches_ml_bucketizer_on_edges(self, spark):
        """Our native when-chain must reproduce ml.feature.Bucketizer
        bucket indices exactly (batch_process.py:160-170 semantics),
        including values AT the split points (right-exclusive) and in
        the open last bucket."""
        from pyspark.ml.feature import Bucketizer

        splits = [0.0, 250.0, 500.0, 750.0, 1000.0, 2500.0, float("inf")]
        labels = [str(i) for i in range(len(splits) - 1)]
        rng = random.Random(1)
        values = (
            [0.0, 249.999, 250.0, 499.999, 500.0, 999.0, 1000.0, 2500.0, 9999.0]
            + [round(rng.uniform(0, 3500), 3) for _ in range(200)]
        )
        df = spark.createDataFrame([Row(Distance=v) for v in values])

        ml_out = Bucketizer(
            splits=splits, inputCol="Distance", outputCol="cat"
        ).transform(df)
        ours = bucketize(df, "Distance", splits, labels, out="bucket")

        merged = (
            ml_out.withColumn("ml_cat", F.col("cat").cast("int").cast("string"))
            .join(ours, "Distance")
            .select("Distance", "ml_cat", "bucket")
        )
        mismatches = merged.filter(F.col("ml_cat") != F.col("bucket")).collect()
        assert mismatches == []


class TestGeoBoxPrefilter:
    def test_bbox_does_not_change_results(self, spark):
        rng = random.Random(3)
        pts = spark.createDataFrame(
            [Row(pid=i, latitude=rng.uniform(-80, 80),
                 longitude=rng.uniform(-179, 179)) for i in range(150)]
        )
        sites = spark.createDataFrame(
            [Row(sid=j, site_latitude=rng.uniform(-80, 80),
                 site_longitude=rng.uniform(-179, 179)) for j in range(25)]
        )
        # prefiltered broadcast path vs banded path (no bbox) must agree
        a = radius_join(pts, sites, radius_km=2000.0, use_banding=False)
        b = radius_join(pts, sites, radius_km=2000.0, use_banding=True)
        pa = {(r["pid"], r["sid"]) for r in a.collect()}
        pb = {(r["pid"], r["sid"]) for r in b.collect()}
        assert pa == pb and len(pa) > 0


class TestCrossEngineHashContract:
    """The md5-slice int64 key every hash-gated pipeline leans on
    (d19 term hashing, the MinHash signature halves) must compute
    IDENTICALLY in Spark and DuckDB — this pins the contract on
    adversarial inputs (unicode, hex-looking strings, long phrases,
    leading-zero digests) rather than trusting the catalog's corpus
    to exercise it."""

    STRINGS = [
        "hello world",
        "",
        "a",
        "the quick brown fox jumps over the lazy dog",
        "naïve café — über-token 日本語 текст",
        "0123456789abcdef",  # hex-looking
        "deadbeef deadbeef deadbeef",
        " ".join(f"tok{i}" for i in range(50)),
        "ключ значение пара",
        "tab\tand\nnewline",
    ]

    def test_md5_slice_int64_identical(self, spark):
        import duckdb

        from pyspark.sql import Row, functions as F

        df = spark.createDataFrame([Row(s=s) for s in self.STRINGS])
        got_spark = {
            r["s"]: r["h"]
            for r in df.select(
                "s",
                F.conv(F.substring(F.md5("s"), 1, 15), 16, 10)
                .cast("long")
                .alias("h"),
            ).collect()
        }
        con = duckdb.connect()
        for s in self.STRINGS:
            want = con.execute(
                "SELECT CAST(('0x' || substring(md5(?), 1, 15)) AS BIGINT)",
                [s],
            ).fetchone()[0]
            assert got_spark[s] == want, s

    def test_leading_zero_digest_parses(self, spark):
        """A digest whose first hex chars are zeros must not desync
        (conv drops leading zeros; the cast form must agree)."""
        import hashlib

        import duckdb

        from pyspark.sql import Row, functions as F

        # brute-force a string whose md5 starts with '00'
        probe = next(
            f"probe{i}"
            for i in range(100000)
            if hashlib.md5(f"probe{i}".encode()).hexdigest().startswith("00")
        )
        df = spark.createDataFrame([Row(s=probe)])
        got = df.select(
            F.conv(F.substring(F.md5("s"), 1, 15), 16, 10)
            .cast("long")
            .alias("h")
        ).collect()[0]["h"]
        want = duckdb.connect().execute(
            "SELECT CAST(('0x' || substring(md5(?), 1, 15)) AS BIGINT)",
            [probe],
        ).fetchone()[0]
        assert got == want
