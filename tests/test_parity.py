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
