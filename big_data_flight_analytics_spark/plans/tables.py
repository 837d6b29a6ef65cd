"""Loaders for the driver's synthetic parquet tables (TESTDATA.md)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan; Catalyst handles pushdown/pruning from here.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark 4 rejects
    unless read as a raw long (spark.sql.legacy.parquet.nanosAsLong);
    it is then converted to a microsecond timestamp column, which every
    downstream grouping (minute windows, hour/minute, dayofweek) is
    insensitive to. Set defensively here so any caller session works.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, LongType):
            # integer `div` (not `/`): float division of ~1e18 nanos loses
            # sub-microsecond precision in double
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
