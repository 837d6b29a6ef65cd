"""Loaders for the driver's synthetic parquet tables (TESTDATA.md)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan; Catalyst handles pushdown/pruning from here.

    ``events.ts`` is normalized to session-zone TIMESTAMP regardless of
    how the parquet encodes it:

    - TIMESTAMP(NANOS) files Spark 4 rejects unless read as a raw long
      (spark.sql.legacy.parquet.nanosAsLong); converted to a
      microsecond timestamp, which every downstream grouping (minute
      windows, hour/minute, dayofweek) is insensitive to.
    - Naive-micros files read as TIMESTAMP_NTZ under PySpark >= 4.1;
      several timestamp builtins (``unix_micros`` et al.) require LTZ,
      so cast — an identity under the engine's pinned UTC session
      timezone (session.py), just a type-tag change.

    Set defensively here so any caller session works.

    .. warning:: loading ``events`` permanently sets
       ``spark.sql.session.timeZone=UTC`` (and ``nanosAsLong``) on the
       caller's session. Save/restore would be wrong: the NTZ->TIMESTAMP
       cast above evaluates lazily, under whatever timezone is current
       when the query *executes*, so the pin must outlive this call.
       Sessions built by :func:`..session.get_session` already pin UTC;
       callers that rely on a non-UTC session timezone for *rendering*
       other timestamps should not share a session with events queries.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # The NTZ->TIMESTAMP cast below is only an identity under UTC;
        # pin it here so the docstring's "any caller session" holds for
        # sessions not built by session.get_session()
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, LongType):
            # integer `div` (not `/`): float division of ~1e18 nanos loses
            # sub-microsecond precision in double
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(df.schema["ts"].dataType, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
