"""Readers (IO1-IO3): explicit-schema CSV and Parquet scans.

reference: transform.py:51-52 (CSV glob + inferSchema),
batch_process.py:243 (parquet glob — with meaningless header/inferSchema
kwargs the engine does not reproduce). Explicit schemas avoid the
inference pass (a full data scan at 100 TB) and pin types
deterministically; ``infer=True`` is the compatibility escape hatch.
Column-name whitespace is sanitized on read (transform.py:53-54).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    infer: bool = False,
    header: bool = True,
    strip_header_whitespace: bool = True,
) -> DataFrame:
    reader = spark.read.option("header", header)
    if schema is not None:
        df = reader.schema(schema).csv(path)
    elif infer:
        df = reader.option("inferSchema", True).csv(path)
    else:
        df = reader.csv(path)  # all-string columns
    if strip_header_whitespace:
        stripped = [c.strip() for c in df.columns]
        if stripped != df.columns:
            df = df.toDF(*stripped)
    return df


def read_parquet(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """Parquet is self-describing; optional schema enforces projection
    and lets Catalyst prune the scan to declared columns."""
    if schema is not None:
        return spark.read.schema(schema).parquet(path)
    return spark.read.parquet(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """ORC scan (built-in vectorized reader). Like parquet, ORC is
    self-describing and supports predicate pushdown + column pruning;
    an explicit schema pins the projection."""
    if schema is not None:
        return spark.read.schema(schema).orc(path)
    return spark.read.orc(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    multiline: bool = False,
) -> DataFrame:
    """NDJSON scan (one object per line; ``multiline=True`` for a
    single JSON array per file — the OpenSky replay corpus shape,
    producer.py:100-135). An explicit schema is strongly preferred:
    without one, JSON inference is a FULL extra pass over the data and
    types drift with content. Malformed lines follow Spark's
    PERMISSIVE mode (nulls + _corrupt_record when declared in the
    schema) rather than failing the scan."""
    reader = spark.read.option("multiLine", multiline)
    if schema is not None:
        return reader.schema(schema).json(path)
    return reader.json(path)
