"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query DataFrame at sf0.001 (smoke check)
queries()     -> name -> (spark, sf_dir) -> DataFrame, one per operator
oracle_sql()  -> name -> DuckDB SQL equivalent (every catalog query has
                 one — MinHash/SimHash run on md5, which both engines
                 compute bit-identically)
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_flight_analytics_spark.plans.catalog import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q3_busiest_customers"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
