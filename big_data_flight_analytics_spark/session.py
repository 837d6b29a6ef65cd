"""SparkSession construction with scale-aware defaults.

The reference builds sessions ad hoc per script
(reference: orchestration/src/shared.py:18-26 — HDFS + Mongo URIs, no
tuning). Here the session is an engine concern: AQE on (runtime skew-join
and partition coalescing), explicit shuffle partitioning, Arrow enabled
for the Pandas-UDF extension operators.

At 100 TB on a real cluster the same builder applies — only
``shuffle_partitions`` (sized ~= 2-3x total cores, or left to AQE
coalescing from a high initial value) and the master URL change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def session_builder(
    app_name: str = "big-data-flight-analytics-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession.Builder:
    """Builder with engine defaults; caller may override before getOrCreate."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    return (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime partition coalescing, skew-join splitting, plan re-opt.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow transfer for the Pandas-UDF extension operators (10-100x
        # over row-at-a-time; the parity operators are UDF-free anyway).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Broadcast threshold: dims in this workload are KB-MB scale.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )


def get_session(**kwargs) -> SparkSession:
    return session_builder(**kwargs).getOrCreate()
