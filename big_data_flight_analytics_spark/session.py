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
    # Scan-parallelism floor: OFF by default. Locally the sf0.1 corpus
    # fits 1-13 natural splits and the iterative loops pin their
    # shuffle width to the scan's partition count — forcing 32 splits
    # measured 2-3x SLOWER across the kmeans/pagerank family (r17
    # interleaved A/B: v8 13.0->38.2 s, d18 7.4->21.4, g1 6.9->18.4),
    # because each loop round then shuffles KB-scale state 32-wide. At
    # 100 TB the floor is MOOT for real tables (file bytes >> 4 MB
    # yield thousands of natural splits); set SPARK_GRAFT_MIN_PARTS
    # (integer, or "auto" = session cores) only for compute-dense
    # tiny-byte inputs — the 10x-replica scaling study does.
    mp_env = os.environ.get("SPARK_GRAFT_MIN_PARTS", "0")
    min_parts = int(cpus) if mp_env == "auto" else int(mp_env)
    builder = (
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
    if min_parts > 0:
        builder = builder.config(
            "spark.sql.files.minPartitionNum", str(min_parts)
        )
        # the floor is inert without this: maxSplitBytes =
        # max(openCostInBytes, min(maxPartitionBytes, bytes/minParts)),
        # and the 4 MB default means a compute-dense sub-4MB file
        # (10x-replica documents = 911 KB of zstd'd text) NEVER splits.
        # 64 KB keeps tiny-file packing sane locally and is inert at
        # cluster scale (bytes/minParts >> 64 KB there).
        builder = builder.config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("SPARK_GRAFT_OPEN_COST", str(64 * 1024)),
        )
    return builder


def get_session(**kwargs) -> SparkSession:
    return session_builder(**kwargs).getOrCreate()
