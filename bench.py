"""Benchmark harness: runs the full query catalog at a scale factor.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is materialized via the noop sink — full execution, no
driver-side collect cost. Dir from $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1), parallelism from $SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_flight_analytics_spark.plans.catalog import QUERIES  # noqa: E402
from big_data_flight_analytics_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    spark = get_session(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup outside the timed region so per-query numbers
    # measure the engine, not session startup
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    next(iter(QUERIES.values()))(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_catalog_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
