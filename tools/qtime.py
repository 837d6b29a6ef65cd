"""Per-query timing + plan capture for optimization iterations.

Times named catalog queries via the noop sink (min of N reps, default
3) on the bench session, optionally dumping ``explain('formatted')``
to plans/<round-dir>/<name>_<tag>.txt (--plans-dir, default plans/r17). Isolated from bench.py so a single
query can be iterated without a full catalog pass.

Usage:
  python tools/qtime.py [--reps N] [--explain TAG] name [name ...]
  SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS honored as in bench.py.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_flight_analytics_spark.cache import release_tracked  # noqa: E402
from big_data_flight_analytics_spark.plans.catalog import QUERIES  # noqa: E402
from big_data_flight_analytics_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", default=None, metavar="TAG",
                    help="dump explain('formatted') to <plans-dir>/<name>_<TAG>.txt")
    ap.add_argument("--plans-dir", default="plans/r17")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_session(app_name="qtime")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: session + codegen paths
    spark.read.parquet(f"{args.sf_dir}/region.parquet").count()

    out: dict[str, float] = {}
    for name in args.names:
        fn = QUERIES[name]
        if args.explain:
            os.makedirs(args.plans_dir, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, args.sf_dir).explain("formatted")
            release_tracked()
            with open(f"{args.plans_dir}/{name}_{args.explain}.txt", "w") as f:
                f.write(buf.getvalue())
        best = float("inf")
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            t0 = time.time()
            fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite").save()
            best = min(best, time.time() - t0)
            release_tracked()
            spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
