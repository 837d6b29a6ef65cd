"""Core-count scaling row (VERDICT r16 #4): time queries at a replica
dir under the CURRENT $SPARK_GRAFT_CPUS and print one JSON line.

The sf0.1 bench cannot demonstrate parallel scaling (~0.8 s/query is
fixed overhead); at the 10x replica the compute term dominates, so
the c8/c32 seconds ratio per query is a meaningful read: ~2-4x means
the operator parallelizes, ~1x means driver-bound (to be explained or
fixed). Run twice:

  SPARK_GRAFT_CPUS=32 python tools/core_scaling.py /tmp/sf1x q1 ...
  SPARK_GRAFT_CPUS=8  python tools/core_scaling.py /tmp/sf1x q1 ...

Timing protocol matches bench.py (noop sink, min of N reps).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_flight_analytics_spark.cache import release_tracked  # noqa: E402
from big_data_flight_analytics_spark.plans.catalog import QUERIES  # noqa: E402
from big_data_flight_analytics_spark.session import get_session  # noqa: E402

DEFAULT = [
    "v8_ivfpq_topk", "v7_pq_trained_topk", "d18_semdedup_clusters",
    "v11_retrieval_pipeline", "j13_advised_semi_join",
    "t21_perceptron_quality", "t20_langid", "d19_sparse_cosine",
    "d22_sketch_containment", "i14_geo_count_delta", "i17_novelty_delta",
    "i16_bm25_stats_delta", "j11_bloom_semi_join", "v10_mmr_rerank",
    "g2_knn_triangles", "d21_decon_excise", "t24_corpus_assembly",
    "j16_geo_nearest_k", "i4_minhash_delta", "t19_lm_perplexity",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x"
    names = sys.argv[2:] or DEFAULT
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    spark = get_session(app_name="core_scaling")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    out: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"scaling:{name}")
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.time() - t0)
            release_tracked()
            spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 2)
    print(json.dumps({
        "cpus": os.environ.get("SPARK_GRAFT_CPUS"),
        "sf_dir": sf_dir,
        "queries": out,
    }))


if __name__ == "__main__":
    main()
