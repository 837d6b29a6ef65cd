"""One-off: inspect LSH bucket-size distributions to pick skew caps.

Usage: python tools/bucket_dist.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from big_data_flight_analytics_spark.operators.dedup import (  # noqa: E402
    MINHASH_P,
    _shingled,
    simhash_signatures,
)
from big_data_flight_analytics_spark.plans.tables import load  # noqa: E402
from big_data_flight_analytics_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session(app_name="bucket_dist")
    docs = load(spark, sf_dir, "documents")

    # MinHash band buckets (mirrors minhash_lsh_pairs' construction)
    sh = _shingled(docs, "doc_id", "text", 3).filter(F.size("shingles") > 0)
    hh = (
        sh.select(F.col("doc_id"), F.explode("shingles").alias("__sh"))
        .select(F.col("doc_id"), F.md5("__sh").alias("__h"))
        .select(
            F.col("doc_id"),
            F.conv(F.substring("__h", 1, 7), 16, 10).cast("long").alias("__h1"),
            F.conv(F.substring("__h", 8, 7), 16, 10).cast("long").alias("__h2"),
        )
    )
    sig = hh.groupBy("doc_id").agg(
        *[
            F.min((F.col("__h1") + F.lit(j) * F.col("__h2")) % MINHASH_P).alias(
                f"__s{j}"
            )
            for j in range(16)
        ]
    )
    rows = 4
    band_keys = [
        F.md5(
            F.concat_ws(
                "|",
                F.lit(str(bi)),
                *[F.col(f"__s{bi * rows + r}") for r in range(rows)],
            )
        )
        for bi in range(4)
    ]
    posting = sig.select(F.explode(F.array(*band_keys)).alias("band_key"))
    dist = (
        posting.groupBy("band_key")
        .count()
        .groupBy("count")
        .agg(F.count(F.lit(1)).alias("n_buckets"))
        .orderBy(F.col("count").desc())
    )
    print("minhash band bucket sizes (top):")
    dist.show(15, truncate=False)

    # SimHash chunk buckets
    s = simhash_signatures(docs, bits=32)
    parts = []
    for ci in range(4):
        cv = F.shiftright(F.col("sim"), ci * 8).bitwiseAND(F.lit(255))
        parts.append(s.select(F.lit(ci).alias("ck"), cv.alias("cv")))
    posting = parts[0]
    for p in parts[1:]:
        posting = posting.unionAll(p)
    dist = (
        posting.groupBy("ck", "cv")
        .count()
        .orderBy(F.col("count").desc())
    )
    print("simhash chunk bucket sizes (top):")
    dist.show(20, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
