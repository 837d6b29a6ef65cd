"""One-off: inspect LSH bucket-size distributions to pick skew caps.

Usage: python tools/bucket_dist.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from big_data_flight_analytics_spark.operators.dedup import (  # noqa: E402
    _minhash_signature,
    _shingled,
    simhash_signatures,
)
from big_data_flight_analytics_spark.plans.tables import load  # noqa: E402
from big_data_flight_analytics_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session(app_name="bucket_dist")
    docs = load(spark, sf_dir, "documents")

    # MinHash band buckets
    sh = _shingled(docs, "doc_id", "text", 3).filter(F.size("shingles") > 0)
    sig = sh.select("doc_id", _minhash_signature(F.col("shingles"), 16).alias("sig"))
    rows = 4
    parts = []
    for bi in range(4):
        key = F.md5(
            F.concat_ws(
                "|",
                F.lit(str(bi)),
                *[F.element_at("sig", bi * rows + r + 1) for r in range(rows)],
            )
        )
        parts.append(sig.select(key.alias("band_key")))
    posting = parts[0]
    for p in parts[1:]:
        posting = posting.unionAll(p)
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
