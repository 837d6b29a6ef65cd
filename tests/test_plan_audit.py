"""Regression tests for tools/plan_audit.py's cached-build elision.

The audit is the honesty instrument for shuffle/join counts; its dedup
key must (a) still elide re-prints of the SAME cache (executedPlan
re-prints a cached relation's build subtree at every reference — a
12-shuffle query once audited as 191) while (b) keeping two genuinely
DISTINCT cached builds that differ only in which columns they read as
separate audit entries (ADVICE r9: the previous all-identifiers->@ key
collapsed them, under-counting shuffles).
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from plan_audit import audit  # noqa: E402


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestCachedBuildElision:
    def test_same_cache_referenced_twice_counted_once(self, spark):
        base = spark.range(100).withColumn("g", F.col("id") % 7)
        agg = base.groupBy("g").agg(F.sum("id").alias("s")).cache()
        try:
            agg.count()
            joined = agg.join(
                agg.withColumnRenamed("s", "s2"), "g"
            )
            info, errors = audit("same_cache", _executed(joined))
            assert errors == []
            # one aggregation shuffle from the single shared build —
            # NOT doubled by the re-print at the second reference
            # (both the AQE final and initial plan print one Exchange
            # each inside the one kept subtree)
            assert info["shuffles"] <= 2
        finally:
            agg.unpersist()

    def test_distinct_builds_differing_only_in_columns_counted_separately(
        self, spark, tmp_path
    ):
        p = str(tmp_path / "t.parquet")
        spark.range(100).select(
            F.col("id").alias("k"),
            (F.col("id") % 5).alias("a"),
            (F.col("id") % 9).alias("b"),
        ).write.parquet(p)
        t = spark.read.parquet(p)
        # identical operator skeletons; the ONLY difference is the
        # column each build reads/aggregates — genuinely different data
        ca = t.groupBy("a").agg(F.count("*").alias("n")).cache()
        cb = t.groupBy("b").agg(F.count("*").alias("n")).cache()
        try:
            ca.count()
            cb.count()
            both = ca.select(F.col("a").alias("g"), "n").unionByName(
                cb.select(F.col("b").alias("g"), "n")
            )
            plan = _executed(both)
            assert plan.count("InMemoryRelation") == 2
            info, _ = audit("distinct_builds", plan)
            # each build contributes its own aggregation Exchange; the
            # old all-@ key collapsed the second subtree to zero
            assert info["shuffles"] >= 2
        finally:
            ca.unpersist()
            cb.unpersist()
