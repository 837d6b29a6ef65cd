"""Incremental aggregate maintenance: algebraic merge equivalences."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.operators.incremental import (
    merge_partial_aggregates,
    partial_aggregate,
)

def PARTIALS():
    # built lazily: PySpark column expressions need an active session
    return {
        "__n": F.count(F.lit(1)),
        "__sum": F.sum(F.col("v").cast("decimal(18,2)")),
        "__min": F.min("v"),
        "__max": F.max("v"),
    }


def COMBINE():
    return {
        "n": F.sum("__n"),
        "total": F.round(F.sum("__sum"), 2).cast("double"),
        "vmin": F.min("__min"),
        "vmax": F.max("__max"),
    }


def _facts(spark):
    rows = [
        Row(i=i, k=f"k{i % 4}", v=round(0.01 * (i * 37 % 1000), 2))
        for i in range(400)
    ]
    return spark.createDataFrame(rows)


def _direct(df):
    return sorted(
        tuple(r)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("v").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total"),
            F.min("v").alias("vmin"),
            F.max("v").alias("vmax"),
        )
        .collect()
    )


class TestIncrementalMerge:
    def test_merged_partials_equal_full_aggregate(self, spark):
        facts = _facts(spark)
        parts = [
            partial_aggregate(
                facts.filter(F.col("i") % 3 == i), ["k"], PARTIALS()
            )
            for i in range(3)
        ]
        got = sorted(
            tuple(r)
            for r in merge_partial_aggregates(parts, ["k"], COMBINE()).collect()
        )
        assert got == _direct(facts)

    def test_refresh_chaining_is_associative(self, spark):
        """merge(merge(a,b), c) == merge(a,b,c): any refresh cadence
        yields the same state. The chained path re-partials the merged
        frame (its columns are the partial shape again)."""
        facts = _facts(spark)
        a, b, c = (
            partial_aggregate(
                facts.filter(F.col("i") % 3 == i), ["k"], PARTIALS()
            )
            for i in range(3)
        )
        ab = merge_partial_aggregates(
            [a, b],
            ["k"],
            combine={
                "__n": F.sum("__n"),
                "__sum": F.sum("__sum"),
                "__min": F.min("__min"),
                "__max": F.max("__max"),
            },
        )
        chained = sorted(
            tuple(r)
            for r in merge_partial_aggregates([ab, c], ["k"], COMBINE()).collect()
        )
        flat = sorted(
            tuple(r)
            for r in merge_partial_aggregates(
                [a, b, c], ["k"], COMBINE()
            ).collect()
        )
        assert chained == flat

    def test_empty_delta_is_identity(self, spark):
        facts = _facts(spark)
        full = partial_aggregate(facts, ["k"], PARTIALS())
        empty = partial_aggregate(
            facts.filter(F.lit(False)), ["k"], PARTIALS()
        )
        with_empty = sorted(
            tuple(r)
            for r in merge_partial_aggregates(
                [full, empty], ["k"], COMBINE()
            ).collect()
        )
        alone = sorted(
            tuple(r)
            for r in merge_partial_aggregates([full], ["k"], COMBINE()).collect()
        )
        assert with_empty == alone == _direct(facts)
