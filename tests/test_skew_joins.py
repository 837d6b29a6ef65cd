"""Skew-mitigation and semi/anti join primitives."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.operators.core import group_count
from big_data_flight_analytics_spark.operators.joins import anti_join, semi_join
from big_data_flight_analytics_spark.operators.skew import (
    salted_broadcast_join,
    salted_group_agg,
    salted_group_count,
)


def skewed_df(spark):
    # one hot key (90%) + tail keys
    rows = [Row(k="hot", v=float(i)) for i in range(900)]
    rows += [Row(k=f"cold{i % 10}", v=float(i)) for i in range(100)]
    return spark.createDataFrame(rows).repartition(8)


class TestSaltedAgg:
    def test_salted_count_equals_plain(self, spark):
        df = skewed_df(spark)
        plain = {r["k"]: r["cnt"] for r in group_count(df, ["k"]).collect()}
        salted = {r["k"]: r["cnt"] for r in salted_group_count(df, ["k"]).collect()}
        assert plain == salted

    def test_salted_general_agg_equals_plain(self, spark):
        df = skewed_df(spark)
        plain = {
            (r["k"]): (r["n"], r["s"], r["mn"])
            for r in df.groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
                 F.min("v").alias("mn"))
            .collect()
        }
        salted = {
            (r["k"]): (r["n"], r["s"], r["mn"])
            for r in salted_group_agg(
                df, ["k"],
                partial_aggs={"__n": F.count(F.lit(1)), "__s": F.sum("v"),
                              "__mn": F.min("v")},
                combine_aggs={"n": F.sum("__n"), "s": F.sum("__s"),
                              "mn": F.min("__mn")},
            ).collect()
        }
        assert plain == salted


class TestSaltedJoin:
    def test_salted_join_equals_plain(self, spark):
        fact = skewed_df(spark)
        dim = spark.createDataFrame(
            [Row(k="hot", name="H")] + [Row(k=f"cold{i}", name=f"C{i}") for i in range(10)]
        )
        plain = fact.join(dim, "k", "left").groupBy("name").count()
        salted = salted_broadcast_join(fact, dim, "k").groupBy("name").count()
        assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}

    def test_outer_modes_rejected(self, spark):
        # the dim side is replicated per salt value: right/full outer
        # would emit unmatched dim rows salt_buckets times
        import pytest

        fact = skewed_df(spark)
        dim = spark.createDataFrame([Row(k="hot", name="H")])
        for how in ("right", "full", "outer"):
            with pytest.raises(ValueError, match="inner.*left"):
                salted_broadcast_join(fact, dim, "k", how=how)


class TestSemiAnti:
    def test_semi_plus_anti_partitions_fact(self, spark):
        fact = spark.createDataFrame([Row(id=i) for i in range(10)])
        other = spark.createDataFrame([Row(fid=i) for i in (2, 4, 6, 99)])
        semi = semi_join(fact, other, "id", "fid")
        anti = anti_join(fact, other, "id", "fid")
        s = {r["id"] for r in semi.collect()}
        a = {r["id"] for r in anti.collect()}
        assert s == {2, 4, 6}
        assert s | a == set(range(10)) and not (s & a)

    def test_semi_never_duplicates(self, spark):
        fact = spark.createDataFrame([Row(id=1)])
        other = spark.createDataFrame([Row(fid=1), Row(fid=1), Row(fid=1)])
        assert semi_join(fact, other, "id", "fid").count() == 1
