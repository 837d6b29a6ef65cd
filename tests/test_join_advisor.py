"""Join-strategy advisor (a18 made actionable): the decision rule,
the sketch estimator's no-underestimate guarantee, and strategy
invariance of the executed result (j13's contract)."""

import pytest
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.operators.joins import (
    advise_join_strategy,
    estimate_semi_join,
    planned_semi_join,
)


class TestAdviseJoinStrategy:
    """The pure rule against its documented thresholds."""

    def test_small_key_side_broadcasts(self):
        assert (
            advise_join_strategy(100, 10**9, 10**9, broadcast_max_rows=1000)
            == "broadcast"
        )

    def test_selective_big_key_side_blooms(self):
        # keys too big to broadcast, estimate sheds > half the fact
        assert (
            advise_join_strategy(
                5000, 400, 1000, broadcast_max_rows=1000
            )
            == "bloom_semi_join"
        )

    def test_non_selective_big_key_side_shuffles(self):
        assert (
            advise_join_strategy(
                5000, 900, 1000, broadcast_max_rows=1000
            )
            == "shuffle"
        )

    def test_boundary_errs_toward_shuffle(self):
        # CMS overestimates, so exactly-at-threshold stays bloom but one
        # past it shuffles — the conservative side of the bound
        assert (
            advise_join_strategy(5000, 500, 1000, broadcast_max_rows=1000)
            == "bloom_semi_join"
        )
        assert (
            advise_join_strategy(5000, 501, 1000, broadcast_max_rows=1000)
            == "shuffle"
        )


@pytest.fixture()
def skewed(spark):
    """k2-style: most fact rows collapse onto hot key 1, which is NOT
    in the key set — the bloom regime's home turf."""
    fact = spark.range(0, 2000).select(
        F.when(F.col("id") % 5 != 0, F.lit(1))
        .otherwise(F.col("id"))
        .alias("k"),
        (F.col("id") % 7).alias("v"),
    )
    keys = spark.range(0, 2000).filter(F.col("id") % 5 == 0).select(
        F.col("id").alias("kk")
    )
    return fact, keys


class TestEstimateSemiJoin:
    def test_estimate_never_underestimates(self, spark, skewed):
        fact, keys = skewed
        n_keys, est, n_fact = estimate_semi_join(fact, "k", keys, "kk")
        true_match = fact.join(
            keys.withColumnRenamed("kk", "k").distinct(), "k", "left_semi"
        ).count()
        assert n_fact == 2000
        assert n_keys == 400
        assert est >= true_match  # CMS collisions only ADD


class TestPlannedSemiJoin:
    def _truth(self, fact, keys):
        return sorted(
            (r["k"], r["v"])
            for r in fact.join(
                keys.withColumnRenamed("kk", "k").distinct(),
                "k",
                "left_semi",
            ).collect()
        )

    def test_each_regime_selected_and_result_invariant(self, spark, skewed):
        fact, keys = skewed
        truth = self._truth(fact, keys)
        # broadcast: key side under the threshold
        out, strat = planned_semi_join(
            fact, "k", keys, "kk", broadcast_max_rows=1000
        )
        assert strat == "broadcast"
        assert sorted((r["k"], r["v"]) for r in out.collect()) == truth
        # bloom: keys over threshold, hot key absent -> selective
        out, strat = planned_semi_join(
            fact, "k", keys, "kk", broadcast_max_rows=100
        )
        assert strat == "bloom_semi_join"
        assert sorted((r["k"], r["v"]) for r in out.collect()) == truth
        # shuffle: make the join non-selective (every fact row matches)
        dense_keys = spark.range(0, 2000).select(F.col("id").alias("kk")).union(
            spark.createDataFrame([(1,)], "kk long")
        )
        out, strat = planned_semi_join(
            fact, "k", dense_keys, "kk", broadcast_max_rows=100
        )
        assert strat == "shuffle"
        assert sorted((r["k"], r["v"]) for r in out.collect()) == self._truth(
            fact, dense_keys
        )

    def test_broadcast_regime_plan_is_broadcast(self, spark, skewed):
        fact, keys = skewed
        out, strat = planned_semi_join(
            fact, "k", keys, "kk", broadcast_max_rows=1000
        )
        assert strat == "broadcast"
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
