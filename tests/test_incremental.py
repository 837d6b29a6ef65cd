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


class TestHllIncremental:
    def _events(self, spark, n_users=300, n_rows=3000, seed=7):
        import random

        rng = random.Random(seed)
        rows = [
            Row(day=rng.randrange(10), user=f"u{rng.randrange(n_users)}")
            for _ in range(n_rows)
        ]
        return spark.createDataFrame(rows)

    def test_estimate_close_to_exact(self, spark):
        from big_data_flight_analytics_spark.operators.incremental import (
            hll_partials,
            merge_hll_partials,
        )

        df = self._events(spark)
        part = hll_partials(df, ["day"], "user")
        est = {
            r["day"]: r["approx_distinct"]
            for r in merge_hll_partials([part], ["day"]).collect()
        }
        exact = {
            r["day"]: r["n"]
            for r in df.groupBy("day")
            .agg(F.countDistinct("user").alias("n"))
            .collect()
        }
        assert set(est) == set(exact)
        for day, n in exact.items():
            # lg_k=12 -> ~1.6% RSE; 5% is a comfortable 3-sigma bound
            assert abs(est[day] - n) <= max(3, 0.05 * n)

    def test_delta_refresh_equals_full_recompute(self, spark):
        from big_data_flight_analytics_spark.operators.incremental import (
            hll_partials,
            merge_hll_partials,
        )

        df = self._events(spark)
        hist = df.filter(F.col("day") < 7)
        delta = df.filter(F.col("day") >= 7)
        merged = merge_hll_partials(
            [hll_partials(hist, ["day"], "user"),
             hll_partials(delta, ["day"], "user")],
            ["day"],
        )
        full = merge_hll_partials(
            [hll_partials(df, ["day"], "user")], ["day"]
        )
        got = {r["day"]: r["approx_distinct"] for r in merged.collect()}
        want = {r["day"]: r["approx_distinct"] for r in full.collect()}
        assert got == want

    def test_merge_is_associative(self, spark):
        from big_data_flight_analytics_spark.operators.incremental import (
            hll_partials,
            merge_hll_partials,
        )

        df = self._events(spark)
        parts = [
            hll_partials(df.filter(F.col("day") % 3 == i), ["day"], "user")
            for i in range(3)
        ]
        flat = merge_hll_partials(parts, ["day"])
        chained = merge_hll_partials(
            [merge_hll_partials(parts[:2], ["day"]).select("day", "hll_sketch"),
             parts[2]],
            ["day"],
        )
        a = {r["day"]: r["approx_distinct"] for r in flat.collect()}
        b = {r["day"]: r["approx_distinct"] for r in chained.collect()}
        assert a == b

    def test_empty_part_list_raises(self, spark):
        import pytest

        from big_data_flight_analytics_spark.operators.incremental import (
            merge_hll_partials,
        )

        with pytest.raises(ValueError):
            merge_hll_partials([], ["day"])


class TestDedupDelta:
    """Incremental dedup-index maintenance == from-scratch rebuild."""

    @staticmethod
    def _docs(spark, lo, hi):
        # duplicate texts across the whole id range (i % 7) so delta
        # batches collide with the base corpus and with themselves
        rows = [Row(doc_id=i, text=f"doc body {i % 7} words") for i in range(lo, hi)]
        return spark.createDataFrame(rows)

    def test_updated_index_equals_rebuild(self, spark):
        from big_data_flight_analytics_spark.operators.incremental import (
            dedup_delta,
            dedup_index,
        )

        base = self._docs(spark, 0, 60)
        delta = self._docs(spark, 60, 90)
        _assign, updated = dedup_delta(dedup_index(base), delta)
        rebuilt = dedup_index(base.unionByName(delta))
        got = sorted(tuple(r) for r in updated.collect())
        want = sorted(tuple(r) for r in rebuilt.collect())
        assert got == want

    def test_assignments_match_global_canonicals(self, spark):
        from big_data_flight_analytics_spark.operators.incremental import (
            dedup_delta,
            dedup_index,
        )

        base = self._docs(spark, 0, 60)
        delta = self._docs(spark, 60, 90)
        assign, _updated = dedup_delta(dedup_index(base), delta)
        rows = assign.collect()
        assert len(rows) == 30  # one per delta doc
        rebuilt = {
            r["fingerprint"]: r["canonical_doc_id"]
            for r in dedup_index(base.unionByName(delta)).collect()
        }
        for r in rows:
            assert r["canonical_doc_id"] == rebuilt[r["fingerprint"]]
            assert r["dup_of_index"]  # every i%7 text exists in base

    def test_chained_refreshes_equal_one_shot(self, spark):
        from big_data_flight_analytics_spark.operators.incremental import (
            dedup_delta,
            dedup_index,
        )

        base = self._docs(spark, 0, 40)
        d1 = self._docs(spark, 40, 70)
        d2 = self._docs(spark, 70, 100)
        _a1, idx1 = dedup_delta(dedup_index(base), d1)
        _a2, idx2 = dedup_delta(idx1, d2)
        rebuilt = dedup_index(base.unionByName(d1).unionByName(d2))
        got = sorted(tuple(r) for r in idx2.collect())
        want = sorted(tuple(r) for r in rebuilt.collect())
        assert got == want

    def test_novel_delta_content_not_marked_index_dup(self, spark):
        from big_data_flight_analytics_spark.operators.incremental import (
            dedup_delta,
            dedup_index,
        )

        base = self._docs(spark, 0, 20)
        delta = spark.createDataFrame(
            [Row(doc_id=100, text="entirely new content"),
             Row(doc_id=101, text="entirely new content"),
             Row(doc_id=102, text="doc body 3 words")]
        )
        assign, _ = dedup_delta(dedup_index(base), delta)
        by_id = {r["doc_id"]: r for r in assign.collect()}
        assert not by_id[100]["dup_of_index"]
        assert by_id[100]["canonical_doc_id"] == 100
        assert not by_id[101]["dup_of_index"]
        assert by_id[101]["canonical_doc_id"] == 100  # delta-internal dup
        assert by_id[102]["dup_of_index"]
        assert by_id[102]["canonical_doc_id"] == 3
