"""Unit semantics for the temporal operators (as-of join,
sessionization) and the IVF ANN operator."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
)
from big_data_flight_analytics_spark.operators.temporal import (
    asof_join,
    session_stats,
    sessionize,
)


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


class TestAsofJoin:
    def _run(self, spark, left_rows, right_rows):
        left = spark.createDataFrame(left_rows, "eid long, k long, t timestamp")
        right = spark.createDataFrame(right_rows, "k long, rt timestamp, rid long, v double")
        out = asof_join(
            left,
            right,
            on="k",
            left_time="t",
            right_time="rt",
            payload={"rid": "asof_rid", "v": "asof_v"},
            right_tie="rid",
        )
        return {r["eid"]: (r["asof_rid"], r["asof_v"]) for r in out.collect()}

    def test_most_recent_prior_row_wins(self, spark):
        got = self._run(
            spark,
            [(1, 7, ts("2024-01-10T00:00:00"))],
            [
                (7, ts("2024-01-01T00:00:00"), 100, 1.0),
                (7, ts("2024-01-05T00:00:00"), 200, 2.0),
                (7, ts("2024-01-11T00:00:00"), 300, 3.0),
            ],
        )
        assert got[1] == (200, 2.0)

    def test_inclusive_and_tie_break(self, spark):
        # equal timestamps: the right row matches (inclusive), and among
        # equal-time right rows the largest tie id wins
        got = self._run(
            spark,
            [(1, 7, ts("2024-01-05T00:00:00"))],
            [
                (7, ts("2024-01-05T00:00:00"), 100, 1.0),
                (7, ts("2024-01-05T00:00:00"), 200, 2.0),
            ],
        )
        assert got[1] == (200, 2.0)

    def test_no_prior_row_yields_nulls(self, spark):
        got = self._run(
            spark,
            [(1, 7, ts("2024-01-01T00:00:00")), (2, 8, ts("2024-01-09T00:00:00"))],
            [(7, ts("2024-01-02T00:00:00"), 100, 1.0)],
        )
        assert got[1] == (None, None)  # right row is later
        assert got[2] == (None, None)  # key never appears on the right

    def test_keys_do_not_leak_across_partitions(self, spark):
        got = self._run(
            spark,
            [(1, 7, ts("2024-01-10T00:00:00")), (2, 8, ts("2024-01-10T00:00:00"))],
            [
                (7, ts("2024-01-01T00:00:00"), 100, 1.0),
                (8, ts("2024-01-02T00:00:00"), 200, 2.0),
            ],
        )
        assert got[1] == (100, 1.0)
        assert got[2] == (200, 2.0)


class TestSessionize:
    ROWS = [
        # user 1: two sessions split by a 31-min gap; second has 2 events
        (1, 1, ts("2024-01-01T00:00:00")),
        (1, 2, ts("2024-01-01T00:10:00")),
        (1, 3, ts("2024-01-01T00:41:00")),
        (1, 4, ts("2024-01-01T01:10:00")),
        # user 2: single event
        (2, 5, ts("2024-01-01T00:00:00")),
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            self.ROWS, "user_id long, event_id long, t timestamp"
        )

    def test_gap_strictly_greater_splits(self, spark):
        out = sessionize(self._df(spark), "user_id", "t", 1800, "event_id")
        idx = {r["event_id"]: r["session_idx"] for r in out.collect()}
        assert idx == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}

    def test_exact_gap_does_not_split(self, spark):
        rows = [
            (1, 1, ts("2024-01-01T00:00:00")),
            (1, 2, ts("2024-01-01T00:30:00")),  # exactly 1800s later
        ]
        df = spark.createDataFrame(rows, "user_id long, event_id long, t timestamp")
        out = sessionize(df, "user_id", "t", 1800, "event_id")
        assert {r["session_idx"] for r in out.collect()} == {1}

    def test_session_stats(self, spark):
        out = session_stats(self._df(spark), "user_id", "t", 1800, "event_id")
        by_key = {(r["user_id"], r["session_idx"]): r for r in out.collect()}
        assert by_key[(1, 1)]["n_events"] == 2
        assert by_key[(1, 2)]["n_events"] == 2
        assert by_key[(1, 2)]["duration_us"] == 29 * 60 * 1_000_000
        assert by_key[(2, 1)]["n_events"] == 1
        assert by_key[(2, 1)]["duration_us"] == 0


class TestIvfTopk:
    def test_probe_all_cells_matches_brute_force(self, spark):
        # with nprobe == n_centroids every candidate cell is probed, so
        # IVF degrades to exact search — results must equal brute force
        import random

        rng = random.Random(7)
        rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        q = emb.filter(F.col("vec_id") < 3)
        exact = {
            (r["query_id"], r["rnk"]): r["neighbor_id"]
            for r in brute_force_topk(emb, q, k=2)
            .withColumn(
                "rnk",
                F.row_number().over(
                    Window.partitionBy("query_id")
                    .orderBy(F.col("sim").desc(), F.col("neighbor_id"))
                ),
            )
            .collect()
        }
        approx = {
            (r["query_id"], r["rnk"]): r["neighbor_id"]
            for r in ivf_topk(emb, q, k=2, n_centroids=4, nprobe=4)
            .withColumn(
                "rnk",
                F.row_number().over(
                    Window.partitionBy("query_id")
                    .orderBy(F.col("sim").desc(), F.col("neighbor_id"))
                ),
            )
            .collect()
        }
        assert approx == exact

    def test_nprobe_restricts_candidates(self, spark):
        import random

        rng = random.Random(7)
        rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        q = emb.filter(F.col("vec_id") < 3)
        out = ivf_topk(emb, q, k=2, n_centroids=8, nprobe=1).collect()
        # every query still produces results, bounded by k
        per_q = {}
        for r in out:
            per_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
        assert set(per_q) == {0, 1, 2}
        assert all(len(v) <= 2 for v in per_q.values())


class TestIntervalJoin:
    def _data(self, spark):
        facts = spark.createDataFrame(
            [(1, ts("2024-01-05T12:00:00")), (2, ts("2024-01-10T00:00:00")),
             (3, ts("2024-02-01T00:00:00")), (4, ts("2024-01-07T23:59:59"))],
            "fid long, t timestamp",
        )
        iv = spark.createDataFrame(
            [("a", ts("2024-01-01T00:00:00"), ts("2024-01-07T23:59:59")),
             ("b", ts("2024-01-06T00:00:00"), ts("2024-01-15T00:00:00"))],
            "name string, iv_start timestamp, iv_end timestamp",
        )
        return facts, iv

    def test_membership_and_inclusive_bounds(self, spark):
        from big_data_flight_analytics_spark.operators.intervals import interval_join

        facts, iv = self._data(spark)
        got = {
            (r["fid"], r["name"])
            for r in interval_join(facts, iv, "t", use_grain=True).collect()
        }
        # fid 4 hits interval a's exact end bound (inclusive) and b
        assert got == {(1, "a"), (2, "b"), (4, "a"), (4, "b")}

    def test_grain_equals_broadcast(self, spark):
        from big_data_flight_analytics_spark.operators.intervals import interval_join

        facts, iv = self._data(spark)
        a = {(r["fid"], r["name"])
             for r in interval_join(facts, iv, "t", use_grain=True).collect()}
        b = {(r["fid"], r["name"])
             for r in interval_join(facts, iv, "t", use_grain=False).collect()}
        assert a == b


class TestGlobalRanks:
    def test_matches_unpartitioned_window(self, spark):
        from big_data_flight_analytics_spark.operators.ranks import (
            global_row_numbers,
        )

        import random
        rng = random.Random(5)
        rows = [(i, rng.uniform(-100, 100)) for i in range(137)]
        df = spark.createDataFrame(rows, "id long, v double")
        got = {r["id"]: r["rn"]
               for r in global_row_numbers(df, ["v", "id"]).collect()}
        w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
        want = {r["id"]: r["rn"]
                for r in df.withColumn("rn", F.row_number().over(w)).collect()}
        assert got == want

    def test_ntile_formula_matches_native(self, spark):
        from big_data_flight_analytics_spark.operators.ranks import ntile_from_rn

        # uneven split (n=7, buckets=4 -> sizes 2,2,2,1) and n < buckets
        for n, buckets in ((7, 4), (3, 4), (8, 4), (1, 4)):
            df = spark.createDataFrame([(i,) for i in range(1, n + 1)], "id long")
            w = Window.orderBy("id")
            native = {r["id"]: r["nt"]
                      for r in df.withColumn("nt", F.ntile(buckets).over(w)).collect()}
            formula = {
                r["id"]: r["nt"]
                for r in df.select(
                    "id",
                    ntile_from_rn(F.col("id"), F.lit(n), buckets).alias("nt"),
                ).collect()
            }
            assert formula == native, (n, buckets)


class TestScd2Merge:
    def _current(self, spark):
        return spark.createDataFrame(
            [
                # k=1: open BUILDING since 100; k=2: closed history + open
                (1, "BUILDING", 100, None, True),
                (2, "AUTO", 0, 50, False),
                (2, "MACHINE", 50, None, True),
                (3, "FURNITURE", 100, None, True),
            ],
            "k long, segment string, valid_from_us long, valid_to_us long, is_current boolean",
        )

    def _merge(self, spark, updates):
        from big_data_flight_analytics_spark.operators.scd import scd2_merge

        upd = spark.createDataFrame(updates, "k long, segment string, ts long")
        return scd2_merge(
            self._current(spark), upd, key="k", attr="segment", update_ts_us="ts"
        ).collect()

    def test_change_closes_and_opens(self, spark):
        rows = self._merge(spark, [(1, "STEEL", 200)])
        k1 = sorted(
            [r for r in rows if r["k"] == 1],
            key=lambda r: (r["valid_from_us"]),
        )
        assert [(r["segment"], r["valid_from_us"], r["valid_to_us"], r["is_current"])
                for r in k1] == [("BUILDING", 100, 200, False), ("STEEL", 200, None, True)]
        # untouched keys keep exactly their rows
        assert len([r for r in rows if r["k"] == 2]) == 2
        assert len([r for r in rows if r["k"] == 3]) == 1

    def test_same_attr_update_is_noop(self, spark):
        rows = self._merge(spark, [(1, "BUILDING", 200)])
        assert len([r for r in rows if r["k"] == 1]) == 1

    def test_stale_update_ignored(self, spark):
        # update older than the open version's valid_from -> no change
        rows = self._merge(spark, [(1, "STEEL", 50)])
        k1 = [r for r in rows if r["k"] == 1]
        assert len(k1) == 1 and k1[0]["segment"] == "BUILDING"

    def test_history_rows_untouched(self, spark):
        rows = self._merge(spark, [(2, "PLASTIC", 300)])
        k2 = sorted([r for r in rows if r["k"] == 2],
                    key=lambda r: r["valid_from_us"])
        assert [(r["segment"], r["valid_to_us"]) for r in k2] == [
            ("AUTO", 50), ("MACHINE", 300), ("PLASTIC", None)
        ]


class TestIntervalJoinInverted:
    def test_inverted_interval_empty_in_both_modes(self, spark):
        from big_data_flight_analytics_spark.operators.intervals import interval_join

        facts = spark.createDataFrame(
            [(1, ts("2024-01-05T00:00:00"))], "fid long, t timestamp"
        )
        iv = spark.createDataFrame(
            [("bad", ts("2024-01-10T00:00:00"), ts("2024-01-01T00:00:00"))],
            "name string, iv_start timestamp, iv_end timestamp",
        )
        # grain mode must not crash on sequence(start > end) and must
        # agree with broadcast mode that an inverted interval is empty
        assert interval_join(facts, iv, "t", use_grain=True).count() == 0
        assert interval_join(facts, iv, "t", use_grain=False).count() == 0


class TestIvfEdgeCases:
    def test_empty_query_set(self, spark):
        emb = spark.createDataFrame(
            [(i, [float(i), 1.0]) for i in range(10)],
            "vec_id long, embedding array<float>",
        )
        out = ivf_topk(emb, emb.filter("vec_id < 0"), k=2, n_centroids=4, nprobe=2)
        assert out.count() == 0

    def test_corpus_smaller_than_centroids(self, spark):
        emb = spark.createDataFrame(
            [(i, [float(i + 1), 1.0]) for i in range(3)],
            "vec_id long, embedding array<float>",
        )
        out = ivf_topk(emb, emb, k=2, n_centroids=16, nprobe=16).collect()
        assert {r["query_id"] for r in out} == {0, 1, 2}


class TestGapFill:
    def _df(self, spark):
        import datetime as dt

        rows = [
            # u1: observations in buckets 0, 3 (gap at 1, 2)
            (1, "u1", dt.datetime(2024, 1, 1, 0, 30), 10.0),
            (2, "u1", dt.datetime(2024, 1, 1, 3, 10), 40.0),
            # u1 second observation in bucket 0: later ts wins
            (3, "u1", dt.datetime(2024, 1, 1, 0, 45), 11.0),
            # u2: single observation -> single-bucket grid
            (4, "u2", dt.datetime(2024, 1, 1, 2, 5), 7.0),
        ]
        return spark.createDataFrame(
            rows, "event_id long, user_id string, ts timestamp, value double"
        )

    def test_locf_and_grid(self, spark):
        from big_data_flight_analytics_spark.operators.temporal import gap_fill

        out = {
            (r["user_id"], r["bucket_start_s"]): (r["value"], r["is_observed"])
            for r in gap_fill(self._df(spark), step_s=3600).collect()
        }
        base = 1704067200  # 2024-01-01 00:00 UTC epoch seconds
        assert out == {
            ("u1", base + 0): (11.0, True),      # later obs in bucket wins
            ("u1", base + 3600): (11.0, False),  # filled
            ("u1", base + 7200): (11.0, False),  # filled
            ("u1", base + 10800): (40.0, True),
            ("u2", base + 7200): (7.0, True),
        }

    def test_tie_breaks_on_event_id(self, spark):
        import datetime as dt

        from big_data_flight_analytics_spark.operators.temporal import gap_fill

        rows = [
            (5, "u", dt.datetime(2024, 1, 1, 0, 0), 1.0),
            (9, "u", dt.datetime(2024, 1, 1, 0, 0), 2.0),  # same ts, higher id
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id string, ts timestamp, value double"
        )
        (row,) = gap_fill(df, step_s=3600).collect()
        assert row["value"] == 2.0 and row["is_observed"] is True

    def test_no_unpartitioned_window(self, spark):
        from big_data_flight_analytics_spark.operators.temporal import gap_fill

        plan = (
            gap_fill(self._df(spark), step_s=3600)
            ._jdf.queryExecution().executedPlan().toString()
        )
        import re

        # every window spec carries a partition key
        assert not re.search(r"windowspecdefinition\((?!user_id)", plan)

    def test_linear_interpolation(self, spark):
        import datetime as dt

        from big_data_flight_analytics_spark.operators.temporal import gap_fill

        rows = [
            (1, "u", dt.datetime(2024, 1, 1, 0, 30), 10.0),
            (2, "u", dt.datetime(2024, 1, 1, 3, 10), 40.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id string, ts timestamp, value double"
        )
        out = {
            r["bucket_start_s"]: (r["value"], r["is_observed"])
            for r in gap_fill(df, step_s=3600, method="linear").collect()
        }
        base = 1704067200
        # buckets 0..3; gaps at 1,2 interpolate 10 -> 40 linearly
        assert out == {
            base + 0: (10.0, True),
            base + 3600: (20.0, False),
            base + 7200: (30.0, False),
            base + 10800: (40.0, True),
        }

    def test_bad_method_raises(self, spark):
        import pytest as _pytest

        from big_data_flight_analytics_spark.operators.temporal import gap_fill

        with _pytest.raises(ValueError):
            gap_fill(self._df(spark), method="cubic")


class TestRollingZscore:
    @staticmethod
    def _df(spark):
        from pyspark.sql import Row

        # one key with a stable run then a spike; one constant key
        rows = [Row(k="a", t=i, v=100) for i in range(5)]
        rows[3] = Row(k="a", t=3, v=104)  # mild variance in the trail
        rows.append(Row(k="a", t=5, v=500))  # spike
        rows += [Row(k="b", t=i, v=7) for i in range(4)]  # zero variance
        return spark.createDataFrame(rows)

    def test_spike_scores_high_and_trail_excludes_current(self, spark):
        from big_data_flight_analytics_spark.operators.temporal import (
            rolling_zscore,
        )

        out = rolling_zscore(
            self._df(spark), key="k", order=["t"], int_value_col="v",
            window=5, min_periods=3,
        )
        by = {(r["k"], r["t"]): r["zscore"] for r in out.collect()}
        # trail of t=5 is [100,100,100,104,100]: mean 100.8, std 1.6
        assert by[("a", 5)] == round((500 - 100.8) / 1.6, 6)
        # fewer than min_periods trailing rows -> NULL
        assert by[("a", 0)] is None and by[("a", 2)] is None
        # zero-variance trail -> NULL, not inf
        assert by[("b", 3)] is None

    def test_one_shuffle_plan(self, spark):
        from big_data_flight_analytics_spark.operators.temporal import (
            rolling_zscore,
        )

        out = rolling_zscore(
            self._df(spark), key="k", order=["t"], int_value_col="v"
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1


class TestApplyChanges:
    @staticmethod
    def _frames(spark):
        from pyspark.sql import Row

        base = spark.createDataFrame(
            [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
        )
        changes = spark.createDataFrame(
            [
                Row(k=2, op="U", v="b1", seq=1),
                Row(k=2, op="U", v="b2", seq=2),   # last writer wins
                Row(k=3, op="D", v=None, seq=1),   # delete
                Row(k=4, op="I", v="new", seq=1),  # insert (absent in base)
                Row(k=5, op="I", v="x", seq=1),
                Row(k=5, op="D", v=None, seq=2),   # inserted then deleted
            ]
        )
        return base, changes

    def test_merge_semantics(self, spark):
        from big_data_flight_analytics_spark.operators.scd import apply_changes

        base, changes = self._frames(spark)
        out = apply_changes(base, changes, key="k", seq=["seq"], payload=["v"])
        got = {(r["k"], r["v"]) for r in out.collect()}
        assert got == {(1, "a"), (2, "b2"), (4, "new")}

    def test_delete_then_reinsert_survives(self, spark):
        from pyspark.sql import Row

        from big_data_flight_analytics_spark.operators.scd import apply_changes

        base = spark.createDataFrame([Row(k=1, v="a")])
        changes = spark.createDataFrame(
            [Row(k=1, op="D", v=None, seq=1), Row(k=1, op="I", v="a2", seq=2)]
        )
        out = apply_changes(base, changes, key="k", seq=["seq"], payload=["v"])
        assert [(r["k"], r["v"]) for r in out.collect()] == [(1, "a2")]


class TestRollingZscoreOverflowGuard:
    def test_raises_instead_of_wrapping(self, spark):
        # cents ~1e7 over a few hundred rows: ss passes 2^62 / n but
        # n*ss does not — the regime where int64 var_num would wrap
        # silently without the in-plan bound
        import pytest as _pytest
        from pyspark.sql import Row

        from big_data_flight_analytics_spark.operators.temporal import (
            rolling_zscore,
        )

        rows = [Row(k="a", t=i, v=10_000_000 + i) for i in range(300)]
        out = rolling_zscore(
            spark.createDataFrame(rows), key="k", order=["t"],
            int_value_col="v", window=None, min_periods=3,
        )
        with _pytest.raises(Exception, match="exceeds 2\\^62"):
            out.collect()

    def test_guard_is_inert_below_bound(self, spark):
        from pyspark.sql import Row

        from big_data_flight_analytics_spark.operators.temporal import (
            rolling_zscore,
        )

        rows = [Row(k="a", t=i, v=1_000_000) for i in range(100)]
        out = rolling_zscore(
            spark.createDataFrame(rows), key="k", order=["t"],
            int_value_col="v", window=None, min_periods=3,
        )
        assert out.count() == 100


class TestRunningZscoreOverflowGuard:
    def test_streaming_guard_bounds_the_product(self):
        # drive the state function directly (no stream needed): the
        # guard must trip on n*ss, not ss alone
        import pandas as pd
        import pytest as _pytest

        from big_data_flight_analytics_spark.streaming.stateful import (
            _make_running_zscore,
        )

        class FakeState:
            exists = False
            get = None

            def update(self, v):
                pass

        fn = _make_running_zscore(3)
        big = pd.DataFrame(
            {
                "user_id": [1] * 300,
                "event_id": range(300),
                "event_us": range(300),
                "cents": [10_000_000] * 300,
            }
        )
        with _pytest.raises(OverflowError, match="n \\* expanding"):
            list(fn((1,), [big], FakeState()))


class TestOhlcBars:
    """ts4: OHLC resampling — deterministic endpoint selection,
    single-observation buckets, null exclusion."""

    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, event_type string, ts timestamp, value double"
        )

    def test_endpoints_and_extremes(self, spark):
        from datetime import datetime

        from big_data_flight_analytics_spark.operators.temporal import (
            ohlc_bars,
        )

        t = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
        rows = [
            (1, "a", t(0), 5.0),   # open
            (2, "a", t(10), 9.0),  # high
            (3, "a", t(20), 1.0),  # low
            (4, "a", t(30), 4.0),  # close
        ]
        got = ohlc_bars(self._ev(spark, rows), step_s=60).collect()
        assert len(got) == 1
        r = got[0]
        assert (r["open"], r["high"], r["low"], r["close"], r["n_obs"]) == (
            5.0, 9.0, 1.0, 4.0, 4,
        )

    def test_same_timestamp_ties_break_on_event_id(self, spark):
        from datetime import datetime

        from big_data_flight_analytics_spark.operators.temporal import (
            ohlc_bars,
        )

        ts = datetime(2024, 1, 1)
        rows = [(2, "a", ts, 7.0), (1, "a", ts, 3.0), (3, "a", ts, 5.0)]
        r = ohlc_bars(self._ev(spark, rows), step_s=60).collect()[0]
        assert r["open"] == 3.0 and r["close"] == 5.0  # ids 1 and 3

    def test_single_observation_bucket_collapses(self, spark):
        from datetime import datetime

        from big_data_flight_analytics_spark.operators.temporal import (
            ohlc_bars,
        )

        rows = [(1, "a", datetime(2024, 1, 1), 2.5)]
        r = ohlc_bars(self._ev(spark, rows), step_s=60).collect()[0]
        assert r["open"] == r["high"] == r["low"] == r["close"] == 2.5
        assert r["n_obs"] == 1

    def test_null_values_are_excluded(self, spark):
        from datetime import datetime

        from big_data_flight_analytics_spark.operators.temporal import (
            ohlc_bars,
        )

        rows = [
            (1, "a", datetime(2024, 1, 1), None),
            (2, "a", datetime(2024, 1, 1, 0, 0, 5), 1.0),
        ]
        r = ohlc_bars(self._ev(spark, rows), step_s=60).collect()[0]
        assert r["open"] == 1.0 and r["n_obs"] == 1


class TestSessionFold:
    """i11: incremental sessionization — time-split fold == from
    scratch, boundary-merge semantics, no-cascade guarantee."""

    def _events(self, spark, rows):
        from datetime import datetime, timedelta

        base = datetime(2024, 5, 1)
        return spark.createDataFrame(
            [
                (eid, key, base + timedelta(seconds=sec))
                for eid, key, sec in rows
            ],
            "event_id long, user_id long, ts timestamp",
        )

    def _sessions(self, df, gap=60):
        from big_data_flight_analytics_spark.operators.temporal import (
            session_stats,
        )

        return session_stats(
            df, key_col="user_id", ts_col="ts", gap_seconds=gap,
            tie_col="event_id",
        ).select("user_id", "start_us", "end_us", "n_events")

    def _key(self, df):
        return {
            (r["user_id"], r["session_idx"]): (
                r["n_events"], r["start_us"], r["end_us"], r["duration_us"]
            )
            for r in df.collect()
        }

    def _scratch_key(self, spark, df, gap=60):
        from big_data_flight_analytics_spark.operators.temporal import (
            session_stats,
        )

        full = session_stats(
            df, key_col="user_id", ts_col="ts", gap_seconds=gap,
            tie_col="event_id",
        ).select(
            "user_id", "session_idx", "n_events", "start_us", "end_us",
            "duration_us",
        )
        return self._key(full)

    def test_any_time_cut_folds_to_from_scratch(self, spark):
        import random

        from big_data_flight_analytics_spark.operators.temporal import (
            session_fold,
        )
        from pyspark.sql import functions as FF

        rng = random.Random(71)
        rows = [
            (i, rng.randint(1, 6), rng.randint(0, 3000))
            for i in range(300)
        ]
        df = self._events(spark, rows)
        want = self._scratch_key(spark, df)
        for cut_s in (500, 1500, 2900):
            cut_us = None
            a = df.filter(
                FF.unix_micros(FF.col("ts").cast("timestamp"))
                <= 1_000_000 * (1714521600 + cut_s)  # 2024-05-01 UTC
            )
            b = df.exceptAll(a)
            folded = session_fold(
                self._sessions(a), self._sessions(b), "user_id", 60
            )
            assert self._key(folded) == want, f"cut at {cut_s}s"

    def test_boundary_sessions_merge_and_distant_ones_do_not(self, spark):
        from big_data_flight_analytics_spark.operators.temporal import (
            session_fold,
        )

        # key 1: parts 30s apart across the cut -> ONE session
        # key 2: parts 300s apart -> stay separate
        a = self._events(spark, [(1, 1, 0), (2, 1, 50), (3, 2, 0)])
        b = self._events(spark, [(4, 1, 80), (5, 2, 350)])
        folded = session_fold(
            self._sessions(a), self._sessions(b), "user_id", 60
        )
        got = self._key(folded)
        assert len([k for k in got if k[0] == 1]) == 1
        assert got[(1, 1)][0] == 3  # all three events in one session
        assert len([k for k in got if k[0] == 2]) == 2

    def test_keys_in_only_one_part_pass_through(self, spark):
        from big_data_flight_analytics_spark.operators.temporal import (
            session_fold,
        )

        a = self._events(spark, [(1, 7, 0)])
        b = self._events(spark, [(2, 9, 1000)])
        folded = session_fold(
            self._sessions(a), self._sessions(b), "user_id", 60
        )
        got = self._key(folded)
        assert (7, 1) in got and (9, 1) in got and len(got) == 2


class TestAsofTolerance:
    """j14: the tolerance gate on as-of — stale matches become NULL
    (no match at all), boundary is inclusive, gap is exact micros."""

    def test_tolerance_gate(self, spark):
        from big_data_flight_analytics_spark.plans.analytic_queries import (
            J14_TOL_US,
        )
        from big_data_flight_analytics_spark.operators.temporal import (
            asof_join,
        )
        from pyspark.sql import functions as F

        base = ts("2024-05-01T00:00:00")
        left = spark.createDataFrame(
            [
                (1, "u", ts("2024-05-02T00:00:00")),  # exactly 1 day
                (2, "u", ts("2024-05-02T00:00:01")),  # 1 day + 1 s
                (3, "v", ts("2024-05-01T00:00:05")),  # fresh
                (4, "w", ts("2024-05-01T12:00:00")),  # no click at all
            ],
            "event_id long, user_id string, ts timestamp",
        )
        right = spark.createDataFrame(
            [("u", base, 100, 1.5), ("v", base, 200, 2.5)],
            "user_id string, cts timestamp, click_id long, value double",
        )
        joined = asof_join(
            left, right, on="user_id", left_time="ts", right_time="cts",
            payload={
                "click_id": "asof_click_id",
                "cts": "asof_click_ts",
                "value": "asof_click_value",
            },
            right_tie="click_id",
        )
        us = F.unix_micros(F.col("ts").cast("timestamp"))
        aus = F.unix_micros(F.col("asof_click_ts").cast("timestamp"))
        within = F.col("asof_click_ts").isNotNull() & (
            (us - aus) <= J14_TOL_US
        )
        got = {
            r["event_id"]: (r["id2"], r["gap"])
            for r in joined.select(
                "event_id",
                F.when(within, F.col("asof_click_id")).alias("id2"),
                F.when(within, us - aus).alias("gap"),
            ).collect()
        }
        assert got[1] == (100, J14_TOL_US)  # inclusive boundary
        assert got[2] == (None, None)  # one second too stale
        assert got[3] == (200, 5_000_000)
        assert got[4] == (None, None)  # never matched at all


class TestAsofForward:
    """asof_join_forward: inclusive next-at-or-after semantics, tie on
    smallest right_tie, NULL payload when nothing follows."""

    def test_forward_semantics(self, spark):
        left = spark.createDataFrame(
            [(1, 100, 10), (2, 100, 25), (3, 200, 10)],
            "lid long, key long, lt long",
        )
        right = spark.createDataFrame(
            [
                (100, 10, 7, "same-instant"),
                (100, 10, 9, "same-instant-later-tie"),
                (100, 20, 5, "between"),
                (200, 5, 1, "before-only"),
            ],
            "key long, rt long, rid long, label string",
        )
        from big_data_flight_analytics_spark.operators.temporal import (
            asof_join_forward,
        )

        got = {
            r["lid"]: (r["next_id"], r["next_label"])
            for r in asof_join_forward(
                left,
                right,
                on="key",
                left_time="lt",
                right_time="rt",
                payload={"rid": "next_id", "label": "next_label"},
                right_tie="rid",
            ).collect()
        }
        # lid 1 at t=10: two right rows AT t=10 -> smallest tie (7) wins
        assert got[1] == (7, "same-instant")
        # lid 2 at t=25: nothing at-or-after -> NULLs
        assert got[2] == (None, None)
        # lid 3 at t=10 on key 200: only right row is BEFORE -> NULLs
        assert got[3] == (None, None)
