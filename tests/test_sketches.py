"""a11/i6: mergeable exact-grain histogram sketch — fold contract,
quantile rank semantics, negative/NULL/empty edges."""

from __future__ import annotations

import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.operators.sketches import (
    fixed_grain_histogram,
    histogram_fold,
    histogram_quantiles,
)


def _vals(spark, values):
    return spark.createDataFrame(
        [Row(v=int(x)) if x is not None else Row(v=None) for x in values],
        "v long",
    )


def _hist_map(df):
    return {r["bucket"]: r["cnt"] for r in df.collect()}


def _q_map(df):
    return {
        r["q"]: (r["target_rank"], r["bucket"], r["lo"]) for r in df.collect()
    }


class TestHistogramSketch:
    def test_fold_of_any_split_equals_full_pass(self, spark):
        rng = random.Random(13)
        values = [rng.randint(-5000, 5000) for _ in range(3000)]
        full = fixed_grain_histogram(_vals(spark, values), "v", 100)
        chunks = [values[i::3] for i in range(3)]
        folded = fixed_grain_histogram(_vals(spark, chunks[0]), "v", 100)
        for c in chunks[1:]:
            folded = histogram_fold(
                folded, fixed_grain_histogram(_vals(spark, c), "v", 100)
            )
        assert _hist_map(folded) == _hist_map(full)
        # and the folded sketch answers quantiles identically
        assert _q_map(histogram_quantiles(folded, 100)) == _q_map(
            histogram_quantiles(full, 100)
        )

    def test_fold_is_commutative(self, spark):
        a = fixed_grain_histogram(_vals(spark, [1, 2, 300]), "v", 100)
        b = fixed_grain_histogram(_vals(spark, [150, -20]), "v", 100)
        assert _hist_map(histogram_fold(a, b)) == _hist_map(
            histogram_fold(b, a)
        )

    def test_quantile_is_min_bucket_reaching_ceil_rank(self, spark):
        # 10 values 0..9, grain 5 -> bucket 0 holds ranks 1-5, bucket 1
        # holds 6-10. q50 targets ceil(5.0)=5 -> bucket 0; q51 targets
        # ceil(5.1)=6 -> bucket 1 (lower-bound convention, 0 counted in)
        hist = fixed_grain_histogram(_vals(spark, range(10)), "v", 5)
        got = _q_map(histogram_quantiles(hist, 5, qs=(50, 51, 100)))
        assert got[50] == (5, 0, 0)
        assert got[51] == (6, 1, 5)
        assert got[100] == (10, 1, 5)

    def test_negative_values_bucket_by_floor_not_truncate(self, spark):
        # -1 with grain 5 must land in bucket -1 (floor(-0.2) = -1),
        # not bucket 0 (truncation) — the signed-division trap
        hist = fixed_grain_histogram(_vals(spark, [-1, -5, -6, 4]), "v", 5)
        assert _hist_map(hist) == {-1: 2, -2: 1, 0: 1}

    def test_nulls_are_excluded_and_empty_input_yields_no_rows(self, spark):
        hist = fixed_grain_histogram(_vals(spark, [None, None, 7]), "v", 5)
        assert _hist_map(hist) == {1: 1}
        empty = fixed_grain_histogram(_vals(spark, []), "v", 5)
        assert empty.count() == 0
        assert histogram_quantiles(empty, 5).count() == 0


class TestGroupedHistogramSketch:
    """a12: the per-key sketch — grouped fold==full, per-group
    quantile independence, and equivalence with the ungrouped form on
    a single group."""

    def _grouped(self, spark, rows):
        return spark.createDataFrame(rows, "g string, v long")

    def test_grouped_fold_equals_full_pass(self, spark):
        import random

        rng = random.Random(17)
        rows = [
            (rng.choice(["a", "b", "c"]), rng.randint(-1000, 1000))
            for _ in range(2000)
        ]
        df = self._grouped(spark, rows)
        full = fixed_grain_histogram(df, "v", 100, group_cols=("g",))
        halves = [rows[0::2], rows[1::2]]
        folded = histogram_fold(
            fixed_grain_histogram(
                self._grouped(spark, halves[0]), "v", 100, group_cols=("g",)
            ),
            fixed_grain_histogram(
                self._grouped(spark, halves[1]), "v", 100, group_cols=("g",)
            ),
            group_cols=("g",),
        )
        key = lambda df_: {  # noqa: E731
            (r["g"], r["bucket"]): r["cnt"] for r in df_.collect()
        }
        assert key(folded) == key(full)
        qk = lambda df_: {  # noqa: E731
            (r["g"], r["q"]): (r["target_rank"], r["bucket"], r["lo"])
            for r in df_.collect()
        }
        assert qk(
            histogram_quantiles(folded, 100, group_cols=("g",))
        ) == qk(histogram_quantiles(full, 100, group_cols=("g",)))

    def test_groups_are_independent_and_match_ungrouped(self, spark):
        # each group's quantiles must equal the ungrouped operator run
        # on that group's rows alone
        rows = [("a", v) for v in range(10)] + [
            ("b", v) for v in (5, 5, 5, 100, 200)
        ]
        df = self._grouped(spark, rows)
        grouped = {
            (r["g"], r["q"]): (r["target_rank"], r["bucket"], r["lo"])
            for r in histogram_quantiles(
                fixed_grain_histogram(df, "v", 5, group_cols=("g",)),
                5,
                qs=(50, 100),
                group_cols=("g",),
            ).collect()
        }
        for g in ("a", "b"):
            solo = {
                r["q"]: (r["target_rank"], r["bucket"], r["lo"])
                for r in histogram_quantiles(
                    fixed_grain_histogram(
                        df.filter(F.col("g") == g), "v", 5
                    ),
                    5,
                    qs=(50, 100),
                ).collect()
            }
            for q, want in solo.items():
                assert grouped[(g, q)] == want


class TestKMVSketch:
    """a13/i7: the KMV distinct sketch — fold contract, partitioning
    invariance, exact-under-k, estimator accuracy, replay idempotence."""

    def _ids(self, spark, values, parts=None):
        df = spark.createDataFrame(
            [(int(v),) if v is not None else (None,) for v in values],
            "v long",
        )
        return df.repartition(parts) if parts else df

    def _state(self, df):
        return {(r["rank"], r["h"]) for r in df.collect()}

    def test_fold_of_any_split_equals_full_pass(self, spark):
        from big_data_flight_analytics_spark.operators.sketches import (
            kmv_fold,
            kmv_sketch,
        )

        values = [v % 700 for v in range(3000)]  # dupes on purpose
        full = kmv_sketch(self._ids(spark, values), "v", 64)
        chunks = [values[i::3] for i in range(3)]
        folded = kmv_sketch(self._ids(spark, chunks[0]), "v", 64)
        for c in chunks[1:]:
            folded = kmv_fold(
                folded, kmv_sketch(self._ids(spark, c), "v", 64), 64
            )
        assert self._state(folded) == self._state(full)

    def test_sketch_is_partitioning_invariant(self, spark):
        from big_data_flight_analytics_spark.operators.sketches import (
            kmv_sketch,
        )

        values = list(range(500))
        a = kmv_sketch(self._ids(spark, values, parts=2), "v", 32)
        b = kmv_sketch(self._ids(spark, values, parts=13), "v", 32)
        assert self._state(a) == self._state(b)

    def test_under_capacity_sketch_is_exact(self, spark):
        from big_data_flight_analytics_spark.operators.sketches import (
            kmv_estimate,
            kmv_sketch,
        )

        est = kmv_estimate(
            kmv_sketch(self._ids(spark, [1, 2, 3, 2, 1, None]), "v", 64),
            64,
        ).collect()[0]
        assert est["sketch_n"] == 3
        assert est["n_distinct_est"] == 3

    def test_duplicates_do_not_change_the_sketch(self, spark):
        from big_data_flight_analytics_spark.operators.sketches import (
            kmv_sketch,
        )

        uniq = list(range(200))
        assert self._state(
            kmv_sketch(self._ids(spark, uniq * 5), "v", 32)
        ) == self._state(kmv_sketch(self._ids(spark, uniq), "v", 32))

    def test_estimator_accuracy_definitional(self, spark):
        # definitional truth: the Bar-Yossef estimator (k-1)*2^60/h_(k)
        # on 5000 distinct values with k=256 must land within 4 std
        # (~4/sqrt(k-2) = 25%) of the true cardinality — the sketch is
        # deterministic given md5, so this pins real accuracy, not luck
        from big_data_flight_analytics_spark.operators.sketches import (
            kmv_estimate,
            kmv_sketch,
        )

        n = 5000
        est = kmv_estimate(
            kmv_sketch(self._ids(spark, range(n)), "v", 256), 256
        ).collect()[0]
        assert est["sketch_n"] == 256
        assert abs(est["n_distinct_est"] - n) / n < 0.25

    def test_fold_is_idempotent_under_replay(self, spark):
        # the s14 exactly-once story: re-folding an already-absorbed
        # delta is a set-union no-op — no replay markers needed
        from big_data_flight_analytics_spark.operators.sketches import (
            kmv_fold,
            kmv_sketch,
        )

        base = kmv_sketch(self._ids(spark, range(300)), "v", 32)
        delta = kmv_sketch(self._ids(spark, range(250, 400)), "v", 32)
        once = kmv_fold(base, delta, 32)
        twice = kmv_fold(once, delta, 32)
        assert self._state(twice) == self._state(once)

    def test_grouped_matches_ungrouped_per_group(self, spark):
        from big_data_flight_analytics_spark.operators.sketches import (
            kmv_estimate,
            kmv_sketch,
        )

        rows = [("a", v) for v in range(300)] + [
            ("b", v) for v in range(40)
        ]
        df = spark.createDataFrame(rows, "g string, v long")
        grouped = {
            r["g"]: (r["sketch_n"], r["kth_hash"], r["n_distinct_est"])
            for r in kmv_estimate(
                kmv_sketch(df, "v", 64, group_cols=("g",)),
                64,
                group_cols=("g",),
            ).collect()
        }
        for g in ("a", "b"):
            solo = kmv_estimate(
                kmv_sketch(df.filter(F.col("g") == g), "v", 64), 64
            ).collect()[0]
            assert grouped[g] == (
                solo["sketch_n"],
                solo["kth_hash"],
                solo["n_distinct_est"],
            )

    def test_empty_input_estimates_zero(self, spark):
        from big_data_flight_analytics_spark.operators.sketches import (
            kmv_estimate,
            kmv_sketch,
        )

        est = kmv_estimate(
            kmv_sketch(self._ids(spark, []), "v", 16), 16
        ).collect()[0]
        assert est["sketch_n"] == 0
        assert est["n_distinct_est"] == 0


class TestCountMinSketch:
    """a14/i8: the count-min grid — fold contract, overestimate
    guarantee, exact-when-unambiguous, absent-value zero."""

    def _terms(self, spark, words):
        return spark.createDataFrame([(w,) for w in words], "term string")

    def _grid(self, df):
        return {(r["row_j"], r["bucket"]): r["cnt"] for r in df.collect()}

    def test_fold_of_any_split_equals_full_pass(self, spark):
        from big_data_flight_analytics_spark.operators.sketches import (
            cms_fold,
            cms_sketch,
        )

        words = [f"w{i % 37}" for i in range(1500)]
        full = cms_sketch(self._terms(spark, words), "term", 64)
        folded = cms_fold(
            cms_sketch(self._terms(spark, words[0::2]), "term", 64),
            cms_sketch(self._terms(spark, words[1::2]), "term", 64),
        )
        assert self._grid(folded) == self._grid(full)

    def test_estimates_never_undercount(self, spark):
        # the CMS guarantee: min-over-rows >= true count, always
        from big_data_flight_analytics_spark.operators.sketches import (
            cms_estimate,
            cms_sketch,
        )

        import random

        rng = random.Random(53)
        words = [f"t{rng.randint(0, 200)}" for _ in range(3000)]
        df = self._terms(spark, words)
        truth = {}
        for w in words:
            truth[w] = truth.get(w, 0) + 1
        grid = cms_sketch(df, "term", 32)  # tiny width forces collisions
        queries = self._terms(spark, sorted(truth))
        got = {
            r["term"]: r["n_cms"]
            for r in cms_estimate(grid, queries, "term", 32).collect()
        }
        assert all(got[w] >= c for w, c in truth.items())

    def test_wide_grid_is_exact_for_planted_heavy_hitter(self, spark):
        from big_data_flight_analytics_spark.operators.sketches import (
            cms_estimate,
            cms_sketch,
        )

        # 3 distinct terms in a 1024-wide grid: collision probability
        # across all 3 rows is negligible and the layout deterministic,
        # so the heavy hitter's estimate is its exact count
        words = ["heavy"] * 500 + ["light", "rare"]
        grid = cms_sketch(self._terms(spark, words), "term", 1024)
        got = {
            r["term"]: r["n_cms"]
            for r in cms_estimate(
                grid, self._terms(spark, ["heavy", "absent"]), "term", 1024
            ).collect()
        }
        assert got["heavy"] == 500
        assert got["absent"] == 0  # untouched counters -> zero

    def test_state_is_bounded_by_depth_times_width(self, spark):
        from big_data_flight_analytics_spark.operators.sketches import (
            cms_sketch,
        )

        words = [f"u{i}" for i in range(5000)]  # vocab >> width
        grid = cms_sketch(self._terms(spark, words), "term", 16)
        rows = grid.collect()
        assert len(rows) <= 3 * 16
        from collections import Counter

        per_row = Counter(r["row_j"] for r in rows)
        assert all(v <= 16 for v in per_row.values())
        # every row's counters sum to the corpus size (additive grid)
        sums = {}
        for r in rows:
            sums[r["row_j"]] = sums.get(r["row_j"], 0) + r["cnt"]
        assert sums == {0: 5000, 1: 5000, 2: 5000}


class TestKMVSetOverlap:
    """a15: set-algebra estimates from two KMV sketches."""

    def _sk(self, spark, values, k=64):
        from big_data_flight_analytics_spark.operators.sketches import (
            kmv_sketch,
        )

        df = spark.createDataFrame([(int(v),) for v in values], "v long")
        return kmv_sketch(df, "v", k)

    def _ov(self, spark, a, b, k=64):
        from big_data_flight_analytics_spark.operators.sketches import (
            kmv_set_overlap,
        )

        return kmv_set_overlap(
            self._sk(spark, a, k), self._sk(spark, b, k), k
        ).collect()[0]

    def test_under_capacity_everything_is_exact(self, spark):
        got = self._ov(spark, range(0, 30), range(20, 45))
        assert got["sketch_n"] == 45  # |union| exactly
        assert got["n_union_est"] == 45
        assert got["n_both"] == 10  # 20..29
        assert got["n_intersect_est"] == 10

    def test_self_overlap_is_total(self, spark):
        got = self._ov(spark, range(500), range(500))
        assert got["n_both"] == got["sketch_n"] == 64
        assert got["n_intersect_est"] == got["n_union_est"]

    def test_disjoint_sets_estimate_near_zero_intersection(self, spark):
        got = self._ov(spark, range(0, 400), range(1000, 1400))
        assert got["n_both"] == 0
        assert got["n_intersect_est"] == 0

    def test_estimates_track_truth_at_capacity(self, spark):
        # |A|=|B|=600, |A∩B|=200, |A∪B|=1000; k=256 -> ~6% std error
        got = self._ov(spark, range(0, 600), range(400, 1000), k=256)
        assert abs(got["n_union_est"] - 1000) / 1000 < 0.25
        assert abs(got["n_intersect_est"] - 200) / 200 < 0.45


class TestGroupedCountMin:
    """a17: the per-key CMS — grouped grids are independent and match
    the ungrouped operator on each group's slice."""

    def test_grouped_matches_ungrouped_per_group(self, spark):
        from big_data_flight_analytics_spark.operators.sketches import (
            cms_estimate,
            cms_sketch,
        )

        rows = [("s1", f"w{i % 11}") for i in range(400)] + [
            ("s2", f"w{i % 5}") for i in range(100)
        ]
        df = spark.createDataFrame(rows, "src string, term string")
        grid = cms_sketch(df, "term", 64, group_cols=("src",))
        q = df.select("src", "term").distinct()
        grouped = {
            (r["src"], r["term"]): r["n_cms"]
            for r in cms_estimate(
                grid, q, "term", 64, group_cols=("src",)
            ).collect()
        }
        for src in ("s1", "s2"):
            solo_df = df.filter(F.col("src") == src)
            solo = {
                r["term"]: r["n_cms"]
                for r in cms_estimate(
                    cms_sketch(solo_df, "term", 64),
                    solo_df.select("term").distinct(),
                    "term",
                    64,
                ).collect()
            }
            for term, n in solo.items():
                assert grouped[(src, term)] == n

    def test_grouped_fold_equals_full(self, spark):
        from big_data_flight_analytics_spark.operators.sketches import (
            cms_fold,
            cms_sketch,
        )

        rows = [
            ("s1" if i % 3 else "s2", f"w{i % 17}") for i in range(600)
        ]
        df = spark.createDataFrame(rows, "src string, term string")
        full = cms_sketch(df, "term", 32, group_cols=("src",))
        half = lambda k: spark.createDataFrame(  # noqa: E731
            rows[k::2], "src string, term string"
        )
        folded = cms_fold(
            cms_sketch(half(0), "term", 32, group_cols=("src",)),
            cms_sketch(half(1), "term", 32, group_cols=("src",)),
            group_cols=("src",),
        )
        key = lambda d: {  # noqa: E731
            (r["src"], r["row_j"], r["bucket"]): r["cnt"]
            for r in d.collect()
        }
        assert key(folded) == key(full)
