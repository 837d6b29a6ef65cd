"""The composed-vs-separate sink planner (streaming/composition.py):
one test per measured regime of the r14 contention study, plus the
class-fallback and guard behavior. Pure decision-rule tests — no
Spark session needed."""

import pytest

from big_data_flight_analytics_spark.streaming.composition import (
    HIGH_BATCH_THRESHOLD,
    SinkProfile,
    advise_sink_composition,
)


def _sketchy(costs):
    return [
        SinkProfile(f"s{i}", "sketch", c) for i, c in enumerate(costs)
    ]


def _indexy(costs):
    return [
        SinkProfile(f"x{i}", "index", c) for i, c in enumerate(costs)
    ]


class TestMeasuredRegimes:
    def test_scan_bound_composes_at_any_batch_count(self):
        # s17 shape: folds are slivers on top of the shared scan
        fam = _sketchy([1.1, 1.15, 1.2])  # folds sum 0.45 < scan 1.0
        for n in (4, 16, 64):
            assert (
                advise_sink_composition(fam, scan_cost_s=1.0, n_batches=n)
                == "compose"
            )

    def test_fold_bound_separates_at_high_batch_count(self):
        # s12 shape: index maintenance dwarfs the scan
        fam = _indexy([4.0, 5.0, 6.0])  # folds sum 12 >> scan 1.0
        assert (
            advise_sink_composition(fam, scan_cost_s=1.0, n_batches=16)
            == "separate"
        )

    def test_fold_bound_composes_at_low_batch_count(self):
        # measured 1.03x at 4 batches: composing is (weakly) right
        fam = _indexy([4.0, 5.0, 6.0])
        assert (
            advise_sink_composition(fam, scan_cost_s=1.0, n_batches=4)
            == "compose"
        )

    def test_measured_costs_override_state_class(self):
        # an "index"-labeled family whose MEASURED folds are slivers
        # is scan-bound: measurement beats taxonomy
        fam = _indexy([1.05, 1.1])
        assert (
            advise_sink_composition(fam, scan_cost_s=1.0, n_batches=16)
            == "compose"
        )

    def test_fold_cost_floors_at_zero(self):
        # a stage measured FASTER than the scan (noise) must not
        # produce a negative fold that masks the others — an INDEX
        # family with one real heavy residual stays fold-bound
        fam = _indexy([0.5, 3.5])  # folds: 0 + 2.5 > scan 1.0
        assert (
            advise_sink_composition(fam, scan_cost_s=1.0, n_batches=16)
            == "separate"
        )

    def test_sketch_family_never_demoted_by_noisy_residuals(self):
        # the 16-batch validation: sketch sinks' standalone residuals
        # bundle per-trigger fixed overhead that composing amortizes
        # too (s17 measured 1.44x composed) — big measured residuals
        # must NOT flip a sketch family to separate
        fam = _sketchy([2.5, 2.6, 2.4])  # residuals >> scan 1.0
        assert (
            advise_sink_composition(fam, scan_cost_s=1.0, n_batches=16)
            == "compose"
        )


class TestClassFallback:
    def test_all_sketch_family_composes_without_costs(self):
        fam = [SinkProfile("h", "sketch"), SinkProfile("k", "sketch")]
        assert advise_sink_composition(fam, n_batches=16) == "compose"

    def test_one_index_sink_makes_family_fold_bound(self):
        fam = [SinkProfile("h", "sketch"), SinkProfile("d", "index")]
        assert advise_sink_composition(fam, n_batches=16) == "separate"
        assert advise_sink_composition(fam, n_batches=4) == "compose"

    def test_boundary_class_treated_index_like(self):
        fam = [SinkProfile("sess", "boundary")]
        assert advise_sink_composition(fam, n_batches=16) == "separate"

    def test_partial_costs_fall_back_to_class(self):
        # one sink missing its measurement -> class path decides
        fam = [
            SinkProfile("h", "sketch", 1.1),
            SinkProfile("k", "sketch", None),
        ]
        assert (
            advise_sink_composition(fam, scan_cost_s=1.0, n_batches=16)
            == "compose"
        )


class TestGuards:
    def test_empty_family_raises(self):
        with pytest.raises(ValueError, match="empty"):
            advise_sink_composition([])

    def test_threshold_boundary(self):
        fam = _indexy([4.0])
        at = advise_sink_composition(
            fam, scan_cost_s=1.0, n_batches=HIGH_BATCH_THRESHOLD
        )
        below = advise_sink_composition(
            fam, scan_cost_s=1.0, n_batches=HIGH_BATCH_THRESHOLD - 1
        )
        assert (at, below) == ("separate", "compose")
