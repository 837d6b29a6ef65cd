"""Shared-stage registry: reuse semantics and isolation guarantees.

The seam exists for single-pass catalog runs (bench, pipelines): d6/d8
reuse d2's pair frame instead of recomputing it. Two invariants matter:

1. Sharing must not change results — d2/d6/d8 inside ``shared_stages()``
   match their fully-isolated forms row for row.
2. Outside the scope, ``stage()`` is a plain passthrough — the oracle
   gate's per-query isolation is untouched and nothing stays persisted.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.plans.extension_queries import (
    d2_ngram_jaccard,
    d6_dedup_clusters,
    d8_curated_corpus,
)
from big_data_flight_analytics_spark.stages import (
    shared_stages,
    sharing_enabled,
    stage,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestStageRegistry:
    def test_passthrough_outside_scope(self, spark):
        calls = []

        def build():
            calls.append(1)
            return spark.range(3)

        assert not sharing_enabled()
        a = stage("k", build)
        b = stage("k", build)
        assert len(calls) == 2  # no memoization outside the scope
        assert a.count() == b.count() == 3

    def test_memoized_inside_scope(self, spark):
        calls = []

        def build():
            calls.append(1)
            return spark.range(5)

        with shared_stages():
            assert sharing_enabled()
            a = stage("k", build)
            b = stage("k", build)
            assert a is b
            assert len(calls) == 1
            assert a.storageLevel.useMemory  # pinned for reuse
        assert not sharing_enabled()
        # scope exit released the pin
        assert not a.storageLevel.useMemory

    def test_distinct_keys_distinct_stages(self, spark):
        with shared_stages():
            a = stage(("k", 1), lambda: spark.range(1))
            b = stage(("k", 2), lambda: spark.range(2))
            assert a is not b

    def test_nested_scopes_restore(self, spark):
        with shared_stages():
            outer = stage("k", lambda: spark.range(1))
            with shared_stages():
                inner = stage("k", lambda: spark.range(1))
                assert inner is not outer  # fresh registry
            assert stage("k", lambda: spark.range(9)) is outer

    def test_build_times_collector(self, spark):
        """With a collector, stage build is eager, timed, and memoized;
        the second request records no additional build."""
        times = {}
        with shared_stages(build_times=times):
            a = stage("k", lambda: spark.range(4))
            assert "k" in times and times["k"] > 0
            first = times["k"]
            b = stage("k", lambda: spark.range(4))
            assert b is a
            assert times["k"] == first  # no re-build on reuse
            assert a.count() == 4
        # collector detached after scope exit: plain scope stays lazy
        with shared_stages():
            stage("k2", lambda: spark.range(2))
            assert "k2" not in times

    def test_nested_build_attribution_not_double_counted(self, spark):
        """A parent stage that builds a child stage inside its builder
        records only its OWN seconds: sum(collector) must track the
        wall clock of the outer build, not double-count the child
        (the bug that made the first consumer's net time negative)."""
        import time as _time

        times = {}

        def child():
            _time.sleep(0.2)
            return spark.range(4)

        def parent():
            inner = stage("child", child)
            _time.sleep(0.05)
            return inner.select((inner.id * 2).alias("id"))

        with shared_stages(build_times=times):
            t0 = _time.time()
            stage("parent", parent)
            wall = _time.time() - t0
            assert set(times) == {"child", "parent"}
            # child carries its sleep; parent is net of the child
            assert times["child"] >= 0.2
            assert times["parent"] >= 0
            # the anti-double-count property: a double-counted child
            # would make the sum exceed wall by >= the child's 0.2 s
            # sleep; net attribution keeps sum == outer gross <= wall.
            assert sum(times.values()) <= wall + 0.05

    def test_nested_build_failure_keeps_stack_consistent(self, spark):
        """A child builder that raises must unwind the attribution
        stack so later top-level builds don't credit a phantom
        parent."""
        times = {}
        with shared_stages(build_times=times):
            try:
                stage("bad", lambda: (_ for _ in ()).throw(RuntimeError("boom")))
            except RuntimeError:
                pass
            stage("ok", lambda: spark.range(3))
            assert "ok" in times and times["ok"] >= 0

    def test_thread_isolation(self, spark):
        """A scope on one thread is invisible to another thread.

        Two concurrent pipelines must not cross-share registries or
        unpersist each other's pinned frames (registry is thread-local).
        """
        import threading

        seen = {}
        barrier = threading.Barrier(2)

        def worker(name):
            with shared_stages():
                barrier.wait()  # both scopes open simultaneously
                df = stage("k", lambda: spark.range(3))
                barrier.wait()
                seen[name] = df

        t1 = threading.Thread(target=worker, args=("a",))
        t2 = threading.Thread(target=worker, args=("b",))
        t1.start(); t2.start(); t1.join(); t2.join()
        assert seen["a"] is not seen["b"]  # no cross-thread memo hit

    def test_scope_on_thread_invisible_to_main(self, spark):
        import threading

        opened = threading.Event()
        done = threading.Event()

        def holder():
            with shared_stages():
                opened.set()
                done.wait(10)

        t = threading.Thread(target=holder)
        t.start()
        assert opened.wait(10)
        assert not sharing_enabled()  # main thread unaffected
        done.set()
        t.join()


class TestSharedCatalogEquivalence:
    """d2/d6/d8 answers are identical with and without sharing."""

    @pytest.fixture(scope="class")
    def isolated(self, spark):
        return {
            "d2": _rows(d2_ngram_jaccard(spark, SF_DIR)),
            "d6": _rows(d6_dedup_clusters(spark, SF_DIR)),
            "d8": _rows(d8_curated_corpus(spark, SF_DIR)),
        }

    def test_shared_pass_matches_isolated(self, spark, isolated):
        with shared_stages():
            assert _rows(d2_ngram_jaccard(spark, SF_DIR)) == isolated["d2"]
            assert _rows(d6_dedup_clusters(spark, SF_DIR)) == isolated["d6"]
            assert _rows(d8_curated_corpus(spark, SF_DIR)) == isolated["d8"]

    def test_assembly_chain_shares_cluster_and_decon_stages(self, spark):
        """t24's two expensive parents — the d6 cluster stage and the
        d20 decon pair frame — must be memo hits in a shared pass that
        already ran d6 and d20, and sharing must not change either
        d20's or t24's answer (judge ask r15 #8)."""
        from big_data_flight_analytics_spark.plans.extension_queries import (
            d20_containment_decon,
            t24_corpus_assembly,
        )

        iso_d20 = _rows(d20_containment_decon(spark, SF_DIR))
        iso_t24 = _rows(t24_corpus_assembly(spark, SF_DIR))
        times = {}
        with shared_stages(build_times=times):
            d6_dedup_clusters(spark, SF_DIR).count()
            assert _rows(d20_containment_decon(spark, SF_DIR)) == iso_d20
            built_before = set(times)
            assert _rows(t24_corpus_assembly(spark, SF_DIR)) == iso_t24
            # t24 built NO new cluster/decon stage — both were reuses
            new = {
                k for k in set(times) - built_before
                if "dedup_clusters" in str(k) or "decon_pairs" in str(k)
            }
            assert new == set()
            assert any("decon_pairs" in str(k) for k in times)
            assert any("dedup_clusters" in str(k) for k in times)

    def test_d8_composition_consistency(self, spark):
        """Within one shared pass, d8's canon rows are d6 canonicals."""
        with shared_stages():
            d6 = d6_dedup_clusters(spark, SF_DIR)
            d8 = d8_curated_corpus(spark, SF_DIR)
            canon_ids = {
                r.doc_id
                for r in d6.filter(F.col("is_canonical")).collect()
            }
            assert {r.doc_id for r in d8.collect()} <= canon_ids


def test_repeated_marks_stage_shared_equals_isolated(spark):
    from big_data_flight_analytics_spark.plans.extension_queries import (
        d15_repeated_spans,
        d16_excise_spans,
    )
    from big_data_flight_analytics_spark.stages import shared_stages

    sf = "/root/testdata/sf0.001"
    iso15 = sorted(tuple(r) for r in d15_repeated_spans(spark, sf).collect())
    iso16 = sorted(tuple(r) for r in d16_excise_spans(spark, sf).collect())
    with shared_stages():
        sh15 = sorted(tuple(r) for r in d15_repeated_spans(spark, sf).collect())
        sh16 = sorted(tuple(r) for r in d16_excise_spans(spark, sf).collect())
    assert sh15 == iso15
    assert sh16 == iso16


class TestLakeMaterialization:
    """shared_stages(materialize_dir=...) — the cluster-mode seam where
    persist() becomes write-to-lake + re-read."""

    def test_stage_written_read_and_reused_across_scopes(
        self, spark, tmp_path
    ):
        import os

        from pyspark.sql import Row

        from big_data_flight_analytics_spark.stages import (
            shared_stages,
            stage,
        )

        lake = str(tmp_path / "lake")
        builds = {"n": 0}

        def builder():
            builds["n"] += 1
            return spark.createDataFrame([Row(a=1), Row(a=2)])

        with shared_stages(materialize_dir=lake):
            out1 = stage(("k", 1), builder)
            assert {r["a"] for r in out1.collect()} == {1, 2}
            # second ask in-scope: registry hit, no rebuild
            stage(("k", 1), builder)
        assert builds["n"] == 1
        # files survived scope exit (keeping them IS the feature)
        assert any(
            f == "_SUCCESS"
            for _, _, files in os.walk(lake)
            for f in files
        )
        # a NEW scope over the same dir reads the lake, builds nothing
        with shared_stages(materialize_dir=lake):
            out2 = stage(("k", 1), builder)
            assert {r["a"] for r in out2.collect()} == {1, 2}
        assert builds["n"] == 1

    def test_build_time_charged_only_on_first_run(self, spark, tmp_path):
        from pyspark.sql import Row

        from big_data_flight_analytics_spark.stages import (
            shared_stages,
            stage,
        )

        lake = str(tmp_path / "lake2")
        times1: dict = {}
        with shared_stages(build_times=times1, materialize_dir=lake):
            stage(("k", 2), lambda: spark.createDataFrame([Row(a=1)]))
        assert ("k", 2) in times1 and times1[("k", 2)] > 0
        times2: dict = {}
        with shared_stages(build_times=times2, materialize_dir=lake):
            stage(("k", 2), lambda: spark.createDataFrame([Row(a=1)]))
        assert times2 == {}  # cross-run reuse: no build charged

    def test_lake_mode_nested_attribution_no_double_count(
        self, spark, tmp_path
    ):
        """Lake mode must use the same gross-minus-children accounting
        as the persist path: a nested stage's build seconds appear once
        (under the child), not twice — else total = queries + stages
        breaks in bench attribution."""
        import time as _time

        from big_data_flight_analytics_spark.stages import (
            shared_stages,
            stage,
        )

        lake = str(tmp_path / "lake4")
        times: dict = {}

        def child():
            _time.sleep(0.2)
            return spark.range(4)

        def parent():
            inner = stage("child", child)
            _time.sleep(0.05)
            return inner.select((inner.id * 2).alias("id"))

        with shared_stages(build_times=times, materialize_dir=lake):
            t0 = _time.time()
            stage("parent", parent)
            wall = _time.time() - t0
        assert set(times) == {"child", "parent"}
        assert times["child"] >= 0.2
        assert times["parent"] >= 0
        # double-counted child gross would push the sum past wall by
        # >= its 0.2 s sleep; net attribution keeps sum <= outer gross
        assert sum(times.values()) <= wall + 0.05

    def test_different_keys_different_paths(self, spark, tmp_path):
        from pyspark.sql import Row

        from big_data_flight_analytics_spark.stages import (
            shared_stages,
            stage,
        )

        lake = str(tmp_path / "lake3")
        with shared_stages(materialize_dir=lake):
            a = stage(("x",), lambda: spark.createDataFrame([Row(a=1)]))
            b = stage(("y",), lambda: spark.createDataFrame([Row(a=2)]))
            assert a.first()["a"] == 1
            assert b.first()["a"] == 2
