"""Operator-internal caches must be releasable — no net session growth.

Operators that persist an intermediate consumed by their returned frame
register it with ``cache.tracked_persist``; runners call
``release_tracked()`` after the terminal action. These tests assert the
contract actually drains the JVM-side persistent-RDD registry, so a
long-lived session running the catalog repeatedly stays flat.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.cache import release_tracked
from big_data_flight_analytics_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from big_data_flight_analytics_spark.operators.graph import dedup_clusters
from big_data_flight_analytics_spark.operators.similarity import (
    embedding_neardup_pairs,
)


def _n_persisted(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _persisted_ids(spark) -> set[int]:
    it = spark.sparkContext._jsc.getPersistentRDDs().keySet().iterator()
    ids = set()
    while it.hasNext():
        ids.add(int(it.next()))
    return ids


def _docs(spark):
    rows = [
        Row(doc_id=i, text=f"shared prefix words here for doc number {i} tail")
        for i in range(1, 21)
    ]
    return spark.createDataFrame(rows)


def _vecs(spark):
    rows = [Row(vec_id=i, embedding=[float(i), 1.0, 0.5]) for i in range(1, 9)]
    return spark.createDataFrame(rows)


class TestCacheDiscipline:
    def test_persisting_operators_drain_after_release(self, spark):
        # track ids, not counts: the async ContextCleaner frees ambient
        # localCheckpoint blocks left by OTHER tests (the iterative
        # operators) at arbitrary times, so global counts drift in both
        # directions. The invariant under test is that the ids OUR
        # operators persisted appear and then drain.
        release_tracked()
        docs = _docs(spark)
        for _ in range(2):  # repeated invocation must not accumulate
            before = _persisted_ids(spark)
            ngram_jaccard_pairs(docs, threshold=0.1, max_df=10).count()
            embedding_neardup_pairs(_vecs(spark), threshold=0.0).count()
            ours = _persisted_ids(spark) - before
            assert len(ours) >= 2  # caches were really live
            released = release_tracked()
            assert released >= 2
            assert not (_persisted_ids(spark) & ours)  # all drained

    def test_minhash_registers_no_tracked_cache(self, spark):
        # r16: minhash_lsh_pairs' shared shingle frame moved from
        # tracked_persist to an eager localCheckpoint (once_checkpoint;
        # measured faster on both interleaved A/B rounds). Its blocks
        # are ContextCleaner-managed — nothing is left registered for
        # the caller to release.
        release_tracked()
        docs = _docs(spark)
        before = _persisted_ids(spark)
        minhash_lsh_pairs(docs, threshold=0.1).count()
        assert _persisted_ids(spark) - before  # the checkpoint is live
        assert release_tracked() == 0

    def test_minhash_repeated_invocations_stay_bounded(self, spark):
        # ADVICE r16: checkpoint blocks are only freed when the Python/
        # JVM references are GC'd — repeated one-shot invocations in a
        # single session must not accumulate live blocks.
        import gc
        import time

        release_tracked()
        docs = _docs(spark)
        minhash_lsh_pairs(docs, threshold=0.1).count()
        gc.collect()
        base = _n_persisted(spark)
        for _ in range(3):
            minhash_lsh_pairs(docs, threshold=0.1).count()
        gc.collect()
        # the ContextCleaner drains asynchronously — poll briefly
        deadline = time.time() + 10
        while _n_persisted(spark) > base + 2 and time.time() < deadline:
            gc.collect()
            time.sleep(0.3)
        assert _n_persisted(spark) <= base + 2

    def test_connected_components_registers_no_cache(self, spark):
        release_tracked()
        pairs = spark.createDataFrame(
            [Row(doc_a=1, doc_b=2), Row(doc_a=2, doc_b=3), Row(doc_a=5, doc_b=6)]
        )
        docs = spark.createDataFrame([Row(doc_id=i) for i in range(1, 8)])
        out = dedup_clusters(pairs, docs)
        clusters = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
        assert clusters[3] == 1 and clusters[6] == 5 and clusters[7] == 7
        # the loop unpersists its per-round caches internally and only
        # localCheckpoint blocks remain (ContextCleaner-managed, freed
        # on GC) — nothing is left registered for the caller to release
        assert release_tracked() == 0

    def test_released_result_still_recomputable(self, spark):
        docs = _docs(spark)
        pairs = ngram_jaccard_pairs(docs, threshold=0.1, max_df=10)
        n1 = pairs.count()
        release_tracked()
        # re-action after release recomputes the shingle pipeline
        assert pairs.count() == n1
        release_tracked()


class TestLoopCheckpoint:
    """The durable-checkpoint swap point every iterative loop routes
    through (cache.loop_checkpoint)."""

    def test_local_by_default(self, spark):
        from pyspark.sql import Row

        from big_data_flight_analytics_spark.cache import loop_checkpoint

        df = spark.createDataFrame([Row(a=1), Row(a=2)])
        out = loop_checkpoint(df)
        assert {r["a"] for r in out.collect()} == {1, 2}
        # lineage truncated: the optimized plan is a scan over
        # checkpointed blocks, not the original LocalRelation
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "LogicalRDD" in plan

    def test_invalid_mode_fails_loud(self, spark):
        import pytest as _pytest
        from pyspark.sql import Row

        from big_data_flight_analytics_spark.cache import loop_checkpoint

        spark.conf.set("spark.graft.loop.checkpoint", "sometimes")
        try:
            with _pytest.raises(ValueError, match="auto|local|durable"):
                loop_checkpoint(spark.createDataFrame([Row(a=1)]))
        finally:
            spark.conf.unset("spark.graft.loop.checkpoint")

    def test_durable_without_dir_fails_loud(self, spark):
        import pytest as _pytest
        from pyspark.sql import Row

        from big_data_flight_analytics_spark.cache import loop_checkpoint

        if spark.sparkContext.getCheckpointDir() is not None:
            _pytest.skip("session already has a checkpoint dir")
        spark.conf.set("spark.graft.loop.checkpoint", "durable")
        try:
            with _pytest.raises(RuntimeError, match="no checkpoint dir"):
                loop_checkpoint(spark.createDataFrame([Row(a=1)]))
        finally:
            spark.conf.unset("spark.graft.loop.checkpoint")

    def test_auto_goes_durable_with_dir_and_loops_still_converge(
        self, spark, tmp_path
    ):
        import os

        from pyspark.sql import Row

        from big_data_flight_analytics_spark.operators.graph import (
            connected_components,
        )

        ckdir = str(tmp_path / "ck")
        spark.sparkContext.setCheckpointDir(ckdir)
        try:
            edges = spark.createDataFrame(
                [Row(src=1, dst=2), Row(src=2, dst=3), Row(src=9, dst=10)]
            )
            got = {
                (r["id"], r["cluster_id"])
                for r in connected_components(edges).collect()
            }
            assert got == {(1, 1), (2, 1), (3, 1), (9, 9), (10, 9)}
            # durable blocks actually landed on the filesystem
            found = any(files for _, _, files in os.walk(ckdir))
            assert found
        finally:
            # later tests assume the local (default) behavior; the dir
            # cannot be unset on a live context, so pin the mode
            spark.conf.set("spark.graft.loop.checkpoint", "local")

    def test_once_checkpoint_stays_local_with_checkpoint_dir(
        self, spark, tmp_path
    ):
        # ADVICE r16: single-pass frames must never write durable
        # checkpoint files (not ContextCleaner-cleaned by default on
        # clusters) — once_checkpoint localCheckpoints unconditionally,
        # even in auto mode with a checkpoint dir set (this test runs
        # after the durable one so the dir is already set; mode is
        # irrelevant to once_checkpoint).
        import os

        from pyspark.sql import Row

        from big_data_flight_analytics_spark.cache import once_checkpoint

        ckdir = str(tmp_path / "ck_once")
        spark.sparkContext.setCheckpointDir(ckdir)
        out = once_checkpoint(spark.createDataFrame([Row(a=1), Row(a=2)]))
        assert {r["a"] for r in out.collect()} == {1, 2}
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "LogicalRDD" in plan  # lineage truncated
        assert not any(
            files for _, _, files in os.walk(ckdir)
        )  # nothing durable written
