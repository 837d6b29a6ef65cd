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
            minhash_lsh_pairs(docs, threshold=0.1).count()
            embedding_neardup_pairs(_vecs(spark), threshold=0.0).count()
            ours = _persisted_ids(spark) - before
            assert len(ours) >= 3  # caches were really live
            released = release_tracked()
            assert released >= 3
            assert not (_persisted_ids(spark) & ours)  # all drained

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
