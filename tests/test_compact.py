"""Parquet compaction: file-count reduction with exact row preservation."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from big_data_flight_analytics_spark.sources.compact import (
    _data_files,
    compact_parquet,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestCompactParquet:
    def test_flat_dataset_compacts_preserving_rows(self, spark, tmp_path):
        path = str(tmp_path / "flat")
        # 16 small files
        spark.range(0, 4000).withColumn(
            "v", F.col("id") * 2
        ).repartition(16).write.parquet(path)
        assert len(_data_files(path)) == 16
        before = _rows(spark.read.parquet(path))

        report = compact_parquet(
            spark, path, target_file_bytes=10 * 1024 * 1024
        )
        n_before, n_after = report[path]
        assert n_before == 16 and n_after == 1
        assert len(_data_files(path)) == 1
        assert _rows(spark.read.parquet(path)) == before
        # no staging/old leftovers
        assert not [
            d for d in os.listdir(tmp_path) if "compact" in d
        ]

    def test_partitioned_dataset_keeps_layout(self, spark, tmp_path):
        path = str(tmp_path / "part")
        df = spark.range(0, 3000).withColumn("p", F.col("id") % 3)
        df.repartition(8).write.partitionBy("p").parquet(path)
        before = _rows(spark.read.parquet(path))

        compact_parquet(spark, path, target_file_bytes=10 * 1024 * 1024)
        # partition directories intact, each compacted to one file
        parts = sorted(
            d for d in os.listdir(path) if d.startswith("p=")
        )
        assert parts == ["p=0", "p=1", "p=2"]
        for d in parts:
            assert len(_data_files(os.path.join(path, d))) == 1
        assert _rows(spark.read.parquet(path)) == before

    def test_crash_leftovers_invisible_and_swept(self, spark, tmp_path):
        """A crashed run's staging/old dirs must never surface as data.

        They are _-prefixed (Spark's listing skips them, so a reader of
        the partitioned root sees no duplicate/mangled rows) and the
        next compact_parquet sweeps them before compacting.
        """
        path = str(tmp_path / "part")
        df = spark.range(0, 3000).withColumn("p", F.col("id") % 3)
        df.repartition(8).write.partitionBy("p").parquet(path)
        before = _rows(spark.read.parquet(path))

        # simulate a crash: leftover staging (half-written) and old
        # (full copy) dirs beside a partition leaf
        staging = os.path.join(path, "_p%3D1__compact_staging")
        old = os.path.join(path, "_p%3D1__compact_old")
        spark.range(5).coalesce(1).write.parquet(staging)
        spark.range(7).coalesce(1).write.parquet(old)

        # a concurrent reader of the root sees only the real data
        assert _rows(spark.read.parquet(path)) == before

        compact_parquet(spark, path, target_file_bytes=10 * 1024 * 1024)
        assert not os.path.exists(staging) and not os.path.exists(old)
        assert _rows(spark.read.parquet(path)) == before
        # swap work-dirs from this run are gone too
        assert not [d for d in os.listdir(path) if "compact" in d]

    def test_scan_task_count_drops_after_compaction(self, spark, tmp_path):
        """The read-path win, measured: a many-small-files table costs
        ~one scan task per file (openCostInBytes makes each small file
        its own split); after compaction the same rows scan in a
        handful of tasks, contents identical."""
        path = str(tmp_path / "many")
        spark.range(0, 60_000).withColumn(
            "v", F.col("id") * 3
        ).repartition(120).write.parquet(path)
        assert len(_data_files(path)) == 120
        before_tasks = spark.read.parquet(path).rdd.getNumPartitions()
        before_rows = _rows(spark.read.parquet(path))

        report = compact_parquet(spark, path, target_file_bytes=64 * 1024 * 1024)
        assert report[path][1] == 1
        after_tasks = spark.read.parquet(path).rdd.getNumPartitions()
        # the exact pre-compaction split count depends on session conf
        # (openCostInBytes / parallelism bin-packing); the invariant is
        # a multiple-times drop to a near-single-task scan
        assert after_tasks <= 2
        assert before_tasks >= 3 * after_tasks
        assert _rows(spark.read.parquet(path)) == before_rows

    def test_already_compact_is_untouched(self, spark, tmp_path):
        path = str(tmp_path / "one")
        spark.range(10).coalesce(1).write.parquet(path)
        files_before = _data_files(path)
        mtime = os.path.getmtime(
            os.path.join(path, files_before[0])
        )
        report = compact_parquet(spark, path)
        assert report[path] == (1, 1)
        assert _data_files(path) == files_before
        assert os.path.getmtime(
            os.path.join(path, files_before[0])
        ) == mtime  # not rewritten


class TestBenchEmitter:
    """bench.py's compact-final-line contract (VERDICT r8 #9): the
    driver tail-captures ~2 KB of stdout, so the FINAL printed line
    must stay a small valid-JSON summary regardless of catalog size,
    with the full per-query map in the sidecar file and the invariant
    value == sum(queries) + sum(stages)."""

    def test_summary_line_compact_and_consistent(self, tmp_path):
        import json

        from bench import emit_artifacts

        # a catalog twice today's size must still fit the tail capture
        timings = {f"q{i:03d}_some_longish_name": 0.123 for i in range(250)}
        stages = {"('knn_graph', '/x', 5)": 1.5}
        out = emit_artifacts(
            timings, stages, {}, 0.1, 2,
            detail_path=str(tmp_path / "BENCH_DETAIL.json"),
        )
        assert "\n" not in out and len(out) < 500
        summary = json.loads(out)
        assert summary["metric"] == "total_catalog_seconds"
        assert summary["unit"] == "sec"
        assert summary["n_queries"] == 250
        assert "queries" not in summary  # the big map stays out
        detail = json.loads((tmp_path / "BENCH_DETAIL.json").read_text())
        assert summary["value"] == detail["value"]
        assert round(
            sum(detail["queries"].values()) + sum(detail["stages"].values()),
            3,
        ) == detail["value"]

    def test_detail_sidecar_is_core_count_stamped(self, tmp_path, monkeypatch):
        """VERDICT r16 #2: runs at different core counts must not clobber
        each other's per-query detail — the detail also lands in a
        BENCH_DETAIL_c{cpus}.json sidecar, and $SPARK_GRAFT_DETAIL_PATH
        overrides the primary path."""
        import json

        from bench import emit_artifacts

        primary = tmp_path / "BENCH_DETAIL.json"
        monkeypatch.setenv("SPARK_GRAFT_DETAIL_PATH", str(primary))
        monkeypatch.setenv("SPARK_GRAFT_CPUS", "8")
        out = emit_artifacts({"q1": 1.0}, {}, {}, 0.1, 2)
        summary = json.loads(out)
        stamped = tmp_path / "BENCH_DETAIL_c8.json"
        assert primary.exists() and stamped.exists()
        assert summary["detail"] == "BENCH_DETAIL_c8.json"
        assert json.loads(stamped.read_text()) == json.loads(primary.read_text())

    def test_errors_flag_the_artifact_invalid(self, tmp_path):
        import json

        from bench import emit_artifacts

        out = emit_artifacts(
            {"q1": 1.0}, {}, {"q2": "Boom"}, 0.01, 2,
            detail_path=str(tmp_path / "BENCH_DETAIL.json"),
        )
        summary = json.loads(out)
        assert summary["invalid"] is True and summary["n_errors"] == 1
        detail = json.loads((tmp_path / "BENCH_DETAIL.json").read_text())
        assert detail["invalid"] is True and detail["errors"] == {"q2": "Boom"}
