"""Small-file compaction for parquet datasets (lake maintenance).

Streaming sinks, incremental appends, and over-parallel writers leave
datasets as thousands of small files; at scan time each file costs a
task plus footer/open overhead, and at 100 TB the NameNode/listing cost
alone dominates. Compaction rewrites a dataset to ~target-sized files.

Design:
- file count = ceil(bytes / target), from the dataset's actual on-disk
  size — no row counting pass;
- coalesce(), not repartition(): compaction must not pay a shuffle, it
  only concatenates existing partitions into fewer write tasks;
- crash-safe swap via the same rename discipline as
  streaming.sinks.ParquetUpsertSink: write to a staging dir, rename
  live -> old, staging -> live, drop old. Staging/old dirs live beside
  the leaf with a ``_``-prefixed basename, which Spark's file listing
  and partition discovery skip (same rule as ``_SUCCESS``/``_temporary``)
  and ``_leaf_dirs`` ignores — so neither a concurrent reader of a
  partitioned root nor a later compaction ever picks up in-flight or
  crash-leftover data as a real partition. Stale ``_*__compact_*``
  leftovers from a previous crash are swept on the next run.
- atomicity caveat: the swap is two renames, not one. A reader that
  lists the root in the instant between rename(live, old) and
  rename(staging, live) can miss that one leaf; it never sees
  duplicates or partial files. A crash in that instant leaves the data
  recoverable in the ``_``-prefixed old dir (invisible to readers until
  manually restored).
- partitioned datasets compact per partition directory (the
  partition column layout is preserved because compaction recurses on
  leaf directories, never across them).
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def _data_files(path: str) -> list[str]:
    return [
        f for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]


def _leaf_dirs(path: str) -> list[str]:
    """Directories that directly hold parquet files (partition leaves)."""
    leaves = []
    for root, dirs, _files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        if _data_files(root):
            leaves.append(root)
    return leaves


def _swap_dirs(leaf: str, suffix: str) -> str:
    """Sibling work-dir path for ``leaf``, hidden from Spark and readers.

    Spark's hidden-path filter (InMemoryFileIndex.shouldFilterOut) skips
    ``_``-prefixed names ONLY if they contain no ``=`` — a dir named
    ``_p=1__x`` would be parsed as a partition column ``_p`` and break
    partition discovery on the root. So the partition leaf's ``=`` is
    percent-encoded in the work-dir basename.
    """
    parent, base = os.path.split(leaf)
    return os.path.join(
        parent, f"_{base.replace('=', '%3D')}__compact_{suffix}"
    )


def _sweep_stale(path: str) -> None:
    """Remove crash leftovers (``_*__compact_staging``/``_*__compact_old``)."""
    for root, dirs, _files in os.walk(path):
        for d in list(dirs):
            if d.startswith("_") and (
                d.endswith("__compact_staging") or d.endswith("__compact_old")
            ):
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)
                dirs.remove(d)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> dict[str, tuple[int, int]]:
    """Compact every leaf directory of ``path`` to ~target-sized files.

    Returns {leaf_dir: (files_before, files_after)}. Leaves with fewer
    than ``min_files`` files (already compact) are skipped. Row
    contents and schema are byte-for-byte preserved up to parquet
    re-encoding; tests assert full row equality.
    """
    _sweep_stale(path)
    report: dict[str, tuple[int, int]] = {}
    for leaf in _leaf_dirs(path):
        before = len(_data_files(leaf))
        if before < min_files:
            report[leaf] = (before, before)
            continue
        n_out = max(1, math.ceil(_dir_bytes(leaf) / target_file_bytes))
        if n_out >= before:
            report[leaf] = (before, before)
            continue
        staging = _swap_dirs(leaf, "staging")
        old = _swap_dirs(leaf, "old")
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        (
            spark.read.parquet(leaf)
            .coalesce(n_out)
            .write.mode("overwrite")
            .parquet(staging)
        )
        os.rename(leaf, old)
        os.rename(staging, leaf)
        shutil.rmtree(old)
        report[leaf] = (before, len(_data_files(leaf)))
    return report
