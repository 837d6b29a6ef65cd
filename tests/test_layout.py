"""Z-order layout: measurable multi-dimension scan pruning.

The claim under test is the one that matters at 100 TB: after
``write_zordered`` on (a, b), a box predicate on EITHER dimension
prunes a large fraction of files by plain parquet min/max stats,
whereas a linear sort on `a` prunes only `a`-predicates. The check
reads the written files' footer statistics directly (pyarrow) and
intersects them with the predicate — exactly what any engine's
file/row-group skipping does, with no engine cooperation assumed.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.sources.layout import (
    write_zordered,
    zorder_key,
)

N = 4096
N_FILES = 16


def _grid(spark):
    # the full 64x64 grid, once per cell: a cycles fast, b slow, so the
    # dims are exactly independent (row order scrambled by the hash-ish
    # 2039 stride so neither dim arrives pre-sorted)
    rows = [
        Row(a=((i * 2039) % N) % 64, b=((i * 2039) % N) // 64, payload=i)
        for i in range(N)
    ]
    return spark.createDataFrame(rows)


def _files_hit(path, col, lo, hi):
    """Files whose [min, max] for ``col`` intersects [lo, hi]."""
    hits = 0
    total = 0
    for name in os.listdir(path):
        if not name.endswith(".parquet"):
            continue
        total += 1
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    mins.append(c.statistics.min)
                    maxs.append(c.statistics.max)
        assert mins, f"no stats for {col} in {name}"
        if min(mins) <= hi and max(maxs) >= lo:
            hits += 1
    return hits, total


class TestZorderLayout:
    def test_key_is_deterministic_and_bounded(self, spark):
        df = zorder_key(_grid(spark), ["a", "b"], bits=6)
        stats = df.agg(
            F.min("__zkey").alias("mn"), F.max("__zkey").alias("mx")
        ).collect()[0]
        assert stats["mn"] >= 0 and stats["mx"] < (1 << 12)
        # same input -> same keys (pure expression, no rand)
        again = zorder_key(_grid(spark), ["a", "b"], bits=6)
        assert sorted(r["__zkey"] for r in df.collect()) == sorted(
            r["__zkey"] for r in again.collect()
        )

    def test_too_wide_key_raises(self, spark):
        with pytest.raises(ValueError):
            zorder_key(_grid(spark), ["a", "b"], bits=32)

    def test_box_pruning_beats_linear_sort_on_second_dim(
        self, spark, tmp_path
    ):
        df = _grid(spark)
        zpath = str(tmp_path / "zorder")
        lpath = str(tmp_path / "linear")
        write_zordered(df, zpath, ["a", "b"], num_files=N_FILES, bits=8)
        (
            df.repartitionByRange(N_FILES, "a")
            .sortWithinPartitions("a")
            .write.mode("overwrite")
            .parquet(lpath)
        )

        # contents identical regardless of layout
        z = spark.read.parquet(zpath)
        assert z.count() == N
        assert z.agg(F.sum("payload")).collect()[0][0] == sum(range(N))

        # predicate on a: both layouts prune
        za, zt = _files_hit(zpath, "a", 0, 7)
        la, lt = _files_hit(lpath, "a", 0, 7)
        assert zt == N_FILES and lt == N_FILES
        assert la <= N_FILES // 4  # linear is perfect on its sort col
        assert za <= N_FILES // 2  # zorder still prunes half+

        # predicate on b: linear sort is blind, zorder keeps pruning
        zb, _ = _files_hit(zpath, "b", 0, 7)
        lb, _ = _files_hit(lpath, "b", 0, 7)
        assert lb == N_FILES  # every file matches: no pruning at all
        assert zb <= N_FILES // 2

    def test_constant_dimension_is_harmless(self, spark):
        rows = [Row(a=5, b=i) for i in range(64)]
        df = zorder_key(spark.createDataFrame(rows), ["a", "b"], bits=6)
        ks = [r["__zkey"] for r in df.orderBy("b").collect()]
        # constant dim contributes 0 bits; key strictly follows b
        assert ks == sorted(ks) and len(set(ks)) == 64
