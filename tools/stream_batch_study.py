"""Per-trigger cost study for the additive-fold streaming sinks.

Runs the named sinks at FILES_PER_TRIGGER=1 (16 micro-batches over the
same delta feed bench_stream.py uses) with a per-batch timer wrapped
around the sink call, and prints one JSON line per sink:

  {"sink": "s13", "rows_per_sec": ..., "per_batch_secs": [b1..b16]}

A FLAT vector is the O(delta)-per-trigger evidence the r16 verdict
asked for (s16/s19/s21 got theirs in BASELINE.md round 16; this tool
covers the remaining additive-fold sinks s13-s15/s17/s18/s20).

Usage: python tools/stream_batch_study.py [s13 s14 ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_STREAM_WORKDIR.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_FILES_PER_TRIGGER", "1")

import bench_stream  # noqa: E402
from big_data_flight_analytics_spark.session import get_session  # noqa: E402

ORD_SCHEMA = "o_orderkey long, o_totalprice double, o_custkey long"
DOC_SCHEMA = "doc_id long, source string, text string"


class _TimedSink:
    """foreachBatch wrapper: times each sink call."""

    def __init__(self, sink):
        self.sink = sink
        self.batch_secs: list[float] = []

    def __call__(self, df, batch_id):
        t0 = time.time()
        self.sink(df, batch_id)
        self.batch_secs.append(round(time.time() - t0, 3))


def _mk_sinks(workdir: str) -> dict:
    from big_data_flight_analytics_spark.streaming.sinks import (
        BloomSink,
        CMSSink,
        DatasetCardSink,
        HistogramSink,
        KMVSink,
        SketchPipelineSink,
    )

    def fresh(name):
        p = os.path.join(workdir, f"study_{name}")
        shutil.rmtree(p, ignore_errors=True)
        return p

    return {
        "s13": ("ord", HistogramSink(fresh("hist"), "o_totalprice", 1000)),
        "s14": ("ord", KMVSink(fresh("kmv"), "o_custkey", 128)),
        "s15": ("ord", CMSSink(fresh("cms"), "o_custkey", 1024)),
        "s17": (
            "ord",
            SketchPipelineSink(
                fresh("sp"), "o_totalprice", "o_custkey",
                grain=1000, k=128, width=1024,
            ),
        ),
        "s18": ("ord", BloomSink(fresh("bloom"), "o_custkey", 1 << 17)),
        "s20": ("doc", DatasetCardSink(fresh("card"))),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    workdir = os.environ.get(
        "SPARK_GRAFT_STREAM_WORKDIR", "/tmp/spark_graft_stream_bench"
    )
    os.makedirs(workdir, exist_ok=True)
    spark = get_session(app_name="stream_batch_study")
    spark.sparkContext.setLogLevel("ERROR")

    ord_feed, ord_rows = bench_stream.build_delta_feed(
        spark, sf_dir, workdir, "orders",
        ["o_orderkey", "o_totalprice", "o_custkey"], "o_orderkey",
    )
    doc_feed, doc_rows = bench_stream.build_delta_feed(
        spark, sf_dir, workdir, "documents",
        ["doc_id", "source", "text"], "doc_id",
    )
    feeds = {"ord": (ord_feed, ORD_SCHEMA, ord_rows),
             "doc": (doc_feed, DOC_SCHEMA, doc_rows)}

    sinks = _mk_sinks(workdir)
    names = sys.argv[1:] or sorted(sinks)
    for name in names:
        feed_key, sink = sinks[name]
        feed, schema, rows = feeds[feed_key]
        timed = _TimedSink(sink)
        secs = bench_stream._run_index_sink(
            spark, feed, schema, timed,
            os.path.join(workdir, f"ckpt_study_{name}"),
        )
        print(json.dumps({
            "sink": name,
            "rows_per_sec": round(rows / secs, 1),
            "n_batches": len(timed.batch_secs),
            "per_batch_secs": timed.batch_secs,
        }))


if __name__ == "__main__":
    main()
