"""Benchmark harness: runs the full query catalog at a scale factor.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is materialized via the noop sink — full execution, no
driver-side collect cost. Dir from $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1), parallelism from $SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time
from contextlib import nullcontext as _nullcontext

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_flight_analytics_spark.cache import release_tracked  # noqa: E402
from big_data_flight_analytics_spark.plans.catalog import QUERIES  # noqa: E402
from big_data_flight_analytics_spark.session import get_session  # noqa: E402
from big_data_flight_analytics_spark.stages import shared_stages  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    spark = get_session(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup outside the timed region so per-query numbers
    # measure the engine, not session startup
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    try:
        next(iter(QUERIES.values()))(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception:  # noqa: BLE001 — warmup only; the loop records it
        pass

    # min of N_RUNS per query: the host shows heavy noisy-neighbor
    # windows (identical code measured 56 s vs 197 s total in one
    # afternoon); the per-query minimum estimates the true cost far
    # more stably, and BOTH the recorded baseline and the driver's
    # per-round run use this same script, so the comparison protocol
    # stays symmetric.
    # Per-query fault isolation: one broken query must cost one row in
    # the output, never the whole artifact. Failures are recorded as
    # {"err": ...} under "errors" and excluded from the total.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    # The catalog is measured as N full PASSES (min per query across
    # passes), each pass inside its own shared-stage scope: composition
    # queries (d6/d8) reuse their parent stages (d2's pair frame, d6's
    # clusters) within a pass — the batch-view-reuse a user pipeline
    # materializing the whole catalog would do — while every pass still
    # pays each stage's build cost exactly once, in the first query
    # that needs it. A per-query min-of-N with a cache living ACROSS
    # runs would let d2's second run read its own persisted result and
    # report near-zero — pass-scoped registries keep the numbers
    # honest. The oracle gate calls queries() directly (sharing off),
    # so per-query correctness semantics are untouched.
    # SPARK_GRAFT_SHARED_STAGES=0 restores fully-isolated timings.
    #
    # Attribution: a shared stage's build cost is timed separately (the
    # registry eagerly materializes when given a collector) and
    # reported under "stages"; consumer queries are timed NET of stage
    # builds. Per-query numbers therefore stay comparable across rounds
    # regardless of catalog order, and
    #   value == sum(queries) + sum(stages).
    share = os.environ.get("SPARK_GRAFT_SHARED_STAGES", "1") != "0"
    timings: dict[str, float] = {}
    stage_builds: dict[str, float] = {}
    errors: dict[str, str] = {}
    for _ in range(n_runs):
        pass_builds: dict = {}
        with shared_stages(build_times=pass_builds) if share else _nullcontext():
            for name, fn in QUERIES.items():
                if name in errors:
                    continue
                build_before = sum(pass_builds.values())
                t0 = time.time()
                try:
                    fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                except Exception as e:  # noqa: BLE001
                    errors[name] = f"{type(e).__name__}: {e}"[:500]
                    timings.pop(name, None)
                    continue
                elapsed = (time.time() - t0) - (
                    sum(pass_builds.values()) - build_before
                )
                timings[name] = round(min(timings.get(name, elapsed), elapsed), 3)
                # operator-internal caches are per-invocation scratch;
                # releasing between queries keeps the session flat and
                # each query honest (outside the timed region). Shared
                # stages are registered separately and survive until
                # the pass ends.
                release_tracked()
        for k, v in pass_builds.items():
            ks = str(k)
            stage_builds[ks] = round(min(stage_builds.get(ks, v), v), 3)

    print(
        emit_artifacts(timings, stage_builds, errors, sf_val, n_runs)
    )
    if not timings:
        raise SystemExit(1)


def emit_artifacts(
    timings: dict[str, float],
    stage_builds: dict[str, float],
    errors: dict[str, str],
    sf_val,
    n_runs: int,
    detail_path: str | None = None,
) -> str:
    """Write BENCH_DETAIL.json, return the compact final-line summary.

    The driver captures only the TAIL of stdout (~2 KB), and the full
    per-query map outgrew that (103 queries ≈ 6 KB → BENCH_r06 parsed
    as null). The FINAL line is therefore a compact summary that
    always fits; the per-query/stages detail goes to the sidecar file.
    Invariant: value == sum(queries) + sum(stages). Contract pinned by
    tests/test_compact.py::TestBenchEmitter.

    Sidecar clobbering (VERDICT r16 #2): consecutive runs at different
    core counts overwrote each other's BENCH_DETAIL.json, so the
    driver lost its own 32-core per-query detail to its 8-core run.
    The detail now ALSO lands in a core-count-stamped sidecar
    (BENCH_DETAIL_c{cpus}.json); $SPARK_GRAFT_DETAIL_PATH overrides
    the primary path outright.
    """
    total = round(sum(timings.values()) + sum(stage_builds.values()), 3)
    detail = {
        "metric": "total_catalog_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "runs_per_query": n_runs,
    }
    if stage_builds:
        detail["stages"] = stage_builds
    if errors:
        # An errored query is excluded from the total, which would make
        # the headline look FASTER than baseline; flag the artifact so
        # cross-round total comparisons can't silently absorb breakage.
        detail["errors"] = errors
        detail["invalid"] = True
    stamped_path = None
    if detail_path is None:
        detail_path = os.environ.get("SPARK_GRAFT_DETAIL_PATH") or os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
        )
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        if cpus:
            root, ext = os.path.splitext(detail_path)
            stamped_path = f"{root}_c{cpus}{ext}"
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    if stamped_path:
        with open(stamped_path, "w") as f:
            json.dump(detail, f, indent=1)
    summary = {
        "metric": "total_catalog_seconds",
        "value": total,
        "unit": "sec",
        "sf": sf_val,
        "n_queries": len(timings),
        "runs_per_query": n_runs,
        "detail": os.path.basename(stamped_path or detail_path),
    }
    if errors:
        summary["n_errors"] = len(errors)
        summary["invalid"] = True
    return json.dumps(summary)


if __name__ == "__main__":
    main()
