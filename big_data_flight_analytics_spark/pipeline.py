"""Batch pipeline runner: named steps, per-step status, fail-fast.

Replaces the reference's orchestration behavior where one try/except
wraps all nine queries and a failure silently aborts the rest while
exiting 0 (batch_process.py:238-258, transform.py:73-74). Here every
step runs isolated, failures are recorded per step, and the run result
carries a nonzero-exit signal. The Airflow DAG chain
(orchestration/dags/*.py) maps to an ordered list of steps; Spark's
scheduler handles intra-step parallelism, so a linear driver loop is
not a bottleneck (each step is a distributed job).
"""

from __future__ import annotations

import time
import traceback
from collections.abc import Callable, Mapping
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class StepResult:
    name: str
    ok: bool
    seconds: float
    rows: int | None = None
    error: str | None = None


@dataclass
class RunReport:
    steps: list[StepResult] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return all(s.ok for s in self.steps)

    @property
    def exit_code(self) -> int:
        return 0 if self.ok else 1

    def summary(self) -> str:
        lines = [
            f"{'ok ' if s.ok else 'FAIL'} {s.name}: "
            + (f"{s.rows} rows, {s.seconds:.1f}s" if s.ok else f"{s.error}")
            for s in self.steps
        ]
        status = "SUCCESS" if self.ok else "FAILURE"
        return "\n".join(lines + [f"pipeline {status}"])


def run_pipeline(
    steps: Mapping[str, Callable[[], DataFrame]],
    sink: Callable[[str, DataFrame], None] | None = None,
    fail_fast: bool = False,
    share_stages: bool = True,
) -> RunReport:
    """Run named DataFrame-producing steps; write each via ``sink``.

    ``sink(name, df)`` defaults to a count() materialization. With
    ``fail_fast`` the first failure stops the run (remaining steps are
    not attempted); otherwise all steps run and the report aggregates
    per-step status — either way the failure is never swallowed.

    ``share_stages`` (default on): the steps run as ONE pass, so
    composition steps reuse parent stages registered via
    ``stages.stage`` (d6/d8/d9 reuse d2's pair frame) instead of
    recomputing them — the batch-view-reuse the reference gets from
    feeding Q3's curated output into L3 (batch_process.py:85-91). Pass
    False to force fully-isolated steps (the oracle gate's semantics).
    """
    from contextlib import nullcontext

    from big_data_flight_analytics_spark.stages import shared_stages

    report = RunReport()
    with shared_stages() if share_stages else nullcontext():
        for name, build in steps.items():
            t0 = time.time()
            try:
                df = build()
                if sink is None:
                    rows = df.count()
                else:
                    sink(name, df)
                    rows = None
                report.steps.append(
                    StepResult(name, True, time.time() - t0, rows=rows)
                )
            except Exception:  # noqa: BLE001 — isolation boundary per step
                report.steps.append(
                    StepResult(
                        name, False, time.time() - t0,
                        error=traceback.format_exc(limit=3),
                    )
                )
                if fail_fast:
                    break
    return report
