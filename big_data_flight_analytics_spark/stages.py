"""Opt-in cross-query stage sharing for single-pass catalog runs.

d6 (connected components) and d8 (curated corpus) are compositions
that begin with d2's near-dup pair pipeline — the same batch-view-reuse
shape as the reference feeding Q3's curated output into L3
(orchestration/src/batch_process.py:85-91). Run in isolation (the
oracle gate calls each query independently) every composition recomputes
its parents; run as one pass (bench, a user pipeline materializing the
whole catalog) that recompute is pure waste.

``stage(key, builder)`` is the seam: by default it just calls
``builder()`` — query semantics are unchanged and each call is fully
isolated. Inside a ``shared_stages()`` scope the result is persisted and
memoized by key, so the second query asking for the same stage reuses
the first one's frame. Keys must include every parameter that affects
the result (scale dir, thresholds) — two calls with different params are
different stages.

Shared frames deliberately bypass ``cache.tracked_persist`` bookkeeping:
``release_tracked()`` between queries must NOT drop a frame a later
query will reuse. The ``shared_stages()`` exit unpersists everything it
pinned.

100-TB note: ``shared_stages(materialize_dir=...)`` IS that swap —
each stage is written to the lake (parquet under a key-derived path)
and re-read, giving lineage truncation, executor-loss resilience, and
CROSS-RUN reuse: a second scope over the same dir finds the stage's
``_SUCCESS`` marker and reads it instead of rebuilding. The default
(no dir) stays ``persist()`` — right for a single-process pass.
"""

from __future__ import annotations

import hashlib
import os
import threading
import time
from collections.abc import Callable, Hashable
from contextlib import contextmanager

from pyspark.sql import DataFrame

# Registry is thread-local: two pipelines on different threads (e.g. a
# notebook running catalog passes concurrently) each get their own
# scope, never cross-share registries or unpersist each other's pinned
# frames. Nested scopes on one thread stack via the save/restore in
# shared_stages(), which is exception-safe (try/finally).
_TLS = threading.local()


def _registry() -> dict[Hashable, DataFrame] | None:
    return getattr(_TLS, "shared", None)


def sharing_enabled() -> bool:
    return _registry() is not None


def _stage_path(materialize_dir: str, key: Hashable) -> str:
    # repr(key) is deterministic for the tuple-of-primitives keys the
    # catalog uses; the digest keeps paths filesystem-safe and length-
    # bounded. Cross-run reuse therefore requires the key's repr to be
    # stable across processes — true for (str, int, float) tuples.
    digest = hashlib.md5(repr(key).encode()).hexdigest()[:16]
    return os.path.join(materialize_dir, f"stage_{digest}")


def _materialize(df: DataFrame, path: str) -> DataFrame:
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def _timed_build(
    key: Hashable,
    collector: dict[Hashable, float],
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Run ``build()`` and record gross-minus-children seconds.

    Stages NEST (dedup_clusters builds jaccard_pairs inside its own
    builder). A child's whole build period sits inside the parent's
    gross wall time, so recording both gross times would double-count
    the child — and a consumer subtracting the collector delta would go
    NEGATIVE when it triggers both builds. The stack tracks child gross
    seconds per in-flight build; each stage records gross minus its
    children. Shared by the persist and lake (materialize_dir) paths so
    the bench's total = queries + stages invariant holds in both modes.
    """
    stack = getattr(_TLS, "_build_stack", None)
    if stack is None:
        stack = _TLS._build_stack = []
    t0 = time.time()
    stack.append(0.0)
    try:
        df = build()
    finally:
        gross = time.time() - t0
        child_secs = stack.pop()
        if stack:
            stack[-1] += gross
    collector[key] = collector.get(key, 0.0) + (gross - child_secs)
    return df


def stage(key: Hashable, builder: Callable[[], DataFrame]) -> DataFrame:
    """Build (or reuse, inside ``shared_stages()``) the named stage."""
    shared = _registry()
    if shared is None:
        return builder()
    if key not in shared:
        collector = getattr(_TLS, "build_times", None)
        mat_dir = getattr(_TLS, "materialize_dir", None)
        if mat_dir is not None:
            path = _stage_path(mat_dir, key)
            if os.path.exists(os.path.join(path, "_SUCCESS")):
                # cross-run reuse: a previous scope (or job) already
                # wrote this stage — read it, charge no build time
                from big_data_flight_analytics_spark.session import (
                    get_session,
                )

                shared[key] = get_session().read.parquet(path)
            elif collector is None:
                shared[key] = _materialize(builder(), path)
            else:
                shared[key] = _timed_build(
                    key, collector, lambda: _materialize(builder(), path)
                )
            return shared[key]
        if collector is None:
            shared[key] = builder().persist()
        else:
            # Attribution mode (bench): persist() is lazy, so without
            # forcing, the build cost lands inside whichever consumer
            # query happens to run first — making per-query numbers
            # depend on catalog order. Materialize here, timed, so the
            # cost is reported as the stage's own.
            def _build_persisted() -> DataFrame:
                df = builder().persist()
                df.count()
                return df

            shared[key] = _timed_build(key, collector, _build_persisted)
    return shared[key]


@contextmanager
def shared_stages(
    build_times: dict[Hashable, float] | None = None,
    materialize_dir: str | None = None,
):
    """Scope within which ``stage()`` results are persisted and shared.

    ``build_times``: optional collector dict. When given, each stage is
    eagerly materialized at creation and its build seconds recorded
    under its key — consumers then time net-of-build. When omitted
    (default), stages stay lazy and build cost is paid by the first
    action that touches them.

    ``materialize_dir``: lake mode — stages write to parquet under a
    key-derived path in this dir and are re-read from it (always eager;
    implies attribution when ``build_times`` is given). A stage already
    on disk (``_SUCCESS`` present) is read, not rebuilt — cross-run
    reuse, zero recorded build cost. The dir and its contents are the
    caller's to clean up or keep (keeping them IS the feature).
    """
    prev = _registry()
    prev_times = getattr(_TLS, "build_times", None)
    prev_mat = getattr(_TLS, "materialize_dir", None)
    mine: dict[Hashable, DataFrame] = {}
    _TLS.shared = mine
    _TLS.build_times = build_times
    _TLS.materialize_dir = materialize_dir
    try:
        yield
    finally:
        if materialize_dir is None:
            for df in mine.values():
                try:
                    df.unpersist()
                except Exception:  # noqa: BLE001 — stopped session; moot
                    pass
        _TLS.shared = prev
        _TLS.build_times = prev_times
        _TLS.materialize_dir = prev_mat
