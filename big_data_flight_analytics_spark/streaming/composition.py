"""Composed-vs-separate sink planner: the r14 contention study's
doctrine made actionable (judge ask r15 #5 — the a18 -> j13 treatment
applied to streaming topology).

The measured rule (BASELINE.md round-14 contention study, s12/s17
families at 4 and 16 micro-batches on identical arrivals):

- SCAN-BOUND families (sketch-state sinks: per-batch fold cost is
  O(width) work, tiny next to reading/parsing the shared feed) —
  COMPOSE. One scan serves every fold; the win GROWS with batch
  count (s17: 1.27x at 4 batches -> 1.36x at 16).
- FOLD-BOUND families (corpus-sized index sinks: per-batch index
  maintenance dwarfs the scan) — compose is a wash at low batch
  count (s12: 1.03x at 4) and loses at high batch count (0.97x at
  16: the composed foreachBatch serializes every store's swap I/O
  that separate streams overlap). SEPARATE once triggers are
  frequent; composing stays acceptable while they are rare.

The advisor consumes the same class of inputs as the join advisor:
a few measured planner scalars, never the data. Measured per-batch
costs dominate when provided; the state-grain class is the fallback
signal (the taxonomy of DESIGN.md's fold-class table: sketch-state
folds are scan-bound by construction, index-grain folds are not).
"""

from __future__ import annotations

from dataclasses import dataclass

# Batch-count boundary between "triggers are rare" (compose is free
# even for fold-bound families: 1.03x measured at 4) and "triggers
# are frequent" (serialized swap I/O loses: 0.97x at 16). The midpoint
# of the two measured regimes; re-measure before moving it.
HIGH_BATCH_THRESHOLD = 8

#: state-grain classes considered scan-bound by construction —
#: per-batch fold cost is O(sketch width), independent of the corpus
SCAN_BOUND_CLASSES = frozenset({"sketch"})


@dataclass(frozen=True)
class SinkProfile:
    """Planner-facing descriptor of one sink in a candidate
    composition.

    ``state_class``: the fold-class-table grain — ``"sketch"``
    (O(width)/O(k)/O(depth x width) state: Histogram/KMV/CMS/OHLC/
    Bloom/DatasetCard), ``"index"`` (O(corpus) state: dedup index,
    excision store, language log, quality log), or ``"boundary"``
    (session stores — per-key state, index-like for this decision).

    ``per_batch_cost_s``: measured standalone per-trigger cost of the
    sink's stream (stage seconds / micro-batches), i.e. scan + fold.
    Optional — class-based advice applies without it.
    """

    name: str
    state_class: str
    per_batch_cost_s: float | None = None


def advise_sink_composition(
    profiles: list[SinkProfile],
    scan_cost_s: float | None = None,
    n_batches: int = 4,
    high_batch_threshold: int = HIGH_BATCH_THRESHOLD,
) -> str:
    """Pick ``"compose"`` (one foreachBatch over a shared scan) or
    ``"separate"`` (one stream per sink) for a family of sinks over
    the same feed.

    The two signals are ASYMMETRIC, deliberately (the 16-batch
    validation run pinned this): measured per-batch costs can PROVE a
    family scan-bound — shared scan cost at least the sum of the
    sinks' residual costs (``per_batch_cost_s - scan_cost_s``, floored
    at 0) means composing amortizes the dominant term — but they
    cannot prove the opposite, because a sink's standalone residual
    bundles per-trigger FIXED overhead (driver round trip, store swap)
    that composing amortizes just like the scan (s17's sketch family:
    residuals exceeded the scan at 16 batches, yet composing measured
    1.44x). What actually makes separate streams win is serialized
    BIG-state swap I/O per trigger, and that follows from the
    state-grain class, not from the cost decomposition. So:
    scan-bound iff every ``state_class`` is in
    :data:`SCAN_BOUND_CLASSES` OR the measured costs prove it;
    otherwise (index-grain family) separate at high batch count,
    compose below it.
    """
    if not profiles:
        raise ValueError("advise_sink_composition: empty sink family")
    costs = [p.per_batch_cost_s for p in profiles]
    class_scan_bound = all(
        p.state_class in SCAN_BOUND_CLASSES for p in profiles
    )
    measured_scan_bound = (
        scan_cost_s is not None
        and all(c is not None for c in costs)
        and scan_cost_s >= sum(max(c - scan_cost_s, 0.0) for c in costs)
    )
    if class_scan_bound or measured_scan_bound:
        return "compose"
    return "separate" if n_batches >= high_batch_threshold else "compose"
