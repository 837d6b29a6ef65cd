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

    Measured path (``scan_cost_s`` + every profile's
    ``per_batch_cost_s`` given): the family is scan-bound iff the
    shared per-batch scan cost is at least the sum of the sinks' fold
    costs (``per_batch_cost_s - scan_cost_s``, floored at 0) — then
    composing amortizes the dominant term and always wins. Otherwise
    the fold-bound rule applies: separate at high batch count,
    compose below it.

    Fallback path (costs not given): scan-bound iff every sink's
    ``state_class`` is in :data:`SCAN_BOUND_CLASSES` — one
    index-grain sink in the family makes its fold the plausible
    dominant cost, so the family is treated fold-bound.
    """
    if not profiles:
        raise ValueError("advise_sink_composition: empty sink family")
    costs = [p.per_batch_cost_s for p in profiles]
    if scan_cost_s is not None and all(c is not None for c in costs):
        fold_total = sum(max(c - scan_cost_s, 0.0) for c in costs)
        scan_bound = scan_cost_s >= fold_total
    else:
        scan_bound = all(
            p.state_class in SCAN_BOUND_CLASSES for p in profiles
        )
    if scan_bound:
        return "compose"
    return "separate" if n_batches >= high_batch_threshold else "compose"
