"""Incremental aggregate maintenance: algebraic delta refresh.

The 100 TB pattern for keeping a materialized aggregate current without
rescanning history: persist PARTIAL aggregates (count/sum/min/max — the
algebraic measures, decomposable into combinable partials), then fold
each new partition's partials in. A refresh costs O(delta scan +
|keys|) instead of O(full history scan); the reference's nightly
full-recompute DAGs (orchestration/dags/batch_process_dag.py) are the
shape this replaces.

Correctness contract: merging partials is EXACT for algebraic measures
— the catalog query i1 proves merge(history, delta) equals the plain
full-scan GROUP BY under the value-hash gate. Non-algebraic measures
(exact distinct, exact percentiles) do not decompose this way; use
two-level dedup or sketches (HLL) for those.

Delivery contract: partials are additive, so a delta folded twice
double-counts. Delta boundaries must be exact-once — in practice a
partition-date predicate (this module takes whatever frame you give
it) or the streaming sinks' checkpointed foreachBatch.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame


def partial_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    partials: dict[str, Column],
) -> DataFrame:
    """One partition's partial aggregates: the materialized state shape.

    ``partials``: output name -> aggregate expression (count/sum/min/
    max family). The result is small (one row per live key) — this is
    the frame a pipeline persists between refreshes.
    """
    return df.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in partials.items()]
    )


def merge_partial_aggregates(
    parts: Sequence[DataFrame],
    keys: Sequence[str],
    combine: dict[str, Column],
) -> DataFrame:
    """Fold partial-aggregate frames into one: the refresh step.

    ``combine``: output name -> aggregate over the partial columns
    (count -> sum(partial_count), sum -> sum(partial_sum), min ->
    min(partial_min), ...). Associative and commutative, so refreshes
    chain: merge(merge(a, b), c) == merge(a, b, c) — any accumulation
    cadence gives the same answer. The shuffle moves |keys| x
    len(parts) rows, never fact rows.
    """
    if not parts:
        raise ValueError("merge_partial_aggregates needs at least one part")
    merged = reduce(lambda a, b: a.unionByName(b), parts)
    return merged.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in combine.items()]
    )


def hll_partials(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    lg_k: int = 12,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """One partition's mergeable distinct-count state: Datasketches HLL.

    Exact distinct is the canonical NON-algebraic measure (partial
    distinct counts don't add), so the incremental-maintenance pattern
    switches representation: keep one HLL sketch per key — a few KB of
    binary state whose union is lossless w.r.t. the sketch's own
    estimate. ``hll_sketch_agg`` runs JVM-side with map-side partial
    aggregation like any hash agg.

    ``lg_k`` = log2 of sketch buckets (12 -> 4096 buckets, ~1.6%
    relative standard error, ~2-4 KB per key). The same lg_k must be
    used for every partial that will later merge.
    """
    from pyspark.sql import functions as F

    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value_col), lg_k).alias(sketch_col)
    )


def merge_hll_partials(
    parts: Sequence[DataFrame],
    keys: Sequence[str],
    sketch_col: str = "hll_sketch",
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """Union per-key HLL sketches across partials and estimate.

    The union is associative and commutative (same contract as
    ``merge_partial_aggregates``): any refresh cadence yields the same
    merged sketch, and a delta refresh costs O(delta scan + |keys| x
    sketch bytes) — never a rescan of history. The output keeps the
    merged sketch (the next refresh's input state) alongside the
    integer estimate.
    """
    from functools import reduce as _reduce

    from pyspark.sql import functions as F

    if not parts:
        raise ValueError("merge_hll_partials needs at least one part")
    merged = _reduce(lambda a, b: a.unionByName(b), parts)
    out = merged.groupBy(*keys).agg(
        F.hll_union_agg(F.col(sketch_col)).alias(sketch_col)
    )
    return out.withColumn(
        estimate_col, F.hll_sketch_estimate(F.col(sketch_col))
    )
