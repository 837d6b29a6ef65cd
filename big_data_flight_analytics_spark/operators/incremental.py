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
