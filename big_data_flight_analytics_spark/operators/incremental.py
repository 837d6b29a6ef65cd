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


def dedup_index(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Build the persisted exact-dedup state: fingerprint -> canonical.

    One row per distinct content fingerprint with the corpus-wide
    canonical (min id) and the duplicate count. This is the frame a
    pipeline persists between ingest batches — at 100 TB it should be
    written BUCKETED by ``fingerprint`` (``sources/bucketed.py``) so
    every later ``dedup_delta`` refresh joins against it without
    re-shuffling the index.
    """
    from pyspark.sql import functions as F

    from big_data_flight_analytics_spark.functions.text import rolling_fingerprint

    return (
        df.select(rolling_fingerprint(F.col(text_col)).alias("fingerprint"), id_col)
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def dedup_delta(
    index: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Dedup ONE new ingest batch against a persisted index: O(delta) work.

    The 100 TB ingest pattern: the corpus-wide dedup state lives as a
    ``dedup_index`` frame; each arriving batch is fingerprinted, deduped
    within itself (one shuffle over the DELTA only), then left-joined
    against the index — never a rescan or re-shuffle of the full corpus.
    With the index stored bucketed by fingerprint the join is
    shuffle-free on the index side; the delta side moves O(|delta|)
    rows regardless of corpus size.

    Returns ``(assignments, updated_index)``:

    - ``assignments`` — one row per NEW doc: ``(id, fingerprint,
      canonical_doc_id, dup_of_index)``. The canonical is the min id
      across index AND delta (``least`` handles out-of-order ids), so
      chained refreshes agree with a from-scratch rebuild.
    - ``updated_index`` — the next round's state: same shape as
      ``dedup_index``, and EXACTLY equal to rebuilding the index over
      the union (the associativity contract shared with
      ``merge_partial_aggregates``; min/count are algebraic).

    Exact-once delivery caveat applies as for partial aggregates: a
    delta folded twice inflates ``dup_count`` (canonicals stay correct
    — min is idempotent).
    """
    from pyspark.sql import functions as F

    from big_data_flight_analytics_spark.functions.text import rolling_fingerprint

    delta_fp = new_docs.select(
        rolling_fingerprint(F.col(text_col)).alias("fingerprint"), id_col
    )
    delta_groups = delta_fp.groupBy("fingerprint").agg(
        F.min(id_col).alias("__delta_canonical"),
        F.count(F.lit(1)).alias("__delta_count"),
    )
    idx = index.select(
        "fingerprint",
        F.col("canonical_doc_id").alias("__idx_canonical"),
        F.col("dup_count").alias("__idx_count"),
    )
    resolved = delta_groups.join(idx, "fingerprint", "left").select(
        "fingerprint",
        F.least(
            F.coalesce("__idx_canonical", "__delta_canonical"), "__delta_canonical"
        ).alias("canonical_doc_id"),
        F.col("__idx_canonical").isNotNull().alias("dup_of_index"),
        (F.coalesce("__idx_count", F.lit(0)) + F.col("__delta_count")).alias(
            "dup_count"
        ),
    )
    assignments = delta_fp.join(
        resolved.select("fingerprint", "canonical_doc_id", "dup_of_index"),
        "fingerprint",
    ).select(id_col, "fingerprint", "canonical_doc_id", "dup_of_index")
    untouched = idx.join(delta_groups, "fingerprint", "left_anti").select(
        "fingerprint",
        F.col("__idx_canonical").alias("canonical_doc_id"),
        F.col("__idx_count").alias("dup_count"),
    )
    updated_index = untouched.unionByName(
        resolved.select("fingerprint", "canonical_doc_id", "dup_count")
    )
    return assignments, updated_index


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
