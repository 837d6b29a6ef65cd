"""Join operators (SURVEY §2.3, J1-J5).

All dimension joins broadcast the small side explicitly — at 100 TB the
fact side never shuffles for an enrichment join. Catalyst would usually
auto-broadcast under the threshold anyway; the explicit hint makes the
physical plan deterministic regardless of stats availability.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enrich_left(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    select: dict[str, str] | None = None,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Left equi-join fact -> small dim, keep fact key, rename dim columns.

    reference: shared.py:28-39 (airlines/airports enrichment: join on
    code, drop the dim's duplicate key column, rename payload columns).
    ``select`` maps dim column -> output name; default keeps all non-key
    dim columns under their own names.
    """
    if select is not None:
        dim = dim.select(dim_key, *[F.col(src).alias(dst) for src, dst in select.items()])
    right = F.broadcast(dim) if broadcast_dim else dim
    joined = fact.join(right, fact[fact_key] == dim[dim_key], "left")
    return joined.drop(dim[dim_key])


def dedup_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Dedup the dimension on its key, then equi-join (J3).

    reference: aircrafts_lookup_to_kafka.py:35-42 —
    ``dropDuplicates([key])`` before the join prevents fact-row
    explosion on duplicate dim keys. Semantically load-bearing, not an
    optimization.
    """
    deduped = dim.dropDuplicates([key])
    right = F.broadcast(deduped) if broadcast_dim else deduped
    return fact.join(right, key, how)


def self_join_on(
    left: DataFrame, right: DataFrame, on: str | Sequence[str] | Column
) -> DataFrame:
    """Inner self-result join (J5: arrival-mode x departure-mode on callsign).

    reference: flights_lookup_to_kafka.py:48. Trivial wrapper kept for
    catalog completeness; both sides derive from the same aggregation so
    AQE plans the exchange reuse.
    """
    return left.join(right, on)


def semi_join(
    fact: DataFrame, other: DataFrame, fact_key: str, other_key: str,
    broadcast_other: bool = True,
) -> DataFrame:
    """Rows of ``fact`` with >= 1 match in ``other`` (EXISTS).

    Not in the reference's surface (SURVEY §2.3 note) but exposed as a
    library primitive: MIN_FLIGHTS-style qualification patterns express
    naturally as a semi join against the qualifying key set, and the
    left_semi plan never duplicates fact rows or carries other's columns.
    """
    right = other.select(F.col(other_key).alias(fact_key))
    if broadcast_other:
        right = F.broadcast(right)
    return fact.join(right, fact_key, "left_semi")


def anti_join(
    fact: DataFrame, other: DataFrame, fact_key: str, other_key: str,
    broadcast_other: bool = True,
) -> DataFrame:
    """Rows of ``fact`` with NO match in ``other`` (NOT EXISTS)."""
    right = other.select(F.col(other_key).alias(fact_key))
    if broadcast_other:
        right = F.broadcast(right)
    return fact.join(right, fact_key, "left_anti")


# ---------------------------------------------------------------------------
# J11: Bloom-filter semi join — pre-filter the fact side BEFORE the
# shuffle when the key set is too big to broadcast raw.
# ---------------------------------------------------------------------------

BLOOM_DEPTH = 2


def bloom_filter_words(
    keys: DataFrame, key_col: str, m_bits: int, depth: int = BLOOM_DEPTH
) -> DataFrame:
    """(word_idx, word): a deterministic Bloom bitset over the key set,
    packed as int64 words carrying 32 meaningful bits each (bit 63
    shifts overflow DuckDB's checked ``<<``, and 32-bit masks keep
    every word positive in both engines). Bit positions are salted
    60-bit md5 hashes mod m_bits (the house cross-engine hash), so the
    filter is reproducible anywhere. Size: <= m_bits/32 rows no matter
    how many keys — the broadcastable summary of an un-broadcastable
    key set."""
    from big_data_flight_analytics_spark.operators.sketches import (
        _cms_bucket,
    )

    k = F.col(key_col)
    positions = keys.filter(k.isNotNull()).select(
        F.explode(
            F.array(*[_cms_bucket(k, j, m_bits) for j in range(depth)])
        ).alias("pos")
    )
    return (
        positions.select(
            F.expr("pos div 32").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))"
            ).alias("__mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__mask").alias("word"))
    )


def bloom_semi_join(
    fact: DataFrame,
    fact_key: str,
    keys: DataFrame,
    key_col: str,
    m_bits: int,
    depth: int = BLOOM_DEPTH,
) -> DataFrame:
    """Fact rows whose key MIGHT be in ``keys``: a superset of the true
    semi join (no false negatives, ever; false-positive rate
    (1 - e^(-depth*n/m))^depth). The exact join over the survivors
    removes false positives downstream.

    100 TB shape: this is the move when the key set is too large to
    broadcast as a hash relation but its fixed-size bitset is not —
    each probe is ``depth`` broadcast joins against the <= m/32-row
    word table plus a bit test, entirely map-side, so the fact side
    sheds non-matching rows BEFORE any shuffle. (Catalyst's own runtime
    bloom pushdown covers some of these plans; the explicit operator
    makes the pre-filter deterministic, engine-replayable, and
    available to foreachBatch/streaming code paths the optimizer can't
    see.)"""
    # the word table is referenced once per probe depth (each probe is
    # its own broadcast join), and without materialization each
    # reference re-runs the full key-side scan + bit aggregation.
    # Eagerly checkpointed (r16): the table is <= m_bits/32 rows at any
    # key-set size. The streaming face (BloomSink -> bloom_probe)
    # passes an already-stored word table and is untouched.
    from big_data_flight_analytics_spark.cache import once_checkpoint

    return bloom_probe(
        fact,
        fact_key,
        once_checkpoint(bloom_filter_words(keys, key_col, m_bits, depth)),
        m_bits,
        depth,
    )


def bloom_probe(
    fact: DataFrame,
    fact_key: str,
    words: DataFrame,
    m_bits: int,
    depth: int = BLOOM_DEPTH,
) -> DataFrame:
    """Probe a PRE-BUILT Bloom word table (bloom_filter_words layout):
    fact rows whose key might be in the filtered set. The streaming
    face (BloomSink) maintains the word table incrementally and probes
    arriving batches through this same path, so stream and batch
    answers coincide by construction."""
    from big_data_flight_analytics_spark.operators.sketches import (
        _cms_bucket,
    )

    out = fact
    for j in range(depth):
        w = F.broadcast(
            words.select(
                F.col("word_idx").alias(f"__wi{j}"),
                F.col("word").alias(f"__w{j}"),
            )
        )
        out = (
            out.withColumn(f"__pos{j}", _cms_bucket(F.col(fact_key), j, m_bits))
            .join(
                w,
                F.expr(f"__pos{j} div 32") == F.col(f"__wi{j}"),
                "left",
            )
            .filter(
                F.expr(
                    f"(shiftright(__w{j}, CAST(__pos{j} % 32 AS INT)) & 1) = 1"
                )
            )
            .drop(f"__pos{j}", f"__wi{j}", f"__w{j}")
        )
    return out


# --- join-strategy advisor (a18 made actionable) -------------------------
#
# The CMS inner product (a18_join_size_estimate) answers "how big is
# this join" from two fixed-size sketches without running it; the
# advisor turns that into the physical decision a planner actually
# makes. Documented thresholds:
#
#   keys side fits a broadcast hash relation  -> broadcast
#   else join sheds > half the fact pre-shuffle -> bloom_semi_join
#   else                                        -> shuffle
#
# BROADCAST_MAX_ROWS defaults to ~1M key rows (a few tens of MB of
# hashed longs — Spark's autoBroadcastJoinThreshold territory); it is
# a parameter because the real bound is executor memory, not a
# constant. BLOOM_MAX_SURVIVAL = 0.5: a bloom pre-filter pays for its
# two map-side probes only if it sheds a material fraction of the
# fact side before the shuffle; past half survival, the plain
# shuffled join is the honest plan. The CMS estimate is an
# OVERESTIMATE of matching fact rows (collisions only add), so the
# regime check errs toward shuffle — never toward a uselessly dense
# bloom.

BROADCAST_MAX_ROWS = 1_000_000
BLOOM_MAX_SURVIVAL = 0.5
ADVISOR_CMS_WIDTH = 8192


def advise_join_strategy(
    n_key_rows: int,
    est_matching_rows: int,
    n_fact_rows: int,
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
    bloom_max_survival: float = BLOOM_MAX_SURVIVAL,
) -> str:
    """Pure decision rule: pick the physical semi-join strategy from
    three planner scalars (see module comment for the thresholds).
    Returns ``"broadcast"``, ``"bloom_semi_join"``, or ``"shuffle"``."""
    if n_key_rows <= broadcast_max_rows:
        return "broadcast"
    if n_fact_rows > 0 and est_matching_rows <= bloom_max_survival * n_fact_rows:
        return "bloom_semi_join"
    return "shuffle"


def estimate_semi_join(
    fact: DataFrame,
    fact_key: str,
    keys: DataFrame,
    key_col: str,
    width: int = ADVISOR_CMS_WIDTH,
    keys_distinct: bool = False,
    n_keys: int | None = None,
) -> tuple[int, int, int]:
    """Gather the advisor's three scalars: (n_distinct_keys,
    est_matching_fact_rows, n_fact_rows).

    The estimate is the a18 CMS inner product of the fact-key sketch
    against the DISTINCT-key sketch — with the key side deduplicated,
    the inner join size IS the count of matching fact rows, so the
    estimate bounds semi-join survival from above. The per-depth-row
    product joins the grids LEFT from the fact side: a fact bucket
    with no key-side collision contributes 0 (inner-joining would
    silently DROP a zero-overlap depth row from the min — exactly the
    row carrying the tightest estimate on disjoint domains). Cost: one
    fixed-size sketch aggregate per side — O(scan) with O(width)
    outputs, never materializing the join; the fact scan is
    column-pruned to the key and also yields n_fact (each sketch depth
    row counts every non-null fact key once), so the fact table is
    read exactly once. The collects are planner state (three
    integers), the same class as AQE's runtime statistics — not a
    data funnel. Pass ``keys_distinct=True`` when ``keys`` is
    already deduplicated (skips a shuffle), and ``n_keys`` when the
    caller already counted the distinct keys (skips the count job —
    planned_semi_join counts first for its broadcast short-circuit)."""
    from big_data_flight_analytics_spark.operators.sketches import (
        cms_sketch,
    )

    distinct_keys = keys.select(F.col(key_col).alias("__k"))
    if not keys_distinct:
        distinct_keys = distinct_keys.distinct()
    ga = cms_sketch(
        fact.select(F.col(fact_key).alias("__k")), "__k", width
    ).select("row_j", "bucket", F.col("cnt").alias("__ca"))
    gb = cms_sketch(distinct_keys, "__k", width).select(
        "row_j", "bucket", F.col("cnt").alias("__cb")
    )
    # n_fact rides the SAME aggregation: each depth row of the fact
    # sketch counts every non-NULL fact key exactly once, so
    # sum(__ca) per row_j IS the fact row count — the former separate
    # fact.count() was a second full pass over the fact table for a
    # number the sketch pass already knows (guide §1.2: don't compute
    # things twice). NULL-keyed fact rows are excluded now; they can
    # never match a key, so the non-null count is the tighter advisor
    # denominator — and planned_semi_join's output is
    # strategy-invariant regardless.
    est_rows = (
        ga.join(gb, ["row_j", "bucket"], "left")
        .groupBy("row_j")
        .agg(
            F.sum(F.col("__ca") * F.col("__cb")).alias("__e"),
            F.sum(F.col("__ca")).alias("__n"),
        )
        .agg(
            F.min(F.coalesce(F.col("__e"), F.lit(0)))
            .cast("long")
            .alias("__est"),
            F.max(F.col("__n")).cast("long").alias("__nf"),
        )
        .collect()
    )
    est = int(est_rows[0]["__est"] or 0)
    n_fact = int(est_rows[0]["__nf"] or 0)
    if n_keys is None:
        n_keys = distinct_keys.count()
    return n_keys, est, n_fact


def planned_semi_join(
    fact: DataFrame,
    fact_key: str,
    keys: DataFrame,
    key_col: str,
    *,
    m_bits: int = 1 << 17,
    depth: int = BLOOM_DEPTH,
    width: int = ADVISOR_CMS_WIDTH,
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
    bloom_max_survival: float = BLOOM_MAX_SURVIVAL,
) -> tuple[DataFrame, str]:
    """Exact left-semi join of ``fact`` against ``keys``, executed by
    whichever strategy :func:`advise_join_strategy` picks from the
    sketch estimate — returns ``(result, strategy)``. The result is
    strategy-INVARIANT (the bloom path's false positives are removed
    by the exact join over the survivors), so callers can let the
    advisor adapt to scale without their answers changing.

    The distinct-key frame is built once, pinned, and shared by the
    estimator and whichever execution path runs (the key-side dedup
    shuffle is paid exactly once). The key count runs FIRST and
    short-circuits the broadcast regime: ``advise_join_strategy``
    ignores the CMS estimate when the key side already fits a
    broadcast, so paying the two sketch passes there would be planner
    work the decision never reads (ADVICE r14)."""
    from big_data_flight_analytics_spark.cache import tracked_persist

    distinct_keys = tracked_persist(
        keys.select(F.col(key_col).alias(fact_key)).distinct()
    )
    n_keys = distinct_keys.count()
    if n_keys <= broadcast_max_rows:
        # same first rule advise_join_strategy applies; est/n_fact
        # are never consulted in this regime
        strategy = "broadcast"
    else:
        _, est, n_fact = estimate_semi_join(
            fact,
            fact_key,
            distinct_keys,
            fact_key,
            width,
            keys_distinct=True,
            n_keys=n_keys,
        )
        strategy = advise_join_strategy(
            n_keys, est, n_fact, broadcast_max_rows, bloom_max_survival
        )
    if strategy == "broadcast":
        out = fact.join(F.broadcast(distinct_keys), fact_key, "left_semi")
    elif strategy == "bloom_semi_join":
        survivors = bloom_semi_join(
            fact, fact_key, distinct_keys, fact_key, m_bits, depth
        )
        out = survivors.join(distinct_keys, fact_key, "left_semi")
    else:
        out = fact.join(distinct_keys, fact_key, "left_semi")
    return out, strategy


def fuzzy_blocked_join(
    left: DataFrame,
    right: DataFrame,
    block_cols: Sequence[str],
    fuzzy_left: str,
    fuzzy_right: str,
    max_dist: int | None = None,
) -> DataFrame:
    """Entity-resolution join: equi-join on the BLOCKING columns (the
    stable attributes two records of the same entity agree on), then
    verify the dirty field with Levenshtein edit distance — appended as
    ``lev``; rows above ``max_dist`` are dropped when a bound is given.

    This is the classic blocking+matching shape: the O(n^2) fuzzy
    comparison only ever runs INSIDE blocks (the equi-join shuffles on
    the block key like any join; Levenshtein is evaluated post-match,
    row-at-a-time in codegen — both Spark and DuckDB implement the
    textbook unit-cost DP, so distances replay bit-identically).
    Callers pick blocks selective enough to bound block sizes; skewed
    blocks are the k1/k2 salting territory."""
    keys = list(block_cols)
    out = left.join(right, keys).withColumn(
        "lev", F.levenshtein(F.col(fuzzy_left), F.col(fuzzy_right))
    )
    if max_dist is not None:
        out = out.filter(F.col("lev") <= max_dist)
    return out
