"""Declarative data-quality constraints: the one-pass expectation check.

Deequ/dbt-test-shaped validation as an engine operator: the caller
declares expectations (not-null, unique, value range, accepted set,
referential integrity) and gets back a tall constraint report —
``(check_name, violations, checked, passed)`` — computed with the
minimum plan:

- every ROW-LEVEL check (not-null / range / in-set) is one conditional
  sum in a SINGLE aggregate over a SINGLE scan — adding a constraint
  adds a column to the agg, never a pass over the data;
- ``unique`` rides the same aggregate via count-distinct;
- each referential-integrity check is one broadcast anti-join count
  (the dim is small by definition; a huge right side would use the
  same plan with a shuffle join).

At 100 TB this is the difference between a constraint suite that costs
one table scan and the naive one-query-per-check harness that costs
len(checks) scans.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REPORT_COLS = ("check_name", "violations", "checked", "passed")


def _viol(cond: Column) -> Column:
    """Count of rows violating (cond = the VIOLATION predicate)."""
    return F.sum(F.when(cond, 1).otherwise(0)).cast("long")


def constraint_report(
    df: DataFrame,
    not_null: Sequence[str] = (),
    unique: Sequence[str] = (),
    ranges: Mapping[str, tuple[float, float]] | None = None,
    in_set: Mapping[str, Sequence[str]] | None = None,
    fks: Sequence[tuple[str, DataFrame, str]] = (),
) -> DataFrame:
    """Evaluate all declared constraints; return the tall report.

    ``ranges``: col -> (lo, hi) inclusive. ``in_set``: col -> accepted
    values. ``fks``: (col, dim_frame, dim_col) — a violation is a
    non-null value absent from the dim. Constraint names are
    deterministic (``kind(col)``), so the report is oracle-stable.
    """
    ranges = dict(ranges or {})
    in_set = dict(in_set or {})
    aggs: list[Column] = [F.count(F.lit(1)).cast("long").alias("__checked")]
    names: list[str] = []
    for c in not_null:
        names.append(f"not_null({c})")
        aggs.append(_viol(F.col(c).isNull()).alias(f"__v{len(names)}"))
    for c, (lo, hi) in ranges.items():
        names.append(f"range({c})")
        aggs.append(
            _viol(
                F.col(c).isNotNull()
                & ((F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi)))
            ).alias(f"__v{len(names)}")
        )
    for c, accepted in in_set.items():
        names.append(f"in_set({c})")
        aggs.append(
            _viol(
                F.col(c).isNotNull() & ~F.col(c).isin(list(accepted))
            ).alias(f"__v{len(names)}")
        )
    for c in unique:
        names.append(f"unique({c})")
        aggs.append(
            (
                F.sum(F.when(F.col(c).isNotNull(), 1).otherwise(0))
                - F.count_distinct(F.col(c))
            )
            .cast("long")
            .alias(f"__v{len(names)}")
        )

    if not names and not fks:
        raise ValueError("constraint_report: no constraints declared")
    reports: list[DataFrame] = []
    checked_frame: DataFrame | None = None
    if names:
        one = df.agg(*aggs)
        stack_args = ", ".join(
            f"'{name}', __v{i + 1}" for i, name in enumerate(names)
        )
        reports.append(
            one.selectExpr(
                f"stack({len(names)}, {stack_args}) "
                "AS (check_name, violations)",
                "__checked AS checked",
            )
        )
        checked_frame = one.select(F.col("__checked").alias("checked"))
    if fks and checked_frame is None:
        checked_frame = df.agg(
            F.count(F.lit(1)).cast("long").alias("checked")
        )
    if fks:
        # ONE extra row-count source shared by every fk report row (and
        # when row-level checks ran, it is the same aggregate — no
        # additional scan), instead of a fresh COUNT(*) scan per fk
        from big_data_flight_analytics_spark.cache import tracked_persist

        checked_frame = tracked_persist(checked_frame)
    for c, dim, dim_col in fks:
        viol_count = (
            df.select(F.col(c)).filter(F.col(c).isNotNull())
            .join(
                F.broadcast(dim.select(F.col(dim_col).alias(c)).distinct()),
                c,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).cast("long").alias("violations"))
        )
        reports.append(
            viol_count.crossJoin(checked_frame).select(
                F.lit(f"fk({c})").alias("check_name"), "violations", "checked"
            )
        )

    out = reports[0]
    for extra in reports[1:]:
        out = out.unionByName(extra)
    # SUM over zero rows is NULL — an empty frame has zero violations,
    # and every check on it passes vacuously
    v = F.coalesce("violations", F.lit(0))
    return out.select(
        "check_name",
        v.alias("violations"),
        "checked",
        (v == 0).alias("passed"),
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    k: int = 5,
    l_div: int = 3,
) -> DataFrame:
    """Per quasi-identifier group: re-identification risk metrics —
    ``group_n`` (the group's k: how many records share this QI
    combination) and ``l_distinct`` (distinct sensitive values — the l
    of l-diversity), with ``meets_k`` / ``meets_l`` flags. Groups below
    k are re-identifiable by linking the quasi-identifiers; groups
    below l leak the sensitive attribute even when k holds (everyone
    in the group shares it). The release decision is the caller's —
    this is the audit, the governance counterpart of the PII scrub
    (text.scrub_pii removes direct identifiers; k-anonymity measures
    the indirect ones).

    One map-combined groupBy over the quasi columns; NULL QI values
    form their own groups (both engines agree on GROUP BY NULL
    semantics). Scales with group count, not corpus."""
    gcols = list(quasi_cols)
    return (
        df.groupBy(*gcols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("group_n"),
            F.countDistinct(sensitive_col).cast("long").alias("l_distinct"),
        )
        .select(
            *gcols,
            "group_n",
            "l_distinct",
            (F.col("group_n") >= k).alias("meets_k"),
            (F.col("l_distinct") >= l_div).alias("meets_l"),
        )
    )


def k_anonymity_state(
    df: DataFrame, quasi_cols: Sequence[str], sensitive_col: str
) -> DataFrame:
    """Mergeable state for the k-anonymity audit: counts at the
    (quasi-identifiers, sensitive-value) grain — O(groups x values)
    rows, corpus-independent, and ADDITIVE, so arriving batches fold
    with one full-outer sum (the i1 contract for governance metrics:
    the released-data audit stays current without rescanning the
    corpus). The report derives from state alone
    (k_anonymity_from_state)."""
    gcols = list(quasi_cols)
    return df.groupBy(*gcols, sensitive_col).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def k_anonymity_fold(
    base: DataFrame,
    delta: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
) -> DataFrame:
    """Fold a delta state into the stored one: full-outer sum on the
    composite (QI, sensitive) key — O(state), associative and
    commutative."""
    keys = [*quasi_cols, sensitive_col]
    b = base.select(*keys, F.col("cnt").alias("__b"))
    d = delta.select(*keys, F.col("cnt").alias("__d"))
    return b.join(d, keys, "full").select(
        *keys,
        (
            F.coalesce(F.col("__b"), F.lit(0))
            + F.coalesce(F.col("__d"), F.lit(0))
        ).cast("long").alias("cnt"),
    )


def k_anonymity_from_state(
    state: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    k: int = 5,
    l_div: int = 3,
) -> DataFrame:
    """The p3 report derived from the mergeable state: group_n sums
    every row (NULL sensitive values count toward group size),
    l_distinct counts non-NULL sensitive grains (mirroring
    COUNT(DISTINCT) semantics). Sketch-sized work only."""
    gcols = list(quasi_cols)
    return (
        state.groupBy(*gcols)
        .agg(
            F.sum("cnt").cast("long").alias("group_n"),
            F.sum(
                F.when(F.col(sensitive_col).isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("l_distinct"),
        )
        .select(
            *gcols,
            "group_n",
            "l_distinct",
            (F.col("group_n") >= k).alias("meets_k"),
            (F.col("l_distinct") >= l_div).alias("meets_l"),
        )
    )


# --- dataset card (t25/i12) -----------------------------------------------
#
# The summary artifact a corpus release ships with: per-source volume,
# token/char totals, quality distribution endpoints, and language mix.
# The STATE lives one grain finer than the report — (source,
# lang_pred) — because that is the coarsest grain from which every
# report column still derives: the per-source language count and top
# language are NOT mergeable from per-source rows (two folded cards
# cannot recover how their language sets overlap), but they fall out
# of the (source, lang) state for free. Same doctrine as
# k_anonymity_state: keep mergeable state at the finest grain any
# derived answer needs, report off the state in O(state).

def dataset_card_state(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    side_col: str | None = None,
) -> DataFrame:
    """Mergeable (source, lang_pred)-grain card state. Sums are exact
    integers (token/char counts; quality at a fixed 1e-6 grain via
    half-up micro-rounding of the already-6dp score), min/max are
    selections — so the fold below is additive + idempotent with no
    float-order dependence anywhere.

    ``source`` rides the stats projection directly (r16): the old
    shape re-attached it with a doc_id self-join against the same
    input — a full extra scan plus a doc-grain join for a column the
    frame already had. ``side_col`` optionally joins the grouping key:
    a caller splitting one corpus into disjoint batches (i12) gets
    every batch's state from ONE text_stats pass, exactly equal to
    per-batch computation because grouping on (source, lang, side)
    partitions the same rows the per-side filters would."""
    from big_data_flight_analytics_spark.operators.text import text_stats

    keys = ["source", "lang_pred"] + ([side_col] if side_col else [])
    stats = text_stats(docs, text_col=text_col).select(
        F.col(source_col).alias("source"),
        "lang_pred",
        "n_tokens",
        "n_chars_calc",
        "quality",
        *([side_col] if side_col else []),
    )
    return (
        stats
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens_total"),
            F.sum("n_chars_calc").cast("long").alias("n_chars_total"),
            F.sum(
                F.floor(F.col("quality") * 1_000_000 + F.lit(0.5)).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("q_micro_total"),
            F.min("quality").alias("min_quality"),
            F.max("quality").alias("max_quality"),
        )
    )


def dataset_card_fold(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold two disjoint-subset card states: full-outer on the
    (source, lang_pred) key; counts/sums add, endpoints re-select."""
    keys = ["source", "lang_pred"]
    sums = ["n_docs", "n_tokens_total", "n_chars_total", "q_micro_total"]
    b = base.select(
        *keys,
        *[F.col(c).alias(f"__b_{c}") for c in sums],
        F.col("min_quality").alias("__b_min"),
        F.col("max_quality").alias("__b_max"),
    )
    d = delta.select(
        *keys,
        *[F.col(c).alias(f"__d_{c}") for c in sums],
        F.col("min_quality").alias("__d_min"),
        F.col("max_quality").alias("__d_max"),
    )
    return b.join(d, keys, "full").select(
        *keys,
        *[
            (
                F.coalesce(F.col(f"__b_{c}"), F.lit(0))
                + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
            )
            .cast("long")
            .alias(c)
            for c in sums
        ],
        F.least(
            F.coalesce(F.col("__b_min"), F.col("__d_min")),
            F.coalesce(F.col("__d_min"), F.col("__b_min")),
        ).alias("min_quality"),
        F.greatest(
            F.coalesce(F.col("__b_max"), F.col("__d_max")),
            F.coalesce(F.col("__d_max"), F.col("__b_max")),
        ).alias("max_quality"),
    )


def dataset_card_report(state: DataFrame) -> DataFrame:
    """Per-source card off the state: totals, mean/min/max quality,
    language count and deterministic top language (most docs, ties to
    the smallest label). O(state) work — one grouped aggregate and one
    state-sized window."""
    from pyspark.sql import Window

    per_src = state.groupBy("source").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("n_tokens_total").cast("long").alias("n_tokens_total"),
        F.sum("n_chars_total").cast("long").alias("n_chars_total"),
        F.sum("q_micro_total").cast("long").alias("q_micro_total"),
        F.min("min_quality").alias("min_quality"),
        F.max("max_quality").alias("max_quality"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("n_docs").desc(), F.col("lang_pred").asc()
    )
    top = (
        state.select("source", "lang_pred", "n_docs")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("source", F.col("lang_pred").alias("top_lang"))
    )
    return per_src.join(top, "source").select(
        "source",
        "n_docs",
        "n_tokens_total",
        "n_chars_total",
        F.round(
            F.col("q_micro_total").cast("double")
            / F.col("n_docs")
            / F.lit(1_000_000.0),
            6,
        ).alias("mean_quality"),
        "min_quality",
        "max_quality",
        "n_langs",
        "top_lang",
    )
