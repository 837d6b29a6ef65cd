"""SCD Type-2 merge: versioned dimension maintenance.

Applies a batch of keyed updates to a history-keeping dimension:
unchanged rows pass through, changed keys close their open version
(``valid_to`` = update time) and append a new open version. The
standard warehouse pattern for attributes that must be queryable
as-of any point in time.

Scale design: one shuffle on the dimension key for the updates
aggregation and one co-partitioned left join against the open
versions; closed history rows pass through untouched (union, no
shuffle). Equivalent to ``MERGE INTO`` in table-format engines — the
deterministic DataFrame form works on plain parquet.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_updates(
    updates: DataFrame, key: str, ts_col: str, tie_col: str
) -> DataFrame:
    """One row per key: the latest update (max ts, tie -> max tie)."""
    w = Window.partitionBy(key).orderBy(
        F.col(ts_col).desc(), F.col(tie_col).desc()
    )
    return (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    attr: str,
    update_ts_us: str,
) -> DataFrame:
    """Merge updates into an SCD2 dimension.

    ``current``: (key, attr, valid_from_us, valid_to_us NULL-for-open,
    is_current). ``updates``: (key, attr, update_ts_us) — pre-reduced
    to one row per key (see ``latest_updates``). A key changes only if
    the update's attr differs from its OPEN version's attr and the
    update is strictly newer than ``valid_from_us``.

    Output has the same schema as ``current``.
    """
    closed = current.filter(~F.col("is_current"))
    open_rows = current.filter(F.col("is_current"))

    upd = updates.select(
        F.col(key),
        F.col(attr).alias("__new_attr"),
        F.col(update_ts_us).alias("__ts"),
    )
    joined = open_rows.join(upd, key, "left")
    change = (
        F.col("__new_attr").isNotNull()
        & (F.col("__new_attr") != F.col(attr))
        & (F.col("__ts") > F.col("valid_from_us"))
    )
    unchanged_open = joined.filter(~F.coalesce(change, F.lit(False))).select(
        *current.columns
    )
    closed_out = joined.filter(change).select(
        F.col(key),
        F.col(attr),
        F.col("valid_from_us"),
        F.col("__ts").alias("valid_to_us"),
        F.lit(False).alias("is_current"),
    )
    new_open = joined.filter(change).select(
        F.col(key),
        F.col("__new_attr").alias(attr),
        F.col("__ts").alias("valid_from_us"),
        F.lit(None).cast("long").alias("valid_to_us"),
        F.lit(True).alias("is_current"),
    )
    return (
        closed.select(*current.columns)
        .unionByName(unchanged_open)
        .unionByName(closed_out)
        .unionByName(new_open)
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    seq: Sequence[str],
    op_col: str = "op",
    payload: Sequence[str] | None = None,
) -> DataFrame:
    """CDC MERGE: fold an insert/update/delete changeset into a snapshot.

    ``changes`` carries ``key``, ``op_col`` ('I'/'U'/'D'), ordering
    columns ``seq`` (last writer wins; include a unique tie-break) and
    the ``payload`` columns of the target schema. Semantics match SQL
    MERGE applied in ``seq`` order per key:

    - key's last change is I/U  -> row present with that payload
      (whether or not it existed in ``base`` — upsert);
    - key's last change is D    -> row absent;
    - key untouched by changes  -> base row passes through.

    Plan shape: ONE shuffle of the (small) changeset for the per-key
    last-writer window, then one left-anti join against base keyed on
    ``key`` — base rows never reshuffle more than the join demands, and
    with base stored bucketed on ``key`` (`sources/bucketed.py`) the
    refresh is a map-side merge at any scale. This is the batch
    equivalent of the streaming upsert sink (`streaming/sinks.py`).
    """
    from pyspark.sql import Window as _Window

    if payload is None:
        payload = [c for c in base.columns if c != key]
    w = _Window.partitionBy(key).orderBy(
        *[F.col(c).desc() for c in seq]
    )
    last = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(key, op_col, *payload)
    )
    surviving_changes = last.filter(F.col(op_col) != "D").select(key, *payload)
    untouched = base.join(last.select(key), key, "left_anti").select(
        key, *payload
    )
    return untouched.unionByName(surviving_changes)
