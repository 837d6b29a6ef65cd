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
