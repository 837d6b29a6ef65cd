"""Custom stateful streaming operator: cross-batch first-seen dedup.

``dropDuplicates`` on a stream can suppress repeats, but it cannot
REPORT on them or bound its state explicitly. This operator keeps one
small state row per fingerprint (count of occurrences seen) via
``applyInPandasWithState`` and emits a record only the FIRST time a
fingerprint appears — the streaming counterpart of
``operators/dedup.exact_dedup`` for continuous ingestion (e.g. a
training-data feed where repeated documents must be dropped at the
door).

Scale design: state is one (fingerprint -> count) entry in the state
store, partitioned by the group key like any streaming aggregation —
memory is bounded by distinct-fingerprint cardinality, not event
volume, and Arrow-batched pandas handles each group's rows vectorized.
At 100 TB feed scale you'd add a TTL (GroupStateTimeout) to age out
old fingerprints; kept NoTimeout here so replay tests are
deterministic.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

OUTPUT_SCHEMA = StructType(
    [
        StructField("fingerprint", StringType()),
        StructField("icao24", StringType()),
        StructField("first_seen_us", LongType()),
    ]
)

STATE_SCHEMA = StructType([StructField("seen", LongType())])


def _first_seen(
    key: tuple[Any, ...],
    pdfs: Iterable["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    seen = state.get[0] if state.exists else 0
    batches = [pdf for pdf in pdfs if len(pdf)]
    n_new = sum(len(pdf) for pdf in batches)
    if seen == 0 and n_new:
        rows = pd.concat(batches, ignore_index=True)
        first = rows.sort_values(
            ["event_us", "icao24"], kind="mergesort"
        ).iloc[0]
        yield pd.DataFrame(
            {
                "fingerprint": [key[0]],
                "icao24": [first["icao24"]],
                "first_seen_us": [int(first["event_us"])],
            }
        )
    state.update((seen + n_new,))


def first_seen_dedup(stream: DataFrame, fingerprint_col: str = "fingerprint") -> DataFrame:
    """Emit each fingerprint's first occurrence only, across batches.

    Input must carry ``fingerprint``, ``icao24`` and ``event_us``
    (epoch-micros long — Arrow-stable, unlike raw timestamps).
    Within a batch the earliest (event_us, icao24) row wins, so the
    operator is deterministic under replay.
    """
    return stream.groupBy(fingerprint_col).applyInPandasWithState(
        _first_seen,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def watermarked_dedup(
    stream: DataFrame,
    key_cols: tuple[str, ...] = ("fingerprint",),
    event_time_col: str = "event_time",
    delay: str = "10 minutes",
) -> DataFrame:
    """Built-in bounded-state streaming dedup — the idiomatic Spark
    counterpart of ``first_seen_dedup`` when per-duplicate REPORTING is
    not needed: ``dropDuplicatesWithinWatermark`` suppresses repeats of
    a key arriving within ``delay`` of its first occurrence, and the
    state store ages entries out at the watermark. This is exactly the
    TTL behavior the custom operator's docstring names as its 100 TB
    swap point, with zero Python in the hot path (fully JVM-side).
    """
    return stream.withWatermark(event_time_col, delay).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
