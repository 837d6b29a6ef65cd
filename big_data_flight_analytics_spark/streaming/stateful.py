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
    DoubleType,
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


ZSCORE_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("event_us", LongType()),
        StructField("cents", LongType()),
        StructField("zscore", DoubleType()),
    ]
)

# running (n, sum, sum-of-squares) — exact int64, a few bytes per key
ZSCORE_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("s", LongType()),
        StructField("ss", LongType()),
    ]
)


def _make_running_zscore(min_periods: int):
    def _score_group(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        n0, s0, ss0 = state.get if state.exists else (0, 0, 0)
        batches = [p for p in pdfs if len(p)]
        if not batches:
            state.update((n0, s0, ss0))
            return
        rows = (
            pd.concat(batches, ignore_index=True)
            # null-valued events carry no scoreable value: dropped (a
            # NaN would otherwise crash the int64 conversion and kill
            # the whole query); mirrors the batch window skipping nulls
            .dropna(subset=["cents", "event_us", "event_id"])
            .sort_values(["event_us", "event_id"], kind="mergesort")
        )
        if not len(rows):
            state.update((n0, s0, ss0))
            return
        v = rows["cents"].to_numpy(dtype=np.int64)
        # exactness bound: the guard must cover the PRODUCT n*ss, not
        # just ss — var_num = n*ss - s*s, and n*ss can pass 2^63 while
        # ss alone sits under 2^62 (e.g. cents ~1e7 over a few hundred
        # prior rows). n*ss <= 2^62 bounds every intermediate: var_num
        # <= n*ss, s*s <= n*ss (Cauchy-Schwarz), and |v*n - s| <
        # sqrt(n*ss)*sqrt(n) + sqrt(n*ss) < 2^63. Python ints are
        # exact, so the check itself cannot wrap. Fail loud — the fix
        # is a coarser value grain, not garbage output.
        n_final = n0 + len(v)
        ss_final = ss0 + int((v.astype(object) ** 2).sum())
        if n_final * ss_final > (1 << 62):
            raise OverflowError(
                "running_zscore: n * expanding sum-of-squares exceeds "
                "2^62; rescale the integer value grain (see docstring)"
            )
        # prior-state vectors: state BEFORE each row, shifted cumsums
        n_prior = n0 + np.arange(len(v), dtype=np.int64)
        s_prior = s0 + np.concatenate(([0], np.cumsum(v)[:-1]))
        ss_prior = ss0 + np.concatenate(([0], np.cumsum(v * v)[:-1]))
        var_num = n_prior * ss_prior - s_prior * s_prior
        ok = (n_prior >= min_periods) & (var_num > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (v * n_prior - s_prior).astype(np.float64) / np.sqrt(
                var_num.astype(np.float64)
            )
        out = pd.DataFrame(
            {
                "user_id": rows["user_id"].to_numpy(dtype=np.int64),
                "event_id": rows["event_id"].to_numpy(dtype=np.int64),
                "event_us": rows["event_us"].to_numpy(dtype=np.int64),
                "cents": v,
            }
        )
        # None (not NaN) where the trail is short/flat -> SQL NULL
        out["zscore"] = pd.Series(z).where(pd.Series(ok), other=None)
        yield out
        state.update(
            (
                int(n0 + len(v)),
                int(s0 + int(v.sum())),
                int(ss0 + int((v * v).sum())),
            )
        )

    return _score_group


def running_zscore(
    stream: DataFrame, min_periods: int = 3
) -> DataFrame:
    """Expanding z-score per user, scored online across micro-batches.

    The streaming counterpart of ``operators.temporal.rolling_zscore(
    window=None, dp=None)``: each event is scored against ALL prior
    events of its key using running ``(n, sum, sum_sq)`` int64 state —
    a dozen bytes per key regardless of history length. The float work
    is the identical cast/sqrt/divide chain, so given a per-key
    time-ordered feed the emitted scores equal the batch expanding
    window BIT-FOR-BIT (see the differential test).

    Input must carry ``user_id``, ``event_id``, ``event_us`` (epoch
    micros long) and ``cents`` (exact integer value grain). Within a
    micro-batch rows are ordered by (event_us, event_id); ACROSS
    batches ordering is the replay/source contract (same as
    ``first_seen_dedup``) — late rows score against a state that
    already includes newer events, which is the standard online-scoring
    semantics.

    Exactness bound: ``n * sum_sq`` (count times expanding
    sum-of-squares) must stay under 2^62 — that product bounds every
    int64 intermediate (``var_num <= n*ss``; ``s^2 <= n*ss`` by
    Cauchy-Schwarz). Choose the grain so value^2 x history^2 fits;
    the operator raises OverflowError at the bound rather than
    wrapping.
    """
    return stream.groupBy("user_id").applyInPandasWithState(
        _make_running_zscore(min_periods),
        outputStructType=ZSCORE_OUTPUT,
        stateStructType=ZSCORE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
