"""Timer-driven stateful streaming: the transformWithState generation.

``applyInPandasWithState`` (streaming/stateful.py) can hold state but
cannot WAKE UP without input — a session can only close when its key
receives another event. Spark 4's ``transformWithStateInPandas`` adds
event-time TIMERS: the operator registers a wake-up at
``last_event + gap`` and emits the closed session when the watermark
passes it, whether or not the key ever speaks again. That is the
correct sessionization contract for continuous feeds (the
applyInPandas formulation would hold an idle user's last session open
forever).

Environment gate: ``transformWithStateInPandas`` requires
``google.protobuf`` for its state-server protocol; the sandbox image
does not ship it, so the end-to-end differential
(tests/test_transform_state.py) skips here and runs wherever protobuf
exists — the same pattern as the Kafka broker smoke test. The session
SEMANTICS are not gated: the fold logic is the pure function
``fold_session_events``, pytest-verified directly against the batch
sessionizer.

Scale shape: one ValueState row (start, last, count, timer) per LIVE
key — closed sessions leave the store immediately; the per-key timer
is deleted and re-registered on each event so exactly one is
outstanding.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import TYPE_CHECKING, Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

_STATE_SCHEMA = "start_us long, last_us long, n long, timer_ms long"


def fold_session_events(
    state: tuple[int, int, int] | None,
    sorted_us: Sequence[int],
    gap_us: int,
) -> tuple[list[tuple[int, int, int]], tuple[int, int, int] | None]:
    """Fold a key's time-ordered events into gap sessions.

    ``state`` is the open session ``(start_us, last_us, n)`` or None.
    Returns ``(closed_sessions, open_state)``. Pure — this is the
    entire session semantics of the streaming operator, and it is what
    the pytest differential checks against the batch sessionizer
    (delta > gap splits; delta == gap merges — identical to
    ``temporal.session_stats``).
    """
    closed: list[tuple[int, int, int]] = []
    start, last, n = state if state is not None else (None, None, 0)
    for us in sorted_us:
        us = int(us)
        if start is None:
            start, last, n = us, us, 1
        elif us - last > gap_us:
            closed.append((start, last, n))
            start, last, n = us, us, 1
        else:
            last, n = us, n + 1
    open_state = None if start is None else (start, last, n)
    return closed, open_state


def _make_timer_sessionizer(gap_us: int):
    """Build the StatefulProcessor lazily — the import needs protobuf,
    which is optional in this environment (see module docstring)."""
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    class _TimerSessionizer(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.state = handle.getValueState("session", _STATE_SCHEMA)

        @staticmethod
        def _emit(key: Any, start: int, last: int, n: int):
            import pandas as pd

            return pd.DataFrame(
                {
                    "user_id": [int(key[0])],
                    "start_us": [start],
                    "end_us": [last],
                    "n_events": [n],
                }
            )

        def handleInputRows(
            self,
            key: Any,
            rows: Iterator["pd.DataFrame"],
            timerValues: TimerValues,
        ) -> Iterator["pd.DataFrame"]:
            import pandas as pd

            batches = [p for p in rows if len(p)]
            if not batches:
                return
            pdf = pd.concat(batches, ignore_index=True).sort_values(
                ["event_us", "event_id"], kind="mergesort"
            )
            if self.state.exists():
                start, last, n, timer_ms = self.state.get()
                if timer_ms:
                    self.handle.deleteTimer(timer_ms)
                state = (start, last, n)
            else:
                state = None
            closed, open_state = fold_session_events(
                state, pdf["event_us"].tolist(), gap_us
            )
            for start, last, n in closed:
                yield self._emit(key, start, last, n)
            assert open_state is not None  # input was non-empty
            start, last, n = open_state
            # one outstanding wake-up at last + gap (ceil to ms so the
            # timer never fires a microsecond early)
            new_timer = -(-(last + gap_us) // 1000)
            self.handle.registerTimer(new_timer)
            self.state.update((start, last, n, new_timer))

        def handleExpiredTimer(
            self,
            key: Any,
            timerValues: TimerValues,
            expiredTimerInfo: ExpiredTimerInfo,
        ) -> Iterator["pd.DataFrame"]:
            if not self.state.exists():
                return
            start, last, n, _timer = self.state.get()
            yield self._emit(key, start, last, n)
            self.state.clear()

        def close(self) -> None:
            pass

    return _TimerSessionizer()


def timer_sessionize(stream: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Gap sessionization with event-time timer close.

    Input must carry ``user_id``, ``event_id``, ``event_us`` (epoch
    micros long) and an ``event_time`` TIMESTAMP column with a
    watermark already applied (timers fire off that watermark).
    Emits one row per CLOSED session: (user_id, start_us, end_us,
    n_events) — identical to the batch ``temporal.session_stats``
    frame modulo the session index.
    """
    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_timer_sessionizer(gap_s * 1_000_000),
        outputStructType=SESSION_OUTPUT,
        outputMode="Append",
        timeMode="EventTime",
    )
