"""IO12: external API poller — engine-side ingestion of a polled REST
feed into a streamable source.

reference: producer/producer.py:56-98 (``produce_from_opensky``: fetch
states every ``interval`` seconds, reshape each state vector to the
flat flight-data record, push to Kafka; empty fetches logged as rate
limiting; errors swallowed and retried on the next tick).

Engine re-expression: the poller is transport-agnostic — ``fetch_fn``
is injected (the OpenSky client, any REST endpoint, or a test fake; no
network library is baked in), and the sink is any callable taking a
record batch. Two batteries-included sinks compose with the rest of
the engine:

- ``FileReplay.write_batch`` (IO13) — polled batches become a
  deterministic file-stream source, so the SAME Structured Streaming
  jobs run against live polling and recorded replays;
- ``write_kafka``/``kafka_message_frame`` (IO6) when a broker exists.

Hardening beyond the reference (its loop swallows every error and
never backs off — a down API gets hammered every tick):

- exponential backoff with cap on consecutive fetch errors, reset on
  success;
- optional dedup of UNCHANGED payloads (OpenSky repeats the same
  snapshot inside its cache window; replaying identical batches only
  inflates downstream state);
- bounded runs (``max_polls``) and cooperative shutdown
  (``stop_event``) instead of KeyboardInterrupt-only exit;
- injected ``clock``/``sleep`` so every timing path is unit-testable
  without wall-clock waits.

This is driver-side ingestion glue (the reference runs it as a
standalone producer process) — records only become distributed once
the sink lands them in a streamable location; no Spark work happens in
the loop itself.
"""

from __future__ import annotations

import hashlib
import json
import time
from collections.abc import Callable, Iterable, Mapping


class RestPoller:
    """Poll ``fetch_fn`` every ``interval_s``; hand each non-empty
    batch to ``sink``.

    ``fetch_fn() -> Iterable[Mapping] | None`` — a poll returning
    ``None`` or an empty iterable is a no-data tick (the reference's
    "rate limit exceeded" path): nothing is sunk, no error counted.
    A RAISING poll counts toward exponential backoff
    (``interval_s * backoff_base**consecutive_errors``, capped at
    ``max_backoff_s``); the first success resets it.
    """

    def __init__(
        self,
        fetch_fn: Callable[[], Iterable[Mapping] | None],
        sink: Callable[[list[Mapping]], object],
        interval_s: float = 30.0,
        max_polls: int | None = None,
        backoff_base: float = 2.0,
        max_backoff_s: float = 300.0,
        dedup_unchanged: bool = True,
        stop_event=None,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        self.fetch_fn = fetch_fn
        self.sink = sink
        self.interval_s = interval_s
        self.max_polls = max_polls
        self.backoff_base = backoff_base
        self.max_backoff_s = max_backoff_s
        self.dedup_unchanged = dedup_unchanged
        self.stop_event = stop_event
        self.sleep = sleep
        # observable counters (tests + ops)
        self.polls = 0
        self.batches_sunk = 0
        self.records_sunk = 0
        self.errors = 0
        self.skipped_unchanged = 0
        self._last_digest: str | None = None

    def _stopped(self) -> bool:
        return self.stop_event is not None and self.stop_event.is_set()

    def poll_once(self) -> bool:
        """One tick: fetch, maybe sink. Returns True if a batch was
        sunk. Raising fetches are caught and counted (backoff is the
        LOOP's concern — ``run`` owns sleeping)."""
        self.polls += 1
        try:
            payload = self.fetch_fn()
        except Exception:  # noqa: BLE001 — the retry loop is the handler
            self.errors += 1
            return False
        self._consecutive_errors = 0
        batch = list(payload) if payload is not None else []
        if not batch:
            return False
        if self.dedup_unchanged:
            digest = hashlib.md5(
                json.dumps(batch, sort_keys=True, default=str).encode()
            ).hexdigest()
            if digest == self._last_digest:
                self.skipped_unchanged += 1
                return False
            self._last_digest = digest
        self.sink(batch)
        self.batches_sunk += 1
        self.records_sunk += len(batch)
        return True

    def run(self) -> None:
        """Poll until ``max_polls`` ticks or ``stop_event`` is set."""
        self._consecutive_errors = 0
        while not self._stopped():
            if self.max_polls is not None and self.polls >= self.max_polls:
                break
            errors_before = self.errors
            self.poll_once()
            if self._stopped() or (
                self.max_polls is not None and self.polls >= self.max_polls
            ):
                break
            if self.errors > errors_before:
                self._consecutive_errors += 1
                delay = min(
                    self.interval_s
                    * (self.backoff_base ** self._consecutive_errors),
                    self.max_backoff_s,
                )
            else:
                self._consecutive_errors = 0
                delay = self.interval_s
            self.sleep(delay)
