"""Session-cache bookkeeping for operator-internal ``persist()`` calls.

Some operators cache an intermediate that the RETURNED frame still
depends on (e.g. the hashed-shingle frame feeding both the candidate
join and the Jaccard verify in ``ngram_jaccard_pairs``). The operator
cannot unpersist it — the caller has not run its terminal action yet —
and without bookkeeping a long-lived session running the catalog
repeatedly accumulates cache entries and leans on LRU eviction.

Contract: operators register such frames via ``tracked_persist``;
whoever drives the terminal action (bench harness, oracle selfcheck,
a user pipeline) calls ``release_tracked()`` afterwards. Re-running an
action on a released result recomputes the intermediate — correctness
is unaffected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for later ``release_tracked()``."""
    df = df.persist()
    _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every registered frame; returns how many were released."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            # a stopped session invalidates the handle; releasing is
            # then moot
            pass
    return n
