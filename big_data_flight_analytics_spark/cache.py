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

from contextlib import contextmanager

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


def loop_checkpoint(df: DataFrame) -> DataFrame:
    """Eager lineage truncation for iterative loops — durable on a
    cluster, local in tests.

    Every iterative operator (connected components, PageRank, BPE)
    truncates its loop frame's lineage each round. ``localCheckpoint``
    is the right default on local[*] (no filesystem round-trip), but
    its blocks live on executors: on a real cluster, losing one
    executor invalidates the frame mid-loop. This helper is the single
    swap point the loop docstrings promise:

    - ``spark.graft.loop.checkpoint=auto`` (default): durable
      ``checkpoint()`` when ``sparkContext.setCheckpointDir`` has been
      called (the cluster signal), else ``localCheckpoint``.
    - ``local``: always localCheckpoint (opt-out, e.g. a test session
      that sets a checkpoint dir for other reasons).
    - ``durable``: always checkpoint(); raises if no dir is set
      (fail loud rather than silently downgrading resilience).
    """
    spark = df.sparkSession
    mode = spark.conf.get("spark.graft.loop.checkpoint", "auto")
    if mode not in ("auto", "local", "durable"):
        raise ValueError(
            f"spark.graft.loop.checkpoint={mode!r}: "
            "expected auto|local|durable"
        )
    has_dir = spark.sparkContext.getCheckpointDir() is not None
    if mode == "durable" and not has_dir:
        raise RuntimeError(
            "spark.graft.loop.checkpoint=durable but no checkpoint dir "
            "is set; call sparkContext.setCheckpointDir(...) first"
        )
    if mode == "durable" or (mode == "auto" and has_dir):
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def once_checkpoint(df: DataFrame) -> DataFrame:
    """Eager materialization for SINGLE-PASS multi-consumer frames —
    always ``localCheckpoint``, never a durable checkpoint.

    The distinction from :func:`loop_checkpoint` (ADVICE r16): durable
    ``checkpoint()`` files are not removed by the ContextCleaner unless
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (default
    false), so one-shot operator frames — a verify frame consumed by
    both sides of one join, a model-count table read by five consumers
    — would leak a checkpoint dir per invocation in a long-lived
    cluster session. Their failure story doesn't need durability
    either: there is no loop invariant to invalidate — if an executor
    holding localCheckpoint blocks dies, the one query fails and a
    retry recomputes from source. Mid-LOOP state keeps using
    ``loop_checkpoint`` (losing round-i state invalidates every later
    round, so durability is worth a file per round on a cluster).
    localCheckpoint blocks are dropped by Python refcounting + the
    ContextCleaner as frames go out of scope (measured flat at 1-6
    live blocks across full catalog passes)."""
    return df.localCheckpoint(eager=True)


@contextmanager
def loop_confs(spark, nparts: int):
    """Pin AQE off + shuffle width for a tiny-frame iterative loop,
    restored unset-aware on exit.

    The measured discipline for scheduling-bound loops (BPE, exact-grain
    Lloyd): each round is a handful of kilobyte-scale shuffles, so task
    startup — not data — is the round cost, and the session-default
    width (32 here) multiplies it. Callers pass a DATA-PROPORTIONAL
    ``nparts`` (the loop frame's own partition count), so the pin stays
    correct at cluster scale. NOT for loops whose joins rely on AQE's
    runtime broadcast conversion (the PageRank regression —
    checkpointed frames have no stats): only use where every join is an
    explicit ``broadcast()``.

    SESSION-WIDE AND THEREFORE SINGLE-THREADED BY ASSUMPTION: Spark has
    no per-plan switch for these confs — a concurrent query on the same
    session would silently lose AQE for the loop's duration. The
    catalog/bench runners execute sequentially, which is the contract.
    Restore distinguishes explicitly-set values from engine defaults
    (``conf.get(key, None)`` + ``unset``), so a previously-unset conf
    goes back to unset instead of being pinned to its default forever.
    """
    keys = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": str(nparts),
    }
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        for k, v in keys.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, v0 in saved.items():
            if v0 is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v0)
