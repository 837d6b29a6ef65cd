"""S7/IO11: keyed upsert sinks via foreachBatch.

The reference serves stream results through Kafka Connect Mongo sinks
doing ReplaceOne-by-_id upserts (connectors/mongodb-*-sink.json,
ReplaceOneDefaultStrategy). Engine equivalent: a foreachBatch merge —
latest row per key wins. ``ParquetUpsertSink`` is the file-backed
store used in tests and local runs; a Mongo/JDBC production sink
implements the same ``merge`` contract.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ParquetUpsertSink:
    """Keyed latest-wins upsert into a parquet directory.

    Each batch: read current state, union the batch, keep the newest row
    per key (by ``version_col``, e.g. window_end_ms; ties broken by
    batch recency), then swap the new state in via directory renames so
    a crash at any point leaves a complete store (live, or staging plus
    the previous live — never a half-written directory presented as
    live; ``_recover`` promotes/cleans on the next batch). Single-writer
    assumption (one streaming query per sink path) — same as the
    reference's one connector per topic.
    """

    def __init__(self, path: str, key_col: str, version_col: str) -> None:
        self.path = path
        self.key_col = key_col
        self.version_col = version_col

    @property
    def _staging(self) -> str:
        return self.path + ".staging"

    @property
    def _old(self) -> str:
        return self.path + ".old"

    # batch-replay marker (used by the exactly-once index sinks): a
    # ``_last_batch`` file written INSIDE the staging dir, atomic with
    # the data it describes; ``_``-prefixed, invisible to parquet
    @staticmethod
    def _marker(dirpath: str) -> str:
        return os.path.join(dirpath, "_last_batch")

    def _last_batch(self) -> int:
        try:
            with open(self._marker(self.path)) as fh:
                return int(fh.read())
        except (OSError, ValueError):
            return -1

    def _recover(self) -> None:
        """Roll forward/clean up after a crash mid-swap.

        Crash windows (swap = rename live->old, rename staging->live,
        delete old):
        - before any rename: live intact, staging partial -> drop staging;
        - between the renames: live missing, staging COMPLETE (it is only
          ever renamed after a successful write, _SUCCESS present) ->
          promote staging to live;
        - after the second rename: live is the new state -> drop old.
        """
        if not os.path.exists(self.path) and os.path.exists(
            os.path.join(self._staging, "_SUCCESS")
        ):
            os.rename(self._staging, self.path)
        for leftover in (self._staging, self._old):
            if os.path.exists(leftover):
                shutil.rmtree(leftover)

    def merge(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        self._recover()
        batch = batch_df.withColumn("__batch", F.lit(batch_id))
        if os.path.exists(self.path):
            current = spark.read.parquet(self.path)
            merged = current.unionByName(batch, allowMissingColumns=True)
        else:
            merged = batch
        from pyspark.sql import Window

        w = (
            Window.partitionBy(self.key_col)
            .orderBy(F.col(self.version_col).desc(), F.col("__batch").desc())
        )
        latest = (
            merged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        self._write_and_swap(latest)

    def _write_and_swap(self, df: DataFrame) -> None:
        # materialize to staging (we may still be reading the live dir),
        # then swap directories — the live path always points at a
        # complete store
        df.write.mode("overwrite").parquet(self._staging)
        if os.path.exists(self.path):
            os.rename(self.path, self._old)
        os.rename(self._staging, self.path)
        if os.path.exists(self._old):
            shutil.rmtree(self._old)

    def _write_and_swap_with_marker(
        self, df: DataFrame, batch_id: int, sidecars: dict | None = None
    ) -> None:
        """Marker-guarded staging+swap — the ONE copy of the
        crash-sensitive protocol every marker-guarded sink (index,
        dedup, histogram, CMS, OHLC, session) shares: materialize
        ``df`` to staging, stamp the replay marker INSIDE the staging
        dir (so data + marker swap into place together), then rotate
        live -> old -> gone. Crash-window analysis in `_recover`'s
        docstring applies unchanged. ``sidecars`` maps extra
        ``_``-prefixed filenames to contents written inside staging —
        atomic with the data they describe (SessionSink's persisted
        drop counters ride this)."""
        df.write.mode("overwrite").parquet(self._staging)
        with open(self._marker(self._staging), "w") as fh:
            fh.write(str(batch_id))
        for name, content in (sidecars or {}).items():
            with open(os.path.join(self._staging, name), "w") as fh:
                fh.write(content)
        if os.path.exists(self.path):
            os.rename(self.path, self._old)
        os.rename(self._staging, self.path)
        if os.path.exists(self._old):
            shutil.rmtree(self._old)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self.merge(batch_df, batch_id)

    def read(self, spark) -> DataFrame:
        return spark.read.parquet(self.path).drop("__batch")


class Scd2Sink(ParquetUpsertSink):
    """SCD Type-2 dimension maintained incrementally from an update
    stream — the streaming form of ``operators/scd.scd2_merge``.

    Each batch: reduce the batch to the latest update per key, merge
    into the versioned dimension (close + append for changed keys),
    swap the store with the same crash-safe rename discipline as
    ParquetUpsertSink. Batches must arrive in non-decreasing event
    order per key for exact SCD semantics (guaranteed under replay of
    an ordered feed; with out-of-order sources, widen each batch via
    watermarked buffering first).

    Input batches: (key, attr, ts_us). Store schema:
    (key, attr, valid_from_us, valid_to_us, is_current).

    Tie-break: a batch carrying two DIFFERENT attr values for the same
    key at the same timestamp must still resolve deterministically or
    the dimension is replay-unstable. Pass ``tie_col`` (e.g. an event
    id) for a domain-meaningful winner; without one, the greatest attr
    value wins — arbitrary but stable under replay.
    """

    def __init__(
        self,
        path: str,
        key_col: str,
        attr_col: str,
        ts_col: str,
        tie_col: str | None = None,
    ) -> None:
        super().__init__(path, key_col, version_col=ts_col)
        self.attr_col = attr_col
        self.ts_col = ts_col
        self.tie_col = tie_col

    def merge(self, batch_df: DataFrame, batch_id: int) -> None:
        from big_data_flight_analytics_spark.operators.scd import (
            latest_updates,
            scd2_merge,
        )

        spark = batch_df.sparkSession
        self._recover()
        cols = [self.key_col, self.attr_col, self.ts_col]
        if self.tie_col is not None:
            cols.append(self.tie_col)
        upd = latest_updates(
            batch_df.select(*cols),
            key=self.key_col,
            ts_col=self.ts_col,
            # see class docstring: explicit tie column, else greatest
            # attr — never the timestamp itself (identical sort keys
            # would pick a nondeterministic winner)
            tie_col=self.tie_col if self.tie_col is not None else self.attr_col,
        )
        if self.tie_col is not None:
            upd = upd.drop(self.tie_col)
        if os.path.exists(self.path):
            current = spark.read.parquet(self.path)
        else:
            current = upd.select(
                self.key_col,
                self.attr_col,
                F.col(self.ts_col).alias("valid_from_us"),
                F.lit(None).cast("long").alias("valid_to_us"),
                F.lit(True).alias("is_current"),
            ).limit(0)
        merged = scd2_merge(
            current,
            upd,
            key=self.key_col,
            attr=self.attr_col,
            update_ts_us=self.ts_col,
        )
        # brand-new keys (no open version yet) enter as fresh open rows
        new_keys = upd.join(
            current.filter(F.col("is_current")).select(self.key_col),
            self.key_col,
            "left_anti",
        ).select(
            self.key_col,
            self.attr_col,
            F.col(self.ts_col).alias("valid_from_us"),
            F.lit(None).cast("long").alias("valid_to_us"),
            F.lit(True).alias("is_current"),
        )
        self._write_and_swap(merged.unionByName(new_keys))

    def read(self, spark) -> DataFrame:
        return spark.read.parquet(self.path)


class DeltaDirStateSink(ParquetUpsertSink):
    """Append-only delta-dir state store: the shared mechanics behind
    every sink whose per-trigger I/O must be O(batch delta), never an
    O(state) base rewrite. Layout (proved by the index sinks in r12,
    generalized in r16 so the geo pair-set sink could adopt it):

    - ``path`` — flat root parquet files (founding state / last
      compaction) plus one ``delta-<batchid>`` subdir per appending
      batch. Reads use ``recursiveFileLookup`` (no partition columns
      to infer; ``_``-prefixed markers stay invisible). An appending
      batch writes ONLY its own rows to a sibling staging dir, then
      ``os.rename``s it into the store — the dir name IS the replay
      marker, so data and marker land in one atomic rename;
    - ``path + ".batchmark"`` — sidecar replay marker advanced
      (atomic ``os.replace``) when the store is NOT touched (empty or
      no-op batches): per-batch I/O stays O(batch) — one tiny file;
    - compaction: every ``compact_every_n_batches`` delta subdirs the
      whole store is rewritten into flat root files through
      ``_compacted`` (identity by default; set-union states override
      it with ``distinct()``) via the inherited crash-safe
      staging+swap. The in-dir ``_last_batch`` marker, written inside
      staging, carries the highest folded batch id forward because the
      delta names it replaces disappear. This is the ONLY O(state)
      write and it is deliberate and rare.

    ``_last_batch`` is the max of the root marker, the sidecar, and
    the delta-dir names — whichever path a batch took, a replay
    short-circuits.
    """

    DELTA_PREFIX = "delta-"
    compact_every_n_batches: int = 16

    @property
    def _side_marker(self) -> str:
        return self.path + ".batchmark"

    @property
    def _append_stage(self) -> str:
        return self.path + ".appendstage"

    def _delta_batch_ids(self) -> list[int]:
        if not os.path.isdir(self.path):
            return []
        ids = []
        for name in os.listdir(self.path):
            if name.startswith(self.DELTA_PREFIX):
                try:
                    ids.append(int(name[len(self.DELTA_PREFIX):]))
                except ValueError:
                    pass
        return ids

    def _last_batch(self) -> int:
        # max of the in-dir marker (advanced by founding/compaction
        # swaps), the sidecar (advanced by no-rewrite batches), and
        # the appended delta-dir names (advanced by appending batches)
        # — whichever path a batch took, a replay must short-circuit
        side = -1
        try:
            with open(self._side_marker) as fh:
                side = int(fh.read())
        except (OSError, ValueError):
            pass
        return max(super()._last_batch(), side, *self._delta_batch_ids(), -1)

    def _read_store(self, spark) -> DataFrame:
        # flat root files + delta-<batchid> subdirs; recursive lookup
        # (no partition columns to infer, markers are ``_``-hidden)
        return spark.read.option("recursiveFileLookup", "true").parquet(
            self.path
        )

    def _recover(self) -> None:
        super()._recover()
        # a crash between the append-stage write and its rename into
        # the store leaves the stage behind; the un-advanced marker
        # means the batch replays in full, so just drop the leftovers
        if os.path.exists(self._append_stage):
            shutil.rmtree(self._append_stage)

    def _advance_side_marker(self, batch_id: int) -> None:
        tmp = self._side_marker + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(batch_id))
        os.replace(tmp, self._side_marker)

    def _append_delta(self, rows: DataFrame, batch_id: int) -> None:
        """Append ``rows`` as the store's ``delta-<batchid>`` subdir —
        stage write + one atomic rename; existing base files are never
        rewritten — then compact if the cadence is due."""
        rows.write.mode("overwrite").parquet(self._append_stage)
        os.rename(
            self._append_stage,
            os.path.join(self.path, f"{self.DELTA_PREFIX}{batch_id}"),
        )
        if (
            self.compact_every_n_batches
            and len(self._delta_batch_ids()) >= self.compact_every_n_batches
        ):
            self.compact(rows.sparkSession)

    def _compacted(self, store: DataFrame) -> DataFrame:
        """The fold applied when deltas rewrite into root files.
        Identity for stores whose rows are disjoint by construction
        (index sinks append only novel ids); set-union states override
        with ``distinct()`` to discharge the duplicates that lazy
        idempotent appends tolerated."""
        return store

    def compact(self, spark) -> None:
        """Fold the delta subdirs into flat root files — the one
        deliberate O(state) rewrite, run every
        ``compact_every_n_batches`` appending batches (or manually on
        a maintenance cadence). Crash-safe via the inherited
        staging+swap; the in-dir marker carries the highest folded
        batch id since the delta names it replaces disappear."""
        self._write_and_swap_with_marker(
            self._compacted(self._read_store(spark)), self._last_batch()
        )

    def read(self, spark) -> DataFrame:
        return self._read_store(spark)


class IndexDeltaSink(DeltaDirStateSink):
    """Shared machinery of the streaming ingest-dedup index sinks.

    ``foreachBatch`` target closing the loop between a batch ingest
    contract (an ``*_index_delta`` operator: mark one arriving batch
    against a persisted base index with O(batch) work — the base is
    never rescanned quadratically) and the streaming engine. With
    ``absorb_novel`` (the default) the batch's novel rows join the
    index so later arrivals dedup against them too. Subclasses supply
    ``_mark(base, batch)`` — the batch operator call — and the payload
    column the index stores next to the id.

    State (the store is APPEND-ONLY between compactions — no batch
    ever rewrites data it did not produce):
    - ``path`` — the base index store: root parquet files (founding
      corpus / last compaction) plus one ``delta-<batchid>`` subdir
      per absorbing batch. Reads use ``recursiveFileLookup`` (no
      partition columns; ``_``-prefixed files stay invisible). An
      absorbing batch writes ONLY its own novel rows to a sibling
      staging dir, then ``os.rename``s it into the store as
      ``delta-<batchid>`` — the dir name IS the replay marker, so
      data and marker land in one atomic rename (a replay after a
      completed absorb must not re-mark against the already-absorbed
      base). Per-absorb I/O is O(novel rows), never O(index);
    - compaction: every ``compact_every_n_batches`` delta subdirs the
      whole store is rewritten into flat root files (inherited
      crash-safe staging+swap; the in-dir ``_last_batch`` marker,
      written inside staging, carries the highest folded batch id
      forward because the delta names it replaces disappear). This is
      the ONLY O(index) write and it is deliberate and rare;
    - ``path + ".batchmark"`` — sidecar replay marker advanced
      (atomic ``os.replace``) when the store is NOT touched
      (``absorb_novel=False``, all-dup batch, empty batch): per-batch
      I/O stays O(batch) — decisions partition + one tiny file. Safe
      without any store change because a replayed batch recomputes
      identical decisions against the unchanged base.
      ``_last_batch`` is the max of the root marker, the sidecar, and
      the delta-dir names;
    - ``path + ".decisions"/batch=N/`` — that batch's match decisions
      (id, matched_base_id, dup_of_index), written BEFORE the marker
      advance: a crash between the two leaves the marker un-advanced,
      so the replayed batch overwrites the same partition dir and
      redoes the rest — exactly-once end to end (the DedupIndexSink
      pattern).

    Intra-batch near-dups are both marked novel (each batch is judged
    against the index as it stood, exactly like the batch operator);
    smaller triggers give finer granularity.

    At 100 TB the shape holds: the base side is stored bucketed by
    its index key (map-only per batch), decisions land in an
    append-only log table, novel rows append as new partitions, and
    compaction runs on the same cadence — this sink is the same
    contract with parquet-dir state for tests/local runs.

    Store/marker/compaction mechanics live in ``DeltaDirStateSink``;
    this class adds the mark-against-base contract and the decisions
    log.
    """

    def __init__(
        self,
        path: str,
        id_col: str,
        payload_col: str,
        absorb_novel: bool,
        compact_every_n_batches: int = 16,
    ) -> None:
        super().__init__(path, key_col=id_col, version_col="__none")
        self.id_col = id_col
        self.payload_col = payload_col
        self.absorb_novel = absorb_novel
        self.compact_every_n_batches = compact_every_n_batches

    def _mark(self, base: DataFrame, batch: DataFrame) -> DataFrame:
        """Batch-operator call: (id, matched_base_id, dup_of_index)
        for every batch row, judged against ``base``. ``base`` is the
        STORED index frame (whatever ``_prepare`` produces); ``batch``
        is the raw (id, payload) arrival."""
        raise NotImplementedError

    def _prepare(self, rows: DataFrame) -> DataFrame:
        """Raw (id, payload) rows -> the stored index representation.

        Default: identity. Subclasses override when the index persists
        a PRECOMPUTED form (e.g. MinHash shingles+bands) so refreshes
        never redo base-side work — _prepare runs on the founding
        corpus and on each batch's novel rows only: O(batch)."""
        return rows

    @property
    def _decisions(self) -> str:
        return self.path + ".decisions"

    def initialize(self, base_df: DataFrame) -> None:
        """Build the index from an existing base corpus (marker -1:
        every real batch id is newer)."""
        self._recover()
        for stale in (self._side_marker, self._side_marker + ".tmp"):
            if os.path.exists(stale):
                os.remove(stale)
        self._write_and_swap_with_marker(
            self._prepare(base_df.select(self.id_col, self.payload_col)),
            -1,
        )

    def merge(self, batch_df: DataFrame, batch_id: int) -> None:
        self._recover()
        if os.path.exists(self.path) and batch_id <= self._last_batch():
            return  # replay of an already-folded batch
        spark = batch_df.sparkSession
        batch = batch_df.select(self.id_col, self.payload_col)
        founding = not os.path.exists(self.path)
        if founding:
            # no index yet: the first batch founds it — all novel
            base = self._prepare(batch).limit(0)
            decisions = batch.select(
                self.id_col,
                F.lit(None)
                .cast(batch.schema[self.id_col].dataType)
                .alias("matched_base_id"),
                F.lit(False).alias("dup_of_index"),
            )
        else:
            base = self._read_store(spark)
            decisions = self._mark(base, batch)
        dec_dir = os.path.join(self._decisions, f"batch={batch_id}")
        decisions.write.mode("overwrite").parquet(dec_dir)
        dec = spark.read.parquet(dec_dir)
        if founding:
            # the first batch founds the store's flat root files via
            # the shared marker-guarded staging+swap (the live->old
            # rotation inside is a no-op: self.path does not exist)
            self._write_and_swap_with_marker(self._prepare(batch), batch_id)
            return
        absorbing = self.absorb_novel and not dec.filter(
            ~F.col("dup_of_index")
        ).isEmpty()
        if not absorbing:
            # store untouched — O(batch) I/O: decisions partition plus
            # the sidecar marker; no O(index) write at all
            self._advance_side_marker(batch_id)
            return
        # absorb APPEND-ONLY: write just the novel rows to a sibling
        # stage, then one atomic rename into the store — the dir name
        # carries the batch id, so data + replay marker land together
        # and existing base files are never rewritten
        self._append_delta(
            self._prepare(
                batch.join(
                    dec.filter(~F.col("dup_of_index")).select(self.id_col),
                    self.id_col,
                )
            ),
            batch_id,
        )

    def decisions(self, spark) -> DataFrame:
        """All per-batch match decisions, with the ``batch`` column
        from partition discovery."""
        return spark.read.parquet(self._decisions)


class EmbeddingIndexSink(IndexDeltaSink):
    """Streaming i3: continuously maintained embedding near-dup index
    (``operators.similarity.embedding_index_delta`` per micro-batch).

    ``bits`` is REQUIRED: the bucket scheme is fixed at index-build
    time (the ``embedding_index_delta`` contract) — deriving it per
    batch from a growing base would silently re-shard the index.

    The store is the PRECOMPUTED ``embedding_index_frame``
    (id, vec, nsq, buckets): refreshes skip the base-side norm and
    bucket arithmetic entirely and touch base vectors only for the
    candidate pairs they score — per-trigger cost O(batch +
    candidates), the same contract as MinHashIndexSink's.
    """

    def __init__(
        self,
        path: str,
        bits: int,
        threshold: float = 0.4,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        fp_scale: int = 10**15,
        probes: int = 1,
        absorb_novel: bool = True,
        compact_every_n_batches: int = 16,
    ) -> None:
        super().__init__(
            path, id_col, vec_col, absorb_novel, compact_every_n_batches
        )
        self.bits = bits
        self.threshold = threshold
        self.vec_col = vec_col
        self.fp_scale = fp_scale
        self.probes = probes

    def _prepare(self, rows: DataFrame) -> DataFrame:
        from big_data_flight_analytics_spark.operators.similarity import (
            embedding_index_frame,
        )

        return embedding_index_frame(
            rows,
            bits=self.bits,
            id_col=self.id_col,
            vec_col=self.vec_col,
            fp_scale=self.fp_scale,
            probes=self.probes,
        )

    def _mark(self, base: DataFrame, batch: DataFrame) -> DataFrame:
        from big_data_flight_analytics_spark.operators.similarity import (
            embedding_index_delta,
        )

        return embedding_index_delta(
            base=None,
            delta=batch,
            threshold=self.threshold,
            id_col=self.id_col,
            vec_col=self.vec_col,
            bits=self.bits,
            fp_scale=self.fp_scale,
            probes=self.probes,
            base_index=base,
        )


class MinHashIndexSink(IndexDeltaSink):
    """Streaming i4: continuously maintained MinHash near-dup index
    (``operators.dedup.minhash_index_delta`` per micro-batch) —
    text-Jaccard near-dup marking at ingest time.

    The MinHash parameters (n, num_perm, bands) are fixed at
    index-build time: signatures are data-independent given the
    scheme, which is exactly what lets batches sign themselves and
    still agree with joint signing — but only under ONE scheme.
    ``max_band_df`` caps BASE band buckets (an index-build-time
    property), the recall-only hot-bucket trade.

    The store is the PRECOMPUTED ``minhash_index_frame``
    (id, shingles, bands), not raw text: a refresh does zero base-side
    tokenize/shingle/md5 work — base postings come from exploding the
    stored bands, verify shingles from the stored arrays, and only the
    batch (plus its novel rows, when absorbing) pays the signature
    pipeline. That is what makes per-trigger cost O(batch +
    candidates) instead of O(base).
    """

    def __init__(
        self,
        path: str,
        threshold: float = 0.2,
        id_col: str = "doc_id",
        text_col: str = "text",
        n: int = 3,
        num_perm: int = 16,
        bands: int = 4,
        max_band_df: int | None = None,
        absorb_novel: bool = True,
        compact_every_n_batches: int = 16,
    ) -> None:
        super().__init__(
            path, id_col, text_col, absorb_novel, compact_every_n_batches
        )
        self.threshold = threshold
        self.text_col = text_col
        self.n = n
        self.num_perm = num_perm
        self.bands = bands
        self.max_band_df = max_band_df

    def _prepare(self, rows: DataFrame) -> DataFrame:
        from big_data_flight_analytics_spark.operators.dedup import (
            minhash_index_frame,
        )

        return minhash_index_frame(
            rows,
            id_col=self.id_col,
            text_col=self.text_col,
            n=self.n,
            num_perm=self.num_perm,
            bands=self.bands,
        )

    def _mark(self, base: DataFrame, batch: DataFrame) -> DataFrame:
        from big_data_flight_analytics_spark.operators.dedup import (
            minhash_index_delta,
        )

        return minhash_index_delta(
            base=None,
            delta=batch,
            id_col=self.id_col,
            text_col=self.text_col,
            n=self.n,
            num_perm=self.num_perm,
            bands=self.bands,
            threshold=self.threshold,
            max_band_df=self.max_band_df,
            base_index=base,
        )


class StatelessBenchmarkSink:
    """Shared machinery of the at-ingest decontamination sinks: each
    arriving micro-batch is judged against a FIXED benchmark set and
    the per-batch output lands in its own ``path/batch=N`` partition.

    Stateless by construction: the benchmark never changes and the
    output depends only on the batch's own rows, so a replayed batch
    simply overwrites the same directory with identical content —
    exactly-once with NO replay marker and NO base store to swap.
    Per-batch work is O(batch postings): the benchmark's gram side
    broadcasts (persisted once on the driver-side DataFrame), the
    batch streams past map-side.

    At 100 TB ingest the same shape holds: the output log is an
    append-only table partitioned by batch. Subclasses supply
    ``_transform(batch)``.
    """

    def __init__(
        self,
        path: str,
        benchmark: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        n: int = 3,
    ) -> None:
        self.path = path
        self.id_col = id_col
        self.text_col = text_col
        self.n = n
        # the benchmark is re-read per micro-batch (every batch joins
        # against it): persist once so batches pay broadcast cost only
        self.benchmark = benchmark.select(id_col, text_col).persist()

    def _transform(self, batch: DataFrame) -> DataFrame:
        """(id, text) batch -> the rows this sink logs for it."""
        raise NotImplementedError

    def merge(self, batch_df: DataFrame, batch_id: int) -> None:
        self._transform(
            batch_df.select(self.id_col, self.text_col)
        ).write.mode("overwrite").parquet(
            os.path.join(self.path, f"batch={batch_id}")
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self.merge(batch_df, batch_id)

    def close(self) -> None:
        """Release the benchmark frame persisted in ``__init__`` —
        call once the stream is stopped (the sink pins executor
        storage for its whole lifetime otherwise)."""
        self.benchmark.unpersist()

    def log(self, spark) -> DataFrame:
        """All per-batch output, with the ``batch`` column from
        partition discovery."""
        return spark.read.parquet(self.path)


class ContaminationLogSink(StatelessBenchmarkSink):
    """Decontamination at ingest: every arriving micro-batch of
    documents is containment-marked against the fixed benchmark
    (``operators.dedup.containment_decon_pairs`` per batch — the
    streaming face of d20, completing the ingest story next to the
    i2/i3/i4 index sinks). Downstream consumers anti-join flagged
    corpus_doc ids before training-set assembly.
    """

    def __init__(
        self,
        path: str,
        benchmark: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        n: int = 3,
        threshold_pct: int = 50,
    ) -> None:
        super().__init__(path, benchmark, id_col, text_col, n)
        self.threshold_pct = threshold_pct

    def _transform(self, batch: DataFrame) -> DataFrame:
        from big_data_flight_analytics_spark.operators.dedup import (
            containment_decon_pairs,
        )

        return containment_decon_pairs(
            batch,
            self.benchmark,
            id_col=self.id_col,
            text_col=self.text_col,
            n=self.n,
            threshold_pct=self.threshold_pct,
        )

    def flagged(self, spark) -> DataFrame:
        """All per-batch contamination decisions, with the ``batch``
        column from partition discovery."""
        return self.log(spark)


class ExcisionSink(StatelessBenchmarkSink):
    """Decontamination EXCISION at ingest: the d21 face of s8. Every
    arriving micro-batch is marked against the fixed benchmark
    (``contaminated_window_marks``) and rewritten with the quoted
    material excised (``excise_repeated_spans``), emitting
    (id, clean_text, n_kept, n_removed) for every batch document —
    cleaned text ready for training-set assembly, the novel remainder
    kept (Lee et al. 2022 excise-not-drop).

    Stateless exactly like ContaminationLogSink: both operators are
    per-document functions of (batch row, fixed benchmark) — marking
    joins the batch's position stream against the broadcast benchmark
    grams, excision anti-joins within the batch — so per-batch
    partitions stay idempotent under replay with no marker machinery.
    ``n`` here is the excision window grain (d21's D21_N, default 6),
    not the containment shingle width.
    """

    def __init__(
        self,
        path: str,
        benchmark: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        n: int = 6,
    ) -> None:
        super().__init__(path, benchmark, id_col, text_col, n)

    def _transform(self, batch: DataFrame) -> DataFrame:
        from big_data_flight_analytics_spark.operators.dedup import (
            contaminated_window_marks,
            excise_repeated_spans,
        )

        marks = contaminated_window_marks(
            batch,
            self.benchmark,
            n=self.n,
            id_col=self.id_col,
            text_col=self.text_col,
        )
        return excise_repeated_spans(
            batch,
            n=self.n,
            id_col=self.id_col,
            text_col=self.text_col,
            marks=marks,
        )

    def cleaned(self, spark) -> DataFrame:
        """All per-batch cleaned documents, with the ``batch`` column
        from partition discovery."""
        return self.log(spark)


class LanguageLogSink(StatelessBenchmarkSink):
    """Language/domain ID at ingest (streaming t20): every arriving
    micro-batch is classified against a FIXED profile table
    (``operators.langid.langid_hashed_ngrams`` per batch), logging
    (id, pred_<label>, llr_fp, n_grams) per batch partition — routing
    arriving documents to language/domain shards at ingest time.

    The fixed side here is the PROFILE table (K x n_buckets rows of
    int64 LLR weights — model state like the BPE merge table), not a
    benchmark corpus: profiles are trained once by
    ``langid_profiles`` on a labeled reference set and broadcast to
    every batch. Same stateless exactly-once contract as the other
    ingest log sinks: predictions depend only on the batch's own rows
    and the never-changing profiles, so per-batch partitions are
    idempotent under replay with no marker machinery. ``n`` and
    ``n_buckets`` must match the profile build (both are
    data-independent, so stored profiles and batches agree by
    construction).
    """

    def __init__(
        self,
        path: str,
        profiles: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        label_col: str = "label",
        n: int = 3,
        n_buckets: int = 256,
    ) -> None:
        self.path = path
        self.id_col = id_col
        self.text_col = text_col
        self.label_col = label_col
        self.n = n
        self.n_buckets = n_buckets
        # deliberately NOT super().__init__: the fixed side is the
        # profile grid, persisted whole (no id/text projection)
        self.benchmark = profiles.persist()

    def _transform(self, batch: DataFrame) -> DataFrame:
        from big_data_flight_analytics_spark.operators.langid import (
            langid_hashed_ngrams,
        )

        return langid_hashed_ngrams(
            batch,
            self.benchmark,
            id_col=self.id_col,
            text_col=self.text_col,
            label_col=self.label_col,
            n=self.n,
            n_buckets=self.n_buckets,
        )

    def predictions(self, spark) -> DataFrame:
        """All per-batch classifications, with the ``batch`` column
        from partition discovery."""
        return self.log(spark)


class DedupIndexSink(ParquetUpsertSink):
    """Continuously maintained exact-dedup index: streaming i2.

    ``foreachBatch`` target that folds each micro-batch of documents
    into the persisted fingerprint index via
    ``operators.incremental.dedup_delta`` — O(batch) work per trigger,
    never a corpus rescan, so the index stays current at ingest rate.
    The dir-swap crash-safety is inherited from ``ParquetUpsertSink``;
    on top of it a ``_last_batch`` marker written INSIDE the staging
    dir (atomic with the data it describes) makes replayed batches
    no-ops — foreachBatch is at-least-once, and ``dup_count`` is not
    idempotent under refold, so the marker is what upgrades the sink to
    exactly-once. The marker file is ``_``-prefixed, invisible to
    parquet readers.
    """

    def __init__(
        self, path: str, id_col: str = "doc_id", text_col: str = "text"
    ) -> None:
        super().__init__(path, key_col="fingerprint", version_col="__none")
        self.id_col = id_col
        self.text_col = text_col

    def merge(self, batch_df: DataFrame, batch_id: int) -> None:
        from big_data_flight_analytics_spark.operators.incremental import (
            dedup_delta,
            dedup_index,
        )

        self._recover()
        if os.path.exists(self.path) and batch_id <= self._last_batch():
            return  # replay of an already-folded batch
        spark = batch_df.sparkSession
        if os.path.exists(self.path):
            index = spark.read.parquet(self.path)
            _assignments, updated = dedup_delta(
                index, batch_df, self.id_col, self.text_col
            )
        else:
            updated = dedup_index(batch_df, self.id_col, self.text_col)
        self._write_and_swap_with_marker(updated, batch_id)

    def read(self, spark) -> DataFrame:
        return spark.read.parquet(self.path)


class QualityScoreSink(StatelessBenchmarkSink):
    """Quality scoring at ingest (streaming t21, s11): every arriving
    micro-batch is scored against a FIXED perceptron weight table
    (``operators.classifier.perceptron_apply`` per batch), logging
    (id, label, margin, pred) per batch partition — the apply half of
    the t21 train/apply split, so low-quality documents are flagged
    the moment they arrive instead of in a later corpus pass.

    The fixed side is the WEIGHT table (<= n_buckets rows of int64
    weights — model state like the t20 profiles and the BPE merge
    table), trained once by ``perceptron_weights`` on a labeled
    reference set and broadcast to every batch. Same stateless
    exactly-once contract as the other ingest log sinks: scores depend
    only on the batch's own rows and the never-changing weights, so
    per-batch partitions are idempotent under replay with no marker
    machinery. ``n_buckets`` must match the weight build (it is
    data-independent, so stored weights and batches agree by
    construction).
    """

    def __init__(
        self,
        path: str,
        weights: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        n_buckets: int = 256,
    ) -> None:
        self.path = path
        self.id_col = id_col
        self.text_col = text_col
        self.n_buckets = n_buckets
        # deliberately NOT super().__init__: the fixed side is the
        # weight table, persisted whole (no id/text projection)
        self.benchmark = weights.persist()

    def _transform(self, batch: DataFrame) -> DataFrame:
        from big_data_flight_analytics_spark.operators.classifier import (
            perceptron_apply,
        )

        return perceptron_apply(
            batch,
            self.benchmark,
            id_col=self.id_col,
            text_col=self.text_col,
            n_buckets=self.n_buckets,
        )

    def scores(self, spark) -> DataFrame:
        """All per-batch quality scores, with the ``batch`` column
        from partition discovery."""
        return self.log(spark)


class IngestPipelineSink:
    """Composed single-pass ingest (s12): ONE ``foreachBatch`` target
    running every arriving micro-batch through all four LLM-ingest
    faces over ONE shared source scan and ONE canonical-text
    projection:

    1. near-dup marking + index fold — ``MinHashIndexSink`` (the i4
       contract: O(batch) against the persisted index, novel rows
       absorbed append-only);
    2. decontamination excision — ``ExcisionSink`` (d21: benchmark
       spans excised, cleaned text logged);
    3. language/domain ID — ``LanguageLogSink`` (t20 profiles);
    4. quality scoring — ``QualityScoreSink`` (t21 stored weights).

    Running these as four separate streams reads and canonicalizes the
    arriving data four times; at 100 TB ingest the source scan IS the
    dominant cost, so the composition persists one
    (id, lower(trim(text))) projection per micro-batch and every stage
    consumes the cached frame. Substituting the canonical string for
    the raw text is a semantic no-op: every stage's first step is the
    same lower/trim canonicalization (``text.tokens``,
    ``langid._canonical``, the classifier's token filter), which is
    idempotent — pinned by the stream==batch differential tests.

    Exactly-once composes per stage, each in its existing layout: the
    dedup index keeps its delta-dir/marker replay protocol (a replayed
    batch short-circuits), and the three stateless logs overwrite
    their own ``batch=N`` partitions with identical content (the
    shared projection is a pure function of the batch). A crash
    mid-composition replays the whole batch: completed stages redo
    idempotently, incomplete ones complete.

    The stage outputs land in sibling stores under ``path``:
    ``dedup_index`` (+ ``.decisions``), ``excised``, ``langid``,
    ``quality`` — the same tables the standalone sinks produce, so
    downstream training-set assembly (anti-join dups, take clean_text,
    route by language, filter by quality) is unchanged.
    """

    def __init__(
        self,
        path: str,
        benchmark: DataFrame,
        profiles: DataFrame,
        weights: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        minhash_kwargs: dict | None = None,
        excise_n: int = 6,
        langid_n: int = 3,
        langid_buckets: int = 256,
        quality_buckets: int = 256,
    ) -> None:
        self.id_col = id_col
        self.text_col = text_col
        # sub-sinks all see the shared canonical frame under the
        # ORIGINAL text column name, so their stores/logs keep the
        # standalone schemas
        self.dedup = MinHashIndexSink(
            os.path.join(path, "dedup_index"),
            id_col=id_col,
            text_col=text_col,
            **(minhash_kwargs or {}),
        )
        self.excise = ExcisionSink(
            os.path.join(path, "excised"),
            benchmark,
            id_col=id_col,
            text_col=text_col,
            n=excise_n,
        )
        self.langid = LanguageLogSink(
            os.path.join(path, "langid"),
            profiles,
            id_col=id_col,
            text_col=text_col,
            n=langid_n,
            n_buckets=langid_buckets,
        )
        self.quality = QualityScoreSink(
            os.path.join(path, "quality"),
            weights,
            id_col=id_col,
            text_col=text_col,
            n_buckets=quality_buckets,
        )

    def initialize(self, base_df: DataFrame) -> None:
        """Found the dedup index from an existing base corpus (the
        stateless stages have no state to found)."""
        self.dedup.initialize(base_df)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        # ONE scan of the arriving batch, ONE canonical projection —
        # persisted so all four stages reuse it instead of re-reading
        # (and re-lowercasing) the source
        shared = batch_df.select(
            F.col(self.id_col),
            F.lower(F.trim(F.col(self.text_col))).alias(self.text_col),
        ).persist()
        try:
            # materialize the cache on the stage that scans it first
            self.dedup(shared, batch_id)
            self.excise(shared, batch_id)
            self.langid(shared, batch_id)
            self.quality(shared, batch_id)
        finally:
            shared.unpersist()

    def close(self) -> None:
        """Release the fixed frames the stateless stages persist."""
        self.excise.close()
        self.langid.close()
        self.quality.close()

    def decisions(self, spark) -> DataFrame:
        return self.dedup.decisions(spark)

    def index(self, spark) -> DataFrame:
        return self.dedup.read(spark)

    def cleaned(self, spark) -> DataFrame:
        return self.excise.cleaned(spark)

    def predictions(self, spark) -> DataFrame:
        return self.langid.predictions(spark)

    def scores(self, spark) -> DataFrame:
        return self.quality.scores(spark)

    def assembled(self, spark) -> DataFrame:
        """Training-set assembly over the four stage outputs: one row
        per ingested NOVEL document (near-dups of the index are
        dropped), carrying the excised clean text, the predicted
        language/domain, and the quality score — the table a training
        run actually reads. Gramless documents (too short to classify
        or score) survive with NULL language/quality columns; fully
        excised ones carry clean_text = ''. All four inputs are
        id-keyed logs partitioned by batch, so at scale this is three
        co-keyed joins over append-only tables — no state rescans."""
        keep = self.decisions(spark).filter(
            ~F.col("dup_of_index")
        ).select(self.id_col)
        cln = self.cleaned(spark).select(
            self.id_col, "clean_text", "n_kept", "n_removed"
        )
        lang_col = f"pred_{self.langid.label_col}"
        lang = self.predictions(spark).select(
            self.id_col, lang_col, "llr_fp"
        )
        q = self.scores(spark).select(
            self.id_col,
            F.col("margin").alias("quality_margin"),
            F.col("pred").alias("quality_pred"),
        )
        return (
            cln.join(keep, self.id_col)
            .join(lang, self.id_col, "left")
            .join(q, self.id_col, "left")
        )


class HistogramSink(ParquetUpsertSink):
    """Continuously maintained histogram sketch: the streaming face of
    i6 (``operators.sketches``). Each micro-batch's values fold into
    the persisted fixed-grain histogram with one tiny full-outer sum —
    O(delta + state) per trigger, and the state is O(value_range/grain)
    rows no matter how much has streamed through, so rewriting it per
    batch is deliberate and cheap (unlike the corpus-sized index
    stores, which must append). Distribution stats (quantiles, counts)
    are then answerable at any moment without rescanning history.

    Exactly-once: folding is NOT idempotent (a replayed batch would
    double-count), so the sink uses the DedupIndexSink protocol — the
    ``_last_batch`` marker written inside the staging dir, atomic with
    the folded data it describes; replayed batch ids short-circuit.
    """

    def __init__(
        self,
        path: str,
        value_col: str,
        grain: int,
        group_cols: tuple[str, ...] = (),
    ) -> None:
        super().__init__(path, key_col="bucket", version_col="__none")
        self.value_col = value_col
        self.grain = grain
        self.group_cols = tuple(group_cols)

    def merge(self, batch_df: DataFrame, batch_id: int) -> None:
        from big_data_flight_analytics_spark.operators.sketches import (
            fixed_grain_histogram,
            histogram_fold,
        )

        self._recover()
        if os.path.exists(self.path) and batch_id <= self._last_batch():
            return  # replay of an already-folded batch
        spark = batch_df.sparkSession
        delta = fixed_grain_histogram(
            batch_df, self.value_col, self.grain, self.group_cols
        )
        if os.path.exists(self.path):
            updated = histogram_fold(
                spark.read.parquet(self.path), delta, self.group_cols
            )
        else:
            updated = delta
        self._write_and_swap_with_marker(updated, batch_id)

    def read(self, spark) -> DataFrame:
        return spark.read.parquet(self.path)

    def quantiles(self, spark, qs=None) -> DataFrame:
        """Exact-grain quantiles from the current sketch state (per
        group, if the sink is grouped)."""
        from big_data_flight_analytics_spark.operators.sketches import (
            DEFAULT_QS,
            histogram_quantiles,
        )

        return histogram_quantiles(
            self.read(spark), self.grain, qs or DEFAULT_QS, self.group_cols
        )


class KMVSink(ParquetUpsertSink):
    """Continuously maintained KMV distinct-count sketch: the streaming
    face of i7 (``operators.sketches`` kmv_*). Each micro-batch is
    sketched on its own (bounded: one pruned shuffle over the batch)
    and set-union-folded into the persisted k-smallest-hashes state —
    O(delta + k) per trigger, state <= k rows per group no matter how
    much has streamed through. Distinct-count estimates are then
    answerable at any moment without rescanning history.

    Exactly-once WITHOUT replay markers: the KMV fold is IDEMPOTENT
    (set union + prune), so a replayed micro-batch re-folds to the
    byte-identical state — the algebra itself is the replay guard,
    unlike HistogramSink's additive fold, which must short-circuit
    replayed batch ids via the ``_last_batch`` marker. Crash atomicity
    still comes from the staging/rename swap (complete store visible
    at every instant; ``_recover`` rolls a mid-swap crash forward).
    """

    def __init__(
        self,
        path: str,
        value_col: str,
        k: int,
        group_cols: tuple[str, ...] = (),
    ) -> None:
        super().__init__(path, key_col="h", version_col="__none")
        self.value_col = value_col
        self.k = k
        self.group_cols = tuple(group_cols)

    def merge(self, batch_df: DataFrame, batch_id: int) -> None:
        from big_data_flight_analytics_spark.operators.sketches import (
            kmv_fold,
            kmv_sketch,
        )

        self._recover()
        spark = batch_df.sparkSession
        delta = kmv_sketch(
            batch_df, self.value_col, self.k, self.group_cols
        )
        if os.path.exists(self.path):
            updated = kmv_fold(
                spark.read.parquet(self.path),
                delta,
                self.k,
                self.group_cols,
            )
        else:
            updated = delta
        self._write_and_swap(updated)

    def read(self, spark) -> DataFrame:
        return spark.read.parquet(self.path)

    def estimate(self, spark) -> DataFrame:
        """(sketch_n, kth_hash, n_distinct_est) from the current state
        (per group, if the sink is grouped)."""
        from big_data_flight_analytics_spark.operators.sketches import (
            kmv_estimate,
        )

        return kmv_estimate(self.read(spark), self.k, self.group_cols)


class CMSSink(ParquetUpsertSink):
    """Continuously maintained count-min frequency grid: the streaming
    face of i8 (``operators.sketches`` cms_*). Each micro-batch's
    values fold additively into the persisted depth x width counter
    grid — O(delta + grid) per trigger, state corpus-size-independent
    — so point-frequency estimates ("how often has this term streamed
    past?") are answerable at any moment without rescanning history.

    Exactly-once: the CMS fold is additive, NOT idempotent (a replayed
    batch would double-count), so like HistogramSink it uses the
    ``_last_batch`` marker protocol — written inside the staging dir,
    atomic with the folded grid it describes; replayed batch ids
    short-circuit. (Contrast KMVSink, whose set-union fold needs no
    marker.)
    """

    def __init__(self, path: str, value_col: str, width: int) -> None:
        super().__init__(path, key_col="bucket", version_col="__none")
        self.value_col = value_col
        self.width = width

    def merge(self, batch_df: DataFrame, batch_id: int) -> None:
        from big_data_flight_analytics_spark.operators.sketches import (
            cms_fold,
            cms_sketch,
        )

        self._recover()
        if os.path.exists(self.path) and batch_id <= self._last_batch():
            return  # replay of an already-folded batch
        spark = batch_df.sparkSession
        delta = cms_sketch(batch_df, self.value_col, self.width)
        if os.path.exists(self.path):
            updated = cms_fold(spark.read.parquet(self.path), delta)
        else:
            updated = delta
        self._write_and_swap_with_marker(updated, batch_id)

    def read(self, spark) -> DataFrame:
        return spark.read.parquet(self.path)

    def estimate(self, spark, queries: DataFrame) -> DataFrame:
        """(value, n_cms) point-frequency estimates for the query
        values against the current grid state."""
        from big_data_flight_analytics_spark.operators.sketches import (
            cms_estimate,
        )

        return cms_estimate(
            self.read(spark), queries, self.value_col, self.width
        )


class OHLCSink(DeltaDirStateSink):
    """Continuously maintained OHLC bars: the streaming face of i9
    (``operators.temporal`` ohlc_*). Each micro-batch builds its own
    mergeable bar state (one map-combined groupBy over the batch) and
    APPENDS it as a ``delta-<batchid>`` partial — per-trigger I/O is
    O(batch's touched buckets), never an O(state) rewrite (r16: the
    old read-fold-swap merge was the s21 state-rewrite regime). The
    fold (``ohlc_refold``: endpoint re-select + extreme combine +
    count sum) is N-way associative/commutative, so ``read()`` folds
    root + partials lazily and compaction discharges them physically;
    live bars (including the still-open current bucket) are answerable
    at any moment without rescanning history. The fold is NOT
    idempotent (n_obs is additive) — replays short-circuit via the
    delta-dir/sidecar marker, the exactly-once line that is
    LOAD-BEARING here (unlike the geo pair set, a re-appended partial
    would double-count).
    """

    def __init__(
        self,
        path: str,
        key_col: str = "event_type",
        ts_col: str = "ts",
        value_col: str = "value",
        id_col: str = "event_id",
        step_s: int = 3600,
        compact_every_n_batches: int = 16,
    ) -> None:
        super().__init__(path, key_col="bucket", version_col="__none")
        self.key_col = key_col
        self.ts_col = ts_col
        self.value_col = value_col
        self.id_col = id_col
        self.step_s = step_s
        self.compact_every_n_batches = compact_every_n_batches

    def _compacted(self, store: DataFrame) -> DataFrame:
        from big_data_flight_analytics_spark.operators.temporal import (
            ohlc_refold,
        )

        return ohlc_refold(store)

    def merge(self, batch_df: DataFrame, batch_id: int) -> None:
        from big_data_flight_analytics_spark.operators.temporal import (
            ohlc_state,
        )

        self._recover()
        if os.path.exists(self.path) and batch_id <= self._last_batch():
            return  # replay of an already-folded batch
        delta = ohlc_state(
            batch_df,
            self.key_col,
            self.ts_col,
            self.value_col,
            self.id_col,
            self.step_s,
        )
        if not os.path.exists(self.path):
            self._write_and_swap_with_marker(delta, batch_id)
            return
        if delta.isEmpty():
            self._advance_side_marker(batch_id)
            return
        self._append_delta(delta, batch_id)

    def read(self, spark) -> DataFrame:
        # lazy N-way fold of the root state + appended batch partials
        return self._compacted(self._read_store(spark))

    def bars(self, spark) -> DataFrame:
        """Public OHLC bar columns off the current state."""
        from big_data_flight_analytics_spark.operators.temporal import (
            ohlc_finalize,
        )

        return ohlc_finalize(self.read(spark), self.key_col, self.step_s)


class SessionSink(ParquetUpsertSink):
    """ORDERED-FEED SINK: events at or before a key's stored session
    boundary are DROPPED by design (no-grace watermark) — feed
    micro-batches in per-key event-time order or read the drop
    counters (``last_dropped`` / ``dropped_total``) to detect the
    truncation.

    Streaming face of the BOUNDARY-CONDITIONAL fold class (s19):
    maintain a persisted per-key session store by folding each
    micro-batch's sessionized state into it with
    ``temporal.session_fold`` — the foreachBatch sibling the third
    fold class lacked (DESIGN.md round-13: additive folds got
    marker-guarded sinks s13/s15/s16, idempotent folds marker-free
    ones s14/s18; sessionization's only streaming face was Spark's
    native ``session_window`` path, which cannot serve the persisted
    session-stats store this sink maintains).

    The fold's time-split contract — base sessions all end at or
    before a boundary, delta sessions all start after it — is enforced
    by the sink itself as its WATERMARK: each key's boundary is that
    key's max ``end_us`` in the store, and batch events at or before
    it are dropped before sessionizing (the no-grace late-record
    policy of the S2 tumbling sink, applied per key — the tightest
    watermark that still satisfies the per-key fold contract, since
    ``session_fold`` never compares sessions across keys). The
    boundary frame is O(keys) and broadcast while the store is small;
    past ``broadcast_bounds_max_rows`` store rows (upper-bounding the
    key count via a cheap zero-column count of the store) the watermark
    join runs un-broadcast instead, because at 100 TB-scale key
    cardinality a per-trigger O(keys) broadcast IS the bottleneck.
    Both paths compute the same filter, pinned equal by test. Under
    the split the only possible merge is the per-key boundary pair
    (no cascade), so each trigger costs O(delta events + session
    state), never O(history).

    Observability: the no-grace watermark makes the store correct
    ONLY for per-key-ordered feeds, so each ``merge`` records what it
    silently removed — ``last_dropped`` = {"null_ts": n, "late": n}
    for that batch, ``dropped_total`` accumulated across the sink's
    lifetime (ADVICE r14). ``dropped_total`` is PERSISTED as a
    ``_dropped`` sidecar written inside the staging dir — atomic with
    the store swap and the replay marker, so the totals survive a
    driver restart and a replayed batch can neither double-count nor
    lose its tally (ADVICE r15). The accounting costs one combined
    aggregate over the micro-batch (raw + non-NULL-ts counts) plus one
    count of the post-watermark survivors; the post-watermark frame is
    cached for the trigger so the store-read + bounds join evaluates
    once, not once per action (ADVICE r15). Pass
    ``track_dropped=False`` to skip the accounting in a
    throughput-critical topology.

    Exactly-once, twice over: the bridge merge is not idempotent in
    the additive sense (n_events sums across the boundary pair), so
    the sink carries the ``_last_batch`` marker like the other
    non-idempotent folds — AND the boundary watermark independently
    makes a full batch replay a no-op (every replayed event is <= the
    boundary it itself advanced, so the delta state is empty and the
    fold degenerates to a re-rank of the existing store). The replay
    test pins both lines of defense separately.
    """

    BROADCAST_BOUNDS_MAX_ROWS = 2_000_000

    def __init__(
        self,
        path: str,
        key_col: str = "user_id",
        ts_col: str = "ts",
        gap_seconds: int = 1800,
        tie_col: str = "event_id",
        broadcast_bounds_max_rows: int = BROADCAST_BOUNDS_MAX_ROWS,
        track_dropped: bool = True,
    ) -> None:
        super().__init__(path, key_col=key_col, version_col="__none")
        self.ts_col = ts_col
        self.gap_seconds = gap_seconds
        self.tie_col = tie_col
        self.broadcast_bounds_max_rows = broadcast_bounds_max_rows
        self.track_dropped = track_dropped
        self.last_dropped = {"null_ts": 0, "late": 0}
        self.dropped_total = self._load_dropped()

    _DROPPED_SIDECAR = "_dropped"

    def _load_dropped(self) -> dict:
        """Seed the lifetime drop totals from the store's persisted
        sidecar — restart-safe accounting (ADVICE r15)."""
        import json

        try:
            with open(os.path.join(self.path, self._DROPPED_SIDECAR)) as fh:
                return json.load(fh)
        except (OSError, ValueError):
            return {"null_ts": 0, "late": 0}

    def merge(self, batch_df: DataFrame, batch_id: int) -> None:
        from big_data_flight_analytics_spark.operators.temporal import (
            _micros,
            session_fold,
            session_stats,
        )

        self._recover()
        if os.path.exists(self.path) and batch_id <= self._last_batch():
            return  # replay of an already-folded batch
        spark = batch_df.sparkSession
        us = _micros(self.ts_col)
        if self.track_dropped:
            # one aggregate for both the raw and non-NULL-ts counts
            # (count(col) skips NULLs) — not two batch re-executions
            row = batch_df.agg(
                F.count(F.lit(1)).alias("__n"),
                F.count(F.col(self.ts_col)).alias("__t"),
            ).collect()[0]
            n_in, n_ts = row["__n"], row["__t"]
        else:
            n_in = n_ts = 0
        # NULL-ts events carry no session information and would pass
        # the per-key watermark for unseen keys (the isNull branch),
        # persisting NULL-bound sessions — same guard as ohlc_state
        batch_df = batch_df.filter(F.col(self.ts_col).isNotNull())
        store = None
        if os.path.exists(self.path):
            store = spark.read.parquet(self.path)
            bounds = store.groupBy(self.key_col).agg(
                F.max("end_us").alias("__bnd")
            )
            # store row count upper-bounds the key count; count()
            # over the unfiltered parquet store is a cheap zero-column
            # job (row-group metadata, no column decode): small store
            # -> broadcast the bounds; huge key space -> shuffle join,
            # same filter
            if store.count() <= self.broadcast_bounds_max_rows:
                bounds = F.broadcast(bounds)
            batch_df = (
                batch_df.join(bounds, self.key_col, "left")
                .filter(F.col("__bnd").isNull() | (us > F.col("__bnd")))
                .drop("__bnd")
            )
        cached = None
        if self.track_dropped:
            # cache the post-watermark survivors for the trigger: the
            # n_live count and the session build below share one
            # evaluation of the store read + bounds join (ADVICE r15)
            cached = batch_df.persist()
            batch_df = cached
            n_live = batch_df.count()
            self.last_dropped = {
                "null_ts": n_in - n_ts,
                "late": n_ts - n_live,
            }
            for k, v in self.last_dropped.items():
                self.dropped_total[k] += v
        try:
            delta = session_stats(
                batch_df.select(self.key_col, self.tie_col, self.ts_col),
                key_col=self.key_col,
                ts_col=self.ts_col,
                gap_seconds=self.gap_seconds,
                tie_col=self.tie_col,
            ).select(self.key_col, "start_us", "end_us", "n_events")
            if store is not None:
                updated = session_fold(
                    store, delta, self.key_col, self.gap_seconds
                )
            else:
                from pyspark.sql import Window

                w = Window.partitionBy(self.key_col).orderBy("start_us")
                updated = delta.select(
                    self.key_col,
                    F.row_number().over(w).cast("long").alias("session_idx"),
                    F.col("n_events").cast("long").alias("n_events"),
                    "start_us",
                    "end_us",
                    (F.col("end_us") - F.col("start_us")).alias("duration_us"),
                )
            import json

            # always carried (even with track_dropped=False) — the swap
            # replaces the dir, so omitting it would erase prior totals
            self._write_and_swap_with_marker(
                updated,
                batch_id,
                sidecars={
                    self._DROPPED_SIDECAR: json.dumps(self.dropped_total)
                },
            )
        finally:
            if cached is not None:
                cached.unpersist()

    def read(self, spark) -> DataFrame:
        return spark.read.parquet(self.path)


class GeoCountSink(DeltaDirStateSink):
    """Continuously maintained per-site distinct-point counts: the
    streaming face of i14. This sink implements the LIFETIME-distinct
    variant — it keeps the all-time (site, point) pair set and derives
    ``counts()`` from it. The reference's speed layer computes
    WINDOWED distinct counts instead: AirportAircraftCountStream
    aggregates a per-airport HashSet inside each 1-minute tumbling
    window (AirportAircraftCountStream.java:62-75), so its state is
    window-bounded and its counts are per-window. Windowing/TTL is
    therefore the real state-bounding option for this sink — alongside
    per-site KMV sketches — when the lifetime pair set outgrows the
    store.

    Each micro-batch of points radius-joins the (dimension-scale,
    broadcast) sites frame, reduces to its own distinct pair set, and
    APPENDS it as a ``delta-<batchid>`` subdir — per-trigger I/O is
    O(batch pairs), never an O(state) rewrite (the r15 finding: the
    old read-fold-swap merge decayed 938->250 rows/s from 4->16
    batches). The union fold is IDEMPOTENT (union + distinct, the
    KMV/Bloom class), so appended deltas may repeat pairs already in
    the store: ``read()`` applies the fold lazily (``distinct()``) and
    compaction discharges the duplicates physically on the usual
    cadence. Replay is safe two ways: the delta-dir name/sidecar
    marker short-circuits an exact batch-id replay, and even a
    marker-less replay under a fresh id re-folds to the same set.
    """

    def __init__(
        self,
        path: str,
        sites: DataFrame,
        point_id: str,
        site_id: str,
        radius_km: float,
        point_lat: str = "latitude",
        point_lon: str = "longitude",
        compact_every_n_batches: int = 16,
        **radius_kwargs,
    ) -> None:
        super().__init__(path, key_col=site_id, version_col="__none")
        self.sites = sites
        self.point_id = point_id
        self.site_id = site_id
        self.radius_km = radius_km
        self.point_lat = point_lat
        self.point_lon = point_lon
        self.compact_every_n_batches = compact_every_n_batches
        self.radius_kwargs = radius_kwargs

    def _compacted(self, store: DataFrame) -> DataFrame:
        # the set-union fold, applied physically: one distinct rewrite
        return store.distinct()

    def merge(self, batch_df: DataFrame, batch_id: int) -> None:
        from big_data_flight_analytics_spark.operators.geo import (
            radius_pairs_state,
        )

        self._recover()
        if os.path.exists(self.path) and batch_id <= self._last_batch():
            return  # exact replay; harmless to re-fold, cheaper to skip
        delta = radius_pairs_state(
            batch_df,
            self.sites,
            self.point_id,
            self.site_id,
            radius_km=self.radius_km,
            point_lat=self.point_lat,
            point_lon=self.point_lon,
            **self.radius_kwargs,
        )
        if not os.path.exists(self.path):
            # founding batch: flat root files via marker-guarded swap
            self._write_and_swap_with_marker(delta, batch_id)
            return
        if delta.isEmpty():
            # no pairs in radius: store untouched, sidecar only
            self._advance_side_marker(batch_id)
            return
        self._append_delta(delta, batch_id)

    def read(self, spark) -> DataFrame:
        # the lazy fold: root + deltas may repeat a pair a point
        # re-observed near a known site — distinct IS the union fold
        return self._read_store(spark).distinct()

    def counts(self, spark) -> DataFrame:
        """Per-site distinct-point counts off the current state."""
        from big_data_flight_analytics_spark.operators.geo import (
            radius_counts_from_state,
        )

        return radius_counts_from_state(
            self.read(spark), self.site_id, self.point_id
        )


class DatasetCardSink(ParquetUpsertSink):
    """Live dataset card during ingest (s20): each arriving batch's
    (source, lang_pred)-grain card state (i12's mergeable state,
    ``operators/quality.dataset_card_state``) folds into the persisted
    store — counts/token/char/quality-micro sums are ADDITIVE, the
    quality endpoints re-select idempotently, so the sink is
    marker-guarded like every additive fold (the HistogramSink class).
    ``report(spark)`` derives the full per-source release card (t25)
    from the state at any moment, mid-ingest — volume, token totals,
    quality endpoints, language mix — without rescanning history; the
    state stays O(sources x languages) however much has streamed
    through."""

    def __init__(
        self,
        path: str,
        source_col: str = "source",
        text_col: str = "text",
    ) -> None:
        super().__init__(path, key_col="source", version_col="__none")
        self.source_col = source_col
        self.text_col = text_col

    def merge(self, batch_df: DataFrame, batch_id: int) -> None:
        from big_data_flight_analytics_spark.operators.quality import (
            dataset_card_fold,
            dataset_card_state,
        )

        self._recover()
        if os.path.exists(self.path) and batch_id <= self._last_batch():
            return  # replay of an already-folded batch
        spark = batch_df.sparkSession
        delta = dataset_card_state(
            batch_df, self.source_col, self.text_col
        )
        if os.path.exists(self.path):
            updated = dataset_card_fold(
                spark.read.parquet(self.path), delta
            )
        else:
            updated = delta
        self._write_and_swap_with_marker(updated, batch_id)

    def read(self, spark) -> DataFrame:
        return spark.read.parquet(self.path)

    def report(self, spark) -> DataFrame:
        """The t25 per-source card off the current state."""
        from big_data_flight_analytics_spark.operators.quality import (
            dataset_card_report,
        )

        return dataset_card_report(self.read(spark))


class SketchPipelineSink:
    """Composed single-pass metrics ingest (s17): ONE ``foreachBatch``
    target folding every arriving micro-batch into all three mergeable
    sketches over ONE shared batch scan — the s12 composition lesson
    applied to the metrics plane:

    1. value distribution — ``HistogramSink`` (i6 fold);
    2. key cardinality — ``KMVSink`` (i7 fold);
    3. key frequencies — ``CMSSink`` (i8 fold).

    Running these as three separate streams parses and scans the
    arriving data three times; the composition persists one projected
    frame per micro-batch and every sketch folds off the cached scan.
    Exactly-once composes per stage IN ITS OWN PROTOCOL: the additive
    histogram/CMS folds short-circuit replayed batch ids via their
    ``_last_batch`` markers, while the KMV fold is idempotent and
    needs none — a crash mid-composition replays the whole batch and
    each stage settles correctly by its own mechanism (pinned by
    test).
    """

    def __init__(
        self,
        path: str,
        value_col: str,
        key_col: str,
        grain: int,
        k: int = 128,
        width: int = 1024,
    ) -> None:
        self.value_col = value_col
        self.key_col = key_col
        self.hist = HistogramSink(
            os.path.join(path, "histogram"), value_col, grain
        )
        self.kmv = KMVSink(os.path.join(path, "kmv"), key_col, k)
        self.cms = CMSSink(os.path.join(path, "cms"), key_col, width)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        shared = batch_df.select(self.value_col, self.key_col).persist()
        try:
            self.hist(shared, batch_id)
            self.kmv(shared, batch_id)
            self.cms(shared, batch_id)
        finally:
            shared.unpersist()

    def quantiles(self, spark, qs=None) -> DataFrame:
        return self.hist.quantiles(spark, qs)

    def distinct_estimate(self, spark) -> DataFrame:
        return self.kmv.estimate(spark)

    def frequency_estimate(self, spark, queries: DataFrame) -> DataFrame:
        return self.cms.estimate(spark, queries)


class BloomSink(ParquetUpsertSink):
    """Continuously maintained Bloom membership filter: the streaming
    face of j11's word table (``operators.joins``). Each micro-batch's
    keys hash into a delta word table (bounded: <= m/32 rows) that
    ORs into the persisted bitset — O(delta + m/32) per trigger, state
    <= m/32 rows forever. Arriving data can then be pre-filtered
    against everything ever seen ("have we ingested this key?")
    without rescanning history — the streaming form of pre-shuffle
    semi-join filtering.

    Exactly-once WITHOUT markers: bitwise OR is IDEMPOTENT (set
    semantics, the KMVSink class) — a replayed batch re-ORs the same
    bits. Crash atomicity from the staging/rename swap. The filter
    only grows (no deletes — standard Bloom); saturation is the m_bits
    sizing decision, monitored via ``fill_ratio``.
    """

    def __init__(self, path: str, key_col: str, m_bits: int) -> None:
        super().__init__(path, key_col="word_idx", version_col="__none")
        self.key_col = key_col
        self.m_bits = m_bits

    def merge(self, batch_df: DataFrame, batch_id: int) -> None:
        from big_data_flight_analytics_spark.operators.joins import (
            bloom_filter_words,
        )

        self._recover()
        spark = batch_df.sparkSession
        delta = bloom_filter_words(batch_df, self.key_col, self.m_bits)
        if os.path.exists(self.path):
            base = spark.read.parquet(self.path)
            b = base.select("word_idx", F.col("word").alias("__b"))
            d = delta.select("word_idx", F.col("word").alias("__d"))
            updated = b.join(d, "word_idx", "full").select(
                "word_idx",
                F.expr(
                    "COALESCE(__b, CAST(0 AS BIGINT))"
                    " | COALESCE(__d, CAST(0 AS BIGINT))"
                ).alias("word"),
            )
        else:
            updated = delta
        self._write_and_swap(updated)

    def read(self, spark) -> DataFrame:
        return spark.read.parquet(self.path)

    def probe(self, fact: DataFrame, fact_key: str) -> DataFrame:
        """Fact rows whose key MIGHT have been ingested (superset;
        no false negatives) — the j11 probe against the live state."""
        from big_data_flight_analytics_spark.operators.joins import (
            bloom_probe,
        )

        return bloom_probe(
            fact, fact_key, self.read(fact.sparkSession), self.m_bits
        )

    def fill_ratio(self, spark) -> float:
        """Fraction of the m bits set — the saturation monitor (fp
        rate ~ fill^depth)."""
        row = (
            self.read(spark)
            .select(F.bit_count("word").alias("bits"))
            .agg(F.sum("bits").alias("set_bits"))
            .collect()[0]
        )
        return (row["set_bits"] or 0) / self.m_bits


class BM25StatsSink(ParquetUpsertSink):
    """Continuously maintained BM25 corpus statistics (s22): each
    arriving documents batch's stats row (``operators/text.bm25_stats``
    — n_docs, s_tokens, df per term) folds into the persisted one-row
    store via ``bm25_stats_fold``. The fold class is ADDITIVE (plain
    int64 sums), so the sink is marker-guarded like every additive
    fold (the HistogramSink class); state is O(terms) — bounded by the
    fixed scoring vocabulary, not the stream — so the read-fold-swap
    rewrite is O(1) per trigger and the delta-dir layout would add
    moving parts without changing asymptotics (DESIGN.md round-16
    fold-class table rule). ``topk(spark, docs, k)`` scores any
    document set against the CURRENT stats without rescanning ingest
    history — the i16 incremental claim as a serving face: idf/avgdl
    stay fresh per batch at O(batch) text cost."""

    def __init__(
        self,
        path: str,
        terms: "list[str] | tuple[str, ...]",
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> None:
        super().__init__(path, key_col="n_docs", version_col="__none")
        self.terms = list(terms)
        self.text_col = text_col
        self.id_col = id_col

    def merge(self, batch_df: DataFrame, batch_id: int) -> None:
        from big_data_flight_analytics_spark.operators.text import (
            bm25_per_doc,
            bm25_stats,
            bm25_stats_fold,
        )

        self._recover()
        if os.path.exists(self.path) and batch_id <= self._last_batch():
            return  # replay of an already-folded batch
        spark = batch_df.sparkSession
        delta = bm25_stats(
            bm25_per_doc(
                batch_df,
                self.terms,
                text_col=self.text_col,
                id_col=self.id_col,
            ),
            len(self.terms),
        )
        if os.path.exists(self.path):
            updated = bm25_stats_fold(spark.read.parquet(self.path), delta)
        else:
            updated = delta
        self._write_and_swap_with_marker(updated, batch_id)

    def read(self, spark) -> DataFrame:
        return spark.read.parquet(self.path)

    def topk(self, spark, docs: DataFrame, k: int = 10, **kwargs) -> DataFrame:
        """t17 ranking over ``docs`` against the maintained stats."""
        from big_data_flight_analytics_spark.operators.text import bm25_topk

        return bm25_topk(
            docs,
            self.terms,
            k=k,
            text_col=self.text_col,
            id_col=self.id_col,
            totals=self.read(spark),
            **kwargs,
        )
