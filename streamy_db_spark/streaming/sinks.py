"""Exactly-once file sink for Structured Streaming via ``foreachBatch``.

Structured Streaming's ``foreachBatch`` is AT-LEAST-ONCE: after a crash
between the user function succeeding and the checkpoint commit, the SAME
``batch_id`` is replayed on restart. The standard exactly-once recipe
(Structured Streaming programming guide, foreachBatch section) is to
make the write idempotent on ``batch_id``: each micro-batch owns its own
``batch=<id>`` directory written with overwrite semantics, so a replay
replaces identical content instead of appending duplicates.

The built-in parquet sink already gets exactly-once via its own write
log; this wrapper exists for sinks the engine composes itself inside
``foreachBatch`` (multi-table fanout, merge-style upserts, non-Spark
stores) where the guarantee has to be constructed, not inherited —
that's the piece a pipeline author actually gets wrong. Scale: one
directory per micro-batch keeps commits O(batch) regardless of history;
compact with sources/files.write_clustered when batch counts grow.

Reference parity: the Kafka sink in the reference relies on Flink's
TwoPhaseCommit / read_committed (flink/StreamyDb.scala:180-181,
beam/package.scala:45); per-batch-directory overwrite is the
file-system analogue of that transactional sink discipline.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def idempotent_parquet_sink(out_dir: str) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` function writing each micro-batch to its own
    ``batch=<id>`` directory with overwrite — replayed batches after a
    crash overwrite themselves, never duplicate."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    return write


def read_sink(
    spark: SparkSession, out_dir: str, schema: str | None = None
) -> DataFrame:
    """Read the union of all committed batch directories (the consumer
    view of the sink). ``batch`` arrives as a partition column and is
    dropped — batch boundaries are an implementation detail.

    A sink polled BEFORE its first batch commits has zero ``batch=*``
    directories; rather than throw (unable to infer schema), return an
    explicitly-empty DataFrame — with ``schema`` when the caller can
    supply it, else zero columns. Globbed through the Hadoop FileSystem
    API (any scheme Spark can read); under Spark Connect (no ``_jvm``)
    the same answer comes from classifying the read error."""
    from pyspark.errors import AnalysisException  # noqa: PLC0415
    from pyspark.sql import types as T  # noqa: PLC0415

    def _empty() -> DataFrame:
        return spark.createDataFrame([], schema if schema else T.StructType([]))

    def _read() -> DataFrame:
        return spark.read.option("basePath", out_dir).parquet(
            f"{out_dir}/batch=*"
        ).drop("batch")

    from streamy_db_spark.sources.files import hadoop_fs

    fs, mk = hadoop_fs(spark, out_dir)
    if fs is None:  # Spark Connect session
        from streamy_db_spark.sources.files import is_missing_path_error

        try:
            df = _read()
            df.schema
            return df
        except AnalysisException as exc:
            if is_missing_path_error(exc):
                return _empty()
            raise
    committed = fs.globStatus(mk(out_dir.rstrip("/") + "/batch=*"))
    if committed is None or len(committed) == 0:
        return _empty()
    return _read()


class _NearDedupSink:
    """The callable ``near_dedup_sink`` returns: a ``foreachBatch``
    function that ALSO owns the stream-lifetime heartbeat. The guard in
    incremental._guard_compact_vs_stream reasons 'a fresh heartbeat
    means a live stream owns this state dir' — so the heartbeat must be
    fresh for the STREAM's lifetime, not just while a micro-batch body
    is executing: with only per-batch keepers, a stream whose trigger
    interval exceeds the guard's max age looks dead between triggers,
    and a compaction started there can be mid write-then-swap when the
    next batch fires (r8 advice — silent dedup-state loss). The
    lifetime keeper starts at construction and runs until ``close()``
    (or context-manager exit); until then, ``compact_state`` on this
    state dir refuses without ``force=True`` — which is exactly the
    ownership semantics the guard promises. Stop the query, then
    ``close()`` the sink, then compact.

    IDLE AUTO-RELEASE: the canonical inline usage
    ``writeStream.foreachBatch(near_dedup_sink(...))`` retains no
    reference for close(), and py4j's callback registry PINS the
    registered callable for the life of the driver (measured r9: the
    sink is not collected even after query stop + explicit JVM and
    Python GC), so a GC finalizer alone can never release ownership
    there. Instead the lifetime keeper LAPSES after
    ``idle_release_s`` without a micro-batch: its beat thread EXITS (so
    the heartbeat ages out and compact_state unblocks ~max_age_s
    later — and a pinned sink never leaks an idle-looping thread per
    started stream, r9 second review) and a fresh thread starts on the
    next batch. Streams whose trigger interval exceeds
    ``idle_release_s`` (default 1 h) must raise it — or keep the
    close() discipline, which releases immediately. A lapse does NOT
    mean the stream is stopped: a live stream whose DATA went quiet
    lapses too, and its next batch can land mid-compaction — which is
    why compact_parquet re-runs the heartbeat guard immediately before
    its swap (pre_swap_check): the batch's first touch (keeper entry,
    before any state read) aborts the swap, shrinking the race to the
    instant between re-check and rename. A weakref finalizer still
    stops the keeper thread on the paths where the sink IS collectable
    (direct use, tests)."""

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        out_dir: str,
        id_col: str = "doc_id",
        sig_threshold: float = 0.5,
        lifetime_heartbeat: bool = True,
        heartbeat_interval_s: float = 60.0,
        idle_release_s: float = 3600.0,
        deduper=None,
    ):
        import threading
        import time as _time
        import weakref

        from streamy_db_spark.operators.incremental import (
            IncrementalNearDeduper,
            stream_heartbeat_keeper,
            touch_stream_heartbeat,
        )

        self._spark = spark
        self._state_path = state_path
        # the sink body is generic over its admission gate (anything
        # with the process_batch(df, batch_id) contract); the default
        # is the lexical near-dup gate, semantic_dedup_sink passes the
        # embedding gate in
        self._deduper = deduper or IncrementalNearDeduper(
            spark, state_path, id_col=id_col, sig_threshold=sig_threshold
        )
        self._write = idempotent_parquet_sink(out_dir)
        self._keeper_cls = stream_heartbeat_keeper
        self._hb_interval_s = heartbeat_interval_s
        self._idle_release_s = idle_release_s
        self._finalizer = None
        self._beat_thread = None
        self._thread_cls = threading.Thread
        if lifetime_heartbeat:
            touch_stream_heartbeat(spark, state_path)  # ownership starts NOW
            self._monotonic = _time.monotonic
            self._last_activity = self._monotonic()
            stop = threading.Event()
            self._stop_event = stop
            sink_ref = weakref.ref(self)

            # plain function (not a method) so the thread and finalizer
            # hold no reference back to self — self must stay collectable
            def beat(
                spark=spark,
                state_path=state_path,
                interval=heartbeat_interval_s,
                idle=idle_release_s,
                monotonic=_time.monotonic,
                sink_ref=sink_ref,
            ) -> None:
                while not stop.wait(interval):
                    ref = sink_ref()
                    if ref is None:
                        return  # sink collected: finalizer also fires
                    lapsed = monotonic() - ref._last_activity > idle
                    # drop the strong ref BEFORE sleeping — a frame-held
                    # reference across wait() would keep the sink alive
                    # forever and defeat the finalizer (measured r9)
                    ref = None
                    if lapsed:
                        # EXIT the thread, don't idle-loop: py4j pins
                        # inline-registered sinks for the driver's life,
                        # so a looping lapsed keeper is a leaked thread
                        # per started stream (r9 second review).
                        # __call__ starts a fresh thread on the next
                        # batch.
                        return
                    if stop.is_set():
                        return  # close() raced the wait: don't touch
                    try:
                        touch_stream_heartbeat(
                            spark, state_path, only_if_exists=True
                        )
                    except Exception:  # noqa: BLE001 - next beat retries
                        pass

            self._beat = beat
            self._beat_thread = threading.Thread(target=beat, daemon=True)
            self._beat_thread.start()
            self._finalizer = weakref.finalize(self, stop.set)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        # batch_id disambiguates crash-replay (same id ⇒ re-emit the
        # original output, sink overwrites with identical content) from
        # an upstream re-send in a LATER batch (dropped, never
        # duplicated into a new batch directory). The per-batch keeper
        # is kept even under the lifetime keeper as defense in depth
        # for lifetime_heartbeat=False callers (it bounds heartbeat
        # staleness DURING a long batch to the keeper interval) and it
        # refreshes activity so a lapsed lifetime keeper resumes.
        self._resume_keeper()
        with self._keeper_cls(
            self._spark, self._state_path, interval_s=self._hb_interval_s
        ):
            self._write(
                self._deduper.process_batch(batch_df, batch_id=batch_id),
                batch_id,
            )
        # resume at the END too: a batch that ran longer than
        # idle_release_s lapsed the keeper mid-batch (the per-batch
        # keeper above covered the heartbeat meanwhile) — without this
        # the lifetime keeper would stay dead until the NEXT batch
        self._resume_keeper()

    def _resume_keeper(self) -> None:
        """Refresh activity and, if the lapsed lifetime keeper exited
        its thread, start a fresh one (foreachBatch calls are serial
        per query, so no start race). No-op after close()."""
        if self._finalizer is None:
            return
        self._last_activity = self._monotonic()
        if (
            self._finalizer.alive
            and self._beat_thread is not None
            and not self._beat_thread.is_alive()
        ):
            self._beat_thread = self._thread_cls(target=self._beat, daemon=True)
            self._beat_thread.start()

    def close(self) -> None:
        """Release stream ownership: stop the lifetime heartbeat so a
        (sufficiently aged-out) compact_state can run. Idempotent; the
        weakref finalizer calls the same stop when the sink object is
        collectable and collected without an explicit close. JOINS the
        beat thread so no in-flight final touch can land AFTER close()
        returns — callers (and the tests) rely on 'after close() the
        heartbeat only ages'; the GC-finalizer path has no such
        ordering contract and just sets the stop event."""
        if self._finalizer is not None:
            self._finalizer()  # runs at most once; detaches itself
        t = self._beat_thread
        if t is not None and t.is_alive():
            t.join(timeout=10)
            if t.is_alive():  # a wedged FS touch: don't hang close()
                import warnings

                warnings.warn(
                    "near_dedup_sink.close(): beat thread still running "
                    "after 10 s (slow filesystem touch in flight) — a "
                    "final heartbeat may land after close(); an "
                    "immediately-following compact_state would be "
                    "REFUSED (safe direction), retry after the touch "
                    "lands or use force=True",
                    RuntimeWarning,
                    stacklevel=2,
                )

    def __enter__(self) -> "_NearDedupSink":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def near_dedup_sink(
    spark: SparkSession,
    state_path: str,
    out_dir: str,
    id_col: str = "doc_id",
    sig_threshold: float = 0.5,
    lifetime_heartbeat: bool = True,
    heartbeat_interval_s: float = 60.0,
    idle_release_s: float = 3600.0,
) -> _NearDedupSink:
    """Streaming near-dup admission as a ``foreachBatch`` function — the
    Structured Streaming twin of
    operators/incremental.IncrementalNearDeduper, completing the
    symmetry dedup_stream_content ↔ IncrementalDeduper already has for
    exact dedup.

    Each micro-batch runs MinHash-LSH admission against the shared
    parquet signature state and lands its accepted rows in a
    ``batch=<id>`` directory with overwrite semantics. Exactly-once
    composition: process_batch re-emits previously-accepted rows on a
    crash-replayed batch (id-membership in state) and appends nothing,
    so the replay overwrites the committed directory with IDENTICAL
    content — no loss, no duplication. The state lives outside the
    Spark state store on purpose: the same parquet signatures serve
    batch backfill (IncrementalNearDeduper directly) and the live
    stream, so both admit identical sets.

    The returned object is callable (pass it to ``foreachBatch``) and
    owns a STREAM-LIFETIME heartbeat on the state dir (see
    _NearDedupSink): construction marks the state stream-owned;
    ``close()`` — or using the sink as a context manager — releases it
    deterministically, and the keeper auto-lapses after
    ``idle_release_s`` without a batch so an unreferenced sink from a
    stopped stream cannot block compaction forever (py4j pins inline
    foreachBatch callables, so GC release alone is not enough —
    measured r9). Streams with trigger intervals above
    ``idle_release_s`` must raise it. ``lifetime_heartbeat=False``
    reverts to per-batch-only heartbeats, which is only safe when the
    trigger interval is well under the compact guard's
    ``stream_heartbeat_max_age_s`` (600 s default)."""
    return _NearDedupSink(
        spark,
        state_path,
        out_dir,
        id_col=id_col,
        sig_threshold=sig_threshold,
        lifetime_heartbeat=lifetime_heartbeat,
        heartbeat_interval_s=heartbeat_interval_s,
        idle_release_s=idle_release_s,
    )


def semantic_dedup_sink(
    spark: SparkSession,
    state_path: str,
    out_dir: str,
    centroids=None,
    threshold: float = 0.90,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lifetime_heartbeat: bool = True,
    heartbeat_interval_s: float = 60.0,
    idle_release_s: float = 3600.0,
    strict_id_membership: bool = False,
) -> _NearDedupSink:
    """Streaming SemDeDup admission as a ``foreachBatch`` function — the
    Structured Streaming twin of
    operators/incremental.IncrementalSemanticDeduper, completing the
    family symmetry (exact: dedup_stream_content ↔ IncrementalDeduper;
    lexical: near_dedup_sink ↔ IncrementalNearDeduper; semantic: this).

    Same exactly-once composition as near_dedup_sink: per-batch
    ``batch=<id>`` overwrite directories, crash-replays re-emit the
    original output and append nothing, state shared with batch
    backfill so both admit identical sets — and the same stream-
    lifetime heartbeat ownership (construction marks the state dir
    stream-owned; close()/context-exit releases; the keeper lapses
    after ``idle_release_s`` and compact_parquet's pre-swap re-check
    covers the quiet-live-stream window).

    ``centroids`` follows IncrementalSemanticDeduper's pinning: pass
    the matrix on first use (it persists with the state), None to reuse
    the persisted one; a mismatched matrix raises.
    ``strict_id_membership`` passes through to the gate: streams whose
    upstream can re-send an accepted id with a DRIFTED embedding (e.g.
    a re-embedded crawl) set it True to keep the unconditional
    drop-on-id-match re-send contract, at O(state) id-scan per trigger."""
    from streamy_db_spark.operators.incremental import (
        IncrementalSemanticDeduper,
    )

    return _NearDedupSink(
        spark,
        state_path,
        out_dir,
        id_col=id_col,
        lifetime_heartbeat=lifetime_heartbeat,
        heartbeat_interval_s=heartbeat_interval_s,
        idle_release_s=idle_release_s,
        deduper=IncrementalSemanticDeduper(
            spark,
            state_path,
            centroids=centroids,
            threshold=threshold,
            id_col=id_col,
            vec_col=vec_col,
            strict_id_membership=strict_id_membership,
        ),
    )


def substring_dedup_sink(
    spark: SparkSession,
    state_path: str,
    out_dir: str,
    id_col: str = "doc_id",
    window: int | None = None,
    min_docs: int = 2,
    lifetime_heartbeat: bool = True,
    heartbeat_interval_s: float = 60.0,
    idle_release_s: float = 3600.0,
) -> _NearDedupSink:
    """Streaming ExactSubstr span detection as a ``foreachBatch``
    function — the Structured Streaming twin of
    operators/incremental_substring.IncrementalSubstrDeduper,
    completing the incremental symmetry for the LAST dedup family
    (exact: dedup_stream_content ↔ IncrementalDeduper; lexical:
    near_dedup_sink ↔ IncrementalNearDeduper; semantic:
    semantic_dedup_sink ↔ IncrementalSemanticDeduper; substring: this).

    Unlike the admission sinks, each ``batch=<id>`` directory holds the
    batch's newly-duplicated SPANS — (id_col, start_tok, end_tok),
    including RETRO spans for earlier-ingested docs whose passages only
    now became duplicated (the family's changelog shape; merging the
    union of all batch directories per doc equals one-shot
    duplicated_spans over everything ingested — the gate's pinned
    equality contract). Same exactly-once composition (crash-replays
    re-emit identical spans and the per-batch directory overwrites
    itself), same stream-lifetime heartbeat ownership, same state
    sharing with batch backfill."""
    from streamy_db_spark.operators.incremental_substring import (
        IncrementalSubstrDeduper,
    )
    from streamy_db_spark.operators.substring import SUBSTR_WINDOW

    return _NearDedupSink(
        spark,
        state_path,
        out_dir,
        id_col=id_col,
        lifetime_heartbeat=lifetime_heartbeat,
        heartbeat_interval_s=heartbeat_interval_s,
        idle_release_s=idle_release_s,
        deduper=IncrementalSubstrDeduper(
            spark,
            state_path,
            id_col=id_col,
            window=SUBSTR_WINDOW if window is None else window,
            min_docs=min_docs,
        ),
    )
