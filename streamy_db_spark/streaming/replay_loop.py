"""File-coupled streaming replay loop — the tested stand-in for the
reference's Kafka topology (SURVEY.md §3.1: no broker in this
container, so parquet directories stand in for the four topics; the
operator topology — key stage, txn stage, feedback derivation — is
identical to streaming/engine_stream's Kafka wiring in
sources/kafka.py).

Lives in the library (not tests/) because it is BOTH the correctness
harness (tests/test_engine_stream.py drives oracle-parity, kill-restart
and redelivery scenarios through it) and the streaming THROUGHPUT bench
surface (bench.py protocol_stream_10k runs it under the RocksDB state
store provider) — the r7 verdict's "streaming engine has correctness
tests but zero recorded throughput" gap.
"""

from __future__ import annotations

import contextlib
import os
from datetime import datetime, timezone

from streamy_db_spark import fixtures
from streamy_db_spark.streaming import engine_stream as es


@contextlib.contextmanager
def _conf_override(spark, confs: dict[str, str]):
    """Set session SQL confs for the duration of a block, restoring
    each on exit — set back to its prior readable value, or unset when
    the conf had none (some streaming confs have no registered default
    visible to conf.get). The ONE shared implementation for the replay
    drivers' shuffle_partitions knob and with_rocksdb: three hand-rolled
    save/set/restore copies had already diverged, and one leaked its
    setting into the session when setup raised before its try block
    (r9 review)."""
    prev: dict[str, str | None] = {}
    try:
        # the set loop runs INSIDE the try: a conf.set that raises
        # partway through the dict must still restore the keys already
        # applied (r9 second review — the leak the helper exists to fix,
        # one level up). prev records a key only AFTER its set succeeds:
        # a key whose set failed was never modified, and re-setting it in
        # the finally would raise the same error again, masking the
        # original exception (r9 third review).
        for key, val in confs.items():
            try:
                old = spark.conf.get(key)
            except Exception:  # noqa: BLE001 - no value and no default
                old = None
            spark.conf.set(key, val)
            prev[key] = old
        yield
    finally:
        for key, old in prev.items():
            try:
                if old is None:
                    spark.conf.unset(key)
                else:
                    spark.conf.set(key, old)
            except Exception:  # noqa: BLE001 - best-effort: one failed
                pass  # restore must not abort the remaining restores


#: pyarrow mirror of engine_stream.KEY_MSG — heartbeats are written
#: driver-side without a Spark job (see write_heartbeat).
def _key_msg_arrow_schema():
    import pyarrow as pa

    return pa.schema(
        [
            pa.field("ts", pa.timestamp("us", tz="UTC"), nullable=False),
            pa.field("ts_ms", pa.int64(), nullable=False),
            pa.field("kafka_partition", pa.int32(), nullable=False),
            pa.field("kafka_offset", pa.int64(), nullable=False),
            pa.field("kind", pa.int32(), nullable=False),
            pa.field("transaction_id", pa.string(), nullable=False),
            pa.field("key", pa.string(), nullable=False),
            pa.field("succeeded", pa.bool_(), nullable=True),
            pa.field("value", pa.string(), nullable=True),
        ]
    )


def write_heartbeat(spark, requests_dir: str, n: int) -> None:
    """One KEY_MSG heartbeat row (kind 3 — ignored by the processor) with
    a fresh event time: advances the global watermark so timers fire.

    Written DRIVER-SIDE with pyarrow, not a Spark job: the original
    ``createDataFrame().write`` form queued a full job behind the
    streams' micro-batches — measured at a **7.5 s mean per beat** under
    the continuous 10k replay (14 beats ≈ 106 s of scheduler contention
    for one row each). A one-row parquet write is microseconds of local
    I/O. Atomic for the file source: written to a dot-prefixed temp name
    (hidden from Spark's file listing) then renamed into place, so a
    trigger can never list a half-written file. The filename carries a
    per-call uuid besides ``n``: FileStreamSource dedups by PATH, so a
    resumed run against an existing checkpoint (where ``n`` restarts at
    0) must never rename a fresh beat over a path the source already
    recorded as seen — that beat would be invisible and the watermark
    would wedge (r9 review). ``spark`` is kept in the signature for
    call-site compatibility (and future remote-FS use — the
    file-coupled loop itself is the local stand-in for Kafka, so local
    paths are inherent here)."""
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    now = datetime.now(timezone.utc)
    table = pa.table(
        {
            "ts": [now],
            "ts_ms": [int(now.timestamp() * 1000)],
            "kafka_partition": [-1],
            "kafka_offset": [-1],
            "kind": [3],
            "transaction_id": ["__hb__"],
            "key": ["__hb__"],
            "succeeded": [None],
            "value": [None],
        },
        schema=_key_msg_arrow_schema(),
    )
    os.makedirs(requests_dir, exist_ok=True)
    stem = f"hb_{n}_{uuid.uuid4().hex[:12]}.parquet"
    final = os.path.join(requests_dir, stem)
    tmp = os.path.join(requests_dir, f".{stem}.tmp")
    pq.write_table(table, tmp)
    os.rename(tmp, final)


def _loop_dirs(spark, txns, tmp):
    """Shared topology setup for BOTH loop drivers (availableNow and
    continuous — extracted so the bench surface and the correctness
    harness can never drift, r9 review): the four 'topic' directories,
    the materialized transaction log, and the derived request stream.
    Returns (dirs, requests_dir, n_txns)."""
    d = {n: os.path.join(tmp, n) for n in
         ("input", "feedback", "read_results", "results", "ckpt")}
    os.makedirs(d["feedback"], exist_ok=True)
    os.makedirs(d["read_results"], exist_ok=True)
    os.makedirs(d["results"], exist_ok=True)

    txn_df = fixtures.to_dataframe(spark, txns)
    txn_df.write.mode("overwrite").parquet(d["input"])
    n_txns = txn_df.select("transaction_id").distinct().count()

    # Heartbeat "partition" dir structure: requests + heartbeats co-located.
    requests_dir = os.path.join(tmp, "requests")
    es.derive_key_messages(spark.read.parquet(d["input"])).write.mode(
        "overwrite"
    ).parquet(requests_dir)
    return d, requests_dir, n_txns


def _key_stage_stream(spark, d, requests_dir, watermark_delay=None, throttle=None):
    """Q1 — key stage: requests+heartbeats ∪ feedback → S1+S2."""
    reqs = spark.readStream.schema(es.KEY_MSG).option(
        "recursiveFileLookup", "true"
    ).options(**(throttle or {})).parquet(requests_dir)
    # recursiveFileLookup: feedback lands in per-batch subdirectories
    # since the r10 fused txn sink (and it disables partition-column
    # inference, so the batch= path segment never surfaces)
    fb = spark.readStream.schema(es.KEY_MSG).option(
        "recursiveFileLookup", "true"
    ).parquet(d["feedback"])
    merged = reqs.unionByName(fb)
    if watermark_delay is None:
        return es.key_stage(merged)
    return es.key_stage(merged, watermark=watermark_delay)


def _txn_stage_stream(spark, d):
    """Q2 — txn stage: bodies ∪ read-results → S3."""
    bodies = es.derive_txn_bodies(
        spark.readStream.schema(fixtures.schemas.TRANSACTION_LOG).parquet(
            d["input"]
        )
    )
    reads = es.read_results_as_txn_msgs(
        spark.readStream.schema(es.READ_RESULT_OUT).parquet(d["read_results"])
    )
    return es.txn_stage(bodies.unionByName(reads))


def _txn_fused_write(d):
    """``foreachBatch`` for the txn stage that writes the batch's
    results AND its derived feedback (stateless D5) in one pass —
    removing the third streaming query from the loop (r9 verdict item
    4: the feedback hop cost a full query start/stop per availableNow
    round and a trigger-latency hop per continuous round, for a
    row-level projection).

    Idempotence: both writes go through sinks.idempotent_parquet_sink
    (per-batch ``batch=<id>`` directories with overwrite — ONE tested
    implementation of the exactly-once recipe, not a copy) — a batch
    replayed after a crash rewrites the same deterministic content
    (its rows derive from the checkpointed source offsets) instead of
    appending duplicates, preserving the one-verdict-per-transaction
    invariant _collect_verdicts enforces. Readers of both dirs use
    recursiveFileLookup (which also disables partition-column
    inference, so the ``batch=`` path segment never surfaces as a
    column).

    CONCURRENT-READER CONTRACT (r10 advice): foreachBatch plain writes
    carry no _spark_metadata commit log, and a crash-replayed batch's
    per-directory overwrite DELETES files a concurrent reader may have
    already listed — so a reader racing the writer can transiently see
    a FileNotFoundException (vanished listed file) as well as double/
    under-counts (half-written directory), and must tolerate BOTH by
    retrying, never by failing the run. In-tree readers comply: the
    continuous done-poll wraps its Spark-side count in
    catch-retry-next-tick (and _raw_result_rows returns None on any
    unreadable footer), the key-stage feedback file source only lists
    after the trigger that committed the files, and _collect_verdicts
    runs strictly after every query has stopped."""
    from streamy_db_spark.streaming.sinks import idempotent_parquet_sink

    write_results = idempotent_parquet_sink(d["results"])
    write_feedback = idempotent_parquet_sink(d["feedback"])

    def write(batch_df, batch_id: int) -> None:
        # materialize ONCE: results write + feedback derivation both
        # consume the batch, the upstream is a stateful stage, and a
        # second action on a foreachBatch frame re-executes the plan
        from streamy_db_spark.session import release_local_checkpoints

        b = batch_df.localCheckpoint(eager=True)
        try:
            if b.isEmpty():
                # nothing to land and empty feedback carries no signal; a
                # crash-replayed batch is deterministic, so a batch that
                # wrote content before can never replay as empty
                return
            write_results(b, batch_id)
            write_feedback(es.derive_feedback(b), batch_id)
        finally:
            # both sinks are synchronous parquet writes — the batch is
            # fully consumed; release its checkpoint or a long-running
            # query pins one per trigger forever (guide §5, the r13
            # replay lifecycle rule)
            release_local_checkpoints(b)

    return write


def _collect_verdicts(spark, d):
    """Final verdict map with the one-verdict-per-transaction invariant
    (explicit raise: survives python -O, unlike assert — r8 review)."""
    results_df = (
        spark.read.schema(es.TXN_RESULT_OUT)
        .option("recursiveFileLookup", "true")
        .parquet(d["results"])
        .select("transaction_id", "succeeded")
    )
    results = results_df.collect()
    n_distinct = results_df.select("transaction_id").distinct().count()
    if len(results) != n_distinct:
        raise RuntimeError(
            f"duplicate verdicts: {len(results)} rows for "
            f"{n_distinct} transactions"
        )
    return {r["transaction_id"]: r["succeeded"] for r in results}


def run_streaming_replay(
    spark,
    txns,
    tmp,
    max_rounds=30,
    duplicate_feedback=False,
    interrupt_rounds=frozenset(),
    return_dirs=False,
    watermark_delay="0 seconds",
    stats=None,
    shuffle_partitions=None,
):
    """``interrupt_rounds``: in those loop rounds the key stage is KILLED
    mid-run — the source is throttled to one file per micro-batch so the
    sink has committed a partial round's output when stop() lands, and
    the next round restarts from the same checkpoint (the crash-recovery
    scenario; reference flink/StreamyDb.scala:180-181 checkpointing).

    ``watermark_delay`` MUST cover the fixture's event-time span whenever
    ingestion is multi-batch (interrupt rounds throttle to 1 file/batch):
    with a 0-second delay, the first committed batch advances the
    watermark to its own max event time and every older row in the
    REMAINING request files is silently dropped as late (observed: batch
    0 = one part file → watermark jumps to the fixture's :17 mark → ~85%
    of the workload discarded; the loop then wedges with verdicts stuck
    in ``early``). The single-batch tests get away with 0 because all
    requests enter in one batch, before any watermark advance. This is
    the same sizing rule production needs for out-of-order sources —
    engine_stream._admit's docstring says exactly this.

    ``shuffle_partitions``: same state-partition sizing knob as the
    continuous runner (see run_streaming_replay_continuous) — applied
    for the whole loop and restored on exit, so both loop forms can be
    benched under identical state layouts and their delta isolates the
    per-round query restart tax."""
    confs = {}
    if shuffle_partitions is not None:
        confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    with _conf_override(spark, confs):
        return _run_streaming_replay_inner(
            spark, txns, tmp, max_rounds, duplicate_feedback,
            interrupt_rounds, return_dirs, watermark_delay, stats,
        )


def kill_streaming_query(q, timeout_s: float = 60.0) -> None:
    """Violently stop a streaming query — the crash-simulation
    primitive shared by the replay loop's interrupt rounds and the
    kill-restart tests (tests/stream_kill.py delegates here so the
    contract lives in ONE place, r12 review). stop() interrupts the
    in-flight micro-batch, and under load the interruption can surface
    from stop()/awaitTermination as a QueryExecution error instead of a
    clean termination; that error IS the simulated crash — swallow it.
    Blocks until the instance actually releases (JVM-side cleanup lags
    isActive) and raises if it never does, because a same-checkpoint
    restart against a still-active twin fails with
    'another instance of this query is already active'."""
    import time as _t

    try:
        q.stop()
    except Exception:  # noqa: BLE001 - the kill is the point
        pass
    try:
        q.awaitTermination(timeout_s)
    except Exception:  # noqa: BLE001
        pass
    deadline = _t.time() + timeout_s
    while _t.time() < deadline and q.isActive:
        _t.sleep(0.2)
    if q.isActive:
        raise RuntimeError("killed streaming query failed to release")


#: Substrings identifying the KNOWN-TRANSIENT start failures worth
#: retrying. Anything else (bad checkpoint, missing path, analysis
#: error) is deterministic and must surface immediately — retrying it
#: 5x with sleeps only delays and blurs the real error (r12 advice).
_TRANSIENT_START_MARKERS = (
    # a just-killed twin's JVM-side cleanup lags q.isActive going false
    "already active",
    # same race, surfaced as the checkpoint dir's lock still held
    "could not acquire lock",
)


def start_query_with_retry(start, attempts: int = 5, delay_s: float = 1.0):
    """Start (or restart) a streaming query, retrying ONLY the known
    transient races — chiefly 'another instance of this query is
    already active' when a just-killed twin's JVM-side cleanup lags
    q.isActive going false (the r12 review's gap: the tests got this
    retry in r12's deflake, the library's restart-after-kill path did
    not). Deterministic start failures re-raise on first sight."""
    import time as _t

    for i in range(attempts):
        try:
            return start()
        except Exception as exc:  # noqa: BLE001 - transient-matched below
            msg = str(exc).lower()
            if not any(m in msg for m in _TRANSIENT_START_MARKERS):
                raise
            if i == attempts - 1:
                raise
            _t.sleep(delay_s)
    raise AssertionError("unreachable")  # loop always returns or raises


#: Trigger cadence for the round-driven loop's PERSISTENT queries — a
#: drain-polling detail of this harness form (processAllAvailable does
#: not force a trigger, it waits for one), not a deployment knob; the
#: continuous runner keeps its production-shaped default.
_ROUND_TRIGGER = "50 milliseconds"


def _drain_all_available(q, name: str, timeout_s: float = 120.0) -> None:
    """Block until ``q`` has processed every source file available now
    — the awaitTermination-gated round primitive (r13 verdict item 1:
    the loop used to STOP and RESTART both stateful queries every
    feedback round, paying query teardown + state-store reload + plan
    compile ~13 times per 10k replay; a living query pays only the
    batch). processAllAvailable has no timeout parameter, so it runs on
    a helper thread to preserve the loop's bounded failure mode, and
    any query exception is re-raised here (PAA returns when the stream
    dies)."""
    import threading

    t = threading.Thread(target=q.processAllAvailable, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        raise RuntimeError(f"{name} did not drain in {timeout_s:.0f}s")
    exc = q.exception()
    if exc is not None:
        raise RuntimeError(f"{name} streaming query failed: {exc}")


def _run_streaming_replay_inner(
    spark, txns, tmp, max_rounds, duplicate_feedback, interrupt_rounds,
    return_dirs, watermark_delay, stats,
):
    d, requests_dir, n_txns = _loop_dirs(spark, txns, tmp)
    schema_results = es.TXN_RESULT_OUT

    # The two stateful queries START ONCE and stay alive across feedback
    # rounds (guide §2.6/§5; r13 verdict item 1 — the per-round
    # availableNow restarts dominated the lane's wall clock: measured
    # 2-7 s per round-and-query at the 10k shape even when the round
    # carried a handful of rows, against a sub-second batch). Each round
    # writes its heartbeat and then DRAINS key stage, then txn stage,
    # with processAllAvailable — the same deterministic
    # round-0..round-N fixpoint as the old restart form (the engine is
    # feedback-arrival-order-insensitive by construction, and any
    # overlap between the living queries only shortens the round count,
    # never changes a verdict — oracle-parity suites pin this).
    # Interrupt rounds keep the availableNow+kill machinery: the crash
    # scenario NEEDS a mid-run stop against a throttled source, and the
    # next normal round restarts the persistent query from the same
    # checkpoint (trigger mode is not pinned into a checkpoint).
    queries: dict[str, object] = {}

    def _start_key():
        return (
            _key_stage_stream(spark, d, requests_dir, watermark_delay)
            .writeStream.format("parquet")
            .option("path", d["read_results"])
            .option("checkpointLocation", os.path.join(d["ckpt"], "key_stage"))
            .trigger(processingTime=_ROUND_TRIGGER)
            .start()
        )

    def _start_txn():
        # txn stage + feedback derivation in ONE query (r9 verdict item
        # 4): the stateless feedback hop used to cost a third query
        return (
            _txn_stage_stream(spark, d)
            .writeStream.foreachBatch(_txn_fused_write(d))
            .option("checkpointLocation", os.path.join(d["ckpt"], "txn_stage"))
            .trigger(processingTime=_ROUND_TRIGGER)
            .start()
        )

    def _drain(name, start):
        q = queries.get(name)
        if q is None or not q.isActive:
            # (re)start: retried because the round AFTER an interrupt
            # restarts the key stage from the same checkpoint its
            # killed twin may still be releasing
            q = start_query_with_retry(start)
            queries[name] = q
        _drain_all_available(q, name)

    def run_and_kill(df_stream, out_dir, ckpt_name):
        """Start, wait for ≥1 committed micro-batch, then stop() mid-run:
        the checkpoint ends up between batches of one logical round —
        committed sink output for a prefix, pending source files for the
        rest."""
        import time as _t

        q = (
            df_stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", os.path.join(d["ckpt"], ckpt_name))
            .trigger(availableNow=True)
            .start()
        )
        deadline = _t.time() + 60
        while _t.time() < deadline and q.isActive and q.lastProgress is None:
            _t.sleep(0.2)
        # Violent kill (kill_streaming_query docstring): dying-query
        # errors are the simulated crash; correctness is asserted on
        # the restarted round's recovery (r11 verdict item 2 deflake).
        kill_streaming_query(q)

    try:
        for rnd in range(max_rounds):
            write_heartbeat(spark, requests_dir, rnd)

            if rnd in interrupt_rounds:
                # The crash must land on the ONE key-stage instance: a
                # living persistent twin would hold the checkpoint lock
                # (and keep processing through the "crash"), so it is
                # killed first — which is itself part of the scenario.
                live = queries.pop("key_stage", None)
                if live is not None:
                    kill_streaming_query(live)
                key_df = _key_stage_stream(
                    spark, d, requests_dir, watermark_delay,
                    {"maxFilesPerTrigger": "1"},
                )
                run_and_kill(key_df, d["read_results"], "key_stage")
                # Crash landed mid-round; the NEXT round restarts the
                # persistent query from the same checkpoint and
                # finishes the remaining files.
                continue
            _drain("key_stage", _start_key)
            _drain("txn_stage", _start_txn)

            # Footer-count gate first (no Spark job — same discipline
            # as the continuous loop's done-poll): most rounds are
            # provably not done from the footers alone, and the
            # Spark-side distinct count this skips measured ~0.7 s ×
            # round — ~10% of the whole 10k replay's wall clock.
            raw = _raw_result_rows(d["results"])
            if raw is not None and raw < n_txns:
                continue
            try:
                n_done = (
                    spark.read.schema(schema_results)
                    .option("recursiveFileLookup", "true")
                    .parquet(d["results"])
                    .select("transaction_id")
                    .distinct()
                    .count()
                )
            except Exception:
                n_done = 0
            if n_done >= n_txns:
                if stats is not None:
                    # rounds = feedback-loop iterations until every txn
                    # had a verdict (the streaming analogue of the batch
                    # replay's wavefront count) — recorded by bench.py
                    stats["rounds"] = rnd + 1
                break

        if duplicate_feedback:
            # At-least-once delivery: redeliver EVERY commit
            # notification, then drain the two stateful stages once
            # more. The S3 'done' gate must swallow the duplicates — no
            # new result rows may appear (output-level exactly-once
            # from at-least-once input, the property the reference
            # relies on; SURVEY §2.3 exactly-once note).
            import shutil

            # feedback lives in per-batch subdirectories since the r10
            # fused sink — walk them; the copies keep their
            # subdirectory (the file source's recursive listing sees
            # any new path)
            for root, _dirs, files in os.walk(d["feedback"]):
                for f in files:
                    if f.endswith(".parquet"):
                        shutil.copy(
                            os.path.join(root, f),
                            os.path.join(root, f"dup_{f}"),
                        )
            write_heartbeat(spark, requests_dir, 10_000)
            # all request files were already admitted in earlier
            # rounds; this pass only drains the duplicated feedback
            # (kind-2 messages apply on arrival — the watermark plays
            # no role in their application)
            _drain("key_stage", _start_key)
            _drain("txn_stage", _start_txn)
    finally:
        # _collect_verdicts must run strictly after every query has
        # stopped (the fused sink's concurrent-reader contract); stop
        # gracefully — these are healthy queries, not crash scenarios.
        for q in queries.values():
            try:
                q.stop()
                q.awaitTermination(60)
            except Exception:  # noqa: BLE001 - teardown best-effort
                pass

    # one verdict per transaction, ever — even under redelivery
    verdicts = _collect_verdicts(spark, d)
    if return_dirs:
        return verdicts, d, requests_dir
    return verdicts


def _raw_result_rows(results_dir: str) -> int | None:
    """Driver-side row count of the results sink via parquet footers —
    NO Spark job. The Spark-side ``distinct().count()`` poll this
    replaces measured a **1.4 s mean × 62 polls ≈ 88 s** of scheduler
    contention during the continuous 10k replay. Footer counts can see
    a batch directory mid-(over)write, so this is a cheap NECESSARY
    signal only — callers must confirm completion with a Spark-side
    read (the distinct() there is also what guards against transient
    double-listings) before declaring done. pyarrow's default
    ignore_prefixes skips dot/underscore paths, so _temporary task dirs
    are never read.

    Returns ``None`` — "can't tell", callers must fall back to the
    Spark-side read — when the footer scan fails on anything but an
    absent directory: e.g. ONE truncated orphan part file from a dead
    task attempt would otherwise poison every subsequent poll and turn
    a completed replay into a timeout (r9 review)."""
    import pyarrow.dataset as pa_ds

    try:
        return pa_ds.dataset(results_dir, format="parquet").count_rows()
    except FileNotFoundError:
        return 0  # sink dir absent: nothing written yet
    except Exception:  # noqa: BLE001 - unreadable footer: unknown
        return None


def run_streaming_replay_continuous(
    spark,
    txns,
    tmp,
    timeout_s: float = 600.0,
    trigger_interval: str = "500 milliseconds",
    heartbeat_interval_s: float = 1.0,
    watermark_delay: str = "1 hour",
    stats: dict | None = None,
    shuffle_partitions: int | None = None,
):
    """The same file-coupled topology as ``run_streaming_replay`` with
    the three queries CONTINUOUSLY RUNNING (one ``start()`` each,
    processingTime triggers) instead of one availableNow restart per
    feedback round — the deployment shape of the reference's actual
    pipeline (flink/StreamyDb.scala:239 blocking execute), and the form
    that measures the ENGINE rather than the harness: the availableNow
    loop pays ~3-4 s of query start/stop per round × 3 queries × ~13
    rounds at 10k txns, which dominates its wall time (r8 verdict item
    2). Feedback flows through the directories automatically — each
    file source discovers the other queries' newly-committed files on
    its next trigger — and a driver-side heartbeat thread appends a
    fresh-event-time row every ``heartbeat_interval_s`` so watermarks
    advance while idle (reference D14, core/HeartBeatGenerator.scala:40
    does exactly this every 5 s).

    ``shuffle_partitions`` sets the stateful stages' state-partition
    count for THIS run (applied to the session conf at query start,
    restored after; a stateful query pins it into its checkpoint on the
    first batch). Size it to the workload's key cardinality and cluster
    parallelism — hundreds on a real cluster, but for a 10k-txn replay
    32 partitions is pure per-trigger overhead: every micro-batch
    (including empty ones) commits every state partition's store, and
    the instrumented run measured ~1.45 s per partition-commit under
    RocksDB full-snapshot maintenance (32 batches × 32 partitions ≈
    1,490 s of summed state-commit time for 10k transactions; empty
    triggers cost 2-4 s wall). See also with_rocksdb's changelog
    checkpointing, which attacks the per-commit snapshot cost itself.

    Returns the same verdict map (and optional ``stats``:
    rounds-equivalent micro-batch counts per query) so the serial
    oracle can gate it like the availableNow form."""
    confs = {}
    if shuffle_partitions is not None:
        confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    with _conf_override(spark, confs):
        return _run_streaming_replay_continuous_inner(
            spark, txns, tmp, timeout_s, trigger_interval,
            heartbeat_interval_s, watermark_delay, stats,
        )


def _run_streaming_replay_continuous_inner(
    spark, txns, tmp, timeout_s, trigger_interval, heartbeat_interval_s,
    watermark_delay, stats,
):
    import threading
    import time as _t

    d, requests_dir, n_txns = _loop_dirs(spark, txns, tmp)

    stop_hb = threading.Event()
    hb_err: list[Exception] = []

    def heartbeats() -> None:
        n = 0
        while not stop_hb.wait(heartbeat_interval_s):
            try:
                write_heartbeat(spark, requests_dir, n)
                n += 1
            except Exception as exc:  # noqa: BLE001 - surfaced after the loop
                hb_err.append(exc)
                return

    write_heartbeat(spark, requests_dir, 99_999)  # one pre-start beat
    hb_thread = threading.Thread(target=heartbeats, daemon=True)
    hb_thread.start()

    def start(df_stream, out_dir, ckpt_name):
        return (
            df_stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", os.path.join(d["ckpt"], ckpt_name))
            .trigger(processingTime=trigger_interval)
            .start()
        )

    queries = {}
    try:
        queries["key_stage"] = start(
            _key_stage_stream(spark, d, requests_dir, watermark_delay),
            d["read_results"],
            "key_stage",
        )
        # txn stage + feedback derivation fused into one query (r9
        # verdict item 4): feedback is committed in the SAME trigger
        # that lands the results, so the key stage sees it one
        # file-discovery later instead of after the separate feedback
        # query's own trigger + listing + commit — one fewer hop in
        # every sequential feedback round.
        queries["txn_stage"] = (
            _txn_stage_stream(spark, d)
            .writeStream.foreachBatch(_txn_fused_write(d))
            .option(
                "checkpointLocation", os.path.join(d["ckpt"], "txn_stage")
            )
            .trigger(processingTime=trigger_interval)
            .start()
        )

        deadline = _t.time() + timeout_s
        n_done = 0
        raw: int | None = None
        while _t.time() < deadline:
            for name, q in queries.items():
                exc = q.exception()
                if exc is not None:
                    raise RuntimeError(f"{name} query failed: {exc}")
                if not q.isActive:
                    raise RuntimeError(f"{name} query stopped unexpectedly")
            if hb_err:
                raise RuntimeError(f"heartbeat writer failed: {hb_err[0]}")
            # Cheap footer-count poll first (no Spark job — see
            # _raw_result_rows); only when it says "possibly done" —
            # or can't tell (None: e.g. a truncated orphan part file
            # from a dead task attempt poisons the footer scan forever,
            # r9 review) — pay for the Spark-side distinct count, the
            # real signal.
            raw = _raw_result_rows(d["results"])
            if raw is None or raw >= n_txns:
                try:
                    n_done = (
                        spark.read.schema(es.TXN_RESULT_OUT)
                        .option("recursiveFileLookup", "true")
                        .parquet(d["results"])
                        .select("transaction_id")
                        .distinct()
                        .count()
                    )
                except Exception:  # noqa: BLE001 - sink not committed yet
                    n_done = 0
            if n_done >= n_txns:
                break
            _t.sleep(0.5)
        else:
            raise RuntimeError(
                f"continuous replay timed out: {n_done}/{n_txns} committed "
                f"verdicts (footer rows: {raw}) after {timeout_s:.0f}s"
            )
        if stats is not None:
            stats["batches"] = {
                name: (q.lastProgress or {}).get("batchId")
                for name, q in queries.items()
            }
    finally:
        stop_hb.set()
        for q in queries.values():
            try:
                q.stop()
                q.awaitTermination(60)
            except Exception:  # noqa: BLE001 - teardown best-effort
                pass
        hb_thread.join(timeout=10)

    return _collect_verdicts(spark, d)


def with_rocksdb(spark, changelog: bool = True):
    """Context manager: RocksDB state store provider for queries started
    inside (picked up per-query from the session conf at stream start).

    ``changelog=True`` also enables RocksDB changelog checkpointing
    (SPARK-43421): each commit persists only that batch's state DELTA to
    the checkpoint, with full snapshots uploaded asynchronously in the
    background, instead of the default synchronous per-commit snapshot
    maintenance. The instrumented continuous 10k replay measured ~1.45 s
    per partition-commit under the default — the dominant per-trigger
    cost — which is exactly the synchronous-snapshot overhead this
    removes. Safe for both fresh and same-run-restart checkpoints
    (recovery replays the changelog); flip it off to exercise or compare
    the snapshot-per-commit path."""
    confs = {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming."
            "state.RocksDBStateStoreProvider"
        ),
    }
    if changelog:
        confs[
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled"
        ] = "true"
    return _conf_override(spark, confs)
