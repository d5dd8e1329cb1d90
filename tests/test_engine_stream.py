"""Streaming-parity correctness: the transformWithStateInPandas pipeline
must produce the same commit/abort verdicts as the pure-Python serial
oracle, end-to-end through the externalized feedback loop.

Kafka isn't available in this container, so the loop is file-coupled
(parquet dirs stand in for the four topics; the operator topology is
identical — SURVEY.md §3.1). Each driver round runs the three queries
with availableNow triggers against persistent checkpoints, then appends
a heartbeat (reference D14, core/HeartBeatGenerator.scala) so the
watermark advances and buffered event-time timers fire.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

import pytest

from pyspark.sql import functions as F

from streamy_db_spark import fixtures, oracle
from streamy_db_spark.streaming import engine_stream as es


def _write_heartbeat(spark, requests_dir: str, n: int) -> None:
    """One KEY_MSG heartbeat row (kind 3 — ignored by the processor) with
    a fresh event time: advances the global watermark so timers fire."""
    now = datetime.now(timezone.utc)
    row = [(now, int(now.timestamp() * 1000), -1, -1, 3, "__hb__", "__hb__", None, None)]
    spark.createDataFrame(row, es.KEY_MSG).coalesce(1).write.mode("append").parquet(
        os.path.join(requests_dir, f"hb_{n}")
    )


def run_streaming_replay(
    spark,
    txns,
    tmp,
    max_rounds=30,
    duplicate_feedback=False,
    interrupt_rounds=frozenset(),
    return_dirs=False,
    watermark_delay="0 seconds",
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
    engine_stream._admit's docstring says exactly this."""
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

    schema_results = es.TXN_RESULT_OUT

    def run_once(df_stream, out_dir, ckpt_name):
        q = (
            df_stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", os.path.join(d["ckpt"], ckpt_name))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert not q.isActive, "query did not finish in time"
        exc = q.exception()
        assert exc is None, f"query failed: {exc}"

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
        q.stop()
        q.awaitTermination(60)

    for rnd in range(max_rounds):
        _write_heartbeat(spark, requests_dir, rnd)

        # Q1 — key stage: requests+heartbeats ∪ feedback → S1+S2.
        throttle = {"maxFilesPerTrigger": "1"} if rnd in interrupt_rounds else {}
        reqs = spark.readStream.schema(es.KEY_MSG).option(
            "recursiveFileLookup", "true"
        ).options(**throttle).parquet(requests_dir)
        fb = spark.readStream.schema(es.KEY_MSG).parquet(d["feedback"])
        if rnd in interrupt_rounds:
            run_and_kill(
                es.key_stage(reqs.unionByName(fb), watermark=watermark_delay),
                d["read_results"],
                "key_stage",
            )
            # Crash landed mid-round; the NEXT round restarts the query
            # from the same checkpoint and finishes the remaining files.
            continue
        run_once(
            es.key_stage(reqs.unionByName(fb), watermark=watermark_delay),
            d["read_results"],
            "key_stage",
        )

        # Q2 — txn stage: bodies ∪ read-results → S3.
        bodies = es.derive_txn_bodies(
            spark.readStream.schema(fixtures.schemas.TRANSACTION_LOG).parquet(
                d["input"]
            )
        )
        reads = es.read_results_as_txn_msgs(
            spark.readStream.schema(es.READ_RESULT_OUT).parquet(d["read_results"])
        )
        run_once(es.txn_stage(bodies.unionByName(reads)), d["results"], "txn_stage")

        # Q3 — feedback derivation (stateless D5).
        res_stream = spark.readStream.schema(schema_results).parquet(d["results"])
        run_once(es.derive_feedback(res_stream), d["feedback"], "feedback")

        try:
            n_done = (
                spark.read.schema(schema_results)
                .parquet(d["results"])
                .select("transaction_id")
                .distinct()
                .count()
            )
        except Exception:
            n_done = 0
        if n_done >= n_txns:
            break

    if duplicate_feedback:
        # At-least-once delivery: redeliver EVERY commit notification,
        # then run the two stateful stages once more. The S3 'done' gate
        # must swallow the duplicates — no new result rows may appear
        # (output-level exactly-once from at-least-once input, the
        # property the reference relies on; SURVEY §2.3 exactly-once note).
        import shutil

        for f in os.listdir(d["feedback"]):
            if f.endswith(".parquet"):
                shutil.copy(
                    os.path.join(d["feedback"], f),
                    os.path.join(d["feedback"], f"dup_{f}"),
                )
        _write_heartbeat(spark, requests_dir, 10_000)
        reqs = spark.readStream.schema(es.KEY_MSG).option(
            "recursiveFileLookup", "true"
        ).parquet(requests_dir)
        fb = spark.readStream.schema(es.KEY_MSG).parquet(d["feedback"])
        run_once(es.key_stage(reqs.unionByName(fb)), d["read_results"], "key_stage")
        bodies = es.derive_txn_bodies(
            spark.readStream.schema(fixtures.schemas.TRANSACTION_LOG).parquet(
                d["input"]
            )
        )
        reads = es.read_results_as_txn_msgs(
            spark.readStream.schema(es.READ_RESULT_OUT).parquet(d["read_results"])
        )
        run_once(es.txn_stage(bodies.unionByName(reads)), d["results"], "txn_stage")

    results_df = spark.read.schema(schema_results).parquet(d["results"]).select(
        "transaction_id", "succeeded"
    )
    results = results_df.collect()
    # one verdict per transaction, ever — even under redelivery
    assert len(results) == results_df.select("transaction_id").distinct().count()
    verdicts = {r["transaction_id"]: r["succeeded"] for r in results}
    if return_dirs:
        return verdicts, d, requests_dir
    return verdicts


@pytest.mark.parametrize("mix", ["ref_smoke", "cas_chain"])
def test_streaming_matches_serial_oracle(spark, tmp_path, mix):
    txns = fixtures.generate(mix)
    if mix == "cas_chain":  # keep the streaming loop fast: subset
        txns = txns[:120]
    expected_results, _ = oracle.serial_replay(txns)
    got = run_streaming_replay(spark, txns, str(tmp_path))
    assert got == expected_results


def test_streaming_conflicts_and_deletes(spark, tmp_path):
    txns = [
        fixtures_txn(0, 0, 0, "t1", [("a", None)], [("a", "1")]),
        fixtures_txn(1, 0, 1, "t2", [("a", None)], [("a", "2"), ("b", "2")]),
        fixtures_txn(2, 0, 2, "t3", [("a", "1"), ("b", None)], []),
        fixtures_txn(3, 0, 3, "t4", [("a", "1")], [("a", None)]),
        fixtures_txn(4, 0, 4, "t5", [("a", None)], [("a", "5")]),
    ]
    expected_results, _ = oracle.serial_replay(txns)
    assert expected_results == {
        "t1": True, "t2": False, "t3": True, "t4": True, "t5": True,
    }
    got = run_streaming_replay(spark, txns, str(tmp_path))
    assert got == expected_results


def test_streaming_duplicate_feedback_is_idempotent(spark, tmp_path):
    """Redelivered commit notifications (at-least-once output re-consumed
    as input) must not change verdicts or emit duplicates."""
    txns = [
        fixtures_txn(0, 0, 0, "t1", [("a", None)], [("a", "1")]),
        fixtures_txn(1, 0, 1, "t2", [("a", "1")], [("a", "2"), ("b", "9")]),
        fixtures_txn(2, 0, 2, "t3", [("a", "2"), ("b", "9")], []),
    ]
    expected, _ = oracle.serial_replay(txns)
    got = run_streaming_replay(
        spark, txns, str(tmp_path), duplicate_feedback=True
    )
    assert got == expected == {"t1": True, "t2": True, "t3": True}


def test_streaming_rocksdb_state_store(spark, tmp_path):
    """Parity under RocksDBStateStoreProvider — the deployment state store.

    HDFSBackedStateStore keeps every key's state in executor-heap maps;
    100 TB-scale keyed state (billions of cells) needs the RocksDB
    provider's off-heap, incrementally-checkpointed store. The provider is
    picked up per-query from the session conf at stream start, so the
    same file-coupled loop exercises the full applyInPandasWithState
    path (serde, timers, watermark flushes) against RocksDB."""
    key = "spark.sql.streaming.stateStore.providerClass"
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider",
    )
    try:
        txns = [
            fixtures_txn(0, 0, 0, "t1", [("a", None)], [("a", "1")]),
            fixtures_txn(1, 0, 1, "t2", [("a", None)], [("a", "2"), ("b", "2")]),
            fixtures_txn(2, 0, 2, "t3", [("a", "1"), ("b", None)], []),
            fixtures_txn(3, 0, 3, "t4", [("a", "1")], [("a", None)]),
            fixtures_txn(4, 0, 4, "t5", [("a", None)], [("a", "5")]),
        ]
        expected, _ = oracle.serial_replay(txns)
        got = run_streaming_replay(spark, txns, str(tmp_path))
        assert got == expected
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def fixtures_txn(ts_s, part, off, tid, asserts, updates):
    from datetime import timedelta

    return {
        "ts": datetime(2024, 1, 1, tzinfo=timezone.utc) + timedelta(seconds=ts_s),
        "kafka_partition": part,
        "kafka_offset": off,
        "transaction_id": tid,
        "asserts": asserts,
        "updates": updates,
    }


def _with_rocksdb(spark):
    """Context manager: RocksDB state store provider for queries started
    inside (picked up per-query from the session conf at stream start)."""
    import contextlib

    @contextlib.contextmanager
    def cm():
        key = "spark.sql.streaming.stateStore.providerClass"
        try:
            prev = spark.conf.get(key)
        except Exception:
            prev = None
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming."
            "state.RocksDBStateStoreProvider",
        )
        try:
            yield
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)

    return cm()


def test_streaming_kill_and_restart_exactly_once(spark, tmp_path):
    """The reference's central exactly-once claim under failure
    (flink/StreamyDb.scala:180-181: 5 s checkpointing): kill the key
    stage mid-round — after the sink committed a PARTIAL round's output
    (source throttled to 1 file/micro-batch, stop() after the first
    commit) — restart from the same checkpoint with the RocksDB provider
    on, and the final verdicts must still match the serial oracle with
    exactly one verdict per transaction."""
    txns = fixtures.generate("cas_chain")[:60]
    expected, _ = oracle.serial_replay(txns)
    with _with_rocksdb(spark):
        got = run_streaming_replay(
            spark,
            txns,
            str(tmp_path),
            interrupt_rounds={0, 2},
            # Throttled ingestion is multi-batch: the delay must cover the
            # fixture's event-time span or late-row filtering eats the
            # backlog (see run_streaming_replay docstring).
            watermark_delay="1 hour",
        )
    assert got == expected


def test_streaming_state_drains_after_quiescence(spark, tmp_path):
    """The reference's Flink sorter leaks MapState (SURVEY §2.5); ours
    must not: after every verdict is out and the final feedback has been
    consumed, the key-stage state store holds no sorter buffers, no
    undecided lock-log entries, no parked reads, no early verdicts —
    only the cells (the database itself) plus the bounded redelivery
    rings — and the txn-stage store is completely empty."""
    txns = [
        fixtures_txn(0, 0, 0, "t1", [("a", None)], [("a", "1")]),
        fixtures_txn(1, 0, 1, "t2", [("a", None)], [("a", "2"), ("b", "2")]),
        fixtures_txn(2, 0, 2, "t3", [("a", "1"), ("b", None)], []),
        fixtures_txn(3, 0, 3, "t4", [("a", "1")], [("a", None)]),
        fixtures_txn(4, 0, 4, "t5", [("a", None)], [("a", "5")]),
    ]
    expected, _ = oracle.serial_replay(txns)
    got, d, requests_dir = run_streaming_replay(
        spark, txns, str(tmp_path), return_dirs=True
    )
    assert got == expected

    # One more key-stage run: consume the LAST round's feedback (the loop
    # breaks as soon as verdicts are complete, before feeding it back).
    _write_heartbeat(spark, requests_dir, 20_000)
    reqs = spark.readStream.schema(es.KEY_MSG).option(
        "recursiveFileLookup", "true"
    ).parquet(requests_dir)
    fb = spark.readStream.schema(es.KEY_MSG).parquet(d["feedback"])
    q = (
        es.key_stage(reqs.unionByName(fb))
        .writeStream.format("parquet")
        .option("path", d["read_results"])
        .option("checkpointLocation", os.path.join(d["ckpt"], "key_stage"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None

    key_state = (
        spark.read.format("statestore")
        .option("path", os.path.join(d["ckpt"], "key_stage"))
        .load()
        .collect()
    )
    assert key_state, "cells must survive quiescence (they ARE the database)"
    for r in key_state:
        v = r["value"]["groupState"]
        k = r["key"]["key"]
        assert not v["buffer"], f"sorter buffer leaked for {k}: {v['buffer']}"
        assert not v["entries"], f"undecided lock log for {k}: {v['entries']}"
        assert not v["parked"], f"parked reads leaked for {k}: {v['parked']}"
        assert not v["early"], f"early verdicts leaked for {k}: {v['early']}"
        assert len(v["recent"] or []) <= 128
        assert len(v["applied_ring"] or []) <= 256

    txn_state = (
        spark.read.format("statestore")
        .option("path", os.path.join(d["ckpt"], "txn_stage"))
        .load()
        .collect()
    )
    assert txn_state == [], f"txn-stage state leaked: {txn_state}"
