"""Streaming-window parity: each streaming transform in
streaming/windows.py, run as a real Structured Streaming query
(watermark + availableNow over the events parquet), must produce exactly
the rows of its batch counterpart — the 'streaming-window parity in
batch' claim of SURVEY §2.6, proven in the streaming direction.

Append-mode caveat baked into every comparison: windows/sessions still
open when the stream drains (nothing later to push the watermark) are
never emitted, so coverage is total minus the open tail only.
"""

from __future__ import annotations

from streamy_db_spark.operators.relational import (
    q_dedup_events,
    q_sessionize,
    q_window_events,
)
from streamy_db_spark.sources.tables import _normalize
from streamy_db_spark.streaming import windows as sw
from tests.stream_kill import kill_query, start_with_retry


def _events_stream(spark, sf_dir):
    path = f"{sf_dir}/events.parquet"
    raw_schema = spark.read.parquet(path).schema  # ts arrives as ns-long
    # file stream source needs a directory; glob-filter to the one table
    return _normalize(
        "events",
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir),
    )


def _run_stream(df, tmp_path, out_schema: str):
    spark = df.sparkSession
    q = (
        df.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None
    return {
        tuple(r)
        for r in spark.read.schema(out_schema).parquet(str(tmp_path / "out")).collect()
    }


def _check_window_agg_parity(spark, sf_small, tmp_path):
    batch = {tuple(r) for r in q_window_events(spark, sf_small).collect()}
    got = _run_stream(
        sw.windowed_counts(_events_stream(spark, sf_small)),
        tmp_path,
        "window_start_ms LONG, event_type STRING, n LONG, sum_value DOUBLE",
    )
    # Append mode only emits windows the watermark has closed; the final
    # (max-ts) window stays open with no later event to push the watermark.
    assert got <= batch
    open_windows = batch - got
    max_start = max(w for w, *_ in batch)
    assert all(w == max_start for w, *_ in open_windows), open_windows


def test_streaming_window_agg_matches_batch(spark, sf_small, tmp_path):
    _check_window_agg_parity(spark, sf_small, tmp_path)


def test_streaming_window_agg_rocksdb(spark, sf_small, tmp_path):
    """Same parity under RocksDBStateStoreProvider — the store that holds
    windowed-agg state at 100 TB (HDFS-backed maps are executor-heap)."""
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
        _check_window_agg_parity(spark, sf_small, tmp_path)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_streaming_sessionize_matches_batch(spark, sf_small, tmp_path):
    batch = {
        (r["user_id"], r["session_start_ms"], r["n_events"])
        for r in q_sessionize(spark, sf_small).collect()
    }
    got = _run_stream(
        sw.sessionized(_events_stream(spark, sf_small)),
        tmp_path,
        "user_id LONG, session_start_ms LONG, n_events LONG",
    )
    assert got <= batch
    # Every missing session must be its user's LAST (still-open) session.
    last_start = {}
    for user, start, _n in batch:
        last_start[user] = max(last_start.get(user, -1), start)
    for user, start, _n in batch - got:
        assert start == last_start[user], (user, start)
    # and the stream must have emitted the bulk of the sessions
    assert len(got) >= len(batch) - len(last_start)


def test_streaming_dedup_matches_batch(spark, sf_small, tmp_path):
    batch = {tuple(r) for r in q_dedup_events(spark, sf_small).collect()}
    got = _run_stream(
        sw.dedup_stream(_events_stream(spark, sf_small)),
        tmp_path,
        "user_id LONG, event_type STRING, window_start_ms LONG",
    )
    # dropDuplicates emits first-seen rows immediately — full equality.
    assert got == batch


def test_streaming_window_agg_kill_and_restart(spark, sf_small, tmp_path):
    """Exactly-once AGGREGATION under failure: ingest the events over
    many micro-batches (1 file/batch), kill the query mid-run after at
    least one batch committed, restart from the same checkpoint, then
    push the watermark past every window with a flush event. Every
    window must match the batch aggregate exactly — re-executed batches
    must not double-count into the aggregation state (the partial-sum
    analogue of the protocol loop's kill-restart test).

    Watermark delay must cover the dataset's event-time span because
    ingestion is multi-batch (see run_streaming_replay in
    test_engine_stream.py for the late-row-drop mechanics)."""
    import time
    from datetime import timedelta

    from pyspark.sql import functions as F

    from streamy_db_spark.sources.tables import load_table

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    events = load_table(spark, sf_small, "events").select(
        "ts", "event_type", "value"
    )
    events.repartition(8).write.parquet(src)
    bounds = events.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    span_days = (bounds["hi"] - bounds["lo"]).days + 2
    delay = f"{span_days} days"

    def start(throttle):
        opts = {"maxFilesPerTrigger": "1"} if throttle else {}
        stream = spark.readStream.schema(
            "ts timestamp, event_type string, value double"
        ).options(**opts).parquet(src)
        return (
            sw.windowed_counts(stream, watermark=delay)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    # Kill mid-run after ≥1 committed batch. Dying-query errors are part
    # of the simulated crash (tests/stream_kill.py).
    q = start_with_retry(lambda: start(throttle=True))
    t0 = time.time()
    while time.time() - t0 < 60 and q.isActive and q.lastProgress is None:
        time.sleep(0.2)
    kill_query(q)

    # Restart: finish ingestion from the same checkpoint.
    q = start_with_retry(lambda: start(throttle=False))
    q.awaitTermination(120)
    assert q.exception() is None

    # Flush: one event far enough ahead that watermark = flush_ts - delay
    # closes every real window; its own window stays open (excluded).
    flush_ts = bounds["hi"] + timedelta(days=span_days, hours=2)
    spark.createDataFrame(
        [(flush_ts, "__flush__", 0.0)], "ts timestamp, event_type string, value double"
    ).coalesce(1).write.mode("append").parquet(src)
    q = start(throttle=False)
    q.awaitTermination(120)
    assert q.exception() is None

    from streamy_db_spark.operators.relational import q_window_events

    batch = {tuple(r) for r in q_window_events(spark, sf_small).collect()}
    got = {
        tuple(r)
        for r in spark.read.schema(
            "window_start_ms LONG, event_type STRING, n LONG, sum_value DOUBLE"
        )
        .parquet(out)
        .collect()
        if r["event_type"] != "__flush__"
    }
    assert got == batch

    # State hygiene after the flush: the watermark passed every real
    # window's close, so the aggregation store must hold ONLY the still-
    # open flush window — emitted windows' state is evicted, not leaked.
    remaining = (
        spark.read.format("statestore").option("path", ckpt).load().collect()
    )
    assert remaining, "flush window itself should still be buffered"
    for r in remaining:
        assert r["key"]["event_type"] == "__flush__", r


def test_content_dedup_stream_matches_incremental_batches(spark, tmp_path):
    """Two availableNow rounds over growing input through ONE
    checkpoint: round 2 must admit only documents whose fingerprint was
    never seen in round 1 — the IncrementalDeduper contract, held by
    the state store across restarts."""
    import os

    from streamy_db_spark.streaming.windows import dedup_stream_content

    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
    )
    b1 = [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha  beta")]
    b2 = [(10, "gamma delta"), (11, "fresh words"), (12, "fresh words")]

    def run_round(rows, part):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(os.path.join(in_dir, part))
        q = (
            dedup_stream_content(
                spark.readStream.schema("doc_id long, text string")
                .option("recursiveFileLookup", "true")
                .parquet(in_dir)
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert q.exception() is None
        return {r.doc_id for r in spark.read.parquet(out_dir).collect()}

    got1 = run_round(b1, "b1")
    assert got1 == {1, 2} or got1 == {2, 3}  # one admit per fingerprint
    got2 = run_round(b2, "b2")
    admitted_round2 = got2 - got1
    # cross-batch dup (10) rejected by round-1 state; in-batch dup
    # collapses to one of 11/12
    assert len(admitted_round2) == 1
    assert admitted_round2 < {11, 12}
