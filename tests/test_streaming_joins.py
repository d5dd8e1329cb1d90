"""Stream-stream join parity (streaming/joins.py): the SAME follow_join
code, driven as a real Structured Streaming query (two branches of the
events file stream, event-time band, watermarks), must produce exactly
the batch pair set. Inner joins emit on match arrival, so an
availableNow drain is complete — full equality, no open-tail carve-out."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamy_db_spark.operators.temporal import q_follow_join
from streamy_db_spark.streaming.joins import follow_join
from tests.stream_kill import kill_query, start_with_retry
from tests.test_streaming_windows import _events_stream, _run_stream


def _check_follow_join_parity(spark, sf_small, tmp_path):
    batch = {tuple(r) for r in q_follow_join(spark, sf_small).collect()}
    stream = _events_stream(spark, sf_small)
    clicks = stream.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    purchases = stream.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    got = _run_stream(
        follow_join(clicks, purchases, within="1 hour"),
        tmp_path,
        "user_id LONG, first_id LONG, second_id LONG, gap_us LONG",
    )
    assert got == batch
    assert batch  # non-vacuous: the harness data must actually produce pairs


def test_streaming_follow_join_matches_batch(spark, sf_small, tmp_path):
    _check_follow_join_parity(spark, sf_small, tmp_path)


def test_streaming_follow_join_rocksdb(spark, sf_small, tmp_path):
    """Stream-stream join state (the symmetric-hash buffers) under
    RocksDBStateStoreProvider — a third state layout beyond the keyed
    aggregation and applyInPandasWithState stores."""
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
        _check_follow_join_parity(spark, sf_small, tmp_path)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_streaming_follow_join_kill_and_restart(spark, sf_small, tmp_path):
    """Exactly-once JOIN state under failure: both join branches ingest
    one file per micro-batch, the query is killed mid-run after a
    committed batch, and the restart must complete the pair set with no
    pair lost (state buffers recovered) and no pair duplicated
    (re-executed batches superseded by the sink's metadata log) — the
    row count is checked, not just the set. Watermark must cover the
    event-time span because ingestion is multi-batch (late-row drop:
    see run_streaming_replay in test_engine_stream.py)."""
    import time

    from pyspark.sql import functions as F

    from streamy_db_spark.sources.tables import load_table

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    events = load_table(spark, sf_small, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    events.repartition(8).write.parquet(src)
    bounds = events.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    wm = f"{(bounds['hi'] - bounds['lo']).days + 2} days"

    def start(throttle):
        opts = {"maxFilesPerTrigger": "1"} if throttle else {}
        stream = spark.readStream.schema(
            "user_id long, event_id long, event_type string, ts timestamp"
        ).options(**opts).parquet(src)
        clicks = stream.filter(F.col("event_type") == "click").select(
            "user_id", "event_id", "ts"
        )
        purchases = stream.filter(F.col("event_type") == "purchase").select(
            "user_id", "event_id", "ts"
        )
        return (
            follow_join(clicks, purchases, within="1 hour", watermark=wm)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    q = start_with_retry(lambda: start(throttle=True))
    t0 = time.time()
    while time.time() - t0 < 60 and q.isActive and q.lastProgress is None:
        time.sleep(0.2)
    # Violent kill: any exception the dying query surfaces is part of the
    # simulated crash (see tests/stream_kill.py), and the restart below
    # retries the brief window where the killed twin still holds the id.
    kill_query(q)

    q = start_with_retry(lambda: start(throttle=False))
    # availableNow: the query self-terminates when the backlog drains.
    # The timeout return value must be CHECKED — a silent timeout here
    # would read the sink mid-run below and fail on a partial pair set
    # (observed once as a suite flake under shared-VM load; 300 s is
    # ~15× the quiet-machine drain time).
    q.awaitTermination(300)
    assert not q.isActive, "restarted join query did not drain in time"
    assert q.exception() is None

    rows = (
        spark.read.schema("user_id LONG, first_id LONG, second_id LONG, gap_us LONG")
        .parquet(out)
        .collect()
    )
    got = {tuple(r) for r in rows}
    batch = {tuple(r) for r in q_follow_join(spark, sf_small).collect()}
    assert got == batch
    assert len(rows) == len(batch), "duplicated pairs after restart"
    assert batch
