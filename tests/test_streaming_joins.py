"""Stream-stream join parity (streaming/joins.py): the SAME follow_join
code, driven as a real Structured Streaming query (two branches of the
events file stream, event-time band, watermarks), must produce exactly
the batch pair set. Inner joins emit on match arrival, so an
availableNow drain is complete — full equality, no open-tail carve-out."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamy_db_spark.operators.temporal import q_follow_join
from streamy_db_spark.streaming.joins import follow_join
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
