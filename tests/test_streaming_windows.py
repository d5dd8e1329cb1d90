"""Streaming-window parity: the tumbling-window aggregation run as a real
Structured Streaming query (watermark + availableNow over the events
parquet) must produce exactly the rows of the batch q_window_events —
the 'streaming-window parity in batch' claim of SURVEY §2.6, proven in
the streaming direction."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamy_db_spark.operators.relational import q_window_events
from streamy_db_spark.sources.tables import _normalize


def test_streaming_window_agg_matches_batch(spark, sf_small, tmp_path):
    batch = {tuple(r) for r in q_window_events(spark, sf_small).collect()}

    path = f"{sf_small}/events.parquet"
    raw_schema = spark.read.parquet(path).schema  # ts arrives as ns-long
    # file stream source needs a directory; glob-filter to the one table
    stream = (
        _normalize(
            "events",
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_small),
        )
        .withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None

    got = {
        tuple(r)
        for r in spark.read.schema(
            "window_start_ms LONG, event_type STRING, n LONG, sum_value DOUBLE"
        )
        .parquet(str(tmp_path / "out"))
        .collect()
    }
    # Append mode only emits windows the watermark has closed; the final
    # (max-ts) window stays open with no later event to push the watermark.
    # Everything emitted must match batch, and coverage must be total
    # minus at most the open tail windows.
    assert got <= batch
    open_windows = batch - got
    max_start = max(w for w, *_ in batch)
    assert all(w == max_start for w, *_ in open_windows), open_windows
