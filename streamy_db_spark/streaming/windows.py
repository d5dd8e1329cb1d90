"""Streaming window / dedup transforms (Structured Streaming forms of the
batch operators in operators/relational.py).

The reference has NO windows at all (SURVEY.md §2.3: Beam runs a single
GlobalWindow; the only window-like construct is the sorter's
exact-timestamp timer) — these are engine surface the rebuild adds. Each
transform takes an *unbounded* events DataFrame (``readStream``) and
returns the transformed stream; the parity tests drive them with
``availableNow`` over the harness parquet and compare against the batch
queries.

Scale notes: all three are keyed stateful aggregations — state is
hash-partitioned by the group key, watermarks bound state size (closed
windows/sessions are evicted), and late data beyond the watermark is
dropped by construction (the reference's own assumption, SURVEY §2.3
late-data note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SESSION_GAP = "30 minutes"  # == relational.SESSION_GAP_NS


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "0 seconds"
) -> DataFrame:
    """Tumbling event-time window aggregation (streaming form of
    q_window_events): (window_start_ms, event_type, n, sum_value)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sessionized(
    events: DataFrame, gap: str = SESSION_GAP, watermark: str = "0 seconds"
) -> DataFrame:
    """Gap-based session windows per user (streaming form of q_sessionize):
    (user_id, session_start_ms, n_events). ``session_window`` merges
    events whose gap stays under ``gap``; state for a session is evicted
    once the watermark passes its close."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_millis(F.col("w.start")).alias("session_start_ms"),
            "n_events",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on (user, type, hour window) — streaming form
    of q_dedup_events. ``dropDuplicates`` keyed state holds one row per
    distinct key; the watermark lets Spark evict keys whose window can no
    longer receive events (without it, state grows forever — the same
    leak the reference's Flink sorter has, SURVEY §2.5)."""
    hour_ms = 3_600_000
    return (
        events.withWatermark("ts", watermark)
        .select(
            "user_id",
            "event_type",
            (F.expr("unix_millis(ts)") - F.expr(f"unix_millis(ts) % {hour_ms}"))
            .alias("window_start_ms"),
            F.col("ts"),
        )
        .dropDuplicates(["user_id", "event_type", "window_start_ms"])
        .select("user_id", "event_type", "window_start_ms")
    )


def dedup_stream_content(docs: DataFrame) -> DataFrame:
    """Streaming exact content dedup: admit each document fingerprint
    once, forever — the Structured Streaming twin of
    operators/incremental.IncrementalDeduper (same md5-normalized
    fingerprint, so batch backfill and the live stream admit identical
    sets). State is deliberately UNBOUNDED: the seen-set IS the corpus
    digest set (16 B/doc in the state store — a billion docs ≈ 16 GB,
    hash-partitioned; run it on the RocksDB provider, which the engine's
    parity tests already cover). No watermark by design — a duplicate
    arriving a year later is still a duplicate."""
    from streamy_db_spark.operators.dedup import fingerprint_documents

    return fingerprint_documents(docs).dropDuplicates(["fingerprint"]).drop(
        "fingerprint"
    )
