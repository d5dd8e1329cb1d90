"""Stream-stream event-time joins (engine surface; the reference's only
join-shaped constructs are the keyed stateful operators, SURVEY.md §2.3
"Joins" — it has no general join at all).

``follow_join`` is the funnel primitive: pair each ``first`` event with
every same-key ``second`` event that follows it within ``within``. The
SAME function serves batch and streaming DataFrames — ``withWatermark``
is a no-op in batch, so batch runs are the oracle for streaming runs
(tests/test_streaming_joins.py), and the batch form has its own DuckDB
oracle (operators/temporal.py q_follow_join).

Scale/state notes: in streaming, both sides hash-partition on the join
key; the event-time band in the join condition is what lets Spark bound
state — each side's buffered rows are evicted once the watermark passes
``ts + within``. Without the band (or without both watermarks) state
grows forever. Inner joins emit on match arrival (no watermark wait), so
an availableNow drain yields the complete pair set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def follow_join(
    first: DataFrame,
    second: DataFrame,
    within: str = "1 hour",
    watermark: str = "2 hours",
    key: str = "user_id",
) -> DataFrame:
    """(key, first_id, second_id, gap_us) for each second-event strictly
    after a first-event of the same key, within ``within``. Both inputs
    need (key, event_id, ts:timestamp) columns."""
    a = (
        first.select(
            F.col(key).alias("a_key"),
            F.col("event_id").alias("first_id"),
            F.col("ts").alias("a_ts"),
        ).withWatermark("a_ts", watermark)
    )
    b = (
        second.select(
            F.col(key).alias("b_key"),
            F.col("event_id").alias("second_id"),
            F.col("ts").alias("b_ts"),
        ).withWatermark("b_ts", watermark)
    )
    return a.join(
        b,
        F.expr(
            f"a_key = b_key AND b_ts > a_ts AND b_ts <= a_ts + interval {within}"
        ),
    ).select(
        F.col("a_key").alias(key),
        "first_id",
        "second_id",
        (F.unix_micros("b_ts") - F.unix_micros("a_ts")).alias("gap_us"),
    )
