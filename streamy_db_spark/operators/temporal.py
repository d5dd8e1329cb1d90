"""Temporal join operators: as-of join and banded range join.

The reference has no relational join surface at all (SURVEY.md §2.3 —
its only join-shaped computations are the stream-stream gate S3 and the
stream-state lookup S2), but any engine claiming its capabilities for
event logs needs the two temporal joins Spark itself lacks as builtins.
Both are implemented as compositions of shuffle-friendly DataFrame ops —
no pairwise blowup, no Python in the hot path:

- **as-of join**: union both sides with a side marker, single window pass
  per key carrying the last right-side row forward (`last(...,
  ignorenulls=True)`). ONE shuffle on the join key, O(n log n) per key —
  the classic log-structured formulation; at 100 TB it scales exactly
  like the sequencer window (SURVEY §2.3 q_serial_order).
- **range join**: time-bucket both sides and equi-join on (key, bucket)
  with the left side exploded over the two buckets that can satisfy a
  band of width W (bucket size == W covers (t-W, t]). Turns the
  inequality join Catalyst would nested-loop into a hash join whose
  shuffle key is uniform; per-bucket fan-out is bounded by data density,
  not table size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streamy_db_spark.sources.tables import load_table

HOUR_NS = 3_600_000_000_000
HOUR_US = 3_600_000_000


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_ns: int | None = None,
) -> DataFrame:
    """Left as-of join: for every left row, the right row of the same
    ``key`` with the greatest ``right_ts`` <= ``left_ts`` (inclusive —
    DuckDB ``ASOF JOIN ON l.ts >= r.ts`` semantics). Unmatched left rows
    keep NULLs. ``right_cols`` are emitted with an ``asof_`` prefix.

    Ties: callers must ensure (key, right_ts) is unique on the right side
    (pre-aggregate otherwise) — the match is then deterministic.
    """
    lcols = left.columns
    # ValueError, not assert: these are runtime input-contract checks and
    # must survive `python -O` (asserts are stripped there). The reserved
    # set also covers the *output* names (asof_ts / asof_{c}) — a left
    # column named asof_ts would be silently shadowed by the result.
    reserved = (
        {"_side", "_rts", "_m_ts", "asof_ts"}
        | {f"_{p}_{c}" for c in right_cols for p in ("r", "m")}
        | {f"asof_{c}" for c in right_cols}
    )
    clash = reserved & set(lcols)
    if clash:
        raise ValueError(
            f"asof_join internal/output columns collide with left: {sorted(clash)}"
        )
    l = left.withColumn("_side", F.lit(1)).withColumn("_rts", F.lit(None).cast("long"))
    r = right.select(
        F.col(key),
        F.col(right_ts).alias(left_ts),
        F.lit(0).alias("_side"),
        F.col(right_ts).alias("_rts"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in right_cols:
        l = l.withColumn(f"_r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    merged = l.select(r.columns).unionByName(r)

    # Right rows sort before left rows at the same timestamp (_side 0 < 1)
    # so an equal-timestamp right row is visible to the left row — the
    # inclusive (>=) as-of bound.
    w = (
        Window.partitionBy(key)
        .orderBy(left_ts, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "*",
        F.last("_rts", ignorenulls=True).over(w).alias("_m_ts"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in right_cols
        ],
    )
    out = carried.filter(F.col("_side") == 1)
    if tolerance_ns is not None:
        within = F.col("_m_ts") >= F.col(left_ts) - F.lit(tolerance_ns)
        out = out.select(
            *lcols,
            F.when(within, F.col("_m_ts")).alias("asof_ts"),
            *[
                F.when(within, F.col(f"_m_{c}")).alias(f"asof_{c}")
                for c in right_cols
            ],
        )
    else:
        out = out.select(
            *lcols,
            F.col("_m_ts").alias("asof_ts"),
            *[F.col(f"_m_{c}").alias(f"asof_{c}") for c in right_cols],
        )
    return out


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    band_ns: int,
    count_alias: str = "n_in_band",
) -> DataFrame:
    """For every left row, count right rows of the same ``key`` with
    ``right_ts`` in (left_ts - band_ns, left_ts] — i.e. the band strictly
    before-or-at the left event. Zero-count left rows are kept.

    Bucketing: with bucket = ts div band_ns, every qualifying right row
    sits in the left row's bucket or the one before it. Right rows
    collapse to ONE array row per (key, bucket) first, so each left row
    equi-joins at most two array rows and the band count evaluates inside
    a projection (higher-order ``filter``+``size`` — whole-stage codegen,
    no Python). No explode, no regroup, no generated row id: left row
    identity is never multiplied, so duplicate left rows come back as
    duplicate result rows, nothing collides with caller columns, and the
    plan is deterministic under stage retry (a prior formulation keyed a
    regroup on monotonically_increasing_id, which can renumber rows when
    a retry recomputes a partial shuffle fetch). Skew note: a hot
    (key, bucket) makes one wide array instead of an L×R joined-row
    blowup — strictly less shuffle than the exploded join at 100 TB.
    """
    # Integer div, not `/`: ns epochs (~1.7e18) exceed double's 2^53
    # exact-integer range, so float division mis-buckets edge rows.
    lbucket = F.expr(f"`{left_ts}` div {band_ns}")
    for c in ("__rjc_b", "__rjc_rts0", "__rjc_rts1", count_alias):
        if c in left.columns:
            raise ValueError(f"column {c!r} collides in range join")
    rb = (
        right.select(
            F.col(key),
            F.expr(f"`{right_ts}` div {band_ns}").alias("__rjc_b"),
            F.col(right_ts).alias("__rjc_rt"),
        )
        .groupBy(key, "__rjc_b")
        .agg(F.collect_list("__rjc_rt").alias("__rjc_rts"))
    )
    out = left
    for i, b in enumerate((lbucket, lbucket - 1)):
        rbi = rb.select(
            F.col(key), F.col("__rjc_b"), F.col("__rjc_rts").alias(f"__rjc_rts{i}")
        )
        out = out.withColumn("__rjc_b", b).join(
            rbi, [key, "__rjc_b"], "left"
        ).drop("__rjc_b")
    lt = F.col(left_ts)
    in_band = lambda t: ((lt - t) >= 0) & ((lt - t) < F.lit(band_ns))  # noqa: E731
    # NULL-array guard BEFORE size(): under spark.sql.ansi.enabled=false
    # (Spark 3 default, common migration setting) size(NULL) is -1, not
    # NULL, so a trailing coalesce would pass -1 through and zero-count
    # left rows would report -1/-2. when/isNull is ANSI-mode-independent.
    count = sum(
        F.when(F.col(f"__rjc_rts{i}").isNull(), F.lit(0)).otherwise(
            F.size(F.filter(F.col(f"__rjc_rts{i}"), in_band))
        )
        for i in range(2)
    )
    return out.withColumn(count_alias, count.cast("long")).drop(
        "__rjc_rts0", "__rjc_rts1"
    )


# --- registered queries ------------------------------------------------------


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase matched to the user's latest click at-or-before it
    (nanosecond event-time; (user_id, ts_ns) is unique in the harness
    data, so the match is deterministic)."""
    events = load_table(spark, sf_dir, "events")
    # Microseconds, not the lossless ts_ns: DuckDB reads TIMESTAMP(NANOS)
    # parquet at us precision, so the oracle can only see us values.
    # (user_id, ts_us) is still unique in the harness data — checked.
    ts_us = F.expr("ts_ns div 1000")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", ts_us.alias("ts_us")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", ts_us.alias("c_ts"), F.col("event_id").alias("click_id")
    )
    out = asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts_us",
        right_ts="c_ts",
        right_cols=["click_id"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts_us",
        F.col("asof_ts").alias("click_ts_us"),
        F.col("asof_click_id").alias("click_id"),
    )


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases with the count of same-user clicks in the preceding hour
    (inclusive of simultaneous clicks) — the banded self-join shape."""
    events = load_table(spark, sf_dir, "events")
    ts_us = F.expr("ts_ns div 1000")  # us to match oracle precision (see q_asof_join)
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", ts_us.alias("ts_us")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", ts_us.alias("c_ts")
    )
    return range_join_count(
        purchases, clicks, "user_id", "ts_us", "c_ts", HOUR_US,
        count_alias="n_clicks_1h",
    )


def q_follow_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair-level funnel: every same-user purchase within 1 h strictly
    after a click — the batch anchor for the stream-stream
    ``follow_join`` (streaming/joins.py); identical code path runs under
    Structured Streaming with bounded state."""
    from streamy_db_spark.streaming.joins import follow_join

    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    return follow_join(clicks, purchases, within="1 hour")


QUERIES = {
    "q_asof_join": q_asof_join,
    "q_range_join": q_range_join,
    "q_follow_join": q_follow_join,
}

ORACLE = {
    "q_asof_join": """
        WITH p AS (
            SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
            WHERE event_type = 'purchase'
        ),
        c AS (
            SELECT event_id AS click_id, user_id, epoch_us(ts) AS ts_us
            FROM events WHERE event_type = 'click'
        )
        SELECT p.event_id, p.user_id, p.ts_us,
               c.ts_us AS click_ts_us, c.click_id
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
    """,
    "q_range_join": """
        WITH p AS (
            SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
            WHERE event_type = 'purchase'
        ),
        c AS (
            SELECT user_id, epoch_us(ts) AS c_ts FROM events
            WHERE event_type = 'click'
        )
        SELECT p.event_id, p.user_id, p.ts_us,
               count(c.c_ts) AS n_clicks_1h
        FROM p LEFT JOIN c
          ON p.user_id = c.user_id
         AND p.ts_us - c.c_ts >= 0
         AND p.ts_us - c.c_ts < 3600000000
        GROUP BY p.event_id, p.user_id, p.ts_us
    """,
    "q_follow_join": """
        WITH c AS (
            SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
            WHERE event_type = 'click'
        ),
        p AS (
            SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
            WHERE event_type = 'purchase'
        )
        SELECT c.user_id,
               c.event_id AS first_id,
               p.event_id AS second_id,
               p.ts_us - c.ts_us AS gap_us
        FROM c JOIN p
          ON c.user_id = p.user_id
         AND p.ts_us > c.ts_us
         AND p.ts_us <= c.ts_us + 3600000000
    """,
}
