"""Relational operator surface (SURVEY.md §2.6).

Each query proves one Spark primitive the streamy-db port needs (the
rightmost column of the §2.6 table ties each back to a reference cite,
e.g. flink/StreamyDb.scala line numbers). All are pure DataFrame API —
no custom Catalyst work (SURVEY.md §4.3): predicate pushdown, column
pruning, join selection, and AQE come free.

Registry contract (consumed by ``__spark_entry__``):
- ``QUERIES[name](spark, sf_dir) -> DataFrame``
- ``ORACLE[name]`` = equivalent DuckDB SQL over the same parquet views.

Column-name discipline: every computed column is aliased identically in
the Spark code and the SQL (the driver sorts columns by name before
hashing). Float aggregates are rounded on BOTH sides so partial-sum
ordering differences (Spark partitions vs DuckDB threads) cannot flip
the hash.

Events timestamps: ``events.ts`` is nanosecond-precision. Spark-side we
use the lossless ``ts_ns`` long (see sources/tables.py); oracle-side
``epoch_ns(ts)``. Window buckets are computed as epoch-millis longs on
both sides to avoid timestamp-representation skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streamy_db_spark.sources.tables import load_table

HOUR_NS = 3_600_000_000_000  # 1 hour in nanoseconds
HOUR_MS = 3_600_000


# --- q_scan_filter_project: parquet scan + pushed filter + pruned
#     projection (D1/D3/D9 ingest + assert predicate flink:170). Round-2
#     consolidation of r1's q_scan_project + q_filter_eq: one query proves
#     both plan properties (PushedFilters AND ReadSchema gates in
#     tests/test_plans.py) so both driver-correctness slots aren't spent
#     on overlapping scans. ------------------------------------------------
def q_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # No rounding: per-row IEEE arithmetic is bit-identical across engines
    # (rounding functions are NOT — Spark HALF_UP via shortest-string
    # BigDecimal vs DuckDB's binary round diverge on .xx5 boundaries).
    return li.filter(
        (F.col("l_returnflag") == "R") & F.col("l_linestatus").eqNullSafe("F")
    ).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
    )


# --- q_explode_requests: explode array<struct> → request derivation
#     (D4/D5 flatMaps, reference flink/StreamyDb.scala:203-208) --------------
def q_explode_requests(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # Mirror the reference's per-transaction request derivation: each order
    # fans out to a 'read' request (assert) and a 'lock' request (update).
    reqs = orders.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("o_orderkey").alias("txn"),
                    F.lit("read").alias("kind"),
                    F.col("o_custkey").alias("entity"),
                ),
                F.struct(
                    F.col("o_orderkey").alias("txn"),
                    F.lit("lock").alias("kind"),
                    F.col("o_custkey").alias("entity"),
                ),
            )
        ).alias("r")
    )
    return reqs.select("r.txn", "r.kind", "r.entity")


# --- q_union_merge: unionByName of homogenized streams (D8) + the D4
#     request explode, consolidated (r3): one driver slot proves both the
#     union-of-heterogeneous-sources shape and the explode fan-out
#     (q_explode_requests stays the public operator + plan gate). ------------
def q_union_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    a = events.select(
        F.col("event_id").alias("id"),
        F.lit("event").alias("kind"),
        F.col("user_id").alias("entity"),
    )
    b = q_explode_requests(spark, sf_dir).select(
        F.col("txn").alias("id"), "kind", "entity"
    )
    return a.unionByName(b)


# --- q_serial_order: the batch sequencer — row_number over
#     (PARTITION BY key ORDER BY ts, id) (S1+D7, SURVEY §2.3) ----------------
def q_serial_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    return events.select(
        "user_id", "event_id", F.row_number().over(w).alias("seq")
    )


# --- q_groupby_count: count + completion gate (S3 read gate,
#     reference flink/StreamyDb.scala:165) -----------------------------------
def q_groupby_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.count("*").alias("n_items"))
        .filter(F.col("n_items") == 7)
    )


# --- q_bool_and: assert conjunction (S3, reference
#     flink/StreamyDb.scala:166-172) -----------------------------------------
def q_bool_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.bool_and(F.col("o_totalprice") > 100000).alias("all_big"),
        F.count("*").alias("n_orders"),
    )


# --- q_join_txn_reads: S3 as inner equi-join + agg --------------------------
def q_join_txn_reads(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "inner")
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n_reads"),
            F.bool_and(F.col("l_discount") <= 0.06).alias("all_ok"),
        )
    )


# --- q_last_write_wins: final KV state materialization (S2 fold,
#     commutative case) -------------------------------------------------------
def q_last_write_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_ns").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("value").alias("last_value"),
        )
    )


# --- q_collect_list: S1 buffer semantics (per-key ordered list) -------------
def q_collect_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("l_linenumber")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("linenums")
    )


# --- q_topk_orders: deterministic orderBy + limit ----------------------------
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --- q_agg_tpch_pricing: TPC-H Q1-style multi-agg ----------------------------
def q_agg_tpch_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --- q_join_3way: customer ⋈ orders ⋈ lineitem + groupBy ---------------------
def q_join_3way(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # customer is the small dimension (1.5k @ sf0.01, 15k @ sf0.1, 1.5M @ sf100)
    # — broadcast it explicitly; at 100 TB a 1.5M×5-col dim is still ~100 MB,
    # comfortably broadcastable, so the big fact tables never shuffle on
    # custkey. orders⋈lineitem stays a shuffle join on orderkey (both huge).
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey, "inner").join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey, "inner"
    )
    return joined.groupBy("c_mktsegment", "o_orderpriority").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count("*").alias("n_rows"),
    )


# --- q_window_events: tumbling event-time window agg (streaming-window
#     parity in batch) --------------------------------------------------------
def q_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# --- q_sessionize: gap-based session windows (lag + cumulative sum) ---------
SESSION_GAP_NS = 1_800_000_000_000  # 30 min


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization — the session-window operator the reference lacks
    (SURVEY §2.3 windows: ABSENT), batch form: a new session starts when
    the gap to the previous event exceeds 30 min; two window passes over
    the same (user_id × time) partitioning (ONE shuffle — both windows
    and the final groupBy share the user_id hash partitioning)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    gap = F.col("ts_ns") - F.lag("ts_ns").over(w)
    new_sess = F.when(
        gap.isNull() | (gap > SESSION_GAP_NS), F.lit(1)
    ).otherwise(F.lit(0))
    sess = events.select(
        "user_id",
        "event_id",
        "ts_ns",
        F.sum(new_sess)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_idx"),
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        # integer div, not float: ns longs exceed double's 2^53 exactness
        F.expr("min(ts_ns) div 1000000").alias("session_start_ms"),
    )


# --- q_dedup_events: exact dedup on (user, type, hour-window) ----------------
def q_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return dedup_events_hourly(events)


def dedup_events_hourly(events: DataFrame) -> DataFrame:
    """Exact dedup on (user, type, hour window). Hour bucketing uses
    integer div, not float: ns longs exceed double's 2^53 exactness, so
    a float-div bucket double-rounds UP for timestamps within ~256 ns
    below an hour boundary — one bucket off vs the oracle's truncating
    integer division (r6 verdict; same discipline as q_sessionize
    above). Spark ``div`` and DuckDB ``//`` both truncate toward zero —
    identical on these non-negative ts_ns, and NOT a floor for negative
    inputs (r7 advice).
    Boundary behavior is pinned by
    tests/test_oracle_queries.py::test_dedup_events_hour_boundary."""
    return events.select(
        "user_id",
        "event_type",
        (F.expr(f"ts_ns div {HOUR_NS}") * HOUR_MS).alias("window_start_ms"),
    ).dropDuplicates()


# --- q_text_stats: documents length/lang stats -------------------------------
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


# --- q_embedding_knn: brute-force cosine top-k vs a literal query vector -----
# The query vector is a deterministic literal (alternating 1/0 pattern) so
# Spark and the oracle SQL share it exactly. Cosine is computed elementwise
# in double on both sides and rounded to 4 dp.
KNN_DIM = 64
KNN_QUERY_VEC = [1.0 if i % 2 == 0 else 0.0 for i in range(KNN_DIM)]
KNN_K = 10


def q_embedding_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamy_db_spark.operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, KNN_QUERY_VEC, k=KNN_K, round_dp=4)


QUERIES = {
    "q_scan_filter_project": q_scan_filter_project,
    "q_union_merge": q_union_merge,
    "q_serial_order": q_serial_order,
    "q_groupby_count": q_groupby_count,
    "q_bool_and": q_bool_and,
    "q_join_txn_reads": q_join_txn_reads,
    "q_last_write_wins": q_last_write_wins,
    "q_collect_list": q_collect_list,
    "q_topk_orders": q_topk_orders,
    "q_agg_tpch_pricing": q_agg_tpch_pricing,
    "q_join_3way": q_join_3way,
    "q_sessionize": q_sessionize,
    "q_window_events": q_window_events,
    "q_dedup_events": q_dedup_events,
    "q_embedding_knn": q_embedding_knn,
}

# q_text_stats rotated to the test-only registry in r5 (still DuckDB
# hash-checked in tests): its per-lang length stats are subsumed by
# q_source_mix (text_quality.py), and its driver slot now surfaces
# benchmark decontamination — the same scale-real rotation as r4's
# quadratic-baseline swap.
TEST_QUERIES = {"q_text_stats": q_text_stats}

_KNN_VEC_SQL = "[" + ", ".join(str(x) for x in KNN_QUERY_VEC) + "]::DOUBLE[]"

ORACLE = {
    "q_scan_filter_project": """
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS net_price
        FROM lineitem
        WHERE l_returnflag = 'R'
          AND l_linestatus IS NOT DISTINCT FROM 'F'
    """,
    "q_union_merge": """
        SELECT event_id AS id, 'event' AS kind, user_id AS entity FROM events
        UNION ALL
        SELECT o_orderkey AS id, 'read' AS kind, o_custkey AS entity FROM orders
        UNION ALL
        SELECT o_orderkey AS id, 'lock' AS kind, o_custkey AS entity FROM orders
    """,
    "q_serial_order": """
        SELECT user_id, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY epoch_ns(ts), event_id) AS seq
        FROM events
    """,
    "q_groupby_count": """
        SELECT l_orderkey, count(*) AS n_items
        FROM lineitem GROUP BY l_orderkey HAVING count(*) = 7
    """,
    "q_bool_and": """
        SELECT o_custkey,
               bool_and(o_totalprice > 100000) AS all_big,
               count(*) AS n_orders
        FROM orders GROUP BY o_custkey
    """,
    "q_join_txn_reads": """
        SELECT o_orderkey, count(*) AS n_reads,
               bool_and(l_discount <= 0.06) AS all_ok
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderkey
    """,
    "q_last_write_wins": """
        SELECT user_id, event_id AS last_event_id, value AS last_value
        FROM (
            SELECT user_id, event_id, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY epoch_ns(ts) DESC,
                                               event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    "q_collect_list": """
        SELECT l_orderkey,
               array_to_string(list_sort(list(l_linenumber)), ',') AS linenums
        FROM lineitem GROUP BY l_orderkey
    """,
    "q_topk_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    "q_agg_tpch_pricing": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q_join_3way": """
        SELECT c_mktsegment, o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_rows
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment, o_orderpriority
    """,
    "q_sessionize": f"""
        WITH g AS (
            SELECT user_id, event_id, epoch_ns(ts) AS ts_ns,
                   epoch_ns(ts) - lag(epoch_ns(ts)) OVER (
                       PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                   ) AS gap
            FROM events
        ),
        s AS (
            SELECT user_id, event_id, ts_ns,
                   CAST(sum(CASE WHEN gap IS NULL OR gap > {SESSION_GAP_NS}
                            THEN 1 ELSE 0 END) OVER (
                       PARTITION BY user_id ORDER BY ts_ns, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS session_idx
            FROM g
        )
        SELECT user_id, session_idx, count(*) AS n_events,
               CAST(min(ts_ns) // 1000000 AS BIGINT) AS session_start_ms
        FROM s GROUP BY user_id, session_idx
    """,
    "q_window_events": """
        SELECT (epoch_ns(ts) // 3600000000000) * 3600000 AS window_start_ms,
               event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "q_dedup_events": """
        SELECT DISTINCT user_id, event_type,
               (epoch_ns(ts) // 3600000000000) * 3600000 AS window_start_ms
        FROM events
    """,
    "q_embedding_knn": f"""
        WITH scored AS (
            SELECT vec_id,
                   list_dot_product(embedding::DOUBLE[], {_KNN_VEC_SQL}) /
                   (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
                    sqrt(list_dot_product({_KNN_VEC_SQL}, {_KNN_VEC_SQL}))) AS cos_raw
            FROM embeddings
        )
        SELECT vec_id, round(cos_raw, 4) AS cosine
        FROM scored ORDER BY cos_raw DESC, vec_id LIMIT {KNN_K}
    """,
}

TEST_ORACLE = {
    "q_text_stats": """
        SELECT lang, count(*) AS n_docs,
               round(avg(n_chars), 4) AS avg_chars,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               count(DISTINCT source) AS n_sources
        FROM documents GROUP BY lang
    """,
}
