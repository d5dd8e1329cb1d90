"""Second extension wave of the relational surface (round 1, late).

SURVEY.md §2.3 marks every category here ABSENT in the reference (its
only relational constructs are the assert conjunction and three keyBys,
flink/StreamyDb.scala:166-172,209-230). These queries complete the
engine surface a general event-log / training-data user expects: outer
joins, distinct + statistical aggregates, window frames, pivot,
grouping sets, string/array/JSON scalar libraries, and scalar
subqueries. All pure DataFrame/SQL API — Catalyst plans them (SURVEY
§4.3), each with an exact DuckDB oracle.

Scale notes live in the docstrings; nothing here exceeds one hash
shuffle on a uniform key or a per-key window, so every shape survives a
100× scale-up unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streamy_db_spark.sources.tables import load_table


# --- q_outer_join: FULL OUTER with null-preserving key coalesce -------------
def q_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation BUILDING-customer count FULL OUTER JOIN rich-supplier
    count. Both sides pre-aggregate to ≤ |nations| rows before the join —
    at scale the shuffle moves two tiny aggregates, never base tables
    (aggregate-then-join, the canonical outer-join shape)."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    c = (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        supp.filter(F.col("s_acctbal") > 4500.0)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_supp"))
    )
    return (
        c.join(s, "nk", "full_outer")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


# --- q_distinct_agg: COUNT(DISTINCT) beside plain aggregates ----------------
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-customer count per order priority. Spark plans
    count(DISTINCT) as a two-phase expand+agg — partial per partition,
    exact at any scale (approx_count_distinct is the sketch path when
    exactness can be traded; kept exact here for the oracle)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


# --- q_stats_agg: statistical aggregate library + exact quantiles -----------
# Round-2 consolidation: absorbs r1's q_percentiles (Spark ``percentile``
# ≡ DuckDB ``quantile_cont``, shared linear-interpolation definition) so
# the statistical surface takes one driver-correctness slot.
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/variance/correlation/covariance + median/p90 per return
    flag — one-pass partial+final aggregation (Welford-style merge in
    both engines); small-magnitude columns keep double rounding stable
    across aggregation orders. (At 100 TB swap ``percentile`` for
    ``approx_percentile``: the exact form materializes each group's
    values; the sketch form is one fixed-size pass — see q_sketch_aggs.)

    The two exact percentiles come from ONE array-form aggregate
    (r13 opt, guide §2.3): ``percentile``'s partial buffer holds — and
    its Exchange ships — every group value, so two scalar calls
    buffered and shuffled the whole column twice; the array form
    builds one counts buffer and interpolates both ranks from it,
    bit-identical per percentile (same counts map, same
    interpolation)."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_discount"), 6).alias("corr_qd"),
        F.round(F.covar_samp("l_quantity", "l_tax"), 6).alias("cov_qt"),
        F.expr("percentile(l_extendedprice, array(0.5D, 0.9D))").alias("__p"),
        F.count("*").alias("n"),
    )
    return agg.select(
        "l_returnflag",
        "sd_qty",
        "var_disc",
        "corr_qd",
        "cov_qt",
        F.round(F.element_at("__p", 1), 4).alias("median_price"),
        F.round(F.element_at("__p", 2), 4).alias("p90_price"),
        "n",
    )


# --- q_window_funcs: ranking + frames + offsets in one window ---------------
# Round-2 consolidation of r1's q_window_frames + q_window_rank: rank/lag
# (ranking + offset) and moving-avg/lead/ntile (frame + distribution)
# share ONE (partition, order) spec, so Catalyst plans a single Exchange +
# Window chain — gated in tests/test_plans.py.
def q_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order history: order rank, previous price (lag), 3-row
    moving average (ROWS frame), next-order price (lead), and quartile
    bucket (ntile). One shuffle on o_custkey; frames are bounded so state
    per key is O(frame), not O(partition)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.rank().over(w).alias("order_rank"),
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).alias("mov_avg"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.ntile(4).over(w).alias("bucket4"),
    )


# --- q_pivot: groupBy().pivot() --------------------------------------------
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order totals pivoted by status. With the pivot values enumerated,
    Spark plans a single aggregate (no extra shuffle vs the conditional
    SUMs the oracle spells out — the classic wide-format report)."""
    orders = load_table(spark, sf_dir, "orders")
    p = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
    )
    return p.select(
        "o_orderpriority",
        F.col("F").alias("f_total"),
        F.col("O").alias("o_total"),
        F.col("P").alias("p_total"),
    )


# --- q_grouping_sets: explicit GROUPING SETS ≡ CUBE + grouping() markers ----
# Round-2 consolidation: the four explicit sets below are exactly
# CUBE(l_returnflag, l_linestatus), and sets 1/2/4 are exactly
# ROLLUP(l_returnflag, l_linestatus) — this one query subsumes r1's
# q_rollup_pricing and q_cube_pricing (every grouping-set shape, one
# Expand, one shuffle) so the three don't spend three driver slots.
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four grouping-set levels over (flag, status) with grouping()
    flags to disambiguate subtotal rows from genuine NULL groups — Spark
    expands to one pass (Expand node), still a single shuffle with
    per-set map-side partial aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               grouping(l_returnflag) AS g_flag,
               grouping(l_linestatus) AS g_status,
               count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag),
                                (l_linestatus), ())
        """
    )


# --- q_string_funcs: the string scalar library ------------------------------
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String library parity: regexp_extract, length, lpad, substring,
    replace, concat_ws, reverse — all JVM-side codegen'd expressions
    (zero Python in the hot path)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.regexp_extract("c_name", r"(\d+)", 1).cast("long").alias("cust_num"),
        F.length("c_name").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.substring("c_mktsegment", 1, 3).alias("seg3"),
        F.regexp_replace("c_name", "Customer#", "C").alias("short_name"),
        F.concat_ws("-", "c_mktsegment", F.col("c_nationkey").cast("string")).alias(
            "tag"
        ),
        F.reverse(F.substring("c_name", 1, 8)).alias("rev8"),
    )


# --- q_array_funcs: the array scalar library over embeddings ----------------
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array library parity on array<float>: size, slice, element
    aggregate (ordered double fold — bit-identical in both engines),
    min/max. The l2-squared fold is the same zip_with+aggregate kernel
    the similarity operators use (JVM-side, no UDF)."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = F.col("embedding").cast("array<double>")
    head4 = F.slice(a, 1, 4)
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.aggregate(head4, F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("head4_sum"),
        F.round(
            F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x), 4
        ).alias("l2sq"),
        F.round(F.array_max(a), 6).alias("max_e"),
        F.round(F.array_min(a), 6).alias("min_e"),
    )


# --- q_json_funcs: JSON extraction from string payloads ---------------------
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload extraction (events.props is a JSON string — the D3
    ``from_json`` ingest shape, SURVEY §2.2) then aggregate. get_json_object
    and from_json both stay JVM-side."""
    ev = load_table(spark, sf_dir, "events")
    k1 = F.get_json_object("props", "$.k").cast("long")
    k2 = F.from_json("props", "k LONG").getField("k")
    return (
        ev.select("event_type", k1.alias("k1"), k2.alias("k2"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k1").alias("sum_k"),
            F.round(F.avg("k1"), 4).alias("avg_k"),
            F.sum(F.when(F.col("k1") == F.col("k2"), 1).otherwise(0)).alias(
                "n_consistent"
            ),
        )
    )


# --- q_scalar_subquery: filter by a global aggregate ------------------------
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above the global average price, per status. The scalar
    aggregate is a 1-row broadcast (Spark plans the cross join as
    BroadcastNestedLoopJoin over a single row — no shuffle of the fact
    side)."""
    orders = load_table(spark, sf_dir, "orders")
    avg_all = orders.agg(F.avg("o_totalprice").alias("avg_price"))
    return (
        orders.crossJoin(F.broadcast(avg_all))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_above"),
            F.round(F.avg(F.col("o_totalprice") - F.col("avg_price")), 2).alias(
                "avg_excess"
            ),
        )
    )


# --- q_sketch_aggs: approximate aggregates (the 100 TB path) ----------------
def q_sketch_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counts and quantile sketches per order
    priority. These are the scale path for q_distinct_agg/q_percentiles:
    fixed-size mergeable sketches instead of exact expand/sort state —
    one narrow partial+final pass regardless of group cardinality.
    Approximate by design → no exact SQL oracle (driver records the
    rows-only check); accuracy vs the exact aggregates is guarded by
    tests/test_oracle_queries.py::test_sketch_aggs_accuracy."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("n_cust_approx"),
        F.percentile_approx("o_totalprice", 0.5, 10_000).alias("median_approx"),
        F.count("*").alias("n_orders"),
    )


QUERIES = {
    "q_outer_join": q_outer_join,
    "q_distinct_agg": q_distinct_agg,
    "q_stats_agg": q_stats_agg,
    "q_window_funcs": q_window_funcs,
    "q_pivot": q_pivot,
    "q_grouping_sets": q_grouping_sets,
    "q_string_funcs": q_string_funcs,
    "q_array_funcs": q_array_funcs,
    "q_json_funcs": q_json_funcs,
    "q_scalar_subquery": q_scalar_subquery,
}

# q_sketch_aggs rotated to the test registry in r7 (r6 verdict item 1):
# approximate by design, so its driver slot carried rows-only evidence
# while hash-exact queries sat in the test registry. Its HLL++/quantile
# error bounds stay guarded by test_sketch_aggs_accuracy.
TEST_QUERIES = {"q_sketch_aggs": q_sketch_aggs}
TEST_ORACLE: dict = {}

ORACLE = {
    "q_outer_join": """
        WITH c AS (
            SELECT c_nationkey AS nk, count(*) AS n_cust
            FROM customer WHERE c_mktsegment = 'BUILDING' GROUP BY 1
        ), s AS (
            SELECT s_nationkey AS nk, count(*) AS n_supp
            FROM supplier WHERE s_acctbal > 4500.0 GROUP BY 1
        )
        SELECT coalesce(c.nk, s.nk) AS nationkey,
               coalesce(n_cust, 0) AS n_cust,
               coalesce(n_supp, 0) AS n_supp
        FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
    "q_distinct_agg": """
        SELECT o_orderpriority,
               count(DISTINCT o_custkey) AS n_cust,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders GROUP BY o_orderpriority
    """,
    "q_stats_agg": """
        SELECT l_returnflag,
               round(stddev_samp(l_quantity), 6) AS sd_qty,
               round(var_samp(l_discount), 6) AS var_disc,
               round(corr(l_quantity, l_discount), 6) AS corr_qd,
               round(covar_samp(l_quantity, l_tax), 6) AS cov_qt,
               round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
               round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag
    """,
    "q_window_funcs": """
        SELECT o_orderkey, o_custkey,
               rank() OVER w AS order_rank,
               round(lag(o_totalprice) OVER w, 2) AS prev_price,
               round(avg(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg,
               round(lead(o_totalprice) OVER w, 2) AS next_price,
               ntile(4) OVER w AS bucket4
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "q_pivot": """
        SELECT o_orderpriority,
               round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2)
                   AS f_total,
               round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2)
                   AS o_total,
               round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2)
                   AS p_total
        FROM orders GROUP BY o_orderpriority
    """,
    "q_grouping_sets": """
        SELECT l_returnflag, l_linestatus,
               grouping(l_returnflag) AS g_flag,
               grouping(l_linestatus) AS g_status,
               count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag),
                                (l_linestatus), ())
    """,
    "q_string_funcs": r"""
        SELECT c_custkey,
               CAST(regexp_extract(c_name, '(\d+)', 1) AS BIGINT) AS cust_num,
               length(c_name) AS name_len,
               lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
               substring(c_mktsegment, 1, 3) AS seg3,
               replace(c_name, 'Customer#', 'C') AS short_name,
               concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS tag,
               reverse(substring(c_name, 1, 8)) AS rev8
        FROM customer
    """,
    "q_array_funcs": """
        SELECT vec_id,
               len(embedding) AS dim,
               round(list_sum(list_transform(embedding[1:4],
                     x -> CAST(x AS DOUBLE))), 6) AS head4_sum,
               round(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS l2sq,
               round(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 6) AS max_e,
               round(CAST(list_aggregate(embedding, 'min') AS DOUBLE), 6) AS min_e
        FROM embeddings
    """,
    "q_json_funcs": """
        SELECT event_type,
               count(*) AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4)
                   AS avg_k,
               CAST(sum(CASE
                          WHEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                             = CAST(json_extract_string(props, '$.k') AS BIGINT)
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_consistent
        FROM events GROUP BY event_type
    """,
    "q_scalar_subquery": """
        SELECT o_orderstatus,
               count(*) AS n_above,
               round(avg(o_totalprice -
                         (SELECT avg(o_totalprice) FROM orders)), 2) AS avg_excess
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        GROUP BY o_orderstatus
    """,
}
