"""Extended relational surface beyond the reference's own operators.

SURVEY.md §2.3 marks semi/anti joins, set operations, ranking windows,
grouping sets, and general scalar aggregates **ABSENT** in the reference
(its only predicate is the per-transaction assert conjunction,
flink/StreamyDb.scala:166-172). A user switching to this engine for
general event-log / training-data work needs them, so they are declared
engine surface here — each one pure DataFrame API (Catalyst plans them;
SURVEY §4.3) with an exact DuckDB oracle.

Scale notes per query are in the docstrings: every shape is a single
hash shuffle on a uniform key or a bounded-fanout window — nothing here
degrades superlinearly at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streamy_db_spark.sources.tables import load_table


# --- q_semi_join: EXISTS as left_semi (no row multiplication) ---------------
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having at least one finished order. ``left_semi`` keeps
    the probe side unduplicated — at scale the build side reduces to the
    distinct key set, so the shuffle moves keys, never payloads."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    f_orders = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return cust.join(
        f_orders, cust.c_custkey == f_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


# --- q_anti_join: NOT EXISTS as left_anti -----------------------------------
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders at all (the classic data-quality probe)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


# --- q_set_ops: INTERSECT / EXCEPT (distinct set semantics) -----------------
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer keys with both 'F' and 'O' orders but no 'P' orders —
    INTERSECT then EXCEPT, distinct set semantics on both engines."""
    orders = load_table(spark, sf_dir, "orders")

    def keys(status: str) -> DataFrame:
        return orders.filter(F.col("o_orderstatus") == status).select(
            F.col("o_custkey").alias("custkey")
        )

    return keys("F").intersect(keys("O")).subtract(keys("P"))


# --- q_window_rank: rank + lag over a deterministic window ------------------
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by account balance per market segment, with the
    previous-ranked balance (lag). Window key (segment) has bounded
    cardinality; per-partition sort is the only cost."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        cust.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.rank().over(w).alias("bal_rank"),
            F.lag("c_acctbal").over(w).alias("prev_bal"),
        )
        .filter(F.col("bal_rank") <= 3)
    )


# --- q_cube_pricing: CUBE grouping sets -------------------------------------
def q_cube_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all four grouping-set levels
    in one pass (partial aggregation still applies — map-side combine
    happens per grouping set before the shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


# --- q_percentiles: exact interpolated quantiles ----------------------------
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median and p90 of order value per status — Spark ``percentile``
    and DuckDB ``quantile_cont`` share the linear-interpolation
    definition. (At 100 TB swap in ``approx_percentile``: the exact form
    materializes each group's values; the sketch form is one pass.)"""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
    )


# --- q_conditional_agg: CASE-gated aggregates -------------------------------
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment conditional aggregates (count-if / sum-if) — the
    bread-and-butter quality-dashboard shape; one scan, one shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_cust"),
        F.count(F.when(F.col("c_acctbal") < 0, 1)).alias("n_negative"),
        F.round(
            F.sum(F.when(F.col("c_acctbal") > 0, F.col("c_acctbal")).otherwise(0.0)),
            2,
        ).alias("positive_bal"),
    )


# --- q_date_agg: calendar truncation ----------------------------------------
def q_date_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders per (year, month): date-part extraction + aggregate (both
    engines run on UTC naive timestamps — session TZ pinned in
    __spark_entry__)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("o_year"),
            F.month("o_orderdate").alias("o_month"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("month_total"),
        )
    )


QUERIES = {
    "q_semi_join": q_semi_join,
    "q_anti_join": q_anti_join,
    "q_set_ops": q_set_ops,
    "q_window_rank": q_window_rank,
    "q_cube_pricing": q_cube_pricing,
    "q_percentiles": q_percentiles,
    "q_conditional_agg": q_conditional_agg,
    "q_date_agg": q_date_agg,
}

ORACLE = {
    "q_semi_join": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
        )
    """,
    "q_anti_join": """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE NOT EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = c_custkey
        )
    """,
    "q_set_ops": """
        (
            SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
            INTERSECT
            SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        )
        EXCEPT
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    "q_window_rank": """
        SELECT * FROM (
            SELECT c_mktsegment, c_custkey, c_acctbal,
                   rank() OVER w AS bal_rank,
                   lag(c_acctbal) OVER w AS prev_bal
            FROM customer
            WINDOW w AS (
                PARTITION BY c_mktsegment
                ORDER BY c_acctbal DESC, c_custkey ASC
            )
        ) WHERE bal_rank <= 3
    """,
    "q_cube_pricing": """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "q_percentiles": """
        SELECT o_orderstatus, count(*) AS n_orders,
               round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
               round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
        FROM orders GROUP BY o_orderstatus
    """,
    "q_conditional_agg": """
        SELECT c_mktsegment, count(*) AS n_cust,
               count(CASE WHEN c_acctbal < 0 THEN 1 END) AS n_negative,
               round(sum(CASE WHEN c_acctbal > 0 THEN c_acctbal ELSE 0 END), 2)
                   AS positive_bal
        FROM customer GROUP BY c_mktsegment
    """,
    "q_date_agg": """
        SELECT year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS month_total
        FROM orders GROUP BY 1, 2
    """,
}
