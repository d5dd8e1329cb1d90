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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamy_db_spark.sources.tables import load_table


# --- q_semi_anti_join: EXISTS as left_semi + NOT EXISTS as left_anti --------
# Round-2 consolidation of r1's q_semi_join + q_anti_join so both operators
# share one driver-correctness slot (both physical shapes still gated
# individually in tests/test_plans.py).
def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with ≥1 finished order (left_semi) unioned with customers
    having no orders at all (left_anti), tagged by ``probe``. ``left_semi``
    keeps the probe side unduplicated — at scale the build side reduces to
    the distinct key set, so the shuffle moves keys, never payloads; the
    anti join is the classic missing-key data-quality probe."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    f_orders = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    all_orders = orders.select("o_custkey")
    semi = cust.join(
        f_orders, cust.c_custkey == f_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", F.lit("has_f_order").alias("probe"))
    anti = cust.join(
        all_orders, cust.c_custkey == all_orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", F.lit("no_orders").alias("probe"))
    return semi.unionByName(anti)


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


# --- q_tpch_q5: the 6-way broadcast-chain join ------------------------------
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈ nation ⋈
    region — local-supplier revenue per nation for one region and a date
    window.

    Scale plan: region (5 rows) and nation (25) pin trivially as
    broadcasts; supplier and customer are bounded dims (≤1.5M rows /
    ~100 MB at sf100) — broadcast both so the two FACT tables
    (lineitem, orders) shuffle only once, on their shared orderkey. The
    region filter prunes nation before it reaches supplier/customer
    (broadcast chain), so the fact scan is filtered by suppkey/custkey
    membership at the join, and the date predicate pushes into the
    orders parquet scan. tests/test_plans.py gates ≥2 broadcast joins
    and the pushed date filter.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # dim chain: region → nation → supplier (all broadcast)
    dims = supp.join(
        F.broadcast(nation.join(region, nation.n_regionkey == region.r_regionkey)),
        supp.s_nationkey == nation.n_nationkey,
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .join(
            F.broadcast(cust),
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == dims.s_nationkey),
        )
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


QUERIES = {
    "q_tpch_q5": q_tpch_q5,
    "q_semi_anti_join": q_semi_anti_join,
    "q_set_ops": q_set_ops,
    "q_conditional_agg": q_conditional_agg,
    "q_date_agg": q_date_agg,
}

ORACLE = {
    "q_tpch_q5": """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_rows
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
    """,
    "q_semi_anti_join": """
        SELECT c_custkey, c_name, 'has_f_order' AS probe
        FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
        )
        UNION ALL
        SELECT c_custkey, c_name, 'no_orders' AS probe
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
