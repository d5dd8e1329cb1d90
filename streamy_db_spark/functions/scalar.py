"""Scalar-function surface (SURVEY.md §2.3 "Scalar functions").

The reference's entire scalar library is: JSON encode/decode (D3/D10 —
covered by serde.py), ``format_string`` key formatting
(core/TransactionGenerator.scala:44), UUID generation (:50), and
Option/null handling. This module declares that surface as oracle-checked
queries; uuid is excluded from the oracle (nondeterministic by nature)
and instead shown deterministic-per-row via md5-derived surrogate ids.

All JVM-side codegen'd expressions — a scan with zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamy_db_spark.sources.tables import load_table


def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """format_string / coalesce / when / null-safe compare over orders —
    the reference's key-construction and Option-handling idioms."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        # the reference's key format: "key_%010d" (TransactionGenerator:44)
        F.format_string("key_%010d", F.col("o_orderkey")).alias("kv_key"),
        F.coalesce(F.col("o_orderpriority"), F.lit("none")).alias("priority_nn"),
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.col("o_orderstatus").eqNullSafe("O").alias("is_open"),
        # deterministic surrogate id (uuid shape without nondeterminism)
        F.md5(F.concat(F.lit("order|"), F.col("o_orderkey").cast("string"))).alias(
            "surrogate_id"
        ),
    )


QUERIES: dict = {}
ORACLE: dict = {}

# Rotated to the test-only registry in r5 (still DuckDB hash-checked in
# tests): the scalar library is also exercised by q_string_funcs /
# q_array_funcs / q_json_funcs, and the freed driver slot surfaces the
# batch MERGE/upsert operator.
TEST_QUERIES = {"q_scalar_funcs": q_scalar_funcs}

TEST_ORACLE = {
    "q_scalar_funcs": """
        SELECT o_orderkey,
               printf('key_%010d', o_orderkey) AS kv_key,
               coalesce(o_orderpriority, 'none') AS priority_nn,
               CASE WHEN o_totalprice > 200000 THEN 'big'
                    WHEN o_totalprice > 50000 THEN 'mid'
                    ELSE 'small' END AS size_class,
               o_orderstatus IS NOT DISTINCT FROM 'O' AS is_open,
               md5('order|' || o_orderkey::VARCHAR) AS surrogate_id
        FROM orders
    """,
}
