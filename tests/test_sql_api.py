"""SQL entry point: ANSI queries over the registered views must match
DuckDB running the identical text — same dialect subset, same answer."""

from __future__ import annotations

import pytest

from streamy_db_spark.sql import run_sql
from tests.oracle_harness import compare

CROSS_DIALECT = [
    "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus",
    """
    SELECT n_name, round(sum(o_totalprice), 2) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    """
    SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem WHERE l_quantity > 30 GROUP BY l_returnflag
    """,
]


@pytest.mark.parametrize("query", CROSS_DIALECT)
def test_sql_matches_duckdb(spark, sf_oracle, query):
    ok, msg = compare(run_sql(spark, query, sf_oracle), query, sf_oracle)
    assert ok, msg
