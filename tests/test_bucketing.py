"""Bucketed co-located join: after one-time bucketed ingest on the join
key, the fact⋈fact join must plan with ZERO exchanges — the per-query
shuffle is gone, which is the difference between feasible and not at
100 TB. Verified from the physical plan, then the result is checked
against the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamy_db_spark.plans import inspect
from streamy_db_spark.sources.tables import load_table, write_bucketed

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    write_bucketed(
        orders, "orders_b", str(tmp_path / "orders_b"), "o_orderkey", 8
    )
    write_bucketed(
        li, "lineitem_b", str(tmp_path / "lineitem_b"), "l_orderkey", 8
    )
    try:
        ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
        joined = lb.join(
            ob.hint("merge"), lb.l_orderkey == ob.o_orderkey
        ).select("l_orderkey", "l_linenumber", "o_orderpriority")

        plan = inspect.executed_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # co-located: no shuffle at all

        plain = {
            tuple(r)
            for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
            .select("l_orderkey", "l_linenumber", "o_orderpriority")
            .collect()
        }
        assert {tuple(r) for r in joined.collect()} == plain
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
