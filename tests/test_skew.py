"""Salted two-phase aggregation and salted join must be exactly
equivalent to their plain formulations — salting changes the shuffle
shape, never the answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamy_db_spark.operators.skew import broadcast_salted_join, salted_agg
from streamy_db_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_salted_agg_equivalent(spark):
    li = load_table(spark, SF, "lineitem")
    plain = {
        tuple(r)
        for r in li.groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n"),
            F.sum("l_quantity").alias("qty"),
            F.min("l_shipdate").alias("first_ship"),
            F.max("l_extendedprice").alias("max_price"),
        )
        .collect()
    }
    salted = {
        tuple(r)
        for r in salted_agg(
            li,
            ["l_orderkey"],
            {
                "n": ("count", "*"),
                "qty": ("sum", "l_quantity"),
                "first_ship": ("min", "l_shipdate"),
                "max_price": ("max", "l_extendedprice"),
            },
        ).collect()
    }
    assert plain == salted


def test_salted_join_equivalent(spark):
    li = load_table(spark, SF, "lineitem").withColumnRenamed("l_orderkey", "okey")
    orders = load_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    plain = {
        tuple(r)
        for r in li.join(orders, "okey")
        .select("okey", "l_linenumber", "o_orderpriority")
        .collect()
    }
    salted = {
        tuple(r)
        for r in broadcast_salted_join(li, orders, "okey")
        .select("okey", "l_linenumber", "o_orderpriority")
        .collect()
    }
    assert plain == salted
