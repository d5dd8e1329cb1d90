"""CSV / JSON-lines / partitioned-parquet round-trips (sources/files.py).

Parity contract: a table written to a text format and read back with the
explicit schema must agree with the parquet original on row count and on
an order-insensitive aggregate fingerprint; a partitioned write must
prune partitions at plan time."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from streamy_db_spark.plans import inspect
from streamy_db_spark.sources import files
from streamy_db_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"

ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def _fingerprint(df):
    return df.agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.countDistinct("o_orderkey").alias("keys"),
        F.max("o_orderdate").alias("max_dt"),
    ).collect()[0]


@pytest.fixture(scope="module")
def orders(spark):
    return load_table(spark, SF, "orders")


def test_csv_round_trip(spark, orders, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("csv") / "orders")
    files.write_csv(orders, path)
    back = files.read_csv(spark, path, ORDERS_SCHEMA)
    assert _fingerprint(back) == _fingerprint(orders)


def test_json_round_trip(spark, orders, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("json") / "orders")
    files.write_json(orders, path)
    back = files.read_json(spark, path, ORDERS_SCHEMA)
    assert _fingerprint(back) == _fingerprint(orders)


def test_json_failfast_rejects_malformed(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("bad") / "rows.json"
    path.write_text('{"a": 1}\n{not json\n')
    ok = files.read_json(spark, str(path), "a long")
    assert ok.count() == 2  # PERMISSIVE default: malformed row -> nulls
    with pytest.raises(Exception, match="Malformed|FAILFAST"):
        files.read_json(spark, str(path), "a long", mode="FAILFAST").collect()


def test_partitioned_write_prunes(spark, orders, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("part") / "orders")
    files.write_partitioned(orders, path, ["o_orderstatus"])
    back = spark.read.parquet(path)
    flt = back.filter(F.col("o_orderstatus") == "F")
    # row parity against the unpartitioned original
    assert flt.count() == orders.filter(F.col("o_orderstatus") == "F").count()
    # plan-time pruning: the partition filter sits in the scan node
    plan = inspect.formatted_explain(flt)
    assert "PartitionFilters" in plan
    assert "o_orderstatus" in plan.split("PartitionFilters")[1].splitlines()[0]


def test_convert_to_parquet_restores_pushdown(spark, orders, tmp_path_factory):
    csv_path = str(tmp_path_factory.mktemp("conv") / "csv")
    pq_path = str(tmp_path_factory.mktemp("conv") / "pq")
    files.write_csv(orders, csv_path)
    landed = files.read_csv(spark, csv_path, ORDERS_SCHEMA)
    pq = files.convert_to_parquet(landed, pq_path)
    plan = inspect.formatted_explain(pq.filter(F.col("o_orderkey") == 7))
    assert "PushedFilters" in plan
    assert "o_orderkey" in plan.split("PushedFilters")[1].splitlines()[0]


def test_clustered_write_has_disjoint_file_ranges(spark, orders, tmp_path_factory):
    """The point of write_clustered: every parquet file covers a
    disjoint o_custkey range, so footer min/max stats let a key
    predicate skip whole files. Assert disjointness from the actual
    footers, not the plan."""
    import pyarrow.parquet as pq_meta
    from pathlib import Path

    path = str(tmp_path_factory.mktemp("clu") / "orders")
    back = files.write_clustered(orders, path, ["o_custkey"], n_files=8)
    assert _fingerprint(back) == _fingerprint(orders)

    ranges = []
    for f in Path(path).glob("*.parquet"):
        md = pq_meta.ParquetFile(str(f)).metadata
        idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "o_custkey"
        )
        stats = [md.row_group(g).column(idx).statistics for g in range(md.num_row_groups)]
        ranges.append((min(s.min for s in stats), max(s.max for s in stats)))
    ranges.sort()
    assert len(ranges) >= 2  # range partitioning actually split the data
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint (boundary key may sit on the edge)


def test_bucketed_tables_join_without_shuffle(spark, orders, tmp_path_factory):
    """Two tables bucketed on the same key and count must sort-merge
    join with ZERO Exchange operators — the write-once shuffle pays for
    every later join."""
    import shutil
    from urllib.parse import urlparse

    # DROP TABLE alone can't clear a stale LOCATION left by an aborted
    # earlier run (in-memory catalog forgets the table, the dir stays).
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in ("bt_orders", "bt_orders2"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    # Force the fact-fact (sort-merge) path: at test scale the planner
    # would broadcast the small side and skip bucketing entirely — the
    # 100 TB scenario bucketing exists for is precisely the join too big
    # to broadcast.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t1 = files.write_bucketed_table(
            orders, "bt_orders", ["o_custkey"], 8, sort_cols=["o_custkey"]
        )
        t2 = files.write_bucketed_table(
            orders.select("o_custkey", "o_totalprice"),
            "bt_orders2",
            ["o_custkey"],
            8,
            sort_cols=["o_custkey"],
        )
        joined = t1.join(t2, "o_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bt_orders")
        spark.sql("DROP TABLE IF EXISTS bt_orders2")


def test_orc_round_trip_with_pushdown(spark, orders, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("orc") / "orders")
    files.write_orc(orders, path)
    back = files.read_orc(spark, path)
    assert _fingerprint(back) == _fingerprint(orders)
    plan = inspect.formatted_explain(back.filter(F.col("o_orderkey") == 7))
    assert "PushedFilters" in plan
    assert "o_orderkey" in plan.split("PushedFilters")[1].splitlines()[0]


def test_compact_parquet_shrinks_file_count(spark, orders, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cmp") / "orders")
    orders.repartition(40).write.parquet(path)
    from pathlib import Path as P

    before = len(list(P(path).glob("*.parquet")))
    assert before >= 30  # genuinely fragmented input
    n = files.compact_parquet(spark, path, target_file_mb=128)
    after = len(list(P(path).glob("*.parquet")))
    assert after == n and after < before
    assert _fingerprint(spark.read.parquet(path)) == _fingerprint(orders)
    assert not P(path + ".__compact__").exists()
    assert not P(path + ".__old__").exists()


def test_compact_parquet_with_clustering(spark, orders, tmp_path_factory):
    import pyarrow.parquet as pq_meta
    from pathlib import Path as P

    path = str(tmp_path_factory.mktemp("cmpc") / "orders")
    orders.repartition(20).write.parquet(path)
    files.compact_parquet(
        spark, path, target_file_mb=1, cluster_cols=["o_custkey"]
    )
    assert _fingerprint(spark.read.parquet(path)) == _fingerprint(orders)
    # compacted files are key-clustered: per-file ranges are disjoint
    ranges = []
    for f in P(path).glob("*.parquet"):
        md = pq_meta.ParquetFile(str(f)).metadata
        if md.num_row_groups == 0:
            continue
        idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "o_custkey"
        )
        stats = [
            md.row_group(g).column(idx).statistics
            for g in range(md.num_row_groups)
        ]
        ranges.append((min(s.min for s in stats), max(s.max for s in stats)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2


def test_compact_parquet_recovers_crashed_swap(spark, orders, tmp_path_factory):
    # simulate a hard crash between the two swap renames: data sits at
    # <path>.__old__ and <path> is gone — the next run must restore and
    # complete instead of failing at getContentSummary (ADVICE r5)
    import shutil
    from pathlib import Path as P

    path = str(tmp_path_factory.mktemp("cmpcrash") / "orders")
    orders.repartition(10).write.parquet(path)
    want = _fingerprint(spark.read.parquet(path))
    shutil.move(path, path + ".__old__")
    assert not P(path).exists()
    n = files.compact_parquet(spark, path, target_file_mb=128)
    assert n >= 1
    assert _fingerprint(spark.read.parquet(path)) == want
    assert not P(path + ".__old__").exists()


def test_read_parquet_if_exists_marker_only_dir(spark, tmp_path_factory):
    # a directory holding only non-data files (e.g. a _SUCCESS marker
    # from an empty append) is "nothing has ever been written here":
    # must return None on the JVM session, matching the Spark Connect
    # fallback's classification (r6 advice — the JVM branch used to
    # leak UNABLE_TO_INFER_SCHEMA here)
    d = tmp_path_factory.mktemp("markeronly") / "state"
    d.mkdir()
    (d / "_SUCCESS").touch()
    assert files.read_parquet_if_exists(spark, str(d)) is None


def test_read_parquet_if_exists_corrupt_still_raises(spark, tmp_path_factory):
    # the None classification must not swallow genuinely broken data: a
    # directory with an unreadable .parquet file must raise from the
    # read call itself — NOT return None (which the caller would treat
    # as first-run-empty, silently resetting dedup state). Only the
    # read call sits inside pytest.raises so a wrong None can never
    # satisfy the block via a secondary assertion error (r7 advice).
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    d = tmp_path_factory.mktemp("corrupt") / "state"
    d.mkdir()
    (d / "part-00000.parquet").write_bytes(b"not a parquet footer")
    # the corrupt footer surfaces from the schema-inference job as a
    # Py4JJavaError (not AnalysisException — no analysis rule fires;
    # the footer-read TASK fails), which is exactly what must NOT be
    # classified into the None branch
    with _pytest.raises(Py4JJavaError):
        files.read_parquet_if_exists(spark, str(d))
