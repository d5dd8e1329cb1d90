"""Parquet star-schema loader for the harness testdata (TESTDATA.md).

Columnar parquet scan is the engine's primary batch source — Catalyst
pushes filters and prunes columns into the scan (check with
``df.explain("formatted")`` → ``PushedFilters`` / ``ReadSchema``), which is
what makes the same queries viable at 100 TB: a 2-column projection over a
16-column table reads 2 columns' worth of bytes, not 16.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _normalize(name: str, df: DataFrame) -> DataFrame:
    """Normalize physical quirks of the harness parquet.

    The loader's output contract for ``events`` is fixed regardless of the
    physical encoding of ``ts``: the frame exposes ``ts_ns: bigint`` (a
    lossless epoch-nanos total-order key) AND ``ts: timestamp`` (session-tz
    TimestampType for window/date functions). Physical encodings seen from
    the harness generator across rounds:

    - INT64 TIMESTAMP(NANOS): with ``spark.sql.legacy.parquet.nanosAsLong``
      it arrives as an epoch-nanos long — keep it as ``ts_ns``, derive
      ``ts`` at microsecond precision.
    - ``timestamp[us]`` (TIMESTAMP_NTZ in Spark) or TIMESTAMP_LTZ: cast to
      TimestampType (the session tz is pinned to UTC, so the NTZ→LTZ cast
      relabels without shifting the instant) and derive
      ``ts_ns = unix_micros(ts) * 1000``.
    """
    if name == "events":
        dt = df.schema["ts"].dataType
        if isinstance(dt, T.LongType):
            df = df.withColumnRenamed("ts", "ts_ns").withColumn(
                "ts", F.timestamp_micros(F.expr("ts_ns div 1000"))
            )
        else:
            df = df.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
                "ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000)
            )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return _normalize(name, df)


def spread(df: DataFrame, key: str, n: int | None = None) -> DataFrame:
    """Redistribute rows across cores ahead of CPU-heavy per-row compute.

    Small local inputs scan as ONE partition, and Catalyst pushes
    projections below a bare repartition — so the expensive expressions
    would still evaluate in the single scan task. The localCheckpoint is
    a materialization barrier that pins the exchange before the compute.
    On a big cluster input this is a cheap hash exchange (or drop it —
    real scans already have thousands of splits)."""
    return df.repartition(n or default_parallelism(df.sparkSession), key
                          ).localCheckpoint(eager=False)


def default_parallelism(spark: SparkSession) -> int:
    """The session's core-count parallelism signal — scale-adaptive
    partition sizing for explicit repartitions (never a constant).
    Spark Connect has no SparkContext handle; the session's
    shuffle-partition conf carries the same signal there."""
    try:
        return spark.sparkContext.defaultParallelism
    except Exception:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by its join key.

    Both sides of a recurring fact⋈fact equi-join written this way join
    WITHOUT a shuffle (and without a sort, if sorted): Spark recognizes
    the matching bucket spec and plans a zero-Exchange SortMergeJoin.
    This is the standing answer for the orders⋈lineitem class of join at
    100 TB — pay the shuffle once at ingest, never per query."""
    w = df.write.mode("overwrite").option("path", path)
    w = w.bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every harness table and register each as a temp view."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = load_table(spark, sf_dir, name)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
