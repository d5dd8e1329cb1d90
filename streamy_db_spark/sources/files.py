"""File-format sources and sinks beyond parquet.

The reference's only I/O is Kafka (SURVEY.md §2.3 D1/D2/D11 — file
formats **ABSENT**); CSV / JSON-lines / partitioned-parquet are declared
engine surface because any batch replay or training-data pipeline needs
them. Design rules for 100 TB:

- **Schemas are explicit.** Inference is a full extra pass over the data
  (and nondeterministic under sampling); these readers require a schema.
- **Text formats are ingest formats.** CSV/JSON scans can't push
  predicates or prune columns the way parquet does — land them, convert
  to parquet (``convert_to_parquet``), query the parquet.
- **Partitioned layout = partition pruning.** ``write_partitioned``
  lays out hive-style directories so an equality filter on the partition
  column skips whole directories at plan time (``PartitionFilters`` in
  the scan node), the coarsest and cheapest pushdown there is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV source with a mandatory explicit schema (no inference pass)."""
    return (
        spark.read.options(header=str(header).lower(), **options)
        .schema(schema)
        .csv(path)
    )


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | str, **options: str
) -> DataFrame:
    """JSON-lines source with a mandatory explicit schema. Malformed rows
    land in the PERMISSIVE null-row default; pass
    ``mode="FAILFAST"`` to refuse them instead."""
    return spark.read.options(**options).schema(schema).json(path)


def write_csv(
    df: DataFrame, path: str, header: bool = True, mode: str = "overwrite"
) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned layout: one directory per partition-column
    value. Filters on partition columns prune at plan time; keep the
    column low-cardinality (status, date bucket) or you trade pruning
    for a small-files problem."""
    df.write.mode(mode).partitionBy(*partition_cols).format(fmt).save(path)


def convert_to_parquet(
    df: DataFrame, path: str, partition_cols: list[str] | None = None
) -> DataFrame:
    """Land a text-format ingest as query-optimized parquet and return
    the re-scanned DataFrame (now with pushdown/pruning)."""
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)
    return df.sparkSession.read.parquet(path)
