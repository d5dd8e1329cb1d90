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


def hadoop_fs(spark: SparkSession, path: str):
    """(filesystem, Path-factory) for ``path`` via the Hadoop FileSystem
    API, or (None, None) under Spark Connect (no JVM handle). The ONE
    place the classic-vs-Connect FS acquisition lives — every
    state/sink/compaction site that needs file-level operations
    (existence probes, renames, heartbeat mtimes) goes through here so
    Connect detection and FS configuration can never drift between
    copies (r8 review: three hand-rolled copies existed)."""
    try:
        jvm = spark._jvm
        mk = jvm.org.apache.hadoop.fs.Path
        fs = mk(path).getFileSystem(spark._jsc.hadoopConfiguration())
        return fs, mk
    except Exception:
        return None, None


def is_missing_path_error(exc: Exception) -> bool:
    """True when an AnalysisException means 'nothing has ever been
    written here' — missing path, or a directory with no readable files
    (schema inference fails). Shared by every state/sink reader that
    must distinguish first-run-empty from genuinely broken (corrupt
    footer, permissions), so the error-class knowledge lives in ONE
    place."""
    msg = str(exc)
    return (
        "PATH_NOT_FOUND" in msg
        or "Path does not exist" in msg
        or "UNABLE_TO_INFER_SCHEMA" in msg
    )


def read_parquet_if_exists(
    spark: SparkSession, path: str, merge_schema: bool = False
) -> DataFrame | None:
    """Parquet DataFrame, or None ONLY when the path is missing or an
    empty directory. Any other failure propagates. Existence goes
    through the Hadoop FileSystem API when the session has a JVM
    handle; Spark Connect falls back to read-and-classify via
    is_missing_path_error. ``merge_schema`` unions the footers'
    schemas — required for evolved directories (e.g. dedup state dirs
    that gained columns across versions), where a single arbitrary
    footer would make column visibility nondeterministic."""
    from pyspark.errors import AnalysisException  # noqa: PLC0415

    def _do_read() -> DataFrame:
        return spark.read.option(
            "mergeSchema", str(merge_schema).lower()
        ).parquet(path)

    fs, mk = hadoop_fs(spark, path)
    if fs is None:  # Spark Connect session: classify by error instead
        try:
            df = _do_read()
            df.schema  # force analysis so missing paths surface HERE
            return df
        except AnalysisException as exc:
            if is_missing_path_error(exc):
                return None
            raise
    hpath = mk(path)
    if not fs.exists(hpath):
        return None
    if fs.getFileStatus(hpath).isDirectory() and len(fs.listStatus(hpath)) == 0:
        return None
    # Classify the read the same way the Connect branch does: a directory
    # that exists but holds no readable data files (e.g. only a _SUCCESS
    # marker from an empty append) raises UNABLE_TO_INFER_SCHEMA — that is
    # still "nothing has ever been written here", and first-batch-vs-error
    # semantics must not differ by deployment type (r6 advice).
    try:
        df = _do_read()
        df.schema  # force analysis so missing/empty paths surface HERE
        return df
    except AnalysisException as exc:
        if is_missing_path_error(exc):
            return None
        raise


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — columnar like parquet (schema in the file footer, so
    no explicit schema needed; predicate pushdown and column pruning
    work the same way). For interop with Hive-era warehouses."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Range-partition on ``cluster_cols`` and sort within partitions
    before writing parquet: every output file then covers a DISJOINT
    range of the cluster key, so its footer min/max statistics (zone
    maps) let later scans with a key predicate skip whole files and row
    groups. This is the cheap half of the Z-order/liquid-clustering
    story and the right layout for any column that dominates the filter
    workload (user_id, date, tenant). Range partitioning samples the key
    distribution, so skewed keys still yield balanced files. Returns the
    re-scanned DataFrame."""
    part = (
        df.repartitionByRange(n_files, *cluster_cols)
        if n_files
        else df.repartitionByRange(*cluster_cols)
    )
    part.sortWithinPartitions(*cluster_cols).write.mode(mode).parquet(path)
    return df.sparkSession.read.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Persist as a hash-bucketed (optionally sorted) catalog table.
    Two tables bucketed on the same key with the same bucket count join
    WITHOUT a shuffle on either side — the bucket layout IS the shuffle,
    paid once at write time and amortized over every later join/agg on
    that key. The pattern for fact-fact joins too big to broadcast at
    100 TB. (Bucketing requires the catalog — ``saveAsTable``, not
    ``save``: the bucket spec lives in table metadata.)"""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)
    return df.sparkSession.table(table)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    cluster_cols: list[str] | None = None,
    dedupe_rows: bool = False,
    merge_schema: bool = False,
    min_files: int = 1,
    pre_swap_check=None,
    transform=None,
) -> int:
    """Rewrite a parquet directory into ~``target_file_mb`` files — the
    standard maintenance pass after streaming/incremental ingest leaves
    thousands of small files (every one costs a task + an open at scan
    time; the listing alone dominates planning on millions of files).
    Optionally re-clusters on ``cluster_cols`` while rewriting (zone
    maps for free, see write_clustered). Returns the output file count.

    Write-then-swap through the Hadoop FileSystem API (works on any
    scheme Spark can read): the rewrite lands in ``<path>.__compact__``
    and replaces the original only after it fully commits. The swap is
    two renames, NOT atomic: a crash inside that window leaves the data
    at ``<path>.__old__`` with ``path`` missing — the recovery branch on
    entry below renames it back before proceeding, so no data is ever
    lost and a rerun self-heals. NOT safe under concurrent writers to
    ``path`` — that coordination is what table formats (Delta/Iceberg)
    add.

    ``pre_swap_check`` (optional callable) runs AFTER the rewrite fully
    commits but immediately BEFORE the first swap rename; if it raises,
    the original directory is untouched (the orphaned ``.__compact__``
    temp is cleared by the next run). Callers use it to re-validate a
    became-stale precondition — e.g. the incremental dedup gates
    re-check the stream heartbeat, so a stream that came alive DURING
    the (minutes-long) rewrite aborts the swap instead of racing it;
    the remaining window is the instant between the re-check and the
    renames.

    ``transform`` (optional DataFrame → DataFrame) rewrites ROW CONTENT
    during the compaction, under the same write-then-swap crash safety
    — a plain rewrite-in-place of the transformed data would leave the
    directory mixed old/new if it died mid-write. Applied after
    ``dedupe_rows``, before clustering (so ``cluster_cols`` may name
    columns the transform introduces or rewrites — the semantic gate's
    re-cluster pass rewrites cluster_id this way)."""
    fs, mk = hadoop_fs(spark, path)
    if fs is None:
        raise NotImplementedError(
            "compact_parquet drives Hadoop FileSystem renames and needs a "
            "classic (JVM-attached) SparkSession; Spark Connect sessions "
            "cannot run it — compact from a classic session instead"
        )
    hpath = mk(path)

    # Crash recovery: a previous run that died between its two swap
    # renames left the original at <path>.__old__ and nothing at <path>.
    # Restore it first; a fresh .__compact__ rewrite follows as normal.
    crashed_old = mk(path.rstrip("/") + ".__old__")
    if not fs.exists(hpath) and fs.exists(crashed_old):
        if not fs.rename(crashed_old, hpath):
            raise IOError(
                f"compact_parquet: cannot restore {path} from crashed swap"
            )
    # ``min_files`` floors the output file count below the size-derived
    # one — callers that rely on file-LEVEL pruning granularity (the
    # near-dedup bands index) can keep files finer than target_file_mb
    # would; at production state sizes the size term dominates anyway.
    total_bytes = fs.getContentSummary(hpath).getLength()
    n_files = max(
        min_files, 1, int(total_bytes // (target_file_mb * 1024 * 1024)) + 1
    )

    df = spark.read.option("mergeSchema", str(merge_schema).lower()).parquet(path)
    if dedupe_rows:
        # append-only state dirs (incremental dedup fingerprints) can
        # carry exact-duplicate rows from crash-replayed appends — they
        # cost space, never correctness, and compaction is the natural
        # place to drop them
        df = df.distinct()
    if transform is not None:
        df = transform(df)
    tmp = path.rstrip("/") + ".__compact__"
    tmp_path = mk(tmp)
    fs.delete(tmp_path, True)  # clear a stale temp from a crashed run
    if cluster_cols:
        df.repartitionByRange(n_files, *cluster_cols).sortWithinPartitions(
            *cluster_cols
        ).write.mode("overwrite").parquet(tmp)
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(tmp)

    old = path.rstrip("/") + ".__old__"
    old_path = mk(old)
    fs.delete(old_path, True)
    if pre_swap_check is not None:
        pre_swap_check()
    if not fs.rename(hpath, old_path):
        raise IOError(f"compact_parquet: cannot move {path} aside")
    if not fs.rename(tmp_path, hpath):
        fs.rename(old_path, hpath)  # roll back
        raise IOError(f"compact_parquet: swap failed for {path}")
    fs.delete(old_path, True)
    return sum(
        1
        for f in spark.read.parquet(path).inputFiles()
        if f.endswith(".parquet")
    )


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
