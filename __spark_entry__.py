"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``streamy_db_spark``; this module only
aggregates the per-module registries.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the repo importable no matter where the driver launches from.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


_PKG_SHIPPED: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make ``streamy_db_spark`` importable on executor Python workers.

    cloudpickle serializes module-level functions referenced from UDF
    closures BY REFERENCE; a worker whose interpreter can't import this
    package (driver launched from a different cwd, or a real cluster)
    would fail at unpickle time. Shipping the package zip via
    ``addPyFile`` is the standard fix and is what a cluster deployment
    does anyway."""
    import tempfile
    import zipfile

    key = id(spark.sparkContext)
    if key in _PKG_SHIPPED:
        return
    pkg = Path(_REPO) / "streamy_db_spark"
    zpath = Path(tempfile.gettempdir()) / "streamy_db_spark_pkg.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        for py in sorted(pkg.rglob("*.py")):
            zf.write(py, py.relative_to(pkg.parent))
    try:
        spark.sparkContext.addPyFile(str(zpath))
    except Exception:
        pass  # e.g. Spark Connect without SC access; cwd import still works
    _PKG_SHIPPED.add(key)


def _configure(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable session confs (driver owns the session)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # static conf in some builds; loader copes either way
    _ship_package(spark)
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The 3-way join + aggregation (SURVEY.md §2.6 q_join_3way) — scan,
    broadcast-dim join, shuffle join, partial+final agg in one plan.
    """
    from streamy_db_spark.operators.relational import q_join_3way

    _configure(spark)
    return q_join_3way(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from streamy_db_spark.functions import scalar
    from streamy_db_spark.operators import (
        dedup,
        minhash,
        multimodal,
        relational,
        relational_ext,
        relational_ext2,
        similarity,
        temporal,
        text,
    )

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (
        relational,
        relational_ext,
        relational_ext2,
        temporal,
        dedup,
        minhash,
        similarity,
        multimodal,
        text,
        scalar,
    ):
        out.update(mod.QUERIES)

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(_configure(spark), sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in out.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each queries() key (driver correctness
    gate). Keys absent here get the weaker rows-only check."""
    from streamy_db_spark.functions import scalar
    from streamy_db_spark.operators import (
        dedup,
        minhash,
        multimodal,
        relational,
        relational_ext,
        relational_ext2,
        similarity,
        temporal,
        text,
    )

    out: dict[str, str] = {}
    for mod in (
        relational,
        relational_ext,
        relational_ext2,
        temporal,
        dedup,
        minhash,
        similarity,
        multimodal,
        text,
        scalar,
    ):
        out.update(mod.ORACLE)
    return out
