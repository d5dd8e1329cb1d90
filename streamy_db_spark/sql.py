"""SQL entry point.

The reference has no SQL surface (SURVEY.md: no parser, no optimizer) —
this engine gets one for free by registering the harness star schema as
temp views and delegating to Spark SQL: the full ANSI surface, same
Catalyst plans as the DataFrame queries (§4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from streamy_db_spark.sources.tables import DEFAULT_SF_DIR, load_tables


def run_sql(spark: SparkSession, query: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Register every harness table as a view, run one ANSI SQL query."""
    load_tables(spark, sf_dir)
    return spark.sql(query)
