"""Table profiling: per-column null rate, distinct count, numeric range.

The first pass any pipeline runs on an unfamiliar 100 TB table — the
input to schema validation, partition-key choice, and skew triage.
ONE aggregation job computes every column's stats (Spark evaluates all
aggregate expressions in a single scan with partial aggregation); the
wide 1-row result is then unpivoted driver-free with ``stack`` into the
long (column, stats) form. count(DISTINCT) per column is the exact
form — at 100 TB swap in approx_count_distinct (the engine's
q_sketch_aggs path) via ``exact=False``.

No reference counterpart (SURVEY.md §2.3 — no analytics surface);
data-engineering utility alongside sources/files.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamy_db_spark.sources.tables import load_table

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def profile_table(
    df: DataFrame, cols: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """Long-format profile: one row per column with
    (column, n_rows, n_nulls, n_distinct, min_d, max_d). min/max are
    emitted as doubles for numeric columns and NULL otherwise (string
    renderings of timestamps/floats differ across engines and callers;
    counts are the universal part)."""
    cols = cols or df.columns
    dtypes = dict(df.dtypes)
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    distinct_of = (
        F.count_distinct if exact else (lambda c: F.approx_count_distinct(c))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"))
        aggs.append(distinct_of(F.col(c)).alias(f"__dist_{c}"))
        if dtypes[c] in _NUMERIC:
            aggs.append(F.min(c).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    stack_args = []
    for c in cols:
        mn = f"`__min_{c}`" if dtypes[c] in _NUMERIC else "CAST(NULL AS DOUBLE)"
        mx = f"`__max_{c}`" if dtypes[c] in _NUMERIC else "CAST(NULL AS DOUBLE)"
        stack_args.append(f"'{c}', `__null_{c}`, `__dist_{c}`, {mn}, {mx}")
    return wide.select(
        "__n",
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)}) AS "
            "(column, n_nulls, n_distinct, min_d, max_d)"
        ),
    ).select(
        "column",
        F.col("__n").alias("n_rows"),
        "n_nulls",
        "n_distinct",
        "min_d",
        "max_d",
    )


# --- driver-registered query (promoted r6, r5 verdict item 5) ----------------


_Q_COLS = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"]


def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile_table(load_table(spark, sf_dir, "orders"), _Q_COLS)


QUERIES: dict = {"q_profile_orders": q_profile_orders}

TEST_QUERIES: dict = {}


def _col_sql(c: str, numeric: bool) -> str:
    mn = f"CAST(min({c}) AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
    mx = f"CAST(max({c}) AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
    return f"""
        SELECT '{c}' AS column, count(*) AS n_rows,
               CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_nulls,
               count(DISTINCT {c}) AS n_distinct,
               {mn} AS min_d, {mx} AS max_d
        FROM orders
    """


ORACLE: dict = {
    "q_profile_orders": " UNION ALL ".join(
        _col_sql(c, c != "o_orderstatus") for c in _Q_COLS
    ),
}

TEST_ORACLE: dict = {}
