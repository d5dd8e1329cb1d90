"""Local replica of the driver's DuckDB-oracle compare: row count, schema
arity, and order-insensitive value comparison (columns sorted by name,
rows sorted by all columns). Used by tests to catch mismatches before
the driver does."""

from __future__ import annotations

import math

import duckdb

from streamy_db_spark.sources.tables import TABLE_NAMES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _normalize_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / representation noise after the query-side rounding
        return round(v, 9)
    if isinstance(v, int):
        return v
    return str(v)


def _normalized_rows(columns: list[str], rows: list[tuple]):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_normalize_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [sorted(c for c in columns)] + out


def compare(spark_df, sql: str, sf_dir: str) -> tuple[bool, str]:
    con = duckdb_connect(sf_dir)
    try:
        oracle = con.execute(sql)
        o_cols = [d[0] for d in oracle.description]
        o_rows = oracle.fetchall()
    finally:
        con.close()

    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns

    if sorted(s_cols) != sorted(o_cols):
        return False, f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    if len(s_rows) != len(o_rows):
        return False, f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}"

    sn = _normalized_rows(s_cols, s_rows)
    on = _normalized_rows(o_cols, o_rows)
    if sn != on:
        diffs = [(a, b) for a, b in zip(sn, on) if a != b][:5]
        return False, f"values differ; first diffs (spark, oracle): {diffs}"
    return True, "ok"
