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


# DuckDB silently widens integer sum() to HUGEINT (int128) and decimal
# arithmetic to DECIMAL — Python-level value normalization masks that
# (int128 and int64 both become `int`), but the driver's hash is
# type-sensitive at the Arrow level, so those must fail locally.
# Evidence calibrates the strictness: r1's driver run hash-PASSED
# q_array_funcs (Spark int vs DuckDB BIGINT) but hash-FAILED q_sessionize
# (Spark bigint vs DuckDB HUGEINT) → integer-width mismatches within
# int8..int64 are normalized by the driver; HUGEINT/DECIMAL are not.
_INT_TYPES = {"tinyint", "smallint", "int", "bigint"}
_FLOAT_TYPES = {"float", "double"}
_DUCK_INT_OK = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}
_DUCK_FLOAT_OK = {"FLOAT", "DOUBLE"}


def _check_types(s_dtypes: dict[str, str], o_types: dict[str, str]) -> str | None:
    for col, sdt in s_dtypes.items():
        got = o_types.get(col, "").upper()
        if sdt in _INT_TYPES:
            ok, fix = got in _DUCK_INT_OK, "BIGINT"
        elif sdt in _FLOAT_TYPES:
            ok, fix = got in _DUCK_FLOAT_OK, "DOUBLE"
        else:
            continue  # strings/dates/arrays: value compare suffices
        if not ok:
            return (
                f"column {col!r}: spark={sdt} but DuckDB declares {got} "
                f"(cast the oracle expression, e.g. CAST(... AS {fix}))"
            )
    return None


def compare(spark_df, sql: str, sf_dir: str) -> tuple[bool, str]:
    return compare_with_connection(spark_df, sql, duckdb_connect(sf_dir))


def compare_with_connection(
    spark_df, sql: str, con: duckdb.DuckDBPyConnection
) -> tuple[bool, str]:
    """Same gate, caller-supplied connection — for tests that compare
    against planted side tables rather than the standard sf views."""
    try:
        rel = con.sql(sql)
        o_types = dict(zip(rel.columns, (str(t) for t in rel.types)))
        oracle = con.execute(sql)
        o_cols = [d[0] for d in oracle.description]
        o_rows = oracle.fetchall()
    finally:
        con.close()

    type_err = _check_types(dict(spark_df.dtypes), o_types)
    if type_err is not None:
        return False, f"declared-type mismatch: {type_err}"

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
