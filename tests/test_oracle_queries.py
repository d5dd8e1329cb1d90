"""Every declared query must hash-match its DuckDB oracle at sf0.01 —
a local replica of the driver's correctness gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare

QUERIES = entrymod.queries()
ORACLE = entrymod.oracle_sql()


def test_every_query_has_oracle_or_is_declared():
    missing = set(ORACLE) - set(QUERIES)
    assert not missing, f"oracle entries without queries: {missing}"


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, sf_oracle, name):
    df = QUERIES[name](spark, sf_oracle)
    ok, msg = compare(df, ORACLE[name], sf_oracle)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["c_mktsegment", "o_orderpriority", "revenue", "n_rows"]
