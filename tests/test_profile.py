"""profile_table unit semantics (the sf0.01 DuckDB hash-match runs via
test_oracle_queries' test-only registry)."""

from __future__ import annotations

import pytest

from streamy_db_spark.operators.profile import profile_table


def _df(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.5), (3, "a", None), (4, "b", 4.5)],
        "k long, s string, v double",
    )


def test_profile_values(spark):
    got = {r.column: r for r in profile_table(_df(spark)).collect()}
    assert set(got) == {"k", "s", "v"}
    for r in got.values():
        assert r.n_rows == 4
    assert (got["k"].n_nulls, got["k"].n_distinct) == (0, 4)
    assert (got["s"].n_nulls, got["s"].n_distinct) == (1, 2)
    assert (got["v"].n_nulls, got["v"].n_distinct) == (1, 3)
    assert (got["k"].min_d, got["k"].max_d) == (1.0, 4.0)
    assert (got["v"].min_d, got["v"].max_d) == (1.5, 4.5)
    assert got["s"].min_d is None and got["s"].max_d is None


def test_profile_single_scan(spark, sf_oracle):
    """All columns profile in ONE aggregation over ONE scan."""
    from streamy_db_spark.operators.profile import q_profile_orders

    plan = (
        q_profile_orders(spark, sf_oracle)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1
    assert "BatchEvalPython" not in plan


def test_profile_rejects_unknown_column(spark):
    with pytest.raises(ValueError, match="unknown columns"):
        profile_table(_df(spark), ["nope"])


def test_profile_approx_mode_runs(spark):
    got = {r.column: r for r in profile_table(_df(spark), exact=False).collect()}
    # approx distinct is exact at this tiny scale
    assert got["k"].n_distinct == 4
