"""Physical-plan inspection helpers (SURVEY.md §4.3 discipline).

No custom Catalyst rules exist in this engine — by design (§4.3: every
query lands on public DataFrame APIs and the built-in optimizer). What
this module provides instead is the *inspection* side: utilities to
assert the plans Catalyst produced are the plans we want at 100 TB
(pushdown reached the scan, dims broadcast, top-k avoided a global sort,
Python only at declared Arrow boundaries). tests/test_plans.py gates on
these per-query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Physical plan string (AQE initial plan until first execution)."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_explain(df: DataFrame) -> str:
    """explain('formatted') as a string — includes PushedFilters/ReadSchema."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def shuffle_exchange_inputs(df: DataFrame) -> list[str]:
    """The ``Input [...]`` attribute list of every shuffle Exchange node
    in the formatted plan (the FINAL plan once AQE has executed) — i.e.
    the columns that actually ride each shuffle, keys AND payload.

    This exists because the plan-STRING form (executed_plan) prints an
    Exchange as ``Exchange hashpartitioning(<keys>, n)`` — partitioning
    keys only, never the payload columns — so asserting a payload
    column's absence on those lines is vacuous (r13 review: the
    pre-r13 dedupe_exact shape shuffled every document's text yet no
    Exchange line contained ``text#``). BroadcastExchange and
    ReusedExchange nodes are excluded: a broadcast is the small-side
    plan shape these gates WANT, and a reused exchange duplicates an
    original that is already in the list."""
    lines = formatted_explain(df).splitlines()
    out = []
    for i, line in enumerate(lines):
        head = line.strip()
        if head.startswith("(") and head.split(") ", 1)[-1] == "Exchange":
            for j in range(i + 1, min(i + 4, len(lines))):
                if lines[j].startswith("Input"):
                    out.append(lines[j])
                    break
    return out


def pushed_filters(df: DataFrame) -> list[str]:
    """The filter list that reached each parquet scan."""
    out = []
    for line in formatted_explain(df).splitlines():
        if "PushedFilters" in line:
            out.append(line.split("PushedFilters:", 1)[1].strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each scan — the column-pruning ground truth."""
    out = []
    for line in formatted_explain(df).splitlines():
        if "ReadSchema" in line:
            out.append(line.split("ReadSchema:", 1)[1].strip())
    return out


def has_operator(df: DataFrame, op: str) -> bool:
    return op in executed_plan(df)


def python_eval_operators(df: DataFrame) -> list[str]:
    """Row-at-a-time Python operators present in the plan (should be NONE
    outside declared Arrow boundaries: ArrowEvalPython/MapInPandas/
    FlatMapGroupsInPandas are the sanctioned ones)."""
    plan = executed_plan(df)
    return [op for op in ("BatchEvalPython",) if op in plan]
