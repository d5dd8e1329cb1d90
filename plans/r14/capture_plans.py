#!/usr/bin/env python
"""Capture .explain('formatted') for every declared query (driver surface).

Writes plans/r14/<query>_<tag>.txt for each queries() entry. Used to
record the round's before/after plan evidence (optimization guide §1:
measure first; §7.2: read the plan). Run:

    python plans/r14/capture_plans.py before [query ...]

Plan capture only builds the DataFrame and formats the physical plan —
no job executes, so it is safe to run alongside other work.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[2])
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    out_dir = Path(_REPO) / "plans" / "r14"
    out_dir.mkdir(parents=True, exist_ok=True)

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .appName("plan-capture-r14")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        path = out_dir / f"{name}_{tag}.txt"
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # capture failures loudly, keep going
            plan = f"ERROR building plan: {exc!r}\n"
        path.write_text(f"# {name} @ {SF_DIR} [{tag}]\n{plan}")
        print(f"wrote {path}")

    spark.stop()


if __name__ == "__main__":
    main()
