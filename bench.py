#!/usr/bin/env python
"""Per-round benchmark harness (driver contract).

Runs every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``, plus the batch
transaction-protocol replay (the engine's headline capability), and prints
ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock over all queries (the driver compares it
against BASELINE.md round over round). Per-query seconds let us see which
plan regressed. Each query is forced with a count()-style materialization
(collect for top-k queries) so the measured time is the full job, not plan
construction.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Deliberately-O(N²) exact baselines: they exist to verify the scalable
# variants' recall at oracle scale (sf0.01) and are not meaningful to time
# at bench scale (5000 docs → 12.5M list-intersect pairs). Their scalable
# counterparts (q_minhash_lsh_pairs, q_ann_lsh) ARE timed. Skips are
# recorded explicitly in the output — no silent caps.
QUADRATIC_BASELINES = {"q_jaccard_pairs", "q_dedup_near_embedding"}


def _sf_from_dir(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def bench_protocol_replay(spark) -> tuple[float, float]:
    """Deterministic transaction replay throughput on the scale_bench mix
    (10k txns × 4 keys). Returns (seconds, txns_per_sec)."""
    from streamy_db_spark import fixtures
    from streamy_db_spark.engine_batch import replay

    # Warm the replay's plan shapes on a tiny mix first: a cold run pays
    # ~3.5 s of one-time Catalyst/codegen compile across the fixpoint's
    # many small jobs (measured 8.4 s cold vs 4.8 s warm for the SAME
    # work). On a resident engine those plans are compiled once per
    # process, so timing them against a 10k-txn batch would misattribute
    # — same rationale as the scan/Arrow warmups in main().
    warm = fixtures.generate_df(spark, "ref_smoke").localCheckpoint(eager=True)
    r, s = replay(warm)
    r.count(), s.count()

    txns = fixtures.generate_df(spark, "scale_bench")
    txns = txns.localCheckpoint(eager=True)  # exclude generation from timing
    n = txns.count()
    t0 = time.perf_counter()
    results, state = replay(txns)
    n_res = results.count()
    state.count()
    dt = time.perf_counter() - t0
    assert n_res == n, f"replay dropped transactions: {n_res}/{n}"
    return dt, n / dt


def main() -> None:
    import __spark_entry__ as entry_mod
    from streamy_db_spark.session import get_spark

    spark = get_spark("bench")

    # Warm the JVM + scan paths once so per-query numbers measure the
    # queries, not first-job class-loading (~5 s on the first parquet
    # aggregation otherwise).
    for t in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet")).count()

    # Warm the Python/Arrow worker pool too: the first pandas-UDF stage in
    # a session forks + initializes one Python worker per core (~7 s on
    # local[32]); on a long-lived cluster those workers are resident, so
    # charging the fork cost to whichever query happens to run first would
    # misattribute it.
    from pyspark.sql import functions as F  # noqa: PLC0415
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    @pandas_udf("double")
    def _warm(v):  # pragma: no cover - trivial
        return v * 1.0

    spark.range(10_000, numPartitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).select(
        _warm(F.col("id").cast("double"))
    ).count()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}

    skipped = []
    for name, fn in sorted(entry_mod.queries().items()):
        if name in QUADRATIC_BASELINES:
            skipped.append(name)
            continue
        # Per-query fault isolation: one failing query must not kill the
        # whole benchmark record (round 3 lost every number to a single
        # AnalysisException). Failures are reported, never silently eaten.
        t0 = time.perf_counter()
        try:
            df = fn(spark, SF_DIR)
            df.count()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)

    try:
        replay_s, txn_rate = bench_protocol_replay(spark)
        timings["protocol_replay_10k"] = round(replay_s, 3)
    except Exception as exc:  # noqa: BLE001
        errors["protocol_replay_10k"] = f"{type(exc).__name__}: {exc}"[:500]
        print(
            f"bench: protocol_replay_10k FAILED: {errors['protocol_replay_10k']}",
            file=sys.stderr,
        )
        txn_rate = 0.0

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
                "protocol_txn_per_sec": round(txn_rate, 1),
                "skipped_quadratic_baselines": skipped,
                "errors": errors,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
