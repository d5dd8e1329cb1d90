#!/usr/bin/env python
"""Targeted min-of-N query timer for the r14 optimization round.

Same measurement basis as bench.py (get_spark session, scan/Arrow/noop
warmups, noop-sink forcing, memo-cache purge before each rep so the
dedup family re-pays its pipeline like the bench's cold basis; the
warm-sketch query re-warms its declared basis untimed), but runs ONLY
the requested entries, N reps each, and prints every sample plus the
min — the comparison basis BASELINE §9 prescribes on this
ambient-noisy VM. Usage:

    python plans/r14/timeq.py N name [name ...]

Special names: protocol_replay_10k / protocol_replay_100k.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[2])
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    reps = int(sys.argv[1])
    names = sys.argv[2:]

    import bench
    import __spark_entry__ as entry_mod
    from streamy_db_spark.session import get_spark

    spark = get_spark("timeq")
    spark.sparkContext.setLogLevel("ERROR")

    # bench-identical warmups (scan, pandas UDF, mapInPandas, noop write)
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    for t in ("lineitem", "orders", "customer", "events", "documents",
              "embeddings"):
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).count()

    @pandas_udf("double")
    def _warm(v):
        return v * 1.0

    n_parts = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(10_000, numPartitions=n_parts).select(
        _warm(F.col("id").cast("double"))
    ).count()

    def _warm_mip(batches):
        yield from batches

    spark.range(10_000, numPartitions=n_parts).mapInPandas(
        _warm_mip, "id long"
    ).count()
    spark.range(10_000, numPartitions=n_parts).write.format("noop").mode(
        "overwrite"
    ).save()

    tiny = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")
    if os.path.isdir(tiny):
        try:
            from streamy_db_spark.operators.dedup import q_dedup_groups as _wdg

            _wdg(spark, tiny).count()
        except Exception as exc:  # noqa: BLE001
            print(f"timeq: dedup warmup skipped: {exc}", file=sys.stderr)

    qfns = entry_mod.queries()
    rewarms = bench._cache_rewarms(spark, SF_DIR)

    def purge() -> None:
        from streamy_db_spark.operators import minhash, similarity

        minhash.clear_corpus_caches(spark, SF_DIR)
        similarity._IVF_CENTROID_CACHE.clear()

    out: dict[str, dict] = {}
    for name in names:
        samples: list[float] = []
        for i in range(reps):
            if name.startswith("protocol_replay_"):
                mix = {
                    "protocol_replay_10k": "scale_bench",
                    "protocol_replay_100k": "scale_bench_100k",
                }[name]
                sec, rate, stats = bench.bench_protocol_replay(
                    spark, mix, warm=(i == 0)
                )
                samples.append(sec)
            else:
                purge()
                rw = rewarms.get(name)
                if rw is not None:
                    rw()
                spark.sparkContext.setJobDescription(f"timeq:{name}#{i}")
                t0 = time.perf_counter()
                bench._force(qfns[name](spark, SF_DIR))
                samples.append(time.perf_counter() - t0)
                spark.sparkContext.setJobDescription(None)
            print(
                f"timeq: {name} rep {i}: {samples[-1]:.3f}s", file=sys.stderr
            )
        out[name] = {
            "samples": [round(s, 3) for s in samples],
            "min": round(min(samples), 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
