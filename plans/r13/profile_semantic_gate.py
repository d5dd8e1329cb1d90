"""Phase profile of IncrementalSemanticDeduper.process_batch at the
steady-lane shape (10k-vector triggers, 16 centroids, duplicate-heavy
replicas — exactly bench_stream_dedup_sink_steady's semantic workload).

Times each phase with the same frames process_batch builds, so the
numbers attribute the per-trigger cost WITHOUT changing the gate.
Run:  python plans/r13/profile_semantic_gate.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from streamy_db_spark.operators.incremental import (
        IncrementalSemanticDeduper,
    )
    from streamy_db_spark.operators.similarity import ivf_train_centroids
    from streamy_db_spark.session import get_spark

    spark = get_spark("profile_semantic_gate")
    base = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    centroids = ivf_train_centroids(base, n_clusters=16)

    copies = 25
    parts = []
    for i in range(copies):
        parts.append(
            base.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
        )
    full = parts[0]
    for p in parts[1:]:
        full = full.unionByName(p)
    rows = full.collect()  # 50k small rows: deterministic trigger slices
    print(f"total rows {len(rows)}")

    tmp = tempfile.mkdtemp(prefix="prof_sem_")
    try:
        gate = IncrementalSemanticDeduper(
            spark, os.path.join(tmp, "state"), centroids=centroids
        )
        chunk = 10_000
        for b in range(5):
            batch_rows = rows[b * chunk : (b + 1) * chunk]
            docs = spark.createDataFrame(batch_rows, full.schema)

            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"b{b} full process_batch")
            out = gate.process_batch(docs, batch_id=b)
            n_out = out.count()
            t_total = time.perf_counter() - t0
            print(f"batch {b}: total {t_total:6.2f} s  accepted {n_out}")

            # phase re-run (same frames the gate builds, timed one by one)
            t = time.perf_counter()
            spark.sparkContext.setJobDescription(f"b{b} assigned")
            assigned = gate._assigned(docs).localCheckpoint(eager=True)
            t_assign = time.perf_counter() - t

            t = time.perf_counter()
            spark.sparkContext.setJobDescription(f"b{b} probe-scan prune")
            acc = gate._accepted_state_for_probe(assigned)
            t_prune = time.perf_counter() - t

            t = time.perf_counter()
            n_batch = assigned.count()
            spark.sparkContext.setJobDescription(f"b{b} block join")
            blocked = gate._state_blocked_from(acc, assigned, n_batch)
            n_blocked = 0 if blocked is None else blocked.count()
            t_block = time.perf_counter() - t

            t = time.perf_counter()
            spark.sparkContext.setJobDescription(f"b{b} greedy")
            survivors = (
                assigned
                if blocked is None
                else assigned.join(blocked, "_id", "left_anti")
            )
            accepted = (
                survivors.groupBy("cluster_id")
                .applyInPandas(
                    gate._greedy_kernel(gate.threshold),
                    "cluster_id int, _id long, _vec array<double>",
                )
                .localCheckpoint(eager=True)
            )
            n_acc = accepted.count()
            t_greedy = time.perf_counter() - t
            spark.sparkContext.setJobDescription(None)
            print(
                f"  phases: assign {t_assign:5.2f}  prune {t_prune:5.2f}  "
                f"block {t_block:5.2f} (blocked {n_blocked})  "
                f"greedy {t_greedy:5.2f} (accepted {n_acc})"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
