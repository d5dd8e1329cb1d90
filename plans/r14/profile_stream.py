#!/usr/bin/env python
"""Per-phase profile of the availableNow streaming replay (r14 item 1:
the protocol_stream_10k lane's per-round query start/stop tax).

Replicates bench_protocol_stream's setup (RocksDB + changelog, 8 state
partitions, 1 h watermark, scale_bench fixture) but times each round's
key-stage run, txn-stage run, and done-poll separately.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[2])
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from streamy_db_spark import fixtures
    from streamy_db_spark.session import get_spark
    from streamy_db_spark.streaming import replay_loop as rl
    from streamy_db_spark.streaming import engine_stream as es

    spark = get_spark("profile-stream")
    spark.sparkContext.setLogLevel("ERROR")

    import shutil
    import tempfile

    txns = fixtures.generate("scale_bench")
    n = len({t["transaction_id"] for t in txns})
    tmp = tempfile.mkdtemp(prefix="profile_stream_")
    t_all0 = time.perf_counter()
    phases: list[tuple[str, float]] = []

    def mark(name, t0):
        dt = time.perf_counter() - t0
        phases.append((name, dt))
        print(f"  {name}: {dt:.2f}s", flush=True)
        return time.perf_counter()

    try:
        with rl.with_rocksdb(spark):
            with rl._conf_override(
                spark, {"spark.sql.shuffle.partitions": "8"}
            ):
                t0 = time.perf_counter()
                d, requests_dir, n_txns = rl._loop_dirs(spark, txns, tmp)
                t0 = mark("setup(_loop_dirs)", t0)

                def _await(q):
                    q.awaitTermination(120)
                    if q.isActive:
                        raise RuntimeError("query did not finish")
                    exc = q.exception()
                    if exc is not None:
                        raise RuntimeError(f"query failed: {exc}")

                for rnd in range(30):
                    rl.write_heartbeat(spark, requests_dir, rnd)
                    t0 = time.perf_counter()
                    key_df = rl._key_stage_stream(
                        spark, d, requests_dir, "1 hour", None
                    )
                    q = rl.start_query_with_retry(
                        lambda: key_df.writeStream.format("parquet")
                        .option("path", d["read_results"])
                        .option(
                            "checkpointLocation",
                            os.path.join(d["ckpt"], "key_stage"),
                        )
                        .trigger(availableNow=True)
                        .start()
                    )
                    t_start = time.perf_counter() - t0
                    _await(q)
                    t0 = mark(
                        f"r{rnd} key (start {t_start:.2f})", t0
                    )
                    q = rl.start_query_with_retry(
                        lambda: rl._txn_stage_stream(spark, d)
                        .writeStream.foreachBatch(rl._txn_fused_write(d))
                        .option(
                            "checkpointLocation",
                            os.path.join(d["ckpt"], "txn_stage"),
                        )
                        .trigger(availableNow=True)
                        .start()
                    )
                    _await(q)
                    t0 = mark(f"r{rnd} txn", t0)

                    raw = rl._raw_result_rows(d["results"])
                    if raw is not None and raw < n_txns:
                        t0 = mark(f"r{rnd} poll(raw={raw})", t0)
                        continue
                    n_done = (
                        spark.read.schema(es.TXN_RESULT_OUT)
                        .option("recursiveFileLookup", "true")
                        .parquet(d["results"])
                        .select("transaction_id")
                        .distinct()
                        .count()
                    )
                    t0 = mark(f"r{rnd} poll(done={n_done})", t0)
                    if n_done >= n_txns:
                        print(f"done after round {rnd + 1}")
                        break
                verdicts = rl._collect_verdicts(spark, d)
                print("verdicts:", len(verdicts), "of", n)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    total = time.perf_counter() - t_all0
    print(f"TOTAL {total:.2f}s")
    key_t = sum(v for k, v in phases if " key" in k)
    txn_t = sum(v for k, v in phases if " txn" in k)
    poll_t = sum(v for k, v in phases if " poll" in k)
    print(
        f"sum: key={key_t:.1f}s txn={txn_t:.1f}s poll={poll_t:.1f}s "
        f"setup={phases[0][1]:.1f}s"
    )


if __name__ == "__main__":
    main()
