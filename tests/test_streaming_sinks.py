"""Exactly-once foreachBatch sink: kill mid-stream, restart from the
same checkpoint, and the sink's union must equal the batch answer with
no duplicated rows."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from streamy_db_spark.streaming.sinks import idempotent_parquet_sink, read_sink

SCHEMA = "k long, v string"


def _write_input_files(spark, in_dir: str, n_files: int = 4, rows_per: int = 5):
    rows = []
    for f in range(n_files):
        part = [(f * rows_per + i, f"v{f * rows_per + i}") for i in range(rows_per)]
        rows.extend(part)
        spark.createDataFrame(part, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(in_dir, f"part{f}"))
    return rows


def _run(spark, in_dir, out_dir, ckpt, stop_after_first_commit: bool):
    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
        .withColumn("v2", F.concat(F.col("v"), F.lit("!")))
        .writeStream.foreachBatch(idempotent_parquet_sink(out_dir))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if stop_after_first_commit:
        deadline = time.time() + 60
        while time.time() < deadline and not q.recentProgress:
            time.sleep(0.2)
        q.stop()
        q.awaitTermination(60)
    else:
        q.awaitTermination(120)
        assert q.exception() is None


def test_sink_survives_kill_and_restart_without_duplicates(spark, tmp_path):
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    rows = _write_input_files(spark, in_dir)

    # round 1: throttled to one file per micro-batch, killed after the
    # first commit lands (sink output exists, stream unfinished)
    _run(spark, in_dir, out_dir, ckpt, stop_after_first_commit=True)
    partial = read_sink(spark, out_dir).count()
    assert partial >= 1  # something was committed before the kill

    # round 2: same checkpoint — replayed/remaining batches drain
    _run(spark, in_dir, out_dir, ckpt, stop_after_first_commit=False)

    got = sorted(
        (r.k, r.v, r.v2) for r in read_sink(spark, out_dir).collect()
    )
    expect = sorted((k, v, v + "!") for k, v in rows)
    assert got == expect  # exactly once: no loss, no duplicates


def test_read_sink_before_first_commit_is_empty(spark, tmp_path):
    # polling a sink with zero committed batches must yield an empty
    # DataFrame, not an unable-to-infer-schema error (ADVICE r5)
    out = str(tmp_path / "sink_out")
    assert read_sink(spark, out).count() == 0
    typed = read_sink(spark, out, schema="k long, v string")
    assert typed.count() == 0
    assert typed.columns == ["k", "v"]
