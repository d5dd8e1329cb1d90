"""Exactly-once foreachBatch sink: kill mid-stream, restart from the
same checkpoint, and the sink's union must equal the batch answer with
no duplicated rows."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from streamy_db_spark.streaming.sinks import idempotent_parquet_sink, read_sink
from tests.stream_kill import kill_query, start_with_retry

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
    q = start_with_retry(
        lambda: spark.readStream.schema(SCHEMA)
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
        kill_query(q)
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


DOC_SCHEMA = "doc_id long, text string"

_N1 = "the quick brown fox jumps over the lazy dog by the old river bank at dawn"
_N2 = "completely different words about spark partitions shuffles and columnar scans here"


def _write_doc_files(spark, in_dir):
    batches = [
        [(1, _N1), (2, _N2), (3, _N1.replace("dawn", "dusk"))],
        [(10, _N1.replace("quick", "swift")), (11, "totally novel text about parquet footers and row groups")],
    ]
    for f, part in enumerate(batches):
        spark.createDataFrame(part, DOC_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(in_dir, f"part{f}"))
    return batches


def test_near_dedup_sink_matches_batch_deduper(spark, tmp_path):
    """The streaming near-dedup twin must admit exactly what the batch
    IncrementalNearDeduper admits over the same batches, and a replayed
    micro-batch must leave the sink content unchanged (exactly-once by
    idempotent overwrite)."""
    from streamy_db_spark.operators.incremental import IncrementalNearDeduper
    from streamy_db_spark.streaming.sinks import near_dedup_sink

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batches = _write_doc_files(spark, in_dir)

    q = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
        .writeStream.foreachBatch(
            near_dedup_sink(spark, str(tmp_path / "state"), out_dir)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None

    got = {r.doc_id for r in read_sink(spark, out_dir).collect()}

    # batch twin over the same batches in the same order
    ref = IncrementalNearDeduper(spark, str(tmp_path / "state_batch"))
    want = set()
    for part in batches:
        want |= {
            r.doc_id
            for r in ref.process_batch(
                spark.createDataFrame(part, DOC_SCHEMA)
            ).collect()
        }
    assert got == want
    assert got == {1, 2, 11}  # pin the fixture's expected admissions

    # replay a committed micro-batch directly (discover which batch id
    # carried the first input file from the sink itself): identical sink
    # content afterwards
    import glob

    replay_bid = None
    for d in glob.glob(os.path.join(out_dir, "batch=*")):
        ids = {r.doc_id for r in spark.read.parquet(d).collect()}
        if 1 in ids:
            replay_bid = int(d.rsplit("=", 1)[1])
    assert replay_bid is not None
    sink_fn = near_dedup_sink(spark, str(tmp_path / "state"), out_dir)
    sink_fn(spark.createDataFrame(batches[0], DOC_SCHEMA), replay_bid)
    again = {r.doc_id for r in read_sink(spark, out_dir).collect()}
    assert again == got


_S1 = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens

from tests.span_model import merge_spans_model as _merge_spans  # noqa: E402


def test_substring_sink_kill_restart_union_equals_one_shot(spark, tmp_path):
    """Kill the substring sink's query after its first committed
    micro-batch, restart from the SAME checkpoint (Spark itself replays
    the in-flight batch and drains the rest), and the merged union of
    every committed span must equal one-shot duplicated_spans over all
    ingested docs — the incremental gate's equality bar holding through
    a real checkpoint-driven replay, including the retro emissions that
    cross the kill boundary.

    Non-vacuity guard (r11 review; same class as the follow-join
    deflake): a fast first query can drain EVERYTHING before stop()
    lands, leaving the restart nothing to do and the replay path
    unexercised. The observable is the RESTART's own progress —
    numInputRows > 0 across its committed batches (output-dir counts
    are incidental to Spark's internal batching and proved flaky) —
    with fresh directories per attempt until a kill genuinely lands
    mid-stream."""
    from streamy_db_spark.operators.substring import duplicated_spans
    from streamy_db_spark.streaming.sinks import (
        read_sink,
        substring_dedup_sink,
    )

    in_dir = str(tmp_path / "in")
    # duplication crosses file (= micro-batch) boundaries on purpose:
    # doc 20's copy retro-marks doc 1, which was committed before the
    # kill
    files = [
        [(1, f"intro words here {_S1} trailing one two three")],
        [(10, "nothing here repeats anywhere at all in this document")],
        [(20, f"{_S1} completely different continuation of text here")],
        [(30, f"third copy arrives {_S1} in the final file now")],
    ]
    all_rows = [r for part in files for r in part]
    for f, part in enumerate(files):
        spark.createDataFrame(part, DOC_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(in_dir, f"part{f}"))

    def start(sink, ckpt):
        return (
            spark.readStream.schema(DOC_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(in_dir)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    out_dir = None
    pre = drained = 0
    for attempt in range(4):
        out_dir = str(tmp_path / f"out{attempt}")
        ckpt = str(tmp_path / f"ckpt{attempt}")
        state = str(tmp_path / f"state{attempt}")
        with substring_dedup_sink(spark, state, out_dir, window=8) as sink:
            q = start(sink, ckpt)
            deadline = time.time() + 60
            while time.time() < deadline and not q.recentProgress:
                time.sleep(0.05)
            # kill mid-stream (checkpoint between batches); dying-query
            # errors are part of the simulated crash (tests/stream_kill.py)
            kill_query(q)
            # two-sided (r11 third review): the kill must land AFTER
            # the first query committed something — a from-scratch
            # restart exercises no replay
            pre = sum(p.numInputRows for p in q.recentProgress)
        with substring_dedup_sink(spark, state, out_dir, window=8) as sink:
            q = start_with_retry(lambda: start(sink, ckpt))
            q.awaitTermination(120)
            assert q.exception() is None
            drained = sum(p.numInputRows for p in q.recentProgress)
        if pre > 0 and drained > 0:
            break  # a real mid-stream kill: committed prefix + remainder
    assert pre > 0 and drained > 0, (
        f"no attempt produced a genuine mid-stream kill in 4 tries "
        f"(pre-kill rows {pre}, restart rows {drained}) — the "
        "checkpoint-replay path was not exercised"
    )

    got = _merge_spans(
        (r.doc_id, r.start_tok, r.end_tok)
        for r in read_sink(spark, out_dir).collect()
    )
    one_shot = {
        (r.doc_id, r.start_tok, r.end_tok)
        for r in duplicated_spans(
            spark.createDataFrame(all_rows, DOC_SCHEMA), window=8
        ).collect()
    }
    assert one_shot  # three copies of _S1 planted — non-vacuous
    assert got == one_shot


def test_start_query_with_retry_only_retries_transient_races():
    """r12 advice: a deterministic start failure (bad checkpoint,
    analysis error) must surface on FIRST sight — only the known
    restart-after-kill races ('already active', checkpoint lock) are
    worth the retry loop."""
    import pytest

    from streamy_db_spark.streaming.replay_loop import start_query_with_retry

    calls = {"n": 0}

    def deterministic():
        calls["n"] += 1
        raise ValueError("Path does not exist: /no/such/checkpoint")

    with pytest.raises(ValueError):
        start_query_with_retry(deterministic, attempts=5, delay_s=0.01)
    assert calls["n"] == 1  # no blind retries

    calls["n"] = 0

    def transient_then_ok():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError(
                "Cannot start query with id x as another instance of this "
                "query is already active"
            )
        return "query"

    assert (
        start_query_with_retry(transient_then_ok, attempts=5, delay_s=0.01)
        == "query"
    )
    assert calls["n"] == 3

    calls["n"] = 0

    def always_transient():
        calls["n"] += 1
        raise RuntimeError("already active")

    with pytest.raises(RuntimeError, match="already active"):
        start_query_with_retry(always_transient, attempts=3, delay_s=0.01)
    assert calls["n"] == 3  # exhausted, last error re-raised
