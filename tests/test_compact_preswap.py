"""compact_state vs live-stream race, second line of defense (r9 second
review): the idle-released lifetime heartbeat makes 'stale at entry,
live at swap' reachable — a data-quiet stream lapses, a scheduled
compaction passes the entry guard, and the stream's next batch lands
mid-rewrite. The fix: the heartbeat guard re-runs immediately BEFORE
the write-then-swap's first rename (compact_parquet pre_swap_check), so
a stream that came alive during the minutes-long rewrite aborts the
swap with the original state untouched. Also: a LAPSED lifetime keeper
must exit its thread (py4j pins inline sinks for the driver's life —
an idle-looping keeper is a leaked thread per started stream) and
restart on the next batch."""

from __future__ import annotations

import time as _t

import pytest

from pyspark.sql import functions as F  # noqa: F401  (parity with suite style)

from streamy_db_spark.operators.incremental import IncrementalDeduper
from streamy_db_spark.sources.files import compact_parquet


def _write(spark, path: str, n: int = 20) -> None:
    spark.range(n).withColumnRenamed("id", "doc_id").write.mode(
        "overwrite"
    ).parquet(path)


def test_compact_parquet_pre_swap_abort_leaves_original(spark, tmp_path):
    path = str(tmp_path / "t")
    _write(spark, path)

    def boom() -> None:
        raise RuntimeError("stream came alive mid-rewrite")

    with pytest.raises(RuntimeError, match="came alive"):
        compact_parquet(spark, path, pre_swap_check=boom)
    # original untouched; the orphaned .__compact__ temp self-heals on
    # the next run, which (check passing) compacts normally
    assert spark.read.parquet(path).count() == 20
    assert compact_parquet(spark, path) >= 1
    assert spark.read.parquet(path).count() == 20


def test_compact_state_rechecks_heartbeat_before_swap(
    spark, tmp_path, monkeypatch
):
    """The gates wire the heartbeat guard in as pre_swap_check: passes
    at entry, raises at the pre-swap re-check ⇒ compaction aborts and
    the state stays fully usable. (The guard lives in incremental_base
    since the r12 scaffold extraction — patch it where compact_guard
    resolves it.)"""
    import streamy_db_spark.operators.incremental_base as inc

    d = IncrementalDeduper(spark, str(tmp_path / "state"))
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    assert d.process_batch(docs, batch_id=0).count() == 2

    calls = {"n": 0}
    real = inc._guard_compact_vs_stream

    def guard(spark_, path_, force_, age_):
        calls["n"] += 1
        if calls["n"] >= 2:  # entry passed; the stream woke mid-rewrite
            raise RuntimeError("compact_state refused: heartbeat fresh")
        return real(spark_, path_, force_, age_)

    monkeypatch.setattr(inc, "_guard_compact_vs_stream", guard)
    with pytest.raises(RuntimeError, match="refused"):
        d.compact_state()
    assert calls["n"] == 2  # the re-check actually ran pre-swap
    monkeypatch.undo()

    # state intact: membership verdicts unchanged, compaction now clean
    out = d.process_batch(
        spark.createDataFrame(
            [(1, "alpha beta"), (3, "epsilon zeta")], "doc_id long, text string"
        ),
        batch_id=1,
    )
    assert {r.doc_id for r in out.collect()} == {3}
    assert d.compact_state() >= 1


def test_sink_lapsed_keeper_exits_thread_and_restarts(spark, tmp_path):
    """A lapsed lifetime keeper EXITS its thread (no leak for py4j-pinned
    sinks) and the next batch starts a fresh one; close() stops that
    one too."""
    from streamy_db_spark.streaming.sinks import near_dedup_sink

    sink = near_dedup_sink(
        spark,
        str(tmp_path / "state"),
        str(tmp_path / "out"),
        heartbeat_interval_s=0.05,
        idle_release_s=0.2,
    )
    try:
        docs = spark.createDataFrame(
            [(1, "some words here"), (2, "other words there")],
            "doc_id long, text string",
        )
        sink(docs, 0)
        t0 = sink._beat_thread
        assert t0 is not None and t0.is_alive()
        deadline = _t.monotonic() + 10
        while t0.is_alive() and _t.monotonic() < deadline:
            _t.sleep(0.05)
        assert not t0.is_alive()  # lapsed ⇒ exited, not idle-looping

        sink(
            spark.createDataFrame(
                [(5, "fresh unrelated words")], "doc_id long, text string"
            ),
            1,
        )
        t1 = sink._beat_thread
        assert t1 is not t0 and t1.is_alive()  # ownership resumed
    finally:
        sink.close()
    deadline = _t.monotonic() + 10
    while sink._beat_thread.is_alive() and _t.monotonic() < deadline:
        _t.sleep(0.05)
    assert not sink._beat_thread.is_alive()  # close stops the restart too
