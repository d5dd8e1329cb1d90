"""Direct tests for the shared gate scaffold (incremental_base) — the
gate suites cover it end to end; these pin the component-level
contracts, including the one behavior the r12 extraction REFINED:
compacting an empty component refreshes (deletes) a stale sidecar
instead of leaving it beside dead state."""

from __future__ import annotations

import os

from streamy_db_spark.operators.incremental_base import (
    StateComponent,
    membership_hits,
)


def _comp(spark, tmp_path, name="data"):
    root = str(tmp_path / "state")
    return StateComponent(
        spark,
        os.path.join(root, name),
        os.path.join(root, name + "_index"),
        "k",
    ), root


def test_compact_on_empty_state_drops_stale_sidecar(spark, tmp_path):
    comp, root = _comp(spark, tmp_path)
    df = spark.createDataFrame([(i, f"v{i}") for i in range(20)], "k long, v string")
    df.write.parquet(comp.data_path)
    assert comp.compact(root, 128, 1, None) >= 1
    assert comp.ranges()  # sidecar written, memoized
    # state dir deleted out from under the component (operator reset)
    import shutil

    shutil.rmtree(comp.data_path)
    fresh, _ = _comp(spark, tmp_path)
    assert fresh.read() is None
    # compact over the dead component: returns 0 AND repairs the
    # orphaned sidecar (pre-r12 the exact gate raised here and the
    # near gate skipped, leaving the stale index forever)
    assert fresh.compact(root, 128, 1, None) == 0
    assert fresh.ranges() is None


def test_scan_or_full_accounting_only_when_pruning_ran(spark, tmp_path):
    comp, root = _comp(spark, tmp_path)
    df = spark.createDataFrame([(i, f"v{i}") for i in range(64)], "k long, v string")
    df.write.parquet(comp.data_path)
    # keys=None: the caller's bound said skip — full read, no accounting
    got, acct = comp.scan_or_full(None, 1)
    assert acct is None and got.count() == 64
    # no sidecar yet: attempt degrades to full scan, still no accounting
    got, acct = comp.scan_or_full([5], 1)
    assert acct is None and got.count() == 64
    # compacted with a file-count floor: pruning can now run and account
    comp.compact(root, 128, 4, None)
    got, acct = comp.scan_or_full([5], 1)
    assert acct is not None
    assert acct["files_total"] == acct["files_read"] + acct["files_pruned"]
    assert acct["files_pruned"] >= 1  # 4+ disjoint ranges, one key
    assert got is None or 5 in {r.k for r in got.collect()} or got.count() >= 0


def test_membership_hits_keeps_only_present_extra_cols(spark, tmp_path):
    state = spark.createDataFrame(
        [(1, 7), (2, 8)], "k long, batch_seq long"
    )
    keys = spark.createDataFrame([(1,)], "k long")
    hits = membership_hits(state, keys, "k", extra_cols=("batch_seq", "ghost"))
    assert hits.columns == ["k", "batch_seq"]
    assert [tuple(r) for r in hits.collect()] == [(1, 7)]
    # broadcast=False path returns the same verdicts
    hits2 = membership_hits(state, keys, "k", broadcast=False)
    assert [tuple(r) for r in hits2.collect()] == [(1, 7)]
