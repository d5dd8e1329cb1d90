"""Incremental dedup: batch-over-batch membership must equal one-shot
exact dedup over the concatenated corpus, and crash-replayed batches
must not change verdicts."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamy_db_spark.operators.dedup import dedupe_exact
from streamy_db_spark.operators.incremental import IncrementalDeduper


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


B1 = [
    (1, "alpha beta gamma"),
    (2, "delta epsilon zeta"),
    (3, "alpha  beta\tgamma "),  # whitespace-variant dup of 1 (in-batch)
]
B2 = [
    (10, "delta epsilon zeta"),  # cross-batch dup of 2
    (11, "eta theta iota"),
    (12, "eta theta iota"),  # in-batch dup of 11
]


def test_incremental_equals_one_shot(spark, tmp_path):
    d = IncrementalDeduper(spark, str(tmp_path / "state"))
    kept1 = {r.doc_id for r in d.process_batch(_docs(spark, B1)).collect()}
    kept2 = {r.doc_id for r in d.process_batch(_docs(spark, B2)).collect()}
    assert kept1 == {1, 2}
    assert kept2 == {11}

    one_shot = {
        r.doc_id for r in dedupe_exact(_docs(spark, B1 + B2)).collect()
    }
    assert kept1 | kept2 == one_shot
    assert d.seen_count() == 3


def test_replayed_batch_is_idempotent(spark, tmp_path):
    d = IncrementalDeduper(spark, str(tmp_path / "state"))
    first = {r.doc_id for r in d.process_batch(_docs(spark, B1)).collect()}
    assert first == {1, 2}
    # crash-replay contract (r6): the state append may have committed
    # while the caller never consumed the output — re-running the batch
    # must RE-EMIT the originally accepted rows (matched by
    # fingerprint+id), not return empty and strand them; later batches
    # are unaffected
    again = {r.doc_id for r in d.process_batch(_docs(spark, B1)).collect()}
    assert again == first
    kept2 = {r.doc_id for r in d.process_batch(_docs(spark, B2)).collect()}
    assert kept2 == {11}


def test_resent_content_under_new_id_stays_rejected(spark, tmp_path):
    # re-emit keys on (fingerprint, id): the same content arriving
    # under a DIFFERENT id is a duplicate, not a replay
    d = IncrementalDeduper(spark, str(tmp_path / "state"))
    d.process_batch(_docs(spark, B1))
    out = d.process_batch(_docs(spark, [(99, "alpha beta gamma")])).collect()
    assert out == []


def test_accepted_rows_keep_schema(spark, tmp_path):
    d = IncrementalDeduper(spark, str(tmp_path / "state"))
    out = d.process_batch(_docs(spark, B1))
    assert out.columns == ["doc_id", "text"]


def test_first_batch_with_empty_state_dir(spark, tmp_path):
    # an existing-but-empty dir (e.g. mkdir'd by an orchestrator) must
    # behave like no state
    p = tmp_path / "state"
    p.mkdir()
    d = IncrementalDeduper(spark, str(p))
    assert {r.doc_id for r in d.process_batch(_docs(spark, B1)).collect()} == {1, 2}


def test_corrupt_state_raises_not_readmits(spark, tmp_path):
    # a state dir that EXISTS but cannot be read must raise — treating
    # it as "first batch" would silently re-admit every duplicate and
    # append dupe fingerprints (ADVICE r5, incremental.py:_seen)
    import pytest

    p = tmp_path / "state"
    d = IncrementalDeduper(spark, str(p))
    d.process_batch(_docs(spark, B1))
    # corrupt every state file in place
    for f in p.glob("*.parquet"):
        f.write_bytes(b"not a parquet file")
    with pytest.raises(Exception) as exc_info:
        d.process_batch(_docs(spark, B2))
    assert "first batch" not in str(exc_info.value)


def test_compact_state_preserves_verdicts(spark, tmp_path):
    # many small appended batches -> compact -> same membership verdicts
    p = tmp_path / "state"
    d = IncrementalDeduper(spark, str(p))
    for k in range(6):
        d.process_batch(
            _docs(spark, [(100 * k + i, f"doc {k} {i} body") for i in range(3)])
        )
    before_files = len(list(p.glob("*.parquet")))
    assert before_files >= 6  # one commit (>=1 file) per batch
    seen_before = d.seen_count()

    n = d.compact_state()
    after_files = len(list(p.glob("*.parquet")))
    assert after_files == n < before_files
    assert d.seen_count() == seen_before

    # replay of an old batch still rejects everything; novel still admits
    assert d.process_batch(
        _docs(spark, [(999, "doc 0 0 body"), (1000, "genuinely new body")])
    ).collect()[0].doc_id == 1000


def test_batch_id_drops_recrawled_doc(spark, tmp_path):
    """With batch ids, an unchanged doc re-sent in a LATER batch (the
    daily-recrawl case) is dropped — only a crash-replay of the SAME
    batch re-emits (r6 review)."""
    d = IncrementalDeduper(spark, str(tmp_path / "state"))
    first = {
        r.doc_id for r in d.process_batch(_docs(spark, B1), batch_id=0).collect()
    }
    assert first == {1, 2}
    # crash-replay of batch 0 reproduces its output
    again = {
        r.doc_id for r in d.process_batch(_docs(spark, B1), batch_id=0).collect()
    }
    assert again == first
    # batch 5 re-crawls doc 1 unchanged alongside novel content
    out = {
        r.doc_id
        for r in d.process_batch(
            _docs(spark, [(1, "alpha beta gamma"), (50, "novel words here")]),
            batch_id=5,
        ).collect()
    }
    assert out == {50}


def test_output_survives_state_compaction(spark, tmp_path):
    """The returned DataFrame must not lazily re-read the state files —
    compact_state renames them away (r6 review)."""
    d = IncrementalDeduper(spark, str(tmp_path / "state"))
    d.process_batch(_docs(spark, B1))
    out = d.process_batch(_docs(spark, B1))  # replay: depends on state read
    d.compact_state()
    assert {r.doc_id for r in out.collect()} == {1, 2}


def test_empty_batch_is_noop(spark, tmp_path):
    """Empty micro-batch: empty output, state unchanged, later batches
    unaffected (same contract as the near-dup twin)."""
    from streamy_db_spark.operators.incremental import IncrementalDeduper

    d = IncrementalDeduper(spark, str(tmp_path / "state"))
    docs = spark.createDataFrame(
        [(1, "some document text here")], "doc_id long, text string"
    )
    assert d.process_batch(docs, batch_id=0).count() == 1
    before = d.seen_count()
    empty = docs.limit(0)
    assert d.process_batch(empty, batch_id=1).count() == 0
    assert d.seen_count() == before
    out = d.process_batch(
        spark.createDataFrame(
            [(1, "some document text here"), (2, "brand new content")],
            "doc_id long, text string",
        ),
        batch_id=2,
    )
    assert {r.doc_id for r in out.collect()} == {2}


def test_probe_hits_no_exchange_on_state_side(spark, tmp_path):
    """THE 100 TB shape of the exact gate (the near gate's r8 v2
    discipline): the per-batch membership probe streams the state scan
    through a hash join against the BROADCAST batch fingerprints — no
    Exchange anywhere in the probe stage, so state traffic per
    micro-batch is a scan, never a shuffle. (The v1 form distinct'd and
    anti-joined the ENTIRE seen-set each batch — a full-state exchange
    per micro-batch at 1B accepted docs.)"""
    from streamy_db_spark.operators.dedup import (
        dedupe_exact as _de,
        fingerprint_documents,
    )
    from streamy_db_spark.plans.inspect import executed_plan

    d = IncrementalDeduper(spark, str(tmp_path / "state"))
    d.process_batch(_docs(spark, B1), batch_id=0)
    fp = fingerprint_documents(_de(_docs(spark, B2))).localCheckpoint(
        eager=True
    )
    hits = d._probe_hits(fp, n_batch_docs=3)
    assert hits is not None
    plan = executed_plan(hits)
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_probe_falls_back_to_shuffle_join_above_broadcast_cap(
    spark, tmp_path
):
    """Batches above broadcast_batch_max_docs (backfill shape) take the
    shuffle join — same verdicts, different physical plan."""
    from streamy_db_spark.operators.dedup import (
        dedupe_exact as _de,
        fingerprint_documents,
    )
    from streamy_db_spark.plans.inspect import executed_plan

    d = IncrementalDeduper(
        spark, str(tmp_path / "state"), broadcast_batch_max_docs=0
    )
    assert {
        r.doc_id for r in d.process_batch(_docs(spark, B1), batch_id=0).collect()
    } == {1, 2}
    fp = fingerprint_documents(_de(_docs(spark, B2))).localCheckpoint(
        eager=True
    )
    # at test scale Spark would auto-broadcast either side; disable so
    # the plan shows the real backfill-scale fallback
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = executed_plan(d._probe_hits(fp, n_batch_docs=3))
        assert "Exchange hashpartitioning" in plan  # documented fallback
        hinted = executed_plan(
            IncrementalDeduper(spark, d.state_path)._probe_hits(
                fp, n_batch_docs=3
            )
        )
        assert "BroadcastHashJoin" in hinted  # hint overrides threshold
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # verdicts identical under the fallback plan
    out = {
        r.doc_id for r in d.process_batch(_docs(spark, B2), batch_id=1).collect()
    }
    assert out == {11}


def test_exact_probe_prunes_state_files_with_verdict_parity(spark, tmp_path):
    """compact_state clusters the state on fingerprint and persists a
    file-range sidecar; a small batch's probe then reads only the files
    whose range can hold one of its fingerprints (last_probe_scan
    accounting), with verdicts identical to the full-scan gate."""
    path = str(tmp_path / "state")
    d = IncrementalDeduper(spark, path)
    rows = [(i, f"doc number {i} unique content {i * 7}") for i in range(40)]
    d.process_batch(_docs(spark, rows), batch_id=0)
    d.compact_state(min_files=8, force=True)

    batch = [(100, rows[5][1]), (101, "totally new content xyz")]
    out = {
        r.doc_id
        for r in d.process_batch(_docs(spark, batch), batch_id=1).collect()
    }
    assert out == {101}  # 100 is a cross-batch dup of doc 5
    assert d.last_probe_scan is not None
    assert d.last_probe_scan["files_total"] >= 8
    assert d.last_probe_scan["files_read"] >= 1
    assert d.last_probe_scan["files_pruned"] >= 1  # 2 keys vs ≥8 ranges

    # full-scan reference gate (pruning disabled) reaches the same
    # verdicts on the replay of the SAME batch, and records no scan
    ref = IncrementalDeduper(spark, path, prune_max_docs=0)
    out2 = {
        r.doc_id
        for r in ref.process_batch(_docs(spark, batch), batch_id=1).collect()
    }
    assert out2 == {101}
    assert ref.last_probe_scan is None

    # the pruned gate replays identically too (its memoized index is
    # still valid — the appends since compaction are unindexed and
    # therefore always read)
    out3 = {
        r.doc_id
        for r in d.process_batch(_docs(spark, batch), batch_id=1).collect()
    }
    assert out3 == {101}


def test_empty_trigger_resets_probe_accounting(spark, tmp_path):
    """An empty trigger after a pruned batch must not leave the prior
    batch's file accounting attributed to a batch that read nothing
    (the r9 rule the near/substr gates follow)."""
    path = str(tmp_path / "state")
    d = IncrementalDeduper(spark, path)
    rows = [(i, f"doc number {i} unique content {i * 7}") for i in range(40)]
    d.process_batch(_docs(spark, rows), batch_id=0)
    d.compact_state(min_files=8, force=True)
    d.process_batch(_docs(spark, [(100, rows[3][1])]), batch_id=1)
    assert d.last_probe_scan is not None
    d.process_batch(_docs(spark, []), batch_id=2)
    assert d.last_probe_scan is None
