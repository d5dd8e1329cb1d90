"""IncrementalSubstrDeduper (operators/incremental_substring.py): the
batch-over-batch ExactSubstr gate. Contracts under test — the family's
equality bar (merged union of per-batch emissions equals one-shot
duplicated_spans over the concatenated corpus, RETRO spans included),
crash-replay idempotence (identical spans, no state growth), re-send
drop (a re-sent doc must not duplicate itself into a false span),
append-prefix crash recovery, file-pruned state probes with identical
verdicts, the no-state-shuffle plan gate, and the streaming
substring_dedup_sink plumbing."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from streamy_db_spark.operators.incremental_substring import (
    IncrementalSubstrDeduper,
)
from streamy_db_spark.operators.substring import duplicated_spans

W = 8
SHARED = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
SHARED2 = "one two three four five six seven eight"  # 8 tokens


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spans(df) -> set:
    return {(r.doc_id, r.start_tok, r.end_tok) for r in df.collect()}


# the family's equality bar compares MERGED UNIONS — one shared
# independent model of the merge rule (tests/span_model.py)
from tests.span_model import merge_spans_model as _merge  # noqa: E402


def _ingest(spark, state, batches, **kw) -> set:
    d = IncrementalSubstrDeduper(spark, state, window=W, **kw)
    emitted: set = set()
    for i, rows in enumerate(batches):
        emitted |= _spans(d.process_batch(_docs(spark, rows), batch_id=i))
    return emitted


CORPUS = [
    (1, f"intro words here {SHARED} trailing one two three"),
    (2, f"{SHARED} completely different continuation of text here"),
    (3, "nothing in this document repeats anywhere at all truly unique"),
    (4, "short doc"),
    (5, f"prefix tokens {SHARED2} and then some more after that"),
    (6, f"{SHARED2} starts this document then diverges completely here now"),
    (7, f"both passages here {SHARED} and also {SHARED2} appear together"),
]


@pytest.mark.parametrize(
    "split",
    [
        [[0, 1, 2, 3, 4, 5, 6]],  # one batch = one-shot directly
        [[0], [1], [2], [3], [4], [5], [6]],  # one doc per batch
        [[0, 2, 4], [1, 3, 5], [6]],  # duplicates land across batches
        [[6], [0, 1], [2, 3, 4, 5]],  # the bridge doc arrives FIRST
    ],
)
def test_union_of_emissions_equals_one_shot(spark, tmp_path, split):
    """The family's equality bar: merging the union of all per-batch
    emissions per doc equals one-shot duplicated_spans over the
    concatenated corpus — regardless of how ingestion is batched
    (retro emissions cover every ordering)."""
    batches = [[CORPUS[i] for i in idxs] for idxs in split]
    emitted = _ingest(spark, str(tmp_path / "state"), batches)
    one_shot = _spans(duplicated_spans(_docs(spark, CORPUS), window=W))
    assert _merge(emitted) == one_shot


def test_retro_span_emitted_when_second_copy_arrives(spark, tmp_path):
    """Doc 1's passage becomes duplicated only when doc 2 lands — batch
    1 must emit BOTH doc 2's span and doc 1's retroactive span."""
    d = IncrementalSubstrDeduper(spark, str(tmp_path / "s"), window=W)
    b0 = d.process_batch(_docs(spark, [CORPUS[0], CORPUS[2]]), batch_id=0)
    assert _spans(b0) == set()  # nothing duplicated yet
    b1 = d.process_batch(_docs(spark, [CORPUS[1]]), batch_id=1)
    assert _spans(b1) == {(1, 3, 10), (2, 0, 7)}  # retro for doc 1


def test_third_copy_emits_only_its_own_span(spark, tmp_path):
    """Once a hash is in dup/, a later copy emits ITS occurrences only
    — the earlier docs' spans were already emitted exactly once."""
    d = IncrementalSubstrDeduper(spark, str(tmp_path / "s"), window=W)
    d.process_batch(_docs(spark, [CORPUS[0]]), batch_id=0)
    d.process_batch(_docs(spark, [CORPUS[1]]), batch_id=1)
    third = [(9, f"a third copy arrives {SHARED} right here in this doc")]
    b2 = d.process_batch(_docs(spark, third), batch_id=2)
    assert _spans(b2) == {(9, 4, 11)}


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """Crash-replay of the SAME batch_id re-emits identical spans
    (retro spans included) and appends nothing — state row counts are
    unchanged, so unbounded replays cannot grow state."""
    state = str(tmp_path / "s")
    d = IncrementalSubstrDeduper(spark, state, window=W)
    d.process_batch(_docs(spark, [CORPUS[0], CORPUS[4]]), batch_id=0)
    first = _spans(d.process_batch(_docs(spark, [CORPUS[1], CORPUS[5]]), batch_id=1))
    assert first  # includes retro spans for docs 1 and 5

    def _rows(sub):
        return spark.read.option("mergeSchema", "true").parquet(
            f"{state}/{sub}"
        ).count()

    before = (_rows("ids"), _rows("wins"), _rows("dup"))
    replay = _spans(d.process_batch(_docs(spark, [CORPUS[1], CORPUS[5]]), batch_id=1))
    assert replay == first
    assert (_rows("ids"), _rows("wins"), _rows("dup")) == before
    # a fresh instance over the same state replays identically too
    d2 = IncrementalSubstrDeduper(spark, state, window=W)
    assert _spans(
        d2.process_batch(_docs(spark, [CORPUS[1], CORPUS[5]]), batch_id=1)
    ) == first


def test_resend_in_later_batch_is_dropped(spark, tmp_path):
    """A re-sent doc must NOT pair with its own state rows (that would
    fabricate duplication): the re-send is dropped, emits nothing, and
    appends nothing."""
    state = str(tmp_path / "s")
    d = IncrementalSubstrDeduper(spark, state, window=W)
    d.process_batch(_docs(spark, [CORPUS[0], CORPUS[2]]), batch_id=0)
    resent = _spans(d.process_batch(_docs(spark, [CORPUS[0]]), batch_id=1))
    assert resent == set()
    assert d.seen_count() == 2
    # and the doc still counts as ONE distinct doc for later arrivals:
    # the genuine second copy fires the retro emission as usual
    b2 = _spans(d.process_batch(_docs(spark, [CORPUS[1]]), batch_id=2))
    assert b2 == {(1, 3, 10), (2, 0, 7)}


def test_append_prefix_crash_recovers_identically(spark, tmp_path):
    """Crash between the wins/ append and the ids/ append: the replay
    sees the docs as novel, but the probe excludes the batch's OWN docs
    by doc_id, so the recomputed spans are identical and the duplicate
    state rows are exact-row dups that compact_state drops."""
    import shutil

    state = tmp_path / "s"
    d = IncrementalSubstrDeduper(spark, str(state), window=W)
    d.process_batch(_docs(spark, [CORPUS[0]]), batch_id=0)

    # control: a clean run of batch 1 on a COPY of the state
    ctrl_state = tmp_path / "ctrl"
    shutil.copytree(state, ctrl_state)
    ctrl = _spans(
        IncrementalSubstrDeduper(spark, str(ctrl_state), window=W).process_batch(
            _docs(spark, [CORPUS[1], CORPUS[4]]), batch_id=1
        )
    )

    # simulate the crash: batch 1's wins landed (batch_seq=1), ids did not
    from streamy_db_spark.operators.substring import _window_hashes

    _window_hashes(_docs(spark, [CORPUS[1], CORPUS[4]]), W, "doc_id").select(
        "h", F.col("_id").alias("doc_id"), "pos",
        F.lit(1).cast("long").alias("batch_seq"),
    ).write.mode("append").parquet(str(state / "wins"))

    got = _spans(
        d.process_batch(_docs(spark, [CORPUS[1], CORPUS[4]]), batch_id=1)
    )
    assert got == ctrl
    d.compact_state(force=True)
    # post-compaction the duplicate rows are gone and verdicts persist
    b2 = _spans(d.process_batch(_docs(spark, [CORPUS[6]]), batch_id=2))
    assert b2 == _spans(
        IncrementalSubstrDeduper(spark, str(ctrl_state), window=W).process_batch(
            _docs(spark, [CORPUS[6]]), batch_id=2
        )
    )


def test_compact_state_preserves_spans(spark, tmp_path):
    """Compaction (re-cluster on h + exact-row dedupe + index write)
    must not change any later verdict."""
    state, ref = str(tmp_path / "s"), str(tmp_path / "ref")
    a = IncrementalSubstrDeduper(spark, state, window=W)
    b = IncrementalSubstrDeduper(spark, ref, window=W)
    for i, rows in enumerate([[CORPUS[0], CORPUS[4]], [CORPUS[2], CORPUS[3]]]):
        a.process_batch(_docs(spark, rows), batch_id=i)
        b.process_batch(_docs(spark, rows), batch_id=i)
    assert a.compact_state(force=True) >= 1
    nxt = [CORPUS[1], CORPUS[5], CORPUS[6]]
    sa = _spans(a.process_batch(_docs(spark, nxt), batch_id=2))
    sb = _spans(b.process_batch(_docs(spark, nxt), batch_id=2))
    assert sa == sb and sa


def test_probe_prunes_files_and_matches_unpruned(spark, tmp_path):
    """On a compacted multi-file wins/ state, a small probe batch reads
    a strict subset of files (the r8/r9 discipline shared with the
    near-dedup bands/ probe) and the spans equal the unpruned gate's."""
    state, ref = str(tmp_path / "s"), str(tmp_path / "ref")
    base = [
        (i, f"document number {i} talks about unique subject {i} with "
            f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i} eta{i}")
        for i in range(100, 140)  # ids disjoint from CORPUS's 1..7
    ] + [CORPUS[0]]
    d = IncrementalSubstrDeduper(spark, state, window=W)
    d.process_batch(_docs(spark, base), batch_id=0)
    d.compact_state(force=True, wins_min_files=8)

    probe = [CORPUS[1]]  # pairs with CORPUS[0] only
    got = _spans(d.process_batch(_docs(spark, probe), batch_id=1))
    scan = d.last_probe_scan
    assert scan is not None and "wins" in scan
    assert scan["wins"]["files_read"] < scan["wins"]["files_total"]
    assert scan["wins"]["files_pruned"] >= 1

    r = IncrementalSubstrDeduper(spark, ref, window=W, prune_max_windows=0)
    r.process_batch(_docs(spark, base), batch_id=0)
    ref_spans = _spans(r.process_batch(_docs(spark, probe), batch_id=1))
    assert r.last_probe_scan is None  # pruning disabled ⇒ no accounting
    assert got == ref_spans == {(1, 3, 10), (2, 0, 7)}


def test_probe_prior_no_exchange_on_state_side(spark, tmp_path):
    """Scale gate: the state-occurrence probe streams the wins/ scan
    through BROADCAST joins — no shuffle (Exchange hashpartitioning) of
    the state side per micro-batch."""
    from streamy_db_spark.plans.inspect import executed_plan

    state = str(tmp_path / "s")
    d = IncrementalSubstrDeduper(spark, state, window=W)
    d.process_batch(_docs(spark, CORPUS[:3]), batch_id=0)
    wins_state = d._state_scan("wins", None)
    fetch_h = spark.createDataFrame([(123,)], "h long")
    batch_ids = spark.createDataFrame([(99,)], "_id long")
    plan = executed_plan(d._probe_prior(wins_state, fetch_h, batch_ids, True))
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_empty_and_windowless_batches(spark, tmp_path):
    """Empty triggers are no-ops (no state commits); short docs
    (< window tokens) emit nothing but their ids persist so later
    re-sends drop."""
    import os

    state = tmp_path / "s"
    d = IncrementalSubstrDeduper(spark, str(state), window=W)
    out = d.process_batch(_docs(spark, []), batch_id=0)
    assert out.count() == 0
    assert not os.path.exists(state / "ids")  # nothing committed

    short = [(50, "short doc"), (51, "tiny")]
    assert d.process_batch(_docs(spark, short), batch_id=1).count() == 0
    assert d.seen_count() == 2
    assert not os.path.exists(state / "wins")  # no windows ⇒ no commit
    assert d.process_batch(_docs(spark, short), batch_id=2).count() == 0
    assert d.seen_count() == 2  # re-sends dropped


def test_min_docs_three(spark, tmp_path):
    """min_docs generalizes: with min_docs=3 the second copy emits
    nothing; the third emits ALL occurrences (both retro docs + its
    own), matching one-shot duplicated_spans(min_docs=3)."""
    rows = [
        (1, f"first copy of {SHARED} in this doc"),
        (2, f"second copy {SHARED} lands here now"),
        (3, f"third copy here {SHARED} completes it"),
    ]
    d = IncrementalSubstrDeduper(
        spark, str(tmp_path / "s"), window=W, min_docs=3
    )
    assert _spans(d.process_batch(_docs(spark, rows[:1]), batch_id=0)) == set()
    assert _spans(d.process_batch(_docs(spark, rows[1:2]), batch_id=1)) == set()
    got = _spans(d.process_batch(_docs(spark, rows[2:]), batch_id=2))
    one_shot = _spans(
        duplicated_spans(_docs(spark, rows), window=W, min_docs=3)
    )
    assert _merge(got) == one_shot and len(got) == 3


def test_substring_dedup_sink_writes_batch_dirs(spark, tmp_path):
    """The foreachBatch sink twin: spans land in batch=<id> dirs, a
    replayed call overwrites with identical content, and the state
    heartbeat is touched (compact refused while fresh)."""
    from streamy_db_spark.operators.incremental import stream_heartbeat_age_s
    from streamy_db_spark.streaming.sinks import (
        read_sink,
        substring_dedup_sink,
    )

    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    with substring_dedup_sink(spark, state, out, window=W) as sink:
        sink(_docs(spark, [CORPUS[0], CORPUS[2]]), 0)
        sink(_docs(spark, [CORPUS[1]]), 1)
        age = stream_heartbeat_age_s(spark, state)
        assert age is not None and age < 60

        got = {
            (r.doc_id, r.start_tok, r.end_tok)
            for r in read_sink(spark, out).collect()
        }
        assert got == {(1, 3, 10), (2, 0, 7)}

        # replay batch 1: overwrites itself, union unchanged
        sink(_docs(spark, [CORPUS[1]]), 1)
        again = {
            (r.doc_id, r.start_tok, r.end_tok)
            for r in read_sink(spark, out).collect()
        }
        assert again == got

        d = IncrementalSubstrDeduper(spark, state, window=W)
        with pytest.raises(RuntimeError, match="stream"):
            d.compact_state()


def test_natural_corpus_multi_batch_equals_one_shot(spark, tmp_path):
    """The equality bar on REAL harness data: the sf0.001 documents
    table (planted duplicate families included) split into three
    ingestion waves by doc_id hash — merged union of emissions equals
    one-shot duplicated_spans over the whole table."""
    from streamy_db_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    d = IncrementalSubstrDeduper(spark, str(tmp_path / "s"), window=W)
    emitted: set = set()
    for i in range(3):
        batch = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == i)
        emitted |= _spans(d.process_batch(batch, batch_id=i))
    one_shot = _spans(duplicated_spans(docs, window=W))
    assert one_shot  # the harness plants duplicate families — non-vacuous
    assert _merge(emitted) == one_shot


def test_merge_spans_canonicalizes_changelog_output(spark, tmp_path):
    """substring.merge_spans over the union of per-batch emissions
    equals one-shot duplicated_spans — the JVM consumer-side merge
    (the Python _merge in these tests is the independent model)."""
    from streamy_db_spark.operators.substring import merge_spans

    batches = [[CORPUS[i] for i in idxs] for idxs in ([0, 2, 4], [1, 3, 5], [6])]
    d = IncrementalSubstrDeduper(spark, str(tmp_path / "s"), window=W)
    union = None
    for i, rows in enumerate(batches):
        out = d.process_batch(_docs(spark, rows), batch_id=i)
        union = out if union is None else union.unionByName(out)
    got = _spans(merge_spans(union))
    one_shot = _spans(duplicated_spans(_docs(spark, CORPUS), window=W))
    assert got == one_shot == _merge(_spans(union))
    # idempotent on an already-canonical frame
    assert _spans(merge_spans(duplicated_spans(_docs(spark, CORPUS), window=W))) == one_shot


def test_compact_drops_emitted_wins_and_preserves_semantics(spark, tmp_path):
    """compact_state(drop_emitted_wins=True, the default) removes
    wins/ rows for already-emitted hashes once a NEWER batch exists —
    the state-size observable — while every later verdict (dup fast
    path for new copies, retro emission for still-singleton hashes)
    matches a never-compacted reference gate."""
    state, ref = str(tmp_path / "s"), str(tmp_path / "ref")
    a = IncrementalSubstrDeduper(spark, state, window=W)
    b = IncrementalSubstrDeduper(spark, ref, window=W)
    emitted_a: set = set()
    emitted_b: set = set()
    # batch 0: docs 1+2 transition SHARED's hashes into dup/;
    # doc 5 plants still-singleton SHARED2 windows that must SURVIVE
    batches = [[CORPUS[0], CORPUS[1], CORPUS[4]], [CORPUS[2]]]
    for i, rows in enumerate(batches):
        emitted_a |= _spans(a.process_batch(_docs(spark, rows), batch_id=i))
        emitted_b |= _spans(b.process_batch(_docs(spark, rows), batch_id=i))

    def _wins_rows(path):
        return spark.read.option("mergeSchema", "true").parquet(
            f"{path}/wins"
        ).count()

    before = _wins_rows(state)
    a.compact_state(force=True)
    after = _wins_rows(state)
    assert after < before  # emitted SHARED occurrences dropped
    # the still-singleton SHARED2 occurrences survived: doc 6's copy
    # must fire the RETRO emission for doc 5 post-compaction
    for i, rows in enumerate(([CORPUS[5]], [CORPUS[6]]), start=2):
        emitted_a |= _spans(a.process_batch(_docs(spark, rows), batch_id=i))
        emitted_b |= _spans(b.process_batch(_docs(spark, rows), batch_id=i))
    assert _merge(emitted_a) == _merge(emitted_b)
    one_shot = _spans(
        duplicated_spans(_docs(spark, CORPUS[:3] + CORPUS[4:]), window=W)
    )
    assert _merge(emitted_a) == one_shot


def test_compact_preserves_newest_batch_transition_for_replay(spark, tmp_path):
    """The drop rule keeps wins/ rows for hashes whose dup transition
    is in the NEWEST ids/ batch: that batch can still crash-replay,
    and its replay re-derives the retro emission from those rows."""
    state = str(tmp_path / "s")
    d = IncrementalSubstrDeduper(spark, state, window=W)
    d.process_batch(_docs(spark, [CORPUS[0]]), batch_id=0)
    first = _spans(d.process_batch(_docs(spark, [CORPUS[1]]), batch_id=1))
    assert first == {(1, 3, 10), (2, 0, 7)}
    # compact while batch 1 (the transition batch) is newest: doc 1's
    # SHARED rows must NOT be dropped (dup.batch_seq == max ids seq)
    d.compact_state(force=True)
    replay = _spans(d.process_batch(_docs(spark, [CORPUS[1]]), batch_id=1))
    assert replay == first


def test_none_bid_batch_sees_duplication_after_drop_compaction(spark, tmp_path):
    """The r11-review hole, pinned closed: numbered batches transition
    a passage into dup/, a later batch advances max ids seq, compaction
    drops the passage's wins/ rows — a subsequent batch_id=None batch
    carrying a new copy must STILL emit its span (it reads dup/
    unfiltered; wins-count classification alone would see n_prior=0
    and stay silent forever)."""
    state = str(tmp_path / "s")
    d = IncrementalSubstrDeduper(spark, state, window=W)
    d.process_batch(_docs(spark, [CORPUS[0]]), batch_id=0)
    d.process_batch(_docs(spark, [CORPUS[1]]), batch_id=1)  # SHARED -> dup/
    d.process_batch(_docs(spark, [CORPUS[2]]), batch_id=2)  # advances max seq
    d.compact_state(force=True)  # drops SHARED's wins/ occurrences

    none_bid = [(99, f"a none-bid copy {SHARED} arrives over here")]
    got = _spans(d.process_batch(_docs(spark, none_bid)))
    # exactly the new copy's span: the dup fast path fires (no silent
    # miss) and the earlier docs' spans are not re-emitted
    assert got == {(99, 3, 10)}


def test_none_bid_replay_of_crashed_numbered_batch_keeps_retro(spark, tmp_path):
    """r11 third-review hole, pinned closed: a numbered batch crashes
    AFTER its dup/ append but before its ids/ append and before its
    output committed; the caller replays it batch_id=None. The dup row
    sits at/past the committed-ids horizon, so the None-bid read must
    DISTRUST it and re-derive duplication from wins/ (whose rows the
    drop rule provably kept) — emitting BOTH the doc's span and the
    retro span. Trusting the crashed dup row would suppress the retro
    emission forever."""
    state = str(tmp_path / "s")
    d = IncrementalSubstrDeduper(spark, state, window=W)
    d.process_batch(_docs(spark, [CORPUS[0]]), batch_id=0)
    doc50 = [(50, f"{SHARED} completely different continuation of text here")]
    first = _spans(d.process_batch(_docs(spark, doc50), batch_id=1))
    assert first == {(1, 3, 10), (50, 0, 7)}

    # simulate the crash: batch 1's wins/ and dup/ appends landed (they
    # did, above) but its ids/ append did not — rewrite ids/ without it
    ids = (
        spark.read.option("mergeSchema", "true")
        .parquet(f"{state}/ids")
        .filter("batch_seq != 1")
        .localCheckpoint(eager=True)
    )
    ids.write.mode("overwrite").parquet(f"{state}/ids")

    got = _spans(d.process_batch(_docs(spark, doc50)))  # batch_id=None
    assert _merge(got) == _merge(first)


def test_ids_membership_prunes_and_resend_parity(spark, tmp_path):
    """The substring gate's re-send lookup file-prunes ids/ after a
    compaction (accounting under last_probe_scan["ids"]) and re-send
    verdicts match the full-scan gate's; numbered batches no longer pay
    the global max(batch_seq) aggregation at all (it is a None-bid-only
    horizon)."""
    path = str(tmp_path / "state")
    d = IncrementalSubstrDeduper(spark, path, window=3)
    rows = [
        (i, f"alpha bravo charlie delta echo tag{i} marker{i * 7}")
        for i in range(0, 320, 10)
    ]
    d.process_batch(_docs(spark, rows), batch_id=0)
    d.compact_state(force=True, ids_min_files=8)

    # 10 is a re-send (drops from the batch); 9999 is novel and shares
    # the boilerplate prefix, so it gains a span against state
    batch = [(10, rows[1][1]), (9999, "alpha bravo charlie delta echo x y")]
    out = d.process_batch(_docs(spark, batch), batch_id=1)
    spans = {(r[0]) for r in out.select(d.id_col).collect()}
    assert 10 not in spans  # re-send dropped, no self-duplication
    assert d.last_probe_scan is not None and "ids" in d.last_probe_scan
    acct = d.last_probe_scan["ids"]
    assert acct["files_total"] >= 8 and acct["files_pruned"] >= 1

    ref = IncrementalSubstrDeduper(spark, path, window=3, prune_max_windows=0)
    out2 = ref.process_batch(_docs(spark, batch), batch_id=1)
    spans2 = {(r[0]) for r in out2.select(ref.id_col).collect()}
    assert spans == spans2  # replay under the full scan agrees


def test_null_doc_id_survives_pruned_membership(spark, tmp_path):
    """Same null-id hardening as the near gate: a NULL doc_id row must
    not crash the pruned re-send lookup."""
    path = str(tmp_path / "state")
    d = IncrementalSubstrDeduper(spark, path, window=3)
    rows = [
        (i, f"alpha bravo charlie delta echo tag{i} marker{i * 7}")
        for i in range(0, 160, 10)
    ]
    d.process_batch(_docs(spark, rows), batch_id=0)
    d.compact_state(force=True, ids_min_files=8)
    out = d.process_batch(
        _docs(
            spark,
            [(None, "dirty record"), (9999, "alpha bravo charlie delta echo")],
        ),
        batch_id=1,
    )
    assert out.count() >= 1  # batch processed; the shared span found
