"""IncrementalNearDeduper: batch-over-batch MinHash admission must equal
the serial greedy model over the SAME edge predicate (banded LSH probe +
signature-agreement verify), replayed batches must be idempotent, and on
bridge-free corpora the accepted set must coincide with one-shot
pairs + connected-components keepers."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamy_db_spark.operators.incremental import IncrementalNearDeduper


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = "the quick brown fox jumps over the lazy dog by the old river bank at dawn"
ALT = "completely different words about spark partitions shuffles and columnar scans here"
THIRD = "a third unrelated subject entirely devoted to parquet footers and row groups"

B1 = [
    (1, BASE),
    (2, ALT),
    (3, BASE.replace("dawn", "dusk")),  # in-batch near-dup of 1
    (4, "too short"),  # < 3 tokens of shingle: trivial accept
]
B2 = [
    (10, BASE.replace("quick", "swift")),  # cross-batch near-dup of 1
    (11, THIRD),
    (12, THIRD.replace("third", "fourth")),  # in-batch near-dup of 11
]
B3 = [
    (20, ALT.replace("here", "today")),  # cross-batch near-dup of 2
    (21, "entirely novel content with no token overlap whatsoever anywhere"),
]


def _serial_greedy(edge_set, batches, trivial_ids):
    """The documented contract: per batch, components over (in-batch
    edges + edges to already-accepted docs); contaminated components
    rejected wholesale, clean ones keep their min id; edge-free and
    trivial docs accepted."""
    accepted: set[int] = set()
    out: dict[int, set[int]] = {}
    for bi, ids in enumerate(batches):
        ids = [i for i in ids if i not in accepted]
        adj = {i: set() for i in ids}
        contaminated_roots = set()
        for i in ids:
            for j in ids:
                if i < j and ((i, j) in edge_set or (j, i) in edge_set):
                    adj[i].add(j)
                    adj[j].add(i)
        # components over in-batch edges
        seen_nodes, comps = set(), []
        for i in ids:
            if i in seen_nodes or i in trivial_ids:
                continue
            stack, comp = [i], set()
            while stack:
                n = stack.pop()
                if n in comp:
                    continue
                comp.add(n)
                stack.extend(adj[n] - comp)
            seen_nodes |= comp
            comps.append(comp)
        batch_accept = {i for i in ids if i in trivial_ids}
        for comp in comps:
            dirty = any(
                (n, s) in edge_set or (s, n) in edge_set
                for n in comp
                for s in accepted
            )
            if not dirty:
                batch_accept.add(min(comp))
        out[bi] = batch_accept
        accepted |= {i for i in batch_accept if i not in trivial_ids}
    return out


def _edge_set(spark, all_rows, deduper):
    """One-shot edge set over the concatenated corpus using the SAME
    predicate the operator applies (banded probe + sig agreement)."""
    sigs = deduper._sig_table(_docs(spark, all_rows))
    edges = deduper._banded_edges(sigs, sigs).filter(F.col("id_a") < F.col("id_b"))
    return {(r.id_a, r.id_b) for r in edges.collect()}


def test_incremental_near_equals_serial_greedy(spark, tmp_path):
    d = IncrementalNearDeduper(spark, str(tmp_path / "state"))
    edge_set = _edge_set(spark, B1 + B2 + B3, d)
    # sanity: the fixture actually produces in-batch AND cross-batch edges
    assert (1, 3) in edge_set and any(a == 1 and b == 10 or a == 10 for a, b in edge_set)

    model = _serial_greedy(
        edge_set,
        [[i for i, _ in B] for B in (B1, B2, B3)],
        trivial_ids={4},
    )
    got = {}
    for bi, B in enumerate((B1, B2, B3)):
        got[bi] = {r.doc_id for r in d.process_batch(_docs(spark, B)).collect()}
    assert got == model
    # concrete expectations so the model itself is pinned too
    assert got[0] == {1, 2, 4}
    assert got[1] == {11}
    assert got[2] == {21}
    # 1, 2, 11, 21 + trivial 4 (persisted with NULL sig so later
    # re-sends of short docs drop too)
    assert d.seen_count() == 5


def test_bridge_free_matches_one_shot_groups(spark, tmp_path):
    """On a corpus with no cross-batch bridges, incremental acceptance ==
    one-shot connected-components keepers over the same edge set."""
    from streamy_db_spark.operators.dedup import connected_components

    d = IncrementalNearDeduper(spark, str(tmp_path / "state"))
    batches = (B1, B2, B3)
    all_rows = B1 + B2 + B3
    edge_set = _edge_set(spark, all_rows, d)

    accepted = set()
    for B in batches:
        accepted |= {r.doc_id for r in d.process_batch(_docs(spark, B)).collect()}

    edges_df = spark.createDataFrame(
        sorted(edge_set), "id_a long, id_b long"
    )
    comp = {r.node: r.keeper for r in connected_components(edges_df).collect()}
    all_ids = {i for i, _ in all_rows}
    keepers = {i for i in all_ids if comp.get(i, i) == i}
    assert accepted == keepers


def test_replayed_batch_is_idempotent(spark, tmp_path):
    d = IncrementalNearDeduper(spark, str(tmp_path / "state"))
    first = {r.doc_id for r in d.process_batch(_docs(spark, B1)).collect()}
    before = d.seen_count()
    # crash-replay contract: the SAME batch reproduces the SAME output
    # (previously accepted rows re-emitted, nothing re-appended) — what
    # the streaming twin's per-batch overwrite sink needs for
    # exactly-once
    again = {r.doc_id for r in d.process_batch(_docs(spark, B1)).collect()}
    assert again == first == {1, 2, 4}
    assert d.seen_count() == before
    nxt = {r.doc_id for r in d.process_batch(_docs(spark, B2)).collect()}
    assert nxt == {11}


def test_exact_copy_across_batches_rejected(spark, tmp_path):
    d = IncrementalNearDeduper(spark, str(tmp_path / "state"))
    d.process_batch(_docs(spark, [(1, BASE)]))
    out = {r.doc_id for r in d.process_batch(_docs(spark, [(2, BASE)])).collect()}
    assert out == set()


def test_corrupt_state_raises(spark, tmp_path):
    import pytest

    p = tmp_path / "state"
    d = IncrementalNearDeduper(spark, str(p))
    d.process_batch(_docs(spark, B1))
    # corrupt BOTH v2 state components: membership (ids/) and the
    # pre-exploded probe side (bands/). Corruption surfaces as an
    # AnalysisException at schema time or a wrapped SparkException at
    # footer-merge time depending on which file a task opens first; the
    # behavior pinned is raise-vs-silently-treat-as-missing, so any
    # exception class satisfies it (the missing-path case has its own
    # tests in test_file_sources.py).
    corrupted = 0
    for sub in ("ids", "bands"):
        for f in (p / sub).glob("*.parquet"):
            f.write_bytes(b"garbage")
            corrupted += 1
    assert corrupted >= 2
    with pytest.raises(Exception):
        d.process_batch(_docs(spark, B2))


def test_compact_state_preserves_near_dedup_verdicts(spark, tmp_path):
    p = tmp_path / "state"
    d = IncrementalNearDeduper(spark, str(p))
    d.process_batch(_docs(spark, B1))
    d.process_batch(_docs(spark, B2))
    before_files = len(list(p.rglob("*.parquet")))
    seen_before = d.seen_count()

    n = d.compact_state()
    # count the STATE components only — bands_index/ is a pruning
    # sidecar compact_state also (re)writes, not compacted state
    state_files = [
        f
        for sub in ("ids", "bands")
        for f in (p / sub).rglob("*.parquet")
    ]
    assert len(state_files) == n <= before_files
    assert (p / "bands_index").is_dir()  # the r9 probe-pruning sidecar
    assert d.seen_count() == seen_before

    # post-compaction verdicts unchanged: near-dup of an accepted doc
    # still rejected, novel content still admitted
    got = {r.doc_id for r in d.process_batch(_docs(spark, B3)).collect()}
    assert got == {21}


def test_batch_id_distinguishes_replay_from_resend(spark, tmp_path):
    """With batch ids, a crash-replay (same batch_id) reproduces its
    output while an upstream re-send of an accepted id in a LATER batch
    is dropped — never duplicated (r6 review)."""
    d = IncrementalNearDeduper(spark, str(tmp_path / "state"))
    first = {
        r.doc_id for r in d.process_batch(_docs(spark, B1), batch_id=0).collect()
    }
    assert first == {1, 2, 4}
    # crash-replay of batch 0: identical output
    again = {
        r.doc_id for r in d.process_batch(_docs(spark, B1), batch_id=0).collect()
    }
    assert again == first
    # batch 1 re-sends accepted doc 1 alongside novel content: the
    # re-send is DROPPED, the novel doc admits
    resend = B2 + [(1, BASE)]
    out = {
        r.doc_id
        for r in d.process_batch(_docs(spark, resend), batch_id=1).collect()
    }
    assert 1 not in out
    assert out == {11}


def test_short_doc_resend_dropped_with_batch_ids(spark, tmp_path):
    """Trivial (no-shingle) docs are persisted too: a later-batch
    re-send of a short doc is dropped, not duplicated (r6 review)."""
    d = IncrementalNearDeduper(spark, str(tmp_path / "state"))
    first = {
        r.doc_id for r in d.process_batch(_docs(spark, B1), batch_id=0).collect()
    }
    assert 4 in first  # the short doc admitted once
    out = {
        r.doc_id
        for r in d.process_batch(
            _docs(spark, [(4, "too short"), (30, THIRD)]), batch_id=3
        ).collect()
    }
    assert out == {30}


def test_near_output_survives_state_compaction(spark, tmp_path):
    d = IncrementalNearDeduper(spark, str(tmp_path / "state"))
    d.process_batch(_docs(spark, B1), batch_id=0)
    out = d.process_batch(_docs(spark, B1), batch_id=0)  # replay path
    d.compact_state()
    assert {r.doc_id for r in out.collect()} == {1, 2, 4}


def test_probe_join_no_exchange_on_state_side(spark, tmp_path):
    """THE r6/r7 scale gate: the batch↔state candidate probe must read
    the pre-exploded bands/ state and hash-probe it against a BROADCAST
    batch — no shuffle (Exchange hashpartitioning) anywhere in the probe
    stage, so state traffic per micro-batch is a scan, never an
    exchange."""
    from streamy_db_spark.plans.inspect import executed_plan

    d = IncrementalNearDeduper(spark, str(tmp_path / "state"))
    d.process_batch(_docs(spark, B1), batch_id=0)
    sigs = d._sig_table(_docs(spark, B2)).localCheckpoint(eager=True)
    probe = d._probe_join(sigs, n_batch_docs=3)
    assert probe is not None
    plan = executed_plan(probe)
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    # and the state side arrives pre-exploded: no Generate (posexplode)
    # may touch the bands/ scan — only the batch side explodes
    state_scans = plan.count("Scan parquet")
    assert state_scans >= 1


def test_probe_falls_back_to_shuffle_join_above_broadcast_cap(spark, tmp_path):
    """Batches above broadcast_batch_max_docs (backfill shape) take the
    shuffle join — same verdicts, different physical plan."""
    from streamy_db_spark.plans.inspect import executed_plan

    d = IncrementalNearDeduper(
        spark, str(tmp_path / "state"), broadcast_batch_max_docs=0
    )
    first = {
        r.doc_id for r in d.process_batch(_docs(spark, B1), batch_id=0).collect()
    }
    assert first == {1, 2, 4}
    sigs = d._sig_table(_docs(spark, B2)).localCheckpoint(eager=True)
    # at test scale Spark would auto-broadcast either side; disable that
    # so the plan shows what the fallback does at REAL backfill scale
    # (no hint → shuffle join), while the hinted path below must
    # broadcast regardless of the threshold
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = executed_plan(d._probe_join(sigs, n_batch_docs=3))
        assert "Exchange hashpartitioning" in plan  # documented fallback
        hinted = executed_plan(
            IncrementalNearDeduper(spark, d.state_path)._probe_join(
                sigs, n_batch_docs=3
            )
        )
        assert "BroadcastHashJoin" in hinted  # hint overrides threshold
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    out = {
        r.doc_id for r in d.process_batch(_docs(spark, B2), batch_id=1).collect()
    }
    assert out == {11}  # cross-batch near-dup of 1 still rejected


def test_transitively_blocked_doc_admitted_on_resend(spark, tmp_path):
    """Rejection is NOT transitively stable (r7 review, docstring
    contract): chain A–B–C where B near-dups A and C near-dups B but
    NOT A. Batch 1 accepts A; batch 2 rejects both B (edge to accepted
    A) and C (same contaminated component via B). A later re-send of C
    ALONE is ADMITTED — C's only blocker B never entered state."""
    # Fixture found by exact offline search over the md5 signature math:
    # at sig_threshold=0.9 (>= 15/16 matching slots) each single-word
    # edit flips exactly ONE signature slot, in different slots, so
    # A~B (15/16) and B~C (15/16) edge while A~C (14/16) does not. A
    # looser threshold cannot exhibit the chain at all: minhash
    # agreement is near-metric, so two half-similar hops force the A-C
    # edge — non-transitivity lives just inside a tight threshold.
    a_id, b_id, c_id = 1, 2, 3
    words = [f"base{i:02d}" for i in range(30)]
    A = " ".join(words)
    bw = list(words)
    bw[3] = "sub3v10"
    B = " ".join(bw)
    cw = list(bw)
    cw[11] = "sub11v2"
    C = " ".join(cw)
    d = IncrementalNearDeduper(spark, str(tmp_path / "state"), sig_threshold=0.9)

    # fixture precondition: edges A–B and B–C exist, A–C does not,
    # under the operator's OWN predicate
    edge_set = _edge_set(spark, [(a_id, A), (b_id, B), (c_id, C)], d)
    assert (a_id, b_id) in edge_set, "fixture: A-B edge required"
    assert (b_id, c_id) in edge_set, "fixture: B-C edge required"
    assert (a_id, c_id) not in edge_set, "fixture: no A-C edge allowed"

    got0 = {
        r.doc_id
        for r in d.process_batch(_docs(spark, [(a_id, A)]), batch_id=0).collect()
    }
    assert got0 == {a_id}
    got1 = {
        r.doc_id
        for r in d.process_batch(
            _docs(spark, [(b_id, B), (c_id, C)]), batch_id=1
        ).collect()
    }
    assert got1 == set()  # B blocked by A; C contaminated via B
    got2 = {
        r.doc_id
        for r in d.process_batch(_docs(spark, [(c_id, C)]), batch_id=2).collect()
    }
    assert got2 == {c_id}  # transitively-blocked doc admits on re-send


def test_legacy_flat_state_migrates_to_v2(spark, tmp_path):
    """A ≤r7 flat state dir (doc_id, sig, bands, batch_seq rows at the
    root) migrates once into ids/ + pre-exploded bands/ with identical
    verdicts, and the legacy root files are removed."""
    from pyspark.sql import functions as F
    from streamy_db_spark.operators.minhash import band_hashes, with_shingles
    from streamy_db_spark.operators.minhash import minhash_signature

    p = tmp_path / "state"
    # write a v1-format state for accepted docs {1: BASE, 2: ALT} plus a
    # trivial doc 4, exactly as r7 process_batch would have
    docs = _docs(spark, [(1, BASE), (2, ALT)])
    sigs = (
        with_shingles(docs)
        .filter(F.size("shingles") > 0)
        .select("doc_id", minhash_signature(F.col("shingles")).alias("sig"))
        .withColumn("bands", band_hashes(F.col("sig")))
    )
    legacy = sigs.unionByName(
        spark.createDataFrame([(4,)], "doc_id long").select(
            "doc_id",
            F.lit(None).cast("array<long>").alias("sig"),
            F.array().cast("array<string>").alias("bands"),
        )
    ).withColumn("batch_seq", F.lit(0).cast("long"))
    legacy.write.mode("overwrite").parquet(str(p))
    assert list(p.glob("*.parquet"))  # flat files present pre-migration

    d = IncrementalNearDeduper(spark, str(p))
    assert d.seen_count() == 3  # triggers migration
    assert not list(p.glob("*.parquet"))  # root files gone
    assert (p / "ids").is_dir() and (p / "bands").is_dir()

    # verdicts over migrated state: near-dup of accepted 1 rejected,
    # re-send of trivial 4 dropped, novel content admitted
    out = {
        r.doc_id
        for r in d.process_batch(
            _docs(
                spark,
                [(10, BASE.replace("quick", "swift")), (4, "too short"), (11, THIRD)],
            ),
            batch_id=1,
        ).collect()
    }
    assert out == {11}


def test_compact_state_refuses_under_live_stream_heartbeat(spark, tmp_path):
    """The r6 compact-vs-live-stream race is guarded: a fresh stream
    heartbeat makes compact_state raise; force=True or a stale
    heartbeat lets it run."""
    import os
    import pytest
    from streamy_db_spark.operators.incremental import (
        IncrementalDeduper,
        touch_stream_heartbeat,
    )

    p = tmp_path / "state"
    d = IncrementalNearDeduper(spark, str(p))
    d.process_batch(_docs(spark, B1), batch_id=0)
    touch_stream_heartbeat(spark, str(p))
    with pytest.raises(RuntimeError, match="compact_state refused"):
        d.compact_state()
    assert d.compact_state(force=True) > 0  # operator override

    # stale heartbeat (backdated mtime) no longer blocks
    touch_stream_heartbeat(spark, str(p))
    hb = p / "_stream_heartbeat"
    old = hb.stat().st_mtime - 3600
    os.utime(hb, (old, old))
    assert d.compact_state() > 0

    # the exact-dedup twin takes the same guard
    pe = tmp_path / "estate"
    de = IncrementalDeduper(spark, str(pe))
    de.process_batch(_docs(spark, [(1, BASE)]))
    touch_stream_heartbeat(spark, str(pe))
    with pytest.raises(RuntimeError, match="compact_state refused"):
        de.compact_state()
    assert de.compact_state(force=True) > 0


def test_near_dedup_sink_touches_heartbeat(spark, tmp_path):
    """near_dedup_sink heartbeats the state dir on every micro-batch, so
    a concurrent compact_state refuses while the stream is live."""
    import pytest
    from streamy_db_spark.streaming.sinks import near_dedup_sink

    state = tmp_path / "state"
    process = near_dedup_sink(spark, str(state), str(tmp_path / "out"))
    process(_docs(spark, B1), 0)
    assert (state / "_stream_heartbeat").exists()
    with pytest.raises(RuntimeError, match="compact_state refused"):
        IncrementalNearDeduper(spark, str(state)).compact_state()


def test_empty_batch_is_noop(spark, tmp_path):
    """Streaming sources deliver EMPTY micro-batches (trigger fires, no
    new files); the gate must treat them as no-ops — empty output, state
    unchanged, later batches unaffected."""
    d = IncrementalNearDeduper(spark, str(tmp_path / "state"))
    first = {
        r.doc_id for r in d.process_batch(_docs(spark, B1), batch_id=0).collect()
    }
    assert first == {1, 2, 4}
    before = d.seen_count()
    empty = _docs(spark, []).limit(0)
    out = d.process_batch(empty, batch_id=1)
    assert out.count() == 0
    assert d.seen_count() == before
    nxt = {
        r.doc_id for r in d.process_batch(_docs(spark, B2), batch_id=2).collect()
    }
    assert nxt == {11}


def test_orphan_bands_from_crash_between_appends_are_benign(spark, tmp_path):
    """Durability contract of the v2 append ORDER (bands/ before ids/):
    a crash between the two appends leaves orphan band rows for docs not
    yet in membership. The replayed batch must reproduce the original
    verdicts (the orphans only duplicate its own in-batch evidence), and
    the following batch must be unaffected."""
    import shutil

    src = tmp_path / "completed"
    d0 = IncrementalNearDeduper(spark, str(src))
    first = {
        r.doc_id for r in d0.process_batch(_docs(spark, B1), batch_id=0).collect()
    }
    assert first == {1, 2, 4}

    # post-crash state: bands/ committed, ids/ never landed
    crashed = tmp_path / "crashed"
    crashed.mkdir()
    shutil.copytree(src / "bands", crashed / "bands")

    d = IncrementalNearDeduper(spark, str(crashed))
    replay = {
        r.doc_id for r in d.process_batch(_docs(spark, B1), batch_id=0).collect()
    }
    assert replay == first  # same verdicts as the crash-free run
    assert d.seen_count() == 3  # 1, 2 and trivial 4 — no phantom members
    nxt = {
        r.doc_id for r in d.process_batch(_docs(spark, B2), batch_id=1).collect()
    }
    assert nxt == {11}  # duplicate orphan rows don't distort batch 2
    # compaction drops the exact-duplicate orphan band rows
    d.compact_state()
    nxt2 = {
        r.doc_id for r in d.process_batch(_docs(spark, B3), batch_id=2).collect()
    }
    assert nxt2 == {21}


def test_stale_migration_marker_is_cleaned(spark, tmp_path):
    """A _migrated marker that outlived its migration (crash between the
    last legacy-file delete and the marker delete) must be removed on
    the next access — a stale marker would otherwise let a future
    migration DELETE legacy files without rewriting them (r8 review)."""
    p = tmp_path / "state"
    d = IncrementalNearDeduper(spark, str(p))
    d.process_batch(_docs(spark, B1), batch_id=0)
    (p / "_migrated").touch()  # simulate the crashed-delete leftover
    d2 = IncrementalNearDeduper(spark, str(p))  # fresh instance: no memo
    assert d2.seen_count() == 3
    assert not (p / "_migrated").exists()


def test_heartbeat_keeper_refreshes_during_long_batch(spark, tmp_path):
    """stream_heartbeat_keeper re-touches the heartbeat while the body
    runs, so compact_state stays blocked however long a micro-batch
    takes (r8 review: a single entry touch left long batches exposed)."""
    import os
    import time as _t

    from streamy_db_spark.operators.incremental import stream_heartbeat_keeper

    p = tmp_path / "state"
    p.mkdir()
    hb = p / "_stream_heartbeat"
    with stream_heartbeat_keeper(spark, str(p), interval_s=0.2):
        assert hb.exists()
        old = hb.stat().st_mtime - 3600
        os.utime(hb, (old, old))  # simulate staleness mid-batch
        _t.sleep(0.6)  # > interval: the keeper must have re-touched
        assert hb.stat().st_mtime > old + 3000
    # after exit the keeper stops: a backdated heartbeat stays stale
    old = hb.stat().st_mtime - 3600
    os.utime(hb, (old, old))
    _t.sleep(0.5)
    assert abs(hb.stat().st_mtime - old) < 1.0


def test_trivial_only_batch_appends_no_bands_commit(spark, tmp_path):
    """A batch whose acceptances are ALL no-shingle docs must not commit
    an empty file to bands/ (r8 second review — trivial docs explode to
    zero band rows, so the append was pure small-file growth); ids/
    still records them so re-sends drop."""
    p = tmp_path / "state"
    d = IncrementalNearDeduper(spark, str(p))
    out = {
        r.doc_id
        for r in d.process_batch(
            _docs(spark, [(1, "too short"), (2, "also short")]), batch_id=0
        ).collect()
    }
    assert out == {1, 2}
    assert not (p / "bands").exists() or not list(
        (p / "bands").glob("*.parquet")
    )
    assert list((p / "ids").glob("*.parquet"))
    nxt = {
        r.doc_id
        for r in d.process_batch(
            _docs(spark, [(1, "too short"), (3, THIRD)]), batch_id=1
        ).collect()
    }
    assert nxt == {3}  # trivial re-send dropped, novel shingled doc admits


def _write_legacy_flat_state(spark, p):
    """A ≤r7 flat (v1) state dir for accepted docs {1: BASE, 2: ALT},
    exactly as r7 process_batch would have written it."""
    from streamy_db_spark.operators.minhash import (
        band_hashes,
        minhash_signature,
        with_shingles,
    )

    docs = _docs(spark, [(1, BASE), (2, ALT)])
    sigs = (
        with_shingles(docs)
        .filter(F.size("shingles") > 0)
        .select("doc_id", minhash_signature(F.col("shingles")).alias("sig"))
        .withColumn("bands", band_hashes(F.col("sig")))
        .withColumn("batch_seq", F.lit(0).cast("long"))
    )
    sigs.write.mode("overwrite").parquet(str(p))


def test_connect_session_refuses_legacy_flat_state(spark, tmp_path, monkeypatch):
    """Under Spark Connect (no Hadoop FS handle) a v1 flat state dir
    must RAISE, not read as empty: v1 fully supported Connect, so such
    state is a legitimate deployment artifact, and proceeding as if the
    corpus were never seen would re-admit near-duplicates and strand v2
    appends for a later migration's OVERWRITE to discard (r8 advice)."""
    import pytest

    from streamy_db_spark.operators import incremental, incremental_base

    p = tmp_path / "state"
    _write_legacy_flat_state(spark, p)

    monkeypatch.setattr(incremental, "_state_fs", lambda s, pth: (None, None))
    # the scaffold resolves its own copy from incremental_base (r12
    # extraction) — patch BOTH so the Connect simulation also covers
    # the pruning ladder / heartbeat paths, not just migration
    monkeypatch.setattr(
        incremental_base, "_state_fs", lambda s, pth: (None, None)
    )
    d = IncrementalNearDeduper(spark, str(p))
    with pytest.raises(RuntimeError, match="classic"):
        d.process_batch(_docs(spark, B2), batch_id=1)
    # state untouched: no v2 subdirs were created next to the flat files
    assert not (p / "ids").exists() and not (p / "bands").exists()
    assert list(p.glob("*.parquet"))


def test_connect_session_proceeds_on_v2_or_empty_state(spark, tmp_path, monkeypatch):
    """The Connect legacy probe must not false-positive: v2 state (subdirs
    only) and never-written state both proceed normally."""
    from streamy_db_spark.operators import incremental, incremental_base

    # build v2 state with a classic session first
    p = tmp_path / "state"
    d0 = IncrementalNearDeduper(spark, str(p))
    assert {
        r.doc_id for r in d0.process_batch(_docs(spark, B1), batch_id=0).collect()
    } == {1, 2, 4}

    monkeypatch.setattr(incremental, "_state_fs", lambda s, pth: (None, None))
    # the scaffold resolves its own copy from incremental_base (r12
    # extraction) — patch BOTH so the Connect simulation also covers
    # the pruning ladder / heartbeat paths, not just migration
    monkeypatch.setattr(
        incremental_base, "_state_fs", lambda s, pth: (None, None)
    )
    d = IncrementalNearDeduper(spark, str(p))
    out = {r.doc_id for r in d.process_batch(_docs(spark, B2), batch_id=1).collect()}
    assert out == {11}  # same verdict as a classic session would give

    d_empty = IncrementalNearDeduper(spark, str(tmp_path / "fresh"))
    out0 = {
        r.doc_id
        for r in d_empty.process_batch(_docs(spark, B3), batch_id=0).collect()
    }
    assert out0 == {20, 21}


def test_heartbeat_age_uses_filesystem_clock(spark, tmp_path, monkeypatch):
    """stream_heartbeat_age_s derives 'now' from the filesystem's own
    clock (probe-file mtime), so driver-vs-filesystem clock skew cannot
    make a live stream look stale (r8 advice): with the driver clock
    skewed two hours ahead, a just-touched heartbeat still reads ~0s."""
    import time as real_time

    # the heartbeat machinery lives in incremental_base since the r12
    # scaffold extraction — skew the clock where age_s resolves it
    from streamy_db_spark.operators import incremental_base as incremental

    p = tmp_path / "state"
    p.mkdir()
    incremental.touch_stream_heartbeat(spark, str(p))

    class _SkewedTime:
        @staticmethod
        def time() -> float:
            return real_time.time() + 7200.0

    monkeypatch.setattr(incremental, "time", _SkewedTime)
    age = incremental.stream_heartbeat_age_s(spark, str(p))
    assert age is not None and age < 60.0  # FS clock, not the skewed driver
    # the probe file must not linger in the state dir
    assert not list(p.glob("_hb_probe_*"))


def test_sink_lifetime_heartbeat_owns_state_between_triggers(spark, tmp_path):
    """The near_dedup_sink heartbeat must be fresh for the STREAM's
    lifetime, not just while a micro-batch body runs: between triggers a
    compact_state must still refuse, and close() releases ownership (r8
    advice — a trigger interval longer than the guard's max age
    otherwise opens the compact-vs-stream race)."""
    import os
    import time as _t

    import pytest

    state = tmp_path / "state"
    from streamy_db_spark.streaming.sinks import near_dedup_sink

    sink = near_dedup_sink(
        spark, str(state), str(tmp_path / "out"), heartbeat_interval_s=0.2
    )
    try:
        hb = state / "_stream_heartbeat"
        assert hb.exists()  # ownership starts at construction
        sink(_docs(spark, B1), 0)
        # simulate a long idle gap between triggers: backdate the
        # heartbeat and verify the lifetime keeper re-touches it with NO
        # batch running
        old = hb.stat().st_mtime - 3600
        os.utime(hb, (old, old))
        _t.sleep(0.6)
        assert hb.stat().st_mtime > old + 3000
        with pytest.raises(RuntimeError, match="compact_state refused"):
            IncrementalNearDeduper(spark, str(state)).compact_state()
    finally:
        sink.close()
    # after close() the heartbeat goes stale and compaction may proceed
    hb = state / "_stream_heartbeat"
    old = hb.stat().st_mtime - 3600
    os.utime(hb, (old, old))
    _t.sleep(0.5)  # a still-running keeper would re-touch within 0.2s
    assert IncrementalNearDeduper(spark, str(state)).compact_state() > 0


def test_sink_lifetime_heartbeat_released_by_gc(spark, tmp_path):
    """The canonical inline usage
    writeStream.foreachBatch(near_dedup_sink(...)) retains no reference
    for close(); when the sink object is released, the GC finalizer must
    stop the lifetime keeper so compact_state is not blocked for the
    rest of the process (r9 review)."""
    import gc
    import os
    import time as _t

    from streamy_db_spark.streaming.sinks import near_dedup_sink

    state = tmp_path / "state"
    sink = near_dedup_sink(
        spark, str(state), str(tmp_path / "out"), heartbeat_interval_s=0.1
    )
    sink(_docs(spark, B1), 0)
    hb = state / "_stream_heartbeat"
    assert hb.exists()

    del sink
    gc.collect()
    # drain: a beat captured just before the del may still be mid-touch
    # (py4j call in flight); give it a couple of intervals to land
    # before backdating, or its write lands after the backdate and
    # reads as a live keeper
    _t.sleep(0.3)
    old = hb.stat().st_mtime - 3600
    os.utime(hb, (old, old))
    _t.sleep(0.4)  # a live keeper would re-touch within 0.1s
    assert abs(hb.stat().st_mtime - old) < 1.0  # keeper is gone
    assert IncrementalNearDeduper(spark, str(state)).compact_state() > 0


def test_keeper_retouch_does_not_resurrect_deleted_state(spark, tmp_path):
    """Periodic keeper RE-touches skip when the state root is missing,
    so a background heartbeat can never recreate a state directory its
    owner deleted (r9 review)."""
    import shutil
    import time as _t

    from streamy_db_spark.operators.incremental import stream_heartbeat_keeper

    p = tmp_path / "state"
    with stream_heartbeat_keeper(spark, str(p), interval_s=0.1):
        assert (p / "_stream_heartbeat").exists()
        shutil.rmtree(p)
        _t.sleep(0.4)  # several re-touch intervals
        assert not p.exists()


def test_sink_lifetime_heartbeat_lapses_when_idle_and_resumes(spark, tmp_path):
    """py4j pins inline foreachBatch callables (measured r9), so an
    unreferenced sink can never rely on GC release: the lifetime keeper
    must LAPSE after idle_release_s without a batch (heartbeat ages out,
    compaction unblocks) and resume ownership on the next batch."""
    import os
    import time as _t

    import pytest

    from streamy_db_spark.streaming.sinks import near_dedup_sink

    state = tmp_path / "state"
    sink = near_dedup_sink(
        spark,
        str(state),
        str(tmp_path / "out"),
        heartbeat_interval_s=0.1,
        idle_release_s=0.5,
    )
    try:
        sink(_docs(spark, B1), 0)
        hb = state / "_stream_heartbeat"
        assert hb.exists()
        _t.sleep(0.8)  # > idle_release_s: the keeper must lapse
        old = hb.stat().st_mtime - 3600
        os.utime(hb, (old, old))
        _t.sleep(0.4)  # several beat intervals: no re-touch while lapsed
        assert abs(hb.stat().st_mtime - old) < 1.0
        assert IncrementalNearDeduper(spark, str(state)).compact_state() > 0

        # the next batch refreshes activity: ownership resumes
        sink(_docs(spark, B2), 1)
        old = hb.stat().st_mtime - 3600
        os.utime(hb, (old, old))
        _t.sleep(0.4)
        assert hb.stat().st_mtime > old + 3000  # keeper re-touching again
        with pytest.raises(RuntimeError, match="compact_state refused"):
            IncrementalNearDeduper(spark, str(state)).compact_state()
    finally:
        sink.close()


def test_ids_membership_no_exchange_on_state_side(spark, tmp_path):
    """The ids/ membership lookup follows the same 100 TB rule as the
    band probe: ids/ streams through a hash join against the BROADCAST
    batch id set — no Exchange on the state side (the prior form
    distinct'd and anti-joined the ENTIRE ids/ state per micro-batch)."""
    from pyspark.sql import functions as F

    from streamy_db_spark.plans.inspect import executed_plan

    d = IncrementalNearDeduper(spark, str(tmp_path / "state"))
    d.process_batch(_docs(spark, B1), batch_id=0)
    bkeys = (
        _docs(spark, B2)
        .select(F.col("doc_id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    hits = d._ids_hits(d._ids(), bkeys, broadcast=True)
    plan = executed_plan(hits)
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_ids_membership_prunes_files_with_verdict_parity(spark, tmp_path):
    """compact_state clusters ids/ on doc_id + persists ids_index/; a
    small batch's membership lookup then reads only the files whose id
    range can match (last_ids_scan accounting) — with verdicts equal to
    the full-scan gate's."""
    path = str(tmp_path / "state")
    d = IncrementalNearDeduper(spark, path)
    rows = [
        (i, f"totally unrelated text number {i} salt {i * 13}")
        for i in range(0, 400, 10)
    ]
    d.process_batch(_docs(spark, rows), batch_id=0)
    d.compact_state(force=True, ids_min_files=8)

    # low-id probe batch: 10 is a re-send of an accepted doc (drops),
    # 77777 is novel — two ids against 8 disjoint id-range files
    batch = [(10, rows[1][1]), (77777, "fresh text nobody wrote")]
    out = {
        r.doc_id
        for r in d.process_batch(_docs(spark, batch), batch_id=1).collect()
    }
    assert out == {77777}
    assert d.last_ids_scan is not None
    assert d.last_ids_scan["files_total"] >= 8
    assert d.last_ids_scan["files_pruned"] >= 1
    assert d.last_ids_scan["files_read"] >= 1

    # full-scan reference gate: same verdicts on the replay, no accounting
    ref = IncrementalNearDeduper(spark, path, prune_max_docs=0)
    out2 = {
        r.doc_id
        for r in ref.process_batch(_docs(spark, batch), batch_id=1).collect()
    }
    assert out2 == {77777}
    assert ref.last_ids_scan is None


def test_null_doc_id_survives_pruned_membership(spark, tmp_path):
    """A dirty record with a NULL doc_id must not kill the micro-batch
    once ids pruning is active (review repro: sorted() over None+int
    raised TypeError); null ids never equi-join, so they are excluded
    from the prune key set — exactly what the full scan's join
    semantics do."""
    path = str(tmp_path / "state")
    d = IncrementalNearDeduper(spark, path)
    rows = [
        (i, f"totally unrelated text number {i} salt {i * 13}")
        for i in range(0, 200, 10)
    ]
    d.process_batch(_docs(spark, rows), batch_id=0)
    d.compact_state(force=True, ids_min_files=8)
    out = d.process_batch(
        _docs(spark, [(None, "dirty record"), (88888, "clean new text")]),
        batch_id=1,
    )
    ids = {r.doc_id for r in out.collect()}
    assert 88888 in ids  # batch processed; the clean novel doc admitted
