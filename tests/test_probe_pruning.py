"""File-level pruning of the near-dedup probe's bands/ state scan (r8
verdict item 1): compact_state persists per-file bkey ranges to
bands_index/; the per-batch probe keeps only the files whose range can
hold one of the batch's band keys, so files READ per micro-batch scale
with the batch's bucket coverage, not accepted-state size. The gates
here: pruning fires (files_read < files_total on a compacted
multi-append state), verdicts are IDENTICAL to the unpruned scan, and a
stale index (crash between compaction swap and index write) degrades to
the full scan — never to a missed candidate. Plus the r8 verdict item 6
forward-compat check: a FUTURE state column round-trips through probe +
compact_state without stripping."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from streamy_db_spark.operators.incremental import IncrementalNearDeduper


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _corpus(n, start=0, tag="topic"):
    """n mutually-distinct documents (no cross-doc near-dups)."""
    return [
        (
            start + i,
            f"document {tag} {i} covers subject {tag}{i} with tokens "
            f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}",
        )
        for i in range(n)
    ]


def test_probe_prunes_files_and_matches_unpruned_verdicts(spark, tmp_path):
    """On a compacted multi-file + fresh-append state, a small probe
    batch reads a strict subset of bands/ files and returns exactly the
    verdicts the full scan returns."""
    state = tmp_path / "state"
    d = IncrementalNearDeduper(spark, str(state))
    base = _corpus(60)
    assert d.process_batch(_docs(spark, base), batch_id=0).count() == 60
    d.compact_state(bands_min_files=8, force=True)
    assert (state / "bands_index").is_dir()

    # multi-append: a post-compaction batch lands unindexed files
    extra = _corpus(5, start=1000, tag="fresh")
    assert d.process_batch(_docs(spark, extra), batch_id=1).count() == 5

    # probe: exact-copy near-dups of one compacted-era and one
    # append-era doc (new ids → they go through the banded probe, not
    # membership) + one novel doc
    probe = [
        (5007, base[7][1]),
        (5100, extra[2][1]),
        (6000, "entirely novel content nothing shares these tokens at all"),
    ]
    out = {
        r.doc_id for r in d.process_batch(_docs(spark, probe), batch_id=2).collect()
    }
    assert out == {6000}

    scan = d.last_probe_scan
    assert scan is not None, "pruning did not run on a prunable batch"
    assert scan["files_total"] >= 6  # compaction actually made many files
    assert scan["files_read"] < scan["files_total"]
    assert scan["files_pruned"] >= 1

    # parity: the SAME probe over a copy of the pre-probe state with
    # pruning disabled gives identical verdicts (full-scan reference)
    ref_state = tmp_path / "ref_state"
    shutil.copytree(state, ref_state)
    ref = IncrementalNearDeduper(spark, str(ref_state), prune_max_docs=0)
    ref_out = {
        r.doc_id
        for r in ref.process_batch(_docs(spark, probe), batch_id=2).collect()
    }
    assert ref_out == out
    assert ref.last_probe_scan is None  # pruning disabled ⇒ no accounting


def test_stale_index_degrades_to_full_scan(spark, tmp_path):
    """A crash between the compaction swap and the index write leaves an
    index naming files that no longer exist. Zero LIVE files are then
    indexed, so the probe skips the pruning attempt entirely (below
    prune_min_indexed_files — the per-trigger bkey collect could not
    skip anything) and takes the plain full scan; verdicts intact —
    the failure mode is over-reading, never a missed candidate."""
    state = tmp_path / "state"
    d = IncrementalNearDeduper(spark, str(state))
    base = _corpus(40)
    d.process_batch(_docs(spark, base), batch_id=0).count()
    d.compact_state(bands_min_files=6, force=True)

    # simulate the crash: index rows point at names the swap replaced
    idx_path = str(state / "bands_index")
    stale = [
        ("gone-" + r["file"], r["min_bkey"], r["max_bkey"])
        for r in spark.read.parquet(idx_path).collect()
    ]
    spark.createDataFrame(
        stale, "file string, min_bkey string, max_bkey string"
    ).write.mode("overwrite").parquet(idx_path)

    probe = [(5003, base[3][1]), (6000, "wholly new words beyond any overlap")]
    out = {
        r.doc_id for r in d.process_batch(_docs(spark, probe), batch_id=1).collect()
    }
    assert out == {6000}
    # attempt skipped (0 live indexed files): no accounting, no
    # per-trigger collect job — degraded to exactly the pre-index path
    assert d.last_probe_scan is None


def test_missing_index_and_oversized_batch_take_full_scan(spark, tmp_path):
    """No bands_index (never compacted) or a batch above prune_max_docs:
    the probe silently takes the full-directory scan — the exact pre-r9
    behavior — and records no scan accounting."""
    state = tmp_path / "state"
    d = IncrementalNearDeduper(spark, str(state), prune_max_docs=2)
    base = _corpus(10)
    d.process_batch(_docs(spark, base), batch_id=0).count()

    # never compacted ⇒ no index; batch of 3 > prune_max_docs=2 anyway
    probe = _corpus(3, start=500, tag="other") + [(900, base[1][1])]
    out = {
        r.doc_id for r in d.process_batch(_docs(spark, probe), batch_id=1).collect()
    }
    assert out == {500, 501, 502}
    assert d.last_probe_scan is None


def test_tiny_indexed_state_skips_pruning_attempt(spark, tmp_path):
    """Below prune_min_indexed_files the per-trigger bkey-collect job
    cannot pay for itself: the probe takes the plain full scan with no
    accounting (r9 second review — a 1-2 file state on a 500 ms-trigger
    stream was paying an extra Spark job per batch to skip at most one
    read)."""
    state = tmp_path / "state"
    d = IncrementalNearDeduper(spark, str(state))
    base = _corpus(20)
    d.process_batch(_docs(spark, base), batch_id=0).count()
    d.compact_state(bands_min_files=2, force=True)  # 2 indexed < floor 4

    probe = [(900, base[4][1]), (901, "fresh unseen tokens everywhere")]
    out = {
        r.doc_id for r in d.process_batch(_docs(spark, probe), batch_id=1).collect()
    }
    assert out == {901}
    assert d.last_probe_scan is None  # attempt skipped, verdicts intact


def test_future_state_columns_survive_probe_and_compaction(spark, tmp_path):
    """r8 verdict item 6: a FUTURE column appended to ids/ and bands/
    (simulating a v3 writer) must round-trip through process_batch and
    compact_state without being stripped — the same mergeSchema
    discipline that caught the r6 single-footer hole, now exercised
    FORWARD."""
    state = tmp_path / "state"
    d = IncrementalNearDeduper(spark, str(state))
    base = _corpus(8)
    d.process_batch(_docs(spark, base), batch_id=0).count()

    # v3-era appends carrying an extra column
    spark.createDataFrame(
        [(999_999, 7, "future-meta")],
        "doc_id long, batch_seq long, v3_extra string",
    ).write.mode("append").parquet(str(state / "ids"))
    sig = list(range(16))
    spark.createDataFrame(
        [("0:ffffffffffffffffffffffffffffffff", 999_999, sig, "future-meta")],
        "bkey string, doc_id long, sig array<long>, v3_extra string",
    ).write.mode("append").parquet(str(state / "bands"))

    # probe still works over the mixed-schema state, and the v3 row's
    # membership is honored (a re-send of 999999 in a LATER batch drops)
    out = {
        r.doc_id
        for r in d.process_batch(
            _docs(
                spark,
                [(999_999, "whatever text"), (700, "genuinely new tokens here")],
            ),
            batch_id=1,
        ).collect()
    }
    assert out == {700}

    d.compact_state(force=True)
    assert "v3_extra" in spark.read.option("mergeSchema", "true").parquet(
        str(state / "ids")
    ).columns
    bands_cols = spark.read.option("mergeSchema", "true").parquet(
        str(state / "bands")
    ).columns
    assert "v3_extra" in bands_cols
    # the v3 rows themselves survived the rewrite
    assert (
        spark.read.option("mergeSchema", "true")
        .parquet(str(state / "ids"))
        .filter(F.col("v3_extra") == "future-meta")
        .count()
        == 1
    )


def test_corrupt_index_degrades_to_full_scan(spark, tmp_path):
    """The index is ADVISORY: a torn/corrupt bands_index (e.g. a
    compaction killed mid-index-write) must cost a full scan, never a
    failed micro-batch (r9 review — _read_state propagates non-missing
    errors by design, which is right for real state and wrong for a
    sidecar)."""
    state = tmp_path / "state"
    d = IncrementalNearDeduper(spark, str(state))
    base = _corpus(20)
    d.process_batch(_docs(spark, base), batch_id=0).count()
    d.compact_state(bands_min_files=4, force=True)

    # torn write: replace the index with an unreadable parquet file
    idx = state / "bands_index"
    for f in idx.glob("*.parquet"):
        f.write_bytes(b"not a parquet footer at all")

    d2 = IncrementalNearDeduper(spark, str(state))  # fresh memo
    probe = [(900, base[4][1]), (901, "fresh unseen tokens everywhere")]
    out = {
        r.doc_id
        for r in d2.process_batch(_docs(spark, probe), batch_id=1).collect()
    }
    assert out == {901}
    assert d2.last_probe_scan is None  # no usable index ⇒ plain full scan


def test_index_memoized_per_instance_and_refreshed_by_compaction(
    spark, tmp_path
):
    """The probe must not re-read the index every micro-batch (r9
    review): the ranges load once per instance, and THIS instance's
    compact_state invalidates the memo so the fresh index is picked up."""
    state = tmp_path / "state"
    d = IncrementalNearDeduper(spark, str(state))
    d.process_batch(_docs(spark, _corpus(20)), batch_id=0).count()
    d.compact_state(bands_min_files=4, force=True)

    assert d._index_ranges() is not None
    first = d._index_ranges()
    assert d._index_ranges() is first  # memoized: same object back

    d.process_batch(_docs(spark, _corpus(4, start=100, tag="x")), batch_id=1)
    d.compact_state(bands_min_files=4, force=True)
    second = d._index_ranges()
    assert second is not first  # compaction invalidated the memo
    assert set(second) != set(first)  # new file names indexed


def test_prune_decision_never_drops_a_containing_file():
    """Property (hypothesis): prune_band_files keeps EVERY file whose
    [min, max] range contains at least one batch bkey, and every
    unindexed file — brute-force membership is the oracle. The pruning
    may only over-read (files kept despite zero overlap are allowed by
    the contract only for unindexed files; for indexed files the
    binary-search decision must be EXACT both ways)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from streamy_db_spark.operators.incremental import prune_band_files

    key = st.text(alphabet="0123456789abcdef:", min_size=1, max_size=8)

    @st.composite
    def scenario(draw):
        n_files = draw(st.integers(0, 12))
        files = []
        ranges = {}
        for i in range(n_files):
            name = f"part-{i:05d}.parquet"
            files.append((name, f"/state/bands/{name}"))
            if draw(st.booleans()):  # some files stay unindexed
                a, b = draw(key), draw(key)
                ranges[name] = (min(a, b), max(a, b))
        # index may also reference vanished files (stale entries)
        for i in range(draw(st.integers(0, 3))):
            a, b = draw(key), draw(key)
            ranges[f"gone-{i}.parquet"] = (min(a, b), max(a, b))
        bkeys = sorted(set(draw(st.lists(key, max_size=30))))
        return files, ranges, bkeys

    @settings(max_examples=300, deadline=None)
    @given(scenario())
    def check(s):
        files, ranges, bkeys = s
        kept = set(prune_band_files(files, ranges, bkeys))
        for name, path in files:
            rng = ranges.get(name)
            if rng is None:
                assert path in kept  # unindexed: always read
            else:
                lo, hi = rng
                overlaps = any(lo <= k <= hi for k in bkeys)
                assert (path in kept) == overlaps  # exact, both ways
        # never keeps paths that don't exist
        assert kept <= {p for _, p in files}

    check()
