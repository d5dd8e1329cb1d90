"""Shared scaffold for the incremental (batch-over-batch) dedup gates.

Four gates carry the same state lifecycle — IncrementalDeduper (exact
fingerprints), IncrementalNearDeduper (MinHash bands), 
IncrementalSemanticDeduper (cluster-blocked embeddings) and
IncrementalSubstrDeduper (window hashes) — and by r11 each had its own
copy of the machinery: stream-ownership heartbeats guarding compaction,
the None-only-when-never-written state reader, the advisory file-range
sidecar (memoized load, post-compaction write), and the
pruned-read-or-full-scan ladder. The r11 session found the same
NULL-key crash cloned four times across those copies and its verdict
(item 5) ordered the extraction: this module owns the lifecycle ONCE;
the gate modules keep only admission policy.

Everything here is policy-free: no gate semantics, no admission rules —
just state plumbing with the contracts the gates rely on (a pruning
miss only over-reads, a heartbeat guard failure refuses loudly, a state
read returns None only when nothing was ever written).
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Name of the stream-ownership heartbeat file inside a state directory.
#: The leading underscore makes Spark's parquet reader skip it (like
#: _SUCCESS), so it can live at the state root without poisoning reads.
STREAM_HEARTBEAT = "_stream_heartbeat"


def _state_fs(spark: SparkSession, path: str):
    """(fs, Path-factory) for ``path``, or (None, None) under Spark
    Connect. Thin delegate to sources/files.hadoop_fs — heartbeat
    guards and legacy migration are classic-session features, the same
    gate compact_parquet has, and the Connect-detection logic must live
    in exactly one place (r8 review)."""
    from streamy_db_spark.sources.files import hadoop_fs

    return hadoop_fs(spark, path)


def touch_stream_heartbeat(
    spark: SparkSession, state_path: str, only_if_exists: bool = False
) -> None:
    """Record 'a live stream owns this state dir right now'. Called by
    streaming/sinks.near_dedup_sink on EVERY micro-batch; compact_state
    refuses to run while the heartbeat is fresh (see
    ``_guard_compact_vs_stream``), closing the r6 race where a compact's
    write-then-swap could rename state files out from under an in-flight
    ``process_batch``. The file's mtime IS the signal; the epoch-seconds
    content is for humans debugging a refused compaction. No-op under
    Spark Connect, where compact_state cannot run anyway.
    ``only_if_exists`` makes the touch refuse to create the state root
    — periodic keeper RE-touches use it so a background heartbeat can
    never resurrect a state directory its owner deleted (r9 review).
    The refusal is ATOMIC where the filesystem supports
    ``createNonRecursive`` (fails when the parent is missing — no
    check-then-create window); filesystems without it fall back to an
    exists-probe + create, whose microseconds-wide race worst-case is
    an empty directory holding only a heartbeat file, never state."""
    fs, mk = _state_fs(spark, state_path)
    if fs is None:
        return
    p = mk(state_path.rstrip("/") + "/" + STREAM_HEARTBEAT)
    if only_if_exists:
        try:
            out = fs.createNonRecursive(
                p,
                True,
                4096,
                fs.getDefaultReplication(p),
                fs.getDefaultBlockSize(p),
                None,
            )
        except Exception:  # noqa: BLE001
            # parent missing (the refusal working) — or an FS without
            # createNonRecursive, where the non-atomic probe is the
            # documented fallback
            if not fs.exists(mk(state_path)):
                return
            out = fs.create(p, True)
    else:
        out = fs.create(p, True)
    out.write(bytearray(str(int(time.time())), "ascii"))
    out.close()


class stream_heartbeat_keeper:
    """Context manager: re-touch the stream heartbeat every
    ``interval_s`` from a daemon thread while the body runs. Without it
    the guard's freshness window is only as good as the heartbeat
    CADENCE — a micro-batch that runs longer than
    ``stream_heartbeat_max_age_s`` would let a concurrent compact_state
    pass the age check and swap files under the in-flight batch (r8
    review). With the keeper, heartbeat staleness while a batch is
    processing is bounded by ``interval_s`` regardless of batch
    duration. Exceptions in the touch are swallowed (a transient FS
    blip must not kill the batch; the NEXT touch refreshes)."""

    def __init__(self, spark: SparkSession, state_path: str, interval_s: float = 60.0):
        self.spark = spark
        self.state_path = state_path
        self.interval_s = interval_s

    def __enter__(self):
        import threading

        self._stop = threading.Event()

        def beat() -> None:
            while not self._stop.wait(self.interval_s):
                try:
                    # re-touches never resurrect a deleted state dir
                    touch_stream_heartbeat(
                        self.spark, self.state_path, only_if_exists=True
                    )
                except Exception:  # noqa: BLE001 - next beat retries
                    pass

        touch_stream_heartbeat(self.spark, self.state_path)
        self._thread = threading.Thread(target=beat, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        self._thread.join(timeout=5)


def _fs_now_ms(fs, mk, dir_path: str) -> int | None:
    """The FILESYSTEM's clock, read as the mtime of a transient probe
    file created (and immediately deleted) inside ``dir_path``. On
    remote filesystems (HDFS namenode, object stores) the server stamps
    mtimes with ITS clock, not the driver's — comparing a heartbeat
    mtime against driver ``time.time()`` measures clock skew as age
    (skew one way makes a live stream look stale; the other blocks
    compaction indefinitely — r8 advice). A probe written through the
    same filesystem gets the same clock as the heartbeat writer, so the
    difference is a true age. None when the probe cannot be created
    (caller falls back to the driver clock)."""
    import uuid

    probe = mk(dir_path.rstrip("/") + "/_hb_probe_" + uuid.uuid4().hex)
    try:
        fs.create(probe, True).close()
        return fs.getFileStatus(probe).getModificationTime()
    except Exception:  # noqa: BLE001 - degraded mode, not an error
        return None
    finally:
        try:
            fs.delete(probe, False)
        except Exception:  # noqa: BLE001
            pass


def stream_heartbeat_age_s(spark: SparkSession, state_path: str) -> float | None:
    """Seconds since the last stream heartbeat on ``state_path``, or None
    when no heartbeat exists (never streamed, or Spark Connect). 'Now'
    comes from the filesystem's own clock (``_fs_now_ms`` probe file)
    so heartbeat-writer and age-reader use the SAME clock even when the
    filesystem is remote; the driver wall clock is only the fallback
    when the probe cannot be written (e.g. read-only mount), where the
    documented assumption is driver/filesystem skew well under the
    compact guard's ``max_age_s``."""
    fs, mk = _state_fs(spark, state_path)
    if fs is None:
        return None
    p = mk(state_path.rstrip("/") + "/" + STREAM_HEARTBEAT)
    if not fs.exists(p):
        return None
    mtime_ms = fs.getFileStatus(p).getModificationTime()
    now_ms = _fs_now_ms(fs, mk, state_path)
    if now_ms is None:
        now_ms = int(time.time() * 1000)
    return max(0.0, (now_ms - mtime_ms) / 1000.0)


def _guard_compact_vs_stream(
    spark: SparkSession, state_path: str, force: bool, max_age_s: float
) -> None:
    """Refuse to compact state a live stream appears to own. 'Live' =
    heartbeat younger than ``max_age_s`` (default 600 s — micro-batches
    heartbeat every trigger, so a 10-minute-stale heartbeat means the
    stream is stopped or wedged). ``force=True`` overrides for operators
    who KNOW the stream is down (e.g. after a kill whose heartbeat is
    still warm)."""
    if force:
        return
    age = stream_heartbeat_age_s(spark, state_path)
    if age is not None and age < max_age_s:
        raise RuntimeError(
            f"compact_state refused: a stream heartbeat on {state_path} is "
            f"{age:.0f}s old (< {max_age_s:.0f}s). Compacting under a live "
            "near_dedup_sink stream races the write-then-swap against "
            "in-flight process_batch reads. Stop the stream first, or pass "
            "force=True if you know it is down."
        )


def _read_state(spark: SparkSession, path: str) -> DataFrame | None:
    """State reader for incremental dedup: None ONLY when no state has
    ever been written — the path is missing, or is an empty directory
    (e.g. mkdir'd by an orchestrator). Any OTHER failure (corrupt
    footer, permissions, transient FS fault) propagates: swallowing it
    would silently re-admit duplicates against an empty seen-set AND
    append their fingerprints, corrupting state. Delegates to
    sources/files.read_parquet_if_exists (JVM FS probe, Spark Connect
    read-and-classify fallback) so the error-class knowledge lives in
    one place. mergeSchema is ON: state directories EVOLVE (r6 added
    accepted_id / batch_seq columns) and a single arbitrary footer
    would make column visibility — and therefore replay semantics —
    nondeterministic over mixed-version state. Old rows surface the
    new columns as NULL, which every consumer treats as
    'no replay metadata recorded'."""
    from streamy_db_spark.sources.files import read_parquet_if_exists

    return read_parquet_if_exists(spark, path, merge_schema=True)


#: Sentinel: the pruning attempt could not run (missing prerequisite) —
#: distinct from None, which means 'no state / provably zero overlap'.
_PRUNE_UNAVAILABLE = object()


def prune_band_files(
    files: list[tuple[str, str]],
    ranges: dict[str, tuple[str, str]],
    sorted_bkeys: list[str],
) -> list[str]:
    """The pure pruning decision behind the near-dedup probe's
    file-level state pruning (``_bands_state_for_probe``): which of the
    actual bands/ ``files`` [(basename, full_path)] must be read for a
    batch touching ``sorted_bkeys`` (ascending), given the
    compaction-time per-file [min, max] ``ranges``.

    Contract (hypothesis-tested in tests/test_probe_pruning.py):

    - a file absent from ``ranges`` is ALWAYS kept (unindexed append or
      stale index — must read);
    - an indexed file is kept iff some batch bkey lies in its
      [min, max] (binary search: first bkey ≥ min, then ≤ max?);
    - therefore NO file that can contain a batch bkey is ever dropped —
      pruning only over-reads, never misses candidates.

    Driver-side O(F log B); both F (state files) and B (≤ 4 ×
    prune_max_docs batch band keys) are bounded."""
    import bisect

    keep: list[str] = []
    for name, path in files:
        rng = ranges.get(name)
        if rng is None:
            keep.append(path)  # unindexed: must read
            continue
        lo, hi = rng
        i = bisect.bisect_left(sorted_bkeys, lo)
        if i < len(sorted_bkeys) and sorted_bkeys[i] <= hi:
            keep.append(path)
    return keep


def _attempt_pruned_read(
    spark,
    data_path: str,
    ranges: dict | None | Callable[[], dict | None],
    sorted_keys,
    min_indexed_files: int,
):
    """The pruning attempt every file-range-indexed gate shares (exact
    fingerprint state, near-dup bands/ and ids-adjacent scans, semantic
    accepted/, substring wins//dup/) — one implementation so a fix to
    the degradation ladder cannot silently miss a sibling gate (the r11
    review found this scaffold copied four times).

    Returns ``(result, accounting)``:

    - ``(_PRUNE_UNAVAILABLE, None)`` — the full scan must run (Connect
      session, unusable/absent index, listing failure, fewer than
      ``min_indexed_files`` indexed live files);
    - ``(None, None)`` — no state rows exist at all (never written, or
      an empty/_SUCCESS-only directory);
    - ``(None, accounting)`` — pruning PROVED zero overlap;
    - ``(DataFrame, accounting)`` — the pruned mergeSchema read over
      exactly the keep-files (the full-directory frame is never
      constructed: its mergeSchema analysis alone is a footer job over
      every state file — r9 review).

    ``sorted_keys`` may be the ascending key list or a zero-arg
    callable producing it — the callable is invoked only after the
    cheap prerequisites pass, so degraded outcomes never pay the
    key-collect Spark job. ``ranges`` takes the same two forms for the
    same reason: a Connect session (no FS handle) must return before
    the index-sidecar parquet read is issued, exactly as the pre-hoist
    inline code did."""
    fs, mk = _state_fs(spark, data_path)
    if fs is None:
        return _PRUNE_UNAVAILABLE, None
    if callable(ranges):
        ranges = ranges()
    if ranges is None:
        return _PRUNE_UNAVAILABLE, None
    try:
        if not fs.exists(mk(data_path)):
            return None, None  # never written
        listing = fs.listStatus(mk(data_path))
    except Exception:  # noqa: BLE001 - degraded mode: full scan
        return _PRUNE_UNAVAILABLE, None
    files = [
        (st.getPath().getName(), st.getPath().toString())
        for st in listing
        if st.isFile() and st.getPath().getName().endswith(".parquet")
    ]
    if not files:
        return None, None  # empty dir (e.g. _SUCCESS only): no rows
    if sum(1 for name, _ in files if name in ranges) < min_indexed_files:
        # nothing (or too little) can be skipped: the key-collect job
        # would cost more than the reads it saves
        return _PRUNE_UNAVAILABLE, None
    keys = sorted_keys() if callable(sorted_keys) else sorted_keys
    keep = prune_band_files(files, ranges, keys)
    accounting = {
        "files_total": len(files),
        "files_read": len(keep),
        "files_pruned": len(files) - len(keep),
    }
    if not keep:
        return None, accounting
    return spark.read.option("mergeSchema", "true").parquet(*keep), accounting


def _load_file_range_index(spark, index_path: str, key_col: str):
    """A file-range index sidecar as {file basename: (min, max)}, or
    None when unusable (absent, torn by a killed compaction,
    unreadable). ADVISORY by contract: any failure costs a full scan,
    never a failed micro-batch. Shared by the lexical gate (bands_index,
    key bkey) and the semantic gate (accepted_index, key cluster_id)."""
    try:
        index = _read_state(spark, index_path)
        if index is None:
            return None
        # a file whose min/max came out NULL (all-null keys — min/max
        # skip nulls) is unindexable: omit its entry so it reads as
        # unindexed (always-read), instead of poisoning the bisect in
        # prune_band_files with None bounds
        out = {}
        for r in index.collect():
            lo, hi = r["min_" + key_col], r["max_" + key_col]
            if lo is not None and hi is not None:
                out[r["file"]] = (lo, hi)
        return out
    except Exception:  # noqa: BLE001 - advisory sidecar: degrade
        return None


def _write_file_range_index(
    spark, state_root: str, data_path: str, index_path: str, key_col: str
) -> None:
    """Persist per-file (min, max) of ``key_col`` over the (just
    re-clustered) ``data_path`` to the ``index_path`` sidecar. Written
    AFTER the compaction swap on purpose: a crash in between leaves an
    index naming vanished files, which degrades to a full scan, never a
    missed candidate. One row per state file; the scan is free in
    context — compaction just rewrote every row anyway."""
    data = _read_state(spark, data_path)
    fs, mk = _state_fs(spark, state_root)
    if data is None:
        if fs is not None:  # drop a stale index alongside dead state
            fs.delete(mk(index_path), True)
        return
    (
        data.groupBy(
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias("file")
        )
        .agg(
            F.min(key_col).alias("min_" + key_col),
            F.max(key_col).alias("max_" + key_col),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(index_path)
    )


class StateComponent:
    """One append-only parquet state directory plus its advisory
    file-range sidecar and the per-instance range memo.

    A gate's state is one or more of these (exact: fingerprints; near:
    ids/ + bands/; semantic: accepted/; substring: ids/ + wins/ + dup/).
    Each component owns the full lifecycle for its directory:

    - ``read()`` — the None-only-when-never-written full scan;
    - ``ranges()`` — the memoized advisory sidecar ({file: (min, max)});
    - ``scan_or_full(keys, min_indexed)`` — the pruned-read ladder with
      the full-scan fallback (the _attempt_pruned_read contract: a
      prune never loses a hit, any missing prerequisite degrades to the
      full directory read);
    - ``compact(...)`` — the guarded write-then-swap rewrite, clustered
      on ``cluster_cols``, followed by the sidecar rewrite and the memo
      invalidation (in that order: a crash between swap and index write
      leaves a stale sidecar, which over-reads, never misses).

    The memo staleness argument is per-instance: the sidecar only
    changes under THIS instance's ``compact()``, which invalidates it;
    a stale cache in another instance only over-reads.
    """

    def __init__(
        self,
        spark: SparkSession,
        data_path: str,
        index_path: str,
        key_col: str,
        cluster_cols: list[str] | None = None,
    ):
        self.spark = spark
        self.data_path = data_path
        self.index_path = index_path
        self.key_col = key_col
        self.cluster_cols = cluster_cols or [key_col]
        # "unset" = not yet loaded; None = no usable index; dict = ranges
        self._cache: dict | None | str = "unset"

    def read(self) -> DataFrame | None:
        return _read_state(self.spark, self.data_path)

    def ranges(self) -> dict | None:
        if self._cache != "unset":
            return self._cache
        self._cache = _load_file_range_index(
            self.spark, self.index_path, self.key_col
        )
        return self._cache

    def invalidate(self) -> None:
        self._cache = "unset"

    def attempt_pruned(self, sorted_keys, min_indexed_files: int):
        """Raw ``_attempt_pruned_read`` over this component — returns
        ``(result, accounting)`` with the sentinel contract documented
        there. Gates that need the sentinel (to distinguish
        degraded-to-full from proved-empty) call this; most want
        ``scan_or_full``."""
        return _attempt_pruned_read(
            self.spark,
            self.data_path,
            self.ranges,
            sorted_keys,
            min_indexed_files,
        )

    def scan_or_full(self, sorted_keys, min_indexed_files: int):
        """``(df_or_none, accounting_or_none)``: the pruned read when
        the advisory sidecar allows it, the full-directory read
        otherwise. ``sorted_keys`` is the ascending batch key list, a
        zero-arg callable producing it (invoked only after the cheap
        prerequisites pass), or None to skip the attempt outright (the
        caller's prune_max bound said the batch would saturate every
        range anyway). ``accounting`` is non-None exactly when pruning
        RAN ({files_total, files_read, files_pruned}) — the observable
        the pruning tests gate on."""
        if sorted_keys is not None:
            res, acct = self.attempt_pruned(sorted_keys, min_indexed_files)
            if res is not _PRUNE_UNAVAILABLE:
                return res, acct
        return self.read(), None

    def compact(
        self,
        state_root: str,
        target_file_mb: int,
        min_files: int,
        pre_swap_check,
        transform=None,
        skip_if_empty: bool = True,
    ) -> int:
        """Guarded compaction of this component + sidecar rewrite. The
        caller supplies ``pre_swap_check`` (normally the heartbeat
        re-check closure) and the gate's state root (the sidecar write
        resolves its filesystem from it). Returns the output file
        count (0 when the component has no state — the sidecar is
        still refreshed then, which drops a stale index left beside
        dead/deleted state)."""
        from streamy_db_spark.sources.files import compact_parquet

        if skip_if_empty and self.read() is None:
            self.write_index(state_root)
            return 0
        n = compact_parquet(
            self.spark,
            self.data_path,
            target_file_mb,
            cluster_cols=self.cluster_cols,
            dedupe_rows=True,
            merge_schema=True,
            min_files=min_files,
            pre_swap_check=pre_swap_check,
            transform=transform,
        )
        self.write_index(state_root)
        return n

    def write_index(self, state_root: str) -> None:
        """Rewrite the advisory sidecar from the current directory
        contents and invalidate the memo — also the repair for a stale
        index beside dead/deleted state (the underlying write deletes
        the sidecar when no state rows exist)."""
        self.invalidate()
        _write_file_range_index(
            self.spark,
            state_root,
            self.data_path,
            self.index_path,
            self.key_col,
        )


def membership_hits(
    state: DataFrame,
    keys: DataFrame,
    key_col: str,
    extra_cols: tuple[str, ...] = ("batch_seq",),
    broadcast: bool = True,
) -> DataFrame:
    """State rows whose ``key_col`` is in ``keys`` (one column, one row
    per key): the membership/replay lookup every gate runs, as ONE
    state scan with the state side STREAMED through a hash join against
    the (broadcast) batch key set — no Exchange on the state side, so
    probe traffic is O(batch), not O(state), per micro-batch (the r8 v2
    broadcast-probe discipline; plan-gated per gate in
    tests/test_incremental_*.py). ``broadcast=False`` is the oversized
    backfill-batch fallback (same verdicts, shuffle join).
    ``extra_cols`` are kept only where present — state written before a
    column existed surfaces it as NULL via the mergeSchema read and the
    caller treats NULL as 'no replay metadata recorded'."""
    cols = [key_col] + [c for c in extra_cols if c in state.columns]
    if broadcast:
        keys = F.broadcast(keys)
    return state.select(*cols).join(keys, key_col)


def compact_guard(
    spark: SparkSession, state_path: str, force: bool, max_age_s: float
):
    """The heartbeat re-check closure every gate's compact_state passes
    as ``pre_swap_check``: re-validated immediately before each swap so
    a stream that came alive DURING the rewrite aborts the swap instead
    of racing it (r9 second review)."""

    def _recheck() -> None:
        _guard_compact_vs_stream(spark, state_path, force, max_age_s)

    return _recheck
