"""Incremental (batch-over-batch) exact deduplication.

Real corpora arrive in waves — daily crawls, ingest partitions — and a
pipeline must answer "is this document new?" against everything already
accepted WITHOUT re-reading the accepted corpus text. The state that
makes that possible is the fingerprint set: 16 bytes per accepted
document, stored as parquet, appended once per batch.

Scale shape: the seen-set is corpus-sized (NOT broadcastable — a
billion docs is ~16 GB of digests), so the membership check is a
shuffle anti-join keyed on the digest. Digest keys are uniform by
construction (md5), so the join never skews; the traffic is
16 bytes + id per NEW row, independent of document length, and the
accepted corpus' text is never touched again. Within-batch duplicates
collapse first (min-id per fingerprint) so a batch containing its own
copies admits exactly one.

The same pattern runs under Structured Streaming as
``dropDuplicates`` on the fingerprint column with the state store
holding the seen-set; the batch form here is the replayable/backfill
anchor (same fingerprints, same verdicts).

No reference counterpart (SURVEY.md §2.3 — no text surface); extends
the training-data dedup family (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamy_db_spark.operators.dedup import dedupe_exact, fingerprint_documents
from streamy_db_spark.operators.incremental_base import (  # noqa: F401
    # re-used here AND part of this module's historical import surface
    # (tests and streaming/sinks import several of these from here)
    _PRUNE_UNAVAILABLE,
    _read_state,
    _state_fs,
    STREAM_HEARTBEAT,
    StateComponent,
    compact_guard,
    membership_hits,
    prune_band_files,
    stream_heartbeat_age_s,
    stream_heartbeat_keeper,
    touch_stream_heartbeat,
)

class IncrementalDeduper:
    """Exact-dedup gate with a parquet-backed seen-fingerprint set.

    ``process_batch(docs)`` returns the accepted (novel) rows and
    appends their (fingerprint, accepted_id) pairs to the state path.
    Crash safety: the state append is atomic per batch directory
    write, and a crash AFTER the append but before the caller consumed
    the output is recoverable — re-running the batch RE-EMITS every row
    whose (fingerprint, id) pair matches a recorded acceptance FROM THE
    SAME ``batch_id``, so the replay reproduces the original output
    instead of silently dropping documents whose fingerprints already
    block them; re-sends in later batches are dropped, never
    duplicated (r6 review; the same contract IncrementalNearDeduper
    keeps). Duplicate state rows from replayed appends cost space,
    never correctness — membership is an EXISTS.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        id_col: str = "doc_id",
        broadcast_batch_max_docs: int = 2_000_000,
        prune_max_docs: int = 50_000,
        prune_min_indexed_files: int = 4,
    ):
        self.spark = spark
        self.state_path = state_path.rstrip("/")
        self.id_col = id_col
        # a probe key is one 32-hex fingerprint (~44 B on the wire) —
        # the default caps the broadcast at ~90 MB; micro-batches are
        # far below it, giant backfill batches fall back to the
        # shuffle join (use one-shot dedupe_exact for those instead)
        self.broadcast_batch_max_docs = broadcast_batch_max_docs
        # File-level probe pruning (the near gate's bands_index
        # discipline): compact_state clusters the state on fingerprint
        # and persists per-file [min, max] ranges to a SIBLING sidecar
        # (the state dir itself is a flat parquet directory — a nested
        # sidecar would be swept into the state read). md5 fingerprints
        # are uniform, so pruning only bites while the batch's distinct
        # fingerprints are fewer than the state's files — exactly the
        # streaming micro-batch shape; backfill batches saturate every
        # range and take the full scan via ``prune_max_docs``.
        self.prune_max_docs = prune_max_docs
        self.prune_min_indexed_files = prune_min_indexed_files
        self.last_probe_scan: dict | None = None
        # shared lifecycle scaffold (incremental_base.StateComponent):
        # directory + sidecar + memo + pruned-read ladder in one place
        self._fp = StateComponent(
            self.spark,
            self.state_path,
            self.state_path + ".fingerprint_index",
            "fingerprint",
        )

    def _seen(self) -> DataFrame | None:
        return self._fp.read()

    def _probe_hits(
        self, fp: DataFrame, n_batch_docs: int
    ) -> DataFrame | None:
        """State rows matching this batch's fingerprints — ONE state
        scan with the state side STREAMED through a hash join against
        the batch's (broadcast) distinct fingerprints, so there is no
        Exchange on the state side and probe traffic is O(batch), not
        O(state), per micro-batch. (v1 distinct'd and anti-joined the
        ENTIRE seen-set every batch — a full-state shuffle per
        micro-batch at 1B accepted docs; this is the near gate's r8 v2
        broadcast-probe discipline applied to the exact gate.) Both the
        novelty verdict (EXISTS over the hit fingerprints) and the
        replay lookup ((fingerprint, accepted_id, batch_seq) match)
        derive from this one small frame. Batches above
        ``broadcast_batch_max_docs`` (backfill shape) fall back to the
        shuffle join — same verdicts, different physical plan
        (plan-gated in tests/test_incremental_dedup.py). None when no
        state has ever been written, or when file pruning PROVES no
        state file can contain a batch fingerprint (all-novel batch).

        The state scan is FILE-PRUNED when the compaction-time
        fingerprint-range index allows it (``_state_for_probe``):
        files read per micro-batch scale with the batch's distinct
        fingerprints, not accepted-state size, whenever the batch is
        smaller than the state's file count."""
        seen = self._state_for_probe(fp, n_batch_docs)
        if seen is None:
            return None
        # fp is the fingerprinted output of dedupe_exact — one row per
        # fingerprint by construction, so no distinct (and no batch-side
        # Exchange) is needed before the broadcast
        return membership_hits(
            seen,
            fp.select("fingerprint"),
            "fingerprint",
            extra_cols=("accepted_id", "batch_seq"),
            broadcast=n_batch_docs <= self.broadcast_batch_max_docs,
        )

    def _state_for_probe(
        self, fp: DataFrame, n_batch_docs: int
    ) -> DataFrame | None:
        """The state scan for this batch's probe, file-pruned via the
        compaction-time fingerprint-range sidecar when possible. Never
        loses a hit, only over-reads (the bands_index contract,
        _bands_state_for_probe): unindexed files are always read, an
        indexed file's [min, max] brackets every fingerprint it holds,
        and any prerequisite failure (Connect session, no/corrupt
        index, listing error, oversized batch) degrades to the full
        directory scan. Membership AND replay correctness both survive
        pruning: every state row whose fingerprint is in the batch
        lives in a kept file by construction, and rows in pruned files
        cannot join the batch on fingerprint at all.
        ``last_probe_scan`` records the accounting when pruning ran."""
        self.last_probe_scan = None
        keys = None
        if 0 < n_batch_docs <= self.prune_max_docs:
            # fp is one row per fingerprint (dedupe_exact output) and
            # bounded by prune_max_docs, so the key collect ships
            # ≤ ~50k 32-hex strings. NULL keys (null text -> null
            # fingerprint) never join and are uncomparable in the
            # sort: exclude them — exact, since no state row can
            # equi-join a null key.
            keys = lambda: sorted(  # noqa: E731
                r["fingerprint"]
                for r in fp.select("fingerprint").collect()
                if r["fingerprint"] is not None
            )
        df, acct = self._fp.scan_or_full(keys, self.prune_min_indexed_files)
        if acct is not None:
            self.last_probe_scan = acct
        return df

    def _index_ranges(self) -> dict[str, tuple[str, str]] | None:
        """The fingerprint_index sidecar as {file basename: (min, max)},
        memoized per instance (StateComponent.ranges; invalidated by
        this instance's compact_state); None when unusable — advisory,
        a miss costs a full scan."""
        return self._fp.ranges()

    def process_batch(
        self, docs: DataFrame, batch_id: int | None = None
    ) -> DataFrame:
        """Accept the novel documents of this batch (within-batch dups
        collapse to the min-id row first), persist their fingerprints,
        and return the accepted rows (without the fingerprint column).

        ``batch_id`` (optional, monotone ≥ 0) disambiguates crash-replay
        from upstream re-send, exactly as in IncrementalNearDeduper: a
        (fingerprint, id) acceptance recorded under THIS batch_id is
        re-emitted (replay reproduces its original output); one recorded
        under an EARLIER batch is an at-least-once re-send — e.g. an
        unchanged page on the next crawl — and is dropped, never
        duplicated. Without ``batch_id`` (or over pre-batch_seq state)
        any (fingerprint, id) match re-emits, which is only safe when
        the upstream never re-sends an accepted doc in a later batch.
        The fingerprinted batch, the state-probe hits, and the tagged
        output each materialize through one localCheckpoint, so the md5
        scan runs once, the state files are read once (and never
        lazily — the output survives a subsequent compact_state), and
        the state append cannot re-trigger a scan that would see its
        own output."""
        if batch_id is not None and batch_id < 0:
            raise ValueError(f"batch_id must be >= 0, got {batch_id}")
        # reset the scan accounting at ENTRY, not only inside the probe:
        # early exits (empty trigger) must not leave the previous
        # batch's file accounting attributed to a batch that read
        # nothing (the r9 rule the sibling gates follow)
        self.last_probe_scan = None
        if docs.isEmpty():
            # empty trigger: nothing to admit, nothing to append — skip
            # the fingerprint scan and the state append, which would
            # otherwise leave one empty commit file per empty
            # micro-batch (r8 review)
            return docs.localCheckpoint(eager=True)
        fp = fingerprint_documents(
            dedupe_exact(docs, self.id_col)
        ).localCheckpoint(eager=True)
        hits = self._probe_hits(fp, fp.count())
        if hits is None:
            tagged = fp.withColumn("__novel", F.lit(True))
        else:
            # ≤ batch-sized (state rows whose fingerprint is in the
            # batch; replay-duplicated appends add bounded copies) —
            # checkpointed so the novelty anti-join and the replay
            # lookup below share ONE state scan
            hits = hits.localCheckpoint(eager=True)
            if "accepted_id" in hits.columns:
                acc = hits
                if batch_id is not None and "batch_seq" in hits.columns:
                    acc = acc.filter(F.col("batch_seq") == int(batch_id))
                acc = acc.select(
                    "fingerprint", F.col("accepted_id").alias(self.id_col)
                ).distinct()
                replayed = fp.join(acc, ["fingerprint", self.id_col])
            else:
                replayed = fp.limit(0)
            novel = fp.join(
                hits.select("fingerprint").distinct(),
                "fingerprint",
                "left_anti",
            )
            tagged = novel.withColumn("__novel", F.lit(True)).unionByName(
                replayed.withColumn("__novel", F.lit(False))
            )
        tagged = tagged.localCheckpoint(eager=True)
        novel_rows = tagged.filter(F.col("__novel"))
        # skip the append entirely when nothing was admitted (all-replay
        # or all-duplicate batches): an empty append still commits an
        # empty file to the state dir on every such batch (r8 review);
        # the isEmpty probe is one tiny job over the checkpointed frame
        if not novel_rows.isEmpty():
            novel_rows.select(
                "fingerprint",
                F.col(self.id_col).alias("accepted_id"),
                F.lit(-1 if batch_id is None else int(batch_id))
                .cast("long")
                .alias("batch_seq"),
            ).write.mode("append").parquet(self.state_path)
        return tagged.drop("fingerprint", "__novel")

    def seen_count(self) -> int:
        """Distinct accepted fingerprints (driver-sized scalar)."""
        seen = self._seen()
        return 0 if seen is None else seen.select("fingerprint").distinct().count()

    def compact_state(
        self,
        target_file_mb: int = 128,
        force: bool = False,
        stream_heartbeat_max_age_s: float = 600.0,
        min_files: int = 1,
    ) -> int:
        """Rewrite the append-only state into ~``target_file_mb`` files.
        Every process_batch appends its own parquet directory commit, so
        a long-running ingest accumulates one small file (or more) per
        batch — the classic small-files problem (sources/files
        compact_parquet docstring). Also drops exact-duplicate
        fingerprints left by crash-replayed appends, CLUSTERS the
        rewrite on fingerprint (disjoint per-file ranges), and persists
        those ranges to the fingerprint_index sidecar so the per-batch
        probe can skip files that cannot hold a batch fingerprint
        (``_state_for_probe``; index written AFTER the swap — a crash
        in between leaves a stale index, which degrades to a full scan,
        never a missed hit). Run it on whatever cadence keeps state
        file counts sane (e.g. nightly); admission verdicts are
        unaffected (membership is an EXISTS over a set).
        mergeSchema on: the state schema evolved across versions and a
        single-footer read could silently strip the newer
        replay-metadata columns (r6 review). Refuses to run while a
        stream heartbeat on this state dir is fresh (see
        incremental_base._guard_compact_vs_stream) unless ``force``.
        Returns the
        output file count."""
        _recheck = compact_guard(
            self.spark, self.state_path, force, stream_heartbeat_max_age_s
        )
        _recheck()
        return self._fp.compact(
            self.state_path,
            target_file_mb,
            min_files,
            _recheck,
            # this gate's compact has always run unconditionally (its
            # state root IS the data dir, created on first append)
            skip_if_empty=False,
        )


# --- incremental NEAR-dup dedup (batch-over-batch MinHash admission) ---------


class IncrementalNearDeduper:
    """Batch-over-batch MinHash-LSH near-dup admission (r5 verdict item
    4): "is this document a near-duplicate of anything already
    accepted?" without re-reading accepted text.

    State per accepted doc: the 16-element MinHash signature (16 × 8 B)
    plus its 4 LSH band keys — parquet, appended once per batch,
    rewritten only by ``compact_state``. Admission for a new batch:

    1. rows whose doc_id is already in state were accepted before; with
       a ``batch_id`` (state column ``batch_seq``) a crash-replay of
       the SAME batch re-emits them verbatim while a re-send in a LATER
       batch is dropped — see process_batch's docstring (the contract
       the streaming ``near_dedup_sink`` twin's per-batch overwrite
       sink relies on);
    2. docs with no shingles (< SHINGLE_W tokens) are accepted verbatim
       — under shingle Jaccard they cannot be a near-dup of anything —
       and persisted with a NULL signature and empty band set, so a
       later re-send of a short doc drops like any other accepted id
       while never producing candidate edges;
    3. candidate edges: batch↔batch and batch↔accepted pairs sharing a
       band bucket (same band index, same band hash — the standard LSH
       probe), verified by signature agreement ≥ ``sig_threshold``
       (matching components / 16, the unbiased MinHash Jaccard
       estimate). Signature agreement rather than exact shingle Jaccard
       is what makes the state O(1) per doc: text never re-enters the
       pipeline;
    4. connected components over those edges; a component containing ANY
       accepted doc is contaminated and all its batch members are
       rejected (they would have folded into that doc's group in a
       one-shot dedup); a clean component keeps its min-doc_id member;
       edge-free docs are accepted.

    State layout (v2, this round — closing the r6/r7 verdict's one
    standing 100×-scale killer):

    - ``<state>/ids``    — (doc_id, batch_seq): membership + replay.
    - ``<state>/bands``  — (bkey, doc_id, sig): the probe side, stored
      PRE-EXPLODED (bkey = "<band>:<band_hash>", one row per band per
      accepted doc) so no per-batch posexplode of the corpus state ever
      runs again. ``compact_state`` re-clusters it on bkey.
    - ``<state>/bands_index`` — (file, min_bkey, max_bkey): sidecar
      written by ``compact_state`` (r9); the probe prunes bands/ files
      whose bkey range holds none of the batch's band keys, so files
      READ per micro-batch scale with the batch's bucket coverage, not
      accepted-state size (``_bands_state_for_probe``). Advisory only:
      a missing/stale index degrades to the full scan.

    Scale shape of the probe: the batch side (micro-batch-sized by
    construction) is BROADCAST into a hash join whose streamed side is
    the state scan — the accepted-corpus state is read map-side and
    never shuffled, so probe traffic is O(batch), not O(state), per
    micro-batch (v1 posexploded and shuffle-joined the ENTIRE state
    every batch — a full-state exchange per micro-batch at 1B docs).
    Batches too large to broadcast (``broadcast_batch_max_docs``, a
    backfill shape — use the one-shot minhash path for those instead)
    fall back to the shuffle join. Hot boilerplate buckets in the STATE
    are bounded by admission itself: the first accepted copy blocks the
    rest, so a bucket holds at most a handful of accepted near-dups.
    Within-batch edges use a batch×batch banded join, never all-pairs.
    Components run on the batch's edge set only (batch-sized, not
    corpus-sized).

    Semantics note (documented, tested): admission is ingestion-order
    greedy. One-shot dedup over the concatenated corpus can link two
    EARLIER-accepted docs through a LATER bridge doc and collapse them
    into one group; the incremental gate has already accepted both by
    the time the bridge arrives, so it rejects the bridge and keeps
    both. The serial greedy model in
    tests/test_incremental_near_dedup.py IS the contract; on
    bridge-free corpora it coincides with one-shot
    minhash pairs + connected-components keepers.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        id_col: str = "doc_id",
        sig_threshold: float = 0.5,
        broadcast_batch_max_docs: int = 200_000,
        prune_max_docs: int = 50_000,
        prune_min_indexed_files: int = 4,
    ):
        self.spark = spark
        self.state_path = state_path
        self.id_col = id_col
        self.sig_threshold = sig_threshold
        # ~700 B of broadcast payload per shingled doc (4 × (bkey 35 B +
        # sig 128 B + id 8 B)); the default caps the broadcast at
        # ~140 MB — micro-batches are far below it, giant backfill
        # batches fall back to the shuffle join.
        self.broadcast_batch_max_docs = broadcast_batch_max_docs
        # File-level probe pruning is attempted for batches up to this
        # size (collecting ≤ 4×N distinct bkeys to the driver, ~35 B
        # each — 50k docs ⇒ ≤7 MB). Above it the batch's band coverage
        # saturates every file range anyway (uniform md5 keys), so the
        # collect would be pure overhead. 0 disables pruning.
        self.prune_max_docs = prune_max_docs
        # ...and only when at least this many LIVE files are indexed:
        # the attempt costs one per-trigger Spark job (batch bkey
        # explode + distinct + collect), which can only pay for itself
        # by skipping indexed files — a tiny or freshly-crashed state
        # (stale index: 0 live indexed files until the next compaction)
        # takes the plain full scan with no accounting instead (r9
        # second review).
        self.prune_min_indexed_files = prune_min_indexed_files
        #: Scan accounting of the LAST probe (None when the last probe
        #: did not attempt pruning): {"files_total", "files_read",
        #: "files_pruned"} — the observable tests/test_probe_pruning.py
        #: gates on.
        self.last_probe_scan: dict | None = None
        #: Scan accounting of the LAST ids/ membership lookup (None
        #: when it did not attempt pruning) — separate from the bands
        #: accounting above so neither clobbers the other's observable.
        self.last_ids_scan: dict | None = None
        self._ids_path = state_path.rstrip("/") + "/ids"
        self._bands_path = state_path.rstrip("/") + "/bands"
        # shared lifecycle scaffold (incremental_base.StateComponent):
        # each component owns its directory, sidecar, memo and the
        # pruned-read ladder; the gate keeps only admission policy
        self._comp = {
            "ids": StateComponent(
                self.spark,
                self._ids_path,
                state_path.rstrip("/") + "/ids_index",
                "doc_id",
            ),
            "bands": StateComponent(
                self.spark,
                self._bands_path,
                state_path.rstrip("/") + "/bands_index",
                "bkey",
            ),
        }
        self._legacy_checked = False

    def _ids_hits(
        self, ids: DataFrame, bkeys: DataFrame, broadcast: bool
    ) -> DataFrame:
        """ids/ state rows whose doc_id is in ``bkeys`` (the batch's
        distinct ids, one column ``doc_id``): the membership/replay
        lookup's ONE state scan, state side streamed, batch side
        broadcast under ``broadcast_batch_max_docs`` (shuffle-join
        fallback above — backfill shape). Output is ≤ batch-sized (plus
        bounded replay-duplicated rows), so every membership-derived
        frame downstream is batch-sized. Plan-gated in
        tests/test_incremental_near_dedup.py."""
        return membership_hits(ids, bkeys, "doc_id", broadcast=broadcast)

    def _ids(self) -> DataFrame | None:
        self._migrate_legacy_state()
        return self._comp["ids"].read()

    def _ids_for_probe(self, bkeys: DataFrame, n_keys: int) -> DataFrame | None:
        """The ids/ scan for the membership/replay lookup, FILE-PRUNED
        via the compaction-time doc_id-range sidecar (ids_index/) when
        possible — doc ids are usually quasi-ordered (crawl sequence),
        so id ranges prune far better than the hashed band keys do.
        None when no ids/ state exists OR pruning proves no state file
        can hold a batch id (membership and replay both provably
        empty). Same never-loses-a-hit ladder as the other sidecars
        (incremental_base._attempt_pruned_read). ``last_ids_scan``
        records accounting
        when pruning ran."""
        self._migrate_legacy_state()
        self.last_ids_scan = None
        keys = None
        if 0 < n_keys <= self.prune_max_docs:
            # NULL ids never equi-join and break the sort: exclude
            keys = lambda: sorted(  # noqa: E731
                r["doc_id"] for r in bkeys.collect() if r["doc_id"] is not None
            )
        df, acct = self._comp["ids"].scan_or_full(
            keys, self.prune_min_indexed_files
        )
        if acct is not None:
            self.last_ids_scan = acct
        return df

    def _state_bands(self) -> DataFrame | None:
        self._migrate_legacy_state()
        return _read_state(self.spark, self._bands_path)

    def _migrate_legacy_state(self) -> None:
        """One-time v1→v2 state rewrite. v1 (≤ r7) stored one flat
        parquet dir of (doc_id, sig, bands[, batch_seq]) rows at the
        state root; v2 splits it into ids/ + pre-exploded bands/ (class
        docstring). Crash-safe: the subdir writes are OVERWRITE and a
        ``_migrated`` marker lands before any legacy file is deleted, so
        a crash mid-write re-runs the full rewrite from the intact
        legacy files, and a crash mid-delete skips the rewrite (marker
        present) and only finishes the deletes — no partial-legacy
        re-migration can ever drop rows. The migration itself is
        classic-session-only (Hadoop FS listing + renames); Connect
        sessions DETECT legacy state and refuse (below). The probe
        memoizes per instance: legacy files can only exist BEFORE this
        instance's first state access (every writer since v2 writes
        subdirs), so one root listing per deduper suffices.

        Deployment constraint (documented, not detectable): retire every
        v1 writer BEFORE any v2 reader touches the state. A v1 writer
        that appends flat files AFTER v2 state exists would trigger a
        fresh migration whose OVERWRITE discards the v2 appends — the
        overwrite is what makes crash-recovery idempotent (no v2 append
        can exist mid-migration from this codebase, because appends only
        run after migration completes), so mixed-version concurrent
        writers are out of contract.

        Spark Connect sessions cannot MIGRATE (no Hadoop FS handle for
        the rename/delete protocol) but they can — and must — DETECT
        legacy state: v1 ``process_batch`` fully supported Connect, so a
        flat v1 state dir written by a Connect deployment is a
        legitimate artifact, and silently proceeding as if state were
        empty would re-admit previously-accepted near-duplicates while
        appending v2 subdirs next to the un-migrated flat files (a later
        classic-session migration would then OVERWRITE those appends
        away — r8 advice). Detection is a glob read of ``*.parquet`` at
        the state ROOT (matches only flat legacy files, never the v2
        subdirs); any hit raises with instructions to migrate from a
        classic session first."""
        if self._legacy_checked:
            return
        fs, mk = _state_fs(self.spark, self.state_path)
        if fs is None:
            from pyspark.errors import AnalysisException

            from streamy_db_spark.sources.files import is_missing_path_error

            glob = self.state_path.rstrip("/") + "/*.parquet"
            try:
                self.spark.read.parquet(glob).schema  # force analysis
            except AnalysisException as exc:
                if is_missing_path_error(exc):
                    # no flat files at the root: state is absent or
                    # already v2 — same memoization contract as the
                    # classic branch (every writer since v2 writes
                    # subdirs, so legacy can only predate first access)
                    self._legacy_checked = True
                    return
                raise
            raise RuntimeError(
                f"legacy (v1 flat) near-dedup state detected at "
                f"{self.state_path}: this Spark Connect session cannot "
                "run the v1->v2 migration (no filesystem handle for its "
                "crash-safe rename protocol). Run any state access from "
                "a classic (JVM-attached) session once to migrate, then "
                "retry here."
            )
        root = mk(self.state_path)
        if not fs.exists(root):
            # nothing written yet — but a LATER first write is still v2,
            # so the memoized verdict stands
            self._legacy_checked = True
            return
        legacy = [
            st.getPath()
            for st in fs.listStatus(root)
            if st.isFile() and st.getPath().getName().endswith(".parquet")
        ]
        marker = mk(self.state_path.rstrip("/") + "/_migrated")
        if not legacy:
            # a marker with no legacy files = a migration that crashed
            # between its last file delete and the marker delete. It
            # must not outlive this moment: if flat-state files ever
            # land here again (old-version writer, backup restore), a
            # stale marker would make the next migration DELETE them
            # without rewriting — silent state loss (r8 review).
            if fs.exists(marker):
                fs.delete(marker, False)
            self._legacy_checked = True
            return
        if not fs.exists(marker):
            old = self.spark.read.option("mergeSchema", "true").parquet(
                *[p.toString() for p in legacy]
            )
            if "batch_seq" not in old.columns:
                old = old.withColumn("batch_seq", F.lit(-1).cast("long"))
            old.select("doc_id", "batch_seq").write.mode("overwrite").parquet(
                self._ids_path
            )
            old.select(
                "doc_id", "sig", F.posexplode("bands").alias("band", "bh")
            ).select(
                F.concat_ws(
                    ":", F.col("band").cast("string"), F.col("bh")
                ).alias("bkey"),
                "doc_id",
                "sig",
            ).write.mode("overwrite").parquet(self._bands_path)
            fs.create(marker, True).close()
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if st.isFile() and (name.endswith(".parquet") or name == "_SUCCESS"):
                fs.delete(st.getPath(), False)
        fs.delete(marker, False)
        self._legacy_checked = True  # only after a COMPLETE migration —
        # a failure above leaves the flag unset so the next access retries

    def _sig_table(self, docs: DataFrame) -> DataFrame:
        from streamy_db_spark.operators.minhash import (
            band_hashes,
            minhash_signature,
            with_shingles,
        )
        from streamy_db_spark.sources.tables import spread

        # spread before the shingle+signature fold (r13, guide §2.6):
        # a micro-batch arrives with the source's partitioning — often
        # ONE partition locally (single-row-group files) — and the
        # O(tokens) signature fold was the measured 3-5 s single-task
        # hot spot of every near-gate trigger. One batch-sized exchange
        # buys full-core compute; partition count follows
        # defaultParallelism, so it scales with the session, not a
        # constant.
        sh = (
            with_shingles(
                spread(
                    docs.select(F.col(self.id_col).alias("doc_id"), "text"),
                    "doc_id",
                )
            )
            .filter(F.size("shingles") > 0)
            .select("doc_id", minhash_signature(F.col("shingles")).alias("sig"))
        )
        return sh.withColumn("bands", band_hashes(F.col("sig")))

    def _agreement(self, a, b):
        from streamy_db_spark.operators.minhash import MINHASH_K

        matches = F.size(
            F.filter(F.zip_with(a, b, lambda x, y: x == y), lambda v: v)
        )
        return matches.cast("double") / F.lit(float(MINHASH_K))

    @staticmethod
    def _explode_bands(sigs: DataFrame, id_alias: str, sig_alias: str) -> DataFrame:
        """(bkey, <id_alias>, <sig_alias>) — one row per band per doc,
        bkey = '<band>:<band_hash>' (the single join key the v2 bands/
        state persists). sigs: (doc_id, sig, bands)."""
        return sigs.select(
            F.col("doc_id").alias(id_alias),
            F.col("sig").alias(sig_alias),
            F.posexplode("bands").alias("band", "bh"),
        ).select(
            F.concat_ws(":", F.col("band").cast("string"), F.col("bh")).alias(
                "bkey"
            ),
            id_alias,
            sig_alias,
        )

    def _verify_candidates(self, cand: DataFrame) -> DataFrame:
        """Candidate (id_a, id_b, sig_a, sig_b) rows → verified (id_a,
        id_b) edges: dedup multi-band collisions (candidate-pair-sized,
        never state-sized), then signature-agreement ≥ threshold."""
        return (
            cand.select("id_a", "id_b", "sig_a", "sig_b")
            .distinct()
            .filter(
                self._agreement(F.col("sig_a"), F.col("sig_b"))
                >= self.sig_threshold
            )
            .select("id_a", "id_b")
        )

    def _banded_edges(self, left: DataFrame, right: DataFrame) -> DataFrame:
        """(id_a, id_b) pairs sharing ≥1 band bucket with signature
        agreement ≥ threshold. left/right: (doc_id, sig, bands). The
        batch×batch (in-batch) edge join — both sides batch-sized."""
        la = self._explode_bands(left, "id_a", "sig_a")
        rb = self._explode_bands(right, "id_b", "sig_b")
        return self._verify_candidates(
            la.join(rb, "bkey").filter(F.col("id_a") != F.col("id_b"))
        )

    def _bands_state_for_probe(
        self, sigs: DataFrame, n_batch_docs: int
    ) -> DataFrame | None:
        """The bands/ scan for this batch's probe, FILE-PRUNED when the
        compaction-time range index allows it (r8 verdict item 1: the v2
        probe shuffles nothing but still READ all of bands/ every
        micro-batch — at 1B accepted docs a multi-TB sequential read per
        batch). compact_state re-clusters bands/ on bkey, so each
        compacted file covers a DISJOINT bkey range; it then persists
        those per-file (min_bkey, max_bkey) ranges to bands_index/. The
        probe collects the batch's distinct bkeys (bounded:
        ≤ 4 × ``prune_max_docs`` ~35 B strings) and keeps only the files
        whose range contains at least one of them — files read scale
        with the batch's bucket coverage, not accepted-state size.

        Never loses candidates, only over-reads, by construction:

        - files NOT in the index (appends since the last compaction, or
          a crash between the compaction swap and the index write that
          left the index referencing vanished names) are ALWAYS read;
        - an indexed file's [min, max] brackets every bkey it contains
          (computed by scanning the file itself), so range-miss ⇒ no
          row in that file can join this batch;
        - no index, oversized batch (``prune_max_docs``), or a Spark
          Connect session (no FS listing) ⇒ the full-directory scan,
          exactly the pre-r9 behavior.

        Returns None when pruning PROVES zero overlap (no file can hold
        a batch bkey) — semantically identical to 'no banded state'.
        ``last_probe_scan`` records the file accounting whenever
        pruning was attempted.

        When pruning succeeds, the full-directory DataFrame is NEVER
        constructed: its mergeSchema analysis alone is a footer-merge
        job over EVERY state file — per-batch metadata work that would
        still scale with state size, partially defeating the pruning
        (r9 review). Existence comes from the directory listing; the
        fallback paths build the full scan lazily."""
        self.last_probe_scan = None
        if 0 < n_batch_docs <= self.prune_max_docs:
            self._migrate_legacy_state()
            keys = lambda: sorted(  # noqa: E731
                r["bkey"]
                for r in self._explode_bands(sigs, "id_a", "sig_a")
                .select("bkey")
                .distinct()
                .collect()
            )
            df, acct = self._comp["bands"].scan_or_full(
                keys, self.prune_min_indexed_files
            )
            if acct is not None:
                self.last_probe_scan = acct
            return df
        return self._state_bands()

    def _index_ranges(self) -> dict[str, tuple[str, str]] | None:
        """The bands_index contents as {file basename: (min_bkey,
        max_bkey)}, or None when unusable (absent, torn by a killed
        compaction, unreadable) — the index is ADVISORY, so any failure
        here must cost a full scan, never a failed micro-batch (review
        finding: _read_state propagates non-missing-path errors by
        design, which is right for real state and wrong for a sidecar).
        Memoized per instance: the index only changes when THIS
        instance's compact_state rewrites it (live-stream compaction by
        another process is excluded by the heartbeat guard), and a
        stale cache is safe anyway — old names drop out of the
        directory listing and new files read as unindexed. Without the
        memo every 500 ms-trigger micro-batch would pay a Spark read +
        driver collect of the index (review finding)."""
        return self._comp["bands"].ranges()

    def _probe_join(self, sigs: DataFrame, n_batch_docs: int) -> DataFrame | None:
        """The batch↔accepted-state candidate join — THE operation whose
        v1 shape was the 100×-scale killer (r6/r7 verdict: posexplode +
        full-state shuffle per micro-batch). v2: the state side arrives
        pre-exploded from bands/ and is the STREAMED side of a broadcast
        hash join on bkey — scanned once, hash-probed map-side, never
        shuffled or sorted (plan-gated in
        tests/test_incremental_near_dedup.py). r9: the state scan is
        additionally FILE-PRUNED via the compaction-time bkey-range
        index (``_bands_state_for_probe``), so the per-batch read is
        proportional to the batch's bucket coverage too. Batches above
        ``broadcast_batch_max_docs`` fall back to a shuffle join. None
        when no banded state exists yet (or pruning proves zero
        overlap)."""
        state = self._bands_state_for_probe(sigs, n_batch_docs)
        if state is None:
            return None
        bb = self._explode_bands(sigs, "id_a", "sig_a")
        if n_batch_docs <= self.broadcast_batch_max_docs:
            bb = F.broadcast(bb)
        return (
            state.select(
                "bkey",
                F.col("doc_id").alias("id_b"),
                F.col("sig").alias("sig_b"),
            )
            .join(bb, "bkey")
            .filter(F.col("id_a") != F.col("id_b"))
        )

    def process_batch(
        self, docs: DataFrame, batch_id: int | None = None
    ) -> DataFrame:
        """Admit the batch. ``batch_id`` (optional, monotone — e.g. the
        foreachBatch micro-batch id) disambiguates crash-replay from
        upstream re-send: rows whose id is in state FROM THIS batch_id
        were accepted by an earlier run of the same batch and are
        RE-EMITTED (so a replay reproduces its original output — the
        idempotent-sink contract); rows whose id is in state from an
        EARLIER batch are at-least-once re-sends of already-admitted
        docs and are DROPPED, never duplicated into the output (r6
        review). Without ``batch_id`` (or over pre-batch_seq state) any
        state id re-emits — only safe when the upstream never re-sends
        an id in a later batch. Previously-REJECTED rows are not in
        state; a re-send of a doc that was DIRECTLY edge-connected to an
        accepted doc re-rejects (its blocker is still in state), but
        rejection is NOT stable transitively: in a chain A–B–C (batch 1
        accepts A; batch 2 rejects B via A and C via B), a later re-send
        of C ALONE is ADMITTED — C's only edge was to B, and B never
        entered state (r7 review; pinned by
        test_transitively_blocked_doc_admitted_on_resend).

        The dedup state and the stream's checkpoint must live and die
        TOGETHER: restarting a stream with a fresh checkpoint resets
        foreachBatch ids to 0, and batch 0's acceptances from the old
        run would read as crash-replays. Recovery that discards the
        checkpoint must discard (or re-seed) the state dir too."""
        if batch_id is not None and batch_id < 0:
            raise ValueError(f"batch_id must be >= 0, got {batch_id}")
        # reset the scan accounting HERE, not only inside the probe:
        # early exits (empty trigger, all-replay batch) must not leave
        # the PREVIOUS batch's file accounting attributed to a batch
        # that read nothing (r9 review)
        self.last_probe_scan = None
        from streamy_db_spark.operators.dedup import connected_components

        # Membership via the hits pattern (same discipline as the
        # band probe): the ids/ scan — FILE-PRUNED by the doc_id-range
        # sidecar when possible (_ids_for_probe) — streams through a
        # hash join against the BROADCAST batch id set, so the check
        # costs a (pruned) state scan and never a state-sized Exchange.
        # (The prior form distinct'd the ENTIRE ids/ state and
        # anti-joined it against the batch — two full-state shuffles
        # per micro-batch at 1B accepted docs, in the same gate whose
        # band probe was redesigned to avoid exactly that.)
        bkeys = (
            docs.select(F.col(self.id_col).alias("doc_id"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_keys = bkeys.count()
        ids = self._ids_for_probe(bkeys, n_keys)
        replayed = None
        if ids is not None:
            hits = self._ids_hits(
                ids, bkeys, n_keys <= self.broadcast_batch_max_docs
            ).localCheckpoint(eager=True)  # ≤ batch-sized: ONE state scan
            seen_ids = hits.select(
                F.col("doc_id").alias(self.id_col)
            ).distinct()
            if batch_id is not None and "batch_seq" in hits.columns:
                rep_ids = (
                    hits.filter(F.col("batch_seq") == int(batch_id))
                    .select(F.col("doc_id").alias(self.id_col))
                    .distinct()
                )
            else:
                rep_ids = seen_ids
            replayed = docs.join(rep_ids, self.id_col)
            # Checkpoint the membership anti-join ONCE: three downstream
            # consumers read `docs` (the sig table, the trivial-id
            # anti-join, the output join) and would each lazily
            # re-execute the membership join otherwise — and the
            # emptiness probe below must stay batch-sized (r8 second
            # review; the v2 redesign's whole point is probe traffic
            # O(batch)). seen_ids is batch-bounded off the checkpointed
            # hits, so this anti-join auto-broadcasts its right side.
            docs = docs.join(
                seen_ids, self.id_col, "left_anti"
            ).localCheckpoint(eager=True)
        # Empty effective batch (empty trigger, or every row a
        # replay/re-send): nothing can be admitted and nothing may
        # append — skip the signature/probe/components pipeline and both
        # state appends (each would otherwise leave an empty commit file
        # per empty trigger — small-file growth compact_state then pays
        # for; r8 review). With state, the probe reads the checkpointed
        # anti-join; without, it is a take(1) on the raw batch.
        if docs.isEmpty():
            out = replayed if replayed is not None else docs
            return out.localCheckpoint(eager=True)
        sigs = self._sig_table(docs).localCheckpoint(eager=True)
        n_batch = sigs.count()  # checkpointed: the count is a cheap scan

        edges = self._banded_edges(sigs, sigs).filter(
            F.col("id_a") < F.col("id_b")
        )
        probe = self._probe_join(sigs, n_batch)
        if probe is not None:
            edges = edges.unionByName(self._verify_candidates(probe))
        comp = connected_components(edges)

        # contaminated component = one containing any accepted (state)
        # doc: every batch member of it is rejected.
        blocked_keepers = comp.join(
            sigs.select("doc_id"), F.col("node") == F.col("doc_id"), "left_anti"
        ).select("keeper").distinct()
        rejected = (
            comp.join(blocked_keepers, "keeper")
            .select(F.col("node").alias("doc_id"))
            .unionByName(
                # clean components: everyone but the min-id keeper
                comp.join(blocked_keepers, "keeper", "left_anti")
                .filter(F.col("node") != F.col("keeper"))
                .select(F.col("node").alias("doc_id"))
            )
            .distinct()
        )
        accepted_sigs = sigs.join(rejected, "doc_id", "left_anti")

        # no-shingle docs (absent from sigs) are always accepted — reuse
        # the checkpointed sig table, never re-shingle the batch. They
        # ARE persisted (sig NULL, no bands) so a later-batch re-send of
        # a short doc is dropped like any other accepted id; the empty
        # band array means they never produce candidate edges.
        trivial_ids = docs.select(F.col(self.id_col).alias("doc_id")).join(
            sigs.select("doc_id"), "doc_id", "left_anti"
        )
        new_state = accepted_sigs.unionByName(
            trivial_ids.select(
                "doc_id",
                F.lit(None).cast("array<long>").alias("sig"),
                F.array().cast("array<string>").alias("bands"),
            )
        ).localCheckpoint(eager=True)
        # Two appends from the ONE checkpointed frame (so neither write
        # lazily re-reads the state files it is appending to). ORDER IS
        # LOAD-BEARING (r8 review): bands/ commits BEFORE ids/. The two
        # appends are not atomic together; ids/ membership is what
        # classifies a future arrival of these docs, so it must land
        # LAST. A crash after bands/ but before ids/ leaves orphan band
        # rows for docs not yet in membership — benign: the replayed
        # batch recomputes the same accepted set (deterministic), its
        # probe edges against its own orphan rows are either self-pairs
        # (filtered id_a != id_b) or duplicates of in-batch edges, and
        # the duplicate band rows are exact-row dups that compact_state
        # drops. The REVERSE order would be a durability hole: ids/
        # committed without bands/ makes the replay classify the docs as
        # already-accepted (re-emit, append nothing), so their band rows
        # would NEVER be written and future near-dups of them would be
        # admitted forever.
        if not new_state.isEmpty():  # all-rejected batches append nothing
            exploded = self._explode_bands(new_state, "doc_id", "sig")
            # trivial-only batches (every acceptance a no-shingle doc)
            # explode to ZERO band rows — skip the bands/ append too, or
            # each such trigger still commits an empty file there (r8
            # second review); the probe is batch-sized over the
            # checkpointed frame
            if not exploded.isEmpty():
                exploded.write.mode("append").parquet(self._bands_path)
            # ids/ gets every acceptance (trivial docs included — their
            # later re-sends must drop); bands/ above holds the
            # pre-exploded probe rows (posexplode of an empty band array
            # yields nothing, so trivial docs never enter the probe
            # side).
            new_state.select(
                "doc_id",
                F.lit(-1 if batch_id is None else int(batch_id))
                .cast("long")
                .alias("batch_seq"),
            ).write.mode("append").parquet(self._ids_path)

        # Materialize the output so it neither lazily re-reads the state
        # files (a later compact_state renames them away) nor recomputes
        # the batch's signatures on every action.
        out = docs.join(
            new_state.select(F.col("doc_id").alias(self.id_col)), self.id_col
        )
        if replayed is not None:
            out = out.unionByName(replayed)
        return out.localCheckpoint(eager=True)

    def seen_count(self) -> int:
        ids = self._ids()
        return 0 if ids is None else ids.select("doc_id").distinct().count()

    def compact_state(
        self,
        target_file_mb: int = 128,
        force: bool = False,
        stream_heartbeat_max_age_s: float = 600.0,
        bands_min_files: int = 1,
        ids_min_files: int = 1,
    ) -> int:
        """Same maintenance pass as IncrementalDeduper.compact_state —
        one parquet directory per processed batch otherwise accumulates
        forever, per state component (ids/ and bands/). Rows are
        deduplicated by full row (a doc_id appears at most once per
        append, and replays append nothing, so distinct only drops crash
        artifacts). bands/ is re-CLUSTERED on bkey while rewriting
        (range-partition + sort, sources/files.compact_parquet
        cluster_cols): each rewritten file then covers a disjoint bkey
        range — and the per-file ranges are persisted to bands_index/
        (StateComponent.compact) so the per-batch probe can skip files
        whose range holds none of the batch's band keys (r8 verdict:
        the probe otherwise reads ALL of bands/ every micro-batch).
        ``bands_min_files`` floors the bands/ output file count below
        the size-derived one — finer files = finer pruning granularity
        (and the test observable); at production state sizes the
        128 MB-target term dominates. Refuses to run while a stream
        heartbeat on this state dir is fresh (near_dedup_sink
        heartbeats every micro-batch) unless ``force`` — the
        write-then-swap would otherwise race in-flight process_batch
        reads (r6 review). Returns the total output file count across
        both components."""
        _recheck = compact_guard(
            self.spark, self.state_path, force, stream_heartbeat_max_age_s
        )
        _recheck()
        self._migrate_legacy_state()
        total = 0
        # ids/ is re-clustered on doc_id (ids range-prune far better
        # than hashed band keys — crawl ids are quasi-ordered) so the
        # membership lookup can skip files via ids_index/
        # (_ids_for_probe); each component's compact handles the
        # sidecar rewrite + memo invalidation (incremental_base)
        for which, min_files in (
            ("ids", ids_min_files),
            ("bands", bands_min_files),
        ):
            total += self._comp[which].compact(
                self.state_path, target_file_mb, min_files, _recheck
            )
        return total


class IncrementalSemanticDeduper:
    """Embedding-space (SemDeDup-style) gate with parquet-backed state —
    the semantic member of the incremental family (exact:
    IncrementalDeduper; lexical near-dup: IncrementalNearDeduper).

    ``process_batch(docs)`` admits the batch docs that survive the
    cluster-bounded cosine gate against everything already accepted,
    appends their (cluster_id, accepted_id, vec) rows to state, and
    returns the accepted rows. For batches arriving in increasing-id
    order the admitted set equals the one-shot GREEDY keepers
    (``dedup.semantic_dedup(greedy=True)`` over the union) exactly —
    greedy is the rule whose blockers are always KEPT docs, which is
    what makes incremental == one-shot: every blocker is in state.
    A corollary the lexical gate can't offer (its rejections are only
    directly stable, see IncrementalNearDeduper.process_batch): here
    rejection IS transitively stable — a rejected doc's blocker was
    kept, so a later re-send re-rejects against state.

    State layout: ``<state>/accepted/`` (cluster_id int, accepted_id
    long, vec array<double>, batch_seq long) and ``<state>/centroids/``
    — the cluster space is PART of the gate's identity (verdicts from
    two centroid sets don't compose), so centroids persist at first
    construction and later constructions must either pass None (reuse)
    or pass an identical matrix (else ValueError).

    Scale shape: centroid assignment is map-side (Arrow UDF closure —
    no join, no shuffle); the batch↔state block check reads accepted/
    as the STREAMED side of a broadcast hash join on cluster_id (batch
    side broadcast under ``broadcast_batch_max_docs``, shuffle-join
    fallback above — same discipline as the near-dedup probe, plan-
    gated); the within-batch greedy pass shuffles BATCH rows only.
    State traffic per micro-batch: scans, no Exchange — and the scans
    are FILE-PRUNED: ``compact_state`` re-clusters accepted/ on
    cluster_id and persists per-file [min, max] cluster ranges to
    accepted_index/ (the same discipline as the lexical gate's
    bands_index). Assignment runs BEFORE the membership check, so ONE
    pruned scan serves both the seen/replay lookup and the block join —
    a batch touching k clusters reads only the files covering them for
    EVERY per-batch state access, not just the cosine probe. Vectors
    are dim×8 bytes per accepted doc — at 1B accepted docs and dim 128
    the state is ~1 TB; per-batch reads scale with the batch's cluster
    coverage instead.

    ``batch_id`` semantics mirror the other gates: an acceptance
    recorded under THIS batch_id re-emits (crash-replay reproduces its
    output, appends nothing); one from an EARLIER batch is an
    at-least-once re-send and drops — PROVIDED the re-send carries the
    same embedding (the membership check shares the cluster-pruned
    state scan, so an id returning with an embedding that moved
    clusters is re-evaluated as new content and may re-emit). Pass
    ``strict_id_membership=True`` to restore the lexical gate's
    unconditional drop-on-id-match at the cost of an O(state)
    id-column scan per batch. The state dir and the stream's
    checkpoint must live and die together.

    Float caveat: the within-batch pass scores cosine in numpy (BLAS
    matmul) and the state-block pass in the JVM fold — their summation
    orders differ, so a pair sitting within ~1 ulp of the threshold
    could in principle flip between the two paths (affecting only
    replay fidelity for that pair). A measure-zero set for real
    embeddings; thresholds are policy knobs, never exact data values.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        centroids=None,
        threshold: float = 0.90,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        broadcast_batch_max_docs: int = 100_000,
        prune_min_indexed_files: int = 4,
        strict_id_membership: bool = False,
    ):
        # broadcast rows here carry the FULL embedding (dim × 8 B —
        # ~1 KB at dim 128, ~6 KB at dim 768), not a 35 B band key like
        # the lexical gate, so the cap is 100k (~100 MB at dim 128), not
        # 200k-of-bkeys: size it as docs × dim × 8 B against executor
        # memory and Spark's 8 GiB broadcast hard cap — the shuffle-join
        # fallback must engage long before the broadcast itself fails
        # (r9 second review)
        import numpy as np

        self.spark = spark
        self.state_path = state_path.rstrip("/")
        self.threshold = float(threshold)
        self.id_col = id_col
        self.vec_col = vec_col
        self.broadcast_batch_max_docs = broadcast_batch_max_docs
        # File-level state pruning (same discipline as the lexical
        # gate's bands_index): compact_state re-clusters accepted/ on
        # cluster_id and persists per-file [min, max] cluster ranges;
        # the block join then reads only the files whose range holds a
        # cluster the BATCH touches — per-batch I/O scales with the
        # batch's cluster coverage, not accepted-state size. The floor
        # skips the (tiny: ≤ n_clusters ints) per-trigger collect when
        # too few live files are indexed to pay for it.
        self.prune_min_indexed_files = prune_min_indexed_files
        # strict_id_membership=True restores the unconditional
        # drop-on-id-match re-send contract (the lexical gate's): the
        # seen/replay membership check reads the FULL accepted_id column
        # (O(state) column-pruned scan per batch) instead of the pruned
        # scan, so a re-sent id whose embedding moved clusters still
        # drops. The default trades that edge (re-evaluated as new
        # content; duplicate emission possible under embedder drift)
        # for batch-coverage-bound state I/O — see process_batch.
        self.strict_id_membership = strict_id_membership
        #: Scan accounting of the LAST block probe (None when pruning
        #: was not attempted), same shape as the lexical gate's.
        self.last_probe_scan: dict | None = None
        self._accepted_path = self.state_path + "/accepted"
        self._centroids_path = self.state_path + "/centroids"
        self._centroids_next_path = self.state_path + "/centroids.__next__"
        # shared lifecycle scaffold (incremental_base.StateComponent)
        self._acc = StateComponent(
            self.spark,
            self._accepted_path,
            self.state_path + "/accepted_index",
            "cluster_id",
        )

        persisted = self._load_centroids()
        if persisted is None:
            if centroids is None:
                raise ValueError(
                    "no persisted centroids at "
                    f"{self._centroids_path} — pass the centroid matrix "
                    "(e.g. similarity.ivf_train_centroids) on first use"
                )
            self.centroids = np.asarray(centroids, dtype=np.float64)
            self._persist_centroids()
        else:
            if centroids is not None and not np.array_equal(
                persisted, np.asarray(centroids, dtype=np.float64)
            ):
                raise ValueError(
                    "centroids differ from the matrix persisted at "
                    f"{self._centroids_path}; verdicts from two cluster "
                    "spaces don't compose — pass None to reuse the "
                    "persisted centroids, or start a fresh state dir"
                )
            self.centroids = persisted

    # -- centroid persistence -------------------------------------------
    def _load_centroids(self):
        # Crash recovery for the re-cluster promotion (see
        # recluster_state): the promotion is delete + rename, and a
        # crash between them leaves centroids/ missing with the
        # fully-written next matrix still at .__next__ — a state ONLY
        # reachable mid-promotion, which only runs after the accepted/
        # swap committed, so completing the rename here is always the
        # correct repair.
        mat = self._load_matrix(self._centroids_path)
        if (
            mat is None
            and _read_state(self.spark, self._centroids_next_path) is not None
        ):
            # Mid-promotion state MUST be repaired, not silently
            # ignored: returning None here would make the constructor
            # treat a swapped state as first use and persist whatever
            # matrix the caller passed OVER new-space cluster ids —
            # the exact inconsistency the promotion protocol prevents.
            fs, mk = _state_fs(self.spark, self.state_path)
            if fs is None:
                raise RuntimeError(
                    f"{self._centroids_path} is missing but a pending "
                    f"matrix exists at {self._centroids_next_path} "
                    "(crash mid-promotion); complete the promotion from "
                    "a classic (JVM-attached) SparkSession — Spark "
                    "Connect has no filesystem handle to rename with"
                )
            # mat is None does NOT mean the directory is absent — an
            # empty / _SUCCESS-only centroids/ (orchestrator mkdir, a
            # crashed Connect overwrite) also reads as None, and Hadoop
            # rename into an EXISTING directory would bury __next__
            # INSIDE it and return true. Clear any such husk first,
            # with the same verify-the-delete discipline as the
            # promotion path.
            if fs.exists(mk(self._centroids_path)):
                fs.delete(mk(self._centroids_path), True)
                if fs.exists(mk(self._centroids_path)):
                    raise IOError(
                        f"cannot clear empty {self._centroids_path} "
                        "before completing the crashed promotion"
                    )
            if not fs.rename(
                mk(self._centroids_next_path), mk(self._centroids_path)
            ):
                raise IOError(
                    f"cannot complete the crashed centroid promotion: "
                    f"rename {self._centroids_next_path} -> "
                    f"{self._centroids_path} failed"
                )
            mat = self._load_matrix(self._centroids_path)
        return mat

    @staticmethod
    def _matrix_of(df):
        import numpy as np

        rows = df.orderBy("idx").collect()
        return np.stack(
            [np.asarray(r["vec"], dtype=np.float64) for r in rows]
        )

    def _load_matrix(self, path: str):
        df = _read_state(self.spark, path)
        if df is None:
            return None
        return self._matrix_of(df)

    def _write_matrix(self, mat, path: str) -> None:
        rows = [(i, [float(x) for x in v]) for i, v in enumerate(mat)]
        self.spark.createDataFrame(
            rows, "idx int, vec array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(path)

    def _persist_centroids(self) -> None:
        self._write_matrix(self.centroids, self._centroids_path)

    def _load_pending_intent(self):
        """Pending next-matrix from an aborted recluster_state, or None.
        A matrix carrying the Connect-path ``consumed`` marker column is
        NOT intent: it is the already-promoted matrix left in place
        because Connect has no FS handle to delete/rename it (see
        _neutralize_next) — adopting it as resume intent would make
        every subsequent bare recluster_state() skip retraining forever
        (r10 advice). One read: the consumed-column check and the
        matrix collect share the same DataFrame (r11 review)."""
        df = _read_state(self.spark, self._centroids_next_path)
        if df is None or "consumed" in df.columns:
            return None
        return self._matrix_of(df)

    def _neutralize_next(self, mat) -> None:
        """Connect-path consume of the pending intent: overwrite
        centroids.__next__ with the PROMOTED matrix plus a ``consumed``
        marker column (Connect has no FS handle to delete or rename the
        directory, only Spark writes). The bare-rerun resume skips
        consumed intent (_load_pending_intent); the classic-session
        crash repair in _load_centroids may still adopt this file if
        centroids/ ever goes missing — harmlessly, because its vector
        content IS the live matrix."""
        rows = [(i, [float(x) for x in v], True) for i, v in enumerate(mat)]
        self.spark.createDataFrame(
            rows, "idx int, vec array<double>, consumed boolean"
        ).coalesce(1).write.mode("overwrite").parquet(
            self._centroids_next_path
        )

    # -- state access ----------------------------------------------------
    def _accepted(self) -> DataFrame | None:
        return self._acc.read()

    def seen_count(self) -> int:
        acc = self._accepted()
        return 0 if acc is None else acc.select("accepted_id").distinct().count()

    # -- the per-batch gate ----------------------------------------------
    def _assigned(self, docs: DataFrame) -> DataFrame:
        """(_id, _vec, cluster_id) for the batch — map-side assignment."""
        from streamy_db_spark.operators.dedup import assign_clusters

        return assign_clusters(
            docs.select(
                F.col(self.id_col).alias("_id"),
                F.col(self.vec_col).cast("array<double>").alias("_vec"),
            ),
            self.centroids,
            id_col="_id",
            vec_col="_vec",
        )

    def _index_ranges(self):
        """Memoized accepted_index ranges (see the lexical gate's
        _index_ranges for the memo rationale — same contract)."""
        return self._acc.ranges()

    def _accepted_state_for_probe(self, assigned: DataFrame):
        """The accepted/ scan for the block join, FILE-PRUNED by the
        compaction-time cluster-range index when possible. Same
        advisory contract as the lexical gate's _bands_state_for_probe:
        unindexed files are always read; any missing prerequisite falls
        back to the full scan; None means no state (or provably zero
        cluster overlap). Records ``last_probe_scan`` when pruning ran.
        The batch's distinct clusters are a ≤ n_clusters-int collect
        over the checkpointed assignment — bounded regardless of batch
        size."""
        pruned = self._try_pruned_accepted(assigned)
        if pruned is not _PRUNE_UNAVAILABLE:
            return pruned
        return self._accepted()

    def _try_pruned_accepted(self, assigned: DataFrame):
        res, acct = self._acc.attempt_pruned(
            lambda: sorted(
                r["cluster_id"]
                for r in assigned.select("cluster_id").distinct().collect()
                if r["cluster_id"] is not None
            ),
            self.prune_min_indexed_files,
        )
        if acct is not None:
            self.last_probe_scan = acct
        return res

    def _state_blocked(
        self, assigned: DataFrame, n_batch_docs: int
    ) -> DataFrame | None:
        """ids of batch docs with an accepted same-cluster doc at or
        above threshold, over a freshly-pruned state scan (the plan-gate
        tests drive this form; process_batch prunes once and passes the
        scan to ``_state_blocked_from`` so the membership check shares
        it)."""
        return self._state_blocked_from(
            self._accepted_state_for_probe(assigned), assigned, n_batch_docs
        )

    def _state_blocked_from(
        self, acc: DataFrame | None, assigned: DataFrame, n_batch_docs: int
    ) -> DataFrame | None:
        """The block join proper: state is the streamed side; the batch
        side is broadcast under the cap (plan-gated: no Exchange on
        state). ``acc`` is the (possibly file-pruned) accepted/ scan —
        None means no state / provably zero cluster overlap."""
        from streamy_db_spark.operators.similarity import dot, norm

        if acc is None:
            return None
        # Each side's norm is computed ONCE PER ROW before the join
        # (the same move semantic_dedup_exact made this round): the
        # per-pair predicate then folds each vector pair once (the
        # dot) instead of three times (dot + both norms). Same doubles
        # feeding the same division, so every pair's cosine — and
        # every verdict — is bit-identical; measured ~3x on the
        # steady-lane block stage (the per-trigger dominant cost at
        # 10k-doc triggers: 6-9 s -> ~2-3 s).
        bb = assigned.withColumn("_nb", norm(F.col("_vec")))
        if n_batch_docs <= self.broadcast_batch_max_docs:
            bb = F.broadcast(bb)
        cos = dot(F.col("vec"), F.col("_vec")) / (
            F.col("_ns") * F.col("_nb")
        )
        return (
            acc.select(
                "cluster_id", "vec", norm(F.col("vec")).alias("_ns")
            )
            .join(bb, "cluster_id")
            .filter(cos >= self.threshold)
            .select("_id")
            .distinct()
        )

    @staticmethod
    def _greedy_kernel(threshold: float):
        import numpy as np
        import pandas as pd

        def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
            ids = pdf["_id"].to_numpy()
            order = np.argsort(ids)
            ids = ids[order]
            vecs = pdf["_vec"].to_numpy()[order]
            if len(ids) > 1:
                m = np.stack(vecs).astype(np.float64)
                n = np.linalg.norm(m, axis=1, keepdims=True)
                n[n == 0.0] = 1.0
                m /= n
                cos = m @ m.T
                kept: list[int] = []
                for i in range(len(ids)):
                    if not kept or not (cos[kept, i] >= threshold).any():
                        kept.append(i)
            else:
                kept = list(range(len(ids)))
            return pd.DataFrame(
                {
                    "cluster_id": np.int32(pdf["cluster_id"].iloc[0]),
                    "_id": ids[kept],
                    "_vec": [list(map(float, vecs[i])) for i in kept],
                }
            )

        return _greedy

    def process_batch(
        self, docs: DataFrame, batch_id: int | None = None
    ) -> DataFrame:
        """Admit the batch (ids must be unique within it). Returns the
        accepted rows with the caller's full columns; appends their
        (cluster_id, accepted_id, vec, batch_seq) rows to accepted/.
        One localCheckpoint materializes verdicts, so the output never
        lazily re-reads state files (compact_state renames them away)
        and the assignment UDF runs once."""
        if batch_id is not None and batch_id < 0:
            raise ValueError(f"batch_id must be >= 0, got {batch_id}")
        # reset scan accounting even on early exits (see the lexical
        # gate's process_batch)
        self.last_probe_scan = None
        if docs.isEmpty():
            return docs.localCheckpoint(eager=True)

        # Assign clusters FIRST: assignment is deterministic given the
        # pinned centroids, so a re-sent doc lands in the same cluster
        # as its recorded acceptance — which lets ONE file-pruned state
        # scan serve BOTH the seen/replay membership check and the
        # block join. Per-batch state I/O is then proportional to the
        # batch's cluster coverage everywhere, not just in the block
        # join (r9 third review). Contract note this rests on: a
        # re-sent id carries unchanged content — the same assumption
        # that makes crash-replay re-emission sound. An id returning
        # with an embedding that moved CLUSTERS is semantically new
        # content and may be re-evaluated (and re-admitted) rather than
        # dropped on id match; duplicate accepted_id rows cost space,
        # never correctness (seen_count distincts; both vectors block).
        assigned = self._assigned(docs).localCheckpoint(eager=True)
        acc = self._accepted_state_for_probe(assigned)
        membership = self._accepted() if self.strict_id_membership else acc
        replayed = None
        if membership is not None:
            seen = membership.select(
                F.col("accepted_id").alias(self.id_col)
            ).distinct()
            if batch_id is not None and "batch_seq" in membership.columns:
                rep_ids = (
                    membership.filter(F.col("batch_seq") == int(batch_id))
                    .select(F.col("accepted_id").alias(self.id_col))
                    .distinct()
                )
            else:
                rep_ids = seen
            replayed = docs.join(rep_ids, self.id_col)
            docs = docs.join(seen, self.id_col, "left_anti").localCheckpoint(
                eager=True
            )
            if docs.isEmpty():
                return replayed.localCheckpoint(eager=True)
            assigned = assigned.join(
                docs.select(F.col(self.id_col).alias("_id")), "_id"
            ).localCheckpoint(eager=True)
        # count only where the block join uses it (the broadcast-cap
        # decision) — an unconditional count was a wasted per-trigger
        # job on the no-state path (r9 fourth review)
        blocked = (
            None
            if acc is None
            else self._state_blocked_from(acc, assigned, assigned.count())
        )
        survivors = (
            assigned
            if blocked is None
            else assigned.join(blocked, "_id", "left_anti")
        )
        accepted = (
            survivors.groupBy("cluster_id")
            .applyInPandas(
                self._greedy_kernel(self.threshold),
                "cluster_id int, _id long, _vec array<double>",
            )
            .localCheckpoint(eager=True)
        )
        if not accepted.isEmpty():
            accepted.select(
                "cluster_id",
                F.col("_id").alias("accepted_id"),
                F.col("_vec").alias("vec"),
                F.lit(-1 if batch_id is None else int(batch_id))
                .cast("long")
                .alias("batch_seq"),
            ).write.mode("append").parquet(self._accepted_path)
        out = docs.join(
            accepted.select(F.col("_id").alias(self.id_col)), self.id_col
        )
        if replayed is not None:
            out = out.unionByName(replayed)
        return out.localCheckpoint(eager=True)

    def compact_state(
        self,
        target_file_mb: int = 128,
        force: bool = False,
        stream_heartbeat_max_age_s: float = 600.0,
        accepted_min_files: int = 1,
    ) -> int:
        """Rewrite accepted/ clustered on cluster_id (sequential scan
        locality AND file-level pruning granularity for the per-batch
        block join — the per-file [min, max] cluster ranges persist to
        accepted_index/), dropping exact-row crash duplicates.
        ``accepted_min_files`` floors the output file count below the
        size-derived one (finer files = finer pruning, the test
        observable). Heartbeat-guarded like the other gates, with the
        pre-swap re-check; centroids/ is a single immutable file and is
        left alone."""
        _recheck = compact_guard(
            self.spark, self.state_path, force, stream_heartbeat_max_age_s
        )
        _recheck()
        # the component persists the per-file cluster ranges the block
        # join prunes with and invalidates this instance's memo
        return self._acc.compact(
            self.state_path, target_file_mb, accepted_min_files, _recheck
        )

    def recluster_state(
        self,
        centroids=None,
        n_clusters: int | str | None = None,
        target_file_mb: int = 128,
        force: bool = False,
        stream_heartbeat_max_age_s: float = 600.0,
        accepted_min_files: int = 1,
    ) -> int:
        """Centroid LIFECYCLE (r9 verdict item 5): re-train the cluster
        space and re-assign every accepted row to it, replacing
        accepted/ + centroids/ + accepted_index/ together under the
        compact-time heartbeat guard. Centroids otherwise persist at
        first batch and pin the space forever; as the corpus drifts,
        docs that would pair land in different clusters and
        cluster-bounded recall silently degrades — this is the
        maintenance pass that restores it.

        ``centroids`` adopts a caller-trained matrix; otherwise the
        pass re-trains on the ACCEPTED vectors (the gate's own sample
        of the admitted corpus) via similarity.ivf_train_centroids,
        with ``n_clusters`` defaulting to the current space's K.
        ``n_clusters="auto"`` re-sizes K ∝ accepted-state size
        (dedup.semantic_cluster_count) — the growth-maintenance form:
        state that accreted batches under a small first-batch K gets
        its per-cluster blocks re-bounded to ~SEMANTIC_TARGET_BLOCK,
        keeping the per-batch block join linear (the sf1 probe's
        pinned-K super-linearity, BASELINE §8, applies to this gate's
        state exactly as to the one-shot pass). Like an explicit
        integer, "auto" is NEW intent and overrides a pending matrix.
        Re-assignment is map-side (the same Arrow closure as the
        per-batch gate — no join) inside compact_parquet's
        write-then-swap rewrite, clustered on the NEW cluster_id so
        file pruning keeps its granularity.

        Verdict semantics: accepted rows (ids, vectors, batch_seq) are
        preserved — membership and crash-replay fidelity are
        unchanged, and a replayed batch re-emits identically (the
        regression test pins this). Future gating consults blockers
        within the NEW clusters: from this point the gate equals
        one-shot greedy semantic_dedup under the new space. A
        previously-rejected doc re-sent later may be ADMITTED if the
        new space separates it from its old blocker — rejection
        stability holds within one cluster space, not across spaces;
        re-clustering trades that edge for restored recall.

        Crash safety: the NEW matrix is fully written to
        ``centroids.__next__`` BEFORE anything else changes, the
        accepted/ rewrite is write-then-swap, and the promotion of the
        next matrix over centroids/ is delete + rename — the only
        window where centroids/ is missing, and _load_centroids heals
        exactly that state by completing the rename (reachable only
        after the swap committed, so the promotion is always correct).
        A crash after the swap but before the promotion STARTS leaves
        new cluster ids under the old matrix; rerunning
        recluster_state heals it — with no explicit ``centroids`` it
        RESUMES from the persisted next matrix rather than
        re-training, so the heal is exact even if accepted/ already
        carries the new assignment (re-assignment is idempotent)."""
        import numpy as np

        from streamy_db_spark.operators.dedup import assign_clusters
        from streamy_db_spark.sources.files import compact_parquet

        # validate BEFORE any state work: a typo'd "Auto", a float, or
        # a negative int would otherwise skip the pending-intent resume
        # (non-None) and either die deep in numpy after the guard, the
        # state scan, and the training collect have already run, or —
        # worse, for a negative int — silently train a truncated matrix
        # and promote it over the whole accepted state
        if isinstance(n_clusters, str):
            if n_clusters != "auto":
                raise ValueError(
                    f'n_clusters must be a positive int, None, or '
                    f'"auto"; got {n_clusters!r}'
                )
        elif n_clusters is not None:
            import numbers

            # numbers.Integral, not int: numpy/pandas-derived integer
            # K values (np.int64 from a count or a ceil) are valid and
            # worked before the guard existed (third review pass)
            if (
                isinstance(n_clusters, bool)
                or not isinstance(n_clusters, numbers.Integral)
                or n_clusters < 1
            ):
                raise ValueError(
                    f"n_clusters must be a positive int, None, or "
                    f'"auto"; got {n_clusters!r}'
                )
            n_clusters = int(n_clusters)

        _recheck = compact_guard(
            self.spark, self.state_path, force, stream_heartbeat_max_age_s
        )
        _recheck()
        acc = self._accepted()
        if acc is None:
            if centroids is None:
                raise ValueError(
                    "recluster_state on empty state needs an explicit "
                    "centroid matrix (nothing to re-train on)"
                )
            self.centroids = np.asarray(centroids, dtype=np.float64)
            self._persist_centroids()
            self._acc.invalidate()
            return 0
        resuming = None
        if centroids is None and n_clusters is None:
            # a fully-written next matrix from an aborted run is the
            # pending intent — the bare rerun adopts it (deterministic
            # resume). This is the ONLY safe default: if the abort came
            # after the accepted swap, this matrix is the sole heal
            # candidate; if before, adopting it merely re-clusters with
            # a valid (possibly slightly stale) matrix. An explicit
            # n_clusters or matrix is NEW intent: it skips the resume
            # and overwrites the pending matrix at step 1 below.
            # Consumed Connect-path intent reads as no-intent (see
            # _load_pending_intent).
            resuming = self._load_pending_intent()
        if centroids is not None:
            new_mat = np.asarray(centroids, dtype=np.float64)
        elif resuming is not None:
            new_mat = resuming
        else:
            from streamy_db_spark.operators.similarity import (
                ivf_train_centroids,
            )

            if n_clusters == "auto":
                from streamy_db_spark.operators.dedup import (
                    semantic_cluster_count,
                )

                k = semantic_cluster_count(acc.count())
            else:
                k = (
                    n_clusters
                    if n_clusters is not None
                    else len(self.centroids)
                )
            # train_fraction=1.0: max_train_rows already bounds driver
            # memory, and the default thinning fraction can sample a
            # small accepted set down to nothing. The training sample
            # grows WITH an auto-sized K (4 points per centroid, the
            # trainer's rationale): on a >12.8M-row accepted state the
            # default 50k cap would otherwise silently clamp K and the
            # "auto" intent — per-cluster blocks super-linear again —
            # would quietly not be honored (third review pass).
            from streamy_db_spark.operators.similarity import (
                IVF_MAX_TRAIN_ROWS,
            )

            new_mat = ivf_train_centroids(
                acc.select(
                    F.col("accepted_id").alias("vec_id"),
                    F.col("vec").alias("embedding"),
                ),
                n_clusters=k,
                train_fraction=1.0,
                max_train_rows=max(IVF_MAX_TRAIN_ROWS, 4 * k),
            )

        # 1. persist the next matrix FIRST (centroids/ untouched): from
        # here every crash state is recoverable without re-deriving it
        self._write_matrix(new_mat, self._centroids_next_path)

        def _reassign(df: DataFrame) -> DataFrame:
            return assign_clusters(
                df.drop("cluster_id"),
                new_mat,
                id_col="accepted_id",
                vec_col="vec",
            )

        # 2. re-assign + rewrite accepted/ under write-then-swap. On ANY
        # failure from here on, the pending __next__ is deliberately
        # LEFT IN PLACE: a failure can land before the swap (accepted/
        # old — resuming later merely re-clusters with a slightly-stale
        # but perfectly valid matrix) or after it (accepted/ NEW — the
        # pending matrix is then the ONLY heal candidate, and deleting
        # it would strand new-space cluster ids under the old matrix
        # with no repair path). The two cases are not reliably
        # distinguishable from out here, and destroying a possible heal
        # candidate is strictly worse than adopting possibly-stale
        # intent — callers that WANT fresh training after an abort pass
        # explicit centroids/n_clusters, which overrides (and
        # overwrites) any pending matrix.
        n = compact_parquet(
            self.spark,
            self._accepted_path,
            target_file_mb,
            cluster_cols=["cluster_id"],
            dedupe_rows=True,
            merge_schema=True,
            min_files=accepted_min_files,
            pre_swap_check=_recheck,
            transform=_reassign,
        )
        # 3. promote next over centroids/ (delete + rename; the missing
        # window in between is what _load_centroids repairs). Spark
        # Connect has no FS handle — fall back to a plain overwrite
        # write there (larger non-atomic window, documented trade).
        fs, mk = _state_fs(self.spark, self.state_path)
        self.centroids = new_mat
        if fs is not None:
            fs.delete(mk(self._centroids_path), True)
            if fs.exists(mk(self._centroids_path)):
                # Hadoop rename into an EXISTING directory moves the
                # source INSIDE it and returns true — the old matrix
                # would stay live over new-space cluster ids with no
                # error. A failed delete must abort instead;
                # _load_centroids cannot mistake this state (centroids/
                # still present), and the bare rerun resumes from
                # __next__.
                raise IOError(
                    f"recluster_state: cannot delete {self._centroids_path} "
                    "before promotion; rerun recluster_state() to resume"
                )
            if not fs.rename(
                mk(self._centroids_next_path), mk(self._centroids_path)
            ):
                raise IOError(
                    f"recluster_state: cannot promote "
                    f"{self._centroids_next_path}"
                )
        else:
            self._persist_centroids()
            # With no FS handle the pending __next__ cannot be renamed
            # or deleted, and left as-is it would persist forever: every
            # later bare recluster_state() would take the resume branch
            # and adopt the stale matrix instead of retraining — the
            # drift-refresh lifecycle silently stops (r10 advice).
            # Consume it in place with the promoted matrix + marker.
            self._neutralize_next(new_mat)
        self._acc.write_index(self.state_path)
        return n
