"""Incremental (batch-over-batch) ExactSubstr deduplication.

The batch form (operators/substring.py, Lee et al. 2022 ExactSubstr)
answers "which token spans are verbatim-repeated across the corpus?"
in one shot. Real corpora arrive in waves, and a repeated passage's
SECOND copy may land months after its first — so the incremental gate
must both (a) mark the new batch's spans that repeat anything already
ingested and (b) RETROACTIVELY mark the earlier occurrences that only
now became duplicated. This is the one dedup family whose verdicts are
not monotone per doc: ingesting doc B can change doc A's spans.

Output contract (the family's equality bar, pinned in
tests/test_incremental_substring.py): ``process_batch`` emits the
batch's NEWLY-DUPLICATED window occurrences, merged into per-doc spans
— including retro spans for earlier-ingested docs. Every duplicated
window occurrence of the eventual corpus is emitted in EXACTLY ONE
batch (the one where its hash reaches ``min_docs`` distinct docs, or
the one that ingests the doc, whichever is later), so merging the
union of all emissions per doc equals one-shot
``duplicated_spans`` over the concatenated corpus: the merge rule
(overlapping-or-adjacent) depends only on token coverage, and the
emitted coverage sets are equal by construction.

State layout (all parquet under ``state_path``, shared by batch
backfill and the streaming ``substring_dedup_sink`` twin):

- ``ids/``  — (doc_id, batch_seq): membership (re-send drop) + replay
  classification, same contract as the other incremental gates.
- ``wins/`` — (h, doc_id, pos, batch_seq): ingested window
  occurrences, the 8 B xxhash64 key from substring._window_hashes.
  ``compact_state`` re-clusters on h and persists per-file [min, max]
  h ranges to ``wins_index/`` so the per-batch probe is FILE-PRUNED —
  files read scale with the batch's hash coverage, not state size
  (the same r8/r9 discipline as IncrementalNearDeduper's bands/).
  Compaction also DROPS rows whose hash is already duplicated-and-
  emitted (see compact_state's ``drop_emitted_wins``): steady-state
  wins/ holds only the STILL-SINGLETON occurrences plus the newest
  batch — without the drop, window state would rival the corpus
  itself at 100 TB on the duplicate-heavy corpora ExactSubstr
  exists for.
- ``dup/``  — (h, batch_seq): hashes already known duplicated (their
  prior occurrences already emitted). Pure fetch-avoidance: for
  h ∈ dup the probe never fetches state occurrences (a boilerplate
  window shared by 100k docs would otherwise re-fetch all 100k rows
  every time a batch mentions it). Clustered + indexed like wins/.

Scale shape of the probe: the batch side is micro-batch-sized by
construction; its distinct hash set (8 B each) BROADCASTS into hash
joins whose streamed side is the (file-pruned) state scan — state is
read map-side and never shuffled, so per-batch traffic is
O(batch + retro transitions), independent of corpus size. The only
shuffles are groupBys over batch-bounded frames.

Crash safety / replay (same contract as the family, r6 review): state
appends land wins/ → dup/ → ids/, ids LAST (membership classifies
future arrivals). The probe's prior-state view excludes the batch's
OWN docs by doc_id (wins/) and its own batch_seq (dup/), so a replay
after ANY append-prefix crash recomputes the identical output; replays
with no novel docs append nothing, and a mixed replay's re-appends are
exact-row duplicates that compact_state drops (countDistinct/semi-join
consumers are unaffected meanwhile).

No reference counterpart (SURVEY.md §2.3 — no text surface); completes
the incremental symmetry for the last dedup family (exact:
IncrementalDeduper; lexical: IncrementalNearDeduper; semantic:
IncrementalSemanticDeduper; substring: this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamy_db_spark.operators.incremental_base import (
    StateComponent,
    compact_guard,
)
from streamy_db_spark.operators.substring import (
    SUBSTR_WINDOW,
    _spans_from_hits,
    _window_hashes,
)


class IncrementalSubstrDeduper:
    """Batch-over-batch ExactSubstr span detection (module docstring).

    ``process_batch(docs, batch_id)`` returns the batch's newly-
    duplicated spans — (id_col, start_tok, end_tok), including RETRO
    spans for earlier docs — and appends the batch's window occurrences
    to state. Unlike the admission gates, the output is a span frame,
    not a filtered doc frame: span application (strip) composes
    downstream via substring.strip_duplicated_spans over the merged
    span union.

    Replay/re-send contract: a doc in ids/ from an EARLIER batch is an
    at-least-once re-send and is dropped from the batch (its windows
    already count as prior state); a doc in ids/ from THIS batch_id is
    a crash-replay participant — it re-enters the computation, whose
    state views exclude the batch's own crashed appends, so the replay
    re-emits the original spans verbatim (the idempotent-sink
    contract). Without ``batch_id``, any id match is treated as replay
    and dup/ is READ unfiltered but never WRITTEN — the read is
    load-bearing after a ``drop_emitted_wins`` compaction (the dropped
    occurrences are only represented by their dup/ entry), and the
    write skip keeps None-bid replays deterministic (the view cannot
    contain a crashed None-bid run's own rows). Monotone batch ids are
    strongly recommended: they enable the dup fast-path writes and the
    re-send/replay distinction."""

    def __init__(
        self,
        spark: SparkSession,
        state_path: str,
        id_col: str = "doc_id",
        window: int = SUBSTR_WINDOW,
        min_docs: int = 2,
        broadcast_batch_max_windows: int = 2_000_000,
        prune_max_windows: int = 500_000,
        prune_min_indexed_files: int = 4,
    ):
        if min_docs < 2:
            raise ValueError(f"min_docs must be >= 2, got {min_docs}")
        self.spark = spark
        self.state_path = state_path
        self.id_col = id_col
        self.window = window
        self.min_docs = min_docs
        # ~16 B of broadcast payload per distinct batch hash; the
        # default caps the hash-set broadcast at ~32 MB. Batches above
        # it fall back to shuffle joins (a backfill shape — use the
        # one-shot duplicated_spans for those instead).
        self.broadcast_batch_max_windows = broadcast_batch_max_windows
        # File-level probe pruning collects the batch's distinct window
        # hashes to the driver (8 B each; 500k ⇒ ~4 MB) — attempted
        # only up to this window count, and only when at least
        # prune_min_indexed_files live state files are indexed (same
        # cost/benefit gate as IncrementalNearDeduper).
        self.prune_max_windows = prune_max_windows
        self.prune_min_indexed_files = prune_min_indexed_files
        #: Scan accounting of the LAST probe (None when pruning was not
        #: attempted): {"wins": {files_total, files_read, files_pruned},
        #: "dup": {...}} — the observable the pruning tests gate on.
        self.last_probe_scan: dict | None = None
        root = state_path.rstrip("/")
        self._ids_path = root + "/ids"
        self._wins_path = root + "/wins"
        self._dup_path = root + "/dup"
        # shared lifecycle scaffold (incremental_base.StateComponent):
        # each component owns its directory, sidecar, memo and the
        # pruned-read ladder; this gate keeps only admission policy
        self._comp = {
            "ids": StateComponent(
                self.spark, self._ids_path, root + "/ids_index", "doc_id"
            ),
            "wins": StateComponent(
                self.spark, self._wins_path, root + "/wins_index", "h"
            ),
            "dup": StateComponent(
                self.spark, self._dup_path, root + "/dup_index", "h"
            ),
        }

    # -- state access ------------------------------------------------------
    def _ids(self) -> DataFrame | None:
        return self._comp["ids"].read()

    def _ids_for_probe(
        self, raw_ids: DataFrame, n_keys: int
    ) -> DataFrame | None:
        """The ids/ scan for the membership/re-send lookup, FILE-PRUNED
        via the compaction-time doc_id-range sidecar when possible
        (ids_index/ — doc ids are quasi-ordered, so id ranges prune far
        better than the hashed window keys). None = no ids/ state, or
        pruning PROVED no state file can hold a batch id. NOT suitable
        for the None-bid ``max_seq`` horizon, which must be the GLOBAL
        ids/ max (a pruned-subset max could understate it past the
        drop-rule's horizon and lose a retro emission) — that rare
        path reads the full frame. Accounting lands under
        ``last_probe_scan["ids"]``."""
        keys = None
        if 0 < n_keys <= self.prune_max_windows:
            # NULL ids never equi-join and break the sort: exclude
            keys = lambda: sorted(  # noqa: E731
                r["_id"] for r in raw_ids.collect() if r["_id"] is not None
            )
        df, acct = self._comp["ids"].scan_or_full(
            keys, self.prune_min_indexed_files
        )
        self._record_scan("ids", acct)
        return df

    def seen_count(self) -> int:
        ids = self._ids()
        return 0 if ids is None else ids.select("doc_id").distinct().count()

    def _record_scan(self, which: str, acct: dict | None) -> None:
        """File accounting of the last pruned scan, keyed by component
        ({"wins": {...}, "dup": {...}, "ids": {...}}) — the observable
        the pruning tests gate on; only set when pruning RAN."""
        if acct is not None:
            if self.last_probe_scan is None:
                self.last_probe_scan = {}
            self.last_probe_scan[which] = acct

    def _index_ranges(self, which: str) -> dict | None:
        """Memoized advisory file-range index for wins/, dup/ or ids/
        (StateComponent.ranges — the memo only changes under THIS
        instance's compact_state, and a stale cache only over-reads)."""
        return self._comp[which].ranges()

    def _state_scan(self, which: str, sorted_hashes: list | None):
        """The wins/ or dup/ scan for this batch's probe, FILE-PRUNED
        when possible (StateComponent.scan_or_full). Returns a
        DataFrame or None (no state rows / zero possible overlap).
        ``sorted_hashes`` None ⇒ pruning not attempted (oversized
        batch). Never loses candidates, only over-reads (the
        prune_band_files contract — unindexed files always read)."""
        df, acct = self._comp[which].scan_or_full(
            sorted_hashes, self.prune_min_indexed_files
        )
        self._record_scan(which, acct)
        return df

    # -- the per-batch computation ------------------------------------------
    def _empty_spans(self, docs: DataFrame) -> DataFrame:
        from pyspark.sql import types as T

        id_type = docs.schema[self.id_col].dataType
        return self.spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField(self.id_col, id_type),
                    T.StructField("start_tok", T.IntegerType()),
                    T.StructField("end_tok", T.IntegerType()),
                ]
            ),
        ).localCheckpoint(eager=True)

    def process_batch(
        self, docs: DataFrame, batch_id: int | None = None
    ) -> DataFrame:
        """Newly-duplicated spans for this batch (class docstring).
        Eagerly materialized: the output must not keep a lazy
        dependency on state files a later compact_state renames away,
        and the state appends below must not re-trigger a scan that
        sees its own output."""
        if batch_id is not None and batch_id < 0:
            raise ValueError(f"batch_id must be >= 0, got {batch_id}")
        self.last_probe_scan = None
        if docs.isEmpty():
            return self._empty_spans(docs)

        raw_ids = (
            docs.select(F.col(self.id_col).alias("_id"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_keys = raw_ids.count()
        batch_doc_ids = raw_ids
        # ONE (file-pruned) ids/ scan serves the re-send filter AND the
        # append's novel-doc classification: the state scan STREAMS
        # through a hash join against the batch's (broadcast) id set —
        # the hits pattern the wins/ probe already uses, so neither
        # lookup ever distincts or shuffles full state (the prior form
        # did both, every micro-batch).
        ids = self._ids_for_probe(raw_ids, n_keys)
        id_hits = None
        if ids is not None:
            bkeys = raw_ids.select(F.col("_id").alias("doc_id"))
            if n_keys <= self.broadcast_batch_max_windows:
                bkeys = F.broadcast(bkeys)
            cols = ["doc_id"]
            if "batch_seq" in ids.columns:
                cols.append("batch_seq")
            id_hits = (
                ids.select(*cols).join(bkeys, "doc_id")
                .localCheckpoint(eager=True)  # ≤ batch-sized
            )
            if batch_id is not None and "batch_seq" in id_hits.columns:
                # re-sends (earlier batches) drop; this batch's own ids
                # are crash-replay participants and stay in
                resend = (
                    id_hits.filter(F.col("batch_seq") != int(batch_id))
                    .select(F.col("doc_id").alias(self.id_col))
                    .distinct()
                    .localCheckpoint(eager=True)
                )
                docs = docs.join(resend, self.id_col, "left_anti")
                batch_doc_ids = raw_ids.join(
                    resend.select(F.col(self.id_col).alias("_id")),
                    "_id",
                    "left_anti",
                ).localCheckpoint(eager=True)
            # without batch_id every id match is a replay participant:
            # it stays in the batch, its state rows are excluded by doc
            # below, and appends skip it via the novel-doc anti-join
        # ONE materialization of the batch's windows: the hash scan
        # feeds the stats, the needle collect, the emission join and
        # the state append (r8 discipline shared by the whole family).
        # spread first (r13, guide §2.6): the O(tokens) window-hash
        # fold otherwise runs with the source's partitioning — one
        # task locally (single-row-group files) — and was a measured
        # ~4 s single-task hot spot per trigger; the exchange is
        # batch-sized and the count follows defaultParallelism.
        from streamy_db_spark.sources.tables import spread

        wins_b = _window_hashes(
            spread(docs.select(self.id_col, "text"), self.id_col),
            self.window,
            self.id_col,
        ).localCheckpoint(eager=True)
        n_windows = wins_b.count()
        decisions = None
        if n_windows == 0:
            out = self._empty_spans(docs)
        else:
            # newest COMMITTED batch seq (None when no state): the
            # None-bid dup-trust horizon (see _spans_of_batch).
            # Numbered batches never consult it — skip the agg entirely
            # (it was a full ids/ column scan per trigger on the hot
            # streaming path). When needed it MUST come from the FULL
            # frame, never the pruned probe view: a pruned-subset max
            # could understate the horizon past the drop-rule's, and a
            # dropped hash's retro emission would be lost.
            max_seq = None
            if batch_id is None:
                full_ids = self._ids()
                if full_ids is not None and "batch_seq" in full_ids.columns:
                    max_seq = full_ids.agg(F.max("batch_seq")).collect()[0][0]
            out, decisions = self._spans_of_batch(
                wins_b, batch_doc_ids, batch_id, n_windows, max_seq
            )
        self._append_state(wins_b, batch_doc_ids, batch_id, id_hits, decisions)
        return out

    def _probe_prior(
        self, wins_state, fetch_h, batch_doc_ids, bcast: bool
    ) -> DataFrame:
        """The batch↔state occurrence probe — the operation that must
        NEVER shuffle the state side (the family's 100×-scale rule):
        the state scan streams through a broadcast hash semi-join on
        the batch's (not-yet-dup) hash set, then a broadcast hash
        anti-join drops the batch's OWN docs (replay exclusion by
        doc_id — precise under every append-prefix crash). Lazy and
        split out so the plan gate can inspect it (the caller's
        distinct + checkpoint would hide the join behind Scan
        ExistingRDD)."""
        maybe_b = F.broadcast if bcast else (lambda df: df)
        return (
            wins_state.select("h", F.col("doc_id").alias("_id"), "pos")
            .join(maybe_b(fetch_h), "h", "left_semi")
            .join(maybe_b(batch_doc_ids), "_id", "left_anti")
        )

    def _spans_of_batch(
        self, wins_b, batch_doc_ids, batch_id, n_windows, max_seq=None
    ) -> tuple[DataFrame, DataFrame]:
        """(spans, per-hash decision frame) — the decisions feed the
        dup/ append. ``max_seq`` is the newest COMMITTED ids/ batch
        (the None-bid dup-trust horizon below)."""
        bcast = n_windows <= self.broadcast_batch_max_windows
        maybe_b = F.broadcast if bcast else (lambda df: df)

        # per-hash batch stats (batch-sized; reused as the needle set)
        batch_h = wins_b.groupBy("h").agg(
            F.count_distinct("_id").alias("n_batch")
        ).localCheckpoint(eager=True)

        needles = None
        if 0 < n_windows <= self.prune_max_windows:
            needles = sorted(r["h"] for r in batch_h.select("h").collect())

        # dup/ view — MANDATORY for None-bid batches too, not an
        # optimization, once compaction has dropped emitted wins/ rows
        # (r11 review: wins-count classification alone would see
        # n_prior=0 for a dropped-but-duplicated hash and never emit
        # its span). Trust horizon:
        # - numbered batch bid: exclude batch_seq == bid (its own
        #   crashed appends; later seqs cannot exist under monotone
        #   in-order replay);
        # - None-bid batch: trust ONLY batch_seq < max_seq (the newest
        #   COMMITTED ids/ batch). A dup row at or past the horizon may
        #   come from a numbered batch whose emission never committed
        #   (r11 third review) — distrusting it re-derives duplication
        #   from wins/ counts, whose rows the drop rule PROVABLY kept
        #   (it only drops below the same horizon), and any double
        #   emission is idempotent under the union-merge contract;
        #   only LOST emission is unsafe.
        dup_hits = None
        dup_state = self._state_scan("dup", needles)
        if dup_state is not None:
            if batch_id is not None:
                dup_state = dup_state.filter(
                    F.col("batch_seq") != int(batch_id)
                )
            elif max_seq is not None:
                dup_state = dup_state.filter(
                    F.col("batch_seq") < int(max_seq)
                )
            else:
                dup_state = dup_state.limit(0)  # no committed horizon
            dup_hits = (
                dup_state.join(maybe_b(batch_h.select("h")), "h", "left_semi")
                .select("h")
                .distinct()
                .localCheckpoint(eager=True)
            )
            if dup_hits.isEmpty():
                dup_hits = None

        # wins/ probe: state occurrences of batch hashes NOT already
        # dup, excluding the batch's OWN docs (replay exclusion by
        # doc_id — precise under every append-prefix crash). State is
        # the streamed side; the batch hash set and doc set broadcast.
        probe_needles = needles
        fetch_h = batch_h.select("h")
        skip_wins = False
        if dup_hits is not None:
            fetch_h = fetch_h.join(dup_hits, "h", "left_anti").localCheckpoint(
                eager=True
            )
            # steady state for boilerplate-heavy streams: every batch
            # hash already known duplicated ⇒ nothing to fetch, skip
            # the state scan entirely (batch-sized emptiness probe)
            skip_wins = fetch_h.isEmpty()
            if probe_needles is not None and not skip_wins:
                dset = {r["h"] for r in dup_hits.collect()}
                probe_needles = [h for h in probe_needles if h not in dset]
        wins_state = (
            None if skip_wins else self._state_scan("wins", probe_needles)
        )
        if wins_state is not None:
            prior_rows = (
                self._probe_prior(wins_state, fetch_h, batch_doc_ids, bcast)
                .distinct()  # crash-replayed appends leave exact dups
                .localCheckpoint(eager=True)
            )
        else:
            prior_rows = None

        if prior_rows is not None:
            prior_stats = prior_rows.groupBy("h").agg(
                F.count_distinct("_id").alias("n_prior")
            )
        else:
            prior_stats = None

        # per-hash decisions (batch-sized frame, broadcast back)
        d = batch_h
        if prior_stats is not None:
            d = d.join(prior_stats, "h", "left")
        else:
            d = d.withColumn("n_prior", F.lit(None).cast("long"))
        d = d.withColumn("n_prior", F.coalesce(F.col("n_prior"), F.lit(0)))
        if dup_hits is not None:
            d = d.join(
                dup_hits.withColumn("_isdup", F.lit(True)), "h", "left"
            ).withColumn("_isdup", F.coalesce(F.col("_isdup"), F.lit(False)))
        else:
            d = d.withColumn("_isdup", F.lit(False))
        total = F.col("n_prior") + F.col("n_batch")
        d = d.select(
            "h",
            (F.col("_isdup") | (total >= self.min_docs)).alias("_emit_b"),
            (
                ~F.col("_isdup")
                & (F.col("n_prior") >= 1)
                & (F.col("n_prior") < self.min_docs)
                & (total >= self.min_docs)
            ).alias("_emit_p"),
            (~F.col("_isdup") & (total >= self.min_docs)).alias("_new_dup"),
        ).localCheckpoint(eager=True)

        occ = wins_b.join(
            maybe_b(d.filter("_emit_b").select("h")), "h", "left_semi"
        ).select("_id", "pos")
        if prior_rows is not None:
            occ = occ.unionByName(
                prior_rows.join(
                    maybe_b(d.filter("_emit_p").select("h")), "h", "left_semi"
                ).select("_id", "pos")
            )
        spans = _spans_from_hits(
            occ.distinct(), self.window, self.id_col
        ).localCheckpoint(eager=True)
        return spans, d

    def _append_state(
        self, wins_b, batch_doc_ids, batch_id, id_hits, decisions
    ) -> None:
        """wins/ → dup/ → ids/, ids LAST (module docstring). Only novel
        docs (not in ids/ under ANY batch) append; a pure replay
        appends nothing. ``id_hits`` is process_batch's checkpointed
        batch↔ids/ hit set (≤ batch-sized) — the novel classification
        anti-joins against it instead of re-distincting the full ids/
        state (hits ∩ batch ids == state ids ∩ batch ids, so the
        verdict is identical and the join's right side is tiny)."""
        novel = batch_doc_ids
        if id_hits is not None:
            novel = novel.join(
                id_hits.select(F.col("doc_id").alias("_id")).distinct(),
                "_id",
                "left_anti",
            )
        novel = novel.localCheckpoint(eager=True)
        if novel.isEmpty():
            return
        seq = F.lit(-1 if batch_id is None else int(batch_id)).cast("long")
        new_wins = wins_b.join(F.broadcast(novel), "_id").select(
            "h", F.col("_id").alias("doc_id"), "pos", seq.alias("batch_seq")
        )
        if not new_wins.isEmpty():
            new_wins.write.mode("append").parquet(self._wins_path)
        if batch_id is not None and decisions is not None:
            new_dup = decisions.filter("_new_dup").select(
                "h", seq.alias("batch_seq")
            )
            if not new_dup.isEmpty():
                new_dup.write.mode("append").parquet(self._dup_path)
        novel.select(F.col("_id").alias("doc_id"), seq.alias("batch_seq")).write.mode(
            "append"
        ).parquet(self._ids_path)

    # -- maintenance ----------------------------------------------------------
    def _droppable_wins_hashes(self) -> DataFrame | None:
        """Hashes whose wins/ occurrences are provably DEAD state: h is
        in dup/ (its prior occurrences were already emitted, so no
        future arrival ever fetches them — new copies take the dup fast
        path and emit batch rows only) AND its dup transition landed in
        a batch STRICTLY BEFORE the newest ids/ batch. The second
        condition protects crash-replay of the newest batch: a replay
        excludes that batch's own dup rows (batch_seq == bid), treats
        its transition hashes as not-yet-dup, and re-fetches their
        prior occurrences — which therefore must still exist. Batches
        replay in order under monotone ids, so only the newest batch
        can ever replay against this state. None-bid appends never
        write dup/ rows, so nothing is ever dropped for them — and
        None-bid batches READ dup/ (unfiltered), so a dropped hash's
        duplication is still visible to them (r11 review: the drop
        would otherwise falsify their wins-count classification)."""
        dup = self._comp["dup"].read()
        ids = self._comp["ids"].read()
        if dup is None or ids is None:
            return None
        max_seq = ids.agg(F.max("batch_seq")).collect()[0][0]
        if max_seq is None:
            return None
        return (
            dup.filter(F.col("batch_seq") < int(max_seq))
            .select("h")
            .distinct()
        )

    def compact_state(
        self,
        target_file_mb: int = 128,
        force: bool = False,
        stream_heartbeat_max_age_s: float = 600.0,
        wins_min_files: int = 1,
        dup_min_files: int = 1,
        drop_emitted_wins: bool = True,
        ids_min_files: int = 1,
    ) -> int:
        """Rewrite the append-only state components, re-clustering
        wins/ and dup/ on h and persisting the per-file [min, max] h
        ranges the probe prunes with (exact compact_state contract of
        the family: heartbeat-guarded with the pre-swap re-check,
        exact-row dedupe drops crash-replay artifacts, min_files floors
        give the tests a pruning observable). Returns the total output
        file count.

        ``drop_emitted_wins`` (default ON) additionally drops wins/
        rows for already-emitted hashes (_droppable_wins_hashes): the
        gate's dominant state component shrinks from O(all ingested
        tokens) to O(still-singleton tokens + the newest batch) — on a
        duplicate-heavy corpus (what ExactSubstr exists for) most of
        the window state is dead the moment its hash enters dup/, and
        carrying it forever would make wins/ rival the corpus itself
        at 100 TB. Runs inside compact_parquet's write-then-swap, so a
        crash mid-rewrite loses nothing."""
        from pyspark.storagelevel import StorageLevel

        _recheck = compact_guard(
            self.spark, self.state_path, force, stream_heartbeat_max_age_s
        )
        _recheck()
        wins_transform = None
        droppable = None
        if drop_emitted_wins:
            droppable = self._droppable_wins_hashes()
            if droppable is not None:
                # DISK_ONLY persist, not localCheckpoint and not lazy
                # (r11 third review): the transformed wins frame is
                # evaluated TWICE inside compact_parquet —
                # repartitionByRange's RangePartitioner sampling pass
                # plus the write — so a lazy dup-hash set would scan
                # dup/ twice; and the set is corpus-history-scale on
                # duplicate-heavy corpora, so the repo's corpus-frame
                # discipline applies (recomputable on executor loss,
                # released in the finally below). The anti-join on h
                # lets AQE pick broadcast vs shuffle from its size.
                droppable = droppable.persist(StorageLevel.DISK_ONLY)
                wins_transform = lambda df: df.join(  # noqa: E731
                    droppable, "h", "left_anti"
                )
        total = 0
        try:
            # ids/ is clustered + indexed on doc_id so the membership/
            # re-send lookup can file-prune like the other scans; each
            # component's compact handles the sidecar rewrite + memo
            # invalidation (incremental_base.StateComponent.compact)
            for which, min_files, transform in (
                ("ids", ids_min_files, None),
                ("wins", wins_min_files, wins_transform),
                ("dup", dup_min_files, None),
            ):
                total += self._comp[which].compact(
                    self.state_path,
                    target_file_mb,
                    min_files,
                    _recheck,
                    transform=transform,
                )
        finally:
            if droppable is not None:
                droppable.unpersist()
        return total
