"""Streaming transaction engine — Structured Streaming parity mode.

Port of the reference pipeline (SURVEY.md §3.1) onto
``applyInPandasWithState`` (GroupState + event-time timeouts; the
``transformWithStateInPandas`` variant needs protobuf, absent here — the
GroupState formulation is 1:1 anyway, with the reference's multiple state
handles packed into one state tuple per key):

- **sorter_key_processor** = S1 KeyedEventTimeSorter + S2
  KeyTransactionProcessor fused per key (the reference feeds S1 straight
  into S2 on the same key — fusing removes one stateful hop and one
  shuffle while preserving semantics exactly;
  flink/StreamyDb.scala:209-225). Read/Lock requests buffer in state
  until the watermark passes their event time (event-time timeout), then
  replay in the serial order ``(ts, kafka_partition, kafka_offset,
  transaction_id, kind)`` (D7's tuple with the reference sorter's
  transactionId tiebreak flink:44-49 — tied transactions execute as
  whole units, reads before own writes) through the lock/waiter state
  machine (flink:85-127). Commit notifications (kind 2
  — the feedback loop D2+D5) apply on arrival, NOT sorted, same as the
  reference's un-sorted union at flink:219: the lock discipline, not
  global order, makes this safe.
- **transaction_processor** = S3 (flink:131-175) keyed by
  transaction_id: accumulate body + read results, emit the
  assert-conjunction verdict once all reads arrived. No timeout.

The commit/abort feedback cycle runs OUTSIDE the dataflow graph (both
Flink and Spark DAGs are acyclic): results are re-consumed from the
output log, fanned out per updated key (D5), re-stamped with a fresh
event time (Kafka LogAppendTime in the reference — wall clock here), and
unioned back into the key stage. Any replayable source works; tests use
file-coupled directories since Kafka isn't in this container — the
operator topology is source-agnostic (swap ``readStream.format``).

Scale: state is per-key / per-txn hash-partitioned (linear scale-out;
RocksDB state store provider on a real cluster); the only shuffles are
the two groupBys — identical boundaries to the reference's keyBys
(flink:209,222,230). Hot-key state is bounded by that key's in-flight
transactions, not history: the sorter buffer drains at the watermark and
waiter queues drain at commit.
"""

from __future__ import annotations

from bisect import bisect_left, insort
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# wire schemas
# ---------------------------------------------------------------------------

# Unified key-stage message (KeyProcessorMessage, core/package.scala:53-58):
# kind 0 = ReadRequest, 1 = LockRequest, 2 = KeyTransactionResult,
# 3 = heartbeat (advances the watermark only; reference D14 sends empty
# transaction lists for the same purpose, core/HeartBeatGenerator.scala:59).
KIND_READ, KIND_LOCK, KIND_TXN_RESULT, KIND_HEARTBEAT = 0, 1, 2, 3

KEY_MSG = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("kafka_partition", T.IntegerType(), False),
        T.StructField("kafka_offset", T.LongType(), False),
        T.StructField("kind", T.IntegerType(), False),
        T.StructField("transaction_id", T.StringType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("succeeded", T.BooleanType(), True),  # kind 2 only
        T.StructField("value", T.StringType(), True),  # kind 2 write value
    ]
)

READ_RESULT_OUT = T.StructType(
    [
        T.StructField("transaction_id", T.StringType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
    ]
)

KV_ARRAY = T.ArrayType(
    T.StructType(
        [
            T.StructField("key", T.StringType(), True),
            T.StructField("value", T.StringType(), True),
        ]
    )
)

# Txn-stage message: kind 0 = transaction body, 1 = read result.
TXN_MSG = T.StructType(
    [
        T.StructField("transaction_id", T.StringType(), False),
        T.StructField("kind", T.IntegerType(), False),
        T.StructField("key", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
        T.StructField("asserts", KV_ARRAY, True),
        T.StructField("updates", KV_ARRAY, True),
    ]
)

# Result carries the updates so the feedback stage (D5) is stateless —
# the reference embeds the whole transaction (core/package.scala:48).
TXN_RESULT_OUT = T.StructType(
    [
        T.StructField("transaction_id", T.StringType(), False),
        T.StructField("succeeded", T.BooleanType(), False),
        T.StructField("updates", KV_ARRAY, True),
    ]
)

# ---------------------------------------------------------------------------
# S1+S2 per-key state, packed into one GroupState tuple.
#
# DELIBERATE DEPARTURE from the reference implementation (SURVEY §2.5
# addendum): the reference parks a read on the *latest* lock holder and
# applies commit notifications the moment they arrive
# (flink/StreamyDb.scala:98-100, 103-127). Property-based testing showed
# that breaks its own serializability claim: with reader R at serial
# position p parked on writer W1 < p, a LATER writer W2 > p whose commit
# feedback overtakes W1's (Kafka gives no cross-topic order) applies its
# write first, so R observes W2's value — a non-serial read; and commit
# feedback overtaking the sorter (assert-free txn) wedges the lock queue
# entirely. This machine instead keeps the per-key lock LOG in serial
# order and applies decided outcomes strictly in log order:
#   buffer : S1 reorder buffer (flink:41), cleaned on fire (Beam:66).
#   cell   : value after applying the decided log prefix (flink:75).
#   entries: ordered lock log [(pos, txn, decided, ok, wvalue)] — the
#            undecided frontier blocks application and reads behind it.
#   parked : reads waiting for every earlier lock to decide.
#   early  : commit outcomes that arrived before their lock flushed.
# A read at position p emits exactly when all locks < p are decided, and
# then observes precisely the committed writes < p — feedback arrival
# order can no longer change any observed value (asserted by
# tests/test_protocol_properties.py over random permutations).
# ---------------------------------------------------------------------------

_POS = [
    T.StructField("ts_ms", T.LongType()),
    T.StructField("kafka_partition", T.IntegerType()),
    T.StructField("kafka_offset", T.LongType()),
]

KEY_STATE = T.StructType(
    [
        T.StructField(
            "buffer",
            T.ArrayType(
                T.StructType(
                    _POS
                    + [
                        T.StructField("kind", T.IntegerType()),
                        T.StructField("transaction_id", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("cell", T.StringType(), True),
        T.StructField("has_cell", T.BooleanType()),
        T.StructField(
            "entries",
            T.ArrayType(
                T.StructType(
                    _POS
                    + [
                        T.StructField("txn", T.StringType()),
                        T.StructField("decided", T.BooleanType()),
                        T.StructField("ok", T.BooleanType()),
                        T.StructField("wvalue", T.StringType(), True),
                    ]
                )
            ),
        ),
        T.StructField(
            "parked",
            T.ArrayType(
                T.StructType(_POS + [T.StructField("txn", T.StringType())])
            ),
        ),
        T.StructField(
            "early",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("txn", T.StringType()),
                        T.StructField("ok", T.BooleanType()),
                        T.StructField("wvalue", T.StringType(), True),
                    ]
                )
            ),
        ),
        # Highest serial position already APPLIED to the cell or released
        # to a reader — requests below it can no longer be serialized
        # (late beyond the watermark): exact redeliveries drop, anything
        # else raises instead of silently mis-serializing.
        T.StructField(
            "applied",
            T.StructType(
                _POS
                + [
                    T.StructField("txn", T.StringType()),
                    T.StructField("kind", T.IntegerType()),
                ]
            ),
            True,
        ),
        # Ring of recently-decided transaction ids: duplicate
        # (at-least-once) feedback for an already-applied transaction is
        # recognized and dropped instead of leaking into ``early``.
        T.StructField("recent", T.ArrayType(T.StringType()), True),
        # Ring of recently APPLIED serial positions: a replayed request
        # strictly below the frontier (at-least-once source redelivering
        # more than one already-processed record) matches here and drops
        # idempotently instead of tripping the non-serializable guard.
        T.StructField(
            "applied_ring",
            T.ArrayType(
                T.StructType(
                    _POS
                    + [
                        T.StructField("txn", T.StringType()),
                        T.StructField("kind", T.IntegerType()),
                    ]
                )
            ),
            True,
        ),
    ]
)

# Bounds for the redelivery bookkeeping: ``recent`` remembers the last N
# decided txns per key and ``applied_ring`` the last N applied serial
# positions (redelivery beyond those horizons is detected and raised on,
# never silently mis-serialized).
_RECENT_CAP = 128
_RING_CAP = 256
_EARLY_CAP = 1024


def _norm_str(v):
    """Pandas smuggles NULL strings as NaN; normalize to None."""
    return v if isinstance(v, str) else (None if v is None or pd.isna(v) else str(v))


def _as_list(v):
    """NULL arrays arrive as None/NaN, non-null as numpy arrays (whose
    truthiness is ambiguous) — normalize to a plain list."""
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return []
    return list(v)


class _KeyMachine:
    """Deterministic per-key lock-log machine (S2 semantics done right —
    see the KEY_STATE comment for why this departs from flink:85-127)."""

    def __init__(self, key: str, state_tuple):
        self.key = key
        if state_tuple is None:
            self.buffer: list = []
            self.cell = None
            self.has_cell = False
            # entries: [pos5, txn, decided, ok, wvalue] in serial order
            self.entries: list[list] = []
            self.parked: list[tuple] = []  # (pos5, txn) in serial order
            self.early: dict[str, tuple] = {}  # txn -> (ok, wvalue)
            self.applied: tuple | None = None  # max pos applied/released
            self.recent: list[str] = []  # decided-txn ring (FIFO)
            self.applied_ring: list[tuple] = []  # applied-pos ring (FIFO)
        else:
            (
                buf,
                cell,
                has_cell,
                entries,
                parked,
                early,
                applied,
                recent,
                applied_ring,
            ) = state_tuple
            self.buffer = [tuple(b) for b in (buf or [])]
            self.cell = _norm_str(cell)
            self.has_cell = bool(has_cell)
            # in-memory pos is the 5-tuple serial key (ts_ms, partition,
            # offset, txn, kind) — D7 with the reference sorter's
            # transactionId tiebreak, kind last (read=0 < lock=1). The
            # stored schema carries (pos3, txn); kind is implied by which
            # list the row sits in.
            self.entries = [
                [
                    (e[0], e[1], e[2], e[3], 1),
                    e[3],
                    bool(e[4]),
                    bool(e[5]),
                    _norm_str(e[6]),
                ]
                for e in (entries or [])
            ]
            self.parked = [
                ((p[0], p[1], p[2], p[3], 0), p[3]) for p in (parked or [])
            ]
            self.early = {w[0]: (bool(w[1]), _norm_str(w[2])) for w in (early or [])}
            self.applied = (
                None
                if applied is None
                else (applied[0], applied[1], applied[2], applied[3], applied[4])
            )
            self.recent = list(recent or [])
            self.applied_ring = [
                (p[0], p[1], p[2], p[3], p[4]) for p in (applied_ring or [])
            ]

    def to_tuple(self):
        return (
            self.buffer,
            self.cell,
            self.has_cell,
            [(*e[0][:3], e[1], e[2], e[3], e[4]) for e in self.entries],
            [(*pos[:3], txn) for pos, txn in self.parked],
            [(t, ok, wv) for t, (ok, wv) in self.early.items()],
            self.applied,
            self.recent,
            self.applied_ring,
        )

    def current(self):
        return self.cell if self.has_cell else None

    def _admit(self, pos: tuple) -> bool:
        """Serializability guard for the applied frontier: a request at a
        position already applied/released cannot be serialized any more.
        Exact redeliveries (same 5-tuple — at-least-once source, possibly
        several records deep) match ``applied_ring`` and drop
        idempotently; a position below the frontier that was NEVER
        applied raises instead of silently producing a non-serial read
        (use a nonzero watermark delay sized to source skew to avoid
        this)."""
        if self.applied is None or pos > self.applied:
            return True
        if pos == self.applied or pos in self.applied_ring:
            return False  # exact duplicate of an already-applied request
        raise RuntimeError(
            f"key {self.key!r}: request at serial position {pos} arrived "
            f"below the applied frontier {self.applied} and was never "
            "applied — late beyond the watermark; non-serializable"
        )

    def _advance(self, pos: tuple) -> None:
        """Record an applied/released serial position: frontier + ring."""
        self.applied = pos if self.applied is None else max(self.applied, pos)
        self.applied_ring.append(pos)
        if len(self.applied_ring) > _RING_CAP:
            del self.applied_ring[: len(self.applied_ring) - _RING_CAP]

    # -- event handlers (call _settle(out) after each) ----------------------

    def on_lock(self, txn: str, pos: tuple) -> None:
        """Insert into the lock log at its serial position (the log stays
        position-sorted — a tied-transaction lock flushed later than a
        higher-position lock must still decide first); consume an
        early-arrived outcome if the feedback overtook the sorter."""
        if not self._admit(pos):
            return
        i = bisect_left(self.entries, pos, key=lambda e: e[0])
        if i < len(self.entries) and self.entries[i][0] == pos:
            return  # redelivered lock already in the log
        outcome = self.early.pop(txn, None)
        if outcome is None:
            insort(self.entries, [pos, txn, False, False, None], key=lambda e: e[0])
        else:
            insort(
                self.entries,
                [pos, txn, True, outcome[0], outcome[1]],
                key=lambda e: e[0],
            )

    def on_read(self, txn: str, pos: tuple, out: list) -> None:
        if self._admit(pos) and pos not in (p for p, _ in self.parked):
            self.parked.append((pos, txn))
        self._settle(out)

    def on_txn_result(self, txn: str, succeeded: bool, value, out: list) -> None:
        for e in self.entries:
            if e[1] == txn and not e[2]:
                e[2], e[3], e[4] = True, succeeded, value
                break
        else:
            if txn in self.recent:
                # Duplicate (at-least-once) feedback for an already-
                # decided transaction — drop, don't leak into ``early``.
                return
            # Feedback overtook the lock request (assert-free txn whose
            # verdict looped back before the watermark flushed its lock).
            self.early[txn] = (succeeded, value)
            if len(self.early) > _EARLY_CAP:
                # Every entry here is a verdict awaiting its lock — none
                # is a known duplicate (those were dropped via ``recent``
                # above), so silent eviction would wedge that lock's key
                # forever. Fail loudly instead: this means >_EARLY_CAP
                # feedback messages overtook the sorter on one key, i.e.
                # the watermark delay is far too small for source skew.
                raise RuntimeError(
                    f"key {self.key!r}: {len(self.early)} early verdicts "
                    "awaiting their locks — watermark delay too small "
                    "for feedback/source skew (would wedge on eviction)"
                )
        self._settle(out)

    def _remember(self, txn: str) -> None:
        self.recent.append(txn)
        if len(self.recent) > _RECENT_CAP:
            del self.recent[: len(self.recent) - _RECENT_CAP]

    def _release_before(self, limit: tuple | None, out: list) -> None:
        """Release every parked read with serial position before ``limit``
        (all of them when ``limit`` is None) — each observes the cell as
        of the committed writes strictly before its own position."""
        still_parked = []
        for pos, txn in sorted(self.parked):
            # pos tuples end in the D7 kind (read=0 < lock=1) after the
            # txn-id tiebreak, so a read at the same (ts,part,off) as its
            # own transaction's lock sorts strictly before it — reads see
            # the pre-txn value — while a TIED LATER transaction's read
            # sorts after this txn's lock and waits for its verdict.
            if limit is None or pos < limit:
                out.append((txn, self.key, self.current()))
                self._advance(pos)
            else:
                still_parked.append((pos, txn))
        self.parked = still_parked

    def _settle(self, out: list) -> None:
        """Apply the decided log prefix to the cell in serial order,
        releasing parked reads BEFORE each later-positioned write lands.

        The release must interleave with application: a read parked
        between two decided entries (reader at serial position 7, decided
        writers at 6 and 8 — possible when the writer at 8 was assert-free
        and its feedback overtook the sorter) has to observe the cell
        after position 6's write but before position 8's. Applying the
        whole decided prefix first and releasing afterwards leaks the
        later write into the earlier read — a serializability violation
        (found by tests/test_protocol_properties.py, 11-txn repro)."""
        while self.entries and self.entries[0][2]:
            pos, txn, _dec, ok, wvalue = self.entries.pop(0)
            self._release_before(pos, out)
            self._advance(pos)
            self._remember(txn)
            if ok:
                if wvalue is None:
                    self.cell, self.has_cell = None, False  # delete
                else:
                    self.cell, self.has_cell = wvalue, True
        frontier = self.entries[0][0] if self.entries else None
        self._release_before(frontier, out)

    def flush(self, up_to_ms: int, out: list) -> None:
        """S1 fire: deliver buffered requests with ts ≤ watermark in
        serial order (ts, partition, offset, txn, kind) — D7's tuple with
        the reference sorter's transactionId tiebreak (flink:44-49)."""
        due = sorted(
            (b for b in self.buffer if b[0] <= up_to_ms),
            key=lambda b: (b[0], b[1], b[2], b[4], b[3]),
        )
        if not due:
            return
        self.buffer = [b for b in self.buffer if b[0] > up_to_ms]
        for ts, p, o, kind, txn in due:
            if kind == KIND_READ:
                self.on_read(txn, (ts, p, o, txn, 0), out)
            else:
                self.on_lock(txn, (ts, p, o, txn, 1))
        self._settle(out)


def sorter_key_processor(key, pdfs: Iterator[pd.DataFrame], state):
    m = _KeyMachine(key[0], state.get if state.exists else None)
    out: list = []

    if state.hasTimedOut:
        m.flush(state.getCurrentWatermarkMs(), out)
    else:
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                kind = int(r.kind)
                if kind == KIND_TXN_RESULT:
                    m.on_txn_result(
                        r.transaction_id,
                        bool(r.succeeded),
                        _norm_str(r.value),
                        out,
                    )
                elif kind in (KIND_READ, KIND_LOCK):
                    m.buffer.append(
                        (
                            int(r.ts_ms),
                            int(r.kafka_partition),
                            int(r.kafka_offset),
                            kind,
                            r.transaction_id,
                        )
                    )
                # KIND_HEARTBEAT: watermark food only.
        # Requests already at/below the watermark (possible when feedback
        # raced the watermark forward) flush immediately — their timeout
        # would otherwise be unsettable (must be > watermark).
        wm = state.getCurrentWatermarkMs()
        if wm > 0:
            m.flush(wm, out)

    # ``applied``/``recent``/``applied_ring`` keep the state alive through
    # quiescence (e.g. a committed delete emptied everything else): the
    # redelivery frontier + dedup rings must survive idle periods, or
    # duplicate at-least-once feedback would silently re-apply (ADVICE r2).
    # Cost: one small struct per ever-written key — the cell itself IS the
    # database, so this adds O(ring) per live key, not a new asymptote.
    if (
        m.buffer
        or m.has_cell
        or m.entries
        or m.parked
        or m.early
        or m.applied
        or m.recent
    ):
        state.update(m.to_tuple())
        if m.buffer:
            next_ts = min(b[0] for b in m.buffer)
            state.setTimeoutTimestamp(max(next_ts, state.getCurrentWatermarkMs() + 1))
    elif state.exists:
        state.remove()

    if out:
        yield pd.DataFrame(out, columns=["transaction_id", "key", "value"])


# ---------------------------------------------------------------------------
# S3: commit coordinator (flink:131-175)
# ---------------------------------------------------------------------------

TXN_STATE = T.StructType(
    [
        T.StructField("has_body", T.BooleanType()),
        T.StructField("asserts", KV_ARRAY, True),
        T.StructField("updates", KV_ARRAY, True),
        T.StructField(
            "reads",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField("value", T.StringType(), True),
                        T.StructField("absent", T.BooleanType()),
                    ]
                )
            ),
        ),
        T.StructField("done", T.BooleanType()),
    ]
)


def transaction_processor(key, pdfs: Iterator[pd.DataFrame], state):
    txn_id = key[0]
    if state.exists:
        has_body, asserts, updates, reads, done = state.get
        asserts = [(a[0], _norm_str(a[1])) for a in (asserts or [])]
        updates = [(u[0], _norm_str(u[1])) for u in (updates or [])]
        reads = {r[0]: (None if r[2] else _norm_str(r[1])) for r in (reads or [])}
    else:
        has_body, asserts, updates, reads, done = False, [], [], {}, False

    out: list = []
    for pdf in pdfs:
        for r in pdf.itertuples(index=False):
            if int(r.kind) == 0 and not has_body:
                # Transaction body (flink:155-157).
                has_body = True
                asserts = [(a["key"], _norm_str(a["value"])) for a in _as_list(r.asserts)]
                updates = [(u["key"], _norm_str(u["value"])) for u in _as_list(r.updates)]
            elif int(r.kind) == 1:
                # ReadResult (flink:158-160); keyed map dedups duplicate
                # feedback deliveries (at-least-once sink, SURVEY §2.3).
                reads[r.key] = _norm_str(r.value)

    # Completion gate (flink:165): one ReadResult per distinct assert key.
    if has_body and not done:
        assert_keys = {k for k, _ in asserts}
        if len(reads.keys() & assert_keys) >= len(assert_keys):
            ok = all(reads.get(k) == expected for k, expected in asserts)
            out.append((txn_id, ok, updates))
            done = True

    if done:
        # Verdict emitted — drop the state now (the reference keeps S3
        # state forever, an unbounded leak under long-running streams).
        # No straggler-TTL is needed: the key→txn edge lives inside the
        # micro-batch engine (exactly-once state/offset semantics), so a
        # read-result can never be redelivered after the verdict removed
        # the state; at-least-once redelivery exists only on the EXTERNAL
        # feedback loop (results topic → D2), which feeds the KEY stage,
        # where ``recent``/``applied_ring`` absorb it. A processing-time
        # TTL here would be worse than useless: Spark's
        # FlatMapGroupsWithStateExec.shouldRunAnotherBatch is
        # unconditionally true under ProcessingTimeTimeout, so any
        # availableNow drain spins no-data micro-batches until the timer
        # fires (the round-2 regression).
        if state.exists:
            state.remove()
    else:
        state.update(
            (
                has_body,
                asserts,
                updates,
                [(k, v, v is None) for k, v in reads.items()],
                done,
            )
        )
    if out:
        yield pd.DataFrame(out, columns=["transaction_id", "succeeded", "updates"])


# ---------------------------------------------------------------------------
# dataflow wiring (D3-D10)
# ---------------------------------------------------------------------------


def derive_key_messages(txns: DataFrame) -> DataFrame:
    """D4 (flink:203-208): asserts → ReadRequests (kind 0), updates →
    LockRequests (kind 1), one per distinct key (defensive dedup §2.5)."""
    base = txns.select(
        "ts",
        F.unix_millis("ts").alias("ts_ms"),
        "kafka_partition",
        "kafka_offset",
        "transaction_id",
        "asserts",
        "updates",
    )

    def fan(col: str, kind: int) -> DataFrame:
        return base.select(
            "ts", "ts_ms", "kafka_partition", "kafka_offset",
            F.lit(kind).alias("kind"),
            "transaction_id",
            F.explode(
                F.array_distinct(F.transform(col, lambda x: x["key"]))
            ).alias("key"),
            F.lit(None).cast("boolean").alias("succeeded"),
            F.lit(None).cast("string").alias("value"),
        )

    return fan("asserts", KIND_READ).unionByName(fan("updates", KIND_LOCK))


def derive_feedback(results: DataFrame, ts_col: str | None = None) -> DataFrame:
    """D5 (flink:192-200): one KeyTransactionResult per updated key
    (last-wins on duplicates — list application order), re-stamped with a
    fresh event time.

    ``ts_col`` names a timestamp column on ``results`` to stamp feedback
    with — in the Kafka wiring pass the results topic's LogAppendTime
    (the reference's choice, flink:197) so feedback timestamps come from
    ONE broker clock rather than many executor clocks; the
    current_timestamp() default is for broker-less harnesses only and
    should be paired with a nonzero key-stage watermark delay to absorb
    executor clock skew."""
    last_per_key = F.transform(
        F.array_distinct(F.transform("updates", lambda u: u["key"])),
        lambda k: F.struct(
            k.alias("key"),
            F.element_at(
                F.filter("updates", lambda u: u["key"].eqNullSafe(k)), -1
            )["value"].alias("value"),
        ),
    )
    stamp = F.col(ts_col) if ts_col is not None else F.current_timestamp()
    upd = results.select(
        stamp.alias("_stamp"),
        "transaction_id",
        "succeeded",
        F.explode(last_per_key).alias("u"),
    )
    now = F.col("_stamp")
    return upd.select(
        now.alias("ts"),
        F.unix_millis(now).alias("ts_ms"),
        F.lit(-1).alias("kafka_partition"),
        F.lit(-1).cast("long").alias("kafka_offset"),
        F.lit(KIND_TXN_RESULT).alias("kind"),
        "transaction_id",
        F.col("u.key").alias("key"),
        "succeeded",
        F.col("u.value").alias("value"),
    )


def derive_txn_bodies(txns: DataFrame) -> DataFrame:
    """Homogenized S3 input: the transaction body (kind 0). Asserts keep
    distinct (key, expected) pairs; the completion gate counts distinct
    KEYS (one ReadResult per key) while the verdict checks every pair."""
    normalize = lambda col: F.array_distinct(  # noqa: E731
        F.transform(
            col, lambda x: F.struct(x["key"].alias("key"), x["value"].alias("value"))
        )
    )
    return txns.select(
        "transaction_id",
        F.lit(0).alias("kind"),
        F.lit(None).cast("string").alias("key"),
        F.lit(None).cast("string").alias("value"),
        normalize("asserts").alias("asserts"),
        normalize("updates").alias("updates"),
    )


def read_results_as_txn_msgs(read_results: DataFrame) -> DataFrame:
    return read_results.select(
        "transaction_id",
        F.lit(1).alias("kind"),
        "key",
        "value",
        F.lit(None).cast(KV_ARRAY).alias("asserts"),
        F.lit(None).cast(KV_ARRAY).alias("updates"),
    )


def key_stage(messages: DataFrame, watermark: str = "0 seconds") -> DataFrame:
    """union'd KEY_MSG stream → watermark → S1+S2 per key → ReadResults."""
    return (
        messages.withWatermark("ts", watermark)
        .groupBy("key")
        .applyInPandasWithState(
            sorter_key_processor,
            outputStructType=READ_RESULT_OUT,
            stateStructType=KEY_STATE,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


def txn_stage(txn_msgs: DataFrame) -> DataFrame:
    """union'd TXN_MSG stream → S3 per transaction → TransactionResults.

    NoTimeout deliberately: decided transactions drop state immediately
    in ``transaction_processor`` (leak-free), and in-flight state must
    never be evicted (a parked read behind a long-held lock receives no
    S3 traffic for arbitrarily long — ADVICE r2). See the comment in
    ``transaction_processor`` for why a ProcessingTimeTimeout TTL both
    breaks availableNow drains and is unnecessary here."""
    return txn_msgs.groupBy("transaction_id").applyInPandasWithState(
        transaction_processor,
        outputStructType=TXN_RESULT_OUT,
        stateStructType=TXN_STATE,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
