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
  replay in the serial order ``(ts, kafka_partition, kafka_offset, kind,
  transaction_id)`` (D7's tiebreak, flink:211-215) through the
  lock/waiter state machine (flink:85-127). Commit notifications (kind 2
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
# S1+S2 per-key state: every reference state handle (SURVEY.md §1.3)
# packed into one GroupState tuple.
#   buffer      : S1 reorder buffer  — MapState[ts → elems] in the
#                 reference (flink:41); cleaned on fire (the Flink variant
#                 leaks it, flink:56-63 — we follow Beam:66).
#   cell/has_cell: the database cell  — ValueState[Value] (flink:75).
#   latest_lock : lock-queue tail     — ValueState[TransactionId] (flink:77).
#   waiters     : per-holder blocked readers — MapState (flink:76).
# ---------------------------------------------------------------------------

KEY_STATE = T.StructType(
    [
        T.StructField(
            "buffer",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("ts_ms", T.LongType()),
                        T.StructField("kafka_partition", T.IntegerType()),
                        T.StructField("kafka_offset", T.LongType()),
                        T.StructField("kind", T.IntegerType()),
                        T.StructField("transaction_id", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("cell", T.StringType(), True),
        T.StructField("has_cell", T.BooleanType()),
        T.StructField("latest_lock", T.StringType(), True),
        T.StructField(
            "waiters",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("txn", T.StringType()),
                        T.StructField("readers", T.ArrayType(T.StringType())),
                    ]
                )
            ),
        ),
    ]
)


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
    """The S2 state machine (flink:85-127), message-at-a-time."""

    def __init__(self, key: str, state_tuple):
        self.key = key
        if state_tuple is None:
            self.buffer: list = []
            self.cell = None
            self.has_cell = False
            self.latest_lock = None
            self.waiters: dict[str, list] = {}
        else:
            buf, cell, has_cell, lock, waiters = state_tuple
            self.buffer = [tuple(b) for b in (buf or [])]
            self.cell = _norm_str(cell)
            self.has_cell = bool(has_cell)
            self.latest_lock = _norm_str(lock)
            self.waiters = {w[0]: list(w[1]) for w in (waiters or [])}

    def to_tuple(self):
        return (
            self.buffer,
            self.cell,
            self.has_cell,
            self.latest_lock,
            [(t, r) for t, r in self.waiters.items()],
        )

    def current(self):
        return self.cell if self.has_cell else None

    def on_lock(self, txn: str) -> None:
        # flink:87-89 — the new lock becomes the queue tail; never blocks.
        self.latest_lock = txn
        self.waiters[txn] = []

    def on_read(self, txn: str, out: list) -> None:
        if self.latest_lock is None:
            out.append((txn, self.key, self.current()))  # flink:92-96
        else:
            self.waiters[self.latest_lock].append(txn)  # flink:98-100

    def on_txn_result(self, txn: str, succeeded: bool, value, out: list) -> None:
        my_waiters = self.waiters.pop(txn, [])  # flink:105-106
        if succeeded:
            if value is None:
                self.cell, self.has_cell = None, False  # delete, flink:113-115
            else:
                self.cell, self.has_cell = value, True
        cur = self.current()
        for w in my_waiters:
            out.append((w, self.key, cur))  # flink:120-121
        if self.latest_lock == txn:
            self.latest_lock = None  # flink:124-126

    def flush(self, up_to_ms: int, out: list) -> None:
        """S1 fire: replay buffered requests with ts ≤ watermark in serial
        order (ts, partition, offset, kind, txn) — D7's exact tuple."""
        due = sorted(b for b in self.buffer if b[0] <= up_to_ms)
        if not due:
            return
        self.buffer = [b for b in self.buffer if b[0] > up_to_ms]
        for _ts, _p, _o, kind, txn in due:
            if kind == KIND_READ:
                self.on_read(txn, out)
            else:
                self.on_lock(txn)


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

    if m.buffer or m.has_cell or m.latest_lock is not None or m.waiters:
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


def derive_feedback(results: DataFrame) -> DataFrame:
    """D5 (flink:192-200): one KeyTransactionResult per updated key
    (last-wins on duplicates — list application order), re-stamped with a
    fresh event time (LogAppendTime in the reference)."""
    last_per_key = F.transform(
        F.array_distinct(F.transform("updates", lambda u: u["key"])),
        lambda k: F.struct(
            k.alias("key"),
            F.element_at(
                F.filter("updates", lambda u: u["key"].eqNullSafe(k)), -1
            )["value"].alias("value"),
        ),
    )
    upd = results.select(
        "transaction_id", "succeeded", F.explode(last_per_key).alias("u")
    )
    now = F.current_timestamp()
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
    """union'd TXN_MSG stream → S3 per transaction → TransactionResults."""
    return txn_msgs.groupBy("transaction_id").applyInPandasWithState(
        transaction_processor,
        outputStructType=TXN_RESULT_OUT,
        stateStructType=TXN_STATE,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
