"""Property-based protocol validation (hypothesis, pure Python — no
Spark): the per-key lock-log machine (_KeyMachine, exactly the state
machine the streaming engine executes) driven through the full request →
read-result → verdict → feedback cycle must agree with the serial-replay
oracle on ANY workload and ANY feedback arrival order — randomized keys,
values, deletes, absent asserts, timestamp ties, read-only/empty
transactions, and adversarially shuffled commit-notification delivery
(Kafka gives no cross-topic ordering; determinism must not depend on it).

This is the test that caught the reference's own race (SURVEY §2.5
addendum): park-on-latest + apply-feedback-on-arrival lets a later
writer's commit leak into an earlier reader. The lock-log machine is
immune by construction; this suite keeps it that way.
"""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from streamy_db_spark.oracle import serial_replay
from streamy_db_spark.streaming.engine_stream import _KeyMachine

KEYS = ["a", "b", "c"]
VALUES = ["1", "2", None]


@st.composite
def workloads(draw):
    n = draw(st.integers(1, 12))
    txns = []
    for i in range(n):
        asserts = draw(
            st.lists(
                st.tuples(st.sampled_from(KEYS), st.sampled_from(VALUES)),
                max_size=3,
                unique_by=lambda kv: kv[0],  # engine dedups per key anyway
            )
        )
        updates = draw(
            st.lists(
                st.tuples(st.sampled_from(KEYS), st.sampled_from(VALUES)),
                max_size=3,
                unique_by=lambda kv: kv[0],
            )
        )
        ts = draw(st.integers(0, n // 2))  # deliberate ties
        txns.append(
            {
                "ts": ts,
                "kafka_partition": 0,
                "kafka_offset": i,
                "transaction_id": f"t{i}",
                "asserts": asserts,
                "updates": updates,
            }
        )
    return txns


def protocol_simulate(txns, feedback_rng: random.Random, roundtrip: bool = False):
    """Drive _KeyMachine instances through the reference message flow.
    Requests arrive in serial order (the sorter guarantees that); commit
    feedback is delivered in RANDOM order (Kafka guarantees nothing),
    including overtaking still-buffered later requests.

    ``roundtrip=True`` serializes every machine through
    ``to_tuple()`` → ``_KeyMachine(state_tuple)`` on EVERY access — the
    real engine reconstructs from the state store at each micro-batch, so
    any field the tuple round-trip loses or reorders must flip a verdict
    here before it can flip one in production."""
    machines: dict[str, _KeyMachine] = {}

    def machine(k):
        m = machines.get(k)
        if m is None:
            m = _KeyMachine(k, None)
        elif roundtrip:
            m = _KeyMachine(k, m.to_tuple())
        machines[k] = m
        return m

    bodies = {t["transaction_id"]: t for t in txns}
    reads: dict[str, dict[str, str | None]] = {t["transaction_id"]: {} for t in txns}
    verdicts: dict[str, bool] = {}
    pending_feedback: list[tuple] = []  # (txn, key, ok, wvalue)
    read_results: list[tuple] = []

    def coordinator(results):
        """S3: accumulate reads; once complete, verdict + feedback fanout."""
        for txn_id, key, value in results:
            reads[txn_id][key] = value
            t = bodies[txn_id]
            assert_keys = {k for k, _ in t["asserts"]}
            if txn_id in verdicts or len(
                reads[txn_id].keys() & assert_keys
            ) < len(assert_keys):
                continue
            ok = all(reads[txn_id][k] == exp for k, exp in t["asserts"])
            verdicts[txn_id] = ok
            for k, v in t["updates"]:
                pending_feedback.append((txn_id, k, ok, v))

    def drain_some(p_deliver=0.7):
        """Deliver a random subset of pending feedback, in random order."""
        feedback_rng.shuffle(pending_feedback)
        keep = []
        while pending_feedback:
            fb = pending_feedback.pop()
            if feedback_rng.random() < p_deliver:
                out: list = []
                machine(fb[1]).on_txn_result(fb[0], fb[2], fb[3], out)
                coordinator(out)
            else:
                keep.append(fb)
        pending_feedback.extend(keep)

    # Assert-free transactions commit the moment S3 sees their BODY —
    # which travels on the txn stream, not through the key stage — so
    # their feedback can overtake their own lock requests (the `early`
    # path). Seed those verdicts before any request is delivered.
    for t in txns:
        if not t["asserts"]:
            verdicts[t["transaction_id"]] = True
            for k, v in t["updates"]:
                pending_feedback.append((t["transaction_id"], k, True, v))

    ordered = sorted(
        txns, key=lambda t: (t["ts"], t["kafka_partition"], t["kafka_offset"])
    )
    for t in ordered:
        drain_some()  # feedback may arrive BEFORE this txn's requests
        # D7's full 5-tuple serial key (ts, partition, offset, txn, kind)
        # — what flush() hands the machine; the state tuple round-trip
        # relies on exactly this shape.
        pos = (t["ts"], t["kafka_partition"], t["kafka_offset"], t["transaction_id"])
        out: list = []
        for k, _ in t["asserts"]:
            machine(k).on_read(t["transaction_id"], (*pos, 0), out)
        for k, _ in t["updates"]:
            machine(k).on_lock(t["transaction_id"], (*pos, 1))
            m_out: list = []
            machine(k)._settle(m_out)
            out.extend(m_out)
        coordinator(out)
        drain_some()  # ... or between later requests

    while pending_feedback:
        drain_some(p_deliver=1.0)
    return verdicts


@settings(max_examples=300, deadline=None)
@given(workloads(), st.integers(0, 2**32 - 1))
def test_protocol_matches_serial_oracle(txns, seed):
    expected, _state = serial_replay(txns)
    got = protocol_simulate(txns, random.Random(seed))
    assert got == expected


@settings(max_examples=150, deadline=None)
@given(workloads(), st.integers(0, 2**32 - 1))
def test_protocol_survives_state_roundtrip(txns, seed):
    """Micro-batch boundary simulation: machines rebuilt from their
    serialized state tuple before every event."""
    expected, _state = serial_replay(txns)
    got = protocol_simulate(txns, random.Random(seed), roundtrip=True)
    assert got == expected
