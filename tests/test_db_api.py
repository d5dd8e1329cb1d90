"""Facade semantics: multi-batch sessions must compose — state from batch
N is the initial state of batch N+1, and verdicts match a continuous
serial replay of the concatenated log."""

from __future__ import annotations

from streamy_db_spark import oracle
from streamy_db_spark.db import StreamyDB


def test_multi_batch_session(spark):
    db = StreamyDB(spark)
    r1 = db.execute(
        [
            {"transaction_id": "a", "asserts": [("x", None)], "updates": [("x", "1")]},
            {"transaction_id": "b", "asserts": [("x", None)], "updates": [("x", "2")]},
        ]
    )
    assert r1 == {"a": True, "b": False}
    assert db.get("x") == "1"

    r2 = db.execute(
        [
            {"transaction_id": "c", "asserts": [("x", "1")], "updates": [("x", None), ("y", "7")]},
            {"transaction_id": "d", "asserts": [("x", None), ("y", "7")], "updates": []},
        ]
    )
    assert r2 == {"c": True, "d": True}
    assert db.get("x") is None
    assert db.get("y") == "7"
    assert {tuple(r) for r in db.state_df().collect()} == {("y", "7")}


def test_matches_continuous_serial_replay(spark):
    txns1 = [
        {"transaction_id": f"t{i}", "asserts": [(f"k{i % 3}", None)],
         "updates": [(f"k{i % 3}", str(i))]}
        for i in range(6)
    ]
    txns2 = [
        {"transaction_id": f"u{i}", "asserts": [(f"k{i % 3}", str(i))],
         "updates": [(f"k{i % 3}", f"v{i}")]}
        for i in range(3)
    ]
    db = StreamyDB(spark)
    got = {**db.execute(txns1), **db.execute(txns2)}

    serial_input = [
        {"ts": i, "kafka_partition": 0, "kafka_offset": i,
         "transaction_id": t["transaction_id"], "asserts": t["asserts"],
         "updates": t["updates"]}
        for i, t in enumerate(txns1 + txns2)
    ]
    expected, state = oracle.serial_replay(serial_input)
    assert got == expected
    assert {r["key"]: r["value"] for r in db.state_df().collect()} == state
