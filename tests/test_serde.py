"""Wire-format parity: a byte stream produced for the reference (upickle
JSON, Option encoded as []/[x], empty list = heartbeat) must parse into
our TRANSACTION_LOG shape and round-trip out as result JSON."""

from __future__ import annotations

import json
from datetime import datetime, timezone

from streamy_db_spark import serde


def _raw(spark, payloads):
    rows = [
        (datetime(2024, 1, 1, tzinfo=timezone.utc), 0, i, json.dumps(p))
        for i, p in enumerate(payloads)
    ]
    return spark.createDataFrame(
        rows, "ts TIMESTAMP, kafka_partition INT, kafka_offset LONG, value STRING"
    )


def test_parse_upickle_option_encoding(spark):
    payloads = [
        [
            {
                "transactionId": "t1",
                "asserts": [{"key": "a", "valueOption": []}],  # None = absent
                "updates": [
                    {"key": "a", "valueOption": ["v1"]},
                    {"key": "b", "valueOption": []},  # None = delete
                ],
            }
        ],
        [],  # heartbeat — must vanish (flatMap of empty list)
        [
            {"transactionId": "t2", "asserts": [], "updates": []},
            {"transactionId": "t3", "asserts": [], "updates": []},
        ],  # two txns in one record
    ]
    out = serde.parse_transaction_log(_raw(spark, payloads)).collect()
    by_id = {r["transaction_id"]: r for r in out}
    assert set(by_id) == {"t1", "t2", "t3"}
    t1 = by_id["t1"]
    assert [(a["key"], a["value"]) for a in t1["asserts"]] == [("a", None)]
    assert [(u["key"], u["value"]) for u in t1["updates"]] == [
        ("a", "v1"),
        ("b", None),
    ]
    # both txns of the shared record keep the record's order tuple
    assert by_id["t2"]["kafka_offset"] == by_id["t3"]["kafka_offset"] == 2


def test_result_json_round_trip(spark):
    results = spark.createDataFrame(
        [("t1", True), ("t2", False)], "transaction_id STRING, succeeded BOOLEAN"
    )
    got = sorted(
        (json.loads(r["value"]) for r in serde.result_to_json(results).collect()),
        key=lambda d: d["transaction_id"],
    )
    assert got == [
        {"transaction_id": "t1", "succeeded": True},
        {"transaction_id": "t2", "succeeded": False},
    ]
