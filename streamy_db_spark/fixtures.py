"""Seeded transaction-workload generator (FIXTURES.md §B).

Modeled on the reference generator (core/TransactionGenerator.scala:43-58:
N txns × K uniform keys from a keyspace formatted key_%010d, expect-absent
asserts, "<key>_value" updates) and extended with the conflict / CAS /
delete / read-only mixes the reference workload never exercises.

Deterministic: same (mix, seed) ⇒ same rows, independent of Spark
partitioning. ts is monotone non-decreasing with deliberate ties
(disambiguated by partition+offset, mirroring Kafka LogAppendTime D13).
"""

from __future__ import annotations

import random
import uuid
from datetime import datetime, timedelta, timezone
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from streamy_db_spark import schemas

N_PARTITIONS = 4  # reference topic parallelism, core/TopicsCreator.scala:33

# Sizing note: the batch fixpoint resolves one dependency-wave per round
# (SURVEY.md §7 M3), and per-key write chains bound the wave count at
# roughly txns × keys_per_txn / keyspace. Mixes keep that ratio ≤ ~6 so
# the suite runs in minutes while still exercising dense conflicts;
# scale_bench (bench.py) keeps conflicts sparse the way a realistic
# large-scale workload would.
MIXES = {
    #               txns, keys/txn, keyspace
    "ref_smoke":    (10,    4, 1_000_000),
    "conflict_heavy": (300, 4, 300),
    "cas_chain":    (200,   2, 100),
    "deletes":      (150,   3, 150),
    "read_only":    (200,   4, 100),
    "scale_bench":  (10_000, 4, 10_000),
}


def _key(rng: random.Random, keyspace: int) -> str:
    return f"key_{rng.randrange(keyspace):010d}"


def generate(mix: str, seed: int = 42) -> list[dict[str, Any]]:
    n_txns, keys_per_txn, keyspace = MIXES[mix]
    rng = random.Random(seed)
    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    offsets = [0] * N_PARTITIONS
    out: list[dict[str, Any]] = []

    for i in range(n_txns):
        # ts ties: ~3 txns share a timestamp (tests the tuple tiebreak)
        ts = base + timedelta(seconds=i // 3)
        part = rng.randrange(N_PARTITIONS)
        off = offsets[part]
        offsets[part] += 1
        txn_id = str(uuid.UUID(int=rng.getrandbits(128), version=4))

        keys = rng.sample(
            [f"key_{k:010d}" for k in rng.sample(range(keyspace), min(keys_per_txn, keyspace))],
            min(keys_per_txn, keyspace),
        )

        if mix == "ref_smoke":
            asserts = [(k, None) for k in keys]
            updates = [(k, f"{k}_value") for k in keys]
        elif mix == "conflict_heavy":
            # expect-absent asserts + writes on a hot keyspace: dense
            # conflicts, long release chains
            asserts = [(k, None) for k in keys[:2]] + [
                (k, f"{k}_v{rng.randrange(3)}") for k in keys[2:]
            ]
            updates = [(k, f"{k}_v{rng.randrange(3)}") for k in keys]
        elif mix == "cas_chain":
            # read-modify-write: assert a guessed current version, bump it
            asserts = [(k, None if rng.random() < 0.3 else f"{k}_v{rng.randrange(5)}")
                       for k in keys]
            updates = [(k, f"{k}_v{rng.randrange(5)}") for k in keys]
        elif mix == "deletes":
            asserts = [(k, None) for k in keys if rng.random() < 0.4]
            updates = [(k, None if rng.random() < 0.3 else f"{k}_value") for k in keys]
        elif mix == "read_only":
            asserts = [(k, None if rng.random() < 0.5 else f"{k}_value") for k in keys]
            updates = []
        else:  # scale_bench
            asserts = [(k, None) for k in keys[:1]]
            updates = [(k, f"{k}_v{i}") for k in keys]

        out.append(
            {
                "ts": ts,
                "kafka_partition": part,
                "kafka_offset": off,
                "transaction_id": txn_id,
                "asserts": asserts,
                "updates": updates,
            }
        )
    return out


def to_dataframe(spark: SparkSession, txns: list[dict[str, Any]]) -> DataFrame:
    rows = [
        (
            t["ts"],
            t["kafka_partition"],
            t["kafka_offset"],
            t["transaction_id"],
            [(k, v) for k, v in t["asserts"]],
            [(k, v) for k, v in t["updates"]],
        )
        for t in txns
    ]
    return spark.createDataFrame(rows, schemas.TRANSACTION_LOG)


def generate_df(spark: SparkSession, mix: str, seed: int = 42) -> DataFrame:
    return to_dataframe(spark, generate(mix, seed))
