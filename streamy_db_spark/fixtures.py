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
    # Same sparse-conflict density (txns × keys/txn ÷ keyspace = 4) at
    # 10× rows — proves replay throughput grows with batch size
    # (BASELINE.md's claim; bench.py protocol_replay_100k).
    "scale_bench_100k": (100_000, 4, 100_000),
    # One more decade (bench.py protocol_replay_1m) — generated
    # DISTRIBUTEDLY (see generate_df_distributed): 1M rows of nested
    # Python objects through Py4J would dominate the bench.
    "scale_bench_1m": (1_000_000, 4, 1_000_000),
    # The single-JVM ceiling probe (BASELINE §6/§8/§9) — NOT part of the
    # per-round bench (needs ~64 GiB driver heap + GC-tolerant liveness
    # confs, engine_batch.replay's sizing note); pinned here so the
    # one-off runs are reproducible instead of living in shell history.
    "scale_bench_10m": (10_000_000, 4, 10_000_000),
    # Wave-depth stress: ~16 writes per key ⇒ long per-key release
    # chains ⇒ many dependency waves. Not part of the per-round bench;
    # a one-off measurement recorded in BASELINE.md §4 (the wavefront's
    # worst case is conflict DENSITY, not row count).
    "conflict_bench_100k": (100_000, 4, 25_000),
}

# Mixes too large to build on the driver take the Spark-side generator.
_DISTRIBUTED_THRESHOLD = 500_000


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
    n_txns, keys_per_txn, keyspace = MIXES[mix]
    if n_txns >= _DISTRIBUTED_THRESHOLD:
        return generate_df_distributed(
            spark, n_txns, keys_per_txn, keyspace, seed
        )
    return to_dataframe(spark, generate(mix, seed))


def generate_df_distributed(
    spark: SparkSession,
    n_txns: int,
    keys_per_txn: int = 4,
    keyspace: int | None = None,
    seed: int = 42,
    n_partitions: int = 32,
) -> DataFrame:
    """Spark-side ``scale_bench``-shaped workload for replay benches too
    big to build on the driver (1M txns of nested structs through Py4J
    would take longer than the replay itself — and a 100 TB harness
    must generate where it computes anyway).

    Same statistical shape as the driver-side scale_bench mixes: sparse
    conflicts (txns × keys/txn ÷ keyspace = keys_per_txn when keyspace
    == n_txns), monotone ts with ~3-way ties, 4 kafka partitions with
    dense per-partition offsets, one expect-absent assert on the first
    key, versioned updates on every key. Key draws come from xxhash64
    rather than random.Random, so rows are NOT identical to
    ``generate()`` — replay correctness never depends on the draw
    source (the serial-oracle equivalence tests run on the driver-side
    mixes). Within-txn hash collisions are deduped via array_distinct
    (expected ~k²·n/2/keyspace ≈ 8 rows at 1M), keeping per-key lock
    semantics clean; those rows simply carry fewer keys, as the
    ``deletes`` mix already does."""
    keyspace = keyspace or n_txns
    from pyspark.sql import functions as F  # noqa: PLC0415

    base_epoch = int(datetime(2024, 1, 1, tzinfo=timezone.utc).timestamp())
    keys = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.lit(keys_per_txn - 1)),
            lambda j: F.format_string(
                "key_%010d",
                F.pmod(F.xxhash64(F.col("id"), F.lit(seed), j), F.lit(keyspace)),
            ),
        )
    )
    uid = F.md5(F.concat(F.col("id").cast("string"), F.lit(f"#{seed}")))
    df = (
        spark.range(n_txns, numPartitions=n_partitions)
        .withColumn("keys", keys)
        .select(
            F.timestamp_seconds(
                F.lit(base_epoch) + (F.col("id") / 3).cast("long")
            ).alias("ts"),
            F.pmod(F.col("id"), F.lit(N_PARTITIONS)).cast("int").alias(
                "kafka_partition"
            ),
            (F.col("id") / N_PARTITIONS).cast("long").alias("kafka_offset"),
            F.concat_ws(
                "-",
                F.substring(uid, 1, 8),
                F.substring(uid, 9, 4),
                F.substring(uid, 13, 4),
                F.substring(uid, 17, 4),
                F.substring(uid, 21, 12),
            ).alias("transaction_id"),
            F.array(
                F.struct(
                    F.element_at("keys", 1).alias("key"),
                    F.lit(None).cast("string").alias("value"),
                )
            ).alias("asserts"),
            F.transform(
                "keys",
                lambda k: F.struct(
                    k.alias("key"),
                    F.concat(k, F.lit("_v"), F.col("id").cast("string")).alias(
                        "value"
                    ),
                ),
            ).alias("updates"),
        )
    )
    return df


def planted_embeddings(
    n_base: int = 60, n_dups: int = 15, dim: int = 32, seed: int = 20260813
) -> list[tuple[int, list[float]]]:
    """Deterministic embedding table that actually CONTAINS near-dups:
    ``n_base`` unit-scale gaussians (mutual cosine ≈ 0 at this dim) plus
    ``n_dups`` small perturbations of the first ``n_dups`` bases (cosine
    ≥ ~0.99). The harness embeddings are pure gaussians whose max
    pairwise cosine ≈ 0.5, so the production 0.9 near-dup cut is only
    testable on planted data like this (r4 verdict item 6). Dup of base
    j gets vec_id 10_000 + j."""
    rng = random.Random(seed)
    rows: list[tuple[int, list[float]]] = []
    base: list[list[float]] = []
    for i in range(n_base):
        v = [rng.gauss(0, 1) for _ in range(dim)]
        base.append(v)
        rows.append((i, [float(x) for x in v]))
    for j in range(n_dups):
        rows.append(
            (10_000 + j, [float(x + rng.gauss(0, 0.03)) for x in base[j]])
        )
    return rows
