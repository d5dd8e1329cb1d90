"""Kafka topology for live-streaming mode (reference D1/D2/D11/D14/D15).

Mirrors the reference wiring exactly (SURVEY.md §2.2, §3.1):
- transaction inputs on ``transaction-inputs`` (4 partitions,
  LogAppendTime — core/TopicsCreator.scala:32-40): every record is a JSON
  ``List[Transaction]``; the empty list is a heartbeat
  (core/HeartBeatGenerator.scala:59).
- results on ``transaction-results``; the pipeline RE-CONSUMES its own
  output topic as the lock-release feedback path
  (flink/StreamyDb.scala:189-200) — the cycle lives in Kafka, never in
  the DAG.

No broker ships in this container, so these builders are exercised by
plan-construction only; the stateful core they feed is covered by the
file-coupled tests (tests/test_engine_stream.py) — swapping the source is
exactly the ``readStream.format(...)`` lines here.

Scale: source parallelism = topic partitions; everything downstream is
keyed state (SURVEY §3.5). ``minPartitions`` can over-split hot Kafka
partitions on wide clusters; ``maxOffsetsPerTrigger`` bounds micro-batch
size so watermark progress (and thus sorter flush latency) stays steady.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamy_db_spark import serde

INPUT_TOPIC = "transaction-inputs"  # core/package.scala (topic config)
RESULTS_TOPIC = "transaction-results"
N_PARTITIONS = 4  # core/TopicsCreator.scala:33


def _kafka_reader(spark: SparkSession, brokers: str, topic: str):
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        # exactly-once read of transactional upstream producers
        # (reference D17, beam/package.scala:45)
        .option("kafka.isolation.level", "read_committed")
    )


def read_transaction_log(spark: SparkSession, brokers: str) -> DataFrame:
    """D1+D3+D13: Kafka source → JSON parse → TRANSACTION_LOG rows.

    Kafka's ``timestamp`` column IS LogAppendTime (broker-assigned,
    monotone per partition when the topic is configured per D15); the
    serial order is ``(timestamp, partition, offset)`` — we never mutate
    timestamps, unlike the reference's strictly-monotonic rewrite
    (flink/package.scala:48-53), because the offset tiebreak gives the
    same total order without lying about event time."""
    raw = _kafka_reader(spark, brokers, INPUT_TOPIC).load().select(
        F.col("timestamp").alias("ts"),
        F.col("partition").alias("kafka_partition"),
        F.col("offset").alias("kafka_offset"),
        F.col("value").cast("string").alias("value"),
    )
    return serde.parse_transaction_log(raw)


def read_results_feedback(spark: SparkSession, brokers: str) -> DataFrame:
    """D2: re-consume our own results topic (the feedback edge)."""
    raw = _kafka_reader(spark, brokers, RESULTS_TOPIC).load()
    return raw.select(
        F.col("timestamp").alias("ts"),
        F.from_json(
            F.col("value").cast("string"),
            "transaction_id STRING, succeeded BOOLEAN,"
            " updates ARRAY<STRUCT<key: STRING, value: STRING>>",
        ).alias("r"),
    ).select("ts", "r.transaction_id", "r.succeeded", "r.updates")


def write_results(results: DataFrame, brokers: str, checkpoint: str):
    """D10+D11: serialize TransactionResults and produce to Kafka."""
    payload = results.select(
        F.to_json(F.struct("transaction_id", "succeeded", "updates")).alias("value")
    )
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", RESULTS_TOPIC)
        .option("checkpointLocation", checkpoint)
    )


def build_streaming_pipeline(
    spark: SparkSession, brokers: str, checkpoint_dir: str
) -> tuple:
    """Full §3.1 topology: returns (read_results_df, results_df,
    feedback_writer) — three pieces the caller starts as queries.

    The caller runs: key-stage → results-topic sink, plus the stateless
    feedback derivation back onto the key stage's input union — exactly
    the reference graph with Kafka as every edge."""
    from streamy_db_spark.streaming import engine_stream as es

    txns = read_transaction_log(spark, brokers)
    requests = es.derive_key_messages(txns)
    # Feedback stamped from the results topic's LogAppendTime (ts) — one
    # broker clock, not N executor clocks — and a small watermark delay
    # absorbs broker/driver skew so feedback can't land below a key's
    # applied frontier (engine_stream._KeyMachine._admit would raise).
    feedback = es.derive_feedback(
        read_results_feedback(spark, brokers).select(
            "ts", "transaction_id", "succeeded", "updates"
        ),
        ts_col="ts",
    )
    read_results = es.key_stage(
        requests.unionByName(feedback), watermark="5 seconds"
    )
    bodies = es.derive_txn_bodies(txns)
    results = es.txn_stage(
        bodies.unionByName(es.read_results_as_txn_msgs(read_results))
    )
    writer = write_results(results, brokers, f"{checkpoint_dir}/results-sink")
    return read_results, results, writer


# --- auxiliary mains (reference TopicsCreator / HeartBeatGenerator) ---------


def create_topics(brokers: str) -> None:
    """D15 (core/TopicsCreator.scala:28-43): input topic with 4 partitions
    and LogAppendTime — the broker-side monotone-timestamp guarantee the
    serial order builds on (KIP-32 note at core/TopicsCreator.scala:35-36)."""
    try:
        from kafka.admin import KafkaAdminClient, NewTopic
    except ImportError as e:  # kafka-python not in this container
        raise NotImplementedError("create_topics requires kafka-python") from e
    admin = KafkaAdminClient(bootstrap_servers=brokers)
    admin.create_topics(
        [
            NewTopic(
                INPUT_TOPIC,
                num_partitions=N_PARTITIONS,
                replication_factor=1,
                topic_configs={"message.timestamp.type": "LogAppendTime"},
            ),
            NewTopic(RESULTS_TOPIC, num_partitions=N_PARTITIONS, replication_factor=1),
        ]
    )


def heartbeat_loop(brokers: str, period_s: float = 5.0) -> None:
    """D14 (core/HeartBeatGenerator.scala:40-65): push an empty
    ``List[Transaction]`` (``[]``) to EVERY input partition each period so
    per-partition LogAppendTime — and therefore the watermark — advances
    on idle partitions and sorter timers keep firing."""
    try:
        from kafka import KafkaProducer
    except ImportError as e:
        raise NotImplementedError("heartbeat_loop requires kafka-python") from e
    import time

    producer = KafkaProducer(bootstrap_servers=brokers)
    while True:
        for p in range(N_PARTITIONS):
            producer.send(INPUT_TOPIC, value=b"[]", partition=p)
        producer.flush()
        time.sleep(period_s)
