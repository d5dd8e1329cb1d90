"""Spark StructTypes for the transaction data model.

Mirrors the reference message ADTs (core/package.scala:26-58 in the
reference repo) per the SURVEY.md §1.4 mapping:

- ``Option[Value]``              → nullable StringType
- ``Option[Option[Value]]``      → explicit (succeeded boolean, value nullable
                                   string) pair — Spark has no nested nullability
- ``List[KeyValueOption]``       → ArrayType(StructType(key, value))
- sealed-trait message unions    → one wide schema with a ``kind`` discriminator
                                   column and null-padded fields (Spark lacks
                                   sum types; SURVEY.md §2.2 D8/D9)
"""

from __future__ import annotations

from pyspark.sql import types as T

# KeyValueOption (reference core/package.scala:30): value NULL means
# "expect absent" in asserts / "delete" in updates.
KEY_VALUE_OPTION = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
    ]
)

# Transaction (reference core/package.scala:41).
TRANSACTION = T.StructType(
    [
        T.StructField("transaction_id", T.StringType(), False),
        T.StructField("asserts", T.ArrayType(KEY_VALUE_OPTION), False),
        T.StructField("updates", T.ArrayType(KEY_VALUE_OPTION), False),
    ]
)

# Input-log row: Transaction + total-order key. The reference gets its order
# from Kafka LogAppendTime made strictly monotonic per partition
# (flink/package.scala:48-53); we carry (ts, kafka_partition, kafka_offset)
# explicitly instead of mutating timestamps (SURVEY.md §4.3).
TRANSACTION_LOG = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("kafka_partition", T.IntegerType(), False),
        T.StructField("kafka_offset", T.LongType(), False),
        T.StructField("transaction_id", T.StringType(), False),
        T.StructField("asserts", T.ArrayType(KEY_VALUE_OPTION), False),
        T.StructField("updates", T.ArrayType(KEY_VALUE_OPTION), False),
    ]
)

# TransactionResult (reference core/package.scala:48) — flattened: we emit
# (transaction_id, succeeded) rather than embedding the whole transaction.
TRANSACTION_RESULT = T.StructType(
    [
        T.StructField("transaction_id", T.StringType(), False),
        T.StructField("succeeded", T.BooleanType(), False),
    ]
)

# Final KV state — the queryable materialization of the store
# (SURVEY.md §1.4: "KV map as a queryable table").
KV_STATE = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("value", T.StringType(), False),
    ]
)

# ReadResult (reference core/package.scala:46).
READ_RESULT = T.StructType(
    [
        T.StructField("transaction_id", T.StringType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
    ]
)

# Unified KeyProcessorMessage (reference core/package.scala:53-58) for the
# merged per-key stream: kind 0=ReadRequest, 1=LockRequest,
# 2=KeyTransactionResult — the D7 tiebreak priority (flink/StreamyDb.scala:211-215).
KIND_READ_REQUEST = 0
KIND_LOCK_REQUEST = 1
KIND_KEY_TXN_RESULT = 2

KEY_PROCESSOR_MESSAGE = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("kafka_partition", T.IntegerType(), False),
        T.StructField("kafka_offset", T.LongType(), False),
        T.StructField("kind", T.IntegerType(), False),
        T.StructField("transaction_id", T.StringType(), False),
        T.StructField("key", T.StringType(), False),
        # KeyTransactionResult payload: succeeded=NULL for requests;
        # (succeeded, value) encodes Option[Option[Value]] per §1.4.
        T.StructField("succeeded", T.BooleanType(), True),
        T.StructField("value", T.StringType(), True),
    ]
)
