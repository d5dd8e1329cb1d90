"""JSON wire-format round-trip (reference: upickle JSON on Kafka,
core/package.scala:22-50; D3/D10 in SURVEY.md §2.2).

The reference encodes ``List[Transaction]`` per Kafka record (empty list =
heartbeat) and one ``TransactionResult`` per output record. We reproduce
the same shape with ``from_json``/``to_json`` so a byte stream produced for
the reference parses identically here.

upickle encodes Option[T] as an array: None → [], Some(x) → [x].
We accept BOTH that shape and plain nullable JSON; emit plain nullable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from streamy_db_spark import schemas

# JSON wire schema with upickle's Option-as-array encoding.
_KVO_WIRE = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("valueOption", T.ArrayType(T.StringType())),
    ]
)
_TXN_WIRE = T.StructType(
    [
        T.StructField("transactionId", T.StringType()),
        T.StructField("asserts", T.ArrayType(_KVO_WIRE)),
        T.StructField("updates", T.ArrayType(_KVO_WIRE)),
    ]
)
TXN_LIST_WIRE = T.ArrayType(_TXN_WIRE)


def _kvo_from_wire(col: Column) -> Column:
    # upickle Option: [] → NULL, [x] → x
    return F.transform(
        col,
        lambda kvo: F.struct(
            kvo["key"].alias("key"),
            # try_: [] must yield NULL, not ANSI-mode index error
            F.try_element_at(kvo["valueOption"], F.lit(1)).alias("value"),
        ),
    )


def parse_transaction_log(raw: DataFrame, json_col: str = "value") -> DataFrame:
    """Parse Kafka-shaped records (ts, partition, offset, value:string JSON
    List[Transaction]) into TRANSACTION_LOG rows.

    Empty lists (heartbeats, reference core/HeartBeatGenerator.scala:59)
    contribute no transactions — ``explode`` of an empty array drops the row,
    matching the reference's flatMap (flink/StreamyDb.scala:187).
    """
    parsed = raw.withColumn("_txns", F.from_json(F.col(json_col), TXN_LIST_WIRE))
    exploded = parsed.select(
        F.col("ts"),
        F.col("kafka_partition"),
        F.col("kafka_offset"),
        F.explode("_txns").alias("_t"),
    )
    return exploded.select(
        "ts",
        "kafka_partition",
        "kafka_offset",
        F.col("_t.transactionId").alias("transaction_id"),
        _kvo_from_wire(F.col("_t.asserts")).alias("asserts"),
        _kvo_from_wire(F.col("_t.updates")).alias("updates"),
    )


def result_to_json(results: DataFrame) -> DataFrame:
    """Serialize TransactionResults to one JSON string per record (D10)."""
    return results.select(
        F.to_json(F.struct("transaction_id", "succeeded")).alias("value")
    )
