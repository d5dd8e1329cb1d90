"""User-facing engine facade.

The reference's entire query surface is "submit transactions, receive
deterministic verdicts, state is a Key→Value map" (SURVEY.md §2.4). This
facade exposes exactly that, plus the strictly-stronger capability the
Spark formulation gets for free: the resulting KV state is a queryable
DataFrame (SURVEY §1.4 "KV map as a queryable table").

Batch mode is authoritative (deterministic replay of a closed log);
streaming mode (streaming/engine_stream.py + sources/kafka.py) produces
the same verdicts incrementally — §2.4's determinism property means the
two agree bit-for-bit on the same log, which is what the test suite
asserts.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamy_db_spark import schemas
from streamy_db_spark.engine_batch import replay


class StreamyDB:
    """Deterministic transactional KV store over Spark.

    >>> db = StreamyDB(spark)
    >>> results = db.execute([
    ...     {"transaction_id": "t1", "asserts": [("k", None)],
    ...      "updates": [("k", "v")]},
    ... ])
    >>> db.get("k")           # 'v'
    >>> db.state_df()         # 2-column DataFrame (key, value)
    """

    def __init__(self, spark: SparkSession, initial_state: DataFrame | None = None):
        self.spark = spark
        self._state = initial_state  # (key, value) or None
        self._results: DataFrame | None = None
        self._epoch = 0

    # -- transaction submission --------------------------------------------

    def _to_log(self, txns: list[dict[str, Any]]) -> DataFrame:
        """Accept loosely-shaped transaction dicts; assign the serial-order
        tuple for entries that don't carry one (arrival order — what
        LogAppendTime would have assigned)."""
        base = datetime(2000, 1, 1, tzinfo=timezone.utc) + timedelta(
            days=self._epoch
        )
        rows = []
        for i, t in enumerate(txns):
            kv = lambda x: (x["key"], x["value"]) if isinstance(x, dict) else tuple(x)  # noqa: E731
            rows.append(
                (
                    t.get("ts", base + timedelta(milliseconds=i)),
                    int(t.get("kafka_partition", 0)),
                    int(t.get("kafka_offset", i)),
                    t["transaction_id"],
                    [kv(a) for a in t.get("asserts", [])],
                    [kv(u) for u in t.get("updates", [])],
                )
            )
        return self.spark.createDataFrame(rows, schemas.TRANSACTION_LOG)

    def execute(self, txns: list[dict[str, Any]] | DataFrame) -> dict[str, bool]:
        """Atomically apply a batch of transactions against current state;
        returns {transaction_id: committed}. State advances to the
        post-batch snapshot (deterministic: same log ⇒ same outcome).

        DRIVER-SIZED: the returned dict collects one row per transaction
        in the batch onto the driver — it is a user-facade convenience
        for interactively-sized batches. For a 100 TB log, call
        ``replay`` directly and keep the results as a DataFrame
        (``results_df()`` here stays distributed)."""
        log = txns if isinstance(txns, DataFrame) else self._to_log(txns)
        results, state = replay(log, self._state)
        self._results = results.localCheckpoint(eager=True)
        self._state = state.localCheckpoint(eager=True)
        # The fresh eager checkpoints above truncate lineage — the
        # replay's surviving internals (per-round verdicts, final
        # working set) are dead; free them so epochs don't accumulate
        # pinned blocks (guide §5). Prior-epoch _results/_state are NOT
        # released: results_df()/state_df() hand them to callers.
        from streamy_db_spark.session import release_local_checkpoints

        release_local_checkpoints(results)
        release_local_checkpoints(state)
        self._epoch += 1
        return {
            r["transaction_id"]: r["succeeded"] for r in self._results.collect()
        }

    # -- state access (the capability the reference lacks, §2.4 note) ------

    def state_df(self) -> DataFrame:
        if self._state is None:
            return self.spark.createDataFrame([], schemas.KV_STATE)
        return self._state

    def get(self, key: str) -> str | None:
        rows = self.state_df().filter(F.col("key") == key).collect()
        return rows[0]["value"] if rows else None

    def results_df(self) -> DataFrame:
        if self._results is None:
            return self.spark.createDataFrame([], schemas.TRANSACTION_RESULT)
        return self._results
