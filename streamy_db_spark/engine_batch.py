"""Deterministic batch replay of the transaction protocol.

Re-expresses the reference's three stateful operators (SURVEY.md §2.1:
S1 KeyedEventTimeSorter flink/StreamyDb.scala:35-64, S2
KeyTransactionProcessor flink:66-129, S3 TransactionProcessor
flink:131-175) as a relational fixpoint over DataFrames — the Spark-first
formulation, not a port of the message-at-a-time state machines.

Semantics (Calvin): transactions execute as if serially in
``(ts, kafka_partition, kafka_offset)`` order. A transaction commits iff
every assert (key, expected) matches the state produced by all earlier
*committed* transactions; committed updates then apply atomically
(value NULL = delete, flink:113-115).

Why a fixpoint: a read's observed value depends on earlier writers'
commit outcomes, which depend on *their* reads on other keys — the
dependency DAG resolves in waves. Each round decides every transaction
whose assert-reads are unblocked (no undecided earlier writer on any of
its keys). Progress is guaranteed: the globally-earliest undecided
transaction depends only on decided ones, so ≥1 transaction resolves per
round; rounds ≤ longest write-dependency chain.

The loop maintains a single shrinking working set ``ops_active``:
- undecided transactions' reads and writes (``succeeded`` NULL),
- committed writes (``succeeded`` TRUE — they supply observed values).
Decided reads and aborted writes leave the set, so late rounds touch
only the conflict tail, not the whole log.

Scale notes (100 TB):
- No global sort, no driver-side data: order is evaluated inside
  per-key windows over the (ts, partition, offset) tuple; the only
  shuffles hash-partition by ``key`` (the reference's keyBy boundaries,
  flink:209,222) and by ``transaction_id`` (flink:230).
- Per-round deltas (newly-decided outcomes) are broadcast-joined — tiny
  relative to the log.
- ``localCheckpoint`` truncates lineage each round (use a reliable
  checkpoint dir on a real cluster).
- Hot keys serialize their own window evaluation — that is the
  protocol's inherent per-key serial order; parallelism comes from key
  count, exactly as in Calvin.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from streamy_db_spark import schemas
from streamy_db_spark.session import (
    checkpoint_preserving,
    release_local_checkpoints,
)

INIT_TXN_ID = "__initial_state__"

KIND_READ = 0  # derived from asserts  (ReadRequest,  flink/StreamyDb.scala:205)
KIND_WRITE = 1  # derived from updates (LockRequest → write, flink:206,111-118)

# Serial order. (ts, partition, offset) orders Kafka records; the
# transaction_id tiebreak handles List[Transaction] records that explode
# into several transactions sharing one record tuple (wire-legal,
# core/package.scala:22-50) — the reference sorter breaks exactly this
# tie by transactionId (flink/StreamyDb.scala:44-49), i.e. tied
# transactions execute as whole units in transaction-id order. ``kind``
# sorts LAST so each transaction's reads observe the pre-transaction
# state, never its own (or a tied later txn's) writes.
_ORDER = ["ts", "kafka_partition", "kafka_offset", "transaction_id", "kind"]


def _build_ops(transactions: DataFrame, initial_state: DataFrame | None) -> DataFrame:
    """Flatten the transaction log into the per-key message stream
    (reference D4, flink/StreamyDb.scala:203-208): one READ row per
    assert, one WRITE row per update.

    Defensive dedup (SURVEY.md §2.5): duplicate keys inside one list are
    untested reference behavior — we keep the LAST update per (txn, key)
    (list application order ⇒ last wins) and DISTINCT asserts. Both
    dedups happen INSIDE the arrays before exploding (array_distinct;
    keep-an-update-iff-no-later-same-key filter), so the whole flatten is
    one narrow stage — the earlier formulation paid a global DISTINCT
    shuffle plus a per-(txn,key) window shuffle for lists that are a few
    elements long. At 100 TB that's two full-log exchanges avoided.
    """
    base = transactions.select(
        "ts", "kafka_partition", "kafka_offset", "transaction_id", "asserts", "updates"
    )

    reads = base.select(
        "ts",
        "kafka_partition",
        "kafka_offset",
        "transaction_id",
        F.explode(F.array_distinct("asserts")).alias("a"),
    ).select(
        "ts",
        "kafka_partition",
        "kafka_offset",
        F.lit(KIND_READ).alias("kind"),
        "transaction_id",
        F.col("a.key").alias("key"),
        F.col("a.value").alias("expected"),
        F.lit(None).cast("string").alias("wvalue"),
    )

    # Last-wins per key, in-array: element i survives iff no element
    # after it carries the same key (O(len²) over a short list beats a
    # cluster-wide window shuffle by construction).
    upd_arr = F.col("updates")
    upd_last = F.filter(
        upd_arr,
        lambda u, i: ~F.exists(
            F.slice(upd_arr, i + F.lit(2), F.size(upd_arr)),
            lambda v: v["key"] == u["key"],
        ),
    )
    writes = base.select(
        "ts",
        "kafka_partition",
        "kafka_offset",
        "transaction_id",
        F.explode(upd_last).alias("u"),
    ).select(
        "ts",
        "kafka_partition",
        "kafka_offset",
        F.lit(KIND_WRITE).alias("kind"),
        "transaction_id",
        F.col("u.key").alias("key"),
        F.lit(None).cast("string").alias("expected"),
        F.col("u.value").alias("wvalue"),
    )

    ops = reads.unionByName(writes)

    if initial_state is not None:
        init = initial_state.select(
            F.lit("1970-01-01 00:00:00").cast("timestamp").alias("ts"),
            F.lit(-1).alias("kafka_partition"),
            F.lit(-1).cast("long").alias("kafka_offset"),
            F.lit(KIND_WRITE).alias("kind"),
            F.lit(INIT_TXN_ID).alias("transaction_id"),
            F.col("key"),
            F.lit(None).cast("string").alias("expected"),
            F.col("value").alias("wvalue"),
        )
        ops = ops.unionByName(init)
    return ops


def _serial_tail_fold(
    rows: list,
    n_asserts: dict[str, int],
) -> dict[str, bool]:
    """Driver-side serial replay of the conflict tail: walk the collected
    op rows in serial order ((ts, partition, offset, transaction_id,
    kind, key) — D7's tuple with the reference sorter's transactionId
    tiebreak), apply committed writes unconditionally, and decide each
    undecided transaction at its first write row (all its reads sort
    earlier: a transaction's rows share one position and READ kind <
    WRITE kind). Read-only transactions decide once all rows are walked.
    Returns {transaction_id: succeeded} for every undecided transaction.
    """
    rows = sorted(
        rows,
        key=lambda r: (
            r["ts"],
            r["kafka_partition"],
            r["kafka_offset"],
            r["transaction_id"],
            r["kind"],
            r["key"],
        ),
    )
    state: dict[str, str] = {}
    observed: dict[str, list] = {}
    verdicts: dict[str, bool] = {}

    def _decide(txn: str) -> bool:
        if txn not in verdicts:
            obs = observed.get(txn, [])
            # raise, not assert: this invariant guards verdict
            # correctness and must survive `python -O` (same rule as the
            # temporal.py collision guards, r4 ADVICE)
            if len(obs) != n_asserts.get(txn, 0):
                raise RuntimeError(
                    f"tail fold: {txn} decided with {len(obs)} of "
                    f"{n_asserts.get(txn, 0)} reads observed"
                )
            verdicts[txn] = all(exp == got for exp, got in obs)
        return verdicts[txn]

    for r in rows:
        txn = r["transaction_id"]
        if r["succeeded"]:  # committed write of an already-decided txn
            if r["wvalue"] is None:
                state.pop(r["key"], None)
            else:
                state[r["key"]] = r["wvalue"]
        elif r["kind"] == KIND_READ:
            observed.setdefault(txn, []).append(
                (r["expected"], state.get(r["key"]))
            )
        else:  # undecided write: verdict is computable here
            if _decide(txn):
                if r["wvalue"] is None:
                    state.pop(r["key"], None)
                else:
                    state[r["key"]] = r["wvalue"]
    # Read-only tail transactions have no write row — decide them now.
    for txn in observed:
        _decide(txn)
    return verdicts


def replay(
    transactions: DataFrame,
    initial_state: DataFrame | None = None,
    max_rounds: int = 10_000,
    verbose: bool = False,
    tail_collapse_txns: int = 5_000,
    tail_collapse_max_rows: int = 500_000,
    stats: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Deterministically replay a transaction log.

    ``stats``: pass a dict to receive {"rounds": wavefront rounds run,
    "tail_collapsed": whether the driver-side tail fold fired} — bench
    telemetry (wave count is the scale-relevant figure: it tracks the
    longest dependency chain, not the row count).

    transactions: TRANSACTION_LOG-shaped (ts, kafka_partition,
    kafka_offset, transaction_id, asserts, updates). (ts, partition,
    offset) must be unique per row — it IS the serial order (reference
    D13, flink/package.scala:41-56).

    Returns (transaction_results, final_state):
    - transaction_results: (transaction_id, succeeded)
    - final_state: (key, value) after all committed writes (deleted /
      never-written keys absent).

    Adaptive tail collapse: whenever the undecided transactions' op rows
    are estimated (from the measured ops/txn ratio) to fit
    ``tail_collapse_max_rows``, the conflict tail (their op rows plus the
    committed writes interleaved on the same keys) is collected and
    finished with a driver-side serial fold instead of paying a
    distributed round per dependency-chain link. This is the AQE move
    (runtime stats pick the physical strategy): the wavefront does the
    data-scale work, and the ROW bound — not a transaction count — is
    what protects the driver, so the trigger is derived from it;
    ``tail_collapse_txns`` remains as a floor. If the tail turns out not
    to fit (estimate off on hot keys), the trigger halves and the
    wavefront simply continues. At 100 TB the wavefront runs until the
    undecided residue genuinely fits ~500k rows — the chain tail whose
    per-link latency would otherwise dominate.

    Single-JVM sizing note (measured r9, BASELINE.md §6): a 10M-txn
    replay on local[32] needs ~64 GiB of driver heap (localCheckpoint
    of 10M nested rows) AND GC-tolerant liveness settings — full-heap
    pauses at that size exceed the DEFAULT executor-heartbeat tolerance
    (10 s × 60) and the local executor self-terminates mid-stage
    ('Exit as unable to send heartbeats'). Set
    spark.executor.heartbeatInterval=60s, spark.network.timeout=800s
    (and G1GC) for 10M+ single-JVM runs; on a real cluster the same
    plan spreads the per-wave joins and the per-node heap never reaches
    this regime.
    """
    # Every wavefront round windows ops_active BY THE SAME KEY the
    # round-0 working set was laid out in (hash by ``key``, sorted by
    # the serial order). Creating the eager checkpoints with AQE off
    # (checkpoint_preserving — the scope enters and exits PER
    # CHECKPOINT, r14; r13 held it across the whole loop, disabling
    # AQE for every count/collect/tail read and any concurrent driver
    # thread) lets each LogicalRDD advertise that layout, so EVERY
    # round's window and the final-state aggregation skip their
    # Exchange+Sort over the working set outright — the protocol pays
    # its one fundamental hash-by-key shuffle exactly once, at round-0
    # build (guide §2.4). Everything that is not a checkpoint creation
    # plans with the session's own AQE setting.
    return _replay_impl(
        transactions,
        initial_state,
        max_rounds,
        verbose,
        tail_collapse_txns,
        tail_collapse_max_rows,
        stats,
    )


def _replay_impl(
    transactions: DataFrame,
    initial_state: DataFrame | None,
    max_rounds: int,
    verbose: bool,
    tail_collapse_txns: int,
    tail_collapse_max_rows: int,
    stats: dict | None,
) -> tuple[DataFrame, DataFrame]:
    spark = transactions.sparkSession

    # One checkpoint: the explode+dedup (window) plan feeds three
    # consumers below — materialize once instead of recomputing per branch.
    ops = checkpoint_preserving(_build_ops(transactions, initial_state))

    # S3 completion-gate quantity: deduped assert count per transaction
    # (flink/StreamyDb.scala:165). Small (one row per txn with asserts);
    # broadcast everywhere it is joined.
    # Sorted within its hash partitions so the checkpoint advertises
    # BOTH the transaction_id partitioning and ordering: the per-round
    # decision join and the round-0 anti join then merge-join against
    # it with no Exchange and no Sort on this side (it is log-sized —
    # one row per asserting transaction — so neither re-broadcasting it
    # per round nor re-sorting it per round is acceptable).
    n_asserts = checkpoint_preserving(
        ops.filter(F.col("kind") == KIND_READ)
        .groupBy("transaction_id")
        .agg(F.count("*").alias("n_asserts"))
        .sortWithinPartitions("transaction_id")
    )

    all_txns = transactions.select("transaction_id").distinct()

    # Round 0: assert-free transactions commit unconditionally (empty
    # conjunction, flink:165-172 with asserts.size == 0).
    # NOT broadcast (same rationale as the per-round decision join):
    # all_txns is partitioned by transaction_id after its distinct and
    # n_asserts' checkpoint advertises the same layout, so the anti
    # join needs no Exchange — while a broadcast would collect and ship
    # the whole log-sized assert table.
    decided0 = checkpoint_preserving(
        all_txns.join(n_asserts, "transaction_id", "left_anti")
        .select("transaction_id", F.lit(True).alias("succeeded"))
    )
    result_parts: list[DataFrame] = [decided0]

    seed = [(INIT_TXN_ID, True)] if initial_state is not None else []
    init_decided = (
        spark.createDataFrame(seed, schemas.TRANSACTION_RESULT) if seed else None
    )
    round0 = decided0 if init_decided is None else decided0.unionByName(init_decided)

    # Working set: every op row, annotated with the owner's outcome
    # (TRUE committed / NULL undecided). Aborted rows and decided reads
    # are removed as rounds progress.
    #
    # Lay the working set out ONCE in the wavefront's own geometry —
    # hash-partitioned by ``key`` (partition count from
    # spark.sql.shuffle.partitions, the conf-scaled driver contract) and
    # sorted by the serial order inside each partition. Created under
    # the AQE-off scope, the checkpoint ADVERTISES that layout, every
    # round's update (broadcast join + filter + project) preserves it,
    # and so every wave's window and the final-state aggregation run
    # with ZERO Exchange and ZERO Sort (plan-gated) — the one shuffle
    # here replaces the per-round Exchange+Sort the loop used to pay.
    ops_active = checkpoint_preserving(
        ops.join(F.broadcast(round0), "transaction_id", "left")
        .filter(F.col("succeeded").isNull() | ((F.col("kind") == KIND_WRITE) & F.col("succeeded")))
        .repartition("key")
        .sortWithinPartitions("key", *_ORDER)
    )

    n_total = all_txns.count()
    n_decided = decided0.count()

    # Row-budget-driven collapse trigger: the whole point of the fold is
    # bounded driver rows, so trigger as soon as the undecided set is
    # estimated to fit (measured ops/txn, ×2 headroom for the committed
    # writes interleaved on the same keys). tail_collapse_txns=0 disables
    # the fold entirely (pure-wavefront mode, used by tests).
    if tail_collapse_txns > 0:
        avg_ops = max(1.0, ops.count() / max(1, n_total))
        tail_collapse_txns = max(
            tail_collapse_txns, int(tail_collapse_max_rows / (2 * avg_ops))
        )

    # ``ops`` is fully consumed (n_asserts, round-0 ops_active and the
    # avg_ops count are all materialized above) — release its checkpoint
    # blocks now instead of pinning the largest frame of the whole replay
    # for the rest of the session (guide §5). A 1M-txn replay otherwise
    # holds every wave's superseded checkpoint too (released per round
    # below), squeezing execution memory for everything that follows.
    release_local_checkpoints(ops)

    w_prev = (
        Window.partitionBy("key")
        .orderBy(*_ORDER)
        .rowsBetween(Window.unboundedPreceding, -1)
    )

    is_write = F.col("kind") == KIND_WRITE
    undecided_write = F.when(is_write & F.col("succeeded").isNull(), 1).otherwise(0)
    # The committed effect carries the undecided-write count AT the write
    # (``u``): a read is observable iff no undecided write sits BETWEEN
    # the last committed write and the read — undecided writes shadowed
    # by a later committed write cannot change the observed value either
    # way, so they must not block (this widens each wave; without it a
    # long chain of shadowed writers serializes into one round each).
    committed_effect = F.when(
        is_write & (F.col("succeeded") == True),  # noqa: E712
        F.struct(F.col("wvalue").alias("v"), F.col("u_cum").alias("u")),
    )

    rounds = 0
    tail_fired = False
    while n_decided < n_total:
        # Attempt the tail collapse BEFORE paying for a distributed round
        # (round 0 alone often shrinks the set under the row budget).
        remaining = n_total - n_decided
        if 0 < remaining <= tail_collapse_txns:
            undecided = F.col("succeeded").isNull()
            tail_keys = ops_active.filter(undecided).select("key").distinct()
            tail_ops = ops_active.join(F.broadcast(tail_keys), "key")
            bounded = tail_ops.limit(tail_collapse_max_rows + 1)
            try:
                # Arrow transfer + plain dicts: ~4x cheaper than the
                # pickled-Row path for the driver-bounded tail (both the
                # transfer and the fold's per-field access), identical
                # values (Arrow nulls -> None, timestamps -> datetime).
                rows = bounded.toArrow().to_pylist()
            except Exception:  # pragma: no cover - Connect/arrow-less
                rows = bounded.collect()
            if len(rows) > tail_collapse_max_rows:
                # Hot-key tail too large to collect — halve the trigger so
                # the next attempt happens once the set genuinely shrank.
                tail_collapse_txns = remaining // 2
            else:
                # The undecided transaction ids are already IN the
                # collected rows (an undecided txn always retains its
                # read rows, and every one of its keys is a tail key by
                # construction) — derive them driver-side instead of
                # paying another full ops_active scan + distinct here.
                # n_asserts itself stays the independently-aggregated
                # frame so the fold's observed-vs-expected guard keeps
                # its independent basis.
                und_ids = sorted(
                    {
                        r["transaction_id"]
                        for r in rows
                        if r["succeeded"] is None
                    }
                )
                und_txn_df = spark.createDataFrame(
                    [(t,) for t in und_ids], "transaction_id string"
                )
                na_df = n_asserts.join(
                    F.broadcast(und_txn_df), "transaction_id"
                )
                try:  # Arrow transfer (same rationale as the tail rows)
                    na_rows = na_df.toArrow().to_pylist()
                except Exception:  # pragma: no cover - Connect/arrow-less
                    na_rows = na_df.collect()
                na = {
                    r["transaction_id"]: r["n_asserts"] for r in na_rows
                }
                verdicts = _serial_tail_fold(rows, na)
                tail_fired = True
                if verbose:
                    print(
                        f"[replay] tail collapse after round {rounds}: "
                        f"{len(verdicts)} txns folded driver-side"
                    )
                tail_results = spark.createDataFrame(
                    sorted(verdicts.items()), schemas.TRANSACTION_RESULT
                )
                result_parts.append(tail_results)
                n_decided += len(verdicts)
                tr = F.broadcast(
                    tail_results.withColumnRenamed("succeeded", "new_outcome")
                )
                ops_active = (
                    ops_active.join(tr, "transaction_id", "left")
                    .withColumn("succeeded", F.coalesce("new_outcome", "succeeded"))
                    .drop("new_outcome")
                )
                break

        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(f"replay did not converge in {max_rounds} rounds")

        # Two Window ops over the same (partition, order) spec — Catalyst
        # plans them back-to-back on one sort, no extra shuffle.
        with_u = ops_active.select(
            "*",
            F.coalesce(F.sum(undecided_write).over(w_prev), F.lit(0)).alias("u_cum"),
        )
        annotated = with_u.select(
            "*",
            F.last(committed_effect, ignorenulls=True).over(w_prev).alias("eff"),
        )

        observable_reads = annotated.filter(
            (F.col("kind") == KIND_READ)
            & F.col("succeeded").isNull()
            & (
                F.col("u_cum") - F.coalesce(F.col("eff.u"), F.lit(0)) == 0
            )
        ).select(
            "transaction_id",
            "expected",
            F.col("eff.v").alias("observed"),  # NULL eff → absent; NULL v → deleted
        )

        # Decide: complete (all reads observable) OR incremental abort —
        # any observable failed assert already decides the conjunction
        # (the optimization the reference left as a comment, flink:163).
        # Incremental abort also shortens lock-release chains: an aborted
        # writer's locks stop blocking readers a round earlier.
        # NOT broadcast: n_asserts is one row per asserting transaction —
        # log-sized — and re-broadcasting it EVERY round rebuilds and
        # re-ships the whole relation per wave. Both join inputs are
        # already hash-partitioned by transaction_id (the aggregation's
        # own exchange; the checkpoint's advertised layout), so the
        # non-broadcast join plans with zero additional Exchange.
        newly = checkpoint_preserving(
            observable_reads.groupBy("transaction_id")
            .agg(
                F.count("*").alias("n_obs"),
                F.bool_and(F.expr("expected <=> observed")).alias("ok"),
            )
            .join(n_asserts, "transaction_id")
            .filter((F.col("n_obs") == F.col("n_asserts")) | (~F.col("ok")))
            .select("transaction_id", F.col("ok").alias("succeeded"))
        )
        n_new = newly.count()
        if n_new == 0:
            raise RuntimeError(
                f"replay stalled at {n_decided}/{n_total} decided "
                f"(round {rounds}) — non-unique (ts,partition,offset)?"
            )
        n_decided += n_new
        result_parts.append(newly)
        if verbose:
            import time as _time

            print(
                f"[replay] round {rounds}: +{n_new} decided "
                f"({n_decided}/{n_total}) at {_time.strftime('%X')}"
            )

        # Shrink the working set: decided reads leave; decided writes stay
        # only if committed (they carry state for later readers).
        nd = F.broadcast(newly.withColumnRenamed("succeeded", "new_outcome"))
        superseded = ops_active
        ops_active = checkpoint_preserving(
            ops_active.join(nd, "transaction_id", "left")
            .filter(
                F.col("new_outcome").isNull()  # untouched this round
                | (is_write & F.col("new_outcome"))  # newly committed write
            )
            .withColumn("succeeded", F.coalesce("new_outcome", "succeeded"))
            .drop("new_outcome")
        )
        # The new eager checkpoint is materialized — the previous wave's
        # working set is dead (nothing reads an old ops_active again).
        # Keeping only the live wave caps the replay's pinned storage at
        # O(one wave) instead of O(sum of all waves).
        release_local_checkpoints(superseded)

    # n_asserts' last reads are inside the loop (per-round decision join
    # / tail-fold collect) — release it; decided0 and each round's
    # ``newly`` stay live (the returned ``results`` union reads them).
    release_local_checkpoints(n_asserts)

    if stats is not None:
        stats["rounds"] = rounds
        stats["tail_collapsed"] = tail_fired
    results = reduce(DataFrame.unionByName, result_parts)

    # Final KV state: last committed write per key in serial order
    # (NULL value = delete ⇒ key absent, flink/StreamyDb.scala:113-118).
    final_state = (
        ops_active.filter(is_write & (F.col("succeeded") == True))  # noqa: E712
        .groupBy("key")
        .agg(
            F.max_by(
                F.struct(F.col("wvalue").alias("v")),
                F.struct("ts", "kafka_partition", "kafka_offset", "transaction_id"),
            ).alias("last")
        )
        .filter(F.col("last.v").isNotNull())
        .select("key", F.col("last.v").alias("value"))
    )

    return results, final_state
