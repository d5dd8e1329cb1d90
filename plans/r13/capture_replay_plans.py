#!/usr/bin/env python
"""Capture the batch replay's plan-shape evidence for the r13 round.

Runs a multi-wave replay (conflict_heavy, tail collapse disabled) and
writes, for the CURRENT tree:
  - the final-state aggregation's physical plan (reads the last wave's
    working-set checkpoint; Exchange-free once the checkpoint advertises
    its hash-by-key layout), and
  - a wave window's physical plan, reconstructed over the round-0
    working set exactly as _replay_impl builds it (Exchange+Sort-free
    under the advertised layout).

Usage: python plans/r13/capture_replay_plans.py <suffix>
Writes plans/r13/protocol_replay_state_<suffix>.txt and
plans/r13/protocol_replay_wave_window_<suffix>.txt relative to THIS
file's repo (so it can be pointed at a pre-change worktree).
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[2])
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    out_dir = Path(_REPO) / "plans" / "r13"

    from pyspark.sql import functions as F

    from streamy_db_spark import engine_batch, fixtures
    from streamy_db_spark.engine_batch import replay
    from streamy_db_spark.session import get_spark

    spark = get_spark("capture_replay_plans", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    txns = fixtures.generate_df(spark, "conflict_heavy")
    stats: dict = {}
    results, state = replay(txns, tail_collapse_txns=0, stats=stats)
    plan = state._jdf.queryExecution().executedPlan().toString()
    (out_dir / f"protocol_replay_state_{suffix}.txt").write_text(
        f"final_state physical plan after a {stats['rounds']}-wave replay\n"
        f"(conflict_heavy, tail collapse off):\n\n{plan}"
    )

    # Reconstruct the wave window over the round-0 working set the way
    # _replay_impl does, and capture ITS plan (the per-wave cost).
    ops = engine_batch._build_ops(txns, None)
    try:
        from streamy_db_spark.session import partition_preserving_checkpoints

        def ckpt(df):
            with partition_preserving_checkpoints(spark):
                return df.localCheckpoint(eager=True)

    except ImportError:  # pre-change tree: plain checkpoint

        def ckpt(df):
            return df.localCheckpoint(eager=True)
    n_asserts = (
        ops.filter(F.col("kind") == engine_batch.KIND_READ)
        .groupBy("transaction_id")
        .agg(F.count("*").alias("n_asserts"))
    )
    # Discriminate the decision-join change by what the tree's replay
    # actually does (hasattr(_replay_impl) is too coarse: the layout
    # change and the merge-join change landed in separate commits).
    import inspect

    try:
        _replay_src = inspect.getsource(engine_batch._replay_impl)
    except AttributeError:  # pre-layout tree
        _replay_src = inspect.getsource(engine_batch.replay)
    merge_join_decision = ".join(n_asserts, " in _replay_src
    if merge_join_decision:  # post-change: sorted checkpoint, merge join
        n_asserts_ck = ckpt(n_asserts.sortWithinPartitions("transaction_id"))
    else:
        n_asserts_ck = ckpt(n_asserts)
    decided0 = (
        txns.select("transaction_id")
        .distinct()
        .join(F.broadcast(n_asserts), "transaction_id", "left_anti")
        .select("transaction_id", F.lit(True).alias("succeeded"))
    )
    base = ops.join(F.broadcast(decided0), "transaction_id", "left").filter(
        F.col("succeeded").isNull()
        | ((F.col("kind") == engine_batch.KIND_WRITE) & F.col("succeeded"))
    )
    if hasattr(engine_batch, "_replay_impl"):  # post-change layout
        base = base.repartition("key").sortWithinPartitions(
            "key", *engine_batch._ORDER
        )
    ops_active = ckpt(base)

    from pyspark.sql import Window

    w_prev = (
        Window.partitionBy("key")
        .orderBy(*engine_batch._ORDER)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_write = F.col("kind") == engine_batch.KIND_WRITE
    undecided_write = F.when(
        is_write & F.col("succeeded").isNull(), 1
    ).otherwise(0)
    with_u = ops_active.select(
        "*",
        F.coalesce(F.sum(undecided_write).over(w_prev), F.lit(0)).alias("u_cum"),
    )
    wplan = with_u._jdf.queryExecution().executedPlan().toString()
    (out_dir / f"protocol_replay_wave_window_{suffix}.txt").write_text(
        "wave window (u_cum running sum) physical plan over the round-0 "
        "working set:\n\n" + wplan
    )

    # The per-round decision join (newly): post-change it must merge-join
    # the sorted n_asserts checkpoint with no Exchange/Sort on that side
    # (1 Exchange + 1 Sort total, both on the aggregated observable
    # side); pre-change it re-broadcast log-sized n_asserts every round.
    annotated = with_u.select(
        "*",
        F.last(
            F.when(
                is_write & (F.col("succeeded") == True),  # noqa: E712
                F.struct(F.col("wvalue").alias("v"), F.col("u_cum").alias("u")),
            ),
            ignorenulls=True,
        ).over(w_prev).alias("eff"),
    )
    obs = annotated.filter(
        (F.col("kind") == engine_batch.KIND_READ)
        & F.col("succeeded").isNull()
        & (F.col("u_cum") - F.coalesce(F.col("eff.u"), F.lit(0)) == 0)
    ).select("transaction_id", "expected", F.col("eff.v").alias("observed"))
    agg = obs.groupBy("transaction_id").agg(
        F.count("*").alias("n_obs"),
        F.bool_and(F.expr("expected <=> observed")).alias("ok"),
    )
    if merge_join_decision:
        newly = agg.join(n_asserts_ck, "transaction_id")
    else:
        newly = agg.join(F.broadcast(n_asserts_ck), "transaction_id")
    newly = newly.filter(
        (F.col("n_obs") == F.col("n_asserts")) | (~F.col("ok"))
    ).select("transaction_id", F.col("ok").alias("succeeded"))
    nplan = newly._jdf.queryExecution().executedPlan().toString()
    (out_dir / f"protocol_replay_decision_join_{suffix}.txt").write_text(
        "per-round decision join (newly) physical plan:\n\n" + nplan
    )
    print(
        f"captured: state Exchanges={plan.count('Exchange')}, "
        f"wave window Exchanges={wplan.count('Exchange')} "
        f"Sorts={wplan.count('Sort ')}, "
        f"decision join Exchanges={nplan.count('Exchange')} "
        f"Sorts={nplan.count('Sort ')}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
