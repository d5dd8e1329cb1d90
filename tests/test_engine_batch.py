"""Protocol correctness: the distributed batch replay must match the
pure-Python serial oracle exactly — results AND final state — on every
workload mix, plus determinism across repartitionings and handwritten
edge cases (aborts leave state untouched, deletes, CAS chains)."""

from __future__ import annotations

import pytest

from streamy_db_spark import fixtures, oracle, schemas
from streamy_db_spark.engine_batch import replay


def run_and_compare(spark, txns, initial=None, **replay_kwargs):
    expected_results, expected_state = oracle.serial_replay(
        txns, dict(initial) if initial else None
    )
    df = fixtures.to_dataframe(spark, txns)
    init_df = (
        spark.createDataFrame(list(initial.items()), schemas.KV_STATE)
        if initial
        else None
    )
    results_df, state_df = replay(df, init_df, **replay_kwargs)
    got_results = {r["transaction_id"]: r["succeeded"] for r in results_df.collect()}
    got_state = {r["key"]: r["value"] for r in state_df.collect()}
    assert got_results == expected_results
    assert got_state == expected_state
    return got_results, got_state


@pytest.mark.parametrize(
    "mix", ["ref_smoke", "conflict_heavy", "cas_chain", "deletes", "read_only"]
)
def test_mix_matches_serial_oracle(spark, mix):
    run_and_compare(spark, fixtures.generate(mix))


@pytest.mark.parametrize("mix", ["conflict_heavy", "cas_chain", "deletes"])
def test_pure_wavefront_matches_oracle(spark, mix):
    """With tail collapse disabled, the distributed wavefront must run
    every round itself and still match the oracle (the small mixes would
    otherwise collapse after round 1 and leave rounds 2+ untested)."""
    run_and_compare(spark, fixtures.generate(mix), tail_collapse_txns=0)


def test_random_workloads_pure_wavefront(spark):
    """Randomized adversarial sweep of the distributed wavefront (tail
    collapse disabled): dense conflicts on a tiny keyspace, timestamp
    ties, read-only and assert-free txns, deletes — the shapes that
    stress the shadowed-undecided-write accounting (u_cum/eff) and
    incremental abort. Fixture mixes cover 3 fixed shapes; this covers
    12 random ones per run (seeded — deterministic)."""
    import random
    from datetime import datetime, timedelta, timezone

    base_ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rng = random.Random(0xC0FFEE)
    keys = ["a", "b", "c", "d"]
    values = ["1", "2", "3", None]
    for case in range(12):
        n = rng.randint(5, 28)
        txns = []
        for i in range(n):
            asserts = list(
                {
                    rng.choice(keys): rng.choice(values)
                    for _ in range(rng.randint(0, 3))
                }.items()
            )
            updates = [
                (rng.choice(keys), rng.choice(values))
                for _ in range(rng.randint(0, 3))
            ]
            txns.append(
                {
                    "ts": base_ts + timedelta(seconds=rng.randint(0, n // 3)),
                    "kafka_partition": rng.randint(0, 1),
                    "kafka_offset": i,
                    "transaction_id": f"t{i}",
                    "asserts": asserts,
                    "updates": updates,
                }
            )
        try:
            run_and_compare(spark, txns, tail_collapse_txns=0)
        except AssertionError as e:
            raise AssertionError(f"case {case} (seeded) diverged: {e}") from e


def test_determinism_across_partitionings(spark):
    txns = fixtures.generate("conflict_heavy")
    df = fixtures.to_dataframe(spark, txns)
    r1, s1 = replay(df.repartition(1))
    r64, s64 = replay(df.repartition(64, "transaction_id"))
    assert sorted(map(tuple, r1.collect())) == sorted(map(tuple, r64.collect()))
    assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s64.collect()))


def _txn(ts_s, part, off, tid, asserts, updates):
    from datetime import datetime, timedelta, timezone

    return {
        "ts": datetime(2024, 1, 1, tzinfo=timezone.utc) + timedelta(seconds=ts_s),
        "kafka_partition": part,
        "kafka_offset": off,
        "transaction_id": tid,
        "asserts": asserts,
        "updates": updates,
    }


def test_abort_leaves_state_untouched(spark):
    txns = [
        _txn(0, 0, 0, "t1", [("a", None)], [("a", "1")]),
        # t2 asserts a absent — must abort (t1 committed) and write nothing
        _txn(1, 0, 1, "t2", [("a", None)], [("a", "2"), ("b", "2")]),
        # t3 reads the state t2 would have clobbered
        _txn(2, 0, 2, "t3", [("a", "1"), ("b", None)], []),
    ]
    results, state = run_and_compare(spark, txns)
    assert results == {"t1": True, "t2": False, "t3": True}
    assert state == {"a": "1"}


def test_delete_then_expect_absent(spark):
    txns = [
        _txn(0, 0, 0, "t1", [], [("k", "v1")]),
        _txn(1, 0, 1, "t2", [("k", "v1")], [("k", None)]),  # CAS delete
        _txn(2, 0, 2, "t3", [("k", None)], [("k", "v2")]),  # absent again
    ]
    results, state = run_and_compare(spark, txns)
    assert results == {"t1": True, "t2": True, "t3": True}
    assert state == {"k": "v2"}


def test_initial_state_and_read_only(spark):
    txns = [
        _txn(0, 0, 0, "t1", [("x", "seed")], []),  # read-only, sees initial
        _txn(1, 0, 1, "t2", [("x", "seed")], [("x", None)]),
        _txn(2, 0, 2, "t3", [("x", "seed")], []),  # stale read → abort
    ]
    results, state = run_and_compare(spark, txns, initial={"x": "seed", "y": "keep"})
    assert results == {"t1": True, "t2": True, "t3": False}
    assert state == {"y": "keep"}


def test_same_ts_tiebreak_partition_offset(spark):
    # identical ts: serial order is (partition, offset)
    txns = [
        _txn(0, 1, 0, "late", [("k", "first")], [("k", "second")]),
        _txn(0, 0, 0, "early", [("k", None)], [("k", "first")]),
    ]
    results, state = run_and_compare(spark, txns)
    assert results == {"early": True, "late": True}
    assert state == {"k": "second"}


def test_duplicate_keys_within_one_txn(spark):
    """Duplicate keys inside one assert/update list (wire-legal,
    SURVEY.md §2.5): asserts dedup to the distinct set, updates apply in
    list order so the LAST value per key wins — the in-array dedup in
    _build_ops must reproduce exactly what serial list application does."""
    txns = [
        # duplicate updates on one key: last ("2") must win
        _txn(0, 0, 0, "t1", [], [("k", "1"), ("j", "x"), ("k", "2")]),
        # duplicate identical asserts: one logical read, still commits
        _txn(1, 0, 1, "t2", [("k", "2"), ("k", "2")], [("k", "3")]),
        # dup update ending in delete: k absent afterwards
        _txn(2, 0, 2, "t3", [("k", "3")], [("k", "9"), ("k", None)]),
        _txn(3, 0, 3, "t4", [("k", None), ("j", "x")], []),
    ]
    results, state = run_and_compare(spark, txns)
    assert results == {"t1": True, "t2": True, "t3": True, "t4": True}
    assert state == {"j": "x"}


def test_same_key_assert_and_update(spark):
    # read-before-own-write: assert sees the PRE-transaction value
    txns = [
        _txn(0, 0, 0, "t1", [("k", None)], [("k", "v")]),
        _txn(1, 0, 1, "t2", [("k", "v")], [("k", "w")]),
    ]
    results, state = run_and_compare(spark, txns)
    assert results == {"t1": True, "t2": True}
    assert state == {"k": "w"}


def test_heartbeat_empty_transaction(spark):
    txns = [_txn(0, 0, 0, "hb", [], [])]
    results, state = run_and_compare(spark, txns)
    assert results == {"hb": True}
    assert state == {}


def test_replay_stats_out_param(spark):
    """bench telemetry contract: stats receives wavefront round count and
    whether the driver-side tail fold fired."""
    from streamy_db_spark import fixtures
    from streamy_db_spark.engine_batch import replay

    txns = fixtures.generate_df(spark, "ref_smoke")
    stats = {}
    results, _state = replay(txns, stats=stats)
    assert results.count() == 10
    assert set(stats) == {"rounds", "tail_collapsed"}
    assert stats["rounds"] >= 0
    # ref_smoke (10 txns) is far below the tail trigger: folds immediately.
    assert stats["tail_collapsed"] is True

    stats2 = {}
    results2, _ = replay(txns, tail_collapse_txns=0, stats=stats2)
    assert results2.count() == 10
    assert stats2["tail_collapsed"] is False
    assert stats2["rounds"] >= 1


def test_replay_releases_superseded_checkpoints(spark):
    """r13 memory-lifecycle contract (guide §5): the replay frees its
    internal checkpoints (ops, n_asserts, every superseded per-wave
    ops_active) as soon as nothing can read them again, and
    release_local_checkpoints() frees the surviving ones once the
    caller has consumed results/state — a 1M replay must not pin every
    wave's working set in storage memory for the rest of the session.

    Wavefront mode (tail_collapse_txns=0) with a conflict chain forces
    R >= 2 rounds: live blocks after consumption must be at most
    txns + decided0 + R x newly + final ops_active = R + 3 (the
    pre-fix lifetime also held ops + n_asserts + R superseded working
    sets = 2R + 5), and zero after the explicit releases."""
    from streamy_db_spark import fixtures
    from streamy_db_spark.engine_batch import replay
    from streamy_db_spark.session import release_local_checkpoints

    sc = spark.sparkContext

    def live():
        infos = sc._jsc.sc().getRDDStorageInfo()
        return [i.id() for i in infos]

    base = set(live())  # tolerate unrelated session state

    txns = fixtures.generate_df(spark, "conflict_heavy").localCheckpoint(
        eager=True
    )
    stats = {}
    results, state = replay(txns, tail_collapse_txns=0, stats=stats)
    n = results.count()
    state.count()
    rounds = stats["rounds"]
    assert rounds >= 2, "fixture must force a multi-wave replay"

    after_consume = set(live()) - base
    assert len(after_consume) <= rounds + 3, (
        f"replay left {len(after_consume)} live checkpoint blocks for "
        f"{rounds} rounds — superseded working sets not released?"
    )

    for f in (results, state, txns):
        release_local_checkpoints(f)
    assert not (set(live()) - base), "explicit release left blocks behind"

    # the released frames were consumed before release; fresh replays
    # still work (nothing shared/corrupted session-wide)
    again, st2 = replay(
        fixtures.generate_df(spark, "conflict_heavy"), tail_collapse_txns=0
    )
    assert again.count() == n
    st2.count()


def test_multiround_replay_reuses_checkpoint_partitioning(spark):
    """r13 optimization contract (guide §2.4): the per-wave eager
    checkpoints are created with AQE off so they advertise their hash
    partitioning by ``key`` — wave N+1's window and the final-state
    aggregation must NOT re-shuffle the working set. Externally
    visible: final_state aggregates the last wave's checkpoint by the
    same key, so its physical plan must contain no Exchange."""
    from streamy_db_spark import fixtures
    from streamy_db_spark.engine_batch import replay
    from streamy_db_spark.session import release_local_checkpoints

    txns = fixtures.generate_df(spark, "conflict_heavy")
    stats = {}
    results, state = replay(txns, tail_collapse_txns=0, stats=stats)
    assert stats["rounds"] >= 2, "fixture must force a multi-wave replay"
    plan = state._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    results.count()
    state.count()
    for f in (results, state):
        release_local_checkpoints(f)


def test_replay_keeps_aqe_on_between_waves(spark, monkeypatch):
    """r14 (r13 verdict's perf-weak #1): ``replay()`` used to hold the
    session-global AQE-off scope across its ENTIRE wavefront loop, so
    every per-round count/collect — and any concurrent query on the
    session — planned without AQE's coalesce/skew handling. The scope
    is now per checkpoint (session.checkpoint_preserving). Observable:
    at every between-wave release point (called once per superseded
    working set, i.e. outside any checkpoint creation) the session's
    AQE conf must read its normal value — and it must still advertise
    checkpoint layouts (the companion plan gate
    test_multiround_replay_reuses_checkpoint_partitioning)."""
    from streamy_db_spark import engine_batch, fixtures
    from streamy_db_spark.session import release_local_checkpoints

    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    seen: list[str] = []

    def spying_release(df):
        seen.append(spark.conf.get("spark.sql.adaptive.enabled"))
        release_local_checkpoints(df)

    monkeypatch.setattr(
        engine_batch, "release_local_checkpoints", spying_release
    )
    txns = fixtures.generate_df(spark, "conflict_heavy")
    stats = {}
    results, state = engine_batch.replay(
        txns, tail_collapse_txns=0, stats=stats
    )
    results.count()
    state.count()
    assert stats["rounds"] >= 2, "fixture must force a multi-wave replay"
    # ops release + one release per superseded wave + n_asserts release
    assert len(seen) >= stats["rounds"] + 1
    assert set(seen) == {"true"}, seen
    for f in (results, state):
        release_local_checkpoints(f)
