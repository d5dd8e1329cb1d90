"""Physical-plan quality gates (SURVEY.md §4.3): the properties that make
these queries viable at 100 TB must be visible in the plan, not assumed —
pushdown reaching the parquet scan, column pruning, broadcast joins for
dims, top-k as TakeOrderedAndProject (no global sort), and no Python
row-at-a-time evaluation outside the declared Arrow boundaries."""

from __future__ import annotations

import __spark_entry__ as entrymod
from streamy_db_spark.plans import inspect

QUERIES = entrymod.queries()
SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    return inspect.executed_plan(QUERIES[name](spark, SF))


def explain_formatted(spark, name: str) -> str:
    return inspect.formatted_explain(QUERIES[name](spark, SF))


def test_filter_pushdown_reaches_scan(spark):
    plan = explain_formatted(spark, "q_scan_filter_project")
    assert "PushedFilters" in plan
    assert "l_returnflag" in plan.split("PushedFilters")[1].splitlines()[0]


def test_column_pruning(spark):
    plan = explain_formatted(spark, "q_scan_filter_project")
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    # 16-column table, 5-column read set: only what's needed is read.
    for col in ("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"):
        assert col in read_schema
    assert "l_comment" not in read_schema and "l_shipdate" not in read_schema


def test_join_3way_broadcasts_dim(spark):
    # The explicitly-broadcast customer dim must be a broadcast join keyed
    # on custkey (at tiny SF Spark may auto-broadcast orders too — fine;
    # at scale AQE picks shuffle joins for fact⋈fact, which we don't pin).
    plan = plan_of(spark, "q_join_3way")
    assert "BroadcastHashJoin [o_custkey" in plan


def test_tpch_q5_broadcast_chain(spark):
    # The 6-way join must broadcast the dim chain (supplier+nation+region,
    # customer) so the two fact tables shuffle at most once, on orderkey;
    # and the date window must push into the orders scan.
    plan = plan_of(spark, "q_tpch_q5")
    assert plan.count("BroadcastHashJoin") >= 2
    for op in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert op not in plan, op
    fplan = explain_formatted(spark, "q_tpch_q5")
    pushed = [
        ln for ln in fplan.splitlines() if "PushedFilters" in ln and "o_orderdate" in ln
    ]
    assert pushed, "date filter not pushed to orders scan"


def test_topk_avoids_global_sort(spark):
    plan = plan_of(spark, "q_topk_orders")
    assert "TakeOrderedAndProject" in plan


def test_agg_has_map_side_combine(spark):
    # partial_sum before the exchange = map-side combine: the shuffle
    # moves one row per group per task, not one per input row.
    plan = plan_of(spark, "q_agg_tpch_pricing")
    assert "partial_sum" in plan
    assert plan.index("partial_sum") > plan.index("Exchange")  # partial is
    # the INNER (pre-shuffle) aggregate in the printed tree


def test_semi_anti_join_plans_as_semi_and_anti(spark):
    # LeftSemi in the physical plan = no row multiplication; the build
    # side carries keys only. LeftAnti likewise for the no-orders probe.
    plan = plan_of(spark, "q_semi_anti_join")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_asof_join_single_shuffle_no_join_operator(spark):
    """The as-of join must compile to ONE hash exchange on the key and a
    window — no physical join operator at all (that is the point of the
    union formulation: an inequality join would nested-loop)."""
    plan = plan_of(spark, "q_asof_join")
    assert "Window" in plan
    for op in ("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert op not in plan, op


def test_range_join_is_hash_join_not_nested_loop(spark):
    """The banded range join must plan as an equi-join on (key, bucket) —
    never the nested-loop Catalyst produces for raw inequality joins."""
    plan = plan_of(spark, "q_range_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # Regroup-free formulation: no generated row id (was nondeterministic
    # under stage retry) — band counting happens in a projection over the
    # per-bucket arrays, not a post-join re-aggregation.
    assert "monotonically" not in plan


def test_new_relational_plans_stay_jvm_side(spark):
    for name in (
        "q_semi_anti_join",
        "q_set_ops",
        "q_conditional_agg",
        "q_date_agg",
        "q_asof_join",
        "q_range_join",
        # second extension wave
        "q_outer_join",
        "q_distinct_agg",
        "q_stats_agg",
        "q_window_funcs",
        "q_pivot",
        "q_grouping_sets",
        "q_string_funcs",
        "q_array_funcs",
        "q_json_funcs",
        "q_scalar_subquery",
        "q_simhash64_neardup_capped",
    ):
        plan = plan_of(spark, name)
        assert "BatchEvalPython" not in plan, name
        assert "PythonUDF" not in plan, name


def test_simhash64_single_scan_no_shuffle(spark):
    """The 64-bit fingerprint is a pure per-row projection: one parquet
    scan, zero exchanges — the shape that lets it run scan-side over
    100 TB with no data movement at all. (q_simhash64 rotated to the
    test registry in r10 — subsumed by q_simhash64_neardup_capped, which
    consumes these fingerprints — so the gate builds it directly.)"""
    from streamy_db_spark.operators.minhash import q_simhash64

    plan = inspect.executed_plan(q_simhash64(spark, SF))
    assert plan.count("Scan parquet") == 1
    assert "Exchange" not in plan


def test_simhash64_capped_pairs_stays_hash_joined(spark):
    """The hot-bucket-capped SimHash candidate path (the driver's
    near-dup evidence since r10) must keep every join hash-keyed on
    (band, val) — no nested-loop fallback from the size/rep tagging or
    the fingerprint verify joins — and stay fully JVM-side."""
    plan = plan_of(spark, "q_simhash64_neardup_capped")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan


def test_scalar_subquery_broadcasts_aggregate(spark):
    # The 1-row global aggregate must reach the fact side as a broadcast,
    # never a shuffle of the fact table against it.
    plan = plan_of(spark, "q_scalar_subquery")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_window_funcs_single_shuffle(spark):
    # All five window functions share one (partition, order) spec → one
    # Exchange + one Window node chain, not one shuffle per function.
    plan = plan_of(spark, "q_window_funcs")
    assert plan.count("Exchange hashpartitioning(o_custkey") == 1


def test_pivot_single_aggregate_pass(spark):
    # Enumerated pivot values plan as ONE aggregate over the scan (no
    # join-per-value, no repeated scans).
    plan = plan_of(spark, "q_pivot")
    assert plan.count("Scan parquet") == 1


def test_grouping_sets_single_scan(spark):
    plan = plan_of(spark, "q_grouping_sets")
    assert "Expand" in plan
    assert plan.count("Scan parquet") == 1


def test_train_test_split_scan_side_assignment(spark):
    """Split labels are a pure scan-side projection; the ONLY exchange
    is the stats groupBy — membership assignment itself moves no data
    (the property that lets it run over 100 TB as part of any scan)."""
    plan = plan_of(spark, "q_train_test_split")
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange") == 1


def test_profile_single_scan(spark):
    """Every column's stats come from ONE scan — the whole point of the
    wide-aggregate + stack formulation (a per-column loop would rescan
    the table per column)."""
    plan = plan_of(spark, "q_profile_orders")
    assert plan.count("Scan parquet") == 1


def test_pack_sequences_no_global_sort(spark):
    """Packing must never range-partition/sort the corpus globally —
    one shard-keyed window exchange only (the 100 TB-viable shape)."""
    plan = plan_of(spark, "q_pack_sequences")
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange") == 1
    assert "rangepartitioning" not in plan


def test_capped_pairs_stays_hash_joined(spark):
    """The hot-bucket-capped candidate path must keep every join
    hash-keyed on (band, band_hash) — no nested-loop fallback from the
    size/rep tagging — and stay fully JVM-side."""
    plan = plan_of(spark, "q_minhash_lsh_pairs_capped")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan


def test_no_python_udf_in_relational_plans(spark):
    """Relational/text/dedup-exact queries must stay JVM-side; Python may
    appear only in the declared Arrow-batched operators (media, ANN)."""
    for name in (
        "q_agg_tpch_pricing",
        "q_join_3way",
        "q_decontaminate",
        "q_merge_upsert",
        "q_text_analysis",
        "q_dedup_exact",
        "q_minhash_lsh_pairs_capped",
        "q_embedding_knn",
    ):
        plan = plan_of(spark, name)
        assert "BatchEvalPython" not in plan, name  # row-at-a-time Python
        assert "PythonUDF" not in plan, name


def test_mixture_sample_plan_shape(spark):
    """Mixture rebalancing must broadcast the source-cardinality stats
    back to the scan (never shuffle the corpus against them) and keep
    every join hash-equi — the scan-side-filter shape that works at
    100 TB."""
    from streamy_db_spark.operators.sampling import q_mixture_sample
    from streamy_db_spark.plans import inspect

    plan = inspect.executed_plan(q_mixture_sample(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan


def test_dedupe_exact_never_shuffles_text(spark):
    """r13 drop-id discipline: exact dedup resolves keepers on the
    narrow (fingerprint, id) projection and applies them to the docs
    frame as a loser-id ANTI-join that AQE broadcasts — so in the
    final plan (a) the text-bearing frame meets its verdict through a
    broadcast LeftAnti join, and (b) no shuffle Exchange's INPUT list
    (formatted plan — Exchange plan-string lines print only keys, so
    checking them is vacuous; r13 review) carries the text column.
    The pre-r13 keeper INNER-join fails (a) outright, and any
    re-introduced corpus-wide text shuffle (distinct/repartition/SMJ
    over the full frame) fails (b)."""
    from streamy_db_spark.operators.dedup import dedupe_exact
    from streamy_db_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "source", "text"
    )
    out = dedupe_exact(docs)
    out.collect()  # let AQE finalize the join strategies
    plan = inspect.executed_plan(out)
    assert "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    for inp in inspect.shuffle_exchange_inputs(out):
        assert "text#" not in inp, inp


def test_semantic_dedup_pair_join_broadcasts(spark):
    """r13: the exact twin's same-cluster pair join must be a broadcast
    hash join — cluster_id has only K distinct values, so a shuffled
    join on it is K-way skewed by construction — and the assignment
    subtree is materialized once (the result plan reads the checkpoint,
    not three clones of the crossJoin+argmax chain)."""
    plan = plan_of(spark, "q_semantic_dedup")
    assert "SortMergeJoin" not in plan
    assert "Scan ExistingRDD" in plan  # the one materialized assignment


def test_stats_agg_single_percentile_buffer(spark):
    """r13: median and p90 come from ONE array-form percentile
    aggregate (its buffer holds every group value, so two scalar calls
    doubled the heaviest buffer and its exchange)."""
    plan = plan_of(spark, "q_stats_agg")
    # one buffer = exactly two mentions (partial + final agg of the one
    # array-form aggregate); the two-scalar-call form showed four
    assert plan.count("percentile(l_extendedprice") == 2


def test_partition_preserving_checkpoint_skips_exchange_and_sort(spark):
    """r13: an eager localCheckpoint created inside
    partition_preserving_checkpoints() (AQE off at creation only) must
    advertise its hash partitioning AND sort order, so a downstream
    window over the same key — planned with the session's AQE back on —
    needs zero Exchange and zero Sort. This is the mechanism behind the
    replay loop's shuffle-free waves (engine_batch.replay)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from streamy_db_spark.session import (
        partition_preserving_checkpoints,
        release_local_checkpoints,
    )

    df = spark.range(5000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("v")
    )
    w = Window.partitionBy("k").orderBy("v")
    first = df.select("*", F.row_number().over(w).alias("r"))
    with partition_preserving_checkpoints(spark):
        ck = first.localCheckpoint(eager=True)
    # the scope restored the session's AQE setting
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    second = ck.select("*", F.sum("v").over(w).alias("s"))
    plan = second._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Sort " not in plan, plan
    release_local_checkpoints(ck)


def test_replay_decision_join_merge_joins_sorted_checkpoint(spark):
    """r13: the replay's per-round decision gate joins the log-sized
    n_asserts table EVERY round. It must NOT re-broadcast it per round
    (driver collect + cluster ship per wave, 8 GB/512M-row ceiling at
    10M+ txns): n_asserts is checkpointed hash-partitioned AND sorted
    by transaction_id (engine_batch._replay_impl), so the decision join
    plans as a SortMergeJoin whose only Exchange and Sort sit on the
    shrinking observable-reads aggregate side. Built from the engine's
    own ops/n_asserts construction (fixtures carry the unknown-size
    stats the real log has — toy range sources would get broadcast by
    size and gate nothing)."""
    from pyspark.sql import functions as F

    from streamy_db_spark import engine_batch, fixtures
    from streamy_db_spark.session import (
        partition_preserving_checkpoints,
        release_local_checkpoints,
    )

    txns = fixtures.generate_df(spark, "conflict_heavy")
    ops = engine_batch._build_ops(txns, None)
    with partition_preserving_checkpoints(spark):
        ops_ck = ops.localCheckpoint(eager=True)
        n_asserts = (
            ops_ck.filter(F.col("kind") == engine_batch.KIND_READ)
            .groupBy("transaction_id")
            .agg(F.count("*").alias("n_asserts"))
            .sortWithinPartitions("transaction_id")
            .localCheckpoint(eager=True)
        )
    agg = (
        ops_ck.filter(F.col("kind") == engine_batch.KIND_READ)
        .groupBy("transaction_id")
        .agg(
            F.count("*").alias("n_obs"),
            F.bool_and(F.expr("expected <=> wvalue")).alias("ok"),
        )
    )
    newly = agg.join(n_asserts, "transaction_id").filter(
        (F.col("n_obs") == F.col("n_asserts")) | (~F.col("ok"))
    )
    plan = newly._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan
    # only the aggregate side shuffles and sorts; the checkpoint's
    # advertised layout is reused as-is
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Sort ") == 1, plan
    release_local_checkpoints(n_asserts)
    release_local_checkpoints(ops_ck)
