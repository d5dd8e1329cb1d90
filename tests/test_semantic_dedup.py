"""SemDeDup-style semantic dedup (operators/dedup.py): the production
pandas path must equal the JVM exact twin (which the DuckDB oracle gate
hash-checks via q_semantic_dedup in test_oracle_queries.py), the keep
rule must behave on planted geometry, and the plan must be the one-shuffle
shape that makes it 100 TB-viable."""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import functions as F

from streamy_db_spark.operators import dedup
from streamy_db_spark.plans import inspect
from streamy_db_spark.sources.tables import load_table

SF_SMALL = "/root/testdata/sf0.001"


def _seed_matrix(spark, sf_dir: str, k: int = dedup.SEMANTIC_SEED_K):
    emb = load_table(spark, sf_dir, "embeddings")
    rows = (
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .orderBy("vec_id")
        .limit(k)
        .collect()
    )
    return np.stack([np.asarray(r["e"], dtype=np.float64) for r in rows])


def test_pandas_path_matches_exact_twin(spark, sf_oracle):
    """Same centroids → the Arrow production path and the JVM oracle twin
    must agree row-for-row (assignment tie-break and drop rule included)."""
    emb = load_table(spark, sf_oracle, "embeddings")
    centroids = _seed_matrix(spark, sf_oracle)
    got = sorted(
        dedup.semantic_dedup(
            emb, centroids, threshold=dedup.ORACLE_SEMANTIC_COS
        ).collect()
    )
    want = sorted(
        dedup.semantic_dedup_exact(
            emb, dedup.seed_centroids(emb), threshold=dedup.ORACLE_SEMANTIC_COS
        ).collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert any(not r["keep"] for r in got)  # threshold chosen non-vacuous


def test_zero_norm_vector_parity(spark):
    """Degenerate all-zeros embedding: the pandas path clamps zero norms
    to 1 (cosine 0 everywhere), and since r10 the JVM exact twin mirrors
    that (r9 ADVICE: it used to divide by zero — NULL cosine, different
    assignment fall-through). All three must agree: the zero vector is
    kept (cosine 0 < any real threshold), never blocks anything, and the
    two engines match row-for-row."""
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.96, 0.28, 0.0]),   # cos vs id 1 ≈ 0.96 → dropped
        (3, [0.0, 0.0, 0.0]),     # zero vector
        (10, [0.0, 0.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centroids = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    got = sorted(
        dedup.semantic_dedup(emb, centroids, threshold=0.9).collect()
    )
    seeds = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 0.0, 1.0])],
        "cluster_id int, cvec array<double>",
    )
    want = sorted(
        dedup.semantic_dedup_exact(emb, seeds, threshold=0.9).collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    keep = {r["vec_id"]: r["keep"] for r in got}
    assert keep == {1: True, 2: False, 3: True, 10: True}


def _planted(spark):
    """Four docs in two clusters: a 0°/25°/50° chain in the xy-plane
    (cluster 0: x-axis centroid) and one singleton near the z-axis
    (cluster 1). cos(25°)≈0.906 clears the 0.9 bar; cos(50°)≈0.643
    does not."""
    def at(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r), 0.0]

    rows = [
        (1, at(0.0)),
        (2, at(25.0)),
        (3, at(50.0)),
        (10, [0.0, 0.1, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centroids = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    return emb, centroids


def test_planted_chain_keeps_lowest_id_only(spark):
    """Drop rule is 'some lower-id same-cluster doc >= threshold': on the
    a–b–c chain both b (via a) and c (via b) drop even though cos(a,c) is
    below the bar — the documented conservative over-removal — and the
    other cluster's singleton keeps itself."""
    emb, centroids = _planted(spark)
    out = {
        r["vec_id"]: (r["cluster_id"], r["keep"])
        for r in dedup.semantic_dedup(emb, centroids, threshold=0.9).collect()
    }
    assert out == {1: (0, True), 2: (0, False), 3: (0, False), 10: (1, True)}


def test_greedy_readmits_chain_tail(spark):
    """greedy=True is the kept-set rule: on the a–b–c chain, c's only
    blocker b was itself dropped, so c is KEPT — the batch reference
    semantics IncrementalSemanticDeduper reproduces across batches."""
    emb, centroids = _planted(spark)
    out = {
        r["vec_id"]: r["keep"]
        for r in dedup.semantic_dedup(
            emb, centroids, threshold=0.9, greedy=True
        ).collect()
    }
    assert out == {1: True, 2: False, 3: True, 10: True}


def test_threshold_extremes(spark):
    """threshold above any cosine keeps everything; threshold below any
    cosine keeps exactly the min id per cluster."""
    emb, centroids = _planted(spark)
    all_keep = dedup.semantic_dedup(emb, centroids, threshold=1.1).collect()
    assert all(r["keep"] for r in all_keep) and len(all_keep) == 4
    floor = dedup.semantic_dedup(emb, centroids, threshold=-1.0).collect()
    keepers = sorted(r["vec_id"] for r in floor if r["keep"])
    assert keepers == [1, 10]


def test_plan_is_single_shuffle_arrow(spark):
    """100 TB shape: centroid assignment is map-side (Arrow UDF, no join,
    no exchange); the ONLY Exchange is the groupBy(cluster_id) feeding the
    per-cluster scorer; no row-at-a-time Python anywhere."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    centroids = _seed_matrix(spark, SF_SMALL)
    plan = inspect.executed_plan(dedup.semantic_dedup(emb, centroids))
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(cluster_id" in plan
    assert "FlatMapGroupsInPandas" in plan
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_semantic_cluster_count_sizing():
    """The K ∝ N production sizing rule (BASELINE §8 sf1 probe: a
    pinned K is the pipeline's one super-linear scaler). Properties:
    ceil(N/B) above the floor, floored at SEMANTIC_SEED_K, capped at N,
    and the implied per-cluster block never exceeds the target once N
    clears the floor region."""
    B = dedup.SEMANTIC_TARGET_BLOCK
    K0 = dedup.SEMANTIC_SEED_K
    # floor region: tiny corpora get the seed K (capped at N)
    assert dedup.semantic_cluster_count(5) == 5
    assert dedup.semantic_cluster_count(K0) == K0
    assert dedup.semantic_cluster_count(B * K0 // 2) == K0
    # proportional region: exact ceil division
    assert dedup.semantic_cluster_count(B * 1000) == 1000
    assert dedup.semantic_cluster_count(B * 1000 + 1) == 1001
    # the sf1 probe's numbers: 100k docs → K ≈ 391 (vs the pinned 32
    # that scaled 11.8×); block size stays ≤ B
    for n in (10_000, 100_000, 1_000_000):
        k = dedup.semantic_cluster_count(n)
        assert n / k <= B
        # K ∝ N: doubling the corpus ~doubles K (within ceil slack)
        assert abs(dedup.semantic_cluster_count(2 * n) - 2 * k) <= 1
    # degenerate input falls back to the floor, never 0
    assert dedup.semantic_cluster_count(0) == K0
