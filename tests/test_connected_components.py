"""Direct tests for the min-label connected-components operator (the
oracle test covers it only on the shallow near-dup graph at sf0.01;
these pin deep-chain convergence and the non-convergence guard)."""

from __future__ import annotations

import pytest

from streamy_db_spark.operators.dedup import connected_components


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def test_path_graph_converges_to_min(spark):
    # 0-1-2-...-9 : worst diameter for its size; every node → keeper 0
    pairs = _pairs(spark, [(i, i + 1) for i in range(9)])
    out = {r["node"]: r["keeper"] for r in connected_components(pairs, driver_fold_max_rows=0).collect()}
    assert out == {i: 0 for i in range(10)}


def test_multiple_components(spark):
    pairs = _pairs(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 20)])
    out = {r["node"]: r["keeper"] for r in connected_components(pairs, driver_fold_max_rows=0).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_pointer_doubling_collapses_deep_chain(spark):
    """A 24-node path (diameter 23) converges within ~log2(d)+2 rounds
    under shortcut=True — and the SAME cap raises without it."""
    pairs = _pairs(spark, [(i, i + 1) for i in range(23)])
    out = {
        r["node"]: r["keeper"]
        for r in connected_components(pairs, max_iters=8, shortcut=True, driver_fold_max_rows=0).collect()
    }
    assert out == {i: 0 for i in range(24)}
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iters=8, driver_fold_max_rows=0)


def test_nonconvergence_raises_not_silently_wrong(spark):
    # Diameter 9 cannot converge in 2 rounds (init counts as one hop);
    # the operator must refuse rather than return partial labels.
    pairs = _pairs(spark, [(i, i + 1) for i in range(9)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iters=2, driver_fold_max_rows=0)


def test_driver_fold_matches_distributed(spark):
    """The adaptive driver union-find (default for pair sets under the
    row budget) must produce byte-identical components to the
    distributed min-label propagation on a random graph."""
    import random

    rng = random.Random(20260813)
    edges = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = _pairs(spark, edges)
    driver = {
        (r["node"], r["keeper"])
        for r in connected_components(pairs).collect()
    }
    dist = {
        (r["node"], r["keeper"])
        for r in connected_components(
            pairs, shortcut=True, driver_fold_max_rows=0
        ).collect()
    }
    assert driver == dist


def test_driver_fold_deep_chain_no_iteration_cap(spark):
    """Union-find has no diameter limit: a 500-node path resolves in one
    driver pass (the distributed path would need 500 rounds or pointer
    doubling)."""
    pairs = _pairs(spark, [(i, i + 1) for i in range(499)])
    out = {r["node"]: r["keeper"] for r in connected_components(pairs).collect()}
    assert out == {i: 0 for i in range(500)}
