"""merge_upsert unit semantics (the sf0.01 DuckDB hash-match runs via
test_oracle_queries' test-only registry)."""

from __future__ import annotations

import pytest

from streamy_db_spark.operators.merge import merge_upsert


def _t(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, price double",
    )


def test_update_insert_delete(spark):
    changes = spark.createDataFrame(
        [
            (2, "b2", 25.0, False),  # update
            (4, "d", 40.0, False),  # insert
            (3, "c", 30.0, True),  # delete
        ],
        "k long, name string, price double, is_delete boolean",
    )
    got = sorted(
        (r.k, r.name, r.price)
        for r in merge_upsert(_t(spark), changes, "k", delete_col="is_delete").collect()
    )
    assert got == [(1, "a", 10.0), (2, "b2", 25.0), (4, "d", 40.0)]


def test_upsert_without_delete_col(spark):
    changes = spark.createDataFrame(
        [(1, "a1", 11.0), (9, "i", 90.0)], "k long, name string, price double"
    )
    got = sorted(
        (r.k, r.name, r.price)
        for r in merge_upsert(_t(spark), changes, "k").collect()
    )
    assert got == [(1, "a1", 11.0), (2, "b", 20.0), (3, "c", 30.0), (9, "i", 90.0)]


def test_missing_column_rejected(spark):
    changes = spark.createDataFrame([(1, "x")], "k long, name string")
    with pytest.raises(ValueError, match="missing target columns"):
        merge_upsert(_t(spark), changes, "k")


def test_delete_of_absent_key_is_noop(spark):
    changes = spark.createDataFrame(
        [(42, "zz", 0.0, True)], "k long, name string, price double, is_delete boolean"
    )
    got = merge_upsert(_t(spark), changes, "k", delete_col="is_delete")
    assert got.count() == 3


def test_merge_matches_dict_model_on_random_feeds(spark):
    """Randomized (seeded) change feeds vs a dict-based model: apply 3
    successive merges and compare the surviving snapshot each round."""
    import random

    rng = random.Random(99)
    snap = {k: (f"n{k}", float(k)) for k in range(20)}
    df = spark.createDataFrame(
        [(k, n, p) for k, (n, p) in snap.items()],
        "k long, name string, price double",
    )
    for rnd in range(3):
        keys = rng.sample(range(30), 8)
        feed = [
            (k, f"r{rnd}k{k}", float(rnd * 100 + k), rng.random() < 0.3)
            for k in keys
        ]
        fdf = spark.createDataFrame(
            feed, "k long, name string, price double, is_delete boolean"
        )
        df = merge_upsert(df, fdf, "k", delete_col="is_delete")
        for k, n, p, dele in feed:
            if dele:
                snap.pop(k, None)
            else:
                snap[k] = (n, p)
        got = {r.k: (r.name, r.price) for r in df.collect()}
        assert got == snap, f"round {rnd}"
