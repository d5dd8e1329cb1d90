"""Unit tests for the generic as-of / range-join operators on planted
data (the oracle tests cover the registered event-log queries; these pin
the edge semantics: no-match NULLs, inclusive bounds, tolerance)."""

from __future__ import annotations

from streamy_db_spark.operators.temporal import asof_join, range_join_count


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_basic_and_no_match(spark):
    left = _df(
        spark,
        [(1, "k", 100), (2, "k", 50), (3, "k", 15), (4, "other", 100), (5, "k", 5)],
        "id long, k string, ts long",
    )
    right = _df(
        spark,
        [("k", 10, "a"), ("k", 50, "b"), ("k", 99, "c")],
        "k string, rts long, v string",
    )
    out = {
        r["id"]: (r["asof_ts"], r["asof_v"])
        for r in asof_join(
            left, right, key="k", left_ts="ts", right_ts="rts", right_cols=["v"]
        ).collect()
    }
    assert out[1] == (99, "c")
    assert out[2] == (50, "b"), "equal timestamp must match (inclusive bound)"
    assert out[3] == (10, "a")
    assert out[4] == (None, None), "unmatched key keeps NULLs"
    assert out[5] == (None, None), "left row before all right rows keeps NULLs"


def test_asof_tolerance(spark):
    left = _df(spark, [(1, "k", 100)], "id long, k string, ts long")
    right = _df(spark, [("k", 10, "a")], "k string, rts long, v string")
    near = asof_join(
        left, right, "k", "ts", "rts", ["v"], tolerance_ns=200
    ).collect()[0]
    far = asof_join(
        left, right, "k", "ts", "rts", ["v"], tolerance_ns=50
    ).collect()[0]
    assert (near["asof_ts"], near["asof_v"]) == (10, "a")
    assert (far["asof_ts"], far["asof_v"]) == (None, None)


def test_range_join_count_band_edges(spark):
    left = _df(spark, [(1, "k", 1000)], "id long, k string, ts long")
    right = _df(
        spark,
        # dt = 1000 - rts: 1000 (excluded: == band), 999, 0 (included), -1 (future)
        [("k", 0), ("k", 1), ("k", 1000), ("k", 1001)],
        "k string, rts long",
    )
    out = range_join_count(
        left, right, key="k", left_ts="ts", right_ts="rts", band_ns=1000
    ).collect()
    assert out[0]["n_in_band"] == 2  # rts=1 (dt=999) and rts=1000 (dt=0)


def test_range_join_duplicate_left_rows_kept(spark):
    # Two byte-identical left rows must come back as two result rows
    # (row identity, not column values, keys the post-explode regroup).
    left = _df(
        spark,
        [(1, "k", 1000), (1, "k", 1000), (2, "k", 5)],
        "id long, k string, ts long",
    )
    right = _df(spark, [("k", 500)], "k string, rts long")
    rows = range_join_count(
        left, right, key="k", left_ts="ts", right_ts="rts", band_ns=1000
    ).collect()
    assert len(rows) == 3
    counts = sorted((r["id"], r["n_in_band"]) for r in rows)
    assert counts == [(1, 1), (1, 1), (2, 0)]


def test_asof_join_matches_bruteforce_random(spark):
    """Randomized cross-check of the window-carry formulation against a
    pure-Python argmax over right_ts <= left_ts (unique (key, rts) per
    the operator contract)."""
    import random

    rng = random.Random(424242)
    keys = ["a", "b", "c", "d"]
    left = [(i, rng.choice(keys), rng.randint(-200, 200)) for i in range(150)]
    right_map = {}
    for _ in range(200):
        right_map[(rng.choice(keys), rng.randint(-200, 200))] = None
    right = [(k, t, f"v{k}{t}") for (k, t) in sorted(right_map)]

    def brute(k, t):
        cand = [(rt, v) for rk, rt, v in right if rk == k and rt <= t]
        return max(cand) if cand else (None, None)

    expect = {i: brute(k, t) for i, k, t in left}
    out = {
        r["id"]: (r["asof_ts"], r["asof_v"])
        for r in asof_join(
            _df(spark, left, "id long, k string, ts long"),
            _df(spark, right, "k string, rts long, v string"),
            key="k",
            left_ts="ts",
            right_ts="rts",
            right_cols=["v"],
        ).collect()
    }
    assert out == expect


def test_range_join_matches_bruteforce_random(spark):
    """Randomized cross-check of the bucketed formulation against a pure
    Python O(L×R) count — seeds span bucket boundaries, duplicate keys,
    and negative timestamps (div semantics)."""
    import random

    rng = random.Random(20260813)
    band = 100
    keys = ["a", "b", "c"]
    left = [
        (i, rng.choice(keys), rng.randint(-250, 250)) for i in range(120)
    ]
    right = [(rng.choice(keys), rng.randint(-250, 250)) for _ in range(300)]
    expect = {
        i: sum(
            1 for rk, rt in right if rk == k and 0 <= t - rt < band
        )
        for i, k, t in left
    }
    out = {
        r["id"]: r["n"]
        for r in range_join_count(
            _df(spark, left, "id long, k string, ts long"),
            _df(spark, right, "k string, rts long"),
            "k",
            "ts",
            "rts",
            band,
            count_alias="n",
        ).collect()
    }
    assert out == expect


def test_range_join_zero_matches_kept(spark):
    left = _df(spark, [(1, "k", 1000), (2, "x", 5)], "id long, k string, ts long")
    right = _df(spark, [("k", 10_000)], "k string, rts long")
    rows = {
        r["id"]: r["n"]
        for r in range_join_count(
            left, right, "k", "ts", "rts", 100, count_alias="n"
        ).collect()
    }
    assert rows == {1: 0, 2: 0}


def test_range_join_zero_matches_ansi_off(spark):
    """Regression (r4 ADVICE): under spark.sql.ansi.enabled=false
    size(NULL) is -1, not NULL — zero-count rows must still report 0."""
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        left = _df(
            spark, [(1, "k", 1000), (2, "x", 5)], "id long, k string, ts long"
        )
        right = _df(spark, [("k", 10_000)], "k string, rts long")
        rows = {
            r["id"]: r["n"]
            for r in range_join_count(
                left, right, "k", "ts", "rts", 100, count_alias="n"
            ).collect()
        }
        assert rows == {1: 0, 2: 0}
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_asof_join_rejects_colliding_columns(spark):
    """Input-contract violations raise ValueError (survives python -O),
    including collisions with the asof_* OUTPUT names."""
    import pytest

    right = _df(spark, [("k", 1, "a")], "k string, rts long, v string")
    for bad_col in ("asof_ts", "asof_v", "_side"):
        left = _df(
            spark, [(1, "k", 10, "x")], f"id long, k string, ts long, `{bad_col}` string"
        )
        with pytest.raises(ValueError, match="collide"):
            asof_join(
                left, right, key="k", left_ts="ts", right_ts="rts",
                right_cols=["v"],
            )


def test_range_join_rejects_colliding_count_alias(spark):
    import pytest

    left = _df(spark, [(1, "k", 10)], "n long, k string, ts long")
    right = _df(spark, [("k", 1)], "k string, rts long")
    with pytest.raises(ValueError, match="collides"):
        range_join_count(left, right, "k", "ts", "rts", 100, count_alias="n")
