"""Unit semantics of bench.py's noise-normalized budget gate — no Spark
session needed (pure arithmetic; the gate protects every future round's
regression signal, so it gets its own tests)."""

from __future__ import annotations

from bench import budget_breaches

BUDGETS = {"a": 2.0, "b": 4.0, "c": 1.0, "d": 10.0}


def test_fast_machine_no_breach():
    # everything at ~half budget (the normal case): slowdown clamps to 1
    slow, br = budget_breaches({"a": 1.0, "b": 2.0, "c": 0.4, "d": 5.0}, BUDGETS)
    assert slow == 1.0 and br == {}


def test_isolated_regression_trips_on_fast_machine():
    slow, br = budget_breaches({"a": 1.0, "b": 9.0, "c": 0.4, "d": 5.0}, BUDGETS)
    assert slow == 1.0
    assert set(br) == {"b"}
    assert br["b"]["effective_budget"] == 4.0


def test_global_noise_does_not_trip():
    # machine uniformly 3x slower than baseline (= 1.5x budgets):
    # every query exceeds its raw budget, none is a real regression
    timings = {k: v * 1.5 for k, v in BUDGETS.items()}
    slow, br = budget_breaches(timings, BUDGETS)
    assert slow == 3.0
    assert br == {}


def test_regression_still_trips_under_global_noise():
    timings = {k: v * 1.5 for k, v in BUDGETS.items()}
    timings["d"] = BUDGETS["d"] * 4  # genuinely 8x baseline
    slow, br = budget_breaches(timings, BUDGETS)
    assert set(br) == {"d"}
    assert br["d"]["effective_budget"] == BUDGETS["d"] * slow


def test_unknown_queries_are_ignored():
    slow, br = budget_breaches({"new_query": 99.0}, BUDGETS)
    assert slow == 1.0 and br == {}
