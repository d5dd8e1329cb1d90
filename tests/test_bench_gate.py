"""Unit semantics of bench.py's noise-normalized budget gate — no Spark
session needed (pure arithmetic; the gate protects every future round's
regression signal, so it gets its own tests).

r6 gate shape: median-slowdown normalization for UNIFORM noise (now
capped at 3x and only active with >= min_ratios checked queries), plus
a one-shot retry of every breaching query judged on min(first, retry)
for BURSTY noise — the r5 failure mode where a noise window covering a
contiguous block of the run left the median clean while healthy queries
breached.
"""

from __future__ import annotations

from bench import budget_breaches, retry_breaches

BUDGETS = {"a": 2.0, "b": 4.0, "c": 1.0, "d": 10.0}
# a wider registry for the scaling/retry tests (scaling requires
# min_ratios measurements so one slow query can't scale its own budget)
WIDE = {f"q{i:02d}": float(2 + i % 5) for i in range(16)}


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
    timings = {k: v * 1.5 for k, v in WIDE.items()}
    slow, br = budget_breaches(timings, WIDE)
    assert slow == 3.0
    assert br == {}


def test_regression_still_trips_under_global_noise():
    timings = {k: v * 1.5 for k, v in WIDE.items()}
    timings["q00"] = WIDE["q00"] * 4  # genuinely 8x baseline
    slow, br = budget_breaches(timings, WIDE)
    assert set(br) == {"q00"}
    assert br["q00"]["effective_budget"] == WIDE["q00"] * slow


def test_unknown_queries_are_ignored():
    slow, br = budget_breaches({"new_query": 99.0}, BUDGETS)
    assert slow == 1.0 and br == {}


def test_slowdown_capped_at_3x():
    # a correlated REAL regression slowing the whole registry 10x must
    # not be normalized away as machine noise: the scale caps at 3x and
    # every query breaches (r5 advice)
    timings = {k: v * 5.0 for k, v in WIDE.items()}  # 10x baseline
    slow, br = budget_breaches(timings, WIDE)
    assert slow == 3.0
    assert set(br) == set(WIDE)


def test_no_scaling_with_few_queries():
    # with fewer than min_ratios measurements a single slow query must
    # not scale its own budget out of reach (r5 advice)
    slow, br = budget_breaches({"a": 9.0}, BUDGETS)
    assert slow == 1.0
    assert set(br) == {"a"}


# ---------------------------------------------------------------- retry


def test_retry_clears_contiguous_noise_window():
    # r5 failure mode: a noise burst covers a contiguous block of the
    # alphabetical sweep; the median stays clean (slowdown 1.0) and the
    # block breaches. The retry runs after the burst passes and comes
    # back at steady-state speed — the gate must go green.
    steady = {k: v * 0.45 for k, v in WIDE.items()}
    timings = dict(steady)
    for name in ["q03", "q04", "q05", "q06"]:  # the noise window
        timings[name] = WIDE[name] * 4.0
    slow, br, retried = retry_breaches(
        timings, WIDE, rerun=lambda name: steady[name]
    )
    assert br == {}
    assert set(retried) == {"q03", "q04", "q05", "q06"}
    for name, rec in retried.items():
        assert rec["retry"] == steady[name]
        assert timings[name] == steady[name]  # headline uses the min


def test_retry_does_not_mask_genuine_regression():
    # a real 3x single-query plan regression reproduces on the retry
    # and must still fail the gate
    timings = {k: v * 0.45 for k, v in WIDE.items()}
    timings["q07"] = WIDE["q07"] * 3.0
    slow, br, retried = retry_breaches(
        timings, WIDE, rerun=lambda name: WIDE[name] * 3.1
    )
    assert set(br) == {"q07"}
    assert retried["q07"]["first"] == WIDE["q07"] * 3.0
    # min(first, retry) is what got judged
    assert timings["q07"] == WIDE["q07"] * 3.0


def test_retry_unrunnable_query_keeps_first_timing():
    # rerun returning None (query not re-executable) keeps the first
    # measurement and the breach stands — no silent pass
    timings = {k: v * 0.45 for k, v in WIDE.items()}
    timings["q09"] = WIDE["q09"] * 5.0
    slow, br, retried = retry_breaches(timings, WIDE, rerun=lambda name: None)
    assert set(br) == {"q09"}
    assert retried == {}


def test_retry_only_reruns_breaching_queries():
    calls = []

    def rerun(name):
        calls.append(name)
        return 0.1

    timings = {k: v * 0.45 for k, v in WIDE.items()}
    timings["q01"] = WIDE["q01"] * 4.0
    retry_breaches(timings, WIDE, rerun=rerun)
    assert calls == ["q01"]


def test_slowdown_drop_after_retry_offers_retry_to_newly_exposed():
    """Writing retry minima back lowers the recomputed machine_slowdown,
    which can expose queries that passed the first gate only under the
    inflated scale. The fixpoint loop must give THOSE a retry too — a
    noise-inflated one clears, so no spurious failure appears without a
    retry (r6 review, direction 1)."""
    steady = {k: v * 0.45 for k, v in WIDE.items()}
    timings = dict(steady)
    inflated = sorted(WIDE)[:8]
    for name in inflated:
        timings[name] = WIDE[name] * 3.5  # breach even at the 3x cap
    borderline = sorted(WIDE)[10]
    timings[borderline] = WIDE[borderline] * 1.5  # passes at slowdown 3

    slow1, br1 = budget_breaches(timings, WIDE)
    assert slow1 == 3.0 and borderline not in br1
    assert set(br1) == set(inflated)

    slow, br, retried = retry_breaches(
        timings, WIDE, rerun=lambda name: steady[name]
    )
    # the borderline query was exposed by the slowdown drop, offered a
    # retry in the second iteration, and cleared — no false failure
    assert borderline in retried
    assert set(retried) == set(inflated) | {borderline}
    assert slow == 1.0
    assert br == {}


def test_fixpoint_catches_regression_hidden_under_noise_umbrella():
    """A genuinely regressed query that passed the first gate only
    because other queries' noise inflated machine_slowdown must still
    FAIL once the noise clears — the fixpoint retries it and the
    regression reproduces (r6 review, direction 2)."""
    steady = {k: v * 0.45 for k, v in WIDE.items()}
    timings = dict(steady)
    inflated = sorted(WIDE)[:8]
    for name in inflated:
        timings[name] = WIDE[name] * 3.5
    hidden = sorted(WIDE)[10]
    timings[hidden] = WIDE[hidden] * 2.5  # real regression, under 3x cap

    def rerun(name):
        if name == hidden:
            return WIDE[name] * 2.6  # reproduces: genuinely slow
        return steady[name]  # noise clears

    slow, br, retried = retry_breaches(timings, WIDE, rerun=rerun)
    assert hidden in retried  # it was offered its retry
    assert set(br) == {hidden}  # and persisted across it


# ------------------------------------------------- r8: tightened budgets


def test_r7_driver_timings_pass_but_3x_replay_regression_fails():
    """The replay budgets must be tight enough to catch a real 2.5-3x
    regression (r6/r7 verdict item: the old 60 s / 220 s budgets passed
    one). Ground truth for 100k: the r7 driver record passes as-is and
    fails at 3x. The 1M entry's basis changed in r10 to the PINNED
    session-cold context (the r7 record's in-sweep warm number is no
    longer the measured quantity), so its ground truth is the cold
    band — re-pinned r11 to the r10 measured band 77.2-108.7 s
    (BASELINE.md §6; r10 verdict item 2: the 600 s budget pinned to
    the PRE-r10 294.9-301.1 s band would pass a 5x regression): the
    band passes, 3x the band fails."""
    import json
    from pathlib import Path

    from bench import BUDGETS

    rec = json.loads(
        (Path(__file__).parent.parent / "BENCH_r07.json").read_text()
    )
    rec = rec.get("parsed", rec)  # driver wraps the JSON line in metadata
    checked = dict(rec["queries"])
    checked["protocol_replay_100k"] = rec["protocol_replay_100k_seconds"]
    checked["protocol_replay_1m"] = 108.7  # slow end of the r10 cold band

    slow, br = budget_breaches(checked, BUDGETS)
    assert br == {}, f"clean record must pass the current budgets: {br}"

    regressed = dict(checked)
    for label in ("protocol_replay_100k", "protocol_replay_1m"):
        regressed[label] = checked[label] * 3.0
    slow, br = budget_breaches(regressed, BUDGETS)
    assert {"protocol_replay_100k", "protocol_replay_1m"} <= set(br)


def test_floored_budgets_excluded_from_slowdown_median():
    """Sub-second queries carry a 1.0 s noise-floor budget, not 2x a
    baseline; including their ratios biases the machine-slowdown median
    LOW so uniform real noise under-corrects (r7 verdict item 2). The
    median must come from the >1.0 s budgets only — but floored queries
    stay subject to the breach check itself."""
    budgets = {f"f{i}": 1.0 for i in range(8)}  # floored
    budgets.update({f"r{i}": 4.0 for i in range(8)})  # real 2x-baselines
    # machine uniformly 3x slower: real queries at 1.5x their budget,
    # floored queries fast in absolute terms (their ratios ~0.3 would
    # drag the old all-inclusive median down to ~garbage)
    timings = {f"f{i}": 0.3 for i in range(8)}
    timings.update({f"r{i}": 6.0 for i in range(8)})
    slow, br = budget_breaches(timings, budgets)
    assert slow == 3.0  # 2 x median(1.5) — floored ratios excluded
    assert br == {}

    # a floored query that genuinely blows past floor x slowdown still
    # trips: the exclusion is about the ESTIMATE, not the check
    timings["f0"] = 5.0
    slow, br = budget_breaches(timings, budgets)
    assert set(br) == {"f0"}


# ------------------------------------- r8: retry basis for shared caches


def test_timed_retry_reproduces_warm_basis_untimed():
    """Cache-sharing queries are first timed against a warm shared
    stage; the breach retry purges the caches, so it must re-warm that
    basis UNTIMED before timing the query — otherwise a pure-noise
    breach re-pays pipeline work its budget never included and can
    never clear (r7 verdict item 2 / r6 advice). Pin the order
    (purge -> rewarm -> run) and the timing boundary (rewarm cost
    excluded, run cost included)."""
    import time as _t

    from bench import timed_retry_with_basis

    calls = []

    def purge():
        calls.append("purge")

    def rewarm():
        calls.append("rewarm")
        _t.sleep(0.25)  # expensive pipeline re-warm: must NOT be timed

    def run():
        calls.append("run")
        _t.sleep(0.02)

    sec = timed_retry_with_basis(purge, rewarm, run)
    assert calls == ["purge", "rewarm", "run"]
    assert 0.015 <= sec < 0.2  # rewarm's 0.25 s is outside the clock

    # cold-basis queries (rewarm=None) skip the warm step entirely
    calls.clear()
    timed_retry_with_basis(purge, None, run)
    assert calls == ["purge", "run"]


def test_noise_breach_on_cache_sharing_query_clears_on_retry():
    """End shape of the fix: a cache-sharing query whose first pass hit
    a noise burst breaches, the retry (on its reproduced warm basis)
    comes back at steady state, and the gate goes green."""
    budgets = {**WIDE, "q_minhash_lsh_pairs": 2.0}
    steady = {k: v * 0.45 for k, v in budgets.items()}
    timings = dict(steady)
    timings["q_minhash_lsh_pairs"] = 7.0  # noise burst on first pass

    slow, br, retried = retry_breaches(
        timings, budgets, rerun=lambda name: steady[name]
    )
    assert br == {}
    assert "q_minhash_lsh_pairs" in retried
    assert timings["q_minhash_lsh_pairs"] == steady["q_minhash_lsh_pairs"]


# --------------------------------------- r11: 1M cold-rerun breach recourse


def test_parse_cold_1m_picks_last_record_through_log_noise():
    """The subprocess prints one JSON record, but Spark may spill log
    lines onto stdout around it — the parser must find the record and
    take the LAST one (a retried-in-subprocess run would append)."""
    from bench import _parse_cold_1m

    out = "\n".join(
        [
            "WARNING something something",
            '{"unrelated": 1}',
            '{"cold_1m_seconds": 91.2, "txn_per_sec": 10964.9, "waves": 6}',
            "24/01/01 INFO ShutdownHookManager: Shutdown hook called",
        ]
    )
    assert _parse_cold_1m(out) == (91.2, 10964.9, 6)
    assert _parse_cold_1m("no json here\nat all") is None
    assert _parse_cold_1m("") is None


def _sf1_block(queries, rows_out=None):
    return {
        "queries": queries,
        "rows_out": rows_out or {},
        "ratios": {},
        "rows_ratios": {},
        "advisory_breaches": {},
        "advisory_exempt": {},
    }


def test_sf1_exempt_slot_never_breaches_but_is_recorded():
    """r12 verdict item 4: the pinned-K semantic oracle slot is
    super-linear BY CONSTRUCTION; its over-ceiling ratio must land in
    advisory_exempt (with the documented reason), never in
    advisory_breaches — while a genuinely super-linear non-exempt slot
    still breaches loudly."""
    from bench import sf1_apply_verdicts

    block = _sf1_block(
        {
            "q_semantic_dedup": {"sf0.1": 1.0, "sf1": 13.0},
            "q_semantic_dedup_autok": {"sf0.1": 1.0, "sf1": 3.0},
            "q_dedup_substrings": {"sf0.1": 2.0, "sf1": 30.0},
        },
        rows_out={
            "q_dedup_substrings": {"sf0.1": 100, "sf1": 2100},
        },
    )
    sf1_apply_verdicts(block)
    assert "q_semantic_dedup" not in block["advisory_breaches"]
    assert block["advisory_exempt"]["q_semantic_dedup"]["ratio"] == 13.0
    assert "auto-K twin" in block["advisory_exempt"]["q_semantic_dedup"][
        "reason"
    ] or "autok" in block["advisory_exempt"]["q_semantic_dedup"]["reason"]
    # the production auto-K twin IS gated (here under ceiling: no breach)
    assert "q_semantic_dedup_autok" not in block["advisory_breaches"]
    assert block["ratios"]["q_semantic_dedup_autok"] == 3.0
    # a non-exempt super-linear slot still breaches, with the rows_out
    # ratio recorded for attribution (work-volume vs plan regression)
    assert block["advisory_breaches"]["q_dedup_substrings"] == 15.0
    assert block["rows_ratios"]["q_dedup_substrings"] == 21.0


def test_sf1_exemption_is_bounded():
    """r13 review: the exemption covers the documented ~11x pinned-K
    artifact, not arbitrary regressions — beyond 2x the advisory
    ceiling the exempt slot breaches like any other, because a 50x
    ratio is a plan regression no documented artifact explains."""
    from bench import sf1_apply_verdicts

    block = _sf1_block(
        {"q_semantic_dedup": {"sf0.1": 1.0, "sf1": 50.0}},
    )
    sf1_apply_verdicts(block)
    assert "q_semantic_dedup" not in block["advisory_exempt"]
    assert block["advisory_breaches"]["q_semantic_dedup"] == 50.0


def test_sf1_candidate_counts_attribute_pair_ratios():
    """r12 verdict item 2 (pair slots): the lane records CANDIDATE pair
    volume alongside verified rows_out, so a super-linear time ratio on
    a pair query is attributable — candidates growing with the ratio is
    LSH volume (data shape), flat candidates under a hot ratio is a
    plan/verify regression."""
    from bench import sf1_apply_verdicts

    block = _sf1_block(
        {"q_minhash_lsh_pairs_capped": {"sf0.1": 2.0, "sf1": 26.0}},
        rows_out={"q_minhash_lsh_pairs_capped": {"sf0.1": 10, "sf1": 100}},
    )
    block["candidates"] = {
        "q_minhash_lsh_pairs_capped": {"sf0.1": 600, "sf1": 60_000}
    }
    sf1_apply_verdicts(block)
    assert block["advisory_breaches"]["q_minhash_lsh_pairs_capped"] == 13.0
    assert block["candidates_ratios"]["q_minhash_lsh_pairs_capped"] == 100.0
    # absent candidate data (non-pair slots) must not fabricate a ratio
    assert list(block["candidates_ratios"]) == ["q_minhash_lsh_pairs_capped"]


def test_sf1_floor_prevents_jitter_ratio_breach():
    """Sub-second sf0.1 slots are floored so scheduler jitter cannot
    fabricate a ratio breach."""
    from bench import sf1_apply_verdicts

    block = _sf1_block({"q_tpch_q5": {"sf0.1": 0.05, "sf1": 4.0}})
    sf1_apply_verdicts(block)
    # 4.0 / max(0.05, 0.5) = 8x, under the 12x ceiling
    assert block["ratios"]["q_tpch_q5"] == 8.0
    assert not block["advisory_breaches"]
