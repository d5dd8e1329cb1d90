"""ExactSubstr substring dedup (operators/substring.py): planted
duplicated passages produce exactly the merged token spans, the strip
application cuts them (and only them), and the plan stays fully JVM.
The DuckDB hash gate runs via the TEST_QUERIES registry in
test_oracle_queries.py."""

from __future__ import annotations

from streamy_db_spark.operators import substring
from streamy_db_spark.plans import inspect

# An 8-token passage shared verbatim by docs 1 and 2 at different
# offsets; doc 3 is unique; doc 4 is too short to hold one window.
SHARED = "alpha beta gamma delta epsilon zeta eta theta"
DOCS = [
    (1, f"intro words here {SHARED} trailing one two three"),
    (2, f"{SHARED} completely different continuation of text here"),
    (3, "nothing in this document repeats anywhere at all truly unique"),
    (4, "short doc"),
]


def _docs(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_spans_exact(spark):
    spans = {
        (r.doc_id, r.start_tok, r.end_tok)
        for r in substring.duplicated_spans(_docs(spark), window=8).collect()
    }
    # doc 1: SHARED occupies tokens 3..10; doc 2: tokens 0..7
    assert spans == {(1, 3, 10), (2, 0, 7)}


def test_adjacent_windows_merge_into_one_span(spark):
    """A 10-token shared passage yields three overlapping 8-token hit
    windows per doc — they must merge into ONE maximal span each."""
    long_shared = SHARED + " iota kappa"  # 10 tokens
    rows = [
        (1, f"x y {long_shared} z"),
        (2, f"{long_shared} unrelated tail content words"),
    ]
    spans = {
        (r.doc_id, r.start_tok, r.end_tok)
        for r in substring.duplicated_spans(_docs(spark, rows), window=8).collect()
    }
    assert spans == {(1, 2, 11), (2, 0, 9)}


def test_strip_cuts_spans_and_passes_clean_docs(spark):
    docs = _docs(spark)
    spans = substring.duplicated_spans(docs, window=8)
    out = {
        r.doc_id: r.text
        for r in substring.strip_duplicated_spans(docs, spans).collect()
    }
    assert out[1] == "intro words here trailing one two three"
    assert out[2] == "completely different continuation of text here"
    # span-free docs pass through untouched
    assert out[3] == DOCS[2][1]
    assert out[4] == "short doc"


def test_strip_preserves_original_casing(spark):
    """Span indices come from the lowercased hash view, but lowercasing
    changes no token boundaries — the kept tokens keep their ORIGINAL
    casing (the duplicate detection is case-insensitive; the cut is
    applied to the raw text)."""
    rows = [
        (1, f"Intro WORDS here {SHARED} Trailing One"),
        (2, f"{SHARED.upper()} different Continuation of text here now"),
    ]
    docs = _docs(spark, rows)
    spans = substring.duplicated_spans(docs, window=8)
    out = {
        r.doc_id: r.text
        for r in substring.strip_duplicated_spans(docs, spans).collect()
    }
    assert out[1] == "Intro WORDS here Trailing One"
    assert out[2] == "different Continuation of text here now"


def test_plan_is_fully_jvm(spark):
    """Scale gate: window hashing, the duplicate groupBy, and the
    interval-merge fold are all JVM expressions — no Python evaluation
    of any kind. The window-hashing stage is inspected PRE-checkpoint
    (duplicated_spans materializes it, which would hide a Python node
    behind Scan ExistingRDD — r9 fourth review); the post-checkpoint
    agg/join/merge plan is gated separately."""
    docs = _docs(spark)
    wins = substring._window_hashes(docs, window=8, id_col="doc_id")
    scan_plan = inspect.executed_plan(wins)
    # the agg/join/merge plan is inspected LAZY (pre-materialization):
    # duplicated_spans checkpoints its result, which would hide any
    # Python node behind Scan ExistingRDD
    full_plan = inspect.executed_plan(
        substring._spans_of_windows(wins, 8, 2, "doc_id")
    )
    for plan in (scan_plan, full_plan):
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "FlatMapGroupsInPandas" not in plan
