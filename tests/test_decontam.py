"""Benchmark-decontamination operator: planted-overlap behavior plus the
sf0.01 oracle check (the oracle itself runs via test_oracle_queries'
test-only registry; here we pin the operator-level contracts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamy_db_spark.operators.decontam import (
    contaminated_ids,
    decontaminate,
    decontaminate_exact,
    ngrams,
    tokens,
)

BENCH_SENTENCE = "the capital of france is paris and its river is the seine"


def _corpus(spark):
    rows = [
        # embeds the benchmark sentence verbatim mid-document
        (1, "intro words here " + BENCH_SENTENCE + " trailing filler text"),
        # WHITESPACE/case variant of the full benchmark text (exact gate
        # must catch it after normalization; n-gram gate too)
        (2, "  The  capital of France is\tparis and its river is the seine "),
        # clean: shares a few tokens but no 5-gram
        (3, "the capital city gossip column mentions paris fashion week only"),
        # clean and token-disjoint
        (4, "completely unrelated corpus document about spark shuffles"),
        # shorter than n tokens: must never be flagged
        (5, "tiny doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bench(spark):
    return spark.createDataFrame([(BENCH_SENTENCE,)], "text string")


def test_contaminated_ids_ngram_overlap(spark):
    bad = contaminated_ids(_corpus(spark), _bench(spark), n=5)
    assert {r.doc_id for r in bad.collect()} == {1, 2}


def test_decontaminate_keeps_clean_docs(spark):
    kept = decontaminate(_corpus(spark), _bench(spark), n=5)
    assert {r.doc_id for r in kept.collect()} == {3, 4, 5}


def test_decontaminate_exact_normalized_only(spark):
    # Exact gate: catches doc 2 (normalization-equal to the benchmark)
    # but NOT doc 1 (benchmark embedded inside a longer doc).
    kept = decontaminate_exact(_corpus(spark), _bench(spark))
    assert {r.doc_id for r in kept.collect()} == {1, 3, 4, 5}


def test_short_docs_produce_no_grams(spark):
    df = spark.createDataFrame([("a b c",)], "text string").select(
        ngrams(tokens(F.col("text")), 5).alias("g")
    )
    assert df.collect()[0].g == []


def test_contamination_join_broadcasts_bench_side(spark, sf_oracle):
    """The benchmark gram set must broadcast (corpus text never
    shuffles) and the whole pass must stay JVM-side."""
    from streamy_db_spark.operators.decontam import q_decontaminate

    plan = (
        q_decontaminate(spark, sf_oracle)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan
    assert "LeftSemi" in plan
    assert "BatchEvalPython" not in plan


def test_sf_verdict_is_nonvacuous(spark, sf_oracle):
    from streamy_db_spark.operators.decontam import q_decontaminate

    counts = {
        r.contaminated: r.n
        for r in q_decontaminate(spark, sf_oracle)
        .groupBy("contaminated")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # the derived benchmark touches every 31st doc, so both verdicts
    # must be populated — and contamination must stay the minority
    assert counts.get(True, 0) > 0 and counts.get(False, 0) > 0
    assert counts[True] < counts[False]


def test_exact_matches_are_a_subset_of_ngram_matches(spark):
    """Any doc the exact gate catches (normalized-equal to a benchmark
    text of >= n tokens) shares all of that text's n-grams, so the
    n-gram gate must catch it too — the containment that makes running
    only the n-gram pass sound."""
    from streamy_db_spark.operators.decontam import (
        contaminated_ids,
        decontaminate_exact,
    )

    corpus = _corpus(spark)
    bench = _bench(spark)
    exact_kept = {r.doc_id for r in decontaminate_exact(corpus, bench).collect()}
    exact_flagged = {r.doc_id for r in corpus.collect()} - exact_kept
    ngram_flagged = {r.doc_id for r in contaminated_ids(corpus, bench, n=5).collect()}
    assert exact_flagged <= ngram_flagged


def test_ngram_key_equality_mirrors_gram_string_equality(spark):
    """r13: gram JOIN keys are xxhash64 over the token SLICE, not over
    the space-joined gram string. Pin the load-bearing property — two
    positions share a key exactly when they share the rendered gram
    string — on the natural sf0.001 corpus (every pair of equal grams
    must collide, and no unequal grams may)."""
    from streamy_db_spark.operators.decontam import ngram_keys
    from streamy_db_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    n = 5
    both = docs.select(
        F.explode(
            F.arrays_zip(
                ngrams(tokens(F.col("text")), n).alias("g"),
                ngram_keys(tokens(F.col("text")), n).alias("k"),
            )
        ).alias("z")
    ).select(F.col("z.g").alias("g"), F.col("z.k").alias("k"))
    # each gram string maps to exactly one key, and each key to exactly
    # one gram string (over this corpus) — join-key equivalence holds
    assert both.groupBy("g").agg(F.count_distinct("k").alias("n")).filter(
        F.col("n") != 1
    ).count() == 0
    assert both.groupBy("k").agg(F.count_distinct("g").alias("n")).filter(
        F.col("n") != 1
    ).count() == 0
