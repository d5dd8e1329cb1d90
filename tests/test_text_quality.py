"""Repetition-score and PII-redaction operators: planted-value checks
and the zero-shuffle plan gate (the sf0.01 DuckDB hash-match runs via
test_oracle_queries' test-only registry)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamy_db_spark.operators.text_quality import redact_pii, repetition_scores


def test_repetition_scores_planted_values(spark):
    rows = [
        # "a b" ×3 runs; 6 tokens, 2 distinct; bigrams: ab ba ab ba ab
        (1, "a b a b a b"),
        (2, "all words here are fully distinct"),
        (3, "one"),  # no bigrams
        (4, ""),  # no tokens at all
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_scores(df).collect()}
    assert got[1].n_tokens == 6 and got[1].n_distinct_tokens == 2
    assert got[1].top_bigram_n == 3  # "a b" occurs 3 times out of 5
    assert abs(got[1].top_bigram_frac - 3 / 5) < 1e-12
    assert got[2].ttr == 1.0 and got[2].top_bigram_n == 1
    assert got[3].n_tokens == 1 and got[3].top_bigram_n == 0
    assert got[4].n_tokens == 0 and got[4].top_bigram_frac == 0.0


def test_repetition_scores_zero_shuffle(spark, sf_oracle):
    """Per-document statistics must not shuffle: the sorted-array run
    fold keeps the whole computation inside the scan stage."""
    from streamy_db_spark.operators.text_quality import q_repetition_scores

    plan = q_repetition_scores(spark, sf_oracle)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_redact_pii_planted(spark):
    rows = [
        (1, "mail me at jane.doe+x@sub.example.org thanks"),
        (2, "call 555-0100 or 555-12 today"),
        (3, "no pii here, just 12345 and name@ invalid"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.text for r in redact_pii(df).collect()}
    assert got[1] == "mail me at <EMAIL> thanks"
    assert got[2] == "call <PHONE> or <PHONE> today"
    assert got[3] == "no pii here, just 12345 and name@ invalid"


def test_chunk_documents_planted(spark):
    from streamy_db_spark.operators.text_quality import chunk_documents

    rows = [
        (1, " ".join(f"t{i}" for i in range(12))),  # 12 toks → 2 chunks @10/2
        (2, "a b c"),  # fits in one chunk
        (3, ""),  # no chunks
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=10, overlap=2)
    got = {(r.doc_id, r.chunk_idx): r for r in out.collect()}
    assert set(got) == {(1, 0), (1, 1), (2, 0)}
    assert got[(1, 0)].chunk_text == " ".join(f"t{i}" for i in range(10))
    # second chunk starts at token 8 (stride 8), overlap of 2 tokens
    assert got[(1, 1)].chunk_text == " ".join(f"t{i}" for i in range(8, 12))
    assert got[(1, 1)].n_chunk_tokens == 4
    assert got[(2, 0)].chunk_text == "a b c"


def test_chunk_documents_zero_shuffle(spark, sf_oracle):
    from streamy_db_spark.operators.text_quality import q_chunk_documents

    plan = (
        q_chunk_documents(spark, sf_oracle)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest
    from streamy_db_spark.operators.text_quality import chunk_documents

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)


def test_pack_sequences_planted(spark):
    from streamy_db_spark.operators.text_quality import pack_sequences

    # one shard, L=10: docs of 4, 9, 10, 3 tokens → offsets 0, 4, 13, 23
    rows = [
        ("s", 1, " ".join("a" * 1 for _ in range(4))),
        ("s", 2, " ".join("b" for _ in range(9))),
        ("s", 3, " ".join("c" for _ in range(10))),
        ("s", 4, "d d d"),
        ("s", 5, ""),  # empty: contributes nothing
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    got = sorted(
        (r.doc_id, r.seq_id, r.doc_tok_start, r.n_toks)
        for r in pack_sequences(df, seq_tokens=10, shard_col="source").collect()
    )
    assert got == [
        (1, 0, 0, 4),           # doc1 fully in block 0
        (2, 0, 0, 6), (2, 1, 6, 3),   # doc2 straddles 0|1 at global tok 10
        (3, 1, 0, 7), (3, 2, 7, 3),   # doc3 spans blocks 1 and 2
        (4, 2, 0, 3),           # doc4 in block 2
    ]
    # every block except the last is exactly full
    totals = {}
    for _d, b, _s, n in got:
        totals[b] = totals.get(b, 0) + n
    assert totals == {0: 10, 1: 10, 2: 6}


def test_pack_sequences_shards_are_independent(spark):
    from streamy_db_spark.operators.text_quality import pack_sequences

    rows = [("x", 1, "a b c"), ("y", 2, "d e f g")]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    got = {
        (r.source, r.doc_id, r.seq_id, r.n_toks)
        for r in pack_sequences(df, seq_tokens=10, shard_col="source").collect()
    }
    # both shards start at block 0 — no cross-shard offsets
    assert got == {("x", 1, 0, 3), ("y", 2, 0, 4)}


def test_tfidf_planted_values(spark):
    import math
    from streamy_db_spark.operators.text_quality import tfidf_top_terms

    rows = [
        (1, "apple apple banana"),
        (2, "banana cherry"),
        (3, "cherry cherry cherry durian"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.rank): (r.term, r.score)
        for r in tfidf_top_terms(df, k=2).collect()
    }
    idf = lambda d: math.log(4.0 / (d + 1.0))  # N=3 → (N+1)/(df+1)
    # doc1: apple tf=2 df=1 → 2*ln(2); banana tf=1 df=2 → ln(4/3)
    assert got[(1, 1)] == ("apple", round(2 * idf(1), 6))
    assert got[(1, 2)] == ("banana", round(1 * idf(2), 6))
    # doc3: cherry tf=3 df=2 dominates durian tf=1 df=1
    assert got[(3, 1)] == ("cherry", round(3 * idf(2), 6))
    assert got[(3, 2)] == ("durian", round(1 * idf(1), 6))


def test_pack_sequences_single_shard_exchange(spark, sf_oracle):
    """Packing must shuffle ONCE on the shard key (the per-shard window)
    and never globally sort or touch Python."""
    from streamy_db_spark.operators.text_quality import q_pack_sequences

    plan = (
        q_pack_sequences(spark, sf_oracle)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning(source") == 1
    assert "Exchange rangepartitioning" not in plan  # no global sort
    assert "BatchEvalPython" not in plan


def test_tfidf_stays_jvm_side(spark, sf_oracle):
    from streamy_db_spark.operators.text_quality import q_tfidf_top_terms

    plan = (
        q_tfidf_top_terms(spark, sf_oracle)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "partial_count" in plan  # map-side combine before the shuffles


def test_pack_sequences_in_shuffled_order(spark):
    """Packing composes with shuffle_corpus: ordering by the shuffle pos
    (id tiebreak) must match the pure-Python packing model over the same
    order, and conserve tokens exactly."""
    from streamy_db_spark.operators.decontam import tokens as _tokens
    from streamy_db_spark.operators.sampling import shuffle_corpus
    from streamy_db_spark.operators.text_quality import pack_sequences

    rows = [
        (i, f"s{i % 2}", " ".join(f"d{i}t{j}" for j in range(3 + i % 5)))
        for i in range(24)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    shuffled = docs.join(
        shuffle_corpus(docs.select("doc_id"), n_shards=1).select("doc_id", "pos"),
        "doc_id",
    )
    got = {
        (r.source, r.doc_id, r.seq_id, r.doc_tok_start, r.n_toks)
        for r in pack_sequences(shuffled, 8, order_col="pos").collect()
    }

    # pure-Python model over the identical order
    n_of = {
        r.doc_id: r.n
        for r in shuffled.select(
            "doc_id", F.size(_tokens(F.col("text"))).alias("n")
        ).collect()
    }
    pos_of = {r.doc_id: r.pos for r in shuffled.select("doc_id", "pos").collect()}
    want = set()
    for src in ("s0", "s1"):
        ids = sorted(
            (i for i, s, _ in rows if s == src), key=lambda i: (pos_of[i], i)
        )
        off = 0
        for i in ids:
            n = n_of[i]
            for b in range(off // 8, (off + n - 1) // 8 + 1):
                start = max(off, b * 8)
                end = min(off + n, (b + 1) * 8)
                want.add((src, i, b, start - off, end - start))
            off += n
    assert got == want
    assert sum(t[4] for t in got) == sum(n_of.values())
