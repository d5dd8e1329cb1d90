"""End-to-end training-data pipeline: the full operator chain composed
the way a real corpus build runs it, with row accounting asserted at
every stage. This is the integration story the individual operator
tests can't show — that the pieces compose on one DataFrame lineage
without collect()s between stages."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamy_db_spark.operators.decontam import decontaminate
from streamy_db_spark.operators.dedup import dedup_groups, dedupe_exact
from streamy_db_spark.operators.minhash import minhash_near_dup_pairs
from streamy_db_spark.operators.profile import profile_table
from streamy_db_spark.operators.sampling import with_split
from streamy_db_spark.operators.text_quality import (
    chunk_documents,
    pack_sequences,
    repetition_scores,
)
from streamy_db_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_full_corpus_build(spark):
    docs = load_table(spark, SF, "documents").select(
        "doc_id", "source", "text"
    )
    n0 = docs.count()
    assert n0 > 0

    # 0. profile the raw input (the pass you run before trusting a table)
    prof = {r.column: r for r in profile_table(docs).collect()}
    assert prof["doc_id"].n_nulls == 0
    assert prof["doc_id"].n_distinct == n0

    # 1. exact dedup
    docs = dedupe_exact(docs)
    n1 = docs.count()
    assert 0 < n1 <= n0

    # 2. near-dup group resolution → keep cluster keepers only
    pairs = minhash_near_dup_pairs(docs)
    groups = dedup_groups(docs, pairs)
    docs = docs.join(
        groups.filter(F.col("doc_id") == F.col("keeper_id")).select("doc_id"),
        "doc_id",
    )
    n2 = docs.count()
    assert 0 < n2 <= n1

    # 3. decontaminate against a small benchmark (first 5 doc texts)
    bench = (
        load_table(spark, SF, "documents")
        .orderBy("doc_id")
        .limit(5)
        .select("text")
    )
    clean = decontaminate(docs, bench, n=8)
    n3 = clean.count()
    assert 0 < n3 < n2  # the 5 source docs (at least) drop out

    # 4. quality filter: drop the most repetitive tail
    scored = clean.join(
        repetition_scores(clean).select("doc_id", "top_bigram_frac"), "doc_id"
    )
    kept = scored.filter(F.col("top_bigram_frac") < 0.5).drop("top_bigram_frac")
    n4 = kept.count()
    assert 0 < n4 <= n3

    # 5. deterministic split, then chunk+pack the train partition
    split = with_split(kept, "doc_id")
    train = split.filter(F.col("split") == "train")
    n_train = train.count()
    assert 0 < n_train <= n4

    chunks = chunk_documents(train, chunk_tokens=64, overlap=8)
    assert chunks.count() >= n_train  # every non-empty doc yields >= 1 chunk

    packed = pack_sequences(train, seq_tokens=128)
    # packing conserves tokens exactly: per-shard sum of span lengths ==
    # per-shard sum of doc token counts
    from streamy_db_spark.operators.decontam import tokens

    tok_total = train.select(
        F.sum(F.size(tokens(F.col("text")))).alias("n")
    ).collect()[0].n
    span_total = packed.agg(F.sum("n_toks").alias("n")).collect()[0].n
    assert span_total == tok_total
