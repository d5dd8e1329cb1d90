"""Deterministic split/sampling operator semantics (the oracle test in
test_oracle_queries.py covers the hash arithmetic; these pin the
membership properties training pipelines rely on)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from streamy_db_spark.operators import sampling
from streamy_db_spark.sources.tables import load_table


def test_split_is_total_and_deterministic(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    n = docs.count()
    split = sampling.with_split(docs, "doc_id")
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == n  # total: every row gets exactly one label
    # Deterministic: re-computation (different partitioning) agrees row-wise.
    a = {r["doc_id"]: r["split"] for r in split.select("doc_id", "split").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in sampling.with_split(docs.repartition(7), "doc_id")
        .select("doc_id", "split")
        .collect()
    }
    assert a == b
    # Proportions roughly honor the 90/5/5 default on 500 docs.
    assert counts["train"] / n == pytest.approx(0.90, abs=0.06)


def test_split_validates_inputs(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    with pytest.raises(ValueError, match="sum to 1"):
        sampling.with_split(docs, "doc_id", {"train": 0.5, "test": 0.4})
    with pytest.raises(ValueError, match="already exists"):
        sampling.with_split(docs.withColumn("split", F.lit("x")), "doc_id")


def test_stratified_sample_monotone_and_stable(spark, sf_small):
    """Raising the fraction only ADDS rows (monotone membership) — the
    property that lets an eval set grow without reshuffling; and the
    sample is independent of the split salt."""
    docs = load_table(spark, sf_small, "documents")
    small = {r["doc_id"] for r in sampling.stratified_sample(docs, "doc_id", 0.1).collect()}
    big = {r["doc_id"] for r in sampling.stratified_sample(docs, "doc_id", 0.3).collect()}
    assert small <= big
    n = docs.count()
    assert len(big) / n == pytest.approx(0.3, abs=0.08)
    # Per-stratum composition: filter-then-sample keeps determinism.
    en = docs.filter(F.col("lang") == "en")
    sampled_en = {
        r["doc_id"] for r in sampling.stratified_sample(en, "doc_id", 0.3).collect()
    }
    assert sampled_en == {x for x in big if x in {r["doc_id"] for r in en.collect()}}
