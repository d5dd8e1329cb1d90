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


def test_full_corpus_build(spark, tmp_path_factory):
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

    # 6. land the train split CLUSTERED on doc_id (file-level zone maps
    # for the id-ranged reads training jobs do), fragmented on purpose...
    from streamy_db_spark.sources import files

    out = str(tmp_path_factory.mktemp("corpus") / "train")
    landed = files.write_clustered(
        train.repartition(16), out, cluster_cols=["doc_id"], n_files=8
    )
    assert landed.count() == n_train

    # ...then 7. compact it — the maintenance pass after ingest — and
    # assert the layout contract from the actual parquet footers:
    # fewer files, disjoint per-file doc_id ranges, zero row loss.
    import pyarrow.parquet as pq_meta
    from pathlib import Path as P

    before = len(list(P(out).glob("*.parquet")))
    n_files = files.compact_parquet(
        spark, out, target_file_mb=128, cluster_cols=["doc_id"]
    )
    after = len(list(P(out).glob("*.parquet")))
    assert after == n_files and after < before

    final = spark.read.parquet(out)
    assert final.count() == n_train
    assert {r.doc_id for r in final.select("doc_id").collect()} == {
        r.doc_id for r in train.select("doc_id").collect()
    }
    ranges = []
    for f in P(out).glob("*.parquet"):
        md = pq_meta.ParquetFile(str(f)).metadata
        if md.num_row_groups == 0:
            continue
        idx = next(
            i
            for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "doc_id"
        )
        stats = [
            md.row_group(g).column(idx).statistics
            for g in range(md.num_row_groups)
        ]
        ranges.append((min(s.min for s in stats), max(s.max for s in stats)))
    ranges.sort()
    for (_, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint footer ranges: zone maps intact

    # 8. mixture-rebalance the train split to a token budget, lay it
    # out in reproducible shuffled order, and pack in THAT order — the
    # layout tail of the pipeline (weights uniform here; the point is
    # the composition, exact-integer keep rule, and order plumbing)
    from streamy_db_spark.operators.sampling import mixture_sample, shuffle_corpus

    srcs = [r.source for r in train.select("source").distinct().collect()]
    mixed = mixture_sample(train, {s: 1 for s in srcs}, total_tokens=2_000)
    n_mix = mixed.count()
    assert 0 < n_mix <= n_train

    shuffled = mixed.join(
        shuffle_corpus(mixed.select("doc_id"), n_shards=4).select("doc_id", "pos"),
        "doc_id",
    )
    packed_mix = pack_sequences(shuffled, seq_tokens=128, order_col="pos")
    tok_mix = (
        mixed.select(F.sum(F.size(tokens(F.col("text")))).alias("n")).collect()[0].n
    )
    assert packed_mix.agg(F.sum("n_toks").alias("n")).collect()[0].n == tok_mix


def test_build_corpus_one_call(spark, tmp_path_factory):
    """pipeline.build_corpus — the one-call form bench.py times as
    corpus_build_seconds — must reproduce the stage row accounting of
    the hand-composed chain above: monotone non-increasing through the
    filters, a binding mixture budget, and a landed shard set equal to
    the train split."""
    from streamy_db_spark.pipeline import build_corpus

    out = str(tmp_path_factory.mktemp("bc") / "corpus")
    s = build_corpus(spark, SF, out, mixture_total_tokens=10_000)
    assert (
        s["rows_raw"]
        >= s["rows_exact_dedup"]
        >= s["rows_near_dedup"]
        >= s["rows_decontaminated"]
        >= s["rows_quality_kept"]
        >= s["rows_mixture"]
        >= s["rows_train"]
    )
    assert s["rows_mixture"] < s["rows_quality_kept"]  # budget binds
    assert s["rows_shuffled"] == s["rows_train"] == s["rows_landed"]
    assert s["rows_packed"] > 0 and s["train_tokens"] > 0
    assert s["files_compacted"] >= 1

    # the landed layout is the training read order: shard + pos present,
    # pos dense per shard
    landed = spark.read.parquet(out)
    assert {"shard", "pos"} <= set(landed.columns)
    one = landed.filter(F.col("shard") == 0).select("pos").collect()
    assert sorted(r.pos for r in one) == list(range(len(one)))


def test_build_corpus_semantic_stage(spark, tmp_path_factory):
    """Opt-in SemDeDup stage: verdicts from the embedding table drop
    docs between the near-dup and decontamination stages; docs without
    an embedding row pass through. Default runs (the benched form) must
    not grow the new accounting key."""
    from streamy_db_spark.pipeline import build_corpus

    out = str(tmp_path_factory.mktemp("bc3") / "corpus")
    # threshold 0.0 makes the stage bind hard (any same-cluster pair
    # with non-negative cosine drops the higher id) — the point is the
    # accounting and composition, not a tuned threshold.
    s = build_corpus(
        spark, SF, out, mixture_total_tokens=10_000, semantic_threshold=0.0
    )
    assert "rows_semantic_dedup" in s
    assert s["rows_near_dedup"] >= s["rows_semantic_dedup"] > 0
    assert s["rows_semantic_dedup"] >= s["rows_decontaminated"]
    assert s["rows_semantic_dedup"] < s["rows_near_dedup"]  # stage binds
    # K auto-sizes from the surviving embedding count (K ∝ N rule,
    # dedup.semantic_cluster_count) and is recorded in the receipt.
    # The surviving-embedding count isn't in the receipt, but it is
    # bounded by rows_near_dedup, so K must sit in the rule's image
    # over [1, rows_near_dedup]: between 1 and max(floor, N).
    from streamy_db_spark.operators.dedup import SEMANTIC_SEED_K

    assert 1 <= s["semantic_clusters"] <= max(
        SEMANTIC_SEED_K, s["rows_near_dedup"]
    )

    out2 = str(tmp_path_factory.mktemp("bc3") / "corpus_default")
    s2 = build_corpus(spark, SF, out2, mixture_total_tokens=10_000)
    assert "rows_semantic_dedup" not in s2
    assert "semantic_clusters" not in s2


def test_build_corpus_substring_stage(spark, tmp_path_factory):
    """Opt-in ExactSubstr stage: duplicated spans are cut (token volume
    drops, rows pass through) and the accounting key appears only when
    the stage is on."""
    from streamy_db_spark.pipeline import build_corpus

    out = str(tmp_path_factory.mktemp("bc4") / "corpus")
    # window 5: the sf0.001 fixture still carries cross-doc 5-token
    # phrases AFTER doc-level dedup (8-token repeats all lived in docs
    # the dedup stages removed — which is those stages working)
    s = build_corpus(
        spark, SF, out, mixture_total_tokens=10_000, substring_window=5
    )
    assert s["substring_spans_cut"] > 0  # fixture phrases make it bind
    assert s["rows_decontaminated"] <= s["rows_near_dedup"]  # chain intact

    out2 = str(tmp_path_factory.mktemp("bc4") / "corpus_default")
    s2 = build_corpus(spark, SF, out2, mixture_total_tokens=10_000)
    assert "substring_spans_cut" not in s2


def test_build_corpus_lands_packed_spans(spark, tmp_path_factory):
    """The packed fixed-token spans land at <out_dir>.packed (r8 review:
    they used to be computed for a row count and discarded)."""
    from streamy_db_spark.pipeline import build_corpus

    out = str(tmp_path_factory.mktemp("bc2") / "corpus")
    s = build_corpus(spark, SF, out, mixture_total_tokens=10_000)
    packed = spark.read.parquet(out + ".packed")
    assert packed.count() == s["rows_packed"] > 0
    assert "n_toks" in packed.columns
