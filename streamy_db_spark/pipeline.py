"""One-call training-corpus build: the full operator chain composed the
way a production corpus job runs it — profile → exact dedup → near-dup
keepers → decontaminate → repetition filter → split → mixture rebalance
→ deterministic shuffle → pack → clustered write → compaction.

tests/test_pipeline_e2e.py asserts row accounting per stage at sf0.001;
bench.py times this whole function at sf0.1 and records it as
``corpus_build_seconds`` — the LLM-pipeline headline number next to the
protocol replay's txn/s (r7 verdict item 5).

Scale shape is inherited from the stages (each documents its own): the
only corpus-wide shuffles are the near-dup pair pipeline's banded join,
the groupBys behind dedup/packing, and the ONE layout shuffle of
shuffle_corpus; everything else is scan-side. No driver collect()s on
corpus-sized data (profile returns column-cardinality rows; dedup's
union-find fold is capped).

No reference counterpart (SURVEY.md §2.3 — the reference is a KV
protocol engine with no text surface); this composes the declared
training-data operator families end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    mixture_weights: dict[str, int] | None = None,
    mixture_total_tokens: int = 2_000_000,
    n_shards: int = 16,
    seq_tokens: int = 2048,
    repetition_max: float = 0.5,
    bench_docs: int = 5,
    materialize_stages: bool = True,
    semantic_threshold: float | None = None,
    semantic_clusters: int | None = None,
    substring_window: int | None = None,
) -> dict[str, int]:
    """Run the full corpus build on ``<sf_dir>/documents.parquet`` and
    land TWO artifacts: the shuffled doc-level train split at
    ``out_dir`` (clustered on (shard, pos) — the training read order —
    then compacted) and the packed fixed-token spans at
    ``<out_dir>.packed`` (the sequence-level view a packing-based
    loader consumes; already per-shard, landed as-is). Returns per-stage
    row counts (each count is also the action that materializes that
    stage — the returned dict doubles as the bench's work receipt).

    ``mixture_weights`` defaults to equal weights over the sources
    present (computed from the profile pass's source cardinality — one
    tiny collect of source-cardinality size, never corpus-sized).

    ``semantic_threshold`` (opt-in) adds a SemDeDup stage after the
    MinHash near-dup pass: IVF centroids train on a bounded sample of
    ``<sf_dir>/embeddings.parquet`` (vec_id ≡ doc_id in the harness
    tables), every surviving doc's vector gets a cluster-bounded cosine
    verdict, and dropped docs leave the corpus. Docs WITHOUT an
    embedding row pass through untouched (left-join keep-if-null) —
    lexical dedup already covered them. Off by default: the benched
    corpus_build budget and its row accounting predate this stage.
    ``semantic_clusters`` defaults to the K ∝ N sizing rule
    (dedup.semantic_cluster_count over the surviving embedding count) —
    the per-cluster block stays ~SEMANTIC_TARGET_BLOCK as the corpus
    grows, keeping the scoring pass linear; the chosen K is recorded
    as ``semantic_clusters`` in the returned stats.

    ``substring_window`` (opt-in) adds an ExactSubstr stage after the
    doc-level dedups: token windows of that width repeated verbatim
    across surviving docs are located and CUT from every occurrence
    (operators/substring.py) — the span-level boilerplate pass
    doc-level dedup can't express. Rows pass through (possibly
    shortened); the stat records spans cut. Off by default, same
    rationale as ``semantic_threshold``.

    ``materialize_stages`` checkpoints the two expensive fan-in stages
    (near-dedup keepers, quality-filtered set) so later stages and their
    row-accounting counts read the materialized result instead of
    recomputing the whole upstream lineage per action — the staged
    sketch→pairs→clusters discipline a 100 TB build runs (each stage
    lands once, every consumer reads it). Off = one lazy lineage
    (what test_pipeline_e2e exercises).
    """
    from streamy_db_spark.operators.decontam import decontaminate, tokens
    from streamy_db_spark.operators.dedup import dedup_groups, dedupe_exact
    from streamy_db_spark.operators.minhash import minhash_near_dup_pairs
    from streamy_db_spark.operators.profile import profile_table
    from streamy_db_spark.operators.sampling import (
        mixture_sample,
        shuffle_corpus,
        with_split,
    )
    from streamy_db_spark.operators.text_quality import (
        pack_sequences,
        repetition_scores,
    )
    from streamy_db_spark.sources import files
    from streamy_db_spark.sources.tables import load_table

    stats: dict[str, int] = {}
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )

    # 0. profile the raw input (the trust-but-verify pass)
    prof = profile_table(docs).collect()
    stats["profile_columns"] = len(prof)
    stats["rows_raw"] = next(r.n_rows for r in prof)

    # 1. exact dedup
    docs = dedupe_exact(docs)
    stats["rows_exact_dedup"] = docs.count()

    # 2. near-dup group resolution → keepers only
    pairs = minhash_near_dup_pairs(docs)
    groups = dedup_groups(docs, pairs)
    docs = docs.join(
        groups.filter(F.col("doc_id") == F.col("keeper_id")).select("doc_id"),
        "doc_id",
    )
    if materialize_stages:
        docs = docs.localCheckpoint(eager=True)
    stats["rows_near_dedup"] = docs.count()

    # 2b. (opt-in) semantic dedup over the embedding table — the
    # SemDeDup pass lexical near-dup can't see (paraphrases, templated
    # rewrites). Verdicts are (id, cluster, keep) — tiny vs the corpus.
    if semantic_threshold is not None:
        from streamy_db_spark.operators.dedup import semantic_dedup
        from streamy_db_spark.operators.similarity import ivf_train_centroids

        # Blockers must be docs still IN the corpus: restrict the
        # embedding table to the survivors of the exact/near-dup stages
        # before scoring (and before centroid training), or a doc
        # already removed — or absent from the doc set entirely —
        # could veto a survivor it semantically duplicates (r9 ADVICE:
        # ghost blockers compounded the non-greedy chain over-removal).
        emb = load_table(spark, sf_dir, "embeddings").join(
            docs.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
        )
        if semantic_clusters is None:
            # K ∝ N (dedup.semantic_cluster_count): a pinned K is the
            # one measured super-linear scaler in the whole pipeline
            # (BASELINE §8 sf1 probe) — per-cluster blocks must stay
            # ~constant as the corpus grows. Costs one count of the
            # surviving embedding set (id-column scan).
            from streamy_db_spark.operators.dedup import (
                semantic_cluster_count,
            )

            semantic_clusters = semantic_cluster_count(emb.count())
        centroids = ivf_train_centroids(emb, n_clusters=semantic_clusters)
        # record the TRAINED cluster count, not the requested one: past
        # ~4·max_train_rows surviving docs the driver training sample
        # caps the matrix below the requested K (the sizing helper's
        # documented trainer bound — raise max_train_rows with the
        # corpus), and the receipt must state what the space actually
        # has, or downstream accounting of the scale knob is wrong
        stats["semantic_clusters"] = len(centroids)
        verdicts = semantic_dedup(emb, centroids, threshold=semantic_threshold)
        docs = (
            docs.join(
                verdicts.select(
                    F.col("vec_id").alias("doc_id"), "keep"
                ),
                "doc_id",
                "left",
            )
            .filter(F.coalesce(F.col("keep"), F.lit(True)))
            .drop("keep")
        )
        if materialize_stages:
            # the per-cluster O(B²) verdict pass is this stage's cost —
            # checkpoint so the count here and every downstream action
            # up to the stage-4 checkpoint don't re-execute it (r9
            # second review)
            docs = docs.localCheckpoint(eager=True)
        stats["rows_semantic_dedup"] = docs.count()

    # 2c. (opt-in) ExactSubstr: cut token spans repeated verbatim
    # across surviving docs — boilerplate/licenses that doc-level
    # dedup keeps because the documents differ as wholes.
    if substring_window is not None:
        from streamy_db_spark.operators.substring import (
            duplicated_spans,
            strip_duplicated_spans,
        )

        # duplicated_spans returns an eagerly-checkpointed tiny frame
        # (r10: DISK_ONLY persist + release inside), so both strip's
        # join and the accounting count read the one materialization
        spans = duplicated_spans(docs, window=substring_window)
        docs = strip_duplicated_spans(docs, spans)
        if materialize_stages:
            docs = docs.localCheckpoint(eager=True)
        stats["substring_spans_cut"] = spans.count()

    # 3. decontaminate against a benchmark set (stand-in: first N docs)
    bench = (
        load_table(spark, sf_dir, "documents")
        .orderBy("doc_id")
        .limit(bench_docs)
        .select("text")
    )
    docs = decontaminate(docs, bench, n=8)
    stats["rows_decontaminated"] = docs.count()

    # 4. repetition filter
    docs = (
        docs.join(
            repetition_scores(docs).select("doc_id", "top_bigram_frac"),
            "doc_id",
        )
        .filter(F.col("top_bigram_frac") < repetition_max)
        .drop("top_bigram_frac")
    )
    if materialize_stages:
        docs = docs.localCheckpoint(eager=True)
    stats["rows_quality_kept"] = docs.count()

    # 5. mixture rebalance (equal weights over observed sources unless
    # given) then deterministic split; train partition continues
    if mixture_weights is None:
        srcs = [r.source for r in docs.select("source").distinct().collect()]
        mixture_weights = {s: 1 for s in sorted(srcs)}
    docs = mixture_sample(docs, mixture_weights, mixture_total_tokens)
    stats["rows_mixture"] = docs.count()

    train = with_split(docs, "doc_id").filter(F.col("split") == "train")
    stats["rows_train"] = train.count()

    # 6. deterministic shuffle into shards, pack into fixed token spans
    shuffled = shuffle_corpus(train, n_shards=n_shards)
    stats["rows_shuffled"] = shuffled.count()
    # pack and LAND in one pass (counting then discarding would compute
    # the packing twice and make the landed artifact a fiction)
    packed_path = out_dir.rstrip("/") + ".packed"
    pack_sequences(train, seq_tokens=seq_tokens).write.mode(
        "overwrite"
    ).parquet(packed_path)
    stats["rows_packed"] = spark.read.parquet(packed_path).count()
    stats["train_tokens"] = (
        train.select(F.sum(F.size(tokens(F.col("text")))).alias("n"))
        .collect()[0]
        .n
        or 0
    )

    # 7. land the shuffled doc split clustered on (shard, pos) — the
    # exact read order training jobs consume — then compact (the packed
    # spans landed at <out_dir>.packed in stage 6, r8 review)
    files.write_clustered(shuffled, out_dir, cluster_cols=["shard", "pos"])
    stats["files_compacted"] = files.compact_parquet(
        spark, out_dir, target_file_mb=128, cluster_cols=["shard", "pos"]
    )
    stats["rows_landed"] = spark.read.parquet(out_dir).count()
    return stats
