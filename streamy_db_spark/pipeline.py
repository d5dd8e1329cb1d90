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
    semantic_centroids=None,
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
        if semantic_centroids is not None:
            # pinned cluster space (e.g. shared with an incremental
            # gate whose verdicts must compose with this build's —
            # build_corpus_incremental's equality bar pins both sides
            # to one matrix)
            centroids = semantic_centroids
        elif semantic_clusters is None:
            # K ∝ N (dedup.semantic_cluster_count): a pinned K is the
            # one measured super-linear scaler in the whole pipeline
            # (BASELINE §8 sf1 probe) — per-cluster blocks must stay
            # ~constant as the corpus grows. Costs one count of the
            # surviving embedding set (id-column scan).
            from streamy_db_spark.operators.dedup import (
                semantic_cluster_count,
            )

            semantic_clusters = semantic_cluster_count(emb.count())
        if semantic_centroids is None:
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


class IncrementalCorpusBuilder:
    """Batch-over-batch corpus refresh (r11 verdict item 6): the four
    incremental dedup gates composed over SHARED parquet state, plus a
    one-call publish of the stateless tail — so a corpus that arrives
    in waves (daily crawls) is deduplicated against everything already
    accepted without ever re-reading the accepted text, and re-publishes
    on whatever cadence training needs.

    Per-batch (``process_batch``): exact gate → near-dup gate →
    (opt-in) semantic gate → (opt-in) substring gate, each a stateful
    admission over ``<state_dir>/{exact,near,semantic,substr}``;
    survivors append to ``<state_dir>/corpus`` (with batch_seq) and
    substring span emissions — including RETRO spans for earlier
    batches' docs — append to ``<state_dir>/spans``.

    Publish (``publish``): span-strip the accepted corpus, then run the
    EXACT stateless tail of ``build_corpus`` (decontaminate →
    repetition filter → mixture → split → shuffle → pack → clustered
    write + compaction) over it. Decontamination and the repetition
    filter run at publish time ON PURPOSE: the one-shot build applies
    them AFTER the substring cut, and a batch-time verdict would see
    unstripped text for spans that only become duplicated (and are
    retro-emitted) in a later batch.

    Equality bar (tests/test_pipeline_e2e.py): over increasing-id
    batches of a bridge-free corpus (the regime where every gate's
    incremental == one-shot contract coincides — see each gate's
    docstring), ingesting the batches then ``publish()`` produces the
    SAME artifacts as one-shot ``build_corpus`` over the concatenated
    corpus with the same knobs (semantic centroids pinned to one
    matrix on both sides): same survivor id set, same train rows, same
    packed spans — every tail stage is deterministic (md5 split/shuffle
    buckets, fixed-order packing).

    Crash safety is the gates': each carries the family's
    batch_id/batch_seq replay-vs-re-send contract, so a crashed batch
    re-run re-emits its original acceptances and appends nothing new;
    ``corpus/`` appends are replay-safe the same way (acceptances are
    deterministic per batch, and re-appended rows are exact-row
    duplicates the builder drops on read via batch_seq-aware distinct).

    Scale shape: per-batch state traffic is the gates' — scan-only
    probes (no state-side Exchange), file-range pruned, O(batch) not
    O(state); the publish tail's only corpus-wide shuffles are the ONE
    layout shuffle of shuffle_corpus and the packing groupBy, exactly
    the one-shot build's.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        semantic_centroids=None,
        semantic_threshold: float | None = None,
        substring_window: int | None = None,
        sig_threshold: float = 0.5,
    ):
        from streamy_db_spark.operators.incremental import (
            IncrementalDeduper,
            IncrementalNearDeduper,
            IncrementalSemanticDeduper,
        )
        from streamy_db_spark.operators.incremental_substring import (
            IncrementalSubstrDeduper,
        )

        self.spark = spark
        root = state_dir.rstrip("/")
        self.state_dir = root
        self.corpus_path = root + "/corpus"
        self.spans_path = root + "/spans"
        self.exact = IncrementalDeduper(spark, root + "/exact")
        self.near = IncrementalNearDeduper(
            spark, root + "/near", sig_threshold=sig_threshold
        )
        self.semantic_threshold = semantic_threshold
        self.semantic = None
        if semantic_threshold is not None:
            # id_col is doc_id here: the gate keys on the DOC, and the
            # vector arrives as an extra column on the batch frame
            self.semantic = IncrementalSemanticDeduper(
                spark,
                root + "/semantic",
                centroids=semantic_centroids,
                threshold=semantic_threshold,
                id_col="doc_id",
                vec_col="embedding",
            )
        self.substring_window = substring_window
        self.substr = None
        if substring_window is not None:
            self.substr = IncrementalSubstrDeduper(
                spark, root + "/substr", window=substring_window
            )

    def process_batch(
        self,
        docs: DataFrame,
        batch_id: int,
        embeddings: DataFrame | None = None,
    ) -> dict[str, int]:
        """Admit one wave. ``docs``: (doc_id, source, text).
        ``embeddings``: (vec_id, embedding) rows for (a superset of)
        the batch docs — required when the semantic gate is configured;
        docs WITHOUT an embedding row pass that gate untouched (the
        one-shot build's left-join-keep-null rule). Returns the
        per-stage row receipt."""
        stats: dict[str, int] = {"rows_in": docs.count()}
        docs = self.exact.process_batch(docs, batch_id=batch_id)
        stats["rows_exact"] = docs.count()
        docs = self.near.process_batch(docs, batch_id=batch_id)
        stats["rows_near"] = docs.count()

        if self.semantic is not None:
            if embeddings is None:
                raise ValueError(
                    "semantic gate configured but no embeddings passed "
                    "for this batch"
                )
            with_vec = docs.join(
                embeddings.select(
                    F.col("vec_id").alias("doc_id"), "embedding"
                ),
                "doc_id",
                "inner",
            )
            no_vec = docs.join(
                embeddings.select(F.col("vec_id").alias("doc_id")),
                "doc_id",
                "left_anti",
            )
            kept = self.semantic.process_batch(with_vec, batch_id=batch_id)
            docs = kept.drop("embedding").unionByName(no_vec).localCheckpoint(
                eager=True
            )
            stats["rows_semantic"] = docs.count()

        if self.substr is not None:
            spans = self.substr.process_batch(docs, batch_id=batch_id)
            if not spans.isEmpty():
                spans.withColumn(
                    "batch_seq", F.lit(int(batch_id)).cast("long")
                ).write.mode("append").parquet(self.spans_path)
            stats["substring_spans_emitted"] = spans.count()

        if not docs.isEmpty():
            docs.select(
                "doc_id",
                "source",
                "text",
                F.lit(int(batch_id)).cast("long").alias("batch_seq"),
            ).write.mode("append").parquet(self.corpus_path)
        stats["rows_accepted"] = stats.get(
            "rows_semantic", stats["rows_near"]
        )
        return stats

    def survivors(self) -> DataFrame:
        """The accepted corpus so far, span-stripped. Crash-replayed
        appends are exact-row duplicates (same doc_id/text/batch_seq) —
        distinct drops them; span emissions merge across batches via
        merge_spans (overlap/adjacency collapse), which is exactly how
        the family's equality bar composes per-batch emissions."""
        from streamy_db_spark.operators.incremental_base import _read_state
        from streamy_db_spark.operators.substring import (
            merge_spans,
            strip_duplicated_spans,
        )

        corpus = _read_state(self.spark, self.corpus_path)
        if corpus is None:
            return self.spark.createDataFrame(
                [], "doc_id long, source string, text string"
            )
        corpus = corpus.select("doc_id", "source", "text").distinct()
        if self.substr is None:
            return corpus
        spans = _read_state(self.spark, self.spans_path)
        if spans is None:
            return corpus
        merged = merge_spans(
            spans.select("doc_id", "start_tok", "end_tok").distinct()
        )
        return strip_duplicated_spans(corpus, merged)

    def publish(
        self,
        out_dir: str,
        bench: DataFrame | None = None,
        mixture_weights: dict[str, int] | None = None,
        mixture_total_tokens: int = 2_000_000,
        n_shards: int = 16,
        seq_tokens: int = 2048,
        repetition_max: float = 0.5,
    ) -> dict[str, int]:
        """Run the stateless tail over the current survivor corpus and
        land the same two artifacts as ``build_corpus`` (shuffled train
        split at ``out_dir``, packed spans at ``<out_dir>.packed``).
        ``bench`` is the decontamination benchmark set (one text
        column); None skips that stage."""
        from streamy_db_spark.operators.decontam import decontaminate, tokens
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

        spark = self.spark
        stats: dict[str, int] = {}
        docs = self.survivors().localCheckpoint(eager=True)
        stats["rows_survivors"] = docs.count()

        if bench is not None:
            docs = decontaminate(docs, bench, n=8)
            stats["rows_decontaminated"] = docs.count()

        docs = (
            docs.join(
                repetition_scores(docs).select("doc_id", "top_bigram_frac"),
                "doc_id",
            )
            .filter(F.col("top_bigram_frac") < repetition_max)
            .drop("top_bigram_frac")
            .localCheckpoint(eager=True)
        )
        stats["rows_quality_kept"] = docs.count()

        if mixture_weights is None:
            srcs = [
                r.source for r in docs.select("source").distinct().collect()
            ]
            mixture_weights = {s: 1 for s in sorted(srcs)}
        docs = mixture_sample(docs, mixture_weights, mixture_total_tokens)
        stats["rows_mixture"] = docs.count()

        train = with_split(docs, "doc_id").filter(F.col("split") == "train")
        stats["rows_train"] = train.count()

        shuffled = shuffle_corpus(train, n_shards=n_shards)
        stats["rows_shuffled"] = shuffled.count()
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
        files.write_clustered(shuffled, out_dir, cluster_cols=["shard", "pos"])
        stats["files_compacted"] = files.compact_parquet(
            spark, out_dir, target_file_mb=128, cluster_cols=["shard", "pos"]
        )
        stats["rows_landed"] = spark.read.parquet(out_dir).count()
        return stats

    def compact_state(self, **kwargs) -> int:
        """Maintenance pass over every gate's state (small-files +
        re-cluster + sidecars; see each gate's compact_state) plus the
        corpus/ and spans/ appends."""
        from streamy_db_spark.operators.incremental_base import _read_state
        from streamy_db_spark.sources.files import compact_parquet

        total = self.exact.compact_state(**kwargs)
        total += self.near.compact_state(**kwargs)
        if self.semantic is not None:
            total += self.semantic.compact_state(**kwargs)
        if self.substr is not None:
            total += self.substr.compact_state(**kwargs)
        for path, cluster in (
            (self.corpus_path, ["doc_id"]),
            (self.spans_path, ["doc_id"]),
        ):
            if _read_state(self.spark, path) is not None:
                total += compact_parquet(
                    self.spark,
                    path,
                    cluster_cols=cluster,
                    dedupe_rows=True,
                    merge_schema=True,
                )
        return total


def build_corpus_incremental(
    spark: SparkSession,
    batches: list[DataFrame],
    state_dir: str,
    out_dir: str,
    embeddings: DataFrame | None = None,
    bench: DataFrame | None = None,
    first_batch_id: int = 0,
    **knobs,
) -> dict[str, object]:
    """One-call form of IncrementalCorpusBuilder: ingest ``batches`` in
    order (batch ids ``first_batch_id..``), then publish to
    ``out_dir``. Splits ``knobs`` between the builder (semantic/
    substring gate config) and publish (mixture/shard/packing knobs).
    Returns {"batches": [per-batch receipts], "publish": publish
    receipt}."""
    builder_keys = {
        "semantic_centroids",
        "semantic_threshold",
        "substring_window",
        "sig_threshold",
    }
    publish_keys = {
        "mixture_weights",
        "mixture_total_tokens",
        "n_shards",
        "seq_tokens",
        "repetition_max",
    }
    unknown = set(knobs) - builder_keys - publish_keys
    if unknown:
        # reject BEFORE ingesting: an unknown knob surfacing as a
        # publish() TypeError after every batch was gated would discard
        # minutes of state-mutating work at the last step (r12 review)
        raise TypeError(
            f"build_corpus_incremental: unknown knobs {sorted(unknown)}; "
            f"builder knobs: {sorted(builder_keys)}, publish knobs: "
            f"{sorted(publish_keys)}"
        )
    builder = IncrementalCorpusBuilder(
        spark,
        state_dir,
        **{k: v for k, v in knobs.items() if k in builder_keys},
    )
    receipts = []
    for i, batch in enumerate(batches):
        receipts.append(
            builder.process_batch(
                batch, batch_id=first_batch_id + i, embeddings=embeddings
            )
        )
    pub = builder.publish(
        out_dir,
        bench=bench,
        **{k: v for k, v in knobs.items() if k not in builder_keys},
    )
    return {"batches": receipts, "publish": pub}
