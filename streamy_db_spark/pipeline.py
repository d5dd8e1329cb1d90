"""One-call training-corpus build: the full operator chain composed the
way a production corpus job runs it — profile → exact dedup → near-dup
keepers → decontaminate → repetition filter → split → mixture rebalance
→ deterministic shuffle → pack → clustered write → compaction.

tests/test_pipeline_e2e.py asserts row accounting per stage at sf0.001;
bench.py times this whole function at sf0.1 and records it as
``corpus_build_seconds`` — the LLM-pipeline headline number next to the
protocol replay's txn/s (r7 verdict item 5).

Scale shape is inherited from the stages (each documents its own): the
only corpus-wide shuffles are the near-dup pair pipeline's banded join
(shingle-set payloads), the packing groupBy, and the ONE layout shuffle
of shuffle_corpus; everything else is scan-side, and every dedup /
quality VERDICT lands on the corpus as a drop-id anti-join over narrow
id frames (r13) — the document text itself never rides an Exchange
outside the two layout shuffles. No driver collect()s on corpus-sized
data (profile returns column-cardinality rows; dedup's union-find fold
is capped).

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
    *,  # knobs keyword-only: inserting one mid-signature silently
    # remapped positional callers twice (r11 substring gate, r12
    # semantic_centroids) — this class of bug is now unrepresentable
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
    from streamy_db_spark.operators.dedup import (
        connected_components,
        dedupe_exact,
    )
    from streamy_db_spark.operators.minhash import minhash_near_dup_pairs
    from streamy_db_spark.operators.profile import profile_table
    from streamy_db_spark.operators.sampling import (
        mixture_sample,
        shuffle_corpus,
        with_split,
    )
    from streamy_db_spark.operators.text_quality import (
        pack_sequences,
        with_repetition_score,
    )
    from streamy_db_spark.sources import files
    from streamy_db_spark.sources.tables import load_table

    stats: dict[str, int] = {}
    from streamy_db_spark.sources.tables import spread

    # spread ONCE at load (r13, guide §2.6): the sf documents table
    # scans as a single partition, and every downstream doc-level
    # stage applies its verdicts as broadcast anti-joins that PRESERVE
    # the probe side's partitioning — so the repetition scoring,
    # decontamination gram pass and substring windowing all ran as
    # single tasks with 31 cores idle. One early hash exchange of the
    # text buys full parallelism for the whole build; on a real corpus
    # the scan already has thousands of splits and this is a cheap
    # co-location (spread's own contract).
    docs = spread(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "text"
        ),
        "doc_id",
    )

    # 0. profile the raw input (the trust-but-verify pass)
    prof = profile_table(docs).collect()
    stats["profile_columns"] = len(prof)
    stats["rows_raw"] = next(r.n_rows for r in prof)

    # 1. exact dedup
    docs = dedupe_exact(docs)
    stats["rows_exact_dedup"] = docs.count()

    # 2. near-dup group resolution → keepers only, applied as a
    # loser-id ANTI-join: the losers are exactly the component nodes
    # whose min-label isn't themselves (docs outside any pair are
    # implicit singletons/keepers), so the verdict moves near-dup-loser
    # ids only — the previous keeper inner-join shuffled the corpus
    # text to meet a keeper row per doc (r13, same drop-id shape as
    # the publish gates)
    pairs = minhash_near_dup_pairs(docs)
    losers = (
        connected_components(pairs)
        .filter(F.col("node") != F.col("keeper"))
        .select(F.col("node").alias("doc_id"))
    )
    docs = docs.join(losers, "doc_id", "left_anti")
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
        # drop-id anti-join (r13): docs without an embedding row are
        # kept by absence from the drop set — the same left-join
        # keep-if-null semantics as before, moving dropped-dup ids
        # instead of the corpus text
        docs = docs.join(
            verdicts.filter(~F.col("keep")).select(
                F.col("vec_id").alias("doc_id")
            ),
            "doc_id",
            "left_anti",
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

    # 4. repetition filter — scored IN PLACE (per-row projection, one
    # scan): the score is a pure function of the text, so the previous
    # join-back-on-doc_id shape exchanged the corpus text for nothing
    docs = (
        with_repetition_score(docs)
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
    ``corpus/`` and ``spans/`` land as per-batch ``batch=<id>``
    directories written with OVERWRITE (the idempotent-sink recipe,
    streaming/sinks.idempotent_parquet_sink) — acceptances are
    deterministic per batch, so a crash-replayed batch REWRITES its own
    directory with identical content instead of appending duplicates,
    and ``survivors()`` needs no dedup pass at all (r12 verdict item 1:
    the previous append-then-distinct form shuffled the entire accepted
    TEXT once per publish — the single largest avoidable Exchange in
    the pipeline; tests/test_pipeline_e2e.py plan-gates its absence).

    Scale shape: per-batch state traffic is the gates' — scan-only
    probes (no state-side Exchange), file-range pruned, O(batch) not
    O(state); the publish tail's only TEXT-bearing shuffles are the ONE
    layout shuffle of shuffle_corpus and the packing groupBy, exactly
    the one-shot build's (survivors() itself is a scan + the span-strip
    broadcast join — shuffle-free; the quality gates consult their
    verdict caches over the NARROW (doc_id, text-md5) projection and
    apply verdicts as drop-id anti-joins, so cache consultation moves
    48-byte rows, never documents — plan-gated in
    tests/test_pipeline_e2e.py).
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
        self.publish_cache_path = root + "/publish_cache"
        # corpus/ and spans/ are batch=<id> partition dirs since the
        # append→overwrite idempotence change; a state dir written by
        # the older flat-append layout would make Spark's partition
        # discovery fail ("conflicting directory structures") on the
        # first mixed write — and, worse, its crash-replay duplicates
        # would silently survive now that survivors() has no distinct.
        # Refuse loudly instead of corrupting (r13 review).
        for p in (self.corpus_path, self.spans_path):
            self._reject_legacy_flat_layout(p)
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

    @staticmethod
    def _reject_legacy_flat_layout(path: str) -> None:
        """Raise if ``path`` holds data files at its root (the pre-r13
        flat-append layout) instead of ``batch=<id>`` directories."""
        import os

        if not os.path.isdir(path):
            return
        flat = [
            e
            for e in os.listdir(path)
            if os.path.isfile(os.path.join(path, e))
            and e.endswith(".parquet")
        ]
        if flat:
            raise ValueError(
                f"{path} uses the legacy flat-append state layout "
                f"({len(flat)} root-level parquet files, e.g. "
                f"{flat[0]!r}); this builder writes batch=<id> "
                "directories and its replay-idempotence contract does "
                "not hold over flat appends. Rebuild the state dir by "
                "re-admitting the corpus through process_batch."
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
                # per-batch dir + overwrite = idempotent on batch_id
                # (sinks.idempotent_parquet_sink recipe): a replay
                # rewrites identical content, never duplicates
                spans.withColumn(
                    "batch_seq", F.lit(int(batch_id)).cast("long")
                ).write.mode("overwrite").parquet(
                    f"{self.spans_path}/batch={int(batch_id)}"
                )
            stats["substring_spans_emitted"] = spans.count()

        if not docs.isEmpty():
            docs.select(
                "doc_id",
                "source",
                "text",
                F.lit(int(batch_id)).cast("long").alias("batch_seq"),
            ).write.mode("overwrite").parquet(
                f"{self.corpus_path}/batch={int(batch_id)}"
            )
        stats["rows_accepted"] = stats.get(
            "rows_semantic", stats["rows_near"]
        )
        return stats

    def survivors(self) -> DataFrame:
        """The accepted corpus so far, span-stripped — a SCAN, not a
        shuffle. Crash-replayed batches overwrote their own
        ``batch=<id>`` directory (process_batch), so the read needs no
        distinct: the previous append-then-distinct form exchanged the
        entire accepted TEXT once per publish (r12 verdict item 1;
        plan-gated shuffle-free in tests/test_pipeline_e2e.py). Span
        emissions merge across batches via merge_spans
        (overlap/adjacency collapse — identical retro spans emitted by
        different batches collapse there too), which is exactly how the
        family's equality bar composes per-batch emissions."""
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
        # "batch" arrives as the partition-discovery column of the
        # per-batch directory layout — an implementation detail, like
        # the sink reader's (streaming/sinks.read_sink)
        corpus = corpus.select("doc_id", "source", "text")
        if self.substr is None:
            return corpus
        spans = _read_state(self.spark, self.spans_path)
        if spans is None:
            return corpus
        merged = merge_spans(
            spans.select("doc_id", "start_tok", "end_tok").distinct()
        )
        return strip_duplicated_spans(corpus, merged)

    def _bench_fingerprint(self, bench: DataFrame, n: int) -> str:
        """Content identity of the decontamination gate: md5 over the
        SORTED distinct benchmark gram hashes (order-independent, so
        partitioning can't change it). Benchmark sets are tiny by
        nature (thousands of eval items), so the collect_list is
        bench-gram-sized, never corpus-sized."""
        from streamy_db_spark.operators.decontam import _gram_hashes

        bg = (
            _gram_hashes(bench.select("text"), "text", n, "__g")
            .select("__g")
            .distinct()
        )
        row = bg.agg(
            F.md5(
                F.encode(
                    F.concat_ws(
                        ",",
                        F.sort_array(
                            F.collect_list(F.col("__g").cast("string"))
                        ),
                    ),
                    "UTF-8",
                )
            ).alias("fp")
        ).collect()[0]
        return row.fp or "empty"

    def _restrict_to(
        self, docs: DataFrame, ids: DataFrame, n_ids: int, n_docs: int
    ) -> DataFrame:
        """``docs`` rows whose doc_id is in ``ids`` — without touching
        the text when it can be avoided: all-ids short-circuits to
        ``docs`` (the first-publish case), otherwise a semi-join whose
        id side AQE broadcasts at wave-cadence sizes. The corpus text
        only moves if the id set is too large to broadcast — exactly
        when the re-scoring work itself dwarfs the move."""
        if n_ids == n_docs:
            return docs
        return docs.join(ids.select("doc_id"), "doc_id", "left_semi")

    def _decon_gate(
        self, docs: DataFrame, bench: DataFrame, stats: dict, n_docs: int
    ) -> DataFrame:
        """Decontamination as a DROP-ID anti-join (lazy result): consult
        the verdict cache over the NARROW (doc_id, __th) projection,
        re-score only misses, append their verdicts to the cache, and
        return ``docs`` minus contaminated ids. The corpus text never
        shuffles: cache consultation moves 48-byte rows, re-scoring
        scans the miss docs in place (contaminated_ids is a broadcast
        gram probe), and the final anti-join's id side is
        verdict-derived (AQE broadcasts it)."""
        from streamy_db_spark.operators.decontam import contaminated_ids
        from streamy_db_spark.operators.incremental_base import _read_state

        spark = self.spark
        decon_n = 8
        bench_fp = self._bench_fingerprint(bench, decon_n)
        cache_path = self.publish_cache_path + "/decon"
        cache = _read_state(spark, cache_path)
        if cache is not None:
            cached = (
                cache.filter(
                    (F.col("bench_fp") == bench_fp)
                    & (F.col("n") == decon_n)
                )
                .select(F.col("text_hash").alias("__th"), "contaminated")
                .distinct()
            )
        else:
            cached = spark.createDataFrame(
                [], "__th string, contaminated boolean"
            )
        verd = docs.select("doc_id", "__th").join(cached, "__th", "left")
        miss = (
            verd.filter(F.col("contaminated").isNull())
            .select("doc_id", "__th")
            .localCheckpoint(eager=True)
        )
        n_miss = miss.count()
        stats["publish_rescored_decon"] = n_miss
        bad_ids = verd.filter(F.col("contaminated")).select("doc_id")
        if n_miss:
            miss_docs = self._restrict_to(docs, miss, n_miss, n_docs)
            bad = contaminated_ids(miss_docs, bench, n=decon_n)
            fresh = (
                miss.join(
                    F.broadcast(bad.withColumn("contaminated", F.lit(True))),
                    "doc_id",
                    "left",
                )
                .withColumn(
                    "contaminated",
                    F.coalesce(F.col("contaminated"), F.lit(False)),
                )
                .localCheckpoint(eager=True)
            )
            fresh.select(
                F.col("__th").alias("text_hash"),
                "contaminated",
                F.lit(bench_fp).alias("bench_fp"),
                F.lit(decon_n).alias("n"),
            ).distinct().write.mode("append").parquet(cache_path)
            bad_ids = bad_ids.unionByName(
                fresh.filter(F.col("contaminated")).select("doc_id")
            )
        return docs.join(bad_ids, "doc_id", "left_anti")

    def _rep_gate(
        self, docs: DataFrame, repetition_max: float, stats: dict, n_docs: int
    ) -> DataFrame:
        """Repetition filter as a DROP-ID anti-join (lazy result), same
        shape as the decon gate: the score is a pure per-row projection
        (text_quality.with_repetition_score), so misses re-score with
        ZERO joins, and only ids move to apply the verdicts. The
        repetition_max knob stays OUTSIDE the cache — it stores the
        score, and the drop set is derived per publish."""
        from streamy_db_spark.operators.incremental_base import _read_state
        from streamy_db_spark.operators.text_quality import (
            with_repetition_score,
        )

        spark = self.spark
        rep_cache_path = self.publish_cache_path + "/rep"
        cache = _read_state(spark, rep_cache_path)
        if cache is not None:
            cached = cache.select(
                F.col("text_hash").alias("__th"), "top_bigram_frac"
            ).distinct()
        else:
            cached = spark.createDataFrame(
                [], "__th string, top_bigram_frac double"
            )
        verd = docs.select("doc_id", "__th").join(cached, "__th", "left")
        miss = (
            verd.filter(F.col("top_bigram_frac").isNull())
            .select("doc_id", "__th")
            .localCheckpoint(eager=True)
        )
        n_miss = miss.count()
        stats["publish_rescored_rep"] = n_miss
        drop_ids = verd.filter(
            F.col("top_bigram_frac") >= repetition_max
        ).select("doc_id")
        if n_miss:
            miss_docs = self._restrict_to(docs, miss, n_miss, n_docs)
            scored = (
                with_repetition_score(miss_docs)
                .select("doc_id", "__th", "top_bigram_frac")
                .localCheckpoint(eager=True)
            )
            scored.select(
                F.col("__th").alias("text_hash"), "top_bigram_frac"
            ).distinct().write.mode("append").parquet(rep_cache_path)
            drop_ids = drop_ids.unionByName(
                scored.filter(
                    F.col("top_bigram_frac") >= repetition_max
                ).select("doc_id")
            )
        return docs.join(drop_ids, "doc_id", "left_anti")

    def gated_survivors(
        self,
        bench: DataFrame | None = None,
        repetition_max: float = 0.5,
    ) -> tuple[DataFrame, dict]:
        """The survivor corpus with the decontamination + repetition
        quality gates applied — the text-bearing head of ``publish``,
        returned LAZY so its plan is inspectable (the e2e suite gates
        that no Exchange carries the corpus text; the only wide ops on
        text-bearing frames downstream are shuffle_corpus's ONE layout
        shuffle and the packing groupBy).

        Verdicts are CACHED under ``<state_dir>/publish_cache`` keyed
        on the md5 of the POST-STRIP text (r12 verdict item 5): both
        gates are pure functions of the document text (decontam
        additionally of the benchmark gram set, folded into the cache
        key as a content fingerprint), so at wave-by-wave publish
        cadence only changed/new documents re-score — a retro span
        that shortens an old doc changes its content key and re-scores
        exactly that doc. The content key is 128-bit md5, not a 64-bit
        hash: a collision would transplant a VERDICT across documents
        (possibly keeping a contaminated doc), the anti-conservative
        direction. Stats record ``publish_rescored_decon`` /
        ``publish_rescored_rep`` (a second publish over unchanged
        state re-scores 0) and ``rows_survivors`` /
        ``rows_decontaminated``."""
        stats: dict[str, int] = {}
        docs = self.survivors().localCheckpoint(eager=True)
        stats["rows_survivors"] = n_now = docs.count()
        docs = docs.withColumn(
            "__th", F.md5(F.encode(F.col("text"), "UTF-8"))
        )
        if bench is not None:
            docs = self._decon_gate(docs, bench, stats, n_now)
            stats["rows_decontaminated"] = n_now = docs.count()
        docs = self._rep_gate(docs, repetition_max, stats, n_now)
        return docs.drop("__th"), stats

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
        column); None skips that stage. The quality gates and their
        verdict caching live in ``gated_survivors`` (see its docstring
        for the cache-key and scale-shape contract)."""
        from streamy_db_spark.operators.decontam import tokens
        from streamy_db_spark.operators.sampling import (
            mixture_sample,
            shuffle_corpus,
            with_split,
        )
        from streamy_db_spark.operators.text_quality import pack_sequences
        from streamy_db_spark.sources import files

        spark = self.spark
        docs, stats = self.gated_survivors(
            bench=bench, repetition_max=repetition_max
        )
        docs = docs.localCheckpoint(eager=True)
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

    def compact_state(
        self,
        target_file_mb: int = 128,
        force: bool = False,
        stream_heartbeat_max_age_s: float = 600.0,
    ) -> int:
        """Maintenance pass over every gate's state (small-files +
        re-cluster + sidecars; see each gate's compact_state) plus the
        corpus/ and spans/ batch directories.

        Only the knobs COMMON to all four gates are accepted (r12
        advice: a blind ``**kwargs`` fan-out made any per-gate knob —
        ``min_files`` vs ``bands_min_files`` etc. — a TypeError on the
        sibling gates; tune an individual gate through its own
        ``compact_state``).

        corpus/ and spans/ are guarded exactly like the gate state dirs
        (r12 verdict item 7): refuse while a stream heartbeat on the
        directory is fresh, and re-check immediately before each swap
        (compact_guard as ``pre_swap_check``) — the moment someone
        wires process_batch into foreachBatch, a concurrent batch
        overwrite racing the write-then-swap rename is the r6 race
        again.

        Compaction is PER ``batch=<id>`` DIRECTORY: merging batches
        into flat files would break the replay contract (a replayed
        batch overwrites ``batch=<id>``; if its rows had been folded
        into a shared file they would now exist twice). Wave-granular
        batches keep the directory count small; within a wave this
        collapses the one-file-per-task write fanout."""
        from streamy_db_spark.operators.incremental_base import (
            _guard_compact_vs_stream,
            compact_guard,
        )
        from streamy_db_spark.sources.files import compact_parquet, hadoop_fs

        knobs = dict(
            target_file_mb=target_file_mb,
            force=force,
            stream_heartbeat_max_age_s=stream_heartbeat_max_age_s,
        )
        total = self.exact.compact_state(**knobs)
        total += self.near.compact_state(**knobs)
        if self.semantic is not None:
            total += self.semantic.compact_state(**knobs)
        if self.substr is not None:
            total += self.substr.compact_state(**knobs)
        for path, cluster in (
            (self.corpus_path, ["doc_id"]),
            (self.spans_path, ["doc_id"]),
        ):
            _guard_compact_vs_stream(
                self.spark, path, force, stream_heartbeat_max_age_s
            )
            recheck = compact_guard(
                self.spark, path, force, stream_heartbeat_max_age_s
            )
            fs, mk = hadoop_fs(self.spark, path)
            if fs is None:  # Spark Connect: compact from a classic session
                continue
            statuses = fs.globStatus(mk(path + "/batch=*")) or []
            for st in statuses:
                if not st.isDirectory():
                    continue
                bdir = st.getPath().toString()
                data_files = [
                    f
                    for f in fs.listStatus(st.getPath())
                    if f.isFile()
                    and not f.getPath().getName().startswith("_")
                ]
                if len(data_files) <= 1:
                    continue  # already one file: nothing to collapse
                total += compact_parquet(
                    self.spark,
                    bdir,
                    target_file_mb=target_file_mb,
                    cluster_cols=cluster,
                    merge_schema=True,
                    pre_swap_check=recheck,
                )
        # publish verdict caches: flat append dirs (no batch layout —
        # appended rows are pure (content key, verdict) facts, so
        # crash-replay duplicates are EXACT rows dedupe_rows drops)
        from streamy_db_spark.operators.incremental_base import _read_state

        for sub in ("decon", "rep"):
            path = f"{self.publish_cache_path}/{sub}"
            if _read_state(self.spark, path) is None:
                continue
            _guard_compact_vs_stream(
                self.spark, path, force, stream_heartbeat_max_age_s
            )
            total += compact_parquet(
                self.spark,
                path,
                target_file_mb=target_file_mb,
                cluster_cols=["text_hash"],
                dedupe_rows=True,
                merge_schema=True,
                pre_swap_check=compact_guard(
                    self.spark, path, force, stream_heartbeat_max_age_s
                ),
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
