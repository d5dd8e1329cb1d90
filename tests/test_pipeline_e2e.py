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


# ---------------------------------------------------------------------------
# Incremental corpus build (r11 verdict item 6): the four gates composed
# over shared state + the stateless publish tail must equal the one-shot
# build over the concatenated corpus, on a fixture inside every gate's
# coincidence regime (increasing-id batches, bridge-free near-dups,
# chain-free semantic pairs — see each gate's docstring).

_PASSAGE = (
    "shared boilerplate license text repeated verbatim across documents "
    "alpha beta gamma delta epsilon"
)


def _inc_corpus_rows():
    rows = []
    uniq = 0

    def unique_text():
        nonlocal uniq
        uniq += 1
        return " ".join(
            f"unique{uniq}tok{j}word{(uniq * 7 + j) % 13}" for j in range(12)
        )

    # batch boundaries at 8/16: families deliberately cross them
    # long base so a single-token mutation keeps shingle Jaccard ~0.93
    # (one changed word of ~45 kills SHINGLE_W=3 trigrams ⇒ ~3 of ~43
    # shingles) — safely above the 0.5 signature-agreement threshold
    # even with 16-hash MinHash estimation noise
    near_base = " ".join(
        f"riverbank{j}story{(j * 3 + 1) % 11}" for j in range(44)
    ) + " dawn"
    for i in range(24):
        if i in (2, 9, 17):  # exact-dup family (same text, 3 batches)
            text = "exact duplicate family text " + "pad " * 8
        elif i in (4, 12):  # near-dup pair (one mutated token)
            text = near_base if i == 4 else near_base.replace("dawn", "dusk")
        elif i in (6, 13, 20):  # substring family: planted passage
            text = f"{unique_text()} {_PASSAGE} {unique_text()}"
        else:
            text = unique_text()
        rows.append((i, f"src{i % 3}", text))
    return rows


def _inc_embeddings(spark):
    # chain-free semantic space: docs 5 and 18 share one vector (the
    # semantic-dup pair); every other embedded doc gets its own
    # near-orthogonal one-hot direction, so no other pair clears 0.95
    import math

    # dim must exceed the doc count: at dim 16, k and k+16 would share
    # BOTH the main and the (5k+3) % dim secondary direction — eight
    # unintended exact-vector dup pairs
    def onehot(k, dim=32):
        v = [0.0] * dim
        v[k % dim] = 1.0
        v[(k * 5 + 3) % dim] = 0.1  # break exact ties between distinct docs
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    rows = [(i, onehot(i)) for i in range(0, 24, 1)]
    rows[18] = (18, onehot(5))  # duplicate of doc 5's vector
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_incremental_build_equals_one_shot(spark, tmp_path):
    """The family's standing equality bar lifted to the WHOLE pipeline:
    ingest three increasing-id batches through
    pipeline.build_corpus_incremental (all four gates on), publish, and
    the landed artifacts must equal one-shot build_corpus over the
    concatenated corpus with the same knobs and the same pinned
    semantic centroid matrix."""
    import os

    from streamy_db_spark.operators.similarity import ivf_train_centroids
    from streamy_db_spark.pipeline import build_corpus, build_corpus_incremental

    rows = _inc_corpus_rows()
    schema = "doc_id long, source string, text string"
    emb = _inc_embeddings(spark)
    centroids = ivf_train_centroids(emb, n_clusters=4)

    # one-shot side: materialize the concatenated corpus as an sf-dir
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        os.path.join(sf, "documents.parquet")
    )
    emb.coalesce(1).write.parquet(os.path.join(sf, "embeddings.parquet"))

    knobs = dict(
        mixture_total_tokens=10_000,
        n_shards=4,
        seq_tokens=64,
        repetition_max=0.5,
    )
    one_shot = build_corpus(
        spark,
        sf,
        str(tmp_path / "out_one"),
        semantic_threshold=0.95,
        semantic_centroids=centroids,
        substring_window=8,
        bench_docs=5,
        **knobs,
    )

    # incremental side: same corpus in three increasing-id waves; the
    # bench set mirrors build_corpus's (first 5 raw docs by id)
    batches = [
        spark.createDataFrame(rows[0:8], schema),
        spark.createDataFrame(rows[8:16], schema),
        spark.createDataFrame(rows[16:24], schema),
    ]
    bench = (
        spark.createDataFrame(rows, schema)
        .orderBy("doc_id")
        .limit(5)
        .select("text")
    )
    result = build_corpus_incremental(
        spark,
        batches,
        str(tmp_path / "state"),
        str(tmp_path / "out_inc"),
        embeddings=emb,
        bench=bench,
        semantic_threshold=0.95,
        semantic_centroids=centroids,
        substring_window=8,
        **knobs,
    )
    pub = result["publish"]

    # per-gate receipts saw real work: the cross-batch families landed
    receipts = result["batches"]
    assert receipts[1]["rows_in"] - receipts[1]["rows_exact"] >= 1  # dup of 2
    assert receipts[1]["rows_exact"] - receipts[1]["rows_near"] >= 1  # near 12
    assert receipts[2]["rows_near"] - receipts[2]["rows_semantic"] >= 1  # 18
    assert receipts[1].get("substring_spans_emitted", 0) >= 1  # retro for 6

    # artifact equality: the landed train split and the packed spans
    for key in ("rows_mixture", "rows_train", "rows_packed", "rows_landed",
                "train_tokens"):
        assert pub[key] == one_shot[key], (key, pub[key], one_shot[key])
    one = {
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "out_one")).collect()
    }
    inc = {
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "out_inc")).collect()
    }
    assert one == inc
    packed_one = sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "out_one") + ".packed")
        .collect()
    )
    packed_inc = sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "out_inc") + ".packed")
        .collect()
    )
    assert packed_one == packed_inc
    assert pub["rows_landed"] > 0  # non-vacuous


def test_incremental_build_replay_appends_nothing(spark, tmp_path):
    """Crash-replay of a whole batch through the composed builder:
    re-running the same (docs, batch_id) re-emits the original receipt
    and leaves the survivor corpus unchanged (the gates' idempotent
    replay contract lifted to the composition)."""
    from streamy_db_spark.pipeline import IncrementalCorpusBuilder

    rows = _inc_corpus_rows()
    schema = "doc_id long, source string, text string"
    b = IncrementalCorpusBuilder(spark, str(tmp_path / "state"))
    first = b.process_batch(spark.createDataFrame(rows[0:8], schema), 0)
    before = {r.doc_id for r in b.survivors().collect()}
    replay = b.process_batch(spark.createDataFrame(rows[0:8], schema), 0)
    after = {r.doc_id for r in b.survivors().collect()}
    assert first["rows_accepted"] == replay["rows_accepted"]
    assert before == after and before


def test_survivors_is_shuffle_free_and_layout_idempotent(spark, tmp_path):
    """r12 verdict item 1: survivors() must never Exchange the corpus
    TEXT — the old append-then-distinct form shuffled every accepted
    document's text once per publish. Without the substring gate the
    plan is a pure scan (ZERO Exchange); with it, the only Exchanges
    partition the span int-triples / merge ids (16 B rows), and the
    strip join reaches the text side as a broadcast. Also pins the
    mechanism that makes the distinct unnecessary: corpus/ lands as
    per-batch ``batch=<id>`` directories whose replay overwrites
    identical content."""
    import os

    from streamy_db_spark.pipeline import IncrementalCorpusBuilder
    from streamy_db_spark.plans.inspect import executed_plan

    rows = _inc_corpus_rows()
    schema = "doc_id long, source string, text string"

    # corpus-only path: a SCAN, full stop
    b0 = IncrementalCorpusBuilder(spark, str(tmp_path / "state0"))
    b0.process_batch(spark.createDataFrame(rows[0:8], schema), 0)
    b0.process_batch(spark.createDataFrame(rows[8:16], schema), 1)
    plan0 = executed_plan(b0.survivors())
    assert "Exchange" not in plan0, plan0

    state = str(tmp_path / "state")
    b = IncrementalCorpusBuilder(spark, state, substring_window=8)
    b.process_batch(spark.createDataFrame(rows[0:8], schema), 0)
    b.process_batch(spark.createDataFrame(rows[8:16], schema), 1)

    # the idempotent-sink layout is real: one batch=<id> dir per wave
    dirs = sorted(os.listdir(os.path.join(state, "corpus")))
    assert [d for d in dirs if d.startswith("batch=")] == ["batch=0", "batch=1"]

    surv = b.survivors()
    plan = executed_plan(surv)
    # the span-strip join rides a broadcast, like every text-side join;
    # a SortMergeJoin would mean the corpus text shuffled to meet spans
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # every shuffle moves SPAN-side rows (the triple distinct or the
    # merge's per-doc id) — never the corpus text. Checked on the
    # formatted plan's Exchange INPUT lists: plan-string Exchange lines
    # print only partitioning keys, so the old line check passed even
    # for a doc_id-keyed shuffle of the text-bearing frame (r13
    # review — '_id#' also matched 'doc_id#').
    from streamy_db_spark.plans.inspect import shuffle_exchange_inputs

    surv.collect()  # finalize AQE so the inputs are the real plan's
    for inp in shuffle_exchange_inputs(surv):
        assert "text#" not in inp, inp


def test_legacy_flat_state_layout_is_refused(spark, tmp_path):
    """r13 review: a state dir written by the pre-r13 flat-append
    layout (part files at corpus/ root instead of batch=<id> dirs)
    must be refused loudly at construction — mixing the layouts breaks
    Spark partition discovery, and the old layout's crash-replay
    duplicates would silently survive now that survivors() trusts the
    per-batch overwrite for idempotence."""
    import os

    import pytest

    from streamy_db_spark.pipeline import IncrementalCorpusBuilder

    state = str(tmp_path / "state")
    legacy = os.path.join(state, "corpus")
    os.makedirs(legacy)
    with open(os.path.join(legacy, "part-00000.snappy.parquet"), "wb") as f:
        f.write(b"PAR1")
    with pytest.raises(ValueError, match="legacy flat-append"):
        IncrementalCorpusBuilder(spark, state)
    # a batch=<id> layout (what this builder writes) constructs fine
    state2 = str(tmp_path / "state2")
    os.makedirs(os.path.join(state2, "corpus", "batch=0"))
    IncrementalCorpusBuilder(spark, state2)


def test_corpus_compact_guarded_and_layout_preserving(spark, tmp_path):
    """r12 verdict item 7: corpus/ and spans/ compaction refuses under
    a fresh stream heartbeat exactly like every gate state dir, and the
    compaction that does run preserves the per-batch directory layout
    (folding batches into shared files would break replay overwrite)."""
    import os

    import pytest

    from streamy_db_spark.operators.incremental_base import (
        touch_stream_heartbeat,
    )
    from streamy_db_spark.pipeline import IncrementalCorpusBuilder

    rows = _inc_corpus_rows()
    schema = "doc_id long, source string, text string"
    from pyspark.sql import functions as F

    state = str(tmp_path / "state")
    b = IncrementalCorpusBuilder(spark, state, substring_window=8)
    b.process_batch(spark.createDataFrame(rows[0:8], schema), 0)
    corpus_dir = os.path.join(state, "corpus")
    # batch=1 written through the layout contract directly with 4
    # partitions — the gate path coalesces tiny test batches to one
    # file, and compaction needs a multi-file dir to bind on
    spark.createDataFrame(rows[8:16], schema).withColumn(
        "batch_seq", F.lit(1).cast("long")
    ).repartition(4).write.mode("overwrite").parquet(
        corpus_dir + "/batch=1"
    )
    before = {tuple(r) for r in b.survivors().collect()}
    n_files_before = len(
        [
            f
            for f in os.listdir(os.path.join(corpus_dir, "batch=1"))
            if f.endswith(".parquet")
        ]
    )
    assert n_files_before > 1

    touch_stream_heartbeat(spark, corpus_dir)
    with pytest.raises(RuntimeError, match="compact_state refused"):
        b.compact_state()
    # refusal left everything untouched
    assert {tuple(r) for r in b.survivors().collect()} == before

    out = b.compact_state(force=True)
    assert out > 0
    dirs = sorted(
        d for d in os.listdir(corpus_dir) if d.startswith("batch=")
    )
    assert dirs == ["batch=0", "batch=1"]  # layout preserved
    n_files_after = len(
        [
            f
            for f in os.listdir(os.path.join(corpus_dir, "batch=1"))
            if f.endswith(".parquet")
        ]
    )
    assert n_files_after < n_files_before
    assert {tuple(r) for r in b.survivors().collect()} == before

    # per-gate-only knobs are rejected at the composition level (r12
    # advice: the **kwargs fan-out turned them into sibling TypeErrors)
    with pytest.raises(TypeError):
        b.compact_state(min_files=2)


def test_gated_survivors_never_shuffles_text(spark, tmp_path):
    """r13: the publish quality gates consult their verdict caches over
    the narrow (doc_id, text-md5) projection and apply verdicts as
    drop-id anti-joins — the corpus TEXT must never ride an Exchange
    (the r12 cache design joined the full docs frame on the hash key,
    re-introducing at publish time the corpus-wide text shuffle item 1
    had just removed from survivors()). Gated on the AQE FINAL plan in
    both cache regimes: fully warm (steady publish) and partial-miss
    (one new wave)."""
    from streamy_db_spark.pipeline import IncrementalCorpusBuilder

    rows = _inc_corpus_rows()
    schema = "doc_id long, source string, text string"
    bench = (
        spark.createDataFrame(rows, schema)
        .orderBy("doc_id")
        .limit(5)
        .select("text")
    )
    b = IncrementalCorpusBuilder(spark, str(tmp_path / "state"))
    b.process_batch(spark.createDataFrame(rows[0:8], schema), 0)
    b.process_batch(spark.createDataFrame(rows[8:16], schema), 1)
    b.publish(str(tmp_path / "out1"), bench=bench, mixture_total_tokens=10_000)

    def assert_no_text_exchange():
        from streamy_db_spark.plans.inspect import shuffle_exchange_inputs

        df, stats = b.gated_survivors(bench=bench, repetition_max=0.5)
        df.collect()  # let AQE finalize the join strategies
        # formatted-plan Exchange INPUT lists, not plan-string lines:
        # the string form prints only partitioning keys, so the r12
        # cache regression (full docs frame shuffled on the __th hash
        # key) would have passed a line-based check (r13 review)
        for inp in shuffle_exchange_inputs(df):
            assert "text#" not in inp, inp
        return stats

    # warm regime: every verdict cached, zero re-scores, zero text moves
    stats = assert_no_text_exchange()
    assert stats["publish_rescored_decon"] == 0
    assert stats["publish_rescored_rep"] == 0

    # partial-miss regime: a new wave re-scores only itself; the miss
    # restriction and the drop-id application still move ids only
    b.process_batch(spark.createDataFrame(rows[16:24], schema), 2)
    stats = assert_no_text_exchange()
    assert 0 < stats["publish_rescored_rep"] < stats["rows_survivors"]


def test_second_publish_rescores_nothing(spark, tmp_path):
    """r12 verdict item 5: decontamination + repetition verdicts are
    cached on post-strip content, so a second publish over unchanged
    state re-scores 0 documents and lands identical artifacts — the
    publish tail stops being the next super-linear term at wave
    cadence. A NEW batch then re-scores only itself."""
    import os

    from streamy_db_spark.pipeline import IncrementalCorpusBuilder

    rows = _inc_corpus_rows()
    schema = "doc_id long, source string, text string"
    bench = (
        spark.createDataFrame(rows, schema)
        .orderBy("doc_id")
        .limit(5)
        .select("text")
    )
    knobs = dict(
        bench=bench, mixture_total_tokens=10_000, n_shards=4, seq_tokens=64
    )
    b = IncrementalCorpusBuilder(
        spark, str(tmp_path / "state"), substring_window=8
    )
    b.process_batch(spark.createDataFrame(rows[0:8], schema), 0)
    b.process_batch(spark.createDataFrame(rows[8:16], schema), 1)

    out1 = str(tmp_path / "out1")
    pub1 = b.publish(out1, **knobs)
    assert pub1["publish_rescored_decon"] == pub1["rows_survivors"] > 0
    assert pub1["publish_rescored_rep"] > 0

    out2 = str(tmp_path / "out2")
    pub2 = b.publish(out2, **knobs)
    assert pub2["publish_rescored_decon"] == 0
    assert pub2["publish_rescored_rep"] == 0
    for key in ("rows_survivors", "rows_decontaminated", "rows_quality_kept",
                "rows_mixture", "rows_train", "rows_packed", "rows_landed",
                "train_tokens"):
        assert pub2[key] == pub1[key], (key, pub2[key], pub1[key])
    a1 = {tuple(r) for r in spark.read.parquet(out1).collect()}
    a2 = {tuple(r) for r in spark.read.parquet(out2).collect()}
    assert a1 == a2 and a1
    p1 = sorted(
        tuple(r) for r in spark.read.parquet(out1 + ".packed").collect()
    )
    p2 = sorted(
        tuple(r) for r in spark.read.parquet(out2 + ".packed").collect()
    )
    assert p1 == p2

    # a third wave re-scores ONLY its own novel docs (retro spans for
    # earlier docs, if any, change those docs' content keys too — the
    # cache key is content, not doc_id)
    rec3 = b.process_batch(spark.createDataFrame(rows[16:24], schema), 2)
    pub3 = b.publish(str(tmp_path / "out3"), **knobs)
    assert 0 < pub3["publish_rescored_rep"] < pub3["rows_survivors"]
    assert pub3["rows_survivors"] > pub1["rows_survivors"]
    assert rec3["rows_accepted"] > 0
    # the cache landed on disk under the state root
    assert os.path.isdir(str(tmp_path / "state" / "publish_cache" / "rep"))
