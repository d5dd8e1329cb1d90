"""Every declared query must hash-match its DuckDB oracle at sf0.01 —
a local replica of the driver's correctness gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare

QUERIES = entrymod.queries()
ORACLE = entrymod.oracle_sql()


def _test_only_registry():
    """Queries that do not hold driver slots: the quadratic recall
    baselines and subsumed/approximate queries rotated out in r4-r6,
    plus operators added after the 50-slot driver window filled. Those
    with a TEST_ORACLE entry stay hash-checked here; approximate ones
    (q_ann_lsh, q_dedup_near_lsh) are rows-only here and recall-guarded
    by their dedicated tests below."""
    from streamy_db_spark.functions import scalar
    from streamy_db_spark.operators import (
        decontam,
        dedup,
        merge,
        minhash,
        multimodal,
        profile,
        relational,
        relational_ext2,
        sampling,
        similarity,
        substring,
        text_quality,
    )

    qs, osql = {}, {}
    for mod in (
        decontam,
        dedup,
        merge,
        minhash,
        multimodal,
        profile,
        relational,
        relational_ext2,
        sampling,
        scalar,
        similarity,
        substring,
        text_quality,
    ):
        qs.update(mod.TEST_QUERIES)
        osql.update(getattr(mod, "TEST_ORACLE", {}))
    return qs, osql


TEST_ONLY_QUERIES, TEST_ONLY_ORACLE = _test_only_registry()


def test_every_query_has_oracle_or_is_declared():
    missing = set(ORACLE) - set(QUERIES)
    assert not missing, f"oracle entries without queries: {missing}"
    assert set(TEST_ONLY_ORACLE) <= set(TEST_ONLY_QUERIES)
    assert not set(TEST_ONLY_QUERIES) & set(QUERIES)


@pytest.mark.parametrize(
    "name", sorted(set(TEST_ONLY_QUERIES) - set(TEST_ONLY_ORACLE))
)
def test_unregistered_rows_only_query_runs(spark, sf_oracle, name):
    df = TEST_ONLY_QUERIES[name](spark, sf_oracle)
    assert df.columns, name
    assert df.count() >= 0


@pytest.mark.parametrize("name", sorted(TEST_ONLY_ORACLE))
def test_unregistered_baseline_matches_oracle(spark, sf_oracle, name):
    df = TEST_ONLY_QUERIES[name](spark, sf_oracle)
    ok, msg = compare(df, TEST_ONLY_ORACLE[name], sf_oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, sf_oracle, name):
    df = QUERIES[name](spark, sf_oracle)
    ok, msg = compare(df, ORACLE[name], sf_oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_query_runs(spark, sf_oracle, name):
    """Queries without an exact SQL oracle (approximate ops) must still
    run and return rows with a stable schema."""
    df = QUERIES[name](spark, sf_oracle)
    assert df.columns, name
    assert df.count() >= 0


def test_ann_lsh_recall(spark, sf_oracle):
    """The LSH ANN path must find most of the exact top-k (recall is the
    whole point of the approximation — guard it doesn't silently break)."""
    from streamy_db_spark.operators import similarity

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.q_knn_batch(spark, sf_oracle).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.q_ann_lsh(spark, sf_oracle).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"ANN recall collapsed: {recall:.2f}"


def test_sketch_aggs_accuracy(spark, sf_oracle):
    """Sketch aggregates have no exact oracle; guard their error bounds
    against the exact aggregates instead (HLL++ rsd=0.02 → allow 6%=3σ;
    percentile_approx accuracy=10k → near-exact on 60k rows, allow 1%)."""
    from streamy_db_spark.operators import relational_ext2

    approx = {
        r["o_orderpriority"]: r
        for r in relational_ext2.q_sketch_aggs(spark, sf_oracle).collect()
    }
    exact = {
        r["o_orderpriority"]: r
        for r in relational_ext2.q_distinct_agg(spark, sf_oracle).collect()
    }
    assert set(approx) == set(exact)
    for prio, a in approx.items():
        e = exact[prio]
        assert a["n_orders"] == e["n_orders"], prio
        rel = abs(a["n_cust_approx"] - e["n_cust"]) / e["n_cust"]
        assert rel <= 0.06, (prio, a["n_cust_approx"], e["n_cust"])


def test_dedup_events_hour_boundary(spark):
    """Planted boundary timestamps (r6 verdict item 3): a float-div hour
    bucket double-rounds UP for ts_ns within ~256 ns below an hour edge
    (ns longs exceed double's 2^53 exactness), landing one hour off the
    oracle's integer floor-div. Pin the integer-div behavior on planted
    near-edge values on BOTH sides of several hour boundaries."""
    from streamy_db_spark.operators.relational import (
        HOUR_MS,
        HOUR_NS,
        dedup_events_hourly,
    )

    edges = [HOUR_NS, 2 * HOUR_NS, 1_000 * HOUR_NS, 400_000 * HOUR_NS]
    ts = sorted(
        {e + d for e in edges for d in (-256, -128, -1, 0, 1, 128, 256)}
    )
    rows = [(i, "u0", "click", t) for i, t in enumerate(ts)]
    events = spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, ts_ns long"
    )
    got = {
        r["window_start_ms"]
        for r in dedup_events_hourly(events).collect()
    }
    want = {(t // HOUR_NS) * HOUR_MS for t in ts}
    assert got == want
    # the planted set must actually straddle every boundary (non-vacuity)
    for e in edges:
        assert (e // HOUR_NS - 1) * HOUR_MS in want
        assert (e // HOUR_NS) * HOUR_MS in want


def test_sketch_median_accuracy(spark, sf_oracle):
    from pyspark.sql import functions as F

    from streamy_db_spark.operators import relational_ext2
    from streamy_db_spark.sources.tables import load_table

    orders = load_table(spark, sf_oracle, "orders")
    exact = {
        r["o_orderpriority"]: r["m"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.expr("percentile(o_totalprice, 0.5)").alias("m"))
        .collect()
    }
    for r in relational_ext2.q_sketch_aggs(spark, sf_oracle).collect():
        e = exact[r["o_orderpriority"]]
        assert abs(r["median_approx"] - e) / e <= 0.01, r


def test_ann_ivf_recall(spark, sf_oracle):
    """IVF probes nprobe/n_clusters of the corpus; it must still recover
    most of the exact top-k for the same query set."""
    from streamy_db_spark.operators import similarity

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.q_knn_batch(spark, sf_oracle).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.q_ann_ivf(spark, sf_oracle).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall collapsed: {recall:.2f}"


def test_ivf_persisted_index_probe(spark, sf_oracle, tmp_path):
    """The split lifecycle (train on sample → persist partitioned index →
    probe-only) must return the same neighbors as the one-shot path, and
    the on-disk index must be partitioned by cluster_id so probes prune."""
    import os

    from pyspark.sql import functions as F

    from streamy_db_spark.operators import similarity
    from streamy_db_spark.sources.tables import load_table

    emb = load_table(spark, sf_oracle, "embeddings")
    queries = emb.filter(F.col("vec_id") < similarity.KNN_BATCH_NQ).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    C = similarity.ivf_train_centroids(emb)
    idx_path = str(tmp_path / "ivf_index")
    inverted = similarity.build_ivf_index(emb, C, idx_path)
    assert any(
        d.startswith("cluster_id=") for d in os.listdir(idx_path)
    ), "index must be hive-partitioned by cluster_id for probe-time pruning"

    persisted = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivf_probe(
            queries, inverted, C, k=similarity.KNN_BATCH_K
        ).collect()
    }
    oneshot = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivf_ann_topk(
            queries, emb, k=similarity.KNN_BATCH_K, centroids=C
        ).collect()
    }
    assert persisted == oneshot


def test_dedup_lsh_planted_duplicates(spark):
    """The fused bucket-scoring path must recover planted near-dups (the
    harness embeddings have none above 0.9, so the sf-based recall test
    below can skip — this one cannot)."""
    import random

    from streamy_db_spark.operators import dedup

    rng = random.Random(7)
    dim = 16
    base = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(40)]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    # Plant 10 near-duplicates: tiny perturbations of the first 10 vectors.
    for j in range(10):
        rows.append(
            (100 + j, [float(x + rng.gauss(0, 0.01)) for x in base[j]])
        )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.near_dup_pairs_embedding(emb).collect()
    }
    planted = {(j, 100 + j) for j in range(10)}
    assert planted <= exact, "exact baseline must see every planted pair"

    approx_rows = dedup.near_dup_pairs_lsh(emb).collect()
    approx = {(r["id_a"], r["id_b"]) for r in approx_rows}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"planted-dup recall collapsed: {recall:.2f}"
    for r in approx_rows:
        assert r["id_a"] < r["id_b"]
        assert r["cosine"] >= dedup.NEAR_DUP_COS


def test_dedup_lsh_recall(spark, sf_oracle):
    """The LSH near-dup pair set must recover most exact pairs."""
    from streamy_db_spark.operators import dedup

    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.q_dedup_near_embedding(spark, sf_oracle).collect()
    }
    if not exact:
        pytest.skip("no near-dup pairs at this SF")
    approx = {
        (r["id_a"], r["id_b"])
        for r in dedup.q_dedup_near_lsh(spark, sf_oracle).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"LSH near-dup recall collapsed: {recall:.2f}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["c_mktsegment", "o_orderpriority", "revenue", "n_rows"]


def test_lsh_hot_bucket_cap(spark):
    """A planted boilerplate cluster (many copies of one text) must not
    blow up the candidate set when the hot-bucket cap is on, and
    group-level recall must survive the star degradation (r4 verdict
    item 2 — the one remaining 100×-scale killer in the dedup path)."""
    from streamy_db_spark.operators import minhash
    from streamy_db_spark.operators.dedup import connected_components

    n_copies = 300
    boiler = "this content is provided as is without warranty of any kind either express or implied"
    # Token-disjoint across docs so the only band collisions are the
    # planted ones (shared tokens ⇒ shared shingles ⇒ chance collisions).
    distinct = [
        " ".join(f"w{i}x{j}" for j in range(12)) for i in range(20)
    ]
    rows = [(i, boiler) for i in range(n_copies)]
    rows += [(1000 + i, t) for i, t in enumerate(distinct)]
    # One genuine near-dup pair among the distinct docs (small-bucket path).
    # suffix chosen so the pair band-collides under the r8 decorrelated
    # signature (J=0.83, 15/16 slots match — verified offline with the
    # exact md5 slot math; the old 4-word suffix left J=0.71 whose band
    # collision was a coin flip the correlated slots happened to win)
    rows.append((2000, distinct[0] + " tiny suffix"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    bands = minhash.minhash_bands(docs)
    capped = minhash.lsh_candidate_pairs(bands, max_bucket_size=16).collect()
    # Star topology: the 300-copy cluster contributes exactly n-1 edges
    # (identical text ⇒ identical bands ⇒ same star in every band);
    # without the cap it would contribute n(n-1)/2 = 44,850.
    assert len(capped) < n_copies + 50, f"candidate set not bounded: {len(capped)}"
    for r in capped:
        assert r["id_a"] < r["id_b"]

    verified = minhash.minhash_near_dup_pairs(docs, max_bucket_size=16)
    groups = connected_components(verified).collect()
    keeper_of = {r["node"]: r["keeper"] for r in groups}
    # Every boilerplate copy resolves to the one keeper (full recall at
    # the group level), and the planted small-bucket pair still links.
    assert {keeper_of[i] for i in range(n_copies)} == {0}
    assert keeper_of.get(2000) == keeper_of.get(1000) == 1000


def test_capped_query_cap_actually_fires(spark, sf_oracle):
    """q_minhash_lsh_pairs_capped's driver slot proves the PRODUCTION
    star-degradation path only if the cap fires on the real sf data —
    guard that _CAPPED_Q_BUCKET_SIZE stays below the largest natural
    bucket so the slot's hash evidence is non-vacuous (r8 decorrelated
    signatures: largest natural sf0.01 bucket is 3, four of them, so
    the cap sits at 2)."""
    from streamy_db_spark.operators import minhash
    from streamy_db_spark.sources.tables import load_table

    docs = load_table(spark, sf_oracle, "documents")
    bands = minhash.minhash_bands(docs).cache()
    n_capped = minhash.lsh_candidate_pairs(
        bands, max_bucket_size=minhash._CAPPED_Q_BUCKET_SIZE
    ).count()
    n_uncapped = minhash.lsh_candidate_pairs(bands).count()
    bands.unpersist()
    assert n_capped < n_uncapped, (
        f"cap {minhash._CAPPED_Q_BUCKET_SIZE} never fires at {sf_oracle} "
        f"({n_capped} == {n_uncapped} candidates) — the driver slot "
        "would only re-prove the exact path"
    )


def test_simhash64_capped_cap_actually_fires(spark, sf_oracle):
    """q_simhash64_neardup_capped's driver slot proves the PRODUCTION
    star-degradation path only if the cap fires on the real sf data —
    guard that _SIMHASH64_CAPPED_BUCKET_SIZE stays small enough that
    the star changes the VERIFIED output on the real sf data (sf0.01 at
    cap 2: 11 pairs vs 12 uncapped — one verified pair sits in hot
    buckets the star doesn't cover directly; its cluster stays
    connected through the rep). The count difference is the witness
    that the slot's hash evidence exercises the star path."""
    from streamy_db_spark.operators import minhash
    from streamy_db_spark.sources.tables import load_table

    docs = load_table(spark, sf_oracle, "documents")
    n_capped = minhash.simhash64_neardup_pairs(
        docs, max_bucket_size=minhash._SIMHASH64_CAPPED_BUCKET_SIZE
    ).count()
    n_uncapped = minhash.simhash64_neardup_pairs(docs).count()
    assert n_capped < n_uncapped, (
        f"cap {minhash._SIMHASH64_CAPPED_BUCKET_SIZE} never fires at "
        f"{sf_oracle} ({n_capped} == {n_uncapped} pairs) — the driver "
        "slot would only re-prove the exact path"
    )


def test_simhash64_capped_star_preserves_groups(spark):
    """A boilerplate cluster far above the cap must still resolve to ONE
    connected component (star topology keeps group-level recall), with
    the pair count bounded at ~n-1 edges instead of n(n-1)/2."""
    from streamy_db_spark.operators import minhash
    from streamy_db_spark.operators.dedup import connected_components

    n_copies = 60
    base = (
        "exact boilerplate block repeated verbatim across many documents"
        " in this synthetic corpus fixture"
    )
    rows = [(i, base) for i in range(n_copies)]
    rows += [
        (1000 + i, " ".join(f"u{i}w{j}" for j in range(12))) for i in range(20)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash.simhash64_neardup_pairs(docs, max_bucket_size=8)
    collected = pairs.collect()
    # 60 identical fingerprints → one size-60 bucket per band → 59 star
    # edges (hamming 0), not 1,770 all-pairs edges.
    assert len(collected) < n_copies + 30, f"not star-bounded: {len(collected)}"
    for r in collected:
        assert r["id_a"] < r["id_b"]
    groups = connected_components(pairs.select("id_a", "id_b")).collect()
    keeper_of = {r["node"]: r["keeper"] for r in groups}
    assert {keeper_of[i] for i in range(n_copies)} == {0}


def test_simhash64_capped_group_recall_on_natural_data(spark, sf_oracle):
    """Quantify the star's recall trade on the REAL corpus: capped
    verified pairs are a subset of uncapped (verification filters every
    star edge, so the cap can never invent a false merge — every capped
    component is contained in an uncapped one), and at the driver cap
    the loss is confined to the documented corner (both members of a
    pair farther than ham_max from every shared-bucket rep). Measured
    at sf0.01/cap 2: 11 of 12 uncapped groups survive — the one loss is
    a 2-doc group whose only shared buckets are hot. The recall bound
    is pinned at 75% — real slack under the measured 92% (bucket
    hotness is data-layout sensitive, so a regenerated corpus may lose
    a different small number of groups) while a genuine collapse of
    the star construction still fails."""
    from collections import defaultdict

    from streamy_db_spark.operators import minhash
    from streamy_db_spark.operators.dedup import connected_components
    from streamy_db_spark.sources.tables import load_table

    docs = load_table(spark, sf_oracle, "documents")

    def groups(pairs):
        rows = connected_components(pairs.select("id_a", "id_b")).collect()
        by_keeper = defaultdict(set)
        for r in rows:
            by_keeper[r["keeper"]].add(r["node"])
        return {frozenset(v) for v in by_keeper.values()}

    capped = groups(
        minhash.simhash64_neardup_pairs(
            docs, max_bucket_size=minhash._SIMHASH64_CAPPED_BUCKET_SIZE
        )
    )
    uncapped = groups(minhash.simhash64_neardup_pairs(docs))
    # no false merges: every capped component sits inside an uncapped one
    for g in capped:
        assert any(g <= u for u in uncapped), f"invented component: {sorted(g)}"
    preserved = sum(1 for u in uncapped if u in capped)
    assert preserved >= 0.75 * len(uncapped), (
        f"group recall collapsed: {preserved}/{len(uncapped)}"
    )


def test_simhash64_neardup_exact(spark):
    """4×16-band candidates are COMPLETE for hamming ≤ 3 (pigeonhole), so
    the banded query must equal brute-force over the fingerprints —
    planted near-identical docs guarantee non-vacuous pairs."""
    from streamy_db_spark.operators import minhash

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [(0, base)]
    # Near-identical variants (1-word edits) → tiny hamming distances.
    rows.append((1, base.replace("quick", "swift")))
    rows.append((2, base.replace("today", "tonight")))
    rows.append((3, base))  # exact copy → hamming 0
    rows += [
        (10 + i, " ".join(f"z{i}q{j}" for j in range(14))) for i in range(15)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    from pyspark.sql import functions as F

    fps = {
        r["doc_id"]: tuple(r["bands"])
        for r in docs.select(
            "doc_id",
            minhash.simhash64_band_values(F.col("text")).alias("bands"),
        ).collect()
    }

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    expected = {
        (i, j, ham(fps[i], fps[j]))
        for i in fps
        for j in fps
        if i < j and ham(fps[i], fps[j]) <= minhash.SIMHASH64_HAM_MAX
    }
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in minhash.simhash64_neardup_pairs(docs).collect()
    }
    assert (0, 3, 0) in got, "exact copy must appear at hamming 0"
    assert got == expected


def test_near_dup_production_cut_on_planted_table(spark, tmp_path):
    """The production 0.9 near-dup cut, hash-verified against DuckDB on a
    planted side table that actually contains near-dups (the harness
    gaussians max out at cosine ~0.5, so the registered 0.4-cut query
    can't exercise this threshold non-vacuously — r4 verdict item 6)."""
    import duckdb

    from streamy_db_spark import fixtures
    from streamy_db_spark.operators import dedup
    from tests.oracle_harness import compare_with_connection

    rows = fixtures.planted_embeddings()
    n_dups = sum(1 for vid, _ in rows if vid >= 10_000)
    path = str(tmp_path / "embeddings.parquet")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).coalesce(1).write.parquet(path)

    emb = spark.read.parquet(path)
    got = dedup.near_dup_pairs_embedding(emb, threshold=dedup.NEAR_DUP_COS)
    pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    # Non-vacuous: every planted (base, dup) pair clears the 0.9 cut.
    assert {(j, 10_000 + j) for j in range(n_dups)} <= pairs
    assert len(pairs) >= n_dups

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{path}/*.parquet'")
    ok, msg = compare_with_connection(
        got, dedup.near_dup_embedding_oracle_sql(dedup.NEAR_DUP_COS), con
    )
    assert ok, msg

    # The scale path finds most planted pairs at the same 0.9 cut.
    approx = {
        (r["id_a"], r["id_b"])
        for r in dedup.near_dup_pairs_lsh(emb).collect()
    }
    recall = len(pairs & approx) / len(pairs)
    assert recall >= 0.8, f"planted 0.9-cut recall collapsed: {recall:.2f}"


def test_simhash64_band0_is_bitreversed_simhash16(spark, sf_oracle):
    """Cross-implementation invariant: the 16-bit simhash and band 0 of
    the 64-bit simhash read the SAME md5 hex window (digits 1-4) with
    mirrored bit weights (2^j vs 2^(15-j)), so band0 must equal the
    16-bit fingerprint bit-reversed — for every document. Ties the two
    independent implementations (and transitively their two DuckDB
    oracles) to each other."""
    from pyspark.sql import functions as F

    from streamy_db_spark.operators import minhash
    from streamy_db_spark.sources.tables import load_table

    docs = load_table(spark, sf_oracle, "documents")
    rows = docs.select(
        minhash.simhash(F.col("text")).alias("h16"),
        minhash.simhash64_band_values(F.col("text"))[0].alias("band0"),
    ).collect()
    assert rows
    for r in rows:
        rev = int(f"{r['h16']:016b}"[::-1], 2)
        assert rev == r["band0"], (r["h16"], r["band0"])


def test_lsh_recall_and_precision_vs_bruteforce(spark, sf_oracle):
    """Signature-quality gate (r8): banded LSH candidates must track the
    brute-force truth on the natural corpus. Guards the slot-hash
    decorrelation permanently — the pre-r8 correlated slots measured 78%
    FALSE candidates (agreement >= 0.5 with true J < 0.5) here, and a
    future signature regression would collapse either recall (missed
    true pairs) or precision (candidate explosion)."""
    from pyspark.sql import functions as F

    from streamy_db_spark.operators import minhash
    from streamy_db_spark.sources.tables import load_table

    docs = load_table(spark, sf_oracle, "documents").select("doc_id", "text")
    sh = (
        minhash.with_shingles(docs)
        .filter(F.size("shingles") > 0)
        .select("doc_id", "shingles")
        .localCheckpoint(eager=True)
    )
    truth = (
        sh.alias("x")
        .join(sh.alias("y"), F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("id_a"),
            F.col("y.doc_id").alias("id_b"),
            minhash.jaccard(F.col("x.shingles"), F.col("y.shingles")).alias("j"),
        )
        .filter(F.col("j") >= minhash.JACCARD_THRESHOLD)
    )
    true_pairs = {(r.id_a, r.id_b) for r in truth.collect()}
    assert len(true_pairs) >= 10  # non-vacuous on the natural corpus

    verified = {
        (r.id_a, r.id_b)
        for r in minhash.minhash_near_dup_pairs(docs).collect()
    }
    # recall: banded candidates (then exact-verified) find the truth
    recall = len(verified & true_pairs) / len(true_pairs)
    assert recall >= 0.9, f"LSH recall collapsed: {recall:.2f}"
    assert verified <= true_pairs  # exact verify => perfect precision

    # candidate-set precision: the banded probe must not explode (the
    # correlated-slot bug produced 136 candidates for 25 true pairs)
    bands = minhash.minhash_bands(docs)
    n_cand = minhash.lsh_candidate_pairs(bands).count()
    assert n_cand <= 3 * len(true_pairs), (
        f"candidate explosion: {n_cand} candidates for "
        f"{len(true_pairs)} true pairs"
    )


def test_incremental_near_dedup_matches_one_shot_on_natural_corpus(
    spark, sf_oracle, tmp_path
):
    """End shape of the r8 signature fix: batch-over-batch admission on
    the NATURAL documents corpus equals one-shot pair+components keepers
    (the pre-fix gate accepted 40% of what one-shot kept). Bridges can
    in principle diverge the two (documented greedy semantics), but the
    natural corpus is bridge-light and the equality held exactly at
    sf0.1 — pin it at oracle scale."""
    from pyspark.sql import functions as F

    from streamy_db_spark.operators.dedup import dedup_groups
    from streamy_db_spark.operators.incremental import IncrementalNearDeduper
    from streamy_db_spark.operators.minhash import minhash_near_dup_pairs
    from streamy_db_spark.sources.tables import load_table

    docs = load_table(spark, sf_oracle, "documents").select("doc_id", "text")
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    cuts = [ids[int(len(ids) * i / 3)] for i in range(1, 3)] + [ids[-1] + 1]

    d = IncrementalNearDeduper(spark, str(tmp_path / "state"))
    accepted: set[int] = set()
    lo = ids[0]
    for bi, hi in enumerate(cuts):
        batch = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        accepted |= {
            r.doc_id
            for r in d.process_batch(batch, batch_id=bi).select("doc_id").collect()
        }
        lo = hi

    groups = dedup_groups(docs, minhash_near_dup_pairs(docs))
    keepers = {
        r.doc_id
        for r in groups.filter(F.col("doc_id") == F.col("keeper_id")).collect()
    }
    assert accepted == keepers


def test_ivf_cluster_count_sizing(spark, sf_oracle):
    """K ≈ 4·√N auto-sizing (n_clusters=None): floor, cap-at-N, the
    proportional region, and the trained matrix's row count on real
    embeddings."""
    from streamy_db_spark.operators import similarity as sim
    from streamy_db_spark.sources.tables import load_table

    assert sim.ivf_cluster_count(0) == sim.IVF_CLUSTERS
    assert sim.ivf_cluster_count(4) == 4  # capped at N
    assert sim.ivf_cluster_count(16) == sim.IVF_CLUSTERS
    assert sim.ivf_cluster_count(10_000) == 400  # 4·√10000
    # cap: a quarter of the driver training sample
    assert sim.ivf_cluster_count(10**9) == sim.IVF_MAX_TRAIN_ROWS // 4

    emb = load_table(spark, sf_oracle, "embeddings")
    n = emb.count()
    C = sim.ivf_train_centroids(emb, n_clusters=None, train_fraction=1.0)
    # the auto path caps at a quarter of the ACTUAL sample (here the
    # whole corpus, well under max_train_rows, so the cap is slack)
    assert len(C) == sim.ivf_cluster_count(
        n, max_clusters=max(1, min(n, sim.IVF_MAX_TRAIN_ROWS) // 4)
    )
    # a tiny caller-bounded sample caps K at sample//4 (floor permitting)
    C2 = sim.ivf_train_centroids(
        emb, n_clusters=None, train_fraction=1.0, max_train_rows=200
    )
    assert len(C2) == sim.ivf_cluster_count(n, max_clusters=50)
    # degenerately thin sample: the IVF_CLUSTERS floor exceeds the
    # sample, and the trainer's len(sample) clamp binds — the matrix
    # has exactly as many centroids as the auto path settled on
    C3 = sim.ivf_train_centroids(
        emb, n_clusters=None, train_fraction=1.0, max_train_rows=8
    )
    assert len(C3) == 8


def test_shingle_hash_projection_is_lossless(spark, sf_oracle):
    """r14: the sketch table materializes packed 64-bit shingle hashes
    (minhash.shingle_hashes) instead of the gram strings (guide §2.3:
    persist keys, not payloads). Two properties make that projection
    semantics-preserving, both pinned here on the natural corpus:
    (1) the signature computed from the packed hashes is BIT-IDENTICAL
    to the string-path signature (the pack/unpack round-trip is exact);
    (2) hashing is collision-free per document (distinct hash count ==
    distinct shingle count), so Jaccard intersect/union sizes over the
    hash sets equal the string-set sizes — the oracle gate on
    q_minhash_lsh_pairs_capped/q_dedup_groups then covers the pair
    level end to end."""
    from pyspark.sql import functions as F

    from streamy_db_spark.operators import minhash
    from streamy_db_spark.sources.tables import load_table

    docs = load_table(spark, sf_oracle, "documents").select("doc_id", "text")
    sh = minhash.with_shingles(docs).filter(F.size("shingles") > 0)
    probe = sh.select(
        minhash.minhash_signature(F.col("shingles")).alias("sig_str"),
        minhash.minhash_signature_from_hashes(
            minhash.shingle_hashes(F.col("shingles"))
        ).alias("sig_hash"),
        F.size("shingles").alias("ns"),
        F.size(
            F.array_distinct(minhash.shingle_hashes(F.col("shingles")))
        ).alias("nh"),
    )
    bad = probe.filter(
        (F.col("sig_str") != F.col("sig_hash")) | (F.col("ns") != F.col("nh"))
    ).count()
    assert bad == 0
    assert probe.count() > 0  # non-vacuous
