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


def test_hash_bucket_matches_python_model(spark):
    """Property: the JVM-side bucket expression equals the independent
    pure-Python md5 model for arbitrary ids and salts (the same
    double-implementation discipline as the serial protocol oracle)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    import hashlib

    from pyspark.sql import functions as F

    def model(doc_id: int, salt: str) -> int:
        digest = hashlib.md5(f"{doc_id}|{salt}".encode()).hexdigest()
        return int(digest[:8], 16) % 10_000

    @settings(max_examples=10, deadline=None)
    @given(
        ids=st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=20, unique=True),
        salt=st.text(alphabet="abcdefghij-0123456789", min_size=1, max_size=12),
    )
    def check(ids, salt):
        df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        got = {
            r["doc_id"]: r["b"]
            for r in df.select(
                "doc_id", sampling.hash_bucket(F.col("doc_id"), salt).alias("b")
            ).collect()
        }
        assert got == {i: model(i, salt) for i in ids}

    check()


def test_sample_k_per_group_exact_count_and_stability(spark):
    from streamy_db_spark.operators.sampling import sample_k_per_group

    rows = [(i, "g%d" % (i % 3)) for i in range(30)] + [(100, "tiny")]
    df = spark.createDataFrame(rows, "id long, g string")
    got1 = {(r.g, r.id) for r in sample_k_per_group(df, ["g"], "id", k=4).collect()}
    # exact k per full group; the 1-row group yields its single row
    from collections import Counter
    counts = Counter(g for g, _ in got1)
    assert counts == {"g0": 4, "g1": 4, "g2": 4, "tiny": 1}
    # stable across re-partitioning
    got2 = {
        (r.g, r.id)
        for r in sample_k_per_group(df.repartition(7), ["g"], "id", k=4).collect()
    }
    assert got1 == got2
    # a different salt draws a different (but equally sized) sample
    got3 = {
        (r.g, r.id)
        for r in sample_k_per_group(df, ["g"], "id", k=4, salt="other").collect()
    }
    assert got3 != got1 and Counter(g for g, _ in got3) == counts


def test_sample_k_per_group_rejects_bad_k(spark):
    import pytest
    from streamy_db_spark.operators.sampling import sample_k_per_group

    df = spark.createDataFrame([(1, "g")], "id long, g string")
    with pytest.raises(ValueError):
        sample_k_per_group(df, ["g"], "id", k=0)


def test_sample_k_per_group_monotone_in_k(spark):
    """Hash-order top-k is monotone: raising k only ADDS rows — the
    property that lets an eval set grow without reshuffling membership
    (same contract as stratified_sample's fraction monotonicity)."""
    from streamy_db_spark.operators.sampling import sample_k_per_group

    rows = [(i, "g%d" % (i % 4)) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, g string")
    prev: set = set()
    for k in (1, 3, 5):
        cur = {
            (r.g, r.id) for r in sample_k_per_group(df, ["g"], "id", k=k).collect()
        }
        assert prev <= cur, f"k={k} dropped earlier members"
        prev = cur


# --- mixture_sample -----------------------------------------------------------


def _mix_docs(spark):
    rows = []
    rng_words = lambda i, n: " ".join(f"t{i}w{j}" for j in range(n))  # noqa: E731
    for i in range(30):
        rows.append((i, "web", rng_words(i, 10)))
    for i in range(30, 40):
        rows.append((i, "books", rng_words(i, 30)))
    for i in range(40, 44):
        rows.append((i, "code", rng_words(i, 5)))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_mixture_sample_monotone_in_budget(spark):
    from streamy_db_spark.operators.sampling import mixture_sample

    docs = _mix_docs(spark)
    w = {"web": 1, "books": 1}
    kept = [
        {r.doc_id for r in mixture_sample(docs, w, total).collect()}
        for total in (50, 150, 400, 10_000)
    ]
    for small, big in zip(kept, kept[1:]):
        assert small <= big  # growing the budget only ADDS docs
    # a generous budget keeps every weighted source in full
    assert kept[-1] == {i for i in range(40)}  # code has weight 0: excluded


def test_mixture_sample_underrepresented_source_fully_kept(spark):
    from streamy_db_spark.operators.sampling import mixture_sample

    docs = _mix_docs(spark)
    # code's fair share (1/3 of 600 = 200 tokens) exceeds its 20-token
    # volume -> keep-all falls out of the integer algebra
    got = mixture_sample(docs, {"web": 1, "books": 1, "code": 1}, 600)
    code_kept = {r.doc_id for r in got.filter("source = 'code'").collect()}
    assert code_kept == {40, 41, 42, 43}


def test_mixture_sample_stable_under_repartition(spark):
    from streamy_db_spark.operators.sampling import mixture_sample

    docs = _mix_docs(spark)
    w = {"web": 2, "books": 1}
    a = {r.doc_id for r in mixture_sample(docs, w, 200).collect()}
    b = {
        r.doc_id
        for r in mixture_sample(docs.repartition(13, "text"), w, 200).collect()
    }
    assert a == b


def test_mixture_sample_validation(spark):
    import pytest

    from streamy_db_spark.operators.sampling import mixture_sample

    docs = _mix_docs(spark)
    with pytest.raises(ValueError):
        mixture_sample(docs, {}, 100)
    with pytest.raises(ValueError):
        mixture_sample(docs, {"web": -1}, 100)
    with pytest.raises(ValueError):
        mixture_sample(docs, {"web": 0}, 100)
    with pytest.raises(ValueError):
        mixture_sample(docs, {"web": 1}, -5)


# --- shuffle_corpus -----------------------------------------------------------


def test_shuffle_corpus_properties(spark):
    from streamy_db_spark.operators.sampling import shuffle_corpus

    docs = _mix_docs(spark).select("doc_id")
    out = shuffle_corpus(docs, 4).collect()
    assert len(out) == 44
    # coordinates are a bijection: every (shard, pos) unique, pos dense
    coords = {(r.shard, r.pos) for r in out}
    assert len(coords) == 44
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), shard
    # deterministic across repartition
    again = {
        (r.doc_id, r.shard, r.pos)
        for r in shuffle_corpus(docs.repartition(7), 4).collect()
    }
    assert again == {(r.doc_id, r.shard, r.pos) for r in out}
    # a different salt draws a different order
    other = {
        (r.doc_id, r.shard, r.pos)
        for r in shuffle_corpus(docs, 4, salt="epoch2").collect()
    }
    assert other != again


def test_shuffle_corpus_no_global_sort_plan(spark):
    from streamy_db_spark.operators.sampling import q_shuffle_corpus
    from streamy_db_spark.plans import inspect

    plan = inspect.executed_plan(q_shuffle_corpus(spark, "/root/testdata/sf0.001"))
    assert "rangepartitioning" not in plan  # shard-local sorts only
    assert plan.count("Exchange") == 1  # the one layout shuffle


def test_mixture_sample_matches_python_model(spark):
    """mixture_sample vs a pure-Python md5 model of the exact-integer
    keep rule, over several weight/budget configurations — the whole
    rule (bucketing, token accounting, clamp algebra) reproduced
    outside Spark."""
    import hashlib

    from streamy_db_spark.operators.sampling import mixture_sample

    rows = [
        (i, f"s{i % 3}", " ".join(f"m{i}w{j}" for j in range(2 + (i * 7) % 9)))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")

    def model(weights, total):
        W = sum(weights.values())
        toks: dict[str, int] = {}
        for _, src, text in rows:
            toks[src] = toks.get(src, 0) + len(text.split())
        keep = set()
        for i, src, _text in rows:
            if src not in weights:
                continue
            b = (
                int(hashlib.md5(f"{i}|mix-v1".encode()).hexdigest()[:8], 16)
                % 10_000
            )
            if b * W * toks[src] < 10_000 * total * weights[src]:
                keep.add(i)
        return keep

    for weights, total in (
        ({"s0": 1, "s1": 1, "s2": 1}, 150),
        ({"s0": 5, "s1": 1}, 90),
        ({"s2": 7}, 10_000),  # over-budget: keep-all for s2, others dropped
        ({"s0": 1, "s1": 2, "s2": 3}, 0),  # zero budget: keep nothing
    ):
        got = {
            r.doc_id for r in mixture_sample(docs, weights, total).collect()
        }
        assert got == model(weights, total), (weights, total)


def test_shuffle_corpus_matches_python_model(spark):
    """shuffle_corpus vs a pure-Python md5 reconstruction of the
    (shard, pos) coordinates — full 32-bit ordering, id tiebreak, shard
    assignment all reproduced outside Spark."""
    import hashlib

    from streamy_db_spark.operators.sampling import shuffle_corpus

    ids = [3, 17, 42, 1000, 65536, 9999999] + list(range(50))
    docs = spark.createDataFrame([(i,) for i in set(ids)], "doc_id long")
    got = {
        r.doc_id: (r.shard, r.pos)
        for r in shuffle_corpus(docs, n_shards=4, salt="epochX").collect()
    }

    u32 = {
        i: int(hashlib.md5(f"{i}|epochX".encode()).hexdigest()[:8], 16)
        for i in set(ids)
    }
    want = {}
    for shard in range(4):
        members = sorted(
            (i for i in u32 if u32[i] % 4 == shard), key=lambda i: (u32[i], i)
        )
        for pos, i in enumerate(members):
            want[i] = (shard, pos)
    assert got == want
