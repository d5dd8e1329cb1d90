"""Benchmark decontamination: remove training documents that overlap an
evaluation/benchmark set.

The standard LLM-training hygiene pass (GPT-3 App. C / PaLM-style): a
corpus document is *contaminated* when it shares any n-token gram with
any benchmark text; contaminated documents are dropped (or flagged)
before training. Two levels:

- **exact**: normalized full-text digest anti-join — catches verbatim
  benchmark copies;
- **n-gram overlap**: the real gate — catches embedded quotes and
  partial copies that exact hashing misses.

Scale shape (the reason this is NOT a similarity self-join): benchmark
sets are tiny relative to the corpus (thousands of eval items vs
billions of docs), so the benchmark's distinct gram set broadcasts and
the corpus side is ONE scan → explode → broadcast semi-join → distinct
on doc ids. Corpus text never shuffles; the only shuffle moves the
(small) contaminated id set. Grams are xxhash64-compressed before the
join so the broadcast is 8 bytes/gram, not the gram text. At 100 TB this
is scan-bound — exactly the cost floor for a pass that must read every
document once. False positives from a 64-bit hash collision are ~1e-9
per corpus-gram × |bench grams|/2^64 and only ever *remove* a clean doc
(conservative direction for decontamination).

No reference counterpart (the reference has no text surface at all —
SURVEY.md §2.3 marks the analytics category ABSENT); part of the
training-data extension, same category as operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from streamy_db_spark.sources.tables import load_table

# Whitespace tokenization shared with operators/text.py — the construct
# set where Java regex (Spark) and RE2 (DuckDB) provably agree (the
# text.py oracles pin it).
WS_RE = r"\s+"

DEFAULT_N = 13  # the published decontamination gram width (GPT-3 App. C)


def tokens(col: Column) -> Column:
    """Lowercased whitespace tokens, empties dropped."""
    return F.filter(F.split(F.lower(col), WS_RE), lambda x: x != "")


def ngrams(tokens_col: Column, n: int) -> Column:
    """All n-token grams of a token array as space-joined strings;
    empty array when the document is shorter than n tokens. Pure
    JVM-side higher-order functions — whole-stage codegen, no Python."""
    return F.when(
        F.size(tokens_col) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens_col) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(tokens_col, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_keys(tokens_col: Column, n: int) -> Column:
    """64-bit keys of all n-token grams: xxhash64 over each token SLICE
    (array<string>) directly, skipping ``ngrams``' per-gram string
    build (r13 opt, guide §1.2 per-task work: the concat_ws allocated
    one ~n-token string per gram position — O(total tokens × n) bytes
    of pure intermediate). Key equality ≡ gram-string equality: tokens
    contain no whitespace (split on \\s+), so the space-joined
    rendering is injective, and every consumer keys BOTH join sides
    with this same function — the hash never reaches any output
    (decontam verdicts / substring spans are what the oracles check)."""
    return F.when(
        F.size(tokens_col) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens_col) - n + 1),
            lambda i: F.xxhash64(F.slice(tokens_col, i, n)),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def _gram_hashes(df: DataFrame, text_col: str, n: int, out: str) -> DataFrame:
    """Explode a text column into 64-bit gram keys (plus any other
    selected columns the caller kept)."""
    return df.withColumn(
        out, F.explode(ngram_keys(tokens(F.col(text_col)), n))
    )


def contaminated_ids(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = DEFAULT_N,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Ids of corpus documents sharing at least one n-gram with any
    benchmark text. ``broadcast_bench=False`` falls back to a shuffle
    semi-join for benchmark gram sets too large to broadcast (rare; the
    gram set is 8 bytes/gram after hashing)."""
    bgrams = (
        _gram_hashes(bench.select(bench_text_col), bench_text_col, n, "__g")
        .select("__g")
        .distinct()
    )
    if broadcast_bench:
        bgrams = F.broadcast(bgrams)
    cgrams = _gram_hashes(corpus.select(id_col, text_col), text_col, n, "__g")
    return (
        cgrams.join(bgrams, "__g", "left_semi").select(id_col).distinct()
    )


def decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = DEFAULT_N,
) -> DataFrame:
    """Corpus minus contaminated documents (n-gram overlap gate). The
    anti-join key is the (small) contaminated id set, broadcast back, so
    the corpus again avoids a full shuffle."""
    bad = contaminated_ids(
        corpus, bench, id_col=id_col, text_col=text_col,
        bench_text_col=bench_text_col, n=n,
    )
    return corpus.join(F.broadcast(bad), id_col, "left_anti")


def decontaminate_exact(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Exact-copy gate: drop corpus docs whose whitespace-normalized
    lowercased text equals any benchmark text. Digest computed scan-side;
    only digests cross the wire (same discipline as dedup.py)."""
    norm = lambda c: F.md5(  # noqa: E731
        F.encode(F.concat_ws(" ", tokens(F.col(c))), "UTF-8")
    )
    bset = F.broadcast(
        bench.select(norm(bench_text_col).alias("__fp")).distinct()
    )
    return (
        corpus.withColumn("__fp", norm(text_col))
        .join(bset, "__fp", "left_anti")
        .drop("__fp")
    )


# --- test-registry query (oracle-checked; no driver slot used) ---------------

# The sf documents table is both corpus and benchmark source: benchmark
# texts are a 12-token slice (tokens 3..14) of every 31st document, so
# the planted overlaps are real text spans, not synthetic markers. The
# slicing guarantees exact-hash would MISS them (the bench text is never
# a whole document) — only the n-gram gate catches the source docs and
# their verbatim-duplicate families.
_Q_N = 8
_Q_SLICE_START, _Q_SLICE_LEN = 3, 12
_Q_MIN_TOKENS = _Q_SLICE_START + _Q_SLICE_LEN - 1
_Q_MOD = 31


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document contamination verdict against the derived benchmark
    (richer than the kept-set: both directions are value-checked).

    The corpus gram side is ``spread`` first (r13, guide §2.6): the
    sf table scans as ONE partition, and the gram stage — measured
    3.1-3.5 s of the query's 3.8 s — ran in a single task with 31
    cores idle. Same move as the minhash/media queries; on a real
    corpus the scan already has thousands of splits."""
    from streamy_db_spark.sources.tables import spread

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    bench = (
        docs.filter((F.col("doc_id") % _Q_MOD == 0) & (F.size(toks) >= _Q_MIN_TOKENS))
        .select(
            F.concat_ws(
                " ", F.slice(toks, _Q_SLICE_START, _Q_SLICE_LEN)
            ).alias("text")
        )
    )
    bad = contaminated_ids(
        spread(docs.select("doc_id", "text"), "doc_id"), bench, n=_Q_N
    )
    return docs.select("doc_id").join(
        bad.withColumn("__c", F.lit(True)), "doc_id", "left"
    ).select(
        "doc_id", F.coalesce(F.col("__c"), F.lit(False)).alias("contaminated")
    )


# Driver-registered in r5 (slot freed by rotating q_text_stats to the
# test-only registry).
QUERIES = {"q_decontaminate": q_decontaminate}

TEST_QUERIES: dict = {}
TEST_ORACLE: dict = {}

ORACLE = {
    "q_decontaminate": f"""
        WITH tok AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                               t -> t <> '') AS ts
            FROM documents
        ),
        bench AS (
            SELECT ts[{_Q_SLICE_START} : {_Q_SLICE_START + _Q_SLICE_LEN - 1}] AS bts
            FROM tok
            WHERE doc_id % {_Q_MOD} = 0 AND len(ts) >= {_Q_MIN_TOKENS}
        ),
        bgrams AS (
            SELECT DISTINCT array_to_string(bts[i : i + {_Q_N} - 1], ' ') AS g
            FROM bench,
                 unnest(generate_series(1, len(bts) - {_Q_N} + 1)) AS u(i)
        ),
        cgrams AS (
            SELECT DISTINCT doc_id,
                   array_to_string(ts[i : i + {_Q_N} - 1], ' ') AS g
            FROM tok,
                 unnest(generate_series(1, len(ts) - {_Q_N} + 1)) AS u(i)
        ),
        contaminated AS (
            SELECT DISTINCT doc_id FROM cgrams JOIN bgrams USING (g)
        )
        SELECT d.doc_id, (c.doc_id IS NOT NULL) AS contaminated
        FROM documents d LEFT JOIN contaminated c USING (doc_id)
    """,
}
