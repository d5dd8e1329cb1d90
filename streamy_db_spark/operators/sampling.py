"""Deterministic sampling / dataset-split operators for training pipelines.

A training-data pipeline needs reproducible train/valid/test membership
that (a) never changes when the corpus is re-partitioned or re-processed,
(b) is computable scan-side with no shuffle and no global sampling pass,
and (c) survives incremental ingestion (a new document's split is a pure
function of its id, not of what else is in the batch). Hash-bucket
assignment gives all three: bucket = md5(id ∥ salt) mod 10_000, split by
cumulative fraction thresholds. ``rand()``-based sampling has none of
these properties (retry/partitioning nondeterminism), which is why Spark's
own ``df.sample`` is unsuitable for split membership.

Everything here is md5-over-UTF8 arithmetic, so DuckDB evaluates it
bit-identically and the operators sit under the strong value-hash oracle
gate (same discipline as operators/minhash.py).

No reference counterpart (the reference has no sampling surface at all —
SURVEY.md §2.3 marks the whole analytics category ABSENT); this is part
of the training-data extension the engine exists to serve.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from streamy_db_spark.sources.tables import load_table

_BUCKETS = 10_000  # split resolution: 0.01 % granularity

DEFAULT_FRACTIONS = {"train": 0.90, "valid": 0.05, "test": 0.05}


def hash_bucket(id_col: Column, salt: str) -> Column:
    """Stable bucket in [0, 10_000): first 8 hex chars (32 bits) of
    md5(id ∥ '|' ∥ salt) mod 10_000. 32 bits so the integer conversion is
    exact in both engines; the salt decouples independent splits drawn
    over the same ids."""
    digest = F.md5(F.encode(F.concat(id_col.cast("string"), F.lit("|" + salt)), "UTF-8"))
    return (F.conv(F.substring(digest, 1, 8), 16, 10).cast("long") % _BUCKETS).cast(
        "int"
    )


def with_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float] | None = None,
    salt: str = "split-v1",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a deterministic split label. ``fractions`` must
    sum to 1 (±1 bucket of rounding slack lands in the last split).
    Scan-side projection: no shuffle, no state, safe under stage retry,
    stable across re-partitioning and incremental ingestion."""
    fractions = dict(DEFAULT_FRACTIONS if fractions is None else fractions)
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if out_col in df.columns:
        raise ValueError(f"column {out_col!r} already exists")

    # when-chain in declaration order: the first threshold that matches
    # wins; rounding slack falls into the last split.
    bucket = hash_bucket(F.col(id_col), salt)
    names = list(fractions)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += fractions[name]
        cond = bucket < int(round(cum * _BUCKETS))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose hash bucket
    falls below the threshold. Composable per stratum (filter first,
    sample second) and monotone in ``fraction`` — raising the fraction
    only ADDS rows, never reshuffles membership (the property ingestion
    pipelines rely on when growing an eval set)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = int(round(fraction * _BUCKETS))
    return df.filter(hash_bucket(F.col(id_col), salt) < threshold)


def sample_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    k: int,
    salt: str = "topk-v1",
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, chosen by hash order —
    the deterministic replacement for per-stratum reservoir sampling
    (draw an eval set of k docs per language/source, reproducibly).
    Membership is stable across re-partitioning and reruns, and
    changing ``salt`` draws an independent sample. One shuffle on the
    group key; per-group state in the rank window is O(1)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(
        hash_bucket(F.col(id_col), salt), F.col(id_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


# --- test-registry queries (oracle-checked; no driver slot used) -------------


def q_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three deterministic docs per language — the per-stratum eval-set
    draw, fully hash-checkable because the hash order is md5."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return sample_k_per_group(docs, ["lang"], "doc_id", k=3, salt="topk-v1")


def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(split, lang) document counts — compact, hash-checkable
    evidence of both the split assignment AND its stratification across
    an existing category column."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        with_split(docs, "doc_id")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
    )


# q_train_test_split promoted to a DRIVER slot in r6 (r5 verdict item
# 5): split assignment is the membership contract every downstream
# training job depends on, so it belongs under the driver's hash gate.
QUERIES: dict = {"q_train_test_split": q_train_test_split}

_SQL_BUCKET = (
    "(('0x' || substring(md5(doc_id::VARCHAR || '|split-v1'), 1, 8))::BIGINT"
    f" % {_BUCKETS})"
)

_SQL_TOPK_BUCKET = (
    "(('0x' || substring(md5(doc_id::VARCHAR || '|topk-v1'), 1, 8))::BIGINT"
    f" % {_BUCKETS})"
)

TEST_QUERIES = {
    "q_sample_per_lang": q_sample_per_lang,
}

ORACLE: dict = {
    "q_train_test_split": f"""
        WITH b AS (
            SELECT doc_id, lang, {_SQL_BUCKET} AS bucket FROM documents
        )
        SELECT CASE WHEN bucket < {int(round(DEFAULT_FRACTIONS["train"] * _BUCKETS))}
                    THEN 'train'
                    WHEN bucket < {int(round((DEFAULT_FRACTIONS["train"] + DEFAULT_FRACTIONS["valid"]) * _BUCKETS))}
                    THEN 'valid'
                    ELSE 'test' END AS split,
               lang,
               count(*) AS n_docs,
               min(doc_id) AS min_doc_id
        FROM b
        GROUP BY 1, 2
    """,
}

TEST_ORACLE = {
    "q_sample_per_lang": f"""
        WITH ranked AS (
            SELECT doc_id, lang,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY {_SQL_TOPK_BUCKET}, doc_id
                   ) AS rk
            FROM documents
        )
        SELECT doc_id, lang FROM ranked WHERE rk <= 3
    """,
}
