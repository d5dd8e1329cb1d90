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


def hash_u32(id_col: Column, salt: str) -> Column:
    """Full 32-bit hash: first 8 hex chars of md5(id ∥ '|' ∥ salt) as a
    long in [0, 2³²). 32 bits so the integer conversion is exact in
    both engines; the salt decouples independent draws over the same
    ids."""
    digest = F.md5(F.encode(F.concat(id_col.cast("string"), F.lit("|" + salt)), "UTF-8"))
    return F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")


def hash_bucket(id_col: Column, salt: str) -> Column:
    """Stable bucket in [0, 10_000): hash_u32 mod 10_000 — coarse
    membership resolution for splits/samples. Anything that needs a
    near-total ORDER (shuffle_corpus) must use hash_u32 directly: the
    bucket has only 10⁴ values, so ordering by it leaves id-ordered
    runs once a corpus outgrows ~10k docs."""
    return (hash_u32(id_col, salt) % _BUCKETS).cast("int")


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


def mixture_sample(
    df: DataFrame,
    weights: dict[str, int],
    total_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "mix-v1",
) -> DataFrame:
    """Deterministic mixture rebalancer: draw a sample whose per-source
    token volume approaches ``total_tokens × w_s / Σw`` — the step that
    turns mixture weights (web 70 / books 20 / code 10) into actual
    training-corpus membership.

    Keep rule for a doc in source s with hash bucket b:
        b · Σw · tokens_s  <  10_000 · total_tokens · w_s
    evaluated in decimal(38,0) — EXACT integer arithmetic, no float
    rounding, no int64 overflow at 100 TB token volumes (DuckDB mirrors
    it in HUGEINT, so the operator sits under the value-hash oracle
    gate). When a source is under-represented (its fair share exceeds
    its volume) the inequality holds for every bucket and the whole
    source is kept — the min(1, ·) clamp falls out of the algebra.

    Properties (tested): membership is monotone in ``total_tokens``
    (growing the budget only ADDS docs), stable across re-partitioning
    and reruns (md5-bucket, not rand()), and composes with
    ``with_split`` (independent salts). Sources absent from ``weights``
    get weight 0 — excluded. Integer weights by design: exact
    arithmetic needs exact inputs; scale float ratios to integers.

    Scale shape: ONE map-side-combined aggregation for per-source token
    volumes (source-cardinality rows → broadcast join back), then a
    scan-side filter. No corpus-wide shuffle, no driver collect."""
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-empty and non-negative")
    if total_tokens < 0:
        raise ValueError(f"total_tokens must be >= 0, got {total_tokens}")
    clash = {"__tok_s", "__w"} & set(df.columns)
    if clash:
        raise ValueError(f"columns {sorted(clash)} collide in mixture_sample")
    w_total = sum(weights.values())
    if w_total == 0:
        raise ValueError("at least one weight must be positive")
    from pyspark.sql.functions import broadcast

    from streamy_db_spark.operators.decontam import tokens as _tokens

    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(k, int(v)) for k, v in weights.items()], f"{source_col} string, __w long"
    )
    vol = (
        df.select(
            source_col, F.size(_tokens(F.col(text_col))).cast("long").alias("__nt")
        )
        .groupBy(source_col)
        .agg(F.sum("__nt").alias("__tok_s"))
    )
    dec = "decimal(38,0)"
    keep = (
        hash_bucket(F.col(id_col), salt).cast(dec)
        * F.lit(w_total).cast(dec)
        * F.col("__tok_s").cast(dec)
    ) < (
        F.lit(_BUCKETS).cast(dec)
        * F.lit(total_tokens).cast(dec)
        * F.col("__w").cast(dec)
    )
    return (
        df.join(broadcast(vol), source_col)
        .join(broadcast(wdf), source_col)
        .filter(keep)
        .drop("__tok_s", "__w")
    )


def shuffle_corpus(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shuffle-v1",
) -> DataFrame:
    """Deterministic corpus shuffle for training-data layout: every doc
    gets a (shard, pos) coordinate where shard = hash bucket mod
    ``n_shards`` and pos = rank of the doc's hash within its shard.
    Reading shards in order then rows in pos order yields a pseudorandom
    document order that is REPRODUCIBLE — a pure function of (id, salt),
    stable across reruns, re-partitioning, and incremental rebuilds, and
    re-drawable with a fresh salt per epoch. ``orderBy(rand())`` has
    none of those properties.

    Scale shape: ONE shuffle keyed by shard (this is a layout job — the
    one shuffle is the point), per-shard sort inside the window; never a
    corpus-GLOBAL sort (no rangepartitioning over all rows; each shard
    sorts independently, and shard sizes are balanced by construction —
    md5 buckets are uniform). Ordering uses the FULL 32-bit hash value
    (not the 10⁴-bucket projection — that would leave id-ordered runs
    of ~n/10⁴ docs, leaking corpus order into training batches, r6
    review); residual 32-bit ties break by id, so pos is total and
    deterministic. Compose: write with
    ``files.write_partitioned(..., ["shard"])`` and feed training
    readers shard files directly."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    clash = {"shard", "pos", "__h"} & set(df.columns)
    if clash:
        # same convention as with_split: never silently replace a
        # caller's column with a coordinate (r6 review)
        raise ValueError(f"columns {sorted(clash)} collide in shuffle_corpus")
    from pyspark.sql import Window

    h = hash_u32(F.col(id_col), salt)
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    return (
        df.withColumn("__h", h)
        .withColumn("shard", (F.col("__h") % n_shards).cast("int"))
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("__h")
    )


# --- test-registry queries (oracle-checked; no driver slot used) -------------


def q_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three deterministic docs per language — the per-stratum eval-set
    draw, fully hash-checkable because the hash order is md5."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return sample_k_per_group(docs, ["lang"], "doc_id", k=3, salt="topk-v1")


_SHUFFLE_SHARDS = 8


def q_shuffle_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shuffle coordinates over documents — (shard, pos)
    are pure md5 arithmetic, hence hash-checkable."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return shuffle_corpus(docs, _SHUFFLE_SHARDS)


_MIX_WEIGHTS = {"src0": 3, "src1": 1, "src2": 1}
_MIX_TOTAL = 2_000  # tokens — samples all three sources non-trivially at sf0.01


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-rebalanced sample membership over three sources — the
    kept (doc_id, source) set is a pure function of the md5 buckets and
    exact integer token accounting, hence hash-checkable."""
    docs = load_table(spark, sf_dir, "documents")
    return mixture_sample(docs, _MIX_WEIGHTS, _MIX_TOTAL).select(
        "doc_id", "source"
    )


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
# q_mixture_sample + q_shuffle_corpus promoted in r7 (r6 verdict item
# 1): both are hash-exact, and they replace the two approximate-by-
# design rows-only slots (q_sketch_aggs, q_ann_ivf — rotated to their
# modules' test registries with their error/recall guards intact), so
# the driver gate records 50/50 rows+schema+hash.
QUERIES: dict = {
    "q_train_test_split": q_train_test_split,
    "q_mixture_sample": q_mixture_sample,
    "q_shuffle_corpus": q_shuffle_corpus,
}

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

_SQL_SHUFFLE_U32 = (
    "(('0x' || substring(md5(doc_id::VARCHAR || '|shuffle-v1'), 1, 8))::BIGINT)"
)

_SQL_MIX_BUCKET = (
    "(('0x' || substring(md5(doc_id::VARCHAR || '|mix-v1'), 1, 8))::BIGINT"
    f" % {_BUCKETS})"
)

_SQL_MIX_WEIGHTS_VALUES = ", ".join(
    f"('{s}', {w})" for s, w in _MIX_WEIGHTS.items()
)

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
    "q_shuffle_corpus": f"""
        WITH h AS (
            SELECT doc_id, {_SQL_SHUFFLE_U32} AS hb FROM documents
        )
        SELECT doc_id,
               CAST(hb % {_SHUFFLE_SHARDS} AS INTEGER) AS shard,
               CAST(row_number() OVER (
                   PARTITION BY hb % {_SHUFFLE_SHARDS}
                   ORDER BY hb, doc_id
               ) - 1 AS BIGINT) AS pos
        FROM h
    """,
    # exact-integer mirror of mixture_sample's keep rule in HUGEINT
    # (Spark side runs decimal(38,0) — same exact arithmetic)
    "q_mixture_sample": f"""
        WITH w(source, wgt) AS (VALUES {_SQL_MIX_WEIGHTS_VALUES}),
        vol AS (
            SELECT source,
                   CAST(sum(len(list_filter(
                       string_split_regex(lower(text), '\\s+'),
                       t -> t <> ''))) AS BIGINT) AS tok_s
            FROM documents GROUP BY source
        )
        SELECT d.doc_id, d.source
        FROM documents d
        JOIN vol v ON v.source = d.source
        JOIN w ON w.source = d.source
        WHERE {_SQL_MIX_BUCKET}::HUGEINT
                  * {sum(_MIX_WEIGHTS.values())}::HUGEINT
                  * v.tok_s::HUGEINT
              < {_BUCKETS}::HUGEINT
                  * {_MIX_TOTAL}::HUGEINT
                  * w.wgt::HUGEINT
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
