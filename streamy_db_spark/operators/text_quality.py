"""Repetition-based quality signals and PII redaction for text corpora.

Two more passes every training-data pipeline runs over raw text:

- **repetition scores** (Gopher-style quality signals): type-token
  ratio and the frequency share of the most-repeated bigram. Documents
  dominated by one repeated phrase (boilerplate, scraped nav bars, SEO
  spam) score high and get filtered before training.
- **PII redaction**: email/phone patterns replaced with typed markers —
  the standard scrub before text leaves the ingest zone.

Scale shape: BOTH are single-scan projections with ZERO shuffles. The
natural formulation of "most frequent bigram per doc" is
explode → groupBy(doc_id, gram) → max(count), which shuffles one row
per distinct gram — corpus-sized traffic for a per-document statistic.
Instead the bigram array is `array_sort`-ed and the longest run of
equal adjacent elements is folded with a higher-order `aggregate`, all
inside whole-stage codegen: per-row work is O(g log g) in the doc's own
gram count, nothing leaves the scan stage, and the plan has no
Exchange at any SF. Redaction is two `regexp_replace`s (Java regex and
DuckDB RE2 agree on the constructs used — same discipline as
operators/text.py).

No reference counterpart (SURVEY.md §2.3 — the reference has no text
surface); part of the training-data extension alongside decontam.py
and text.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from streamy_db_spark.operators.decontam import tokens
from streamy_db_spark.sources.tables import load_table

# Redaction patterns — restricted to constructs where Java regex (Spark)
# and RE2 (DuckDB) provably agree: no backrefs, no lookaround.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{2,4}\b"

# Longest run of equal adjacent elements in a SORTED array == the count
# of the most frequent element — folded entirely JVM-side. `<=>` is the
# null-safe compare (first element sees prev = NULL).
_TOP_RUN_EXPR = """
aggregate(
  array_sort({arr}),
  named_struct('prev', cast(null as string), 'run', 0L, 'best', 0L),
  (acc, x) -> named_struct(
    'prev', x,
    'run',  CASE WHEN x <=> acc.prev THEN acc.run + 1L ELSE 1L END,
    'best', greatest(acc.best,
                     CASE WHEN x <=> acc.prev THEN acc.run + 1L ELSE 1L END)),
  acc -> acc.best)
"""


def bigrams(tokens_col: Column) -> Column:
    """Adjacent token pairs as space-joined strings (empty under 2
    tokens)."""
    return F.when(
        F.size(tokens_col) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens_col) - 1),
            lambda i: F.concat_ws(" ", F.slice(tokens_col, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def with_repetition_score(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "top_bigram_frac",
) -> DataFrame:
    """Append ``out_col`` (the most-frequent-bigram fraction — the
    repetition filter's verdict input) as a PER-ROW projection, keeping
    every input column. This is the quality-gate shape for corpus-sized
    frames: the score is a pure function of the text, so computing it
    in place costs one scan — joining ``repetition_scores`` output back
    on doc_id (the pre-r13 pipeline shape) exchanged the corpus TEXT
    across the cluster for a value a projection produces for free."""
    for c in ("__ts", "__bg"):
        if c in df.columns:
            raise ValueError(f"column {c!r} collides in with_repetition_score")
    tmp = df.withColumn("__ts", tokens(F.col(text_col))).withColumn(
        "__bg", bigrams(F.col("__ts"))
    )
    top_n = F.expr(_TOP_RUN_EXPR.format(arr="__bg"))
    return tmp.withColumn(
        out_col,
        top_n.cast("double")
        / F.greatest(F.size("__bg").cast("long"), F.lit(1)),
    ).drop("__ts", "__bg")


def repetition_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition/diversity signals, shuffle-free."""
    for c in ("__ts", "__bg"):
        if c in df.columns:
            raise ValueError(f"column {c!r} collides in repetition_scores")
    out = df.withColumn("__ts", tokens(F.col(text_col))).withColumn(
        "__bg", bigrams(F.col("__ts"))
    )
    n_tokens = F.size("__ts").cast("long")
    n_distinct = F.size(F.array_distinct("__ts")).cast("long")
    top_n = F.expr(_TOP_RUN_EXPR.format(arr="__bg"))
    n_bigrams = F.size("__bg").cast("long")
    return out.select(
        id_col,
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        (n_distinct.cast("double") / F.greatest(n_tokens, F.lit(1))).alias("ttr"),
        top_n.alias("top_bigram_n"),
        (top_n.cast("double") / F.greatest(n_bigrams, F.lit(1))).alias(
            "top_bigram_frac"
        ),
    )


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Replace email/phone matches with <EMAIL>/<PHONE> markers
    (in place unless ``out_col`` names a new column)."""
    red = F.regexp_replace(
        F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>"),
        PHONE_RE,
        "<PHONE>",
    )
    return df.withColumn(out_col or text_col, red)


def source_mix(
    df: DataFrame,
    by: tuple[str, ...] = ("source", "lang"),
    text_col: str = "text",
) -> DataFrame:
    """Corpus composition per source/lang stratum — document count,
    token volume, and mean type-token ratio — the inputs to sampling
    mixture weights. One scan + one partial-aggregated shuffle of a few
    numeric columns keyed by the (low-cardinality) strata: the shape
    where AQE coalesces the tiny post-shuffle partitions for free."""
    toks = tokens(F.col(text_col))
    n_tokens = F.size(toks).cast("long")
    ttr = F.size(F.array_distinct(toks)).cast("double") / F.greatest(
        F.size(toks), F.lit(1)
    )
    return (
        df.select(*by, n_tokens.alias("__nt"), ttr.alias("__ttr"))
        .groupBy(*by)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__nt").alias("n_tokens"),
            F.round(F.avg("__ttr"), 9).alias("avg_ttr"),
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 2048,
    overlap: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into fixed-token-window chunks with overlap — the
    pre-tokenization step that turns variable-length docs into
    training-sequence-sized pieces. One row per chunk:
    (id, chunk_idx, n_chunk_tokens, chunk_text).

    Stride = chunk_tokens - overlap; the final chunk may be short; a
    doc with <= chunk_tokens tokens yields exactly one chunk; an empty
    doc yields none. Scale shape: pure scan-side explode — tokens,
    chunk starts, and slices are all higher-order JVM expressions, so
    the fan-out happens inside whole-stage codegen with no shuffle and
    no Python. Output partitioning inherits the scan's (chunks of one
    doc stay in one partition)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    sz = F.size(toks)
    # 1 + ceil(max(sz - chunk, 0) / step), integer arithmetic (matches
    # the DuckDB oracle exactly); 0 chunks for empty docs.
    n_chunks = F.when(sz == 0, F.lit(0)).otherwise(
        F.lit(1)
        + F.expr(
            f"(greatest(size(filter(split(lower({text_col}), '\\\\s+'),"
            f" x -> x != '')) - {chunk_tokens}, 0) + {step - 1}) div {step}"
        )
    )
    idx = F.explode(
        F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
            F.array().cast("array<int>")
        )
    )
    out = df.select(id_col, F.col(text_col), idx.alias("chunk_idx"))
    ctoks = F.slice(
        tokens(F.col(text_col)), F.col("chunk_idx") * step + 1, chunk_tokens
    )
    return out.select(
        id_col,
        "chunk_idx",
        F.size(ctoks).cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", ctoks).alias("chunk_text"),
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k TF-IDF terms per document (idf = ln((N+1)/(df+1))).

    Scale shape: token explode → two map-side-combined aggregations
    ((doc, term) counts and per-term document frequency) → shuffle join
    keyed by term (uniform: terms are the key, df table is vocab-sized,
    far smaller than the corpus) → per-doc top-k window. The corpus
    count N rides along as a 1-row broadcast cross join. No Python
    anywhere; every stage partial-aggregates before shuffling."""
    from pyspark.sql import Window

    terms = df.select(
        id_col, F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("__tf"))
    dfreq = terms.distinct().groupBy("term").agg(
        F.count(F.lit(1)).alias("__df")
    )
    n = df.select(F.count(F.lit(1)).alias("__n"))
    scored = tf.join(dfreq, "term").crossJoin(F.broadcast(n)).select(
        id_col,
        "term",
        F.round(
            F.col("__tf") * F.log((F.col("__n") + 1.0) / (F.col("__df") + 1.0)), 6
        ).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "score")
    )


def pack_sequences(
    df: DataFrame,
    seq_tokens: int,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    order_col: str | None = None,
) -> DataFrame:
    """GPT-style sequence packing: concatenate documents (in ``id_col``
    order within each shard — or by ``order_col`` with ``id_col``
    tiebreak, e.g. the ``pos`` coordinate from
    ``sampling.shuffle_corpus`` so packed sequences interleave a
    reproducible pseudorandom document order) and chop the token stream
    into fixed
    ``seq_tokens`` blocks. Emits one row per (document × block it
    overlaps): (shard, id, seq_id, doc_tok_start, n_toks) — the exact
    map a data loader needs to assemble training sequences with zero
    padding except the final block per shard.

    Scale shape: packing is sequential BY DESIGN, so the total order is
    scoped to the shard (``shard_col``), never the corpus: one window
    cumulative-sum per shard partition + a bounded explode over the
    blocks each doc touches. Shards pack independently — exactly how a
    100 TB corpus is packed in practice (per input shard/file group) —
    so no global sort exists anywhere in the plan."""
    from pyspark.sql import Window

    toks = tokens(F.col(text_col))
    n = F.size(toks).cast("long")
    order = [order_col, id_col] if order_col else [id_col]
    w = (
        Window.partitionBy(shard_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = (
        df.select(shard_col, id_col, *([order_col] if order_col else []), n.alias("__n"))
        .filter(F.col("__n") > 0)
        .withColumn("__off", F.coalesce(F.sum("__n").over(w), F.lit(0)))
    )
    first_b = F.expr(f"__off div {seq_tokens}")
    last_b = F.expr(f"(__off + __n - 1) div {seq_tokens}")
    out = base.withColumn("seq_id", F.explode(F.sequence(first_b, last_b)))
    span_start = F.greatest(F.col("__off"), F.col("seq_id") * seq_tokens)
    span_end = F.least(
        F.col("__off") + F.col("__n"), (F.col("seq_id") + 1) * seq_tokens
    )
    return out.select(
        shard_col,
        id_col,
        F.col("seq_id").cast("long").alias("seq_id"),
        (span_start - F.col("__off")).cast("long").alias("doc_tok_start"),
        (span_end - span_start).cast("long").alias("n_toks"),
    )


# --- test-registry queries (oracle-checked; no driver slot used) -------------


def q_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return source_mix(load_table(spark, sf_dir, "documents"))


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_top_terms(load_table(spark, sf_dir, "documents"), k=3)


_SEQ_L = 512  # packing block; small enough that sf shards span many blocks


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs, seq_tokens=_SEQ_L)


_CHUNK, _OVERLAP = 20, 5  # small enough that sf docs split into several chunks


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk rows with the chunk content digested so the full text of
    every chunk is hash-checked without shipping it to the compare."""
    docs = load_table(spark, sf_dir, "documents")
    ch = chunk_documents(docs, chunk_tokens=_CHUNK, overlap=_OVERLAP)
    return ch.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "n_chunk_tokens",
        F.md5(F.encode(F.col("chunk_text"), "UTF-8")).alias("digest"),
    )


def q_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return repetition_scores(docs)


def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII is planted in-query (every 7th doc gets a synthetic email +
    phone appended) so the redaction verdict is non-vacuous on the
    word-salad harness text; the md5 digest of the redacted text makes
    the whole content hash-checkable, and ``delta`` pins that clean
    docs are byte-identical after the pass."""
    docs = load_table(spark, sf_dir, "documents")
    aug = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-01"),
            F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
            F.lit(" now"),
        ),
    ).otherwise(F.col("text"))
    out = redact_pii(
        docs.select("doc_id", aug.alias("text")), "text", out_col="rtext"
    )
    return out.select(
        "doc_id",
        (F.length("text") - F.length("rtext")).cast("long").alias("delta"),
        F.md5(F.encode(F.col("rtext"), "UTF-8")).alias("digest"),
    )


# q_pack_sequences promoted to a DRIVER slot in r6 (r5 verdict item 5):
# GPT-style sequence packing is production-critical for a training-data
# engine and its window-cumsum formulation deserves the driver's strong
# hash gate, not just local verification.
QUERIES: dict = {"q_pack_sequences": q_pack_sequences}
ORACLE: dict = {}

TEST_QUERIES = {
    "q_repetition_scores": q_repetition_scores,
    "q_pii_redaction": q_pii_redaction,
    "q_source_mix": q_source_mix,
    "q_chunk_documents": q_chunk_documents,
    "q_tfidf_top_terms": q_tfidf_top_terms,
}

_CHUNK_STEP = _CHUNK - _OVERLAP

TEST_ORACLE = {
    "q_tfidf_top_terms": """
        WITH tok AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                               t -> t <> '') AS ts
            FROM documents
        ),
        terms AS (
            SELECT doc_id, t AS term FROM tok, unnest(ts) AS u(t)
        ),
        tf AS (
            SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term
        ),
        df AS (
            SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY term
        ),
        n AS (SELECT count(*) AS n FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term,
                   round(tf.tf * ln((n.n + 1.0) / (df.df + 1.0)), 6) AS score
            FROM tf JOIN df USING (term), n
        ),
        ranked AS (
            SELECT doc_id, term, score,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY score DESC, term
                   ) AS rk
            FROM scored
        )
        SELECT doc_id, rk AS rank, term, score FROM ranked WHERE rk <= 3
    """,
    "q_chunk_documents": f"""
        WITH tok AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                               t -> t <> '') AS ts
            FROM documents
        ),
        n AS (
            SELECT doc_id, ts,
                   CASE WHEN len(ts) = 0 THEN 0
                        ELSE 1 + (greatest(len(ts) - {_CHUNK}, 0)
                                  + {_CHUNK_STEP} - 1) // {_CHUNK_STEP}
                   END AS n_chunks
            FROM tok
        ),
        chunks AS (
            SELECT doc_id, i AS chunk_idx,
                   ts[1 + i*{_CHUNK_STEP} : i*{_CHUNK_STEP} + {_CHUNK}] AS ctoks
            FROM n, unnest(generate_series(0, n_chunks - 1)) AS u(i)
        )
        SELECT doc_id, chunk_idx, len(ctoks) AS n_chunk_tokens,
               md5(array_to_string(ctoks, ' ')) AS digest
        FROM chunks
    """,
    # avg over doubles is order-sensitive in the last bits → rounded on
    # BOTH sides so the oracle hash compare is order-insensitive
    "q_source_mix": """
        WITH tok AS (
            SELECT source, lang,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                               t -> t <> '') AS ts
            FROM documents
        )
        SELECT source, lang,
               count(*) AS n_docs,
               CAST(sum(len(ts)) AS BIGINT) AS n_tokens,
               round(avg(CAST(len(list_distinct(ts)) AS DOUBLE)
                         / greatest(len(ts), 1)), 9) AS avg_ttr
        FROM tok
        GROUP BY source, lang
    """,
    "q_repetition_scores": """
        WITH tok AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                               t -> t <> '') AS ts
            FROM documents
        ),
        bg AS (
            SELECT doc_id, ts[i] || ' ' || ts[i+1] AS g
            FROM tok, unnest(generate_series(1, len(ts) - 1)) AS u(i)
            WHERE len(ts) >= 2
        ),
        bgc AS (
            SELECT doc_id, max(n) AS top_bigram_n, sum(n) AS n_bigrams
            FROM (SELECT doc_id, g, count(*) AS n FROM bg GROUP BY doc_id, g)
            GROUP BY doc_id
        )
        SELECT t.doc_id,
               len(ts) AS n_tokens,
               len(list_distinct(ts)) AS n_distinct_tokens,
               CAST(len(list_distinct(ts)) AS DOUBLE)
                   / greatest(len(ts), 1) AS ttr,
               coalesce(b.top_bigram_n, 0) AS top_bigram_n,
               CAST(coalesce(b.top_bigram_n, 0) AS DOUBLE)
                   / greatest(coalesce(b.n_bigrams, 0), 1) AS top_bigram_frac
        FROM tok t LEFT JOIN bgc b USING (doc_id)
    """,
    "q_pii_redaction": """
        WITH aug AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0
                        THEN text || ' contact user' || doc_id
                             || '@example.com or 555-01'
                             || lpad((doc_id % 100)::VARCHAR, 2, '0') || ' now'
                        ELSE text END AS text
            FROM documents
        ),
        red AS (
            SELECT doc_id, text,
                   regexp_replace(regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                       '\\b\\d{3}-\\d{2,4}\\b', '<PHONE>', 'g') AS rtext
            FROM aug
        )
        SELECT doc_id,
               length(text) - length(rtext) AS delta,
               md5(rtext) AS digest
        FROM red
    """,
}

ORACLE["q_pack_sequences"] = f"""
        WITH base AS (
            SELECT source, doc_id,
                   len(list_filter(string_split_regex(lower(text), '\\s+'),
                                   t -> t <> '')) AS n
            FROM documents
        ),
        offs AS (
            SELECT source, doc_id, n,
                   CAST(coalesce(sum(n) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS off
            FROM base WHERE n > 0
        ),
        blocks AS (
            SELECT source, doc_id, n, off, b AS seq_id
            FROM offs,
                 unnest(generate_series(off // {_SEQ_L},
                                        (off + n - 1) // {_SEQ_L})) AS u(b)
        )
        SELECT source, doc_id, seq_id,
               greatest(off, seq_id * {_SEQ_L}) - off AS doc_tok_start,
               least(off + n, (seq_id + 1) * {_SEQ_L})
                   - greatest(off, seq_id * {_SEQ_L}) AS n_toks
        FROM blocks
    """
