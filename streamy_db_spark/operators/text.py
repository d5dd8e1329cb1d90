"""Text analysis for training-data pipelines over the ``documents`` table:
language ID (stopword-hit heuristic), token counting, quality scoring,
and content fingerprinting.

All ops are single-scan, JVM-side expressions (regexp + hash built-ins) —
no Python UDFs — so they stream through whole-stage codegen and scale
linearly: at 100 TB each is one pass over the text column with no shuffle
(fingerprint dedup adds one hash-partition shuffle on the digest).

Every heuristic is written to be bit-identically expressible in DuckDB
SQL (same regex, same arithmetic) so the driver's oracle gate is strong,
not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamy_db_spark.sources.tables import load_table

# Shared regexes — RE2 (DuckDB) and Java (Spark) agree on these constructs.
EN_STOPWORD_RE = r"\b(the|and|of|to|in|is|that|for|with|was)\b"
WS_RE = r"\s+"
PUNCT_RE = r"[.,!?;:]"


def _tokens(col):
    # split on whitespace, drop empties (leading-separator artifacts)
    return F.filter(F.split(col, WS_RE), lambda x: x != "")


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization + a BPE-ish proxy (chars/4 heuristic)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(_tokens(F.col("text")))
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        (F.length("text") - F.length(F.regexp_replace("text", WS_RE, ""))).alias(
            "n_ws"
        ),
        F.ceil(F.length("text") / 4).cast("long").alias("approx_bpe_tokens"),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID: ≥3 English stopword hits → 'en'.

    (A production n-gram model would be a lookup-table scoring pass with
    the same single-scan shape.) Output keeps the labeled lang so the
    prediction is auditable.
    """
    docs = load_table(spark, sf_dir, "documents")
    hits = F.size(F.regexp_extract_all(F.col("text"), F.lit(EN_STOPWORD_RE), 0))
    return docs.select(
        "doc_id",
        "lang",
        hits.alias("en_hits"),
        F.when(hits >= 3, F.lit("en")).otherwise(F.lit("other")).alias("lang_pred"),
    )


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / punctuation / stopword-ratio quality heuristic in [0,1]."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(_tokens(F.col("text")))
    n_punct = F.size(F.regexp_extract_all(F.col("text"), F.lit(PUNCT_RE), 0))
    n_stop = F.size(F.regexp_extract_all(F.col("text"), F.lit(EN_STOPWORD_RE), 0))
    len_ok = (F.length("text") >= 100) & (F.length("text") <= 20000)
    punct_ratio = n_punct / F.greatest(n_tokens, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_tokens, F.lit(1))
    score = (
        len_ok.cast("double") * 0.4
        + F.least(stop_ratio * 4, F.lit(1.0)) * 0.4
        + F.least(punct_ratio * 10, F.lit(1.0)) * 0.2
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stop"),
        F.round(score, 4).alias("quality"),
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: md5 of lowercase whitespace-normalized text.

    The canonical exact-dedup key (rolling/Rabin hashes would serve chunk-
    level dedup; document-level wants a full-content digest).
    """
    docs = load_table(spark, sf_dir, "documents")
    normalized = F.lower(F.trim(F.regexp_replace(F.col("text"), WS_RE, " ")))
    return docs.select(
        "doc_id",
        F.md5(F.encode(normalized, "UTF-8")).alias("fingerprint"),
    )


def q_text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidated text-analysis surface (r3): token counting, language
    ID, quality scoring, and content fingerprinting in ONE scan.

    The individual operators above remain the public API (and are still
    plan-gated in tests/test_plans.py); this combined query keeps all
    four driver-checked from a single correctness slot, and is also the
    realistic pipeline shape — a training-data filter pass computes all
    of these per document in one pass, not four scans.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(_tokens(F.col("text")))
    hits = F.size(F.regexp_extract_all(F.col("text"), F.lit(EN_STOPWORD_RE), 0))
    n_punct = F.size(F.regexp_extract_all(F.col("text"), F.lit(PUNCT_RE), 0))
    len_ok = (F.length("text") >= 100) & (F.length("text") <= 20000)
    punct_ratio = n_punct / F.greatest(n_tokens, F.lit(1))
    stop_ratio = hits / F.greatest(n_tokens, F.lit(1))
    score = (
        len_ok.cast("double") * 0.4
        + F.least(stop_ratio * 4, F.lit(1.0)) * 0.4
        + F.least(punct_ratio * 10, F.lit(1.0)) * 0.2
    )
    normalized = F.lower(F.trim(F.regexp_replace(F.col("text"), WS_RE, " ")))
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        (F.length("text") - F.length(F.regexp_replace("text", WS_RE, ""))).alias(
            "n_ws"
        ),
        F.ceil(F.length("text") / 4).cast("long").alias("approx_bpe_tokens"),
        "lang",
        hits.alias("en_hits"),
        F.when(hits >= 3, F.lit("en")).otherwise(F.lit("other")).alias("lang_pred"),
        n_punct.alias("n_punct"),
        F.round(score, 4).alias("quality"),
        F.md5(F.encode(normalized, "UTF-8")).alias("fingerprint"),
    )


QUERIES = {
    "q_text_analysis": q_text_analysis,
}

_SQL_TOKENS = r"len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))"
_SQL_EN_HITS = (
    r"len(regexp_extract_all(text, '\b(the|and|of|to|in|is|that|for|with|was)\b'))"
)
_SQL_PUNCT = r"len(regexp_extract_all(text, '[.,!?;:]'))"

ORACLE = {
    "q_text_analysis": f"""
        SELECT doc_id,
               {_SQL_TOKENS} AS n_tokens,
               length(text) - length(regexp_replace(text, '\\s+', '', 'g')) AS n_ws,
               CAST(ceil(length(text) / 4.0) AS BIGINT) AS approx_bpe_tokens,
               lang,
               {_SQL_EN_HITS} AS en_hits,
               CASE WHEN {_SQL_EN_HITS} >= 3 THEN 'en' ELSE 'other' END AS lang_pred,
               {_SQL_PUNCT} AS n_punct,
               round(
                 (CASE WHEN length(text) BETWEEN 100 AND 20000 THEN 1.0 ELSE 0.0 END) * 0.4
                 + least({_SQL_EN_HITS} / greatest({_SQL_TOKENS}, 1)::DOUBLE * 4, 1.0) * 0.4
                 + least({_SQL_PUNCT} / greatest({_SQL_TOKENS}, 1)::DOUBLE * 10, 1.0) * 0.2,
               4) AS quality,
               md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
        FROM documents
    """,
}
