"""Deduplication operators for training-data pipelines.

Exact dedup: hash-groupBy on a content digest — one shuffle on the digest
key, linear at any scale (the canonical 100 TB shape: digest is computed
scan-side, the shuffle moves (digest, doc_id) pairs only, never text).

Near-dup (embedding cosine): brute-force pair join for the oracle-checked
correctness query; the LSH-bucketed variant in operators/similarity.py is
the scale path.

MinHash-LSH / SimHash / n-gram Jaccard live in operators/minhash.py (the
shingle pipeline is shared between them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamy_db_spark.operators.similarity import dot, norm
from streamy_db_spark.operators.text import WS_RE
from streamy_db_spark.sources.tables import load_table


def fingerprint_documents(docs: DataFrame) -> DataFrame:
    normalized = F.lower(F.trim(F.regexp_replace(F.col("text"), WS_RE, " ")))
    return docs.withColumn("fingerprint", F.md5(F.encode(normalized, "UTF-8")))


def dedupe_exact(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id document per content fingerprint."""
    fp = fingerprint_documents(docs)
    keepers = fp.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    return fp.join(keepers, ["fingerprint", id_col], "inner").drop("fingerprint")


# --- q_dedup_exact: duplicate-group summary (oracle-checkable) --------------
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        fingerprint_documents(docs)
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_copies"))
    )


# --- q_dedup_near_embedding: cosine near-dup pairs (brute force) ------------
NEAR_DUP_COS = 0.90


def near_dup_pairs_embedding(
    emb: DataFrame, threshold: float = NEAR_DUP_COS,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold. O(N²) scoring — correct
    baseline; for scale use similarity.lsh_ann_topk-style bucketing so only
    same-bucket pairs are scored."""
    a = emb.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).cast("array<double>").alias("va"),
    )
    b = emb.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).cast("array<double>").alias("vb"),
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = dot(F.col("va"), F.col("vb")) / (norm(F.col("va")) * norm(F.col("vb")))
    return (
        pairs.select("id_a", "id_b", cos.alias("cos_raw"))
        .filter(F.col("cos_raw") >= threshold)
        .select("id_a", "id_b", F.round("cos_raw", 4).alias("cosine"))
    )


def q_dedup_near_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return near_dup_pairs_embedding(emb)


def near_dup_pairs_lsh(
    emb: DataFrame, threshold: float = NEAR_DUP_COS,
    n_tables: int = 8, n_planes: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Scale path for embedding near-dup: candidates = same-bucket pairs
    in ANY of the LSH tables (the O(N²) scoring collapses to per-bucket
    locality; the shuffle key (table, bucket) is uniform). Same output
    schema as the exact baseline; recall < 1 by design — guarded by a
    recall test against near_dup_pairs_embedding."""
    import numpy as np
    import pandas as pd

    from streamy_db_spark.operators.similarity import lsh_buckets_multi

    b = lsh_buckets_multi(emb.select(id_col, vec_col), n_tables, n_planes, vec_col)

    # Fused candidate-generation + verification: one pairwise matmul per
    # (table, bucket) group. Each vector crosses the wire n_tables times
    # (16k rows here), and only ABOVE-THRESHOLD pairs come back — vs. the
    # join formulation that ships every candidate pair's two vectors
    # through Arrow (~1M pairs × 128 doubles ≈ 1 GB at sf0.1; measured
    # 3× slower). The shuffle key (table, bucket) is uniform by
    # construction; at larger N, raise n_planes so per-bucket B = N/2^planes
    # keeps the O(B²) local matmul in memory (planes scale with log N).
    def _score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos_raw": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cos_raw": "float64"}
            )
        ids = pdf["_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        m = np.stack(pdf["_vec"].to_numpy())[order].astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        cos = m @ m.T
        ia, ib = np.nonzero(np.triu(cos >= threshold, k=1))
        return pd.DataFrame(
            {"id_a": ids[ia], "id_b": ids[ib], "cos_raw": cos[ia, ib]}
        )

    pairs = (
        b.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_vec"),
            "lsh_table",
            "lsh_bucket",
        )
        .groupBy("lsh_table", "lsh_bucket")
        .applyInPandas(_score_bucket, "id_a long, id_b long, cos_raw double")
    )
    # A pair found in several tables/buckets repeats; max() collapses the
    # (bit-near-identical) duplicates deterministically.
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.round(F.max("cos_raw"), 4).alias("cosine"))
    )


def q_dedup_near_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate near-dup pairs (rows-only check — approximate by
    design; recall vs the exact baseline guarded in tests)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return near_dup_pairs_lsh(emb)


QUERIES = {
    "q_dedup_exact": q_dedup_exact,
    "q_dedup_near_embedding": q_dedup_near_embedding,
    "q_dedup_near_lsh": q_dedup_near_lsh,
}

ORACLE = {
    "q_dedup_exact": r"""
        SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint,
               min(doc_id) AS keeper_id,
               count(*) AS n_copies
        FROM documents GROUP BY 1
    """,
    "q_dedup_near_embedding": f"""
        WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_dot_product(a.e, b.e) /
                     (sqrt(list_dot_product(a.e, a.e)) *
                      sqrt(list_dot_product(b.e, b.e))), 4) AS cosine
        FROM v a JOIN v b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.e, b.e) /
              (sqrt(list_dot_product(a.e, a.e)) *
               sqrt(list_dot_product(b.e, b.e))) >= {NEAR_DUP_COS}
    """,
}
