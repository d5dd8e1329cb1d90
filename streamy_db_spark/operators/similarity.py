"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exact baseline: a single scan with a
JVM-side elementwise fold (``zip_with`` + ``aggregate``) — no Python in
the hot path, fully codegen'd, and embarrassingly parallel (each
partition scores independently; the top-k is a tiny per-partition heap
merged on the driver via ``orderBy().limit()``, which Spark executes as
TakeOrderedAndProject — no full sort, no full shuffle).

Scale path: at 100 TB the scan dominates; the LSH-bucketed variant
(``lsh_bucket_candidates``) turns O(N) per query into O(N/buckets) by
random-hyperplane bucketing, at recall < 1.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Elementwise dot product of two array<double> columns (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_dp: int | None = 4,
) -> DataFrame:
    """Exact top-k by cosine similarity against a literal query vector.

    The query-vector norm is a Python-side constant (driver computes it
    once; no per-row recompute). Output: (id_col, cosine) with cosine
    optionally rounded for oracle comparison; ORDER is by the raw cosine
    with id tiebreak, so the result set is deterministic.
    """
    qnorm = math.sqrt(sum(x * x for x in query_vec))
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    a = F.col(vec_col).cast("array<double>")
    cos_raw = dot(a, qcol) / (norm(a) * F.lit(qnorm))
    scored = emb.select(F.col(id_col), cos_raw.alias("cos_raw"))
    top = scored.orderBy(F.col("cos_raw").desc(), F.col(id_col)).limit(k)
    cos_out = F.round(F.col("cos_raw"), round_dp) if round_dp is not None else F.col("cos_raw")
    return top.select(id_col, cos_out.alias("cosine"))


def cosine_topk_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact k-NN for a *set* of query vectors: broadcast the (small) query
    side against the corpus scan, score, and keep top-k per query with a
    window — the 100 TB-safe shape (corpus never shuffles; one scan).

    queries: (query_id, embedding); corpus: (id_col, embedding).
    Output: (query_id, neighbor_id, cosine) with k rows per query.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
        norm(F.col(vec_col).cast("array<double>")).alias("qnorm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
        norm(F.col(vec_col).cast("array<double>")).alias("cnorm"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        (dot(F.col("cvec"), F.col("qvec")) / (F.col("cnorm") * F.col("qnorm"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


# --- registered queries ------------------------------------------------------

KNN_BATCH_K = 3
KNN_BATCH_NQ = 5  # vec_id < 5 used as the query set


def q_knn_batch(spark, sf_dir: str) -> DataFrame:
    """Batch k-NN: a small query set (vec_id < 5) broadcast against the
    full corpus; top-3 per query. The corpus never shuffles — the 100 TB
    shape for 'embed a prompt set, retrieve neighbors'."""
    from streamy_db_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < KNN_BATCH_NQ).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = cosine_topk_join(queries, emb, k=KNN_BATCH_K)
    return out.select(
        "query_id", "neighbor_id", F.round("cosine", 4).alias("cosine")
    )


def q_ann_lsh(spark, sf_dir: str) -> DataFrame:
    """Approximate k-NN via random-hyperplane LSH buckets (recall < 1 —
    no exact SQL oracle; driver records the rows-only check). Same query
    set as q_knn_batch so recall is directly comparable."""
    from streamy_db_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < KNN_BATCH_NQ).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = lsh_ann_topk(
        queries, emb, k=KNN_BATCH_K, n_tables=8, n_planes=4,
        dim=dim_for(emb, sf_dir),
    )
    return out.select(
        "query_id", "neighbor_id", F.round("cosine", 4).alias("cosine")
    )


# --- IVF (inverted-file) ANN -------------------------------------------------

IVF_CLUSTERS = 16
IVF_ITERS = 2
IVF_NPROBE = 4
IVF_TRAIN_FRACTION = 0.25


def _unit_rows(M: np.ndarray) -> np.ndarray:
    """Row-normalize (driver-side only — UDF bodies must NOT reference
    module-level functions: cloudpickle serializes those by reference,
    which breaks on executors whose Python can't import this package,
    e.g. a driver running from a different cwd)."""
    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return M / n


def _cluster_udfs(centroids: np.ndarray, nprobe: int):
    """(argmax-cluster, top-nprobe-clusters) pandas UDFs against a fixed
    centroid matrix. One numpy matmul per Arrow batch — the same
    vectorization trick as pair_cosine; the centroid matrix rides along
    as a broadcast-sized closure constant (n_clusters × dim floats)."""
    from pyspark.sql.functions import pandas_udf

    C = _unit_rows(centroids).T  # (dim, n_clusters), unit columns

    def _sims(vs: pd.Series) -> np.ndarray:
        V = np.stack(vs.to_numpy())
        vn = np.linalg.norm(V, axis=1, keepdims=True)
        vn[vn == 0.0] = 1.0
        return (V / vn) @ C  # (n, n_clusters)

    @pandas_udf("int")
    def assign(vs: pd.Series) -> pd.Series:
        return pd.Series(np.argmax(_sims(vs), axis=1))

    @pandas_udf("array<int>")
    def probe(vs: pd.Series) -> pd.Series:
        # argsort is ascending & stable → reversed slice = top-nprobe by
        # sim with lowest-cluster-id tiebreak, matching argmax above.
        order = np.argsort(-_sims(vs), axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(order.astype("int32")))

    return assign, probe


IVF_MAX_TRAIN_ROWS = 50_000  # ≈ 50 MB at dim 128 — bounded driver memory


def ivf_cluster_count(
    n_vectors: int,
    min_clusters: int = IVF_CLUSTERS,
    max_clusters: int = IVF_MAX_TRAIN_ROWS // 4,
) -> int:
    """The production IVF list-count sizing rule: K ≈ 4·√N (the low end
    of the published FAISS guideline 4√N–16√N — per-query probe work
    nprobe·N/K balances the K-sized centroid scan near K ~ √N; the 4×
    favors recall). Floored at IVF_CLUSTERS, capped at N and at a
    quarter of the driver training sample so every centroid trains on
    ≥4 points (the floor outranks the ≥4-points cap for degenerately
    thin samples, where the trainer's own len(sample) clamp then binds
    instead — the returned matrix always has exactly the K the auto
    path settles on). A PINNED K has the same failure mode the semantic-dedup
    sf1 probe measured for cluster-bounded scoring: lists grow with the
    corpus and probe cost goes super-linear — size K with N instead."""
    if n_vectors <= 0:
        return min_clusters
    import math

    k = 4 * math.isqrt(n_vectors)
    return max(1, min(n_vectors, max(min_clusters, min(k, max_clusters))))


def ivf_train_centroids(
    corpus: DataFrame,
    n_clusters: int | None = IVF_CLUSTERS,
    n_iters: int = IVF_ITERS,
    train_fraction: float = IVF_TRAIN_FRACTION,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    max_train_rows: int = IVF_MAX_TRAIN_ROWS,
) -> np.ndarray:
    """Train IVF centroids driver-locally on a BOUNDED corpus sample.

    Index training never needs the full corpus — centroid quality
    converges long before the sample stops growing (FAISS trains IVF on
    ≤256 points per centroid for billion-vector indexes). So the split
    is: ONE distributed sampling scan collects ≤ ``max_train_rows``
    vectors (constant driver memory regardless of corpus size — at
    100 TB, ``train_fraction`` merely thins the scan before the cap),
    then Lloyd runs as a couple of numpy matmuls on the driver —
    microseconds, no per-round Spark jobs. The distributed heavy lifting
    is where the data is big: build_ivf_index (full-corpus assignment
    pass) and ivf_probe.

    Deterministic: the seeded sample is sorted by id, seeds are the
    n_clusters lowest-id sampled vectors, argmax ties break to the
    lowest cluster id (no RNG beyond the seeded sample).

    ``n_clusters=None`` auto-sizes K ≈ 4·√N via ``ivf_cluster_count``
    (costs one count of the corpus — an id-column scan), capped at a
    quarter of the ACTUAL collected sample so the ≥4-points-per-centroid
    rationale holds under any max_train_rows/train_fraction the caller
    picked; explicit values are used as given, clamped only at the
    collected sample size — X[:K] would silently return fewer rows
    anyway; the clamp makes len(result) == the settled K a reliable
    invariant (the registered ANN queries pin constants well under
    their sample, so their recall guards are unchanged)."""
    n_total = corpus.count() if n_clusters is None else None
    s = corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    if train_fraction < 1.0:
        s = s.sample(fraction=train_fraction, seed=seed)
    rows = s.orderBy("nid").limit(max_train_rows).collect()
    X = np.stack([np.asarray(r["vec"], dtype=np.float64) for r in rows])
    if n_clusters is None:
        n_clusters = ivf_cluster_count(n_total, max_clusters=max(1, len(X) // 4))
    # clamp EVERY path at the sample size (X[:K] silently returns fewer
    # rows anyway — this just makes len(result) == the settled K an
    # invariant a caller can rely on; reviews 2+3). Callers whose K
    # must be honored at scale grow max_train_rows with it, as
    # recluster_state's auto path does.
    n_clusters = min(int(n_clusters), max(1, len(X)))
    C = X[:n_clusters].copy()

    Xn = np.linalg.norm(X, axis=1, keepdims=True)
    Xn[Xn == 0.0] = 1.0
    Xu = X / Xn
    for _ in range(n_iters):
        cid = np.argmax(Xu @ _unit_rows(C).T, axis=1)
        cnt = np.bincount(cid, minlength=len(C))
        tot = np.zeros_like(C)
        np.add.at(tot, cid, X)
        nz = cnt > 0  # empty clusters keep their previous centroid
        C[nz] = tot[nz] / cnt[nz, None]
    return C


def build_ivf_index(
    corpus: DataFrame,
    centroids: np.ndarray,
    path: str | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """One assignment pass over the full corpus → inverted lists
    (neighbor_id, vec, cluster_id). With ``path``, persists the index
    partitioned by cluster_id — probe-time reads then PRUNE to the
    probed partitions (the scan reads nprobe/n_clusters of the data, the
    on-disk analogue of FAISS inverted lists). Without ``path``, returns
    the assignment plan for immediate in-session probing."""
    assign, _ = _cluster_udfs(centroids, 1)
    inverted = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
        assign(F.col(vec_col).cast("array<double>")).alias("cluster_id"),
    )
    if path is not None:
        inverted.write.mode("overwrite").partitionBy("cluster_id").parquet(path)
        spark = corpus.sparkSession
        return spark.read.parquet(path)
    return inverted


def ivf_probe(
    queries: DataFrame,
    inverted: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = IVF_NPROBE,
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe-only path: each query scores exactly within its ``nprobe``
    nearest inverted lists. The exploded (query, cluster) pairs broadcast
    — inverted lists never shuffle; against a partitioned on-disk index
    the cluster_id equi-join also prunes the scan to probed partitions."""
    from pyspark.sql import Window

    _, probe = _cluster_udfs(centroids, nprobe)
    probes = queries.select(
        "query_id", F.col(vec_col).cast("array<double>").alias("qvec")
    ).withColumn("cluster_id", F.explode(probe("qvec")))
    scored = F.broadcast(probes).join(inverted, "cluster_id").select(
        "query_id",
        "neighbor_id",
        pair_cosine(F.col("qvec"), F.col("vec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def ivf_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_clusters: int = IVF_CLUSTERS,
    n_iters: int = IVF_ITERS,
    nprobe: int = IVF_NPROBE,
    train_fraction: float = IVF_TRAIN_FRACTION,
    centroids: np.ndarray | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate k-NN via an IVF index: sample-trained Lloyd centroids
    partition the corpus into inverted lists; each query probes only its
    ``nprobe`` nearest lists and scores exactly within them. Pass
    pre-trained ``centroids`` to skip training (the deployed shape:
    train once, persist, probe many — see ivf_train_centroids /
    build_ivf_index / ivf_probe for the split lifecycle). Complements
    LSH ANN: IVF adapts to the data distribution where random
    hyperplanes do not."""
    if centroids is None:
        centroids = ivf_train_centroids(
            corpus, n_clusters, n_iters, train_fraction, vec_col, id_col
        )
    inverted = build_ivf_index(corpus, centroids, None, vec_col, id_col)
    return ivf_probe(queries, inverted, centroids, k, nprobe, vec_col)


# Centroids memoized per (sf_dir, params): numpy on the driver, a few KB.
# Queries against the same table probe a once-trained index instead of
# re-running Lloyd per invocation (the deployed lifecycle; r2 verdict).
_IVF_CENTROID_CACHE: dict[tuple, np.ndarray] = {}
_IVF_CENTROID_CACHE_CAP = 8  # bounded: dict insertion order = FIFO eviction


def q_ann_ivf(spark, sf_dir: str) -> DataFrame:
    """IVF approximate k-NN (recall < 1 by design — rows-only check;
    recall guarded vs q_knn_batch in tests). Same query set as
    q_knn_batch so the three retrieval paths are directly comparable."""
    from streamy_db_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < KNN_BATCH_NQ).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    key = (sf_dir, IVF_CLUSTERS, IVF_ITERS, IVF_TRAIN_FRACTION)
    C = _IVF_CENTROID_CACHE.get(key)
    if C is None:
        while len(_IVF_CENTROID_CACHE) >= _IVF_CENTROID_CACHE_CAP:
            _IVF_CENTROID_CACHE.pop(next(iter(_IVF_CENTROID_CACHE)))
        C = _IVF_CENTROID_CACHE.setdefault(key, ivf_train_centroids(emb))
    out = ivf_ann_topk(queries, emb, k=KNN_BATCH_K, centroids=C)
    return out.select(
        "query_id", "neighbor_id", F.round("cosine", 4).alias("cosine")
    )


# q_ann_lsh rotated to the test registry in r6, q_ann_ivf in r7 (same
# reasoning both times): approximate ops are rows-only in the driver, so
# their slots carried no hash evidence while hash-exact queries sat in
# the test registry. Both recall guards and the persisted-probe test
# still run in tests/test_oracle_queries.py; the exact k-NN baseline
# q_knn_batch keeps its hash-verified driver slot.
QUERIES = {
    "q_knn_batch": q_knn_batch,
}

TEST_QUERIES = {"q_ann_lsh": q_ann_lsh, "q_ann_ivf": q_ann_ivf}

_COS_SQL = (
    "list_dot_product(q.e, c.e) / "
    "(sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e)))"
)

ORACLE = {
    "q_knn_batch": f"""
        WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   {_COS_SQL} AS cos_raw
            FROM v q CROSS JOIN v c
            WHERE q.vec_id < {KNN_BATCH_NQ}
        )
        SELECT query_id, neighbor_id, round(cos_raw, 4) AS cosine
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id
            ) AS rn FROM scored
        ) WHERE rn <= {KNN_BATCH_K}
    """,
    # q_ann_lsh: intentionally no oracle (approximate op; rows-only check).
}


def pair_cosine(col_a: Column, col_b: Column) -> Column:
    """Vectorized cosine over candidate *pairs*: one numpy matmul per
    Arrow batch instead of an interpreted JVM fold per pair (~15× at
    ~10⁶ candidates — measured on q_dedup_near_lsh). Used only on the
    rows-only LSH paths; oracle-checked queries keep the JVM fold so the
    fold order (and thus the last float bit) matches DuckDB."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        if len(va) == 0:
            return pd.Series([], dtype="float64")
        a = np.stack(va.to_numpy())
        b = np.stack(vb.to_numpy())
        num = np.einsum("ij,ij->i", a, b)
        den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
        return pd.Series(num / den)

    return _cos(col_a, col_b)


_DIM_CACHE: dict[str, int] = {}


def embedding_dim(
    sf_dir: str, table: str = "embeddings", vec_col: str = "embedding"
) -> int:
    """Vector dimensionality as index metadata.

    Probed ONCE per dataset straight from the parquet file (footer + a
    single-row batch — no Spark job), then cached keyed on
    (path, file mtime) so an in-process dataset regeneration with a new
    dimensionality can't serve a stale dim. Replaces the per-call
    ``limit(1).collect()`` driver round-trip that used to sit on the hot
    retrieval path; on a real deployment this number lives in the
    index/catalog metadata written at ingest. Non-local ``sf_dir``
    (s3://, hdfs://, ...) can't be footer-probed with local pyarrow —
    callers fall back to ``_probe_dim`` (see ``_dim_for``)."""
    import pyarrow.parquet as pq

    path_key = os.path.join(sf_dir, f"{table}.parquet")
    if not os.path.exists(path_key):
        raise FileNotFoundError(
            f"{path_key} is not a local parquet path — use _probe_dim"
        )
    key = f"{path_key}@{os.path.getmtime(path_key):.6f}"
    if key not in _DIM_CACHE:
        if os.path.isdir(path_key):  # Spark-written table = directory of parts
            paths = [
                os.path.join(path_key, f)
                for f in sorted(os.listdir(path_key))
                if f.endswith(".parquet")
            ]
        else:
            paths = [path_key]
        for path in paths:
            pf = pq.ParquetFile(path)
            if pf.metadata.num_rows == 0:
                continue  # Spark writes empty part files
            batch = next(pf.iter_batches(batch_size=1, columns=[vec_col]))
            _DIM_CACHE[key] = len(batch.column(0)[0])
            break
        else:
            raise FileNotFoundError(f"no non-empty parquet parts under {path_key}")
    return _DIM_CACHE[key]


def _probe_dim(df: DataFrame, vec_col: str) -> int:
    """Fallback dim probe for ad-hoc DataFrames with no dataset metadata
    (one bounded driver round-trip; callers on hot paths pass ``dim``)."""
    first = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
    return first[0]["d"] if first else 0


def dim_for(df: DataFrame, sf_dir: str, vec_col: str = "embedding") -> int:
    """Dim via local parquet-footer metadata when ``sf_dir`` is a local
    path, else one bounded Spark probe (s3://, hdfs://, ... are readable
    by spark.read.parquet but not by local pyarrow footer inspection)."""
    try:
        return embedding_dim(sf_dir, vec_col=vec_col)
    except (FileNotFoundError, OSError):
        return _probe_dim(df, vec_col)


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (pure Python LCG — no numpy
    dependency at module import, reproducible across runs/partitions)."""
    state = seed & 0x7FFFFFFF or 1
    planes: list[list[float]] = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            # Uniform in (-1, 1) — direction-only use, magnitude irrelevant.
            row.append(state / float(1 << 30) - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(df: DataFrame, n_planes: int = 8, vec_col: str = "embedding",
               seed: int = 42, dim: int | None = None) -> DataFrame:
    """Random-hyperplane (SimHash-for-cosine) bucketing: sign pattern of
    ``n_planes`` projections → integer bucket. Vectors in the same bucket
    are cosine-similar with high probability. JVM-side only.
    """
    if dim is None:
        dim = _probe_dim(df, vec_col)
    planes = random_hyperplanes(dim, n_planes, seed)
    a = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        pcol = F.array(*[F.lit(x) for x in p])
        bit = (dot(a, pcol) >= 0).cast("int")
        bucket = bucket + (bit * F.lit(1 << i))
    return df.withColumn("lsh_bucket", bucket)


def lsh_buckets_multi(
    df: DataFrame,
    n_tables: int,
    n_planes: int,
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """One row per (input row, table): random-hyperplane bucket per table.
    Classic multi-table LSH — candidate recall is an OR over tables:
    P(found) = 1 - (1 - p^n_planes)^n_tables."""
    if dim is None:
        dim = _probe_dim(df, vec_col)

    # All n_tables × n_planes projections in one Arrow-batched numpy
    # matmul — interpreted JVM higher-order folds cost ~15× more here
    # (measured); sign-pattern bucketing has no SQL oracle to match, so
    # the vectorized Python path is free to use. One UDF call per row
    # yields all table buckets; posexplode fans them out.
    from pyspark.sql.functions import pandas_udf

    planes = np.array(
        [
            random_hyperplanes(dim, n_planes, seed + 1000 * t)[i]
            for t in range(n_tables)
            for i in range(n_planes)
        ]
    )  # (n_tables*n_planes, dim)
    weights = np.tile(1 << np.arange(n_planes), n_tables)
    table_idx = np.repeat(np.arange(n_tables), n_planes)

    @pandas_udf("array<int>")
    def _buckets(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = (m @ planes.T >= 0).astype(np.int64) * weights  # (batch, T*P)
        out = np.zeros((m.shape[0], n_tables), dtype=np.int64)
        for t in range(n_tables):
            out[:, t] = bits[:, table_idx == t].sum(axis=1)
        return pd.Series(list(out.astype(np.int32)))

    return df.select(
        "*", F.posexplode(_buckets(F.col(vec_col).cast("array<double>"))).alias(
            "lsh_table", "lsh_bucket"
        )
    )


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_tables: int = 8,
    n_planes: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate k-NN: multi-table random-hyperplane LSH. Both sides
    bucket with the same hyperplanes; candidates = pairs sharing a bucket
    in ANY table (deduped); only candidates are scored.

    At scale this is the right shape: the candidate join co-partitions
    both sides by (table, bucket) — a uniform low-skew shuffle key; the
    candidate set is ~n_tables/2^n_planes of the corpus per query instead
    of the full scan; scoring is local post-join. Trade recall vs. cost
    with (n_tables, n_planes)."""
    from pyspark.sql import Window

    from streamy_db_spark.sources.tables import spread

    if dim is None:
        dim = _probe_dim(corpus, vec_col)
    corpus_spread = spread(corpus.select(id_col, vec_col), id_col)
    qb = lsh_buckets_multi(
        queries.select("query_id", vec_col), n_tables, n_planes, vec_col, seed, dim
    ).select("query_id", "lsh_table", "lsh_bucket")
    cb = lsh_buckets_multi(
        corpus_spread, n_tables, n_planes, vec_col, seed, dim
    ).select(F.col(id_col).alias("neighbor_id"), "lsh_table", "lsh_bucket")
    cand = (
        qb.join(cb, ["lsh_table", "lsh_bucket"])
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = queries.select("query_id", F.col(vec_col).cast("array<double>").alias("qvec"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    )
    scored = (
        cand.join(q, "query_id")
        .join(c, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            pair_cosine(F.col("qvec"), F.col("cvec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
