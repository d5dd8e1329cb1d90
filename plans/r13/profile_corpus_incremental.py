"""Per-gate phase profile of the corpus_build_incremental bench lane
(4 waves of ~1250 docs + publish), timing each gate's process_batch
and each publish call — pure instrumentation around the same calls
bench_corpus_build_incremental makes.
Run:  python plans/r13/profile_corpus_incremental.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from streamy_db_spark.operators.similarity import ivf_train_centroids
    from streamy_db_spark.pipeline import IncrementalCorpusBuilder
    from streamy_db_spark.session import get_spark

    spark = get_spark("profile_corpus_inc")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "source", "text"
    )
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    bounds = list(
        docs.selectExpr(
            "percentile_approx(doc_id, array(0.25, 0.5, 0.75), 10000)"
        ).collect()[0][0]
    )
    waves = [
        docs.filter(F.col("doc_id") <= bounds[0]),
        docs.filter((F.col("doc_id") > bounds[0]) & (F.col("doc_id") <= bounds[1])),
        docs.filter((F.col("doc_id") > bounds[1]) & (F.col("doc_id") <= bounds[2])),
        docs.filter(F.col("doc_id") > bounds[2]),
    ]
    centroids = ivf_train_centroids(emb, n_clusters=16)
    bench_set = docs.orderBy("doc_id").limit(5).select("text")

    tmp = tempfile.mkdtemp(prefix="prof_corpus_inc_")
    try:
        t_all = time.perf_counter()
        builder = IncrementalCorpusBuilder(
            spark,
            os.path.join(tmp, "state"),
            semantic_centroids=centroids,
            semantic_threshold=0.95,
            substring_window=8,
        )

        # instrument each gate by wrapping its process_batch
        def wrap(gate, label, acc):
            orig = gate.process_batch

            def timed(*a, **kw):
                t0 = time.perf_counter()
                spark.sparkContext.setJobDescription(label)
                out = orig(*a, **kw)
                # the gates return checkpointed frames; count to pin
                # their cost here, not in the composer's next count
                out.count()
                acc[label] = acc.get(label, 0.0) + time.perf_counter() - t0
                spark.sparkContext.setJobDescription(None)
                return out

            gate.process_batch = timed

        for i, wave in enumerate(waves):
            acc: dict[str, float] = {}
            wrap(builder.exact, "exact", acc)
            wrap(builder.near, "near", acc)
            wrap(builder.semantic, "semantic", acc)
            wrap(builder.substr, "substr", acc)
            t0 = time.perf_counter()
            r = builder.process_batch(wave, batch_id=i, embeddings=emb)
            dt = time.perf_counter() - t0
            other = dt - sum(acc.values())
            print(
                f"wave{i}: total {dt:6.2f}  "
                + "  ".join(f"{k} {v:5.2f}" for k, v in acc.items())
                + f"  composer+writes {other:5.2f}  accepted {r['rows_accepted']}"
            )
            # restore originals for clean next-wave wrap
            for g in (builder.exact, builder.near, builder.semantic, builder.substr):
                g.process_batch = g.process_batch.__wrapped__ if hasattr(g.process_batch, "__wrapped__") else g.__class__.process_batch.__get__(g)

        t0 = time.perf_counter()
        pub = builder.publish(
            os.path.join(tmp, "corpus"),
            bench=bench_set,
            mixture_total_tokens=100_000,
        )
        print(f"publish: {time.perf_counter() - t0:6.2f} s  rows {pub.get('publish_rows_survivors', pub.get('rows_survivors'))}")
        print(f"TOTAL {time.perf_counter() - t_all:6.2f} s")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
