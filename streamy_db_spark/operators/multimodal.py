"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata, processed by
Arrow-batched pandas iterators (``mapInPandas``) — the 100 TB shape:
decode/resize/frame-sample run scan-side on each partition, no shuffle,
no driver traffic; batch size bounds executor memory
(spark.sql.execution.arrow.maxRecordsPerBatch).

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode kernels are import-gated stubs (NotImplementedError) with
deterministic fake implementations behind them. Everything Spark-side —
schemas, UDF signatures, Arrow batch iteration, cardinality-changing
frame fan-out — is real and oracle-tested: the fake kernels are chosen to
be bit-identically computable in DuckDB SQL (byte length, md5, fixed-size
frame slicing), so even the Python-UDF path sits under the driver's
strong value-hash gate rather than a rows-only check.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from streamy_db_spark.sources.tables import load_table

# Media-table schema convention: opaque bytes + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), False),
        T.StructField(
            "meta", T.MapType(T.StringType(), T.StringType()), True
        ),
    ]
)

FRAME_BYTES = 256   # fake "frame" size for frame sampling
FRAME_STRIDE = 4    # keep every 4th frame

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("digest", T.StringType(), False),
        T.StructField("n_frames", T.LongType(), False),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame_bytes", T.LongType(), False),
        T.StructField("frame_digest", T.StringType(), False),
    ]
)


def decode_image(content: bytes) -> Any:
    """Real image decode — requires PIL, absent in this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "image decode requires Pillow; use the deterministic fake path "
            "(extract_features/sample_frames) for plumbing tests"
        ) from e
    import io

    from PIL import Image

    return Image.open(io.BytesIO(content))  # pragma: no cover


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table: document text bytes as content.

    Stands in for real image/audio blobs so the binary plumbing is
    exercised end-to-end on driver-provided data only."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "UTF-8").alias("content"),
        F.create_map(F.lit("lang"), F.col("lang")).alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Per-media feature extraction via Arrow-batched mapInPandas.

    Fake kernel = (byte length, md5 digest, frame count) — deterministic
    and SQL-checkable; a real kernel would decode and embed here with the
    identical signature and batch shape.

    Only the columns the kernel reads cross the Arrow boundary (r13,
    guide §4.1): mapInPandas is opaque to Catalyst, so without the
    explicit select every media column — including the meta map —
    would be read from storage and serialized into Python per row."""

    media = media.select("media_id", "content")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": content.map(len),
                    "digest": content.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "n_frames": content.map(
                        lambda b: math.ceil(len(b) / FRAME_BYTES)
                    ),
                }
            )

    return media.mapInPandas(kernel, FEATURES_SCHEMA)


def sample_frames(media: DataFrame) -> DataFrame:
    """Cardinality-changing frame sampling: split content into
    FRAME_BYTES-sized frames, keep every FRAME_STRIDE-th — one output row
    per kept frame (the video-frame-sampling shape). Only the two
    columns the kernel reads cross the Arrow boundary (r13, guide §4.1)."""

    media = media.select("media_id", "content")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes, digests = [], [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                n_frames = math.ceil(len(b) / FRAME_BYTES)
                for i in range(0, n_frames, FRAME_STRIDE):
                    frame = b[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                    ids.append(mid)
                    idxs.append(i)
                    sizes.append(len(frame))
                    digests.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_bytes": pd.Series(sizes, dtype="int64"),
                    "frame_digest": pd.Series(digests, dtype="object"),
                }
            )

    return media.mapInPandas(kernel, FRAMES_SCHEMA)


RESIZE_FACTOR = 4  # keep every 4th byte in the fake kernel


def resize_media(media: DataFrame, factor: int = RESIZE_FACTOR) -> DataFrame:
    """Media resize/downsample via Arrow-batched mapInPandas.

    Real path: decode → resample → re-encode (PIL for images, a resampler
    for audio) — import-gated like decode_image since neither codec lives
    in this container. Fake kernel: keep every ``factor``-th byte — the
    deterministic stand-in that preserves the operator's contract (binary
    in → smaller binary out, same row count, schema carries the new
    size). Scan-side per-partition compute, no shuffle; at 100 TB this is
    the same embarrassingly-parallel shape as extract_features. Only the
    columns the kernel reads/returns cross the Arrow boundary (r13,
    guide §4.1 — the meta map no longer round-trips through Python)."""

    media = media.select("media_id", "media_type", "content")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["content"].map(lambda b: bytes(b)[::factor])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "content": resized,
                    "n_bytes": resized.map(len).astype("int64"),
                }
            )

    return media.mapInPandas(
        kernel,
        "media_id long, media_type string, content binary, n_bytes long",
    )


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamy_db_spark.sources.tables import spread

    docs = load_table(spark, sf_dir, "documents")
    return extract_features(documents_as_media(spread(docs, "doc_id")))


def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamy_db_spark.sources.tables import spread

    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(documents_as_media(spread(docs, "doc_id")))


def q_resize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered resize query: resized content surfaced as (n_bytes,
    md5 digest) — byte-exact evidence of the full resized payload while
    keeping the compared columns in driver-hash-safe types (raw binary
    cells normalize differently between a collected Spark bytearray and
    a DuckDB bytes object; the digest covers every byte anyway)."""
    from streamy_db_spark.sources.tables import spread

    docs = load_table(spark, sf_dir, "documents")
    resized = resize_media(documents_as_media(spread(docs, "doc_id")))
    return resized.select(
        "media_id", "n_bytes", F.md5("content").alias("digest")
    )


# q_media_frames rotated to the test registry in r6: its frame
# slicing/digests are subsumed by q_resize_media's byte-exact digest
# oracle, freeing the driver slot for a production training-data query
# (r5 verdict item 5). Still fully hash-checked via TEST_*.
QUERIES = {
    "q_media_features": q_media_features,
    "q_resize_media": q_resize_media,
}

TEST_QUERIES = {"q_media_frames": q_media_frames}

# DuckDB oracle: md5/substring only exist for VARCHAR, so frame slicing
# runs on the text (char-based). Char slicing == byte slicing because the
# synthetic corpus is pure ASCII (asserted in tests); Spark-side stays
# byte-true.
ORACLE = {
    "q_media_features": f"""
        SELECT doc_id AS media_id,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS digest,
               CAST(ceil(octet_length(encode(text)) / {FRAME_BYTES}.0) AS BIGINT)
                   AS n_frames
        FROM documents
    """,
    # Every factor-th char == every factor-th byte (ASCII corpus, see
    # note above); md5(varchar) hashes the UTF-8 bytes, matching Spark's
    # md5 over the resized binary content.
    "q_resize_media": f"""
        WITH r AS (
            SELECT doc_id AS media_id,
                   array_to_string(list_transform(
                       range(1, length(text) + 1, {RESIZE_FACTOR}),
                       i -> substring(text, CAST(i AS INTEGER), 1)), '') AS rs
            FROM documents
        )
        SELECT media_id,
               octet_length(encode(rs)) AS n_bytes,
               md5(rs) AS digest
        FROM r
    """,
}

TEST_ORACLE = {
    "q_media_frames": f"""
        WITH m AS (
            SELECT doc_id AS media_id, text,
                   octet_length(encode(text)) AS n
            FROM documents
        ),
        fr AS (
            SELECT media_id, text, n,
                   unnest(range(0, CAST(ceil(n / {FRAME_BYTES}.0) AS BIGINT),
                                {FRAME_STRIDE})) AS frame_idx
            FROM m
        )
        SELECT media_id, frame_idx,
               length(substring(text, frame_idx * {FRAME_BYTES} + 1,
                                {FRAME_BYTES})) AS frame_bytes,
               md5(substring(text, frame_idx * {FRAME_BYTES} + 1,
                             {FRAME_BYTES})) AS frame_digest
        FROM fr
    """,
}
