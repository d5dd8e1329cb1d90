"""Direct operator tests for the multimodal kernels (resize here; the
feature/frame kernels are oracle-checked via q_media_features /
q_media_frames). The resize fake keeps every k-th byte — byte-exact
checkable against pure Python on the same driver data."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamy_db_spark.operators import multimodal as mm
from streamy_db_spark.sources.tables import load_table


def test_resize_media_matches_python(spark, sf_small):
    docs = load_table(spark, sf_small, "documents").limit(50)
    media = mm.documents_as_media(docs)
    expected = {
        r["media_id"]: bytes(r["content"])[:: mm.RESIZE_FACTOR]
        for r in media.collect()
    }
    out = {r["media_id"]: bytes(r["content"]) for r in mm.resize_media(media).collect()}
    assert out == expected
    # schema contract: row count preserved, n_bytes consistent
    df = mm.resize_media(media)
    assert df.count() == len(expected)
    bad = df.filter(F.length("content") != F.col("n_bytes")).count()
    assert bad == 0


def test_resize_then_features_compose(spark, sf_small):
    """Resize chains into feature extraction (the pipeline shape:
    decode→resize→featurize) without schema friction."""
    docs = load_table(spark, sf_small, "documents").limit(20)
    media = mm.documents_as_media(docs)
    feats = mm.extract_features(
        mm.resize_media(media).select("media_id", "media_type", "content")
    )
    rows = {r["media_id"]: r for r in feats.collect()}
    src = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    for mid, b in src.items():
        assert rows[mid]["n_bytes"] == len(b[:: mm.RESIZE_FACTOR])
