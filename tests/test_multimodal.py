"""Multimodal plumbing: schemas, Arrow batch shapes, stub gating."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.catalog import table
from sandbox_data_pipeline_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    decode_media,
    extract_features,
    media_from_documents,
    resize_images,
    sample_frames,
)


def _media(spark):
    return media_from_documents(table(spark, "/root/testdata/sf0.001", "documents"))


def test_media_schema_and_types(spark):
    m = _media(spark)
    assert m.schema.simpleString() == MEDIA_SCHEMA.simpleString()
    row = m.where(F.col("media_type") == "image").first()
    assert row.meta.width is not None and row.meta.duration_ms is None
    arow = m.where(F.col("media_type") == "audio").first()
    assert arow.meta.width is None and arow.meta.duration_ms > 0
    assert bytes(row.content)  # opaque binary payload


def test_decode_stub_gating():
    with pytest.raises(NotImplementedError):
        decode_media(b"xx", "image", fake=False)
    out = decode_media(bytes(range(64)), "image", fake=True)
    assert out["n_samples"] == 64
    assert out["samples"] == list(bytes(range(64))[::8][:16])


def test_extract_features_batch_shape(spark):
    feats = extract_features(_media(spark), fake=True)
    assert feats.schema.simpleString() == FEATURE_SCHEMA.simpleString()
    row = feats.first()
    assert len(row.feature) == 8
    assert abs(sum(row.feature) - 1.0) < 1e-9  # normalized histogram


def test_resize_rewrites_content_and_meta(spark):
    out = resize_images(_media(spark), width=8, height=4, fake=True)
    rows = out.collect()
    assert rows and all(r.media_type == "image" for r in rows)
    for r in rows[:5]:
        assert len(bytes(r.content)) == 32
        assert r.meta.width == 8 and r.meta.height == 4 and r.meta.byte_len == 32


def test_sample_frames_cardinality(spark):
    m = _media(spark)
    frames = sample_frames(m, every_ms=1000, fake=True)
    n_videos = m.where("media_type = 'video'").count()
    got = frames.groupBy("media_id").count().count()
    assert got == n_videos
    r = frames.first()
    assert r.frame_idx >= 0 and bytes(r.frame)
