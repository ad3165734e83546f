"""Multimodal queries: metadata projection is oracle-checked (binary
length/md5 compute identically in DuckDB); the Pandas-UDF feature and
frame paths are rows-only (Python-side, not SQL-expressible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.catalog import table
from sandbox_data_pipeline_spark.operators.multimodal import (
    extract_features,
    media_from_documents,
    sample_frames,
)


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata projection over the media table: byte length,
    content digest, media-type split — all JVM-side."""
    media = media_from_documents(table(spark, sf_dir, "documents"))
    return media.select(
        "media_id",
        "media_type",
        F.col("meta.byte_len").alias("byte_len"),
        F.col("meta.mime").alias("mime"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.duration_ms").alias("duration_ms"),
        F.md5(F.col("content")).alias("content_md5"),
    )


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction (mapInPandas) — rows-only."""
    media = media_from_documents(table(spark, sf_dir, "documents"))
    feats = extract_features(media, fake=True)
    return feats.select(
        "media_id",
        "media_type",
        "byte_len",
        F.round(F.element_at("feature", 1), 4).alias("f0"),
        F.round(F.element_at("feature", 8), 4).alias("f7"),
    )


def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing (video rows → frame rows) — rows-only."""
    media = media_from_documents(table(spark, sf_dir, "documents"))
    frames = sample_frames(media, every_ms=1000, fake=True)
    return frames.select(
        "media_id", "frame_idx", F.length("frame").alias("frame_bytes")
    )


ORACLE_META = """
SELECT doc_id AS media_id,
       ['image', 'audio', 'video'][(doc_id % 3 + 1)::INTEGER] AS media_type,
       CAST(length(text) AS BIGINT) AS byte_len,
       'application/x-fake-' || ['image', 'audio', 'video'][(doc_id % 3 + 1)::INTEGER] AS mime,
       CASE WHEN doc_id % 3 = 0 THEN CAST((doc_id % 8 + 1) * 64 AS INTEGER) END AS width,
       CASE WHEN doc_id % 3 = 0 THEN CAST((doc_id % 4 + 1) * 64 AS INTEGER) END AS height,
       CASE WHEN doc_id % 3 <> 0 THEN CAST(n_chars * 10 AS BIGINT) END AS duration_ms,
       md5(text) AS content_md5
FROM documents
"""


QUERIES = {
    "q_multimodal_meta": q_multimodal_meta,
    "q_media_features": q_media_features,
    "q_media_frames": q_media_frames,
}

ORACLE = {
    "q_multimodal_meta": ORACLE_META,
    # q_media_features / q_media_frames: Pandas-UDF paths, rows-only.
}


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing over image rows (mapInPandas rewrite of content
    + meta). Decode is the stubbed fake, so this is rows-only like the
    other media paths; the emitted meta is still asserted in tests."""
    from sandbox_data_pipeline_spark.operators.multimodal import (
        media_from_documents,
        resize_images,
    )

    docs = table(spark, sf_dir, "documents")
    media = media_from_documents(docs)
    out = resize_images(media, width=64, height=32, fake=True)
    return out.select(
        "media_id",
        "media_type",
        F.col("meta.byte_len").alias("byte_len"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


QUERIES["q_media_resize"] = q_media_resize


def q_media_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level round trip, oracle-verified: build payloads with REAL
    container headers (PNG/WAV/MP4, dims a closed-form function of
    doc_id), then parse them back with probe_media. The oracle computes
    the same closed form in SQL — a hash match proves the binary
    build→parse path (mapInPandas both ways) is exact."""
    from sandbox_data_pipeline_spark.operators.multimodal import (
        media_with_headers,
        probe_media,
    )

    docs = table(spark, sf_dir, "documents")
    return probe_media(media_with_headers(docs))


ORACLE["q_media_probe"] = """
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'mp4' END AS container,
       CASE WHEN doc_id % 3 = 0 THEN ((doc_id % 8 + 1) * 64)::INT END AS probed_width,
       CASE WHEN doc_id % 3 = 0 THEN ((doc_id % 4 + 1) * 64)::INT END AS probed_height
FROM documents
"""
QUERIES["q_media_probe"] = q_media_probe


MIN_W, MIN_H = 192, 128


def q_media_resolution_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolution filtering WITHOUT a codec: keep/drop verdict per
    probed image (PNG header dimensions vs a minimum), summarized per
    container — the multimodal curation gate that runs on magic bytes
    alone, long before any decode budget is spent. Composes the
    oracle-verified probe; the filter itself is a codegen'd
    projection."""
    from sandbox_data_pipeline_spark.operators.multimodal import (
        media_with_headers,
        probe_media,
    )

    probed = probe_media(media_with_headers(table(spark, sf_dir, "documents")))
    verdict = F.when(
        F.col("probed_width").isNull(), F.lit("not_probed")
    ).when(
        (F.col("probed_width") >= MIN_W) & (F.col("probed_height") >= MIN_H),
        F.lit("kept"),
    ).otherwise(F.lit("dropped"))
    return probed.groupBy("container", verdict.alias("verdict")).agg(
        F.count(F.lit(1)).alias("n")
    )


ORACLE["q_media_resolution_filter"] = f"""
WITH probed AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'mp4' END AS container,
         CASE WHEN doc_id % 3 = 0 THEN ((doc_id % 8 + 1) * 64)::INT END AS w,
         CASE WHEN doc_id % 3 = 0 THEN ((doc_id % 4 + 1) * 64)::INT END AS h
  FROM documents
)
SELECT container,
       CASE WHEN w IS NULL THEN 'not_probed'
            WHEN w >= {MIN_W} AND h >= {MIN_H} THEN 'kept'
            ELSE 'dropped' END AS verdict,
       count(*) AS n
FROM probed GROUP BY 1, 2
"""
QUERIES["q_media_resolution_filter"] = q_media_resolution_filter
