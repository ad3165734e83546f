"""Multimodal queries — every entry is oracle-checked. The decode-less
discipline: outputs are deterministic byte arithmetic (container
headers, blob lengths, byte values) that the Spark side PARSES from
real binary payloads via Arrow-batched mapInPandas while the DuckDB
oracle recomputes the same values as closed forms over the source
text. The only remaining stub is the decode_media body (codec libs
absent by design, operators/multimodal.py) — nothing here depends on
it.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sandbox_data_pipeline_spark.catalog import table
from sandbox_data_pipeline_spark.operators.multimodal import (
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
    """Arrow-batched feature extraction over REAL container bytes
    (operators/multimodal.py: extract_header_features): container,
    dimensions, header length, and body first/last bytes are all parsed
    from the binary payload, and the oracle recomputes each as a closed
    form over the source text — a hash match proves the byte-level
    build→parse round trip, replacing the old fake-decode rows-only
    path (round-2 `no_oracle` item)."""
    from sandbox_data_pipeline_spark.operators.multimodal import (
        extract_header_features,
        media_with_headers,
    )

    media = media_with_headers(table(spark, sf_dir, "documents"))
    return extract_header_features(media)


def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing (video rows → frame rows). The frame
    manifest (index + byte count per frame) is deterministic byte
    arithmetic over the blob length, so the oracle rebuilds it in SQL
    with a bounded range() cross join."""
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
    # Real-byte-arithmetic oracles (round 3): each closed form below
    # mirrors a value the Spark side PARSES from actual payload bytes.
    # documents.text is ASCII in the driver testdata (byte==char,
    # asserted by the r2-green q_multimodal_meta hash), so
    # ascii(substr(...)) equals the byte value.
    "q_media_features": """
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'mp4' END AS container,
       CASE WHEN doc_id % 3 = 0 THEN ((doc_id % 8 + 1) * 64)::INT END AS width,
       CASE WHEN doc_id % 3 = 0 THEN ((doc_id % 4 + 1) * 64)::INT END AS height,
       (CASE doc_id % 3 WHEN 0 THEN 29 WHEN 1 THEN 16 ELSE 20 END)::INT AS header_len,
       n_chars::BIGINT AS body_len,
       ascii(substr(text, 1, 1))::INT AS first_byte,
       ascii(substr(text, n_chars, 1))::INT AS last_byte
FROM documents
""",
    "q_media_frames": """
WITH v AS (
  SELECT doc_id AS media_id, n_chars,
         greatest(1, (n_chars * 10) // 1000) AS n_frames
  FROM documents WHERE doc_id % 3 = 2
), f AS (
  -- 65536 is an oracle-side enumeration bound, not an operator cap:
  -- it must exceed max(n_frames) = max(duration_ms)//1000 at the
  -- grading scale factors (the Spark side is unbounded).
  SELECT media_id, r.range::INT AS frame_idx, n_chars, n_frames,
         greatest(1, n_chars // n_frames) AS step
  FROM v CROSS JOIN range(0, 65536) r
  WHERE r.range < n_frames
)
SELECT media_id, frame_idx,
       least(step, greatest(0, n_chars - frame_idx * step))::INT AS frame_bytes
FROM f
""",
}


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing over image rows (mapInPandas rewrite of content
    + meta), verified at the BYTE level: summarize_resized measures the
    emitted blobs (length, final byte, trailing-NUL pad) and the oracle
    recomputes those from the source text — the hash only matches if
    the rewrite really produced the declared 64x32 payload."""
    from sandbox_data_pipeline_spark.operators.multimodal import (
        media_from_documents,
        resize_images,
        summarize_resized,
    )

    docs = table(spark, sf_dir, "documents")
    media = media_from_documents(docs)
    out = resize_images(media, width=64, height=32, fake=True)
    return summarize_resized(out)


QUERIES["q_media_resize"] = q_media_resize
ORACLE["q_media_resize"] = """
SELECT doc_id AS media_id,
       64::INT AS width, 32::INT AS height,
       2048::BIGINT AS out_len,
       (CASE WHEN n_chars >= 2048 THEN ascii(substr(text, 2048, 1)) ELSE 0 END)::INT AS tail_byte,
       (CASE WHEN n_chars >= 2048 THEN 0 ELSE 2048 - n_chars END)::BIGINT AS pad_len
FROM documents WHERE doc_id % 3 = 0
"""


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


def q_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio windowing manifest over REAL WAV payloads (RIFF preamble +
    body): byte extents and start times per fixed window, computed by
    the Arrow-batched segmenter from actual blob lengths; the oracle
    rebuilds the same manifest in closed form from n_chars."""
    from sandbox_data_pipeline_spark.operators.multimodal import (
        media_with_headers,
        segment_audio,
    )

    media = media_with_headers(table(spark, sf_dir, "documents"))
    return segment_audio(media)


# WAV rows are doc_id % 3 == 1; blob = 16-byte preamble + utf-8 body,
# body bytes == n_chars (ASCII testdata). Window = 2ms * 32B/ms = 64B.
ORACLE["q_audio_windows"] = """
WITH a AS (
  SELECT doc_id AS media_id, n_chars AS body,
         greatest(1, (n_chars + 63) // 64) AS n_win
  FROM documents WHERE doc_id % 3 = 1
), w AS (
  -- 65536 is an oracle-side enumeration bound (4 MiB of body at 64 B
  -- windows), NOT an operator cap: the Spark side is unbounded, and
  -- the bound must exceed max(n_win) at the grading scale factors.
  SELECT media_id, r.range::INT AS window_idx, body
  FROM a CROSS JOIN range(0, 65536) r
  WHERE r.range < n_win
)
SELECT media_id, window_idx,
       (window_idx * 64)::BIGINT AS start_byte,
       least(64, body - window_idx * 64)::BIGINT AS n_bytes,
       (window_idx * 2)::INT AS start_ms
FROM w
"""
QUERIES["q_audio_windows"] = q_audio_windows


def q_bmp_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel decode, oracle-verified end-to-end: build valid
    24-bit uncompressed BMPs (pixel-array bytes a closed form of
    media_id), decode them with genuine struct/stride/BGR/bottom-up
    parsing (operators/multimodal.py: decode_bmp), and emit dims,
    corner pixels, and channel means. The oracle replays the closed
    form through the same stride geometry in SQL — a hash match
    proves the binary build→decode path byte-exact, including row
    padding (half the widths force nonzero padding) and row order
    (corner pixels are order-sensitive where means are not)."""
    from sandbox_data_pipeline_spark.operators.multimodal import (
        bmp_decode_stats,
        bmp_media,
    )

    return bmp_decode_stats(bmp_media(table(spark, sf_dir, "documents")))


ORACLE["q_bmp_decode_stats"] = """
WITH dims AS (
  SELECT doc_id, 6 * (doc_id % 4 + 1) AS w, 4 * (doc_id % 3 + 1) AS h,
         ((3 * (6 * (doc_id % 4 + 1)) + 3) // 4) * 4 AS stride
  FROM documents
),
px AS (
  -- range bounds exceed max w/h; WHERE clips per image
  SELECT d.doc_id, d.w, d.h, d.stride, fx.range AS x, fy.range AS frow
  FROM dims d CROSS JOIN range(0, 64) fx CROSS JOIN range(0, 16) fy
  WHERE fx.range < d.w AND fy.range < d.h
),
vals AS (
  SELECT doc_id,
         (doc_id * 7 + (frow * stride + 3 * x + 2) * 13) % 256 AS r,
         (doc_id * 7 + (frow * stride + 3 * x + 1) * 13) % 256 AS g,
         (doc_id * 7 + (frow * stride + 3 * x) * 13) % 256 AS b
  FROM px
),
means AS (
  SELECT doc_id, round(avg(r), 4) AS mean_r, round(avg(g), 4) AS mean_g,
         round(avg(b), 4) AS mean_b
  FROM vals GROUP BY 1
)
SELECT d.doc_id AS media_id, d.w AS width, d.h AS height,
       (d.doc_id * 7 + ((d.h - 1) * d.stride + 2) * 13) % 256 AS tl_r,
       (d.doc_id * 7 + ((d.h - 1) * d.stride + 1) * 13) % 256 AS tl_g,
       (d.doc_id * 7 + ((d.h - 1) * d.stride) * 13) % 256 AS tl_b,
       (d.doc_id * 7 + (3 * (d.w - 1) + 2) * 13) % 256 AS br_r,
       (d.doc_id * 7 + (3 * (d.w - 1) + 1) * 13) % 256 AS br_g,
       (d.doc_id * 7 + (3 * (d.w - 1)) * 13) % 256 AS br_b,
       m.mean_r, m.mean_g, m.mean_b
FROM dims d JOIN means m ON m.doc_id = d.doc_id
"""
QUERIES["q_bmp_decode_stats"] = q_bmp_decode_stats


def q_bmp_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resize pipeline, oracle-verified: build BMP → decode →
    8×8 nearest-neighbor resample → re-encode → decode AGAIN → pixel
    stats. The second decode proves the re-encoded container is valid;
    the oracle maps each output pixel through the closed-form source
    bytes (X·w//8, Y·h//8 sampling through the padded bottom-up
    geometry)."""
    from sandbox_data_pipeline_spark.operators.multimodal import (
        bmp_decode_stats,
        bmp_media,
        bmp_resize,
    )

    docs = table(spark, sf_dir, "documents")
    return bmp_decode_stats(bmp_resize(bmp_media(docs), 8, 8))


ORACLE["q_bmp_resize_stats"] = """
WITH dims AS (
  SELECT doc_id, 6 * (doc_id % 4 + 1) AS w, 4 * (doc_id % 3 + 1) AS h,
         ((3 * (6 * (doc_id % 4 + 1)) + 3) // 4) * 4 AS stride
  FROM documents
),
px AS (
  SELECT d.doc_id, d.w, d.h, d.stride, fx.range AS x, fy.range AS y
  FROM dims d CROSS JOIN range(0, 8) fx CROSS JOIN range(0, 8) fy
),
-- output pixel (x, y) samples source IMAGE pixel (sx, sy); its byte
-- offset goes through the source's bottom-up padded geometry
src AS (
  SELECT doc_id, x, y,
         ((h - 1 - (y * h // 8)) * stride + 3 * (x * w // 8)) AS o
  FROM px
),
vals AS (
  SELECT doc_id, x, y,
         (doc_id * 7 + (o + 2) * 13) % 256 AS r,
         (doc_id * 7 + (o + 1) * 13) % 256 AS g,
         (doc_id * 7 + o * 13) % 256 AS b
  FROM src
),
means AS (
  SELECT doc_id, round(avg(r), 4) AS mean_r, round(avg(g), 4) AS mean_g,
         round(avg(b), 4) AS mean_b
  FROM vals GROUP BY 1
),
corners AS (
  SELECT tl.doc_id,
         tl.r AS tl_r, tl.g AS tl_g, tl.b AS tl_b,
         br.r AS br_r, br.g AS br_g, br.b AS br_b
  FROM (SELECT * FROM vals WHERE x = 0 AND y = 0) tl
  JOIN (SELECT * FROM vals WHERE x = 7 AND y = 7) br ON br.doc_id = tl.doc_id
)
SELECT c.doc_id AS media_id, 8 AS width, 8 AS height,
       c.tl_r, c.tl_g, c.tl_b, c.br_r, c.br_g, c.br_b,
       m.mean_r, m.mean_g, m.mean_b
FROM corners c JOIN means m ON m.doc_id = c.doc_id
"""
QUERIES["q_bmp_resize_stats"] = q_bmp_resize_stats


def q_png_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-codec decode, oracle-verified: build valid
    8-bit RGB PNGs (real zlib streams, per-chunk CRC32s, a different
    scanline filter per row so None/Sub/Up/Average/Paeth all fire),
    decode them with the stdlib-only decoder
    (operators/multimodal.py: decode_png), and emit dims, corner
    pixels, channel means, and the distinct-filter count. Pixels are
    a closed form of (media_id, x, y), so the DuckDB oracle verifies
    that deflate→filter→defilter→inflate is lossless — compression
    changes the bytes, never the hash-checked pixels."""
    from sandbox_data_pipeline_spark.operators.multimodal import (
        png_decode_stats,
        png_media,
    )

    return png_decode_stats(png_media(table(spark, sf_dir, "documents")))


ORACLE["q_png_decode_stats"] = """
WITH dims AS (
  SELECT doc_id, 5 * (doc_id % 4 + 1) AS w, 4 * (doc_id % 3 + 1) AS h
  FROM documents
),
px AS (
  SELECT d.doc_id, d.w, d.h, fx.range AS x, fy.range AS y
  FROM dims d CROSS JOIN range(0, 20) fx CROSS JOIN range(0, 12) fy
  WHERE fx.range < d.w AND fy.range < d.h
),
vals AS (
  SELECT doc_id,
         (doc_id * 3 + x * 5 + y * 11) % 256 AS r,
         (doc_id * 7 + x * 13 + y * 17) % 256 AS g,
         (doc_id * 11 + x * 19 + y * 23) % 256 AS b
  FROM px
),
means AS (
  SELECT doc_id, round(avg(r), 4) AS mean_r, round(avg(g), 4) AS mean_g,
         round(avg(b), 4) AS mean_b
  FROM vals GROUP BY 1
)
SELECT d.doc_id AS media_id, d.w AS width, d.h AS height,
       (d.doc_id * 3) % 256 AS tl_r,
       (d.doc_id * 7) % 256 AS tl_g,
       (d.doc_id * 11) % 256 AS tl_b,
       (d.doc_id * 3 + (d.w - 1) * 5 + (d.h - 1) * 11) % 256 AS br_r,
       (d.doc_id * 7 + (d.w - 1) * 13 + (d.h - 1) * 17) % 256 AS br_g,
       (d.doc_id * 11 + (d.w - 1) * 19 + (d.h - 1) * 23) % 256 AS br_b,
       m.mean_r, m.mean_g, m.mean_b,
       least(d.h, 5) AS n_filters
FROM dims d JOIN means m ON m.doc_id = d.doc_id
"""
QUERIES["q_png_decode_stats"] = q_png_decode_stats


def q_png_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed resize pipeline, oracle-verified: build PNG →
    CRC-validated decode → 6×6 nearest-neighbor resample → re-encode
    (filter + deflate + CRC) → decode AGAIN → stats. The oracle maps
    every output pixel through the closed-form source geometry
    (X·w//6, Y·h//6), so a hash match proves both codec directions
    AND the resample arithmetic."""
    from sandbox_data_pipeline_spark.operators.multimodal import (
        png_media,
        png_resize_stats,
    )

    return png_resize_stats(png_media(table(spark, sf_dir, "documents")))


ORACLE["q_png_resize_stats"] = """
WITH dims AS (
  SELECT doc_id, 5 * (doc_id % 4 + 1) AS w, 4 * (doc_id % 3 + 1) AS h
  FROM documents
),
px AS (
  SELECT d.doc_id, d.w, d.h, fx.range AS x, fy.range AS y,
         (fx.range * d.w) // 6 AS sx, (fy.range * d.h) // 6 AS sy
  FROM dims d CROSS JOIN range(0, 6) fx CROSS JOIN range(0, 6) fy
),
vals AS (
  SELECT doc_id,
         (doc_id * 3 + sx * 5 + sy * 11) % 256 AS r,
         (doc_id * 7 + sx * 13 + sy * 17) % 256 AS g,
         (doc_id * 11 + sx * 19 + sy * 23) % 256 AS b
  FROM px
),
means AS (
  SELECT doc_id, round(avg(r), 4) AS mean_r, round(avg(g), 4) AS mean_g,
         round(avg(b), 4) AS mean_b
  FROM vals GROUP BY 1
)
SELECT d.doc_id AS media_id, 6 AS width, 6 AS height,
       (d.doc_id * 3) % 256 AS tl_r,
       (d.doc_id * 7) % 256 AS tl_g,
       (d.doc_id * 11) % 256 AS tl_b,
       (d.doc_id * 3 + ((5 * d.w) // 6) * 5 + ((5 * d.h) // 6) * 11) % 256 AS br_r,
       (d.doc_id * 7 + ((5 * d.w) // 6) * 13 + ((5 * d.h) // 6) * 17) % 256 AS br_g,
       (d.doc_id * 11 + ((5 * d.w) // 6) * 19 + ((5 * d.h) // 6) * 23) % 256 AS br_b,
       m.mean_r, m.mean_g, m.mean_b,
       5 AS n_filters
FROM dims d JOIN means m ON m.doc_id = d.doc_id
"""
QUERIES["q_png_resize_stats"] = q_png_resize_stats


def q_gif_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL dictionary-codec decode, oracle-verified: build valid
    GIF89a files (64-color global table, genuine LZW with variable
    code widths, LSB-first packing, clear/EOI, 255-byte sub-blocks),
    decode them with the stdlib-only decoder
    (operators/multimodal.py: decode_gif), and emit pixel stats. Both
    the palette and the index plane are closed forms, so DuckDB
    replays the decoded RGB without any image library — a hash match
    proves the LZW round trip lossless."""
    from sandbox_data_pipeline_spark.operators.multimodal import (
        gif_decode_stats,
        gif_media,
    )

    return gif_decode_stats(gif_media(table(spark, sf_dir, "documents")))


ORACLE["q_gif_decode_stats"] = """
WITH dims AS (
  SELECT doc_id, 4 * (doc_id % 5 + 1) AS w, 3 * (doc_id % 4 + 1) AS h
  FROM documents
),
px AS (
  SELECT d.doc_id, d.w, d.h, fx.range AS x, fy.range AS y,
         (d.doc_id * 3 + fx.range * 5 + fy.range * 7) % 64 AS idx
  FROM dims d CROSS JOIN range(0, 20) fx CROSS JOIN range(0, 15) fy
  WHERE fx.range < d.w AND fy.range < d.h
),
vals AS (
  SELECT doc_id,
         (idx * 7 + 11) % 256 AS r,
         (idx * 13 + 17) % 256 AS g,
         (idx * 19 + 23) % 256 AS b
  FROM px
),
means AS (
  SELECT doc_id, round(avg(r), 4) AS mean_r, round(avg(g), 4) AS mean_g,
         round(avg(b), 4) AS mean_b
  FROM vals GROUP BY 1
),
corners AS (
  SELECT d.doc_id,
         (d.doc_id * 3) % 64 AS tl_idx,
         (d.doc_id * 3 + (d.w - 1) * 5 + (d.h - 1) * 7) % 64 AS br_idx,
         d.w, d.h
  FROM dims d
)
SELECT c.doc_id AS media_id, c.w AS width, c.h AS height,
       (c.tl_idx * 7 + 11) % 256 AS tl_r,
       (c.tl_idx * 13 + 17) % 256 AS tl_g,
       (c.tl_idx * 19 + 23) % 256 AS tl_b,
       (c.br_idx * 7 + 11) % 256 AS br_r,
       (c.br_idx * 13 + 17) % 256 AS br_g,
       (c.br_idx * 19 + 23) % 256 AS br_b,
       m.mean_r, m.mean_g, m.mean_b
FROM corners c JOIN means m ON m.doc_id = c.doc_id
"""
QUERIES["q_gif_decode_stats"] = q_gif_decode_stats


# --- Animated-GIF keyframe selection (temporal codec analysis) --------------

KEYFRAME_T = 60  # mean per-pixel |ΔRGB| threshold (sum of 3 channels)


def q_gif_keyframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe selection over animated GIFs decoded with the REAL
    LZW codec: per frame, the mean pixel delta vs the previous frame
    (exact decimal), and an is_key flag (frame 0, or mean delta above
    the threshold) — the shot-boundary primitive of a video pipeline.
    operators/multimodal.py: gif_keyframe_deltas."""
    from sandbox_data_pipeline_spark.operators.multimodal import (
        gif_keyframe_deltas,
    )
    from sandbox_data_pipeline_spark.queries._envproof import dec_ratio

    d = gif_keyframe_deltas(table(spark, sf_dir, "documents"))
    mean_delta = dec_ratio(
        F.coalesce(F.col("sum_abs_delta"), F.lit(0)).cast("decimal(18,0)"),
        F.col("n_px").cast("decimal(18,0)"),
        num_scale=0,
        out_scale=4,
    )
    return d.select(
        "media_id",
        "frame_idx",
        "n_px",
        "sum_abs_delta",
        F.when(F.col("sum_abs_delta").isNull(), F.lit(None).cast("decimal(18,4)"))
        .otherwise(mean_delta)
        .alias("mean_delta"),
        F.when(
            F.col("frame_idx") == 0, F.lit(1)
        )
        .otherwise((mean_delta >= KEYFRAME_T).cast("int"))
        .alias("is_key"),
    )


def _oracle_gif_keyframes() -> str:
    from sandbox_data_pipeline_spark.queries._envproof import dec_ratio_sql

    mean_sql = dec_ratio_sql(
        "coalesce(sum_abs_delta, 0)", "n_px", num_scale=0, out_scale=4
    )
    return f"""
WITH dims AS (
  SELECT doc_id, 4 * (doc_id % 5 + 1) AS w, 3 * (doc_id % 4 + 1) AS h,
         doc_id % 5 + 1 AS step, doc_id % 3 + 2 AS n_frames
  FROM documents
),
px AS (
  SELECT d.doc_id, d.w, d.h, d.step, ff.range AS f,
         fx.range AS x, fy.range AS y,
         (d.doc_id * 3 + fx.range * 5 + fy.range * 7 + ff.range * d.step) % 64 AS idx
  FROM dims d
  CROSS JOIN range(0, 4) ff CROSS JOIN range(0, 20) fx CROSS JOIN range(0, 15) fy
  WHERE ff.range < d.n_frames AND fx.range < d.w AND fy.range < d.h
),
rgb AS (
  SELECT doc_id, f, x, y,
         (idx * 7 + 11) % 256 AS r,
         (idx * 13 + 17) % 256 AS g,
         (idx * 19 + 23) % 256 AS b
  FROM px
),
deltas AS (
  SELECT a.doc_id, a.f,
         SUM(abs(a.r - p.r) + abs(a.g - p.g) + abs(a.b - p.b)) AS sad
  FROM rgb a JOIN rgb p
    ON a.doc_id = p.doc_id AND a.x = p.x AND a.y = p.y AND p.f = a.f - 1
  GROUP BY 1, 2
),
frames AS (
  SELECT d.doc_id AS media_id, CAST(ff.range AS INTEGER) AS frame_idx,
         CAST(d.w * d.h AS BIGINT) AS n_px,
         CAST(dl.sad AS BIGINT) AS sum_abs_delta
  FROM dims d
  CROSS JOIN range(0, 4) ff
  LEFT JOIN deltas dl ON dl.doc_id = d.doc_id AND dl.f = ff.range
  WHERE ff.range < d.n_frames
)
SELECT media_id, frame_idx, n_px, sum_abs_delta,
       CASE WHEN sum_abs_delta IS NULL THEN NULL
            ELSE {mean_sql} END AS mean_delta,
       CASE WHEN frame_idx = 0 THEN 1
            WHEN {mean_sql} >= {KEYFRAME_T} THEN 1 ELSE 0 END AS is_key
FROM frames
"""


QUERIES["q_gif_keyframes"] = q_gif_keyframes
ORACLE["q_gif_keyframes"] = _oracle_gif_keyframes()


ONSET_T = 20000


def q_audio_onsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio onset detection (energy-jump segmentation) over the REAL
    WAV payloads — the temporal sibling of q_gif_keyframes on the
    audio axis. operators/multimodal.py: audio_onsets."""
    from sandbox_data_pipeline_spark.operators.multimodal import (
        audio_onsets,
        media_with_headers,
    )

    media = media_with_headers(table(spark, sf_dir, "documents"))
    return audio_onsets(media, window_bytes=64, threshold=ONSET_T)


ORACLE["q_audio_onsets"] = f"""
WITH a AS (
  SELECT doc_id AS media_id, text, n_chars FROM documents WHERE doc_id % 3 = 1
),
pos AS (
  -- 65536 enumeration bound as in q_audio_windows (not an operator cap)
  SELECT media_id, r.range AS p,
         ascii(substr(text, CAST(r.range AS INTEGER) + 1, 1)) AS v
  FROM a CROSS JOIN range(0, 65536) r WHERE r.range < n_chars
),
win AS (
  SELECT media_id, CAST(p // 64 AS INTEGER) AS window_idx,
         SUM(v * v) AS energy
  FROM pos GROUP BY 1, 2
),
d AS (
  SELECT media_id, window_idx, CAST(energy AS BIGINT) AS energy,
         CAST(energy - lag(energy) OVER (
           PARTITION BY media_id ORDER BY window_idx) AS BIGINT) AS delta
  FROM win
)
SELECT media_id, window_idx, energy, delta,
       CASE WHEN delta IS NULL THEN 1
            WHEN delta > {ONSET_T} THEN 1 ELSE 0 END AS is_onset
FROM d
"""
QUERIES["q_audio_onsets"] = q_audio_onsets


def q_jpeg_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode, oracle-verified end-to-end
    (operators/jpeg.py): build valid JFIF payloads whose 8x8-tile
    values are a closed form of (media_id, block index), decode them
    with the genuine marker/DHT/Huffman/dezigzag/dequant/IDCT
    machinery, and emit dims, corner pixels, and the exact pixel sum.
    Quantization is chosen so DC-only blocks reconstruct exactly
    (module docstring), which is what makes a closed-form SQL oracle
    possible even though every payload went through real entropy
    coding, DC difference prediction across blocks, and byte
    stuffing. Completes the codec family: JPEG is the format that
    dominates any web-scraped multimodal corpus."""
    from sandbox_data_pipeline_spark.operators.jpeg import (
        jpeg_decode_stats,
        jpeg_media,
    )

    stats = jpeg_decode_stats(jpeg_media(table(spark, sf_dir, "documents")))
    # scan_bytes (entropy-coded length) is not closed-form in SQL; it
    # stays on the operator output for tests but out of the oracle row
    return stats.select(
        "media_id", "width", "height", "n_blocks", "tl_px", "br_px", "sum_px"
    )


ORACLE["q_jpeg_decode_stats"] = """
WITH dims AS (
  SELECT doc_id, 8 * (doc_id % 4 + 2) AS w, 8 * (doc_id % 3 + 2) AS h,
         (doc_id % 4 + 2) * (doc_id % 3 + 2) AS nb
  FROM documents
),
tiles AS (
  SELECT doc_id, r.range AS i
  FROM dims CROSS JOIN range(0, 20) r WHERE r.range < nb
),
sums AS (
  SELECT doc_id, SUM((doc_id * 11 + i * 37) % 256) AS sv
  FROM tiles GROUP BY 1
)
SELECT d.doc_id AS media_id,
       CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
       CAST(d.nb AS INT) AS n_blocks,
       CAST((d.doc_id * 11) % 256 AS INT) AS tl_px,
       CAST((d.doc_id * 11 + (d.nb - 1) * 37) % 256 AS INT) AS br_px,
       CAST(64 * s.sv AS BIGINT) AS sum_px
FROM dims d JOIN sums s USING (doc_id)
"""
QUERIES["q_jpeg_decode_stats"] = q_jpeg_decode_stats


def q_video_keyframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode end-to-end (operators/video.py): build valid
    Motion-JPEG AVI containers (RIFF hdrl/movi/idx1 per the public AVI
    RIFF layout), decode every '00dc' frame through the genuine
    baseline-JPEG codec, and emit per-frame exact pixel sums plus the
    inter-frame |delta| — the shot-boundary primitive behind frame
    dedup in a web-video corpus. is_cut flags frame 0 and any frame
    whose mean per-pixel delta clears 84 (between the no-wrap 53 and
    full-wrap 203 levels of the builder's closed form, so both
    outcomes occur). The delta is computed inside the decode map task:
    the whole path is one narrow stage, zero shuffle."""
    from sandbox_data_pipeline_spark.operators.video import (
        avi_media,
        video_frame_stats,
    )

    stats = video_frame_stats(avi_media(table(spark, sf_dir, "documents")))
    return stats.select(
        "media_id",
        "frame_idx",
        "n_frames",
        "sum_px",
        "delta_px",
        F.when(
            (F.col("frame_idx") == 0)
            | (F.col("delta_px") >= 84 * F.col("width") * F.col("height")),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("is_cut"),
    )


ORACLE["q_video_keyframes"] = """
WITH dims AS (
  SELECT doc_id, 8 * (doc_id % 4 + 2) AS w, 8 * (doc_id % 3 + 2) AS h,
         (doc_id % 4 + 2) * (doc_id % 3 + 2) AS nb, doc_id % 3 + 2 AS nf
  FROM documents
),
cells AS (
  SELECT doc_id, f.range AS fi, b.range AS bi, w, h, nb, nf
  FROM dims CROSS JOIN range(0, 4) f CROSS JOIN range(0, 20) b
  WHERE f.range < nf AND b.range < nb
),
vals AS (
  SELECT doc_id, fi, w, h, nf,
         (doc_id * 11 + fi * 53 + bi * 37) % 256 AS v,
         (doc_id * 11 + (fi - 1) * 53 + bi * 37) % 256 AS pv
  FROM cells
),
frames AS (
  SELECT doc_id, fi, w, h, nf,
         64 * SUM(v) AS sum_px,
         CASE WHEN fi = 0 THEN 0 ELSE 64 * SUM(ABS(v - pv)) END AS delta_px
  FROM vals GROUP BY 1, 2, 3, 4, 5
)
SELECT doc_id AS media_id, CAST(fi AS INT) AS frame_idx,
       CAST(nf AS INT) AS n_frames,
       CAST(sum_px AS BIGINT) AS sum_px,
       CAST(delta_px AS BIGINT) AS delta_px,
       CAST(CASE WHEN fi = 0 OR delta_px >= 84 * w * h THEN 1 ELSE 0 END
            AS INT) AS is_cut
FROM frames
"""
QUERIES["q_video_keyframes"] = q_video_keyframes


IMAGE_BAND_CAP = 96  # max images per band bucket before it is dropped


def q_image_dhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup over REAL decoded JPEGs
    (operators/jpeg.py: jpeg_dhash): every payload runs the genuine
    Huffman/IDCT decode, a 9x8 difference hash (dHash — the standard
    near-dup image fingerprint, robust to re-encode/resize) is split
    into four 16-bit bands, and candidate pairs come from a banded
    LSH join — never all-pairs; the only quadratic work is within a
    band bucket, exactly the MinHash-LSH shape the text side uses.
    Output is the hamming-distance histogram of candidates at <= 16
    bits, the tuning curve an image-dedup operator is configured
    from. The oracle recomputes every hash from the builder's
    closed-form pixels and replays the banding + XOR/popcount
    arithmetic — a hash match proves decode, fingerprint, banding,
    and distance all at once."""
    from sandbox_data_pipeline_spark.operators.jpeg import (
        jpeg_dhash,
        jpeg_media,
    )

    hashes = jpeg_dhash(
        jpeg_media(table(spark, sf_dir, "documents"))
    ).localCheckpoint(eager=False)
    return _dhash_pair_hist(hashes)


def _dhash_pair_hist(hashes: DataFrame) -> DataFrame:
    """Banded 16-bit LSH join + hamming histogram over per-image
    (media_id, h1, h2) fingerprints — shared verbatim by the decode
    path (q_image_dhash_dedup) and the manifest probe path
    (q_image_dhash_from_manifest), so both provably run the same
    candidate generation.

    Hot-bucket guard (round 10, the video path's df_cap pattern): a
    band value shared by more than IMAGE_BAND_CAP images is
    non-discriminative — measured at sf0.1, the top dHash band bucket
    held ~1,000 of 6.2k images (~500k candidate pairs in ONE bucket);
    at 100x that is the exact q_video_near_dup OOM class round 9 hit.
    Capped buckets are dropped, bounding every bucket's pair count by
    CAP²/2; images similar through a degenerate band alone are matched
    by their other bands or not at all — the standard LSH trade. The
    cap is sized to BITE at the sf0.01 grade scale (top bucket there
    is 108), so the oracle hash-match proves the cap replay, not just
    the happy path."""
    bands = hashes.selectExpr(
        "media_id",
        "h1",
        "h2",
        "stack(4, 0, h1 >> 16, 1, h1 & 65535, 2, h2 >> 16, 3, h2 & 65535)"
        " AS (band_idx, band_val)",
    )
    hot = (
        bands.groupBy("band_idx", "band_val")
        .agg(F.count(F.lit(1)).alias("_c"))
        .where(F.col("_c") > IMAGE_BAND_CAP)
        .select("band_idx", "band_val")
    )
    bands = bands.join(
        F.broadcast(hot), ["band_idx", "band_val"], "left_anti"
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("ma"),
            F.col("b.media_id").alias("mb"),
            F.col("a.h1").alias("ah1"),
            F.col("a.h2").alias("ah2"),
            F.col("b.h1").alias("bh1"),
            F.col("b.h2").alias("bh2"),
        )
        .distinct()
    )
    return (
        cand.select(
            (
                F.expr("bit_count(ah1 ^ bh1)") + F.expr("bit_count(ah2 ^ bh2)")
            ).alias("hamming")
        )
        .where(F.col("hamming") <= 16)
        .groupBy("hamming")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


ORACLE["q_image_dhash_dedup"] = f"""
WITH dims AS (
  SELECT doc_id, 8 * (doc_id % 4 + 2) AS w, 8 * (doc_id % 3 + 2) AS h
  FROM documents
),
grid AS (
  SELECT doc_id, j.range AS j, i.range AS i,
         (doc_id * 11
          + ((((j.range * h) // 8) // 8) * (w // 8)
             + (((i.range * w) // 9) // 8)) * 37) % 256 AS v
  FROM dims CROSS JOIN range(0, 8) j CROSS JOIN range(0, 9) i
),
bits AS (
  SELECT g0.doc_id, g0.j, g0.i,
         CASE WHEN g1.v > g0.v THEN 1 ELSE 0 END AS b
  FROM grid g0
  JOIN grid g1 ON g1.doc_id = g0.doc_id AND g1.j = g0.j AND g1.i = g0.i + 1
  WHERE g0.i < 8
),
hashes AS (
  SELECT doc_id,
         SUM(CASE WHEN j < 4 THEN b << (j * 8 + i) ELSE 0 END) AS h1,
         SUM(CASE WHEN j >= 4 THEN b << ((j - 4) * 8 + i) ELSE 0 END) AS h2
  FROM bits GROUP BY doc_id
),
bands0 AS (
  SELECT doc_id, h1, h2, 0 AS band_idx, h1 >> 16 AS band_val FROM hashes
  UNION ALL
  SELECT doc_id, h1, h2, 1, h1 & 65535 FROM hashes
  UNION ALL
  SELECT doc_id, h1, h2, 2, h2 >> 16 FROM hashes
  UNION ALL
  SELECT doc_id, h1, h2, 3, h2 & 65535 FROM hashes
),
-- hot-bucket guard: band values shared by > IMAGE_BAND_CAP images
-- are non-discriminative and dropped (interpolated so the oracle
-- can never silently diverge from the Python constant)
bands AS (
  SELECT * FROM bands0
  QUALIFY count(*) OVER (PARTITION BY band_idx, band_val) <= {IMAGE_BAND_CAP}
),
cand AS (
  SELECT DISTINCT a.doc_id AS ma, b.doc_id AS mb,
         a.h1 AS ah1, a.h2 AS ah2, b.h1 AS bh1, b.h2 AS bh2
  FROM bands a
  JOIN bands b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
              AND a.doc_id < b.doc_id
)
SELECT CAST(bit_count(xor(ah1, bh1)) + bit_count(xor(ah2, bh2)) AS INT)
           AS hamming,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM cand
WHERE bit_count(xor(ah1, bh1)) + bit_count(xor(ah2, bh2)) <= 16
GROUP BY 1
"""
QUERIES["q_image_dhash_dedup"] = q_image_dhash_dedup


VIDEO_BAND_CAP = 128  # max frames per band bucket before it is dropped


def q_video_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clip-level video near-dup (operators/video.py:
    video_frame_dhash): every AVI's frames run the REAL container +
    JPEG decode, each frame gets the 9x8 dHash, and frame fingerprints
    meet through the same banded 16-bit LSH join as the image side —
    two videos are near-dup clips in proportion to how many of their
    frame pairs land within 10 bits. Output is the histogram of
    matched-frame-pair counts per video pair — the knob a clip-dedup
    admission rule is tuned from. Everything downstream of the decode
    is bounded by band-bucket collisions, never all frame pairs; the
    oracle recomputes every frame hash from the closed-form tile
    pixels and replays banding, hamming, and the per-pair rollup.

    Hot-bucket guard (the text-shingle df_cap pattern, operators/
    dedup.py): a band value shared by more than VIDEO_BAND_CAP frames
    is non-discriminative — low-entropy frames (test patterns, black
    frames, slates) collapse onto a handful of dHash bands, and one
    such bucket goes quadratic (measured: the top bucket at sf0.1
    holds 3.2k of 15k frames → ~40M candidate pairs → bench JVM OOM).
    Dropping capped buckets bounds every bucket's pair count by
    CAP²/2; frames similar through a degenerate band alone are
    matched by their other, discriminative bands or not at all —
    the standard LSH trade, replayed identically by the oracle."""
    from sandbox_data_pipeline_spark.operators.video import (
        avi_media,
        video_frame_dhash,
    )

    hashes = video_frame_dhash(
        avi_media(table(spark, sf_dir, "documents"))
    ).localCheckpoint(eager=False)
    return _frame_pair_hist(hashes)


def _frame_pair_hist(hashes: DataFrame) -> DataFrame:
    """Hot-bucket-guarded banded LSH join + matched-frame-pair
    histogram over per-frame (media_id, frame_idx, h1, h2)
    fingerprints — shared verbatim by the decode path
    (q_video_near_dup) and the manifest probe path
    (q_video_near_dup_from_manifest)."""
    bands = hashes.selectExpr(
        "media_id",
        "frame_idx",
        "h1",
        "h2",
        "stack(4, 0, h1 >> 16, 1, h1 & 65535, 2, h2 >> 16, 3, h2 & 65535)"
        " AS (band_idx, band_val)",
    )
    hot = (
        bands.groupBy("band_idx", "band_val")
        .agg(F.count(F.lit(1)).alias("_c"))
        .where(F.col("_c") > VIDEO_BAND_CAP)
        .select("band_idx", "band_val")
    )
    bands = bands.join(
        F.broadcast(hot), ["band_idx", "band_val"], "left_anti"
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("ma"),
            F.col("a.frame_idx").alias("fa"),
            F.col("b.media_id").alias("mb"),
            F.col("b.frame_idx").alias("fb"),
            F.col("a.h1").alias("ah1"),
            F.col("a.h2").alias("ah2"),
            F.col("b.h1").alias("bh1"),
            F.col("b.h2").alias("bh2"),
        )
        .distinct()
    )
    matched = cand.where(
        F.expr("bit_count(ah1 ^ bh1) + bit_count(ah2 ^ bh2)") <= 10
    )
    per_pair = matched.groupBy("ma", "mb").agg(
        F.count(F.lit(1)).alias("n_matched")
    )
    return per_pair.groupBy("n_matched").agg(
        F.count(F.lit(1)).alias("n_video_pairs")
    )


ORACLE["q_video_near_dup"] = f"""
WITH dims AS (
  SELECT doc_id, 8 * (doc_id % 4 + 2) AS w, 8 * (doc_id % 3 + 2) AS h,
         doc_id % 3 + 2 AS nf
  FROM documents
),
grid AS (
  SELECT doc_id, f.range AS fi, j.range AS j, i.range AS i,
         (doc_id * 11 + f.range * 53
          + ((((j.range * h) // 8) // 8) * (w // 8)
             + (((i.range * w) // 9) // 8)) * 37) % 256 AS v
  FROM dims
  CROSS JOIN range(0, 4) f
  CROSS JOIN range(0, 8) j
  CROSS JOIN range(0, 9) i
  WHERE f.range < nf
),
bits AS (
  SELECT g0.doc_id, g0.fi, g0.j, g0.i,
         CASE WHEN g1.v > g0.v THEN 1 ELSE 0 END AS b
  FROM grid g0
  JOIN grid g1 ON g1.doc_id = g0.doc_id AND g1.fi = g0.fi
              AND g1.j = g0.j AND g1.i = g0.i + 1
  WHERE g0.i < 8
),
hashes AS (
  SELECT doc_id, fi,
         SUM(CASE WHEN j < 4 THEN b << (j * 8 + i) ELSE 0 END) AS h1,
         SUM(CASE WHEN j >= 4 THEN b << ((j - 4) * 8 + i) ELSE 0 END) AS h2
  FROM bits GROUP BY doc_id, fi
),
bands0 AS (
  SELECT doc_id, fi, h1, h2, 0 AS band_idx, h1 >> 16 AS band_val FROM hashes
  UNION ALL SELECT doc_id, fi, h1, h2, 1, h1 & 65535 FROM hashes
  UNION ALL SELECT doc_id, fi, h1, h2, 2, h2 >> 16 FROM hashes
  UNION ALL SELECT doc_id, fi, h1, h2, 3, h2 & 65535 FROM hashes
),
-- hot-bucket guard: band values shared by > VIDEO_BAND_CAP frames
-- are non-discriminative and dropped (interpolated so the oracle
-- can never silently diverge from the Python constant)
bands AS (
  SELECT * FROM bands0
  QUALIFY count(*) OVER (PARTITION BY band_idx, band_val) <= {VIDEO_BAND_CAP}
),
cand AS (
  SELECT DISTINCT a.doc_id AS ma, a.fi AS fa, b.doc_id AS mb, b.fi AS fb,
         a.h1 AS ah1, a.h2 AS ah2, b.h1 AS bh1, b.h2 AS bh2
  FROM bands a
  JOIN bands b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
              AND a.doc_id < b.doc_id
),
per_pair AS (
  SELECT ma, mb, COUNT(*) AS n_matched
  FROM cand
  WHERE bit_count(xor(ah1, bh1)) + bit_count(xor(ah2, bh2)) <= 10
  GROUP BY ma, mb
)
SELECT CAST(n_matched AS BIGINT) AS n_matched,
       CAST(COUNT(*) AS BIGINT) AS n_video_pairs
FROM per_pair GROUP BY 1
"""
QUERIES["q_video_near_dup"] = q_video_near_dup


def q_audio_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup admission (operators/multimodal.py:
    audio_fingerprint): every real WAV clip gets a 32-bit
    energy-trend fingerprint (sign of consecutive 16-byte-window
    energy deltas — the miniature of spectral-trend hashing, on exact
    integers), candidates meet through two 16-bit LSH bands, and the
    output is the hamming histogram at <= 6 bits — completing the
    tri-modal dedup story: MinHash text, dHash images/video frames,
    trend-hash audio, all the same banded shape that never goes
    all-pairs. The oracle replays window energies from ascii() closed
    forms, packs the same bits, and re-runs the banding."""
    from sandbox_data_pipeline_spark.operators.multimodal import (
        audio_fingerprint,
        media_with_headers,
    )

    fps = audio_fingerprint(
        media_with_headers(table(spark, sf_dir, "documents"))
    ).localCheckpoint(eager=False)
    bands = fps.selectExpr(
        "media_id",
        "fp",
        "stack(2, 0, fp >> 16, 1, fp & 65535) AS (band_idx, band_val)",
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("ma"),
            F.col("b.media_id").alias("mb"),
            F.col("a.fp").alias("afp"),
            F.col("b.fp").alias("bfp"),
        )
        .distinct()
    )
    return (
        cand.select(F.expr("bit_count(afp ^ bfp)").alias("hamming"))
        .where(F.col("hamming") <= 6)
        .groupBy("hamming")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


ORACLE["q_audio_near_dup"] = """
WITH a AS (
  SELECT doc_id AS media_id, text, n_chars FROM documents WHERE doc_id % 3 = 1
),
pos AS (
  SELECT media_id, r.range AS p,
         ascii(substr(text, CAST(r.range AS INTEGER) + 1, 1)) AS v
  FROM a CROSS JOIN range(0, 65536) r WHERE r.range < n_chars
),
win AS (
  SELECT media_id, CAST(p // 16 AS INTEGER) AS w, SUM(v * v) AS energy
  FROM pos GROUP BY 1, 2
),
slots AS (
  SELECT a.media_id, s.range AS w,
         COALESCE(win.energy, 0) AS energy
  FROM a CROSS JOIN range(0, 33) s
  LEFT JOIN win ON win.media_id = a.media_id AND win.w = s.range
),
fp AS (
  SELECT s0.media_id,
         SUM(CASE WHEN s1.energy > s0.energy
                  THEN 1::BIGINT << s0.w ELSE 0 END) AS fp
  FROM slots s0
  JOIN slots s1 ON s1.media_id = s0.media_id AND s1.w = s0.w + 1
  WHERE s0.w < 32
  GROUP BY 1
),
bands AS (
  SELECT media_id, fp, 0 AS band_idx, fp >> 16 AS band_val FROM fp
  UNION ALL SELECT media_id, fp, 1, fp & 65535 FROM fp
),
cand AS (
  SELECT DISTINCT a.media_id AS ma, b.media_id AS mb,
         a.fp AS afp, b.fp AS bfp
  FROM bands a
  JOIN bands b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
              AND a.media_id < b.media_id
)
SELECT CAST(bit_count(xor(afp, bfp)) AS INT) AS hamming,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM cand
WHERE bit_count(xor(afp, bfp)) <= 6
GROUP BY 1
"""
QUERIES["q_audio_near_dup"] = q_audio_near_dup


# ---- fingerprint manifest: decode once, probe many ---------------------
#
# q_image_dhash_dedup / q_video_near_dup pay the full stdlib codec
# decode on EVERY run — correct as codec-stress tests, but a real
# pipeline decodes each media object once and serves every downstream
# near-dup / retrieval query from a persisted fingerprint table. This
# is that layout split, mirroring the ANN build/probe precedent
# (operators/similarity.py: build_ann_index): one decode pass writes a
# unified per-modality fingerprint manifest (partitioned by kind so a
# probe prunes to its modality at the scan), and the *_from_manifest
# twins run the IDENTICAL banded joins against the parquet — no
# mapInPandas anywhere in their plans.

_MANIFEST_PATHS: dict[tuple, str] = {}
_MANIFEST_LOCK = threading.Lock()


def _corpus_fingerprint(sf_dir: str) -> tuple:
    """Cache key for the manifest: (sf_dir, mtime, size) of the source
    documents parquet — if the corpus at a reused path is regenerated
    mid-process, the probe queries must rebuild rather than silently
    serve fingerprints of the OLD corpus (review finding, round 10).
    documents.parquet may be a file or a directory of part files; fold
    the directory listing's stats either way."""
    import os

    path = os.path.join(sf_dir, "documents.parquet")
    try:
        if os.path.isdir(path):
            stats = tuple(
                sorted(
                    (e.name, e.stat().st_mtime_ns, e.stat().st_size)
                    for e in os.scandir(path)
                    if e.is_file()
                )
            )
        else:
            st = os.stat(path)
            stats = ((st.st_mtime_ns, st.st_size),)
    except OSError:
        stats = ()
    return (sf_dir, stats)


def _cleanup_manifests() -> None:
    """atexit: remove the per-process manifest trees — without this,
    every pytest/bench/driver process leaks a parquet tree under /tmp
    and repeated rounds accumulate unbounded disk (review finding)."""
    import shutil

    for p in _MANIFEST_PATHS.values():
        shutil.rmtree(os.path.dirname(p), ignore_errors=True)
    _MANIFEST_PATHS.clear()


def fingerprint_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE decode pass over all three modalities → unified fingerprint
    rows (kind, media_id, frame_idx, h1, h2) for the full corpus —
    operators/multimodal.py: fingerprint_frame over the documents
    table. Pure map-side Arrow stages unioned — zero shuffle; at
    100 TB this is the index-build job that runs once per ingest
    batch (and the INCREMENTAL path, q_media_manifest_ivm, decodes
    only each batch's new files via the commit log)."""
    from sandbox_data_pipeline_spark.operators.multimodal import (
        fingerprint_frame,
    )

    return fingerprint_frame(table(spark, sf_dir, "documents"))


def fingerprint_manifest_path(spark: SparkSession, sf_dir: str) -> str:
    """Build-once per (process, corpus): write the manifest through the
    K4 dynamic-partition sink (sinks/writers.py: write_partitioned),
    partitioned by kind, and reuse the path across every probe query —
    the decode runs once no matter how many near-dup queries follow."""
    key = _corpus_fingerprint(sf_dir)
    # Build under a lock: two concurrent first-touch probes (parallel
    # test workers, threaded drivers) would otherwise BOTH run the
    # full decode build, and the loser's tmpdir would be dropped from
    # _MANIFEST_PATHS so the atexit cleanup leaked it (review
    # finding). Double-checked so steady-state probes never contend.
    if key not in _MANIFEST_PATHS:
        with _MANIFEST_LOCK:
            if key not in _MANIFEST_PATHS:
                import atexit
                import tempfile

                from sandbox_data_pipeline_spark.sinks.writers import (
                    write_partitioned,
                )

                base = os.path.join(
                    tempfile.mkdtemp(prefix="fp_manifest_"),
                    "media_fingerprints",
                )
                # Compact the index at build time: the decode stage now
                # runs at full parallelism (spread_for_expansion), so an
                # uncompacted write leaves parallelism-many small files
                # per kind and every probe pays the listing/open cost
                # (measured 0.6s -> 1.6s per probe at sf0.1). One
                # narrow-row shuffle on the ONE-TIME build buys one
                # file per kind for the many probes — the standard
                # build-then-compact index discipline.
                write_partitioned(
                    fingerprint_manifest(spark, sf_dir).repartition("kind"),
                    base,
                    partition_col="kind",
                )
                if not _MANIFEST_PATHS:
                    atexit.register(_cleanup_manifests)
                _MANIFEST_PATHS[key] = base
    return _MANIFEST_PATHS[key]


def q_media_fingerprint_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The manifest build pass itself, read back from the parquet it
    wrote — grading this row proves decode, fingerprinting, the
    3-modality union, AND the partitioned round-trip in one hash
    match. The oracle recomputes every fingerprint from the builders'
    closed-form byte arithmetic (the image/video tile pixels, the
    audio window energies) and unions the three modalities."""
    return spark.read.parquet(fingerprint_manifest_path(spark, sf_dir)).select(
        "kind", "media_id", "frame_idx", "h1", "h2"
    )


def q_image_dhash_from_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe twin of q_image_dhash_dedup: identical banded join +
    hamming histogram (_dhash_pair_hist — literally the same function)
    but reading the decode-once manifest, partition-pruned to
    kind=image, instead of re-decoding every JPEG. Same oracle as the
    decode path: a hash match proves the manifest round-trip preserved
    every fingerprint bit."""
    mf = spark.read.parquet(fingerprint_manifest_path(spark, sf_dir))
    return _dhash_pair_hist(
        mf.where(F.col("kind") == "image").select("media_id", "h1", "h2")
    )


def q_video_near_dup_from_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe twin of q_video_near_dup: identical hot-bucket-guarded
    banded join (_frame_pair_hist — the same function) over the
    manifest's kind=video partition. Same oracle as the decode path."""
    mf = spark.read.parquet(fingerprint_manifest_path(spark, sf_dir))
    return _frame_pair_hist(
        mf.where(F.col("kind") == "video").select(
            "media_id", "frame_idx", "h1", "h2"
        )
    )


def q_media_manifest_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-driven INCREMENTAL media-fingerprint maintenance (round-11
    verdict item 5), end to end under the oracle gate: commit a third
    of the documents to a TxTable, append the other two thirds as
    separate commits, and maintain the tri-modal fingerprint manifest
    incrementally (sinks/txlog.py: refresh_media_fingerprints) — each
    refresh DECODES ONLY that commit's files and unions the new rows
    in. The oracle recomputes every fingerprint of the whole corpus
    from the closed-form byte arithmetic (the same SQL as
    q_media_fingerprint_manifest), so the hash match proves
    full-rebuild equivalence of the incremental composition. At
    100 TB this is the path that makes media dedup affordable: decode
    dominates everything, and an ingest batch pays exactly its own
    decode, never a rescan. Refreshes are localCheckpoint-pinned
    between commits, mirroring a real MV materialization (the
    q_txlog_ivm / q_sketch_ivm discipline).

    The temp TxTable is removed at process exit (the
    _cleanup_manifests discipline), NOT in a ``finally``: the returned
    DataFrame is pinned only by localCheckpoint blocks, and a
    post-return lineage recomputation (executor loss on a cluster,
    checkpoint-block eviction) re-reads the table files — an eager
    rmtree would turn that recovery into missing-input errors
    (round-11 ADVICE item)."""
    import atexit
    import functools
    import shutil
    import tempfile

    from sandbox_data_pipeline_spark.sinks.txlog import (
        TxTable,
        refresh_media_fingerprints,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="mediaivm_")
    atexit.register(functools.partial(shutil.rmtree, tmp, ignore_errors=True))
    t = TxTable.create(
        spark, f"{tmp}/docs", docs.where(F.col("doc_id") % 3 == 0)
    )
    mv, ver = refresh_media_fingerprints(t, None, -1)
    mv = mv.localCheckpoint()
    t.append(docs.where(F.col("doc_id") % 3 == 1))
    mv, ver = refresh_media_fingerprints(t, mv, ver)
    mv = mv.localCheckpoint()
    t.append(docs.where(F.col("doc_id") % 3 == 2))
    mv, ver = refresh_media_fingerprints(t, mv, ver)
    return mv.select(
        "kind", "media_id", "frame_idx", "h1", "h2"
    ).localCheckpoint()


ORACLE["q_media_fingerprint_manifest"] = """
WITH dims AS (
  SELECT doc_id, 8 * (doc_id % 4 + 2) AS w, 8 * (doc_id % 3 + 2) AS h,
         doc_id % 3 + 2 AS nf
  FROM documents
),
igrid AS (
  SELECT doc_id, j.range AS j, i.range AS i,
         (doc_id * 11
          + ((((j.range * h) // 8) // 8) * (w // 8)
             + (((i.range * w) // 9) // 8)) * 37) % 256 AS v
  FROM dims CROSS JOIN range(0, 8) j CROSS JOIN range(0, 9) i
),
ibits AS (
  SELECT g0.doc_id, g0.j, g0.i,
         CASE WHEN g1.v > g0.v THEN 1 ELSE 0 END AS b
  FROM igrid g0
  JOIN igrid g1 ON g1.doc_id = g0.doc_id AND g1.j = g0.j AND g1.i = g0.i + 1
  WHERE g0.i < 8
),
ihashes AS (
  SELECT doc_id,
         SUM(CASE WHEN j < 4 THEN b << (j * 8 + i) ELSE 0 END) AS h1,
         SUM(CASE WHEN j >= 4 THEN b << ((j - 4) * 8 + i) ELSE 0 END) AS h2
  FROM ibits GROUP BY doc_id
),
vgrid AS (
  SELECT doc_id, f.range AS fi, j.range AS j, i.range AS i,
         (doc_id * 11 + f.range * 53
          + ((((j.range * h) // 8) // 8) * (w // 8)
             + (((i.range * w) // 9) // 8)) * 37) % 256 AS v
  FROM dims
  CROSS JOIN range(0, 4) f
  CROSS JOIN range(0, 8) j
  CROSS JOIN range(0, 9) i
  WHERE f.range < nf
),
vbits AS (
  SELECT g0.doc_id, g0.fi, g0.j, g0.i,
         CASE WHEN g1.v > g0.v THEN 1 ELSE 0 END AS b
  FROM vgrid g0
  JOIN vgrid g1 ON g1.doc_id = g0.doc_id AND g1.fi = g0.fi
              AND g1.j = g0.j AND g1.i = g0.i + 1
  WHERE g0.i < 8
),
vhashes AS (
  SELECT doc_id, fi,
         SUM(CASE WHEN j < 4 THEN b << (j * 8 + i) ELSE 0 END) AS h1,
         SUM(CASE WHEN j >= 4 THEN b << ((j - 4) * 8 + i) ELSE 0 END) AS h2
  FROM vbits GROUP BY doc_id, fi
),
aud AS (
  SELECT doc_id AS media_id, text, n_chars FROM documents WHERE doc_id % 3 = 1
),
apos AS (
  SELECT media_id, r.range AS p,
         ascii(substr(text, CAST(r.range AS INTEGER) + 1, 1)) AS v
  FROM aud CROSS JOIN range(0, 65536) r WHERE r.range < n_chars
),
awin AS (
  SELECT media_id, CAST(p // 16 AS INTEGER) AS w, SUM(v * v) AS energy
  FROM apos GROUP BY 1, 2
),
aslots AS (
  SELECT aud.media_id, s.range AS w,
         COALESCE(awin.energy, 0) AS energy
  FROM aud CROSS JOIN range(0, 33) s
  LEFT JOIN awin ON awin.media_id = aud.media_id AND awin.w = s.range
),
afp AS (
  SELECT s0.media_id,
         SUM(CASE WHEN s1.energy > s0.energy
                  THEN 1::BIGINT << s0.w ELSE 0 END) AS fp
  FROM aslots s0
  JOIN aslots s1 ON s1.media_id = s0.media_id AND s1.w = s0.w + 1
  WHERE s0.w < 32
  GROUP BY 1
)
SELECT 'image' AS kind, CAST(doc_id AS BIGINT) AS media_id,
       CAST(0 AS INT) AS frame_idx,
       CAST(h1 AS BIGINT) AS h1, CAST(h2 AS BIGINT) AS h2
FROM ihashes
UNION ALL
SELECT 'video', CAST(doc_id AS BIGINT), CAST(fi AS INT),
       CAST(h1 AS BIGINT), CAST(h2 AS BIGINT)
FROM vhashes
UNION ALL
SELECT 'audio', CAST(media_id AS BIGINT), CAST(0 AS INT),
       CAST(fp AS BIGINT), CAST(0 AS BIGINT)
FROM afp
"""
ORACLE["q_image_dhash_from_manifest"] = ORACLE["q_image_dhash_dedup"]
ORACLE["q_video_near_dup_from_manifest"] = ORACLE["q_video_near_dup"]
ORACLE["q_media_manifest_ivm"] = ORACLE["q_media_fingerprint_manifest"]
QUERIES["q_media_fingerprint_manifest"] = q_media_fingerprint_manifest
QUERIES["q_image_dhash_from_manifest"] = q_image_dhash_from_manifest
QUERIES["q_video_near_dup_from_manifest"] = q_video_near_dup_from_manifest
QUERIES["q_media_manifest_ivm"] = q_media_manifest_ivm
