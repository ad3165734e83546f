"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched Pandas UDFs over mapInPandas.

The Spark-side plumbing — schemas, partitioning, UDF signatures, batch
shapes — is real and tested, and the package now ships REAL pure-stdlib
decoders for BMP/PNG/GIF/WAV here, baseline JPEG in operators/jpeg.py,
and Motion-JPEG AVI in operators/video.py (rounds 4-6). The ONE
remaining stub is the generic ``decode_media(fake=)`` hook for formats
outside that set (no Pillow/librosa/pyav in the container): it raises
NotImplementedError unless ``fake=True``, whose clearly-marked
deterministic fake derives "pixels" from the content bytes. Swapping in
a library codec there means replacing one function body; every plan
around it is unchanged.

Scale notes: media blobs ride in parquet binary columns; mapInPandas
streams Arrow batches so peak memory is one batch of blobs per task —
size ``spark.sql.execution.arrow.maxRecordsPerBatch`` (and keep blobs
under ~100 MB) accordingly. Feature extraction emits narrow rows, so
the expensive wide→narrow step happens inside the scan stage with no
shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("content", BinaryType()),  # opaque encoded bytes
        StructField(
            "meta",
            StructType(
                [
                    StructField("byte_len", LongType()),
                    StructField("mime", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


MEDIA_BUILD_CHUNK = 256  # max payload rows per yielded Arrow frame


def spread_for_expansion(thin: DataFrame) -> DataFrame:
    """Media builders are EXPANSION operators: input rows are
    bytes-thin (ids/text) while output payloads are ~10³× bigger, so
    the SCAN's split count is the wrong parallelism for the build —
    a small parquet of ids arrives as ONE split (measured: the whole
    sf0.1 documents table scans as 1 partition, i.e. every decode
    query ran serial until round 11), and a single task then
    materializes the entire corpus's payloads in its Arrow batches
    (the round-11 10× blow-up stress OOMed a default-heap JVM exactly
    there). Repartitioning the THIN side to the session parallelism
    costs a shuffle of ids only — negligible against the decode it
    parallelizes — and bounds every task's payload working set to
    corpus/parallelism. The same rule a 100 TB cluster needs: size
    expansion-stage tasks by their OUTPUT bytes, not their input.

    When the thin input ALREADY has at least session parallelism (a
    100 TB scan arrives as thousands of splits), repartitioning down
    would coalesce and CAP decode parallelism — skip the shuffle and
    keep the scan's split count instead."""
    sc = thin.sparkSession.sparkContext
    existing = thin.rdd.getNumPartitions()
    if existing >= sc.defaultParallelism:
        return thin
    return thin.repartition(sc.defaultParallelism)


def chunked_pdfs(batches, rows: int = MEDIA_BUILD_CHUNK):
    """Re-slice incoming Arrow batches into ≤``rows``-row pandas
    frames so a builder's YIELDED payload frames stay bounded even
    under a foreign session's 10k-row default Arrow batch size —
    executor memory then holds ~rows payloads per in-flight frame,
    not a whole input batch's worth."""
    for b in batches:
        for start in range(0, len(b), rows):
            yield b.iloc[start : start + rows]


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents corpus: text bytes stand
    in for encoded media (deterministic, schema-faithful). Metadata is
    typed at ingest exactly as a real loader would populate it."""
    content = F.encode(F.col("text"), "utf-8")
    mtype = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mtype.alias("media_type"),
        content.alias("content"),
        F.struct(
            F.length(content).cast("long").alias("byte_len"),
            F.concat(F.lit("application/x-fake-"), mtype).alias("mime"),
            F.when(mtype == "image", ((F.col("doc_id") % 8 + 1) * 64).cast("int")).alias("width"),
            F.when(mtype == "image", ((F.col("doc_id") % 4 + 1) * 64).cast("int")).alias("height"),
            F.when(mtype != "image", (F.col("n_chars") * 10).cast("long")).alias("duration_ms"),
        ).alias("meta"),
    )


def decode_media(content: bytes, media_type: str, fake: bool = False) -> dict[str, Any]:
    """STUB: real decoding requires Pillow / librosa / pyav, absent in
    this environment. ``fake=True`` produces a deterministic surrogate
    decode derived from the bytes themselves."""
    if not fake:
        raise NotImplementedError(
            "media decoding requires an image/audio library; "
            "re-implement decode_media with Pillow/librosa/pyav, or pass fake=True"
        )
    # Deterministic fake: "samples" = byte values of an 8-byte stride.
    return {
        "n_samples": len(content),
        "samples": list(content[::8][:16]),
    }


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas: 8-bucket byte
    histogram (normalized) as the stand-in embedding. Batch shape:
    pdf[content] is a Series of bytes objects; output is narrow."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content in pdf["content"]:
                decoded = decode_media(bytes(content), "any", fake=fake)
                hist = [0.0] * 8
                for b in decoded["samples"]:
                    hist[b % 8] += 1.0
                total = sum(hist) or 1.0
                feats.append([h / total for h in hist])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": [len(bytes(c)) for c in pdf["content"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Resize plumbing: filters to images, rewrites content + meta via
    mapInPandas. The fake 'resize' truncates/pads bytes to w*h (a real
    one decodes, resizes, re-encodes — same frame contract)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            if not fake:
                decode_media(b"", "image", fake=False)  # raises NotImplementedError
            content = [
                bytes(c)[:target].ljust(target, b"\0") for c in pdf["content"]
            ]
            out = pdf.copy()
            out["content"] = content
            meta = pd.DataFrame(list(out["meta"]))
            meta["byte_len"] = target
            meta["width"] = width
            meta["height"] = height
            out["meta"] = meta.to_dict("records")
            yield out

    return media.where(F.col("media_type") == "image").mapInPandas(_resize, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Frame sampling plumbing for video rows: one output row per
    sampled frame (media_id, frame_idx, frame bytes). Fake frames are
    fixed-size byte slices; a real sampler seeks the container."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                if not fake:
                    decode_media(b"", "video", fake=False)
                n_frames = max(1, int((meta["duration_ms"] or 0) // every_ms))
                blob = bytes(content)
                step = max(1, len(blob) // n_frames)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(blob[i * step : (i + 1) * step])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.where(F.col("media_type") == "video").mapInPandas(_sample, schema)


# --- REAL container-header probing (no codec libraries needed) -------------

def probe_header(blob: bytes) -> tuple[str, int | None, int | None]:
    """Sniff the container format and image dimensions from header
    bytes alone. This is REAL parsing (magic numbers + PNG IHDR / JPEG
    SOFn scan / GIF logical screen descriptor), not a stub: dimension
    probing needs only the first KB of the file, never a codec — it is
    how a 100 TB media crawl filters by resolution without decoding a
    single pixel."""
    if blob[:8] == b"\x89PNG\r\n\x1a\n" and len(blob) >= 24:
        w = int.from_bytes(blob[16:20], "big")
        h = int.from_bytes(blob[20:24], "big")
        return "png", w, h
    if blob[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(blob):
            if blob[i] != 0xFF:
                i += 1
                continue
            marker = blob[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = int.from_bytes(blob[i + 2 : i + 4], "big")
            # SOF0..SOF15 except DHT(C4)/JPG(C8)/DAC(CC) carry dimensions
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h = int.from_bytes(blob[i + 5 : i + 7], "big")
                w = int.from_bytes(blob[i + 7 : i + 9], "big")
                return "jpeg", w, h
            i += 2 + seg_len
        return "jpeg", None, None
    if blob[:6] in (b"GIF87a", b"GIF89a") and len(blob) >= 10:
        w = int.from_bytes(blob[6:8], "little")
        h = int.from_bytes(blob[8:10], "little")
        return "gif", w, h
    if blob[4:8] == b"ftyp":
        return "mp4", None, None
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return "wav", None, None
    return "unknown", None, None


PROBE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("container", StringType()),
        StructField("probed_width", IntegerType()),
        StructField("probed_height", IntegerType()),
    ]
)


def probe_media(media: DataFrame) -> DataFrame:
    """Header probe over the binary column, Arrow-batched. Output is
    narrow (id + format + dims), so the wide→narrow drop happens inside
    the scan stage — the blobs never shuffle."""

    def _probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "container": [], "probed_width": [], "probed_height": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                fmt, w, h = probe_header(bytes(content))
                out["media_id"].append(mid)
                out["container"].append(fmt)
                out["probed_width"].append(w)
                out["probed_height"].append(h)
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(_probe, PROBE_SCHEMA)


HEADER_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("container", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("header_len", IntegerType()),
        StructField("body_len", LongType()),
        StructField("first_byte", IntegerType()),
        StructField("last_byte", IntegerType()),
    ]
)


def _parse_header_len(blob: bytes) -> tuple[str, int]:
    """Read the container header length FROM THE BYTES (no fixed
    constants beyond each format's fixed-size preamble): PNG = 8-byte
    signature + IHDR chunk whose data length is the 4 bytes at offset
    8; WAV = RIFF preamble through the 'fmt ' tag; MP4 = the ftyp box
    size field at offset 0."""
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        ihdr_len = int.from_bytes(blob[8:12], "big")
        return "png", 8 + 4 + 4 + ihdr_len
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return "wav", 16  # RIFF + chunk size + WAVE + 'fmt '
    if blob[4:8] == b"ftyp":
        return "mp4", int.from_bytes(blob[:4], "big")
    return "unknown", 0


def extract_header_features(media: DataFrame) -> DataFrame:
    """REAL feature extraction from container bytes, Arrow-batched: the
    container, image dimensions, and header length are parsed from the
    binary column (probe_header + the per-format length fields), and
    the body summary (length, first/last byte) is measured from the
    remaining payload bytes. Every output is deterministic byte
    arithmetic, so a SQL oracle over the source text verifies the full
    build→parse mapInPandas round trip — no fake decode involved.

    Scale: same contract as probe_media — narrow output inside the
    scan stage, blobs never shuffle."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in HEADER_FEATURE_SCHEMA.fields}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(content)
                fmt, w, h = probe_header(blob)
                _, hlen = _parse_header_len(blob)
                body = blob[hlen:]
                out["media_id"].append(mid)
                out["container"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["header_len"].append(hlen)
                out["body_len"].append(len(body))
                out["first_byte"].append(body[0] if body else None)
                out["last_byte"].append(body[-1] if body else None)
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(
        _extract, HEADER_FEATURE_SCHEMA
    )


RESIZE_SUMMARY_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("out_len", LongType()),
        StructField("tail_byte", IntegerType()),
        StructField("pad_len", LongType()),
    ]
)


def summarize_resized(media: DataFrame) -> DataFrame:
    """Byte-level summary of resized image rows, measured from the
    ACTUAL output blobs (not the declared meta): emitted length, the
    final byte value, and the trailing-NUL pad length. Gives the
    resize plumbing an exact SQL oracle — the numbers only match if
    the mapInPandas rewrite really produced the bytes it claims."""

    def _summ(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in RESIZE_SUMMARY_SCHEMA.fields}
            for mid, content, meta in zip(
                pdf["media_id"], pdf["content"], pdf["meta"]
            ):
                blob = bytes(content)
                out["media_id"].append(mid)
                out["width"].append(meta["width"])
                out["height"].append(meta["height"])
                out["out_len"].append(len(blob))
                out["tail_byte"].append(blob[-1] if blob else None)
                out["pad_len"].append(len(blob) - len(blob.rstrip(b"\x00")))
            yield pd.DataFrame(out)

    return media.mapInPandas(_summ, RESIZE_SUMMARY_SCHEMA)


def media_with_headers(docs: DataFrame) -> DataFrame:
    """Media table whose payloads carry REAL container headers (valid
    PNG IHDR / WAV RIFF / MP4 ftyp bytes) followed by the text bytes as
    body. Dimensions are the same deterministic function of doc_id that
    media_from_documents declares in metadata — so probing the headers
    back (probe_media) has a closed-form oracle, and the driver's gate
    verifies the full byte-level build→parse round trip through the
    Arrow-batched mapInPandas path."""

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # chunked: bounded payload frames per yield (chunked_pdfs)
        for pdf in chunked_pdfs(batches):
            ids, types, blobs = [], [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                body = str(text).encode("utf-8")
                kind = did % 3
                if kind == 0:
                    w = (did % 8 + 1) * 64
                    h = (did % 4 + 1) * 64
                    header = (
                        b"\x89PNG\r\n\x1a\n"
                        + (13).to_bytes(4, "big")
                        + b"IHDR"
                        + w.to_bytes(4, "big")
                        + h.to_bytes(4, "big")
                        + b"\x08\x02\x00\x00\x00"
                    )
                    mtype = "image"
                elif kind == 1:
                    header = (
                        b"RIFF"
                        + (36 + len(body)).to_bytes(4, "little")
                        + b"WAVEfmt "
                    )
                    mtype = "audio"
                else:
                    # size field == actual box length (20) so header-len
                    # parsing can honestly read it back from the bytes.
                    header = (20).to_bytes(4, "big") + b"ftypisom" + b"\x00" * 8
                    mtype = "video"
                ids.append(did)
                types.append(mtype)
                blobs.append(header + body)
            yield pd.DataFrame({"media_id": ids, "media_type": types, "content": blobs})

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("media_type", StringType()),
            StructField("content", BinaryType()),
        ]
    )
    return spread_for_expansion(docs.select("doc_id", "text")).mapInPandas(
        _build, schema
    )


def segment_audio(
    media: DataFrame,
    window_ms: int = 2,
    bytes_per_ms: int = 32,
    header_len: int = 16,
) -> DataFrame:
    """Fixed-window audio segmentation manifest over WAV rows: one row
    per window with its byte extent and start time — the scheduling
    table a feature extractor (or ASR chunker) consumes before touching
    samples. Offsets are computed from the REAL blob length minus the
    RIFF preamble (``header_len``, see media_with_headers) at an
    assumed constant byte rate — the PCM-WAV property that makes
    seek-by-time pure arithmetic. The last window is truncated, never
    padded, so byte accounting sums exactly to the body length.

    Arrow-batched mapInPandas over audio rows only; map-side, no
    shuffle. At 100 TB the manifest is rows ∝ total duration / window —
    write it clustered by media_id and the extractor's scan prunes per
    file."""
    # byte offsets are LongType: a 4 GiB WAV body overflows int32 and
    # the Arrow conversion would wrap or raise depending on session conf
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("window_idx", IntegerType()),
            StructField("start_byte", LongType()),
            StructField("n_bytes", LongType()),
            StructField("start_ms", IntegerType()),
        ]
    )
    wb = window_ms * bytes_per_ms

    def _segment(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, starts, sizes, mss = [], [], [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                body = max(0, len(bytes(content)) - header_len)
                n_win = max(1, (body + wb - 1) // wb)
                for i in range(n_win):
                    ids.append(mid)
                    idxs.append(i)
                    starts.append(i * wb)
                    sizes.append(min(wb, body - i * wb))
                    mss.append(i * window_ms)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "window_idx": idxs,
                    "start_byte": starts,
                    "n_bytes": sizes,
                    "start_ms": mss,
                }
            )

    return media.where(F.col("media_type") == "audio").mapInPandas(_segment, schema)


# --- REAL image decode: 24-bit uncompressed BMP -----------------------------
#
# The codec-library stubs above stay stubs (PNG/JPEG need zlib/DCT),
# but uncompressed BMP needs NOTHING beyond byte arithmetic — so this
# family is a REAL end-to-end pixel path: build a valid BMP file,
# parse its headers with struct, walk the padded bottom-up BGR rows,
# and emit pixel statistics. The pixel bytes are a closed form of
# (media_id, byte index), which is what lets DuckDB replay the decode
# differentially without any image library.

BMP_HEADER_LEN = 54  # 14-byte BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER


def _bmp_dims(doc_id: int) -> tuple[int, int]:
    # widths 6/12/18/24: half of them force nonzero row padding
    # (stride = ceil(3w/4)*4), so the decoder's stride math is exercised
    return 6 * (doc_id % 4 + 1), 4 * (doc_id % 3 + 1)


def _bmp_body_byte(doc_id: int, i: int) -> int:
    return (doc_id * 7 + i * 13) % 256


def build_bmp(doc_id: int) -> bytes:
    """A fully valid 24-bit bottom-up BMP whose pixel-array bytes
    (padding included) follow the closed form above."""
    import struct

    w, h = _bmp_dims(doc_id)
    stride = ((3 * w + 3) // 4) * 4
    body_len = stride * h
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM",
        BMP_HEADER_LEN + body_len,
        0,
        0,
        BMP_HEADER_LEN,  # pixel-data offset
        40,  # BITMAPINFOHEADER size
        w,
        h,  # positive height = bottom-up row order
        1,  # planes
        24,  # bits per pixel
        0,  # BI_RGB (uncompressed)
        body_len,
        2835,
        2835,  # 72 DPI
        0,
        0,
    )
    body = bytes(_bmp_body_byte(doc_id, i) for i in range(body_len))
    return header + body


def _bmp_header(blob: bytes) -> tuple[int, int, int, int]:
    """Validated header parse shared by decode and resize: magic,
    24-bit uncompressed bottom-up, positive dims, and a body long
    enough for the declared geometry — malformed inputs raise instead
    of wrapping Python's negative indices into silent garbage."""
    import struct

    if len(blob) < BMP_HEADER_LEN or blob[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", blob, 10)[0]
    w, h = struct.unpack_from("<ii", blob, 18)
    bpp = struct.unpack_from("<H", blob, 28)[0]
    comp = struct.unpack_from("<I", blob, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError("only 24-bit uncompressed BMP supported")
    if w <= 0 or h <= 0:
        raise ValueError("only positive-dimension bottom-up BMP supported")
    stride = ((3 * w + 3) // 4) * 4
    if len(blob) < data_off + stride * h:
        raise ValueError("BMP body shorter than declared geometry")
    return data_off, w, h, stride


def decode_bmp(blob: bytes) -> dict[str, Any]:
    """REAL decode: magic check, header-declared dims/offset/bpp,
    padded-stride walk, bottom-up row order, BGR channel order.
    Returns dims, the top-left and bottom-right RGB pixels (the two
    values that break if row order or stride handling is wrong — a
    channel MEAN alone is order-invariant), and per-channel means."""
    data_off, w, h, stride = _bmp_header(blob)

    def px(x: int, y: int) -> tuple[int, int, int]:
        # image row y (0 = top) lives at file row h-1-y
        o = data_off + (h - 1 - y) * stride + 3 * x
        b, g, r = blob[o], blob[o + 1], blob[o + 2]
        return r, g, b

    sums = [0, 0, 0]  # r, g, b
    for frow in range(h):
        base = data_off + frow * stride
        row = blob[base : base + 3 * w]
        sums[2] += sum(row[0::3])
        sums[1] += sum(row[1::3])
        sums[0] += sum(row[2::3])
    n = w * h
    tl, br = px(0, 0), px(w - 1, h - 1)
    return {
        "width": w,
        "height": h,
        "tl_r": tl[0], "tl_g": tl[1], "tl_b": tl[2],
        "br_r": br[0], "br_g": br[1], "br_b": br[2],
        "mean_r": round(sums[0] / n, 4),
        "mean_g": round(sums[1] / n, 4),
        "mean_b": round(sums[2] / n, 4),
    }


BMP_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("tl_r", IntegerType()),
        StructField("tl_g", IntegerType()),
        StructField("tl_b", IntegerType()),
        StructField("br_r", IntegerType()),
        StructField("br_g", IntegerType()),
        StructField("br_b", IntegerType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
    ]
)


def bmp_media(docs: DataFrame) -> DataFrame:
    """One real BMP payload per document (Arrow-batched builder)."""

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # chunked: bounded payload frames per yield (chunked_pdfs)
        for b in chunked_pdfs(batches):
            yield pd.DataFrame(
                {
                    "media_id": b["doc_id"],
                    "content": [build_bmp(int(d)) for d in b["doc_id"]],
                }
            )

    schema = StructType(
        [StructField("media_id", LongType()), StructField("content", BinaryType())]
    )
    return spread_for_expansion(docs.select("doc_id")).mapInPandas(
        _build, schema
    )


def bmp_decode_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode of BMP payloads → pixel statistics."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, blob in zip(b["media_id"], b["content"]):
                d = decode_bmp(bytes(blob))
                d["media_id"] = int(mid)
                rows.append(d)
            yield pd.DataFrame(rows, columns=[f.name for f in BMP_STATS_SCHEMA.fields])

    return media.mapInPandas(_decode, BMP_STATS_SCHEMA)


def resize_bmp(blob: bytes, out_w: int, out_h: int) -> bytes:
    """REAL nearest-neighbor resize on decoded BMP pixels, re-encoded
    as a valid BMP: output image pixel (X, Y) samples source image
    pixel (X·w // out_w, Y·h // out_h). Exercises decode (stride +
    bottom-up) on the way in and encode on the way out."""
    import struct

    if out_w <= 0 or out_h <= 0:
        raise ValueError("output dimensions must be positive")
    data_off, w, h, stride = _bmp_header(blob)
    out_stride = ((3 * out_w + 3) // 4) * 4
    body = bytearray(out_stride * out_h)
    for y_img in range(out_h):
        sy = y_img * h // out_h
        src_base = data_off + (h - 1 - sy) * stride
        dst_base = (out_h - 1 - y_img) * out_stride
        for x in range(out_w):
            sx = x * w // out_w
            body[dst_base + 3 * x : dst_base + 3 * x + 3] = blob[
                src_base + 3 * sx : src_base + 3 * sx + 3
            ]
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", BMP_HEADER_LEN + len(body), 0, 0, BMP_HEADER_LEN,
        40, out_w, out_h, 1, 24, 0, len(body), 2835, 2835, 0, 0,
    )
    return header + bytes(body)


def bmp_resize(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Arrow-batched real resize over BMP payloads."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "content": [
                        resize_bmp(bytes(blob), out_w, out_h)
                        for blob in b["content"]
                    ],
                }
            )

    schema = StructType(
        [StructField("media_id", LongType()), StructField("content", BinaryType())]
    )
    return media.mapInPandas(_resize, schema)


# --- REAL compressed-image decode: PNG (stdlib zlib) ------------------------
#
# BMP above proves the uncompressed pixel path; PNG proves a REAL
# compressed codec end to end with nothing beyond the standard
# library: zlib deflate/inflate, per-chunk CRC32 validation, and all
# five scanline filters (None/Sub/Up/Average/Paeth) — the encoder
# cycles filters per row (row % 5) so the decoder's filter reversal,
# including the Paeth predictor, is exercised on every image. Pixels
# are a closed form of (media_id, x, y), which is what lets DuckDB
# verify the decode differentially: compression changes the BYTES but
# not the pixels, so a hash match proves deflate→filter→defilter→
# inflate is lossless and byte-exact.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_IDAT_SPLIT = 64  # bytes per IDAT chunk → multi-IDAT is the norm


def _png_dims(doc_id: int) -> tuple[int, int]:
    return 5 * (doc_id % 4 + 1), 4 * (doc_id % 3 + 1)


def _png_px(doc_id: int, x: int, y: int) -> tuple[int, int, int]:
    return (
        (doc_id * 3 + x * 5 + y * 11) % 256,
        (doc_id * 7 + x * 13 + y * 17) % 256,
        (doc_id * 11 + x * 19 + y * 23) % 256,
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def build_png(doc_id: int) -> bytes:
    """A fully valid 8-bit RGB PNG: real zlib stream, real CRCs, and a
    different scanline filter on every row (row % 5)."""
    import struct
    import zlib

    w, h = _png_dims(doc_id)
    raw_rows = [
        bytes(v for x in range(w) for v in _png_px(doc_id, x, y))
        for y in range(h)
    ]
    filtered = bytearray()
    prior = bytes(3 * w)
    for y, row in enumerate(raw_rows):
        f = y % 5
        filtered.append(f)
        for i, v in enumerate(row):
            left = row[i - 3] if i >= 3 else 0
            up = prior[i]
            ul = prior[i - 3] if i >= 3 else 0
            if f == 0:
                out = v
            elif f == 1:
                out = (v - left) % 256
            elif f == 2:
                out = (v - up) % 256
            elif f == 3:
                out = (v - (left + up) // 2) % 256
            else:
                out = (v - _paeth(left, up, ul)) % 256
            filtered.append(out)
        prior = row
    comp = zlib.compress(bytes(filtered), 9)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    blob = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
    for off in range(0, len(comp), _PNG_IDAT_SPLIT):
        blob += _png_chunk(b"IDAT", comp[off : off + _PNG_IDAT_SPLIT])
    return blob + _png_chunk(b"IEND", b"")


def decode_png(blob: bytes) -> dict[str, Any]:
    """REAL decode: signature + chunk walk with CRC32 validation,
    multi-IDAT reassembly, zlib inflate, and reversal of all five
    scanline filters. Returns the BMP-stats shape plus the IDAT count
    and the number of distinct filters seen."""
    import struct
    import zlib

    if blob[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = len(_PNG_SIG)
    idat = b""
    n_idat = 0
    w = h = None
    while pos < len(blob):
        if pos + 8 > len(blob):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack_from(">I", blob, pos)
        ctype = blob[pos + 4 : pos + 8]
        payload = blob[pos + 8 : pos + 8 + length]
        if len(payload) != length or pos + 12 + length > len(blob):
            raise ValueError("truncated chunk payload")
        (crc,) = struct.unpack_from(">I", blob, pos + 8 + length)
        if crc != (zlib.crc32(ctype + payload) & 0xFFFFFFFF):
            raise ValueError(f"CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", payload
            )
            if (depth, color, comp, filt, ilace) != (8, 2, 0, 0, 0):
                raise ValueError("only 8-bit RGB non-interlaced supported")
        elif ctype == b"IDAT":
            idat += payload
            n_idat += 1
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("missing IHDR or IDAT")
    raw = zlib.decompress(idat)
    if len(raw) != h * (1 + 3 * w):
        raise ValueError("decompressed length does not match geometry")
    rows: list[bytes] = []
    prior = bytes(3 * w)
    filters_seen = set()
    for y in range(h):
        base = y * (1 + 3 * w)
        f = raw[base]
        filters_seen.add(f)
        line = raw[base + 1 : base + 1 + 3 * w]
        out = bytearray(3 * w)
        for i, v in enumerate(line):
            left = out[i - 3] if i >= 3 else 0
            up = prior[i]
            ul = prior[i - 3] if i >= 3 else 0
            if f == 0:
                out[i] = v
            elif f == 1:
                out[i] = (v + left) % 256
            elif f == 2:
                out[i] = (v + up) % 256
            elif f == 3:
                out[i] = (v + (left + up) // 2) % 256
            elif f == 4:
                out[i] = (v + _paeth(left, up, ul)) % 256
            else:
                raise ValueError(f"unknown filter {f}")
        rows.append(bytes(out))
        prior = bytes(out)
    sums = [0, 0, 0]
    for row in rows:
        sums[0] += sum(row[0::3])
        sums[1] += sum(row[1::3])
        sums[2] += sum(row[2::3])
    n = w * h
    tl = rows[0][0:3]
    br = rows[h - 1][3 * (w - 1) : 3 * (w - 1) + 3]
    return {
        "width": w,
        "height": h,
        "tl_r": tl[0], "tl_g": tl[1], "tl_b": tl[2],
        "br_r": br[0], "br_g": br[1], "br_b": br[2],
        "mean_r": round(sums[0] / n, 4),
        "mean_g": round(sums[1] / n, 4),
        "mean_b": round(sums[2] / n, 4),
        "n_idat": n_idat,
        "n_filters": len(filters_seen),
    }


PNG_STATS_SCHEMA = StructType(
    list(BMP_STATS_SCHEMA.fields)
    + [StructField("n_filters", IntegerType())]
)


def png_media(docs: DataFrame) -> DataFrame:
    """One real PNG payload per document (Arrow-batched builder)."""

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # chunked: bounded payload frames per yield (chunked_pdfs)
        for b in chunked_pdfs(batches):
            yield pd.DataFrame(
                {
                    "media_id": b["doc_id"],
                    "content": [build_png(int(d)) for d in b["doc_id"]],
                }
            )

    schema = StructType(
        [StructField("media_id", LongType()), StructField("content", BinaryType())]
    )
    return spread_for_expansion(docs.select("doc_id")).mapInPandas(
        _build, schema
    )


def png_decode_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL PNG decode → pixel statistics. n_idat is a
    compression artifact (zlib output size), so it stays out of the
    oracle-facing frame; n_filters has the closed form least(h, 5)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, blob in zip(b["media_id"], b["content"]):
                d = decode_png(bytes(blob))
                d.pop("n_idat")
                d["media_id"] = int(mid)
                rows.append(d)
            yield pd.DataFrame(rows, columns=[f.name for f in PNG_STATS_SCHEMA.fields])

    return media.mapInPandas(_decode, PNG_STATS_SCHEMA)


def resize_png(blob: bytes, out_w: int, out_h: int) -> bytes:
    """REAL resize through the compressed codec: full decode (CRC +
    inflate + de-filter), nearest-neighbor resample — output pixel
    (X, Y) samples source (X·w // out_w, Y·h // out_h) — then a full
    re-encode (filter + deflate + CRC). Nothing is copied through:
    every byte of the output is produced by the codec."""
    import struct
    import zlib

    if out_w <= 0 or out_h <= 0:
        raise ValueError("output dimensions must be positive")
    # decode to raw rows (reuse the validating decoder's core walk)
    d = decode_png(blob)  # validates; raises on corruption
    w, h = d["width"], d["height"]
    # second pass to get pixel rows (decode_png returns stats only)
    pos = len(_PNG_SIG)
    idat = b""
    while pos < len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        ctype = blob[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            idat += blob[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IEND":
            break
    raw = zlib.decompress(idat)
    rows = []
    prior = bytes(3 * w)
    for y in range(h):
        base = y * (1 + 3 * w)
        f = raw[base]
        line = raw[base + 1 : base + 1 + 3 * w]
        out = bytearray(3 * w)
        for i, v in enumerate(line):
            left = out[i - 3] if i >= 3 else 0
            up = prior[i]
            ul = prior[i - 3] if i >= 3 else 0
            out[i] = (
                v
                if f == 0
                else (v + left) % 256
                if f == 1
                else (v + up) % 256
                if f == 2
                else (v + (left + up) // 2) % 256
                if f == 3
                else (v + _paeth(left, up, ul)) % 256
            )
        rows.append(bytes(out))
        prior = rows[-1]
    # nearest-neighbor resample
    out_rows = []
    for y in range(out_h):
        sy = y * h // out_h
        src = rows[sy]
        line = bytearray()
        for x in range(out_w):
            sx = x * w // out_w
            line += src[3 * sx : 3 * sx + 3]
        out_rows.append(bytes(line))
    # re-encode with the same per-row filter cycle
    filtered = bytearray()
    prior = bytes(3 * out_w)
    for y, row in enumerate(out_rows):
        f = y % 5
        filtered.append(f)
        for i, v in enumerate(row):
            left = row[i - 3] if i >= 3 else 0
            up = prior[i]
            ul = prior[i - 3] if i >= 3 else 0
            if f == 0:
                out_v = v
            elif f == 1:
                out_v = (v - left) % 256
            elif f == 2:
                out_v = (v - up) % 256
            elif f == 3:
                out_v = (v - (left + up) // 2) % 256
            else:
                out_v = (v - _paeth(left, up, ul)) % 256
            filtered.append(out_v)
        prior = row
    comp = zlib.compress(bytes(filtered), 9)
    ihdr = struct.pack(">IIBBBBB", out_w, out_h, 8, 2, 0, 0, 0)
    out_blob = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
    for off in range(0, len(comp), _PNG_IDAT_SPLIT):
        out_blob += _png_chunk(b"IDAT", comp[off : off + _PNG_IDAT_SPLIT])
    return out_blob + _png_chunk(b"IEND", b"")


def png_resize_stats(media: DataFrame, out_w: int = 6, out_h: int = 6) -> DataFrame:
    """Arrow-batched decode→resample→re-encode→decode-AGAIN pipeline:
    the emitted stats come from decoding the RESIZED file, so the
    whole compressed round trip is inside the verified path."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, blob in zip(b["media_id"], b["content"]):
                d = decode_png(resize_png(bytes(blob), out_w, out_h))
                d.pop("n_idat")
                d["media_id"] = int(mid)
                rows.append(d)
            yield pd.DataFrame(rows, columns=[f.name for f in PNG_STATS_SCHEMA.fields])

    return media.mapInPandas(_run, PNG_STATS_SCHEMA)


# --- REAL dictionary-codec decode: GIF (LZW, pure stdlib) -------------------
#
# The codec trilogy's third member: BMP proved the uncompressed pixel
# path, PNG proved a real DEFLATE stream with per-row filters, and GIF
# proves a DICTIONARY codec — full LZW with variable code widths
# (growing to 12 bits), LSB-first bit packing, clear/EOI control
# codes, and the KwKwK corner case — implemented from the GIF89a spec
# with nothing beyond bytes. Pixels are palette indices with a closed
# form of (media_id, x, y), and the 64-entry palette is itself a
# closed form of the index, so DuckDB replays the decoded RGB stats
# without any image library.

_GIF_PALETTE_BITS = 6  # 64-color global table → LZW min code size 6


def _gif_dims(doc_id: int) -> tuple[int, int]:
    return 4 * (doc_id % 5 + 1), 3 * (doc_id % 4 + 1)


def _gif_index(doc_id: int, x: int, y: int) -> int:
    return (doc_id * 3 + x * 5 + y * 7) % 64


def _gif_palette(i: int) -> tuple[int, int, int]:
    return ((i * 7 + 11) % 256, (i * 13 + 17) % 256, (i * 19 + 23) % 256)


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    out_bits: list[int] = []

    def emit(code: int, w: int) -> None:
        for b in range(w):  # LSB first
            out_bits.append((code >> b) & 1)

    emit(clear, width)
    buf: tuple[int, ...] = ()
    for idx in indices:
        cand = buf + (idx,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        buf = (idx,)
    if buf:
        emit(table[buf], width)
    emit(eoi, width)
    by = bytearray()
    for i in range(0, len(out_bits), 8):
        v = 0
        for j, bit in enumerate(out_bits[i : i + 8]):
            v |= bit << j
        by.append(v)
    return bytes(by)


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> list[int]:
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0

    def read(w: int) -> int:
        nonlocal pos
        v = 0
        for b in range(w):
            byte = data[(pos + b) >> 3] if (pos + b) >> 3 < len(data) else 0
            v |= ((byte >> ((pos + b) & 7)) & 1) << b
        pos += w
        return v

    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    width = min_code_size + 1
    out: list[int] = []
    prev: list[int] | None = None
    while True:
        code = read(width)
        if code == clear:
            table = [[i] for i in range(clear)] + [[], []]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and table[code]:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + [prev[0]]  # KwKwK
        else:
            raise ValueError(f"bad LZW code {code}")
        out.extend(entry)
        if prev is not None:
            table.append(prev + [entry[0]])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) > n_expected:
            raise ValueError("LZW produced more pixels than the geometry")
    if len(out) != n_expected:
        raise ValueError(f"LZW produced {len(out)} of {n_expected} pixels")
    return out


def _gif_frame_step(doc_id: int) -> int:
    return doc_id % 5 + 1


def build_gif(doc_id: int, frame: int = 0) -> bytes:
    """A fully valid GIF89a: logical screen descriptor, 64-entry
    global color table, one image with REAL LZW-compressed indices in
    255-byte sub-blocks. ``frame`` shifts every palette index by
    frame * step(doc) mod 64 — the deterministic "animation" the
    keyframe operator samples; frame 0 is byte-identical to the
    original single-frame payload."""
    import struct

    w, h = _gif_dims(doc_id)
    shift = frame * _gif_frame_step(doc_id)
    indices = [
        (_gif_index(doc_id, x, y) + shift) % 64
        for y in range(h)
        for x in range(w)
    ]
    blob = bytearray(b"GIF89a")
    # packed: GCT present, color resolution 7, GCT size 2^(5+1)=64
    blob += struct.pack("<HHBBB", w, h, 0b10100101, 0, 0)
    for i in range(64):
        blob += bytes(_gif_palette(i))
    blob += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    blob.append(_GIF_PALETTE_BITS)  # LZW min code size
    comp = _lzw_encode(indices, _GIF_PALETTE_BITS)
    for off in range(0, len(comp), 255):
        chunk = comp[off : off + 255]
        blob.append(len(chunk))
        blob += chunk
    blob += b"\x00\x3b"  # block terminator + trailer
    return bytes(blob)


def decode_gif(blob: bytes) -> dict[str, Any]:
    """REAL decode: header/LSD/GCT parse, sub-block reassembly, full
    LZW expansion, palette mapping → the codec-stats shape. Truncated
    or malformed structures surface as ValueError, never as a raw
    struct/index error from a negative-length slice."""
    import struct

    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    try:
        return _decode_gif_body(blob)
    except (struct.error, IndexError) as e:
        raise ValueError(f"truncated GIF: {e}") from e


def _decode_gif_body(blob: bytes) -> dict[str, Any]:
    import struct

    w, h, packed, _bg, _ar = struct.unpack_from("<HHBBB", blob, 6)
    if not packed & 0x80:
        raise ValueError("missing global color table")
    gct_n = 2 << (packed & 0x07)
    pos = 13
    palette = [tuple(blob[pos + 3 * i : pos + 3 * i + 3]) for i in range(gct_n)]
    pos += 3 * gct_n
    if blob[pos] != 0x2C:
        raise ValueError("expected image descriptor")
    ix, iy, iw, ih, ipacked = struct.unpack_from("<HHHHB", blob, pos + 1)
    if (ix, iy, iw, ih) != (0, 0, w, h) or ipacked & 0x80:
        raise ValueError("only full-frame images with the global table")
    pos += 10
    min_code = blob[pos]
    pos += 1
    comp = bytearray()
    while True:
        n = blob[pos]
        pos += 1
        if n == 0:
            break
        comp += blob[pos : pos + n]
        pos += n
    if blob[pos] != 0x3B:
        raise ValueError("missing trailer")
    indices = _lzw_decode(bytes(comp), min_code, w * h)
    if max(indices) >= gct_n:
        raise ValueError("palette index out of range")
    px = [palette[i] for i in indices]
    n = w * h
    sums = [sum(p[c] for p in px) for c in range(3)]
    tl, br = px[0], px[-1]
    return {
        "width": w,
        "height": h,
        "pixels": px,
        "tl_r": tl[0], "tl_g": tl[1], "tl_b": tl[2],
        "br_r": br[0], "br_g": br[1], "br_b": br[2],
        "mean_r": round(sums[0] / n, 4),
        "mean_g": round(sums[1] / n, 4),
        "mean_b": round(sums[2] / n, 4),
    }


def gif_media(docs: DataFrame) -> DataFrame:
    """One real GIF payload per document (Arrow-batched builder)."""

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # chunked: bounded payload frames per yield (chunked_pdfs)
        for b in chunked_pdfs(batches):
            yield pd.DataFrame(
                {
                    "media_id": b["doc_id"],
                    "content": [build_gif(int(d)) for d in b["doc_id"]],
                }
            )

    schema = StructType(
        [StructField("media_id", LongType()), StructField("content", BinaryType())]
    )
    return spread_for_expansion(docs.select("doc_id")).mapInPandas(
        _build, schema
    )


def gif_decode_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL GIF decode → pixel statistics."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, blob in zip(b["media_id"], b["content"]):
                d = decode_gif(bytes(blob))
                d["media_id"] = int(mid)
                rows.append(d)
            yield pd.DataFrame(rows, columns=[f.name for f in BMP_STATS_SCHEMA.fields])

    return media.mapInPandas(_decode, BMP_STATS_SCHEMA)


def gif_keyframe_deltas(docs: DataFrame) -> DataFrame:
    """Temporal media analysis through the REAL codec: per document,
    build doc_id%3+2 animated GIF frames (each a full valid GIF89a
    whose index plane shifts by frame*step mod 64), LZW-decode every
    frame, and emit the pixel-wise inter-frame delta sums
    (sum over pixels of |Δr|+|Δg|+|Δb| vs the previous frame; frame 0
    has no predecessor → NULL). Exact integers end to end, so the
    oracle replays the deltas from the palette/index closed forms —
    a hash match proves the codec round-trips every frame of the
    animation, not just a single image."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # chunked: bounded payload frames per yield (chunked_pdfs)
        for b in chunked_pdfs(batches):
            rows = []
            for did in b["doc_id"]:
                did = int(did)
                n_frames = did % 3 + 2
                prev = None
                for f in range(n_frames):
                    d = decode_gif(build_gif(did, frame=f))
                    px = d["pixels"]
                    if prev is None:
                        sad = None
                    else:
                        sad = sum(
                            abs(a[0] - p[0]) + abs(a[1] - p[1]) + abs(a[2] - p[2])
                            for a, p in zip(px, prev)
                        )
                    rows.append(
                        {
                            "media_id": did,
                            "frame_idx": f,
                            "n_px": d["width"] * d["height"],
                            "sum_abs_delta": sad,
                        }
                    )
                    prev = px
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "n_px", "sum_abs_delta"],
            )

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("n_px", LongType()),
            StructField("sum_abs_delta", LongType()),
        ]
    )
    return spread_for_expansion(docs.select("doc_id")).mapInPandas(
        _frames, schema
    )


def audio_onsets(media: DataFrame, window_bytes: int = 64, threshold: int = 20000) -> DataFrame:
    """Onset detection over the WAV payloads: per fixed window, the
    exact integer energy (sum of squared byte samples, decoded from
    the REAL blob past the 16-byte RIFF preamble) and its jump vs the
    previous window; a window is an onset when the jump exceeds the
    threshold (window 0 always). The audio sibling of the GIF keyframe
    operator — exact integers end to end, so the oracle replays the
    energies from ascii() closed forms over the text body."""

    def _onsets(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, mtype, blob in zip(
                b["media_id"], b["media_type"], b["content"]
            ):
                if mtype != "audio":
                    continue
                body = np.frombuffer(bytes(blob)[16:], dtype=np.uint8).astype(
                    np.int64
                )
                # No floor: an empty audio body yields ZERO windows —
                # the oracle enumerates existing characters only, so a
                # synthetic window-0 row would be a Spark-only row.
                n_win = (len(body) + window_bytes - 1) // window_bytes
                prev = None
                for w in range(n_win):
                    seg = body[w * window_bytes : (w + 1) * window_bytes]
                    energy = int((seg * seg).sum())
                    delta = None if prev is None else energy - prev
                    rows.append(
                        {
                            "media_id": int(mid),
                            "window_idx": w,
                            "energy": energy,
                            "delta": delta,
                            "is_onset": 1
                            if delta is None or delta > threshold
                            else 0,
                        }
                    )
                    prev = energy
            yield pd.DataFrame(
                rows,
                columns=["media_id", "window_idx", "energy", "delta", "is_onset"],
            )

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("window_idx", IntegerType()),
            StructField("energy", LongType()),
            StructField("delta", LongType()),
            StructField("is_onset", IntegerType()),
        ]
    )
    return media.mapInPandas(_onsets, schema)


def audio_fingerprint(media: DataFrame, window_bytes: int = 16, n_bits: int = 32) -> DataFrame:
    """Energy-trend audio fingerprint over the REAL WAV payloads: the
    sign of consecutive window-energy deltas, packed into ``n_bits``
    bits — the miniature of Shazam-style spectral-trend hashing, here
    on exact integer energies so the DuckDB oracle replays every bit.
    Clips shorter than n_bits+1 windows pad with zero-energy windows
    (a deterministic rule both engines state identically). Zero
    shuffle: one fingerprint per clip, computed in the decode task."""

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, mtype, blob in zip(
                b["media_id"], b["media_type"], b["content"]
            ):
                if mtype != "audio":
                    continue
                body = np.frombuffer(bytes(blob)[16:], dtype=np.uint8).astype(
                    np.int64
                )
                energies = []
                for w in range(n_bits + 1):
                    seg = body[w * window_bytes : (w + 1) * window_bytes]
                    energies.append(int((seg * seg).sum()))
                fp = 0
                for w in range(n_bits):
                    if energies[w + 1] > energies[w]:
                        fp |= 1 << w
                rows.append({"media_id": int(mid), "fp": fp})
            yield pd.DataFrame(rows, columns=["media_id", "fp"])

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("fp", LongType()),
        ]
    )
    return media.mapInPandas(_fp, schema)


def fingerprint_frame(docs: DataFrame) -> DataFrame:
    """ONE decode pass over all three modalities for the given docs
    frame -> unified fingerprint rows (kind, media_id, frame_idx, h1,
    h2): image dHash halves, per-frame video dHash halves, and the
    32-bit audio energy-trend fingerprint in h1 (h2 = 0, frame_idx = 0
    for whole-object fingerprints).

    r12 shape: one spread + ONE fused Arrow stage computing all three
    modalities per input row, instead of three parallel
    build→decode pipelines unioned (3 scans + 3 id shuffles + 6
    JVM↔Python crossings, and every payload serialized through Arrow
    between its build and decode stage). The per-row arithmetic is the
    SAME builder/decoder/dhash functions, so the row set is identical
    (equivalence test pins it); payloads now live only transiently
    inside the Python worker, never in an Arrow batch. Shared by the
    full manifest build (queries/multimodal.py: fingerprint_manifest)
    and the log-driven incremental refresh (sinks/txlog.py:
    refresh_media_fingerprints), which feeds it ONLY the files
    appended since the last refresh — at 100 TB an ingest batch pays
    its own decode, never a rescan."""
    from sandbox_data_pipeline_spark.operators.jpeg import (
        build_jpeg,
        decode_jpeg,
        dhash_halves,
    )
    from sandbox_data_pipeline_spark.operators.video import (
        build_avi,
        decode_avi,
    )

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in chunked_pdfs(batches):
            kinds: list[str] = []
            mids: list[int] = []
            fidx: list[int] = []
            h1s: list[int] = []
            h2s: list[int] = []

            def emit(kind: str, mid: int, f: int, h1: int, h2: int) -> None:
                kinds.append(kind)
                mids.append(mid)
                fidx.append(f)
                h1s.append(h1)
                h2s.append(h2)

            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                d = decode_jpeg(build_jpeg(did))
                h1, h2 = dhash_halves(d["pixels"], d["width"], d["height"])
                emit("image", did, 0, h1, h2)
                v = decode_avi(build_avi(did))
                for f, px in enumerate(v["frames"]):
                    h1, h2 = dhash_halves(px, v["width"], v["height"])
                    emit("video", did, f, h1, h2)
                if did % 3 == 1:
                    # the WAV rows of media_with_headers: fingerprint
                    # reads blob[16:], which is exactly the utf-8 body
                    # (16-byte RIFF preamble) — same windows, same
                    # integer energies, same packed trend bits as
                    # audio_fingerprint's defaults
                    body = np.frombuffer(
                        str(text).encode("utf-8"), dtype=np.uint8
                    ).astype(np.int64)
                    energies = []
                    for w in range(32 + 1):
                        seg = body[w * 16 : (w + 1) * 16]
                        energies.append(int((seg * seg).sum()))
                    fp = 0
                    for w in range(32):
                        if energies[w + 1] > energies[w]:
                            fp |= 1 << w
                    emit("audio", did, 0, fp, 0)
            yield pd.DataFrame(
                {
                    "kind": kinds,
                    "media_id": pd.array(mids, dtype="int64"),
                    "frame_idx": pd.array(fidx, dtype="int32"),
                    "h1": pd.array(h1s, dtype="int64"),
                    "h2": pd.array(h2s, dtype="int64"),
                }
            )

    schema = StructType(
        [
            StructField("kind", StringType()),
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("h1", LongType()),
            StructField("h2", LongType()),
        ]
    )
    return spread_for_expansion(docs.select("doc_id", "text")).mapInPandas(
        _fp, schema
    )
