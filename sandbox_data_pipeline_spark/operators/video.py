"""REAL Motion-JPEG AVI container codec (pure stdlib) + Spark frame ops.

Completes the multimodal family's video axis: where `operators/
multimodal.py: sample_frames` models frame sampling over opaque bytes,
this module makes it REAL end-to-end — a genuine RIFF/AVI container
(the public Microsoft 'AVI RIFF File Reference' layout: RIFF('AVI ')
→ LIST hdrl(avih, LIST strl(strh 'vids'/'MJPG', strf
BITMAPINFOHEADER)) → LIST movi('00dc' chunks) → idx1), each '00dc'
frame a genuine baseline JPEG decoded by `operators/jpeg.py`'s real
Huffman/IDCT machinery. The reference pipeline treats fetched payloads
as opaque bytes the ingest must not choke on
(dags/sandbox_data_pipeline.py); at 100 TB the dominant video ask is
shot-boundary detection for frame-dedup, which is exactly the
inter-frame delta this computes.

Builder frames are 8x8-tiled with values a closed form of
(doc_id, frame, block) and DC-exact quantization, so a DuckDB oracle
can state every frame's pixel sum and every inter-frame |delta| even
though each frame went through real entropy coding and the container
through real RIFF chunking (even-byte padding rules included).

Scale design: one video per row rides an Arrow-batched `mapInPandas`;
frame stats explode rows at most x4 (bounded by the frame count), and
the inter-frame delta is computed inside the same map task while the
previous frame's raster is still in hand — the whole frame-stats path
is a single narrow stage with ZERO shuffle.
"""

from __future__ import annotations

import struct
from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from sandbox_data_pipeline_spark.operators.jpeg import (
    build_jpeg_tiles,
    decode_jpeg,
    jpeg_dims,
)

AVIIF_KEYFRAME = 0x10


def video_n_frames(doc_id: int) -> int:
    return doc_id % 3 + 2


def video_tile_value(doc_id: int, frame: int, block_idx: int) -> int:
    return (doc_id * 11 + frame * 53 + block_idx * 37) % 256


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def build_avi(doc_id: int) -> bytes:
    """Valid RIFF/AVI with 2-4 MJPG '00dc' frames + idx1 index."""
    w, h = jpeg_dims(doc_id)
    nb = (w // 8) * (h // 8)
    nf = video_n_frames(doc_id)
    frames = [
        build_jpeg_tiles(
            w, h, [video_tile_value(doc_id, f, i) for i in range(nb)]
        )
        for f in range(nf)
    ]

    # avih: 56-byte main header (all dword fields, little-endian)
    avih = struct.pack(
        "<14I",
        40_000,  # dwMicroSecPerFrame (25 fps)
        0,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        nf,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max(len(fr) for fr in frames),  # dwSuggestedBufferSize
        w,
        h,
        0,
        0,
        0,
        0,  # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIi4H",
            0,  # dwFlags
            0,
            0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            25,  # dwRate
            0,  # dwStart
            nf,  # dwLength (frames)
            max(len(fr) for fr in frames),  # dwSuggestedBufferSize
            0,  # dwQuality
            0,  # dwSampleSize
            0,
            0,
            w,
            h,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        w,
        h,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        w * h * 3,  # biSizeImage
        0,
        0,
        0,
        0,
    )
    strl = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)

    movi_payload = b"movi"
    idx_entries = []
    for fr in frames:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx_entries.append((len(movi_payload) - 4, len(fr)))
        movi_payload += _chunk(b"00dc", fr)
    movi = _chunk(b"LIST", movi_payload)
    idx1 = b"".join(
        b"00dc" + struct.pack("<III", AVIIF_KEYFRAME, off, size)
        for off, size in idx_entries
    )
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(blob: bytes) -> dict[str, Any]:
    """Walk the RIFF tree (even-padding rules), validate the MJPG
    headers, JPEG-decode every '00dc' frame, and return dims + frame
    rasters. Header/frame disagreements raise loudly — a container
    whose declared geometry differs from its decoded frames is
    corrupt, not 'close enough'."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    total = struct.unpack("<I", blob[4:8])[0]
    if 8 + total > len(blob):
        raise ValueError("truncated AVI: RIFF size overruns blob")

    declared: dict[str, int] = {}
    frames: list[dict[str, Any]] = []
    n_idx = 0

    def walk(pos: int, end: int) -> None:
        nonlocal n_idx
        while pos + 8 <= end:
            fourcc = blob[pos : pos + 4]
            size = struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
            payload_start = pos + 8
            if payload_start + size > end:
                raise ValueError(f"truncated AVI: chunk {fourcc!r} overruns")
            if fourcc == b"LIST":
                walk(payload_start + 4, payload_start + size)
            elif fourcc == b"avih":
                vals = struct.unpack("<14I", blob[payload_start : payload_start + 56])
                declared.update(n_frames=vals[4], width=vals[8], height=vals[9])
            elif fourcc == b"strh":
                if blob[payload_start : payload_start + 4] != b"vids":
                    raise NotImplementedError("non-video AVI stream")
                if blob[payload_start + 4 : payload_start + 8] != b"MJPG":
                    raise NotImplementedError("non-MJPG AVI codec")
            elif fourcc == b"00dc":
                frames.append(decode_jpeg(blob[payload_start : payload_start + size]))
            elif fourcc == b"idx1":
                n_idx = size // 16
            pos = payload_start + size + (size % 2)

    walk(12, 8 + total)
    if not declared:
        raise ValueError("AVI missing avih header")
    if len(frames) != declared["n_frames"]:
        raise ValueError(
            f"AVI declares {declared['n_frames']} frames, found {len(frames)}"
        )
    for fr in frames:
        if (fr["width"], fr["height"]) != (declared["width"], declared["height"]):
            raise ValueError("frame dims disagree with avih header")
    return {
        "width": declared["width"],
        "height": declared["height"],
        "n_frames": len(frames),
        "n_idx": n_idx,
        "frames": [fr["pixels"] for fr in frames],
    }


# --- Spark surface -----------------------------------------------------------

VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("sum_px", LongType()),
        StructField("delta_px", LongType()),
    ]
)


def avi_media(docs: DataFrame) -> DataFrame:
    """One real Motion-JPEG AVI payload per document (Arrow-batched)."""
    import pandas as pd

    from sandbox_data_pipeline_spark.operators.multimodal import (
        chunked_pdfs,
        spread_for_expansion,
    )

    def _build(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        # chunked: bounded payload frames per yield (see chunked_pdfs)
        for b in chunked_pdfs(batches):
            yield pd.DataFrame(
                {
                    "media_id": b["doc_id"],
                    "content": [build_avi(int(d)) for d in b["doc_id"]],
                }
            )

    schema = StructType(
        [StructField("media_id", LongType()), StructField("content", BinaryType())]
    )
    return spread_for_expansion(docs.select("doc_id")).mapInPandas(
        _build, schema
    )


def video_frame_stats(media: DataFrame) -> DataFrame:
    """REAL container+codec decode → one row per frame: exact pixel
    sum and the exact inter-frame |delta| sum (delta_px = 0 for frame
    0 — the scene-cut primitive, computed map-side so no shuffle)."""
    import pandas as pd

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            rows = []
            for mid, blob in zip(b["media_id"], b["content"]):
                d = decode_avi(bytes(blob))
                prev = None
                for f, px in enumerate(d["frames"]):
                    delta = (
                        0
                        if prev is None
                        else sum(abs(a - b_) for a, b_ in zip(px, prev))
                    )
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_idx": f,
                            "width": d["width"],
                            "height": d["height"],
                            "n_frames": d["n_frames"],
                            "sum_px": sum(px),
                            "delta_px": delta,
                        }
                    )
                    prev = px
            yield pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_FRAME_SCHEMA.fields]
            )

    return media.mapInPandas(_decode, VIDEO_FRAME_SCHEMA)


def video_frame_dhash(media: DataFrame) -> DataFrame:
    """Per-frame perceptual fingerprint: REAL container walk + JPEG
    decode, then the 9x8 difference hash (operators/jpeg.py:
    dhash_halves) per frame — the clip-matching front end: two videos
    sharing several near-identical frames are near-dup clips even when
    re-encoded. One narrow Arrow stage, zero shuffle."""
    import pandas as pd

    from sandbox_data_pipeline_spark.operators.jpeg import dhash_halves

    def _hash(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            rows = []
            for mid, blob in zip(b["media_id"], b["content"]):
                d = decode_avi(bytes(blob))
                for f, px in enumerate(d["frames"]):
                    h1, h2 = dhash_halves(px, d["width"], d["height"])
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_idx": f,
                            "h1": h1,
                            "h2": h2,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "h1", "h2"]
            )

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("h1", LongType()),
            StructField("h2", LongType()),
        ]
    )
    return media.mapInPandas(_hash, schema)
