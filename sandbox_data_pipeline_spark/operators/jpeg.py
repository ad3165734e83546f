"""REAL baseline JPEG codec (pure stdlib) + Arrow-batched Spark ops.

Completes the codec family (BMP/PNG/GIF/WAV in operators/multimodal.py)
with the one format every web-scraped multimodal corpus is dominated
by. Everything here is written from the public JPEG spec (ITU-T T.81):
marker segments, DQT/DHT parsing, canonical Huffman decode, DC
difference coding, zig-zag order, dequantization, separable 2-D IDCT,
level shift — no image library involved (none is installed in this
environment; the point of the reference's pipeline is that ingest
still must not choke on binary payloads, dags/sandbox_data_pipeline.py
treats fetched payloads as opaque bytes the same way).

Builder payloads are 8x8-tile images whose tile values are a closed
form of (doc_id, block_index), quantized with Q[0]=8 so the DC-only
blocks reconstruct EXACTLY (dc = 8*(v-128) is divisible by the 1/8
IDCT normalization) — which is what lets a DuckDB oracle state the
decoded pixels in closed form even though the bitstream went through
real Huffman entropy coding and byte stuffing.

The decoder is general baseline (not builder-shaped): arbitrary
quant/huffman tables, grayscale or 4:4:4 color, restart markers,
partial edge MCUs, AC run-length with ZRL — validated in tests by
round-tripping random coefficient blocks through a forward DCT.
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

# --- constants from the public spec (ITU-T T.81 / Annex K) -------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3 typical tables: (BITS[1..16], HUFFVAL)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) via the spec's canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value, for the bit-at-a-time decoder."""
    return {
        (length, code): v for v, (code, length) in _canonical_codes(bits, vals).items()
    }


# 1-D IDCT basis: COS[u][x] = c(u)/2 * cos((2x+1) u pi / 16)
import math

_COS = [
    [
        (math.sqrt(0.5) if u == 0 else 1.0) / 2.0 * math.cos((2 * x + 1) * u * math.pi / 16.0)
        for x in range(8)
    ]
    for u in range(8)
]


def idct2d(coefs: list[float]) -> list[int]:
    """Separable 2-D inverse DCT of one 8x8 block (natural order in,
    level-shifted clamped pixels out). Float64 cosine basis; for a
    DC-only block whose DC is a multiple of 8 the result is exact
    (dc/8 is an integer), which the builder exploits."""
    tmp = [0.0] * 64
    for y in range(8):
        row = coefs[8 * y : 8 * y + 8]
        for x in range(8):
            tmp[8 * y + x] = sum(row[u] * _COS[u][x] for u in range(8))
    out = [0] * 64
    for x in range(8):
        col = [tmp[8 * v + x] for v in range(8)]
        for y in range(8):
            s = sum(col[v] * _COS[v][y] for v in range(8))
            p = int(round(s)) + 128
            out[8 * y + x] = 0 if p < 0 else (255 if p > 255 else p)
    return out


def fdct2d(pixels: list[int]) -> list[float]:
    """Forward DCT (test harness for the decoder — not used on the
    encode hot path, whose blocks are DC-only by construction)."""
    shifted = [p - 128 for p in pixels]
    tmp = [0.0] * 64
    for y in range(8):
        for u in range(8):
            tmp[8 * y + u] = sum(
                shifted[8 * y + x] * _COS[u][x] for x in range(8)
            )
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            out[8 * v + u] = sum(tmp[8 * y + u] * _COS[v][y] for y in range(8))
    return out


# --- bit IO ------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.buf)


class _BitReader:
    """MSB-first reader over entropy-coded data with byte unstuffing;
    stops at any non-stuffed marker (caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated entropy stream")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = nxt
                raise _AtMarker()
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self._n = 0
        self._acc = 0


class _AtMarker(Exception):
    pass


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t raw bits to the signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid huffman code")


# --- builder (deterministic grayscale payloads) ------------------------------


def jpeg_dims(doc_id: int) -> tuple[int, int]:
    return 8 * (doc_id % 4 + 2), 8 * (doc_id % 3 + 2)


def jpeg_tile_value(doc_id: int, block_idx: int) -> int:
    return (doc_id * 11 + block_idx * 37) % 256


_Q_BUILD = [8] + [16] * 63  # Q[0]=8 makes DC reconstruction exact


def build_jpeg(doc_id: int) -> bytes:
    """Valid baseline JFIF, grayscale, one constant-valued 8x8 tile
    per block: real DC-difference Huffman coding (Annex K tables),
    real byte stuffing, zero ACs (EOB per block)."""
    w, h = jpeg_dims(doc_id)
    nb = (w // 8) * (h // 8)
    return build_jpeg_tiles(w, h, [jpeg_tile_value(doc_id, i) for i in range(nb)])


def build_jpeg_tiles(w: int, h: int, values: list[int]) -> bytes:
    """DC-exact tiled JFIF from explicit per-block values (one flat
    8x8 tile per value) — the shared builder behind single images
    (build_jpeg) and Motion-JPEG video frames (operators/video.py)."""
    bx, by = w // 8, h // 8
    dc_codes = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_codes = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    bw = _BitWriter()
    prev_dc = 0
    for i in range(bx * by):
        v = values[i]
        dc = v - 128  # quantized DC: 8*(v-128) / Q[0]=8
        diff = dc - prev_dc
        prev_dc = dc
        t = diff if diff >= 0 else -diff
        size = t.bit_length()
        code, length = dc_codes[size]
        bw.put(code, length)
        if size:
            raw = diff if diff >= 0 else diff + (1 << size) - 1
            bw.put(raw, size)
        eob, eob_len = ac_codes[0x00]
        bw.put(eob, eob_len)
    scan = bw.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(jfif)) + jfif
    # DQT payload is in zig-zag order: element k is Q[zigzag[k]]
    qt = bytes(_Q_BUILD[ZIGZAG[k]] for k in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + qt
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for cls, bits, vals in (
        (0x00, DC_LUM_BITS, DC_LUM_VALS),
        (0x10, AC_LUM_BITS, AC_LUM_VALS),
    ):
        payload = bytes([cls]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- general baseline decoder ------------------------------------------------


def decode_jpeg(blob: bytes) -> dict[str, Any]:
    """Parse markers, entropy-decode every MCU, dequantize, IDCT, and
    return dims + the full pixel raster (grayscale: one plane; 4:4:4
    color: interleaved RGB after the standard YCbCr transform).
    Progressive (SOF2) and subsampled scans are rejected loudly —
    silent wrong pixels are worse than a typed error."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict[str, int]] = []
    w = h = 0
    restart_interval = 0
    while pos < len(blob):
        if blob[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        while pos < len(blob) and blob[pos] == 0xFF and blob[pos + 1] == 0xFF:
            pos += 1  # fill bytes
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > len(blob):
            raise ValueError(f"truncated JPEG: marker {marker:#x} has no length")
        seglen = struct.unpack(">H", blob[pos : pos + 2])[0]
        if pos + seglen > len(blob):
            raise ValueError(f"truncated JPEG: segment {marker:#x} overruns blob")
        seg = blob[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq:
                    vals = list(
                        struct.unpack(f">{64}H", seg[i : i + 128])
                    )
                    i += 128
                else:
                    vals = list(seg[i : i + 64])
                    i += 64
                nat = [0] * 64
                for k in range(64):
                    nat[ZIGZAG[k]] = vals[k]
                qtables[tq] = nat
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                htables[(cls, tid)] = _decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            _, h, w, nc = struct.unpack(">BHHB", seg[:6])
            comps = []
            for ci in range(nc):
                cid, samp, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:
                    raise NotImplementedError(
                        f"subsampling {samp:#x} not supported (4:4:4 only)"
                    )
                comps.append({"id": cid, "tq": tq})
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG (SOF2) not supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows the segment
            ns = seg[0]
            scan_comps = []
            for ci in range(ns):
                cid, tt = seg[1 + 2 * ci], seg[2 + 2 * ci]
                comp = next(c for c in comps if c["id"] == cid)
                scan_comps.append(
                    {"tq": comp["tq"], "td": tt >> 4, "ta": tt & 0x0F}
                )
            pos += seglen
            return _decode_scan(
                blob, pos, w, h, scan_comps, qtables, htables, restart_interval
            )
        pos += seglen
    raise ValueError("no SOS marker found")


def _decode_scan(
    data: bytes,
    pos: int,
    w: int,
    h: int,
    scan_comps: list[dict[str, int]],
    qtables: dict[int, list[int]],
    htables: dict,
    restart_interval: int,
) -> dict[str, Any]:
    nc = len(scan_comps)
    bx, by = (w + 7) // 8, (h + 7) // 8
    planes = [[0] * (bx * 8 * by * 8) for _ in range(nc)]
    r = _BitReader(data, pos)
    prev_dc = [0] * nc
    mcu = 0
    for byi in range(by):
        for bxi in range(bx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                # drop padding bits, consume the RSTn marker, reset DC
                r.align()
                r.marker = None
                if (
                    r.pos + 1 < len(data)
                    and data[r.pos] == 0xFF
                    and 0xD0 <= data[r.pos + 1] <= 0xD7
                ):
                    r.pos += 2
                else:
                    raise ValueError(
                        f"expected RSTn at byte {r.pos} (DRI={restart_interval})"
                    )
                prev_dc = [0] * nc
            for ci, sc in enumerate(scan_comps):
                try:
                    block = _decode_block(
                        r,
                        htables[(0, sc["td"])],
                        htables[(1, sc["ta"])],
                        qtables[sc["tq"]],
                        prev_dc,
                        ci,
                    )
                except _AtMarker:
                    raise ValueError("entropy stream hit marker mid-MCU")
                px = idct2d(block)
                base_y, base_x = byi * 8, bxi * 8
                plane = planes[ci]
                for yy in range(8):
                    row = (base_y + yy) * bx * 8 + base_x
                    plane[row : row + 8] = px[8 * yy : 8 * yy + 8]
            mcu += 1
    # crop to (w, h) and color-transform if 3 components
    if nc == 1:
        pixels = [
            planes[0][y * bx * 8 + x] for y in range(h) for x in range(w)
        ]
        return {"width": w, "height": h, "n_comps": 1, "pixels": pixels}
    if nc == 3:
        rgb = []
        stride = bx * 8
        for y in range(h):
            for x in range(w):
                Y = planes[0][y * stride + x]
                Cb = planes[1][y * stride + x] - 128
                Cr = planes[2][y * stride + x] - 128
                for val in (
                    Y + 1.402 * Cr,
                    Y - 0.344136 * Cb - 0.714136 * Cr,
                    Y + 1.772 * Cb,
                ):
                    iv = int(round(val))
                    rgb.append(0 if iv < 0 else (255 if iv > 255 else iv))
        return {"width": w, "height": h, "n_comps": 3, "pixels": rgb}
    raise NotImplementedError(f"{nc}-component scan not supported")


def _decode_block(
    r: _BitReader,
    dc_tab: dict,
    ac_tab: dict,
    q: list[int],
    prev_dc: list[int],
    ci: int,
) -> list[float]:
    coefs = [0.0] * 64
    t = _huff_decode(r, dc_tab)
    diff = _extend(r.bits(t), t) if t else 0
    dc = prev_dc[ci] + diff
    prev_dc[ci] = dc
    coefs[0] = dc * q[0]
    k = 1
    while k < 64:
        rs = _huff_decode(r, ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        coefs[ZIGZAG[k]] = _extend(r.bits(size), size) * q[ZIGZAG[k]]
        k += 1
    return coefs


# --- Spark surface -----------------------------------------------------------

JPEG_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_blocks", IntegerType()),
        StructField("tl_px", IntegerType()),
        StructField("br_px", IntegerType()),
        StructField("sum_px", LongType()),
        StructField("scan_bytes", IntegerType()),
    ]
)


def jpeg_media(docs: DataFrame) -> DataFrame:
    """One real JPEG payload per document (Arrow-batched builder)."""
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
                    "content": [build_jpeg(int(d)) for d in b["doc_id"]],
                }
            )

    schema = StructType(
        [StructField("media_id", LongType()), StructField("content", BinaryType())]
    )
    return spread_for_expansion(docs.select("doc_id")).mapInPandas(
        _build, schema
    )


def jpeg_decode_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode of JPEG payloads → pixel statistics
    (dims, corner pixels, exact pixel sum, entropy-coded byte count)."""
    import pandas as pd

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            rows = []
            for mid, blob in zip(b["media_id"], b["content"]):
                blob = bytes(blob)
                d = decode_jpeg(blob)
                w, h, px = d["width"], d["height"], d["pixels"]
                sos = blob.index(b"\xff\xda")
                seglen = struct.unpack(">H", blob[sos + 2 : sos + 4])[0]
                scan_bytes = len(blob) - (sos + 2 + seglen) - 2
                rows.append(
                    {
                        "media_id": int(mid),
                        "width": w,
                        "height": h,
                        "n_blocks": (w // 8) * (h // 8),
                        "tl_px": px[0],
                        "br_px": px[-1],
                        "sum_px": sum(px),
                        "scan_bytes": scan_bytes,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in JPEG_STATS_SCHEMA.fields]
            )

    return media.mapInPandas(_decode, JPEG_STATS_SCHEMA)


# --- general grayscale encoder (full AC run-length path) ---------------------


def encode_jpeg_gray(
    pixels: list[int],
    w: int,
    h: int,
    qtable: list[int] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Full baseline encoder for arbitrary grayscale rasters: forward
    DCT per (edge-clamped) 8x8 block, quantization, zig-zag, DC
    difference + AC run-length/ZRL/EOB Huffman coding, optional DRI/
    RSTn. This is the transcode path (and the decoder's adversarial
    test harness — random rasters exercise every AC code class the
    builder's DC-only payloads never emit)."""
    q = qtable or [16] * 64
    bx, by = (w + 7) // 8, (h + 7) // 8
    dc_codes = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_codes = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    chunks: list[bytes] = []
    bw = _BitWriter()
    prev_dc = 0
    mcu = 0
    n_rst = 0
    for byi in range(by):
        for bxi in range(bx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                chunks.append(bw.flush())
                chunks.append(bytes([0xFF, 0xD0 + (n_rst % 8)]))
                n_rst += 1
                bw = _BitWriter()
                prev_dc = 0
            block = [
                pixels[min(byi * 8 + yy, h - 1) * w + min(bxi * 8 + xx, w - 1)]
                for yy in range(8)
                for xx in range(8)
            ]
            coefs = fdct2d(block)
            zz = [
                int(round(coefs[ZIGZAG[k]] / q[ZIGZAG[k]])) for k in range(64)
            ]
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            t = abs(diff).bit_length()
            code, length = dc_codes[t]
            bw.put(code, length)
            if t:
                raw = diff if diff >= 0 else diff + (1 << t) - 1
                bw.put(raw, t)
            run = 0
            last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
            for k in range(1, last_nz + 1):
                if zz[k] == 0:
                    run += 1
                    continue
                while run >= 16:
                    zc, zl = ac_codes[0xF0]
                    bw.put(zc, zl)
                    run -= 16
                size = abs(zz[k]).bit_length()
                cc, cl = ac_codes[(run << 4) | size]
                bw.put(cc, cl)
                raw = zz[k] if zz[k] >= 0 else zz[k] + (1 << size) - 1
                bw.put(raw, size)
                run = 0
            if last_nz < 63:
                ec, el = ac_codes[0x00]
                bw.put(ec, el)
            mcu += 1
    chunks.append(bw.flush())
    scan = b"".join(chunks)

    out = bytearray()
    out += b"\xff\xd8"
    jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(jfif)) + jfif
    qt = bytes(min(255, q[ZIGZAG[k]]) for k in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + qt
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for cls, bits, vals in (
        (0x00, DC_LUM_BITS, DC_LUM_VALS),
        (0x10, AC_LUM_BITS, AC_LUM_VALS),
    ):
        payload = bytes([cls]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


# --- perceptual hash (dHash) over REAL decoded rasters ------------------------


def dhash_halves(px: list[int], w: int, h: int) -> tuple[int, int]:
    """Difference hash on a 9x8 nearest-neighbor sample grid: bit
    (i, j) = 1 iff the sampled pixel right of (i, j) is brighter. The
    standard near-dup image fingerprint — resilient to re-encoding and
    resizing because it compares a fixed coarse grid, not raw bytes.
    Returned as two 32-bit halves (rows 0-3, rows 4-7) so both engines
    can XOR + popcount in plain signed 64-bit arithmetic."""
    vals = [
        [px[((j * h) // 8) * w + ((i * w) // 9)] for i in range(9)]
        for j in range(8)
    ]
    h1 = h2 = 0
    for j in range(8):
        for i in range(8):
            bit = 1 if vals[j][i + 1] > vals[j][i] else 0
            if j < 4:
                h1 |= bit << (j * 8 + i)
            else:
                h2 |= bit << ((j - 4) * 8 + i)
    return h1, h2


def jpeg_dhash(media: DataFrame) -> DataFrame:
    """REAL decode → perceptual fingerprint, Arrow-batched: one narrow
    stage, zero shuffle — the 100 TB image-dedup front end."""
    import pandas as pd

    def _hash(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            rows = []
            for mid, blob in zip(b["media_id"], b["content"]):
                d = decode_jpeg(bytes(blob))
                h1, h2 = dhash_halves(d["pixels"], d["width"], d["height"])
                rows.append({"media_id": int(mid), "h1": h1, "h2": h2})
            yield pd.DataFrame(
                rows, columns=["media_id", "h1", "h2"]
            )

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("h1", LongType()),
            StructField("h2", LongType()),
        ]
    )
    return media.mapInPandas(_hash, schema)
