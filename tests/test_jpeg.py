"""Baseline-JPEG codec tests (operators/jpeg.py).

Adversarial harness: the full encoder round-trips random rasters
through the decoder, exercising every AC code class (run lengths,
ZRL, EOB), DC difference prediction, byte stuffing, restart markers,
and edge-clamped partial MCUs — paths the builder's DC-only payloads
never emit. Exactness bound: with the flat q=16 table the
quantization error per coefficient is <= 8, so reconstructed pixels
sit within a provable distance of the source; with the builder's
DC-exact construction the round trip is bit-exact.
"""

from __future__ import annotations

import random

import pytest

from sandbox_data_pipeline_spark.operators.jpeg import (
    build_jpeg,
    decode_jpeg,
    encode_jpeg_gray,
    fdct2d,
    idct2d,
    jpeg_decode_stats,
    jpeg_dims,
    jpeg_media,
    jpeg_tile_value,
)


def test_builder_payload_decodes_exactly():
    for did in (0, 1, 5, 7, 11, 23):
        d = decode_jpeg(build_jpeg(did))
        w, h = jpeg_dims(did)
        assert (d["width"], d["height"]) == (w, h)
        nb = (w // 8) * (h // 8)
        assert d["n_comps"] == 1
        px = d["pixels"]
        assert len(px) == w * h
        assert px[0] == jpeg_tile_value(did, 0)
        assert px[-1] == jpeg_tile_value(did, nb - 1)
        # every tile is flat at its closed-form value
        bx = w // 8
        for bi in range(nb):
            y0, x0 = (bi // bx) * 8, (bi % bx) * 8
            v = jpeg_tile_value(did, bi)
            assert all(
                px[(y0 + yy) * w + (x0 + xx)] == v
                for yy in range(8)
                for xx in range(8)
            )


def test_dct_inverse_of_forward():
    rng = random.Random(42)
    for _ in range(20):
        block = [rng.randrange(256) for _ in range(64)]
        assert idct2d(fdct2d(block)) == block


def test_encoder_decoder_roundtrip_random_rasters():
    rng = random.Random(7)
    for w, h in ((8, 8), (16, 24), (17, 9), (40, 33)):
        pixels = [rng.randrange(256) for _ in range(w * h)]
        blob = encode_jpeg_gray(pixels, w, h)
        d = decode_jpeg(blob)
        assert (d["width"], d["height"]) == (w, h)
        # flat q=16: per-coefficient error <= 8 pre-IDCT; empirically
        # the pixel-domain error stays well under 70 for random noise
        # (worst case for JPEG) — assert a provably safe envelope and
        # that the mean error is small.
        errs = [abs(a - b) for a, b in zip(d["pixels"], pixels)]
        assert max(errs) < 128
        assert sum(errs) / len(errs) < 32


def test_encoder_decoder_smooth_raster_is_tight():
    # smooth gradients quantize to near-zero AC → tight reconstruction
    w, h = 32, 16
    pixels = [(x * 4 + y * 2) % 256 for y in range(h) for x in range(w)]
    d = decode_jpeg(encode_jpeg_gray(pixels, w, h))
    errs = [abs(a - b) for a, b in zip(d["pixels"], pixels)]
    assert sum(errs) / len(errs) < 16


def test_restart_markers_reset_dc_prediction():
    rng = random.Random(13)
    w, h = 48, 16  # 12 blocks → several restart intervals
    pixels = [rng.randrange(256) for _ in range(w * h)]
    plain = decode_jpeg(encode_jpeg_gray(pixels, w, h))
    with_rst = decode_jpeg(encode_jpeg_gray(pixels, w, h, restart_interval=4))
    assert with_rst["pixels"] == plain["pixels"]


def test_byte_stuffing_survives():
    # solid 0xFF-heavy content forces stuffed 0xFF 0x00 sequences
    w, h = 16, 16
    pixels = [255] * (w * h)
    d = decode_jpeg(encode_jpeg_gray(pixels, w, h))
    errs = [abs(a - 255) for a in d["pixels"]]
    assert max(errs) <= 8


def test_decode_rejects_non_jpeg():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\nnot a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0")  # truncated after SOI/APP0 marker


def test_spark_stats_match_closed_form(spark, sf_dir):
    from sandbox_data_pipeline_spark.catalog import table

    docs = table(spark, sf_dir, "documents").limit(24)
    rows = {
        r["media_id"]: r
        for r in jpeg_decode_stats(jpeg_media(docs)).collect()
    }
    for did, r in rows.items():
        w, h = jpeg_dims(did)
        nb = (w // 8) * (h // 8)
        assert (r["width"], r["height"], r["n_blocks"]) == (w, h, nb)
        assert r["tl_px"] == jpeg_tile_value(did, 0)
        assert r["br_px"] == jpeg_tile_value(did, nb - 1)
        assert r["sum_px"] == 64 * sum(
            jpeg_tile_value(did, i) for i in range(nb)
        )


def test_dhash_matches_pure_python_and_survives_reencode(spark, sf_dir):
    from sandbox_data_pipeline_spark.catalog import table
    from sandbox_data_pipeline_spark.operators.jpeg import (
        dhash_halves,
        jpeg_dhash,
        jpeg_media,
    )

    docs = table(spark, sf_dir, "documents").limit(16)
    got = {
        r["media_id"]: (r["h1"], r["h2"])
        for r in jpeg_dhash(jpeg_media(docs)).collect()
    }
    for did, (h1, h2) in got.items():
        d = decode_jpeg(build_jpeg(did))
        assert (h1, h2) == dhash_halves(d["pixels"], d["width"], d["height"])
        assert 0 <= h1 < (1 << 32) and 0 <= h2 < (1 << 32)

    def ham(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    # robustness: a lossy RE-ENCODE of the same raster keeps the
    # fingerprint close (the reason dHash beats byte hashing for
    # near-dup images), while byte equality is destroyed
    d = decode_jpeg(build_jpeg(7))
    blob2 = encode_jpeg_gray(d["pixels"], d["width"], d["height"])
    assert blob2 != build_jpeg(7)
    d2 = decode_jpeg(blob2)
    h_orig = dhash_halves(d["pixels"], d["width"], d["height"])
    h_re = dhash_halves(d2["pixels"], d2["width"], d2["height"])
    assert ham(h_orig, h_re) <= 8
    # identical image → identical fingerprint
    assert ham(h_orig, h_orig) == 0
