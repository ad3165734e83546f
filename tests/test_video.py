"""Motion-JPEG AVI container tests (operators/video.py)."""

from __future__ import annotations

import struct

import pytest

from sandbox_data_pipeline_spark.operators.jpeg import jpeg_dims
from sandbox_data_pipeline_spark.operators.video import (
    avi_media,
    build_avi,
    decode_avi,
    video_frame_stats,
    video_n_frames,
    video_tile_value,
)


def test_container_roundtrip_every_frame_exact():
    for did in (0, 1, 5, 7, 11, 23):
        d = decode_avi(build_avi(did))
        w, h = jpeg_dims(did)
        nf = video_n_frames(did)
        assert (d["width"], d["height"], d["n_frames"], d["n_idx"]) == (
            w,
            h,
            nf,
            nf,
        )
        bx, nb = w // 8, (w // 8) * (h // 8)
        for f, px in enumerate(d["frames"]):
            assert len(px) == w * h
            for bi in range(nb):
                y0, x0 = (bi // bx) * 8, (bi % bx) * 8
                v = video_tile_value(did, f, bi)
                assert all(
                    px[(y0 + yy) * w + (x0 + xx)] == v
                    for yy in range(8)
                    for xx in range(8)
                )


def test_riff_padding_is_honored():
    # odd-length JPEG frames force the even-padding rule in both the
    # writer and the walker; decode must survive for a span of ids
    # (frame payload parity varies with content)
    for did in range(16):
        assert decode_avi(build_avi(did))["n_frames"] == video_n_frames(did)


def test_decode_rejects_corruption():
    with pytest.raises(ValueError):
        decode_avi(b"RIFX" + b"\x00" * 32)
    blob = bytearray(build_avi(3))
    # declared frame count no longer matches the movi chunks
    avih_at = blob.index(b"avih") + 8
    n = struct.unpack("<I", blob[avih_at + 16 : avih_at + 20])[0]
    blob[avih_at + 16 : avih_at + 20] = struct.pack("<I", n + 1)
    with pytest.raises(ValueError):
        decode_avi(bytes(blob))
    # truncation inside movi
    with pytest.raises(ValueError):
        decode_avi(bytes(build_avi(3))[:-40])


def test_non_mjpg_stream_rejected():
    blob = bytearray(build_avi(2))
    at = blob.index(b"MJPG")
    blob[at : at + 4] = b"H264"
    with pytest.raises(NotImplementedError):
        decode_avi(bytes(blob))


def test_spark_frame_stats_match_closed_form(spark, sf_dir):
    from sandbox_data_pipeline_spark.catalog import table

    docs = table(spark, sf_dir, "documents").limit(12)
    rows = video_frame_stats(avi_media(docs)).collect()
    assert rows
    for r in rows:
        did, f = r["media_id"], r["frame_idx"]
        w, h = jpeg_dims(did)
        nb = (w // 8) * (h // 8)
        assert (r["width"], r["height"], r["n_frames"]) == (
            w,
            h,
            video_n_frames(did),
        )
        assert r["sum_px"] == 64 * sum(
            video_tile_value(did, f, i) for i in range(nb)
        )
        exp_delta = (
            0
            if f == 0
            else 64
            * sum(
                abs(
                    video_tile_value(did, f, i)
                    - video_tile_value(did, f - 1, i)
                )
                for i in range(nb)
            )
        )
        assert r["delta_px"] == exp_delta
    # every media contributes exactly n_frames rows
    by_media: dict[int, int] = {}
    for r in rows:
        by_media[r["media_id"]] = by_media.get(r["media_id"], 0) + 1
    assert all(
        cnt == video_n_frames(mid) for mid, cnt in by_media.items()
    )


def test_frame_dhash_matches_pure_python(spark, sf_dir):
    from sandbox_data_pipeline_spark.catalog import table
    from sandbox_data_pipeline_spark.operators.jpeg import dhash_halves
    from sandbox_data_pipeline_spark.operators.video import video_frame_dhash

    docs = table(spark, sf_dir, "documents").limit(8)
    got = {
        (r["media_id"], r["frame_idx"]): (r["h1"], r["h2"])
        for r in video_frame_dhash(avi_media(docs)).collect()
    }
    assert got
    for (did, fi), h in got.items():
        d = decode_avi(build_avi(did))
        assert h == dhash_halves(d["frames"][fi], d["width"], d["height"])
    # frame counts line up with the builder
    by_media = {}
    for (did, fi) in got:
        by_media.setdefault(did, set()).add(fi)
    for did, fis in by_media.items():
        assert fis == set(range(video_n_frames(did)))
