"""Multimodal plumbing: schemas, Arrow batch shapes, stub gating."""

from __future__ import annotations

import os

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


def _png(w: int, h: int) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + b"\x08\x02\x00\x00\x00"
    )


def _jpeg(w: int, h: int) -> bytes:
    # SOI + APP0 stub + SOF0 carrying dimensions
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0"
        + (11).to_bytes(2, "big")
        + b"\x08"
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + b"\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0


def _gif(w: int, h: int) -> bytes:
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")


def test_probe_header_parses_real_containers():
    from sandbox_data_pipeline_spark.operators.multimodal import probe_header

    assert probe_header(_png(640, 480)) == ("png", 640, 480)
    assert probe_header(_jpeg(1920, 1080)) == ("jpeg", 1920, 1080)
    assert probe_header(_gif(320, 200)) == ("gif", 320, 200)
    assert probe_header(b"\x00\x00\x00\x18ftypisom") == ("mp4", None, None)
    assert probe_header(b"RIFF\x00\x00\x00\x00WAVEfmt ") == ("wav", None, None)
    assert probe_header(b"not media at all") == ("unknown", None, None)


def test_probe_media_over_binary_column(spark):
    from sandbox_data_pipeline_spark.operators.multimodal import probe_media

    rows = [
        (1, "image", _png(64, 32)),
        (2, "image", _jpeg(800, 600)),
        (3, "image", _gif(10, 20)),
        (4, "video", b"\x00\x00\x00\x18ftypisom"),
        (5, "image", b"garbage"),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, media_type string, content binary"
    )
    got = {r.media_id: (r.container, r.probed_width, r.probed_height) for r in probe_media(media).collect()}
    assert got == {
        1: ("png", 64, 32),
        2: ("jpeg", 800, 600),
        3: ("gif", 10, 20),
        4: ("mp4", None, None),
        5: ("unknown", None, None),
    }


def test_audio_windows_byte_accounting(spark, sf_dir):
    """Window byte extents tile the body exactly: contiguous, no
    overlap, summing to blob length minus the RIFF preamble."""
    from sandbox_data_pipeline_spark.catalog import table
    from sandbox_data_pipeline_spark.operators.multimodal import (
        media_with_headers,
        segment_audio,
    )

    media = media_with_headers(table(spark, sf_dir, "documents"))
    lens = {
        r["media_id"]: r["blen"]
        for r in media.where("media_type = 'audio'")
        .selectExpr("media_id", "length(content) AS blen")
        .collect()
    }
    by_media = {}
    for r in segment_audio(media).collect():
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == set(lens)
    for mid, rows in by_media.items():
        rows.sort(key=lambda r: r["window_idx"])
        assert [r["window_idx"] for r in rows] == list(range(len(rows)))
        pos = 0
        for r in rows:
            assert r["start_byte"] == pos
            assert r["start_ms"] == r["window_idx"] * 2
            pos += r["n_bytes"]
        assert pos == lens[mid] - 16  # body fully tiled, preamble excluded


def test_bmp_roundtrip_handles_padding_and_row_order():
    from sandbox_data_pipeline_spark.operators.multimodal import (
        _bmp_body_byte,
        _bmp_dims,
        build_bmp,
        decode_bmp,
    )

    # doc_id 0 → w=6: stride 20 vs 18 raw → 2 padding bytes per row
    blob = build_bmp(0)
    d = decode_bmp(blob)
    w, h = _bmp_dims(0)
    stride = ((3 * w + 3) // 4) * 4
    assert stride == 20 and (d["width"], d["height"]) == (w, h)
    # top-left image pixel = FIRST 3 bytes of the LAST file row (bottom-up)
    o = (h - 1) * stride
    assert (d["tl_b"], d["tl_g"], d["tl_r"]) == tuple(
        _bmp_body_byte(0, o + i) for i in range(3)
    )
    # bottom-right image pixel = last pixel of file row 0 — before padding
    o = 3 * (w - 1)
    assert (d["br_b"], d["br_g"], d["br_r"]) == tuple(
        _bmp_body_byte(0, o + i) for i in range(3)
    )
    # means never include the padding bytes
    raw = blob[54:]
    mean_b = sum(
        raw[r * stride + 3 * x] for r in range(h) for x in range(w)
    ) / (w * h)
    assert d["mean_b"] == round(mean_b, 4)


def test_bmp_decode_rejects_non_bmp():
    import pytest as _pytest

    from sandbox_data_pipeline_spark.operators.multimodal import decode_bmp

    with _pytest.raises(ValueError):
        decode_bmp(b"\x89PNG\r\n\x1a\nnot a bmp")


def test_bmp_resize_identity_and_downsample():
    from sandbox_data_pipeline_spark.operators.multimodal import (
        build_bmp,
        decode_bmp,
        resize_bmp,
    )

    src = build_bmp(5)
    d0 = decode_bmp(src)
    # identity resize preserves every statistic
    same = decode_bmp(resize_bmp(src, d0["width"], d0["height"]))
    assert same == d0
    # downsample to 2x2: corners are the NN-sampled source pixels
    small = decode_bmp(resize_bmp(src, 2, 2))
    assert (small["width"], small["height"]) == (2, 2)
    assert (small["tl_r"], small["tl_g"], small["tl_b"]) == (
        d0["tl_r"], d0["tl_g"], d0["tl_b"],
    )  # (0,0) samples source (0,0)


class TestPngCodec:
    def test_round_trip_matches_generator(self):
        from sandbox_data_pipeline_spark.operators.multimodal import (
            _png_dims,
            _png_px,
            build_png,
            decode_png,
        )

        for did in (0, 3, 7, 11, 22):
            d = decode_png(build_png(did))
            w, h = _png_dims(did)
            assert (d["width"], d["height"]) == (w, h)
            assert (d["tl_r"], d["tl_g"], d["tl_b"]) == _png_px(did, 0, 0)
            assert (d["br_r"], d["br_g"], d["br_b"]) == _png_px(did, w - 1, h - 1)
            assert d["n_filters"] == min(h, 5)  # every filter type fired

    def test_multi_idat_reassembly(self):
        from sandbox_data_pipeline_spark.operators.multimodal import (
            build_png,
            decode_png,
        )

        # largest geometry → compressed stream spans several 64-byte IDATs
        assert decode_png(build_png(23))["n_idat"] >= 2

    def test_crc_corruption_raises(self):
        import pytest

        from sandbox_data_pipeline_spark.operators.multimodal import (
            build_png,
            decode_png,
        )

        blob = bytearray(build_png(5))
        # flip one byte inside the first IDAT payload
        idx = blob.index(b"IDAT") + 6
        blob[idx] ^= 0xFF
        with pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(blob))

    def test_truncation_raises(self):
        import pytest

        from sandbox_data_pipeline_spark.operators.multimodal import (
            build_png,
            decode_png,
        )

        blob = build_png(5)
        with pytest.raises(ValueError):
            decode_png(blob[: len(blob) // 2])
        with pytest.raises(ValueError, match="not a PNG"):
            decode_png(b"\x00" + blob[1:])

    def test_resize_identity_is_lossless(self):
        from sandbox_data_pipeline_spark.operators.multimodal import (
            _png_dims,
            build_png,
            decode_png,
            resize_png,
        )

        did = 9
        w, h = _png_dims(did)
        orig = decode_png(build_png(did))
        same = decode_png(resize_png(build_png(did), w, h))
        for k in ("width", "height", "tl_r", "br_b", "mean_r", "mean_g", "mean_b"):
            assert orig[k] == same[k]

    def test_resize_corners_sample_correctly(self):
        from sandbox_data_pipeline_spark.operators.multimodal import (
            _png_dims,
            _png_px,
            build_png,
            decode_png,
            resize_png,
        )

        did = 14
        w, h = _png_dims(did)
        d = decode_png(resize_png(build_png(did), 6, 6))
        assert (d["tl_r"], d["tl_g"], d["tl_b"]) == _png_px(did, 0, 0)
        assert (d["br_r"], d["br_g"], d["br_b"]) == _png_px(
            did, 5 * w // 6, 5 * h // 6
        )


class TestGifCodec:
    def test_round_trip_matches_generator(self):
        from sandbox_data_pipeline_spark.operators.multimodal import (
            _gif_dims,
            _gif_index,
            _gif_palette,
            build_gif,
            decode_gif,
        )

        for did in (0, 4, 9, 13, 19):
            d = decode_gif(build_gif(did))
            w, h = _gif_dims(did)
            assert (d["width"], d["height"]) == (w, h)
            assert (d["tl_r"], d["tl_g"], d["tl_b"]) == _gif_palette(
                _gif_index(did, 0, 0)
            )
            assert (d["br_r"], d["br_g"], d["br_b"]) == _gif_palette(
                _gif_index(did, w - 1, h - 1)
            )

    def test_lzw_width_growth_and_dictionary_reset(self):
        from sandbox_data_pipeline_spark.operators.multimodal import (
            _lzw_decode,
            _lzw_encode,
        )

        # 30k pseudo-random indices: code width must grow to 12 bits
        # and the 4096-entry dictionary must reset mid-stream
        seq = [(i * 2654435761 >> 7) % 64 for i in range(30_000)]
        assert _lzw_decode(_lzw_encode(seq, 6), 6, len(seq)) == seq
        # KwKwK corner case: aaa... forces code == next_code immediately
        runs = [5] * 500
        assert _lzw_decode(_lzw_encode(runs, 6), 6, len(runs)) == runs

    def test_corruption_raises(self):
        import pytest

        from sandbox_data_pipeline_spark.operators.multimodal import (
            build_gif,
            decode_gif,
        )

        blob = build_gif(7)
        with pytest.raises(ValueError, match="not a GIF"):
            decode_gif(b"XX" + blob[2:])
        # truncate the pixel stream: LZW yields too few pixels
        with pytest.raises(ValueError):
            decode_gif(blob[:20])


def test_gif_animation_frames_roundtrip_and_keyframes(spark):
    """Multi-frame build→decode round trip: frame f's index plane is
    the frame-0 plane shifted by f*step mod 64 (proved through the
    REAL LZW codec), and the keyframe query flags frame 0 always."""
    from sandbox_data_pipeline_spark.operators.multimodal import (
        _gif_frame_step,
        build_gif,
        decode_gif,
    )
    from sandbox_data_pipeline_spark.queries.multimodal import q_gif_keyframes

    for did in (3, 7, 11):
        base = decode_gif(build_gif(did, frame=0))
        f1 = decode_gif(build_gif(did, frame=1))
        assert base["width"] == f1["width"] and base["height"] == f1["height"]
        # frame 0 is byte-identical to the single-frame payload
        assert build_gif(did, frame=0) == build_gif(did)
        assert base["pixels"] != f1["pixels"]  # the animation moves
        step = _gif_frame_step(did)
        assert step >= 1

    out = q_gif_keyframes(spark, "/root/testdata/sf0.001").collect()
    by_media: dict = {}
    for r in out:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, frames in by_media.items():
        frames.sort(key=lambda r: r["frame_idx"])
        assert frames[0]["is_key"] == 1
        assert frames[0]["sum_abs_delta"] is None
        assert len(frames) == mid % 3 + 2
        for f in frames[1:]:
            assert f["sum_abs_delta"] is not None and f["sum_abs_delta"] >= 0
            assert f["is_key"] in (0, 1)


def test_audio_onsets_match_pure_python(spark):
    """Onset energies vs a pure-Python byte walk over the same text
    bodies (REAL blob decode on the Spark side)."""
    import pandas as pd

    from sandbox_data_pipeline_spark.queries.multimodal import (
        ONSET_T,
        q_audio_onsets,
    )

    sf = "/root/testdata/sf0.001"
    pdf = pd.read_parquet(f"{sf}/documents.parquet")
    got: dict = {}
    for r in q_audio_onsets(spark, sf).collect():
        got[(r["media_id"], r["window_idx"])] = r

    n_checked = 0
    for row in pdf.itertuples():
        if row.doc_id % 3 != 1:
            continue
        body = row.text.encode()
        n_win = max(1, (len(body) + 63) // 64)
        prev = None
        for w in range(n_win):
            seg = body[w * 64 : (w + 1) * 64]
            e = sum(b * b for b in seg)
            r = got[(row.doc_id, w)]
            assert r["energy"] == e
            if prev is None:
                assert r["delta"] is None and r["is_onset"] == 1
            else:
                assert r["delta"] == e - prev
                assert r["is_onset"] == (1 if e - prev > ONSET_T else 0)
            prev = e
            n_checked += 1
    assert n_checked == len(got)  # nothing extra emitted


def test_audio_fingerprint_matches_pure_python(spark, sf_dir):
    from sandbox_data_pipeline_spark.catalog import table
    from sandbox_data_pipeline_spark.operators.multimodal import (
        audio_fingerprint,
        media_with_headers,
    )

    docs = table(spark, sf_dir, "documents").limit(30)
    got = {
        r["media_id"]: r["fp"]
        for r in audio_fingerprint(media_with_headers(docs)).collect()
    }
    assert got  # audio docs exist in the slice
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.where("doc_id % 3 = 1").collect()
    }
    for mid, fp in got.items():
        body = texts[mid].encode()
        energies = [
            sum(c * c for c in body[w * 16 : (w + 1) * 16]) for w in range(33)
        ]
        want = 0
        for w in range(32):
            if energies[w + 1] > energies[w]:
                want |= 1 << w
        assert fp == want
        assert 0 <= fp < (1 << 32)


def test_manifest_twins_match_decode_paths(spark, sf_dir):
    """The *_from_manifest probe queries must return exactly what the
    decode-every-run originals return — the manifest round-trip may
    not lose or re-type a single fingerprint bit."""
    from sandbox_data_pipeline_spark.queries.multimodal import QUERIES

    for probe, orig in (
        ("q_image_dhash_from_manifest", "q_image_dhash_dedup"),
        ("q_video_near_dup_from_manifest", "q_video_near_dup"),
    ):
        a = sorted(map(tuple, QUERIES[probe](spark, sf_dir).collect()))
        b = sorted(map(tuple, QUERIES[orig](spark, sf_dir).collect()))
        assert a == b, probe


def test_manifest_builds_once_and_probe_plan_has_no_decode(spark, sf_dir):
    """Decode-once contract: the manifest path is cached per corpus,
    and a probe query's plan contains no Python decode stage (no
    mapInPandas) — it reads parquet, partition-pruned to its
    modality."""
    import io
    from contextlib import redirect_stdout

    from sandbox_data_pipeline_spark.queries import multimodal as mm

    p1 = mm.fingerprint_manifest_path(spark, sf_dir)
    p2 = mm.fingerprint_manifest_path(spark, sf_dir)
    assert p1 == p2
    df = mm.q_image_dhash_from_manifest(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "MapInPandas" not in plan
    # modality filter prunes partitions at the scan, not post-read
    assert "kind" in plan and "image" in plan


def test_fused_fingerprint_frame_matches_three_branch_union(spark, sf_dir):
    """r12: fingerprint_frame runs all three modality decodes in ONE
    fused Arrow stage. The row set must be IDENTICAL to the original
    three-branch composition (separate build→decode pipelines per
    modality, unioned) — same builders, decoders and dhash per row, so
    any divergence is a bug."""
    from sandbox_data_pipeline_spark.catalog import table
    from sandbox_data_pipeline_spark.operators.jpeg import (
        jpeg_dhash,
        jpeg_media,
    )
    from sandbox_data_pipeline_spark.operators.multimodal import (
        audio_fingerprint,
        fingerprint_frame,
        media_with_headers,
    )
    from sandbox_data_pipeline_spark.operators.video import (
        avi_media,
        video_frame_dhash,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    fused = fingerprint_frame(docs)
    img = jpeg_dhash(jpeg_media(docs)).select(
        F.lit("image").alias("kind"),
        "media_id",
        F.lit(0).cast("int").alias("frame_idx"),
        "h1",
        "h2",
    )
    vid = video_frame_dhash(avi_media(docs)).select(
        F.lit("video").alias("kind"), "media_id", "frame_idx", "h1", "h2"
    )
    aud = audio_fingerprint(media_with_headers(docs)).select(
        F.lit("audio").alias("kind"),
        "media_id",
        F.lit(0).cast("int").alias("frame_idx"),
        F.col("fp").alias("h1"),
        F.lit(0).cast("long").alias("h2"),
    )
    ref = img.unionByName(vid).unionByName(aud)
    a = sorted(map(tuple, fused.collect()))
    b = sorted(map(tuple, ref.collect()))
    assert a == b


def test_manifest_covers_all_modalities(spark, sf_dir):
    from sandbox_data_pipeline_spark.queries.multimodal import QUERIES

    mf = QUERIES["q_media_fingerprint_manifest"](spark, sf_dir)
    kinds = {
        r["kind"]: r["n"]
        for r in mf.groupBy("kind").agg(F.count("*").alias("n")).collect()
    }
    assert set(kinds) == {"image", "video", "audio"}
    assert all(v > 0 for v in kinds.values())


def test_image_band_cap_drops_hot_buckets(spark):
    """Round 10: the image banded join carries the video path's
    hot-bucket guard. A band value shared by more than IMAGE_BAND_CAP
    images must produce ZERO candidate pairs through that band —
    measured at sf0.1 the top band held ~1,000 of 6.2k images, the
    exact bucket-goes-quadratic class that OOMed q_video_near_dup in
    round 9."""
    from sandbox_data_pipeline_spark.queries.multimodal import (
        IMAGE_BAND_CAP,
        _dhash_pair_hist,
    )

    n = IMAGE_BAND_CAP + 5
    # identical fingerprints -> every band bucket holds n > CAP images
    hot = spark.createDataFrame(
        [(i, 7, 9) for i in range(n)], "media_id long, h1 long, h2 long"
    )
    assert _dhash_pair_hist(hot).count() == 0
    # two images sharing one band, bucket size 2 << CAP -> pair kept
    cold = spark.createDataFrame(
        [(1, 7, 9), (2, 7, 1 << 40)], "media_id long, h1 long, h2 long"
    )
    rows = _dhash_pair_hist(cold).collect()
    assert sum(r["n_pairs"] for r in rows) == 1


def test_manifest_rebuilds_when_corpus_changes(spark, tmp_path, sf_dir):
    """Round-10 review finding: the manifest cache must key on the
    SOURCE corpus state, not just the path — a regenerated corpus at a
    reused path must trigger a rebuild, never serve stale
    fingerprints."""
    import shutil
    import time

    from sandbox_data_pipeline_spark.queries import multimodal as mm

    src = os.path.join(sf_dir, "documents.parquet")
    dst = str(tmp_path / "documents.parquet")
    shutil.copy(src, dst)
    p1 = mm.fingerprint_manifest_path(spark, str(tmp_path))
    assert p1 == mm.fingerprint_manifest_path(spark, str(tmp_path))  # cached
    # regenerate the corpus in place (same bytes, fresh mtime — the
    # minimal "rewritten at the same path" signal the key must catch)
    time.sleep(0.01)
    shutil.copy(src, dst)
    p2 = mm.fingerprint_manifest_path(spark, str(tmp_path))
    assert p2 != p1, "stale manifest served after corpus regeneration"
