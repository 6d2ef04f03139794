"""Multimodal column tests: raw-buffer decode plumbing, features, resize,
frame sampling, audio windows, and the codec stub contract."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark.sources import multimodal as M


def make_media(spark):
    rng = np.random.default_rng(5)
    rows = []
    # image: 8x6 RGB gradient
    img = np.arange(8 * 6 * 3, dtype=np.uint8).reshape(6, 8, 3)
    rows.append((1, "image", "raw", bytearray(img.tobytes()), 8, 6, 3, None, None))
    # audio: 1 s of 8 kHz sine in int16
    t = np.arange(8000) / 8000.0
    wave = (np.sin(2 * np.pi * 440 * t) * 20000).astype("<i2")
    rows.append((2, "audio", "pcm16", bytearray(wave.tobytes()), None, None, None, 8000, None))
    # video: 30 frames of 4x4 gray, frame i filled with value i
    frames = np.stack([np.full((4, 4, 1), i, dtype=np.uint8) for i in range(30)])
    rows.append((3, "video", "raw", bytearray(frames.tobytes()), 4, 4, 1, None, 30))
    # a jpeg row → must be ignored by raw ops / raise in decode
    rows.append((4, "image", "jpeg", bytearray(b"\xff\xd8fakejpeg"), 8, 6, 3, None, None))
    return spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)


@pytest.fixture(scope="module")
def media(spark):
    return make_media(spark)


def test_image_features(media):
    out = M.image_features(media.where(F.col("format") == "raw")).toPandas()
    assert len(out) == 1
    img = np.arange(8 * 6 * 3, dtype=np.float64).reshape(-1, 3)
    assert np.allclose(out["mean_rgb"].iloc[0], img.mean(axis=0))
    assert out["n_pixels"].iloc[0] == 48
    assert 0.0 < out["brightness"].iloc[0] < 1.0


def test_resize_roundtrip(media):
    out = M.resize_images(media.where(F.col("format") == "raw"), 4, 3).toPandas()
    assert len(out) == 1
    small = np.frombuffer(out["payload"].iloc[0], dtype=np.uint8).reshape(3, 4, 3)
    orig = np.arange(8 * 6 * 3, dtype=np.uint8).reshape(6, 8, 3)
    # nearest-neighbor: sampled pixels come from the original
    assert (small == orig[np.ix_([0, 2, 4], [0, 2, 4, 6])]).all()


def test_frame_sampling(media):
    out = M.sample_frames(media, every_n=10).toPandas().sort_values("frame_idx")
    assert list(out["frame_idx"]) == [0, 10, 20]
    for _, r in out.iterrows():
        frame = np.frombuffer(r["payload"], dtype=np.uint8)
        assert (frame == r["frame_idx"]).all()
        assert len(frame) == 4 * 4 * 1


def test_audio_windows(media):
    out = M.audio_window_features(media, window_samples=1024).toPandas()
    assert len(out) == 8000 // 1024
    # sine RMS ≈ amplitude/√2 = (20000/32768)/1.414
    assert np.allclose(out["rms"], (20000 / 32768) / np.sqrt(2), atol=0.01)
    assert (out["zero_crossings"] > 0).all()


def test_codec_stub_raises(media):
    # jpeg decodes for real now; the fixture's jpeg row carries a fake
    # payload, so it must fail as *corrupt data*, not as a missing codec
    with pytest.raises(Exception) as ei:
        M.image_features(media.where(F.col("format") == "jpeg")).collect()
    assert "JPEG" in str(ei.value) or "marker" in str(ei.value)


# ---- real codec paths: PNG (stdlib zlib) and WAV (stdlib wave) ------------

def _png_with_filters(img: np.ndarray, filter_types: list[int]) -> bytes:
    """Build a PNG applying a chosen filter type per scanline (exercises
    the decoder's Sub/Up/Average/Paeth inversion, which encode_png's
    all-None output would not)."""
    import struct
    import zlib

    h, w, c = img.shape
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        row = img[y].reshape(-1).astype(np.int32)
        ft = filter_types[y % len(filter_types)]
        out = np.empty(w * c, dtype=np.int32)
        for x in range(w * c):
            a = int(row[x - c]) if x >= c else 0
            b = int(prev[x])
            cc = int(prev[x - c]) if x >= c else 0
            if ft == 0:
                v = row[x]
            elif ft == 1:
                v = row[x] - a
            elif ft == 2:
                v = row[x] - b
            elif ft == 3:
                v = row[x] - ((a + b) >> 1)
            else:
                p = a + b - cc
                pa, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc_) else (b if pb <= pc_ else cc)
                v = row[x] - pred
            out[x] = v & 0xFF
        raw += bytes([ft]) + out.astype(np.uint8).tobytes()
        prev = row

    def chunk(tag, data):
        return struct.pack(">I", len(data)) + tag + data + struct.pack(
            ">I", zlib.crc32(tag + data)
        )

    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_roundtrip_and_all_filters():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
    # encode_png (all filter-None) roundtrip
    assert np.array_equal(M.decode_png(M.encode_png(img)), img)
    # every filter type must invert exactly
    for fts in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        assert np.array_equal(M.decode_png(_png_with_filters(img, fts)), img), fts
    # grayscale and RGBA
    gray = rng.integers(0, 256, (5, 4), dtype=np.uint8)
    assert np.array_equal(M.decode_png(M.encode_png(gray))[:, :, 0], gray)
    rgba = rng.integers(0, 256, (5, 4, 4), dtype=np.uint8)
    assert np.array_equal(M.decode_png(_png_with_filters(rgba, [4])), rgba)


def test_png_flows_through_spark_feature_and_resize(spark):
    img = np.arange(8 * 6 * 3, dtype=np.uint8).reshape(6, 8, 3)
    rows = [
        (10, "image", "png", bytearray(M.encode_png(img)), 8, 6, 3, None, None),
        (11, "image", "raw", bytearray(img.tobytes()), 8, 6, 3, None, None),
    ]
    df = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)
    feats = M.image_features(df).toPandas().set_index("media_id")
    # png row must produce identical features to the raw row
    assert list(feats.loc[10, "mean_rgb"]) == list(feats.loc[11, "mean_rgb"])
    assert feats.loc[10, "n_pixels"] == 48
    res = M.resize_images(df, 4, 3).toPandas().set_index("media_id")
    assert bytes(res.loc[10, "payload"]) == bytes(res.loc[11, "payload"])


def test_wav_roundtrip_and_spark_windows(spark):
    t = np.arange(8000) / 8000.0
    mono = np.sin(2 * np.pi * 440 * t) * 0.6
    payload = M.encode_wav(mono, 8000)
    wave, rate = M.decode_wav(payload)
    assert rate == 8000
    assert np.allclose(wave, mono, atol=1e-4)
    # identical features for wav vs pcm16 of the same samples
    pcm = (np.clip(np.round(mono * 32768.0), -32768, 32767).astype("<i2")).tobytes()
    rows = [
        (20, "audio", "wav", bytearray(payload), None, None, None, 8000, None),
        (21, "audio", "pcm16", bytearray(pcm), None, None, None, 8000, None),
    ]
    df = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)
    out = M.audio_window_features(df).toPandas()
    a = out[out.media_id == 20].sort_values("window_idx").reset_index(drop=True)
    b = out[out.media_id == 21].sort_values("window_idx").reset_index(drop=True)
    assert len(a) == len(b) == 7
    assert np.allclose(a["rms"], b["rms"])
    assert (a["zero_crossings"] == b["zero_crossings"]).all()


def test_png_metadata_mismatch_raises():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="contradict"):
        M.decode_image(M.encode_png(img), 9, 9, 3, "png")


def test_remaining_codecs_still_stubbed():
    # jpeg is real now — a truncated stream is a data error, not a stub
    with pytest.raises(ValueError, match="missing SOF"):
        M.decode_image(b"\xff\xd8", 4, 4, 3, "jpeg")
    # mpeg audio is real now — garbage with no syncword is a data error
    with pytest.raises(ValueError, match="no Layer I frames"):
        M.decode_audio(b"xx", "mp3")
    with pytest.raises(NotImplementedError, match="h264"):
        M.decode_image(b"xx", 4, 4, 3, "h264")


# -- JPEG (baseline codec built from the T.81 spec, stdlib+numpy) ----------

def _smooth_gradient(h, w, c):
    yy, xx = np.mgrid[0:h, 0:w]
    chans = [
        ((yy * 255 / max(h - 1, 1)) * 0.5 + (xx * 255 / max(w - 1, 1)) * 0.5),
        (xx * 255 / max(w - 1, 1)),
        (255 - yy * 255 / max(h - 1, 1)),
    ]
    img = np.stack(chans[:c], axis=-1)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def test_jpeg_roundtrip_gray_and_rgb():
    from bigdataproject_formula1_telemetry_spark.sources import jpeg as J

    # smooth gradients survive lossy 8x8 DCT quantization nearly intact
    for h, w, c in [(24, 32, 1), (24, 32, 3), (13, 9, 3)]:  # odd dims: pad+crop
        img = _smooth_gradient(h, w, c)
        back = J.decode_jpeg(J.encode_jpeg(img, quality=95))
        assert back.shape == (h, w, c)
        err = np.abs(back.astype(int) - img.astype(int))
        assert err.mean() < 3.0 and err.max() <= 40, (h, w, c, err.mean(), err.max())

    # flat color: DC-only blocks, quant error only → near-exact
    flat = np.full((16, 16, 3), 77, dtype=np.uint8)
    back = J.decode_jpeg(J.encode_jpeg(flat, quality=90))
    assert np.abs(back.astype(int) - 77).max() <= 3

    # lower quality degrades but stays recognizable (sanity of the
    # quality curve, not a precision claim)
    img = _smooth_gradient(24, 32, 3)
    lo = J.decode_jpeg(J.encode_jpeg(img, quality=25))
    assert np.abs(lo.astype(int) - img.astype(int)).mean() < 12.0


def test_jpeg_unsupported_variants_raise():
    import pytest

    from bigdataproject_formula1_telemetry_spark.sources import jpeg as J

    img = _smooth_gradient(16, 16, 3)
    payload = bytearray(J.encode_jpeg(img))

    # flip SOF0 (FFC0) into arithmetic-coded SOF9 (FFC9) — progressive
    # SOF2 decodes for real now, arithmetic still raises honestly
    sof = payload.find(b"\xff\xc0")
    arith = payload.copy()
    arith[sof + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="SOF9"):
        J.decode_jpeg(bytes(arith))

    # claim 3x3 luma sampling in SOF0: chroma stays 1x1, and 3:1 is an
    # integer ratio — but the ENTROPY data was coded 4:4:4, so honest
    # decode must fail, not emit garbage silently; a 3x3-vs-2x2 mix
    # (non-integer 3:2 ratio) raises the documented NotImplementedError
    sub = payload.copy()
    sub[sof + 11] = 0x33  # luma 3x3
    sub[sof + 14] = 0x22  # cb 2x2 → 3:2 chroma ratio, not replicable
    with pytest.raises(NotImplementedError, match="non-integer"):
        J.decode_jpeg(bytes(sub))

    with pytest.raises(ValueError, match="SOI"):
        J.decode_jpeg(b"not a jpeg")


def test_jpeg_flows_through_spark_feature_and_resize(spark):
    from bigdataproject_formula1_telemetry_spark.sources import jpeg as J

    img = _smooth_gradient(24, 16, 3)
    mdf = spark.createDataFrame(
        [(77, "image", "jpeg", bytearray(J.encode_jpeg(img)), 16, 24, 3, None, None)],
        M.MEDIA_SCHEMA,
    )
    feats = M.image_features(mdf).collect()
    assert len(feats) == 1 and feats[0]["n_pixels"] == 24 * 16
    # channel means should be close to the source image's
    src_means = img.reshape(-1, 3).mean(axis=0)
    assert np.abs(np.array(feats[0]["mean_rgb"]) - src_means).max() < 4.0

    small = M.resize_images(mdf, 8, 8).collect()[0]
    assert (small["width"], small["height"], small["channels"]) == (8, 8, 3)
    assert len(small["payload"]) == 8 * 8 * 3

    # metadata/stream dimension mismatch must raise, same as PNG
    bad = spark.createDataFrame(
        [(78, "image", "jpeg", bytearray(J.encode_jpeg(img)), 99, 24, 3, None, None)],
        M.MEDIA_SCHEMA,
    )
    import pytest

    with pytest.raises(Exception, match="contradict"):
        M.image_features(bad).collect()


def test_jpeg_marker_padding_and_tem_tolerated():
    """Spec-valid streams may pad with 0xFF fill bytes before a marker id
    (T.81 B.1.1.2) and may contain standalone length-less TEM markers;
    external baseline JPEGs within the supported subset must still decode."""
    from bigdataproject_formula1_telemetry_spark.sources import jpeg as J

    img = _smooth_gradient(16, 16, 3)
    payload = J.encode_jpeg(img, quality=90)
    # inject a fill byte + TEM right after SOI, before the first segment
    padded = payload[:2] + b"\xff" + b"\xff\x01" + payload[2:]
    back = J.decode_jpeg(padded)
    assert back.shape == (16, 16, 3)
    assert np.array_equal(back, J.decode_jpeg(payload))


def test_jpeg_420_and_422_roundtrip():
    """Chroma-subsampled encode -> decode: 4:2:0 and 4:2:2 fixtures must
    reconstruct smooth images within IDCT/quantization tolerance, odd
    dimensions included (pad + crop on both the luma and chroma grids),
    and the SOF really carries the subsampled factors."""
    from bigdataproject_formula1_telemetry_spark.sources import jpeg as J

    for sub, sampbyte in (("420", 0x22), ("422", 0x21)):
        for h, w in [(24, 32), (13, 9), (16, 17)]:
            img = _smooth_gradient(h, w, 3)
            payload = J.encode_jpeg(img, quality=95, subsampling=sub)
            sof = payload.find(b"\xff\xc0")
            assert payload[sof + 11] == sampbyte  # luma sampling factors
            assert payload[sof + 14] == 0x11  # chroma stays 1x1
            back = J.decode_jpeg(payload)
            assert back.shape == (h, w, 3)
            err = np.abs(back.astype(int) - img.astype(int))
            # tolerance is wider than the 4:4:4 roundtrip because the
            # information loss is real: these gradients change chroma by
            # up to ~32 codes/pixel, so half-resolution chroma costs a
            # few RGB codes on average (the constant-chroma test below
            # pins the no-loss case to ≤1)
            assert err.mean() < 8.0 and err.max() <= 48, (
                sub, h, w, err.mean(), err.max())


def test_jpeg_420_matches_444_on_constant_chroma():
    """When chroma is constant, subsampling loses nothing: the 4:2:0
    decode must match the 4:4:4 decode of the same image to within one
    code value (independent cross-check of the upsample path, not just
    a self-roundtrip)."""
    from bigdataproject_formula1_telemetry_spark.sources import jpeg as J

    yy, xx = np.mgrid[0:24, 0:32]
    # luma gradient, exactly constant chroma (gray image)
    g = np.clip(np.round(yy * 4 + xx * 3), 0, 255).astype(np.uint8)
    img = np.stack([g, g, g], axis=-1)
    a = J.decode_jpeg(J.encode_jpeg(img, quality=95, subsampling="444"))
    b = J.decode_jpeg(J.encode_jpeg(img, quality=95, subsampling="420"))
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_jpeg_420_chroma_plane_is_box_mean():
    """Structural check on the encoder side: a 2x2-blocky chroma image
    survives 4:2:0 exactly (each 2x2 cell is constant, so the box mean
    is lossless), pinning the downsample grid alignment."""
    from bigdataproject_formula1_telemetry_spark.sources import jpeg as J

    rng = np.random.default_rng(5)
    small = rng.integers(60, 196, size=(8, 8, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(small, 2, axis=0), 2, axis=1)  # 16x16, 2x2 cells
    back = J.decode_jpeg(J.encode_jpeg(img, quality=97, subsampling="420"))
    err = np.abs(back.astype(int) - img.astype(int))
    assert err.mean() < 6.0 and err.max() <= 60, (err.mean(), err.max())


def test_jpeg_restart_intervals_roundtrip():
    """DRI/RSTn: encode with restart markers every 2 MCUs and decode —
    output must be BIT-IDENTICAL to the no-restart encode of the same
    image (restarts change the entropy framing, not the coefficients),
    across gray/RGB and all subsampling modes."""
    import numpy as np

    from bigdataproject_formula1_telemetry_spark.sources import jpeg as J

    rng = np.random.default_rng(3)
    for shape, sub in [((24, 40, 3), "444"), ((24, 40, 3), "420"),
                       ((24, 40, 3), "422"), ((24, 40), "444")]:
        grad = _smooth_gradient(*shape[:2], 3 if len(shape) == 3 else 1)
        img = grad + rng.integers(0, 8, grad.shape).astype(np.uint8)
        base = J.decode_jpeg(J.encode_jpeg(img, quality=90, subsampling=sub))
        with_rst = J.encode_jpeg(
            img, quality=90, subsampling=sub, restart_interval=2
        )
        assert b"\xff\xdd" in with_rst      # DRI present
        assert b"\xff\xd0" in with_rst      # at least one RST0
        got = J.decode_jpeg(with_rst)
        assert np.array_equal(got, base), (shape, sub)

    # a stream whose RSTn sequence is out of order is rejected
    payload = bytearray(
        J.encode_jpeg(_smooth_gradient(24, 40, 3), restart_interval=2)
    )
    i = payload.find(b"\xff\xd0")
    payload[i + 1] = 0xD5  # RST0 → RST5
    import pytest

    with pytest.raises(ValueError, match="out of sequence"):
        J.decode_jpeg(bytes(payload))


def test_jpeg_progressive_roundtrip_bit_identical_to_baseline():
    """Progressive (SOF2) encode → decode must be BIT-IDENTICAL to the
    baseline decode of the same image: the scan script (DC first+refine,
    per-component AC first+refine with EOBRUN accumulation) transmits
    every coefficient bit, and both encoders share one quantizer.
    Cases target each entropy path: long EOB runs (flat), ZRL chains
    (sparse high-freq), refinement-heavy (dense noise), dummy padded
    blocks (odd sizes), all subsampling modes, grayscale."""
    import numpy as np

    from bigdataproject_formula1_telemetry_spark.sources import jpeg as J

    rng = np.random.default_rng(11)
    cases = [
        (np.full((64, 64, 3), 128, np.uint8), "420", 90),
        (np.full((128, 96), 200, np.uint8), "444", 50),
        (rng.integers(0, 256, (48, 56, 3)).astype(np.uint8), "444", 95),
        (rng.integers(0, 256, (48, 56, 3)).astype(np.uint8), "420", 10),
        (
            (np.full((80, 80), 128) + (rng.random((80, 80)) < 0.01) * 120)
            .astype(np.uint8),
            "444",
            75,
        ),
        (rng.integers(0, 256, (33, 41, 3)).astype(np.uint8), "422", 80),
    ]
    for img, sub, q in cases:
        base = J.decode_jpeg(J.encode_jpeg(img, quality=q, subsampling=sub))
        payload = J.encode_jpeg_progressive(img, quality=q, subsampling=sub)
        assert b"\xff\xc2" in payload  # really SOF2
        prog = J.decode_jpeg(payload)
        assert np.array_equal(base, prog), (img.shape, sub, q)


def test_jpeg_progressive_flows_through_spark(spark):
    """A progressive payload rides the same multimodal Spark path as
    baseline: identical features for the same image in both encodings."""
    import numpy as np

    from bigdataproject_formula1_telemetry_spark.sources import jpeg as J

    img = np.linspace(0, 255, 16 * 24 * 3).reshape(16, 24, 3).astype(np.uint8)
    rows = [
        (30, "image", "jpeg", bytearray(J.encode_jpeg(img, quality=95)), 24, 16, 3, None, None),
        (31, "image", "jpeg", bytearray(J.encode_jpeg_progressive(img, quality=95)), 24, 16, 3, None, None),
    ]
    df = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)
    feats = M.image_features(df).toPandas().set_index("media_id")
    assert list(feats.loc[30, "mean_rgb"]) == list(feats.loc[31, "mean_rgb"])


def test_jpeg_progressive_stream_structure():
    """The progressive stream has the declared scan script: one SOF2,
    2 DC scans + 2 AC scans per component (3 comps → 8 SOS total), and
    per-scan AC Huffman tables (DHT count ≥ scans that need one)."""
    import numpy as np

    from bigdataproject_formula1_telemetry_spark.sources import jpeg as J

    img = np.linspace(0, 255, 32 * 48 * 3).reshape(32, 48, 3).astype(np.uint8)
    payload = J.encode_jpeg_progressive(img)
    assert payload.count(b"\xff\xc2") == 1
    assert payload.count(b"\xff\xc0") == 0
    n_sos = payload.count(b"\xff\xda")
    assert n_sos == 2 + 2 * 3  # DC first + DC refine + (AC first+refine) × 3


def test_jpeg_progressive_restart_intervals():
    """Progressive + DRI: RSTn boundaries in every scan (EOB runs
    flushed, predictors reset) still decode bit-identical to baseline."""
    import numpy as np

    from bigdataproject_formula1_telemetry_spark.sources import jpeg as J

    rng = np.random.default_rng(29)
    for ri in (1, 2, 5):
        for shape, sub in [((33, 41, 3), "420"), ((9, 18), "444")]:
            img = rng.integers(0, 256, shape).astype(np.uint8)
            base = J.decode_jpeg(J.encode_jpeg(img, quality=70, subsampling=sub))
            payload = J.encode_jpeg_progressive(
                img, quality=70, subsampling=sub, restart_interval=ri
            )
            assert b"\xff\xdd" in payload
            got = J.decode_jpeg(payload)
            assert np.array_equal(got, base), (ri, shape, sub)


def _build_wav(samples: np.ndarray, rate: int, tag: int, bits: int, n_ch: int = 1) -> bytes:
    """Hand-rolled RIFF builder for formats stdlib wave can't write
    (float32/float64, 24-bit, 8-bit, EXTENSIBLE)."""
    import struct

    if tag == 1 and bits == 8:
        data = (np.clip(np.round(samples * 128.0 + 128.0), 0, 255)).astype(np.uint8).tobytes()
    elif tag == 1 and bits == 16:
        data = np.clip(np.round(samples * 32768.0), -32768, 32767).astype("<i2").tobytes()
    elif tag == 1 and bits == 24:
        v = np.clip(np.round(samples * float(1 << 23)), -(1 << 23), (1 << 23) - 1).astype(np.int64)
        v = np.where(v < 0, v + (1 << 24), v).astype(np.uint32)
        b = np.zeros((len(v), 3), dtype=np.uint8)
        b[:, 0] = v & 0xFF
        b[:, 1] = (v >> 8) & 0xFF
        b[:, 2] = (v >> 16) & 0xFF
        data = b.tobytes()
    elif tag == 1 and bits == 32:
        data = np.clip(np.round(samples * float(1 << 31)), -(1 << 31), (1 << 31) - 1).astype("<i4").tobytes()
    elif tag == 3 and bits == 32:
        data = samples.astype("<f4").tobytes()
    elif tag == 3 and bits == 64:
        data = samples.astype("<f8").tobytes()
    else:
        raise ValueError("unsupported test format")
    block = n_ch * bits // 8
    fmt = struct.pack("<HHIIHH", tag, n_ch, rate, rate * block, block, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    # a junk chunk with ODD length exercises word-alignment skipping
    chunks += b"LIST" + struct.pack("<I", 3) + b"odd" + b"\x00"
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_formats_beyond_pcm16():
    """decode_wav reads float32/float64, 8/24/32-bit PCM, EXTENSIBLE,
    stereo downmix, and skips odd-length junk chunks; unsupported tags
    raise honestly."""
    import struct

    t = np.arange(4000) / 8000.0
    mono = (np.sin(2 * np.pi * 440 * t) * 0.6)
    for tag, bits, tol in [
        (1, 8, 1e-2), (1, 16, 1e-4), (1, 24, 1e-6), (1, 32, 1e-9),
        (3, 32, 1e-7), (3, 64, 0.0),
    ]:
        wave, rate = M.decode_wav(_build_wav(mono, 8000, tag, bits))
        assert rate == 8000
        assert np.allclose(wave, mono, atol=max(tol, 1e-12)), (tag, bits)

    # stereo float32 downmix: L = x, R = -x → mean 0
    stereo = np.empty(2 * len(mono))
    stereo[0::2] = mono
    stereo[1::2] = -mono
    wave, _ = M.decode_wav(_build_wav(stereo, 8000, 3, 32, n_ch=2))
    assert np.allclose(wave, 0.0, atol=1e-7)

    # EXTENSIBLE wrapper resolving to float32
    inner = _build_wav(mono, 8000, 3, 32)
    fmt_at = inner.find(b"fmt ")
    base = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 32000, 4, 32)
    ext = struct.pack("<H", 22) + struct.pack("<HI", 32, 3) + b"\x03\x00" + b"\x00" * 12
    new_fmt = base + ext
    rest = inner[fmt_at + 8 + 16:]
    payload = (
        inner[:fmt_at] + b"fmt " + struct.pack("<I", len(new_fmt)) + new_fmt + rest
    )
    wave, _ = M.decode_wav(payload)
    assert np.allclose(wave, mono, atol=1e-7)

    # format tag 7 (µ-law) at its fixed offset (byte 20, first fmt field)
    bad = bytearray(_build_wav(mono, 8000, 1, 16))
    bad[20:22] = struct.pack("<H", 7)
    with pytest.raises(NotImplementedError, match="format tag"):
        M.decode_wav(bytes(bad))
    with pytest.raises(ValueError, match="RIFF"):
        M.decode_wav(b"not audio")


def test_image_stream_info_triage(spark):
    import numpy as np
    from bigdataproject_formula1_telemetry_spark.sources import multimodal as MM
    from bigdataproject_formula1_telemetry_spark.sources.jpeg import (
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
    rows = [
        (1, "image", "png", bytearray(MM.encode_png(img)), 32, 24, 3, None, None),
        (2, "image", "jpeg", bytearray(encode_jpeg(img)), 32, 24, 3, None, None),
        (3, "image", "jpeg", bytearray(encode_jpeg(img, subsampling="420")), 32, 24, 3, None, None),
        (4, "image", "jpeg", bytearray(encode_jpeg_progressive(img)), 32, 24, 3, None, None),
        (5, "image", "raw", bytearray(img.tobytes()), 32, 24, 3, None, None),
        (6, "image", "jpeg", bytearray(b"\xff\xd8garbage"), 8, 8, 3, None, None),
        (7, "audio", "pcm16", bytearray(b"\x00\x00"), None, None, None, 8000, None),
    ]
    df = spark.createDataFrame(rows, schema=MM.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in MM.image_stream_info(df).collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6}  # audio row excluded
    assert out[1]["container"] == "png" and out[1]["profile"] == "rgb"
    assert (out[1]["img_width"], out[1]["img_height"]) == (32, 24)
    assert out[1]["decodable"] == "pixels"
    assert out[2]["container"] == "jpeg" and out[2]["subsampling"] == "4:4:4"
    assert out[2]["profile"].startswith("SOF0")
    assert out[3]["subsampling"] == "4:2:0"
    assert out[4]["profile"].startswith("SOF2") and "progressive" in out[4]["profile"]
    assert out[5]["container"] == "raw" and out[5]["decodable"] == "pixels"
    assert out[6]["decodable"] == "error"  # dead-letter, not a crash


def test_image_stream_info_gif_and_webp_headers(spark):
    """GIF and WebP dimension triage from crafted spec-shaped headers —
    metadata_only decodability (no pixel decode for either), dead
    letters for corrupt variants."""
    import struct
    from bigdataproject_formula1_telemetry_spark.sources import multimodal as M

    gif = b"GIF89a" + struct.pack("<HHB", 320, 200, 0xF7) + b"\x00\x00" + b"\x3b"
    vp8 = (
        b"RIFF" + struct.pack("<I", 22) + b"WEBP" + b"VP8 "
        + struct.pack("<I", 14) + b"\x00\x00\x00" + b"\x9d\x01\x2a"
        + struct.pack("<HH", 640, 360) + b"\x00\x00"
    )
    bits = (511 - 1) | ((287 - 1) << 14)
    vp8l = (
        b"RIFF" + struct.pack("<I", 17) + b"WEBP" + b"VP8L"
        + struct.pack("<I", 9) + b"\x2f" + struct.pack("<I", bits) + b"\x00"
    )
    vp8x = (
        b"RIFF" + struct.pack("<I", 18) + b"WEBP" + b"VP8X"
        + struct.pack("<I", 10) + b"\x02" + b"\x00\x00\x00"
        + (1023).to_bytes(3, "little") + (767).to_bytes(3, "little")
    )
    rows = [
        (1, "image", "gif", bytearray(gif), None, None, None, None, None),
        (2, "image", "webp", bytearray(vp8), None, None, None, None, None),
        (3, "image", "webp", bytearray(vp8l), None, None, None, None, None),
        (4, "image", "webp", bytearray(vp8x), None, None, None, None, None),
        (5, "image", "gif", bytearray(b"GIF89a\x01"), None, None, None, None, None),
    ]
    df = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in M.image_stream_info(df).collect()}
    assert (got[1]["container"], got[1]["img_width"], got[1]["img_height"]) == ("gif", 320, 200)
    assert got[1]["bit_depth"] == 8 and got[1]["decodable"] == "metadata_only"
    assert (got[2]["profile"], got[2]["img_width"], got[2]["img_height"]) == ("VP8", 640, 360)
    assert got[2]["subsampling"] == "4:2:0"
    assert (got[3]["profile"], got[3]["img_width"], got[3]["img_height"]) == ("VP8L", 511, 287)
    assert got[3]["n_channels"] == 4
    assert (got[4]["profile"], got[4]["img_width"], got[4]["img_height"]) == ("VP8X", 1024, 768)
    assert got[5]["decodable"] == "error"  # truncated GIF -> dead letter
