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
    with pytest.raises(Exception) as ei:
        M.image_features(media.where(F.col("format") == "jpeg")).collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)
