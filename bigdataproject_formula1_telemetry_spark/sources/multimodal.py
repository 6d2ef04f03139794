"""Multimodal columns for training-data pipelines (north-star M7).

Image/audio/video travel as opaque ``binary`` columns with a typed
metadata struct; every operator is a ``mapInPandas`` batch UDF with an
explicit output schema, so the Spark-side plumbing (schema, partitioning,
Arrow batch shape) is real and tested at any scale.

Codec reality: this container has no image/audio codec libraries, so
**compressed formats (jpeg/png/mp3/...) are stubbed** behind
``NotImplementedError`` — the supported path is RAW buffers:
- image: uint8 H×W×C raw pixels (shape from metadata),
- audio: int16 little-endian PCM,
- video: concatenated raw frames of H×W×C.
``np.frombuffer`` decoding, feature math, nearest-neighbor resize, and
frame sampling are real computations over those buffers.

Scale notes: payload bytes never leave the executors; features are small
fixed-width rows.  Batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` — set it lower for very
large media rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
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
        StructField("kind", StringType()),  # image | audio | video
        StructField("format", StringType()),  # raw | jpeg | png | pcm16 | ...
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

RAW_FORMATS = {"raw", "pcm16"}


def _require_raw(fmt: str, kind: str) -> None:
    if fmt not in RAW_FORMATS:
        raise NotImplementedError(
            f"codec '{fmt}' for {kind} payloads needs an image/audio library "
            "not present in this runtime; supported here: raw uint8 pixels / "
            "pcm16 audio.  Plug a real decoder into decode_image/decode_audio."
        )


def decode_image(payload: bytes, width: int, height: int, channels: int, fmt: str) -> np.ndarray:
    """binary → H×W×C uint8 array.  Raw buffers only (see module note)."""
    _require_raw(fmt, "image")
    arr = np.frombuffer(payload, dtype=np.uint8)
    return arr[: width * height * channels].reshape(height, width, channels)


def decode_audio(payload: bytes, fmt: str) -> np.ndarray:
    """binary → float64 waveform in [-1, 1] from int16 PCM."""
    _require_raw(fmt, "audio")
    return np.frombuffer(payload, dtype="<i2").astype(np.float64) / 32768.0


IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mean_rgb", ArrayType(DoubleType())),
        StructField("std_rgb", ArrayType(DoubleType())),
        StructField("brightness", DoubleType()),
        StructField("n_pixels", LongType()),
    ]
)


def image_features(df: DataFrame) -> DataFrame:
    """Per-image channel statistics — the decode → feature-extract stage."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = decode_image(r.payload, r.width, r.height, r.channels, r.format)
                flat = img.reshape(-1, r.channels).astype(np.float64)
                rows.append(
                    {
                        "media_id": r.media_id,
                        "mean_rgb": flat.mean(axis=0).tolist(),
                        "std_rgb": flat.std(axis=0).tolist(),
                        "brightness": float(flat.mean() / 255.0),
                        "n_pixels": int(r.width * r.height),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return df.where(df.kind == "image").mapInPandas(extract, IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
    ]
)


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize to a fixed grid (the thumbnailing /
    normalization stage before model input)."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = decode_image(r.payload, r.width, r.height, r.channels, r.format)
                ys = (np.arange(out_h) * r.height / out_h).astype(int)
                xs = (np.arange(out_w) * r.width / out_w).astype(int)
                small = img[np.ix_(ys, xs)]
                rows.append(
                    {
                        "media_id": r.media_id,
                        "payload": small.tobytes(),
                        "width": out_w,
                        "height": out_h,
                        "channels": r.channels,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return df.where(df.kind == "image").mapInPandas(resize, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
    ]
)


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video → every-nth-frame rows (one output row per kept frame):
    the frame-sampling stage of a vision-training pipeline.  Output rows
    are independent → downstream repartitions freely."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                _require_raw(r.format, "video")
                frame_size = r.width * r.height * r.channels
                buf = np.frombuffer(r.payload, dtype=np.uint8)
                n = min(r.n_frames, len(buf) // frame_size)
                for i in range(0, n, every_n):
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "frame_idx": i,
                            "payload": buf[i * frame_size : (i + 1) * frame_size].tobytes(),
                            "width": r.width,
                            "height": r.height,
                            "channels": r.channels,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.where(df.kind == "video").mapInPandas(sample, FRAME_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("window_idx", LongType()),
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
        StructField("zero_crossings", LongType()),
    ]
)


def audio_window_features(df: DataFrame, window_samples: int = 1024) -> DataFrame:
    """PCM audio → per-window RMS / peak / zero-crossing rows (the
    feature-extract stage of an audio pipeline)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                wave = decode_audio(r.payload, r.format)
                n_win = len(wave) // window_samples
                for i in range(n_win):
                    w = wave[i * window_samples : (i + 1) * window_samples]
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "window_idx": i,
                            "rms": float(np.sqrt(np.mean(w**2))),
                            "peak": float(np.max(np.abs(w))),
                            "zero_crossings": int(np.sum(np.abs(np.diff(np.signbit(w))))),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields])

    return df.where(df.kind == "audio").mapInPandas(extract, AUDIO_FEATURES_SCHEMA)
