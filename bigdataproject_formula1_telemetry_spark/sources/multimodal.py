"""Multimodal columns for training-data pipelines (north-star M7).

Image/audio/video travel as opaque ``binary`` columns with a typed
metadata struct; every operator is a ``mapInPandas`` batch UDF with an
explicit output schema, so the Spark-side plumbing (schema, partitioning,
Arrow batch shape) is real and tested at any scale.

Codec reality: this container has no image/audio codec *libraries*, but
three real container formats decode from their specs alone and are fully
implemented here:
- **png** (8-bit gray/RGB/RGBA, non-interlaced): zlib inflate + the five
  PNG scanline filters (None/Sub/Up/Average/Paeth) inverted in numpy;
- **jpeg** (baseline sequential SOF0, 8-bit, integer-ratio sampling
  incl. 4:2:0/4:2:2): Huffman entropy decode + dequantize + inverse DCT
  + chroma upsample + YCbCr→RGB, built from ITU-T T.81 in
  ``sources/jpeg.py`` (progressive/restart/non-integer-ratio variants
  raise);
- **wav** (RIFF PCM16): header parse via the stdlib ``wave`` module,
  multi-channel downmixed to mono;
- **MPEG-1 audio** ("mp1"/"mp3" formats, ``sources/mpeg_audio.py``):
  frame walking + duration/bitrate metadata for ALL layers, Layer I PCM
  decode/encode from the spec's formula-derivable parts (pseudo-QMF
  filterbank — near-PR, not the bit-exact Annex window); Layer II/III
  PCM raises with the reason (non-derivable spec constant tables).
Everything else (h264/...) **stays stubbed** behind
``NotImplementedError`` — those need real codec libraries.  The RAW
paths remain:
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
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
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
IMAGE_FORMATS = RAW_FORMATS | {"png", "jpeg"}
AUDIO_FORMATS = RAW_FORMATS | {"wav", "mp1", "mp3"}


def _require_decodable(fmt: str, kind: str, supported: set[str]) -> None:
    if fmt not in supported:
        raise NotImplementedError(
            f"codec '{fmt}' for {kind} payloads needs a codec library not "
            f"present in this runtime; supported here: {sorted(supported)}. "
            "Plug a real decoder into decode_image/decode_audio."
        )


# -- PNG (pure stdlib zlib + numpy; 8-bit, non-interlaced) ------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: PNG color type → channel count (8-bit only; palette unsupported)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunks(payload: bytes):
    import struct

    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        yield tag, payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + data + crc
        if tag == b"IEND":
            break


def _png_unfilter(raw: np.ndarray, height: int, rowbytes: int, bpp: int) -> np.ndarray:
    """Invert the five PNG scanline filters.  Rows with filter None/Up are
    vectorized; Sub/Average/Paeth carry a per-pixel left dependency, so
    those rows run a bounded python loop — fine for thumbnail-scale
    assets; plug a codec library for photo-scale throughput."""
    out = np.zeros((height, rowbytes), dtype=np.uint8)
    zeros = np.zeros(rowbytes, dtype=np.int32)
    pos = 0
    for y in range(height):
        ft = int(raw[pos])
        row = raw[pos + 1 : pos + 1 + rowbytes].astype(np.int32)
        pos += 1 + rowbytes
        prev = out[y - 1].astype(np.int32) if y else zeros
        if ft == 0:
            cur = row
        elif ft == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ft in (1, 3, 4):
            cur = np.empty(rowbytes, dtype=np.int32)
            for x in range(rowbytes):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                if ft == 1:  # Sub
                    v = row[x] + a
                elif ft == 3:  # Average
                    v = row[x] + ((a + b) >> 1)
                else:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    v = row[x] + pred
                cur[x] = v & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = cur.astype(np.uint8)
    return out


#: Adam7 interlace passes: (x_start, y_start, x_step, y_step)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → H×W×C uint8 array.  8-bit gray/gray+alpha/RGB/RGBA,
    8-bit palette (PLTE, optional tRNS alpha), interlaced (Adam7) or not.
    Pure stdlib: chunk walk + zlib inflate + numpy unfiltering — no codec
    library needed."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    channels = None
    interlace = 0
    ctype = None
    palette = None
    trns = None
    idat = b""
    for tag, data in _png_chunks(payload):
        if tag == b"IHDR":
            width, height, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or (ctype not in _PNG_CHANNELS and ctype != 3):
                raise NotImplementedError(
                    f"PNG bit depth {depth} / color type {ctype} unsupported "
                    "(8-bit gray/RGB/±alpha/palette only)"
                )
            channels = 1 if ctype == 3 else _PNG_CHANNELS[ctype]
        elif tag == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS" and ctype == 3:
            trns = np.frombuffer(data, dtype=np.uint8)
        elif tag == b"IDAT":
            idat += data
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)

    if not interlace:
        rowbytes = width * channels
        if len(raw) != height * (rowbytes + 1):
            raise ValueError("PNG IDAT length mismatch")
        img = _png_unfilter(raw, height, rowbytes, bpp=channels).reshape(
            height, width, channels
        )
    else:
        # Adam7: each pass is an independently filtered sub-image; unfilter
        # each and scatter its pixels onto the (y_start::y_step,
        # x_start::x_step) grid of the output
        img = np.zeros((height, width, channels), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            rowbytes = pw * channels
            sub_len = ph * (rowbytes + 1)
            sub = _png_unfilter(
                raw[pos : pos + sub_len], ph, rowbytes, bpp=channels
            ).reshape(ph, pw, channels)
            img[y0::dy, x0::dx] = sub
            pos += sub_len
        if pos != len(raw):
            raise ValueError("PNG Adam7 IDAT length mismatch")

    if ctype == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        idx = img[:, :, 0]
        rgb = palette[idx]
        if trns is not None:
            alpha = np.full(256, 255, dtype=np.uint8)
            alpha[: len(trns)] = trns
            return np.dstack([rgb, alpha[idx]])
        return rgb
    return img


def encode_png(img: np.ndarray) -> bytes:
    """H×W×C (or H×W) uint8 array → PNG bytes (filter None rows, one zlib
    stream) — the thumbnail-sink twin of ``decode_png``."""
    import struct
    import zlib

    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (mono float64 waveform in [-1, 1], sample_rate).

    Own RIFF walker (the stdlib ``wave`` module only reads integer PCM):
    format tag 1 (PCM: unsigned 8-bit, signed 16/24/32-bit — 24-bit
    assembled from byte triples with vectorized sign extension), tag 3
    (IEEE float32/float64), and tag 0xFFFE (WAVE_FORMAT_EXTENSIBLE,
    resolved through the SubFormat GUID).  Unknown chunks (LIST, fact,
    cue …) are skipped with the spec's odd-length padding; multi-channel
    audio is downmixed by channel mean.  Other format tags (ADPCM,
    µ-law …) raise ``NotImplementedError`` — honest boundaries."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None  # (tag, n_ch, rate, bits)
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            tag, n_ch, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if tag == 0xFFFE:  # EXTENSIBLE: real tag leads the SubFormat GUID
                if len(body) < 26:
                    raise ValueError("truncated WAVE_FORMAT_EXTENSIBLE fmt chunk")
                tag = struct.unpack("<H", body[24:26])[0]
            fmt = (tag, n_ch, rate, bits)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, n_ch, rate, bits = fmt

    if tag == 1:  # integer PCM
        if bits == 8:  # 8-bit PCM is UNSIGNED, midpoint 128
            out = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        elif bits == 16:
            out = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            b3 = np.frombuffer(data[: len(data) - len(data) % 3], dtype=np.uint8)
            b3 = b3.reshape(-1, 3).astype(np.int32)
            v = b3[:, 0] | (b3[:, 1] << 8) | (b3[:, 2] << 16)
            v = np.where(v >= 1 << 23, v - (1 << 24), v)  # sign extend
            out = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            out = np.frombuffer(data, dtype="<i4").astype(np.float64) / float(1 << 31)
        else:
            raise NotImplementedError(f"PCM sample width {bits}-bit unsupported")
    elif tag == 3:  # IEEE float
        if bits == 32:
            out = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            out = np.frombuffer(data, dtype="<f8").astype(np.float64)
        else:
            raise NotImplementedError(f"float sample width {bits}-bit unsupported")
    else:
        raise NotImplementedError(f"WAV format tag {tag} unsupported (PCM/float only)")
    if n_ch > 1:
        out = out[: len(out) - len(out) % n_ch].reshape(-1, n_ch).mean(axis=1)
    return out, rate


def encode_wav(wave_f64: np.ndarray, sample_rate: int) -> bytes:
    """Mono float64 waveform in [-1, 1] → WAV (RIFF PCM16) bytes."""
    import io
    import wave as wave_mod

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(
            np.clip(np.round(wave_f64 * 32768.0), -32768, 32767)
            .astype("<i2")
            .tobytes()
        )
    return buf.getvalue()


def decode_image(payload: bytes, width: int, height: int, channels: int, fmt: str) -> np.ndarray:
    """binary → H×W×C uint8 array.  ``raw`` buffers use the metadata
    shape; ``png``/``jpeg`` decode their own dimensions (and they win — a
    metadata mismatch raises rather than silently trusting either side)."""
    _require_decodable(fmt, "image", IMAGE_FORMATS)
    if fmt in ("png", "jpeg"):
        if fmt == "png":
            img = decode_png(bytes(payload))
        else:
            from .jpeg import decode_jpeg

            img = decode_jpeg(bytes(payload))
        h, w, _c = img.shape
        if width and height and (w != width or h != height):
            raise ValueError(
                f"{fmt.upper()} dimensions {w}x{h} contradict metadata "
                f"{width}x{height}"
            )
        return img
    arr = np.frombuffer(payload, dtype=np.uint8)
    return arr[: width * height * channels].reshape(height, width, channels)


def decode_audio(payload: bytes, fmt: str) -> np.ndarray:
    """binary → float64 waveform in [-1, 1] from int16 PCM, WAV, or
    MPEG-1 audio.  "mp1"/"mp3" route to ``sources/mpeg_audio``: Layer I
    streams decode to PCM for real; a Layer II/III payload raises with
    the honest reason (non-derivable spec tables — see that module's
    docstring), and ``mpeg_audio.stream_info`` still yields its
    duration/bitrate metadata for corpus triage."""
    _require_decodable(fmt, "audio", AUDIO_FORMATS)
    if fmt == "wav":
        return decode_wav(bytes(payload))[0]
    if fmt in ("mp1", "mp3"):
        from .mpeg_audio import decode_layer1

        return decode_layer1(bytes(payload))[0]
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
                ih, iw, ic = img.shape
                flat = img.reshape(-1, ic).astype(np.float64)
                rows.append(
                    {
                        "media_id": r.media_id,
                        "mean_rgb": flat.mean(axis=0).tolist(),
                        "std_rgb": flat.std(axis=0).tolist(),
                        "brightness": float(flat.mean() / 255.0),
                        "n_pixels": int(ih * iw),
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
                ih, iw, ic = img.shape
                ys = (np.arange(out_h) * ih / out_h).astype(int)
                xs = (np.arange(out_w) * iw / out_w).astype(int)
                small = img[np.ix_(ys, xs)]
                rows.append(
                    {
                        "media_id": r.media_id,
                        "payload": small.tobytes(),
                        "width": out_w,
                        "height": out_h,
                        "channels": int(ic),
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
                _require_decodable(r.format, "video", RAW_FORMATS)
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


AUDIO_STREAM_INFO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("layer", IntegerType()),
        StructField("bitrate_kbps", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("vbr_header", StringType()),  # Xing | Info | NULL
        StructField("is_vbr", BooleanType()),
        StructField("avg_bitrate_kbps", DoubleType()),
        StructField("decodable", StringType()),  # pcm | metadata_only | error
    ]
)


def audio_stream_info(df: DataFrame) -> DataFrame:
    """Corpus triage over MPEG-1 audio payloads: one Arrow pass emitting
    per-file layer/bitrate/duration metadata WITHOUT decoding PCM — the
    operation a 100 TB audio corpus actually needs first (duration
    accounting, bitrate histograms, partitioning decisions).  Works on
    Layer III ("mp3") files even though their PCM decode is out of scope;
    ``decodable`` says which rows the Layer I PCM path can take
    ("pcm"), which are metadata-only ("metadata_only"), and which
    payloads carry no parseable frames ("error" — kept as rows, never a
    pipeline crash, mirroring the dead-letter pattern)."""
    from .mpeg_audio import stream_info

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in AUDIO_STREAM_INFO_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    info = stream_info(bytes(r.payload))
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "layer": info["layer"],
                            "bitrate_kbps": info["bitrate_kbps"],
                            "sample_rate": info["sample_rate"],
                            "n_frames": info["n_frames"],
                            "duration_s": info["duration_s"],
                            "vbr_header": info["vbr_header"],
                            "is_vbr": info["is_vbr"],
                            "avg_bitrate_kbps": info["avg_bitrate_kbps"],
                            "decodable": "pcm"
                            if info["layer"] == 1
                            else "metadata_only",
                        }
                    )
                except ValueError:
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "layer": None,
                            "bitrate_kbps": None,
                            "sample_rate": None,
                            "n_frames": None,
                            "duration_s": None,
                            "vbr_header": None,
                            "is_vbr": None,
                            "avg_bitrate_kbps": None,
                            "decodable": "error",
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.where(df.format.isin("mp1", "mp3")).mapInPandas(
        extract, AUDIO_STREAM_INFO_SCHEMA
    )


# ---------------------------------------------------------------------------
# Perceptual image hashing + image near-dedup (curation on the image axis)
# ---------------------------------------------------------------------------

def _area_mean_grid(luma: np.ndarray, nr: int, nc: int) -> np.ndarray:
    """nr×nc grid of cell means.  Area-averaging (reduceat over edge
    buckets) when the image has at least one pixel per cell; nearest
    sampling for degenerate tiny inputs."""
    ih, iw = luma.shape
    if ih >= nr and iw >= nc:
        re = np.arange(nr) * ih // nr
        ce = np.arange(nc) * iw // nc
        sums = np.add.reduceat(np.add.reduceat(luma, re, axis=0), ce, axis=1)
        rc = np.diff(np.append(re, ih))
        cc = np.diff(np.append(ce, iw))
        return sums / np.outer(rc, cc)
    ys = (np.arange(nr) * ih // nr).clip(0, ih - 1)
    xs = (np.arange(nc) * iw // nc).clip(0, iw - 1)
    return luma[np.ix_(ys, xs)].astype(np.float64)


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash (public method: the classic dHash —
    gradient-sign fingerprint): ITU-R 601 luma, area-mean downsample to
    an 8×9 grid, one bit per horizontal neighbor comparison.  Robust to
    resizing, recompression and small noise; NOT to crops/rotations
    (that is an embedding model's job).  Returns a SIGNED 64-bit int so
    the value round-trips a Spark LongType column exactly."""
    f = img.astype(np.float64)
    luma = (
        0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
        if f.ndim == 3 and f.shape[2] >= 3
        else (f[:, :, 0] if f.ndim == 3 else f)
    )
    small = _area_mean_grid(luma, 8, 9)
    bits = (small[:, 1:] > small[:, :-1]).astype(np.uint64).ravel()
    v = np.uint64(0)
    for bit in bits:
        v = (v << np.uint64(1)) | bit
    return int(v.view(np.int64))


IMAGE_DHASH_SCHEMA = StructType(
    [StructField("media_id", LongType()), StructField("dhash", LongType())]
)


def image_dhash(df: DataFrame) -> DataFrame:
    """(media_id, dhash) for every decodable image row — one narrow
    Arrow pass over payloads (decode + hash in the kernel)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = decode_image(r.payload, r.width, r.height, r.channels, r.format)
                rows.append({"media_id": r.media_id, "dhash": dhash64(img)})
            yield pd.DataFrame(rows, columns=["media_id", "dhash"])

    return df.where(df.kind == "image").mapInPandas(extract, IMAGE_DHASH_SCHEMA)


def near_dup_images(df: DataFrame, max_hamming: int = 4) -> DataFrame:
    """Image near-dup pairs (id_a, id_b, hamming): dHash fingerprints →
    pigeonhole-banded exact hamming join (``dedup.hamming_near_dup_pairs``
    — guaranteed recall at ``max_hamming``, never all-pairs).  The
    image-axis twin of the text MinHash pipeline: decode cost is one
    narrow pass, pairing shuffles 8-byte hashes only."""
    from bigdataproject_formula1_telemetry_spark.operators.dedup import (
        hamming_near_dup_pairs,
    )

    return hamming_near_dup_pairs(
        image_dhash(df), hash_col="dhash", id_col="media_id",
        max_hamming=max_hamming,
    )


SCENE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("hamming_prev", IntegerType()),
        StructField("is_scene_change", BooleanType()),
    ]
)


def scene_changes(df: DataFrame, threshold: int = 16) -> DataFrame:
    """Video scene-boundary detection by perceptual frame differencing:
    per frame, a dHash fingerprint; a frame whose hamming distance to
    its predecessor reaches ``threshold`` starts a new scene (frame 0
    always does; ``hamming_prev`` is NULL there).  The standard first
    stage of video curation — sample one frame per scene instead of
    every-nth, dedup near-static clips — and a pure composition of the
    in-repo pieces (raw-frame walk + ``dhash64``).  One narrow Arrow
    pass; a video's frames stay inside one kernel call, so no
    shuffle and no window function."""

    def detect(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                _require_decodable(r.format, "video", RAW_FORMATS)
                frame_size = r.width * r.height * r.channels
                buf = np.frombuffer(r.payload, dtype=np.uint8)
                n = min(r.n_frames, len(buf) // frame_size)
                prev = None
                for i in range(n):
                    img = buf[i * frame_size : (i + 1) * frame_size].reshape(
                        r.height, r.width, r.channels
                    )
                    h = dhash64(img)
                    if prev is None:
                        rows.append(
                            {
                                "media_id": r.media_id,
                                "frame_idx": i,
                                "hamming_prev": None,
                                "is_scene_change": True,
                            }
                        )
                    else:
                        hd = int(bin((h ^ prev) & 0xFFFFFFFFFFFFFFFF).count("1"))
                        rows.append(
                            {
                                "media_id": r.media_id,
                                "frame_idx": i,
                                "hamming_prev": hd,
                                "is_scene_change": hd >= threshold,
                            }
                        )
                    prev = h
            out = pd.DataFrame(rows, columns=[f.name for f in SCENE_SCHEMA.fields])
            out["hamming_prev"] = out["hamming_prev"].astype("Int32")
            yield out

    return df.where(df.kind == "video").mapInPandas(detect, SCENE_SCHEMA)


AUDIO_FP_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("audio_fp", LongType()),
        StructField("n_valid_bits", IntegerType()),
    ]
)


def audio_fingerprint_with_validity(
    wave: np.ndarray, n_windows: int = 65
) -> tuple[int, int]:
    """(fingerprint, n_valid_bits): 64-bit envelope fingerprint — RMS
    energy over 65 equal windows, one bit per consecutive-window energy
    comparison — the 1-D analog of ``dhash64`` (gradient-sign coding;
    public folklore construction, the same family as dHash).  Robust to
    gain changes (comparisons are scale-invariant) and small edits; NOT
    to time-shifts (that needs a real spectral fingerprint).

    Clips too short to fill the window budget yield fewer than 64 real
    comparison bits; the fingerprint is zero-padded to 64 bits but
    ``n_valid_bits`` reports how many are real, so comparers can mask
    or exclude the pad (agreeing pad bits are not evidence of
    similarity — two unrelated short clips share every pad bit)."""
    if len(wave) == 0:
        return 0, 0
    edges = (np.arange(n_windows + 1) * len(wave)) // n_windows
    edges = np.unique(edges)
    if len(edges) - 1 < 2:
        return 0, 0
    sq = np.concatenate([[0.0], np.cumsum(np.asarray(wave, dtype=np.float64) ** 2)])
    e = np.diff(sq[edges]) / np.maximum(np.diff(edges), 1)
    bits = (e[1:] > e[:-1]).astype(np.uint64)
    n_valid = min(len(bits), 64)
    if len(bits) < 64:
        bits = np.concatenate([bits, np.zeros(64 - len(bits), dtype=np.uint64)])
    v = np.uint64(0)
    for bit in bits[:64]:
        v = (v << np.uint64(1)) | bit
    return int(v.view(np.int64)), n_valid


def audio_fingerprint64(wave: np.ndarray, n_windows: int = 65) -> int:
    """The fingerprint half of ``audio_fingerprint_with_validity`` (kept
    as the simple scalar form for full-length clips)."""
    return audio_fingerprint_with_validity(wave, n_windows)[0]


def audio_fingerprints(df: DataFrame) -> DataFrame:
    """(media_id, audio_fp, n_valid_bits) for every decodable audio row —
    one narrow Arrow pass (decode + envelope hash in the kernel)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                wave = decode_audio(r.payload, r.format)
                fp, nv = audio_fingerprint_with_validity(wave)
                rows.append(
                    {"media_id": r.media_id, "audio_fp": fp, "n_valid_bits": nv}
                )
            out = pd.DataFrame(
                rows, columns=["media_id", "audio_fp", "n_valid_bits"]
            )
            if len(out):
                out["n_valid_bits"] = out["n_valid_bits"].astype("int32")
            yield out

    return df.where(df.kind == "audio").mapInPandas(extract, AUDIO_FP_SCHEMA)


def near_dup_audio(df: DataFrame, max_hamming: int = 4) -> DataFrame:
    """Audio near-dup pairs via the shared pigeonhole hamming join —
    the audio leg of the multimodal dedup triangle (text MinHash/SimHash,
    image dHash, audio envelope fingerprint).

    Only clips with a FULL 64 valid comparison bits enter the join:
    shorter clips share their zero pad bits, and agreeing pad would
    count toward hamming similarity, matching unrelated short clips
    (a <65-sample clip has no meaningful envelope anyway).  Inspect
    ``audio_fingerprints(df).where("n_valid_bits < 64")`` to triage the
    excluded rows."""
    from bigdataproject_formula1_telemetry_spark.operators.dedup import (
        hamming_near_dup_pairs,
    )

    fps = audio_fingerprints(df).where(F.col("n_valid_bits") == 64)
    return hamming_near_dup_pairs(
        fps.drop("n_valid_bits"), hash_col="audio_fp", id_col="media_id",
        max_hamming=max_hamming,
    )


IMAGE_STREAM_INFO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("container", StringType()),     # png | jpeg | raw | NULL
        StructField("img_width", IntegerType()),
        StructField("img_height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("bit_depth", IntegerType()),
        StructField("profile", StringType()),       # png color-type / jpeg SOFn
        StructField("subsampling", StringType()),   # jpeg: 4:4:4 / 4:2:0 / ...
        StructField("decodable", StringType()),     # pixels | metadata_only | error
    ]
)


def _png_header_info(payload: bytes) -> dict:
    if len(payload) < 33 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    import struct as _st

    length, tag = _st.unpack(">I4s", payload[8:16])
    if tag != b"IHDR" or length != 13:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, _comp, _filt, interlace = _st.unpack(
        ">IIBBBBB", payload[16:29]
    )
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    name = {0: "gray", 2: "rgb", 3: "palette", 4: "gray+alpha", 6: "rgba"}.get(
        ctype, f"ctype{ctype}"
    )
    if interlace:
        name += "+interlaced"
    return {
        "container": "png",
        "img_width": int(w),
        "img_height": int(h),
        "n_channels": channels,
        "bit_depth": int(depth),
        "profile": name,
        "subsampling": None,
        # mirrors decode_png's support: 8-bit gray/rgb/rgba, no interlace
        "decodable": "pixels"
        if depth == 8 and ctype in (0, 2, 6) and not interlace
        else "metadata_only",
    }


def _jpeg_header_info(payload: bytes) -> dict:
    """Walk JPEG markers to the first SOFn — structure only, no entropy
    decode (same marker rules as sources/jpeg.py: 0xFF fill bytes and
    length-less TEM/RSTn skipped)."""
    import struct as _st

    if len(payload) < 4 or payload[0] != 0xFF or payload[1] != 0xD8:
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        while pos < len(payload) and payload[pos] == 0xFF:
            pos += 1
        if pos >= len(payload):
            break
        marker = payload[pos]
        pos += 1
        if marker in (0x01, *range(0xD0, 0xD8)):  # TEM / RSTn: no length
            continue
        if marker == 0xD9:  # EOI before SOF
            break
        (seglen,) = _st.unpack(">H", payload[pos : pos + 2])
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            depth, h, w, nc = _st.unpack(">BHHB", payload[pos + 2 : pos + 8])
            comps = payload[pos + 8 : pos + 8 + 3 * nc]
            sub = None
            if nc == 3:
                hv = [(comps[3 * i + 1] >> 4, comps[3 * i + 1] & 0xF) for i in range(3)]
                key = (hv[0], hv[1], hv[2])
                sub = {
                    ((1, 1), (1, 1), (1, 1)): "4:4:4",
                    ((2, 2), (1, 1), (1, 1)): "4:2:0",
                    ((2, 1), (1, 1), (1, 1)): "4:2:2",
                }.get(key, f"{hv}")
            kind = marker - 0xC0
            return {
                "container": "jpeg",
                "img_width": int(w),
                "img_height": int(h),
                "n_channels": int(nc),
                "bit_depth": int(depth),
                "profile": f"SOF{kind}"
                + (" baseline" if kind == 0 else " progressive" if kind == 2 else ""),
                "subsampling": sub,
                # mirrors decode_jpeg's support: SOF0/SOF2
                "decodable": "pixels" if kind in (0, 2) else "metadata_only",
            }
        pos += seglen
    raise ValueError("JPEG missing SOF")


def _gif_header_info(payload: bytes) -> dict:
    """GIF87a/89a logical screen descriptor (public spec: 6-byte
    signature, then LE width/height and a packed field whose low 3 bits
    give the global-palette depth)."""
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    import struct as _st

    w, h, packed = _st.unpack("<HHB", payload[6:11])
    return {
        "container": "gif",
        "img_width": int(w),
        "img_height": int(h),
        "n_channels": 3,
        "bit_depth": (packed & 0x07) + 1,  # bits per palette channel
        "profile": payload[3:6].decode("ascii"),
        "subsampling": None,
        "decodable": "metadata_only",  # LZW pixel decode not implemented
    }


def _webp_header_info(payload: bytes) -> dict:
    """WebP dimensions from the RIFF container (public container spec):
    lossy VP8 (frame-tag + start code + 14-bit dims), lossless VP8L
    (14-bit minus-one dims), extended VP8X (24-bit minus-one canvas)."""
    if len(payload) < 16 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP")
    import struct as _st

    fourcc = payload[12:16]
    base = {"container": "webp", "n_channels": 3, "bit_depth": 8,
            "subsampling": None, "decodable": "metadata_only"}
    if fourcc == b"VP8 " and len(payload) >= 30:
        # 3-byte frame tag, 3-byte start code 9D 01 2A, then 14-bit dims
        if payload[23:26] != b"\x9d\x01\x2a":
            raise ValueError("WebP VP8 start code missing")
        w, h = _st.unpack("<HH", payload[26:30])
        base.update(
            img_width=w & 0x3FFF, img_height=h & 0x3FFF, profile="VP8",
            subsampling="4:2:0",
        )
        return base
    if fourcc == b"VP8L" and len(payload) >= 25:
        if payload[20] != 0x2F:
            raise ValueError("WebP VP8L signature byte missing")
        bits = _st.unpack("<I", payload[21:25])[0]
        base.update(
            img_width=(bits & 0x3FFF) + 1,
            img_height=((bits >> 14) & 0x3FFF) + 1,
            profile="VP8L",
            n_channels=4,  # lossless carries alpha
        )
        return base
    if fourcc == b"VP8X" and len(payload) >= 30:
        w = int.from_bytes(payload[24:27], "little") + 1
        h = int.from_bytes(payload[27:30], "little") + 1
        base.update(img_width=w, img_height=h, profile="VP8X")
        return base
    raise ValueError(f"unknown WebP chunk {fourcc!r}")


def image_stream_info(df: DataFrame) -> DataFrame:
    """Corpus triage over image payloads WITHOUT pixel decode — the
    image analog of ``audio_stream_info``: one Arrow pass parsing only
    the container headers (PNG IHDR / JPEG SOF marker walk / GIF
    logical screen descriptor / WebP VP8-VP8L-VP8X dimensions),
    emitting dimensions, channel count, bit depth, profile and chroma
    subsampling per row.  ``decodable`` mirrors the in-repo codecs'
    actual support; unparseable payloads become dead-letter rows
    ("error"), never a crash.  At 100 TB this is the first scan an image
    corpus gets (dimension/profile histograms, partitioning, decode
    planning) and it reads only the leading bytes of each blob."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in IMAGE_STREAM_INFO_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                base = {c: None for c in cols}
                base["media_id"] = r.media_id
                payload = bytes(r.payload)
                try:
                    if r.format == "png" or payload[:8] == b"\x89PNG\r\n\x1a\n":
                        base.update(_png_header_info(payload))
                    elif r.format == "jpeg" or payload[:2] == b"\xff\xd8":
                        base.update(_jpeg_header_info(payload))
                    elif r.format == "gif" or payload[:6] in (
                        b"GIF87a", b"GIF89a"
                    ):
                        base.update(_gif_header_info(payload))
                    elif r.format == "webp" or (
                        payload[:4] == b"RIFF" and payload[8:12] == b"WEBP"
                    ):
                        base.update(_webp_header_info(payload))
                    elif r.format in RAW_FORMATS:
                        base.update(
                            {
                                "container": "raw",
                                "img_width": r.width,
                                "img_height": r.height,
                                "n_channels": r.channels,
                                "bit_depth": 8,
                                "profile": "raw",
                                "subsampling": None,
                                "decodable": "pixels",
                            }
                        )
                    else:
                        base["decodable"] = "error"
                except Exception:  # noqa: BLE001 — dead-letter row, never a crash
                    base = {c: None for c in cols}
                    base["media_id"] = r.media_id
                    base["decodable"] = "error"
                rows.append(base)
            yield pd.DataFrame(rows, columns=cols)

    return df.where(df.kind == "image").mapInPandas(
        extract, IMAGE_STREAM_INFO_SCHEMA
    )


def sample_scene_frames(df: DataFrame, threshold: int = 16) -> DataFrame:
    """Video → ONE representative frame per detected scene (the frame
    that opens it), instead of ``sample_frames``'s blind every-nth: a
    near-static clip yields a single frame, a fast-cut montage yields
    one per cut — the content-adaptive sampling a vision-training
    pipeline wants.  Same per-frame dHash differencing as
    ``scene_changes``, fused into one kernel so frames are decoded
    once.  Output schema matches ``sample_frames`` (``frame_idx`` is
    the scene's opening frame)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                _require_decodable(r.format, "video", RAW_FORMATS)
                frame_size = r.width * r.height * r.channels
                buf = np.frombuffer(r.payload, dtype=np.uint8)
                n = min(r.n_frames, len(buf) // frame_size)
                prev = None
                for i in range(n):
                    img = buf[i * frame_size : (i + 1) * frame_size].reshape(
                        r.height, r.width, r.channels
                    )
                    h = dhash64(img)
                    is_cut = prev is None or (
                        bin((h ^ prev) & 0xFFFFFFFFFFFFFFFF).count("1")
                        >= threshold
                    )
                    if is_cut:
                        rows.append(
                            {
                                "media_id": r.media_id,
                                "frame_idx": i,
                                "payload": img.tobytes(),
                                "width": r.width,
                                "height": r.height,
                                "channels": r.channels,
                            }
                        )
                    prev = h
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.where(df.kind == "video").mapInPandas(sample, FRAME_SCHEMA)


def _dedup_by_pairs(df: DataFrame, pairs: DataFrame) -> DataFrame:
    """Survivors from a (id_a, id_b, …) near-dup pair frame: connected
    components over the duplicate graph, keep each component's minimum
    media_id (transitive chains A~B~C collapse to one survivor — the
    ``dedup.near_dedup_clustered`` semantics on the media axis)."""
    from pyspark.sql import functions as F

    from bigdataproject_formula1_telemetry_spark.operators.dedup import (
        connected_components,
    )

    comp = connected_components(pairs.select("id_a", "id_b"))
    losers = comp.where(F.col("id") != F.col("component")).select(
        F.col("id").alias("media_id")
    )
    return df.join(losers, "media_id", "left_anti")


def dedup_images(df: DataFrame, max_hamming: int = 4) -> DataFrame:
    """Image rows minus perceptual near-duplicates (keep each duplicate
    component's lowest media_id).  Non-image rows pass through."""
    pairs = near_dup_images(df.where(df.kind == "image"), max_hamming)
    return df.where(df.kind != "image").unionByName(
        _dedup_by_pairs(df.where(df.kind == "image"), pairs)
    )


def dedup_audio(df: DataFrame, max_hamming: int = 4) -> DataFrame:
    """Audio rows minus envelope-fingerprint near-duplicates (component
    min survives).  Non-audio rows pass through."""
    pairs = near_dup_audio(df.where(df.kind == "audio"), max_hamming)
    return df.where(df.kind != "audio").unionByName(
        _dedup_by_pairs(df.where(df.kind == "audio"), pairs)
    )
