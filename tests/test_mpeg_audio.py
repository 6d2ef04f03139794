"""MPEG-1 audio codec tests: Layer I round-trip through the real
bitstream, frame-walker metadata for all layers, honest raise paths,
and the Spark feature pipeline over an encoded stream."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark.sources import mpeg_audio as M
from bigdataproject_formula1_telemetry_spark.sources import multimodal as MM

_DELAY = 480  # analysis+synthesis group delay: TAPS - NBANDS samples


def _snr_db(ref: np.ndarray, out: np.ndarray) -> float:
    n = min(len(ref), len(out))
    a, b = ref[: n - _DELAY], out[_DELAY:n]
    return 10 * math.log10(float(np.mean(a**2)) / float(np.mean((a - b) ** 2)))


def test_layer1_roundtrip_snr():
    fs = 32000
    t = np.arange(fs)
    signals = {
        "tones": 0.4 * np.sin(2 * np.pi * 440 * t / fs)
        + 0.25 * np.sin(2 * np.pi * 1870 * t / fs)
        + 0.15 * np.sin(2 * np.pi * 5210 * t / fs),
        "noise": np.clip(
            0.3 * np.random.default_rng(0).standard_normal(fs), -0.95, 0.95
        ),
        "chirp": 0.6 * np.sin(2 * np.pi * (200 + 3000 * t / fs) * t / fs),
    }
    for name, pcm in signals.items():
        enc = M.encode_layer1(pcm, sample_rate=fs, bitrate_kbps=448)
        dec, fs2 = M.decode_layer1(enc)
        assert fs2 == fs
        snr = _snr_db(pcm, dec)
        # near-PR pseudo-QMF + 13-bit quantization: well above "audible
        # artifact" territory, well below bit-exact (see module docstring)
        assert snr > 30.0, (name, snr)


def test_layer1_roundtrip_all_sample_rates():
    t = np.arange(12 * 384)
    for fs in (32000, 44100, 48000):
        pcm = 0.5 * np.sin(2 * np.pi * 500 * t / fs)
        dec, fs2 = M.decode_layer1(M.encode_layer1(pcm, sample_rate=fs))
        assert fs2 == fs
        assert _snr_db(pcm, dec) > 25.0


def test_stream_info_layer1():
    pcm = 0.3 * np.sin(2 * np.pi * 0.02 * np.arange(384 * 10))
    enc = M.encode_layer1(pcm, sample_rate=32000, bitrate_kbps=448)
    info = M.stream_info(enc)
    assert info["layer"] == 1
    assert info["bitrate_kbps"] == 448
    assert info["sample_rate"] == 32000
    assert info["n_frames"] == 10
    assert info["duration_s"] == pytest.approx(3840 / 32000)


def _fake_layer3_frame() -> bytes:
    # valid MPEG-1 Layer III header (128 kbps @ 44100, mono) + zero body:
    # enough for the frame walker, NOT a decodable stream
    hdr = bytes([0xFF, 0xFB, 0x90 | 0x00, 0xC0])
    frame_len = 144 * 128000 // 44100
    return hdr + b"\x00" * (frame_len - 4)


def test_stream_info_walks_layer3_but_decode_raises_honestly():
    payload = b"garbagehead" + _fake_layer3_frame() * 7
    info = M.stream_info(payload)
    assert info["layer"] == 3
    assert info["n_frames"] == 7
    assert info["duration_s"] == pytest.approx(7 * 1152 / 44100)
    with pytest.raises(NotImplementedError, match="Huffman"):
        M.decode_layer1(payload)


def test_truncated_tail_and_resync():
    pcm = 0.3 * np.sin(2 * np.pi * 0.01 * np.arange(384 * 4))
    enc = M.encode_layer1(pcm, sample_rate=32000, bitrate_kbps=448)
    # leading garbage forces a resync; truncated last frame is dropped
    mangled = b"\x00\x01\x02" + enc[:-17]
    info = M.stream_info(mangled)
    assert info["n_frames"] == 3


def test_scalefactor_table_is_spec_formula():
    # Annex 3-B.1 spot values: index 0 = 2.0, index 3 = 1.0, index 6 = 0.5
    assert M.SCALEFACTORS[0] == pytest.approx(2.0)
    assert M.SCALEFACTORS[3] == pytest.approx(1.0)
    assert M.SCALEFACTORS[6] == pytest.approx(0.5)
    assert len(M.SCALEFACTORS) == 63


def test_decode_audio_routes_mp3_and_features_flow(spark):
    fs = 32000
    t = np.arange(384 * 16)
    pcm = 0.5 * np.sin(2 * np.pi * 440 * t / fs)
    enc = M.encode_layer1(pcm, sample_rate=fs, bitrate_kbps=448)
    wave = MM.decode_audio(enc, "mp3")
    assert len(wave) == len(pcm)
    assert float(np.max(np.abs(wave))) <= 1.0

    rows = [(1, "audio", "mp3", bytearray(enc), None, None, 1, fs, None)]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    feats = MM.audio_window_features(media, window_samples=1024).toPandas()
    assert len(feats) == len(pcm) // 1024
    # the 440 Hz tone has rms ≈ 0.5/√2 in every full window (skip the
    # filterbank warm-up window)
    assert feats["rms"].iloc[1:].between(0.30, 0.40).all()
    assert (feats["media_id"] == 1).all()


def test_audio_stream_info_operator_triage(spark):
    """One Arrow pass triages a mixed corpus: Layer I rows are
    pcm-decodable, Layer III rows yield metadata only, garbage becomes an
    error row instead of failing the job."""
    fs = 32000
    pcm = 0.3 * np.sin(2 * np.pi * 440 * np.arange(384 * 5) / fs)
    l1 = M.encode_layer1(pcm, sample_rate=fs, bitrate_kbps=448)
    l3 = _fake_layer3_frame() * 4
    rows = [
        (1, "audio", "mp3", bytearray(l1), None, None, 1, fs, None),
        (2, "audio", "mp3", bytearray(l3), None, None, 1, 44100, None),
        (3, "audio", "mp3", bytearray(b"not audio at all"), None, None, 1, None, None),
        (4, "audio", "wav", bytearray(b"RIFF...."), None, None, 1, None, None),
    ]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    got = {r.media_id: r for r in MM.audio_stream_info(media).collect()}
    assert set(got) == {1, 2, 3}  # the wav row is filtered, not an error
    assert got[1].decodable == "pcm" and got[1].layer == 1 and got[1].n_frames == 5
    assert got[2].decodable == "metadata_only" and got[2].layer == 3
    assert got[2].duration_s == pytest.approx(4 * 1152 / 44100)
    assert got[3].decodable == "error" and got[3].layer is None


def test_frame_walker_never_crashes_on_fuzz():
    """Corpus triage must survive arbitrary bytes: the walker either
    yields frames or raises the documented ValueError — never crashes,
    never loops forever (hypothesis over random payloads + mutations of
    a valid stream)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    pcm = 0.2 * np.sin(2 * np.pi * 0.01 * np.arange(384 * 2))
    valid = M.encode_layer1(pcm, sample_rate=32000, bitrate_kbps=448)

    @settings(max_examples=200, deadline=None, derandomize=True)
    @given(st.binary(max_size=400), st.integers(0, len(valid)))
    def run(junk, cut):
        payload = junk + valid[cut:]
        try:
            info = M.stream_info(payload)
            assert info["n_frames"] >= 1
        except ValueError:
            pass  # "no MPEG-1 audio frames found" — the documented outcome

    run()


def test_layer1_stereo_roundtrip_downmixes_to_mono():
    """Stereo (mode 0) streams decode with the §2.4.1.5 interleaving and
    downmix to the channel average, like the WAV path."""
    fs = 32000
    t = np.arange(384 * 12)
    left = 0.5 * np.sin(2 * np.pi * 440 * t / fs)
    right = 0.5 * np.sin(2 * np.pi * 1250 * t / fs)
    enc = M.encode_layer1(np.stack([left, right], axis=1), sample_rate=fs)
    info = M.stream_info(enc)
    assert info["mode"] == 0 and info["n_frames"] == 12
    dec, fs2 = M.decode_layer1(enc)
    assert fs2 == fs
    snr = _snr_db((left + right) / 2.0, dec)
    # stereo halves the per-channel bit budget (6-bit samples at this
    # bitrate) — lower fidelity than mono, still clearly reconstructing
    assert snr > 18.0, snr


def test_layer1_joint_stereo_raises():
    fs = 32000
    enc = M.encode_layer1(
        np.zeros((384, 2)), sample_rate=fs
    )
    # flip the mode bits to joint stereo (01) in every frame header
    joint = bytearray(enc)
    frame_bytes = (12 * 448000 // fs) * 4
    for off in range(0, len(joint), frame_bytes):
        joint[off + 3] = (joint[off + 3] & 0x3F) | 0x40
    with pytest.raises(NotImplementedError, match="joint"):
        M.decode_layer1(bytes(joint))


def _l3_frame(bitrate_kbps: int, body: bytes = b"") -> bytes:
    """Valid MPEG-1 Layer III mono header @44100 + zero-padded body."""
    idx = M._BITRATES[3].index(bitrate_kbps)
    hdr = bytes([0xFF, 0xFB, (idx << 4) | 0x00, 0xC0])
    frame_len = 144 * bitrate_kbps * 1000 // 44100
    body = body[: frame_len - 4]
    return hdr + body + b"\x00" * (frame_len - 4 - len(body))


def _vbr_stream(bitrates, tag: bytes | None = b"Xing") -> bytes:
    """Layer III stream; when ``tag`` is set the first frame is a
    Xing/Info tag frame (mono side-info 17 bytes -> tag at offset 21)
    carrying FRAMES|BYTES for the audio frames that follow."""
    audio = b"".join(_l3_frame(b) for b in bitrates)
    if tag is None:
        return audio
    body = bytearray(b"\x00" * 17)  # side info
    body += tag
    body += (0x3).to_bytes(4, "big")  # FRAMES | BYTES
    body += len(bitrates).to_bytes(4, "big")
    body += len(audio).to_bytes(4, "big")
    return _l3_frame(128, bytes(body)) + audio


def test_stream_info_xing_vbr():
    """Xing-tagged VBR: the tag frame is excluded from count/duration,
    header fields surface, and avg bitrate is the honest mean."""
    brs = [128, 160, 192, 128, 96]
    info = M.stream_info(_vbr_stream(brs, tag=b"Xing"))
    assert info["vbr_header"] == "Xing" and info["is_vbr"] is True
    assert info["n_frames"] == len(brs) == info["xing_frames"]
    assert info["duration_s"] == pytest.approx(len(brs) * 1152 / 44100)
    assert info["bitrate_kbps"] == 128  # first AUDIO frame, not the tag's
    audio_bytes = sum(144 * b * 1000 // 44100 for b in brs)
    assert info["xing_bytes"] == audio_bytes
    assert info["avg_bitrate_kbps"] == pytest.approx(
        audio_bytes * 8 / info["duration_s"] / 1000, abs=0.05
    )


def test_stream_info_info_tag_is_cbr():
    info = M.stream_info(_vbr_stream([128, 128, 128], tag=b"Info"))
    assert info["vbr_header"] == "Info" and info["is_vbr"] is False
    assert info["n_frames"] == 3


def test_stream_info_tagless_vbr_inferred_from_variance():
    info = M.stream_info(_vbr_stream([128, 160, 128], tag=None))
    assert info["vbr_header"] is None and info["is_vbr"] is True
    assert info["n_frames"] == 3  # no tag frame to exclude


def test_stream_info_cbr_layer1_unchanged():
    pcm = 0.3 * np.sin(2 * np.pi * 0.02 * np.arange(384 * 10))
    enc = M.encode_layer1(pcm, sample_rate=32000, bitrate_kbps=448)
    info = M.stream_info(enc)
    assert info["n_frames"] == 10 and info["bitrate_kbps"] == 448
    assert info["vbr_header"] is None and info["is_vbr"] is False
    assert info["avg_bitrate_kbps"] == pytest.approx(448.0, abs=0.5)


def test_audio_stream_info_surfaces_vbr_columns(spark):
    vbr = _vbr_stream([128, 160, 192, 128], tag=b"Xing")
    fs = 32000
    pcm = 0.3 * np.sin(2 * np.pi * 440 * np.arange(384 * 5) / fs)
    l1 = M.encode_layer1(pcm, sample_rate=fs, bitrate_kbps=448)
    rows = [
        (1, "audio", "mp3", bytearray(vbr), None, None, 1, 44100, None),
        (2, "audio", "mp3", bytearray(l1), None, None, 1, fs, None),
    ]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    got = {r.media_id: r for r in MM.audio_stream_info(media).collect()}
    assert got[1].vbr_header == "Xing" and got[1].is_vbr
    assert got[1].n_frames == 4
    assert got[1].duration_s == pytest.approx(4 * 1152 / 44100)
    assert got[2].vbr_header is None and got[2].is_vbr is False
    assert got[2].avg_bitrate_kbps == pytest.approx(448.0, abs=0.5)
