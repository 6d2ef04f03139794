"""MPEG-1 Audio (mp3 container family) from spec — the feasible subset.

Mirrors ``sources/jpeg.py``'s approach (reference parity:
the reference pipeline treats media as opaque lake blobs; here the
engine decodes them executor-side): everything that ISO/IEC 11172-3
defines by *formula* is implemented for real, and everything that
needs large non-derivable spec constant tables raises an honest
``NotImplementedError``.

Implemented for real:

- **Frame walking / stream metadata for ALL layers** (`stream_info`,
  `iter_frames`): syncword scan, MPEG-1 header fields (layer, bitrate
  index, sample rate, padding, channel mode), per-layer frame length
  arithmetic (Layer I: slots of 4 bytes, ``12·bitrate/fs``; Layers
  II/III: ``144·bitrate/fs``).  A Layer III file — the common "mp3" —
  yields exact frame count / duration / bitrate metadata even though
  its PCM decode is not implemented.
- **Layer I PCM decode + encode** (`decode_layer1` / `encode_layer1`):
  bit allocation (4 bits/subband), scalefactors (the Annex 3-B.1 table
  IS a formula: ``2.0 · 2^(-i/3)``), the Layer I linear requantizer
  (``(2^nb/(2^nb−1)) · (code/2^(nb−1) − 1 + 2^(1−nb))``), and a
  32-band cosine-modulated polyphase filterbank.

Honest limitation, stated loudly: the spec's 512-tap prototype window
(Annex 3-B.3) is a numerically-optimized constant table that cannot be
derived from a formula, so the filterbank here uses the textbook
pseudo-QMF design (Hann-windowed sinc prototype, cutoff π/64, the
classic ±π/4 phase pair for adjacent-band alias cancellation).  The
subband *bitstream* layout is spec-exact; the PCM reconstruction is
near-perfect for this module's own encoder (round-trip SNR asserted in
tests) and approximate — correct band energies, not bit-exact samples —
for external spec encoders.  Layer II needs the 3-B.2 allocation-class
tables and Layer III needs the full Huffman table set; both raise.

Public-knowledge citations: ISO/IEC 11172-3 §2.4 (frame/header layout,
requantization formulas), standard DSP literature for the pseudo-QMF
cosine-modulated filterbank.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# MPEG-1 bitrate tables, kbit/s, indexed by the 4-bit header field
# (index 0 = "free format" — unsupported here; 15 = forbidden).
_BITRATES = {
    1: [None, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    2: [None, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    3: [None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
}
_SAMPLE_RATES = [44100, 48000, 32000]  # MPEG-1; index 3 reserved

_NBANDS = 32
_TAPS = 512


@dataclass
class FrameHeader:
    offset: int
    layer: int  # 1 | 2 | 3
    bitrate_kbps: int
    sample_rate: int
    padding: int
    mode: int  # 0 stereo, 1 joint, 2 dual, 3 mono
    protected: bool  # CRC16 present after header
    frame_bytes: int
    samples: int  # PCM samples per channel in this frame


def _parse_header(data: bytes, pos: int) -> FrameHeader | None:
    if pos + 4 > len(data):
        return None
    b0, b1, b2, b3 = data[pos : pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    if (b1 >> 3) & 0x03 != 0x03:  # MPEG-1 only (version bits 11)
        return None
    layer = 4 - ((b1 >> 1) & 0x03)
    if layer == 4:
        return None
    br_idx = (b2 >> 4) & 0x0F
    sr_idx = (b2 >> 2) & 0x03
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    bitrate = _BITRATES[layer][br_idx]
    fs = _SAMPLE_RATES[sr_idx]
    padding = (b2 >> 1) & 0x01
    mode = (b3 >> 6) & 0x03
    if layer == 1:
        frame_bytes = (12 * bitrate * 1000 // fs + padding) * 4
        samples = 384
    else:
        frame_bytes = 144 * bitrate * 1000 // fs + padding
        samples = 1152
    return FrameHeader(
        offset=pos,
        layer=layer,
        bitrate_kbps=bitrate,
        sample_rate=fs,
        padding=padding,
        mode=mode,
        protected=not (b1 & 0x01),
        frame_bytes=frame_bytes,
        samples=samples,
    )


def iter_frames(payload: bytes):
    """Yield ``FrameHeader`` for every frame in an MPEG-1 audio stream.

    Resyncs on garbage (ID3 tags, truncated tails) by scanning forward
    for the next valid syncword — the standard recovery behavior."""
    pos = 0
    n = len(payload)
    while pos + 4 <= n:
        hdr = _parse_header(payload, pos)
        if hdr is None:
            pos += 1
            continue
        if pos + hdr.frame_bytes > n:
            break  # truncated final frame
        yield hdr
        pos += hdr.frame_bytes


def parse_xing(payload: bytes, hdr: FrameHeader) -> dict | None:
    """Xing/Info VBR header, if the given (first) frame carries one.

    Public structure (the de-facto VBR standard, documented across
    decoder implementations): inside the first Layer III frame, after
    the side-info region — 17 bytes for MPEG-1 mono, 32 otherwise,
    following the 4-byte header and optional 2-byte CRC — a 4-byte
    ASCII tag ``Xing`` (VBR) or ``Info`` (CBR, LAME convention), then a
    32-bit big-endian flags word (bit0 FRAMES, bit1 BYTES, bit2 TOC,
    bit3 QUALITY) and the flagged fields in order: frame count (not
    counting the tag frame itself), stream byte count, 100-byte seek
    TOC, quality indicator.  Returns None when absent; Layer I/II
    frames never carry one (it lives in Layer III side-info space)."""
    if hdr.layer != 3:
        return None
    side = 17 if hdr.mode == 3 else 32
    pos = hdr.offset + 4 + (2 if hdr.protected else 0) + side
    tag = payload[pos : pos + 4]
    if tag not in (b"Xing", b"Info"):
        return None
    if pos + 8 > len(payload):
        return None
    flags = int.from_bytes(payload[pos + 4 : pos + 8], "big")
    p = pos + 8
    out: dict = {"tag": tag.decode(), "frames": None, "bytes": None,
                 "toc": None, "quality": None}
    try:
        if flags & 0x1:
            out["frames"] = int.from_bytes(payload[p : p + 4], "big")
            p += 4
        if flags & 0x2:
            out["bytes"] = int.from_bytes(payload[p : p + 4], "big")
            p += 4
        if flags & 0x4:
            out["toc"] = payload[p : p + 100]
            p += 100
        if flags & 0x8:
            out["quality"] = int.from_bytes(payload[p : p + 4], "big")
    except IndexError:  # truncated tag — treat as absent, not fatal
        return None
    if p > hdr.offset + hdr.frame_bytes or p > len(payload):
        return None
    return out


def stream_info(payload: bytes) -> dict:
    """Metadata for any MPEG-1 audio stream (including Layer III):
    frame count, duration, layer/bitrate/sample-rate of the first frame.
    This is the scale-relevant operation — corpus triage and duration
    accounting don't need PCM.

    VBR awareness: the walker counts every frame, so ``duration_s`` is
    exact for VBR streams too — but the first frame of a VBR file is
    usually a silent Xing/Info TAG frame, which a naive count would
    include (overstating duration by one frame) while reporting the tag
    frame's bitrate as THE bitrate (meaningless on VBR).  When a
    Xing/Info header is present the tag frame is excluded from
    ``n_frames``/``duration_s``, ``vbr_header``/``xing_frames``/
    ``xing_bytes`` surface the header fields, and ``is_vbr`` is True
    for ``Xing`` (the ``Info`` tag is LAME's CBR marker).  Tagless
    streams keep the exact walked values and infer ``is_vbr`` from
    per-frame bitrate variance.  ``avg_bitrate_kbps`` is audio bytes ×
    8 / duration — equal to ``bitrate_kbps`` on CBR, the honest mean on
    VBR.  CBR behavior is otherwise unchanged."""
    frames = list(iter_frames(payload))
    if not frames:
        raise ValueError("no MPEG-1 audio frames found")
    xing = parse_xing(payload, frames[0])
    audio = frames[1:] if xing else frames
    if not audio:  # a lone tag frame: report it rather than zero frames
        audio = frames
        xing = None
    f0 = audio[0]
    total_samples = sum(f.samples for f in audio)
    audio_bytes = sum(f.frame_bytes for f in audio)
    duration = total_samples / f0.sample_rate
    return {
        "layer": f0.layer,
        "bitrate_kbps": f0.bitrate_kbps,
        "sample_rate": f0.sample_rate,
        "mode": f0.mode,
        "n_frames": len(audio),
        "duration_s": duration,
        "vbr_header": xing["tag"] if xing else None,
        "xing_frames": xing["frames"] if xing else None,
        "xing_bytes": xing["bytes"] if xing else None,
        "is_vbr": (
            xing["tag"] == "Xing"
            if xing
            else len({f.bitrate_kbps for f in audio}) > 1
        ),
        "avg_bitrate_kbps": round(audio_bytes * 8 / duration / 1000.0, 1),
    }


# --------------------------------------------------------------------------
# Layer I scalefactors / requantizer (formula-derivable spec tables)
# --------------------------------------------------------------------------

#: Annex 3-B.1: sf[i] = 2.0 · 2^(−i/3), i = 0..62 (index 63 forbidden).
SCALEFACTORS = 2.0 * np.power(2.0, -np.arange(63) / 3.0)


def _dequant_affine(nb: int) -> tuple[float, float]:
    """Layer I requantizer as decode(code) = a·code + b (11172-3 §2.4.3.1:
    s''' = (2^nb/(2^nb−1)) · (code/2^(nb−1) − 1 + 2^(1−nb)))."""
    full = float(1 << nb)
    a = 2.0 / (full - 1.0)
    b = (full / (full - 1.0)) * (2.0 ** (1 - nb) - 1.0)
    return a, b


# --------------------------------------------------------------------------
# Pseudo-QMF filterbank (textbook design — see module docstring)
# --------------------------------------------------------------------------

def _prototype() -> np.ndarray:
    # Cutoff widened by 1.108× over the nominal π/64 so the Hann-windowed
    # sinc is (near-)power-complementary at the band crossover — the
    # pseudo-QMF near-PR condition.  The factor was found by a 1-D sweep
    # minimizing composite-gain ripple over band-center and band-edge
    # probe tones: 1.0 → amplitude ~0.5 at every band edge (≈15 dB
    # round-trip), 1.108 → ≤0.3% ripple across the spectrum (≈35-50 dB).
    cut = 1.108
    n = np.arange(_TAPS)
    c = (_TAPS - 1) / 2.0
    h = cut * np.sinc(cut * (n - c) / (2.0 * _NBANDS)) / (2.0 * _NBANDS)
    h *= np.hanning(_TAPS)
    return h


def _filters() -> tuple[np.ndarray, np.ndarray]:
    """(analysis G, synthesis P) — 32×512 cosine-modulated banks with the
    classic ±π/4 phases, each side normalized to unit passband gain
    (measured on a band-center sine at import, not hand-tuned), so
    subband sample magnitudes track input magnitudes (as the spec
    filterbank's do — scalefactor range compatibility) and
    synthesis∘analysis ≈ identity."""
    h = _prototype()
    n = np.arange(_TAPS)
    c = (_TAPS - 1) / 2.0
    k = np.arange(_NBANDS)[:, None]
    arg = (2 * k + 1) * (n[None, :] - c) * np.pi / (2 * _NBANDS)
    phi = ((-1.0) ** k) * np.pi / 4.0
    G = 2.0 * h[None, :] * np.cos(arg + phi)
    P = 2.0 * h[None, :] * np.cos(arg - phi)
    t = np.arange(4096)
    x = np.sin(2 * np.pi * 0.0234375 * t)  # 1.5/64 cycles: center of band 1
    xr = float(np.sqrt(np.mean(x[32:-32] ** 2)))
    S = _ana(x, G)
    G = G / (float(np.sqrt(np.mean(S[1, 20:-20] ** 2))) / xr)
    y = _syn(_ana(x, G), P)
    P = P / (float(np.sqrt(np.mean(y[_TAPS:3500] ** 2))) / xr)
    return G, P


def _ana(x: np.ndarray, G: np.ndarray) -> np.ndarray:
    """x (N·32 samples) → subbands (32, N): critically-sampled filterbank,
    one (32×512)·(512×N) matmul over strided windows."""
    pad = np.concatenate([np.zeros(_TAPS - _NBANDS), x])
    m = (len(pad) - _TAPS) // _NBANDS + 1
    idx = np.arange(_TAPS)[None, :] + _NBANDS * np.arange(m)[:, None]
    return G @ pad[idx][:, ::-1].T


def _syn(S: np.ndarray, P: np.ndarray) -> np.ndarray:
    """subbands (32, N) → x̂ (N·32 samples): overlap-add of the
    upsampled, filtered bands — vectorized as one matmul + fold."""
    m = S.shape[1]
    up = P.T @ S  # (512, m) contributions per block
    out = np.zeros(_NBANDS * m + _TAPS)
    for r in range(_TAPS // _NBANDS):  # 16 strided adds, not m-loop
        seg = up[r * _NBANDS : (r + 1) * _NBANDS, :]
        out_view = out[r * _NBANDS : r * _NBANDS + _NBANDS * m]
        out_view += seg.T.reshape(-1)
    return out[: _NBANDS * m]


_G, _P = _filters()


# --------------------------------------------------------------------------
# Layer I decode / encode
# --------------------------------------------------------------------------

class _BitReader:
    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def tobytes(self) -> bytes:
        while len(self.bits) % 8:
            self.bits.append(0)
        arr = np.array(self.bits, dtype=np.uint8).reshape(-1, 8)
        return np.packbits(arr, axis=1).tobytes()


def _read_samples_np(
    payload: bytes, start_bit: int, alloc, sf, nch: int
) -> np.ndarray:
    """Vectorized Layer I sample extraction + requantize + downmix for
    one frame: the allocation table fixes every field width, so the
    4608·nch-bit sample region is a deterministic layout — unpack it
    once with ``np.unpackbits`` and gather each width class with one
    matrix product instead of 384·nch python-loop bit reads (~10×
    frame decode throughput; the executor-side decode path is the
    engine's PCM throughput ceiling).  Returns the (32, 12) downmixed
    subband block."""
    # field widths in stream order: s_i major, then sb, channels innermost
    w_sbch = np.array(
        [alloc[sb][ch] + 1 if alloc[sb][ch] else 0
         for sb in range(_NBANDS) for ch in range(nch)],
        dtype=np.int64,
    )
    widths = np.tile(w_sbch, 12)
    ends = np.cumsum(widths)
    offs = start_bit + ends - widths
    total_end_bit = start_bit + int(ends[-1])
    byte0, byte1 = start_bit >> 3, (total_end_bit + 7) >> 3
    if byte1 > len(payload):
        raise ValueError("truncated Layer I frame body")
    bits = np.unpackbits(
        np.frombuffer(payload, dtype=np.uint8, count=byte1 - byte0, offset=byte0)
    ).astype(np.int64)
    base = byte0 * 8
    codes = np.zeros(widths.shape, dtype=np.int64)
    for v in np.unique(widths):
        if v == 0:
            continue
        sel = widths == v
        idx = (offs[sel] - base)[:, None] + np.arange(v)[None, :]
        codes[sel] = bits[idx] @ (1 << np.arange(v - 1, -1, -1))
    # affine requantize per field width, then scalefactor, then downmix
    a_w = np.zeros(16)
    b_w = np.zeros(16)
    for v in range(2, 16):
        a_w[v], b_w[v] = _dequant_affine(v)
    vals = np.where(widths > 0, a_w[widths] * codes + b_w[widths], 0.0)
    sf_flat = np.tile(
        np.array([sf[sb][ch] for sb in range(_NBANDS) for ch in range(nch)]),
        12,
    )
    # (12, 32, nch) → mean over channels → (32, 12)
    return (vals * sf_flat).reshape(12, _NBANDS, nch).mean(axis=2).T


def decode_layer1(payload: bytes) -> tuple[np.ndarray, int]:
    """MPEG-1 Layer I → (float64 mono PCM in [-1, 1], sample_rate).

    Mono (mode 3), stereo (mode 0) and dual-channel (mode 2) streams
    decode; stereo/dual output is downmixed to mono by channel average —
    the same contract as the WAV path.  Joint stereo (mode 1) raises:
    its intensity-coded bound subbands share sample data under a
    bound-selection table this module does not implement.

    Channel interleaving follows 11172-3 §2.4.1.5: allocation then
    scalefactors iterate subband-major with channels innermost, and the
    12 sample groups iterate (sample, subband, channel)."""
    frames_S = []
    fs = None
    for hdr in iter_frames(payload):
        if hdr.layer != 1:
            raise NotImplementedError(
                f"MPEG-1 Layer {'II' if hdr.layer == 2 else 'III'} PCM decode "
                "unsupported: Layer II needs the Annex 3-B.2 allocation-class "
                "tables, Layer III the Huffman table set — neither is "
                "formula-derivable (see module docstring). stream_info() "
                "still works on this payload."
            )
        if hdr.mode == 1:
            raise NotImplementedError(
                "Layer I joint (intensity) stereo unsupported; mono, "
                "stereo, and dual-channel streams decode"
            )
        nch = 1 if hdr.mode == 3 else 2
        fs = hdr.sample_rate
        start = (hdr.offset + 4 + (2 if hdr.protected else 0)) * 8
        r = _BitReader(payload, start)
        alloc = [
            [r.read(4) for _ in range(nch)] for _ in range(_NBANDS)
        ]
        if any(a == 15 for row in alloc for a in row):
            raise ValueError("forbidden Layer I allocation code 15")
        sf = [
            [SCALEFACTORS[r.read(6)] if a else 0.0 for a in row]
            for row in alloc
        ]
        frames_S.append(
            _read_samples_np(payload, r.pos, alloc, sf, nch)
        )
    if fs is None:
        raise ValueError("no Layer I frames found")
    # ONE synthesis pass over the concatenated subband stream: the
    # filterbank carries 512 samples of state, so per-frame synthesis
    # would reset the overlap at every 384-sample boundary (measured:
    # 2 dB round-trip SNR instead of ~35 dB)
    return _syn(np.hstack(frames_S), _P), fs


def _pick_scalefactor(m: float) -> int:
    """Largest index whose scalefactor still covers the peak
    (SCALEFACTORS is descending; stepping past it would clip)."""
    i = int(np.searchsorted(-SCALEFACTORS, -m, side="left"))
    i = min(i, 62)
    if SCALEFACTORS[i] < m and i > 0:
        i -= 1
    return i


def encode_layer1(
    pcm: np.ndarray, sample_rate: int = 32000, bitrate_kbps: int = 448
) -> bytes:
    """Float PCM in [-1, 1] → MPEG-1 Layer I stream.  A 1-D array
    encodes mono (mode 3); an (n, 2) array encodes stereo (mode 0) with
    the §2.4.1.5 channel interleaving ``decode_layer1`` parses.  Uniform
    widest-fitting allocation everywhere — a round-trip reference
    encoder, not a psychoacoustic one.  Input is truncated to whole
    384-sample frames."""
    if sample_rate not in _SAMPLE_RATES:
        raise ValueError(f"sample_rate must be one of {_SAMPLE_RATES}")
    if bitrate_kbps not in _BITRATES[1]:
        raise ValueError("unsupported Layer I bitrate")
    pcm = np.asarray(pcm, dtype=np.float64)
    if pcm.ndim == 1:
        chans = [pcm]
        mode_bits = 0b11
    elif pcm.ndim == 2 and pcm.shape[1] == 2:
        chans = [pcm[:, 0], pcm[:, 1]]
        mode_bits = 0b00
    else:
        raise ValueError("pcm must be 1-D mono or (n, 2) stereo")
    nch = len(chans)
    sr_idx = _SAMPLE_RATES.index(sample_rate)
    br_idx = _BITRATES[1].index(bitrate_kbps)
    frame_bytes = (12 * bitrate_kbps * 1000 // sample_rate) * 4
    # widest uniform sample width the frame budget allows (header 32
    # bits, nch×32×4 allocation, nch×32×6 scalefactors, nch×384
    # samples); spec max is 15
    nb = min(
        15,
        (frame_bytes * 8 - 32 - nch * _NBANDS * (4 + 6)) // (nch * 384),
    )
    if nb < 2:
        raise ValueError("bitrate too low for uniform Layer I allocation")
    alloc_code = nb - 1
    a, b = _dequant_affine(nb)
    n_frames = len(chans[0]) // 384
    S_all = [_ana(c[: n_frames * 384], _G) for c in chans]
    header = bytes(
        [
            0xFF,
            0xFF,  # sync + MPEG-1 Layer I, no CRC
            (br_idx << 4) | (sr_idx << 2),
            (mode_bits << 6) | 0b00000100,
        ]
    )
    out = bytearray()
    for f in range(n_frames):
        S = [sa[:, f * 12 : (f + 1) * 12] for sa in S_all]
        w = _BitWriter()
        for _sb in range(_NBANDS):
            for _ch in range(nch):
                w.write(alloc_code, 4)
        sf_idx = [[0] * nch for _ in range(_NBANDS)]
        for sb in range(_NBANDS):
            for ch in range(nch):
                sf_idx[sb][ch] = _pick_scalefactor(float(np.max(np.abs(S[ch][sb]))))
                w.write(sf_idx[sb][ch], 6)
        for s_i in range(12):
            for sb in range(_NBANDS):
                for ch in range(nch):
                    y = S[ch][sb, s_i] / SCALEFACTORS[sf_idx[sb][ch]]
                    code = int(np.clip(round((y - b) / a), 0, (1 << nb) - 1))
                    w.write(code, nb)
        body = w.tobytes()
        frame = header + body
        frame = frame + b"\x00" * (frame_bytes - len(frame))
        if len(frame) != frame_bytes:
            raise ValueError("frame overflow: bitrate too low for payload")
        out += frame
    return bytes(out)
