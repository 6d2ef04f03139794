"""Baseline JPEG codec, pure stdlib + numpy (no codec library).

Converts the multimodal layer's ``jpeg`` boundary from an honest stub to
a real decode path, the way PNG/WAV were built from their container
specs (ITU-T T.81 here): marker parse → Huffman entropy decode →
dequantize → inverse 8×8 DCT → YCbCr→RGB.  The matching encoder exists
so the codec is round-trip testable in a container that cannot *create*
JPEGs any other way.

Supported (decode): baseline sequential (SOF0) AND progressive (SOF2 —
spectral selection + successive approximation, all four scan kinds with
EOBRUN and refinement correction bits, T.81 G.2), 8-bit, grayscale or
3-component YCbCr, MCU-interleaved scans with integer-ratio sampling
factors — 4:4:4, 4:2:0, 4:2:2 and friends (chroma replicated up to full
resolution; JFIF mandates no upsampling filter), restart intervals
(DRI/RSTn: byte-aligned markers, cycle-checked, DC predictors reset),
tables read from the stream's own DQT/DHT markers.  Arithmetic coding,
12-bit, and non-integer sampling ratios raise ``NotImplementedError`` —
real boundaries, stated, not silently wrong.  Two encoders keep both
decode paths round-trip testable: ``encode_jpeg`` (baseline, Annex K
quant tables scaled by libjpeg's quality curve, Annex K Huffman tables,
``subsampling=`` 444 / 420 / 422, ``restart_interval=``) and
``encode_jpeg_progressive`` (SOF2 scan script exercising every
progressive path; decodes bit-identical to the baseline encode).

Throughput reality: the entropy loop is per-symbol Python — fine for the
thumbnail-scale assets these pipelines carry in test; swap a codec
library into ``multimodal.decode_image`` for photo-scale corpora.  The
DCTs are numpy matrix products (exact, vectorized over blocks).
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Constants (ITU-T T.81 Annex K)
# --------------------------------------------------------------------------

#: zigzag scan: natural (row-major) index at each scan position
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)

# Huffman table specs: (bits[1..16] code-length counts, symbol list)
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

for _spec in (DC_LUMA_SPEC, DC_CHROMA_SPEC, AC_LUMA_SPEC, AC_CHROMA_SPEC):
    assert sum(_spec[0]) == len(_spec[1]), "corrupt Huffman table spec"

#: 8×8 DCT-II basis matrix: forward = T @ block @ T.T, inverse = T.T @ c @ T
_DCT_T = np.zeros((8, 8))
for _i in range(8):
    for _j in range(8):
        _DCT_T[_i, _j] = np.cos((2 * _j + 1) * _i * np.pi / 16) * (
            np.sqrt(0.125) if _i == 0 else 0.5
        )


# --------------------------------------------------------------------------
# Huffman coding
# --------------------------------------------------------------------------

def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) under JPEG's canonical code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], symbols: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol, for the bit-at-a-time decoder."""
    return {
        (ln, code): sym for sym, (code, ln) in _canonical_codes(bits, symbols).items()
    }


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)

    def restart_marker(self, m: int) -> None:
        """Byte-align (1-padding, stuffed if it lands on 0xFF) and emit
        RSTm — the encoder side of a restart interval boundary."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (m & 0x07)])


class _BitReader:
    """Reads the entropy-coded segment: un-stuffs FF00 on the fly and
    stops at any real marker (e.g. EOI)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise ValueError(
                    "restart marker inside an entropy-coded segment — "
                    "corrupt stream or restart-interval mismatch"
                )
            else:
                raise EOFError("hit marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")

    def restart(self) -> int:
        """Consume an RSTn marker at a restart boundary: discard the
        partial byte (decoder side of the encoder's 1-padding), skip a
        stuffed FF00 the padding may have produced, verify the marker,
        and return its 0..7 cycle number."""
        self.acc = 0
        self.nbits = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and self.data[self.pos + 1] == 0x00
        ):
            self.pos += 2
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or not (0xD0 <= self.data[self.pos + 1] <= 0xD7)
        ):
            raise ValueError("expected RSTn marker at restart interval")
        m = self.data[self.pos + 1] & 0x07
        self.pos += 2
        return m


def _extend(v: int, size: int) -> int:
    """DC/AC value decode: ``size``-bit magnitude → signed coefficient."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    """Signed coefficient → magnitude category (bit length of |v|)."""
    return int(abs(v)).bit_length()


# --------------------------------------------------------------------------
# Progressive scans (T.81 G.2: spectral selection + successive approximation)
# --------------------------------------------------------------------------

def _frame_geometry(frame) -> dict:
    """MCU grid + per-component padded and true block-grid sizes."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    samp = {cid: (sh, sv) for cid, sh, sv, _ in comps}
    true_blocks = {}
    for cid, sh, sv, _ in comps:
        ch = -(-(h * sv) // vmax)
        cw = -(-(w * sh) // hmax)
        true_blocks[cid] = ((ch + 7) // 8, (cw + 7) // 8)
    return {
        "mcux": mcux, "mcuy": mcuy, "samp": samp,
        "true_blocks": true_blocks, "comps": comps,
    }


def _decode_progressive_scan(
    data: bytes,
    pos: int,
    geom: dict,
    coef: dict,
    huff: dict,
    scan_comps: list,
    ss: int,
    se: int,
    ah: int,
    al: int,
    restart_interval: int,
) -> int:
    """Decode ONE progressive scan into the per-component coefficient
    stores (zigzag order) and return the offset of the next marker.

    Four scan kinds (T.81 G.2): DC first (Ss=0, Ah=0 — baseline DC with
    the value shifted up by Al), DC refinement (one raw bit per block),
    AC first (band Ss..Se with EOBRUN end-of-band run lengths), and AC
    refinement (newly-significant coefficients interleaved with one
    correction bit per already-nonzero coefficient passed over).  DC
    predictors and EOBRUN reset at scan start and restart markers.
    """
    reader = _BitReader(data, pos)
    pred = {cid: 0 for cid, _, _ in scan_comps}
    state = {"eobrun": 0, "mcu": 0}

    def restart_check(total: int) -> None:
        state["mcu"] += 1
        if (
            restart_interval
            and state["mcu"] < total
            and state["mcu"] % restart_interval == 0
        ):
            m = reader.restart()
            expect = (state["mcu"] // restart_interval - 1) % 8
            if m != expect:
                raise ValueError(f"RST{m} out of sequence (expected RST{expect})")
            for k in pred:
                pred[k] = 0
            state["eobrun"] = 0

    def dc_one(blk: np.ndarray, cid: int, dc_id: int) -> None:
        if ah == 0:
            s = reader.read_symbol(huff[(0, dc_id)])
            diff = _extend(reader.read_bits(s), s) if s else 0
            pred[cid] += diff
            blk[0] = pred[cid] << al
        elif reader.read_bit():
            blk[0] = int(blk[0]) | (1 << al)

    def ac_first(blk: np.ndarray, table: dict) -> None:
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = reader.read_symbol(table)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r < 15:  # EOBn: run of 2^r + ext end-of-band blocks
                    state["eobrun"] = (1 << r) - 1
                    if r:
                        state["eobrun"] += reader.read_bits(r)
                    return
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("AC run past end of band")
            blk[k] = _extend(reader.read_bits(s), s) << al
            k += 1

    def ac_refine(blk: np.ndarray, table: dict) -> None:
        p1, m1 = 1 << al, -1 << al

        def correct(k: int) -> None:
            c = int(blk[k])
            if c and reader.read_bit() and (c & p1) == 0:
                blk[k] = c + (p1 if c >= 0 else m1)

        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = reader.read_symbol(table)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r < 15:
                        state["eobrun"] = 1 << r
                        if r:
                            state["eobrun"] += reader.read_bits(r)
                        break
                    val = 0  # ZRL: 16 zero-history positions
                else:
                    if s != 1:
                        raise ValueError("refinement coef size must be 1")
                    val = p1 if reader.read_bit() else m1
                while k <= se:
                    if int(blk[k]) != 0:
                        correct(k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    blk[k] = val
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if int(blk[k]) != 0:
                    correct(k)
                k += 1
            state["eobrun"] -= 1

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("DC scan must have Se = 0")
        if len(scan_comps) > 1:  # interleaved: full padded MCU grid
            total = geom["mcuy"] * geom["mcux"]
            for my in range(geom["mcuy"]):
                for mx in range(geom["mcux"]):
                    for cid, dc_id, _ in scan_comps:
                        sh, sv = geom["samp"][cid]
                        for byy in range(sv):
                            for bxx in range(sh):
                                dc_one(
                                    coef[cid][my * sv + byy, mx * sh + bxx],
                                    cid, dc_id,
                                )
                    restart_check(total)
        else:  # single component: its own true block grid
            cid, dc_id, _ = scan_comps[0]
            nby, nbx = geom["true_blocks"][cid]
            for by in range(nby):
                for bx in range(nbx):
                    dc_one(coef[cid][by, bx], cid, dc_id)
                    restart_check(nby * nbx)
    else:  # AC scan: spec mandates non-interleaved
        if len(scan_comps) != 1:
            raise ValueError("progressive AC scans must be single-component")
        cid, _, ac_id = scan_comps[0]
        table = huff[(1, ac_id)]
        nby, nbx = geom["true_blocks"][cid]
        fn = ac_first if ah == 0 else ac_refine
        for by in range(nby):
            for bx in range(nbx):
                fn(coef[cid][by, bx], table)
                restart_check(nby * nbx)

    # advance to the next marker (skip pad bits / stuffed zero bytes)
    p = reader.pos
    while p + 1 < len(data):
        if data[p] == 0xFF:
            if data[p + 1] == 0x00:
                p += 2
                continue
            if data[p + 1] == 0xFF:
                p += 1
                continue
            return p
        p += 1
    raise ValueError("progressive scan ran past end of stream")


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG bytes → H×W×C uint8 (C = 1 gray or 3 RGB).  Baseline
    sequential, 8-bit, integer-ratio sampling factors (4:4:4 / 4:2:0 /
    4:2:2 …) — see module docstring."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, [(comp_id, qt_id)])
    scan_comps = None  # [(comp_id, dc_id, ac_id)]
    restart_interval = 0
    progressive = False
    geom = None
    coef_store = None
    pos = 2
    data = payload
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        # spec-valid streams may pad with repeated 0xFF fill bytes before
        # the marker id (T.81 B.1.1.2)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # length-less standalone markers (TEM, RSTn) between segments
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec_id = seg[p]
                if prec_id >> 4:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tbl = np.zeros(64)
                tbl[ZIGZAG] = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8)
                qt[prec_id & 0x0F] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls_id = seg[p]
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                symbols = list(seg[p + 17 : p + 17 + n])
                huff[(cls_id >> 4, cls_id & 0x0F)] = _decode_table(bits, symbols)
                p += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            depth, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if depth != 8:
                raise NotImplementedError(f"JPEG bit depth {depth} unsupported")
            comps = []
            for i in range(nc):
                cid, samp, qid = seg[6 + 3 * i : 9 + 3 * i]
                sh, sv = samp >> 4, samp & 0x0F
                if not (1 <= sh <= 4 and 1 <= sv <= 4):
                    raise ValueError(f"invalid sampling factors {sh}x{sv}")
                comps.append((cid, sh, sv, qid))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            for cid, sh, sv, _ in comps:
                if hmax % sh or vmax % sv:
                    # T.81 permits e.g. 3:2 ratios; integer-factor
                    # replication can't upsample those — raise honestly
                    raise NotImplementedError(
                        f"non-integer sampling ratio {sh}x{sv} vs "
                        f"{hmax}x{vmax} unsupported"
                    )
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG frame type SOF{marker - 0xC0} unsupported (baseline "
                "sequential SOF0 and progressive SOF2 only — no "
                "arithmetic/lossless/hierarchical)"
            )
        elif marker == 0xDD:  # DRI: restart every Ri MCUs (0 = disabled)
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            nc = seg[0]
            scan_comps = [
                (seg[1 + 2 * i], seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 0x0F)
                for i in range(nc)
            ]
            if not progressive:
                pos = pos + 2 + seglen
                break
            # progressive scan (T.81 G.2): decode it now, accumulate
            # coefficients, continue the marker walk for the next scan
            ss = seg[1 + 2 * nc]
            se = seg[2 + 2 * nc]
            ah, al = seg[3 + 2 * nc] >> 4, seg[3 + 2 * nc] & 0x0F
            if frame is None:
                raise ValueError("SOS before SOF2")
            if geom is None:
                geom = _frame_geometry(frame)
                coef_store = {
                    cid: np.zeros(
                        (geom["mcuy"] * sv, geom["mcux"] * sh, 64),
                        dtype=np.int64,
                    )
                    for cid, sh, sv, _ in frame[2]
                }
            pos = _decode_progressive_scan(
                data, pos + 2 + seglen, geom, coef_store, huff,
                scan_comps, ss, se, ah, al, restart_interval,
            )
            continue
        pos += 2 + seglen
    if frame is None or scan_comps is None:
        raise ValueError("JPEG missing SOF/SOS")

    h, w, comps = frame
    qt_of = {cid: qid for cid, _, _, qid in comps}
    samp_of = {cid: (sh, sv) for cid, sh, sv, _ in comps}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    if progressive:
        if coef_store is None:
            raise ValueError("progressive JPEG with no scans")
        # all scans accumulated — dequantize + IDCT every block at once
        planes = {}
        for cid, sh, sv, qid in comps:
            C = coef_store[cid].astype(np.float64)
            nat = np.zeros_like(C)
            nat[..., ZIGZAG] = C
            bh, bw = C.shape[0], C.shape[1]
            nat = nat.reshape(bh, bw, 8, 8) * qt[qid]
            spat = np.einsum("ij,abjk,kl->abil", _DCT_T.T, nat, _DCT_T) + 128.0
            planes[cid] = spat.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        return _assemble_image(planes, comps, h, w, hmax, vmax)
    planes = {
        cid: np.zeros((mcuy * sv * 8, mcux * sh * 8))
        for cid, sh, sv, _ in comps
    }
    reader = _BitReader(data, pos)
    pred = {cid: 0 for cid, _, _, _ in comps}
    mcu_done = 0

    def maybe_restart(total_mcus: int) -> None:
        """After each MCU: at a restart boundary (and not at scan end),
        consume the RSTn marker — verifying the 0..7 cycle — and reset
        the DC predictors (T.81 F.2.1.3.1)."""
        nonlocal mcu_done
        mcu_done += 1
        if (
            restart_interval
            and mcu_done < total_mcus
            and mcu_done % restart_interval == 0
        ):
            m = reader.restart()
            expect = (mcu_done // restart_interval - 1) % 8
            if m != expect:
                raise ValueError(f"RST{m} out of sequence (expected RST{expect})")
            for k in pred:
                pred[k] = 0

    def read_block(dc_id: int, ac_id: int, cid: int) -> np.ndarray:
        coeffs = np.zeros(64)
        s = reader.read_symbol(huff[(0, dc_id)])
        diff = _extend(reader.read_bits(s), s) if s else 0
        pred[cid] += diff
        coeffs[0] = pred[cid]
        k = 1
        while k < 64:
            rs = reader.read_symbol(huff[(1, ac_id)])
            run, size = rs >> 4, rs & 0x0F
            if size == 0:
                if run == 15:  # ZRL: 16 zeros
                    k += 16
                    continue
                break  # EOB
            k += run
            if k > 63:
                raise ValueError("AC run past end of block")
            coeffs[k] = _extend(reader.read_bits(size), size)
            k += 1
        block = np.zeros(64)
        block[ZIGZAG] = coeffs
        block = block.reshape(8, 8) * qt[qt_of[cid]]
        return _DCT_T.T @ block @ _DCT_T + 128.0

    if len(scan_comps) == 1:
        # non-interleaved scan (T.81 A.2.2): MCU = one block over the
        # lone component's own block grid (the grayscale path)
        cid, dc_id, ac_id = scan_comps[0]
        sh, sv = samp_of[cid]
        ch = -(-(h * sv) // vmax)  # ceil(h·sv/vmax): true component dims
        cw = -(-(w * sh) // hmax)
        nby, nbx = (ch + 7) // 8, (cw + 7) // 8
        for by in range(nby):
            for bx in range(nbx):
                planes[cid][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    read_block(dc_id, ac_id, cid)
                )
                maybe_restart(nby * nbx)  # non-interleaved MCU = 1 block
    else:
        # interleaved scan (T.81 A.2.3): per MCU, each component
        # contributes sh×sv blocks in row-major order
        for my in range(mcuy):
            for mx in range(mcux):
                for cid, dc_id, ac_id in scan_comps:
                    sh, sv = samp_of[cid]
                    for byy in range(sv):
                        for bxx in range(sh):
                            y0 = (my * sv + byy) * 8
                            x0 = (mx * sh + bxx) * 8
                            planes[cid][y0 : y0 + 8, x0 : x0 + 8] = (
                                read_block(dc_id, ac_id, cid)
                            )
                maybe_restart(mcuy * mcux)

    return _assemble_image(planes, comps, h, w, hmax, vmax)


def _assemble_image(
    planes: dict, comps: list, h: int, w: int, hmax: int, vmax: int
) -> np.ndarray:
    """Crop each plane to its true component size, replicate up to full
    resolution (nearest-neighbor — JFIF mandates no upsampling filter;
    libjpeg's default "fancy" triangular filter differs by ≤1 code value
    on smooth chroma), then YCbCr→RGB for 3-component frames."""
    full = []
    for cid, sh, sv, _ in comps:
        ch = -(-(h * sv) // vmax)
        cw = -(-(w * sh) // hmax)
        p = planes[cid][:ch, :cw]
        if sv != vmax or sh != hmax:
            p = np.repeat(np.repeat(p, vmax // sv, axis=0), hmax // sh, axis=1)
        full.append(p[:h, :w])
    stack = np.stack(full, axis=-1)
    if stack.shape[-1] == 3:  # YCbCr (JFIF full range) → RGB
        y, cb, cr = stack[..., 0], stack[..., 1] - 128.0, stack[..., 2] - 128.0
        stack = np.stack(
            [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
            axis=-1,
        )
    return np.clip(np.round(stack), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------

def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's quality curve: 50 = Annex K tables as-is."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255)




def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _prepare_encode(img: np.ndarray, quality: int, subsampling: str) -> dict:
    """Shared encoder front half: color transform, subsample, pad, and
    the forward DCT + quantization of EVERY block (vectorized einsum over
    the padded MCU grid).  Returns zigzag-ordered int coefficient grids
    ``qcoefs[ci]`` of shape (blocks_y, blocks_x, 64) plus the geometry
    and table assignments both entropy back-ends (baseline scan,
    progressive scan script) consume."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if c not in (1, 3):
        raise ValueError("encode_jpeg supports 1 (gray) or 3 (RGB) channels")
    f = img.astype(np.float64)
    if c == 3:  # RGB → YCbCr (JFIF full range)
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        f = np.stack(
            [
                0.299 * r + 0.587 * g + 0.114 * b,
                -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
                0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
            ],
            axis=-1,
        )
    sf_map = {"444": (1, 1), "420": (2, 2), "422": (2, 1)}
    if subsampling not in sf_map:
        raise ValueError(f"subsampling must be one of {sorted(sf_map)}")
    lh, lv = sf_map[subsampling] if c == 3 else (1, 1)
    sampling = [(lh, lv)] + [(1, 1)] * (c - 1)
    hmax, vmax = lh, lv
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    q_luma = _quality_scale(QUANT_LUMA, quality)
    q_chroma = _quality_scale(QUANT_CHROMA, quality)
    qtables = [q_luma] if c == 1 else [q_luma, q_chroma]
    comp_qt = [0] if c == 1 else [0, 1, 1]
    comp_ht = [0] if c == 1 else [0, 1, 1]

    qcoefs = []
    for ci, (sh, sv) in enumerate(sampling):
        plane = f[..., ci]
        fx, fy = hmax // sh, vmax // sv
        if fx > 1 or fy > 1:  # box-mean downsample
            ph0 = -(-h // fy) * fy
            pw0 = -(-w // fx) * fx
            p = np.pad(plane, ((0, ph0 - h), (0, pw0 - w)), mode="edge")
            plane = p.reshape(ph0 // fy, fy, pw0 // fx, fx).mean(axis=(1, 3))
        th, tw = mcuy * sv * 8, mcux * sh * 8
        plane = np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )
        bh, bw = th // 8, tw // 8
        blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - 128.0
        coef = np.einsum("ij,abjk,kl->abil", _DCT_T, blocks, _DCT_T.T)
        q = np.round(
            coef / qtables[comp_qt[ci]]
        ).astype(np.int64).reshape(bh, bw, 64)[..., ZIGZAG]
        qcoefs.append(q)

    return {
        "h": h, "w": w, "c": c, "sampling": sampling,
        "hmax": hmax, "vmax": vmax, "mcux": mcux, "mcuy": mcuy,
        "qtables": qtables, "comp_qt": comp_qt, "comp_ht": comp_ht,
        "qcoefs": qcoefs,
    }


def _header(prep: dict, sof_marker: int) -> bytearray:
    """SOI + APP0 + DQT + SOF — shared by both encoders."""
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    for i, tbl in enumerate(prep["qtables"]):
        zz = np.zeros(64, dtype=np.uint8)
        zz[:] = tbl.reshape(64)[ZIGZAG].astype(np.uint8)
        out += _seg(0xDB, bytes([i]) + zz.tobytes())
    sof = struct.pack(">BHHB", 8, prep["h"], prep["w"], prep["c"])
    for ci in range(prep["c"]):
        sh, sv = prep["sampling"][ci]
        sof += bytes([ci + 1, (sh << 4) | sv, prep["comp_qt"][ci]])
    out += _seg(sof_marker, sof)
    return out


def _encode_block(
    writer: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    """Baseline entropy coding of one zigzag-ordered quantized block."""
    zz = zz.astype(int)
    diff = int(zz[0]) - pred
    s = _category(diff)
    code, ln = dc_codes[s]
    writer.write(code, ln)
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        if k > last_nz:
            code, ln = ac_codes[0x00]  # EOB
            writer.write(code, ln)
            break
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        writer.write(code, ln)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    return int(zz[0])


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """H×W (gray) or H×W×{1,3} (RGB) uint8 → baseline JPEG bytes
    (Annex K tables at the given libjpeg-curve quality).

    ``subsampling``: ``"444"`` (1×1 everywhere — the historical
    default), ``"420"`` (luma 2×2, chroma 1×1 — the majority of real
    baseline JPEGs) or ``"422"`` (luma 2×1).  Chroma planes are box-mean
    downsampled and the scan is MCU-interleaved per T.81 A.2.3, which
    is exactly what ``decode_jpeg`` parses back.  Grayscale ignores the
    parameter (one component has nothing to subsample).

    ``restart_interval`` > 0 emits a DRI segment and an RST0..7 marker
    after every that-many MCUs (byte-aligned, DC predictors reset) —
    the error-resilience feature cameras/libjpeg commonly enable, and
    the unit a parallel decoder can split the entropy segment on."""
    prep = _prepare_encode(img, quality, subsampling)
    c, sampling = prep["c"], prep["sampling"]
    mcux, mcuy = prep["mcux"], prep["mcuy"]
    qcoefs, comp_ht = prep["qcoefs"], prep["comp_ht"]

    dc_codes = [_canonical_codes(*DC_LUMA_SPEC), _canonical_codes(*DC_CHROMA_SPEC)]
    ac_codes = [_canonical_codes(*AC_LUMA_SPEC), _canonical_codes(*AC_CHROMA_SPEC)]

    writer = _BitWriter()
    pred = [0] * c
    mcu_done = 0
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(c):
                sh, sv = sampling[ci]
                for byy in range(sv):
                    for bxx in range(sh):
                        pred[ci] = _encode_block(
                            writer,
                            qcoefs[ci][my * sv + byy, mx * sh + bxx],
                            pred[ci],
                            dc_codes[comp_ht[ci]], ac_codes[comp_ht[ci]],
                        )
            mcu_done += 1
            if (
                restart_interval
                and mcu_done < mcuy * mcux
                and mcu_done % restart_interval == 0
            ):
                writer.restart_marker(mcu_done // restart_interval - 1)
                pred = [0] * c
    entropy = writer.flush()

    out = _header(prep, 0xC0)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    specs = [(0, 0, DC_LUMA_SPEC), (1, 0, AC_LUMA_SPEC)]
    if c == 3:
        specs += [(0, 1, DC_CHROMA_SPEC), (1, 1, AC_CHROMA_SPEC)]
    for cls, tid, (bits, symbols) in specs:
        out += _seg(0xC4, bytes([(cls << 4) | tid] + bits + symbols))
    sos = bytes([c])
    for ci in range(c):
        sos += bytes([ci + 1, (comp_ht[ci] << 4) | comp_ht[ci]])
    sos += b"\x00\x3f\x00"  # spectral selection 0..63, no approx
    out += _seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Progressive encoder (T.81 G.1: spectral selection + successive approx)
# --------------------------------------------------------------------------

def _flat_spec(symbols: list[int]) -> tuple[list[int], list[int]]:
    """Fixed-length canonical Huffman spec over exactly the given
    alphabet: every symbol gets an L-bit code with 2^L - 1 ≥ n (the
    all-ones code stays unused, as DHT conventions expect).  Progressive
    scans need EOBn symbols the Annex K sequential tables don't carry,
    so each scan ships a table over its own alphabet — compression is
    not the point of this encoder, correctness of the scan structure is."""
    syms = sorted(set(symbols))
    L = 1
    while (1 << L) - 1 < len(syms):
        L += 1
    bits = [0] * 16
    bits[L - 1] = len(syms)
    return bits, syms


class _OpRecorder:
    """Scan body builder: records (symbol, raw-bit) ops so the alphabet
    is known before the DHT is written, then replays through _BitWriter."""

    def __init__(self) -> None:
        self.ops: list[tuple[str, int, int]] = []

    def sym(self, s: int) -> None:
        self.ops.append(("s", s, 0))

    def bits(self, v: int, n: int) -> None:
        if n:
            self.ops.append(("b", v, n))

    def restart(self, m: int) -> None:
        self.ops.append(("r", m, 0))

    def alphabet(self) -> list[int]:
        return [v for kind, v, _ in self.ops if kind == "s"]

    def replay(self, codes: dict[int, tuple[int, int]]) -> bytes:
        w = _BitWriter()
        for kind, v, n in self.ops:
            if kind == "s":
                code, ln = codes[v]
                w.write(code, ln)
            elif kind == "r":
                w.restart_marker(v)
            else:
                w.write(v, n)
        return w.flush()


def _emit_eobrun(rec: _OpRecorder, eobrun: int, pending: list[int]) -> int:
    """Flush an accumulated end-of-band run (EOBn symbol + extension
    bits) followed by any buffered refinement correction bits."""
    if eobrun > 0:
        r = eobrun.bit_length() - 1
        rec.sym(r << 4)
        rec.bits(eobrun - (1 << r), r)
    for b in pending:
        rec.bits(b, 1)
    pending.clear()
    return 0


def encode_jpeg_progressive(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """H×W (gray) or H×W×{1,3} uint8 → progressive JPEG (SOF2) bytes.

    Scan script (exercises every progressive decode path):

    1. DC first, all components interleaved, Al=1
    2. DC refinement, Ah=1 → Al=0 (raw bits, no symbols)
    3. per component: AC first, Ss=1..63, Al=1 (EOBRUN-accumulated)
    4. per component: AC refinement, Ah=1 → Al=0 (correction bits)

    Coefficients are identical to ``encode_jpeg``'s (same quantizer),
    and the scan script transmits every bit of them — so a full decode
    is BIT-IDENTICAL to decoding the baseline encode of the same image
    (asserted in tests).  DC uses the Annex K DC tables; AC scans ship
    per-scan fixed-length tables because progressive EOBn symbols are
    not in the Annex K sequential alphabets (see ``_flat_spec``).

    ``restart_interval`` > 0 inserts RSTn markers every that-many MCUs
    in EVERY scan (progressive MCU = one block in the non-interleaved
    AC scans), with EOB runs flushed and predictors reset at each
    boundary — exercising the decoder's per-scan restart handling.
    """
    prep = _prepare_encode(img, quality, subsampling)
    c, sampling = prep["c"], prep["sampling"]
    mcux, mcuy = prep["mcux"], prep["mcuy"]
    qcoefs, comp_ht = prep["qcoefs"], prep["comp_ht"]

    out = _header(prep, 0xC2)
    dc_specs = [(0, DC_LUMA_SPEC), (1, DC_CHROMA_SPEC)] if c == 3 else [
        (0, DC_LUMA_SPEC)
    ]
    for tid, (bits, symbols) in dc_specs:
        out += _seg(0xC4, bytes([tid] + bits + symbols))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    dc_codes = [_canonical_codes(*DC_LUMA_SPEC), _canonical_codes(*DC_CHROMA_SPEC)]

    def at_restart(rec: _OpRecorder, i: int, total: int) -> bool:
        """Emit RSTn after MCU index i (0-based) when a boundary falls
        there and the scan continues; caller resets its own state."""
        if (
            restart_interval
            and i + 1 < total
            and (i + 1) % restart_interval == 0
        ):
            rec.restart(((i + 1) // restart_interval - 1) % 8)
            return True
        return False

    def sos(scan_comps: list[tuple[int, int, int]], ss, se, ah, al) -> bytes:
        body = bytes([len(scan_comps)])
        for ci, dc_id, ac_id in scan_comps:
            body += bytes([ci + 1, (dc_id << 4) | ac_id])
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    def dc_mcus():
        """Interleaved MCU walk over every component's padded grid,
        one (ci, block) list per MCU."""
        for my in range(mcuy):
            for mx in range(mcux):
                mcu = []
                for ci in range(c):
                    sh, sv = sampling[ci]
                    for byy in range(sv):
                        for bxx in range(sh):
                            mcu.append(
                                (ci, qcoefs[ci][my * sv + byy, mx * sh + bxx])
                            )
                yield mcu

    n_mcu = mcuy * mcux
    # --- scan 1: DC first, Al=1 ------------------------------------------
    rec = _OpRecorder()
    pred = [0] * c
    for i, mcu in enumerate(dc_mcus()):
        for ci, zz in mcu:
            v = int(zz[0]) >> 1  # point transform (arith shift, G.1.2.1)
            diff = v - pred[ci]
            pred[ci] = v
            s = _category(diff)
            code, ln = dc_codes[comp_ht[ci]][s]
            rec.bits(code, ln)  # DC tables are fixed (Annex K) — direct
            if s:
                rec.bits(diff if diff >= 0 else diff + (1 << s) - 1, s)
        if at_restart(rec, i, n_mcu):
            pred = [0] * c
    out += sos([(ci, comp_ht[ci], 0) for ci in range(c)], 0, 0, 0, 1)
    out += rec.replay({})
    # --- scan 2: DC refinement, Ah=1, Al=0 (raw bit per block) -----------
    rec = _OpRecorder()
    for i, mcu in enumerate(dc_mcus()):
        for ci, zz in mcu:
            rec.bits(int(zz[0]) & 1, 1)
        at_restart(rec, i, n_mcu)
    out += sos([(ci, comp_ht[ci], 0) for ci in range(c)], 0, 0, 1, 0)
    out += rec.replay({})

    # --- AC scans: per component, true block grid ------------------------
    h, w = prep["h"], prep["w"]
    hmax, vmax = prep["hmax"], prep["vmax"]

    def true_grid(ci):
        sh, sv = sampling[ci]
        ch = -(-(h * sv) // vmax)
        cw = -(-(w * sh) // hmax)
        for by in range((ch + 7) // 8):
            for bx in range((cw + 7) // 8):
                yield qcoefs[ci][by, bx]

    def true_count(ci):
        sh, sv = sampling[ci]
        ch = -(-(h * sv) // vmax)
        cw = -(-(w * sh) // hmax)
        return ((ch + 7) // 8) * ((cw + 7) // 8)

    ac_scans: list[tuple[bytes, _OpRecorder]] = []

    for ci in range(c):  # AC first, Al=1
        rec = _OpRecorder()
        eobrun = 0
        nblk = true_count(ci)
        for bi, zz in enumerate(true_grid(ci)):
            band = [int(v) for v in zz[1:64]]
            tvals = [
                (abs(v) >> 1) * (1 if v >= 0 else -1) for v in band
            ]  # AC point transform is sign-magnitude (G.1.2.2)
            nz = [k for k, v in enumerate(tvals) if v]
            if not nz:
                eobrun += 1
                if eobrun == 0x7FFF:
                    eobrun = _emit_eobrun(rec, eobrun, [])
            else:
                eobrun = _emit_eobrun(rec, eobrun, [])
                run = 0
                last = nz[-1]
                for k, v in enumerate(tvals):
                    if k > last:
                        break
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        rec.sym(0xF0)
                        run -= 16
                    s = _category(v)
                    rec.sym((run << 4) | s)
                    rec.bits(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last < 62:
                    eobrun += 1
            # boundary check must run for EVERY block (the all-EOB path
            # included — a `continue` here once skipped the restart and
            # desynced the decoder's RSTn expectation)
            if (
                restart_interval
                and bi + 1 < nblk
                and (bi + 1) % restart_interval == 0
            ):
                eobrun = _emit_eobrun(rec, eobrun, [])
                at_restart(rec, bi, nblk)
        _emit_eobrun(rec, eobrun, [])
        ac_scans.append((sos([(ci, 0, 0)], 1, 63, 0, 1), rec))

    for ci in range(c):  # AC refinement, Ah=1, Al=0
        rec = _OpRecorder()
        eobrun = 0
        pending: list[int] = []
        nblk = true_count(ci)
        for bi, zz in enumerate(true_grid(ci)):
            band = [int(v) for v in zz[1:64]]
            tvals = [abs(v) for v in band]
            new = [k for k, t in enumerate(tvals) if t == 1]
            if not new:
                # EOB block: corrections for already-significant coefs
                # ride with the (possibly accumulated) EOB run
                eobrun += 1
                for t in tvals:
                    if t > 1:
                        pending.append(t & 1)
                if eobrun == 0x7FFF:
                    eobrun = _emit_eobrun(rec, eobrun, pending)
            else:
                eobrun = _emit_eobrun(rec, eobrun, pending)
                run = 0
                br: list[int] = []
                last_new = new[-1]
                for k, v in enumerate(band):
                    t = tvals[k]
                    if k > last_new:
                        break
                    if t == 0:
                        run += 1
                        continue
                    # drain ZRLs at EVERY nonzero (history included!) so
                    # the decoder's ZRL walk — which consumes 16
                    # zero-HISTORY positions reading corrections inline —
                    # stays aligned with where the buffered correction
                    # bits were flushed
                    while run > 15:
                        rec.sym(0xF0)
                        for b in br:
                            rec.bits(b, 1)
                        br.clear()
                        run -= 16
                    if t > 1:  # history coef: buffered correction bit
                        br.append(t & 1)
                        continue
                    rec.sym((run << 4) | 1)
                    rec.bits(1 if v > 0 else 0, 1)
                    for b in br:
                        rec.bits(b, 1)
                    br.clear()
                    run = 0
                # trailing positions (zeros + history corrections) fold
                # into the next EOB run
                if last_new < 62:
                    eobrun += 1
                    pending.extend(
                        t & 1 for t in tvals[last_new + 1 :] if t > 1
                    )
            # boundary check must run for EVERY block (see AC-first note)
            if (
                restart_interval
                and bi + 1 < nblk
                and (bi + 1) % restart_interval == 0
            ):
                eobrun = _emit_eobrun(rec, eobrun, pending)
                at_restart(rec, bi, nblk)
        _emit_eobrun(rec, eobrun, pending)
        ac_scans.append((sos([(ci, 0, 0)], 1, 63, 1, 0), rec))

    for sos_seg, rec in ac_scans:
        # every AC scan redefines AC table slot 0 over its own alphabet
        bits, syms = _flat_spec(rec.alphabet() or [0x00])
        out += _seg(0xC4, bytes([(1 << 4) | 0] + bits + syms))
        out += sos_seg
        out += rec.replay(_canonical_codes(bits, syms))
    out += b"\xff\xd9"
    return bytes(out)
