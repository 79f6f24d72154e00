"""Pure-Python baseline JPEG (JFIF) codec — no PIL/libjpeg.

Implements the sequential baseline process from the public JPEG standard
(ITU-T T.81): 8×8 block DCT, Annex-K quantization and Huffman tables,
zigzag ordering, DC-prediction + AC run-length entropy coding, 0xFF byte
stuffing, SOI/APP0/DQT/SOF0/DHT/SOS/EOI marker structure.

Scope (documented, honest): 8-bit baseline sequential, grayscale or YCbCr
(the encoder writes 4:4:4 by default or 4:2:0 with ``subsample=True``; the
decoder accepts 2×2/2×1/1×2 chroma subsampling via box upsampling).
Progressive, arithmetic-coded, 12-bit, hierarchical and non-interleaved
multi-scan inputs raise ``ValueError``.

JPEG is lossy: the round-trip contract is bounded error (quantization
noise), verified in tests as mean-abs-error, not bit equality — unlike the
PPM/PNG codecs beside it. The per-block math is numpy (matrix DCT); the
entropy coding is an explicit bit loop, fine for the actor-pool decode
stage where payloads are small and the loop is per block, not per pixel.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

# -- constants: public Annex K tables ---------------------------------------

#: ITU-T T.81 Table K.1 / K.2 — luminance / chrominance quantization
QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)

QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)

#: zigzag scan order (T.81 Figure 5)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K Huffman specs: (BITS counts per code length 1..16, HUFFVAL)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

#: orthonormal 8×8 DCT-II basis: coeffs = T @ block @ T.T
_T = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _T[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


def _build_codes(bits: List[int], vals: List[int]) -> Dict[int, Tuple[int, int]]:
    """symbol → (code, length) per T.81 Annex C canonical assignment."""
    out: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode_table(bits: List[int], vals: List[int]) -> Dict[Tuple[int, int], int]:
    """(length, code) → symbol."""
    return {(l, c): s for s, (c, l) in _build_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0
        self.pad_bytes = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                # entropy segment exhausted: feed final-byte 1-padding, but
                # only a bounded amount — a decoder still asking for data
                # after that is reading a TRUNCATED stream
                if self.pad_bytes >= 8:
                    raise ValueError("truncated JPEG entropy data")
                self.pad_bytes += 1
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError("unexpected marker inside entropy data")
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        if n > self.nbits:
            raise ValueError("truncated JPEG entropy data")
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_symbol(self, table: Dict[Tuple[int, int], int]) -> int:
        self._fill()
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")


def _magnitude(v: int) -> Tuple[int, int]:
    """value → (size category, amplitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    px = px.astype(np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(px: np.ndarray) -> np.ndarray:
    y, cb, cr = px[..., 0], px[..., 1] - 128, px[..., 2] - 128
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255)


def _encode_plane(
    plane: np.ndarray,
    quant: np.ndarray,
    dc_codes: Dict[int, Tuple[int, int]],
    ac_codes: Dict[int, Tuple[int, int]],
    writer: _BitWriter,
    pred: int,
) -> int:
    """Encode one 8-multiple padded plane; returns the new DC predictor."""
    h, w = plane.shape
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            block = plane[by : by + 8, bx : bx + 8] - 128.0
            coeffs = _T @ block @ _T.T
            q = np.round(coeffs / quant).astype(np.int64)
            zz = q.reshape(-1)[ZIGZAG]
            # DC
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            size, bits = _magnitude(diff)
            code, length = dc_codes[size]
            writer.write(code, length)
            writer.write(bits, size)
            # AC: run-length of zeros + magnitude
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_codes[0xF0]  # ZRL
                    writer.write(code, length)
                    run -= 16
                size, bits = _magnitude(v)
                code, length = ac_codes[(run << 4) | size]
                writer.write(code, length)
                writer.write(bits, size)
                run = 0
            if run:
                code, length = ac_codes[0x00]  # EOB
                writer.write(code, length)
    return pred


def encode_jpeg(
    pixels: np.ndarray, quality: int = 85, subsample: bool = False
) -> bytes:
    """H×W (grayscale) or H×W×3 (RGB) uint8 → baseline JFIF bytes
    (Annex-K tables scaled by ``quality`` 1-100). ``subsample=True``
    writes 4:2:0 (2×2 box-averaged chroma, the common camera layout);
    default is 4:4:4."""
    assert pixels.dtype == np.uint8
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    # quality scaling per the well-known IJG formula
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    ql = np.clip((QUANT_LUMA * scale + 50) // 100, 1, 255)
    qc = np.clip((QUANT_CHROMA * scale + 50) // 100, 1, 255)

    mcu = 16 if (subsample and not gray) else 8
    ph, pw = -(-h // mcu) * mcu, -(-w // mcu) * mcu

    def pad(plane: np.ndarray) -> np.ndarray:
        return np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )

    if gray:
        planes = [pad(pixels.astype(np.float64))]
    else:
        ycc = _rgb_to_ycbcr(pixels)
        planes = [pad(ycc[..., i]) for i in range(3)]
        if subsample:
            # 2×2 box mean on the padded chroma planes
            for ci in (1, 2):
                p = planes[ci]
                planes[ci] = (
                    p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2]
                ) / 4.0

    dc_l = _build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _build_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _build_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    writer = _BitWriter()
    if gray:
        _encode_plane(planes[0], ql, dc_l, ac_l, writer, 0)
    elif subsample:
        # 4:2:0 MCU = 4 luma blocks (left-right, top-bottom) + 1 Cb + 1 Cr
        preds = [0, 0, 0]
        for by in range(0, ph, 16):
            for bx in range(0, pw, 16):
                for v in range(2):
                    for hh in range(2):
                        sub = np.ascontiguousarray(
                            planes[0][by + 8 * v : by + 8 * v + 8,
                                      bx + 8 * hh : bx + 8 * hh + 8]
                        )
                        preds[0] = _encode_plane(sub, ql, dc_l, ac_l, writer, preds[0])
                for ci in (1, 2):
                    sub = np.ascontiguousarray(
                        planes[ci][by // 2 : by // 2 + 8, bx // 2 : bx // 2 + 8]
                    )
                    preds[ci] = _encode_plane(sub, qc, dc_c, ac_c, writer, preds[ci])
    else:
        # 4:4:4 interleaved MCU = one 8×8 block per component
        preds = [0, 0, 0]
        for by in range(0, ph, 8):
            for bx in range(0, pw, 8):
                for ci, (plane, quant, dcc, acc_) in enumerate(
                    [(planes[0], ql, dc_l, ac_l),
                     (planes[1], qc, dc_c, ac_c),
                     (planes[2], qc, dc_c, ac_c)]
                ):
                    sub = np.ascontiguousarray(plane[by : by + 8, bx : bx + 8])
                    preds[ci] = _encode_plane(sub, quant, dcc, acc_, writer, preds[ci])
    scan = writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dqt(tid: int, table: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(int(v) for v in table.reshape(-1)[ZIGZAG]))

    def dht(cls: int, tid: int, bits: List[int], vals: List[int]) -> bytes:
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    ncomp = 1 if gray else 3
    sof_comps = b""
    sos_comps = b""
    for ci in range(ncomp):
        qid = 0 if ci == 0 else 1
        samp = 0x22 if (subsample and not gray and ci == 0) else 0x11
        sof_comps += bytes([ci + 1, samp, qid])
        sos_comps += bytes([ci + 1, (0 if ci == 0 else 1) * 0x11])
    out = (
        b"\xff\xd8"  # SOI
        + seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + dqt(0, ql)
        + (dqt(1, qc) if not gray else b"")
        + seg(0xFFC0, struct.pack(">BHHB", 8, h, w, ncomp) + sof_comps)
        + dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
        + dht(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
        + (dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS) if not gray else b"")
        + (dht(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS) if not gray else b"")
        + seg(0xFFDA, bytes([ncomp]) + sos_comps + b"\x00\x3f\x00")
        + scan
        + b"\xff\xd9"  # EOI
    )
    return out


def _decode_block(
    reader: _BitReader,
    dc_table: Dict[Tuple[int, int], int],
    ac_table: Dict[Tuple[int, int], int],
    quant: np.ndarray,
    pred: int,
) -> Tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.int64)
    size = reader.read_symbol(dc_table)
    diff = _extend(reader.read_bits(size), size)
    pred += diff
    zz[0] = pred
    k = 1
    while k < 64:
        rs = reader.read_symbol(ac_table)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run overflows block")
        zz[k] = _extend(reader.read_bits(size), size)
        k += 1
    coeffs = (zz[UNZIGZAG].reshape(8, 8)) * quant
    block = _T.T @ coeffs @ _T + 128.0
    return block, pred


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline (SOF0/1) or progressive (SOF2) JFIF bytes → H×W
    (grayscale) or H×W×3 (RGB) uint8. Progressive decode implements the
    full T.81 Annex G successive-approximation algorithm: DC first/refine,
    AC first/refine with EOB runs and correction bits, spectral selection,
    interleaved and single-component scans, tables redefinable between
    scans.

    Raises ``ValueError`` on non-JPEG input, truncation, and unsupported
    variants (arithmetic/lossless/12-bit, >2× subsampling, restart
    markers, baseline non-interleaved multi-scan). The contract is total:
    adversarial bytes can only produce ``ValueError``, never a stray
    IndexError/KeyError/struct.error — the per-row degrade path in
    ``DecodeImageStage`` catches exactly ``ValueError``."""
    try:
        return _decode_jpeg_checked(payload)
    except ValueError:
        raise
    except (IndexError, KeyError, struct.error, ZeroDivisionError, StopIteration) as e:
        raise ValueError("malformed JPEG: %s: %s" % (type(e).__name__, e))


def _decode_jpeg_checked(payload: bytes) -> np.ndarray:
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    quant: Dict[int, np.ndarray] = {}
    huff_dc: Dict[int, Dict[Tuple[int, int], int]] = {}
    huff_ac: Dict[int, Dict[Tuple[int, int], int]] = {}
    frame = None
    comps: List[Tuple[int, int, int, int]] = []  # (id, h_samp, v_samp, qid)
    progressive = False
    coefs: List[np.ndarray] = []  # per comp: (bh_pad, bw_pad, 64) zigzag
    scans_seen = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        while pos + 2 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1  # T.81 B.1.1.2 fill bytes before a marker
        marker = struct.unpack(">H", payload[pos : pos + 2])[0]
        if marker == 0xFFD9:
            if progressive and scans_seen:
                return _reconstruct_progressive(frame, comps, quant, coefs)
            break
        (ln,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xFFDB:
            o = 0
            while o < len(body):
                pq, tid = body[o] >> 4, body[o] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(body[o + 1 : o + 65], dtype=np.uint8)
                quant[tid] = tbl.reshape(8, 8)
                o += 65
        elif marker == 0xFFC4:
            o = 0
            while o < len(body):
                cls, tid = body[o] >> 4, body[o] & 0x0F
                bits = list(body[o + 1 : o + 17])
                nv = sum(bits)
                vals = list(body[o + 17 : o + 17 + nv])
                tab = _build_decode_table(bits, vals)
                (huff_dc if cls == 0 else huff_ac)[tid] = tab
                o += 17 + nv
        elif marker in (0xFFC0, 0xFFC1, 0xFFC2):
            if frame is not None:
                raise ValueError("multiple SOF segments")
            progressive = marker == 0xFFC2
            if len(body) < 6 or len(body) < 6 + 3 * body[5]:
                raise ValueError("malformed SOF segment")
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            if fh == 0 or fw == 0:
                raise ValueError("zero-sized JPEG frame")
            comps = []
            for ci in range(nc):
                cid, samp, qid = body[6 + 3 * ci : 9 + 3 * ci]
                hs, vs = samp >> 4, samp & 0x0F
                if hs == 0 or vs == 0:
                    raise ValueError("zero sampling factor in SOF")
                comps.append((cid, hs, vs, qid))
            frame = (fh, fw, nc)
        elif marker in (0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise ValueError("non-baseline JPEG process not supported")
        elif marker == 0xFFDD:
            raise ValueError("restart intervals not supported")
        elif marker == 0xFFDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            if progressive:
                if not coefs:
                    coefs = _alloc_coefs(frame, comps)
                entropy_start = pos + 2 + ln
                end = _entropy_end(payload, entropy_start)
                _decode_prog_scan(
                    payload[entropy_start:end], body, frame, comps, coefs,
                    huff_dc, huff_ac,
                )
                scans_seen += 1
                pos = end
                continue
            ns = body[0]
            if ns != frame[2]:
                # a spec-legal non-interleaved file carries one scan per
                # component; decoding only the first would silently zero
                # the other planes — refuse instead
                raise ValueError(
                    "non-interleaved multi-scan JPEG not supported"
                )
            scan_sel = []  # (comp index, dc table, ac table)
            for si in range(ns):
                cid, tabs = body[1 + 2 * si], body[2 + 2 * si]
                matches = [i for i, c in enumerate(comps) if c[0] == cid]
                if not matches:
                    raise ValueError("SOS references unknown component id")
                scan_sel.append((matches[0], tabs >> 4, tabs & 0x0F))
            pos = pos + 2 + ln
            return _decode_scan(payload, pos, frame, comps, scan_sel,
                                quant, huff_dc, huff_ac)
        pos += 2 + ln
    if progressive and scans_seen:
        # EOI as the final two bytes falls out of the 4-byte loop window
        while pos + 2 < len(payload) and payload[pos : pos + 2] == b"\xff\xff":
            pos += 1  # fill bytes before the trailing EOI
        if payload[pos : pos + 2] != b"\xff\xd9":
            raise ValueError("truncated progressive JPEG: missing EOI")
        return _reconstruct_progressive(frame, comps, quant, coefs)
    raise ValueError("no SOS marker found")


def _decode_scan(payload, pos, frame, comps, scan_sel, quant, huff_dc, huff_ac):
    fh, fw, nc = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("subsampling beyond 2x not supported")
    # bound the entropy segment at the first unstuffed marker prefix —
    # every literal 0xFF inside entropy data is stuffed (FF 00), so this
    # is exact, and it excludes T.81 B.1.1.2 fill bytes before the EOI
    # (an rfind of FFD9 would hand those to the bit reader)
    end = _entropy_end(payload, pos)
    for idx, dct, act in scan_sel:
        if dct not in huff_dc or act not in huff_ac:
            raise ValueError("SOS references undefined Huffman table")
        if comps[idx][3] not in quant:
            raise ValueError("component references undefined quant table")
    reader = _BitReader(payload[pos:end])
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-fw // mcu_w)
    mcus_y = -(-fh // mcu_h)
    planes = [
        np.zeros((mcus_y * 8 * c[2], mcus_x * 8 * c[1])) for c in comps
    ]
    preds = [0] * nc
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for idx, dct, act in scan_sel:
                _, hs, vs, qid = comps[idx]
                for v in range(vs):
                    for hh in range(hs):
                        block, preds[idx] = _decode_block(
                            reader, huff_dc[dct], huff_ac[act],
                            quant[qid], preds[idx],
                        )
                        y0 = (my * vs + v) * 8
                        x0 = (mx * hs + hh) * 8
                        planes[idx][y0 : y0 + 8, x0 : x0 + 8] = block
    # upsample subsampled planes to full MCU grid resolution, crop to frame
    full = []
    for ci, (cid, hs, vs, qid) in enumerate(comps):
        p = planes[ci]
        if hs < hmax or vs < vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:fh, :fw])
    if nc == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    if nc != 3:
        raise ValueError("unsupported component count %d" % nc)
    ycc = np.stack(full, axis=-1)
    return np.round(_ycbcr_to_rgb(ycc)).astype(np.uint8)


# -- progressive (SOF2) decode ----------------------------------------------
#
# T.81 Annex G: DCT coefficients arrive over multiple scans — spectral
# selection (band Ss..Se per scan) and successive approximation (bit-plane
# refinement, Ah/Al). Coefficients accumulate in per-component zigzag
# buffers; dequantization + IDCT happen once, after the last scan.


def _entropy_end(payload: bytes, pos: int) -> int:
    """Index of the marker terminating the entropy segment at ``pos``
    (0xFF followed by a non-stuffing byte). Restart markers rejected —
    DRI already raises before any scan."""
    i = pos
    n = len(payload)
    while i + 1 < n:
        if payload[i] == 0xFF and payload[i + 1] != 0x00:
            # entropy ends HERE, at the first 0xFF of the run — T.81
            # B.1.1.2 allows any number of 0xFF fill bytes before the
            # marker byte proper; the caller's marker loop skips them
            j = i
            while j + 1 < n and payload[j + 1] == 0xFF:
                j += 1
            if j + 1 < n and 0xD0 <= payload[j + 1] <= 0xD7:
                raise ValueError("restart markers not supported")
            return i
        i += 1
    return n


def _comp_block_dims(frame, comps, idx) -> Tuple[int, int]:
    """REAL (non-MCU-padded) block grid of one component — the grid a
    non-interleaved scan transmits (T.81 A.1.1: ceil of the scaled frame
    dims, then ceil/8)."""
    fh, fw, _ = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    _, hs, vs, _ = comps[idx]
    cw = -(-fw * hs // hmax)
    ch = -(-fh * vs // vmax)
    return -(-ch // 8), -(-cw // 8)


def _mcu_dims(frame, comps) -> Tuple[int, int]:
    fh, fw, _ = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    return -(-fh // (8 * vmax)), -(-fw // (8 * hmax))


def _alloc_coefs(frame, comps) -> List[np.ndarray]:
    mcus_y, mcus_x = _mcu_dims(frame, comps)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("subsampling beyond 2x not supported")
    return [
        np.zeros((mcus_y * vs, mcus_x * hs, 64), dtype=np.int64)
        for (_, hs, vs, _) in comps
    ]


def _decode_prog_scan(entropy, body, frame, comps, coefs, huff_dc, huff_ac):
    ns = body[0] if body else 0
    if ns < 1 or len(body) != 1 + 2 * ns + 3:
        raise ValueError("malformed progressive SOS header")
    scan_sel = []  # (comp index, dc table id, ac table id)
    for si in range(ns):
        cid, tabs = body[1 + 2 * si], body[2 + 2 * si]
        matches = [i for i, c in enumerate(comps) if c[0] == cid]
        if not matches:
            raise ValueError("SOS references unknown component id")
        scan_sel.append((matches[0], tabs >> 4, tabs & 0x0F))
    ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
    ah, al = ahal >> 4, ahal & 0x0F
    if ss > 63 or se > 63 or ss > se or al > 13 or ah > 13:
        raise ValueError("invalid progressive scan parameters")
    if ah != 0 and ah != al + 1:
        raise ValueError("successive approximation must refine one bit")
    reader = _BitReader(entropy)
    if ss == 0:
        if se != 0:
            raise ValueError("DC scan must have Se = 0")
        _decode_dc_scan(reader, scan_sel, ah, al, frame, comps, coefs, huff_dc)
    else:
        if ns != 1:
            raise ValueError("AC scans must be single-component")
        idx, _, act = scan_sel[0]
        if act not in huff_ac:
            raise ValueError("SOS references undefined Huffman table")
        _decode_ac_scan(
            reader, idx, huff_ac[act], ss, se, ah, al, frame, comps, coefs
        )


def _decode_dc_scan(reader, scan_sel, ah, al, frame, comps, coefs, huff_dc):
    refine = ah != 0
    if not refine:
        for _, dct, _ in scan_sel:
            if dct not in huff_dc:
                raise ValueError("SOS references undefined Huffman table")

    def one_block(blk, pred, dct):
        if refine:
            if reader.read_bits(1):
                blk[0] |= 1 << al
            return pred
        size = reader.read_symbol(huff_dc[dct])
        pred += _extend(reader.read_bits(size), size)
        blk[0] = pred << al
        return pred

    if len(scan_sel) > 1:
        # interleaved MCU order over the padded grid
        mcus_y, mcus_x = _mcu_dims(frame, comps)
        preds = [0] * len(scan_sel)
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for si, (idx, dct, _) in enumerate(scan_sel):
                    _, hs, vs, _ = comps[idx]
                    for v in range(vs):
                        for hh in range(hs):
                            blk = coefs[idx][my * vs + v, mx * hs + hh]
                            preds[si] = one_block(blk, preds[si], dct)
    else:
        # single component: raster order over its REAL block grid
        idx, dct, _ = scan_sel[0]
        bh, bw = _comp_block_dims(frame, comps, idx)
        pred = 0
        for by in range(bh):
            for bx in range(bw):
                pred = one_block(coefs[idx][by, bx], pred, dct)


def _decode_ac_scan(reader, idx, ac_table, ss, se, ah, al, frame, comps, coefs):
    bh, bw = _comp_block_dims(frame, comps, idx)
    arr = coefs[idx]
    eobrun = 0
    if ah == 0:
        # first pass for this band (G.1.2.2): values land at << al
        for by in range(bh):
            for bx in range(bw):
                if eobrun > 0:
                    eobrun -= 1
                    continue
                blk = arr[by, bx]
                k = ss
                while k <= se:
                    rs = reader.read_symbol(ac_table)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r != 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.read_bits(r)
                            break
                        k += 16  # ZRL
                        continue
                    k += r
                    if k > se:
                        raise ValueError("AC run overflows band")
                    blk[k] = _extend(reader.read_bits(s), s) << al
                    k += 1
        return
    # refinement pass (G.1.2.3): one correction bit per already-nonzero
    # coefficient; new coefficients appear as ±1 << al
    p1 = 1 << al
    m1 = -(1 << al)

    def correct(blk, k):
        if reader.read_bits(1):
            c = int(blk[k])
            if (c & p1) == 0:
                blk[k] = c + (p1 if c >= 0 else m1)

    for by in range(bh):
        for bx in range(bw):
            blk = arr[by, bx]
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = reader.read_symbol(ac_table)
                    r, s = rs >> 4, rs & 0x0F
                    newval = 0
                    if s == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.read_bits(r)
                            break
                        # ZRL: skip 16 zero-history coefficients
                    else:
                        if s != 1:
                            raise ValueError(
                                "invalid refinement magnitude category"
                            )
                        newval = p1 if reader.read_bits(1) else m1
                    while k <= se:
                        if blk[k] != 0:
                            correct(blk, k)
                        else:
                            r -= 1
                            if r < 0:
                                break
                        k += 1
                    if k > se:
                        if newval:
                            raise ValueError("AC refinement run overflows band")
                        break
                    if newval:
                        blk[k] = newval
                    k += 1
            if eobrun > 0:
                # EOB region: correction bits only, for the remaining
                # nonzero-history coefficients of this block's band
                while k <= se:
                    if blk[k] != 0:
                        correct(blk, k)
                    k += 1
                eobrun -= 1


def _reconstruct_progressive(frame, comps, quant, coefs):
    fh, fw, nc = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    full = []
    for ci, (cid, hs, vs, qid) in enumerate(comps):
        if qid not in quant:
            raise ValueError("component references undefined quant table")
        arr = coefs[ci]
        bh, bw = arr.shape[:2]
        natural = arr[..., UNZIGZAG].reshape(bh, bw, 8, 8) * quant[qid]
        blocks = np.einsum("ij,xyjk,kl->xyil", _T.T, natural, _T) + 128.0
        p = blocks.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        if hs < hmax or vs < vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:fh, :fw])
    if nc == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    if nc != 3:
        raise ValueError("unsupported component count %d" % nc)
    ycc = np.stack(full, axis=-1)
    return np.round(_ycbcr_to_rgb(ycc)).astype(np.uint8)


# -- progressive (SOF2) encode ----------------------------------------------
#
# Fixture-grade progressive encoder: spectral selection (bands 1-5 / 6-63)
# × successive approximation (Al=1 first passes, then the Al=0 refinement
# passes, then DC refinement) — exercising every scan type the decoder
# implements, including accumulated EOB runs with buffered correction
# bits. The on-wire invariant (tested): the quantized coefficients are
# IDENTICAL to ``encode_jpeg``'s for the same image/quality, so decoding
# the progressive bytes must reproduce the baseline decode bit-for-bit.

#: AC Huffman table covering all 256 run/size symbols (progressive scans
#: emit EOBn symbols 0x10..0xE0 that the Annex-K baseline tables lack):
#: 255 canonical codes at length 9 plus one at length 10.
_AC_FLAT_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
_AC_FLAT_VALS = list(range(256))


def _block_zigzag(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """Padded plane → (bh, bw, 64) quantized zigzag coefficients (the same
    per-block math as ``_encode_plane``, vectorized)."""
    h, w = plane.shape
    bh, bw = h // 8, w // 8
    blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - 128.0
    coeffs = np.einsum("ij,xyjk,kl->xyil", _T, blocks, _T.T)
    q = np.round(coeffs / quant).astype(np.int64)
    return q.reshape(bh, bw, 64)[..., ZIGZAG]


class _EobState:
    """Per-AC-scan EOB-run accumulator with the buffered correction bits
    (libjpeg's BE buffer) that refinement EOB regions carry."""

    def __init__(self, writer: _BitWriter, ac_codes):
        self.writer = writer
        self.ac = ac_codes
        self.eobrun = 0
        self.pending: List[int] = []

    def flush(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            code, length = self.ac[r << 4]
            self.writer.write(code, length)
            if r:
                self.writer.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.pending:
            self.writer.write(b, 1)
        self.pending = []

    def bump(self) -> None:
        self.eobrun += 1
        if self.eobrun == 0x7FFF:
            self.flush()


def _enc_ac_first_block(zz, ss, se, al, st: _EobState) -> None:
    w, ac = st.writer, st.ac
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        av = abs(v) >> al
        if av == 0:
            r += 1
            continue
        st.flush()
        while r > 15:
            code, length = ac[0xF0]
            w.write(code, length)
            r -= 16
        size, bits = _magnitude(av if v > 0 else -av)
        code, length = ac[(r << 4) | size]
        w.write(code, length)
        w.write(bits, size)
        r = 0
    if r:
        st.bump()


def _enc_ac_refine_block(zz, ss, se, al, st: _EobState) -> None:
    w, ac = st.writer, st.ac
    seq = []  # ('z'|'n'|'h', bit) per band position
    for k in range(ss, se + 1):
        v = int(zz[k])
        a = abs(v) >> al
        if a == 0:
            seq.append(("z", 0))
        elif a == 1:
            seq.append(("n", 1 if v > 0 else 0))
        else:
            seq.append(("h", a & 1))
    newly = [i for i, (t, _) in enumerate(seq) if t == "n"]
    if not newly:
        # whole band is EOB region: buffer its correction bits
        st.pending.extend(b for t, b in seq if t == "h")
        st.bump()
        return
    st.flush()  # this block emits symbols → any pending EOB run ends here
    last_n = newly[-1]
    r = 0
    loc: List[int] = []  # correction bits crossed since the last symbol
    for i in range(last_n + 1):
        t, b = seq[i]
        if t == "h":
            loc.append(b)
            continue
        if t == "z":
            r += 1
            if r == 16:
                # safe to emit eagerly: a newly-nonzero coef follows by
                # construction (i <= last_n), so this is never a trailing run
                code, length = ac[0xF0]
                w.write(code, length)
                for cb in loc:
                    w.write(cb, 1)
                loc = []
                r = 0
            continue
        code, length = ac[(r << 4) | 1]
        w.write(code, length)
        w.write(b, 1)  # sign of the ±1
        for cb in loc:
            w.write(cb, 1)
        loc = []
        r = 0
    if last_n < se - ss:
        # positions remain after the last newly-nonzero → this block's tail
        # is an EOB region; its correction bits ride the next EOB flush
        st.pending.extend(b for t, b in seq[last_n + 1 :] if t == "h")
        st.bump()


def encode_jpeg_progressive(
    pixels: np.ndarray, quality: int = 85, subsample: bool = False
) -> bytes:
    """H×W (grayscale) or H×W×3 (RGB) uint8 → progressive (SOF2) JFIF
    bytes. Same quantization as ``encode_jpeg`` → decodes bit-identically
    to the baseline encoding of the same image."""
    assert pixels.dtype == np.uint8
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    ql = np.clip((QUANT_LUMA * scale + 50) // 100, 1, 255)
    qc = np.clip((QUANT_CHROMA * scale + 50) // 100, 1, 255)

    mcu = 16 if (subsample and not gray) else 8
    ph, pw = -(-h // mcu) * mcu, -(-w // mcu) * mcu

    def pad(plane: np.ndarray) -> np.ndarray:
        return np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )

    if gray:
        planes = [pad(pixels.astype(np.float64))]
    else:
        ycc = _rgb_to_ycbcr(pixels)
        planes = [pad(ycc[..., i]) for i in range(3)]
        if subsample:
            for ci in (1, 2):
                p = planes[ci]
                planes[ci] = (
                    p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2]
                ) / 4.0

    ncomp = 1 if gray else 3
    samp = [(2, 2), (1, 1), (1, 1)] if (subsample and not gray) else [(1, 1)] * ncomp
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    coef = [
        _block_zigzag(planes[ci], ql if ci == 0 else qc) for ci in range(ncomp)
    ]
    # REAL per-component block dims (what single-component scans transmit)
    real = []
    for ci in range(ncomp):
        hs, vs = samp[ci]
        cw = -(-w * hs // hmax)
        ch = -(-h * vs // vmax)
        real.append((-(-ch // 8), -(-cw // 8)))

    dc_codes = [
        _build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
        if ci == 0
        else _build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
        for ci in range(ncomp)
    ]
    ac_flat = _build_codes(_AC_FLAT_BITS, _AC_FLAT_VALS)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def sos(comps_sel, ss, se, ah, al, entropy: bytes) -> bytes:
        body = bytes([len(comps_sel)])
        for ci in comps_sel:
            td = 0 if ci == 0 else 1
            body += bytes([ci + 1, (td << 4) | 0])  # AC always flat table 0
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xFFDA, body) + entropy

    AL = 1
    scans = b""

    # scan 1: DC first, all components interleaved, Al=AL
    wtr = _BitWriter()
    preds = [0] * ncomp
    mcus_y, mcus_x = ph // (8 * vmax), pw // (8 * hmax)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(ncomp):
                hs, vs = samp[ci]
                for v in range(vs):
                    for hh in range(hs):
                        dc = int(coef[ci][my * vs + v, mx * hs + hh, 0]) >> AL
                        diff = dc - preds[ci]
                        preds[ci] = dc
                        size, bits = _magnitude(diff)
                        code, length = dc_codes[ci][size]
                        wtr.write(code, length)
                        wtr.write(bits, size)
    scans += sos(list(range(ncomp)), 0, 0, 0, AL, wtr.flush())

    bands = [(1, 5), (6, 63)]
    # AC first passes at Al=AL, then refinement passes at Ah=AL → Al=0
    for ah, al, enc in [(0, AL, _enc_ac_first_block), (AL, 0, _enc_ac_refine_block)]:
        for ss, se in bands:
            for ci in range(ncomp):
                wtr = _BitWriter()
                st = _EobState(wtr, ac_flat)
                bh, bw = real[ci]
                for by in range(bh):
                    for bx in range(bw):
                        enc(coef[ci][by, bx], ss, se, al, st)
                st.flush()
                scans += sos([ci], ss, se, ah, al, wtr.flush())

    # final scan: DC refinement (one bit per block, interleaved)
    wtr = _BitWriter()
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(ncomp):
                hs, vs = samp[ci]
                for v in range(vs):
                    for hh in range(hs):
                        wtr.write(int(coef[ci][my * vs + v, mx * hs + hh, 0]) & 1, 1)
    scans += sos(list(range(ncomp)), 0, 0, AL, 0, wtr.flush())

    def dqt(tid: int, table: np.ndarray) -> bytes:
        return seg(
            0xFFDB, bytes([tid]) + bytes(int(v) for v in table.reshape(-1)[ZIGZAG])
        )

    def dht(cls: int, tid: int, bits: List[int], vals: List[int]) -> bytes:
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    sof_comps = b""
    for ci in range(ncomp):
        hs, vs = samp[ci]
        sof_comps += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    return (
        b"\xff\xd8"
        + seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + dqt(0, ql)
        + (dqt(1, qc) if not gray else b"")
        + seg(0xFFC2, struct.pack(">BHHB", 8, h, w, ncomp) + sof_comps)
        + dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
        + (dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS) if not gray else b"")
        + dht(1, 0, _AC_FLAT_BITS, _AC_FLAT_VALS)
        + scans
        + b"\xff\xd9"
    )
