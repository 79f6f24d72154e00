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
    """Baseline JFIF bytes → H×W (grayscale) or H×W×3 (RGB) uint8.

    Raises ``ValueError`` on non-JPEG input, truncation, and unsupported
    variants (progressive/arithmetic/12-bit, >2× subsampling, restart
    markers, non-interleaved multi-scan). The contract is total: adversarial
    bytes can only produce ``ValueError``, never a stray
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
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = struct.unpack(">H", payload[pos : pos + 2])[0]
        if marker == 0xFFD9:
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
        elif marker == 0xFFC0 or marker == 0xFFC1:
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
        elif marker in (0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise ValueError("non-baseline JPEG process not supported")
        elif marker == 0xFFDD:
            raise ValueError("restart intervals not supported")
        elif marker == 0xFFDA:
            if frame is None:
                raise ValueError("SOS before SOF")
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
    raise ValueError("no SOS marker found")


def _decode_scan(payload, pos, frame, comps, scan_sel, quant, huff_dc, huff_ac):
    fh, fw, nc = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("subsampling beyond 2x not supported")
    # find EOI to bound the entropy segment
    end = payload.rfind(b"\xff\xd9")
    if end < 0:
        end = len(payload)
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
