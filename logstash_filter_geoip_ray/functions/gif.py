"""Zero-dependency GIF codec (GIF87a/89a, real LZW) for the multimodal
decode tier.

Decode handles: global and local color tables, interlaced row order (the
four-pass scheme), variable-width LZW with code-size growth and mid-stream
clear codes, 89a extension blocks (skipped; transparency index is treated
as an ordinary palette entry — feature extraction wants pixel statistics,
not compositing). Only the FIRST image descriptor is decoded: animation
frames composite against disposal methods that feature extraction has no
use for.

Encode produces a minimal single-frame GIF with a true LZW compressor
(dictionary rebuild on clear, 12-bit cap) so decode tests exercise the
real code path, not a degenerate always-clear stream. Images must use
≤256 distinct colors (callers render synthetic fixtures, so this is by
construction).

The reference engine has no media path; this exists for the
training-data-pipeline operator suite (same tier as PPM/PNG/JPEG/AVI).
"""

from __future__ import annotations

import struct
from typing import List, Tuple

import numpy as np

__all__ = ["encode_gif", "decode_gif"]

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# -- bit-level LZW ----------------------------------------------------------


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    next_code = eoi + 1
    code_size = min_code_size + 1
    table = {(i,): i for i in range(clear)}

    out_bits: List[Tuple[int, int]] = [(clear, code_size)]
    seq: Tuple[int, ...] = ()
    for sym in indices.tolist():
        cand = seq + (sym,)
        if cand in table:
            seq = cand
            continue
        out_bits.append((table[seq], code_size))
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:  # table full: emit clear, rebuild
            out_bits.append((clear, code_size))
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        seq = (sym,)
    if seq:
        out_bits.append((table[seq], code_size))
    out_bits.append((eoi, code_size))

    # LSB-first bit packing
    acc = 0
    nbits = 0
    data = bytearray()
    for code, width in out_bits:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    return bytes(data)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    table: List[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]

    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    n = len(data)
    while len(out) < n_pixels:
        while nbits < code_size:
            if pos >= n:
                raise ValueError("LZW stream ended before all pixels decoded")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size

        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("corrupt LZW code out of table range")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("LZW stream decoded fewer pixels than the frame needs")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


# -- container --------------------------------------------------------------


def encode_gif(pixels: np.ndarray) -> bytes:
    """H×W×3 uint8 (≤256 distinct colors) → single-frame GIF89a bytes."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = np.repeat(px[:, :, None], 3, axis=2)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_gif wants H×W×3 uint8")
    h, w = px.shape[:2]
    flat = px.reshape(-1, 3)
    palette, indices = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("encode_gif supports at most 256 distinct colors")
    # color table size must be a power of two ≥ 2
    bits = max(1, int(np.ceil(np.log2(max(2, len(palette))))))
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[: len(palette)] = palette

    min_code = max(2, bits)  # LZW minimum code size is ≥ 2 per spec
    lzw = _lzw_encode(indices.astype(np.int64), min_code)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7), 0, 0)
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out += bytes([min_code])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def _skip_subblocks(payload: bytes, pos: int) -> int:
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF sub-block chain")
        ln = payload[pos]
        pos += 1
        if ln == 0:
            return pos
        pos += ln


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes → H×W×3 uint8 RGB of the first image frame.

    Total ValueError contract (like ``jpeg.decode_jpeg``): any malformed or
    truncated payload raises ValueError, never struct.error/IndexError —
    DecodeImageStage's non-strict degrade path catches exactly ValueError."""
    try:
        return _decode_gif_inner(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt GIF payload: {e}") from e


def _decode_gif_inner(payload: bytes) -> np.ndarray:
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        size = 2 << (packed & 7)
        gct = np.frombuffer(payload[pos : pos + size * 3], dtype=np.uint8)
        if len(gct) < size * 3:
            raise ValueError("truncated global color table")
        gct = gct.reshape(size, 3)
        pos += size * 3

    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            break
        if block == 0x21:  # extension: label + sub-blocks
            if pos >= len(payload):
                raise ValueError("truncated GIF extension")
            pos = _skip_subblocks(payload, pos + 1)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")

        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        ct = gct
        if ipacked & 0x80:
            size = 2 << (ipacked & 7)
            ct = np.frombuffer(payload[pos : pos + size * 3], dtype=np.uint8)
            if len(ct) < size * 3:
                raise ValueError("truncated local color table")
            ct = ct.reshape(size, 3)
            pos += size * 3
        if ct is None:
            raise ValueError("GIF frame has no color table")
        if w == 0 or h == 0:
            raise ValueError("zero-sized GIF frame")

        min_code = payload[pos]
        pos += 1
        if not (2 <= min_code <= 11):
            raise ValueError("bad LZW minimum code size")
        chunks = []
        while True:
            if pos >= len(payload):
                raise ValueError("truncated GIF image data")
            ln = payload[pos]
            pos += 1
            if ln == 0:
                break
            chunks.append(payload[pos : pos + ln])
            pos += ln
        if payload[-1] != 0x3B:
            # part of the total-ValueError contract: a payload cut between
            # the image data and the trailer must still read as truncated
            raise ValueError("GIF missing trailer")
        idx = _lzw_decode(b"".join(chunks), min_code, w * h)
        if idx.max(initial=0) >= len(ct):
            raise ValueError("GIF pixel index outside color table")
        rows = idx.reshape(h, w)
        if ipacked & 0x40:  # interlaced: rows arrive in four passes
            order = np.concatenate(
                [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
            )
            deinterlaced = np.empty_like(rows)
            deinterlaced[order] = rows
            rows = deinterlaced
        return ct[rows]

    raise ValueError("GIF contains no image descriptor")
