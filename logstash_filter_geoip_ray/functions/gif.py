"""Zero-dependency GIF codec (GIF87a/89a, real LZW) for the multimodal
decode tier.

Decode handles: global and local color tables, interlaced row order (the
four-pass scheme), variable-width LZW with code-size growth and mid-stream
clear codes. ``decode_gif`` reads the FIRST image descriptor only (89a
extensions skipped; transparency treated as an ordinary palette entry —
feature extraction wants pixel statistics, not compositing).
``decode_gif_frames`` is the full ANIMATION path: every image descriptor
composited onto the logical screen honoring Graphic Control Extension
transparency and disposal methods 0–3 (leave / restore-to-background /
restore-to-previous) — GIF is the third natively decodable video tier
(after MJPEG streams and AVI containers).

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

__all__ = [
    "encode_gif",
    "decode_gif",
    "encode_gif_animation",
    "decode_gif_frames",
]

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


def _palette_indices(flat: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Map (M,3) uint8 rows to indices into an (N,3) palette (every row
    must be present). Vectorized via 24-bit color codes + searchsorted."""
    codes = (
        flat[:, 0].astype(np.int64) << 16
        | flat[:, 1].astype(np.int64) << 8
        | flat[:, 2].astype(np.int64)
    )
    pal = (
        palette[:, 0].astype(np.int64) << 16
        | palette[:, 1].astype(np.int64) << 8
        | palette[:, 2].astype(np.int64)
    )
    order = np.argsort(pal, kind="stable")
    pos = np.searchsorted(pal[order], codes)
    if (pos >= len(pal)).any() or (pal[order][pos] != codes).any():
        raise ValueError("pixel color missing from palette")
    return order[pos]


def encode_gif_animation(
    screen_hw: Tuple[int, int],
    patches: List[dict],
    bg_color: Tuple[int, int, int] = (0, 0, 0),
) -> bytes:
    """Multi-frame GIF89a. ``patches`` is a list of dicts with keys:
    ``pixels`` (h×w×3 uint8), ``top``/``left`` (placement, default 0),
    ``disposal`` (0–3, default 0), ``transparent`` (an RGB tuple whose
    pixels are encoded as the transparent index, or None). One global
    color table holds every patch color + the background + one reserved
    transparency slot (≤255 distinct real colors total)."""
    sh, sw = int(screen_hw[0]), int(screen_hw[1])
    colors = [np.array([bg_color], dtype=np.uint8)]
    for p in patches:
        colors.append(np.asarray(p["pixels"], dtype=np.uint8).reshape(-1, 3))
    palette = np.unique(np.concatenate(colors, axis=0), axis=0)
    if len(palette) > 255:
        raise ValueError("animation needs >255 colors (one slot is reserved)")
    transparent_idx = len(palette)  # reserved slot, color value unused
    bits = max(1, int(np.ceil(np.log2(max(2, len(palette) + 1)))))
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    bg_index = int(_palette_indices(np.array([bg_color], dtype=np.uint8), palette)[0])
    min_code = max(2, bits)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | ((bits - 1) & 7), bg_index, 0)
    out += table.tobytes()
    # Netscape looping extension — real-world animations carry it; the
    # decoder must skip generic application extensions correctly
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for p in patches:
        px = np.asarray(p["pixels"], dtype=np.uint8)
        h, w = px.shape[:2]
        top, left = int(p.get("top", 0)), int(p.get("left", 0))
        disposal = int(p.get("disposal", 0))
        transparent = p.get("transparent")
        idx = _palette_indices(px.reshape(-1, 3), palette)
        gce_packed = (disposal & 7) << 2
        t_idx = 0
        if transparent is not None:
            mask = (px.reshape(-1, 3) == np.asarray(transparent, np.uint8)).all(axis=1)
            idx = np.where(mask, transparent_idx, idx)
            gce_packed |= 1
            t_idx = transparent_idx
        out += b"\x21\xf9\x04" + bytes([gce_packed, 4, 0, t_idx]) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
        out += bytes([min_code])
        lzw = _lzw_encode(idx.astype(np.int64), min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
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

        _left, _top, rows, ct, pos = _read_image_block(payload, pos, gct)
        if payload[-1] != 0x3B:
            # part of the total-ValueError contract: a payload cut between
            # the image data and the trailer must still read as truncated
            raise ValueError("GIF missing trailer")
        return ct[rows]

    raise ValueError("GIF contains no image descriptor")


def decode_gif_frames(payload: bytes) -> List[np.ndarray]:
    """Animated GIF bytes → list of FULL screen-size H×W×3 uint8 RGB
    frames, composited per the GIF89a rendering model: each image
    descriptor draws onto the logical screen at its (left, top) rect,
    transparent pixels (GCE flag) leave the canvas unchanged, and after
    each frame its disposal method applies (0/1 leave, 2 restore the rect
    to the background color, 3 restore the pre-frame canvas). The canvas
    starts as the background color (global-table ``bg`` index, else
    black). Same total-ValueError contract as :func:`decode_gif`."""
    try:
        return _decode_gif_frames_inner(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt GIF payload: {e}") from e


def _read_image_block(payload: bytes, pos: int, gct):
    """One image descriptor (pos just past the 0x2C separator) → (left,
    top, deinterlaced h×w index rows, color table, new pos)."""
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
    idx = _lzw_decode(b"".join(chunks), min_code, w * h)
    if idx.max(initial=0) >= len(ct):
        raise ValueError("GIF pixel index outside color table")
    rows = idx.reshape(h, w)
    if ipacked & 0x40:
        order = np.concatenate(
            [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
        )
        deinterlaced = np.empty_like(rows)
        deinterlaced[order] = rows
        rows = deinterlaced
    return left, top, rows, ct, pos


def _decode_gif_frames_inner(payload: bytes) -> List[np.ndarray]:
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        size = 2 << (packed & 7)
        gct = np.frombuffer(payload[pos : pos + size * 3], dtype=np.uint8)
        if len(gct) < size * 3:
            raise ValueError("truncated global color table")
        gct = gct.reshape(size, 3)
        pos += size * 3

    bg_color = gct[bg] if gct is not None and bg < len(gct) else np.zeros(3, np.uint8)
    canvas = np.broadcast_to(bg_color, (sh, sw, 3)).copy()
    frames: List[np.ndarray] = []
    # pending GCE state (reset after each image per spec)
    disposal, transparent_idx = 0, None
    saw_trailer = False
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:
            saw_trailer = True
            break
        if block == 0x21:
            if pos >= len(payload):
                raise ValueError("truncated GIF extension")
            label = payload[pos]
            if label == 0xF9 and pos + 5 < len(payload) and payload[pos + 1] == 4:
                gpacked = payload[pos + 2]
                disposal = (gpacked >> 2) & 7
                transparent_idx = payload[pos + 5] if gpacked & 1 else None
            pos = _skip_subblocks(payload, pos + 1)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, rows, ct, pos = _read_image_block(payload, pos, gct)
        h, w = rows.shape
        if top + h > sh or left + w > sw:
            raise ValueError("GIF frame rect exceeds the logical screen")
        before = canvas[top : top + h, left : left + w].copy()
        patch_rgb = ct[rows]
        if transparent_idx is not None:
            opaque = rows != transparent_idx
            region = canvas[top : top + h, left : left + w]
            region[opaque] = patch_rgb[opaque]
        else:
            canvas[top : top + h, left : left + w] = patch_rgb
        frames.append(canvas.copy())
        if disposal == 2:
            canvas[top : top + h, left : left + w] = bg_color
        elif disposal == 3:
            canvas[top : top + h, left : left + w] = before
        disposal, transparent_idx = 0, None
    if not frames:
        raise ValueError("GIF contains no image descriptor")
    if not saw_trailer:
        raise ValueError("GIF missing trailer")
    return frames
