"""Zero-dependency BMP (Windows bitmap) codec — 24-bit uncompressed BI_RGB,
the plain raw-bitmap layout: 14-byte BITMAPFILEHEADER + BITMAPINFOHEADER +
4-byte-aligned BGR rows (bottom-up when biHeight > 0, top-down when
negative). The pixel-array layout is byte-identical to the AVI 'DIB ' frame
chunks, so decoding reuses :func:`avi._decode_dib_frame`.

Scope: 24-bit BI_RGB only (palette/RLE/16-bit variants raise ValueError —
the strict DecodeImageStage surfaces that, the lenient one degrades to fake
features exactly like any other undecodable payload)."""

from __future__ import annotations

import struct

import numpy as np

from .avi import _decode_dib_frame

_FILE_HEADER = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, offset
_INFO_HEADER = struct.Struct("<IiiHHIIiiII")


def encode_bmp(px: np.ndarray, top_down: bool = False) -> bytes:
    """H×W×3 uint8 RGB → 24-bit BI_RGB BMP bytes."""
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_bmp expects H×W×3 RGB")
    h, w = px.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    bgr = px[:, :, ::-1]
    if not top_down:
        bgr = bgr[::-1]
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    pixels = rows.tobytes()
    offset = _FILE_HEADER.size + _INFO_HEADER.size
    info = _INFO_HEADER.pack(
        _INFO_HEADER.size, w, -h if top_down else h, 1, 24, 0, len(pixels),
        2835, 2835, 0, 0,
    )
    head = _FILE_HEADER.pack(b"BM", offset + len(pixels), 0, 0, offset)
    return head + info + pixels


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes → H×W×3 uint8 RGB. Total ValueError
    contract: any malformed/unsupported input raises ValueError, never
    an arbitrary exception."""
    try:
        if len(payload) < _FILE_HEADER.size + 40:
            raise ValueError("BMP too short for headers")
        magic, _fsize, _r1, _r2, offset = _FILE_HEADER.unpack_from(payload, 0)
        if magic != b"BM":
            raise ValueError("not a BMP payload")
        bi_size, width, height, planes, bitcount, compression = struct.unpack_from(
            "<IiiHHI", payload, _FILE_HEADER.size
        )
        if bi_size < 40:
            raise ValueError("BITMAPCOREHEADER (OS/2) BMPs unsupported")
        if planes != 1 or bitcount != 24 or compression != 0:
            raise ValueError(
                "only 24-bit uncompressed BI_RGB BMPs decode natively "
                f"(planes={planes}, bpp={bitcount}, compression={compression})"
            )
        if width <= 0 or height == 0 or width > 1 << 20 or abs(height) > 1 << 20:
            raise ValueError("implausible BMP dimensions")
        if offset < _FILE_HEADER.size + bi_size or offset > len(payload):
            raise ValueError("BMP pixel offset out of range")
        return _decode_dib_frame(
            payload[offset:], width, abs(height), top_down=height < 0
        )
    except ValueError:
        raise
    except Exception as e:  # struct errors, slicing surprises → ValueError
        raise ValueError(f"malformed BMP: {e}") from e
