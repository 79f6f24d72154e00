"""Zero-dependency AVI (RIFF) container codec for video-shaped payloads.

AVI is a plain RIFF chunk tree — fully parseable with the standard library:

    RIFF('AVI ')
      LIST('hdrl')  avih (MainAVIHeader), LIST('strl'){ strh, strf }
      LIST('movi')  '00dc'/'00db' chunks, one per video frame
      idx1          optional index (ignored on read; written for players)

Two in-container codecs are decodable without external libraries:

- **MJPG** — each frame chunk is a standalone baseline JPEG, decoded by
  ``functions/jpeg.py``. This is the classic motion-JPEG-in-AVI layout.
- **DIB** (``biCompression == 0``, uncompressed) — each frame chunk is a
  bottom-up BGR bitmap with 4-byte-aligned rows; pure numpy reshape.

True codec video (H.264/VP9/AV1 fourccs) still needs ffmpeg and raises
``NotImplementedError`` at the exact plug-in point.

Reference parity note: the reference engine (logstash-filter-geoip) has no
media path at all; this module exists for the training-data-pipeline
operator suite (frame sampling / feature extraction over multimodal
columns), per the survey's scale-operator mandate.
"""

from __future__ import annotations

import struct
from typing import List, Tuple

import numpy as np

__all__ = [
    "encode_avi",
    "parse_avi",
    "decode_avi",
    "avi_frame_chunks",
]


def _chunk(tag: bytes, data: bytes) -> bytes:
    # RIFF chunks are word-aligned: odd-sized payloads get a pad byte that
    # is NOT counted in the size field.
    pad = b"\x00" if len(data) % 2 else b""
    return tag + struct.pack("<I", len(data)) + data + pad


def _list(tag: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", tag + data)


def encode_avi(frames, fps: int = 25, codec: str = "MJPG", quality: int = 90) -> bytes:
    """List of H×W×3 uint8 arrays → minimal valid AVI bytes.

    ``codec='MJPG'`` stores each frame as a baseline JPEG (lossy);
    ``codec='DIB '`` stores uncompressed bottom-up BGR rows (lossless).
    All frames must share one shape.
    """
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("encode_avi needs at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape != frames[0].shape or f.ndim != 3 or f.shape[2] != 3:
            raise ValueError("all frames must be identical H×W×3 uint8")

    if codec == "MJPG":
        from .jpeg import encode_jpeg

        payloads = [encode_jpeg(f, quality=quality) for f in frames]
        compression = 0x47504A4D  # 'MJPG' little-endian
        bitcount = 24
    elif codec == "DIB ":
        row_bytes = (w * 3 + 3) & ~3
        payloads = []
        for f in frames:
            bgr = f[::-1, :, ::-1]  # bottom-up rows, BGR channel order
            rows = np.zeros((h, row_bytes), dtype=np.uint8)
            rows[:, : w * 3] = bgr.reshape(h, w * 3)
            payloads.append(rows.tobytes())
        compression = 0  # BI_RGB
        bitcount = 24
    else:
        raise ValueError(f"unsupported encode codec {codec!r} (MJPG or 'DIB ')")

    n = len(payloads)
    max_bytes = max(len(p) for p in payloads)
    usec_per_frame = 1_000_000 // fps

    avih = _chunk(
        b"avih",
        struct.pack(
            "<14I",
            usec_per_frame,  # dwMicroSecPerFrame
            max_bytes * fps,  # dwMaxBytesPerSec
            0,  # dwPaddingGranularity
            0x10,  # dwFlags: AVIF_HASINDEX
            n,  # dwTotalFrames
            0,  # dwInitialFrames
            1,  # dwStreams
            max_bytes,  # dwSuggestedBufferSize
            w,
            h,
            0,
            0,
            0,
            0,  # dwReserved[4]
        ),
    )
    strh = _chunk(
        b"strh",
        b"vids"
        + codec.encode("ascii")
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,  # dwFlags
            0,
            0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate  (rate/scale = fps)
            0,  # dwStart
            n,  # dwLength (frames)
            max_bytes,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality
            0,  # dwSampleSize (0 = variable, one sample per chunk)
            0,
            0,
            w,
            h,  # rcFrame left, top, right, bottom
        ),
    )
    # BITMAPINFOHEADER
    strf = _chunk(
        b"strf",
        struct.pack(
            "<IiiHHIIiiII",
            40,  # biSize
            w,
            h,
            1,  # biPlanes
            bitcount,
            compression,
            max_bytes,  # biSizeImage
            0,
            0,
            0,
            0,
        ),
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))

    movi_body = b"movi"
    offsets = []
    for p in payloads:
        offsets.append(len(movi_body))  # offset of the chunk tag within movi
        movi_body += _chunk(b"00dc", p)
    movi = _chunk(b"LIST", movi_body)

    idx1 = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, len(p))  # AVIIF_KEYFRAME
        for off, p in zip(offsets, payloads)
    )
    idx1 = _chunk(b"idx1", idx1)

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _iter_chunks(data: bytes, start: int, end: int):
    """Yield (tag, payload_start, payload_size) walking RIFF chunks in
    data[start:end); raises ValueError on structural damage."""
    p = start
    while p < end:
        if p + 8 > end:
            raise ValueError("truncated RIFF chunk header")
        tag = data[p : p + 4]
        (size,) = struct.unpack_from("<I", data, p + 4)
        body = p + 8
        if body + size > end:
            raise ValueError("RIFF chunk overruns container")
        yield tag, body, size
        p = body + size + (size & 1)  # word alignment pad


def parse_avi(payload: bytes) -> Tuple[str, int, int, int, List[bytes]]:
    """Parse an AVI container → (codec_fourcc, width, height, fps,
    frame_chunks). ``frame_chunks`` are the raw per-frame payloads from the
    movi list ('00dc'/'00db' of stream 0), in order. Raises ValueError for
    anything that is not a structurally valid single-video-stream AVI."""
    codec, width, height, fps, frames = _parse_avi_signed(payload)
    return codec, width, abs(height), fps, frames


def _parse_avi_signed(payload: bytes) -> Tuple[str, int, int, int, List[bytes]]:
    """One container walk, keeping biHeight's SIGN (negative = top-down DIB
    rows) so decode needs no second pass."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ') payload")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    end = min(len(payload), 8 + riff_size)

    codec = None
    width = height = fps = 0
    frames: List[bytes] = []

    for tag, body, size in _iter_chunks(payload, 12, end):
        if tag != b"LIST":
            continue
        list_type = payload[body : body + 4]
        if list_type == b"hdrl":
            for t2, b2, s2 in _iter_chunks(payload, body + 4, body + size):
                if t2 == b"LIST" and payload[b2 : b2 + 4] == b"strl":
                    for t3, b3, s3 in _iter_chunks(payload, b2 + 4, b2 + s2):
                        if t3 == b"strh" and s3 >= 36:
                            if payload[b3 : b3 + 4] != b"vids":
                                raise ValueError("first stream is not video")
                            codec = payload[b3 + 4 : b3 + 8].decode("latin1")
                            scale, rate = struct.unpack_from("<II", payload, b3 + 20)
                            fps = rate // scale if scale else 0
                        elif t3 == b"strf" and s3 >= 40:
                            _, width, height = struct.unpack_from("<Iii", payload, b3)
                            (compression,) = struct.unpack_from("<I", payload, b3 + 16)
                            if compression == 0:
                                codec = "DIB "
                    break  # only stream 0
        elif list_type == b"movi":
            for t2, b2, s2 in _iter_chunks(payload, body + 4, body + size):
                if t2 in (b"00dc", b"00db"):
                    frames.append(payload[b2 : b2 + s2])
                elif t2 == b"LIST" and payload[b2 : b2 + 4] == b"rec ":
                    for t3, b3, s3 in _iter_chunks(payload, b2 + 4, b2 + s2):
                        if t3 in (b"00dc", b"00db"):
                            frames.append(payload[b3 : b3 + s3])

    if codec is None:
        raise ValueError("AVI has no video stream header (strh/strf)")
    if not frames:
        raise ValueError("AVI movi list has no stream-0 frames")
    return codec, width, height, fps, frames


def avi_frame_chunks(payload: bytes) -> List[bytes]:
    """Just the raw frame chunks, in order (container walk only)."""
    return parse_avi(payload)[4]


def _decode_dib_frame(chunk: bytes, width: int, height: int, top_down: bool) -> np.ndarray:
    row_bytes = (width * 3 + 3) & ~3
    if len(chunk) < row_bytes * height:
        raise ValueError("DIB frame chunk shorter than declared dimensions")
    rows = np.frombuffer(chunk[: row_bytes * height], dtype=np.uint8).reshape(
        height, row_bytes
    )
    bgr = rows[:, : width * 3].reshape(height, width, 3)
    if not top_down:
        bgr = bgr[::-1]  # biHeight > 0 → bottom-up storage
    return bgr[:, :, ::-1].copy()  # BGR → RGB


def decode_avi(payload: bytes) -> List[np.ndarray]:
    """AVI bytes → list of H×W×3 uint8 RGB frames. Handles MJPG and
    uncompressed DIB streams; codec video raises NotImplementedError at the
    ffmpeg plug-in point. ONE container walk (signed biHeight carries the
    top-down flag)."""
    codec, width, height, _fps, chunks = _parse_avi_signed(payload)
    return _decode_frames(codec, width, height, chunks)


def _decode_frames(codec, width, height, chunks) -> List[np.ndarray]:
    if codec.upper() in ("MJPG", "JPEG"):
        from .jpeg import decode_jpeg

        out = []
        for c in chunks:
            px = decode_jpeg(c)
            if px.ndim == 2:
                px = np.repeat(px[:, :, None], 3, axis=2)
            out.append(px)
        return out
    if codec == "DIB " or codec == "\x00\x00\x00\x00":
        return [
            _decode_dib_frame(c, width, abs(height), top_down=height < 0)
            for c in chunks
        ]
    raise NotImplementedError(
        f"AVI codec {codec!r} needs ffmpeg (only MJPG and uncompressed DIB "
        "decode natively)"
    )
