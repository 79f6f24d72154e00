"""YUV4MPEG2 (.y4m) codec — the uncompressed TRUE-VIDEO tier that completes
the frame-sampling matrix without ffmpeg.

Format (public spec: mjpegtools yuv4mpeg(5); also wikipedia YUV4MPEG2):
  stream header  ``YUV4MPEG2 W<w> H<h> F<num>:<den> [I<i>] [A<n>:<d>]
                 [C<colourspace>] ...\\n``
  per frame      ``FRAME[ <params>]\\n`` + raw planar pixel data

Supported colourspaces:
  * ``C420`` / ``C420jpeg`` / ``C420mpeg2`` / ``C420paldv`` — 4:2:0 planar
    (Y then U then V at half resolution both axes). Chroma siting variants
    only matter to sub-pixel filters; the planes are laid out identically,
    so they decode the same here.
  * ``C444`` — full-resolution Y, U, V planes.
  * ``Cmono`` — Y plane only (grayscale).

RGB<->YUV uses the full-range JPEG/JFIF BT.601 matrix (integer-rounded,
vectorized numpy): grayscale round-trips bit-exactly (Y == value,
U == V == 128 -> R == G == B == Y) which is what the pixel-exact tests pin;
chroma-carrying content round-trips within +-1 plus 4:2:0 subsampling loss,
exactly like any other Y4M tool chain.

Encoder emits ``C420jpeg`` (or ``Cmono``/``C444`` on request). No external
libraries; pure numpy over the public spec.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

_MAGIC = b"YUV4MPEG2 "


def _rgb_to_yuv_full(px: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """HxWx3 uint8 RGB -> (Y, U, V) full-range uint8 planes (JFIF BT.601)."""
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    clip = lambda p: np.clip(np.rint(p), 0, 255).astype(np.uint8)  # noqa: E731
    return clip(y), clip(u), clip(v)


def _yuv_to_rgb_full(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Full-range (Y, U, V) uint8 planes (same shape) -> HxWx3 uint8 RGB."""
    yf = y.astype(np.float64)
    uf = u.astype(np.float64) - 128.0
    vf = v.astype(np.float64) - 128.0
    r = yf + 1.402 * vf
    g = yf - 0.344136 * uf - 0.714136 * vf
    b = yf + 1.772 * uf
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def _subsample_420(plane: np.ndarray) -> np.ndarray:
    """2x2 box-average chroma subsample (even dims required by caller)."""
    h, w = plane.shape
    p = plane.astype(np.uint16).reshape(h // 2, 2, w // 2, 2)
    return ((p.sum(axis=(1, 3)) + 2) // 4).astype(np.uint8)


def _upsample_420(plane: np.ndarray) -> np.ndarray:
    """Nearest-neighbor 2x chroma upsample (the inverse tests rely on
    constant 2x2 blocks surviving exactly)."""
    return np.repeat(np.repeat(plane, 2, axis=0), 2, axis=1)


def encode_y4m(
    frames: List[np.ndarray],
    fps: Tuple[int, int] = (25, 1),
    colourspace: str = "C420jpeg",
) -> bytes:
    """RGB frames (each HxWx3 uint8, identical shape) -> .y4m bytes."""
    if not frames:
        raise ValueError("encode_y4m: need at least one frame")
    h, w = frames[0].shape[:2]
    if colourspace.startswith("C420") and (h % 2 or w % 2):
        raise ValueError("encode_y4m: C420 needs even dimensions, got %dx%d" % (w, h))
    parts = [
        _MAGIC + b"W%d H%d F%d:%d Ip A1:1 %s\n"
        % (w, h, fps[0], fps[1], colourspace.encode())
    ]
    for px in frames:
        if px.shape[:2] != (h, w):
            raise ValueError("encode_y4m: all frames must share one geometry")
        y, u, v = _rgb_to_yuv_full(px)
        parts.append(b"FRAME\n")
        if colourspace == "Cmono":
            parts.append(y.tobytes())
        elif colourspace == "C444":
            parts.append(y.tobytes() + u.tobytes() + v.tobytes())
        else:  # C420 family
            parts.append(
                y.tobytes()
                + _subsample_420(u).tobytes()
                + _subsample_420(v).tobytes()
            )
    return b"".join(parts)


def _parse_header(payload: bytes) -> Tuple[int, int, str, Tuple[int, int], int]:
    """-> (width, height, colourspace, fps, header_end_offset)."""
    if not payload.startswith(_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("y4m: unterminated stream header")
    w = h = None
    fps = (25, 1)
    colourspace = "C420"  # the spec's default when no C tag is present
    for tag in payload[len(_MAGIC) : nl].split(b" "):
        if not tag:
            continue
        key, val = tag[:1], tag[1:]
        if key == b"W":
            w = int(val)
        elif key == b"H":
            h = int(val)
        elif key == b"F":
            num, den = val.split(b":")
            fps = (int(num), int(den))
        elif key == b"C":
            colourspace = "C" + val.decode("ascii")
        # I (interlace), A (aspect), X (metadata) don't affect plane layout
    if not w or not h:
        raise ValueError("y4m: header missing W or H")
    return w, h, colourspace, fps, nl + 1


def decode_y4m_frames(payload: bytes) -> List[np.ndarray]:
    """.y4m bytes -> list of HxWx3 uint8 RGB frames (vectorized numpy)."""
    w, h, colourspace, _fps, pos = _parse_header(payload)
    if colourspace == "Cmono":
        sizes = (h * w,)
    elif colourspace == "C444":
        sizes = (h * w, h * w, h * w)
    elif colourspace.startswith("C420"):
        if h % 2 or w % 2:
            raise ValueError("y4m: C420 with odd dimensions %dx%d" % (w, h))
        sizes = (h * w, (h // 2) * (w // 2), (h // 2) * (w // 2))
    else:
        raise ValueError("y4m: unsupported colourspace %r" % colourspace)
    frame_len = sum(sizes)

    frames: List[np.ndarray] = []
    n = len(payload)
    while pos < n:
        if not payload.startswith(b"FRAME", pos):
            raise ValueError("y4m: expected FRAME marker at offset %d" % pos)
        nl = payload.find(b"\n", pos)
        if nl < 0:
            raise ValueError("y4m: unterminated FRAME header")
        pos = nl + 1
        if pos + frame_len > n:
            raise ValueError("y4m: truncated frame data")
        buf = np.frombuffer(payload, dtype=np.uint8, count=frame_len, offset=pos)
        pos += frame_len
        y = buf[: sizes[0]].reshape(h, w)
        if colourspace == "Cmono":
            frames.append(np.repeat(y[..., None], 3, axis=-1).copy())
            continue
        u = buf[sizes[0] : sizes[0] + sizes[1]]
        v = buf[sizes[0] + sizes[1] :]
        if colourspace == "C444":
            u = u.reshape(h, w)
            v = v.reshape(h, w)
        else:
            u = _upsample_420(u.reshape(h // 2, w // 2))
            v = _upsample_420(v.reshape(h // 2, w // 2))
        frames.append(_yuv_to_rgb_full(y, u, v))
    if not frames:
        raise ValueError("y4m: stream contains no frames")
    return frames
