"""Multimodal column plumbing: opaque ``binary`` payload columns with typed
metadata, decoded / feature-extracted by actor-pool ``map_batches`` stages.

Decode kernels come in two tiers:

- **Real, zero-dependency decoders** for formats the standard library +
  numpy can handle: PPM (P6) images (:func:`decode_ppm` → H×W×3 uint8
  array, real per-channel statistics), non-interlaced 8-bit PNG
  (:func:`decode_png` — stdlib ``zlib`` inflate + all five scanline
  filters reconstructed in numpy, CRC-verified), baseline JPEG
  (``functions/jpeg.py`` — matrix DCT, Annex-K Huffman/quant tables,
  4:4:4 + 4:2:0; lossy, so tests assert bounded error instead of bit
  equality), GIF (``functions/gif.py`` — real variable-width LZW, global
  and local color tables, interlace), and WAV/PCM audio (:func:`decode_wav` via stdlib ``wave`` →
  samples, real RMS / zero-crossing / peak features in
  ``AudioFeatureStage``). These exercise the full decode → vectorized
  feature path with pixel/sample-exact unit tests.
- **Stubbed codecs** for formats that need external libraries (codec
  video — H.264/VP9/AV1 — needs ffmpeg, not in this container). AVI
  containers (``functions/avi.py`` — RIFF chunk walk, MJPG + uncompressed
  DIB streams) and raw MJPEG
  video (concatenated baseline JPEGs) get REAL frame extraction in
  ``FrameSampleStage``; for anything else ``strict=True`` raises
  ``NotImplementedError`` exactly where the codec would plug in, and the
  default deterministic fake derives stats from payload bytes so the
  Ray-side plumbing stays testable.

Everything Ray-side — schema, batch handling, actor signature, fixed-shape
feature output, frame sampling layout — is real and tested in both tiers.

Scale notes: binary payloads dominate block size, so these stages run with
small ``batch_size`` and the payload column is dropped as soon as features
are extracted (never carry image bytes through a shuffle)."""

from __future__ import annotations

import hashlib
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa

IMAGE_META_TYPE = pa.struct(
    [("width", pa.int32()), ("height", pa.int32()), ("format", pa.string())]
)


def synthesize_media_table(n: int, seed: int = 5, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media table: (media_id, payload: binary,
    meta: struct<width,height,format>). Stands in for reading real image
    bytes (e.g. ``ray.data.read_binary_files``)."""
    rng = np.random.default_rng(seed)
    payloads, metas = [], []
    formats = ["png", "jpeg", "webp"]
    for i in range(n):
        stream = hashlib.blake2b(b"media-%d" % i, digest_size=32).digest()
        payloads.append((stream * (payload_bytes // 32 + 1))[:payload_bytes])
        metas.append(
            {
                "width": int(rng.integers(16, 256)),
                "height": int(rng.integers(16, 256)),
                "format": formats[i % 3],
            }
        )
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
            "meta": pa.array(metas, type=IMAGE_META_TYPE),
        }
    )


# -- real zero-dependency decoders ------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """H×W×3 uint8 array → binary PPM (P6) bytes."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → H×W×3 uint8 array. Raises ValueError on anything
    that is not a well-formed P6 (the per-row failure path)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: magic, width, height, maxval — whitespace/comment separated
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(payload[start:pos])
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    pos += 1  # single whitespace after maxval
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return data.reshape(h, w, 3)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type → samples per pixel


def _png_filter_row(raw: np.ndarray, prev: np.ndarray, ftype: int, bpp: int) -> np.ndarray:
    """Apply PNG filter ``ftype`` to one scanline (encoder side, vectorized).
    ``raw``/``prev`` are int32 arrays of the current / prior reconstructed
    scanline bytes."""
    left = np.zeros_like(raw)
    left[bpp:] = raw[:-bpp]
    up_left = np.zeros_like(prev)
    up_left[bpp:] = prev[:-bpp]
    if ftype == 0:
        out = raw
    elif ftype == 1:  # Sub
        out = raw - left
    elif ftype == 2:  # Up
        out = raw - prev
    elif ftype == 3:  # Average
        out = raw - (left + prev) // 2
    elif ftype == 4:  # Paeth
        p = left + prev - up_left
        pa_ = np.abs(p - left)
        pb = np.abs(p - prev)
        pc_ = np.abs(p - up_left)
        pred = np.where((pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, prev, up_left))
        out = raw - pred
    else:
        raise ValueError("bad PNG filter type %d" % ftype)
    return (out % 256).astype(np.uint8)


def encode_png(pixels: np.ndarray, filter_type: int | str = 0) -> bytes:
    """H×W×{1,2,3,4} (or H×W) uint8 array → non-interlaced 8-bit PNG bytes.

    ``filter_type``: 0-4 applied to every scanline, or ``"mixed"`` (row
    index mod 5 — exercises every filter in one image; used by the
    round-trip tests)."""
    import struct
    import zlib

    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    assert pixels.dtype == np.uint8 and c in (1, 2, 3, 4)
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    bpp = c
    prev = np.zeros(w * c, dtype=np.int32)
    lines = []
    for r in range(h):
        raw = pixels[r].reshape(-1).astype(np.int32)
        ft = (r % 5) if filter_type == "mixed" else int(filter_type)
        lines.append(bytes([ft]) + _png_filter_row(raw, prev, ft, bpp).tobytes())
        prev = raw

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Non-interlaced 8-bit PNG (gray / gray+alpha / RGB / RGBA) →
    H×W×C uint8 array, pure stdlib ``zlib`` + numpy unfiltering — no PIL.

    All five scanline filters are reconstructed: None/Up fully vectorized,
    Sub as a per-channel-lane modular cumsum, Average/Paeth as a per-pixel
    walk with vectorized channel math (their left-neighbor dependency is
    inherently sequential). Chunk CRCs are verified. Raises ``ValueError``
    on malformed input and on unsupported variants (palette, 16-bit,
    interlaced) — the per-row failure path of the decode stage."""
    import struct
    import zlib

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 12 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError("PNG chunk CRC mismatch")
        if tag == b"IHDR":
            ihdr = data
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"PLTE":
            raise ValueError("palette PNG not supported")
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or len(ihdr) != 13 or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8:
        raise ValueError("only 8-bit PNG supported (got depth %d)" % depth)
    if interlace:
        raise ValueError("interlaced PNG not supported")
    if comp or filt:
        raise ValueError("bad compression/filter method")
    channels = _PNG_CHANNELS.get(color_type)
    if channels is None:
        raise ValueError("unsupported PNG color type %d" % color_type)
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError("corrupt IDAT: %s" % e)
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("bad IDAT payload length")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = arr[:, 0]
    data = arr[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    bpp = channels
    for r in range(h):
        f = int(ftypes[r])
        line = data[r]
        prev = out[r - 1] if r else np.zeros(stride, dtype=np.int32)
        if f == 0:
            rec = line
        elif f == 1:  # Sub: modular cumsum per channel lane
            rec = np.cumsum(line.reshape(w, bpp), axis=0).reshape(-1) % 256
        elif f == 2:  # Up
            rec = (line + prev) % 256
        elif f == 3:  # Average
            rec = np.empty(stride, dtype=np.int32)
            left = np.zeros(bpp, dtype=np.int32)
            for x in range(w):
                s = slice(x * bpp, (x + 1) * bpp)
                left = (line[s] + (left + prev[s]) // 2) % 256
                rec[s] = left
        elif f == 4:  # Paeth
            rec = np.empty(stride, dtype=np.int32)
            left = np.zeros(bpp, dtype=np.int32)
            up_left = np.zeros(bpp, dtype=np.int32)
            for x in range(w):
                s = slice(x * bpp, (x + 1) * bpp)
                up = prev[s]
                p = left + up - up_left
                pa_ = np.abs(p - left)
                pb = np.abs(p - up)
                pc_ = np.abs(p - up_left)
                pred = np.where(
                    (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, up, up_left)
                )
                left = (line[s] + pred) % 256
                rec[s] = left
                up_left = up
        else:
            raise ValueError("bad PNG scanline filter %d" % f)
        out[r] = rec
    return out.astype(np.uint8).reshape(h, w, channels)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono samples → WAV bytes (stdlib wave)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> Tuple[np.ndarray, int]:
    """WAV bytes → (int16 mono samples, sample_rate). Multi-channel input is
    averaged to mono. Raises wave.Error/ValueError on malformed payloads."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as f:
        rate = f.getframerate()
        n = f.getnframes()
        width = f.getsampwidth()
        channels = f.getnchannels()
        raw = f.readframes(n)
    if width != 2:
        raise ValueError("only 16-bit PCM supported")
    samples = np.frombuffer(raw, dtype="<i2")
    if channels > 1:
        samples = samples.reshape(-1, channels).mean(axis=1).astype(np.int16)
    return samples, rate


class AudioFeatureStage:
    """Actor-pool stage: WAV payload → real acoustic features, payload
    dropped before any shuffle. Output columns (integer milli-units for
    exact comparisons): duration_ms, sample_rate, rms_milli (RMS amplitude
    ×1000 relative to full scale), zcr_milli (zero-crossing rate ×1000 per
    sample), peak_milli, dominant_hz (argmax of the rFFT magnitude
    spectrum — a real spectral feature). Malformed payloads yield nulls
    (per-row failure, never a task crash) — the enricher's degrade
    contract."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = batch.drop_columns(["payload"])
        cols = {"duration_ms": [], "sample_rate": [], "rms_milli": [],
                "zcr_milli": [], "peak_milli": [], "dominant_hz": []}
        for payload in batch["payload"].to_pylist():
            try:
                samples, rate = decode_wav(payload)
            except Exception:
                for v in cols.values():
                    v.append(None)
                continue
            x = samples.astype(np.float64) / 32768.0
            n = len(x)
            cols["duration_ms"].append(int(round(n * 1000 / rate)) if rate else None)
            cols["sample_rate"].append(rate)
            cols["rms_milli"].append(int(round(float(np.sqrt(np.mean(x * x))) * 1000)) if n else 0)
            zc = int(np.count_nonzero(np.diff(np.signbit(x)))) if n > 1 else 0
            cols["zcr_milli"].append(int(round(zc * 1000 / n)) if n else 0)
            cols["peak_milli"].append(int(round(float(np.max(np.abs(x))) * 1000)) if n else 0)
            if n > 1 and rate:
                spec = np.abs(np.fft.rfft(x))
                spec[0] = 0.0  # ignore DC
                k = int(np.argmax(spec))
                cols["dominant_hz"].append(int(round(k * rate / n)))
            else:
                cols["dominant_hz"].append(0)
        for name, vals in cols.items():
            out = out.append_column(name, pa.array(vals, type=pa.int64()))
        return out


def decode_any_image(payload: bytes, meta: dict, strict: bool = False):
    """Magic-byte dispatch over the native decoders (PPM, PNG, baseline
    JPEG, GIF, BMP) → H×W×C uint8 array, or None for unrecognized /
    corrupt payloads (strict=True re-raises instead). Shared by the
    decode-features and resize stages. Per-row degrade rationale: a
    2-byte magic matches ~2^-16 of opaque binaries — guaranteed hits at
    scale — so a corrupt payload must fail its row, not the task."""
    fmt = (meta or {}).get("format")
    try:
        if payload.startswith(b"P6") or fmt == "ppm":
            return decode_ppm(payload)
        if payload.startswith(_PNG_SIG):
            return decode_png(payload)
        if payload.startswith(b"\xff\xd8"):
            from ..functions.jpeg import decode_jpeg

            px = decode_jpeg(payload)
            if px.ndim == 2:  # grayscale → 1-channel plane
                px = px[:, :, None]
            return px
        if payload.startswith((b"GIF87a", b"GIF89a")):
            from ..functions.gif import decode_gif

            return decode_gif(payload)
        if payload.startswith(b"BM"):
            from ..functions.bmp import decode_bmp

            return decode_bmp(payload)
    except ValueError:
        if strict:
            raise
    return None


def resize_image(
    px: np.ndarray, out_h: int, out_w: int, method: str = "bilinear"
) -> np.ndarray:
    """Pure-numpy image resize, uint8 in/out. ``nearest`` uses the
    pixel-center map floor((i+0.5)·in/out); ``bilinear`` the standard
    align_corners=False convention (src = (i+0.5)·scale − 0.5, edge
    clamp, round-half-even via np.rint) — both fully vectorized and
    bit-deterministic (IEEE doubles, no platform-dependent SIMD paths)."""
    h, w = px.shape[0], px.shape[1]
    if method == "nearest":
        ri = np.minimum(
            ((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1
        )
        ci = np.minimum(
            ((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1
        )
        return px[ri][:, ci]
    if method != "bilinear":
        raise ValueError("method must be nearest|bilinear")
    sy = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    sx = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(sy), 0, h - 1).astype(np.int64)
    x0 = np.clip(np.floor(sx), 0, w - 1).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = np.clip(sy - y0, 0.0, 1.0)[:, None, None]
    fx = np.clip(sx - x0, 0.0, 1.0)[None, :, None]
    p = px.astype(np.float64)
    top = p[y0][:, x0] * (1.0 - fx) + p[y0][:, x1] * fx
    bot = p[y1][:, x0] * (1.0 - fx) + p[y1][:, x1] * fx
    out = top * (1.0 - fy) + bot * fy
    return np.rint(out).clip(0, 255).astype(np.uint8)


class ResizeImageStage:
    """Actor-pool stage: image payload → resized image payload (PPM).

    The missing quarter of the decode / features / RESIZE / frame-sample
    quartet: decodes any native format, resizes with :func:`resize_image`
    (converting to RGB first, the feature stage's channel convention) and
    re-encodes as PPM — the batch keeps (resized payload, out dims,
    ``resize_ok``); undecodable rows carry a null payload and False.
    Like every payload stage, run it with small ``batch_size`` and drop
    the payload column before any shuffle."""

    def __init__(
        self,
        out_h: int = 8,
        out_w: int = 8,
        method: str = "bilinear",
        strict: bool = False,
    ):
        resize_image(np.zeros((1, 1, 3), np.uint8), 1, 1, method)  # validate
        self.out_h, self.out_w = out_h, out_w
        self.method = method
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = batch.drop_columns(["payload"])
        if batch.num_rows == 0:
            return out.append_column(
                "payload", pa.array([], type=pa.binary())
            ).append_column("resize_ok", pa.array([], type=pa.bool_()))
        payloads = batch["payload"].to_pylist()
        metas = batch["meta"].to_pylist()
        blobs, ok = [], []
        for p, m in zip(payloads, metas):
            px = decode_any_image(p, m, strict=self.strict)
            if px is None:
                blobs.append(None)
                ok.append(False)
                continue
            rgb = DecodeImageStage._as_rgb(px)
            blobs.append(
                encode_ppm(resize_image(rgb, self.out_h, self.out_w, self.method))
            )
            ok.append(True)
        return out.append_column(
            "payload", pa.array(blobs, type=pa.binary())
        ).append_column("resize_ok", pa.array(ok, type=pa.bool_()))


class DecodeImageStage:
    """Actor-pool stage: binary payload → fixed-shape feature vector.

    Use as ``ds.map_batches(DecodeImageStage, fn_constructor_kwargs=...,
    concurrency=N, batch_size=small)``. ``__init__`` is where a real decoder
    would load its codec/model once per actor."""

    FEATURE_DIM = 16

    def __init__(self, strict: bool = False):
        self.strict = strict
        # per-actor setup slot: a model-based featurizer would load weights
        # here (the PPM/PNG/JPEG decoders are stateless pure functions)

    @staticmethod
    def _as_rgb(px: np.ndarray) -> np.ndarray:
        """H×W×C → H×W×3 for the per-channel feature slots: gray (1/2 ch)
        replicates the luma plane; RGBA drops alpha."""
        c = px.shape[2]
        if c >= 3:
            return px[:, :, :3]
        return np.repeat(px[:, :, :1], 3, axis=2)

    def _pixel_features(self, px: np.ndarray) -> np.ndarray:
        feats = np.zeros(self.FEATURE_DIM, dtype=np.float32)
        feats[0], feats[1] = px.shape[1], px.shape[0]  # width, height
        rgb = self._as_rgb(px)
        feats[2:5] = rgb.mean(axis=(0, 1))
        feats[5:8] = rgb.std(axis=(0, 1))
        feats[8:11] = rgb.min(axis=(0, 1))
        feats[11:14] = rgb.max(axis=(0, 1))
        return feats

    def _decode_features(self, payload: bytes, meta: dict) -> np.ndarray:
        px = decode_any_image(payload, meta, strict=self.strict)
        if px is not None:
            return self._pixel_features(px.astype(np.float32))
        if self.strict:
            raise NotImplementedError(
                "unrecognized image payload (PPM, PNG, GIF, BMP and baseline "
                "JPEG decode natively; only codec video needs ffmpeg)"
            )
        # deterministic fake: 16 bytes of digest → [0,1) floats, scaled by
        # the declared dimensions so metadata plumbing is exercised
        digest = hashlib.blake2b(payload, digest_size=self.FEATURE_DIM).digest()
        feats = np.frombuffer(digest, dtype=np.uint8).astype(np.float32) / 255.0
        scale = np.float32(1.0 + (meta["width"] * meta["height"]) % 7)
        return feats * scale

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = batch.drop_columns(["payload"])  # drop bytes before any shuffle
        feat_type = pa.list_(pa.float32(), self.FEATURE_DIM)
        if batch.num_rows == 0:
            return out.append_column("features", pa.array([], type=feat_type))
        payloads = batch["payload"].to_pylist()
        metas = batch["meta"].to_pylist()
        feats = np.stack([self._decode_features(p, m) for p, m in zip(payloads, metas)])
        return out.append_column("features", pa.array(list(feats), type=feat_type))


def encode_mjpeg(frames) -> bytes:
    """List of H×W×3 / H×W uint8 arrays → MJPEG bytes (concatenated baseline
    JPEG frames — the classic motion-JPEG layout)."""
    from ..functions.jpeg import encode_jpeg

    return b"".join(encode_jpeg(f) for f in frames)


def _jpeg_frame_end(data: bytes, pos: int) -> int:
    """Index just past the EOI of the JPEG frame starting at ``pos`` —
    found by WALKING the marker structure, not by searching for the first
    0xFFD9 byte pair: a frame may legitimately contain FFD9 inside a
    segment payload (e.g. an EXIF APP1 with an embedded thumbnail), so a
    naive scan would cut the frame short."""
    n = len(data)
    if data[pos : pos + 2] != b"\xff\xd8":
        raise ValueError("MJPEG frame does not start with SOI")
    p = pos + 2
    while p + 1 < n:
        if data[p] != 0xFF:
            raise ValueError("bad marker alignment in MJPEG frame")
        m = data[p + 1]
        if m == 0xFF:  # fill byte before a marker
            p += 1
            continue
        if m == 0xD9:  # EOI
            return p + 2
        if m == 0xD8:
            raise ValueError("nested SOI in MJPEG frame")
        if m == 0x01 or 0xD0 <= m <= 0xD7:  # standalone TEM/RSTn
            p += 2
            continue
        if p + 4 > n:
            break
        ln = int.from_bytes(data[p + 2 : p + 4], "big")
        if ln < 2:
            raise ValueError("bad segment length in MJPEG frame")
        p += 2 + ln
        if m == 0xDA:  # SOS: entropy data until next real marker
            while p + 1 < n:
                if data[p] == 0xFF and data[p + 1] != 0x00 and not (
                    0xD0 <= data[p + 1] <= 0xD7
                ):
                    break
                p += 1
    raise ValueError("unterminated MJPEG frame")


def split_mjpeg(payload: bytes) -> List[bytes]:
    """Split an MJPEG byte stream into its JPEG frames (marker-walked
    SOI→EOI spans; inter-frame zero padding tolerated). Raises ValueError
    when the payload is not a frame concatenation."""
    frames = []
    pos = 0
    n = len(payload)
    while pos < n:
        while pos < n and payload[pos] == 0x00:  # inter-frame padding
            pos += 1
        if pos >= n:
            break
        pos_end = _jpeg_frame_end(payload, pos)
        frames.append(payload[pos:pos_end])
        pos = pos_end
    if not frames:
        raise ValueError("empty MJPEG payload")
    return frames


class FrameSampleStage:
    """Actor-pool stage for video-shaped payloads: emit every k-th frame as
    its own row (flat_map-shaped output).

    Five real kernels: MJPEG payloads (leading SOI marker) get frame
    extraction by SOI/EOI span split — every k-th frame re-emitted as a
    standalone JPEG, decodable by ``functions.jpeg.decode_jpeg`` — since
    motion-JPEG is just concatenated baseline JPEGs. AVI containers
    (``RIFF..AVI ``) are walked chunk-by-chunk (``functions/avi.py``):
    MJPG streams emit their per-frame JPEG chunks as-is; uncompressed DIB
    streams emit each sampled frame re-encoded as PPM (standalone
    decodable by :func:`decode_ppm`). Animated GIFs composite every
    frame onto the logical screen (GCE transparency + disposal methods,
    ``functions/gif.py decode_gif_frames``) and emit sampled frames as
    PPM. YUV4MPEG2 streams (``functions/y4m.py`` — C420 family / C444 /
    Cmono planar layouts) decode to RGB and emit sampled frames as PPM,
    the uncompressed TRUE-video tier that completes the matrix without
    ffmpeg. Codec video (H.264/VP9/AV1 fourccs) needs ffmpeg, absent in
    this container: ``strict=True`` raises for such payloads; the
    default falls back to the deterministic fixed-stride byte chunking
    so the row-explosion plumbing stays exercised on opaque payloads."""

    def __init__(self, every_k: int = 4, frame_bytes: int = 64, strict: bool = False):
        self.every_k = every_k
        self.frame_bytes = frame_bytes
        self.strict = strict

    @staticmethod
    def _avi_frames(payload: bytes):
        """AVI container → list of standalone-decodable frame payloads, or
        None when the stream's codec needs ffmpeg (caller decides strict
        vs fallback). Raises ValueError for structurally broken AVIs."""
        from ..functions.avi import _decode_frames, _parse_avi_signed

        codec, width, height, _fps, chunks = _parse_avi_signed(payload)
        if codec.upper() in ("MJPG", "JPEG"):
            return chunks  # each chunk IS a standalone baseline JPEG
        if codec == "DIB ":
            # one walk total: decode the already-collected chunks directly
            return [
                encode_ppm(px)
                for px in _decode_frames(codec, width, height, chunks)
            ]
        return None  # real codec video — ffmpeg territory

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, frames = [], [], []
        for media_id, payload in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            if payload.startswith(b"RIFF") and payload[8:12] == b"AVI ":
                try:
                    all_frames = self._avi_frames(payload)
                except ValueError:
                    if self.strict:
                        raise
                    all_frames = None
                if all_frames is not None:
                    for f in range(0, len(all_frames), self.every_k):
                        ids.append(media_id)
                        frame_idx.append(f)
                        frames.append(all_frames[f])
                    continue
                if self.strict:
                    raise NotImplementedError(
                        "codec video inside AVI requires ffmpeg (only MJPG "
                        "and uncompressed DIB streams decode natively)"
                    )
                # fall through to byte chunking below
            if payload.startswith(b"\xff\xd8"):
                try:
                    all_frames = split_mjpeg(payload)
                except ValueError:
                    if self.strict:
                        raise
                    all_frames = None
                if all_frames is not None:
                    for f in range(0, len(all_frames), self.every_k):
                        ids.append(media_id)
                        frame_idx.append(f)
                        frames.append(all_frames[f])
                    continue
            if payload.startswith(b"YUV4MPEG2 "):
                # uncompressed true-video tier (functions/y4m.py): planar
                # YUV stream → sampled frames re-encoded as PPM, standalone
                # decodable like the DIB/GIF paths
                from ..functions.y4m import decode_y4m_frames

                try:
                    all_frames = [
                        encode_ppm(px) for px in decode_y4m_frames(payload)
                    ]
                except ValueError:
                    if self.strict:
                        raise
                    all_frames = None
                if all_frames is not None:
                    for f in range(0, len(all_frames), self.every_k):
                        ids.append(media_id)
                        frame_idx.append(f)
                        frames.append(all_frames[f])
                    continue
            if payload[:6] in (b"GIF87a", b"GIF89a"):
                from ..functions.gif import decode_gif_frames

                try:
                    all_frames = [
                        encode_ppm(px) for px in decode_gif_frames(payload)
                    ]
                except ValueError:
                    if self.strict:
                        raise
                    all_frames = None
                if all_frames is not None:
                    for f in range(0, len(all_frames), self.every_k):
                        ids.append(media_id)
                        frame_idx.append(f)
                        frames.append(all_frames[f])
                    continue
            if self.strict:
                raise NotImplementedError(
                    "codec video (non-MJPEG) frame extraction requires ffmpeg"
                )
            n_frames = max(1, len(payload) // self.frame_bytes)
            for f in range(0, n_frames, self.every_k):
                ids.append(media_id)
                frame_idx.append(f)
                frames.append(payload[f * self.frame_bytes : (f + 1) * self.frame_bytes])
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(frame_idx, type=pa.int32()),
                "frame": pa.array(frames, type=pa.binary()),
            }
        )
