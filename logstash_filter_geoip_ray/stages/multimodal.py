"""Multimodal column plumbing: opaque ``binary`` payload columns with typed
metadata, decoded / feature-extracted by actor-pool ``map_batches`` stages.

Decode kernels come in two tiers:

- **Real, zero-dependency decoders** for formats the standard library +
  numpy can handle: PPM (P6) images (:func:`decode_ppm` → H×W×3 uint8
  array, real per-channel statistics) and WAV/PCM audio (:func:`decode_wav`
  via stdlib ``wave`` → samples, real RMS / zero-crossing / peak features in
  ``AudioFeatureStage``). These exercise the full decode → vectorized
  feature path with pixel/sample-exact unit tests.
- **Stubbed codecs** for formats that need external libraries (jpeg/png →
  PIL, video → ffmpeg — not in this container):
  ``DecodeImageStage(strict=True)`` raises ``NotImplementedError`` exactly
  where the codec would plug in; the default deterministic fake derives
  stats from payload bytes so the Ray-side plumbing stays testable.

Everything Ray-side — schema, batch handling, actor signature, fixed-shape
feature output, frame sampling layout — is real and tested in both tiers.

Scale notes: binary payloads dominate block size, so these stages run with
small ``batch_size`` and the payload column is dropped as soon as features
are extracted (never carry image bytes through a shuffle)."""

from __future__ import annotations

import hashlib
from typing import Optional, Tuple

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
    sample), peak_milli. Malformed payloads yield nulls (per-row failure,
    never a task crash) — the enricher's degrade contract."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = batch.drop_columns(["payload"])
        cols = {"duration_ms": [], "sample_rate": [], "rms_milli": [],
                "zcr_milli": [], "peak_milli": []}
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
        for name, vals in cols.items():
            out = out.append_column(name, pa.array(vals, type=pa.int64()))
        return out


class DecodeImageStage:
    """Actor-pool stage: binary payload → fixed-shape feature vector.

    Use as ``ds.map_batches(DecodeImageStage, fn_constructor_kwargs=...,
    concurrency=N, batch_size=small)``. ``__init__`` is where a real decoder
    would load its codec/model once per actor."""

    FEATURE_DIM = 16

    def __init__(self, strict: bool = False):
        self.strict = strict
        # real implementation would do: import PIL.Image / load model here
        self._codec_available = False

    def _decode_features(self, payload: bytes, meta: dict) -> np.ndarray:
        # REAL decode path: PPM needs no external codec
        if payload.startswith(b"P6") or (meta or {}).get("format") == "ppm":
            try:
                px = decode_ppm(payload).astype(np.float32)
            except ValueError:
                if self.strict:
                    raise
                # per-row degrade: an opaque payload that merely starts with
                # b'P6' (2^-16 of random binaries — guaranteed at scale), or
                # a truncated PPM, must not kill the task; fall through to
                # the deterministic fake features
                px = None
            if px is not None:
                feats = np.zeros(self.FEATURE_DIM, dtype=np.float32)
                feats[0], feats[1] = px.shape[1], px.shape[0]  # width, height
                feats[2:5] = px.mean(axis=(0, 1))
                feats[5:8] = px.std(axis=(0, 1))
                feats[8:11] = px.min(axis=(0, 1))
                feats[11:14] = px.max(axis=(0, 1))
                return feats
        if self.strict:
            raise NotImplementedError(
                "jpeg/png decode requires PIL/libjpeg, unavailable in this environment"
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


class FrameSampleStage:
    """Actor-pool stage for video-shaped payloads: emit every k-th "frame"
    as its own row (flat_map-shaped output). The frame extraction itself is
    the stubbed kernel; the row-explosion layout is real."""

    def __init__(self, every_k: int = 4, frame_bytes: int = 64, strict: bool = False):
        self.every_k = every_k
        self.frame_bytes = frame_bytes
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("real frame extraction requires ffmpeg")
        ids, frame_idx, frames = [], [], []
        for media_id, payload in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
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
