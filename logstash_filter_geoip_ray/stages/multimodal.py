"""Multimodal column plumbing: opaque ``binary`` payload columns with typed
metadata, decoded / feature-extracted by actor-pool ``map_batches`` stages.

The image/audio codec libraries are not available in this container, so the
*decode kernel* is stubbed: ``DecodeImageStage(strict=True)`` raises
``NotImplementedError`` exactly where a real decoder (PIL/ffmpeg) would
plug in, and the default deterministic fake decode derives pixel statistics
from the payload bytes. Everything Ray-side — schema, batch handling, actor
signature, fixed-shape feature output, frame sampling layout — is real and
tested.

Scale notes: binary payloads dominate block size, so these stages run with
small ``batch_size`` and the payload column is dropped as soon as features
are extracted (never carry image bytes through a shuffle)."""

from __future__ import annotations

import hashlib
from typing import Optional

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
        if self.strict:
            raise NotImplementedError(
                "real image decode requires PIL/libjpeg, unavailable in this environment"
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
