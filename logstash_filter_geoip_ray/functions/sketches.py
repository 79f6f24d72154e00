"""Deterministic hashing sketches for near-duplicate detection: word-shingle
MinHash signatures (with LSH banding) and 64-bit SimHash.

All hashing is keyed blake2b — stable across processes and machines (Python's
builtin ``hash`` is salted per process and must never reach a shuffle key).
Vector math is numpy; the per-doc shingle walk is Python but runs inside
``map_batches`` tasks, so it parallelizes across blocks.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Sequence, Set, Tuple

import numpy as np

_MERSENNE = (1 << 61) - 1
_MAXH = (1 << 32) - 1


def stable_hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


def hash_strings64(values) -> np.ndarray:
    """Vectorized stable 64-bit hash of a string sequence → uint64 array.

    pandas' SipHash-1-3 C kernel with its fixed key — stable across
    processes/machines, one C pass instead of a Python loop of blake2b
    calls. This is the hot-path string hash for MinHash shingles; it is NOT
    interchangeable with :func:`stable_hash64` (different function, different
    values — pick one per shuffle key and stick with it)."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        values = values.to_pandas()
    return (
        pd.util.hash_pandas_object(pd.Series(values), index=False)
        .to_numpy()
        .astype(np.uint64)
    )


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over uint64 arrays (wraparound intended)."""
    with np.errstate(over="ignore"):
        x = x.astype(np.uint64, copy=True)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def word_shingles(text: str, k: int = 3) -> Set[str]:
    toks = text.split()
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


class MinHasher:
    """k-permutation MinHash over word shingles.

    Signatures are uint64 arrays of length ``num_perm``; banding splits them
    into ``bands`` groups of ``num_perm // bands`` rows and hashes each group
    to a bucket key — the LSH shuffle key for candidate generation.
    """

    def __init__(self, num_perm: int = 128, bands: int = 32, shingle_k: int = 3, seed: int = 7):
        assert num_perm % bands == 0
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k
        rng = np.random.default_rng(seed)
        # per-permutation xor-seeds for a splitmix64-style finalizer: full
        # 64-bit avalanche mixing (intentional uint64 wraparound). A linear
        # (a·h+b) mod p scheme is either wrap-corrupted (a near p) or
        # piecewise-monotone (a small, no wrap → correlated minima and a
        # badly biased Jaccard estimate — measured 0.35 vs true 0.54).
        self._seeds = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)
        # per-band mixing constants so identical signature segments in
        # different bands land in different buckets
        self._band_consts = np.random.default_rng(seed + 101).integers(
            1, 1 << 63, size=bands, dtype=np.uint64
        )

    def sig_matrix(self, gram_hashes: np.ndarray, starts: np.ndarray) -> np.ndarray:
        """Signatures for many docs at once from a flat gram-hash array.

        ``gram_hashes`` is uint64, grouped contiguously per doc;
        ``starts[i]`` is the first gram index of doc ``i``. Returns
        ``(len(starts), num_perm)`` uint64 — min over each doc's grams of the
        splitmix-mixed per-permutation values, computed as chunked
        broadcast-mix + ``np.minimum.reduceat`` (no Python per-doc loop).
        Memory per chunk = 16 perms × len(gram_hashes) × 8 B."""
        gh = gram_hashes.astype(np.uint64, copy=False)
        out = np.empty((len(starts), self.num_perm), dtype=np.uint64)
        for p0 in range(0, self.num_perm, 16):
            seeds = self._seeds[p0 : p0 + 16]
            vals = _mix64(gh[None, :] ^ seeds[:, None])
            out[:, p0 : p0 + len(seeds)] = np.minimum.reduceat(
                vals, starts, axis=1
            ).T
        return out

    def signature(self, text: Optional[str]) -> Optional[np.ndarray]:
        if text is None:
            return None
        shingles = word_shingles(text, self.shingle_k)
        if not shingles:
            return None
        h = hash_strings64(list(shingles))
        return self.sig_matrix(h, np.array([0]))[0]

    def band_key_matrix(self, sigs: np.ndarray) -> np.ndarray:
        """Int64 LSH bucket key per (doc, band) from a ``(n, num_perm)``
        signature matrix — the vectorized replacement for per-doc blake2b
        band digests. Combines each band's rows with an iterated splitmix
        fold seeded by a per-band constant; returns ``(n, bands)`` int64
        (uint64 bits reinterpreted for Arrow)."""
        n = sigs.shape[0]
        v = sigs.reshape(n, self.bands, self.rows_per_band)
        h = np.broadcast_to(self._band_consts, (n, self.bands)).copy()
        for j in range(self.rows_per_band):
            h = _mix64(h ^ v[:, :, j])
        return h.view(np.int64)

    def band_keys(self, signature: np.ndarray) -> List[int]:
        """Per-doc convenience wrapper over :meth:`band_key_matrix`."""
        return [int(k) for k in self.band_key_matrix(signature[None, :])[0]]


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def exact_jaccard(text_a: str, text_b: str, k: int = 3) -> Tuple[int, int]:
    """(intersection, union) sizes of word-k-shingle sets — returned as ints
    so equality checks against an oracle involve no floats."""
    sa, sb = word_shingles(text_a, k), word_shingles(text_b, k)
    inter = len(sa & sb)
    union = len(sa | sb)
    return inter, union


def token_set_jaccard(text_a: str, text_b: str) -> Tuple[int, int]:
    """(intersection, union) of distinct lowercase token sets (the unigram
    variant the DuckDB oracle can express with string_split + unnest)."""
    sa = {w.lower() for w in text_a.split()}
    sb = {w.lower() for w in text_b.split()}
    return len(sa & sb), len(sa | sb)


def simhash64(text: Optional[str]) -> Optional[int]:
    """Classic 64-bit SimHash over whitespace tokens (term-frequency
    weighted)."""
    if text is None:
        return None
    toks = text.split()
    if not toks:
        return None
    acc = np.zeros(64, dtype=np.int64)
    from collections import Counter

    for tok, cnt in Counter(toks).items():
        h = stable_hash64(tok)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), cnt, -cnt)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# -- KLL-style quantile sketch ---------------------------------------------


class QuantileSketch:
    """Mergeable quantile sketch: levelled compactors (KLL-style).

    Level i holds items each representing 2^i originals; a full level is
    sorted and every other item (deterministic even offset — reproducible
    across runs) promoted to level i+1. Rank error is O(1/k) with the
    default k=256 (≈1–2% on the quantiles we query). Serialization is a
    plain dict of level arrays; merge = concatenate levels then re-compact.
    """

    def __init__(self, k: int = 256, levels: Optional[List[np.ndarray]] = None):
        self.k = k
        self.levels: List[np.ndarray] = levels if levels is not None else [
            np.empty(0, dtype=np.float64)
        ]

    def _compact(self) -> None:
        # loop until EVERY level is within bound — a single pass would leave
        # a newly created / cascaded-into top level oversized and the sketch
        # unbounded (then the shuffle would carry O(n) payloads, not O(k log n))
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) <= self.k:
                i += 1
                continue
            level = np.sort(self.levels[i])
            promoted = level[::2]  # deterministic: keep even ranks
            if i + 1 == len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])
            self.levels[i] = np.empty(0, dtype=np.float64)
            i += 1

    def add(self, values: np.ndarray) -> "QuantileSketch":
        vals = np.asarray(values, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        self.levels[0] = np.concatenate([self.levels[0], vals])
        self._compact()
        return self

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        for i, lvl in enumerate(other.levels):
            while i >= len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[i] = np.concatenate([self.levels[i], lvl])
        self._compact()
        return self

    def quantile(self, q: float) -> float:
        items, weights = [], []
        for i, lvl in enumerate(self.levels):
            items.append(lvl)
            weights.append(np.full(len(lvl), 1 << i, dtype=np.int64))
        allv = np.concatenate(items)
        allw = np.concatenate(weights)
        if len(allv) == 0:
            return float("nan")
        order = np.argsort(allv)
        allv, allw = allv[order], allw[order]
        cum = np.cumsum(allw)
        target = q * cum[-1]
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(allv[min(idx, len(allv) - 1)])

    def to_payload(self) -> bytes:
        import pickle

        return pickle.dumps([lvl for lvl in self.levels])

    @classmethod
    def from_payload(cls, data: bytes, k: int = 256) -> "QuantileSketch":
        import pickle

        return cls(k, [np.asarray(lvl, dtype=np.float64) for lvl in pickle.loads(data)])


# -- HyperLogLog ------------------------------------------------------------


class HLL:
    """HyperLogLog cardinality sketch (2^p registers, numpy-vectorized).

    Mergeable by register-max — the shape the aggregation guide calls for:
    one sketch per batch inside ``map_batches``, a tiny merge stage after.
    Serialization = the raw register bytes."""

    def __init__(self, p: int = 14, registers: Optional[np.ndarray] = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def add_hashes(self, hashes: np.ndarray) -> "HLL":
        """Fold pre-hashed uint64 values into the sketch (vectorized)."""
        h = hashes.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the remaining bits + 1
        lz = np.zeros(len(h), dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        rest_work = rest.copy()
        found = np.zeros(len(h), dtype=bool)
        for bit in range(64 - self.p + 1):
            now = (~found) & ((rest_work & mask) != 0)
            lz[now] = bit + 1
            found |= now
            rest_work = rest_work << np.uint64(1)
            if found.all():
                break
        np.maximum.at(self.registers, idx, lz)
        return self

    def add_strings(self, values) -> "HLL":
        hashes = np.fromiter(
            (stable_hash64(v) for v in values if v is not None),
            dtype=np.uint64,
        )
        if len(hashes):
            self.add_hashes(hashes)
        return self

    def merge(self, other: "HLL") -> "HLL":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        if est <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                return m * np.log(m / zeros)  # linear counting small range
        return float(est)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, p: int = 14) -> "HLL":
        return cls(p, np.frombuffer(data, dtype=np.uint8).copy())


class BloomFilter:
    """Mergeable Bloom filter over uint64 hashes — the broadcast prefilter
    for incremental dedup of a NEW corpus against a PRIOR one (no shuffle of
    either side; see ``stages.dedup.bloom_incremental_dedup``).

    Vectorized double hashing (Kirsch–Mitzenmacher): probe i uses
    ``h1 + i·h2 mod m`` with ``h1 = h`` and ``h2 = splitmix(h ^ salt) | 1``.
    ``add_hashes``/``contains`` are pure numpy over whole hash arrays;
    ``merge`` makes partial filters OR-combinable, so the
    build is a map-side partial per batch + one bitwise-OR reduce.

    Sizing: m_bits ≈ 10 bits/key → ~0.8% false positives at k=7 (FPs cost
    only wasted exact-verify work, never correctness). A fleet-scale prior
    corpus (10^10 keys → ~12 GB) outgrows a single broadcast object; shard
    the filter by hash prefix and route probes to the matching shard."""

    __slots__ = ("m", "k", "bits", "_salt")

    def __init__(self, m_bits: int = 1 << 23, k: int = 7, seed: int = 77):
        assert m_bits % 64 == 0
        self.m = m_bits
        self.k = k
        self._salt = np.uint64(
            (0x9E3779B97F4A7C15 * (seed * 2 + 1)) & 0xFFFFFFFFFFFFFFFF
        )
        self.bits = np.zeros(m_bits // 64, dtype=np.uint64)

    def _probes(self, h: np.ndarray) -> np.ndarray:
        """(k, n) bit positions for a uint64 hash array."""
        h1 = h.astype(np.uint64, copy=False)
        with np.errstate(over="ignore"):
            h2 = _mix64(h1 ^ self._salt) | np.uint64(1)
            idx = (
                h1[None, :]
                + np.arange(self.k, dtype=np.uint64)[:, None] * h2[None, :]
            ) % np.uint64(self.m)
        return idx

    def add_hashes(self, h: np.ndarray) -> None:
        if not len(h):
            return
        idx = self._probes(h).reshape(-1)
        np.bitwise_or.at(
            self.bits, (idx >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (idx & np.uint64(63)),
        )

    def contains(self, h: np.ndarray) -> np.ndarray:
        """Vectorized membership mask (True may be a false positive; False
        is definite)."""
        if not len(h):
            return np.zeros(0, dtype=bool)
        idx = self._probes(h)
        words = self.bits[(idx >> np.uint64(6)).astype(np.int64)]
        hit = (words >> (idx & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.m == other.m and self.k == other.k
        self.bits |= other.bits
        return self
