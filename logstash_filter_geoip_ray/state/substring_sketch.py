"""Persisted EXACTSUBSTR window sketch — the cross-dump substring-dedup
artifact.

``duplicated_spans`` (stages/dedup.py) finds duplicated char spans with a
saturating seen/seen-twice bitmap pair over rolling window hashes.  The
pair is ASSOCIATIVELY mergeable (``twice' = t_a | t_b | (s_a & s_b)``,
``seen' = s_a | s_b``), so a corpus of crawl dumps can be sketched dump by
dump — each dump pays ONE text pass at ingest — and the union's
dup-candidate set emerges from 2 × sketch_bits/8 bytes of bitmap merges,
never a co-processing of the corpora.  ``duplicated_spans_incremental``
then finds a NEW dump's duplicated spans against (prior ∪ new) without
touching prior text at all: the prior corpus is represented entirely by
this sketch.

Parameter-bound like the MinHash band index: a sketch built with a
different window/sketch_bits/sketch_hashes addresses different bits —
``_meta.json`` is compared on every load/append and mismatches raise.

Layout (flat files, atomic publish — meta LAST, so a crashed build is
never loadable):
  sketch_dir/_meta.json   — window, sketch_bits, sketch_hashes, min_count
  sketch_dir/seen.bin     — sketch_bits/8 bytes, little-endian uint64 words
  sketch_dir/twice.bin    — same shape

The reference has no persistence analog (its filter is stateless per
event, lib/logstash/filters/geoip.rb:113-122); this is pipeline-
scaffolding state in the same family as state/minhash_index.py and
state/ann_index.py.
"""

from __future__ import annotations

import json
import os

import numpy as np

SKETCH_META = "_meta.json"


def _meta_params(window: int, sketch_bits: int, sketch_hashes: int, min_count: int) -> dict:
    return {
        "window": int(window),
        "sketch_bits": int(sketch_bits),
        "sketch_hashes": int(sketch_hashes),
        "min_count": int(min_count),
        "version": 1,
    }


def _read_meta(sketch_dir: str) -> dict:
    path = os.path.join(sketch_dir, SKETCH_META)
    if not os.path.exists(path):
        raise FileNotFoundError(
            "substring_sketch: %r has no %s — build_substring_sketch first"
            % (sketch_dir, SKETCH_META)
        )
    with open(path) as f:
        return json.load(f)


def _write_atomic(sketch_dir: str, seen: np.ndarray, twice: np.ndarray, params: dict) -> None:
    os.makedirs(sketch_dir, exist_ok=True)
    for name, arr in (("seen.bin", seen), ("twice.bin", twice)):
        tmp = os.path.join(sketch_dir, name + ".tmp")
        with open(tmp, "wb") as f:
            f.write(arr.astype("<u8").tobytes())
        os.replace(tmp, os.path.join(sketch_dir, name))
    tmp = os.path.join(sketch_dir, SKETCH_META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(params, f)
    os.replace(tmp, os.path.join(sketch_dir, SKETCH_META))


def merge_sketch_pairs(a: tuple, b: tuple) -> tuple:
    """Saturating associative merge: a window counted once on each side is
    twice in the union."""
    sa, ta = a
    sb, tb = b
    return sa | sb, ta | tb | (sa & sb)


def build_substring_sketch(
    ds,
    sketch_dir: str,
    window: int = 40,
    sketch_bits: int = 1 << 28,
    sketch_hashes: int = 2,
    min_count: int = 2,
    text_col: str = "text",
) -> str:
    """Fresh sketch over the PRIOR corpus: one streaming pass, bitmaps out.
    Clears any previous sketch at ``sketch_dir`` (meta publishes last)."""
    import shutil

    from ..stages.dedup import window_sketch_pair

    shutil.rmtree(sketch_dir, ignore_errors=True)
    seen, twice = window_sketch_pair(
        ds, window, text_col, min_count, sketch_bits, sketch_hashes
    )
    _write_atomic(
        sketch_dir, seen, twice,
        _meta_params(window, sketch_bits, sketch_hashes, min_count),
    )
    return sketch_dir


def append_substring_sketch(ds, sketch_dir: str, text_col: str = "text") -> str:
    """Fold a new dump into an existing sketch (parameters come from the
    sketch meta — the caller cannot desynchronize them).  The merge is the
    saturating rule, so text duplicated ACROSS dumps becomes twice-marked
    even though each dump saw it once."""
    from ..stages.dedup import window_sketch_pair

    meta = _read_meta(sketch_dir)
    prior = load_substring_sketch(sketch_dir)
    new = window_sketch_pair(
        ds,
        meta["window"],
        text_col,
        meta["min_count"],
        meta["sketch_bits"],
        meta["sketch_hashes"],
    )
    seen, twice = merge_sketch_pairs(prior, new)
    _write_atomic(sketch_dir, seen, twice, meta)
    return sketch_dir


def load_substring_sketch(
    sketch_dir: str,
    window: "int | None" = None,
    sketch_bits: "int | None" = None,
    sketch_hashes: "int | None" = None,
) -> "tuple[np.ndarray, np.ndarray]":
    """(seen, twice) uint64 word arrays.  Any explicitly-passed parameter
    is verified against the sketch meta (None = accept the sketch's)."""
    meta = _read_meta(sketch_dir)
    for name, val in (
        ("window", window),
        ("sketch_bits", sketch_bits),
        ("sketch_hashes", sketch_hashes),
    ):
        if val is not None and meta.get(name) != int(val):
            raise ValueError(
                "substring_sketch: parameter mismatch for %r: sketch has "
                "%s=%r, requested %r — bit positions are incompatible; "
                "rebuild the sketch" % (sketch_dir, name, meta.get(name), val)
            )
    n_words = meta["sketch_bits"] // 64
    out = []
    for name in ("seen.bin", "twice.bin"):
        with open(os.path.join(sketch_dir, name), "rb") as f:
            arr = np.frombuffer(f.read(), dtype="<u8").astype(np.uint64)
        if len(arr) != n_words:
            raise ValueError(
                "substring_sketch: %s has %d words, meta says %d — corrupt"
                % (name, len(arr), n_words)
            )
        out.append(arr)
    return out[0], out[1]


def sketch_meta(sketch_dir: str) -> dict:
    return _read_meta(sketch_dir)
