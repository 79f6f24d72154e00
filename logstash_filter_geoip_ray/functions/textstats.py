"""Text-analysis kernels for the training-data pipeline operators: token
counting, quality scoring, language-ID heuristic, document fingerprinting.
All pure, batch-vectorized (numpy / pyarrow.compute / hashlib over Arrow
columns) — used inside ``map_batches`` by stages/textops.py.

These are engine capabilities beyond the reference (which only enriches), as
required for large-scale training-data pipelines.
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# -- token counting ---------------------------------------------------------

_WS_RE = re.compile(r"\s+")


def token_counts(text: pa.Array) -> pa.Array:
    """Whitespace token count per row (Python ``str.split()`` semantics,
    mirrored by the DuckDB oracle's regexp_split_to_array on trimmed text).
    Vectorized: count whitespace runs via pyarrow, not a Python loop."""
    trimmed = pc.utf8_trim_whitespace(text)
    # tokens = whitespace runs + 1, except empty string → 0
    ws_runs = pc.count_substring_regex(trimmed, r"\s+")
    n = pc.add(ws_runs, 1)
    empty = pc.equal(trimmed, "")
    n = pc.if_else(empty, pa.scalar(0, type=n.type), n)
    return pc.if_else(pc.is_valid(text), n, pa.scalar(None, type=n.type)).cast(pa.int64())


# -- BPE-ish subword estimate ----------------------------------------------

_BPE_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)


def bpe_ish_token_counts(texts: List[Optional[str]]) -> List[Optional[int]]:
    """Rough subword count: word/punct tokens, long words counted as
    ceil(len/4) pieces (a BPE-ish regex heuristic; no model download)."""
    out: List[Optional[int]] = []
    for t in texts:
        if t is None:
            out.append(None)
            continue
        n = 0
        for tok in _BPE_RE.findall(t):
            n += max(1, -(-len(tok) // 4))
        out.append(n)
    return out


# -- quality scoring --------------------------------------------------------

STOPWORDS: Dict[str, frozenset] = {
    "en": frozenset("the a an and of to in is it that for on with as at by".split()),
    "de": frozenset("der die das und von zu in ist es für auf mit als bei ein".split()),
    "fr": frozenset("le la les et de à en est il que pour sur avec un une".split()),
    "es": frozenset("el la los las y de a en es que para con un una por".split()),
    "zh": frozenset("的 了 是 在 我 有 和 就 不 人 都 一 一个 上 也".split()),
}


def quality_features(texts: List[Optional[str]]) -> dict:
    """Per-doc quality signals: char len, token count, mean word length,
    punctuation ratio, stopword ratio (against the union of stopword sets).
    Returns dict of numpy arrays (one map_batches-friendly call)."""
    union_stops = frozenset().union(*STOPWORDS.values())
    n = len(texts)
    lens = np.zeros(n, dtype=np.int64)
    ntok = np.zeros(n, dtype=np.int64)
    meanw = np.zeros(n, dtype=np.float64)
    punct = np.zeros(n, dtype=np.float64)
    stop = np.zeros(n, dtype=np.float64)
    for i, t in enumerate(texts):
        if not t:
            continue
        lens[i] = len(t)
        toks = t.split()
        ntok[i] = len(toks)
        if toks:
            meanw[i] = sum(len(w) for w in toks) / len(toks)
            stop[i] = sum(w.lower() in union_stops for w in toks) / len(toks)
        np_count = sum(1 for c in t if not c.isalnum() and not c.isspace())
        punct[i] = np_count / max(1, len(t))
    return {
        "char_len": lens,
        "token_count": ntok,
        "mean_word_len": meanw,
        "punct_ratio": punct,
        "stopword_ratio": stop,
    }


def language_id(texts: List[Optional[str]]) -> List[Optional[str]]:
    """n-gram/stopword heuristic language ID: argmax of per-language stopword
    hits (ties → lexicographically first language, deterministic); 'und'
    when nothing matches."""
    langs = sorted(STOPWORDS)
    out: List[Optional[str]] = []
    for t in texts:
        if not t:
            out.append(None)
            continue
        toks = [w.lower() for w in t.split()]
        best_lang, best_hits = "und", 0
        for lang in langs:
            hits = sum(w in STOPWORDS[lang] for w in toks)
            if hits > best_hits:
                best_lang, best_hits = lang, hits
        out.append(best_lang)
    return out


# -- fingerprinting ---------------------------------------------------------


def md5_fingerprints(text: pa.Array) -> pa.Array:
    """md5 hex digest per row (matches DuckDB ``md5(text)`` for the oracle)."""
    return pa.array(
        [
            hashlib.md5(t.encode("utf-8")).hexdigest() if t is not None else None
            for t in text.to_pylist()
        ],
        type=pa.string(),
    )


def rolling_fingerprint(texts: List[Optional[str]], window: int = 8) -> List[Optional[int]]:
    """Winnowing-style rolling-hash fingerprint: min 64-bit hash over all
    ``window``-grams of the token stream (content-defined, shift-tolerant)."""
    out: List[Optional[int]] = []
    mask = (1 << 63) - 1
    for t in texts:
        if t is None:
            out.append(None)
            continue
        toks = t.split()
        if len(toks) < window:
            grams = [" ".join(toks)]
        else:
            grams = [" ".join(toks[i : i + window]) for i in range(len(toks) - window + 1)]
        out.append(
            min(
                int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "big") & mask
                for g in grams
            )
        )
    return out
