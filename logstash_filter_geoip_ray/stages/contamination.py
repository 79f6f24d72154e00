"""Benchmark decontamination: flag training documents that share any word
n-gram with a (small, fixed) benchmark/eval set.

The canonical LLM-training-data hygiene step (reference scope: this engine's
training-data operator suite beyond logstash-filter-geoip's E-ops; see
SURVEY.md §2 "LLM-data ops"): an eval benchmark is tiny and static relative
to a 100 TB corpus, so the scale shape is

  1. extract the benchmark's distinct shingles ONCE (a bounded set —
     thousands to low millions of strings),
  2. broadcast them via ``ray.put`` (one object-store copy per node),
  3. stream the corpus through a vectorized ``map_batches`` membership test
     (``pc.is_in`` against the broadcast value set — a hash probe per gram,
     no shuffle, no join).

Everything is Arrow-vectorized: words come from ``utf8_split_whitespace``,
n-grams from ``binary_join_element_wise`` over offset slices of the flat
word array, membership from one ``pc.is_in``. No per-row Python loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _flat_words(text: pa.Array, lower: bool = True) -> tuple[pa.Array, np.ndarray]:
    """Whitespace words of every row (lowercased unless ``lower=False``),
    flattened, with the row index of each word. Empty strings (from empty
    rows) are removed. ``lower=False`` matches case-sensitive ``str.split``
    consumers (MinHash shingles / exact-Jaccard verify)."""
    if pa.types.is_null(text.type):  # all-null block arrives as null type
        text = text.cast(pa.string())
    trimmed = pc.utf8_trim_whitespace(text)
    if lower:
        trimmed = pc.utf8_lower(trimmed)
    words = pc.utf8_split_whitespace(trimmed)
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    lengths = words.value_lengths().to_numpy(zero_copy_only=False)
    lengths = np.where(np.isnan(lengths.astype("float64")), 0, lengths).astype("int64")
    idx = np.repeat(np.arange(len(words), dtype=np.int64), lengths)
    flat = words.flatten()
    nonempty = pc.not_equal(flat, "")
    mask = nonempty.to_numpy(zero_copy_only=False)
    return flat.filter(nonempty), idx[mask]


def _ngrams_from_flat(
    flat: pa.Array, idx: np.ndarray, n: int
) -> tuple[pa.Array, np.ndarray]:
    """Word n-grams from an already-exploded (flat words, row index) pair —
    the shared core of :func:`_doc_ngrams` and the MinHash band stage.
    Vectorized: n offset slices of the flat word array joined element-wise;
    a gram is valid when its first and last word fall in the same row."""
    m = len(flat) - n + 1
    if m <= 0:
        return pa.array([], type=pa.string()), np.array([], dtype=np.int64)
    valid = idx[: m] == idx[n - 1:]
    parts = [flat.slice(k, m) for k in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    vmask = pa.array(valid)
    return grams.filter(vmask), idx[:m][valid]


def _doc_ngrams(text: pa.Array, n: int) -> tuple[pa.Array, np.ndarray]:
    """All lowercased word n-grams of every row (``' '``-joined), with row
    indices."""
    flat, idx = _flat_words(text)
    return _ngrams_from_flat(flat, idx, n)


def benchmark_shingles(ds, n: int = 4, text_col: str = "text") -> pa.Array:
    """Distinct word n-grams of the benchmark dataset, as one Arrow string
    array on the driver. The benchmark is small by contract (an eval set),
    so per-batch distinct grams → one driver-side dedup is bounded."""
    def grams_of(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        g, _ = _doc_ngrams(text, n)
        return pa.table({"g": pc.unique(g)})

    parts = ds.map_batches(grams_of, batch_format="pyarrow").to_arrow_refs()
    import ray

    tables = ray.get(parts)
    if not tables:
        return pa.array([], type=pa.string())
    merged = pa.concat_tables(
        [t for t in tables if t.num_rows] or [pa.table({"g": pa.array([], type=pa.string())})]
    )
    return pc.unique(merged["g"].combine_chunks())


def contaminated_docs(
    ds,
    shingles: pa.Array,
    n: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """(doc_id, n_hit_grams) for every document sharing ≥1 distinct n-gram
    with the benchmark shingle set. ``shingles`` ships once via ``ray.put``;
    each batch does one vectorized ``pc.is_in`` probe. Output is exact and
    integer-only (oracle-expressible)."""
    import ray

    shingle_ref = ray.put(shingles)

    def probe(batch: pa.Table) -> pa.Table:
        bench = ray.get(shingle_ref)
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        grams, gidx = _doc_ngrams(text, n)
        empty = pa.table(
            {id_col: pa.array([], type=pa.int64()),
             "n_hit_grams": pa.array([], type=pa.int64())}
        )
        if len(grams) == 0 or len(bench) == 0:
            return empty
        hit = pc.is_in(grams, value_set=bench)
        hmask = hit.to_numpy(zero_copy_only=False)
        if not hmask.any():
            return empty
        # distinct hit grams per row: group the (row, gram) hit pairs
        hits = pa.table(
            {"i": pa.array(gidx[hmask], type=pa.int64()), "g": grams.filter(hit)}
        )
        distinct = hits.group_by(["i", "g"]).aggregate([])
        per_row = distinct.group_by("i").aggregate([([], "count_all")])
        row_idx = per_row["i"].combine_chunks()
        ids = pc.take(pc.cast(batch[id_col], pa.int64()), row_idx)
        return pa.table(
            {id_col: ids, "n_hit_grams": pc.cast(per_row["count_all"], pa.int64())}
        )

    return ds.map_batches(probe, batch_format="pyarrow")
