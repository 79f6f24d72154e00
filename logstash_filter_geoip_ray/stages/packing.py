"""Training-batch assembly: deterministic epoch shuffle + sequence packing.

Two operators an LLM training-data pipeline runs after cleaning/dedup:

- ``hash_shuffle``: a machine-independent global shuffle — order rows by
  ``md5(seed + ':' + id)``. Unlike ``Dataset.random_shuffle`` (whose result
  depends on block layout and task scheduling), the hash order is a pure
  function of (seed, id): reproducible across cluster sizes, resumable
  mid-epoch, and a new epoch is just a new seed. The execution cost is one
  range-partition sort — exactly the all-to-all any true shuffle pays.

- ``pack_sequences``: greedy sequence packing — concatenate documents in a
  deterministic per-bucket order and split the token stream every
  ``chunk_tokens`` tokens; each doc is assigned the chunk containing its
  first token. Buckets (``doc_id % num_buckets``) are the unit of
  parallelism: packing is inherently sequential (each doc's offset depends
  on every predecessor), so the cumulative sum runs per bucket inside one
  ``map_groups`` task while buckets proceed in parallel. At fleet scale,
  pick ``num_buckets`` ≈ total_tokens / (a few hundred M) so one bucket's
  (id, token_count) pairs — NOT its text — fit in a task; only the
  doc_id→chunk assignment is computed here, the heavy text concat happens
  downstream per chunk.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def hash_shuffle(ds, id_col: str = "doc_id", seed: str = "s0"):
    """Rows with an ``h = md5(seed:id)`` column, globally sorted by
    ``(h, id)`` — the deterministic epoch shuffle."""

    def add_hash(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        h = [hashlib.md5(f"{seed}:{int(v)}".encode()).hexdigest() for v in ids]
        return batch.append_column("h", pa.array(h, type=pa.string()))

    return ds.map_batches(add_hash, batch_format="pyarrow").sort(["h", id_col])


def hash_shuffle_fast(ds, id_col: str = "doc_id", seed: str = "s0"):
    """Scale-path epoch shuffle: same contract as :func:`hash_shuffle`
    (pure function of (seed, id), reproducible on any cluster size) but the
    key is pandas' vectorized SipHash seeded through ``hash_key`` — an int64
    sort key computed at C speed instead of 41M Python ``md5()`` calls and
    32-char string comparisons. Use :func:`hash_shuffle` when the order must
    be reproducible by a SQL oracle (DuckDB has ``md5``, not SipHash)."""
    import pandas as pd

    # pandas' hash_key only seeds OBJECT-dtype hashing; for int64 ids the
    # seed must be mixed in explicitly. xor-multiply-xor is a bijection on
    # uint64, so the result stays a valid (collision-free given distinct
    # base hashes) deterministic sort key.
    seed_k = np.uint64(
        pd.util.hash_pandas_object(pd.Series([seed]), index=False).iloc[0]
    )
    mult = np.uint64(0x9E3779B97F4A7C15)

    def add_hash(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if pa.types.is_integer(ids.type):
            ids = ids.cast(pa.int64())
        h = pd.util.hash_pandas_object(ids.to_pandas(), index=False).to_numpy()
        with np.errstate(over="ignore"):
            h = (h ^ seed_k) * mult
            h = h ^ (h >> np.uint64(29))
        return batch.append_column("h", pa.array(h.view("int64")))

    return ds.map_batches(add_hash, batch_format="pyarrow").sort(["h", id_col])


def _token_count_stage(num_buckets, text_col, id_col, keep_text):
    """Shared map stage for the packing operators: (id, bucket, tokens
    [, text]). Null text counts 0 tokens; all-null blocks (Arrow null type)
    are cast to string first."""
    import pyarrow.compute as pc

    from ..functions.textstats import token_counts

    def count(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        if pa.types.is_null(text.type):
            text = text.cast(pa.string())
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {
            id_col: pa.array(ids, type=pa.int64()),
            "bucket": pa.array(ids % num_buckets, type=pa.int64()),
            "tokens": pc.fill_null(token_counts(text), 0),
        }
        if keep_text:
            cols[text_col] = text
        return pa.table(cols)

    return count


def _chunk_starts(group: "pd.DataFrame", id_col: str, chunk_tokens: int):
    """Sort a bucket's docs by id and return (sorted_group, start_tok,
    chunk_id) — the single source of truth for the packing assignment."""
    g = group.sort_values(id_col)
    tok = g["tokens"].to_numpy(dtype=np.int64)
    start = tok.cumsum() - tok
    return g, start, start // chunk_tokens


def pack_sequences(
    ds,
    chunk_tokens: int = 256,
    num_buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """(doc_id, bucket, start_tok, chunk_id) for every document: the packed
    training-chunk assignment. Token counts are whitespace words (the
    engine's ``token_counts`` kernel — swap in the BPE-ish counter for real
    tokenizer budgets); null text counts 0 tokens; all outputs are integers
    (oracle-expressible via a SQL window cumsum)."""

    def pack(group: pd.DataFrame) -> pd.DataFrame:
        g, start, chunk = _chunk_starts(group, id_col, chunk_tokens)
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(dtype=np.int64),
                "bucket": g["bucket"].to_numpy(dtype=np.int64),
                "start_tok": start,
                "chunk_id": chunk,
            }
        )

    counts = ds.map_batches(
        _token_count_stage(num_buckets, text_col, id_col, keep_text=False),
        batch_format="pyarrow",
    )
    return (
        counts.groupby("bucket").map_groups(pack, batch_format="pandas").sort(id_col)
    )


def pack_chunks(
    ds,
    chunk_tokens: int = 256,
    num_buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Materialized training chunks: the :func:`pack_sequences` assignment
    (same ``_chunk_starts`` helper — the two can never desynchronize) PLUS
    the assembled chunk text — (bucket, chunk_id, n_docs, chunk_chars,
    chunk_md5). One pass per bucket: cumsum the token counts in doc order,
    then a vectorized groupby(chunk) ordered concat. Null-text docs carry no
    content and are DROPPED before chunking (they contribute 0 tokens, so
    every other doc's assignment is unchanged); chunk columns are therefore
    plain non-null int64/str. At fleet scale this is the step that writes
    chunk files; here the chunk content is pinned by md5 so a SQL oracle can
    verify it byte-for-byte."""
    import hashlib
    import pyarrow.compute as pc

    stage = _token_count_stage(num_buckets, text_col, id_col, keep_text=True)

    def count_nonnull(batch: pa.Table) -> pa.Table:
        t = stage(batch)
        return t.filter(pc.is_valid(t[text_col]))

    def assemble(group: pd.DataFrame) -> pd.DataFrame:
        g, start, chunk = _chunk_starts(group, id_col, chunk_tokens)
        g = g.assign(_chunk=chunk)
        grp = g.groupby("_chunk", sort=True)
        docs = grp[text_col].agg("\n".join)
        n_docs = grp.size()
        return pd.DataFrame(
            {
                "bucket": np.full(len(n_docs), g["bucket"].iloc[0], dtype=np.int64),
                "chunk_id": n_docs.index.to_numpy(dtype=np.int64),
                "n_docs": n_docs.to_numpy(dtype=np.int64),
                "chunk_chars": docs.str.len().to_numpy(dtype=np.int64),
                "chunk_md5": [
                    hashlib.md5(t.encode("utf-8")).hexdigest() for t in docs
                ],
            }
        )

    counts = ds.map_batches(count_nonnull, batch_format="pyarrow")
    return (
        counts.groupby("bucket")
        .map_groups(assemble, batch_format="pandas")
        .sort(["bucket", "chunk_id"])
    )


def stratified_split(
    ds,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    seed: str = "split",
    num_buckets: int = 32,
):
    """Deterministic stratified train/val/test assignment: within every
    stratum, rows rank by ``md5(seed:id)`` (the reproducible-shuffle device
    — a pure function of the id, identical in SQL) and split by EXACT
    integer thresholds: train iff 100·i ≤ train_pct·n, val iff 100·i ≤
    (train_pct+val_pct)·n, else test. No float ceil anywhere — a double
    ``0.8*n`` rounds differently in numpy and DuckDB's DECIMAL arithmetic,
    so the rational comparison is cross-multiplied instead.

    Scale shape: strata co-locate by hash bucket; one vectorized rebased-
    arange pass per bucket ranks every stratum at once. Per-row md5 is the
    oracle-reproducibility price (see hash_shuffle vs hash_shuffle_fast
    for the SipHash scale path)."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from ..stages.aggregate import bucket_by_key

    prepped = bucket_by_key(
        ds.map_batches(
            _md5_rank_prep(stratum_col, id_col, seed), batch_format="pyarrow"
        ),
        stratum_col,
        num_buckets,
    )

    def per_bucket(block: pd.DataFrame) -> pd.DataFrame:
        b = block.sort_values([stratum_col, "_h", id_col])
        gb = b.groupby(stratum_col, sort=False, dropna=False)
        gid = gb.ngroup().to_numpy()
        n_rows = len(b)
        pos = np.arange(n_rows, dtype=np.int64)
        first = np.ones(n_rows, dtype=bool)
        first[1:] = gid[1:] != gid[:-1]
        seg_base = np.maximum.accumulate(np.where(first, pos, 0))
        i = pos - seg_base + 1  # 1-based rank within stratum
        n = gb[id_col].transform("size").to_numpy(dtype=np.int64)
        split = np.where(
            100 * i <= train_pct * n,
            "train",
            np.where(100 * i <= (train_pct + val_pct) * n, "val", "test"),
        )
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(dtype=np.int64),
                stratum_col: b[stratum_col].to_numpy(),
                "split": split,
            }
        )

    return (
        prepped.groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .sort(id_col)
    )


def morton_key(x: np.ndarray, y: np.ndarray, bits: int = 16) -> np.ndarray:
    """Interleave the low ``bits`` bits of two non-negative integer arrays
    into a Morton (Z-order) key — x owns the even bit positions, y the odd
    ones. ``bits`` vectorized numpy passes, no per-row Python. Negative
    inputs raise: two's-complement masking would silently diverge from the
    sign-preserving ``%`` the SQL oracle uses."""
    x = x.astype(np.int64)
    y = y.astype(np.int64)
    if (len(x) and x.min() < 0) or (len(y) and y.min() < 0):
        raise ValueError("morton_key requires non-negative inputs")
    x = x & ((1 << bits) - 1)
    y = y & ((1 << bits) - 1)
    z = np.zeros(len(x), dtype=np.int64)
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def zorder_layout(ds, id_col: str, x_col: str, y_col: str, bits: int = 16):
    """Space-filling-curve data layout: key every row by the Morton
    interleave of two clustering dimensions and sort the dataset by it —
    the standard trick (Z-ordering, as popularized by data-lake table
    formats) for making range filters on EITHER dimension prune well when
    the sorted output is written to partitioned/row-grouped Parquet.

    The keying is a stateless per-batch map; the sort is the one
    unavoidable all-to-all (it IS the layout change) and uses Ray Data's
    range-partitioned Sort, the same exchange epoch_shuffle already
    measures at 41.9M rows. Ties broken by ``id_col`` so the layout is
    byte-deterministic."""

    def add_key(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False)
        y = batch[y_col].to_numpy(zero_copy_only=False)
        z = morton_key(x, y, bits)
        return batch.select([id_col]).append_column(
            "z", pa.array(z, type=pa.int64())
        )

    return ds.map_batches(add_key, batch_format="pyarrow").sort(
        ["z", id_col]
    )


def balanced_shards(
    ds,
    id_col: str,
    size_col: str,
    num_shards: int = 16,
    num_buckets: int = 64,
):
    """Size-balanced shard assignment (the "which output file gets which
    doc" step before writing training shards): rows ranked globally by
    (size desc, id asc) and dealt to ``num_shards`` shards in a snake /
    boustrophedon pattern — shard loads stay within one max-row-size of
    each other, the classic deterministic alternative to greedy LPT that a
    SQL oracle can also compute (``row_number()`` + integer math).

    The global rank is computed WITHOUT a global sort operator:
    ``rank = (# rows with bigger size) + (# equal-size rows with smaller
    id)``. The first term comes from a per-size count table (distinct
    sizes are bounded — it's a length — so the table is driver-small and
    broadcast in the closure); the second from co-locating each size's ids
    by hash bucket and one vectorized argsort per bucket. Shuffle volume =
    the (id, size) pair stream, never the payload."""
    import pyarrow.compute as pc

    from .aggregate import bucket_by_key, grouped_counts

    pairs = ds.map_batches(
        lambda b: b.select([id_col, size_col]), batch_format="pyarrow"
    )
    # per-size counts: bounded by the size domain (a char/token length),
    # orders of magnitude below row count — safe driver pull by construction
    sizes = grouped_counts(pairs, [size_col], count_alias="_n").to_pandas()
    sizes = sizes.sort_values(size_col, ascending=False)
    offsets = dict(
        zip(
            sizes[size_col].to_numpy(),
            np.concatenate(([0], np.cumsum(sizes["_n"].to_numpy())[:-1])),
        )
    )

    def per_bucket(block: pd.DataFrame) -> pd.DataFrame:
        d = block.sort_values([size_col, id_col], ascending=[False, True])
        pos = d.groupby(size_col, sort=False).cumcount().to_numpy()
        base = d[size_col].map(offsets).to_numpy(dtype=np.int64)
        rnk = base + pos
        row = rnk % num_shards
        shard = np.where(
            (rnk // num_shards) % 2 == 0, row, num_shards - 1 - row
        )
        out = d[[id_col, size_col]].copy()
        out["rnk"] = rnk
        out["shard"] = shard.astype(np.int64)
        return out

    bucketed = bucket_by_key(pairs, size_col, num_buckets)
    return (
        bucketed.groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .sort(id_col)
    )


def _md5_rank_prep(stratum_col: str, id_col: str, seed: str):
    """Shared projection for the md5(seed:id) within-stratum rank device
    (stratified_split / temperature_mix): (stratum, int64 id, _h). Per-row
    md5 is the oracle-reproducibility price — see hash_shuffle vs
    hash_shuffle_fast for the SipHash scale path."""
    import pyarrow.compute as pc

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        h = [
            hashlib.md5(f"{seed}:{int(v)}".encode()).hexdigest() for v in ids
        ]
        return pa.table(
            {
                id_col: pc.cast(batch[id_col], pa.int64()),
                stratum_col: batch[stratum_col],
                "_h": pa.array(h, type=pa.string()),
            }
        )

    return prep


def _iroot(x: int, k: int) -> int:
    """Exact integer k-th root: floor(x ** (1/k)) with big-int correction
    around the float seed (never trusts float precision)."""
    if x < 0 or k < 1:
        raise ValueError("x >= 0, k >= 1 required")
    if k == 1 or x == 0:
        return x
    r = max(int(round(x ** (1.0 / k))), 0)
    while r > 0 and r**k > x:
        r -= 1
    while (r + 1) ** k <= x:
        r += 1
    return r


def temperature_quotas(
    counts: dict, target_total: int, alpha_num: int = 1, alpha_den: int = 2
) -> dict:
    """Per-stratum sample quotas for temperature-based mixing (the
    mT5/XLM-R multinomial recipe, p_i ∝ n_i^alpha with alpha < 1 flattening
    the source distribution), in EXACT integer arithmetic: weights are the
    exact integer ``alpha_den``-th root of ``n_i ** alpha_num``; quotas are
    floor(T·w/W) plus a largest-remainder allocation (remainder desc,
    stratum asc tie-break) so quotas sum to exactly T; each quota is then
    capped at the stratum's population (sampling WITHOUT replacement — the
    published recipe upsamples with replacement instead; the cap is the
    documented divergence, and it undershoots T only when a stratum is
    smaller than its flattened share)."""
    w = {s: _iroot(int(n) ** alpha_num, alpha_den) for s, n in counts.items()}
    total_w = sum(w.values())
    if total_w == 0:
        return {s: 0 for s in w}
    base = {s: target_total * w[s] // total_w for s in w}
    rem = {s: target_total * w[s] % total_w for s in w}
    extra = target_total - sum(base.values())
    for s in sorted(w, key=lambda s: (-rem[s], s))[:extra]:
        base[s] += 1
    return {s: min(int(counts[s]), base[s]) for s in w}


def temperature_mix(
    ds,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    target_total: int = 100,
    alpha_num: int = 1,
    alpha_den: int = 2,
    seed: str = "mix",
    num_buckets: int = 32,
):
    """Temperature-based corpus mixing: draw a deterministic sample whose
    per-stratum sizes follow :func:`temperature_quotas` (n^alpha-flattened
    shares), selecting within each stratum by ``md5(seed:id)`` rank — the
    repo's reproducible-shuffle device (identical in SQL), see
    :func:`stratified_split`. Output rows: (stratum, id), sorted.

    Scale shape: pass 1 is a tiny stratum-count groupby (strata are a
    dimension — languages/sources — so the driver pull is the sanctioned
    provably-small class); quotas ride the task closure; pass 2 re-reads
    the corpus, ships only (stratum, id, hash) and ranks each stratum with
    one vectorized sort+cumcount per bucket."""
    import pyarrow.compute as pc

    from ..stages.aggregate import bucket_by_key, grouped_counts

    cnt = grouped_counts(ds, [stratum_col], count_alias="_n").to_pandas()
    quotas = temperature_quotas(
        dict(zip(cnt[stratum_col], cnt["_n"])),
        target_total, alpha_num, alpha_den,
    )

    prepped = bucket_by_key(
        ds.map_batches(
            _md5_rank_prep(stratum_col, id_col, seed), batch_format="pyarrow"
        ),
        stratum_col,
        num_buckets,
    )

    def per_bucket(block: pd.DataFrame) -> pd.DataFrame:
        b = block.sort_values([stratum_col, "_h", id_col])
        # dropna=False: a null stratum got a quota in pass 1 (Arrow counts
        # the null group) and must rank and fill it like any other
        rk = (
            b.groupby(stratum_col, sort=False, dropna=False)
            .cumcount()
            .to_numpy()
        )
        cap = b[stratum_col].map(quotas).fillna(0).to_numpy(dtype=np.int64)
        keep = b[rk < cap]
        return keep[[stratum_col, id_col]]

    return (
        prepped.groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .sort([stratum_col, id_col])
    )
