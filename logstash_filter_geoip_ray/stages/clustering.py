"""Distributed KMeans over an embedding column — the curation clustering
step of a training-data pipeline (cluster-balanced sampling, SemDeDup-style
per-cluster dedup, topic bucketing).

Unlike ``similarity._kmeans`` (driver-side numpy on a bounded SAMPLE, used
to train the IVF codebook), this is full-corpus Lloyd iteration in the
classic distributed form: centroids broadcast once per round (``ray.put``),
each batch computes assignments and emits k partial (sum-vector, count)
rows, the driver folds the tiny k×batches partial table into new
centroids. The corpus itself never shuffles and is re-read streaming each
round — at 100 TB the re-read is the scale-correct trade against
materializing the dataset in the object store.

Determinism contract (same idea as ``stages.graph.pagerank``): vectors are
quantized to integer milli-units and all arithmetic — squared-distance
argmin, partial sums, the ``sum // count`` centroid update — is int64, so
the result is bit-identical for ANY batching/block structure (float
accumulation would drift with summation order). Ties in the argmin go to
the lowest cluster index.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

#: quantization: embedding value x ↦ floor(x * 1000) as int64
KMEANS_MILLI = 1000


def _milli_matrix(batch: pa.Table, vec_col: str) -> Optional[np.ndarray]:
    """Int64 milli matrix via similarity's zero-copy flat-reshape fast path
    (this runs once per batch per Lloyd AND init round — the hot path of
    the whole operator). None for empty blocks: Ray Data can hand
    map_batches a 0-row block (repartition beyond row count, emptied
    filters) and np.stack on an empty list raises."""
    if batch.num_rows == 0:
        return None
    from .similarity import list_column_to_matrix

    mat = list_column_to_matrix(batch[vec_col])
    return np.floor(mat * KMEANS_MILLI).astype(np.int64)


def _assign(mat: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Vectorized int64 squared-Euclidean argmin (ties → lowest index).
    ||v - c||² ordering == (c·c - 2 v·c) ordering; dropping the v·v term
    keeps every intermediate exactly representable in int64."""
    cc = np.sum(centroids * centroids, axis=1)  # (k,)
    scores = cc[None, :] - 2 * (mat @ centroids.T)  # (n, k) int64 exact
    return np.argmin(scores, axis=1)


def _sample_mask(ids: np.ndarray, sample_milli: int) -> np.ndarray:
    """Deterministic per-id hash sample (splitmix64 finalizer): a pure
    function of the id alone, so the sampled set is identical for ANY
    batching / blocking / cluster size — the property the bit-stable
    kmeans contract needs."""
    h = ids.astype(np.uint64)
    with np.errstate(over="ignore"):
        h = h + np.uint64(0x9E3779B97F4A7C15)
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h = h ^ (h >> np.uint64(31))
    return (h % np.uint64(1000)) < np.uint64(sample_milli)


def _farthest_point_seeds(ids: np.ndarray, mat: np.ndarray, k: int) -> np.ndarray:
    """Local farthest-point init over (ids, milli-matrix): seed 1 is the
    vector of the smallest id; each next seed maximizes the squared
    distance to its nearest chosen seed (ties → lowest id).  The SAME
    algebra the distributed init replays pass-by-pass."""
    seeds = [mat[int(np.argmin(ids))]]
    for _ in range(k - 1):
        cents = np.stack(seeds)
        vv = np.sum(mat * mat, axis=1)
        cc = np.sum(cents * cents, axis=1)
        d2 = np.min(vv[:, None] - 2 * (mat @ cents.T) + cc[None, :], axis=1)
        best = int(np.lexsort((ids, -d2))[0])  # max d2, tie → min id
        seeds.append(mat[best])
    return np.stack(seeds)


def kmeans_fit(
    ds,
    k: int = 8,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    init: str = "farthest",
    sample_milli: int = 100,
) -> np.ndarray:
    """Fit ``k`` integer-milli centroids with ``iters`` Lloyd rounds.

    ``init="farthest"`` (default): deterministic farthest-point traversal
    (no RNG) — seed 1 is the vector of the smallest id; each next seed is
    the point maximizing the squared distance to its nearest chosen seed
    (ties → lowest id). Each init round is one streaming pass emitting a
    single per-batch argmax row, so only batches×1 rows reach the driver —
    but there are k-1 rounds, i.e. k-1 FULL CORPUS PASSES: exact, and fine
    for small k, but the wrong shape at k=1024 on 100 TB.

    ``init="sample"`` (the scale path): ONE streaming pass collects the
    deterministic hash sample (``splitmix64(id) % 1000 < sample_milli`` —
    a pure function of the id, so the sample is identical for any
    blocking), and the same farthest-point traversal runs LOCALLY on the
    sample. Init cost drops from k-1 passes to 1 pass + a driver-side
    numpy loop over ~sample_milli/1000 of the corpus; pick ``sample_milli``
    so the sample fits the driver (e.g. 1000·target_rows/corpus_rows).
    Lloyd iterations are identical in both modes, and both stay bit-stable
    under any batching (``kmeans_fit_local`` mirrors both; parity pinned by
    test).

    Unlike smallest-k-ids init, farthest-point cannot drop two seeds into
    one dense blob. Empty clusters keep their previous centroid. Returns
    the ``(k, dim)`` int64 centroid matrix."""
    import ray

    if init not in ("farthest", "sample"):
        raise ValueError("kmeans_fit: init must be 'farthest' or 'sample'")
    if init == "sample":
        def sampled(batch: pa.Table) -> pa.Table:
            mat = _milli_matrix(batch, vec_col)
            if mat is None:
                return pa.table(
                    {
                        id_col: pa.array([], type=pa.int64()),
                        vec_col: pa.array([], type=pa.list_(pa.int64())),
                    }
                )
            ids = pc.cast(batch[id_col], pa.int64()).to_numpy(
                zero_copy_only=False
            )
            keep = _sample_mask(ids, sample_milli)
            return pa.table(
                {
                    id_col: pa.array(ids[keep], type=pa.int64()),
                    vec_col: pa.array(
                        mat[keep].tolist(), type=pa.list_(pa.int64())
                    ),
                }
            )

        samp = ds.map_batches(sampled, batch_format="pyarrow").to_pandas()
        if len(samp) < k:
            raise ValueError(
                "kmeans_fit: hash sample has %d rows < k=%d — raise "
                "sample_milli (or use init='farthest')" % (len(samp), k)
            )
        sids = samp[id_col].to_numpy()
        smat = np.stack(samp[vec_col].to_numpy()).astype(np.int64)
        centroids = _farthest_point_seeds(sids, smat, k)
        return _lloyd(ds, centroids, k, iters, vec_col)

    def bottom1(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch[id_col], pa.int64())
        t = pa.table({id_col: ids, vec_col: batch[vec_col]})
        order = pc.sort_indices(t, sort_keys=[(id_col, "ascending")])
        return t.take(order[:1])

    first = (
        ds.map_batches(bottom1, batch_format="pyarrow")
        .sort(id_col)
        .limit(1)
        .to_pandas()
    )
    seeds = [
        np.floor(
            np.asarray(first[vec_col].iloc[0], dtype=np.float64) * KMEANS_MILLI
        ).astype(np.int64)
    ]

    for _ in range(k - 1):
        seed_ref = ray.put(np.stack(seeds))

        def far_partial(batch: pa.Table) -> pa.Table:
            cents = ray.get(seed_ref)
            mat = _milli_matrix(batch, vec_col)
            if mat is None:
                return pa.table(
                    {
                        "d2": pa.array([], type=pa.int64()),
                        id_col: pa.array([], type=pa.int64()),
                        vec_col: pa.array([], type=pa.list_(pa.int64())),
                    }
                )
            ids = pc.cast(batch[id_col], pa.int64()).to_numpy(
                zero_copy_only=False
            )
            # full ||v-c||²: comparing across v, the v·v term matters here
            vv = np.sum(mat * mat, axis=1)
            cc = np.sum(cents * cents, axis=1)
            d2 = np.min(
                vv[:, None] - 2 * (mat @ cents.T) + cc[None, :], axis=1
            )
            best = int(np.lexsort((ids, -d2))[0])  # max d2, tie → min id
            return pa.table(
                {
                    "d2": pa.array([int(d2[best])], type=pa.int64()),
                    id_col: pa.array([int(ids[best])], type=pa.int64()),
                    vec_col: pa.array(
                        [mat[best].tolist()], type=pa.list_(pa.int64())
                    ),
                }
            )

        cand = ds.map_batches(far_partial, batch_format="pyarrow").to_pandas()
        cand = cand.sort_values(["d2", id_col], ascending=[False, True])
        seeds.append(np.asarray(cand[vec_col].iloc[0], dtype=np.int64))

    return _lloyd(ds, np.stack(seeds), k, iters, vec_col)


def _lloyd(ds, centroids: np.ndarray, k: int, iters: int, vec_col: str) -> np.ndarray:
    """The distributed Lloyd rounds shared by both init modes: centroids
    broadcast per round, per-batch int64 partial (sum, count) rows, driver
    folds with ``sum // count`` — bit-stable under any batching."""
    import ray

    dim = centroids.shape[1]
    for _ in range(iters):
        cent_ref = ray.put(centroids)

        def partials(batch: pa.Table) -> pa.Table:
            cents = ray.get(cent_ref)
            mat = _milli_matrix(batch, vec_col)
            if mat is None:
                return pa.table(
                    {
                        "c": pa.array([], type=pa.int64()),
                        "s": pa.array([], type=pa.list_(pa.int64())),
                        "n": pa.array([], type=pa.int64()),
                    }
                )
            assign = _assign(mat, cents)
            rows_c, rows_s, rows_n = [], [], []
            for c in np.unique(assign):
                members = mat[assign == c]
                rows_c.append(int(c))
                rows_s.append(members.sum(axis=0, dtype=np.int64))
                rows_n.append(len(members))
            return pa.table(
                {
                    "c": pa.array(rows_c, type=pa.int64()),
                    "s": pa.array(
                        [r.tolist() for r in rows_s], type=pa.list_(pa.int64())
                    ),
                    "n": pa.array(rows_n, type=pa.int64()),
                }
            )

        part = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
        sums = np.zeros((k, dim), dtype=np.int64)
        counts = np.zeros(k, dtype=np.int64)
        for _, row in part.iterrows():
            sums[int(row["c"])] += np.asarray(row["s"], dtype=np.int64)
            counts[int(row["c"])] += int(row["n"])
        new = centroids.copy()
        nonempty = counts > 0
        # int64 floor division — bit-stable regardless of partial grouping
        new[nonempty] = sums[nonempty] // counts[nonempty, None]
        centroids = new

    return centroids


def kmeans_fit_local(
    tbl: pa.Table,
    k: int = 8,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    init: str = "farthest",
    sample_milli: int = 100,
) -> np.ndarray:
    """Driver-local bit-exact replica of :func:`kmeans_fit` (no Ray) — used
    to generate the SemDeDup oracle's centroid literals and by the parity
    test that pins distributed == local.  Valid because the distributed fit
    is integer-exact for ANY batching: same init (farthest-point, or the
    same deterministic hash sample then farthest-point), same int64 Lloyd
    algebra, same ``sum // count`` update, so both paths compute the
    identical matrix."""
    from .similarity import list_column_to_matrix

    ids_arr = pc.cast(tbl[id_col], pa.int64())
    if isinstance(ids_arr, pa.ChunkedArray):
        ids_arr = ids_arr.combine_chunks()
    ids = np.asarray(ids_arr)
    mat = np.floor(
        list_column_to_matrix(tbl[vec_col]) * KMEANS_MILLI
    ).astype(np.int64)

    if init == "sample":
        keep = _sample_mask(ids, sample_milli)
        if int(keep.sum()) < k:
            raise ValueError(
                "kmeans_fit_local: hash sample has %d rows < k=%d — raise "
                "sample_milli (or use init='farthest')"
                % (int(keep.sum()), k)
            )
        centroids = _farthest_point_seeds(ids[keep], mat[keep], k)
    elif init == "farthest":
        centroids = _farthest_point_seeds(ids, mat, k)
    else:
        raise ValueError("kmeans_fit_local: init must be 'farthest' or 'sample'")

    for _ in range(iters):
        assign = _assign(mat, centroids)
        new = centroids.copy()
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                new[c] = members.sum(axis=0, dtype=np.int64) // len(members)
        centroids = new
    return centroids


def kmeans_assign(
    ds,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Final assignment pass: rows ``(id, cluster)`` sorted by id."""
    import ray

    cent_ref = ray.put(centroids)

    def assign_batch(batch: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        mat = _milli_matrix(batch, vec_col)
        if mat is None:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "cluster": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                id_col: pc.cast(batch[id_col], pa.int64()),
                "cluster": pa.array(_assign(mat, cents).astype(np.int64)),
            }
        )

    return ds.map_batches(assign_batch, batch_format="pyarrow").sort(id_col)


def label_centroids(
    ds,
    vec_col: str = "embedding",
    label_col: str = "label",
    label_type: Optional[pa.DataType] = None,
):
    """Per-class centroid sums (the classifier-prototype / SemDeDup-prep
    aggregate): for every (label, dim) the int64 milli sum of that
    dimension plus the class count. ``sum_milli // n`` is the quantized
    centroid — left to the caller so the aggregate stays mergeable. The
    label column may be any hashable Arrow type (int class ids, language
    strings, …); integer labels normalize to int64. Null labels form
    their own group (SQL GROUP BY semantics).

    Scale shape: one vectorized pass per batch (dictionary-encode the
    label column, ``np.add.at`` over the code inverse) collapses a batch
    to |labels|·dim tall rows; the tree combine only ever sees those
    partials. The corpus never shuffles."""
    from .aggregate import tree_sum

    # pass label_type explicitly when ds is shuffle-backed: Ray 2.49's
    # schema() peek EXECUTES a shuffle plan once and the consumption runs it
    # again — for a parquet-backed ds the peek is a cheap metadata read and
    # None is fine
    if label_type is None:
        schema = ds.schema()
        label_type = schema.types[schema.names.index(label_col)]
    if pa.types.is_integer(label_type):
        label_type = pa.int64()

    def partial(batch: pa.Table) -> pa.Table:
        mat = _milli_matrix(batch, vec_col)
        if mat is None:
            return pa.table(
                {
                    label_col: pa.array([], type=label_type),
                    "dim": pa.array([], type=pa.int64()),
                    "sum_milli": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        label_arr = pc.cast(batch[label_col], label_type)
        if isinstance(label_arr, pa.ChunkedArray):
            label_arr = label_arr.combine_chunks()
        # dictionary-encode: codes are small ints for ANY label type, and
        # a null label keeps a null code — no float64 degradation, no
        # sentinel bookkeeping
        enc = label_arr.dictionary_encode()
        codes = pc.fill_null(enc.indices.cast(pa.int64()), -1).to_numpy(
            zero_copy_only=False
        )
        uniq, inv, counts = np.unique(
            codes, return_inverse=True, return_counts=True
        )
        dim = mat.shape[1]
        acc = np.zeros((len(uniq), dim), dtype=np.int64)
        np.add.at(acc, inv, mat)
        # code -1 (null label) → null output row; others look up the
        # batch-local dictionary
        take_idx = pa.array(
            np.repeat(uniq, dim), type=pa.int64()
        )
        out_labels = pc.take(
            enc.dictionary,
            pc.if_else(
                pc.less(take_idx, 0), pa.scalar(None, type=pa.int64()),
                take_idx,
            ),
        )
        return pa.table(
            {
                label_col: out_labels.cast(label_type),
                "dim": pa.array(
                    np.tile(np.arange(dim, dtype=np.int64), len(uniq))
                ),
                "sum_milli": pa.array(acc.reshape(-1), type=pa.int64()),
                "n": pa.array(np.repeat(counts.astype(np.int64), dim)),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return tree_sum(partials, [label_col, "dim"], ["sum_milli", "n"],
                    sort_result=True)


def quantize_embeddings(
    ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 255,
):
    """Linear int8-style quantization of an embedding column — the
    compression step before shipping vectors to an ANN index at fleet
    scale. Integer-exact end to end: embeddings become int64 millis
    (KMEANS_MILLI), per-dimension (min, max) bounds come from one
    streaming pass, and the code is ``((x - mn) * (levels-1)) // (mx -
    mn)`` — floor division on non-negative operands, bit-identical to a
    SQL oracle.

    Scale shape: pass 1 collapses every batch to |dims| (dim, mn, mx)
    rows (bundled combine, one final task — the only exchange); the tiny
    per-dim bounds broadcast into pass 2, where the corpus streams again
    and quantizes vectorized. Output is exploded (id, dim 1-based, q)
    rows — the join/aggregate-friendly layout (generate_subscripts
    parity)."""

    def mm_partial(batch: pa.Table) -> pa.Table:
        mat = _milli_matrix(batch, vec_col)
        if mat is None:
            return pa.table(
                {
                    "dim": pa.array([], type=pa.int64()),
                    "mn": pa.array([], type=pa.int64()),
                    "mx": pa.array([], type=pa.int64()),
                }
            )
        d = mat.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
                "mn": pa.array(mat.min(axis=0)),
                "mx": pa.array(mat.max(axis=0)),
            }
        )

    def mm_combine(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("dim", as_index=False).agg(
            mn=("mn", "min"), mx=("mx", "max")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from .aggregate import tree_agg

    mm = (
        tree_agg(ds.map_batches(mm_partial, batch_format="pyarrow"), mm_combine)
        .to_pandas()
        .sort_values("dim")
    )
    mn = mm["mn"].to_numpy(dtype=np.int64)
    span = mm["mx"].to_numpy(dtype=np.int64) - mn
    safe_span = np.where(span == 0, 1, span)

    def quant(batch: pa.Table) -> pa.Table:
        mat = _milli_matrix(batch, vec_col)
        if mat is None:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "dim": pa.array([], type=pa.int64()),
                    "q": pa.array([], type=pa.int64()),
                }
            )
        n, d = mat.shape
        q = np.where(span > 0, ((mat - mn) * (levels - 1)) // safe_span, 0)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, d)),
                "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), n)),
                "q": pa.array(q.reshape(-1)),
            }
        )

    return ds.map_batches(quant, batch_format="pyarrow").sort([id_col, "dim"])


def coreset_select(
    ds,
    k: int = 8,
    per_cluster: int = 16,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: Optional[np.ndarray] = None,
):
    """Cluster-stratified representative subset (coreset) selection — the
    semantic-diversity curation step: KMeans the corpus, then keep each
    cluster's ``per_cluster`` members NEAREST its centroid (integer-milli
    squared distance, ties → id asc).  Returns ``(id, cluster, rank)``
    sorted by (cluster, rank).

    Scale shape: centroids come from the existing streaming
    :func:`kmeans_fit` (broadcast per round, corpus never shuffles); the
    selection is a two-stage partial top-n — each batch emits at most
    k × per_cluster candidate rows, the final per-cluster merge sees only
    batches × per_cluster rows.  Everything integer-exact, so the result
    is bit-identical under any batching (pinned against a local numpy
    reference in tests).  Rows-only driver check (iterative KMeans has no
    SQL oracle)."""
    import ray

    if centroids is None:
        centroids = kmeans_fit(ds, k=k, iters=iters, vec_col=vec_col, id_col=id_col)
    cent_ref = ray.put(centroids)

    def partial(batch: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        empty = pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "cluster": pa.array([], type=pa.int64()),
                "_d2": pa.array([], type=pa.int64()),
            }
        )
        mat = _milli_matrix(batch, vec_col)
        if mat is None:
            return empty
        assign = _assign(mat, cents)
        diff = mat - cents[assign]
        d2 = (diff * diff).sum(axis=1)
        ids = pc.cast(batch[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        # within-batch per-cluster top-n: one lexsort + stable segment head
        order = np.lexsort((ids, d2, assign))
        a_s, d_s, i_s = assign[order], d2[order], ids[order]
        seg_start = np.r_[True, a_s[1:] != a_s[:-1]]
        seg_id = np.cumsum(seg_start) - 1
        seg_first = np.flatnonzero(seg_start)
        rank_in_seg = np.arange(len(a_s)) - seg_first[seg_id]
        keep = rank_in_seg < per_cluster
        return pa.table(
            {
                id_col: pa.array(i_s[keep]),
                "cluster": pa.array(a_s[keep].astype(np.int64)),
                "_d2": pa.array(d_s[keep].astype(np.int64)),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        top = group.sort_values(["_d2", id_col]).head(per_cluster)
        top = top.reset_index(drop=True)
        return pd.DataFrame(
            {
                id_col: top[id_col].astype("int64"),
                "cluster": top["cluster"].astype("int64"),
                "rank": np.arange(1, len(top) + 1, dtype=np.int64),
            }
        )

    return (
        partials.groupby("cluster")
        .map_groups(merge, batch_format="pandas")
        .sort(["cluster", "rank"])
    )
