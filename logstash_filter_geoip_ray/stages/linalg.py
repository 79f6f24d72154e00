"""Distributed linear algebra over embedding columns (one-pass Gram / PCA).

The classic single-pass distributed PCA shape (the public Spark MLlib
``RowMatrix.computeGramianMatrix`` API contract, re-expressed Ray-Data-first):
each ``map_batches`` task reduces its (n × d) slice to a d × d partial Gram
with one BLAS matmul, the partials tree-combine, and only O(d²) numbers ever
cross the exchange — the corpus itself never shuffles. Eigendecomposition of
the resulting d × d covariance happens on the driver (d ≤ a few hundred for
embedding columns; the matrix is provably tiny regardless of row count).

All accumulation is EXACT INTEGER over quantized values
(``q = floor(v · 1000)``, the repo-wide milli convention): float summation
order would differ between engines and break the oracle hash, integer sums
cannot. Overflow headroom: for unit-norm embeddings each Gram entry grows as
``rows · E[q_i q_j] ≈ rows · 10⁶/d``; with d = 64 an int64 entry saturates
only past ~5·10¹⁴ rows — two orders of magnitude above the 10¹²-row target
(documented bound, checked nowhere at runtime by design: the partial is a
numpy matmul and a guard per batch would cost more than the kernel).

No counterpart in the reference (logstash-filter-geoip has no numeric
operators); this belongs to the training-data suite the brief mandates.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

#: repo-wide exact-integer quantization step (milli units)
QUANT = 1000

#: sentinel row markers inside the combined moment triplet stream:
#: (i, -1) rows carry the per-dimension quantized sum vector, (-1, -1) the
#: row count — one exchange serves Gram, mean and count together
_SUM_J = -1
_COUNT_I = -1


def batch_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    """(n × d) float64 view of a ``list<float>`` column — one ``flatten`` +
    reshape, no per-row Python. Raises on null embeddings (a null vector has
    no dimensionality; upstream must filter or impute)."""
    col = batch[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if col.null_count:
        raise ValueError(
            "batch_matrix: %d null embeddings in %r — filter or impute "
            "before the linear-algebra stage" % (col.null_count, vec_col)
        )
    if n == 0:
        return np.zeros((0, 0), dtype=np.float64)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    if flat.size % n:
        raise ValueError("batch_matrix: ragged embedding lengths")
    return flat.reshape(n, flat.size // n)


def _triplet_table(i: np.ndarray, j: np.ndarray, g: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "i": pa.array(i, type=pa.int64()),
            "j": pa.array(j, type=pa.int64()),
            "g": pa.array(g, type=pa.int64()),
        }
    )


def gram_triplets(ds, vec_col: str = "embedding", quant: int = QUANT,
                  with_moments: bool = False):
    """Exact-integer Gram matrix of a ``list<float>`` column as a
    (i, j, g) Dataset, ``g = Σ_rows q_i · q_j`` with ``q = floor(v·quant)``.

    One matmul per batch → d² int64 partials per block → ``tree_sum``; the
    all-to-all carries d² rows per block and nothing else. With
    ``with_moments=True`` the same exchange additionally carries the
    quantized column sums as ``(i, -1)`` rows and the row count as
    ``(-1, -1)`` — covariance needs all three and this keeps it one pass.
    """
    from .aggregate import tree_sum

    def partial(batch: pa.Table) -> pa.Table:
        m = batch_matrix(batch, vec_col)
        n, d = m.shape
        if n == 0:
            z = np.zeros(0, dtype=np.int64)
            return _triplet_table(z, z, z)
        # quantized values as float64: the matmul then runs through BLAS
        # dgemm (~100× the throughput of numpy's non-BLAS integer matmul)
        # and stays EXACT — every product is an integer ≤ quant² and every
        # per-batch partial sum an integer < n_batch · quant², far below
        # 2⁵³ where float64 integer arithmetic is lossless (n_batch would
        # need to exceed 9·10⁹ rows to break it; blocks are ≤ ~10⁵)
        q = np.floor(m * quant)
        gram = (q.T @ q).astype(np.int64)
        i = np.repeat(np.arange(d, dtype=np.int64), d)
        j = np.tile(np.arange(d, dtype=np.int64), d)
        v = gram.reshape(-1)
        if with_moments:
            dim = np.arange(d, dtype=np.int64)
            i = np.concatenate([i, dim, [_COUNT_I]])
            j = np.concatenate([j, np.full(d, _SUM_J, np.int64), [_SUM_J]])
            v = np.concatenate(
                [v, q.sum(axis=0).astype(np.int64), [n]]
            )
        return _triplet_table(i, j, v)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return tree_sum(partials, ["i", "j"], ["g"])


def covariance_eig(
    ds,
    vec_col: str = "embedding",
    quant: int = QUANT,
    top: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """PCA of an embedding column: (eigenvalues desc, eigenvectors by column,
    n_rows) of the sample covariance ``(G − s sᵀ/n) / ((n−1) · quant²)``.

    G, s, n arrive through the single :func:`gram_triplets` exchange; the
    driver materializes exactly d² + d + 1 integers (bounded by the embedding
    width, never by the row count) and runs one ``numpy.linalg.eigh``.
    """
    t = gram_triplets(ds, vec_col, quant, with_moments=True).to_pandas()
    count_rows = t[t["i"] == _COUNT_I]
    n = int(count_rows["g"].iloc[0])
    if n < 2:
        raise ValueError("covariance_eig: need ≥ 2 rows, got %d" % n)
    sums = t[(t["j"] == _SUM_J) & (t["i"] >= 0)].sort_values("i")
    s = sums["g"].to_numpy(dtype=np.float64)
    d = s.size
    gm = t[t["j"] >= 0]
    gram = np.zeros((d, d), dtype=np.float64)
    gram[gm["i"].to_numpy(), gm["j"].to_numpy()] = gm["g"].to_numpy(
        dtype=np.float64
    )
    cov = (gram - np.outer(s, s) / n) / ((n - 1) * float(quant) ** 2)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    if top is not None:
        evals, evecs = evals[:top], evecs[:, :top]
    return evals, evecs, n


def pca_project(ds, components: np.ndarray, vec_col: str = "embedding",
                out_col: str = "pc", id_cols: Optional[list] = None):
    """Project every embedding onto the given (d × k) component matrix —
    broadcast-side matmul per batch, embarrassingly parallel, output keeps
    ``id_cols`` plus a ``list<double>`` of k scores. The components travel
    via closure capture (Ray ships them once per task spec, ~d·k floats)."""
    comp = np.ascontiguousarray(components, dtype=np.float64)

    def project(batch: pa.Table) -> pa.Table:
        m = batch_matrix(batch, vec_col)
        keep = batch.select(id_cols) if id_cols else batch.drop_columns(
            [vec_col]
        )
        scores = m @ comp if m.size else np.zeros((0, comp.shape[1]))
        return keep.append_column(
            out_col,
            pa.array(list(scores), type=pa.list_(pa.float64())),
        )

    return ds.map_batches(project, batch_format="pyarrow")
