"""Persisted IVF (inverted-file) ANN index — cell-partitioned parquet.

``stages/similarity.ivf_topk`` trains its coarse quantizer and re-assigns
every corpus vector on EVERY call: the full corpus still streams through the
cell mask per query batch. This store makes the inverted file real: vectors
persist as parquet PARTITIONED BY CELL, so a search reads only the probed
cells' directories — the scan itself shrinks by ~n_probe/n_clusters, which
is the entire point of IVF at 100 TB (directory-level pruning beats any
in-task masking; nothing else even touches the non-probed cells' bytes).

Layout:
  index_dir/_meta.json            — n_clusters, dim, cols, sample params
  index_dir/_centroids.parquet    — (cell int64, centroid list<double>)
                                    L2-normalized rows of the codebook
  index_dir/cell=N/<uuid>_*.parquet — (<id_col>, <vec_col>) per cell

The codebook is trained exactly like ``ivf_topk`` (deterministic
``vec_id % mod`` sample, bounded by ``train_target_rows``, seeded k-means),
so ``ivf_index_topk`` over an index built with the same parameters returns
the same rows as the recompute path — pinned by
``test_ivf_index_matches_recompute``. Meta publishes last: a crashed build
is never loadable. Same state-family as minhash_index.py / checkpoint.py.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Sequence

import numpy as np
import pyarrow as pa

INDEX_META = "_meta.json"
CENTROIDS = "_centroids.parquet"


def build_ivf_index(
    ds,
    index_dir: str,
    n_clusters: int = 16,
    train_target_rows: int = 65536,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """Train the codebook on the bounded deterministic sample, then one
    streaming pass assigns every vector to its nearest centroid and writes
    hive ``cell=N`` parquet. Clears any previous index at ``index_dir``."""
    import shutil

    import pyarrow.compute as pc
    import ray

    from ..stages.similarity import _kmeans, _normalized, list_column_to_matrix

    shutil.rmtree(index_dir, ignore_errors=True)
    os.makedirs(index_dir, exist_ok=True)

    n_total = ds.count()
    mod = max(1, -(-n_total // train_target_rows))

    def sample_batch(b: pa.Table) -> pa.Table:
        ids64 = pc.cast(b[id_col], pa.int64())
        m = pc.subtract(ids64, pc.multiply(pc.divide(ids64, mod), mod))
        return b.filter(pc.equal(m, 0)).select([id_col, vec_col])

    sample = ds.map_batches(sample_batch, batch_format="pyarrow").to_pandas()
    # id-sorted sample: Ray Data block order is nondeterministic and k-means
    # init is row-order-sensitive (same fix as ivf_topk) — required for the
    # index path ≡ recompute path equality this module promises
    sample = sample.sort_values(id_col)
    train = _normalized(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
    centroids = _kmeans(train, n_clusters)
    cents_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(cents_ref)
        mat = list_column_to_matrix(batch[vec_col])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        cells = np.argmax((mat / norms[:, None]) @ cents.T, axis=1)
        return batch.select([id_col, vec_col]).append_column(
            "cell", pa.array(cells.astype(np.int64))
        )

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["cell"]
    )

    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "cell": pa.array(range(len(centroids)), type=pa.int64()),
                "centroid": pa.array([list(map(float, c)) for c in centroids],
                                     type=pa.list_(pa.float64())),
            }
        ),
        os.path.join(index_dir, CENTROIDS),
    )
    meta = {
        "n_clusters": int(n_clusters),
        "dim": int(centroids.shape[1]),
        "vec_col": vec_col,
        "id_col": id_col,
        "train_target_rows": int(train_target_rows),
        "version": 1,
    }
    tmp = os.path.join(index_dir, INDEX_META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, INDEX_META))
    return index_dir


def append_ivf_index(ds, index_dir: str) -> str:
    """Append a new dump's vectors: assign with the EXISTING codebook (the
    codebook is the index's identity — retraining would silently shift every
    cell boundary) and write more ``cell=N`` files. Column names and the
    vector dimension come from the meta; a dimension mismatch fails inside
    the assign kernel loudly (matmul shape error) rather than corrupting
    cells."""
    import pyarrow.parquet as pq
    import ray

    from ..stages.similarity import list_column_to_matrix

    meta = _load_meta(index_dir)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    cent_tbl = pq.read_table(os.path.join(index_dir, CENTROIDS))
    order = np.argsort(cent_tbl["cell"].to_numpy())
    centroids = np.stack(
        [np.asarray(v, dtype=np.float64) for v in cent_tbl["centroid"].to_pylist()]
    )[order]
    cents_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(cents_ref)
        mat = list_column_to_matrix(batch[vec_col])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        cells = np.argmax((mat / norms[:, None]) @ cents.T, axis=1)
        return batch.select([id_col, vec_col]).append_column(
            "cell", pa.array(cells.astype(np.int64))
        )

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["cell"]
    )
    return index_dir


def _load_meta(index_dir: str) -> dict:
    path = os.path.join(index_dir, INDEX_META)
    if not os.path.exists(path):
        raise FileNotFoundError(
            "ann_index: %r has no %s — build_ivf_index first" % (index_dir, INDEX_META)
        )
    with open(path) as f:
        return json.load(f)


def _nearest_nonempty_files(index_dir: str, qcent: np.ndarray, n_probe: int):
    """Fallback probe set when every nearest-cell directory is empty: the
    union of each query's ``n_probe`` nearest cells AMONG the cells that
    actually hold vectors.  Deterministic (same argsort tie rule as the
    primary probe).  Raises only when the index has no populated cell at
    all — the corrupt/absent-index case."""
    avail = []
    for d in glob.glob(os.path.join(index_dir, "cell=*")):
        if glob.glob(os.path.join(d, "*.parquet")):
            avail.append(int(os.path.basename(d).split("=", 1)[1]))
    if not avail:
        raise FileNotFoundError(
            "ann_index: no populated cell partitions under %r" % index_dir
        )
    avail = np.array(sorted(avail))
    order = np.argsort(-qcent[:, avail], axis=1)[:, :n_probe]
    accept = sorted({int(avail[c]) for row in order for c in row})
    files = []
    for c in accept:
        files.extend(
            sorted(glob.glob(os.path.join(index_dir, "cell=%d" % c, "*.parquet")))
        )
    return files


def ivf_index_topk(
    index_dir: str,
    query_ids: Sequence[int],
    k: int = 10,
    n_probe: int = 4,
):
    """Approximate cosine top-k against the PERSISTED index: load the
    codebook (tiny), fetch the query vectors from their own cells (query
    ids are corpus ids, and a query's vector lives in its nearest cell —
    but ids are not invertible to cells, so queries fetch via one pruned
    id-scan over the index), pick each query's ``n_probe`` nearest cells
    and read ONLY those ``cell=N`` directories. Output schema matches
    ``brute_force_topk``; equality with the recompute-path ``ivf_topk``
    under identical parameters is pinned in tests."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data

    from ..stages.similarity import (
        _batch_matrix,
        _empty_partial,
        _finalize,
        _normalized,
        _select_topk,
    )

    meta = _load_meta(index_dir)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    cent_tbl = pq.read_table(os.path.join(index_dir, CENTROIDS))
    order_idx = np.argsort(cent_tbl["cell"].to_numpy())
    centroids = np.stack(
        [np.asarray(v, dtype=np.float64) for v in cent_tbl["centroid"].to_pylist()]
    )[order_idx]

    all_files = sorted(glob.glob(os.path.join(index_dir, "cell=*", "*.parquet")))
    if not all_files:
        raise FileNotFoundError("ann_index: no cell partitions under %r" % index_dir)

    # query vectors: one column-pruned scan of the index (ids + vectors),
    # filtered vectorized — the only full-index pass, and it reads no more
    # than a normal corpus query fetch would
    qset = list(query_ids)
    qarr = pa.array(qset, type=pa.int64())
    qtbl = (
        ray.data.read_parquet(all_files, columns=[id_col, vec_col])
        .map_batches(
            lambda b: b.filter(
                pc.is_in(pc.cast(b[id_col], pa.int64()), value_set=qarr)
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    qtbl = qtbl.set_index(id_col).loc[qset]
    qmat = _normalized(np.stack(qtbl[vec_col].to_numpy()).astype(np.float64))
    qids = np.asarray(qset)

    order = np.argsort(-(qmat @ centroids.T), axis=1)[:, :n_probe]
    accept = sorted({int(c) for row in order for c in row})

    # THE index win: only the probed cells' files are read at all
    probe_files = []
    for c in accept:
        probe_files.extend(
            sorted(glob.glob(os.path.join(index_dir, "cell=%d" % c, "*.parquet")))
        )
    if not probe_files:
        # all probed cells empty (skewed corpus, small cells): extend to the
        # nearest non-empty cells — same rule as ivfpq_index_topk
        probe_files = _nearest_nonempty_files(
            index_dir, qmat @ centroids.T, n_probe
        )
    ref = ray.put((qids, qmat))

    def partial_topk(batch: pa.Table) -> pa.Table:
        ref_ids, ref_mat = ray.get(ref)
        bids, bmat = _batch_matrix(batch, id_col, vec_col)
        if bids is None:
            return _empty_partial()
        return _select_topk(ref_ids, ref_mat @ bmat.T, bids, k)

    partials = ray.data.read_parquet(
        probe_files, columns=[id_col, vec_col]
    ).map_batches(partial_topk, batch_format="pyarrow")
    return _finalize(partials, k)


# -- IVF-PQ: cell-partitioned COMPRESSED index (Jégou et al. 2011) -----------

PQ_CODEBOOKS = "_pq_codebooks.parquet"


def build_ivfpq_index(
    ds,
    index_dir: str,
    n_clusters: int = 16,
    n_subspaces: int = 8,
    n_codes: int = 16,
    train_target_rows: int = 65536,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """IVF-PQ: the coarse quantizer partitions vectors into ``cell=N``
    directories (directory-level pruning, as build_ivf_index) but each cell
    stores only ``(id, cell_id, codes uint8[n_subspaces])`` — the RESIDUAL
    ``x − centroid(x)`` product-quantized against one shared residual
    codebook (trained on the same deterministic bounded sample).  At the
    defaults a 64-dim float64 corpus stores 8 bytes + ids per vector: the
    probed-cell read shrinks ~64×, which at 100 TB is the difference
    between an index that fits per-node RAM and one that doesn't.
    Meta publishes last; a crashed build is never loadable."""
    import shutil

    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    from ..stages.similarity import (
        _kmeans,
        _kmeans_l2,
        _normalized,
        _pq_codes,
        list_column_to_matrix,
    )

    shutil.rmtree(index_dir, ignore_errors=True)
    os.makedirs(index_dir, exist_ok=True)

    n_total = ds.count()
    mod = max(1, -(-n_total // train_target_rows))

    def sample_batch(b: pa.Table) -> pa.Table:
        ids64 = pc.cast(b[id_col], pa.int64())
        m = pc.subtract(ids64, pc.multiply(pc.divide(ids64, mod), mod))
        return b.filter(pc.equal(m, 0)).select([id_col, vec_col])

    sample = ds.map_batches(sample_batch, batch_format="pyarrow").to_pandas()
    sample = sample.sort_values(id_col)  # block-order independence
    train = _normalized(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
    centroids = _kmeans(train, n_clusters)
    dim = train.shape[1]
    if dim % n_subspaces:
        raise ValueError(
            "build_ivfpq_index: dim %d not divisible by n_subspaces %d"
            % (dim, n_subspaces)
        )
    # shared residual codebook: sub-kmeans over the sample's residuals
    res = train - centroids[np.argmax(train @ centroids.T, axis=1)]
    sub = dim // n_subspaces
    codebooks = np.stack(
        [
            _kmeans_l2(res[:, s * sub : (s + 1) * sub], n_codes, seed=13 + s)
            for s in range(n_subspaces)
        ]
    )
    cents_ref = ray.put((centroids, codebooks))

    def assign_encode(batch: pa.Table) -> pa.Table:
        cents, cb = ray.get(cents_ref)
        mat = list_column_to_matrix(batch[vec_col])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        cells = np.argmax(unit @ cents.T, axis=1)
        codes = _pq_codes(unit - cents[cells], cb)
        m = cb.shape[0]
        flat = pa.array(codes.reshape(-1), type=pa.uint8())
        return pa.table(
            {
                id_col: pc.cast(batch[id_col], pa.int64()),
                # cell appears TWICE: as the hive partition key (directory
                # pruning) and as a data column (the search kernel needs the
                # per-row cell for the q·centroid base term — Ray's hive
                # write drops partition keys from the file bytes)
                "cell": pa.array(cells.astype(np.int64)),
                "cell_id": pa.array(cells.astype(np.int64)),
                "codes": pa.FixedSizeListArray.from_arrays(flat, m),
            }
        )

    ds.map_batches(assign_encode, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["cell"]
    )

    pq.write_table(
        pa.table(
            {
                "cell": pa.array(range(len(centroids)), type=pa.int64()),
                "centroid": pa.array(
                    [list(map(float, c)) for c in centroids],
                    type=pa.list_(pa.float64()),
                ),
            }
        ),
        os.path.join(index_dir, CENTROIDS),
    )
    cb_rows = []
    for s in range(n_subspaces):
        for j in range(len(codebooks[s])):
            cb_rows.append((s, j, list(map(float, codebooks[s, j]))))
    pq.write_table(
        pa.table(
            {
                "subspace": pa.array([r[0] for r in cb_rows], type=pa.int64()),
                "code": pa.array([r[1] for r in cb_rows], type=pa.int64()),
                "vec": pa.array([r[2] for r in cb_rows], type=pa.list_(pa.float64())),
            }
        ),
        os.path.join(index_dir, PQ_CODEBOOKS),
    )
    meta = {
        "n_clusters": int(n_clusters),
        "n_subspaces": int(n_subspaces),
        "n_codes": int(n_codes),
        "dim": int(dim),
        "vec_col": vec_col,
        "id_col": id_col,
        "train_target_rows": int(train_target_rows),
        "kind": "ivfpq",
        "version": 1,
    }
    tmp = os.path.join(index_dir, INDEX_META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, INDEX_META))
    return index_dir


def _load_ivfpq(index_dir: str):
    import pyarrow.parquet as pq

    meta = _load_meta(index_dir)
    if meta.get("kind") != "ivfpq":
        raise ValueError(
            "ann_index: %r is not an IVF-PQ index (kind=%r)"
            % (index_dir, meta.get("kind"))
        )
    cent_tbl = pq.read_table(os.path.join(index_dir, CENTROIDS))
    order = np.argsort(cent_tbl["cell"].to_numpy())
    centroids = np.stack(
        [np.asarray(v, dtype=np.float64) for v in cent_tbl["centroid"].to_pylist()]
    )[order]
    cb_tbl = pq.read_table(os.path.join(index_dir, PQ_CODEBOOKS)).to_pandas()
    m = int(cb_tbl.subspace.max()) + 1
    n_codes = int(cb_tbl.code.max()) + 1
    sub = meta["dim"] // m
    codebooks = np.zeros((m, n_codes, sub))
    for r in cb_tbl.itertuples():
        codebooks[r.subspace, r.code] = np.asarray(r.vec)
    return meta, centroids, codebooks


def ivfpq_index_topk(
    index_dir: str,
    queries_ds,
    query_ids: Sequence[int],
    k: int = 10,
    n_probe: int = 4,
):
    """Compressed-domain search against the persisted IVF-PQ index: query
    vectors come EXACT from ``queries_ds`` (the index holds only codes);
    only the ``n_probe`` nearest cells' directories are read (id + 1-byte-
    per-subspace codes — never raw vectors); each row scores as
    ``q·centroid(cell) + Σ_s T[s, code]`` over the residual lookup tables.
    Output schema matches ``brute_force_topk``."""
    import ray
    import ray.data

    from ..stages.similarity import (
        _collect_queries,
        _empty_partial,
        _finalize,
        _select_topk,
    )

    meta, centroids, codebooks = _load_ivfpq(index_dir)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    m, n_codes, sub = codebooks.shape
    qids, qmat = _collect_queries(queries_ds, query_ids, id_col, vec_col)

    # residual ADC tables: T[q, s, j] = q_sub(s) · codebook[s, j]
    tables = np.einsum("qsd,sjd->qsj", qmat.reshape(len(qmat), m, sub), codebooks)
    qcent = qmat @ centroids.T  # (n_q, n_clusters) base terms

    order = np.argsort(-qcent, axis=1)[:, :n_probe]
    accept = sorted({int(c) for row in order for c in row})
    probe_files = []
    for c in accept:
        probe_files.extend(
            sorted(glob.glob(os.path.join(index_dir, "cell=%d" % c, "*.parquet")))
        )
    if not probe_files:
        # every probed cell is an EMPTY partition — a legal state for a
        # skewed corpus with small cells (round-5 advice item).  Extend
        # probing to the nearest NON-EMPTY cells instead of erroring;
        # FileNotFoundError is reserved for "the index has no cells at all".
        probe_files = _nearest_nonempty_files(index_dir, qcent, n_probe)
    ref = ray.put((qids, tables, qcent))

    def partial_topk(batch: pa.Table) -> pa.Table:
        ref_ids, tabs, qc = ray.get(ref)
        if not batch.num_rows:
            return _empty_partial()
        bids = batch[id_col].to_numpy(zero_copy_only=False)
        cells = batch["cell_id"].to_numpy(zero_copy_only=False)
        codes = np.stack(batch["codes"].to_numpy(zero_copy_only=False)).astype(
            np.int64
        )
        sims = qc[:, cells].astype(np.float64)
        for s in range(tabs.shape[1]):
            sims += tabs[:, s, :][:, codes[:, s]]
        return _select_topk(ref_ids, sims, bids, k)

    partials = ray.data.read_parquet(
        probe_files, columns=[id_col, "cell_id", "codes"]
    ).map_batches(partial_topk, batch_format="pyarrow")
    return _finalize(partials, k)
