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
