"""Distributed integer-milli KMeans (stages/clustering.py)."""

import numpy as np
import pyarrow as pa

from logstash_filter_geoip_ray.stages.clustering import (
    KMEANS_MILLI,
    kmeans_assign,
    kmeans_fit,
)


def _numpy_kmeans_int(ids, mat_f, k, iters):
    """Single-process reference of the exact integer spec: milli
    quantization, c·c − 2 v·c argmin (lowest index on ties), sum // count
    centroid update, deterministic farthest-point init (seed 1 = vector of
    the smallest id; next = max distance to nearest seed, tie → min id)."""
    mat = np.floor(mat_f * KMEANS_MILLI).astype(np.int64)
    seeds = [mat[np.argmin(ids)].copy()]
    for _ in range(k - 1):
        cents = np.stack(seeds)
        vv = np.sum(mat * mat, axis=1)
        cc = np.sum(cents * cents, axis=1)
        d2 = np.min(vv[:, None] - 2 * (mat @ cents.T) + cc[None, :], axis=1)
        best = np.lexsort((ids, -d2))[0]
        seeds.append(mat[best].copy())
    centroids = np.stack(seeds)
    for _ in range(iters):
        cc = np.sum(centroids * centroids, axis=1)
        assign = np.argmin(cc[None, :] - 2 * (mat @ centroids.T), axis=1)
        new = centroids.copy()
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                new[c] = members.sum(axis=0, dtype=np.int64) // len(members)
        centroids = new
    cc = np.sum(centroids * centroids, axis=1)
    assign = np.argmin(cc[None, :] - 2 * (mat @ centroids.T), axis=1)
    return centroids, assign


def _blobs(seed=3, n_per=40, k=3, dim=8):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-2, 2, size=(k, dim))
    pts = np.concatenate(
        [c + 0.05 * rng.standard_normal((n_per, dim)) for c in centers]
    )
    ids = rng.permutation(len(pts)).astype(np.int64)  # ids not in blob order
    return ids, pts


def _ds_of(ids, pts):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "embedding": pa.array(
                    [row.tolist() for row in pts], type=pa.list_(pa.float64())
                ),
            }
        )
    )


def test_kmeans_matches_numpy_reference_and_batching_invariant(ray_session):
    ids, pts = _blobs()
    want_cent, want_assign = _numpy_kmeans_int(ids, pts, k=3, iters=4)

    for nparts in (1, 7):
        ds = _ds_of(ids, pts)
        if nparts > 1:
            ds = ds.repartition(nparts)
        cent = kmeans_fit(ds, k=3, iters=4)
        assert cent.dtype == np.int64
        np.testing.assert_array_equal(cent, want_cent)
        out = kmeans_assign(ds, cent).to_pandas()
        got = dict(zip(out["vec_id"], out["cluster"]))
        want = dict(zip(ids.tolist(), want_assign.tolist()))
        assert got == want


def test_kmeans_recovers_planted_blobs(ray_session):
    """Well-separated blobs must land in internally-consistent clusters."""
    ids, pts = _blobs(seed=11)
    ds = _ds_of(ids, pts)
    cent = kmeans_fit(ds, k=3, iters=5)
    out = kmeans_assign(ds, cent).to_pandas().set_index("vec_id")["cluster"]
    # blob membership by construction: point i (pre-permutation row order)
    # belongs to blob i // 40; ids were permuted, so map back through ids
    blob_of_id = {int(ids[i]): i // 40 for i in range(len(ids))}
    by_blob = {}
    for vid, cl in out.items():
        by_blob.setdefault(blob_of_id[int(vid)], set()).add(int(cl))
    # each blob maps to exactly one cluster, and distinct blobs to distinct
    assert all(len(s) == 1 for s in by_blob.values())
    assert len({next(iter(s)) for s in by_blob.values()}) == 3
