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


def test_kmeans_fit_local_equals_distributed(ray_session):
    """kmeans_fit_local is the oracle generator's centroid source — it must
    be bit-identical to the distributed fit for any batching (the integer
    algebra guarantees it; this pins the replica against drift)."""
    from logstash_filter_geoip_ray.stages.clustering import kmeans_fit_local

    ids, pts = _blobs(seed=7, n_per=50, k=4, dim=12)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in pts], type=pa.list_(pa.float64())
            ),
        }
    )
    local = kmeans_fit_local(tbl, k=4, iters=3)
    dist = kmeans_fit(_ds_of(ids, pts).repartition(5), k=4, iters=3)
    np.testing.assert_array_equal(local, dist)


def test_semdedup_clustered_pairs_and_keepers(ray_session):
    """SemDeDup scale path: (1) the cluster-partitioned pair set must equal
    the exact block-grid pair set FILTERED to within-cluster pairs — the
    restriction is the only approximation; (2) planted near-dup groups are
    tight, so every planted pair is within-cluster and the clustered keeper
    set equals the full exact keeper set; (3) the partition actually shrinks
    the work: sum of squared cluster sizes << n^2."""
    import pandas as pd
    import ray.data

    from logstash_filter_geoip_ray.stages.clustering import kmeans_assign
    from logstash_filter_geoip_ray.stages.dedup import (
        dup_clusters,
        embedding_dup_pairs,
        filter_non_keepers,
        semdedup_clustered_pairs,
    )

    rng = np.random.default_rng(23)
    dim, k = 16, 6
    base = rng.uniform(-2, 2, size=(k, dim))
    rows, planted_groups = [], []
    vid = 0
    for b in range(k):
        group = []
        for j in range(30):
            v = base[b] + 0.08 * rng.standard_normal(dim)
            if j < 3:  # 3 near-identical copies → a planted dup group
                v = base[b] + 0.001 * rng.standard_normal(dim)
                group.append(vid)
            rows.append((vid, v))
            vid += 1
        planted_groups.append(group)
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    pts = np.stack([r[1] for r in rows])
    ds = _ds_of(ids, pts).repartition(6)

    cent = kmeans_fit(ds, k=k, iters=4)
    tau = 0.999
    clustered_ds = semdedup_clustered_pairs(ds, cent, min_cosine=tau)
    grid_ds = embedding_dup_pairs(ds, min_cosine=tau, num_blocks=4)
    clustered = clustered_ds.to_pandas()
    grid = grid_ds.to_pandas()

    # (1) clustered == grid restricted to same-cluster pairs
    assign = kmeans_assign(ds, cent).to_pandas().set_index("vec_id")["cluster"]
    within = grid[
        grid.apply(lambda r: assign[r.a] == assign[r.b], axis=1)
    ].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        clustered.sort_values(["a", "b"]).reset_index(drop=True), within
    )

    # (2) planted groups are tight → all their pairs are within-cluster →
    # keepers equal the full exact path
    for g in planted_groups:
        gp = clustered[(clustered.a.isin(g)) & (clustered.b.isin(g))]
        assert len(gp) == 3  # all 3 pairs of the planted triple found
    def keepers(pairs):
        out = filter_non_keepers(ds, dup_clusters(pairs), id_col="vec_id")
        out = out.to_pandas() if hasattr(out, "to_pandas") else out
        return out["vec_id"].tolist()

    import ray.data as _rd

    keep_clustered = keepers(_rd.from_pandas(clustered))
    keep_exact = keepers(_rd.from_pandas(grid))
    assert sorted(keep_clustered) == sorted(keep_exact)

    # (3) cost shape: sum(cluster_size^2) << n^2
    sizes = assign.value_counts()
    n = len(ids)
    assert (sizes**2).sum() <= n * n / 3


def test_kmeans_sample_init_parity_and_quality(ray_session):
    """init='sample' (the 1-pass scale init): distributed == local replica
    bit-for-bit under any partitioning; blocked-vs-unblocked invariance
    holds (the hash sample is a pure function of the id); and the fitted
    clusters still recover well-separated blobs."""
    from logstash_filter_geoip_ray.stages.clustering import kmeans_fit_local

    ids, pts = _blobs(seed=19, n_per=80, k=3, dim=10)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in pts], type=pa.list_(pa.float64())
            ),
        }
    )
    local = kmeans_fit_local(tbl, k=3, iters=4, init="sample", sample_milli=500)
    for nparts in (1, 7):
        ds = _ds_of(ids, pts)
        if nparts > 1:
            ds = ds.repartition(nparts)
        dist = kmeans_fit(ds, k=3, iters=4, init="sample", sample_milli=500)
        np.testing.assert_array_equal(local, dist)

    out = kmeans_assign(_ds_of(ids, pts), local).to_pandas()
    blob_of_id = {int(ids[i]): i // 80 for i in range(len(ids))}
    by_blob = {}
    for _, r in out.iterrows():
        by_blob.setdefault(blob_of_id[int(r.vec_id)], set()).add(int(r.cluster))
    assert all(len(s) == 1 for s in by_blob.values())
    assert len({next(iter(s)) for s in by_blob.values()}) == 3

    # a sample too small for k raises loudly instead of degrading
    import pytest as _pytest

    with _pytest.raises(ValueError, match="hash sample"):
        kmeans_fit_local(tbl, k=100, iters=1, init="sample", sample_milli=10)
