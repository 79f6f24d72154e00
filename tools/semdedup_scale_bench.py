"""SemDeDup scale-path benchmark: cluster-partitioned within-cluster pairs
vs the exact block-grid self-join, on a deterministic blob corpus.

Shows the verdict-item-#3 cost shape: work ∝ Σ cluster_size² ≪ n², while the
planted near-dup groups (tight blobs) are still fully recovered by both
paths.

    python tools/semdedup_scale_bench.py --n 100000 --k 64

Owns its own Ray session (scripts may; library code must not).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--grid", action="store_true",
                    help="also run the exact block-grid path for comparison")
    ap.add_argument("--init", default="farthest",
                    help="kmeans init: farthest (k-1 passes) or sample (1 pass)")
    args = ap.parse_args()

    import pyarrow as pa
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from logstash_filter_geoip_ray.stages.clustering import kmeans_assign, kmeans_fit
    from logstash_filter_geoip_ray.stages.dedup import (
        embedding_dup_pairs,
        semdedup_clustered_pairs,
    )

    rng = np.random.default_rng(5)
    n_blobs = 256
    centers = rng.uniform(-2, 2, size=(n_blobs, args.dim))
    blob = rng.integers(0, n_blobs, size=args.n)
    pts = centers[blob] + 0.15 * rng.standard_normal((args.n, args.dim))
    dup_mask = rng.random(args.n) < 0.01  # 1% near-identical planted dups
    partner = rng.integers(0, args.n, size=args.n)
    pts[dup_mask] = pts[partner[dup_mask]] + 1e-4

    tbl = pa.table({
        "vec_id": pa.array(np.arange(args.n), type=pa.int64()),
        "embedding": pa.array(pts.tolist(), type=pa.list_(pa.float64())),
    })
    ds = ray.data.from_arrow(tbl).repartition(64).materialize()

    t0 = time.perf_counter()
    cent = kmeans_fit(ds, k=args.k, iters=3, init=args.init)
    fit_s = time.perf_counter() - t0

    assign = kmeans_assign(ds, cent).to_pandas()["cluster"].value_counts()
    sum_sq = int((assign.astype(np.int64) ** 2).sum())

    t0 = time.perf_counter()
    clustered = semdedup_clustered_pairs(ds, cent, min_cosine=0.999)
    n_clustered = clustered.count()
    clus_s = time.perf_counter() - t0

    out = {
        "n": args.n, "dim": args.dim, "k": args.k, "init": args.init,
        "num_cpus": args.cpus,
        "fit_sec": round(fit_s, 2), "clustered_pairs_sec": round(clus_s, 2),
        "clustered_pairs": int(n_clustered),
        "sum_cluster_sq": sum_sq, "n_sq": args.n * args.n,
        "work_fraction": round(sum_sq / (args.n * args.n), 4),
    }
    if args.grid:
        t0 = time.perf_counter()
        grid = embedding_dup_pairs(ds, min_cosine=0.999, num_blocks=16)
        out["grid_pairs"] = int(grid.count())
        out["grid_pairs_sec"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
