"""Iterative graph algorithms as join-based Dataset rounds.

PageRank is the canonical iterative fan-in/fan-out workload a
training-data engine needs (domain-authority weighting for crawl
curation, e.g. Common-Crawl harmonic/PageRank centrality lists used to
prioritize fetch frontiers). The reference plugin has no iterative
operator; this follows the classic synchronous power-iteration
formulation (Page et al. 1999) expressed as one partitioned hash-join +
one grouped sum per round — the same shuffle discipline as
``stages.dedup.label_propagation_clusters``.

Determinism contract: all arithmetic is int64 with truncating division
(ranks carried in 1e-12 units of probability mass), so the result is
bit-identical across batchings, machines, and a SQL oracle — float
PageRank would hash-diverge on summation order. Convergence behaviour is
the same as the float algorithm up to the 1e-12 quantization.
"""

from __future__ import annotations

import pyarrow as pa

#: total probability mass carried as integer units (1e-12 resolution)
PAGERANK_SCALE = 10**12
#: damping factor 0.85 as an exact rational
PAGERANK_DAMP_NUM = 85
PAGERANK_DAMP_DEN = 100


def pagerank(
    edges_ds,
    iterations: int = 5,
    num_buckets: int = 32,
    scale: int = PAGERANK_SCALE,
):
    """Integer-exact PageRank over a directed edge list ``(src, dst)``.

    Semantics (mirrored exactly by the unrolled-SQL oracle in
    ``pipelines.data_ops``): with ``N`` = number of distinct source
    nodes, ``base = scale // N``, ``tele = (15 * base) // 100``::

        pr0[v]   = base
        pr_i[v]  = tele + (85 * Σ_{(u,v)∈E} (pr_{i-1}[u] // deg[u])) // 100

    Every node must have out-degree ≥ 1 (no dangling mass term):
    symmetrize the edge list or add self-loops first — the query builder
    does the former. Nodes therefore all appear as both src and dst and
    the per-round recurrence is a pure edge aggregation, no outer join.

    Scale shape: the rank table is a Dataset keyed by node (never a
    broadcast — node count is unbounded for web graphs); each round is
    ONE bucket-co-partitioned ``hash_join`` of the edge list against the
    rank table on ``src`` plus one grouped int64 sum on ``dst``. The
    edge list pre-joins each edge's destination degree once, so the new
    rank rows come out of the aggregation carrying the degree they need
    for the next round — 2 shuffles per round total, lineage severed
    between rounds (see ``label_propagation_clusters`` for why plain
    ``materialize()`` is not enough).

    Returns rows ``(node, pr)`` sorted by node, ``pr`` in units of
    ``1/scale``.
    """
    import numpy as np
    import ray.data
    from ray.data.aggregate import Sum

    from .joins import hash_join

    def bundle(ds):
        # every exchange fragments the stream into per-bucket / per-key
        # micro-blocks (measured on the sf0.01 graph: 64+ blocks of ~1.5k
        # rows → per-task overhead dominated a round 10×); re-bundle into
        # ~1M-row blocks. num_cpus marker blocks fusion from dragging the
        # big batch_size upstream (see aggregate.tree_sum).
        return ds.map_batches(
            lambda b: b, batch_format="pyarrow", batch_size=1 << 20, num_cpus=0.9
        )

    def checkpoint(ds):
        return ray.data.from_arrow_refs(bundle(ds).to_arrow_refs())

    def norm(batch: pa.Table, cols) -> pa.Table:
        arrays = []
        for c in cols:
            a = batch[c]
            if isinstance(a, pa.ChunkedArray):
                a = a.combine_chunks()
            arrays.append(a.cast(pa.int64()))
        return pa.Table.from_arrays(arrays, names=list(cols))

    edges = checkpoint(
        edges_ds.map_batches(
            lambda b: norm(b, ["src", "dst"]), batch_format="pyarrow"
        )
    )

    # out-degree per node (symmetrized graph ⇒ same node set as dst side)
    deg = checkpoint(
        edges.groupby("src")
        .count()
        .map_batches(
            lambda b: pa.table(
                {
                    "node": b["src"].cast(pa.int64()),
                    "deg": b["count()"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    n_nodes = deg.count()
    if n_nodes == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], type=pa.int64()),
                    "pr": pa.array([], type=pa.int64()),
                }
            )
        )
    base = scale // n_nodes
    tele = (PAGERANK_DAMP_DEN - PAGERANK_DAMP_NUM) * base // PAGERANK_DAMP_DEN

    # each edge carries its DESTINATION's degree so the grouped sum emits
    # rank rows already holding the degree needed by the next round
    deg_renamed = deg.map_batches(
        lambda b: b.rename_columns(["dst_node", "dst_deg"]),
        batch_format="pyarrow",
    )
    edges_dd = checkpoint(
        hash_join(edges, deg_renamed, "dst", "dst_node", num_buckets=num_buckets)
        .map_batches(
            lambda b: norm(b, ["src", "dst", "dst_deg"]), batch_format="pyarrow"
        )
    )

    ranks = checkpoint(
        deg.map_batches(
            lambda b: b.append_column(
                "pr", pa.array(np.full(b.num_rows, base, dtype=np.int64))
            ),
            batch_format="pyarrow",
        )
    )

    def contrib(batch: pa.Table) -> pa.Table:
        pr = batch["pr"].to_numpy(zero_copy_only=False)
        d = batch["deg"].to_numpy(zero_copy_only=False)
        out = norm(batch, ["dst", "dst_deg"])
        return out.append_column("c", pa.array(pr // d))

    def finish(batch: pa.Table) -> pa.Table:
        s = batch["sum(c)"].to_numpy(zero_copy_only=False).astype(np.int64)
        pr = tele + (PAGERANK_DAMP_NUM * s) // PAGERANK_DAMP_DEN
        return pa.table(
            {
                "node": batch["dst"].cast(pa.int64()),
                "deg": batch["dst_deg"].cast(pa.int64()),
                "pr": pa.array(pr),
            }
        )

    for _ in range(iterations):
        joined = hash_join(edges_dd, ranks, "src", "node", num_buckets=num_buckets)
        ranks = checkpoint(
            joined.map_batches(contrib, batch_format="pyarrow")
            .groupby(["dst", "dst_deg"])
            .aggregate(Sum("c"))
            .map_batches(finish, batch_format="pyarrow")
        )

    return ranks.select_columns(["node", "pr"]).sort("node")
