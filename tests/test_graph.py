"""Iterative graph operator: integer-exact PageRank (stages/graph.py)."""

import numpy as np
import pyarrow as pa
import pytest

from logstash_filter_geoip_ray.stages.graph import (
    PAGERANK_SCALE,
    pagerank,
)


def _numpy_pagerank_int(edges, iters, scale=PAGERANK_SCALE):
    """Dense reference of the exact integer recurrence (same semantics as
    stages.graph.pagerank and the unrolled-SQL oracle)."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n, dtype=np.int64)
    for u, _ in edges:
        deg[idx[u]] += 1
    base = scale // n
    tele = (15 * base) // 100
    pr = np.full(n, base, dtype=np.int64)
    for _ in range(iters):
        s = np.zeros(n, dtype=np.int64)
        for u, v in edges:
            s[idx[v]] += pr[idx[u]] // deg[idx[u]]
        pr = tele + (85 * s) // 100
    return {nodes[i]: int(pr[i]) for i in range(n)}


def _sym(pairs):
    out = []
    for a, b in pairs:
        out.append((a, b))
        out.append((b, a))
    return out


@pytest.mark.parametrize(
    "pairs,iters",
    [
        # star: hub 0 touching 1..5, plus a chain hanging off 5
        ([(0, i) for i in range(1, 6)] + [(5, 6), (6, 7)], 5),
        # two triangles bridged by one edge (community structure)
        ([(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)], 4),
        # single edge
        ([(1, 2)], 3),
    ],
)
def test_pagerank_matches_dense_integer_reference(ray_session, pairs, iters):
    import ray.data

    edges = _sym(pairs)
    tbl = pa.table(
        {
            "src": pa.array([u for u, _ in edges], type=pa.int64()),
            "dst": pa.array([v for _, v in edges], type=pa.int64()),
        }
    )
    got = pagerank(ray.data.from_arrow(tbl), iterations=iters, num_buckets=4).to_pandas()
    want = _numpy_pagerank_int(edges, iters)
    assert dict(zip(got["node"], got["pr"])) == want
    # hub of the star graph must outrank every leaf
    ranks = dict(zip(got["node"], got["pr"]))
    if pairs[0] == (0, 1) and len(pairs) >= 5 and (0, 5) in pairs:
        assert ranks[0] == max(ranks.values())


def test_pagerank_mass_approximately_conserved(ray_session):
    """Total integer mass stays within N units of SCALE (each node loses
    < 1 unit per truncating division per round)."""
    import ray.data

    rng = np.random.default_rng(7)
    pairs = {(int(a), int(b)) for a, b in rng.integers(0, 40, size=(120, 2)) if a != b}
    edges = _sym(sorted(pairs))
    tbl = pa.table(
        {
            "src": pa.array([u for u, _ in edges], type=pa.int64()),
            "dst": pa.array([v for _, v in edges], type=pa.int64()),
        }
    )
    got = pagerank(ray.data.from_arrow(tbl), iterations=5, num_buckets=4).to_pandas()
    n = len(got)
    total = int(got["pr"].sum())
    # per round each of n nodes can shed up to ~2 units to truncation (the
    # contribution division + the 85/100 step), compounding over 5 rounds
    assert PAGERANK_SCALE - total < 20 * n
    assert total <= PAGERANK_SCALE


def test_pagerank_empty_edges(ray_session):
    import ray.data

    empty = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([], type=pa.int64()),
                "dst": pa.array([], type=pa.int64()),
            }
        )
    )
    out = pagerank(empty, iterations=2)
    assert out.count() == 0
    assert out.schema().names == ["node", "pr"]


def test_grouped_topk_ties_and_order(ray_session):
    import ray.data

    from logstash_filter_geoip_ray.stages.aggregate import grouped_topk

    tbl = pa.table(
        {
            "g": ["a"] * 4 + ["b"] * 2,
            "v": pa.array([5, 9, 9, 1, 3, 3], type=pa.int64()),
            "i": pa.array([10, 11, 12, 13, 20, 21], type=pa.int64()),
        }
    )
    out = grouped_topk(
        ray.data.from_arrow(tbl), "g", "v", "i", k=2, num_buckets=4
    ).to_pandas()
    # ties on v broken by id ascending; output ordered (g, v desc, i)
    assert list(map(tuple, out.itertuples(index=False))) == [
        ("a", 9, 11),
        ("a", 9, 12),
        ("b", 3, 20),
        ("b", 3, 21),
    ]


def test_kcore_known_graph(ray_session):
    """k-core peeling vs a naive reference on a graph whose 2-core peel
    cascades: a triangle + pendant chain (chain peels in waves), plus a
    4-clique 3-core and an isolated edge."""
    import ray.data

    from logstash_filter_geoip_ray.stages.graph import kcore_nodes

    edges = [
        # triangle 1-2-3 with chain 3-4-5 hanging off
        (1, 2), (2, 3), (1, 3), (3, 4), (4, 5),
        # 4-clique 10-11-12-13
        (10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13),
        # isolated edge
        (20, 21),
        # duplicate + reversed + self-loop noise
        (2, 1), (1, 1),
    ]
    tbl = pa.table(
        {
            "src": pa.array([a for a, _ in edges], type=pa.int64()),
            "dst": pa.array([b for _, b in edges], type=pa.int64()),
        }
    )

    def naive_kcore(pairs, k):
        adj = {}
        for a, b in pairs:
            if a == b:
                continue
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        changed = True
        while changed:
            changed = False
            for n in list(adj):
                if len(adj[n]) < k:
                    for m in adj.pop(n):
                        adj[m].discard(n)
                    changed = True
        return sorted((n, len(ns)) for n, ns in adj.items())

    for k in (2, 3, 4):
        res = kcore_nodes(ray.data.from_arrow(tbl), k=k, num_buckets=4)
        got = res.to_pandas() if hasattr(res, "to_pandas") else res
        want = naive_kcore(edges, k)
        assert list(map(tuple, got[["node", "degree"]].to_numpy())) == want, k
