"""Deduplication operators over the ``documents`` table: exact,
MinHash+LSH, SimHash, token-set Jaccard, and embedding-cosine near-dup.

Scale shapes (the part that matters at 100 TB):

- **exact**: content hash inside ``map_batches`` → per-batch partial min-id
  per hash → ``groupby(hash).min(id)``. Shuffle volume = distinct hashes,
  not rows.
- **MinHash+LSH**: signature per doc (map_batches) → explode to
  (band_key, doc) rows → ``groupby(band_key)`` co-locates candidates →
  pairs → exact-Jaccard verify. The only all-to-all is on band keys, whose
  cardinality ≈ docs × bands but with tiny rows.
- **SimHash**: 64-bit signature → group by signature (near-dup buckets).
- **token-set Jaccard**: deterministic blocking key (``source``) →
  ``groupby(source).map_groups`` computes within-block pairs — expressible
  in SQL, so it carries a DuckDB oracle.
- **embedding cosine**: broadcast the (small) matrix via ``ray.put`` once,
  each batch computes sims against it — no shuffle join. The scale path
  replaces the broadcast with LSH bucketing (see similarity.py).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.sketches import (
    MinHasher,
    exact_jaccard,
    simhash64,
    token_set_jaccard,
)


# -- exact dedup ------------------------------------------------------------


def exact_dedup_keepers(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keeper ids (min id per distinct text). Oracle:
    ``SELECT min(doc_id) AS doc_id FROM documents GROUP BY text``."""
    from ray.data.aggregate import Min

    def add_hash(batch: pa.Table) -> pa.Table:
        from ..functions.textstats import md5_fingerprints

        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        return batch.select([id_col]).append_column("_h", md5_fingerprints(text))

    def partial_min(batch: pa.Table) -> pa.Table:
        return (
            batch.group_by(["_h"]).aggregate([(id_col, "min")]).rename_columns(["_h", id_col])
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    partial = hashed.map_batches(partial_min, batch_format="pyarrow")
    keepers = partial.groupby("_h").aggregate(Min(id_col, alias_name=id_col))
    return keepers.select_columns([id_col]).sort(id_col)


# -- MinHash + LSH ----------------------------------------------------------


class MinHashBandStage:
    """map_batches stage: text → LSH band rows (band_key, id, text).

    Text is carried with the band row so candidate verification happens right
    after the groupby without a second join; at larger payloads swap for a
    join back by id.
    """

    def __init__(self, num_perm=128, bands=32, shingle_k=3, text_col="text", id_col="doc_id"):
        self.hasher = MinHasher(num_perm=num_perm, bands=bands, shingle_k=shingle_k)
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, keys, texts = [], [], []
        for doc_id, text in zip(
            batch[self.id_col].to_pylist(), batch[self.text_col].to_pylist()
        ):
            sig = self.hasher.signature(text)
            if sig is None:
                continue
            for key in self.hasher.band_keys(sig):
                ids.append(doc_id)
                keys.append(key)
                texts.append(text)
        return pa.table(
            {
                "band_key": pa.array(keys, type=pa.string()),
                # explicit type: an all-skipped block must not emit a
                # null-typed id column that breaks schema unification
                self.id_col: pa.array(ids, type=batch[self.id_col].type),
                self.text_col: pa.array(texts, type=pa.string()),
            }
        )


def minhash_lsh_pairs(
    ds,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    min_jaccard: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Verified near-duplicate pairs: (a, b, inter, union) with exact
    word-shingle Jaccard ≥ min_jaccard among LSH candidates. a < b."""
    stage = MinHashBandStage(num_perm, bands, shingle_k, text_col, id_col)
    banded = ds.map_batches(stage, batch_format="pyarrow")

    def pairs_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        rows = group.drop_duplicates(subset=[id_col]).sort_values(id_col)
        out = []
        items = list(zip(rows[id_col], rows[text_col]))
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                (ida, ta), (idb, tb) = items[i], items[j]
                inter, union = exact_jaccard(ta, tb, shingle_k)
                if union and inter / union >= min_jaccard:
                    out.append((ida, idb, inter, union))
        return pd.DataFrame(out, columns=["a", "b", "inter", "union_"])

    pairs = banded.groupby("band_key").map_groups(pairs_in_bucket, batch_format="pandas")

    # a pair can surface from several bands → dedupe on (a, b)
    def partial_dedupe(batch: pa.Table) -> pa.Table:
        return (
            batch.group_by(["a", "b"])
            .aggregate([("inter", "min"), ("union_", "min")])
            .rename_columns(["a", "b", "inter", "union_"])
        )

    from ray.data.aggregate import Min

    deduped = (
        pairs.map_batches(partial_dedupe, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Min("inter", alias_name="inter"), Min("union_", alias_name="union_"))
    )
    return deduped.sort(["a", "b"])


# -- SimHash ----------------------------------------------------------------


def simhash_signatures(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(id, simhash hex string) per doc — identical signatures are near-dup
    buckets; hex keeps the driver/oracle comparison integer-free."""

    def add_simhash(batch: pa.Table) -> pa.Table:
        sigs = [
            ("%016x" % simhash64(t)) if t is not None and t.split() else None
            for t in batch[text_col].to_pylist()
        ]
        return batch.select([id_col]).append_column("simhash", pa.array(sigs, type=pa.string()))

    return ds.map_batches(add_simhash, batch_format="pyarrow").sort(id_col)


# -- token-set Jaccard within blocking key (oracle-expressible) -------------


def jaccard_pairs_by_block(
    ds,
    block_col: str = "source",
    min_ratio: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Unigram-token-set Jaccard for every doc pair sharing ``block_col``:
    rows (a, b, inter, union) with inter/union ≥ min_ratio, a < b.
    Integer outputs → exact oracle comparison (see oracle SQL in
    __ray_entry__)."""

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        rows = group.sort_values(id_col)
        items = list(zip(rows[id_col], rows[text_col]))
        out = []
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                (ida, ta), (idb, tb) = items[i], items[j]
                if ta is None or tb is None:
                    continue
                inter, union = token_set_jaccard(ta, tb)
                if union and inter / union >= min_ratio:
                    out.append((ida, idb, inter, union))
        return pd.DataFrame(out, columns=["a", "b", "inter", "union_"])

    return (
        ds.select_columns([block_col, id_col, text_col])
        .groupby(block_col)
        .map_groups(pairs, batch_format="pandas")
        .sort(["a", "b"])
    )


def ngram_jaccard_pairs_by_block(
    ds,
    block_col: str = "lang",
    shingle_k: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Word-k-gram shingle-set Jaccard for every doc pair sharing
    ``block_col``: rows (a, b, inter, union_) with
    ``inter * threshold_den >= union * threshold_num`` (pure integer
    threshold, so the DuckDB oracle comparison has no float boundary),
    a < b. The shingle sets match the MinHash stage's ``word_shingles``."""

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        from ..functions.sketches import word_shingles

        rows = group.sort_values(id_col)
        items = [
            (i, word_shingles(t, shingle_k))
            for i, t in zip(rows[id_col], rows[text_col])
            if t is not None and t.strip()
        ]
        out = []
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                (ida, sa), (idb, sb) = items[i], items[j]
                inter = len(sa & sb)
                union = len(sa | sb)
                if union and inter * threshold_den >= union * threshold_num:
                    out.append((ida, idb, inter, union))
        return pd.DataFrame(out, columns=["a", "b", "inter", "union_"])

    return (
        ds.select_columns([block_col, id_col, text_col])
        .groupby(block_col)
        .map_groups(pairs, batch_format="pandas")
        .sort(["a", "b"])
    )


# -- duplicate clusters (connected components over verified pairs) ---------


def dup_clusters(pairs_ds, a_col: str = "a", b_col: str = "b"):
    """Connected components over verified near-duplicate pairs: rows
    (doc_id, cluster_id) where cluster_id = min doc id in the component,
    for every doc appearing in at least one pair.

    The pair set is the *verified* near-dup output — orders of magnitude
    smaller than the corpus by construction — so union-find runs on the
    driver (the sanctioned shape for provably-small candidate sets); the
    expensive part (pair generation) stays distributed. For pathological
    pair volumes switch to iterated min-label propagation with groupby
    rounds."""
    edges = pairs_ds.select_columns([a_col, b_col]).to_pandas()
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(edges[a_col], edges[b_col]):
        a, b = int(a), int(b)
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by smaller id so the root IS the cluster id
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    import ray.data

    nodes = sorted(parent)
    table = pa.table(
        {
            "doc_id": pa.array(nodes, type=pa.int64()),
            "cluster_id": pa.array([find(n) for n in nodes], type=pa.int64()),
        }
    )
    return ray.data.from_arrow(table)


def label_propagation_clusters(pairs_ds, a_col: str = "a", b_col: str = "b",
                               max_rounds: int = 50):
    """Distributed connected components by iterated min-label propagation —
    the scale path for pair sets too large for driver union-find. Entirely
    shuffle-based: no broadcast of the label table, no driver-side state
    beyond one scalar per round.

    One round: co-locate each node's current label with its half-edges
    (``groupby(node).map_groups``), send the label to every neighbor, then
    ``groupby(node).min`` adopts the smallest proposal. Labels only ever
    decrease, so ``sum(label)`` is strictly decreasing until convergence —
    the stopping test is a single scalar aggregate, not a dataset diff.
    Converges in O(component diameter) rounds.

    Returns rows (doc_id, cluster_id = min id in component)."""
    import ray.data
    from ray.data.aggregate import Min, Sum

    def explode(batch: pa.Table) -> pa.Table:
        a = batch[a_col].combine_chunks() if isinstance(batch[a_col], pa.ChunkedArray) else batch[a_col]
        b = batch[b_col].combine_chunks() if isinstance(batch[b_col], pa.ChunkedArray) else batch[b_col]
        node = pa.concat_arrays([a.cast(pa.int64()), b.cast(pa.int64())])
        neigh = pa.concat_arrays([b.cast(pa.int64()), a.cast(pa.int64())])
        return pa.table({"node": node, "neigh": neigh})

    half_edges = pairs_ds.map_batches(explode, batch_format="pyarrow").materialize()

    # initial labels: own id (distinct nodes from the half-edge list)
    labels = (
        half_edges.groupby("node")
        .aggregate(Min("node", alias_name="label"))
        .materialize()
    )

    def propagate(group: pd.DataFrame) -> pd.DataFrame:
        # rows: this node's half-edges (neigh >= 0) + its label row (neigh = -1)
        label = int(group.loc[group["neigh"] < 0, "label"].min())
        neighbors = group.loc[group["neigh"] >= 0, "neigh"].astype("int64")
        out_nodes = list(neighbors) + [int(group["node"].iloc[0])]
        return pd.DataFrame({"node": out_nodes, "label": [label] * len(out_nodes)})

    prev_sum = None
    for _ in range(max_rounds):
        tagged_labels = labels.map_batches(
            lambda b: b.append_column("neigh", pa.array([-1] * b.num_rows, type=pa.int64())),
            batch_format="pyarrow",
        )
        tagged_edges = half_edges.map_batches(
            lambda b: b.append_column("label", pa.array([2**62] * b.num_rows, type=pa.int64())),
            batch_format="pyarrow",
        )
        proposals = (
            tagged_edges.union(tagged_labels)
            .groupby("node")
            .map_groups(propagate, batch_format="pandas")
        )
        labels = (
            proposals.groupby("node").aggregate(Min("label", alias_name="label")).materialize()
        )
        total = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if total == prev_sum:
            break
        prev_sum = total

    return labels.map_batches(
        lambda b: b.rename_columns(["doc_id", "cluster_id"]), batch_format="pyarrow"
    ).sort("doc_id")


def filter_non_keepers(ds, clusters_ds, id_col: str = "doc_id"):
    """Broadcast anti-join: drop every doc that belongs to a near-dup
    cluster but is not its representative (min id). The drop-set is tiny
    (≤ #near-dups), so it ships once via ``ray.put`` and each batch filters
    vectorized — no shuffle join (the guide's semi/anti-join shape)."""
    import ray

    clusters = clusters_ds.to_pandas()
    drop = set(
        int(d) for d, c in zip(clusters["doc_id"], clusters["cluster_id"]) if d != c
    )
    drop_ref = ray.put(frozenset(drop))

    def anti_join(batch: pa.Table) -> pa.Table:
        drop_set = ray.get(drop_ref)
        keep = pa.array([int(v) not in drop_set for v in batch[id_col].to_pylist()])
        return batch.filter(keep)

    return ds.map_batches(anti_join, batch_format="pyarrow")


# -- embedding cosine near-dup ---------------------------------------------


def embedding_dup_pairs(
    ds,
    min_cosine: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """All pairs with cosine ≥ min_cosine: the reference matrix is broadcast
    once via ``ray.put`` and every batch does one float64 matmul against it.
    Output (a, b) int pairs, a < b.

    Scale note: broadcast works while the matrix fits a worker heap
    (~10⁶ × dim); beyond that use LSH bucketing (similarity.lsh_topk)."""
    import ray

    mat_tbl = ds.select_columns([id_col, vec_col]).to_pandas()
    ids = mat_tbl[id_col].to_numpy()
    mat = np.stack(mat_tbl[vec_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    matn = mat / norms[:, None]
    ref = ray.put((ids, matn))

    def batch_pairs(batch: pa.Table) -> pa.Table:
        ref_ids, ref_mat = ray.get(ref)
        bids = np.asarray(batch[id_col])
        bmat = np.stack([np.asarray(v, dtype=np.float64) for v in batch[vec_col].to_pylist()])
        bn = np.linalg.norm(bmat, axis=1)
        bn[bn == 0] = 1.0
        bmat = bmat / bn[:, None]
        sims = bmat @ ref_mat.T
        rows_a, rows_b = np.nonzero(sims >= min_cosine)
        a = bids[rows_a]
        b = ref_ids[rows_b]
        keep = a < b  # dedupe + drop self
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep])})

    return ds.map_batches(batch_pairs, batch_format="pyarrow").sort(["a", "b"])
