"""Similarity search over an embedding column (``list<float>``):
brute-force cosine top-k as the exact baseline, and an LSH-bucketed
approximate variant as the scale path.

Brute force shape: queries are a small matrix broadcast once (``ray.put``);
each batch computes one numpy matmul against it and emits per-batch top-k
*partials*; a final tiny ``groupby(query).map_groups`` merges partials into
the global top-k. Shuffle volume = batches × queries × k, never rows."""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

_PARTIAL_SCHEMA = pa.schema(
    [("query_id", pa.int64()), ("neighbor_id", pa.int64()), ("sim", pa.float64())]
)


def _empty_partial() -> pa.Table:
    return _PARTIAL_SCHEMA.empty_table()


def _normalized(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def list_column_to_matrix(arr) -> np.ndarray:
    """Zero-copy-ish list<float> column → (n, dim) float64 matrix: uses the
    flat Arrow values buffer + reshape when rows are equal-length (the
    embedding-table contract); falls back to a per-row stack for ragged
    input. No Python per-row conversion in the fast path."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    import pyarrow.compute as pc

    lens = pc.list_value_length(arr)
    uniq = pc.unique(pc.fill_null(lens, -1))
    if len(uniq) == 1 and uniq[0].as_py() not in (None, -1):
        dim = uniq[0].as_py()
        offset0 = arr.offsets[0].as_py()
        flat = np.asarray(arr.values)[offset0 : offset0 + len(arr) * dim]
        return flat.reshape(len(arr), dim).astype(np.float64)
    return np.stack([np.asarray(v, dtype=np.float64) for v in arr.to_pylist()])


def _batch_matrix(batch: pa.Table, id_col: str, vec_col: str):
    """(ids, normalized matrix) from a batch; (None, None) for empty
    batches — ``np.stack`` on an empty list raises."""
    if batch.num_rows == 0:
        return None, None
    bids = np.asarray(batch[id_col])
    bmat = _normalized(list_column_to_matrix(batch[vec_col]))
    return bids, bmat


def _select_topk(ref_ids, sims, bids, k, valid=None) -> pa.Table:
    """Per-query partial top-k with the same tie order (sim desc, id asc) the
    final merge and the SQL oracle use — boundary ties never drop here.
    ``valid`` (optional (n_q, n_batch) bool) excludes candidates per query
    beyond the always-applied self-exclusion (e.g. same-label rows in
    hard-negative mining) — exclusion by masking, never by -inf sentinels
    that could leak into a sparse final top-k."""
    out_q, out_n, out_s = [], [], []
    for qi in range(len(ref_ids)):
        row = sims[qi]
        mask = bids != ref_ids[qi]
        if valid is not None:
            mask &= valid[qi]
        cand_ids, cand_sims = bids[mask], row[mask]
        if len(cand_ids) > k:
            order = np.lexsort((cand_ids, -cand_sims))[:k]
            cand_ids, cand_sims = cand_ids[order], cand_sims[order]
        out_q.extend([int(ref_ids[qi])] * len(cand_ids))
        out_n.extend(int(x) for x in cand_ids)
        out_s.extend(float(s) for s in cand_sims)
    return pa.table(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "neighbor_id": pa.array(out_n, type=pa.int64()),
            "sim": pa.array(out_s, type=pa.float64()),
        }
    )


def _merge_topk_fn(k: int):
    def merge_topk(group: pd.DataFrame) -> pd.DataFrame:
        top = group.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        top = top.reset_index(drop=True)
        top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
        return top[["query_id", "neighbor_id", "rank"]]

    return merge_topk


def _finalize(partials, k: int):
    return (
        partials.groupby("query_id")
        .map_groups(_merge_topk_fn(k), batch_format="pandas")
        .sort(["query_id", "rank"])
    )


def _collect_queries(ds, query_ids: Sequence[int], id_col: str, vec_col: str):
    import pyarrow.compute as pc

    qset = list(query_ids)
    tbl = ds.map_batches(
        lambda b: b.filter(pc.is_in(b[id_col], value_set=pa.array(qset))),
        batch_format="pyarrow",
    ).to_pandas()
    tbl = tbl.set_index(id_col).loc[qset]  # preserve caller order
    mat = np.stack(tbl[vec_col].to_numpy()).astype(np.float64)
    return np.asarray(qset), _normalized(mat)


def brute_force_topk(
    ds,
    query_ids: Sequence[int],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    corpus_ds=None,
):
    """Exact cosine top-k per query (self excluded): rows
    (query_id, neighbor_id, rank) with rank 1..k ordered by similarity desc,
    id asc on ties. Integer-only output → exact oracle comparison.

    ``corpus_ds`` (optional) restricts the SEARCHED side to a different —
    typically predicate-filtered — dataset while query vectors still come
    from ``ds``: the metadata-filtered vector search every RAG stack runs
    (filter pushed into the scan; the query matrix is broadcast once via
    ``ray.put`` either way)."""
    import ray

    qids, qmat = _collect_queries(ds, query_ids, id_col, vec_col)
    ref = ray.put((qids, qmat))
    corpus = ds if corpus_ds is None else corpus_ds

    def partial_topk(batch: pa.Table) -> pa.Table:
        ref_ids, ref_mat = ray.get(ref)
        bids, bmat = _batch_matrix(batch, id_col, vec_col)
        if bids is None:
            return _empty_partial()
        return _select_topk(ref_ids, ref_mat @ bmat.T, bids, k)

    partials = corpus.map_batches(partial_topk, batch_format="pyarrow")
    return _finalize(partials, k)


# -- LSH-bucketed ANN (scale path) -----------------------------------------


class RandomHyperplaneLSH:
    """Sign-random-projection signatures for cosine LSH."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_planes, dim))

    def keys(self, mat: np.ndarray) -> np.ndarray:
        bits = (mat @ self.planes.T) > 0
        weights = 1 << np.arange(bits.shape[1], dtype=np.int64)
        return (bits @ weights).astype(np.int64)


def _multiprobe_buckets(qkeys, n_planes: int, multiprobe_bits: int) -> np.ndarray:
    """Every bucket within Hamming distance ``multiprobe_bits`` of a query
    bucket (all bit-flip combinations, not just single bits), as a sorted
    int64 array for vectorized ``np.isin`` probing. The enumeration work
    grows as C(n_planes, d) per distance d per query, but the DISTINCT
    result is bounded by the 2^n_planes bucket space — the sanity cap
    therefore bounds min(enumeration, bucket space), so many queries over a
    small plane count (fine: the set saturates) never trip it."""
    import itertools
    import math

    per_query = sum(math.comb(n_planes, d) for d in range(multiprobe_bits + 1))
    n_probe = min(per_query * max(1, len(qkeys)), 2 ** min(n_planes, 62))
    if n_probe > 1_000_000:
        raise ValueError(
            "_multiprobe_buckets: up to %d distinct probe buckets "
            "(n_planes=%d, multiprobe_bits=%d, queries=%d) exceeds the 1M "
            "sanity cap — lower multiprobe_bits or n_planes"
            % (n_probe, n_planes, multiprobe_bits, len(qkeys))
        )
    accept: set = set()
    for qk in qkeys:
        accept.add(int(qk))
        for d in range(1, multiprobe_bits + 1):
            for bits in itertools.combinations(range(n_planes), d):
                flipped = int(qk)
                for b in bits:
                    flipped ^= 1 << b
                accept.add(flipped)
    # sorted int64 array, not a set: the per-batch membership test is a
    # vectorized np.isin against this array
    return np.array(sorted(accept), dtype=np.int64)


def _kmeans(mat: np.ndarray, n_clusters: int, n_iter: int = 20, seed: int = 13) -> np.ndarray:
    """Plain seeded Lloyd k-means over unit vectors (numpy, driver-side on a
    SAMPLE only). Returns L2-normalized centroids (spherical k-means)."""
    rng = np.random.default_rng(seed)
    centroids = mat[rng.choice(len(mat), size=min(n_clusters, len(mat)), replace=False)]
    for _ in range(n_iter):
        assign = np.argmax(mat @ centroids.T, axis=1)
        new = []
        for c in range(len(centroids)):
            members = mat[assign == c]
            new.append(members.mean(axis=0) if len(members) else centroids[c])
        centroids = _normalized(np.stack(new))
    return centroids


def ivf_topk(
    ds,
    query_ids: Sequence[int],
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    train_sample_mod: Optional[int] = None,
    train_target_rows: int = 65536,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Approximate cosine top-k via an IVF (inverted-file) coarse quantizer:
    a spherical k-means codebook is trained on a deterministic sample
    (``vec_id % train_sample_mod == 0``), centroids broadcast once; each
    batch assigns its vectors to their nearest centroid and only vectors in
    one of a query's ``n_probe`` nearest cells are scored. Same output
    schema as brute_force_topk; recall measured in tests.

    Scale shape: training reads a BOUNDED sample — ``train_sample_mod``
    defaults to ``ceil(count / train_target_rows)`` so at most
    ~``train_target_rows`` vectors ever reach the driver, regardless of
    corpus size; search is one matmul per batch against the tiny codebook +
    the usual partial top-k — the corpus never broadcasts or shuffles."""
    import pyarrow.compute as pc

    import ray

    qids, qmat = _collect_queries(ds, query_ids, id_col, vec_col)

    if train_sample_mod is None:
        # parquet metadata count: cheap, no scan
        n_total = ds.count()
        train_sample_mod = max(1, -(-n_total // train_target_rows))

    # deterministic sample → codebook (driver-side numpy on the sample only)
    def sample_batch(b: pa.Table) -> pa.Table:
        ids64 = pc.cast(b[id_col], pa.int64())
        mod = pc.subtract(
            ids64, pc.multiply(pc.divide(ids64, train_sample_mod), train_sample_mod)
        )
        return b.filter(pc.equal(mod, 0)).select([id_col, vec_col])

    sample = ds.map_batches(sample_batch, batch_format="pyarrow").to_pandas()
    # sort the bounded sample by id before training: Ray Data does not
    # preserve block order, and k-means init is row-order-sensitive — without
    # this the codebook (and thus the probed set) varies run to run
    sample = sample.sort_values(id_col)
    train = _normalized(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
    centroids = _kmeans(train, n_clusters)

    # accept set: union of each query's n_probe nearest cells
    order = np.argsort(-(qmat @ centroids.T), axis=1)[:, :n_probe]
    accept = frozenset(int(c) for row in order for c in row)
    ref = ray.put((qids, qmat, centroids, accept))

    def partial_topk(batch: pa.Table) -> pa.Table:
        ref_ids, ref_mat, cents, acc = ray.get(ref)
        bids, bmat = _batch_matrix(batch, id_col, vec_col)
        if bids is None:
            return _empty_partial()
        cells = np.argmax(bmat @ cents.T, axis=1)
        mask = np.isin(cells, list(acc))
        if not mask.any():
            return _empty_partial()
        bids, bmat = bids[mask], bmat[mask]
        return _select_topk(ref_ids, ref_mat @ bmat.T, bids, k)

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")
    return _finalize(partials, k)


def lsh_topk(
    ds,
    query_ids: Sequence[int],
    k: int = 10,
    n_planes: int = 10,
    multiprobe_bits: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Approximate cosine top-k: only rows whose LSH bucket is within
    ``multiprobe_bits`` Hamming distance of a query's bucket are scored.
    Same output schema as brute_force_topk; recall measured in tests.

    Scale shape: the bucket filter runs inside map_batches (vectorized sign
    projections), so the full matrix is never shuffled or broadcast — only
    the candidate subset flows into the top-k partials."""
    import ray

    qids, qmat = _collect_queries(ds, query_ids, id_col, vec_col)
    dim = qmat.shape[1]
    lsh = RandomHyperplaneLSH(dim, n_planes)
    accept = _multiprobe_buckets(lsh.keys(qmat), n_planes, multiprobe_bits)
    ref = ray.put((qids, qmat, lsh.planes, accept))

    def partial_topk(batch: pa.Table) -> pa.Table:
        ref_ids, ref_mat, planes, acc = ray.get(ref)
        bids, bmat = _batch_matrix(batch, id_col, vec_col)
        if bids is None:
            return _empty_partial()
        bits = (bmat @ planes.T) > 0
        weights = 1 << np.arange(bits.shape[1], dtype=np.int64)
        keys = (bits @ weights).astype(np.int64)
        mask = np.isin(keys, acc)
        if not mask.any():
            return _empty_partial()
        bids, bmat = bids[mask], bmat[mask]
        return _select_topk(ref_ids, ref_mat @ bmat.T, bids, k)

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")
    return _finalize(partials, k)


def knn_majority_labels(
    ds,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    num_blocks: int = 4,
    num_buckets: int = 16,
):
    """k-NN majority-vote labeling of EVERY vector from its k nearest
    neighbors (weak supervision / label densification): for each vector,
    the k others with the highest integer-milli INNER PRODUCT (ties →
    lower neighbor id), then the most frequent neighbor label (ties →
    smaller label).

    Integer-exact by construction: milli-quantized dot products are ≤
    dim·10⁶ per term — far inside 2⁵³ — so even a SQL oracle computing
    them in doubles (list_dot_product) ranks identically.

    Scale shape — the full k-NN graph via the same block-grid self-join as
    ``dedup.embedding_dup_pairs`` (each unordered pair meets in exactly
    one cell; shuffle = num_blocks × corpus, per-task memory two blocks):
    every cell emits each of its vectors' top-k against the OPPOSITE
    block (both directions; within-block on the diagonal), the ≤
    num_blocks partial lists per vector merge in one bucketed pass, and
    the same pass takes the majority vote. The corpus never broadcasts."""
    import pyarrow.compute as pc

    B = num_blocks

    def to_grid(batch: pa.Table) -> pa.Table:
        vec_type = batch[vec_col].type
        if batch.num_rows == 0:
            return pa.table(
                {
                    "cell": pa.array([], type=pa.int64()),
                    "bucket": pa.array([], type=pa.int64()),
                    id_col: pa.array([], type=pa.int64()),
                    label_col: pa.array([], type=pa.int64()),
                    vec_col: pa.array([], type=vec_type),
                }
            )
        ids = pc.cast(batch[id_col], pa.int64())
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        buckets = np.asarray(ids) % B
        n = len(buckets)
        p_rep = np.repeat(buckets, B)
        other = np.tile(np.arange(B, dtype=np.int64), n)
        lo = np.minimum(p_rep, other)
        hi = np.maximum(p_rep, other)
        cells = lo * B + hi
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), B))
        vecs = batch[vec_col]
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        return pa.table(
            {
                "cell": pa.array(cells, type=pa.int64()),
                "bucket": pa.array(p_rep, type=pa.int64()),
                id_col: pc.take(ids, idx),
                label_col: pc.take(
                    pc.cast(batch[label_col], pa.int64()), idx
                ),
                vec_col: pc.take(vecs, idx),
            }
        )

    def _side(group: pd.DataFrame, b: int):
        rows = group[group["bucket"] == b]
        if len(rows) == 0:
            return None
        order = np.argsort(rows[id_col].to_numpy(), kind="stable")
        rows = rows.iloc[order]
        ids_ = rows[id_col].to_numpy(dtype=np.int64)
        labels_ = rows[label_col].to_numpy(dtype=np.int64)
        mat = np.floor(
            np.stack(rows[vec_col].to_numpy()).astype(np.float64) * 1000.0
        ).astype(np.int64)
        return ids_, labels_, mat

    def _topk_rows(qids, dots, nids, nlabels, self_mask=None):
        # columns pre-sorted by neighbor id; STABLE argsort on -dot keeps
        # id-ascending order inside dot ties → (dot desc, id asc) exactly
        if self_mask is not None:
            dots = dots.copy()
            dots[self_mask] = np.iinfo(np.int64).min
        take = min(k, dots.shape[1])
        order = np.argsort(-dots, axis=1, kind="stable")[:, :take]
        rows = np.repeat(np.arange(dots.shape[0]), take)
        cols = order.reshape(-1)
        sel_dots = dots[rows, cols]
        keep = sel_dots != np.iinfo(np.int64).min  # masked self-pairs
        return pd.DataFrame(
            {
                "q": np.repeat(qids, take)[keep],
                "dot": sel_dots[keep],
                "nbr": nids[cols][keep],
                "nl": nlabels[cols][keep],
            }
        )

    def cell_topk(group: pd.DataFrame) -> pd.DataFrame:
        cell = int(group["cell"].iloc[0])
        i, j = divmod(cell, B)
        group = group.drop_duplicates(subset=["bucket", id_col])
        empty = pd.DataFrame(
            {
                "q": pd.Series(dtype="int64"),
                "dot": pd.Series(dtype="int64"),
                "nbr": pd.Series(dtype="int64"),
                "nl": pd.Series(dtype="int64"),
            }
        )
        if i == j:
            side = _side(group, i)
            if side is None or len(side[0]) < 2:
                return empty
            ids_, labels_, mat = side
            dots = mat @ mat.T
            self_mask = np.eye(len(ids_), dtype=bool)
            return _topk_rows(ids_, dots, ids_, labels_, self_mask)
        si, sj = _side(group, i), _side(group, j)
        if si is None or sj is None:
            return empty
        out = [
            _topk_rows(si[0], si[2] @ sj[2].T, sj[0], sj[1]),
            _topk_rows(sj[0], sj[2] @ si[2].T, si[0], si[1]),
        ]
        return pd.concat(out, ignore_index=True)

    partials = (
        ds.map_batches(to_grid, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(cell_topk, batch_format="pandas")
    )

    from .aggregate import bucket_by_key

    def vote_bucket(block: pd.DataFrame) -> pd.DataFrame:
        b = block.sort_values(["q", "dot", "nbr"], ascending=[True, False, True])
        top = b.groupby("q", sort=False).head(k)
        votes = top.groupby(["q", "nl"], as_index=False).size()
        votes = votes.sort_values(["q", "size", "nl"],
                                  ascending=[True, False, True])
        win = votes.groupby("q", sort=False).head(1)
        return pd.DataFrame(
            {
                "vec_id": win["q"].to_numpy(dtype=np.int64),
                "pred_label": win["nl"].to_numpy(dtype=np.int64),
                "n_votes": win["size"].to_numpy(dtype=np.int64),
            }
        )

    return (
        bucket_by_key(partials, "q", num_buckets)
        .groupby("_bucket")
        .map_groups(vote_bucket, batch_format="pandas")
        .sort("vec_id")
    )


# -- product quantization (compressed-domain ANN) ----------------------------


def _kmeans_l2(mat: np.ndarray, n_clusters: int, n_iter: int = 20, seed: int = 13) -> np.ndarray:
    """Seeded Lloyd k-means under plain L2 (numpy, driver-side on a SAMPLE
    only) — PQ sub-vectors are not unit-norm, so the spherical variant
    above does not apply."""
    rng = np.random.default_rng(seed)
    centroids = mat[
        rng.choice(len(mat), size=min(n_clusters, len(mat)), replace=False)
    ].copy()
    for _ in range(n_iter):
        d2 = (
            (mat * mat).sum(1)[:, None]
            - 2.0 * (mat @ centroids.T)
            + (centroids * centroids).sum(1)[None, :]
        )
        assign = np.argmin(d2, axis=1)
        for c in range(len(centroids)):
            members = mat[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def _train_sample(ds, train_sample_mod, train_target_rows, vec_col, id_col):
    """Deterministic bounded training sample (``id % mod == 0``), id-sorted
    so the codebook is independent of Ray block order — shared by the IVF
    and PQ trainers."""
    import pyarrow.compute as pc

    if train_sample_mod is None:
        n_total = ds.count()
        train_sample_mod = max(1, -(-n_total // train_target_rows))

    def sample_batch(b: pa.Table) -> pa.Table:
        ids64 = pc.cast(b[id_col], pa.int64())
        mod = pc.subtract(
            ids64, pc.multiply(pc.divide(ids64, train_sample_mod), train_sample_mod)
        )
        return b.filter(pc.equal(mod, 0)).select([id_col, vec_col])

    sample = ds.map_batches(sample_batch, batch_format="pyarrow").to_pandas()
    sample = sample.sort_values(id_col)
    return _normalized(np.stack(sample[vec_col].to_numpy()).astype(np.float64))


def pq_train(
    ds,
    n_subspaces: int = 8,
    n_codes: int = 16,
    train_sample_mod: "Optional[int]" = None,
    train_target_rows: int = 65536,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Product-quantization codebooks over the UNIT-normalized corpus:
    dimensions split into ``n_subspaces`` contiguous sub-vectors, one L2
    k-means codebook per subspace, trained on the same deterministic
    bounded sample discipline as :func:`ivf_topk`.  Returns
    ``(n_subspaces, n_codes, sub_dim)`` float64 — the broadcastable
    compression model: codes are ``n_subspaces`` bytes per vector (a 64-dim
    float32 vector compresses 32× at the defaults), the artifact that lets
    a 100 TB embedding corpus live in RAM for ANN serving."""
    train = _train_sample(ds, train_sample_mod, train_target_rows, vec_col, id_col)
    dim = train.shape[1]
    if dim % n_subspaces:
        raise ValueError(
            "pq_train: dim %d not divisible by n_subspaces %d" % (dim, n_subspaces)
        )
    if n_codes > 256:
        raise ValueError("pq_train: n_codes > 256 does not fit uint8 codes")
    sub = dim // n_subspaces
    return np.stack(
        [
            _kmeans_l2(train[:, s * sub : (s + 1) * sub], n_codes, seed=13 + s)
            for s in range(n_subspaces)
        ]
    )


def _pq_codes(mat: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n, n_subspaces) uint8 nearest-code assignment of UNIT-normalized
    rows — one matmul per subspace, no per-row loop."""
    m, n_codes, sub = codebooks.shape
    codes = np.empty((len(mat), m), dtype=np.uint8)
    for s in range(m):
        x = mat[:, s * sub : (s + 1) * sub]
        c = codebooks[s]
        d2 = -2.0 * (x @ c.T) + (c * c).sum(1)[None, :]
        codes[:, s] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def pq_encode(
    ds,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Compress the corpus: (id, codes fixed_size_list<uint8>[n_subspaces]).
    Codebooks broadcast once via ``ray.put``; one matmul per subspace per
    batch.  The code table is the persistable serving artifact."""
    import ray

    cb_ref = ray.put(codebooks)
    m = codebooks.shape[0]

    def encode(batch: pa.Table) -> pa.Table:
        cb = ray.get(cb_ref)
        bids, bmat = _batch_matrix(batch, id_col, vec_col)
        if bids is None:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "codes": pa.array(
                        [], type=pa.list_(pa.uint8(), m)
                    ),
                }
            )
        codes = _pq_codes(bmat, cb)
        flat = pa.array(codes.reshape(-1), type=pa.uint8())
        return pa.table(
            {
                id_col: pa.array(bids, type=pa.int64()),
                "codes": pa.FixedSizeListArray.from_arrays(flat, m),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")


def pq_topk(
    ds,
    query_ids: Sequence[int],
    k: int = 10,
    n_subspaces: int = 8,
    n_codes: int = 16,
    train_sample_mod: "Optional[int]" = None,
    train_target_rows: int = 65536,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codebooks: "Optional[np.ndarray]" = None,
):
    """Approximate cosine top-k in the COMPRESSED domain (ADC — asymmetric
    distance computation): queries stay exact float vectors; every corpus
    vector is scored as the sum of ``n_subspaces`` table lookups
    ``T[s, code]`` where ``T[s, j] = q_s · codebook[s, j]`` — the
    distance-table trick that makes compressed-corpus search
    O(n_subspaces) per vector instead of O(dim).  Same output schema as
    :func:`brute_force_topk`; recall measured in tests, distributed-path ≡
    local-numpy-reference equality pinned exactly."""
    import ray

    qids, qmat = _collect_queries(ds, query_ids, id_col, vec_col)
    if codebooks is None:
        codebooks = pq_train(
            ds, n_subspaces, n_codes, train_sample_mod, train_target_rows,
            vec_col, id_col,
        )
    m, n_cb, sub = codebooks.shape
    # per-query lookup tables: T[q, s, j] = q_sub(s) · codebook[s, j]
    tables = np.einsum(
        "qsd,sjd->qsj", qmat.reshape(len(qmat), m, sub), codebooks
    )
    ref = ray.put((qids, tables, codebooks))

    def partial_topk(batch: pa.Table) -> pa.Table:
        ref_ids, tabs, cb = ray.get(ref)
        bids, bmat = _batch_matrix(batch, id_col, vec_col)
        if bids is None:
            return _empty_partial()
        codes = _pq_codes(bmat, cb)
        sims = np.zeros((len(ref_ids), len(bids)), dtype=np.float64)
        for s in range(cb.shape[0]):
            sims += tabs[:, s, :][:, codes[:, s]]
        return _select_topk(ref_ids, sims, bids, k)

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")
    return _finalize(partials, k)


def hard_negative_topk(
    ds,
    query_ids: Sequence[int],
    k: int = 10,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Contrastive hard-negative mining: per query, the exact cosine top-k
    among rows with a DIFFERENT label — the highest-similarity wrong-class
    examples a contrastive/embedding trainer wants as negatives.  Same
    shape as :func:`brute_force_topk` (query matrix + labels broadcast
    once, one matmul per batch, partial top-k merge) with a per-query
    label-validity mask instead of a global corpus filter (each query
    excludes a DIFFERENT corpus subset, so a scan-level predicate like
    ann_filtered's cannot express it).  Integer-only output → exact
    DuckDB oracle."""
    import pyarrow.compute as pc

    import ray

    qset = list(query_ids)
    qtbl = (
        ds.map_batches(
            lambda b: b.filter(
                pc.is_in(
                    pc.cast(b[id_col], pa.int64()),
                    value_set=pa.array(qset, type=pa.int64()),
                )
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .set_index(id_col)
        .loc[qset]
    )
    qmat = _normalized(np.stack(qtbl[vec_col].to_numpy()).astype(np.float64))
    qlabels = qtbl[label_col].to_numpy()
    qids = np.asarray(qset)
    ref = ray.put((qids, qmat, qlabels))

    def partial_topk(batch: pa.Table) -> pa.Table:
        ref_ids, ref_mat, ref_labels = ray.get(ref)
        bids, bmat = _batch_matrix(batch, id_col, vec_col)
        if bids is None:
            return _empty_partial()
        blabels = np.asarray(batch[label_col])
        valid = ref_labels[:, None] != blabels[None, :]
        return _select_topk(ref_ids, ref_mat @ bmat.T, bids, k, valid=valid)

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")
    return _finalize(partials, k)
