"""Join operators: broadcast dimension join (small side shipped once via
``ray.put``) and the portable partitioned hash join for two large sides
(co-partition both on a stable key hash, merge matching buckets pairwise in
``map_groups``).

The reference's only join is the MMDB lookup (itself a broadcast-style
lookup); these generalize the pattern for relational inputs. Partitioning
assumption of ``hash_join``: one bucket's rows from both sides fit a task —
pick ``num_buckets`` so rows/buckets is bounded, and salt hot keys upstream
if a single key dominates a bucket."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import pandas as pd
import pyarrow as pa

from .aggregate import stable_key_hash


def broadcast_join(
    ds,
    dim_table: pa.Table,
    left_key: str,
    right_key: str,
    how: str = "left",
):
    """Join a Dataset against a small in-memory dimension table: the dim
    table ships once (``ray.put``); each batch does a vectorized pandas
    merge. No shuffle."""
    import ray

    dim_ref = ray.put(dim_table.to_pandas())

    def join_batch(batch: pa.Table) -> pa.Table:
        dim = ray.get(dim_ref)
        left = batch.to_pandas()
        out = left.merge(dim, how=how, left_on=left_key, right_on=right_key)
        return pa.Table.from_pandas(out, preserve_index=False)

    return ds.map_batches(join_batch, batch_format="pyarrow")


def hash_join(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    num_buckets: int = 32,
    how: str = "inner",
):
    """Partitioned hash join of two Datasets: both sides gain a stable hash
    bucket on their key, buckets are co-located with one ``groupby`` over the
    union, and each bucket merges its two sides in pandas. The only
    all-to-all moves exactly the joined columns once."""

    # build one combined, explicitly-typed schema for BOTH tagged sides: a
    # plain union of disjoint schemas null-fills missing columns and silently
    # promotes int64 to float64 (lossy above 2^53) — typed nulls prevent that
    left_schema = left_ds.schema()
    right_schema = right_ds.schema()
    # a right-side column sharing a left-side name would be silently shadowed
    # in the unified schema; only the shared-name join key itself is allowed
    collisions = set(right_schema.names) & set(left_schema.names)
    if right_key == left_key:
        collisions.discard(right_key)
    if collisions:
        raise ValueError(
            "hash_join: right-side column(s) %s collide with left-side names; "
            "rename them before joining" % sorted(collisions)
        )
    left_fields = list(zip(left_schema.names, left_schema.types))
    right_fields = [
        (n, t) for n, t in zip(right_schema.names, right_schema.types)
        if n not in set(left_schema.names)
    ]
    all_fields = left_fields + right_fields
    left_cols = [n for n, _ in left_fields]
    right_cols = list(right_schema.names)

    def tag(side: str, key: str):
        def fn(batch: pa.Table) -> pa.Table:
            col = batch[key]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            n = batch.num_rows
            arrays, names = [], []
            for name, typ in all_fields:
                names.append(name)
                if name in batch.column_names:
                    c = batch[name]
                    arrays.append(c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c)
                else:
                    arrays.append(pa.nulls(n, type=typ))
            out = pa.Table.from_arrays(arrays, names=names)
            out = out.append_column("_bucket", stable_key_hash(col, num_buckets))
            return out.append_column("_side", pa.array([side] * n, type=pa.string()))

        return fn

    left_tagged = left_ds.map_batches(tag("l", left_key), batch_format="pyarrow")
    right_tagged = right_ds.map_batches(tag("r", right_key), batch_format="pyarrow")

    def merge_bucket(tbl: pa.Table) -> pa.Table:
        # split sides while still in Arrow and drop each side's null-filled
        # foreign columns BEFORE the pandas conversion — converting an int64
        # column that contains nulls would degrade it to float64 (lossy above
        # 2^53 and dtype-breaking); each side's own columns carry no
        # union-introduced nulls, so dtypes survive. Works for one-sided
        # buckets too (an empty typed side merges cleanly).
        import pyarrow.compute as pc

        lmask = pc.equal(tbl["_side"], "l")
        lrows = tbl.filter(lmask).select(left_cols).to_pandas()
        rrows = tbl.filter(pc.invert(lmask)).select(right_cols).to_pandas()
        out = lrows.merge(rrows, how=how, left_on=left_key, right_on=right_key)
        res = pa.Table.from_pandas(out, preserve_index=False)
        if how != "inner":
            # an outer merge null-fills the unmatched side, degrading its
            # int columns to float64 IN SOME BUCKETS ONLY (full-match
            # buckets keep int64) — cast back to the declared schema so
            # every block agrees; from_pandas already turned the NaNs into
            # nulls. Known residual: in a bucket with ≥1 unmatched row,
            # MATCHED right-side ints transit float64 too, so values above
            # 2^53 would round — use inner + explicit fill upstream if the
            # unmatched-side columns carry ids of that magnitude
            res = res.select([n for n, _ in all_fields]).cast(
                pa.schema(all_fields)
            )
        return res

    unioned = left_tagged.union(right_tagged)
    return unioned.groupby("_bucket").map_groups(merge_bucket, batch_format="pyarrow")


def hash_anti_join(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    num_buckets: int = 32,
):
    """Bucketed anti semi-join: left rows whose key matches NO right row
    (the "customers without orders" / "docs not in the dedup keeper set"
    shape when BOTH sides are large). The right side is projected to its
    key column and deduplicated per batch BEFORE the exchange, so the
    shuffle moves the left table plus only the right side's distinct keys —
    unlike the broadcast variant (``dedup.filter_non_keepers``), nothing
    has to fit in driver or single-task memory beyond one bucket.

    Null left keys match nothing and are therefore KEPT (SQL
    ``NOT EXISTS`` semantics, not ``NOT IN`` — a null never equals any
    right key)."""
    return _hash_exists_join(
        left_ds, right_ds, left_key, right_key, num_buckets, anti=True
    )


def hash_semi_join(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    num_buckets: int = 32,
):
    """Bucketed positive semi-join: left rows whose key matches AT LEAST
    ONE right row (SQL ``EXISTS``), without duplicating the left row per
    match the way an inner join would. Same exchange shape as
    :func:`hash_anti_join` — the right side ships only per-batch-distinct
    keys. Null left keys match nothing and are dropped."""
    return _hash_exists_join(
        left_ds, right_ds, left_key, right_key, num_buckets, anti=False
    )


def _hash_exists_join(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    num_buckets: int,
    anti: bool,
):
    import pyarrow.compute as pc

    left_schema = left_ds.schema()
    left_cols = list(left_schema.names)
    key_type = left_schema.types[left_cols.index(left_key)]

    def tag_left(batch: pa.Table) -> pa.Table:
        col = batch[left_key]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        out = batch.append_column("_bucket", stable_key_hash(col, num_buckets))
        return out.append_column(
            "_side", pa.array(["l"] * batch.num_rows, type=pa.string())
        )

    def tag_right(batch: pa.Table) -> pa.Table:
        # distinct non-null keys only, reshaped into the LEFT schema (all
        # other columns typed-null) so union needs no schema merge
        col = batch[right_key]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        keys = pc.unique(pc.cast(col, key_type).drop_null())
        n = len(keys)
        arrays = [
            keys if name == left_key else pa.nulls(n, type=typ)
            for name, typ in zip(left_schema.names, left_schema.types)
        ]
        out = pa.Table.from_arrays(arrays, names=left_cols)
        out = out.append_column("_bucket", stable_key_hash(keys, num_buckets))
        return out.append_column("_side", pa.array(["r"] * n, type=pa.string()))

    def filter_bucket(tbl: pa.Table) -> pa.Table:
        lmask = pc.equal(tbl["_side"], "l")
        left = tbl.filter(lmask)
        rkeys = tbl.filter(pc.invert(lmask))[left_key]
        if isinstance(rkeys, pa.ChunkedArray):
            rkeys = rkeys.combine_chunks()
        rkeys = pc.unique(rkeys)
        # null left key → is_in yields null → fill_null(False): no match —
        # the row survives the anti filter / drops from the semi filter
        hit = pc.fill_null(pc.is_in(left[left_key], value_set=rkeys), False)
        return left.filter(pc.invert(hit) if anti else hit).select(left_cols)

    left_tagged = left_ds.map_batches(tag_left, batch_format="pyarrow")
    right_tagged = right_ds.map_batches(tag_right, batch_format="pyarrow")
    unioned = left_tagged.union(right_tagged)
    return unioned.groupby("_bucket").map_groups(
        filter_bucket, batch_format="pyarrow"
    )


def _tag_time_sides(
    left_ds, right_ds, left_key, right_key, left_time, right_time,
    id_col, id_type, num_buckets,
):
    """Shared exchange prologue of the time-keyed joins (band / as-of):
    both sides reduce to (_k, _t[, id]) int64 columns plus bucket/side
    tags, so the co-partition ships keys and times only — never payloads."""
    import pyarrow.compute as pc

    def tag(side, key_col, time_col):
        def fn(batch: pa.Table) -> pa.Table:
            key = batch[key_col].combine_chunks() if isinstance(
                batch[key_col], pa.ChunkedArray) else batch[key_col]
            out = pa.table(
                {
                    "_k": pc.cast(key, pa.int64()),
                    "_t": pc.cast(batch[time_col], pa.int64()),
                    id_col: pc.cast(batch[id_col], id_type)
                    if side == "l"
                    else pa.nulls(batch.num_rows, type=id_type),
                }
            )
            out = out.append_column(
                "_bucket", stable_key_hash(key, num_buckets)
            )
            return out.append_column(
                "_side", pa.array([side] * batch.num_rows, type=pa.string())
            )

        return fn

    return (
        left_ds.map_batches(tag("l", left_key, left_time),
                            batch_format="pyarrow"),
        right_ds.map_batches(tag("r", right_key, right_time),
                             batch_format="pyarrow"),
    )


def _prep_time_bucket(block: pa.Table, id_col: str, pad: int):
    """Shared per-bucket prologue of the time-keyed joins: split sides
    (staying ARROW — a pandas conversion would degrade the null-filled id
    column to float64, lossy above 2^53), extract int64 key/time arrays
    with null masks, sort + dense-factorize the right side and lift times
    onto disjoint per-key integer bands (``offset > span + pad``). Returns
    None when the bucket has no left rows; ``ru`` is None when it has no
    usable right rows."""
    import numpy as np
    import pyarrow.compute as pc

    lmask = pc.equal(block["_side"], "l")
    l = block.filter(lmask)
    if l.num_rows == 0:
        return None
    ids = l[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    p = {
        "ids": ids,
        "lnull": np.asarray(pc.or_(pc.is_null(l["_k"]), pc.is_null(l["_t"]))),
        "lk": pc.fill_null(l["_k"], -1).to_numpy(zero_copy_only=False),
        "lt": pc.fill_null(l["_t"], 0).to_numpy(zero_copy_only=False),
        "ru": None,
    }
    r = block.filter(pc.invert(lmask))
    r = r.filter(pc.and_(pc.is_valid(r["_k"]), pc.is_valid(r["_t"])))
    if r.num_rows == 0:
        return p
    r = r.sort_by([("_k", "ascending"), ("_t", "ascending")])
    rk = r["_k"].to_numpy(zero_copy_only=False)
    rt = r["_t"].to_numpy(zero_copy_only=False)
    ru, r_counts = np.unique(rk, return_counts=True)
    seg_starts = np.zeros(len(ru) + 1, dtype=np.int64)
    np.cumsum(r_counts, out=seg_starts[1:])
    t0 = min(int(rt.min()), int(p["lt"].min()))
    span = max(int(rt.max()), int(p["lt"].max())) - t0
    lidx = np.searchsorted(ru, p["lk"])
    lidx_c = np.minimum(lidx, len(ru) - 1)
    p.update(
        ru=ru,
        r_counts=r_counts,
        rt=rt,
        seg_starts=seg_starts,
        t0=t0,
        offset=np.int64(span + pad + 2),
        lidx_c=lidx_c,
        valid=(ru[lidx_c] == p["lk"]) & ~p["lnull"],
    )
    return p


def band_join_counts(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    id_col: str,
    before: int,
    after: int,
    count_alias: str = "n_matches",
    num_buckets: int = 32,
):
    """Banded interval join, count form: for every left row, how many right
    rows share its key AND fall in the inclusive time band
    ``[t_left - before, t_left + after]`` (all times int64, e.g. epoch µs
    or days). The attribution / events-near-an-event shape — SQL
    ``JOIN ... ON k = k AND t BETWEEN t0 - b AND t0 + a`` — without ever
    materializing the matched pairs.

    Scale shape: both sides co-partition on a stable key hash (the only
    all-to-all, and it ships just (key, time[, id]) — never payloads);
    inside a bucket ONE vectorized pass handles every key: right rows sort
    by (key, time), keys dense-factorize, and times lift onto disjoint
    per-key integer bands (idx · OFFSET + t_rel with OFFSET > span +
    before + after) so TWO ``np.searchsorted`` calls bound every left
    row's matches at once. If keys × OFFSET would overflow int64
    (astronomical per-bucket key counts × multi-century spans), a
    per-key-segment loop with the same searchsorted math takes over —
    same answer, Python cost O(keys in bucket). Left rows whose key has no
    right rows count 0; null keys/times count 0."""
    import numpy as np

    left_schema = left_ds.schema()  # Ray schema wrapper: .names / .types
    id_type = left_schema.types[left_schema.names.index(id_col)]

    def per_bucket(block: pa.Table) -> pa.Table:
        p = _prep_time_bucket(block, id_col, pad=before + after)
        if p is None:
            return pa.table(
                {
                    id_col: pa.array([], type=id_type),
                    count_alias: pa.array([], type=pa.int64()),
                }
            )
        if p["ru"] is None:
            return pa.table(
                {id_col: p["ids"],
                 count_alias: pa.array(np.zeros(len(p["lk"]), dtype=np.int64))}
            )
        lt, rt, offset, t0 = p["lt"], p["rt"], p["offset"], p["t0"]
        lidx_c, valid, seg_starts = p["lidx_c"], p["valid"], p["seg_starts"]
        if len(p["ru"]) * int(offset) < (1 << 62):
            ridx = np.repeat(
                np.arange(len(p["ru"]), dtype=np.int64), p["r_counts"]
            )
            comp_r = ridx * offset + (rt - t0)
            base = lidx_c * offset + (lt - t0)
            lo = np.searchsorted(comp_r, base - before, side="left")
            hi = np.searchsorted(comp_r, base + after, side="right")
            n = np.where(valid, hi - lo, 0).astype(np.int64)
        else:  # overflow fallback: per-right-key-segment searchsorted
            n = np.zeros(len(p["lk"]), dtype=np.int64)
            for j in np.nonzero(valid)[0]:
                s, e = seg_starts[lidx_c[j]], seg_starts[lidx_c[j] + 1]
                seg = rt[s:e]
                n[j] = np.searchsorted(
                    seg, lt[j] + after, side="right"
                ) - np.searchsorted(seg, lt[j] - before, side="left")
        return pa.table({id_col: p["ids"], count_alias: pa.array(n)})

    left_tagged, right_tagged = _tag_time_sides(
        left_ds, right_ds, left_key, right_key, left_time, right_time,
        id_col, id_type, num_buckets,
    )
    return (
        left_tagged.union(right_tagged)
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def skew_aware_hash_join(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    num_buckets: int = 32,
    hot_count_threshold: int = 1_000_000,
    max_hot_rows: int = 1_000_000,
):
    """Partitioned hash join with hot-key mitigation: keys whose LEFT-side
    row count reaches ``hot_count_threshold`` never enter the exchange —
    their (provably few) right-side rows broadcast once via ``ray.put`` and
    the hot left rows join map-side; only the cold remainder flows through
    the bucketed :func:`hash_join`. The standard fix for the one-hot-key-=
    -one-giant-task failure mode of any co-partitioned join.

    Guard: the broadcast side is bounded — if the hot keys' right rows
    exceed ``max_hot_rows`` this raises instead of silently shipping an
    unbounded table to every task (pick a higher threshold, or salt).
    Inner-join semantics, same output columns as ``hash_join``."""
    import numpy as np
    import pyarrow.compute as pc
    import ray

    from .aggregate import _partial_counts, bucket_by_key

    # exact per-key left counts, finalized in key-hash buckets with the hot
    # filter applied INSIDE each bucket task — the key space can be
    # arbitrarily large (it's a join key), so the |keys|-sized table must
    # never coalesce into one block (tree_sum/grouped_counts would) and
    # only the hot rows may reach the driver
    partials = left_ds.select_columns([left_key]).map_batches(
        _partial_counts([left_key], "_cnt"), batch_format="pyarrow"
    )

    def bucket_hot(block: pd.DataFrame) -> pd.DataFrame:
        g = block.groupby(left_key, sort=False)["_cnt"].sum().reset_index()
        return g[g["_cnt"] >= hot_count_threshold]

    hot_tbl = (
        bucket_by_key(partials, left_key, num_buckets)
        .groupby("_bucket")
        .map_groups(bucket_hot, batch_format="pandas")
        .to_pandas()
    )
    if not len(hot_tbl):
        return hash_join(
            left_ds, right_ds, left_key, right_key, num_buckets=num_buckets
        )
    hot_keys = np.sort(hot_tbl[left_key].to_numpy())
    # hot keys are FEW by definition — ship them in the task closure (built
    # once here, not per batch). NOTE the deliberate re-scan trade: the left
    # lineage executes once for detection and once per split; at fleet
    # scale re-reading a streaming source beats materializing it in the
    # object store (same argument as clustering.kmeans_fit's per-round
    # re-read) — callers with an expensive upstream chain should
    # materialize() it themselves before calling this.
    hot_value_set = pa.array(hot_keys)

    def split(key_name: str, keep_hot: bool):
        def fn(batch: pa.Table) -> pa.Table:
            mask = pc.fill_null(
                pc.is_in(batch[key_name], value_set=hot_value_set), False
            )
            return batch.filter(mask if keep_hot else pc.invert(mask))

        return fn

    right_hot_df = (
        right_ds.map_batches(split(right_key, True), batch_format="pyarrow")
        .to_pandas()
    )
    if len(right_hot_df) > max_hot_rows:
        raise ValueError(
            "skew_aware_hash_join: %d right-side rows for %d hot keys exceed "
            "max_hot_rows=%d — raise hot_count_threshold or salt the key"
            % (len(right_hot_df), len(hot_keys), max_hot_rows)
        )
    right_hot_ref = ray.put(right_hot_df)

    # output column contract must match hash_join: left cols + right-only.
    # The explicit schema matters: from_pandas on an EMPTY merged batch
    # would infer null type for string columns and poison the hot∪cold
    # union with inconsistent block schemas.
    lsch, rsch = left_ds.schema(), right_ds.schema()
    type_of = dict(zip(rsch.names, rsch.types))
    type_of.update(dict(zip(lsch.names, lsch.types)))
    left_names = list(lsch.names)
    out_cols = left_names + [n for n in rsch.names if n not in set(left_names)]
    out_schema = pa.schema([(n, type_of[n]) for n in out_cols])

    def join_hot(batch: pa.Table) -> pa.Table:
        rh = ray.get(right_hot_ref)
        out = batch.to_pandas().merge(
            rh, how="inner", left_on=left_key, right_on=right_key
        )
        return pa.Table.from_pandas(
            out[out_cols], schema=out_schema, preserve_index=False
        )

    hot_joined = left_ds.map_batches(
        split(left_key, True), batch_format="pyarrow"
    ).map_batches(join_hot, batch_format="pyarrow")

    cold_joined = hash_join(
        left_ds.map_batches(split(left_key, False), batch_format="pyarrow"),
        right_ds.map_batches(split(right_key, False), batch_format="pyarrow"),
        left_key,
        right_key,
        num_buckets=num_buckets,
    ).map_batches(
        lambda b: b.select(out_cols), batch_format="pyarrow"
    )
    return hot_joined.union(cold_joined)


def asof_join_time(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    id_col: str,
    matched_alias: str = "matched_t",
    num_buckets: int = 32,
):
    """Two-table AS-OF join, time form: for every left row the GREATEST
    right time ≤ its own time among rows sharing the key (null when none) —
    SQL's ``ASOF JOIN`` / correlated ``max(t2) WHERE t2 <= t1``. Unlike the
    same-table :func:`~.windows.asof_last_event` carry-forward, the two
    sides are different relations.

    Same exchange and kernel family as :func:`band_join_counts`: key-hash
    co-partition ships only (key, time[, id]); per bucket the right side
    sorts by (key, time), keys dense-factorize, times lift onto disjoint
    per-key integer bands, and ONE ``np.searchsorted(side='right') - 1``
    finds every left row's predecessor. Returning the matched TIME (not an
    arbitrary matching row) keeps the operator deterministic under ties —
    exactly what a hash-stable oracle needs. Null keys/times match null.
    Arrow end-to-end (no pandas), so times above 2^53 stay exact."""
    import numpy as np
    import pyarrow.compute as pc

    left_schema = left_ds.schema()
    id_type = left_schema.types[left_schema.names.index(id_col)]

    def per_bucket(block: pa.Table) -> pa.Table:
        p = _prep_time_bucket(block, id_col, pad=0)
        if p is None:
            return pa.table(
                {
                    id_col: pa.array([], type=id_type),
                    matched_alias: pa.array([], type=pa.int64()),
                }
            )
        if p["ru"] is None:
            return pa.table(
                {id_col: p["ids"],
                 matched_alias: pa.nulls(len(p["lk"]), type=pa.int64())}
            )
        lt, rt, offset, t0 = p["lt"], p["rt"], p["offset"], p["t0"]
        lidx_c, valid, seg_starts = p["lidx_c"], p["valid"], p["seg_starts"]
        if len(p["ru"]) * int(offset) < (1 << 62):
            ridx = np.repeat(
                np.arange(len(p["ru"]), dtype=np.int64), p["r_counts"]
            )
            comp_r = ridx * offset + (rt - t0)
            pos = np.searchsorted(
                comp_r, lidx_c * offset + (lt - t0), side="right"
            ) - 1
            # predecessor must exist INSIDE the key's own segment
            in_seg = pos >= seg_starts[lidx_c]
            ok = valid & in_seg
            pos_c = np.maximum(pos, 0)
            matched = np.where(ok, rt[pos_c], 0)
        else:  # overflow fallback: per-segment searchsorted
            ok = np.zeros(len(p["lk"]), dtype=bool)
            matched = np.zeros(len(p["lk"]), dtype=np.int64)
            for j in np.nonzero(valid)[0]:
                s, e = seg_starts[lidx_c[j]], seg_starts[lidx_c[j] + 1]
                pred = s + np.searchsorted(rt[s:e], lt[j], side="right") - 1
                if pred >= s:
                    ok[j] = True
                    matched[j] = rt[pred]
        out_t = pc.if_else(
            pa.array(ok), pa.array(matched), pa.scalar(None, type=pa.int64())
        )
        return pa.table({id_col: p["ids"], matched_alias: out_t})

    left_tagged, right_tagged = _tag_time_sides(
        left_ds, right_ds, left_key, right_key, left_time, right_time,
        id_col, id_type, num_buckets,
    )
    return (
        left_tagged.union(right_tagged)
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def bloom_prefilter_join(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    num_buckets: int = 32,
    m_bits: int = 1 << 23,
    k: int = 7,
):
    """Runtime-filter join (sideways information passing, the Spark/Trino
    "dynamic filter" pattern): build a Bloom filter over the RIGHT side's
    join keys — per-batch partial bitmaps, bitwise-OR tree reduce, ONE
    broadcast object — then drop every LEFT row whose key definitely has no
    match BEFORE the exchange, and run the exact partitioned
    :func:`hash_join` on the survivors. Bloom false positives only cost
    shuffle bytes (the exact join removes them); false negatives cannot
    happen, so the result is bit-identical to ``hash_join`` (pinned by
    test). Inner semantics; null left keys are definite non-matches and
    drop at the prefilter.

    When to reach for it: the right key set is too big to broadcast
    exactly (a ``pc.is_in`` semi-join wants the materialized key array)
    but the left side is mostly non-matching — log enrichment against a
    bounded entity table, selective dimension subsets against a fact
    table. At ~10 bits/key a 10⁹-key filter is ~1.2 GB: still one
    broadcast where the exact key set would be 8+ GB; beyond that shard
    the filter by hash prefix (see ``BloomFilter``).

    Integer join keys (the common case in this engine); hash any other
    type to int64 upstream."""
    import numpy as np
    import pyarrow.compute as pc
    import ray

    from ..functions.sketches import BloomFilter, _mix64

    def _key_hashes(col) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if not pa.types.is_integer(col.type):
            raise TypeError(
                "bloom_prefilter_join: integer join keys required, got %s"
                % col.type
            )
        ids = col.drop_null().cast(pa.int64()).to_numpy(zero_copy_only=False)
        return _mix64(ids.view(np.uint64))

    def partial_bloom(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(m_bits, k)
        bf.add_hashes(_key_hashes(batch[right_key]))
        return pa.table(
            {"bits": pa.array([bf.bits.tobytes()], type=pa.binary())}
        )

    def or_combine(batch: pa.Table) -> pa.Table:
        acc = None
        for buf in batch["bits"].to_pylist():
            arr = np.frombuffer(buf, dtype=np.uint64)
            acc = arr.copy() if acc is None else (acc | arr)
        if acc is None:
            acc = np.zeros(m_bits // 64, dtype=np.uint64)
        return pa.table({"bits": pa.array([acc.tobytes()], type=pa.binary())})

    combined = (
        right_ds.map_batches(partial_bloom, batch_format="pyarrow")
        .map_batches(
            or_combine, batch_format="pyarrow", batch_size=1 << 20,
            num_cpus=0.9,
        )
        .repartition(1)
        .map_batches(or_combine, batch_format="pyarrow", batch_size=None)
    )
    bloom = BloomFilter(m_bits, k)
    bloom.bits = np.frombuffer(
        combined.to_pandas()["bits"].iloc[0], dtype=np.uint64
    ).copy()
    bloom_ref = ray.put(bloom)

    def prefilter(batch: pa.Table) -> pa.Table:
        col = batch[left_key]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        batch = batch.filter(col.is_valid())
        if not batch.num_rows:
            return batch
        bf = ray.get(bloom_ref)
        keep = bf.contains(_key_hashes(batch[left_key]))
        return batch.filter(pa.array(keep))

    survivors = left_ds.map_batches(prefilter, batch_format="pyarrow")
    return hash_join(
        survivors, right_ds, left_key, right_key, num_buckets=num_buckets
    )


def join_sample(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str,
    left_id: str,
    right_id: str,
    k: int,
    seed: int = 20240801,
    num_buckets: int = 32,
):
    """Deterministic sample of ``k`` join tuples WITHOUT materializing the
    join (the streaming-sampling-over-joins idea, EDBT 2023: the join's
    tuple count factorizes per key as nL·nR, so a global index space over
    the virtual result exists before any tuple does).

    1. Per-key counts on each side (tiny groupby each) → inner-merge on
       the key → per-key weight w = nL·nR, cumulative bases, total N.
       The count table is the join-key stratum index and must fit the
       driver — the operator's documented partitioning assumption (join
       keys are dimension-like; for web-scale key spaces, sample the key
       table hierarchically first).
    2. The first ``k`` DISTINCT values of a fixed-length MINSTD stream
       (x → x·48271 mod 2³¹−1, 8k steps) taken mod N are the sampled
       global indices — reproducible in SQL by a recursive CTE, no RNG
       state ambiguity. Index g maps to (key, i, j) by range lookup:
       i = (g−base)//nR is the left rank, j = (g−base) mod nR the right.
    3. Each side filters to the sampled keys (broadcast ``pc.is_in``),
       ranks the survivors per key by id (bucketed sort+cumcount) and
       keeps exactly the wanted ranks — only sampled-key rows move, and
       only ≤k rows leave each side.

    Returns a pandas DataFrame (left_key, <left_id>, <right_id>) sorted by
    all three — ≤k rows (fewer only if the stream yields <k distinct
    indices, identically in both engines)."""
    import numpy as np
    import pyarrow.compute as pc

    from .aggregate import bucket_by_key, grouped_counts

    cl = grouped_counts(left_ds, [left_key], count_alias="_nl").to_pandas()
    cr = grouped_counts(right_ds, [right_key], count_alias="_nr").to_pandas()
    cl = cl[cl[left_key].notna()]
    m = cl.merge(
        cr, left_on=left_key, right_on=right_key, how="inner"
    ).sort_values(left_key)
    if not len(m):
        return pd.DataFrame({left_key: [], left_id: [], right_id: []})
    w = (m["_nl"] * m["_nr"]).to_numpy(dtype=np.int64)
    base = np.concatenate(([0], np.cumsum(w)[:-1]))
    total = int(w.sum())

    x, seen, idx = seed, set(), []
    for _ in range(8 * k):
        x = x * 48271 % 2147483647
        g = x % total
        if g not in seen:
            seen.add(g)
            idx.append(g)
            if len(idx) == k:
                break
    g_arr = np.array(idx, dtype=np.int64)
    pos = np.searchsorted(base, g_arr, side="right") - 1
    off = g_arr - base[pos]
    nr = m["_nr"].to_numpy(dtype=np.int64)[pos]
    keys = m[left_key].to_numpy()[pos]
    want = pd.DataFrame(
        {"_key": keys, "_i": off // nr, "_j": off % nr}
    )

    def fetch(ds, key_col, id_col, rank_col, wanted: pd.DataFrame):
        kset = pa.array(pd.unique(wanted["_key"]))

        def filt(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.is_in(batch[key_col], value_set=kset))
            return pa.table(
                {
                    key_col: t[key_col],
                    id_col: pc.cast(t[id_col], pa.int64()),
                }
            )

        # two sampled tuples may share this side's (key, rank) — dedupe so
        # the row-fetch merge stays one row per wanted rank
        ranks = (
            wanted[["_key", rank_col]]
            .drop_duplicates()
            .rename(columns={"_key": key_col, rank_col: "_rk"})
        )

        def per_bucket(block: pd.DataFrame) -> pd.DataFrame:
            b = block.sort_values([key_col, id_col])
            rk = b.groupby(key_col, sort=False).cumcount()
            b = b.assign(_rk=rk.to_numpy())
            sel = b.merge(ranks, on=[key_col, "_rk"])
            return sel[[key_col, id_col, "_rk"]]

        bucketed = bucket_by_key(
            ds.map_batches(filt, batch_format="pyarrow"), key_col, num_buckets
        )
        return (
            bucketed.groupby("_bucket")
            .map_groups(per_bucket, batch_format="pandas")
            .to_pandas()  # ≤k rows by construction
        )

    lrows = fetch(left_ds, left_key, left_id, "_i", want)
    rrows = fetch(right_ds, right_key, right_id, "_j", want)
    out = (
        want.merge(
            lrows.rename(columns={left_key: "_key", "_rk": "_i"}),
            on=["_key", "_i"],
        )
        .merge(
            rrows.rename(columns={right_key: "_key", "_rk": "_j"}),
            on=["_key", "_j"],
        )
        .rename(columns={"_key": left_key})[[left_key, left_id, right_id]]
        .sort_values([left_key, left_id, right_id])
        .reset_index(drop=True)
    )
    return out
