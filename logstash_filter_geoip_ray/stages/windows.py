"""Stream-shaped operators over the ``events`` table (ts-ordered log):
tumbling-window aggregates and gap-based sessionization.

Ray Data has no event-time window primitive; windows are expressed as
bucketed groupbys (tumbling) and per-key sorted ``map_groups`` (sessions) —
the partitioning assumption is that one key's events fit one group task,
which holds when keys are users/conversations. Value sums are carried as
integer milli-units so oracle comparisons are exact (no float-summation
order sensitivity)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def tumbling_window_counts(
    ds,
    width_sec: int = 3600,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
):
    """Per (key, window) event count + sum(value) in integer millis.
    Window = floor(epoch_seconds / width). Partial-aggregated per batch."""
    from ray.data.aggregate import Sum

    def per_batch(batch: pa.Table) -> pa.Table:
        # integer µs arithmetic end-to-end — matches the oracle's
        # epoch_us(ts) // (width*1e6) with no float rounding in either engine
        epoch_us = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        window = pc.divide(epoch_us, pa.scalar(width_sec * 1_000_000, type=pa.int64()))
        value_milli = pc.cast(pc.floor(pc.multiply(batch[value_col], 1000.0)), pa.int64())
        work = pa.table(
            {
                key_col: batch[key_col],
                "window_id": window,
                "value_milli": value_milli,
            }
        )
        agg = work.group_by([key_col, "window_id"]).aggregate(
            [("value_milli", "sum"), ([], "count_all")]
        )
        return agg.rename_columns([key_col, "window_id", "value_milli", "n"])

    partials = ds.map_batches(per_batch, batch_format="pyarrow")
    return (
        partials.groupby([key_col, "window_id"])
        .aggregate(Sum("value_milli", alias_name="value_milli"), Sum("n", alias_name="n"))
        .sort([key_col, "window_id"])
    )


def hopping_window_counts(
    ds,
    width_sec: int = 3600,
    hop_sec: int = 900,
    ts_col: str = "ts",
    key_col: str = "event_type",
):
    """Per (key, hop-window) event count for OVERLAPPING windows: window w
    covers [w·hop, w·hop + width), so each event belongs to width/hop
    consecutive windows (identified by start bucket w). Expressed as a
    vectorized row-explosion inside ``map_batches`` (np.repeat over the
    per-event window ranges — no Python loop) followed by the partial-count
    path. Shuffle volume = (width/hop) × partial rows, never raw events."""
    from ray.data.aggregate import Sum

    if width_sec % hop_sec != 0:
        raise ValueError(
            "hopping_window_counts: width_sec (%d) must be a multiple of "
            "hop_sec (%d)" % (width_sec, hop_sec)
        )
    k = width_sec // hop_sec

    def per_batch(batch: pa.Table) -> pa.Table:
        epoch_us = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        last = np.asarray(
            pc.divide(epoch_us, pa.scalar(hop_sec * 1_000_000, type=pa.int64()))
        )
        # event at hop-bucket b is inside windows starting at b-k+1 .. b
        # (clipped at 0 on the stream start): ragged explode via np.repeat
        first = np.maximum(last - (k - 1), 0)
        counts = (last - first + 1).astype(np.int64)
        total = int(counts.sum())
        offs = np.cumsum(counts) - counts
        win = np.repeat(first, counts) + (np.arange(total) - np.repeat(offs, counts))
        keys = batch[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        idx = pa.array(np.repeat(np.arange(len(last)), counts))
        work = pa.table(
            {
                key_col: pc.take(keys, idx),
                "window_id": pa.array(win, type=pa.int64()),
            }
        )
        agg = work.group_by([key_col, "window_id"]).aggregate([([], "count_all")])
        return agg.rename_columns([key_col, "window_id", "n"])

    partials = ds.map_batches(per_batch, batch_format="pyarrow")
    return (
        partials.groupby([key_col, "window_id"])
        .aggregate(Sum("n", alias_name="n"))
        .sort([key_col, "window_id"])
    )


def asof_last_event(
    ds,
    marker_type: str = "signup",
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
    alias: str = "last_marker_us",
    num_buckets: int = 64,
):
    """As-of join within an event stream: for every event, the µs timestamp
    of the same key's most recent ``marker_type`` event at-or-before it
    (self-inclusive). The classic per-key ordered carry-forward — order by
    (key, ts, id) and segmented-cummax the marker timestamps.

    Scale shape: keys co-locate by stable hash bucket (bounded task count);
    inside a bucket ALL keys are processed in one vectorized pass (pandas
    grouped ``cummax`` — C-speed, no Python call per key). Deterministic tie
    order (ts, id) matches the SQL window oracle exactly."""
    from .aggregate import bucket_by_key

    def per_bucket(block: pd.DataFrame) -> pd.DataFrame:
        b = block.sort_values([key_col, ts_col, id_col])
        # normalize to µs explicitly — the int64 view of a datetime64 column
        # follows the SOURCE unit (ns-written parquet would be 1000x off)
        ts_us = b[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        is_marker = (b[type_col] == marker_type).to_numpy()
        int_min = np.int64(np.iinfo(np.int64).min)
        vals = np.where(is_marker, ts_us, int_min)
        keys = b[key_col].to_numpy()
        seg_start = np.ones(len(b), dtype=bool)
        seg_start[1:] = keys[1:] != keys[:-1]
        seg_id = np.cumsum(seg_start)
        carried = pd.Series(vals).groupby(seg_id).cummax().to_numpy()
        # no-marker-yet → -1 (avoids a nullable-int column whose pandas/
        # DuckDB dtype conversions diverge in the driver comparison)
        carried = np.where(carried == int_min, np.int64(-1), carried)
        return pd.DataFrame({id_col: b[id_col].to_numpy(), alias: carried})

    bucketed = bucket_by_key(
        ds.select_columns([key_col, ts_col, type_col, id_col]), key_col, num_buckets
    )
    return (
        bucketed.groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .sort(id_col)
    )


def latest_events(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    value_col: str = "value",
    num_buckets: int = 64,
):
    """Last-write-wins compaction (the CDC / upsert-log / state-snapshot
    shape): one row per key — the event with the greatest (ts, id). Values
    are normalized to integer µs / milli at the partial stage so the result
    is hash-exact against the SQL ``row_number() = 1`` oracle.

    Scale shape: per-batch partial keep-max first (a batch collapses to at
    most its distinct-key count BEFORE any exchange), then key-hash buckets
    and the same keep-max per bucket — the shuffle moves per-batch winners,
    never raw events. This is the compaction pattern a 100 TB changelog
    needs: each wave of input shrinks to |keys| rows map-side."""
    from .aggregate import bucket_by_key

    def to_ints(batch: pa.Table) -> pa.Table:
        ts_us = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        v_milli = pc.cast(pc.floor(pc.multiply(batch[value_col], 1000.0)), pa.int64())
        return pa.table(
            {
                key_col: batch[key_col],
                id_col: batch[id_col],
                "ts_us": ts_us,
                type_col: batch[type_col],
                "value_milli": v_milli,
            }
        )

    def keep_max(block: pd.DataFrame) -> pd.DataFrame:
        b = block.sort_values([key_col, "ts_us", id_col])
        return b.groupby(key_col, sort=False).tail(1)[
            [key_col, id_col, "ts_us", type_col, "value_milli"]
        ]

    partials = ds.map_batches(to_ints, batch_format="pyarrow").map_batches(
        keep_max, batch_format="pandas"
    )
    bucketed = bucket_by_key(partials, key_col, num_buckets)
    return (
        bucketed.groupby("_bucket")
        .map_groups(keep_max, batch_format="pandas")
        .sort(key_col)
    )


def event_deltas(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_buckets: int = 64,
):
    """Per-key lag delta: for every event, the µs gap to the same key's
    previous event in (ts, id) order (-1 for a key's first event) — the
    inter-arrival-time feature of every sessionization / bot-detection
    pipeline, and the LAG() window shape in SQL.

    Scale shape: key-hash buckets co-locate a key's events; inside a bucket
    ONE vectorized pass (sort + np.diff + segment mask) computes every key's
    deltas — no per-key Python."""
    from .aggregate import bucket_by_key

    def per_bucket(block: pd.DataFrame) -> pd.DataFrame:
        b = block.sort_values([key_col, ts_col, id_col])
        ts_us = b[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        keys = b[key_col].to_numpy()
        gap = np.empty(len(b), dtype=np.int64)
        gap[0:1] = -1
        if len(b) > 1:
            gap[1:] = np.where(keys[1:] != keys[:-1], -1, np.diff(ts_us))
        return pd.DataFrame({id_col: b[id_col].to_numpy(), "gap_us": gap})

    bucketed = bucket_by_key(
        ds.select_columns([key_col, ts_col, id_col]), key_col, num_buckets
    )
    return (
        bucketed.groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .sort(id_col)
    )


def rolling_window_sums(
    ds,
    window_sec: int = 3600,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    num_buckets: int = 64,
):
    """Per-event trailing range window: count + sum(value_milli) of the same
    key's events with ts in [ts_i - window, ts_i] — SQL's ``RANGE BETWEEN
    INTERVAL w PRECEDING AND CURRENT ROW`` (boundary inclusive, and ALL
    peer rows sharing the current ts are included, exactly as SQL RANGE
    frames do).

    Scale shape: key-hash buckets; inside a bucket a single vectorized pass
    over ALL keys — timestamps are lifted onto disjoint per-segment integer
    bands (seg_id · OFFSET + ts_rel with OFFSET > range + window), making
    the whole bucket monotone so TWO np.searchsorted calls find every row's
    frame bounds at once; prefix sums turn the bounds into counts/sums. If
    segments × OFFSET would overflow int64 (astronomical key counts per
    bucket × multi-century spans), a per-segment loop with the same
    searchsorted math takes over — same answer, Python cost O(keys)."""
    from .aggregate import bucket_by_key

    w_us = np.int64(window_sec) * 1_000_000

    def per_bucket(block: pd.DataFrame) -> pd.DataFrame:
        b = block.sort_values([key_col, ts_col, id_col])
        ts_us = b[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        v_milli = np.floor(b[value_col].to_numpy() * 1000.0).astype(np.int64)
        keys = b[key_col].to_numpy()
        n = len(b)
        new_seg = np.ones(n, dtype=bool)
        new_seg[1:] = keys[1:] != keys[:-1]
        seg_id = np.cumsum(new_seg) - 1  # 0-based
        ts_rel = ts_us - ts_us.min()
        span = np.int64(ts_rel.max()) if n else np.int64(0)
        offset = span + w_us + 2
        n_segs = int(seg_id[-1]) + 1 if n else 0
        if n and n_segs * offset < (1 << 62):
            adj = seg_id * offset + ts_rel
            lo = np.searchsorted(adj, adj - w_us, side="left")
            hi = np.searchsorted(adj, adj, side="right")
        else:  # overflow fallback: per-segment searchsorted, same bounds
            lo = np.empty(n, dtype=np.int64)
            hi = np.empty(n, dtype=np.int64)
            starts = np.flatnonzero(new_seg)
            ends = np.append(starts[1:], n)
            for s, e in zip(starts, ends):
                seg = ts_rel[s:e]
                lo[s:e] = s + np.searchsorted(seg, seg - w_us, side="left")
                hi[s:e] = s + np.searchsorted(seg, seg, side="right")
        csum = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(v_milli, out=csum[1:])
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "n_win": hi - lo,
                "v_milli_win": csum[hi] - csum[lo],
            }
        )

    bucketed = bucket_by_key(
        ds.select_columns([key_col, ts_col, id_col, value_col]), key_col, num_buckets
    )
    return (
        bucketed.groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .sort(id_col)
    )


def running_totals(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    num_buckets: int = 64,
):
    """Per-key running totals (SQL ``ROWS UNBOUNDED PRECEDING`` frame): for
    every event, the count and integer-milli value sum of the same key's
    events at-or-before it in (ts, id) order — the cumulative-spend /
    events-so-far feature.

    Scale shape: key-hash buckets; inside a bucket ONE global cumsum with
    per-segment rebasing (subtract the segment-start prefix) computes every
    key's running totals — no per-key work of any kind."""
    from .aggregate import bucket_by_key

    def per_bucket(block: pd.DataFrame) -> pd.DataFrame:
        b = block.sort_values([key_col, ts_col, id_col])
        v_milli = np.floor(b[value_col].to_numpy() * 1000.0).astype(np.int64)
        keys = b[key_col].to_numpy()
        n = len(b)
        new_seg = np.ones(n, dtype=bool)
        new_seg[1:] = keys[1:] != keys[:-1]
        pos = np.arange(n, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(new_seg, pos, 0))
        cs = np.cumsum(v_milli)
        base = cs[seg_start] - v_milli[seg_start]
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "run_n": pos - seg_start + 1,
                "run_v_milli": cs - base,
            }
        )

    bucketed = bucket_by_key(
        ds.select_columns([key_col, ts_col, id_col, value_col]), key_col, num_buckets
    )
    return (
        bucketed.groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .sort(id_col)
    )


def value_ranks(
    ds,
    key_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
    num_buckets: int = 32,
):
    """Dense rank of every event's value within its partition key (SQL
    ``dense_rank() OVER (PARTITION BY key ORDER BY value DESC)``), on the
    integer-milli value so ties are exact in both engines.

    Scale shape — dense rank depends only on the DISTINCT (key, value)
    pairs, so the rows themselves never co-locate by key:
      1. per-batch distinct (key, value) pairs → global distinct via one
         groupby (shuffle volume = distinct pairs, not rows);
      2. ranks computed per KEY bucket over distinct pairs only — a hot
         key costs one task |distinct values|, not |rows|;
      3. the rank table hash-joins back to the rows on a composite
         (key, value) string key — both sides large, partitioned join.
    A per-key-rows groupby.rank would put one event type's entire row set
    in a single task — the anti-pattern this formulation avoids."""
    from .aggregate import bucket_by_key
    from .joins import hash_join

    def to_milli(batch: pa.Table) -> pa.Table:
        v = pc.cast(pc.floor(pc.multiply(batch[value_col], 1000.0)), pa.int64())
        combo = pc.binary_join_element_wise(
            pc.cast(batch[key_col], pa.string()),
            pc.cast(v, pa.string()),
            "\x1f",
        )
        return pa.table(
            {id_col: batch[id_col], "value_milli": v, "_kv": combo}
        )

    rows = ds.map_batches(to_milli, batch_format="pyarrow")

    def batch_distinct(batch: pa.Table) -> pa.Table:
        v = pc.cast(pc.floor(pc.multiply(batch[value_col], 1000.0)), pa.int64())
        return (
            pa.table({key_col: batch[key_col], "v": v})
            .group_by([key_col, "v"])
            .aggregate([])
        )

    pairs = (
        ds.map_batches(batch_distinct, batch_format="pyarrow")
        .groupby([key_col, "v"])
        .count()
        .select_columns([key_col, "v"])
    )

    def rank_bucket(block: pd.DataFrame) -> pd.DataFrame:
        b = block.sort_values([key_col, "v"], ascending=[True, False])
        keys = b[key_col].to_numpy()
        new_seg = np.ones(len(b), dtype=bool)
        new_seg[1:] = keys[1:] != keys[:-1]
        pos = np.arange(len(b), dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(new_seg, pos, 0))
        kv = (
            b[key_col].astype(str) + "\x1f" + b["v"].astype(np.int64).astype(str)
        ).to_numpy()
        # Arrow output: hash_join reads .schema() of both sides and needs
        # real Arrow types (a pandas block would surface numpy dtypes)
        return pa.table(
            {
                "kv": pa.array(kv, type=pa.string()),
                "rnk": pa.array(pos - seg_start + 1, type=pa.int64()),
            }
        )

    # materialize the |distinct (key,value)|-sized rank table: hash_join's
    # schema() peek would otherwise execute the distinct+rank shuffle once
    # for the schema and again for the tag stage (Ray 2.49)
    ranked = (
        bucket_by_key(pairs, key_col, num_buckets)
        .groupby("_bucket")
        .map_groups(rank_bucket, batch_format="pandas")
        .materialize()
    )
    joined = hash_join(rows, ranked, "_kv", "kv", num_buckets=num_buckets)
    return joined.select_columns([id_col, "value_milli", "rnk"]).sort(id_col)


def type_transitions(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    num_buckets: int = 64,
):
    """Markov transition counts over the per-key event stream: how often
    type A is immediately followed by type B within the same key's (ts, id)
    order — the session-flow / funnel matrix. A key's first event has no
    predecessor and contributes nothing.

    Scale shape: key-hash buckets; per bucket one vectorized shift builds
    the (prev, next) pairs and a pandas groupby counts them; the global
    combine is a tiny |types|² tree sum."""
    from .aggregate import bucket_by_key, tree_sum

    def per_bucket(block: pd.DataFrame) -> pd.DataFrame:
        b = block.sort_values([key_col, ts_col, id_col])
        keys = b[key_col].to_numpy()
        types = b[type_col].to_numpy()
        if len(b) < 2:
            return pd.DataFrame(
                {"prev_type": [], "next_type": [], "n": []}
            ).astype({"prev_type": str, "next_type": str, "n": np.int64})
        same = keys[1:] == keys[:-1]
        pairs = pd.DataFrame(
            {"prev_type": types[:-1][same], "next_type": types[1:][same]}
        )
        g = pairs.groupby(["prev_type", "next_type"], sort=False).size().reset_index()
        g.columns = ["prev_type", "next_type", "n"]
        g["n"] = g["n"].astype(np.int64)
        return g

    bucketed = bucket_by_key(
        ds.select_columns([key_col, ts_col, id_col, type_col]), key_col, num_buckets
    )
    partials = bucketed.groupby("_bucket").map_groups(
        per_bucket, batch_format="pandas"
    )
    return tree_sum(partials, ["prev_type", "next_type"], ["n"], sort_result=True)


def sessionize(
    ds,
    gap_sec: int = 1800,
    ts_col: str = "ts",
    key_col: str = "user_id",
    num_buckets: int = 64,
):
    """Gap-based sessions per key: a new session starts when the gap from the
    previous event exceeds ``gap_sec``. Output: (user_id, n_events,
    n_sessions, max_session_events) — ints only.

    Scale shape: keys co-locate by stable hash bucket; one vectorized pass
    per bucket (boundary mask + cumsum + two pandas groupbys) computes every
    key's sessions — no Python call per key."""
    from .aggregate import bucket_by_key

    def per_bucket(block: pd.DataFrame) -> pd.DataFrame:
        b = block.sort_values([key_col, ts_col])
        ts = b[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        keys = b[key_col].to_numpy()
        new_session = np.ones(len(b), dtype=bool)
        if len(b) > 1:
            gap_break = np.diff(ts) > gap_sec * 1_000_000
            key_break = keys[1:] != keys[:-1]
            new_session[1:] = gap_break | key_break
        session_ids = np.cumsum(new_session)  # globally increasing per bucket
        df = pd.DataFrame({key_col: keys, "_s": session_ids})
        sess_sizes = df.groupby([key_col, "_s"], sort=True).size()
        per_key = sess_sizes.groupby(level=0)
        n_events = df.groupby(key_col, sort=True).size()
        return pd.DataFrame(
            {
                key_col: n_events.index.to_numpy(),
                "n_events": n_events.to_numpy(),
                "n_sessions": per_key.size().to_numpy(),
                "max_session_events": per_key.max().to_numpy(),
            }
        )

    bucketed = bucket_by_key(ds.select_columns([key_col, ts_col]), key_col, num_buckets)
    return (
        bucketed.groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .sort(key_col)
    )


def ntile_stats(
    ds,
    k: int = 4,
    key_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    num_buckets: int = 16,
):
    """SQL ``NTILE(k)`` per partition with exact remainder semantics (the
    first ``n % k`` tiles get the extra row), order = (value, id), reduced
    to per-(key, tile) count + integer-milli value sum — the
    quartile-profile shape.

    Partitioning assumption (documented, inherent to exact row-number
    NTILE): ONE key's rows must fit one task — the tile of a row depends on
    its exact rank among ALL of its key's rows, so a key cannot split.
    Keys hash into buckets; inside a bucket one vectorized pass computes
    every key's tiles at once (per-segment positions + the divmod tile
    formula — no per-key Python). For hot-key-safe ranking over values use
    ``value_ranks`` (dense rank over distinct values) instead."""
    import numpy as np

    from .aggregate import bucket_by_key, tree_sum

    def per_bucket(block: pd.DataFrame) -> pd.DataFrame:
        b = block.sort_values([key_col, value_col, id_col], kind="mergesort")
        keys = b[key_col].to_numpy()
        v_milli = np.floor(b[value_col].to_numpy() * 1000.0).astype(np.int64)
        n = len(b)
        new_seg = np.ones(n, dtype=bool)
        new_seg[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(new_seg)
        sizes = np.diff(np.append(starts, n))
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes)
        m = np.repeat(sizes, sizes).astype(np.int64)  # per-row segment size
        q, r = m // k, m % k  # tile base size / number of size-(q+1) tiles
        boundary = r * (q + 1)
        qsafe = np.maximum(q, 1)  # q=0 rows all sit below boundary (= m)
        tile = np.where(
            pos < boundary, pos // (q + 1), r + (pos - boundary) // qsafe
        ) + 1
        out = pd.DataFrame(
            {key_col: keys, "tile": tile.astype(np.int64), "v_milli": v_milli}
        )
        g = (
            out.groupby([key_col, "tile"], sort=False)
            .agg(n=("v_milli", "size"), sum_v_milli=("v_milli", "sum"))
            .reset_index()
        )
        g["n"] = g["n"].astype(np.int64)
        return g

    bucketed = bucket_by_key(
        ds.select_columns([key_col, value_col, id_col]), key_col, num_buckets
    )
    per_key = bucketed.groupby("_bucket").map_groups(
        per_bucket, batch_format="pandas"
    )
    # each (key, tile) lives in exactly one bucket — the tree combine here
    # only bundles the tiny per-bucket outputs and sorts
    return tree_sum(per_key, [key_col, "tile"], ["n", "sum_v_milli"],
                    sort_result=True)


def percent_ranks(
    ds,
    key_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
    num_buckets: int = 32,
):
    """Integer-exact SQL ``percent_rank()`` per partition key: emits the
    numerator (rank - 1, rank = RANK so ties share) and denominator (n - 1)
    as int64 columns — the quotient never materializes as a float, so the
    result hash-matches a SQL window oracle exactly.

    Scale shape — the same two-phase formulation as :func:`value_ranks`,
    extended with counts:
      1. per-batch (key, value) partial COUNTS (not just distincts) — the
         rank of a value needs how many rows precede it, so the partials
         carry n per pair; shuffle volume = distinct pairs across batches;
      2. per key-hash bucket, one rebased-cumsum pass over the sorted
         distinct pairs yields every value's rank-1 (rows strictly below)
         and the key's total n — a hot key costs |distinct values|;
      3. the per-(key,value) rank table hash-joins back to the rows on the
         composite key. The rows themselves never co-locate by key."""
    from .aggregate import bucket_by_key
    from .joins import hash_join

    def to_milli(batch: pa.Table) -> pa.Table:
        v = pc.cast(pc.floor(pc.multiply(batch[value_col], 1000.0)), pa.int64())
        combo = pc.binary_join_element_wise(
            pc.cast(batch[key_col], pa.string()),
            pc.cast(v, pa.string()),
            "\x1f",
        )
        return pa.table({id_col: batch[id_col], "_kv": combo})

    rows = ds.map_batches(to_milli, batch_format="pyarrow")

    def pair_counts(batch: pa.Table) -> pa.Table:
        v = pc.cast(pc.floor(pc.multiply(batch[value_col], 1000.0)), pa.int64())
        return (
            pa.table({key_col: batch[key_col], "v": v})
            .group_by([key_col, "v"])
            .aggregate([([], "count_all")])
            .rename_columns([key_col, "v", "cnt"])
        )

    pairs = (
        ds.map_batches(pair_counts, batch_format="pyarrow")
        .groupby([key_col, "v"])
        .sum("cnt")
        .rename_columns({"sum(cnt)": "cnt"})
    )

    def rank_bucket(block: pd.DataFrame) -> pd.DataFrame:
        b = block.sort_values([key_col, "v"])
        keys = b[key_col].to_numpy()
        cnt = b["cnt"].to_numpy(dtype=np.int64)
        new_seg = np.ones(len(b), dtype=bool)
        new_seg[1:] = keys[1:] != keys[:-1]
        pos = np.arange(len(b), dtype=np.int64)
        seg_id = np.cumsum(new_seg) - 1
        # rows strictly below this value within its key = rebased exclusive
        # prefix sum of the counts
        cs = np.cumsum(cnt)
        before = cs - cnt
        seg_base = before[new_seg][seg_id]
        pr_num = before - seg_base
        # key total = segment's last inclusive cumsum minus its base
        last_idx = np.append(np.nonzero(new_seg)[0][1:] - 1, len(b) - 1)
        seg_last = cs[last_idx][seg_id]
        pr_den = seg_last - seg_base - 1
        kv = (
            b[key_col].astype(str) + "\x1f" + b["v"].astype(np.int64).astype(str)
        ).to_numpy()
        return pa.table(
            {
                "kv": pa.array(kv, type=pa.string()),
                "pr_num": pa.array(pr_num, type=pa.int64()),
                "pr_den": pa.array(pr_den, type=pa.int64()),
            }
        )

    ranked = (
        bucket_by_key(pairs, key_col, num_buckets)
        .groupby("_bucket")
        .map_groups(rank_bucket, batch_format="pandas")
        .materialize()  # see value_ranks: avoid double-executed shuffle
    )
    joined = hash_join(rows, ranked, "_kv", "kv", num_buckets=num_buckets)
    return joined.select_columns([id_col, "pr_num", "pr_den"]).sort(id_col)


def late_events(
    ds,
    key_col: str = "user_id",
    id_col: str = "event_id",
    ts_col: str = "ts",
    lateness_us: int = 14 * 86_400_000_000,
    arrival_seed: str = "arr",
    num_buckets: int = 32,
):
    """Watermark / late-data classification — the streaming-engine
    semantics (Beam/Flink allowed-lateness) expressed as a batch operator:
    process each key's events in ARRIVAL order, carry the running max
    event time seen so far (the watermark), and emit every event whose
    own timestamp trails the watermark by more than ``lateness_us``.

    The synthetic log is perfectly time-ordered, so a reproducible
    adversarial arrival order is synthesized with the md5 permutation the
    epoch-shuffle oracle already uses (``md5(seed:id)`` — a pure function
    of the id, identical in DuckDB). Per key-hash bucket, the watermark
    is ONE pandas C-speed groupby cummax + shift — no per-key Python."""
    import hashlib

    from .aggregate import bucket_by_key

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        arr = [
            hashlib.md5(f"{arrival_seed}:{int(v)}".encode()).hexdigest()
            for v in ids
        ]
        ts_us = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {
                id_col: batch[id_col],
                key_col: batch[key_col],
                "ts_us": ts_us,
                "_arr": pa.array(arr, type=pa.string()),
            }
        )

    prepped = bucket_by_key(
        ds.map_batches(prep, batch_format="pyarrow"), key_col, num_buckets
    )

    def per_bucket(block: pd.DataFrame) -> pd.DataFrame:
        b = block.sort_values([key_col, "_arr", id_col])
        # integer end-to-end: a pandas shift() would round-trip the
        # watermark through float64 (NaN padding) and lose exactness past
        # 2^53 — the same hazard the as-of join engineers around. Groups
        # are contiguous after the sort (NaN keys sort last, together),
        # so the previous-row cummax is one numpy slice per bucket.
        # dropna=False: a NULL key is one partition, as in the SQL window.
        gb = b.groupby(key_col, sort=False, dropna=False)
        cm = gb["ts_us"].cummax().to_numpy(dtype=np.int64)
        gid = gb.ngroup().to_numpy()
        n = len(b)
        first = np.ones(n, dtype=bool)
        first[1:] = gid[1:] != gid[:-1]
        wm = np.empty(n, dtype=np.int64)
        wm[1:] = cm[:-1]
        ts = b["ts_us"].to_numpy(dtype=np.int64)
        keep = ~first & ((wm - ts) > lateness_us)
        return pd.DataFrame(
            {
                id_col: b.loc[keep, id_col],
                "ts_us": ts[keep],
                "wm_us": wm[keep],
                "late_by_us": wm[keep] - ts[keep],
            }
        )

    return (
        prepped.groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .sort(id_col)
    )


def merged_interval_stats(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    duration_us: int = 1_800_000_000,
    num_buckets: int = 32,
):
    """Gaps-and-islands: every event opens an interval [ts, ts+duration);
    per key, overlapping/touching intervals merge into islands, and the
    output is (key, n_islands, covered_us = Σ island lengths) — the
    activity-coverage rollup (SQL's classic lag/cummax island pattern).

    One vectorized pass per key-hash bucket (a key's rows are contiguous
    after the in-bucket sort): segmented cummax of interval ends, a
    previous-row slice (pure int64 — no pandas shift float round-trip),
    an island boundary mask where start > max(previous ends), and one
    reduceat over island boundaries. No per-key Python; rows co-locate
    only by hash bucket."""
    from .aggregate import bucket_by_key

    def prep(batch: pa.Table) -> pa.Table:
        s = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {
                key_col: batch[key_col],
                "s": s,
                "e": pc.add(s, pa.scalar(duration_us, type=pa.int64())),
            }
        )

    prepped = bucket_by_key(
        ds.map_batches(prep, batch_format="pyarrow"), key_col, num_buckets
    )

    def per_bucket(block: pd.DataFrame) -> pd.DataFrame:
        if not len(block):
            return pd.DataFrame(
                {
                    key_col: pd.Series(dtype=block[key_col].dtype),
                    "n_islands": pd.Series(dtype="int64"),
                    "covered_us": pd.Series(dtype="int64"),
                }
            )
        b = block.sort_values([key_col, "s", "e"])
        gb = b.groupby(key_col, sort=False, dropna=False)
        cm = gb["e"].cummax().to_numpy(dtype=np.int64)
        gid = gb.ngroup().to_numpy()
        n = len(b)
        s = b["s"].to_numpy(dtype=np.int64)
        first = np.ones(n, dtype=bool)
        first[1:] = gid[1:] != gid[:-1]
        prev_cm = np.empty(n, dtype=np.int64)
        prev_cm[1:] = cm[:-1]
        new_island = first | (s > prev_cm)
        starts = np.nonzero(new_island)[0]
        # island end = cummax(e) at the island's last row
        last = np.append(starts[1:] - 1, n - 1)
        covered = cm[last] - s[starts]
        island_keys = b[key_col].to_numpy()[starts]
        out = pd.DataFrame({key_col: island_keys, "covered_us": covered})
        g = out.groupby(key_col, as_index=False, dropna=False).agg(
            n_islands=("covered_us", "size"), covered_us=("covered_us", "sum")
        )
        return g[[key_col, "n_islands", "covered_us"]]

    return (
        prepped.groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .sort(key_col)
    )


def funnel_counts(
    ds,
    steps,
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    num_buckets: int = 64,
    within_sec: int | None = None,
):
    """Ordered funnel conversion: how many keys reached each step of the
    ``steps`` sequence, where step ``i`` requires an event of type
    ``steps[i]`` STRICTLY after the key's step-``i-1`` arrival time
    (first-touch chaining — ``t_i = min(ts | type = steps[i], ts > t_{i-1})``,
    the classic product-analytics funnel and exactly SQL's chained
    ``JOIN ... WHERE e.ts > prev.t GROUP BY`` CTE ladder; equal timestamps
    do NOT advance the funnel). ``within_sec`` additionally bounds each
    step to at most that many seconds after the previous step's arrival
    (inclusive upper edge — SQL ``ts <= prev.t + INTERVAL w SECOND``), the
    conversion-window form every product-analytics funnel ships.

    Output: one row per step — (step int64, users int64), sorted by step;
    steps nobody reached report 0.

    Scale shape: the corpus filters to funnel-step rows at the first map
    and projects to (key, int64 ts, int8 step) — the shuffle ships matching
    events only, never the log. Keys co-locate by stable hash bucket; each
    bucket runs ``len(steps) - 1`` vectorized merge+groupby-min passes over
    bucket-local rows (no Python per key), then collapses to ``len(steps)``
    count rows, so the final exchange is a ≤ buckets × steps tree sum.
    NULL keys are dropped at the prep map (pandas merge would join NaN keys,
    diverging from SQL join semantics; the oracle pins the same contract).
    """
    from .aggregate import bucket_by_key

    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    k = len(steps)
    step_set = pa.array(steps)

    def prep(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.is_in(batch[type_col], value_set=step_set),
            pc.is_valid(batch[key_col]),
        )
        t = batch.filter(mask)
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type):
            # normalize to microseconds so within_sec math is unit-safe
            ts = pc.cast(ts, pa.timestamp("us"))
        return pa.table(
            {
                key_col: t[key_col],
                "_ts": pc.cast(ts, pa.int64()),
                "_step": pc.cast(
                    pc.index_in(t[type_col], value_set=step_set), pa.int8()
                ),
            }
        )

    def per_bucket(block: pd.DataFrame) -> pd.DataFrame:
        counts = np.zeros(k, dtype=np.int64)
        cur = block[block["_step"] == 0].groupby(key_col)["_ts"].min()
        counts[0] = cur.size
        for i in range(1, k):
            if cur.empty:
                break
            rows = block[block["_step"] == i]
            if rows.empty:
                break
            m = rows.merge(
                cur.rename("_prev"), left_on=key_col, right_index=True
            )
            ok = m["_ts"] > m["_prev"]
            if within_sec is not None:
                ok &= m["_ts"] <= m["_prev"] + within_sec * 1_000_000
            m = m[ok]
            cur = m.groupby(key_col)["_ts"].min()
            counts[i] = cur.size
        return pd.DataFrame(
            {"step": np.arange(k, dtype=np.int64), "users": counts}
        )

    prepped = bucket_by_key(
        ds.map_batches(prep, batch_format="pyarrow"), key_col, num_buckets
    )
    partials = prepped.groupby("_bucket").map_groups(
        per_bucket, batch_format="pandas"
    )
    # seed one zero row per step so the contract ("steps nobody reached
    # report 0") holds even when NO step event exists anywhere and the
    # groupby above emits nothing
    seed = ray.data.from_pandas(
        pd.DataFrame(
            {
                "step": np.arange(k, dtype=np.int64),
                "users": np.zeros(k, dtype=np.int64),
            }
        )
    )
    partials = partials.union(seed)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"step": batch["step"], "users": batch["sum(users)"]}
        )

    return (
        partials.groupby("step")
        .sum("users")
        .map_batches(rename, batch_format="pyarrow")
        .sort("step")
    )


def event_trend_counts(
    ds,
    pattern: "list[str]",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    num_buckets: int = 64,
):
    """Event trend aggregation (Poppe et al., SIGMOD 2019, "Event Trend
    Aggregation Under Rich Event Matching Semantics" — the aggregation-
    pushdown insight): count ALL subsequences of each key's event stream
    matching the SEQ ``pattern`` under skip-till-any-match semantics,
    WITHOUT enumerating the (exponentially many) trends. The count is a
    per-stage dynamic program — matches of prefix k ending at event e =
    cumulative prefix-(k-1) count strictly before e — i.e. len(pattern)
    segmented cumsum passes, not a pattern-automaton walk per trend.
    Unlike the funnel operator (first-touch chain, one conversion per
    user), this counts every interleaving.

    Sequence order is (ts, id) — total and identical in SQL. Pattern types
    must be pairwise distinct (the strictly-before exclusion is then free:
    the current event can never extend its own stage). Rows:
    (key, n_trends) for keys with ≥1 complete trend; counts are exact
    int64 (a key with m events holds < C(m, len(pattern)) trends — raise
    your own cap upstream if a single key can exceed 2^63).

    Scale shape: the corpus projects to (key, ts, id, small-int stage
    type) at the first map; each key's DP runs inside its hash bucket as
    len(pattern) vectorized groupby-cumsum passes — no per-key Python, no
    global sort, only per-key counts leave the bucket."""
    import pyarrow.compute as pc

    from .aggregate import bucket_by_key

    if len(set(pattern)) != len(pattern):
        raise ValueError("pattern types must be pairwise distinct")
    pat = pa.array(pattern, type=pa.string())

    def prep(batch: pa.Table) -> pa.Table:
        t = batch.filter(
            pc.and_(
                pc.is_valid(batch[key_col]),
                pc.is_valid(
                    pc.index_in(batch[type_col], value_set=pat)
                ),
            )
        )
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64())
        return pa.table(
            {
                key_col: t[key_col],
                "_ts": ts,
                id_col: pc.cast(t[id_col], pa.int64()),
                "_stage": pc.index_in(t[type_col], value_set=pat),
            }
        )

    prepped = bucket_by_key(
        ds.map_batches(prep, batch_format="pyarrow"), key_col, num_buckets
    )

    def per_bucket(block: pd.DataFrame) -> pd.DataFrame:
        b = block.sort_values([key_col, "_ts", id_col])
        n = len(b)
        if n == 0:
            return pd.DataFrame({key_col: [], "n_trends": []})
        # one C factorize pass → int codes; keys are contiguous runs after
        # the sort, so every later step is pure numpy segment arithmetic
        codes = pd.factorize(b[key_col], use_na_sentinel=False)[0]
        new_seg = np.empty(n, dtype=bool)
        new_seg[0] = True
        np.not_equal(codes[1:], codes[:-1], out=new_seg[1:])
        seg_start = np.flatnonzero(new_seg)
        seg_id = np.cumsum(new_seg) - 1
        stage = b["_stage"].to_numpy()
        # dp = matches of prefix k ending at each event; prev = cumulative
        # prefix-(k-1) count STRICTLY before it within the segment =
        # global exclusive cumsum rebased to the segment start
        dp = (stage == 0).astype(np.int64)
        for k in range(1, len(pattern)):
            excl = np.concatenate(([0], np.cumsum(dp)[:-1]))
            prev = excl - excl[seg_start][seg_id]
            dp = np.where(stage == k, prev, 0)
        totals = np.add.reduceat(dp, seg_start)
        keep = totals > 0
        return pd.DataFrame(
            {
                key_col: b[key_col].to_numpy()[seg_start][keep],
                "n_trends": totals[keep],
            }
        )

    return (
        prepped.groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .sort(key_col)
    )


def resample_daily_ffill(
    ds,
    end_day: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    num_buckets: int = 64,
):
    """Time-series resampling with forward fill (the gap-filling step of a
    feature/metrics pipeline): one output row per (key, day) from the
    key's first event day through ``end_day``, carrying the integer-milli
    value of the latest event at-or-before that day (within a day the
    latest (ts, id) wins).

    Scale shape: key-hash buckets; inside a bucket every key is expanded
    and filled in ONE vectorized pass — daily-last rows and the dense day
    spine are merged through a single ``searchsorted`` over a combined
    (key_index, day) integer keyspace, no per-key loop. Only (key, day,
    value) rows cross the exchange; output size is Σ_keys span_days by
    construction (callers own the span blowup — pass a bounded end_day).

    ``end_day`` is the global horizon (e.g. ``max(day)`` over the input —
    a one-column streamed aggregate the caller runs first).
    """
    from .aggregate import bucket_by_key

    def per_bucket(block: pd.DataFrame) -> pd.DataFrame:
        b = block.sort_values([key_col, ts_col, id_col])
        keys = b[key_col].to_numpy()
        day = (
            b[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
            // 86_400_000_000
        )
        vm = np.floor(b[value_col].to_numpy() * 1000.0).astype(np.int64)
        n = len(b)
        if n == 0:
            return pd.DataFrame(
                {key_col: np.array([], keys.dtype),
                 "day": np.array([], np.int64),
                 "value_milli": np.array([], np.int64)}
            )
        # daily last = last row of each (key, day) run in (ts, id) order
        last = np.ones(n, dtype=bool)
        last[:-1] = (keys[1:] != keys[:-1]) | (day[1:] != day[:-1])
        dk, dd, dv = keys[last], day[last], vm[last]
        # per-key spine: first event day .. end_day
        first = np.ones(len(dk), dtype=bool)
        first[1:] = dk[1:] != dk[:-1]
        uk = dk[first]
        d0 = dd[first]
        span = (end_day - d0 + 1).astype(np.int64)
        if (span <= 0).any():
            raise ValueError(
                "resample_daily_ffill: end_day precedes a key's first day"
            )
        total = int(span.sum())
        out_key = np.repeat(uk, span)
        starts = np.concatenate(([0], np.cumsum(span)[:-1]))
        out_day = (
            np.arange(total, dtype=np.int64)
            - np.repeat(starts, span)
            + np.repeat(d0, span)
        )
        # one searchsorted over the combined (key_index, day) keyspace:
        # the spine's first day per key equals the key's first daily-last
        # day, so the match can never bleed into the previous key
        kidx_daily = np.cumsum(first) - 1
        kidx_out = np.repeat(np.arange(len(uk), dtype=np.int64), span)
        SHIFT = np.int64(1) << 32  # day < 2^32 by construction (epoch days)
        pos = (
            np.searchsorted(
                kidx_daily * SHIFT + dd, kidx_out * SHIFT + out_day, "right"
            )
            - 1
        )
        return pd.DataFrame(
            {key_col: out_key, "day": out_day, "value_milli": dv[pos]}
        )

    bucketed = bucket_by_key(
        ds.select_columns([key_col, ts_col, id_col, value_col]),
        key_col,
        num_buckets,
    )
    return (
        bucketed.groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .sort([key_col, "day"])
    )


def interval_self_pairs(
    ds,
    window_us: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_buckets: int = 64,
    max_pairs_per_block: int = 50_000_000,
):
    """Interval self-join: every ordered pair of same-key events at most
    ``window_us`` apart — rows ``(key, a, b, delta_us)`` where ``a``
    precedes ``b`` in (ts, id) order. The band/range-join family member
    next to the as-of join (which keeps only the LATEST match).

    Scale shape: key-hash buckets; per bucket ONE (key, ts, id) sort and
    ONE ``searchsorted`` over a combined (key_index, ts) keyspace finds
    every row's match range, pairs explode by repeat/arange arithmetic —
    no per-key or per-row loop. Output size is data-dependent (Σ window
    co-occurrence); the per-block pair count is guarded so a pathological
    burst fails loudly instead of materializing an accidental n²."""
    from .aggregate import bucket_by_key

    def per_bucket(block: pd.DataFrame) -> pd.DataFrame:
        b = block.sort_values([key_col, ts_col, id_col])
        keys = b[key_col].to_numpy()
        ts = (
            b[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        ids = b[id_col].to_numpy()
        n = len(b)
        empty = pd.DataFrame(
            {
                key_col: np.array([], keys.dtype if n else np.int64),
                "a": np.array([], np.int64),
                "b": np.array([], np.int64),
                "delta_us": np.array([], np.int64),
            }
        )
        if n == 0:
            return empty
        new = np.ones(n, dtype=bool)
        new[1:] = keys[1:] != keys[:-1]
        kidx = np.cumsum(new) - 1
        # remap each key's ts range onto disjoint increasing intervals with
        # a > window gap between keys: adj is then globally sorted and a
        # window probe can never cross a key boundary. Unlike a fixed
        # key-index shift this is exact for ANY ts span and any key count
        # (adj grows by Σ spans + keys·(window+1) — bounded by the block's
        # own data, far inside int64).
        seg_start = np.flatnonzero(new)
        seg_end = np.concatenate((seg_start[1:], [n])) - 1
        mins, maxs = ts[seg_start], ts[seg_end]
        base = np.zeros(len(seg_start), dtype=np.int64)
        if len(base) > 1:
            base[1:] = np.cumsum(
                maxs[:-1] + np.int64(window_us) + 1 - mins[1:]
            )
        adj = ts + base[kidx]
        hi = np.searchsorted(adj, adj + window_us, "right")
        pos = np.arange(n, dtype=np.int64)
        cnt = hi - pos - 1  # strictly-later rows within the window
        total = int(cnt.sum())
        if total > max_pairs_per_block:
            raise ValueError(
                "interval_self_pairs: %d pairs in one block exceeds the "
                "%d cap — a burst key makes the window join quadratic; "
                "shrink window_us or split the key" % (total, max_pairs_per_block)
            )
        if total == 0:
            return empty
        left = np.repeat(pos, cnt)
        starts = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        right = np.arange(total, dtype=np.int64) - np.repeat(starts, cnt) + left + 1
        return pd.DataFrame(
            {
                key_col: keys[left],
                "a": ids[left].astype(np.int64),
                "b": ids[right].astype(np.int64),
                "delta_us": ts[right] - ts[left],
            }
        )

    bucketed = bucket_by_key(
        ds.select_columns([key_col, ts_col, id_col]), key_col, num_buckets
    )
    return (
        bucketed.groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .sort([key_col, "a", "b"])
    )


def time_weighted_averages(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    num_buckets: int = 64,
):
    """Per-key time-weighted average (TWAP): treat each key's value as a
    step function under (ts, id) order and integrate it over the key's own
    [first_ts, last_ts] span — rows (key, span_us, twap_num, twap_milli)
    with ``twap_num = Σ value_milli_i · (ts_{i+1} − ts_i)`` (the last
    observation has zero width) and ``twap_milli = twap_num // span_us``.
    Keys with a single event (span 0) are emitted with span_us = 0 and
    twap_milli = their value (the step function is a point). All integer →
    exact oracle comparison; per-key numerators stay ≤ max_value_milli ×
    span_us ≈ 10^17 « int64.

    Scale shape: same as :func:`event_deltas` — key-hash buckets co-locate
    a key's events, ONE vectorized pass per bucket (sort + diff + segment
    sums via np.add.reduceat); only (key, ts, id, value_milli) crosses the
    exchange."""
    from .aggregate import bucket_by_key

    def per_bucket(block: pd.DataFrame) -> pd.DataFrame:
        if not len(block):  # empty group block: typed empty frame
            return pd.DataFrame(
                {
                    key_col: pd.Series([], dtype="int64"),
                    "span_us": pd.Series([], dtype="int64"),
                    "twap_num": pd.Series([], dtype="int64"),
                    "twap_milli": pd.Series([], dtype="int64"),
                }
            )
        b = block.sort_values([key_col, ts_col, id_col])
        ts_us = b[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        keys = b[key_col].to_numpy()
        vm = np.floor(b[value_col].to_numpy() * 1000.0).astype("int64")
        n = len(b)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(new)
        # width of each observation: next ts − this ts inside the key,
        # 0 for each key's last observation
        width = np.zeros(n, dtype=np.int64)
        if n > 1:
            d = ts_us[1:] - ts_us[:-1]
            same = keys[1:] == keys[:-1]
            width[:-1] = np.where(same, d, 0)
        num = np.add.reduceat(vm * width, starts)
        ends = np.append(starts[1:], n) - 1
        span = ts_us[ends] - ts_us[starts]
        twap = np.where(span > 0, num // np.maximum(span, 1), vm[starts])
        # span==0 keys: single observation (or all-equal ts) → the value of
        # the FIRST observation in (ts, id) order, matching the oracle
        return pd.DataFrame(
            {
                key_col: keys[starts],
                "span_us": span,
                "twap_num": num,
                "twap_milli": twap,
            }
        )

    bucketed = bucket_by_key(
        ds.select_columns([key_col, ts_col, id_col, value_col]),
        key_col,
        num_buckets,
    )
    return (
        bucketed.groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .sort(key_col)
    )


def scd2_intervals(
    ds,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_buckets: int = 64,
):
    """Slowly-Changing-Dimension Type 2: compress each key's attribute
    changelog into validity intervals — one row per CHANGE (first
    observation or attribute differs from the previous one under (ts, id)
    order) with ``valid_from_us`` and ``valid_to_us`` = the next change's
    timestamp (null for the key's current row). The warehouse-dimension
    builder next to CDC-merge (which keeps only the latest state; SCD2
    keeps the full history as intervals).

    Scale shape: key-hash buckets co-locate a key's rows; inside a bucket
    ONE vectorized pass (sort, shift-compare for the change mask, shift
    for the interval end) — no per-key Python. Only (key, attr, ts, id)
    crosses the exchange."""
    from .aggregate import bucket_by_key

    def per_bucket(block: pd.DataFrame) -> pd.DataFrame:
        if not len(block):  # empty group block: typed empty frame
            return pd.DataFrame(
                {
                    key_col: pd.Series([], dtype="int64"),
                    attr_col: pd.Series([], dtype="object"),
                    "valid_from_us": pd.Series([], dtype="int64"),
                    "valid_to_us": pd.Series([], dtype="int64"),
                }
            )
        b = block.sort_values([key_col, ts_col, id_col])
        ts_us = b[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        keys = b[key_col].to_numpy()
        attrs = b[attr_col].to_numpy()
        n = len(b)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = keys[1:] != keys[:-1]
        change = new_key.copy()
        change[1:] |= attrs[1:] != attrs[:-1]
        ck, ca, cts = keys[change], attrs[change], ts_us[change]
        cnew = new_key[change]
        # valid_to = next change row's ts within the same key (-1 at last)
        to = np.empty(len(cts), dtype="int64")
        to[:-1] = cts[1:]
        to[-1] = -1
        # a next row that starts a NEW key ends nothing: open interval
        nxt_new = np.empty(len(cts), dtype=bool)
        nxt_new[:-1] = cnew[1:]
        nxt_new[-1] = True
        to[nxt_new] = -1
        return pd.DataFrame(
            {
                key_col: ck,
                attr_col: ca,
                "valid_from_us": cts,
                "valid_to_us": to,
            }
        )

    bucketed = bucket_by_key(
        ds.select_columns([key_col, attr_col, ts_col, id_col]),
        key_col,
        num_buckets,
    )
    return (
        bucketed.groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .sort([key_col, "valid_from_us", attr_col])
    )
