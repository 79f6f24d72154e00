"""Source/sink surface of the engine.

The reference is one filter inside Logstash, which supplies inputs/outputs;
our engine exposes the equivalent IO breadth natively via Ray Data readers
and writers, with the transcript schema enforced on read so downstream
stages can rely on it (input_hint contract).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import pyarrow as pa

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

TRANSCRIPT_COLUMNS = [f.name for f in TRANSCRIPT_SCHEMA]


def _enforce_schema(ds):
    """Cast/reorder to TRANSCRIPT_SCHEMA inside map_batches (cheap, lazy)."""

    def cast(batch: pa.Table) -> pa.Table:
        cols = []
        for field in TRANSCRIPT_SCHEMA:
            col = batch[field.name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if col.type != field.type:
                col = col.cast(field.type)
            cols.append(col)
        return pa.Table.from_arrays(cols, schema=TRANSCRIPT_SCHEMA)

    return ds.map_batches(cast, batch_format="pyarrow")


def read_transcripts_parquet(paths, columns: Optional[Sequence[str]] = None, **kwargs):
    """Parquet transcript source, schema-enforced like the JSON/CSV readers
    (foreign writers may use ns timestamps or int64 turn_idx). Column-pruned
    reads skip enforcement (partial schema)."""
    import ray.data

    ds = ray.data.read_parquet(paths, columns=list(columns) if columns else None, **kwargs)
    return ds if columns else _enforce_schema(ds)


def read_transcripts_json(paths, **kwargs):
    """JSONL transcript source (``ray.data.read_json``), schema-enforced."""
    import ray.data

    return _enforce_schema(ray.data.read_json(paths, **kwargs))


def read_transcripts_csv(paths, **kwargs):
    """CSV transcript source, schema-enforced (ts parsed as timestamp)."""
    import ray.data
    from pyarrow import csv as pacsv

    convert = pacsv.ConvertOptions(
        column_types={"turn_idx": pa.int32(), "ts": pa.timestamp("us")}
    )
    return _enforce_schema(
        ray.data.read_csv(paths, convert_options=convert, **kwargs)
    )


def write_parquet(ds, path: str, **kwargs):
    ds.write_parquet(path, **kwargs)
    return path


def write_json(ds, path: str, **kwargs):
    ds.write_json(path, **kwargs)
    return path


def write_csv(ds, path: str, drop_nested: bool = True, **kwargs):
    """CSV sink; nested columns (structs/lists) are dropped by default since
    CSV cannot carry them."""

    def flatten(batch: pa.Table) -> pa.Table:
        keep = [
            name
            for name, typ in zip(batch.column_names, batch.schema.types)
            if not (pa.types.is_nested(typ))
        ]
        return batch.select(keep)

    out = ds.map_batches(flatten, batch_format="pyarrow") if drop_nested else ds
    out.write_csv(path, **kwargs)
    return path


def read_orc(paths, columns: Optional[Sequence[str]] = None):
    """ORC source (Ray 2.49 ships no ``read_orc``; built on the public
    ``from_items`` + ``map_batches`` surface): the driver lists files and
    reads only their FOOTERS (stripe counts — O(files) metadata, never
    data), then one Ray task reads exactly one stripe via ``pyarrow.orc``.
    Stripes are ORC's row-group analog, so read parallelism matches the
    file's native layout exactly as ``read_parquet`` does for parquet, and
    a 100-file × 50-stripe input fans out to 5000 independent tasks with
    no driver-side data movement. Column pruning pushes into the stripe
    read."""
    import glob as _glob
    import os as _os

    import ray.data
    from pyarrow import orc as _orc

    file_list: List[str] = []
    for p in paths if isinstance(paths, (list, tuple)) else [paths]:
        if _os.path.isdir(p):
            file_list.extend(sorted(_glob.glob(_os.path.join(p, "*.orc"))))
        else:
            file_list.append(p)
    items = []
    for f in file_list:
        for s in range(_orc.ORCFile(f).nstripes):
            items.append({"path": f, "stripe": s})
    if not items:
        raise FileNotFoundError("read_orc: no ORC stripes under %r" % (paths,))

    cols = list(columns) if columns else None

    def read_stripe(batch: pa.Table) -> pa.Table:
        out = []
        for path, stripe in zip(
            batch["path"].to_pylist(), batch["stripe"].to_pylist()
        ):
            rb = _orc.ORCFile(path).read_stripe(stripe, columns=cols)
            out.append(pa.Table.from_batches([rb]))
        return pa.concat_tables(out)

    return ray.data.from_items(items).map_batches(
        read_stripe, batch_size=1, batch_format="pyarrow"
    )


def _write_blocks(ds, path: str, ext: str, write_fn):
    """Shared one-file-per-block sink core (ORC/IPC): files written inside
    the map tasks (the sink streams — nothing funnels through the driver),
    named by a content hash of row count, first/last rows, column names
    and byte size, so a retried task overwrites its own file instead of
    duplicating it (idempotent under Ray task retry). Returns
    (path, files, rows)."""
    import hashlib as _hashlib
    import os as _os

    _os.makedirs(path, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"rows": pa.array([], pa.int64()),
                             "file": pa.array([], pa.string())})
        h = _hashlib.sha256()
        h.update(str(batch.num_rows).encode())
        h.update(str(batch.column_names).encode())
        h.update(str(batch.nbytes).encode())
        h.update(str(batch.slice(0, 1).to_pydict()).encode())
        h.update(str(batch.slice(batch.num_rows - 1, 1).to_pydict()).encode())
        name = "part-%s%s" % (h.hexdigest()[:16], ext)
        write_fn(batch, _os.path.join(path, name))
        return pa.table({"rows": pa.array([batch.num_rows], pa.int64()),
                         "file": pa.array([name], pa.string())})

    manifest = ds.map_batches(
        write_block, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    return path, len(manifest), int(manifest["rows"].sum()) if len(manifest) else 0


def write_orc(ds, path: str, compression: str = "zlib"):
    """ORC sink on the shared :func:`_write_blocks` core."""
    from pyarrow import orc as _orc

    return _write_blocks(
        ds, path, ".orc",
        lambda batch, out: _orc.write_table(batch, out, compression=compression),
    )


def read_ipc(paths, columns: Optional[Sequence[str]] = None):
    """Arrow IPC / Feather-V2 source (Ray 2.49 ships no IPC reader; built on
    the public ``from_items`` + ``map_batches`` surface, same shape as
    :func:`read_orc`): the driver opens only file FOOTERS (record-batch
    counts — O(files) metadata), then one Ray task reads exactly one record
    batch via ``pyarrow.ipc``. Record batches are IPC's row-group analog,
    so read parallelism matches the writer's native layout. IPC is a
    row-batch interchange format with no per-column pages, so column
    pruning applies post-read inside the same task (zero-copy slice of the
    mmapped batch, not a disk saving — documented, unlike parquet)."""
    import glob as _glob
    import os as _os

    import ray.data

    file_list: List[str] = []
    for p in paths if isinstance(paths, (list, tuple)) else [paths]:
        if _os.path.isdir(p):
            file_list.extend(sorted(_glob.glob(_os.path.join(p, "*.arrow"))))
        else:
            file_list.append(p)
    items = []
    for f in file_list:
        with pa.memory_map(f, "r") as src:
            n = pa.ipc.open_file(src).num_record_batches
        items.extend({"path": f, "batch": i} for i in range(n))
    if not items:
        raise FileNotFoundError("read_ipc: no IPC batches under %r" % (paths,))

    cols = list(columns) if columns else None

    def read_batch(batch: pa.Table) -> pa.Table:
        out = []
        for path, bi in zip(batch["path"].to_pylist(), batch["batch"].to_pylist()):
            with pa.memory_map(path, "r") as src:
                rb = pa.ipc.open_file(src).get_batch(bi)
            t = pa.Table.from_batches([rb])
            out.append(t.select(cols) if cols else t)
        return pa.concat_tables(out)

    return ray.data.from_items(items).map_batches(
        read_batch, batch_size=1, batch_format="pyarrow"
    )


def _ipc_write_table(batch: pa.Table, out: str) -> None:
    with pa.OSFile(out, "wb") as sink:
        with pa.ipc.new_file(sink, batch.schema) as writer:
            writer.write_table(batch)


def write_ipc(ds, path: str):
    """Arrow IPC / Feather-V2 sink on the shared :func:`_write_blocks`
    core (same idempotent-naming contract as :func:`write_orc`)."""
    return _write_blocks(ds, path, ".arrow", _ipc_write_table)


def read_parquet_evolved(paths, columns: Optional[Sequence[str]] = None):
    """Schema-evolution-tolerant parquet source: files written at different
    pipeline generations may disagree (columns added later, ints widened).
    The driver unifies the per-file FOOTER schemas (metadata-only — no
    data reads): missing columns null-fill with their evolved type, and
    numeric widenings promote (int32 → int64, float32 → float64); an
    incompatible conflict (e.g. string vs int64) raises at plan time with
    the offending column named, never silently coerces. One Ray task per
    file reads, casts and null-fills to the unified schema, so downstream
    operators see ONE stable schema."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as _pq
    import ray.data

    file_list: List[str] = []
    for p in paths if isinstance(paths, (list, tuple)) else [paths]:
        if _os.path.isdir(p):
            file_list.extend(
                sorted(_glob.glob(_os.path.join(p, "**", "*.parquet"),
                                  recursive=True))
            )
        else:
            file_list.append(p)
    if not file_list:
        raise FileNotFoundError("read_parquet_evolved: no parquet under %r" % (paths,))

    _WIDEN = {
        (pa.int32(), pa.int64()): pa.int64(),
        (pa.float32(), pa.float64()): pa.float64(),
    }

    def _unify(a: pa.DataType, b: pa.DataType, name: str) -> pa.DataType:
        if a == b:
            return a
        for (lo, hi), out in _WIDEN.items():
            if {a, b} == {lo, hi}:
                return out
        raise TypeError(
            "read_parquet_evolved: column %r has incompatible types across "
            "files: %s vs %s" % (name, a, b)
        )

    wanted = set(columns) if columns else None
    unified: Dict[str, pa.DataType] = {}
    order: List[str] = []
    for f in file_list:
        sch = _pq.read_schema(f)
        for name, typ in zip(sch.names, sch.types):
            if wanted is not None and name not in wanted:
                continue  # a conflict in an unrequested column must not abort
            if name in unified:
                unified[name] = _unify(unified[name], typ, name)
            else:
                unified[name] = typ
                order.append(name)
    if columns:
        missing = [c for c in columns if c not in unified]
        if missing:
            raise KeyError(
                "read_parquet_evolved: requested column(s) %s exist in no "
                "file" % missing
            )
    target = pa.schema([(n, unified[n]) for n in order])

    def read_file(batch: pa.Table) -> pa.Table:
        out = []
        for path in batch["path"].to_pylist():
            have = set(_pq.read_schema(path).names)
            want = [n for n in order if n in have]
            t = _pq.read_table(path, columns=want)
            arrays = []
            for n in order:
                if n in have:
                    arrays.append(t[n].cast(unified[n]))
                else:
                    arrays.append(pa.nulls(t.num_rows, type=unified[n]))
            out.append(pa.Table.from_arrays(arrays, schema=target))
        return pa.concat_tables(out)

    return ray.data.from_items(
        [{"path": p} for p in file_list]
    ).map_batches(read_file, batch_size=1, batch_format="pyarrow")
