"""Source/sink surface of the engine.

The reference is one filter inside Logstash, which supplies inputs/outputs;
our engine exposes the equivalent IO breadth natively via Ray Data readers
and writers, with the transcript schema enforced on read so downstream
stages can rely on it (input_hint contract).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

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
