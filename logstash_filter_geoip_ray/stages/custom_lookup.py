"""Generic MMDB-backed lookup enrichment: serve ANY side table compiled with
``state.mmdb_writer.build_mmdb_from_table`` through the same per-worker
mmap + LRU path as GeoIP.

This is the scale shape for medium-size lookup joins (too big to broadcast
as a Python dict per batch, too small to shuffle-join): compile once to an
MMDB file (longest-prefix keyed for CIDRs), ship the *path*, mmap in every
worker."""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, Optional

import pyarrow as pa
import pyarrow.compute as pc

from ..state.mmdb import MMDBReader

_PROCESS_READERS: dict = {}


class CustomMMDBEnricher:
    """map_batches callable: look up ``source_column`` (IP/CIDR-keyed) in a
    custom MMDB and emit ``output_column`` as a struct of ``fields``
    (name → pyarrow type). Misses/malformed → null struct. One reader +
    LRU per worker process."""

    def __init__(
        self,
        db_path: str,
        fields: Dict[str, pa.DataType],
        source_column: str = "source_ip",
        output_column: str = "lookup",
        cache_size: int = 10_000,
    ):
        self.db_path = db_path
        self.fields = list(fields.items())
        self.source_column = source_column
        self.output_column = output_column
        self.cache_size = cache_size

    def _lookup_fn(self):
        key = (self.db_path, self.cache_size)
        entry = _PROCESS_READERS.get(key)
        if entry is None:
            reader = MMDBReader(self.db_path)

            @lru_cache(maxsize=self.cache_size)
            def lookup(raw: str):
                from ..functions.iputil import parse_ip

                addr = parse_ip(raw)
                if addr is None:
                    return None
                try:
                    record, _ = reader.get(addr)
                except (ValueError, IndexError, KeyError):
                    return None
                return record

            entry = lookup
            _PROCESS_READERS[key] = entry
        return entry

    def __call__(self, batch: pa.Table) -> pa.Table:
        lookup = self._lookup_fn()
        src = batch[self.source_column]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = src.dictionary_encode()
        dictionary = enc.dictionary.to_pylist()
        # Null source rows keep a null index: pc.take propagates null indices
        # to null outputs, so they can never alias dictionary slot 0's record.
        indices = enc.indices
        records = [lookup(v) if v is not None else None for v in dictionary]

        child_arrays = []
        names = []
        for name, typ in self.fields:
            uniq = [r.get(name) if r is not None else None for r in records]
            arr_u = pa.array(uniq, type=typ)
            arr = (
                pc.take(arr_u, indices)
                if len(dictionary)
                else pa.nulls(batch.num_rows, type=typ)
            )
            child_arrays.append(arr)
            names.append(name)
        found_u = pa.array([r is not None for r in records], type=pa.bool_())
        found = (
            pc.fill_null(pc.take(found_u, indices), False)
            if len(dictionary)
            else pa.array([False] * batch.num_rows)
        )
        import numpy as np

        mask = pa.array(~np.asarray(found))
        struct_arr = pa.StructArray.from_arrays(child_arrays, names=names, mask=mask)
        if self.output_column in batch.column_names:
            batch = batch.drop_columns([self.output_column])
        return batch.append_column(self.output_column, struct_arr)
