"""Checkpointed, resumable pipeline runs with per-partition lineage (P8).

The unit of checkpointing is the *input shard* (one transcript part-file —
the same unit the 100 TB layout would use). Each shard's output is written to
a deterministic path derived from the shard name (never from the task
attempt), followed by an atomic manifest write. Resume = list manifests, skip
shards whose manifest is valid for the current config, process the rest.

Lineage manifest per shard (JSON):
  input_path, input_rows, output_rows, ok_rows (successful enrichments),
  config_hash, engine_version, wall_ms, written_at_unix

Scale shape: the shard list lives on the driver (cheap: one entry per file),
but all row work happens inside ``map_batches`` tasks — one task enriches and
writes one shard, so a 100 TB run is N independent tasks with no all-to-all
stage, and a crashed run re-does only unfinished shards.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import time
from dataclasses import dataclass
from typing import List, Optional

import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.config import GeoIPConfig

ENGINE_VERSION = "1"


def config_hash(config: GeoIPConfig, extra: str = "") -> str:
    payload = repr((config, extra, ENGINE_VERSION)).encode()
    return hashlib.sha256(payload).hexdigest()[:16]


def _shard_stem(input_path: str) -> str:
    return os.path.splitext(os.path.basename(input_path))[0]


def count_ok_rows(table: pa.Table, target: str) -> int:
    """Successful enrichments = rows whose target struct is valid AND has at
    least one non-null top-level child (the enricher's three-state contract:
    null struct = not attempted, valid-all-null = attempted-but-failed).
    Deliberately NOT derived from the tags column — input shards may carry
    pre-existing tags, which would make tag-based counting undercount."""
    import pyarrow.compute as pc

    if target not in table.column_names:
        return 0
    col = table[target]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ok = pc.is_valid(col)
    if col.type.num_fields:
        any_child = None
        for i in range(col.type.num_fields):
            child_valid = pc.is_valid(col.field(i))
            any_child = child_valid if any_child is None else pc.or_(any_child, child_valid)
        ok = pc.and_(ok, any_child)
    return int(pc.sum(pc.cast(ok, pa.int64())).as_py() or 0)


def manifest_path(out_dir: str, input_path: str) -> str:
    return os.path.join(out_dir, "_manifests", _shard_stem(input_path) + ".json")


def output_path(out_dir: str, input_path: str) -> str:
    return os.path.join(out_dir, "data", _shard_stem(input_path) + ".parquet")


def load_manifest(out_dir: str, input_path: str) -> Optional[dict]:
    path = manifest_path(out_dir, input_path)
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def pending_shards(out_dir: str, input_paths: List[str], chash: str) -> List[str]:
    """Input shards with no valid manifest for this config (resume set)."""
    todo = []
    for p in input_paths:
        m = load_manifest(out_dir, p)
        if (
            m is None
            or m.get("config_hash") != chash
            or m.get("status") != "done"
            or not os.path.exists(output_path(out_dir, p))
        ):
            todo.append(p)
    return todo


@dataclass
class _ShardWriter:
    """map_batches callable over a dataset of shard *paths* (one path per
    batch): reads the shard inside the task, enriches it, writes output +
    manifest atomically. Explicit path-level tasks are used instead of
    ``read_parquet`` because Ray's reader splits files into multiple blocks,
    which breaks the shard↔output 1:1 mapping resume depends on."""

    config: GeoIPConfig
    out_dir: str
    chash: str

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..pipelines.geoip_pipeline import add_routing_keys
        from ..stages.enrich import WorkerCachedEnricher
        from ..stages.parse import make_extract_ips

        t0 = time.perf_counter()
        paths = batch["path"].to_pylist()
        assert len(paths) == 1, "expected one shard path per batch, got %s" % paths
        input_path = paths[0]
        work = pq.read_table(input_path)
        # extract only when the configured source column is absent (generic
        # shards may already carry the source field; honors --source-column)
        if self.config.source not in work.column_names:
            work = make_extract_ips(output_column=self.config.source)(work)
        work = WorkerCachedEnricher(self.config)(work)
        # country routing applies only to City-shaped targets; other DB
        # types (ASN/ISP/...) have no country child — skip instead of raising
        target_type = work.schema.field(self.config.resolved_target()).type
        child_names = {f.name for f in target_type}
        routed = ("geo" in child_names) if self.config.ecs else ("country_code2" in child_names)
        if routed:
            work = add_routing_keys(self.config.resolved_target(), ecs=self.config.ecs)(work)

        out_file = output_path(self.out_dir, input_path)
        os.makedirs(os.path.dirname(out_file), exist_ok=True)
        pq.write_table(work, out_file + ".tmp")
        os.replace(out_file + ".tmp", out_file)

        ok_rows = count_ok_rows(work, self.config.resolved_target())
        manifest = {
            "status": "done",
            "input_path": input_path,
            "input_rows": work.num_rows,
            "output_rows": work.num_rows,
            "ok_rows": ok_rows,
            "config_hash": self.chash,
            "engine_version": ENGINE_VERSION,
            "wall_ms": round((time.perf_counter() - t0) * 1000, 1),
            "input_bytes": os.path.getsize(input_path),
            "output_bytes": os.path.getsize(out_file),
            "written_at_unix": int(time.time()),
        }
        mpath = manifest_path(self.out_dir, input_path)
        os.makedirs(os.path.dirname(mpath), exist_ok=True)
        with open(mpath + ".tmp", "w") as f:
            json.dump(manifest, f)
        os.replace(mpath + ".tmp", mpath)

        return pa.table(
            {
                "input_path": pa.array([input_path], type=pa.string()),
                "output_rows": pa.array([work.num_rows], type=pa.int64()),
                "ok_rows": pa.array([ok_rows], type=pa.int64()),
                "skipped": pa.array([False], type=pa.bool_()),
            }
        )


def run_checkpointed(
    input_dir: str,
    out_dir: str,
    config: Optional[GeoIPConfig] = None,
) -> dict:
    """Enrich every shard under ``input_dir`` into ``out_dir`` with resume.

    Returns a summary dict: total/processed/skipped shard counts + row totals
    from manifests (lineage metrics)."""
    import ray.data

    from ..pipelines.geoip_pipeline import default_config

    config = config or default_config()
    chash = config_hash(config)
    inputs = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    if not inputs:
        raise FileNotFoundError("no input shards under %s" % input_dir)
    todo = pending_shards(out_dir, inputs, chash)

    if todo:
        ds = ray.data.from_items(
            [{"path": p} for p in todo]
        ).repartition(len(todo))
        writer = _ShardWriter(config, out_dir, chash)
        # one shard path per task; the task reads, enriches, writes, manifests
        ds.map_batches(writer, batch_format="pyarrow", batch_size=1).materialize()

    manifests = [load_manifest(out_dir, p) for p in inputs]
    done = [m for m in manifests if m]
    return {
        "shards_total": len(inputs),
        "shards_processed": len(todo),
        "shards_skipped": len(inputs) - len(todo),
        "output_rows": sum(m["output_rows"] for m in done),
        "ok_rows": sum(m["ok_rows"] for m in done),
        # fleet metrics: totals tolerate manifests written by older engine
        # versions that lack the byte/wall fields
        "wall_ms": round(sum(m.get("wall_ms", 0.0) for m in done), 1),
        "input_bytes": sum(m.get("input_bytes", 0) for m in done),
        "output_bytes": sum(m.get("output_bytes", 0) for m in done),
        "config_hash": chash,
    }
