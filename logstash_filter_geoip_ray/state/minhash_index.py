"""Persisted MinHash LSH band index — the cross-dump dedup artifact.

``minhash_incremental_dedup`` (stages/dedup.py) dedups each NEW crawl dump
against the PRIOR kept corpus. Recomputing the prior side's band rows every
dump costs a full text pass over everything already kept — at 100 TB that
dwarfs the new dump itself. This store persists the band rows ONCE and lets
every later dump load them: band rows are tiny ((band_key, id) = 16 bytes ×
bands per doc, ~0.1% of the text), mergeable (appending a dump's keepers is
just more rows), and parameter-bound (an index built with different
num_perm/bands/shingle_k would silently miss candidates — ``_meta.json`` is
compared on every load/append and mismatches raise).

Layout (partitioned parquet, hive):
  index_dir/_meta.json                      — band parameters + id column
  index_dir/_bucket=N/<job-uuid>_*.parquet  — (band_key int64, <id_col>)

Rows are hash-bucketed by ``band_key`` (the same ``stable_key_hash`` the
consumer's coarse-bucket join uses) so a future per-bucket co-located join
can prune at the directory level; appends are safe under concurrent-free
operation because Ray's parquet datasink names files by a per-job uuid.

The reference has no index-persistence analog (its filter is stateless per
event, lib/logstash/filters/geoip.rb:113-122); this is pipeline-scaffolding
state in the same family as state/checkpoint.py.
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa

INDEX_META = "_meta.json"
DEFAULT_BUCKETS = 64


def _meta_params(num_perm: int, bands: int, shingle_k: int, id_col: str) -> dict:
    return {
        "num_perm": int(num_perm),
        "bands": int(bands),
        "shingle_k": int(shingle_k),
        "id_col": id_col,
        "version": 1,
    }


def _check_meta(index_dir: str, params: dict) -> None:
    path = os.path.join(index_dir, INDEX_META)
    if not os.path.exists(path):
        raise FileNotFoundError(
            "minhash_index: %r has no %s — not an index dir" % (index_dir, INDEX_META)
        )
    with open(path) as f:
        meta = json.load(f)
    if meta != params:
        raise ValueError(
            "minhash_index: parameter mismatch for %r: index built with %r, "
            "requested %r — band keys are incompatible across parameters; "
            "rebuild the index" % (index_dir, meta, params)
        )


def _banded(ds, num_perm, bands, shingle_k, text_col, id_col, num_buckets):
    from ..stages.aggregate import bucket_by_key
    from ..stages.dedup import MinHashBandStage

    stage = MinHashBandStage(num_perm, bands, shingle_k, text_col, id_col)
    return bucket_by_key(
        ds.map_batches(stage, batch_format="pyarrow"), "band_key", num_buckets
    )


def build_minhash_index(
    ds,
    index_dir: str,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = DEFAULT_BUCKETS,
) -> str:
    """Fresh index build over the PRIOR corpus: one streaming band pass,
    hive-bucketed parquet out. Clears any previous index at ``index_dir``
    (a partial previous build must never mix in); the meta file publishes
    LAST, so a crashed build is never loadable."""
    import shutil

    shutil.rmtree(index_dir, ignore_errors=True)
    os.makedirs(index_dir, exist_ok=True)
    _banded(ds, num_perm, bands, shingle_k, text_col, id_col, num_buckets).write_parquet(
        index_dir, partition_cols=["_bucket"]
    )
    params = _meta_params(num_perm, bands, shingle_k, id_col)
    tmp = os.path.join(index_dir, INDEX_META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(params, f)
    os.replace(tmp, os.path.join(index_dir, INDEX_META))
    return index_dir


def append_minhash_index(
    ds,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = DEFAULT_BUCKETS,
) -> str:
    """Append a dump's KEPT docs to an existing index (band parameters come
    from the index meta — the caller cannot desynchronize them)."""
    path = os.path.join(index_dir, INDEX_META)
    if not os.path.exists(path):
        raise FileNotFoundError(
            "minhash_index: %r has no %s — build_minhash_index first"
            % (index_dir, INDEX_META)
        )
    with open(path) as f:
        meta = json.load(f)
    if meta.get("id_col") != id_col:
        raise ValueError(
            "minhash_index: index id_col %r != requested %r"
            % (meta.get("id_col"), id_col)
        )
    _banded(
        ds, meta["num_perm"], meta["bands"], meta["shingle_k"],
        text_col, id_col, num_buckets,
    ).write_parquet(index_dir, partition_cols=["_bucket"])
    return index_dir


def load_minhash_index(
    index_dir: str,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    id_col: str = "doc_id",
):
    """Dataset of (band_key, id) for the prior corpus, after verifying the
    index was built with exactly the requested band parameters."""
    import ray.data

    _check_meta(index_dir, _meta_params(num_perm, bands, shingle_k, id_col))
    files = sorted(
        glob.glob(os.path.join(index_dir, "_bucket=*", "*.parquet"))
    )
    if not files:
        # an empty prior corpus is legal (first-ever dump): typed empty
        return ray.data.from_arrow(
            pa.table(
                {
                    "band_key": pa.array([], type=pa.int64()),
                    id_col: pa.array([], type=pa.int64()),
                }
            )
        )
    return ray.data.read_parquet(files, columns=["band_key", id_col])
