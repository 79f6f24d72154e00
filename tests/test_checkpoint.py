"""Checkpoint/resume + lineage manifests (P8)."""

import glob
import json
import os

import pyarrow.parquet as pq

from logstash_filter_geoip_ray.sources.transcripts import transcripts_path
from logstash_filter_geoip_ray.state.checkpoint import (
    load_manifest,
    manifest_path,
    output_path,
    run_checkpointed,
)

ROWS = 200_000  # ~4 shards at 64Ki rows/shard
SF = "/root/testdata/sf0.001"


def test_checkpointed_run_and_resume(ray_session, tmp_path):
    input_dir = transcripts_path(SF, rows=ROWS)
    out_dir = str(tmp_path / "ckpt")

    s1 = run_checkpointed(input_dir, out_dir)
    assert s1["shards_total"] == 4
    assert s1["shards_processed"] == 4 and s1["shards_skipped"] == 0
    assert s1["output_rows"] == ROWS

    # manifests carry lineage
    inputs = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    m0 = load_manifest(out_dir, inputs[0])
    assert m0["status"] == "done"
    assert m0["input_rows"] == m0["output_rows"] > 0
    assert 0 < m0["ok_rows"] < m0["output_rows"]
    assert m0["config_hash"] == s1["config_hash"]

    # full resume: nothing to do
    s2 = run_checkpointed(input_dir, out_dir)
    assert s2["shards_processed"] == 0 and s2["shards_skipped"] == 4
    assert s2["output_rows"] == ROWS

    # partial resume: drop one shard's manifest + output → only it reruns
    os.remove(manifest_path(out_dir, inputs[1]))
    os.remove(output_path(out_dir, inputs[1]))
    s3 = run_checkpointed(input_dir, out_dir)
    assert s3["shards_processed"] == 1 and s3["shards_skipped"] == 3
    assert s3["output_rows"] == ROWS

    # outputs are complete and enriched
    total = sum(
        pq.read_table(f).num_rows
        for f in glob.glob(os.path.join(out_dir, "data", "*.parquet"))
    )
    assert total == ROWS
    sample = pq.read_table(output_path(out_dir, inputs[0]))
    assert "geoip" in sample.column_names and "country" in sample.column_names


def test_count_ok_rows_ignores_preexisting_tags():
    """ok_rows is derived from target-struct validity, so rows that succeed
    while already carrying a tags value are still counted."""
    import pyarrow as pa

    from logstash_filter_geoip_ray.state.checkpoint import count_ok_rows

    target = pa.array(
        [
            {"city_name": "Milton", "asn": None},  # success
            {"city_name": None, "asn": None},  # attempted-but-failed
            None,  # not attempted
            {"city_name": None, "asn": 1221},  # success (partial fields)
        ],
        type=pa.struct([("city_name", pa.string()), ("asn", pa.int64())]),
    )
    tags = pa.array([["kept"], ["_geoip_lookup_failure"], None, ["kept"]],
                    type=pa.list_(pa.string()))
    tbl = pa.table({"geoip": target, "tags": tags})
    assert count_ok_rows(tbl, "geoip") == 2
    assert count_ok_rows(tbl, "missing_col") == 0


def test_config_change_invalidates(ray_session, tmp_path):
    from logstash_filter_geoip_ray.functions.config import GeoIPConfig
    from logstash_filter_geoip_ray.sources.transcripts import DEFAULT_CITY_DB

    input_dir = transcripts_path(SF, rows=ROWS)
    out_dir = str(tmp_path / "ckpt2")
    run_checkpointed(input_dir, out_dir)
    other = GeoIPConfig(source="source_ip", database=DEFAULT_CITY_DB, cache_size=77)
    s = run_checkpointed(input_dir, out_dir, config=other)
    assert s["shards_processed"] == 4  # different config hash → full rerun


def test_corrupted_manifest_triggers_rerun(ray_session, tmp_path):
    """A truncated/corrupt manifest is treated as pending, not a crash."""
    from logstash_filter_geoip_ray.state.checkpoint import manifest_path

    input_dir = transcripts_path(SF, rows=ROWS)
    out_dir = str(tmp_path / "ckpt3")
    run_checkpointed(input_dir, out_dir)
    import glob as _glob

    first = sorted(_glob.glob(os.path.join(input_dir, "*.parquet")))[0]
    with open(manifest_path(out_dir, first), "w") as f:
        f.write('{"status": "done", "truncat')  # invalid JSON
    s = run_checkpointed(input_dir, out_dir)
    assert s["shards_processed"] == 1 and s["shards_skipped"] == 3
    assert load_manifest(out_dir, first)["status"] == "done"
