"""CLI entry points — the operational surface a reference (Logstash) user
would drive. Owns the Ray session (guarded init; library code never inits).

Usage:
  python -m logstash_filter_geoip_ray enrich --input DIR --output DIR
      [--database PATH] [--source-column source_ip] [--ecs v1]
      [--resume/--no-resume]
  python -m logstash_filter_geoip_ray pipeline --sf-dir DIR --routed-out DIR
  python -m logstash_filter_geoip_ray validate-db PATH
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_init(num_cpus=None):
    import os

    import ray

    if not ray.is_initialized():
        # RAY_ADDRESS=local (the default here) starts a fresh single-node
        # instance; under `ray job submit` the job runtime exports the
        # cluster address and this connects to it instead — the same CLI is
        # the job entrypoint on a real cluster:
        #   ray job submit --working-dir . -- \
        #     python -m logstash_filter_geoip_ray pipeline --sf-dir s3://...
        addr = os.environ.get("RAY_ADDRESS", "local")
        kwargs = dict(address=addr, logging_level="ERROR")
        if addr == "local":
            kwargs["include_dashboard"] = False
            if num_cpus:
                kwargs["num_cpus"] = num_cpus
        elif num_cpus:
            print(
                "warning: --num-cpus ignored when connecting to an existing "
                "cluster (RAY_ADDRESS=%s); size the cluster instead" % addr,
                file=sys.stderr,
            )
        ray.init(**kwargs)
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    # see bench.py: reservation strangles short map-heavy pipelines locally
    ctx.op_resource_reservation_enabled = False
    try:
        # raise the streaming in-flight cap (default throttles this workload
        # ~15% on this node); internal API, so guarded
        from ray.data._internal.execution.interfaces import ExecutionResources

        ctx.execution_options.resource_limits = ExecutionResources.for_limits(
            object_store_memory=24e9
        )
    except Exception:
        pass
    return ray


def cmd_enrich(args) -> int:
    from .functions.config import GeoIPConfig
    from .state.checkpoint import run_checkpointed

    ray = _ray_init(args.num_cpus)
    config = GeoIPConfig(
        source=args.source_column,
        database=args.database,
        ecs_compatibility=args.ecs,
        target=args.target,
    )
    config.resolved_target()  # fail config errors here, not inside N tasks
    config.resolved_database()
    summary = run_checkpointed(args.input, args.output, config=config)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


def cmd_pipeline(args) -> int:
    from .pipelines.geoip_pipeline import (
        build_enriched,
        country_turn_histogram,
        sink_counts,
        write_routed,
        write_routed_bucketed,
    )

    ray = _ray_init(args.num_cpus)
    # build once; materialize so the three consumers share one execution
    enriched = build_enriched(args.sf_dir).materialize()
    counts = sink_counts(enriched).to_pandas()
    hist = country_turn_histogram(enriched).to_pandas()
    if args.routed_out:
        if args.routed_mode == "bucket":
            write_routed_bucketed(enriched, args.routed_out)
        else:
            write_routed(enriched, args.routed_out, cluster=args.routed_mode == "sort")
    print(
        json.dumps(
            {
                "rows": int(counts["n"].sum()),
                "sinks": len(counts),
                "histogram_buckets": len(hist),
                "routed_out": args.routed_out,
            }
        )
    )
    ray.shutdown()
    return 0


def cmd_validate_db(args) -> int:
    from .state.mmdb import MMDBReader, is_database_valid

    if not is_database_valid(args.path):
        print("The database provided is invalid or corrupted.", file=sys.stderr)
        return 1
    with MMDBReader(args.path) as r:
        print(
            json.dumps(
                {
                    "database_type": r.database_type,
                    "node_count": r.node_count,
                    "record_size": r.record_size,
                    "ip_version": r.ip_version,
                }
            )
        )
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="logstash_filter_geoip_ray")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("enrich", help="checkpointed enrich of a shard directory")
    p.add_argument("--input", required=True, help="directory of parquet shards")
    p.add_argument("--output", required=True)
    p.add_argument("--database", default=None)
    p.add_argument("--source-column", default="source_ip")
    p.add_argument("--target", default=None)
    p.add_argument("--ecs", default="disabled", choices=["disabled", "v1", "v8"])
    p.add_argument("--num-cpus", type=int, default=None)
    p.set_defaults(fn=cmd_enrich)

    p = sub.add_parser("pipeline", help="full parse→enrich→route→aggregate run")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--routed-out", default=None)
    p.add_argument(
        "--routed-mode",
        default="stream",
        choices=["stream", "sort", "bucket"],
        help="stream: cheapest wall, many files; sort: range-cluster; "
        "bucket: staged hash exchange, one file per sink",
    )
    p.add_argument("--num-cpus", type=int, default=None)
    p.set_defaults(fn=cmd_pipeline)

    p = sub.add_parser("validate-db", help="probe an MMDB file")
    p.add_argument("path")
    p.set_defaults(fn=cmd_validate_db)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
