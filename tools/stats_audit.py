"""Per-stage wall-time audit of the headline pipeline: runs sink_counts at
the given SF, then parses `ds.stats()` into one JSON line per operator —
wall time, block count, and rows out — so a perf regression is attributable
to a STAGE, not just the total. The discipline behind every round's
"UDF share of stage time" claims in BASELINE.md.

Usage: PYTHONPATH=/root/repo python tools/stats_audit.py [sf_dir]
Owns its own Ray session (scripts may; library code must not)."""

from __future__ import annotations

import json
import re
import sys
import time


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    from logstash_filter_geoip_ray.pipelines.geoip_pipeline import (
        build_enriched,
        sink_counts,
    )

    t0 = time.perf_counter()
    ds = sink_counts(
        build_enriched(sf, columns=["text", "tool"], drop_text=True)
    ).materialize()
    wall = time.perf_counter() - t0
    stats = ds.stats()

    # operator blocks look like: "Operator N <name>: ... blocks executed in <t>s"
    ops = []
    for m in re.finditer(
        r"Operator (\d+) (.+?): (?:\d+ tasks executed, )?(\d+) blocks "
        r"(?:produced|executed) in ([\d.]+)s",
        stats,
    ):
        ops.append(
            {
                "operator": m.group(2),
                "blocks": int(m.group(3)),
                "wall_s": float(m.group(4)),
            }
        )
    print(
        json.dumps(
            {
                "sf_dir": sf,
                "total_wall_s": round(wall, 3),
                "result_rows": ds.count(),
                "operators": ops,
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
