"""Driver-window rotation canary.

The round driver hash-compares only the FIRST 50 registered oracle-backed
``__ray_entry__.queries()`` entries (the "window"). From round 4 the window
rotates each round so every oracle-backed query eventually earns a driver
CORRECTNESS row — but rotation must never *hide* a regression: a query that
leaves the window stops being driver-checked, so this tool re-verifies every
departed query against its DuckDB oracle locally and fails loudly if any
broke since the round that last checked them.

Usage:
    PYTHONPATH=/root/repo python tools/window_canary.py [prev_correctness.json] [sf_dir]

Defaults: the newest CORRECTNESS_r*.json in the repo root, sf0.01 (the scale
the driver compares at). Exit 0 = every departed query still MATCHes its
oracle; exit 1 = at least one departed query fails (the rotation would have
hidden it). Run in the round-end gate alongside tools/check_oracles.py.
"""

from __future__ import annotations

import glob
import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def current_window() -> list[str]:
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", os.path.join(REPO, "__ray_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sql = mod.oracle_sql()
    oracle_backed = [n for n in mod.queries() if n in sql]
    return oracle_backed[:50]


def main() -> int:
    args = sys.argv[1:]
    if args and args[0].endswith(".json"):
        prev_path, args = args[0], args[1:]
    else:
        rounds = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
        if not rounds:
            print("window_canary: no CORRECTNESS_r*.json found — nothing to diff")
            return 0
        prev_path = rounds[-1]
    sf = args[0] if args else "/root/testdata/sf0.01"

    prev = set(json.load(open(prev_path)))
    window = current_window()
    departed = sorted(prev - set(window))
    entered = sorted(set(window) - prev)
    print(
        "window_canary: prev=%s (%d rows); current window %d; departed %d; entered %d"
        % (os.path.basename(prev_path), len(prev), len(window), len(departed), len(entered))
    )
    if not departed:
        print("window_canary: no queries left the window — OK")
        return 0

    # re-run each departed query against its local oracle with the same
    # compare the driver uses (check_oracles owns the Ray session)
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "check_oracles.py"),
            sf,
            "--only",
            ",".join(departed),
        ],
        env=dict(os.environ, PYTHONPATH=REPO),
        capture_output=True,
        text=True,
    )
    tail = [
        ln
        for ln in proc.stdout.splitlines()
        if ln.startswith("FAILS:") or ": MATCH" in ln or "MISMATCH" in ln or "rows-only" in ln
    ]
    for ln in tail:
        print(ln)
    ok = proc.returncode == 0 and "FAILS: []" in proc.stdout
    if ok:
        print("window_canary: all %d departed queries still MATCH — rotation safe" % len(departed))
        return 0
    print("window_canary: FAILURE — a query left the driver window while its local oracle row broke")
    if proc.returncode != 0 and not tail:
        print(proc.stderr[-2000:])
    return 1


if __name__ == "__main__":
    sys.exit(main())
