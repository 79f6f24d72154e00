"""Local driver-gate harness: run every ``__ray_entry__.queries()`` entry
and compare against its ``oracle_sql()`` DuckDB result, the same way the
round driver does (sorted columns, stringified value hash).

Usage:  PYTHONPATH=/root/repo python tools/check_oracles.py [sf_dir] [--only name1,name2]

NOTE: the transcript-pipeline oracles (sink_counts, *_counts, routed_rows,
conv_*, parse_tokens, log_field_counts, frequent_tokens) embed absolute
paths to the deterministic transcript table generated for
``__ray_entry__.ORACLE_SF_DIR`` (sf0.01 — the scale the round driver
compares at). Running this gate with a different sf_dir therefore reports
expected MISMATCHes for exactly those queries; every query that takes
sf_dir symmetrically (documents/events/embeddings tables) must still MATCH.

Owns its own Ray session (scripts may; library code must not)."""

from __future__ import annotations

import hashlib
import importlib.util
import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def norm_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].reset_index(drop=True)
    return hashlib.sha256(
        pd.util.hash_pandas_object(df.astype(str), index=False).values.tobytes()
    ).hexdigest()


def main() -> int:
    args = sys.argv[1:]
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    sf = args[0] if args else "/root/testdata/sf0.01"
    sys.path.insert(0, REPO)
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", os.path.join(REPO, "__ray_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs, oracles = mod.queries(), mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, t + ".parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    fails = []
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        try:
            res = fn(sf)
            df = res.to_pandas() if hasattr(res, "to_pandas") else res
            if name not in oracles:
                print(f"{name}: rows-only {len(df)}")
                continue
            odf = con.sql(oracles[name]).df()
            ok = (
                len(df) == len(odf)
                and sorted(df.columns) == sorted(odf.columns)
                and norm_hash(df) == norm_hash(odf)
            )
            print(f"{name}: {'MATCH' if ok else 'MISMATCH'} {len(df)}/{len(odf)}")
            if not ok:
                fails.append(name)
        except Exception as e:  # keep going: report every failure at once
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            fails.append(name)
    print("FAILS:", fails)
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
