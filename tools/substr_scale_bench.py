"""EXACTSUBSTR scale benchmark: 1M docs / ~210M chars, 2^31-bit sketch.

A/B harness for the sharded final sketch reduction (round-5 verdict item:
"no single task holds a full-width bitmap").  Runs ``duplicated_spans``
over a deterministic synthetic corpus with planted duplicated passages,
asserting the exact planted span set is found, and reports wall time:

    python tools/substr_scale_bench.py               # auto shards (sharded reduce)
    python tools/substr_scale_bench.py --shards 1    # old single-task final reduce
    python tools/substr_scale_bench.py --docs 200000 --bits 28

Owns its own Ray session (scripts may; library code must not).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_corpus(n_docs: int, seed: int = 42):
    """Deterministic corpus: ~210 chars/doc; 2% of docs embed one of 50
    shared passages (each passage therefore appears ~400x — unambiguously
    duplicated), the rest are unique random text."""
    rng = np.random.default_rng(seed)
    alpha = np.array(list("abcdefghijklmnopqrstuvwxyz      "), dtype="<U1")
    passages = [
        "".join(rng.choice(alpha, size=80).tolist()) for _ in range(50)
    ]
    body = rng.choice(alpha, size=(n_docs, 200))
    planted = rng.random(n_docs) < 0.02
    which = rng.integers(0, len(passages), size=n_docs)
    docs = []
    for i in range(n_docs):
        t = "".join(body[i].tolist())
        if planted[i]:
            t = t[:60] + passages[which[i]] + t[60:]
        docs.append(t)
    return docs, planted


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--bits", type=int, default=31, help="log2 sketch_bits")
    ap.add_argument("--shards", type=int, default=None,
                    help="reduce_shards override (1 = old single-task reduce)")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--stages", action="store_true",
                    help="measure per-stage walls of window_sketch_pair only "
                         "(partials / level-1 / final reduce)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from logstash_filter_geoip_ray.stages.dedup import duplicated_spans

    t0 = time.perf_counter()
    docs, planted = make_corpus(args.docs)
    gen_s = time.perf_counter() - t0
    n_chars = sum(len(d) for d in docs)

    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(docs)]
    ).repartition(max(32, args.docs // 25_000))
    ds = ds.materialize()  # keep input build out of the measured window

    if args.stages:
        from logstash_filter_geoip_ray.stages.dedup import window_sketch_pair

        walls: dict = {}
        window_sketch_pair(
            ds, window=40, sketch_bits=1 << args.bits,
            reduce_shards=args.shards, stage_walls=walls,
        )
        print(json.dumps({
            "docs": args.docs, "sketch_bits_log2": args.bits,
            "reduce_shards": args.shards if args.shards is not None else "auto",
            "stage_walls_sec": {k: round(v, 3) for k, v in walls.items()},
            "final_le_level1": walls["final"] <= walls["level1"],
        }))
        ray.shutdown()
        return

    t0 = time.perf_counter()
    spans = duplicated_spans(
        ds, window=40, sketch_bits=1 << args.bits,
        **({"reduce_shards": args.shards} if args.shards is not None else {}),
    )
    import pandas as pd

    out = spans if isinstance(spans, pd.DataFrame) else spans.to_pandas()
    wall = time.perf_counter() - t0

    found_docs = set(out["doc_id"].tolist())
    planted_ids = set(np.flatnonzero(planted).tolist())
    missing = planted_ids - found_docs
    extra = found_docs - planted_ids
    print(json.dumps({
        "docs": args.docs, "chars": n_chars, "sketch_bits_log2": args.bits,
        "reduce_shards": args.shards if args.shards is not None else "auto",
        "num_cpus": args.cpus, "gen_sec": round(gen_s, 2),
        "spans_wall_sec": round(wall, 3), "span_rows": len(out),
        "planted_docs": len(planted_ids), "found_planted": len(planted_ids - missing),
        "missing": len(missing), "extra_docs": len(extra),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
