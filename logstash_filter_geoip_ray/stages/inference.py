"""Batched model-inference plumbing: the actor-pool ``map_batches`` pattern
every model-scoring stage needs — weights/session/tokenizer loaded ONCE per
actor in ``__init__`` (never per batch), scoring fully vectorized per batch.

The demonstration model is an integer-milli LINEAR scorer over exact text
features (char length, whitespace token count, letter-frequency count) so a
DuckDB oracle can replay the scores bit-for-bit — the plumbing (model file →
actor constructor → vectorized ``__call__`` → aggregate) is exactly what a
real ONNX/torch scorer would use; swap :meth:`LinearQualityScorer._score`
for a real forward pass without touching anything else. The reference's
analogue is the per-worker mmap'd MMDB the enrich actors pin
(GeoIPFilter.java:85-92 reader lifecycle) — state lives with the worker,
batches stream through it.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: integer-milli weights — the single source of truth; the model FILE and
#: the SQL oracle are both generated from this mapping
QUALITY_WEIGHTS: Dict[str, int] = {
    "bias": 500,
    "char_len": 3,
    "token_count": -40,
    "e_count": 7,
}

_MODEL_DIR = "/tmp/graft_models"
_MODEL_VERSION = "linear_quality_v1"


def _weights_table() -> pa.Table:
    return pa.table(
        {
            "feature": pa.array(list(QUALITY_WEIGHTS), type=pa.string()),
            "w_milli": pa.array(
                list(QUALITY_WEIGHTS.values()), type=pa.int64()
            ),
        }
    )


def ensure_model_file(path: Optional[str] = None) -> str:
    """Materialize the weights as a parquet model artifact (deterministic,
    cached) — the thing a real deployment would ship; actors load THIS, not
    the source constant, so the load path is honest. A cached file whose
    contents disagree with QUALITY_WEIGHTS (edited constant, stale /tmp) is
    rewritten rather than silently trusted."""
    import pyarrow.parquet as pq

    path = path or os.path.join(_MODEL_DIR, f"{_MODEL_VERSION}.parquet")
    want = _weights_table()
    if os.path.exists(path):
        try:
            have = pq.read_table(path)
            if have.sort_by("feature").equals(want.sort_by("feature")):
                return path
        except Exception:
            pass  # torn/unreadable cache → rewrite below
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # unique tmp per writer: concurrent processes never clobber each
    # other's in-flight file; os.replace publishes atomically
    tmp = f"{path}.{os.getpid()}.tmp"
    pq.write_table(want, tmp)
    os.replace(tmp, path)
    return path


class LinearQualityScorer:
    """Actor-pool scoring stage: ``map_batches(LinearQualityScorer,
    fn_constructor_kwargs={"model_path": ...}, concurrency=N)``.

    ``__init__`` runs once per actor (model load); ``__call__`` once per
    batch (vectorized feature build + integer dot product — no Python row
    loop). Emits ``score_milli`` (int64) beside the input columns."""

    def __init__(
        self,
        model_path: Optional[str] = None,
        model_blob=None,
        text_col: str = "text",
    ):
        import pyarrow.parquet as pq

        if model_blob is not None:
            # broadcast path (multi-node correct): the driver ray.put() the
            # artifact bytes once; every actor reads from the object store
            import ray

            if isinstance(model_blob, ray.ObjectRef):
                model_blob = ray.get(model_blob)
            t = pq.read_table(pa.BufferReader(model_blob))
        elif model_path is not None:
            t = pq.read_table(model_path)
        else:
            raise ValueError("need model_path or model_blob")
        w = dict(
            zip(t["feature"].to_pylist(), t["w_milli"].to_pylist())
        )
        missing = set(QUALITY_WEIGHTS) - set(w)
        if missing:
            raise ValueError(f"model file missing weights: {sorted(missing)}")
        self.w = w
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.textstats import token_counts

        text = batch[self.text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        chars = pc.cast(pc.utf8_length(text), pa.int64())
        toks = pc.cast(token_counts(text), pa.int64())
        e_cnt = pc.cast(pc.count_substring(text, "e"), pa.int64())
        score = pc.add(
            pa.scalar(self.w["bias"], type=pa.int64()),
            pc.add(
                pc.multiply(chars, self.w["char_len"]),
                pc.add(
                    pc.multiply(toks, self.w["token_count"]),
                    pc.multiply(e_cnt, self.w["e_count"]),
                ),
            ),
        )
        if "score_milli" in batch.column_names:
            batch = batch.drop_columns(["score_milli"])
        return batch.append_column("score_milli", score)


def model_score_rollup(
    ds,
    model_path: str,
    group_col: str = "lang",
    # autoscaling (min, max): a FIXED pool equal to the session cpu count
    # deadlocks the streaming executor — every cpu pinned by an idle actor,
    # none left for the producer read tasks (bit us in a 4-cpu session)
    concurrency=(1, 4),
):
    """Score a corpus through the actor pool and roll up per group:
    (group, n, sum/min/max score_milli). The artifact bytes are read ONCE
    on the driver and broadcast through the object store (``ray.put``), so
    actors on any node of a real cluster load the same blob — never a
    driver-local /tmp path. The text column never leaves the scoring
    stage; only the tiny per-group aggregate shuffles."""
    import ray

    from .aggregate import tree_agg

    with open(model_path, "rb") as f:
        blob_ref = ray.put(f.read())

    scored = ds.map_batches(
        LinearQualityScorer,
        fn_constructor_kwargs={"model_blob": blob_ref},
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([group_col, "score_milli"])
        agg = t.group_by([group_col]).aggregate(
            [([], "count_all"), ("score_milli", "sum"),
             ("score_milli", "min"), ("score_milli", "max")]
        )
        return agg.rename_columns(
            [group_col, "n", "sum_score", "min_score", "max_score"]
        )

    def combine(batch: pa.Table) -> pa.Table:
        agg = batch.group_by([group_col]).aggregate(
            [("n", "sum"), ("sum_score", "sum"),
             ("min_score", "min"), ("max_score", "max")]
        )
        return agg.rename_columns(
            [group_col, "n", "sum_score", "min_score", "max_score"]
        ).sort_by([(group_col, "ascending")])

    return tree_agg(scored.map_batches(partial, batch_format="pyarrow"), combine)


def quality_score_oracle_sql(table: str = "documents") -> str:
    """SQL replay of the linear scorer, generated from QUALITY_WEIGHTS —
    the same token-count expression doc_stats' oracle pins."""
    w = QUALITY_WEIGHTS
    ws = (
        "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)"
    )
    tok = (
        f"CAST(CASE WHEN trim(text, {ws}) = '' THEN 0 "
        f"ELSE len(regexp_split_to_array(trim(text, {ws}), '\\s+')) END AS BIGINT)"
    )
    score = (
        f"({w['bias']} + {w['char_len']} * length(text) "
        f"+ ({w['token_count']}) * {tok} "
        f"+ {w['e_count']} * (length(text) - length(replace(text, 'e', ''))))"
    )
    return f"""
WITH s AS (SELECT lang, {score} AS score FROM {table})
SELECT lang, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(score) AS BIGINT) AS sum_score,
       CAST(min(score) AS BIGINT) AS min_score,
       CAST(max(score) AS BIGINT) AS max_score
FROM s GROUP BY 1 ORDER BY 1
"""
