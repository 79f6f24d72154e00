"""Ray stages for text analysis over the ``documents`` table: per-doc stats
(token counts, md5 fingerprint, rolling fingerprint, quality features,
language-ID) and per-language aggregates. Thin ``map_batches`` wrappers over
functions/textstats.py kernels."""

from __future__ import annotations

import pyarrow as pa

from ..functions.textstats import (
    bpe_ish_token_counts,
    language_id,
    md5_fingerprints,
    quality_features,
    rolling_fingerprint,
    token_counts,
)
from .aggregate import grouped_counts


def doc_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, token_count, fingerprint) — oracle-expressible subset."""

    def stats(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        out = batch.select([id_col])
        out = out.append_column("token_count", token_counts(text))
        out = out.append_column("fingerprint", md5_fingerprints(text))
        return out

    return ds.map_batches(stats, batch_format="pyarrow").sort(id_col)


def doc_analysis(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Full analysis: quality features + language-ID + fingerprints.
    (Heuristic columns → rows-only oracle.)"""

    def analyze(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        feats = quality_features(texts)
        out = batch.select([id_col])
        for name in ("char_len", "token_count"):
            out = out.append_column(name, pa.array(feats[name]))
        for name in ("mean_word_len", "punct_ratio", "stopword_ratio"):
            out = out.append_column(name, pa.array(feats[name]))
        out = out.append_column("lang_guess", pa.array(language_id(texts), type=pa.string()))
        out = out.append_column(
            "bpe_tokens", pa.array(bpe_ish_token_counts(texts), type=pa.int64())
        )
        out = out.append_column(
            "rolling_fp", pa.array(rolling_fingerprint(texts), type=pa.int64())
        )
        return out

    return ds.map_batches(analyze, batch_format="pyarrow").sort(id_col)


#: PII-ish scrub patterns (RE2 in both engines): IPv4 literals and emails —
#: the privacy pass a log/training-data pipeline runs before retention.
MASK_PATTERNS = (
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
)


def normalize_and_mask(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    mask: bool = True,
    out_col: str = "clean_text",
):
    """Vectorized text normalization + PII masking: lowercase, trim,
    whitespace-collapse, then regexp-mask IPv4/email literals. Pure
    ``pyarrow.compute`` kernels (utf8_lower / replace_substring_regex) — no
    Python row loop — and expressible 1:1 in SQL for the oracle."""
    import pyarrow.compute as pc

    def clean(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        t = pc.utf8_lower(pc.utf8_trim_whitespace(text))
        t = pc.replace_substring_regex(t, pattern=r"\s+", replacement=" ")
        if mask:
            for pattern, repl in MASK_PATTERNS:
                t = pc.replace_substring_regex(t, pattern=pattern, replacement=repl)
        return batch.select([id_col]).append_column(out_col, t)

    return ds.map_batches(clean, batch_format="pyarrow").sort(id_col)


def lang_stats(ds, text_col: str = "text", lang_col: str = "lang"):
    """Per-language doc counts + total chars + total tokens (all ints →
    exact oracle comparison). Partial-aggregated before the shuffle."""
    from ray.data.aggregate import Sum

    def per_batch(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        import pyarrow.compute as pc

        work = pa.table(
            {
                lang_col: batch[lang_col],
                "chars": pc.utf8_length(text).cast(pa.int64()),
                "tokens": token_counts(text),
            }
        )
        agg = work.group_by([lang_col]).aggregate(
            [("chars", "sum"), ("tokens", "sum"), ([], "count_all")]
        )
        return agg.rename_columns([lang_col, "total_chars", "total_tokens", "n_docs"])

    partials = ds.map_batches(per_batch, batch_format="pyarrow")
    return (
        partials.groupby(lang_col)
        .aggregate(
            Sum("total_chars", alias_name="total_chars"),
            Sum("total_tokens", alias_name="total_tokens"),
            Sum("n_docs", alias_name="n_docs"),
        )
        .sort(lang_col)
    )
