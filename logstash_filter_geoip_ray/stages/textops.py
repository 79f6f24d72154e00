"""Ray stages for text analysis over the ``documents`` table: per-doc stats
(token counts, md5 fingerprint, rolling fingerprint, quality features,
language-ID) and per-language aggregates. Thin ``map_batches`` wrappers over
functions/textstats.py kernels."""

from __future__ import annotations

from typing import Dict, Optional

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


def compression_ratios(texts, level: int = 6):
    """Per-doc zlib compression ratio in milli (compressed_len * 1000 //
    raw_len; empty text → None). The standard web-corpus repetitiveness
    signal (highly compressible ⇒ boilerplate/duplicated content). zlib is
    deterministic for a fixed level, so results are hash-stable; the loop
    body is one C call per doc (the language-ID precedent for per-doc
    kernels SQL cannot express)."""
    import zlib

    out = []
    for t in texts:
        if t is None:
            out.append(None)
            continue
        raw = t.encode("utf-8")
        if not raw:
            out.append(None)
            continue
        out.append(len(zlib.compress(raw, level)) * 1000 // len(raw))
    return out


def compression_quality(
    ds,
    threshold_milli: int = 450,
    text_col: str = "text",
    group_col: str = "lang",
):
    """Compression-ratio quality rollup: per group — doc count, docs below
    the repetitiveness threshold (suspiciously compressible), and the milli
    ratio sum. Text never leaves the scoring map; only the tiny per-group
    aggregate shuffles. Rows-only registration (no zlib in SQL); pinned by
    the direct-zlib pytest reference."""
    import pyarrow.compute as pc

    from .aggregate import tree_sum

    def partial(batch: pa.Table) -> pa.Table:
        ratios = pa.array(
            compression_ratios(batch[text_col].to_pylist()), type=pa.int64()
        )
        low = pc.cast(pc.less(ratios, threshold_milli), pa.int64())
        t = pa.table(
            {
                group_col: batch[group_col],
                "ratio": pc.fill_null(ratios, 0),
                "low": pc.fill_null(low, 0),
                "one": pa.array([1] * batch.num_rows, type=pa.int64()),
            }
        )
        g = t.group_by([group_col]).aggregate(
            [("one", "sum"), ("low", "sum"), ("ratio", "sum")]
        )
        return g.rename_columns([group_col, "n", "n_low", "sum_ratio_milli"])

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return tree_sum(
        parts, [group_col], ["n", "n_low", "sum_ratio_milli"], sort_result=True
    )


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


def quality_filter(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    max_dup_milli: int = 500,
    max_top_milli: int = 150,
    passthrough: bool = False,
):
    """Gopher-style repetition quality filter: keep documents whose
    duplicate-word fraction and most-frequent-word fraction stay under
    thresholds (integer milli-units → exact oracle comparison).

    Per doc: token_total, dup_milli = 1000 - (1000·distinct)//total,
    top_milli = (1000·max_word_count)//total. Vectorized: the batch's words
    are exploded once (``utf8_split_whitespace`` → flatten with row index)
    and all per-doc stats come from two pandas groupbys over the exploded
    frame — no per-row Python loop. Embarrassingly parallel per batch, no
    shuffle; the final sort is on the (small) surviving id set.

    ``passthrough=True`` returns the surviving ROWS with all original
    columns (no stats, no sort) — the composable filter stage for
    multi-step curation pipelines; the batch stays streaming."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from .contamination import _flat_words

    def kernel(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        flat, idx = _flat_words(text)
        empty = pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "token_total": pa.array([], type=pa.int64()),
                "dup_milli": pa.array([], type=pa.int64()),
                "top_milli": pa.array([], type=pa.int64()),
            }
        )
        if len(flat) == 0:
            return batch.slice(0, 0) if passthrough else empty
        df = pd.DataFrame({"i": idx, "w": flat.to_numpy(zero_copy_only=False)})
        per_word = df.groupby(["i", "w"], sort=False).size()
        g = per_word.groupby(level=0)
        total = g.sum()
        distinct = g.size()
        top = g.max()
        token_total = total.to_numpy(dtype=np.int64)
        dup_milli = 1000 - (1000 * distinct.to_numpy(dtype=np.int64)) // token_total
        top_milli = (1000 * top.to_numpy(dtype=np.int64)) // token_total
        keep = (
            (token_total >= min_tokens)
            & (dup_milli <= max_dup_milli)
            & (top_milli <= max_top_milli)
        )
        rows = total.index.to_numpy(dtype=np.int64)[keep]
        if passthrough:
            return batch.take(pa.array(rows))
        ids = pc.take(pc.cast(batch[id_col], pa.int64()), pa.array(rows))
        return pa.table(
            {
                id_col: ids,
                "token_total": pa.array(token_total[keep], type=pa.int64()),
                "dup_milli": pa.array(dup_milli[keep], type=pa.int64()),
                "top_milli": pa.array(top_milli[keep], type=pa.int64()),
            }
        )

    out = ds.map_batches(kernel, batch_format="pyarrow")
    return out if passthrough else out.sort(id_col)


def repetition_filter(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_line_milli: int = 300,
    max_top_bigram_milli: int = 200,
):
    """Gopher-style *structural* repetition filter (the companion to
    :func:`quality_filter`'s word-level one): keep documents whose
    duplicate-LINE fraction and most-frequent-word-BIGRAM fraction stay
    under thresholds. Integer milli-units → exact oracle comparison.

    Per doc: n_lines (``'\\n'`` split), dup_line_milli =
    (1000·(n_lines − distinct_lines)) // n_lines, top_bigram_milli =
    (1000·max_bigram_count) // total_bigrams (0 when the doc has fewer than
    2 words). Every metric is local to its row, so the kernel is
    embarrassingly parallel per batch — one Arrow line explode + one
    ``_doc_ngrams`` bigram explode, all per-doc stats from pandas groupbys,
    no shuffle. Null-text docs are excluded (matching the SQL oracle's
    ``WHERE text IS NOT NULL``)."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from .contamination import _doc_ngrams

    def kernel(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        if pa.types.is_null(text.type):
            text = text.cast(pa.string())
        valid = pc.is_valid(text)
        rows = np.flatnonzero(valid.to_numpy(zero_copy_only=False))
        empty = pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "n_lines": pa.array([], type=pa.int64()),
                "dup_line_milli": pa.array([], type=pa.int64()),
                "top_bigram_milli": pa.array([], type=pa.int64()),
            }
        )
        if len(rows) == 0:
            return empty
        text = text.filter(valid)

        # line metrics: one list-explode, distinct-per-row via pandas
        lines = pc.split_pattern(text, "\n")
        lengths = lines.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        lidx = np.repeat(np.arange(len(lines), dtype=np.int64), lengths)
        ldf = pd.DataFrame(
            {"i": lidx, "l": lines.flatten().to_numpy(zero_copy_only=False)}
        )
        lg = ldf.groupby("i", sort=True)["l"]
        n_lines = lg.size().to_numpy(dtype=np.int64)  # >= 1 always
        n_distinct = lg.nunique().to_numpy(dtype=np.int64)
        dup_line_milli = (1000 * (n_lines - n_distinct)) // n_lines

        # bigram metrics (lowercased words, same tokenization as the
        # collocations/quality oracles)
        grams, gidx = _doc_ngrams(text, 2)
        top_bigram_milli = np.zeros(len(rows), dtype=np.int64)
        if len(gidx):
            gdf = pd.DataFrame(
                {"i": gidx, "g": grams.to_numpy(zero_copy_only=False)}
            )
            per_gram = gdf.groupby(["i", "g"], sort=False).size()
            gg = per_gram.groupby(level=0)
            gtot = gg.sum()
            gmax = gg.max()
            gi = gtot.index.to_numpy(dtype=np.int64)
            top_bigram_milli[gi] = (
                1000 * gmax.to_numpy(dtype=np.int64)
            ) // gtot.to_numpy(dtype=np.int64)

        keep = (dup_line_milli <= max_dup_line_milli) & (
            top_bigram_milli <= max_top_bigram_milli
        )
        kept_rows = rows[keep]
        ids = pc.take(pc.cast(batch[id_col], pa.int64()), pa.array(kept_rows))
        return pa.table(
            {
                id_col: ids,
                "n_lines": pa.array(n_lines[keep], type=pa.int64()),
                "dup_line_milli": pa.array(dup_line_milli[keep], type=pa.int64()),
                "top_bigram_milli": pa.array(
                    top_bigram_milli[keep], type=pa.int64()
                ),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow").sort(id_col)


def chunk_documents(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
):
    """RAG-prep chunking: split each doc into overlapping token windows —
    rows (doc_id, chunk_idx, n_tokens, chunk_text). Window starts step by
    ``chunk_tokens - overlap``; the final window may be short. Tokens are
    the whitespace split of the trimmed text (case-preserving, matching the
    SQL oracle's regexp_split); docs with no tokens emit nothing.

    Vectorized per batch (per-doc local, no shuffle): one word explode →
    each word's chunk memberships (≤ ceil(size/stride) per word) emitted by
    a numpy repeat → lexsort by (row, chunk, position) → one pandas groupby
    join builds every chunk string."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from .contamination import _flat_words

    stride = chunk_tokens - overlap
    assert stride > 0

    def kernel(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        flat, idx = _flat_words(text, lower=False)
        ids_col = batch[id_col]
        if isinstance(ids_col, pa.ChunkedArray):
            ids_col = ids_col.combine_chunks()
        if not len(idx):
            # id dtype preserved (string ids work like integer ones)
            return pa.table(
                {
                    id_col: pa.array([], type=ids_col.type),
                    "chunk_idx": pa.array([], type=pa.int64()),
                    "n_tokens": pa.array([], type=pa.int64()),
                    "chunk_text": pa.array([], type=pa.string()),
                }
            )
        # position of each word within its row
        starts = np.flatnonzero(np.r_[True, idx[1:] != idx[:-1]])
        row_start = np.repeat(starts, np.diff(np.r_[starts, len(idx)]))
        p = np.arange(len(idx), dtype=np.int64) - row_start
        # chunk membership range per word: c_min..c_max (overlap ⇒ ≥1)
        c_max = p // stride
        c_min = np.maximum(0, -(-(p - chunk_tokens + 1) // stride))
        reps = (c_max - c_min + 1).astype(np.int64)
        w_rep = np.repeat(np.arange(len(idx), dtype=np.int64), reps)
        # chunk index per emitted membership: c_min[w] + offset within run
        run_off = np.arange(len(w_rep), dtype=np.int64) - np.repeat(
            np.cumsum(np.r_[0, reps[:-1]]), reps
        )
        chunk_of = np.repeat(c_min, reps) + run_off
        order = np.lexsort((p[w_rep], chunk_of, idx[w_rep]))
        df = pd.DataFrame(
            {
                "i": idx[w_rep][order],
                "c": chunk_of[order],
                "w": flat.take(pa.array(w_rep[order])).to_numpy(
                    zero_copy_only=False
                ),
            }
        )
        g = df.groupby(["i", "c"], sort=True)["w"]
        joined = g.agg(" ".join)
        sizes = g.size()
        rows = joined.index.get_level_values(0).to_numpy(dtype=np.int64)
        ids = ids_col.take(pa.array(rows))
        return pa.table(
            {
                id_col: ids,
                "chunk_idx": pa.array(
                    joined.index.get_level_values(1).to_numpy(dtype=np.int64)
                ),
                "n_tokens": pa.array(sizes.to_numpy(dtype=np.int64)),
                "chunk_text": pa.array(joined.to_numpy(), type=pa.string()),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow").sort(
        [id_col, "chunk_idx"]
    )


def duplicated_window_stats(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    num_buckets: int = 64,
):
    """Substring-dedup signal (Lee et al. "Deduplicating Training Data"
    family, token-window approximation): per doc, how many of its word
    ``window``-gram positions carry a gram that occurs ≥ 2 times in the
    corpus (counting every occurrence, including within-doc repeats).
    Rows: (doc_id, n_windows, dup_windows, dup_milli) for docs with ≥ 1
    window. Integer milli → exact oracle.

    Scale shape (same one-shuffle form as :func:`shared_paragraphs`): the
    window rows ship as (doc_id, hash64(gram)) — 16 bytes each, never the
    gram text; each hash lands in exactly one bucket, so global occurrence
    counts and per-doc partials come out of that bucket; a docs-sized sum
    finishes. Hash collisions could in principle conflate two distinct
    grams (the same standard trade every content-hash dedup makes);
    vanishingly unlikely below ~10^9 distinct grams per 64-bit space."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ..functions.sketches import hash_strings64
    from .aggregate import bucket_by_key
    from .contamination import _doc_ngrams

    def explode(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        grams, gidx = _doc_ngrams(text, window)
        if not len(gidx):
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "h": pa.array([], type=pa.int64()),
                }
            )
        ids = pc.take(pc.cast(batch[id_col], pa.int64()), pa.array(gidx))
        h = hash_strings64(grams).view(np.int64)
        return pa.table({id_col: ids, "h": pa.array(h)})

    rows = ds.map_batches(explode, batch_format="pyarrow")
    bucketed = bucket_by_key(rows, "h", num_buckets)

    def bucket_partial(block: pd.DataFrame) -> pd.DataFrame:
        cnt = block.groupby("h", sort=False)["h"].transform("size")
        dup = (cnt >= 2).astype("int64")
        g = block.assign(_d=dup).groupby(id_col, sort=False)["_d"]
        out = g.agg(["count", "sum"]).reset_index()
        out.columns = [id_col, "n_windows", "dup_windows"]
        return out

    partials = bucketed.groupby("_bucket").map_groups(
        bucket_partial, batch_format="pandas"
    )
    summed = partials.groupby(id_col).aggregate(
        Sum("n_windows", alias_name="n_windows"),
        Sum("dup_windows", alias_name="dup_windows"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n_windows"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch["dup_windows"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: pc.cast(batch[id_col], pa.int64()),
                "n_windows": pa.array(n, type=pa.int64()),
                "dup_windows": pa.array(d, type=pa.int64()),
                "dup_milli": pa.array((1000 * d) // n, type=pa.int64()),
            }
        )

    return summed.map_batches(finish, batch_format="pyarrow").sort(id_col)


def quality_threshold_filter(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    p_milli: int = 900,
):
    """Top-quantile selection by an integer quality score (here: token
    count) — the "keep the best X%" curation step. Keeps every doc whose
    score ≥ the p-th discrete quantile (quantile_disc convention:
    sorted-ascending index ``ceil(n·p) − 1``, matching DuckDB), so ties at
    the threshold are kept deterministically. Rows: (doc_id, score).

    Scale shape: scores are computed vectorized per batch; the threshold
    comes from a score HISTOGRAM (grouped partial counts → driver pull
    bounded by the number of DISTINCT score values, not docs — token counts
    are bounded by document length, orders of magnitude below corpus size);
    the filter pass is then embarrassingly parallel. The corpus is scanned
    twice (score histogram, filter) rather than materialized."""
    import numpy as np
    import pyarrow.compute as pc

    from .aggregate import grouped_counts
    from .contamination import _flat_words

    def scores_of(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        if pa.types.is_null(text.type):
            text = text.cast(pa.string())
        valid = pc.is_valid(text)
        text = text.filter(valid)
        ids = pc.cast(batch[id_col], pa.int64()).filter(valid)
        _, idx = _flat_words(text)
        counts = (
            np.bincount(idx, minlength=len(text)).astype(np.int64)
            if len(idx)
            else np.zeros(len(text), dtype=np.int64)
        )
        return pa.table({id_col: ids, "score": pa.array(counts, type=pa.int64())})

    scored = ds.map_batches(scores_of, batch_format="pyarrow")
    hist = grouped_counts(
        scored.select_columns(["score"]), ["score"], "c"
    ).to_pandas()
    if not len(hist):
        return scored  # empty corpus: nothing to threshold
    hist = hist.sort_values("score").reset_index(drop=True)
    n = int(hist["c"].sum())
    rank = (n * p_milli + 999) // 1000 - 1  # ceil(n·p) − 1, 0-indexed
    cum = hist["c"].cumsum()
    q = int(hist["score"][int((cum > rank).idxmax())])

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch["score"], q))

    return scored.map_batches(keep, batch_format="pyarrow").sort(id_col)


def shared_paragraphs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
):
    """Paragraph-level duplication stats (the Dolma-style paragraph-dedup
    signal): per doc, how many of its distinct non-empty paragraphs
    (``'\\n'``-separated) also appear in at least one other doc.
    Rows: (doc_id, n_paras, shared_paras, shared_milli) for docs with ≥ 1
    non-empty paragraph. Integer milli → exact oracle.

    Scale shape: one explode to distinct (doc, paragraph) rows → paragraphs
    co-locate by hash bucket (each paragraph's rows land in exactly ONE
    bucket, so its document-frequency is computable inside that bucket — no
    separate df table, no join) → per-bucket vectorized partials
    (doc_id, n_paras, shared_paras) → tiny per-doc sum. Shuffle volume =
    distinct (doc, paragraph) pairs, the same class as the inverted index;
    the final aggregate is docs-sized."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from .aggregate import bucket_by_key

    def explode(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        if pa.types.is_null(text.type):
            text = text.cast(pa.string())
        valid = pc.is_valid(text)
        text = text.filter(valid)
        ids = pc.cast(batch[id_col], pa.int64()).filter(valid)
        paras = pc.split_pattern(text, "\n")
        lengths = paras.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.repeat(np.arange(len(paras), dtype=np.int64), lengths)
        flat = paras.flatten()
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                id_col: pc.take(ids, pa.array(idx[keep])),
                "para": flat.filter(pa.array(keep)),
            }
        )
        # distinct per doc WITHIN the batch (each doc is one row, so this is
        # the global per-doc distinct)
        return t.group_by([id_col, "para"]).aggregate([])

    pairs = ds.map_batches(explode, batch_format="pyarrow")
    bucketed = bucket_by_key(pairs, "para", num_buckets)

    def bucket_partial(block: pd.DataFrame) -> pd.DataFrame:
        # rows are globally distinct (doc, para) pairs, so per-paragraph
        # size == distinct-doc count — transform("size") beats "nunique"
        df_per_para = block.groupby("para", sort=False)["para"].transform("size")
        shared = (df_per_para >= 2).astype("int64")
        g = block.assign(_s=shared).groupby(id_col, sort=False)["_s"]
        out = g.agg(["count", "sum"]).reset_index()
        out.columns = [id_col, "n_paras", "shared_paras"]
        return out

    partials = bucketed.groupby("_bucket").map_groups(
        bucket_partial, batch_format="pandas"
    )
    summed = partials.groupby(id_col).aggregate(
        Sum("n_paras", alias_name="n_paras"),
        Sum("shared_paras", alias_name="shared_paras"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n_paras"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch["shared_paras"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: pc.cast(batch[id_col], pa.int64()),
                "n_paras": pa.array(n, type=pa.int64()),
                "shared_paras": pa.array(s, type=pa.int64()),
                "shared_milli": pa.array((1000 * s) // n, type=pa.int64()),
            }
        )

    return summed.map_batches(finish, batch_format="pyarrow").sort(id_col)


def inverted_index(
    ds, text_col: str = "text", id_col: str = "doc_id", num_buckets: int = 64
):
    """Inverted index (the classic MapReduce shape): word → document
    frequency + comma-joined sorted posting list. Map side explodes each
    batch to DISTINCT (word, doc_id) pairs (per-batch dedup shrinks the
    shuffle to the posting-pair count); reduce side co-locates words by
    stable hash bucket and builds ALL of a bucket's posting lists in one
    vectorized pandas groupby — a bounded number of tasks, not one Python
    call per vocabulary word. At fleet scale the shuffle payload is exactly
    the index being built — there is no smaller exchange that still
    materializes global posting lists."""
    import pandas as pd
    import pyarrow.compute as pc

    from .aggregate import bucket_by_key
    from .contamination import _flat_words

    def explode(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        flat, idx = _flat_words(text)
        ids = pc.take(pc.cast(batch[id_col], pa.int64()), pa.array(idx))
        pairs = pa.table({"w": flat, id_col: ids})
        return pairs.group_by(["w", id_col]).aggregate([])

    def build_bucket(block: pd.DataFrame) -> pd.DataFrame:
        b = block.drop_duplicates(["w", id_col]).sort_values(["w", id_col])
        b[id_col] = b[id_col].astype(str)
        g = b.groupby("w", sort=True)
        sizes = g.size()
        return pd.DataFrame(
            {
                "w": sizes.index.to_numpy(),
                "df": sizes.to_numpy(),
                "postings": g[id_col].agg(",".join).to_numpy(),
            }
        )

    pairs = ds.map_batches(explode, batch_format="pyarrow")
    bucketed = bucket_by_key(pairs, "w", num_buckets)
    return (
        bucketed.groupby("_bucket")
        .map_groups(build_bucket, batch_format="pandas")
        .sort("w")
    )


def word_rarity_scores(
    ds, text_col: str = "text", id_col: str = "doc_id", num_buckets: int = 64
):
    """Per-document word-rarity score — the cheap perplexity proxy used to
    rank docs for curation without a language model: over each doc's
    DISTINCT lowercase words, the mean and minimum corpus document
    frequency. Low mean-df = rare/technical/noisy vocabulary; min-df = 1
    means the doc contains a corpus-unique token. Rows:
    (doc_id, n_words, df_sum, mean_df_milli, min_df) for docs with ≥ 1
    token. Integer milli arithmetic → exact oracle.

    Scale shape (same class as ``shared_paragraphs``): one explode to
    distinct (doc, word) rows → words co-locate by hash bucket, so each
    word's document frequency is computable inside its one bucket — no
    separate df table and NO join back to the pairs (the pairs are already
    in the bucket that owns their word's df) → per-bucket vectorized
    per-doc partials (count, df sum, df min) → docs-sized final aggregate.
    Shuffle volume = distinct (doc, word) pairs, exactly the inverted-index
    exchange."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from ray.data.aggregate import Min, Sum

    from .aggregate import bucket_by_key
    from .contamination import _flat_words

    def explode(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        flat, idx = _flat_words(text)
        ids = pc.take(pc.cast(batch[id_col], pa.int64()), pa.array(idx))
        pairs = pa.table({"w": flat, id_col: ids})
        pairs = pairs.filter(pc.not_equal(pairs["w"], ""))
        # per-batch distinct IS the global distinct: a doc's rows never
        # split across batches at explode time (one input row = one doc)
        return pairs.group_by(["w", id_col]).aggregate([])

    def bucket_partial(block: pd.DataFrame) -> pd.DataFrame:
        # rows are globally distinct (doc, word) pairs and this bucket owns
        # every row of each of its words, so per-word group size == global df
        df_per_word = block.groupby("w", sort=False)["w"].transform("size")
        g = block.assign(_df=df_per_word.astype("int64")).groupby(
            id_col, sort=False
        )["_df"]
        out = g.agg(["count", "sum", "min"]).reset_index()
        out.columns = [id_col, "n_words", "df_sum", "min_df"]
        return out

    pairs = ds.map_batches(explode, batch_format="pyarrow")
    bucketed = bucket_by_key(pairs, "w", num_buckets)
    partials = bucketed.groupby("_bucket").map_groups(
        bucket_partial, batch_format="pandas"
    )
    summed = partials.groupby(id_col).aggregate(
        Sum("n_words", alias_name="n_words"),
        Sum("df_sum", alias_name="df_sum"),
        Min("min_df", alias_name="min_df"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n_words"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch["df_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: pc.cast(batch[id_col], pa.int64()),
                "n_words": pa.array(n, type=pa.int64()),
                "df_sum": pa.array(s, type=pa.int64()),
                "mean_df_milli": pa.array((1000 * s) // n, type=pa.int64()),
                "min_df": pc.cast(batch["min_df"], pa.int64()),
            }
        )

    return summed.map_batches(finish, batch_format="pyarrow").sort(id_col)


def bpe_pair_counts(ds, text_col: str = "text", top_k: int = 50, num_buckets: int = 32):
    """One BPE-training merge step: the ``top_k`` most frequent ADJACENT
    codepoint pairs inside whitespace words (lowercased), ties broken by
    pair ascending — exactly the statistic a byte-pair-encoding tokenizer
    trainer computes per merge round. Rows: (pair, n).

    Scale shape: per batch, ONE utf-8 decode of the batch's concatenated
    words + ONE utf-32 re-encode give a flat codepoint array; adjacent
    pairs become int64 codes ``(c1 << 21) | c2`` (codepoints < 2^21) with
    word-boundary positions masked out, and ``np.unique`` yields the
    batch-partial counts — no Python loop touches a word. Pair codes
    hash-bucket like any vocabulary key (a bucket owns its pairs' global
    counts), each bucket emits its local top-k, and the global sort+limit
    sees only buckets × top_k rows. Code order == UTF-8 string order for
    equal-length 2-char strings, so integer tie-breaks match the SQL
    oracle's ``ORDER BY pair``."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from .aggregate import bucket_by_key
    from .contamination import _flat_words

    empty = pa.table(
        {"code": pa.array([], type=pa.int64()), "n": pa.array([], type=pa.int64())}
    )

    def pair_partials(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        flat, _ = _flat_words(text)
        if len(flat) == 0:
            return empty
        joined = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array([0, len(flat)], type=pa.int32()), flat
            ),
            "",
        )[0].as_py()
        cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        if len(cp) < 2:
            return empty
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        ends = np.cumsum(lens)
        codes = (cp[:-1].astype(np.int64) << 21) | cp[1:].astype(np.int64)
        mask = np.ones(len(cp) - 1, dtype=bool)
        mask[ends[:-1] - 1] = False  # last char of word k never pairs into k+1
        u, c = np.unique(codes[mask], return_counts=True)
        return pa.table(
            {"code": pa.array(u), "n": pa.array(c.astype(np.int64))}
        )

    def bucket_top(block: pd.DataFrame) -> pd.DataFrame:
        g = block.groupby("code", sort=False)["n"].sum().reset_index()
        g = g.sort_values(["n", "code"], ascending=[False, True]).head(top_k)
        return g[["code", "n"]]

    def decode(batch: pa.Table) -> pa.Table:
        codes = batch["code"].to_numpy(zero_copy_only=False)
        pairs = [chr(int(c) >> 21) + chr(int(c) & 0x1FFFFF) for c in codes]
        return pa.table(
            {"pair": pa.array(pairs, type=pa.string()), "n": batch["n"]}
        )

    partials = ds.map_batches(pair_partials, batch_format="pyarrow")
    bucketed = bucket_by_key(partials, "code", num_buckets)
    topped = bucketed.groupby("_bucket").map_groups(
        bucket_top, batch_format="pandas"
    )
    final = topped.sort(["n", "code"], descending=[True, False]).limit(top_k)
    return final.map_batches(decode, batch_format="pyarrow")


#: BM25 constants in integer milli: k1 = 1.2, b = 0.75. The idf is the same
#: integer proxy top_terms uses ((1000·N) // df) — a float ln() idf would be
#: hash-fragile across engines.
BM25_TERMS = ("hash", "join", "vector", "slow")
BM25_TOP_K = 20


def bm25_topk(
    ds,
    terms=BM25_TERMS,
    top_k: int = BM25_TOP_K,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """BM25-style retrieval over the corpus for a fixed query-term set:
    top-k docs by an integer-exact BM25 variant

        score(d) = Σ_t idf(t) · (tf·(k1+1)·1000) // (tf·1000 + k1·norm(d))
        idf(t)   = (1000·N) // df(t)
        norm(d)  = (1000 - b) + (b · ((10^6·dl) // avgdl_milli)) // 1000

    with every division a floor over positive ints, mirrored verbatim in
    the DuckDB oracle — no float enters either engine.

    Scale shape: pass 1 streams the corpus once to three bounded scalars
    (N docs, total tokens, df per query term — |terms| values, reduced via
    ``Dataset.sum`` over one partial row per batch). Pass 2 streams again:
    each batch scores its own docs fully in numpy (docs are rows, so a
    doc never spans batches) and emits only its local top-k; the global
    sort sees blocks×k rows. No shuffle touches the corpus."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from .contamination import _flat_words

    terms = tuple(terms)
    terms_arr = pa.array(list(terms), type=pa.string())
    n_terms = len(terms)

    def tf_matrix(batch: pa.Table):
        """(dl per row, tf matrix rows×terms) for one batch."""
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        flat, idx = _flat_words(text)
        n_rows = batch.num_rows
        dl = np.bincount(idx, minlength=n_rows).astype(np.int64)
        sel = pc.is_in(flat, value_set=terms_arr)
        keep = sel.to_numpy(zero_copy_only=False)
        codes = pc.index_in(flat.filter(sel), value_set=terms_arr).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        combo = idx[keep] * n_terms + codes
        tf = np.bincount(combo, minlength=n_rows * n_terms).astype(np.int64)
        return dl, tf.reshape(n_rows, n_terms)

    def stats_partial(batch: pa.Table) -> pa.Table:
        dl, tf = tf_matrix(batch)
        row = {
            "n_docs": pa.array([int((dl > 0).sum())], type=pa.int64()),
            "n_tokens": pa.array([int(dl.sum())], type=pa.int64()),
        }
        for j, t in enumerate(terms):
            row[f"df_{j}"] = pa.array([int((tf[:, j] > 0).sum())], type=pa.int64())
        return pa.table(row)

    stat_cols = ["n_docs", "n_tokens"] + [f"df_{j}" for j in range(n_terms)]
    sums = ds.map_batches(stats_partial, batch_format="pyarrow").sum(stat_cols)
    n_docs = int(sums["sum(n_docs)"])
    n_tokens = int(sums["sum(n_tokens)"])
    df = np.array([int(sums[f"sum(df_{j})"]) for j in range(n_terms)], dtype=np.int64)
    avgdl_milli = (1000 * n_tokens) // max(n_docs, 1)
    idf = (1000 * n_docs) // np.maximum(df, 1)

    def score_batch(batch: pa.Table) -> pa.Table:
        dl, tf = tf_matrix(batch)
        ratio_milli = (1_000_000 * dl) // avgdl_milli
        norm = 250 + (750 * ratio_milli) // 1000
        k1norm = (1200 * norm) // 1000  # per-row
        denom = tf * 1000 + k1norm[:, None]
        tfpart = (tf * 2_200_000) // denom  # tf==0 → 0 contribution
        score = (tfpart * idf[None, :]).sum(axis=1)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        hit = score > 0
        out = pd.DataFrame({id_col: ids[hit], "score": score[hit]})
        out = out.sort_values(["score", id_col], ascending=[False, True]).head(top_k)
        return pa.Table.from_pandas(out, preserve_index=False)

    scored = ds.map_batches(score_batch, batch_format="pyarrow")
    return scored.sort(["score", id_col], descending=[True, False]).limit(top_k)


#: Gopher-style stopword band: a natural-language doc carries SOME glue
#: words; too few → keyword spam / non-language, too many → boilerplate.
STOPWORD_SET = ("a", "the", "and", "of", "to", "in", "is")
STOPWORD_MIN_MILLI = 50
STOPWORD_MAX_MILLI = 400


def stopword_filter(
    ds,
    stopwords=STOPWORD_SET,
    lo_milli: int = STOPWORD_MIN_MILLI,
    hi_milli: int = STOPWORD_MAX_MILLI,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Stopword-ratio quality filter (the Gopher stopword criterion as an
    oracle-exact operator): keep docs whose integer-milli stopword fraction
    (1000·n_stop // n_tokens) lies in [lo, hi]. Rows: (doc_id, n_tokens,
    stop_milli) for surviving docs.

    The float ``stopword_ratio`` in ``quality_features`` (rows-only
    doc_analysis) is the exploratory twin; this is the hash-exact filter.
    Scale shape: one vectorized pass per batch (explode → is_in → bincount),
    no shuffle."""
    import numpy as np
    import pyarrow.compute as pc

    from .contamination import _flat_words

    stop_arr = pa.array(list(stopwords), type=pa.string())

    def per_batch(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        flat, idx = _flat_words(text)
        n_rows = batch.num_rows
        n_tok = np.bincount(idx, minlength=n_rows).astype(np.int64)
        hits = pc.is_in(flat, value_set=stop_arr).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(idx[hits], minlength=n_rows).astype(np.int64)
        stop_milli = np.where(n_tok > 0, (1000 * n_stop) // np.maximum(n_tok, 1), 0)
        keep = (n_tok > 0) & (stop_milli >= lo_milli) & (stop_milli <= hi_milli)
        return pa.table(
            {
                id_col: pc.cast(batch[id_col], pa.int64()).filter(pa.array(keep)),
                "n_tokens": pa.array(n_tok[keep], type=pa.int64()),
                "stop_milli": pa.array(stop_milli[keep], type=pa.int64()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow").sort(id_col)


#: merged BPE symbols get ids above the Unicode plane cap; (a << 21) | b
#: packing stays collision-free while ids < 2^21
BPE_NEW_ID_BASE = 0x110000


def _bpe_flat_codepoints(words: pa.Array):
    """(int64 codepoint values, per-word codepoint lengths) for a flat word
    array — ONE utf-8 decode + utf-32 re-encode per batch. The shared
    explode of bpe_train's vocab build and bpe_encode's corpus pass."""
    import numpy as np
    import pyarrow.compute as pc

    joined = pc.binary_join(
        pa.ListArray.from_arrays(
            pa.array([0, len(words)], type=pa.int32()), words
        ),
        "",
    )[0].as_py()
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    lens = pc.utf8_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    return cp.astype(np.int64), lens


def _bpe_run_parity_merge(vals, rid, a: int, b: int, new_id: int):
    """THE greedy non-overlapping left-to-right (a, b) → new_id replace —
    the single kernel both bpe_train (per merge round) and bpe_encode (per
    replayed rule) run, so training and encoding can never disagree. Within
    a run of consecutive matches (only possible when a == b) even positions
    win — exactly the sequential scan-and-skip rule. Returns the filtered
    (vals, rid) pair; unchanged inputs return as-is."""
    import numpy as np

    if len(vals) < 2:
        return vals, rid
    match = (vals[:-1] == a) & (vals[1:] == b) & (rid[:-1] == rid[1:])
    idx = np.flatnonzero(match)
    if not len(idx):
        return vals, rid
    run_start = np.ones(len(idx), dtype=bool)
    run_start[1:] = np.diff(idx) > 1
    run_id = np.cumsum(run_start) - 1
    pos = idx - idx[run_start][run_id]
    kept = idx[pos % 2 == 0]
    out = vals.copy()
    out[kept] = new_id
    drop = np.zeros(len(vals), dtype=bool)
    drop[kept + 1] = True
    return out[~drop], rid[~drop]


def bpe_train(
    ds,
    n_merges: int = 10,
    text_col: str = "text",
    num_buckets: int = 32,
    min_pair_count: int = 2,
):
    """Iterative BPE tokenizer TRAINING (Sennrich-style): learn ``n_merges``
    merge rules over the corpus, returning the merge table
    (rank, left, right, n) with symbols rendered as strings.

    Scale shape — the classic trick that makes distributed BPE feasible:
    the iteration never touches the corpus. ONE pass reduces it to the
    distinct (word, count) VOCABULARY (word-hash bucketed exact counts —
    vocab ≪ corpus at any scale); each merge round then runs two vectorized
    passes over the vocab only: (1) weighted adjacent-pair counts per batch
    (int64 ``(a << 21) | b`` codes, np.add.at over np.unique inverse) →
    pair-hash bucket combine → ONE candidate row per bucket → the driver
    picks the global best from ≤ num_buckets rows (max count, ties to the
    smaller pair — fully deterministic); (2) the winning pair applies
    everywhere with a greedy non-overlapping left-to-right replace (run-
    parity rule, exact for a == b chains) — pure numpy on the flat value
    buffer. The vocab materializes between rounds so round r+1's lineage
    does not replay round r.

    Stops early when no pair reaches ``min_pair_count``. Iterative state →
    no SQL oracle; pinned by an exact naive-reference pytest."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from .aggregate import bucket_by_key
    from .contamination import _flat_words

    # ---- phase 1: corpus → distinct (word, cnt) vocabulary ----------------
    def word_partials(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        flat, _ = _flat_words(text)
        if len(flat) == 0:
            return pa.table(
                {"w": pa.array([], type=pa.string()),
                 "cnt": pa.array([], type=pa.int64())}
            )
        u, c = np.unique(flat.to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table(
            {"w": pa.array(u, type=pa.string()),
             "cnt": pa.array(c.astype(np.int64))}
        )

    def vocab_final(block: pd.DataFrame) -> pd.DataFrame:
        g = block.groupby("w", sort=False)["cnt"].sum().reset_index()
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    vocab_words = (
        bucket_by_key(
            ds.map_batches(word_partials, batch_format="pyarrow"), "w",
            num_buckets,
        )
        .groupby("_bucket")
        .map_groups(vocab_final, batch_format="pandas")
    )

    # distinct words → codepoint sequences (one utf-32 re-encode per batch)
    def to_seqs(batch: pa.Table) -> pa.Table:
        w = batch["w"]
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        w = w.cast(pa.string())
        if batch.num_rows == 0 or len(w) == 0:
            return pa.table(
                {"seq": pa.array([], type=pa.list_(pa.int64())),
                 "cnt": pa.array([], type=pa.int64())}
            )
        vals, lens = _bpe_flat_codepoints(w)
        offsets = np.zeros(len(w) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        seq = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), pa.array(vals)
        )
        return pa.table({"seq": seq, "cnt": batch["cnt"]})

    cur = vocab_words.map_batches(to_seqs, batch_format="pyarrow").materialize()

    # ---- phase 2: merge rounds over the vocab only -------------------------
    def _flat(batch: pa.Table):
        lists = batch["seq"]
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        lens = lists.value_lengths().to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens.astype("float64")).astype(np.int64)
        vals = lists.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        rid = np.repeat(np.arange(len(lists), dtype=np.int64), lens)
        return vals, rid, lens

    def pair_partials(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"code": pa.array([], type=pa.int64()),
             "n": pa.array([], type=pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        vals, rid, _ = _flat(batch)
        if len(vals) < 2:
            return empty
        cnt = batch["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        same = rid[:-1] == rid[1:]
        codes = (vals[:-1] << 21) | vals[1:]
        codes = codes[same]
        w = cnt[rid[:-1][same]]
        if not len(codes):
            return empty
        u, inv = np.unique(codes, return_inverse=True)
        acc = np.zeros(len(u), dtype=np.int64)
        np.add.at(acc, inv, w)
        return pa.table({"code": pa.array(u), "n": pa.array(acc)})

    def bucket_best(block: pd.DataFrame) -> pd.DataFrame:
        g = block.groupby("code", sort=False)["n"].sum().reset_index()
        g = g.sort_values(["n", "code"], ascending=[False, True]).head(1)
        g["n"] = g["n"].astype(np.int64)
        return g[["code", "n"]]

    def make_apply(a: int, b: int, new_id: int):
        def apply_merge(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            vals, rid, lens = _flat(batch)
            new_vals, new_rid = _bpe_run_parity_merge(vals, rid, a, b, new_id)
            if len(new_vals) == len(vals):
                return batch
            new_lens = np.bincount(new_rid, minlength=len(lens)).astype(
                np.int64
            )
            offsets = np.zeros(len(lens) + 1, dtype=np.int64)
            np.cumsum(new_lens, out=offsets[1:])
            seq = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()), pa.array(new_vals)
            )
            return pa.table({"seq": seq, "cnt": batch["cnt"]})

        return apply_merge

    symbols: dict = {}

    def render(sym: int) -> str:
        if sym < BPE_NEW_ID_BASE:
            return chr(sym)
        return symbols[sym]

    merges = []
    for r in range(n_merges):
        partials = cur.map_batches(pair_partials, batch_format="pyarrow")
        cands = (
            bucket_by_key(partials, "code", num_buckets)
            .groupby("_bucket")
            .map_groups(bucket_best, batch_format="pandas")
            .to_pandas()  # ≤ num_buckets rows by construction
        )
        if not len(cands):
            break
        cands = cands.sort_values(["n", "code"], ascending=[False, True])
        best_code = int(cands.iloc[0]["code"])
        best_n = int(cands.iloc[0]["n"])
        if best_n < min_pair_count:
            break
        a, b = best_code >> 21, best_code & 0x1FFFFF
        new_id = BPE_NEW_ID_BASE + r
        symbols[new_id] = render(a) + render(b)
        merges.append((r, render(a), render(b), best_n))
        cur = cur.map_batches(
            make_apply(a, b, new_id), batch_format="pyarrow"
        ).materialize()

    return pa.table(
        {
            "rank": pa.array([m[0] for m in merges], type=pa.int64()),
            "left": pa.array([m[1] for m in merges], type=pa.string()),
            "right": pa.array([m[2] for m in merges], type=pa.string()),
            "n": pa.array([m[3] for m in merges], type=pa.int64()),
        }
    )


def bpe_encode(
    ds,
    merges,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Apply learned BPE merges (the table :func:`bpe_train` returns, or an
    equivalent (left, right) rank-ordered list) to the corpus: per document,
    the BPE token count and the byte-ish compression ratio in integer milli
    (1000 · tokens // chars; 0 for empty docs) — the
    train-tokenizer-then-measure step of a data pipeline.

    Scale shape: the merge table is tiny (ranks) and ships inside the
    closure; each batch explodes to the flat codepoint array ONCE and
    replays the merges in rank order with the same vectorized run-parity
    kernel ``bpe_train`` uses — cost = n_merges numpy passes per batch, no
    shuffle anywhere (per-doc outputs)."""
    import numpy as np
    import pyarrow.compute as pc

    from .contamination import _flat_words

    if isinstance(merges, pa.Table):
        pairs = list(zip(merges["left"].to_pylist(), merges["right"].to_pylist()))
    else:
        pairs = [(l, r) for l, r in merges]
    # rebuild the symbol ids exactly as bpe_train assigned them: rank r's
    # output symbol is BPE_NEW_ID_BASE + r; its inputs render from earlier
    # rows, so map strings back to ids by first-seen rank
    sym_of: dict = {}
    rules = []
    for r, (left, right) in enumerate(pairs):
        a = sym_of.get(left, ord(left) if len(left) == 1 else None)
        b = sym_of.get(right, ord(right) if len(right) == 1 else None)
        if a is None or b is None:
            raise ValueError(
                "bpe_encode: merge %d (%r,%r) references a symbol no earlier "
                "rule produced" % (r, left, right)
            )
        new_id = BPE_NEW_ID_BASE + r
        if left + right in sym_of:
            # two merge paths rendering the same surface string would make
            # the string→id replay ambiguous — refuse loudly
            raise ValueError(
                "bpe_encode: duplicate surface form %r at rank %d"
                % (left + right, r)
            )
        sym_of[left + right] = new_id
        rules.append((a, b, new_id))

    def encode(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        ids = batch[id_col]
        n_rows = batch.num_rows
        flat, widx = _flat_words(text)
        if len(flat):
            vals, lens = _bpe_flat_codepoints(flat)
            # merges never cross word boundaries: the row id here is the
            # WORD index (unique per word), not the doc index
            wid = np.repeat(np.arange(len(flat), dtype=np.int64), lens)
            for a, b, new_id in rules:
                vals, wid = _bpe_run_parity_merge(vals, wid, a, b, new_id)
            # tokens per word → tokens per doc
            per_word = np.bincount(wid, minlength=len(flat)).astype(np.int64)
            n_tokens = np.bincount(
                widx, weights=per_word, minlength=n_rows
            ).astype(np.int64)
        else:
            n_tokens = np.zeros(n_rows, dtype=np.int64)
        n_chars = pc.utf8_length(
            pc.fill_null(text.cast(pa.string()), "")
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        ratio = np.where(n_chars > 0, (1000 * n_tokens) // np.maximum(n_chars, 1), 0)
        return pa.table(
            {
                id_col: ids,
                "n_bpe_tokens": pa.array(n_tokens),
                "ratio_milli": pa.array(ratio.astype(np.int64)),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")


def paragraph_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
    max_paras_per_doc: int = 1 << 20,
):
    """C4/Dolma-style GLOBAL exact paragraph deduplication with document
    reassembly: across the whole corpus, every distinct non-empty
    ``'\\n'``-paragraph survives only at its FIRST occurrence (global order
    = (doc_id, within-doc paragraph index)); later occurrences — including
    repeats inside the same document — are removed, empty paragraphs are
    dropped, and each document is re-joined from its kept paragraphs in
    original order. Docs with zero kept paragraphs disappear (C4 drops
    emptied pages). Rows: (doc_id, clean_text).

    Scale shape: explode to (doc_id, idx, para) → paragraphs co-locate by
    hash bucket, so the global first-occurrence winner of each paragraph is
    decidable INSIDE its bucket (one vectorized idxmin per bucket — no
    separate winners table, no join) → kept rows re-bucket by doc and one
    ordered join per doc-bucket rebuilds the text. Shuffle volume = the
    exploded paragraph rows (by para hash, then kept rows by doc) — the
    same exchange class as the inverted index, with no driver
    materialization anywhere."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from .aggregate import bucket_by_key

    def explode(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        if pa.types.is_null(text.type):
            text = text.cast(pa.string())
        valid = pc.is_valid(text)
        text = text.filter(valid)
        ids = pc.cast(batch[id_col], pa.int64()).filter(valid)
        paras = pc.split_pattern(text, "\n")
        lengths = paras.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        if lengths.size and lengths.max() > max_paras_per_doc:
            # the global-order rank packs (doc_id, idx) into one int64 —
            # fail loudly rather than let a pathological doc alias ranks
            raise ValueError(
                "paragraph_dedup: a document has %d paragraphs (max %d)"
                % (int(lengths.max()), max_paras_per_doc)
            )
        if lengths.size == 0:  # batch had no non-null text rows
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "idx": pa.array([], type=pa.int64()),
                    "para": pa.array([], type=pa.string()),
                }
            )
        row = np.repeat(np.arange(len(paras), dtype=np.int64), lengths)
        starts = np.repeat(np.concatenate([[0], np.cumsum(lengths)[:-1]]), lengths)
        idx = np.arange(len(row), dtype=np.int64) - starts + 1  # 1-based
        flat = paras.flatten()
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        doc = pc.take(ids, pa.array(row[keep]))
        return pa.table(
            {
                id_col: doc,
                "idx": pa.array(idx[keep], type=pa.int64()),
                "para": flat.filter(pa.array(keep)),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    by_para = bucket_by_key(exploded, "para", num_buckets)

    def keep_winners(block: pd.DataFrame) -> pd.DataFrame:
        # every row of a paragraph is in this bucket → the within-bucket
        # min rank IS the global first occurrence
        rank = block[id_col].to_numpy() * max_paras_per_doc + block["idx"].to_numpy()
        win = block.assign(_r=rank).groupby("para", sort=False)["_r"].transform("min")
        kept = block[rank == win.to_numpy()]
        return kept[[id_col, "idx", "para"]]

    kept = by_para.groupby("_bucket").map_groups(keep_winners, batch_format="pandas")
    by_doc = bucket_by_key(kept, id_col, num_buckets)

    def reassemble(block: pd.DataFrame) -> pd.DataFrame:
        d = block.sort_values([id_col, "idx"])
        g = d.groupby(id_col, sort=False)["para"].agg("\n".join).reset_index()
        g.columns = [id_col, "clean_text"]
        return g

    return (
        by_doc.groupby("_bucket")
        .map_groups(reassemble, batch_format="pandas")
        .sort(id_col)
    )


_URL_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<host>[^/?#:]+)"
    r"(?P<port>:[0-9]+)?(?P<path>/[^?#]*)?(?:\?(?P<query>[^#]*))?(?:#.*)?$"
)

#: scheme → default port suffix that normalization strips
_URL_DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def normalize_urls(urls: pa.Array) -> pa.Array:
    """Canonical URL normalization (the CCNet/C4-style pre-dedup step):
    lowercase scheme and host, strip the scheme's default port (http :80,
    https :443 — a non-default port survives), default an empty path to
    '/', byte-sort the query parameters ('k=v' tokens, '&'-joined, '?' kept
    only when params exist) and drop the fragment. Rows that don't parse as
    absolute URLs normalize to null (callers tag/route them).

    One RE2 ``pc.extract_regex`` per batch + Arrow lower/concat kernels;
    the query-param sort explodes tokens once and re-joins with a grouped
    pandas agg (the ordered string_agg idiom) — no per-row parsing."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    parts = pc.extract_regex(urls, _URL_RE)
    ok = pc.is_valid(parts)
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    host = pc.utf8_lower(pc.struct_field(parts, "host"))
    port = pc.fill_null(pc.struct_field(parts, "port"), "")
    # an unmatched optional RE2 group surfaces as '' (not null) — both mean
    # "no path", which normalizes to '/'
    path = pc.fill_null(pc.struct_field(parts, "path"), "")
    path = pc.if_else(pc.equal(path, ""), pa.scalar("/", pa.string()), path)
    query = pc.fill_null(pc.struct_field(parts, "query"), "")

    # strip default ports per scheme (vectorized equality per entry)
    for sch, dflt in _URL_DEFAULT_PORTS.items():
        is_dflt = pc.and_(pc.equal(scheme, sch), pc.equal(port, dflt))
        port = pc.if_else(is_dflt, pa.scalar("", pa.string()), port)

    # byte-sort query params: explode once, lexsort (row, token), grouped join
    toks = pc.split_pattern(query, "&")
    lengths = toks.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
    row = np.repeat(np.arange(len(toks), dtype=np.int64), lengths)
    flat = toks.flatten().to_numpy(zero_copy_only=False)
    if len(flat):
        order = np.lexsort((flat.astype("U"), row))
        joined = (
            pd.DataFrame({"r": row[order], "t": flat[order]})
            .groupby("r", sort=False)["t"]
            .agg("&".join)
        )
        qsorted = np.full(len(urls), "", dtype=object)
        qsorted[joined.index.to_numpy()] = joined.to_numpy()
    else:
        qsorted = np.full(len(urls), "", dtype=object)
    qcol = pa.array(qsorted, type=pa.string())
    qmark = pc.if_else(
        pc.equal(qcol, ""), pa.scalar("", pa.string()), pa.scalar("?", pa.string())
    )
    norm = pc.binary_join_element_wise(
        scheme, "://", host, port, path, qmark, qcol, ""
    )
    return pc.if_else(ok, norm, pa.scalar(None, pa.string()))


def url_dedup_spectrum(ds, url_col: str = "url", num_buckets: int = 64):
    """Exact URL dedup profile over normalized URLs: how many normalized
    URLs occur exactly k times — rows (dups, n_urls). Unparseable URLs
    count under dups = -1 (the reject bin, so nothing silently vanishes).

    Shape: per-batch normalize + local (url → count) partial, bucket by
    url hash, per-bucket exact count, then a tiny spectrum groupby —
    shuffle volume = distinct normalized URLs, spectrum is log-sized."""
    import pandas as pd
    import pyarrow.compute as pc

    from .aggregate import bucket_by_key, grouped_counts

    def partial(batch: pa.Table) -> pa.Table:
        norm = normalize_urls(batch[url_col])
        t = pa.table({"u": pc.fill_null(norm, "\x00invalid")})
        g = t.group_by(["u"]).aggregate([([], "count_all")])
        return g.rename_columns(["u", "c"])

    parts = ds.map_batches(partial, batch_format="pyarrow")
    bucketed = bucket_by_key(parts, "u", num_buckets)

    def per_bucket(block: pd.DataFrame) -> pd.DataFrame:
        g = block.groupby("u", sort=False)["c"].sum().reset_index()
        g["dups"] = g["c"].astype("int64")
        g.loc[g["u"] == "\x00invalid", "dups"] = -1
        # invalid rows collapse to ONE spectrum bin of size=their count
        out = g.groupby("dups", sort=False)["u"].size().reset_index()
        out.columns = ["dups", "n_urls"]
        inv = g["u"] == "\x00invalid"
        if inv.any():
            out.loc[out["dups"] == -1, "n_urls"] = int(g.loc[inv, "c"].iloc[0])
        out["n_urls"] = out["n_urls"].astype("int64")
        return out

    spectra = bucketed.groupby("_bucket").map_groups(
        per_bucket, batch_format="pandas"
    )
    from ray.data.aggregate import Sum

    return (
        spectra.groupby("dups")
        .aggregate(Sum("n_urls", alias_name="n_urls"))
        .sort("dups")
    )


#: DSIR-style integer importance weights (milli log-ratio of a "target"
#: vs "source" unigram model — precomputed offline in a real pipeline and
#: broadcast; integer milli units keep the score exact for the oracle).
DSIR_WEIGHTS_MILLI: Dict[str, int] = {
    "query": 1200, "table": 900, "join": 800, "sort": 700, "window": 650,
    "vector": 600, "hash": 500, "stream": 400, "filter": 300, "merge": 250,
    "slow": -400, "dup": -600, "small": -200, "a": -150, "the": -100,
    "batch": 150,
}


def dsir_select(
    ds,
    weights: Optional[Dict[str, int]] = None,
    n_per_lang: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    num_buckets: int = 16,
):
    """DSIR-shaped data selection (Xie et al. 2023, Data Selection via
    Importance Resampling, arXiv:2302.03169 — here the deterministic
    top-k variant): each document scores the INTEGER sum of broadcast
    per-word milli log-ratio weights over its lowercased whitespace words
    (repeats count; unknown words weigh 0; wordless/null docs score 0),
    and the ``n_per_lang`` highest-scoring docs per language are kept
    (score desc, doc_id asc tie-break). Rows: (lang, doc_id, score).

    Scale shape: the weight table rides the closure once per worker; the
    per-doc score is one ``pc.index_in`` + np.add.at per batch (documents
    are single rows, so batch-local scores are globally complete); only
    (lang, doc_id, score) partial top-k rows ever shuffle — batches×langs×k,
    never the corpus."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from .aggregate import bucket_by_key
    from .contamination import _flat_words

    wmap = dict(DSIR_WEIGHTS_MILLI if weights is None else weights)
    wkeys = pa.array(list(wmap.keys()), type=pa.string())
    wvals = np.array(list(wmap.values()), dtype=np.int64)

    def score(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        flat, idx = _flat_words(text)
        pos = pc.index_in(flat, value_set=wkeys).to_numpy(zero_copy_only=False)
        hit = ~np.isnan(pos.astype("float64"))
        scores = np.zeros(n, dtype=np.int64)
        if hit.any():
            np.add.at(scores, idx[hit], wvals[pos[hit].astype(np.int64)])
        t = pa.table(
            {
                lang_col: batch[lang_col],
                id_col: pc.cast(batch[id_col], pa.int64()),
                "score": pa.array(scores, type=pa.int64()),
            }
        )
        # partial top-k per lang: only batches×langs×k rows survive the map
        df = t.to_pandas()
        # dropna=False: a null-lang stratum must rank and select like any
        # other (the SQL oracle's PARTITION BY keeps a NULL partition)
        top = (
            df.sort_values([lang_col, "score", id_col],
                           ascending=[True, False, True])
            .groupby(lang_col, sort=False, dropna=False)
            .head(n_per_lang)
        )
        return pa.Table.from_pandas(top, preserve_index=False)

    def final_bucket(block: pd.DataFrame) -> pd.DataFrame:
        g = (
            block.sort_values([lang_col, "score", id_col],
                              ascending=[True, False, True])
            .groupby(lang_col, sort=False, dropna=False)
            .head(n_per_lang)
        )
        return g[[lang_col, id_col, "score"]]

    partials = ds.map_batches(score, batch_format="pyarrow")
    bucketed = bucket_by_key(partials, lang_col, num_buckets)
    return (
        bucketed.groupby("_bucket")
        .map_groups(final_bucket, batch_format="pandas")
        .sort([lang_col, id_col])
    )


def ngram_novelty_scores(
    docs_ds,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 32,
):
    """Per-document n-gram novelty: of the doc's DISTINCT lowercased word
    ``n``-grams, how many appear in NO other document (corpus document
    frequency 1) — rows (doc_id, n_grams, n_unique, novelty_milli) with
    ``novelty_milli = 1000·n_unique // n_grams``. The uniqueness-scoring
    signal curation pipelines rank on (high novelty = fresh content, low =
    boilerplate). Docs with fewer than ``n`` words are excluded.

    Scale shape: vectorized per-batch gram explode (shared
    ``_ngrams_from_flat`` core) with batch-local distinct (one doc = one
    row, so it is globally distinct); gram document frequencies via the
    partial-sum groupby; ONE partitioned hash_join grams ⋈ df (both sides
    large, no broadcast); per-doc totals re-bucket by doc id. Only (doc,
    gram) pairs and gram counts cross the exchanges."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from .contamination import _doc_ngrams
    from ..stages.aggregate import bucket_by_key, grouped_counts
    from ..stages.joins import hash_join

    def explode(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        grams, idx = _doc_ngrams(text, n)
        ids = pc.take(pc.cast(batch[id_col], pa.int64()), pa.array(idx))
        df = pd.DataFrame(
            {"doc": ids.to_numpy(zero_copy_only=False),
             "g": grams.to_numpy(zero_copy_only=False)}
        ).drop_duplicates()
        return pa.table(
            {"doc": pa.array(df["doc"].to_numpy(), type=pa.int64()),
             "g": pa.array(df["g"], type=pa.string())}
        )

    sets = docs_ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow"
    ).materialize()  # reused by the df count AND the join probe side

    df_counts = grouped_counts(sets.select_columns(["g"]), ["g"], count_alias="c")
    joined = hash_join(sets, df_counts, "g", "g", num_buckets=num_buckets)

    def partial(batch: pa.Table) -> pa.Table:
        uniq = pc.cast(pc.equal(batch["c"], 1), pa.int64())
        work = pa.table(
            {
                "doc": batch["doc"],
                "n_grams": pa.array(
                    np.ones(batch.num_rows, dtype=np.int64)
                ),
                "n_unique": uniq,
            }
        )
        g = work.group_by(["doc"]).aggregate(
            [("n_grams", "sum"), ("n_unique", "sum")]
        )
        return g.rename_columns(["doc", "n_grams", "n_unique"])

    partials = joined.map_batches(partial, batch_format="pyarrow")
    bucketed = bucket_by_key(partials, "doc", num_buckets)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc", as_index=False, sort=False).agg(
            n_grams=("n_grams", "sum"), n_unique=("n_unique", "sum")
        )
        g["novelty_milli"] = (1000 * g["n_unique"]) // g["n_grams"]
        g = g.rename(columns={"doc": "doc_id"})
        return g[["doc_id", "n_grams", "n_unique", "novelty_milli"]].astype(
            "int64"
        )

    return (
        bucketed.groupby("_bucket")
        .map_groups(final, batch_format="pandas")
        .sort("doc_id")
    )
