"""Logstash filter-family operators beyond geoip: kv, dissect, date
(multi-format), throttle and translate — the sibling filters that surround
logstash-filter-geoip in every real log pipeline (the reference's README and
docs/index.asciidoc position geoip inside exactly this filter chain).

Each is a stateless vectorized ``map_batches`` stage over zero-copy Arrow
batches — no Python row loops:

- :func:`make_kv_pairs` — generic key=value discovery (logstash-filter-kv):
  whitespace split → flatten with parent indices → '='-token filter → one
  more bounded split. Long-form (parent row keys, kv_key, kv_value) output.
- :func:`make_dissect` — delimiter-template parse (logstash-filter-dissect):
  successive first-occurrence literal splits, numpy offset gathers (no
  regex), strict per-row success mask.
- :func:`parse_datetime_multi` — logstash-filter-date: ordered format
  fallbacks, first parse wins, via ``pc.strptime(error_is_null=True)`` +
  coalesce.
- :func:`throttle` — logstash-filter-throttle: at most ``limit`` events per
  (key, period) pass, deterministic (ts, tiebreak) arrival order, marked not
  dropped (the filter tags; dropping is the pipeline's choice).
- :func:`make_translate` — logstash-filter-translate: broadcast static
  dictionary map with a default, via ``pc.index_in`` + take (the dictionary
  rides the closure once per worker, never per batch).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _combined(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


# -- kv ----------------------------------------------------------------------


def make_kv_pairs(
    text_col: str = "text",
    carry_cols: Sequence[str] = (),
    sep: str = " ",
    value_split: str = "=",
):
    """Generic KV filter: emit one output row per discovered
    ``key<value_split>value`` token. Unlike the grok stage (which binds a
    declared schema), this discovers arbitrary keys — logstash-filter-kv's
    contract. Split/flatten/filter are all Arrow kernels; the parent-index
    array keeps carried row columns aligned without any join."""

    def kv_pairs(batch: pa.Table) -> pa.Table:
        text = _combined(batch[text_col])
        toks = pc.split_pattern(text, sep)
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        has_sep = pc.match_substring(flat, value_split)
        flat = flat.filter(has_sep)
        parents = parents.filter(has_sep)
        kv = pc.split_pattern(flat, value_split, max_splits=1)
        cols = {c: _combined(batch[c]).take(parents) for c in carry_cols}
        cols["kv_key"] = pc.list_element(kv, 0)
        cols["kv_value"] = pc.list_element(kv, 1)
        return pa.table(cols)

    return kv_pairs


# -- dissect -----------------------------------------------------------------

_FIELD_RE = re.compile(r"%\{(\w+)\}")


def parse_dissect_template(template: str) -> Tuple[List[str], List[str]]:
    """Split ``"lit0%{f1}lit1%{f2}lit2"`` into literals (len = fields+1,
    possibly empty at the edges) and field names."""
    parts = _FIELD_RE.split(template)  # [lit0, f1, lit1, f2, ..., litN]
    literals, fields = parts[::2], parts[1::2]
    if len(literals) != len(fields) + 1:
        raise ValueError(f"malformed dissect template: {template!r}")
    if not fields:
        raise ValueError("dissect template needs at least one %{field}")
    for i, lit in enumerate(literals[1:-1], 1):
        if lit == "":
            raise ValueError(
                "dissect requires a non-empty literal between fields "
                f"(template {template!r}, gap before field {fields[i]!r})"
            )
    return literals, fields


def _split_first(current: pa.Array, lit: str):
    """First-occurrence split on a literal: returns (value, remainder, ok)
    — all length-n, unmatched rows null/False. Offset gathers in numpy,
    no per-row Python."""
    n = len(current)
    parts = pc.split_pattern(current, lit, max_splits=1)
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    offs = parts.offsets.to_numpy()
    lens = np.diff(offs)
    ok_np = lens == 2
    # null slots: split_pattern yields null lists; offsets repeat there
    first_idx = offs[:-1]
    vals = parts.values
    safe_first = np.where(ok_np, first_idx, 0)
    value = vals.take(pa.array(safe_first, type=pa.int64()))
    rem = vals.take(pa.array(np.where(ok_np, first_idx + 1, 0), type=pa.int64()))
    ok = pa.array(ok_np)
    nulls = pa.nulls(n, pa.string())
    return (
        pc.if_else(ok, value, nulls),
        pc.if_else(ok, rem, nulls),
        ok,
    )


def make_dissect(
    template: str,
    text_col: str = "text",
    ok_col: str = "dissect_ok",
    drop_text: bool = False,
):
    """Dissect-style positional parse: each inter-field literal is matched at
    its FIRST occurrence (dissect semantics — no regex, no backtracking).
    Rows failing any literal get null for every field and ``ok_col=False``
    (the filter-tag analogue of logstash's ``_dissectfailure``)."""
    literals, fields = parse_dissect_template(template)

    def dissect(batch: pa.Table) -> pa.Table:
        text = _combined(batch[text_col])
        n = len(text)
        ok = pa.array(np.ones(n, dtype=bool))
        current = text
        prefix = literals[0]
        if prefix:
            good = pc.starts_with(current, prefix)
            ok = pc.and_kleene(ok, pc.fill_null(good, False))
            # strip the fixed-length prefix (only meaningful where ok)
            current = pc.utf8_slice_codeunits(current, len(prefix))
        values: Dict[str, pa.Array] = {}
        for i, field in enumerate(fields):
            nxt = literals[i + 1]
            if i < len(fields) - 1:
                val, current, step_ok = _split_first(current, nxt)
                ok = pc.and_kleene(ok, step_ok)
                values[field] = val
            else:
                # last field: optional trailing literal is a suffix strip
                if nxt:
                    good = pc.ends_with(current, nxt)
                    ok = pc.and_kleene(ok, pc.fill_null(good, False))
                    current = pc.utf8_slice_codeunits(current, 0, -len(nxt))
                values[field] = current
        ok = pc.fill_null(ok, False)
        nulls = pa.nulls(n, pa.string())
        out = batch.drop_columns([text_col]) if drop_text else batch
        for field in fields:
            col = pc.if_else(ok, values[field], nulls)
            if field in out.column_names:
                out = out.drop_columns([field])
            out = out.append_column(field, col)
        if ok_col in out.column_names:
            out = out.drop_columns([ok_col])
        return out.append_column(ok_col, ok)

    return dissect


# -- date (multi-format) -------------------------------------------------------


def parse_datetime_multi(
    arr,
    formats: Sequence[str],
    unit: str = "us",
) -> pa.Array:
    """logstash-filter-date: try each strptime format in order, first
    successful parse wins, unparseable rows stay null. One vectorized
    ``pc.strptime`` pass per format + a coalesce — not per-row fallbacks."""
    arr = _combined(arr)
    parsed = [
        pc.strptime(arr, format=f, unit=unit, error_is_null=True)
        for f in formats
    ]
    out = parsed[0]
    for p in parsed[1:]:
        out = pc.coalesce(out, p)
    return out


def make_date_parse(
    formats: Sequence[str],
    source_col: str = "raw_ts",
    target_col: str = "parsed_ts",
    unit: str = "us",
):
    """Batch-fn wrapper for :func:`parse_datetime_multi`."""

    def date_parse(batch: pa.Table) -> pa.Table:
        col = parse_datetime_multi(batch[source_col], formats, unit=unit)
        if target_col in batch.column_names:
            batch = batch.drop_columns([target_col])
        return batch.append_column(target_col, col)

    return date_parse


# -- throttle ------------------------------------------------------------------


def throttle(
    ds,
    key_col: str,
    ts_col: str,
    limit: int,
    period: str = "day",
    tiebreak_col: Optional[str] = None,
    num_buckets: int = 64,
):
    """logstash-filter-throttle semantics, batch form: within each
    (key, period-window) at most ``limit`` events are ``allowed``; the rest
    are marked throttled (``allowed=False``) in deterministic
    (ts, tiebreak) arrival order. Events are MARKED, not dropped — parity
    with the filter, which tags and leaves the drop to the pipeline.

    Scale shape: projects to (key, window, ts, tiebreak) at the first map,
    co-locates keys by stable hash bucket, and ranks each bucket with one
    vectorized sort + groupby-cumcount — the log itself never sorts
    globally. Output: input columns + ``_window`` (int64 period index) +
    ``allowed`` (bool)."""
    import pandas as pd

    from .aggregate import bucket_by_key

    if period == "day":
        div = 86_400_000_000
    elif period == "hour":
        div = 3_600_000_000
    elif period == "minute":
        div = 60_000_000
    else:
        raise ValueError("period must be day|hour|minute")

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.timestamp("us"))
        ts64 = pc.cast(ts, pa.int64())
        win = pc.divide(ts64, div)  # epoch µs are non-negative here
        for helper in ("_window", "_ts_us"):
            if helper in batch.column_names:
                batch = batch.drop_columns([helper])
        return batch.append_column("_window", win).append_column("_ts_us", ts64)

    prepped = bucket_by_key(
        ds.map_batches(prep, batch_format="pyarrow"), key_col, num_buckets
    )

    order = [key_col, "_window", "_ts_us"]
    if tiebreak_col:
        order.append(tiebreak_col)

    def per_bucket(block: pd.DataFrame) -> pd.DataFrame:
        b = block.sort_values(order, kind="mergesort")
        rank = b.groupby([key_col, "_window"], sort=False, dropna=False).cumcount()
        b = b.copy()
        b["allowed"] = (rank < limit).to_numpy()
        return b.drop(columns=["_bucket", "_ts_us"])

    return prepped.groupby("_bucket").map_groups(
        per_bucket, batch_format="pandas"
    )


# -- csv / json line parsing ----------------------------------------------------


def _rows_to_buffer(col: pa.Array) -> pa.Buffer:
    """Concatenate a string column into one newline-joined Arrow buffer:
    zero-copy ListArray wrap + one ``pc.binary_join`` + ``as_buffer`` — no
    Python string round trip. Caller guarantees no nulls."""
    wrapper = pa.ListArray.from_arrays(
        pa.array([0, len(col)], type=pa.int32()), col
    )
    joined = pc.cast(pc.binary_join(wrapper, "\n"), pa.binary())
    return joined[0].as_buffer()


def _merge_parsed(
    batch: pa.Table,
    parsed: pa.Table,
    valid_idx,
    n: int,
    line_col: str,
    drop_line: bool,
    kind: str,
) -> pa.Table:
    """Shared csv/json merge: validate alignment against the VALID rows,
    scatter parsed values back to full batch length (null where the line
    was null), then append beside the carried columns."""
    n_valid = len(valid_idx)
    if parsed.num_rows != n_valid:
        raise ValueError(
            f"{kind} parse misalignment: {n_valid} lines -> "
            f"{parsed.num_rows} records"
        )
    if n_valid < n:
        # scatter: position i holds the parsed-row index for input row i,
        # null where the input line was null → take() yields typed nulls
        import numpy as np

        pos = np.zeros(n, dtype=np.int64)
        pos[valid_idx] = np.arange(n_valid)
        mask = np.ones(n, dtype=bool)
        mask[valid_idx] = False
        scatter = pa.array(pos, type=pa.int64(), mask=mask)
        parsed = parsed.take(scatter)
    out = batch.drop_columns([line_col]) if drop_line else batch
    for name in parsed.column_names:
        if name in out.column_names:
            out = out.drop_columns([name])
        out = out.append_column(name, parsed[name])
    return out


def _valid_lines(batch: pa.Table, line_col: str):
    """(combined line array without nulls, indices of the valid rows)."""
    import numpy as np

    col = _combined(batch[line_col])
    if col.null_count == 0:
        return col, np.arange(len(col), dtype=np.int64)
    valid = pc.is_valid(col)
    idx = np.flatnonzero(valid.to_numpy(zero_copy_only=False))
    return col.filter(valid), idx


def _empty_typed(n: int, schema_types: Dict[str, pa.DataType]) -> pa.Table:
    return pa.table(
        {name: pa.nulls(n, t) for name, t in schema_types.items()}
    )


def make_csv_parse(
    column_names: Sequence[str],
    column_types: Optional[Dict[str, pa.DataType]] = None,
    line_col: str = "line",
    drop_line: bool = True,
):
    """logstash-filter-csv: parse a column of CSV lines into typed columns
    using Arrow's C++ CSV reader — RFC-4180 quoting/escaping (including
    quoted embedded newlines: ``newlines_in_values``) for free, one parser
    invocation per BATCH (the whole batch becomes a single in-memory CSV
    block), never a per-row Python split. Null lines yield null parsed
    columns (filter semantics); a record-count mismatch (malformed
    multi-record line) raises rather than silently misaligning. On a batch
    with no parseable rows, declared ``column_types`` pin the output
    schema and undeclared columns default to string (declare types for
    schema stability across empty blocks)."""
    import pyarrow.csv as pacsv

    column_names = list(column_names)
    column_types = dict(column_types or {})
    read_opts = pacsv.ReadOptions(column_names=column_names)
    parse_opts = pacsv.ParseOptions(newlines_in_values=True)
    convert_opts = pacsv.ConvertOptions(column_types=column_types)
    empty_types = {
        name: column_types.get(name, pa.string()) for name in column_names
    }

    def csv_parse(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        lines, valid_idx = _valid_lines(batch, line_col)
        if len(lines) == 0:
            parsed = _empty_typed(0, empty_types)
        else:
            parsed = pacsv.read_csv(
                pa.BufferReader(_rows_to_buffer(lines)),
                read_options=read_opts,
                parse_options=parse_opts,
                convert_options=convert_opts,
            )
        return _merge_parsed(
            batch, parsed, valid_idx, n, line_col, drop_line, "csv"
        )

    return csv_parse


def make_json_parse(
    line_col: str = "line",
    explicit_schema: Optional[pa.Schema] = None,
    drop_line: bool = True,
):
    """logstash-filter-json: parse a column of JSON object strings into
    typed columns via Arrow's C++ NDJSON reader — the batch joins into one
    newline-delimited block, parsed in a single C++ call (no per-row
    ``json.loads``). Missing keys surface as nulls; null lines yield null
    parsed columns; alignment is validated like the CSV filter. Without an
    ``explicit_schema`` a batch with no parseable rows raises (the output
    schema would be unknowable) — pass the schema for schema stability
    across empty blocks."""
    import pyarrow.json as pajson

    parse_opts = (
        pajson.ParseOptions(
            explicit_schema=explicit_schema,
            unexpected_field_behavior="ignore",
        )
        if explicit_schema is not None
        else pajson.ParseOptions()
    )

    def json_parse(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        lines, valid_idx = _valid_lines(batch, line_col)
        if len(lines) == 0:
            if explicit_schema is None:
                raise ValueError(
                    "json parse: batch has no parseable rows and no "
                    "explicit_schema was given — the output schema would "
                    "be unknowable; pass explicit_schema"
                )
            parsed = _empty_typed(
                0, {f.name: f.type for f in explicit_schema}
            )
        else:
            parsed = pajson.read_json(
                pa.BufferReader(_rows_to_buffer(lines)),
                parse_options=parse_opts,
            )
        return _merge_parsed(
            batch, parsed, valid_idx, n, line_col, drop_line, "json"
        )

    return json_parse


# -- cidr ----------------------------------------------------------------------

_IPV4_RE = r"^(?P<o1>\d{1,3})\.(?P<o2>\d{1,3})\.(?P<o3>\d{1,3})\.(?P<o4>\d{1,3})$"


def ipv4_to_int(arr) -> pa.Array:
    """Dotted-quad → int64 (fits uint32), null for anything that is not a
    valid IPv4 literal (wrong shape or an octet > 255). One anchored
    ``pc.extract_regex`` pass + integer math — no per-row parsing."""
    arr = _combined(arr)
    m = pc.extract_regex(arr, _IPV4_RE)
    octets = [
        pc.cast(pc.struct_field(m, f"o{i}"), pa.int64()) for i in range(1, 5)
    ]
    ipint = octets[0]
    for o in octets[1:]:
        ipint = pc.add(pc.multiply(ipint, 256), o)
    in_range = None
    for o in octets:
        ok = pc.less_equal(o, 255)
        in_range = ok if in_range is None else pc.and_kleene(in_range, ok)
    return pc.if_else(pc.fill_null(in_range, False), ipint, pa.nulls(len(arr), pa.int64()))


def make_cidr_classify(
    networks: Sequence[Tuple[str, str]],
    source_col: str,
    target_col: str = "network_class",
    unmatched: str = "_unmatched",
    invalid: str = "_invalid",
):
    """logstash-filter-cidr: classify IPv4 addresses against a static list
    of ``(cidr, label)`` networks (the filter's ``address``/``network``
    match, generalized to a label per network). The network table is
    compiled ONCE into sorted integer ranges in the closure (broadcast with
    the function object); per batch the match is one anchored regex parse +
    a numpy ``searchsorted`` — no trie, no per-row Python.

    Networks must be non-overlapping (validated at build); order therefore
    cannot matter, keeping SQL CASE parity trivial. Unparseable/out-of-range
    sources classify as ``invalid``; parseable but unmatched as
    ``unmatched``; null sources stay null."""
    import ipaddress

    rngs = []
    for cidr, label in networks:
        net = ipaddress.ip_network(cidr)
        if net.version != 4:
            raise ValueError(f"IPv4 networks only: {cidr}")
        rngs.append((int(net.network_address), int(net.broadcast_address), label))
    rngs.sort()
    for (s1, e1, l1), (s2, e2, l2) in zip(rngs, rngs[1:]):
        if s2 <= e1:
            raise ValueError(f"overlapping networks: {l1} and {l2}")
    starts = np.array([r[0] for r in rngs], dtype=np.int64)
    ends = np.array([r[1] for r in rngs], dtype=np.int64)
    labels = np.array([r[2] for r in rngs] + [unmatched], dtype=object)
    miss_idx = len(rngs)

    def cidr_classify(batch: pa.Table) -> pa.Table:
        src = _combined(batch[source_col])
        ipint = ipv4_to_int(src)
        vals = ipint.to_numpy(zero_copy_only=False)  # NaN where null
        nan = np.isnan(vals)
        safe = np.where(nan, 0, vals).astype(np.int64)
        idx = np.searchsorted(starts, safe, side="right") - 1
        hit = (idx >= 0) & (safe <= ends[np.clip(idx, 0, None)])
        lab_idx = np.where(hit, np.clip(idx, 0, None), miss_idx)
        out = pa.array(labels[lab_idx], type=pa.string())
        # invalid = source present but not a valid IPv4; null source → null
        src_valid = pc.is_valid(src)
        out = pc.if_else(pa.array(nan), pa.array([invalid] * len(src)), out)
        out = pc.if_else(src_valid, out, pa.nulls(len(src), pa.string()))
        if target_col in batch.column_names:
            batch = batch.drop_columns([target_col])
        return batch.append_column(target_col, out)

    return cidr_classify


# -- elapsed -------------------------------------------------------------------


def elapsed(
    ds,
    key_col: str,
    ts_col: str,
    type_col: str,
    start_type: str,
    end_type: str,
    num_buckets: int = 64,
):
    """logstash-filter-elapsed, batch form: pair each key's FIRST
    ``start_type`` event with the first ``end_type`` event STRICTLY after
    it and emit the elapsed time; keys that never complete get the
    filter's failure tags as a status column — ``matched`` /
    ``start_without_end`` (the filter's expired-start path) /
    ``end_without_start``. NULL keys are dropped (SQL join semantics, the
    funnel_counts precedent).

    Output: (key, status, t0, t1, elapsed_us) — t0/t1 int64 epoch µs,
    null where the side is missing. Scale shape: the corpus filters to the
    two event types at the first map and ships (key, int64 ts, bool) only;
    each key resolves inside its hash bucket with three vectorized
    groupby/merge passes — no per-key Python, no global sort."""
    import pandas as pd

    from .aggregate import bucket_by_key

    types = pa.array([start_type, end_type])

    def prep(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.is_in(batch[type_col], value_set=types),
            pc.is_valid(batch[key_col]),
        )
        t = batch.filter(mask)
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.timestamp("us"))
        return pa.table(
            {
                key_col: t[key_col],
                "_ts": pc.cast(ts, pa.int64()),
                "_is_start": pc.equal(t[type_col], start_type),
            }
        )

    prepped = bucket_by_key(
        ds.map_batches(prep, batch_format="pyarrow"), key_col, num_buckets
    )

    def per_bucket(block: pd.DataFrame) -> pd.DataFrame:
        starts = block[block["_is_start"]]
        ends = block[~block["_is_start"]]
        t0 = starts.groupby(key_col)["_ts"].min().rename("t0")
        # reset_index: merging an EMPTY ends frame on right_index names the
        # result index after key_col, making the groupby below ambiguous
        m = ends.merge(
            t0, left_on=key_col, right_index=True, how="left"
        ).reset_index(drop=True)
        after = m[m["_ts"] > m["t0"]]
        t1 = after.groupby(key_col)["_ts"].min().rename("t1")
        paired = t0.to_frame().join(t1, how="left").reset_index()
        matched = paired["t1"].notna().to_numpy()
        paired["status"] = np.where(
            matched, "matched", "start_without_end"
        )
        # ends whose key has NO start at all
        orphan = ends[~ends[key_col].isin(t0.index)]
        orph = (
            orphan.groupby(key_col)["_ts"].min().rename("t1").reset_index()
        )
        orph["t0"] = pd.NA
        orph["status"] = "end_without_start"
        out = pd.concat(
            [paired[[key_col, "status", "t0", "t1"]],
             orph[[key_col, "status", "t0", "t1"]]],
            ignore_index=True,
        )
        out["t0"] = out["t0"].astype("Int64")
        out["t1"] = out["t1"].astype("Int64")
        out["elapsed_us"] = (out["t1"] - out["t0"]).where(
            out["status"] == "matched"
        ).astype("Int64")
        return out

    return (
        prepped.groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .sort(key_col)
    )


# -- translate -----------------------------------------------------------------


def make_translate(
    mapping: Dict[str, str],
    source_col: str,
    target_col: str,
    default: Optional[str] = None,
):
    """logstash-filter-translate: static-dictionary value map with a
    fallback. The dictionary is captured in the closure once (broadcast with
    the function object, not re-shipped per batch); the lookup is one
    ``pc.index_in`` + take per batch."""
    keys = pa.array(list(mapping.keys()), type=pa.string())
    # one trailing slot for the default so a single take covers both cases
    vals = pa.array(list(mapping.values()) + [default], type=pa.string())
    miss_idx = len(mapping)

    def translate(batch: pa.Table) -> pa.Table:
        src = _combined(batch[source_col])
        idx = pc.index_in(src, value_set=keys)
        idx = pc.fill_null(idx, miss_idx)
        out_col = vals.take(idx)
        if default is None:
            # no default → misses stay null (filter leaves the event alone)
            out_col = pc.if_else(
                pc.equal(idx, miss_idx), pa.nulls(len(src), pa.string()), out_col
            )
        if target_col in batch.column_names:
            batch = batch.drop_columns([target_col])
        return batch.append_column(target_col, out_col)

    return translate


# -- mutate --------------------------------------------------------------------

#: logstash-filter-mutate's documented fixed execution order (docs/index:
#: "mutations are applied in this order: coerce, rename, update, replace,
#: convert, gsub, uppercase, capitalize, lowercase, strip, remove, split,
#: join, merge, copy"). The subset below covers the pure-column-kernel ops;
#: template interpolation (sprintf) and cross-event merge are pipeline
#: concerns, not batch kernels.
MUTATE_ORDER = (
    "rename",
    "replace",
    "convert",
    "gsub",
    "uppercase",
    "capitalize",
    "lowercase",
    "strip",
    "split",
    "join",
    "copy",
)

#: logstash convert type names → Arrow types (mutate docs: integer, float,
#: string, boolean)
_CONVERT_TYPES = {
    "integer": pa.int64(),
    "float": pa.float64(),
    "string": pa.string(),
    "boolean": pa.bool_(),
}


def make_mutate(
    rename: Optional[Dict[str, str]] = None,
    replace: Optional[Dict[str, str]] = None,
    convert: Optional[Dict[str, str]] = None,
    gsub: Optional[Sequence[Tuple[str, str, str]]] = None,
    uppercase: Sequence[str] = (),
    capitalize: Sequence[str] = (),
    lowercase: Sequence[str] = (),
    strip: Sequence[str] = (),
    split: Optional[Dict[str, str]] = None,
    join: Optional[Dict[str, str]] = None,
    copy: Optional[Dict[str, str]] = None,
):
    """logstash-filter-mutate: general field mutation, applied in the
    filter's documented fixed order (``MUTATE_ORDER``) regardless of the
    argument order — the reference applies rename before gsub before case
    ops before split no matter how the config block is written.

    Every op is ONE Arrow kernel over the whole batch column:

    - ``rename``  {old: new} column renames
    - ``replace`` {col: constant} set/overwrite with a constant string
      (the sprintf-template subset logstash interpolates per event is a
      row-wise concern; constants cover the common static case)
    - ``convert`` {col: 'integer'|'float'|'string'|'boolean'} — ``pc.cast``;
      a value that cannot convert raises loudly (the engine's strict
      analogue of logstash's leave-original-behind)
    - ``gsub``    [(col, regex, replacement)] in the GIVEN sequence —
      ``pc.replace_substring_regex`` (RE2, the same engine DuckDB's
      regexp_replace uses, so oracles align)
    - ``uppercase`` / ``capitalize`` / ``lowercase`` / ``strip`` [cols]
    - ``split``   {col: separator} string → list<string>
    - ``join``    {col: separator} list → string
    - ``copy``    {src: dst} duplicate a column
    """
    gsub = list(gsub or ())
    for col, pat, rep in gsub:
        re.compile(pat)  # fail at build time, not per batch

    def _set(batch: pa.Table, name: str, arr) -> pa.Table:
        if name in batch.column_names:
            batch = batch.drop_columns([name])
        return batch.append_column(name, arr)

    def mutate(batch: pa.Table) -> pa.Table:
        for op in MUTATE_ORDER:
            if op == "rename" and rename:
                batch = batch.rename_columns(
                    [rename.get(c, c) for c in batch.column_names]
                )
            elif op == "replace" and replace:
                for col, value in replace.items():
                    arr = pa.array([value] * batch.num_rows, type=pa.string())
                    batch = _set(batch, col, arr)
            elif op == "convert" and convert:
                for col, tname in convert.items():
                    typ = _CONVERT_TYPES[tname]
                    batch = _set(batch, col, pc.cast(_combined(batch[col]), typ))
            elif op == "gsub":
                for col, pat, rep in gsub:
                    batch = _set(
                        batch,
                        col,
                        pc.replace_substring_regex(
                            _combined(batch[col]), pattern=pat, replacement=rep
                        ),
                    )
            elif op == "uppercase":
                for col in uppercase:
                    batch = _set(batch, col, pc.utf8_upper(_combined(batch[col])))
            elif op == "capitalize":
                for col in capitalize:
                    batch = _set(batch, col, pc.utf8_capitalize(_combined(batch[col])))
            elif op == "lowercase":
                for col in lowercase:
                    batch = _set(batch, col, pc.utf8_lower(_combined(batch[col])))
            elif op == "strip":
                for col in strip:
                    batch = _set(
                        batch, col, pc.utf8_trim_whitespace(_combined(batch[col]))
                    )
            elif op == "split" and split:
                for col, sep in split.items():
                    batch = _set(
                        batch, col, pc.split_pattern(_combined(batch[col]), sep)
                    )
            elif op == "join" and join:
                for col, sep in join.items():
                    batch = _set(
                        batch, col, pc.binary_join(_combined(batch[col]), sep)
                    )
            elif op == "copy" and copy:
                for src, dst in copy.items():
                    batch = _set(batch, dst, _combined(batch[src]))
        return batch

    return mutate


# -- useragent -------------------------------------------------------------------

#: default ordered UA pattern bank (uap-core shape: specific before generic,
#: FIRST match wins — Chrome must precede any Mozilla/Safari catch-all).
#: Each pattern needs named groups ``major`` / ``minor``.
UA_DEFAULT_BANK: Tuple[Tuple[str, str], ...] = (
    (r"Chrome/(?P<major>\d+)\.(?P<minor>\d+)", "Chrome"),
    (r"Firefox/(?P<major>\d+)\.(?P<minor>\d+)", "Firefox"),
    (r"curl/(?P<major>\d+)\.(?P<minor>\d+)", "curl"),
    (r"python-requests/(?P<major>\d+)\.(?P<minor>\d+)", "python-requests"),
    (r"^agent/(?P<major>\d+)\.(?P<minor>\d+)", "agent"),
)


def make_useragent(
    source_col: str,
    bank: Sequence[Tuple[str, str]] = UA_DEFAULT_BANK,
    other_family: str = "Other",
):
    """logstash-filter-useragent: classify a user-agent string column into
    (ua_family, ua_major, ua_minor) through an ORDERED regex bank — the
    uap-core regexes.yaml evaluation model, first matching pattern wins.

    The bank is compiled/validated once at build time and rides the closure
    to each worker; per batch the kernel runs one ``pc.extract_regex`` per
    pattern and chains the results with ``pc.coalesce`` (a row already
    claimed by an earlier pattern keeps its earlier match — exactly the
    first-wins bank semantics) — no Python row loop at any bank size.
    Unmatched and null rows get ``other_family`` with null major/minor."""
    for pat, _fam in bank:
        if "(?P<major>" not in pat or "(?P<minor>" not in pat:
            raise ValueError(
                "make_useragent: pattern %r must define named groups "
                "'major' and 'minor'" % pat
            )
        re.compile(pat)

    def useragent(batch: pa.Table) -> pa.Table:
        src = _combined(batch[source_col])
        n = len(src)
        fam = pa.nulls(n, pa.string())
        major = pa.nulls(n, pa.string())
        minor = pa.nulls(n, pa.string())
        for pat, family in bank:
            ext = pc.extract_regex(src, pat)
            hit = pc.is_valid(ext)
            fam_hit = pc.if_else(hit, family, pa.scalar(None, pa.string()))
            # coalesce = first pattern to claim a row wins; later patterns
            # only fill rows every earlier pattern left null
            fam = pc.coalesce(fam, fam_hit)
            major = pc.coalesce(major, pc.struct_field(ext, ["major"]))
            minor = pc.coalesce(minor, pc.struct_field(ext, ["minor"]))
        fam = pc.fill_null(fam, other_family)
        out = batch
        for name, arr in (
            ("ua_family", fam),
            ("ua_major", major),
            ("ua_minor", minor),
        ):
            if name in out.column_names:
                out = out.drop_columns([name])
            out = out.append_column(name, arr)
        return out

    return useragent


# -- urldecode -------------------------------------------------------------------

_HEXVAL = np.full(256, -1, dtype=np.int16)
for _c in range(10):
    _HEXVAL[ord("0") + _c] = _c
for _c in range(6):
    _HEXVAL[ord("a") + _c] = 10 + _c
    _HEXVAL[ord("A") + _c] = 10 + _c


def urldecode_array(col: pa.Array, plus_to_space: bool = False) -> pa.Array:
    """Vectorized percent-decoding of a string array (the
    logstash-filter-urldecode kernel): every valid ``%XX`` escape collapses
    to its byte; invalid escapes (non-hex, truncated, or straddling a row
    boundary) are left verbatim — CGI.unescape's forgiving contract, which
    keeps the kernel total.

    Pure byte-domain numpy over the Arrow buffers: one scan finds the
    ``%`` positions, a 256-entry hex table validates both digits, decoded
    bytes are written in place and the two hex bytes dropped by a boolean
    gather; new offsets derive from a per-row escape bincount. No Python
    loop at any escape density. Multi-byte UTF-8 escapes (%C3%A9 → é)
    decode correctly because the work happens below the codepoint level;
    rows whose decoded bytes are NOT valid UTF-8 keep their original text
    (the rare fallback validates per row only when the whole-array cast
    fails)."""
    n = len(col)
    if n == 0:
        return pa.array([], type=pa.string())
    # nulls: decode the valid subset, scatter back with a masked take
    if col.null_count:
        valid = pc.is_valid(col)
        vidx = np.flatnonzero(valid.to_numpy(zero_copy_only=False))
        dec = urldecode_array(col.filter(valid), plus_to_space)
        pos = np.zeros(n, dtype=np.int64)
        pos[vidx] = np.arange(len(vidx))
        mask = np.ones(n, dtype=bool)
        mask[vidx] = False
        return dec.take(pa.array(pos, type=pa.int64(), mask=mask))

    offs_buf = col.buffers()[1]
    data_buf = col.buffers()[2]
    offs = np.frombuffer(offs_buf, np.int32)[col.offset : col.offset + n + 1]
    base = int(offs[0])
    rel = (offs.astype(np.int64)) - base
    seg = np.frombuffer(data_buf, np.uint8)[base : int(offs[-1])].copy()

    if plus_to_space:
        seg[seg == ord("+")] = ord(" ")

    pct = np.flatnonzero(seg == ord("%"))
    if len(pct):
        # escape must fit inside its own row: find each %'s row, require
        # the two hex digits before that row's end
        row = np.searchsorted(rel, pct, side="right") - 1
        fits = pct + 3 <= rel[row + 1]
        pct, row = pct[fits], row[fits]
    if len(pct):
        hex_ok = (_HEXVAL[seg[pct + 1]] >= 0) & (_HEXVAL[seg[pct + 2]] >= 0)
        pct, row = pct[hex_ok], row[hex_ok]
    if not len(pct):
        decoded_data, new_rel = seg, rel
    else:
        seg[pct] = (
            _HEXVAL[seg[pct + 1]].astype(np.uint8) * 16
            + _HEXVAL[seg[pct + 2]].astype(np.uint8)
        )
        keep = np.ones(len(seg), dtype=bool)
        keep[pct + 1] = False
        keep[pct + 2] = False
        decoded_data = seg[keep]
        shrink = 2 * np.bincount(row, minlength=n)
        new_rel = rel - np.concatenate([[0], np.cumsum(shrink)])

    out_bin = pa.Array.from_buffers(
        pa.binary(),
        n,
        [None, pa.py_buffer(new_rel.astype(np.int32)), pa.py_buffer(decoded_data)],
    )
    try:
        return out_bin.cast(pa.string())
    except pa.ArrowInvalid:
        # rare: some row decoded to invalid UTF-8 — keep the ORIGINAL text
        # for exactly those rows (per-row python only on this fallback path)
        vals = []
        for i in range(n):
            b = out_bin[i].as_py()
            try:
                vals.append(b.decode("utf-8"))
            except UnicodeDecodeError:
                vals.append(col[i].as_py())
        return pa.array(vals, type=pa.string())


def make_urldecode(source_col: str, target_col: Optional[str] = None, plus_to_space: bool = False):
    """map_batches wrapper for :func:`urldecode_array`; decodes in place
    unless ``target_col`` names a new column."""
    tgt = target_col or source_col

    def urldecode(batch: pa.Table) -> pa.Table:
        dec = urldecode_array(_combined(batch[source_col]), plus_to_space)
        out = batch
        if tgt in out.column_names:
            out = out.drop_columns([tgt])
        return out.append_column(tgt, dec)

    return urldecode


# -- split (event explosion) ----------------------------------------------------


def make_split_rows(
    source_col: str,
    sep: str,
    keep_cols: Sequence[str],
    part_col: str = "part",
    idx_col: str = "part_idx",
):
    """logstash-filter-split: ONE event whose field holds a separated list
    becomes N events, one per element — the row-explosion filter (the
    canonical use is multi-line messages → one event per line).

    Vectorized: ``pc.split_pattern`` → ``list_parent_indices`` gathers the
    carried columns, ``list_flatten`` yields the parts, and the within-row
    element index (logstash keeps ordering; SQL's ``generate_subscripts``)
    is one arange-minus-repeated-starts pass. NULL source rows produce no
    output rows (unnest semantics — logstash tags ``_splitparsefailure``
    for a non-splittable field and emits nothing)."""

    def split_rows(batch: pa.Table) -> pa.Table:
        src = _combined(batch[source_col])
        lists = pc.split_pattern(src, sep)
        parent = pc.list_parent_indices(lists)
        flat = pc.list_flatten(lists)
        sizes = pc.list_value_length(lists)
        sz = pc.fill_null(sizes, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.repeat(np.concatenate([[0], np.cumsum(sz)[:-1]]), sz)
        pos = np.arange(len(flat), dtype=np.int64) - starts
        out = batch.select(list(keep_cols)).take(parent)
        out = out.append_column(part_col, flat)
        return out.append_column(idx_col, pa.array(pos + 1, type=pa.int64()))

    return split_rows


# -- clone (event duplication) ---------------------------------------------------


def make_clone(clone_types: Sequence[str], type_col: str = "type"):
    """logstash-filter-clone: every event passes through unchanged AND is
    duplicated once per entry in ``clone_types``, each copy with its
    ``type`` field set to that entry (the original keeps its existing type,
    null if absent — the filter's copy-then-tag contract).

    One ``pa.concat_tables`` per batch — no shuffle, output rows =
    n × (1 + len(clone_types)); the type column is a constant per slice so
    the concat is metadata-cheap."""
    clone_types = list(clone_types)

    def clone(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        base = batch
        if type_col not in base.column_names:
            base = base.append_column(type_col, pa.nulls(n, pa.string()))
        parts = [base]
        stripped = base.drop_columns([type_col])
        for t in clone_types:
            parts.append(
                stripped.append_column(
                    type_col, pa.array([t] * n, type=pa.string())
                )
            )
        return pa.concat_tables(parts)

    return clone



# -- syslog_pri -------------------------------------------------------------------

#: RFC 3164 facility labels, index = facility code 0-23 (the
#: logstash-filter-syslog_pri default ``facility_labels``).
SYSLOG_FACILITY_LABELS: Tuple[str, ...] = (
    "kernel", "user-level", "mail", "daemon", "security/authorization",
    "syslogd", "line printer", "network news", "uucp", "clock",
    "security/authorization", "ftp", "ntp", "log audit", "log alert",
    "clock", "local0", "local1", "local2", "local3", "local4", "local5",
    "local6", "local7",
)

#: RFC 3164 severity labels, index = severity code 0-7.
SYSLOG_SEVERITY_LABELS: Tuple[str, ...] = (
    "emergency", "alert", "critical", "error", "warning", "notice",
    "informational", "debug",
)


def make_syslog_pri(
    pri_col: str = "syslog_pri",
    use_labels: bool = True,
    tag_col: str = "syslog_tag",
):
    """logstash-filter-syslog_pri: decode the RFC 3164 priority value into
    ``syslog_severity_code`` (pri & 7), ``syslog_facility_code`` (pri >> 3)
    and, with ``use_labels`` (the filter's default true), the label strings
    from the fixed RFC tables. A missing / unparseable / out-of-domain
    (not 0-191) pri falls back to the filter's documented default 13
    (facility user-level, severity notice) and the row gets
    ``_syslogpriparsefailure`` in ``tag_col`` (null otherwise).

    Pure Arrow kernels: one digits-regex validity mask + cast, two integer
    ops, two ``pc.take`` gathers against the broadcast label tables. An
    integer source column skips the regex."""
    fac_arr = pa.array(SYSLOG_FACILITY_LABELS, type=pa.string())
    sev_arr = pa.array(SYSLOG_SEVERITY_LABELS, type=pa.string())

    def syslog_pri(batch: pa.Table) -> pa.Table:
        src = _combined(batch[pri_col])
        if pa.types.is_integer(src.type):
            pri = src.cast(pa.int64())
        else:
            s = src.cast(pa.string())
            digits = pc.fill_null(pc.match_substring_regex(s, r"^\d{1,6}$"), False)
            pri = pc.if_else(digits, s, pa.scalar(None, pa.string())).cast(pa.int64())
        ok = pc.fill_null(
            pc.and_(pc.greater_equal(pri, 0), pc.less_equal(pri, 191)), False
        )
        pri = pc.if_else(ok, pri, pa.scalar(13, pa.int64()))
        sev = pc.bit_wise_and(pri, 7)
        fac = pc.shift_right(pri, 3)
        out = batch.append_column("syslog_severity_code", sev)
        out = out.append_column("syslog_facility_code", fac)
        if use_labels:
            out = out.append_column("syslog_severity", pc.take(sev_arr, sev))
            out = out.append_column("syslog_facility", pc.take(fac_arr, fac))
        tag = pc.if_else(
            ok,
            pa.scalar(None, pa.string()),
            pa.scalar("_syslogpriparsefailure", pa.string()),
        )
        return out.append_column(tag_col, tag)

    return syslog_pri


# -- range ------------------------------------------------------------------------


def make_range_tag(
    checks: Sequence[Tuple[str, float, float, str]],
    negate: bool = False,
    tags_col: str = "range_tags",
):
    """logstash-filter-range: apply each check's tag when the numeric
    field's value is WITHIN [min, max] (the filter's action contract;
    ``negate`` inverts to outside-of-range). The Ruby filter checks string
    fields by length — callers pass a length column explicitly, keeping
    the kernel numeric. Null field values never fire a check.

    Each check is one vectorized compare pair; the per-row ``range_tags``
    list concatenates fired tags in declaration order (the filter applies
    actions in config order), built with one offsets/values pass."""
    checks = [(f, float(lo), float(hi), t) for f, lo, hi, t in checks]

    def range_tag(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        fired: List[np.ndarray] = []
        for field, lo, hi, _tag in checks:
            v = _combined(batch[field]).cast(pa.float64())
            within = pc.and_(pc.greater_equal(v, lo), pc.less_equal(v, hi))
            m = pc.fill_null(within, False).to_numpy(zero_copy_only=False)
            if negate:
                notnull = pc.invert(pc.is_null(v)).to_numpy(zero_copy_only=False)
                m = ~m & notnull
            fired.append(m)
        counts = np.zeros(n, dtype=np.int64)
        for m in fired:
            counts += m
        offsets = np.concatenate([[0], np.cumsum(counts)])
        values = np.empty(int(counts.sum()), dtype=object)
        pos = offsets[:-1].copy()
        for m, (_, _, _, tag) in zip(fired, checks):
            values[pos[m]] = tag
            pos[m] += 1
        tags = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pa.array(values, type=pa.string()),
        )
        return batch.append_column(tags_col, tags)

    return range_tag


# -- tld --------------------------------------------------------------------------

#: Representative multi-label public suffixes (logstash-filter-tld consults
#: the full Mozilla Public Suffix List via guava's InternetDomainName; this
#: embedded subset covers the common two-label registries and is the
#: kernel's broadcast small side — swap in the full PSL the same way).
TLD_MULTI_SUFFIXES: Tuple[str, ...] = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "com.tr", "co.za", "com.sg", "github.io", "co.nz",
)


def make_tld(
    host_col: str = "host",
    suffixes: Sequence[str] = TLD_MULTI_SUFFIXES,
):
    """logstash-filter-tld: split a registered hostname into ``tld`` (the
    public suffix), ``sld`` (the registrable label left of it), ``domain``
    (sld + '.' + tld) and ``subdomain`` (everything left of the sld,
    null when absent).

    Vectorized with numpy ``rpartition`` passes over fixed-width string
    views plus one ``np.isin`` probe against the broadcast multi-label
    suffix set — no per-row Python. A host with no '.' yields ``tld`` =
    the host itself and null sld/domain/subdomain (guava raises for
    unlisted names; we null instead of dropping). Null hosts stay null
    across all four outputs."""
    multi = np.array(sorted(set(suffixes)), dtype="U64")

    def _rpart(arr: np.ndarray):
        parts = np.char.rpartition(arr, ".")
        return parts[..., 0], parts[..., 1], parts[..., 2]

    def tld(batch: pa.Table) -> pa.Table:
        host = _combined(batch[host_col]).cast(pa.string())
        isnull = pc.is_null(host).to_numpy(zero_copy_only=False)
        h = np.asarray(
            pc.fill_null(host, "").to_numpy(zero_copy_only=False), dtype="U253"
        )
        head1, sep1, last1 = _rpart(h)              # last label
        head2, sep2, last2 = _rpart(np.asarray(head1, dtype="U253"))
        has_dot = sep1 != ""
        two_label = np.char.add(np.char.add(last2, "."), last1)
        is_multi = has_dot & (last2 != "") & np.isin(two_label, multi)
        tld_v = np.where(is_multi, two_label, last1)
        # the label immediately left of the chosen suffix = the sld
        head_for_sld = np.asarray(np.where(is_multi, head2, head1), dtype="U253")
        head3, _sep3, sld_v = _rpart(head_for_sld)
        valid = has_dot & (np.char.str_len(head_for_sld) > 0) & ~isnull
        domain_v = np.char.add(np.char.add(sld_v, "."), tld_v)
        sub_ok = valid & (np.char.str_len(np.asarray(head3, dtype="U253")) > 0)

        def masked(vals: np.ndarray, mask: np.ndarray) -> pa.Array:
            out = np.empty(len(vals), dtype=object)
            out[mask] = vals[mask]
            return pa.array(out, type=pa.string())

        out = batch.append_column("tld", masked(tld_v.astype(object), ~isnull))
        out = out.append_column("sld", masked(sld_v.astype(object), valid))
        out = out.append_column("domain", masked(domain_v.astype(object), valid))
        return out.append_column(
            "subdomain", masked(np.asarray(head3, dtype=object), sub_ok)
        )

    return tld


# -- prune / de_dot / truncate (event-shaping filters) -----------------------------


def make_prune(
    whitelist: Optional[Sequence[str]] = None,
    blacklist: Optional[Sequence[str]] = None,
):
    """logstash-filter-prune: keep only columns whose NAME matches a
    whitelist regex (or drop blacklist matches — whitelist wins when both
    given, the filter's precedence). A pure schema operation: the kept-name
    list is computed once per schema and cached, so per batch it's a
    zero-copy ``select``."""
    wl = [re.compile(p) for p in (whitelist or [])]
    bl = [re.compile(p) for p in (blacklist or [])]
    if not wl and not bl:
        raise ValueError("prune: need a whitelist or a blacklist")
    cache: Dict[Tuple[str, ...], List[str]] = {}

    def prune(batch: pa.Table) -> pa.Table:
        names = tuple(batch.column_names)
        kept = cache.get(names)
        if kept is None:
            if wl:
                kept = [n for n in names if any(p.search(n) for p in wl)]
            else:
                kept = [n for n in names if not any(p.search(n) for p in bl)]
            cache[names] = kept
        return batch.select(kept)

    return prune


def make_de_dot(separator: str = "_"):
    """logstash-filter-de_dot: rename every column containing '.' to use
    ``separator`` instead (dotted field names break downstream stores that
    treat '.' as a path separator). Schema-only — zero data movement; a
    rename collision (a.b and a_b both present) raises instead of silently
    merging."""

    def de_dot(batch: pa.Table) -> pa.Table:
        new = [n.replace(".", separator) for n in batch.column_names]
        if len(set(new)) != len(new):
            dupes = sorted({n for n in new if new.count(n) > 1})
            raise ValueError("de_dot: rename collision on %s" % dupes)
        return batch.rename_columns(new)

    return de_dot


def make_truncate_bytes(cols: Sequence[str], length_bytes: int):
    """logstash-filter-truncate: cap string fields at ``length_bytes``
    BYTES (the filter's contract — not codepoints), backing off up to 3
    bytes so a multibyte UTF-8 codepoint is never cut mid-sequence (the
    filter force-re-encodes; we trim, which keeps the result valid UTF-8
    and ≤ the cap). Vectorized: one byte-domain numpy pass over the Arrow
    buffers per column — rows already within the cap are untouched
    (zero-copy keep of the original array when nothing exceeds it)."""
    if length_bytes < 4:
        raise ValueError("truncate: length_bytes must be >= 4 (one codepoint)")
    cols = list(cols)

    def _truncate_one(arr: pa.Array) -> pa.Array:
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        lens = pc.binary_length(arr).to_numpy(zero_copy_only=False)
        over = lens > length_bytes  # null rows compare False → untouched
        if not over.any():
            return arr  # zero-copy fast path: nothing exceeds the cap
        # only the over-long rows are materialized: byte-prefix slice, then
        # UTF-8 decode with errors='ignore' — on valid input (Arrow strings
        # are guaranteed valid UTF-8) that drops exactly the trailing
        # incomplete codepoint, the filter's trim contract
        over_idx = pa.array(np.flatnonzero(over))
        pref = pc.binary_slice(
            arr.take(over_idx).cast(pa.binary()), 0, length_bytes
        ).to_pylist()
        fixed = pa.array(
            [b.decode("utf-8", "ignore") for b in pref], type=pa.string()
        )
        mask = pa.array(over)
        return pc.replace_with_mask(arr, mask, fixed)

    def truncate(batch: pa.Table) -> pa.Table:
        for c in cols:
            idx = batch.column_names.index(c)
            batch = batch.set_column(idx, c, _truncate_one(batch[c]))
        return batch

    return truncate


# -- extractnumbers ----------------------------------------------------------------

#: a token is a number iff it FULLY matches this (int, decimal, exponent)
NUMBER_TOKEN_RE = r"[-+]?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][-+]?[0-9]+)?"

#: and an integer iff it fully matches this
INT_TOKEN_RE = r"[-+]?[0-9]+"


def make_extractnumbers(
    source_col: str = "text",
    keep_cols: Sequence[str] = (),
    num_col: str = "num",
    idx_col: str = "num_idx",
):
    """logstash-filter-extractnumbers: find every number embedded in a
    string field. Two-step contract that an independent SQL oracle can
    replay exactly: (1) tokenize by splitting on runs of non-number
    characters ``[^0-9eE.+-]+``, (2) a token is a number iff it FULLY
    matches :data:`NUMBER_TOKEN_RE` (so '1.2.3' from an IP-ish string is
    rejected whole, not re-segmented). Emits long-form rows (carried
    columns, num as the original token string, 1-based ``num_idx`` among
    the row's numbers, ``is_int``) — the columnar analogue of the filter's
    int0/float1 fields; null source rows emit nothing.

    All-Arrow: one regex split, one flatten with parent carry, two anchored
    match kernels, and a vectorized per-parent rank (cumcount via repeated
    first-offsets) — no per-row Python."""

    def extractnumbers(batch: pa.Table) -> pa.Table:
        src = _combined(batch[source_col])
        toks = pc.split_pattern_regex(src, "[^0-9eE.+-]+")
        parent = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        ok = pc.fill_null(
            pc.match_substring_regex(flat, "^(?:%s)$" % NUMBER_TOKEN_RE), False
        )
        okn = ok.to_numpy(zero_copy_only=False)
        par = parent.to_numpy(zero_copy_only=False)[okn]
        num = flat.filter(ok)
        is_int = pc.match_substring_regex(num, "^(?:%s)$" % INT_TOKEN_RE)
        # 1-based rank among each parent's kept tokens: parents arrive
        # sorted, so rank = position - first-position-of-parent
        if len(par):
            first = np.flatnonzero(np.concatenate([[True], par[1:] != par[:-1]]))
            starts = np.repeat(
                np.arange(len(par), dtype=np.int64)[first],
                np.diff(np.concatenate([first, [len(par)]])),
            )
            rank = np.arange(len(par), dtype=np.int64) - starts + 1
        else:
            rank = np.zeros(0, dtype=np.int64)
        out = batch.select(list(keep_cols)).take(pa.array(par))
        out = out.append_column(num_col, num)
        out = out.append_column(idx_col, pa.array(rank, type=pa.int64()))
        return out.append_column("is_int", is_int)

    return extractnumbers


# -- aggregate -------------------------------------------------------------------


def aggregate_tasks(
    ds,
    key_col: str,
    ts_col: str,
    type_col: str,
    start_type: str,
    end_type: str,
    value_col: str,
    timeout_us: int,
    num_buckets: int = 64,
):
    """logstash-filter-aggregate semantics, batch form — the canonical
    cross-event task-correlation filter (start event creates the task map,
    intermediate events accumulate into it, the end event flushes it;
    ``push_map_as_event_on_timeout`` flushes tasks that never end). Batch
    analog, per task key:

    - ``t0`` = earliest ``start_type`` event (the ``map_action => create``
      moment). Keys with no start event never create a map and emit
      nothing (the filter's ``map_action => update`` no-op path).
    - ``t1`` = earliest ``end_type`` event inside ``[t0, t0+timeout_us]``
      — the filter's map EXPIRES ``timeout`` seconds after creation, so a
      later end event finds no map and cannot close the task. Present →
      status ``completed``, window = [t0, t1]. Absent → status
      ``timeout`` (the filter's ``push_map_as_event_on_timeout`` flush,
      tag ``_aggregatetimeout``), window = [t0, t0 + timeout_us].
    - Aggregates over ALL events of the key inside the window (the code
      block every event runs): ``n_events`` + ``sum_value_milli``
      (``floor(value*1000)`` int64 — the repo's exact-oracle convention;
      null values skip like SQL SUM, and an all-null window sums to null).

    Output: (key, status, t0, t1, n_events, sum_value_milli); t0/t1 int64
    epoch µs, t1 null on timeout. NULL keys are dropped (SQL join
    semantics; the filter cannot correlate a null task_id either).

    Scale shape: the corpus projects to (key, int64 ts, type-flags, milli
    value) at the first map; each task resolves inside its stable hash
    bucket with vectorized groupby/merge passes — no per-key Python, no
    global sort, no driver state. The filter's single-threaded in-memory
    map (its documented scaling limit: one worker, one task map) becomes a
    bucketed exchange that spreads tasks across the cluster."""
    import pandas as pd

    from .aggregate import bucket_by_key

    def prep(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch[key_col]))
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64())
        else:
            ts = pc.cast(ts, pa.int64())
        return pa.table(
            {
                key_col: t[key_col],
                "_ts": ts,
                # fill_null: a null event_type is neither start nor end
                # (a null boolean would poison the pandas masks downstream)
                "_is_start": pc.fill_null(
                    pc.equal(t[type_col], start_type), False
                ),
                "_is_end": pc.fill_null(
                    pc.equal(t[type_col], end_type), False
                ),
                "_v": pc.cast(
                    pc.floor(pc.multiply(t[value_col], 1000.0)), pa.int64()
                ),
            }
        )

    prepped = bucket_by_key(
        ds.map_batches(prep, batch_format="pyarrow"), key_col, num_buckets
    )

    def per_bucket(block: pd.DataFrame) -> pd.DataFrame:
        t0 = (
            block[block["_is_start"]]
            .groupby(key_col)["_ts"]
            .min()
            .rename("t0")
        )
        if t0.empty:
            return pd.DataFrame(
                {
                    key_col: pd.Series([], dtype=block[key_col].dtype),
                    "status": pd.Series([], dtype=object),
                    "t0": pd.Series([], dtype="Int64"),
                    "t1": pd.Series([], dtype="Int64"),
                    "n_events": pd.Series([], dtype="int64"),
                    "sum_value_milli": pd.Series([], dtype="Int64"),
                }
            )
        # reset_index: merging an EMPTY left frame on right_index names the
        # result index after key_col, making the groupby below ambiguous
        ends = block[block["_is_end"]].merge(
            t0, left_on=key_col, right_index=True, how="inner"
        ).reset_index(drop=True)
        t1 = (
            ends[
                (ends["_ts"] >= ends["t0"])
                & (ends["_ts"] <= ends["t0"] + timeout_us)
            ]
            .groupby(key_col)["_ts"]
            .min()
            .rename("t1")
        )
        tasks = t0.to_frame().join(t1, how="left").reset_index()
        completed = tasks["t1"].notna().to_numpy()
        tasks["status"] = np.where(completed, "completed", "timeout")
        tasks["win_end"] = np.where(
            completed, tasks["t1"].fillna(0), tasks["t0"] + timeout_us
        ).astype("int64")
        m = block.merge(
            tasks[[key_col, "t0", "win_end"]], on=key_col, how="inner"
        )
        inwin = m[(m["_ts"] >= m["t0"]) & (m["_ts"] <= m["win_end"])]
        agg = inwin.groupby(key_col).agg(
            n_events=("_ts", "size"),
            # min_count=1: SUM over only-null values is NULL (SQL parity),
            # not pandas' skipna 0; nulls among non-nulls still skip
            sum_value_milli=("_v", lambda s: s.sum(min_count=1)),
        )
        out = tasks.merge(
            agg, left_on=key_col, right_index=True, how="left"
        ).reset_index(drop=True)
        out["t0"] = out["t0"].astype("Int64")
        out["t1"] = out["t1"].astype("Int64")
        # a start event is itself in-window, so n_events ≥ 1 always; the
        # fillna is the zero-row merge edge, not a reachable value
        out["n_events"] = out["n_events"].fillna(0).astype("int64")
        out["sum_value_milli"] = out["sum_value_milli"].astype("Int64")
        return out[
            [key_col, "status", "t0", "t1", "n_events", "sum_value_milli"]
        ]

    return (
        prepped.groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .sort(key_col)
    )


# -- xml -------------------------------------------------------------------------


def make_xml_parse(
    source_col: str,
    fields: Dict[str, str],
    failure_col: str = "xml_ok",
):
    """logstash-filter-xml semantics, batch form: parse each row's
    ``source_col`` string as an XML document and extract ``fields`` —
    output column name → child element tag (first match's text) or
    ``"@name"`` for a root attribute. Unparseable / null rows get every
    extract null and ``failure_col=False`` (the filter's
    ``_xmlparsefailure`` tag as a bool column, the dissect/csv precedent).

    Batch shape: the optimistic path wraps every row in its own
    ``<__r__>…</__r__>`` marker inside ONE envelope and parses the batch
    with a single C call (ElementTree's C accelerator) — the marker keeps
    row alignment exact even when a row is empty or has multiple roots
    (those markers simply hold ≠1 children and fail that row alone, the
    filter's multi-root rejection). Only when the envelope itself fails
    to parse (raw ``<``/``&`` in some row) does it fall back to per-row
    parses to isolate the bad rows. Entity escapes (&amp; &lt; &gt;
    &quot;) round-trip through the parser, so renderers must escape and
    the extracts come back unescaped. The per-element extraction walk is
    bounded Python over an already-C-parsed tree — the same cost class as
    the reference filter's per-event Nokogiri walk, amortized by the
    batch-level parse."""
    import xml.etree.ElementTree as ET

    tags = dict(fields)

    def _extract(elem, out: Dict[str, list]) -> None:
        for name, spec in tags.items():
            if spec.startswith("@"):
                out[name].append(elem.get(spec[1:]))
            else:
                out[name].append(elem.findtext(spec))

    def _null_row(out: Dict[str, list]) -> None:
        for name in tags:
            out[name].append(None)

    def xml_parse(batch: pa.Table) -> pa.Table:
        col = _combined(batch[source_col])
        rows = col.to_pylist()
        out: Dict[str, list] = {name: [] for name in tags}
        ok: list = []
        docs = [r for r in rows if r is not None]
        markers = None
        if docs:
            try:
                root = ET.fromstring(
                    "<__b__><__r__>%s</__r__></__b__>"
                    % "</__r__><__r__>".join(docs)
                )
                # a row containing the literal marker markup would inject
                # extra markers and misalign every row after it — trust the
                # envelope only when the count is exact, else isolate
                # per-row (where such a row fails alone)
                if len(root) == len(docs):
                    markers = iter(root)
            except ET.ParseError:
                markers = None
        for r in rows:
            if r is None:
                _null_row(out)
                ok.append(False)
                continue
            if markers is not None:
                m = next(markers)
                # a well-formed row is exactly one root element with no
                # stray top-level text before OR after it; anything else
                # is _xmlparsefailure (matches the per-row fallback, where
                # 'junk after document element' raises)
                if (
                    len(m) == 1
                    and not (m.text or "").strip()
                    and not (m[0].tail or "").strip()
                ):
                    _extract(m[0], out)
                    ok.append(True)
                else:
                    _null_row(out)
                    ok.append(False)
                continue
            try:  # pessimistic path: isolate the malformed rows
                _extract(ET.fromstring(r), out)
                ok.append(True)
            except ET.ParseError:
                _null_row(out)
                ok.append(False)
        cols = {name: pa.array(vals, type=pa.string()) for name, vals in out.items()}
        cols[failure_col] = pa.array(ok, type=pa.bool_())
        t = batch
        for name, arr in cols.items():
            t = t.append_column(name, arr)
        return t

    return xml_parse


def xml_escape_array(col: pa.Array) -> pa.Array:
    """Vectorized XML text-content escaping (& < > — the three that
    matter outside attributes), for render-then-parse roundtrips."""
    a = _combined(col)
    a = pc.replace_substring(a, "&", "&amp;")
    a = pc.replace_substring(a, "<", "&lt;")
    return pc.replace_substring(a, ">", "&gt;")


# -- i18n ------------------------------------------------------------------------


def transliterate_array(col: pa.Array) -> pa.Array:
    """NFD-normalize then drop every Unicode mark codepoint (``\\p{M}`` —
    Mn/Mc/Me): utf8proc-STRIPMARK parity, the exact contract of DuckDB's
    ``strip_accents`` (pinned across all three mark categories in tests,
    including the Devanagari Mc and enclosing Me cases). One pandas C
    normalize pass + one RE2 replace per column; nulls stay null."""
    import pandas as pd

    a = _combined(col)
    nfd = pa.array(
        pd.Series(a.to_pandas(), dtype=object).str.normalize("NFD"),
        type=pa.string(),
        from_pandas=True,
    )
    return pc.replace_substring_regex(nfd, pattern=r"\p{M}", replacement="")


def make_transliterate(cols: Sequence[str], suffix: str = "_ascii"):
    """logstash-filter-i18n (transliterate mode), batch form: each listed
    column gains a ``<name><suffix>`` accent-stripped sibling."""
    names = list(cols)

    def transliterate(batch: pa.Table) -> pa.Table:
        for name in names:
            batch = batch.append_column(
                name + suffix, transliterate_array(batch[name])
            )
        return batch

    return transliterate


def make_fingerprint(
    source_cols: Sequence[str],
    target_col: str = "fingerprint",
    method: str = "SHA256",
    key: Optional[str] = None,
):
    """Logstash fingerprint-filter analog (logstash-filter-fingerprint's
    ``concatenate_sources`` mode): the named source fields are serialized
    as ``name=value`` joined with ``|`` (nulls serialize as the empty
    string, mirroring the reference's to_s) and hashed — SHA256/SHA1/MD5
    hex, or HMAC-SHA256 when ``key`` is given (the keyed variant has no
    SQL twin; the unkeyed ones are oracle-exact via DuckDB sha256/md5).

    Batch shape: the message column is built with ONE vectorized
    ``pc.binary_join_element_wise`` pass; the digest itself is a per-row C
    hashlib call (a hash is inherently per-row — same cost class as the
    md5 oracle variant of epoch_shuffle)."""
    import hashlib
    import hmac as hmac_mod

    methods = {"SHA256": hashlib.sha256, "SHA1": hashlib.sha1, "MD5": hashlib.md5}
    if method not in methods:
        raise ValueError("make_fingerprint: unsupported method %r" % method)
    key_bytes = key.encode() if key is not None else None

    def fn(batch: pa.Table) -> pa.Table:
        parts = []
        for i, c in enumerate(source_cols):
            col = batch[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            sval = pc.fill_null(pc.cast(col, pa.string()), "")
            # scalars broadcast in binary_join_element_wise — no N-row
            # constant arrays in the hot path
            parts.append(("" if i == 0 else "|") + c + "=")
            parts.append(sval)
        msg = pc.binary_join_element_wise(*parts, "")
        if key_bytes is None:
            h = methods[method]
            digests = [
                h(m.encode("utf-8")).hexdigest()
                for m in msg.to_pylist()
            ]
        else:
            digests = [
                hmac_mod.new(key_bytes, m.encode("utf-8"), methods[method]).hexdigest()
                for m in msg.to_pylist()
            ]
        return batch.append_column(target_col, pa.array(digests, type=pa.string()))

    return fn
