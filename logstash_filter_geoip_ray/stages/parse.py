"""Vectorized grok/regex field extraction from transcript ``text`` (P2).

Plays the role logstash-filter-grok plays upstream of the geoip filter:
produce the ``source`` field the enricher reads (the reference just declares
``source`` required and lets grok fill it, geoip.rb:48-50). Stateless
``map_batches`` task over zero-copy Arrow string columns using
``pyarrow.compute.extract_regex`` (RE2) — no Python row loop.

First match wins, mirroring the E1 first-of-list rule
(GeoIPFilter.java:156-158).
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

#: grok-ish capture of the token following a known field marker. Matches the
#: DuckDB oracle regex verbatim (see pipelines/geoip_pipeline.py oracle SQL):
#: RE2 syntax in both engines.
DEFAULT_PATTERN = r'(?:request from|client=)\s*(?P<ip>[^\s"]+)'


def make_extract_ips(
    text_column: str = "text",
    output_column: str = "source_ip",
    pattern: str = DEFAULT_PATTERN,
    drop_text: bool = False,
):
    """Returns a stateless batch fn: adds ``output_column`` (string, null when
    no match) extracted from ``text_column``.

    ``drop_text=True`` drops the (large) text column as soon as the token is
    extracted — aggregate-only consumers should set it so the widest column
    never travels past this stage."""

    def extract_ips(batch: pa.Table) -> pa.Table:
        text = batch[text_column]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        matches = pc.extract_regex(text, pattern)  # struct<ip: string>, null on no-match
        token = pc.struct_field(matches, "ip")
        if drop_text:
            batch = batch.drop_columns([text_column])
        if output_column in batch.column_names:
            batch = batch.drop_columns([output_column])
        return batch.append_column(output_column, token)

    return extract_ips


def extract_ips(batch: pa.Table) -> pa.Table:
    """Default-configured extraction (text → source_ip)."""
    return make_extract_ips()(batch)


#: multi-field grok dictionary for the transcript log shapes — each entry is
#: an independent RE2 pattern with one named capture (null on no-match),
#: mirroring how a grok filter binds %{PATTERN:field} captures.
LOG_FIELD_PATTERNS = {
    "path": r"path=(?P<path>[^\s\"]+)",
    "status": r"status=(?P<status>\d{3})",
    "latency_ms": r"latency=(?P<latency_ms>\d+)ms",
    "ua": r"ua=(?P<ua>[^\s\"]+)",
}


def make_extract_log_fields(
    text_column: str = "text",
    patterns: Optional[dict] = None,
    drop_text: bool = False,
):
    """Vectorized multi-field grok: one ``pc.extract_regex`` per field over
    the same text column (RE2, no Python row loop). Numeric-looking captures
    stay strings — casting is the caller's choice (grok semantics)."""
    pats = patterns or LOG_FIELD_PATTERNS

    def extract_log_fields(batch: pa.Table) -> pa.Table:
        text = batch[text_column]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        out = batch.drop_columns([text_column]) if drop_text else batch
        for name, pattern in pats.items():
            matches = pc.extract_regex(text, pattern)
            col = pc.struct_field(matches, name)
            if name in out.column_names:
                out = out.drop_columns([name])
            out = out.append_column(name, col)
        return out

    return extract_log_fields


#: minimal public grok pattern bank (the handful the reference ecosystem's
#: grok-patterns file defines that this corpus needs; RE2-safe — no
#: backtracking constructs). Users extend via the ``bank`` argument.
GROK_BANK = {
    "IPV4": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "WORD": r"\w+",
    "NOTSPACE": r"[^\s]+",
    "GREEDYDATA": r".*",
    "PATH": r"/[^\s\"]*",
}

_GROK_REF = __import__("re").compile(
    r"%\{(?P<name>[A-Z0-9_]+)(?::(?P<field>[A-Za-z0-9_]+))?\}"
)


def compile_grok(template: str, bank: dict | None = None) -> str:
    """Compile a logstash-grok template (``%{PATTERN:field}`` references,
    e.g. ``'client=%{IPV4:ip} status=%{INT:status}'``) into one RE2 regex
    with named capture groups — the syntax surface of logstash-filter-grok
    (grok-patterns file + %{} expansion; cite: logstash-patterns-core).
    Unnamed references (``%{IPV4}``) become non-capturing; literal text
    between references is escaped verbatim; an unknown pattern name raises
    with the name. Nested pattern definitions (a bank value containing
    ``%{...}``) expand recursively with a depth cap."""
    import re as _re

    bank = {**GROK_BANK, **(bank or {})}

    def expand(tpl: str, depth: int, escape_literals: bool) -> str:
        # only the TOP-LEVEL template's literal text is escaped; bank
        # values are regexes themselves, so their non-%{} segments insert
        # raw (escaping would corrupt \s, +, [] inside mixed entries)
        if depth > 8:
            raise ValueError("compile_grok: pattern nesting deeper than 8")
        lit = _re.escape if escape_literals else (lambda x: x)
        out = []
        pos = 0
        for m in _GROK_REF.finditer(tpl):
            out.append(lit(tpl[pos:m.start()]))
            name, field = m.group("name"), m.group("field")
            if name not in bank:
                raise KeyError("compile_grok: unknown grok pattern %r" % name)
            body = (
                expand(bank[name], depth + 1, escape_literals=False)
                if "%{" in bank[name]
                else bank[name]
            )
            if field:
                out.append("(?P<%s>%s)" % (field, body))
            else:
                out.append("(?:%s)" % body)
            pos = m.end()
        out.append(lit(tpl[pos:]))
        return "".join(out)

    return expand(template, 0, escape_literals=True)


def make_grok(template: str, text_column: str = "text", bank: dict | None = None,
              drop_text: bool = False):
    """Grok filter: one vectorized ``pc.extract_regex`` per batch with the
    compiled template — every ``%{PATTERN:field}`` reference becomes an
    output column (null on no-match), exactly logstash-filter-grok's
    contract re-expressed columnar."""
    import re as _re

    regex = compile_grok(template, bank)
    fields = _re.findall(r"\(\?P<([A-Za-z0-9_]+)>", regex)
    if not fields:
        raise ValueError("make_grok: template captures no fields")
    if len(fields) != len(set(fields)):
        # catch at plan time — a duplicate named group only explodes later
        # inside the distributed batch fn as a cryptic ArrowInvalid
        raise ValueError(
            "make_grok: duplicate capture field(s) %s"
            % sorted({f for f in fields if fields.count(f) > 1})
        )

    def fn(batch: pa.Table) -> pa.Table:
        text = batch[text_column]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        matches = pc.extract_regex(text, regex)
        if drop_text:
            batch = batch.drop_columns([text_column])
        for f in fields:
            col = pc.struct_field(matches, f)
            if f in batch.column_names:
                batch = batch.drop_columns([f])
            batch = batch.append_column(f, col)
        return batch

    return fn
