"""Deterministic synthetic transcript source (P1 input, BASELINE.json
``input_hint``): a Parquet table of multi-turn conversation/agent transcripts

    conv_id:string  turn_idx:int32  role:string  text:string  tool:string
    ts:timestamp[us]

A known fraction of ``text`` embeds IP tokens after grok-able markers
(``request from <tok>`` / ``client=<tok>``). The token pool is drawn from the
vendored MaxMind City test DB's real IPv4 networks (FIXTURES.md §1 generator
rules) with a Zipf-skewed distribution mimicking the reference's hot-IP
locality assumption ("IPs are often found adjacent to one another in log
files and rarely have a random distribution", geoip.rb:78), plus not-in-DB
addresses, malformed tokens, and rows with no IP at all — so every branch of
the three-state output contract occurs.

Everything is seeded → byte-identical across runs; generated once per scale
factor into a /tmp cache shared by tests, the driver's oracle comparison, and
the benchmark.

Alongside ``transcripts.parquet`` we emit ``ip_geo.parquet`` — the golden
token → (country_code2, city_name) side table for the *fixed token pool*,
computed through ``GeoIPLookup`` (itself conformance-tested against the
reference's JUnit vectors in tests/test_enrich.py). The DuckDB oracle joins
this small table instead of doing MMDB lookups, so the oracle independently
verifies the parse → join → route → aggregate pipeline while the enrichment
itself is pinned by the unit-test vectors.
"""

from __future__ import annotations

import os
import pathlib
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
GENERATOR_VERSION = "v5"  # v5: ip_geo gains isp/domain/enterprise/anonymous columns
ROWS_PER_SF = 6_000_000  # sf0.001 → 6k, sf0.01 → 60k, sf0.1 → 600k
TURNS_PER_CONV = 16
ROWS_PER_SHARD = 65_536  # one parquet part-file per shard → read parallelism
ROW_GROUP_SIZE = 16_384  # row groups small enough for block splitting

_REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
DEFAULT_CITY_DB = str(_REPO_ROOT / "tests" / "data" / "maxmind" / "GeoIP2-City-Test.mmdb")
DEFAULT_ASN_DB = str(_REPO_ROOT / "tests" / "data" / "maxmind" / "GeoLite2-ASN-Test.mmdb")
DEFAULT_ISP_DB = str(_REPO_ROOT / "tests" / "data" / "maxmind" / "GeoIP2-ISP-Test.mmdb")
DEFAULT_DOMAIN_DB = str(_REPO_ROOT / "tests" / "data" / "maxmind" / "GeoIP2-Domain-Test.mmdb")
DEFAULT_ENTERPRISE_DB = str(
    _REPO_ROOT / "tests" / "data" / "maxmind" / "GeoIP2-Enterprise-Test.mmdb"
)
DEFAULT_ANON_DB = str(
    _REPO_ROOT / "tests" / "data" / "maxmind" / "GeoIP2-Anonymous-IP-Test.mmdb"
)

ROLES = ("user", "assistant", "system", "tool")
TOOLS = ("bash", "browser", "search", "editor", "none")

#: tokens that parse but miss the DB / are malformed / never parse — mirrors
#: the RSpec failure matrix (geoip_offline_spec.rb:11-85)
MISS_TOKENS = ("0.0.0.0", "127.0.0.1", "::1")
MALFORMED_TOKENS = ("-", "N/A", "123.45.67.89,61.160.232.222")


def sf_from_dir(sf_dir: str) -> float:
    name = os.path.basename(os.path.normpath(sf_dir))
    if name.startswith("sf"):
        try:
            return float(name[2:])
        except ValueError:
            pass
    return 0.01


def _ip_pool(city_db: str, asn_db: str = DEFAULT_ASN_DB) -> List[str]:
    """Deterministic token pool: the City test DB's IPv4 networks (records
    the City projection can emit) plus the ASN test DB's networks — the
    latter give city-miss/ASN-hit rows and a small set of hot ASNs for the
    salted-aggregation path."""
    from ..state.mmdb import MMDBReader

    pool: List[str] = []
    with MMDBReader(city_db) as reader:
        for net, rec in reader.networks(ipv4_only=True):
            loc = rec.get("location") or {}
            # prefer records the City projection can emit (has coordinates)
            if loc.get("latitude") is None and loc.get("longitude") is None:
                continue
            for i in range(min(4, net.num_addresses)):
                pool.append(str(net[i]))
    with MMDBReader(asn_db) as reader:
        for net, rec in reader.networks(ipv4_only=True):
            if rec.get("autonomous_system_number") is None:
                continue
            for i in range(min(2, net.num_addresses)):
                pool.append(str(net[i]))
    # dedupe, stable order
    seen = set()
    out = []
    for ip in pool:
        if ip not in seen:
            seen.add(ip)
            out.append(ip)
    return out


def _generate_shard(
    shard_idx: int, rows: int, row0: int, pool: List[str], hit_weights, seed: int
) -> pa.Table:
    """One shard's rows, deterministic per (seed, shard_idx) — shards can be
    generated independently/chunked without holding the whole table in RAM."""
    rng = np.random.default_rng((seed, shard_idx))

    # token classes per row: 70% hit-pool, 8% miss, 6% malformed, 16% no IP
    klass = rng.choice(4, size=rows, p=[0.70, 0.08, 0.06, 0.16])
    tokens = np.empty(rows, dtype=object)
    hit_rows = klass == 0
    tokens[hit_rows] = rng.choice(np.array(pool, dtype=object), size=int(hit_rows.sum()), p=hit_weights)
    miss_rows = klass == 1
    tokens[miss_rows] = rng.choice(np.array(MISS_TOKENS, dtype=object), size=int(miss_rows.sum()))
    mal_rows = klass == 2
    tokens[mal_rows] = rng.choice(np.array(MALFORMED_TOKENS, dtype=object), size=int(mal_rows.sum()))

    template = rng.choice(3, size=rows)
    paths = rng.choice(np.array(["/api/v1/run", "/healthz", "/login", "/search"], dtype=object), size=rows)
    codes = rng.choice(np.array(["200", "404", "500", "302"], dtype=object), size=rows)

    # vectorized text assembly (object-array string concat) — no row loop;
    # periodic decorations come from tiled lookup tables, not per-row format
    text = np.empty(rows, dtype=object)
    has_tok = np.array([t is not None for t in tokens])
    lat_cycle = np.array(["latency=%dms" % (3 + i) for i in range(211)], dtype=object)
    lat_str = np.tile(lat_cycle, rows // 211 + 1)[:rows]
    ua_cycle = np.array(["ua=agent/1.%d" % i for i in range(7)], dtype=object)
    ua_str = np.tile(ua_cycle, rows // 7 + 1)[:rows]
    m = ~has_tok
    text[m] = "assistant considered the plan and wrote notes about " + paths[m]
    m = has_tok & (template == 0)
    text[m] = "request from " + tokens[m] + " via proxy path=" + paths[m]
    m = has_tok & (template == 1)
    text[m] = "client=" + tokens[m] + " status=" + codes[m] + " " + lat_str[m]
    m = has_tok & (template == 2)
    text[m] = "session opened; request from " + tokens[m] + " " + ua_str[m]

    global_idx = row0 + np.arange(rows)
    conv_idx = global_idx // TURNS_PER_CONV
    # consecutive conv ids → format each unique id once, then repeat
    c0, c1 = int(conv_idx[0]), int(conv_idx[-1])
    uniq_convs = np.array(["conv-%08d" % c for c in range(c0, c1 + 1)], dtype=object)
    conv_id = np.repeat(uniq_convs, TURNS_PER_CONV)[
        int(global_idx[0] - c0 * TURNS_PER_CONV) :
    ][:rows]
    turn_idx = (global_idx % TURNS_PER_CONV).astype(np.int32)
    role = np.array(ROLES, dtype=object)[rng.choice(len(ROLES), size=rows)]
    tool = np.array(TOOLS, dtype=object)[rng.choice(len(TOOLS), size=rows)]
    base_ts = np.int64(1_700_000_000_000_000)  # fixed epoch µs — deterministic
    ts = base_ts + global_idx.astype(np.int64) * 1_000_000 + rng.integers(0, 1000, size=rows)

    return pa.table(
        {
            "conv_id": pa.array(conv_id, type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(role, type=pa.string()),
            "text": pa.array(text, type=pa.string()),
            "tool": pa.array(tool, type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )


def generate_transcripts(
    out_dir: str,
    rows: int,
    city_db: str = DEFAULT_CITY_DB,
    seed: int = SEED,
) -> Tuple[str, str]:
    """Write transcripts/part-*.parquet + ip_geo.parquet into out_dir.

    Sharded layout: one part-file per ROWS_PER_SHARD rows — the
    100 TB-shaped layout (per-shard resume, parallel reads). Each shard is
    generated independently with a per-shard RNG stream so arbitrarily large
    inputs stream to disk without holding the table in memory."""
    pool = _ip_pool(city_db)

    # Zipf-ish weights over the hit pool (hot-IP locality)
    ranks = np.arange(1, len(pool) + 1, dtype=np.float64)
    hit_weights = 1.0 / ranks
    hit_weights /= hit_weights.sum()

    tdir = os.path.join(out_dir, "transcripts")
    os.makedirs(tdir, exist_ok=True)
    jobs = []
    shard = 0
    for off in range(0, rows, ROWS_PER_SHARD):
        jobs.append((shard, min(ROWS_PER_SHARD, rows - off), off))
        shard += 1

    if len(jobs) <= 8:
        for job in jobs:
            _write_shard(job, tdir, pool, hit_weights, seed)
    else:
        # generation is embarrassingly parallel (per-shard RNG streams)
        import concurrent.futures as cf
        import functools

        worker = functools.partial(
            _write_shard, tdir=tdir, pool=pool, hit_weights=hit_weights, seed=seed
        )
        with cf.ProcessPoolExecutor(max_workers=8) as ex:
            list(ex.map(worker, jobs, chunksize=8))

    ip_geo = os.path.join(out_dir, "ip_geo.parquet")
    _write_ip_geo(ip_geo, pool, city_db)
    return tdir, ip_geo


def _write_shard(job, tdir, pool, hit_weights, seed):
    shard, n, off = job
    part = _generate_shard(shard, n, off, pool, hit_weights, seed)
    dest = os.path.join(tdir, "part-%05d.parquet" % shard)
    pq.write_table(part, dest + ".tmp", row_group_size=ROW_GROUP_SIZE)
    os.replace(dest + ".tmp", dest)


def _write_ip_geo(path: str, pool: List[str], city_db: str,
                  asn_db: str = DEFAULT_ASN_DB) -> None:
    """Golden token→enrichment side table for the oracle (see module
    docstring): one column set per fixture database, every value computed
    through ``GeoIPLookup`` (itself pinned by the JUnit-vector unit tests).
    The DuckDB oracles join this table so the driver comparison exercises
    every database type's parse → enrich → aggregate path end-to-end."""
    from ..functions.config import GeoIPConfig
    from ..functions.fields import Field
    from ..stages.enrich import GeoIPLookup

    lookup = GeoIPLookup(GeoIPConfig(source="x", database=city_db))
    asn_lookup = GeoIPLookup(
        GeoIPConfig(source="x", database=asn_db,
                    fields=("IP", "AUTONOMOUS_SYSTEM_NUMBER",
                            "AUTONOMOUS_SYSTEM_ORGANIZATION", "NETWORK"))
    )
    isp_lookup = GeoIPLookup(GeoIPConfig(source="x", database=DEFAULT_ISP_DB))
    dom_lookup = GeoIPLookup(GeoIPConfig(source="x", database=DEFAULT_DOMAIN_DB))
    ent_lookup = GeoIPLookup(GeoIPConfig(source="x", database=DEFAULT_ENTERPRISE_DB))
    anon_lookup = GeoIPLookup(GeoIPConfig(source="x", database=DEFAULT_ANON_DB))
    all_tokens = list(pool) + list(MISS_TOKENS) + list(MALFORMED_TOKENS)
    rows = []
    for tok in all_tokens:
        ok, values = lookup.lookup(tok)
        aok, avalues = asn_lookup.lookup(tok)
        iok, ivalues = isp_lookup.lookup(tok)
        dok, dvalues = dom_lookup.lookup(tok)
        eok, evalues = ent_lookup.lookup(tok)
        nok, nvalues = anon_lookup.lookup(tok)
        rows.append(
            {
                "ip": tok,
                "country_code2": values.get(Field.COUNTRY_CODE2) if ok else None,
                "city_name": values.get(Field.CITY_NAME) if ok else None,
                "timezone": values.get(Field.TIMEZONE) if ok else None,
                "asn": avalues.get(Field.AUTONOMOUS_SYSTEM_NUMBER) if aok else None,
                "as_org": avalues.get(Field.AUTONOMOUS_SYSTEM_ORGANIZATION) if aok else None,
                "isp": ivalues.get(Field.ISP) if iok else None,
                "isp_org": ivalues.get(Field.ORGANIZATION) if iok else None,
                "domain": dvalues.get(Field.DOMAIN) if dok else None,
                "ent_country": evalues.get(Field.COUNTRY_CODE2) if eok else None,
                "ent_city": evalues.get(Field.CITY_NAME) if eok else None,
                # anonymous flags as 0/1 ints (null on miss) — integer-only
                # oracle comparisons, no bool-rendering ambiguity
                "is_anonymous": int(bool(nvalues.get(Field.ANONYMOUS))) if nok else None,
                "is_hosting": (
                    int(bool(nvalues.get(Field.HOSTING_PROVIDER))) if nok else None
                ),
            }
        )
    for lk in (lookup, asn_lookup, isp_lookup, dom_lookup, ent_lookup, anon_lookup):
        lk.close()
    tmp = path + ".tmp"
    str_cols = (
        "ip country_code2 city_name timezone as_org isp isp_org domain "
        "ent_country ent_city".split()
    )
    int_cols = ["asn", "is_anonymous", "is_hosting"]
    columns = {}
    for c in str_cols:
        columns[c] = pa.array([r[c] for r in rows], type=pa.string())
    for c in int_cols:
        columns[c] = pa.array([r[c] for r in rows], type=pa.int64())
    pq.write_table(pa.table(columns), tmp)
    os.replace(tmp, path)


def transcripts_dir(sf_dir: str, rows: Optional[int] = None) -> str:
    """Cache dir for the scale factor matching ``sf_dir``; generates on first
    use (atomic rename → concurrent callers are safe)."""
    sf = sf_from_dir(sf_dir)
    n = rows if rows is not None else max(1000, int(ROWS_PER_SF * sf))
    cache = os.path.join(
        "/tmp", "graft_transcripts", "%s_%s_n%d_s%d" % (GENERATOR_VERSION, os.path.basename(os.path.normpath(sf_dir)), n, SEED)
    )
    marker = os.path.join(cache, "_SUCCESS")
    if not os.path.exists(marker):
        generate_transcripts(cache, n)
        with open(marker + ".tmp", "w") as f:
            f.write("ok")
        os.replace(marker + ".tmp", marker)
    return cache


def transcripts_path(sf_dir: str, rows: Optional[int] = None) -> str:
    """Directory of transcript part-files (read with
    ``ray.data.read_parquet(path)`` or DuckDB ``read_parquet('path/*.parquet')``)."""
    return os.path.join(transcripts_dir(sf_dir, rows), "transcripts")


def ip_geo_path(sf_dir: str, rows: Optional[int] = None) -> str:
    return os.path.join(transcripts_dir(sf_dir, rows), "ip_geo.parquet")


def read_transcripts(sf_dir: str, rows: Optional[int] = None, **read_kwargs):
    """``ray.data.read_parquet`` over the generated transcripts."""
    import ray.data

    return ray.data.read_parquet(transcripts_path(sf_dir, rows), **read_kwargs)
