"""Logstash filter-family operators (kv / dissect / date / throttle /
translate): kernel unit tests plus DuckDB oracle rows for the five driver
queries, at sf0.001 (the sf0.01 exactness runs in tools/check_oracles.py)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from logstash_filter_geoip_ray.stages.logfilters import (
    make_dissect,
    make_kv_pairs,
    make_translate,
    parse_datetime_multi,
    parse_dissect_template,
    throttle,
)

SF = "/root/testdata/sf0.001"


# -- kernels -----------------------------------------------------------------


def test_kv_pairs_kernel():
    t = pa.table(
        {
            "rid": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "a=1 b=2 c=3",
                    "nested=k=v plain",  # value keeps everything after 1st sep
                    "no pairs at all",
                    "x=  y=z",  # empty value token from double space
                ]
            ),
        }
    )
    out = make_kv_pairs(carry_cols=["rid"])(t).to_pylist()
    by_rid = {}
    for r in out:
        by_rid.setdefault(r["rid"], []).append((r["kv_key"], r["kv_value"]))
    assert by_rid[0] == [("a", "1"), ("b", "2"), ("c", "3")]
    assert by_rid[1] == [("nested", "k=v")]
    assert 2 not in by_rid
    assert by_rid[3] == [("x", ""), ("y", "z")]


def test_dissect_kernel_semantics():
    fn = make_dissect("client=%{ip} status=%{status} latency=%{lat}ms")
    t = pa.table(
        {
            "text": pa.array(
                [
                    "client=1.2.3.4 status=200 latency=7ms",
                    # first-occurrence literal: ip stops at the FIRST " status="
                    "client=a status=x status=200 latency=9ms",
                    "client=1.2.3.4 status=200 latency=7",  # missing suffix
                    "prefix client=1.2.3.4 status=200 latency=7ms",  # bad prefix
                    None,
                ]
            )
        }
    )
    rows = fn(t).to_pylist()
    assert rows[0] == {
        "text": rows[0]["text"],
        "ip": "1.2.3.4",
        "status": "200",
        "lat": "7",
        "dissect_ok": True,
    }
    assert rows[1]["ip"] == "a" and rows[1]["status"] == "x status=200"
    assert rows[1]["lat"] == "9" and rows[1]["dissect_ok"]
    assert not rows[2]["dissect_ok"] and rows[2]["ip"] is None
    assert not rows[3]["dissect_ok"]
    assert not rows[4]["dissect_ok"] and rows[4]["ip"] is None

    # template validation
    with pytest.raises(ValueError, match="non-empty literal"):
        parse_dissect_template("%{a}%{b}")
    with pytest.raises(ValueError, match="at least one"):
        parse_dissect_template("no fields here")


def test_date_multi_first_format_wins():
    # "01/02/2020 ..." parses under BOTH formats; order must decide
    arr = pa.array(["2020-01-02 03:04:05"])
    us_first = parse_datetime_multi(
        arr, ["%Y-%m-%d %H:%M:%S", "%Y-%d-%m %H:%M:%S"]
    )
    swapped = parse_datetime_multi(
        arr, ["%Y-%d-%m %H:%M:%S", "%Y-%m-%d %H:%M:%S"]
    )
    assert us_first[0].as_py().month == 1
    assert swapped[0].as_py().month == 2
    # unparseable stays null
    assert parse_datetime_multi(pa.array(["nope"]), ["%Y"])[0].as_py() is None


def test_translate_no_default_keeps_null():
    fn = make_translate({"a": "x"}, "k", "v", default=None)
    out = fn(pa.table({"k": pa.array(["a", "b", None])})).to_pylist()
    assert [r["v"] for r in out] == ["x", None, None]


def test_cidr_classify_kernel():
    from logstash_filter_geoip_ray.stages.logfilters import make_cidr_classify

    fn = make_cidr_classify(
        [("81.2.69.0/24", "eu-lon"), ("1.0.0.0/8", "apnic")], "tok"
    )
    t = pa.table(
        {
            "tok": pa.array(
                [
                    "81.2.69.142",  # in range
                    "81.2.70.0",  # one past /24 → unmatched
                    "1.255.255.255",  # top of /8
                    "2.0.0.0",  # one past /8
                    "999.1.1.1",  # octet out of range
                    "not-an-ip",
                    "1.2.3",  # wrong shape
                    "0.0.0.0",  # valid, unmatched
                    None,  # null stays null
                ]
            )
        }
    )
    got = [r["network_class"] for r in fn(t).to_pylist()]
    assert got == [
        "eu-lon",
        "_unmatched",
        "apnic",
        "_unmatched",
        "_invalid",
        "_invalid",
        "_invalid",
        "_unmatched",
        None,
    ]
    with pytest.raises(ValueError, match="overlapping"):
        make_cidr_classify([("1.0.0.0/8", "a"), ("1.2.0.0/16", "b")], "x")
    with pytest.raises(ValueError, match="IPv4"):
        make_cidr_classify([("2a02::/32", "v6")], "x")


def test_cidr_token_classes_oracle(ray_session):
    """Engine vs DuckDB integer-range CASE at sf0.001 (sf0.01 runs in
    tools/check_oracles.py). The oracle SQL is generated from the SAME
    network list the engine compiles."""
    import os

    from __ray_entry__ import (
        _q_cidr_token_classes,
        oracle_sql,
    )

    sql = oracle_sql()["cidr_token_classes"]
    # oracle_sql() pins sf0.01 paths — swap in the sf0.001 transcripts dir
    from logstash_filter_geoip_ray.sources.transcripts import transcripts_path

    sql = sql.replace(
        transcripts_path("/root/testdata/sf0.01"), transcripts_path(SF)
    )
    n = _cmp(_q_cidr_token_classes(SF), sql)
    assert n >= 5  # all labeled classes + _invalid + _unmatched present


def test_csv_parse_kernel():
    from logstash_filter_geoip_ray.stages.logfilters import make_csv_parse

    t = pa.table(
        {
            "rid": pa.array([0, 1], pa.int64()),
            "line": pa.array(
                ['1,F,"a, ""q"" note",100', "2,O,plain,250"]
            ),
        }
    )
    fn = make_csv_parse(
        ["k", "s", "note", "cents"], {"k": pa.int64(), "cents": pa.int64()}
    )
    rows = fn(t).to_pylist()
    assert rows[0] == {
        "rid": 0, "k": 1, "s": "F", "note": 'a, "q" note', "cents": 100
    }
    assert rows[1]["note"] == "plain" and rows[1]["cents"] == 250
    # misalignment (an unquoted embedded newline splits one line into two
    # records) raises instead of silently shifting rows
    bad = pa.table({"rid": pa.array([0], pa.int64()),
                    "line": pa.array(["1,F,x,2\n9,O,y,3"])})
    with pytest.raises(ValueError, match="misalignment"):
        fn(bad)


def test_json_parse_kernel():
    from logstash_filter_geoip_ray.stages.logfilters import make_json_parse

    t = pa.table(
        {
            "rid": pa.array([0, 1, 2], pa.int64()),
            "line": pa.array(
                ['{"k": 87}', '{"k": 0, "extra": "x"}', "{}"]
            ),
        }
    )
    rows = make_json_parse()(t).to_pylist()
    assert [r["k"] for r in rows] == [87, 0, None]
    assert [r["extra"] for r in rows] == [None, "x", None]
    # explicit schema pins types and ignores undeclared keys
    sch = pa.schema([("k", pa.int64())])
    rows2 = make_json_parse(explicit_schema=sch)(t).to_pylist()
    assert [r["k"] for r in rows2] == [87, 0, None]
    assert "extra" not in rows2[0]


def test_csv_json_parse_null_and_empty_batches():
    """Null lines yield null parsed columns (filter semantics, row-aligned);
    zero-row / all-null batches keep a stable declared schema; json without
    an explicit schema raises on an unparseable-only batch."""
    from logstash_filter_geoip_ray.stages.logfilters import (
        make_csv_parse,
        make_json_parse,
    )

    fn = make_csv_parse(["k", "s"], {"k": pa.int64(), "s": pa.string()})
    t = pa.table(
        {
            "rid": pa.array([0, 1, 2], pa.int64()),
            "line": pa.array(["1,a", None, "3,c"]),
        }
    )
    rows = fn(t).to_pylist()
    assert [r["k"] for r in rows] == [1, None, 3]
    assert [r["s"] for r in rows] == ["a", None, "c"]

    empty = pa.table({"rid": pa.array([], pa.int64()), "line": pa.array([], pa.string())})
    out = fn(empty)
    assert out.num_rows == 0
    assert out.schema.field("k").type == pa.int64()
    assert out.schema.field("s").type == pa.string()

    sch = pa.schema([("k", pa.int64())])
    jf = make_json_parse(explicit_schema=sch)
    jt = pa.table(
        {"rid": pa.array([0, 1], pa.int64()),
         "line": pa.array(['{"k": 5}', None])}
    )
    jrows = jf(jt).to_pylist()
    assert [r["k"] for r in jrows] == [5, None]
    all_null = pa.table(
        {"rid": pa.array([0], pa.int64()),
         "line": pa.array([None], pa.string())}
    )
    assert jf(all_null).to_pylist()[0]["k"] is None
    with pytest.raises(ValueError, match="explicit_schema"):
        make_json_parse()(all_null)


def test_model_file_cache_invalidation(tmp_path, monkeypatch):
    """A cached artifact whose weights disagree with the constant is
    rewritten, not silently trusted."""
    import pyarrow.parquet as pq

    from logstash_filter_geoip_ray.stages import inference

    p = str(tmp_path / "model.parquet")
    pq.write_table(
        pa.table({"feature": pa.array(["bias"]),
                  "w_milli": pa.array([999], pa.int64())}),
        p,
    )
    out = inference.ensure_model_file(p)
    t = pq.read_table(out)
    w = dict(zip(t["feature"].to_pylist(), t["w_milli"].to_pylist()))
    assert w == inference.QUALITY_WEIGHTS


def test_csv_json_query_oracles(ray_session):
    from logstash_filter_geoip_ray.pipelines.data_ops import (
        q_csv_roundtrip_stats,
        q_json_field_stats,
    )

    ev = f"{SF}/events.parquet"
    od = f"{SF}/orders.parquet"
    n = _cmp(
        q_json_field_stats(SF),
        f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM read_parquet('{ev}') GROUP BY 1 ORDER BY 1
""",
    )
    assert n == 5
    n = _cmp(
        q_csv_roundtrip_stats(SF),
        f"""
SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
       CAST(sum(length('priority, "note": ' || o_orderpriority)) AS BIGINT) AS note_chars
FROM read_parquet('{od}') GROUP BY 1 ORDER BY 1
""",
    )
    assert n == 3


def test_zonemap_stats_oracle_and_pruning(ray_session):
    """Zone-map audit hash-matches the generated Morton SQL at sf0.001 AND
    actually demonstrates skipping: each single-dimension predicate must
    prune to a strict subset of populated chunks."""
    from logstash_filter_geoip_ray.pipelines.data_ops import (
        DATA_ORACLES,
        q_zonemap_stats,
    )

    sql = DATA_ORACLES["zonemap_stats"].replace(
        "FROM events", f"FROM read_parquet('{SF}/events.parquet')"
    )
    got = q_zonemap_stats(SF).to_pandas()
    import duckdb as _dd

    want = _dd.sql(sql).df()
    g = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
    w = want[sorted(want.columns)].sort_values(sorted(want.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
    n = len(got)
    assert n > 10  # normalization must spread rows across many chunks
    assert 0 < got["scan_x"].sum() < n
    assert 0 < got["scan_y"].sum() < n


def test_model_inference_stage(ray_session, tmp_path):
    """Actor-pool scoring: model artifact loads once per actor, scores are
    integer-exact vs the generated SQL oracle at sf0.001; a model file
    missing a weight fails loudly at actor construction."""
    import pyarrow.parquet as pq

    from logstash_filter_geoip_ray.pipelines.data_ops import q_model_scores
    from logstash_filter_geoip_ray.stages.inference import (
        LinearQualityScorer,
        ensure_model_file,
        quality_score_oracle_sql,
    )

    sql = quality_score_oracle_sql(
        f"read_parquet('{SF}/documents.parquet')"
    )
    n = _cmp(q_model_scores(SF), sql)
    assert n == 5  # one row per language

    # per-doc kernel sanity: empty text scores exactly the bias
    t = pa.table({"text": pa.array([""]), "lang": pa.array(["en"])})
    out = LinearQualityScorer(ensure_model_file())(t)
    assert out["score_milli"][0].as_py() == 500

    bad = tmp_path / "bad_model.parquet"
    pq.write_table(
        pa.table({"feature": pa.array(["bias"]), "w_milli": pa.array([1], pa.int64())}),
        str(bad),
    )
    with pytest.raises(ValueError, match="missing weights"):
        LinearQualityScorer(str(bad))


def test_compression_quality_vs_zlib(ray_session):
    """Engine rollup equals a direct-zlib pandas reference exactly
    (deterministic for a fixed level), and the threshold actually splits
    the corpus."""
    import zlib

    import pyarrow.parquet as pq

    from logstash_filter_geoip_ray.pipelines.data_ops import (
        q_compression_quality,
    )

    got = q_compression_quality(SF).to_pandas().sort_values("lang").reset_index(drop=True)
    src = pq.read_table(
        f"{SF}/documents.parquet", columns=["text", "lang"]
    ).to_pandas()
    src["ratio"] = [
        len(zlib.compress(t.encode(), 6)) * 1000 // len(t.encode())
        for t in src["text"]
    ]
    want = (
        src.assign(low=(src["ratio"] < 450).astype("int64"))
        .groupby("lang")
        .agg(n=("ratio", "size"), n_low=("low", "sum"), sum_ratio_milli=("ratio", "sum"))
        .reset_index()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["lang", "n", "n_low", "sum_ratio_milli"]],
        want[["lang", "n", "n_low", "sum_ratio_milli"]],
        check_dtype=False,
    )
    assert 0 < got["n_low"].sum() < got["n"].sum()  # threshold discriminates


def test_elapsed_all_statuses(ray_session):
    """All three elapsed statuses + the strictly-after tie rule on
    synthetic data (the sf corpus only exercises 'matched'), plus the
    sf0.001 oracle row."""
    import ray

    from logstash_filter_geoip_ray.stages.logfilters import elapsed

    base = 1_700_000_000_000_000
    tbl = pa.table(
        {
            "user_id": pa.array([1, 1, 2, 3, 4, 4, 5], pa.int64()),
            "ts": pa.array(
                [base, base + 5_000_000,  # u1: matched, 5s
                 base,                    # u2: start only
                 base + 1,                # u3: end only
                 base, base,              # u4: end at EXACTLY t0 → not after
                 base],                   # u5: other type, filtered out
                pa.int64(),
            ).cast(pa.timestamp("us")),
            "event_type": pa.array(
                ["signup", "purchase", "signup", "purchase",
                 "signup", "purchase", "view"]
            ),
        }
    )
    got = (
        elapsed(
            ray.data.from_arrow(tbl), "user_id", "ts", "event_type",
            start_type="signup", end_type="purchase", num_buckets=2,
        )
        .to_pandas()
        .set_index("user_id")
    )
    assert got.loc[1, "status"] == "matched"
    assert got.loc[1, "elapsed_us"] == 5_000_000
    assert got.loc[2, "status"] == "start_without_end"
    assert got.loc[3, "status"] == "end_without_start"
    assert got.loc[4, "status"] == "start_without_end"  # equal ts ≠ after
    assert 5 not in got.index

    from logstash_filter_geoip_ray.pipelines.data_ops import (
        DATA_ORACLES,
        q_elapsed_times,
    )

    sql = DATA_ORACLES["elapsed_times"].replace(
        "FROM events", f"FROM read_parquet('{SF}/events.parquet')"
    )
    _cmp(q_elapsed_times(SF), sql)


def test_throttle_vs_bruteforce(ray_session):
    import ray

    rng = np.random.default_rng(7)
    n = 500
    keys = rng.integers(0, 12, n).astype(np.int64)
    base = 1_700_000_000_000_000
    ts = base + rng.integers(0, 5 * 86_400, n).astype(np.int64) * 1_000_000
    eid = np.arange(n, dtype=np.int64)
    tbl = pa.table(
        {
            "event_id": pa.array(eid),
            "user_id": pa.array(keys),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
        }
    )
    got = (
        throttle(
            ray.data.from_arrow(tbl).repartition(4),
            "user_id",
            "ts",
            limit=2,
            period="day",
            tiebreak_col="event_id",
            num_buckets=4,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    df = pd.DataFrame({"event_id": eid, "user_id": keys, "ts": ts})
    df["win"] = df["ts"] // 86_400_000_000
    df = df.sort_values(["user_id", "win", "ts", "event_id"])
    df["rank"] = df.groupby(["user_id", "win"]).cumcount()
    want = df.sort_values("event_id")["rank"].to_numpy() < 2
    assert (got["allowed"].to_numpy() == want).all()
    assert (~want).sum() > 0  # the limit must actually bite


# -- driver-query oracle rows at sf0.001 --------------------------------------


@pytest.fixture(scope="module")
def tpath():
    from logstash_filter_geoip_ray.sources.transcripts import transcripts_path

    return transcripts_path(SF)


def _cmp(got, sql):
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = duckdb.sql(sql).df()
    g = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
    w = want[sorted(want.columns)].sort_values(sorted(want.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
    return len(g)


def test_kv_pair_stats_oracle(ray_session, tpath):
    from __ray_entry__ import _q_kv_pair_stats

    n = _cmp(
        _q_kv_pair_stats(SF),
        f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok
  FROM read_parquet('{tpath}/*.parquet')
), kv AS (
  SELECT split_part(tok, '=', 1) AS kv_key,
         substr(tok, strpos(tok, '=') + 1) AS kv_value
  FROM toks WHERE contains(tok, '=')
)
SELECT kv_key, CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT kv_value) AS BIGINT) AS n_values
FROM kv GROUP BY 1 ORDER BY 1
""",
    )
    assert n >= 4  # path/status/latency/ua/client keys exist in the corpus


def test_dissect_status_oracle(ray_session, tpath):
    from __ray_entry__ import _q_dissect_status

    pat = "^client=(.*?) status=(.*?) latency=(.*)ms$"
    n = _cmp(
        _q_dissect_status(SF),
        f"""
WITH d AS (
  SELECT regexp_extract(text, '{pat}', 1) AS ip,
         regexp_extract(text, '{pat}', 2) AS status,
         regexp_extract(text, '{pat}', 3) AS lat
  FROM read_parquet('{tpath}/*.parquet')
  WHERE regexp_matches(text, '{pat}')
)
SELECT status, CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT ip) AS BIGINT) AS n_ips,
       CAST(sum(CAST(lat AS BIGINT)) AS BIGINT) AS lat_sum
FROM d GROUP BY 1 ORDER BY 1
""",
    )
    assert n == 4  # one row per status code in the corpus


def test_multiformat_dates_oracle(ray_session, tpath):
    from __ray_entry__ import _q_multiformat_dates

    n = _cmp(
        _q_multiformat_dates(SF),
        f"""
WITH s AS (
  SELECT CASE turn_idx % 3
           WHEN 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
           WHEN 1 THEN strftime(ts, '%d/%b/%Y:%H:%M:%S')
           ELSE strftime(ts, '%Y-%m-%dT%H:%M:%S') END AS raw
  FROM read_parquet('{tpath}/*.parquet')
), p AS (
  SELECT coalesce(try_strptime(raw, '%Y-%m-%d %H:%M:%S'),
                  try_strptime(raw, '%d/%b/%Y:%H:%M:%S'),
                  try_strptime(raw, '%Y-%m-%dT%H:%M:%S')) AS pts
  FROM s
)
SELECT strftime(date_trunc('hour', pts), '%Y-%m-%d %H:00') AS hour,
       CAST(count(*) AS BIGINT) AS n
FROM p GROUP BY 1 ORDER BY 1
""",
    )
    assert n >= 2


def test_translated_throttled_oracles(ray_session):
    from logstash_filter_geoip_ray.pipelines.data_ops import (
        q_throttled_counts,
        q_translated_tiers,
    )

    ev = f"{SF}/events.parquet"
    n = _cmp(
        q_translated_tiers(SF),
        f"""
WITH m AS (
  SELECT CASE event_type
           WHEN 'view' THEN 'engagement' WHEN 'click' THEN 'engagement'
           WHEN 'purchase' THEN 'revenue' WHEN 'signup' THEN 'acquisition'
           ELSE '_other' END AS tier, event_type
  FROM read_parquet('{ev}')
)
SELECT tier, CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
FROM m GROUP BY 1 ORDER BY 1
""",
    )
    assert n == 4  # engagement merges two types; error falls to _other
    _cmp(
        q_throttled_counts(SF),
        f"""
WITH r AS (
  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         row_number() OVER (
           PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts, event_id
         ) AS rn
  FROM read_parquet('{ev}')
)
SELECT day, rn <= 3 AS allowed, CAST(count(*) AS BIGINT) AS n
FROM r GROUP BY 1, 2 ORDER BY 1, 2
""",
    )


# -- hypothesis fuzz ----------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_field_text = st.text(
    alphabet=st.characters(blacklist_characters=" =\n\r", blacklist_categories=("Cs",)),
    min_size=1,
    max_size=12,
)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(_field_text, _field_text), min_size=1, max_size=6))
def test_fuzz_dissect_roundtrip(fields):
    """Render values through a dissect template, parse back: exact
    recovery whenever values cannot collide with the literals."""
    from logstash_filter_geoip_ray.stages.logfilters import make_dissect

    template = " ".join(f"k{i}=%{{f{i}}}" for i in range(len(fields)))
    line = " ".join(f"k{i}={v}" for i, (v, _) in enumerate(fields))
    fn = make_dissect(template, text_col="text")
    row = fn(pa.table({"text": pa.array([line])})).to_pylist()[0]
    assert row["dissect_ok"]
    for i, (v, _) in enumerate(fields):
        assert row[f"f{i}"] == v


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)),
            max_size=30,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_fuzz_csv_quote_roundtrip(values):
    """Arbitrary unicode (quotes, commas, embedded newlines) survives a
    quote-escape render → C++ parse round trip, row-aligned."""
    from logstash_filter_geoip_ray.stages.logfilters import make_csv_parse

    lines = ['"%s",%d' % (v.replace('"', '""'), i) for i, v in enumerate(values)]
    fn = make_csv_parse(["v", "i"], {"v": pa.string(), "i": pa.int64()}, line_col="line")
    out = fn(pa.table({"line": pa.array(lines)})).to_pylist()
    assert len(out) == len(values)
    for i, v in enumerate(values):
        # Arrow's CSV reader yields null for a quoted empty string by
        # default ("" == empty field); normalize for comparison
        got = out[i]["v"] if out[i]["v"] is not None else ""
        assert got == v and out[i]["i"] == i


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet="ab=x ", min_size=0, max_size=20), min_size=1, max_size=5))
def test_fuzz_kv_matches_python_reference(texts):
    from logstash_filter_geoip_ray.stages.logfilters import make_kv_pairs

    out = make_kv_pairs(carry_cols=["rid"])(
        pa.table({"rid": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts)})
    ).to_pylist()
    want = []
    for rid, t in enumerate(texts):
        for tok in t.split(" "):
            if "=" in tok:
                k, _, v = tok.partition("=")
                want.append((rid, k, v))
    assert [(r["rid"], r["kv_key"], r["kv_value"]) for r in out] == want


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**32 - 1), min_size=1, max_size=40))
def test_fuzz_cidr_matches_ipaddress(ipints):
    import ipaddress

    from logstash_filter_geoip_ray.stages.logfilters import make_cidr_classify

    nets = [("10.0.0.0/8", "ten"), ("192.168.0.0/16", "rfc1918-16"),
            ("81.2.69.192/28", "tiny")]
    fn = make_cidr_classify(nets, "tok")
    toks = [str(ipaddress.ip_address(i)) for i in ipints]
    got = [r["network_class"] for r in
           fn(pa.table({"tok": pa.array(toks)})).to_pylist()]
    compiled = [(ipaddress.ip_network(c), lab) for c, lab in nets]
    for tok, g in zip(toks, got):
        addr = ipaddress.ip_address(tok)
        want = next((lab for net, lab in compiled if addr in net), "_unmatched")
        assert g == want


# -- mutate --------------------------------------------------------------------


def test_mutate_fixed_order_and_kernels():
    from logstash_filter_geoip_ray.stages.logfilters import make_mutate

    # ORDER PIN: gsub runs before lowercase no matter the argument order —
    # '[A-Z]' hits the original case; a lowercase-first engine would find
    # nothing to gsub and return 'abc'
    m = make_mutate(lowercase=["t"], gsub=[("t", "[A-Z]", "#")])
    t = pa.table({"t": ["AbC"]})
    assert m(t)["t"].to_pylist() == ["#b#"]

    # rename → gsub sees the NEW name (rename is first in MUTATE_ORDER)
    m = make_mutate(rename={"old": "t"}, gsub=[("t", "x", "y")])
    assert m(pa.table({"old": ["xx"]}))["t"].to_pylist() == ["yy"]

    # convert + replace + copy + strip + capitalize
    m = make_mutate(
        replace={"tag": "static"},
        convert={"n": "integer"},
        strip=["s"],
        capitalize=["c"],
        copy={"s": "s2"},
    )
    out = m(pa.table({"n": ["42", "7"], "s": ["  hi  ", "x"], "c": ["hello", "WORLD"]}))
    assert out["n"].to_pylist() == [42, 7]
    assert out["tag"].to_pylist() == ["static", "static"]
    assert out["s"].to_pylist() == ["hi", "x"]
    assert out["s2"].to_pylist() == ["hi", "x"]  # copy happens AFTER strip
    assert out["c"].to_pylist() == ["Hello", "World"]

    # split → list, join → string (round trip incl. consecutive separators)
    m = make_mutate(split={"t": " "})
    assert m(pa.table({"t": ["a  b", None]}))["t"].to_pylist() == [["a", "", "b"], None]
    m = make_mutate(split={"t": " "}, join={"t": " "})
    src = ["a  b c", "", None, " lead"]
    assert m(pa.table({"t": src}))["t"].to_pylist() == src

    # bad gsub regex fails at BUILD time, not per batch
    with pytest.raises(Exception):
        make_mutate(gsub=[("t", "(unclosed", "x")])


# -- useragent -------------------------------------------------------------------


def test_useragent_first_match_wins():
    from logstash_filter_geoip_ray.stages.logfilters import (
        UA_DEFAULT_BANK,
        make_useragent,
    )

    bank = tuple(UA_DEFAULT_BANK) + (
        (r"Safari/(?P<major>\d+)\.(?P<minor>\d+)", "Safari"),
    )
    ua = make_useragent("u", bank=bank)
    t = pa.table(
        {
            "u": [
                # contains BOTH Chrome and Safari tokens — Chrome is earlier
                # in the bank, so first-match-wins must pick it
                "Mozilla/5.0 AppleWebKit/537.36 Chrome/91.2.1 Safari/537.36",
                "Mozilla/5.0 Safari/604.1",
                "curl/8.1.2",
                "unclassifiable client",
                None,
            ]
        }
    )
    out = ua(t)
    assert out["ua_family"].to_pylist() == [
        "Chrome",
        "Safari",
        "curl",
        "Other",
        "Other",
    ]
    assert out["ua_major"].to_pylist() == ["91", "604", "8", None, None]
    assert out["ua_minor"].to_pylist() == ["2", "1", "1", None, None]

    # a pattern without the required named groups refuses at build time
    with pytest.raises(ValueError):
        make_useragent("u", bank=((r"Chrome/(\d+)", "Chrome"),))


# -- urldecode -------------------------------------------------------------------


def test_urldecode_kernel():
    from logstash_filter_geoip_ray.stages.logfilters import urldecode_array

    a = pa.array(
        [
            "a%20b%2Fc",      # basic escapes
            "%C3%A9t%C3%A9",  # multibyte UTF-8 (é) assembled from bytes
            "x%zz",           # invalid hex → verbatim
            "100%",           # truncated trailing % → verbatim
            "%",              # lone %
            "%%41",           # overlapping: first % invalid, second decodes
            "a+b",            # '+' untouched by default
            "",
            None,
        ]
    )
    assert urldecode_array(a).to_pylist() == [
        "a b/c",
        "été",
        "x%zz",
        "100%",
        "%",
        "%A",
        "a+b",
        "",
        None,
    ]
    assert urldecode_array(pa.array(["a+b%20c"]), plus_to_space=True).to_pylist() == [
        "a b c"
    ]
    # decoded bytes that are NOT valid UTF-8 keep the ORIGINAL text
    assert urldecode_array(pa.array(["%FF", "ok%41"])).to_pylist() == ["%FF", "okA"]
    # sliced (non-zero offset) input decodes correctly
    b = pa.array(["junk%31", "a%20b"])
    assert urldecode_array(b.slice(1)).to_pylist() == ["a b"]
    # mixed-case hex
    assert urldecode_array(pa.array(["%2f%2F"])).to_pylist() == ["//"]


# -- split (event explosion) ----------------------------------------------------


def test_split_rows_explosion():
    from logstash_filter_geoip_ray.stages.logfilters import make_split_rows

    sr = make_split_rows("t", "; ", keep_cols=["k"])
    t = pa.table({"k": [1, 2, 3, 4], "t": ["a; b; c", "solo", None, ""]})
    out = sr(t)
    assert out["k"].to_pylist() == [1, 1, 1, 2, 4]  # null row emits nothing
    assert out["part"].to_pylist() == ["a", "b", "c", "solo", ""]
    assert out["part_idx"].to_pylist() == [1, 2, 3, 1, 1]  # 1-based like SQL


# -- new driver-query oracle rows at sf0.001 -------------------------------------


def test_mutated_text_stats_oracle(ray_session, tpath):
    from __ray_entry__ import _q_mutated_text_stats

    n = _cmp(
        _q_mutated_text_stats(SF),
        f"""
WITH m AS (
  SELECT tool, trim(upper(regexp_replace(text, '\\d+', '#', 'g'))) AS norm
  FROM read_parquet('{tpath}/*.parquet')
)
SELECT tool, CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT norm) AS BIGINT) AS n_texts,
       CAST(sum(length(norm)) AS BIGINT) AS chars
FROM m GROUP BY 1 ORDER BY 1
""",
    )
    assert n >= 3  # one row per tool


def test_ua_family_counts_oracle(ray_session, tpath):
    from __ray_entry__ import _q_ua_family_counts, _UA_CHROME_PRE, _UA_FIREFOX_PRE

    got = _q_ua_family_counts(SF).to_pandas()
    # Chrome UAs all contain Safari/537.36 — the ordered bank must claim
    # them as Chrome, never Safari
    assert "Safari" not in set(got["ua_family"])
    assert set(got["ua_family"]) == {"Chrome", "curl", "python-requests", "Firefox"}
    n = _cmp(
        got,
        f"""
WITH s AS (
  SELECT CASE turn_idx % 4
    WHEN 0 THEN '{_UA_CHROME_PRE}' || (90 + turn_idx % 40) || '.0.4472.124 Safari/537.36'
    WHEN 1 THEN 'curl/8.' || (turn_idx % 10) || '.0'
    WHEN 2 THEN 'python-requests/2.' || (turn_idx % 32) || '.0'
    ELSE '{_UA_FIREFOX_PRE}' || (100 + turn_idx % 30) || '.0) Gecko/20100101 Firefox/' || (100 + turn_idx % 30) || '.0'
    END AS ua
  FROM read_parquet('{tpath}/*.parquet')
), p AS (
  SELECT CASE
    WHEN regexp_matches(ua, 'Chrome/\\d+\\.\\d+') THEN 'Chrome'
    WHEN regexp_matches(ua, 'Firefox/\\d+\\.\\d+') THEN 'Firefox'
    WHEN regexp_matches(ua, 'curl/\\d+\\.\\d+') THEN 'curl'
    WHEN regexp_matches(ua, 'python-requests/\\d+\\.\\d+') THEN 'python-requests'
    WHEN regexp_matches(ua, 'Safari/\\d+\\.\\d+') THEN 'Safari'
    ELSE 'Other' END AS ua_family, ua
  FROM s
)
SELECT ua_family,
       CASE ua_family
         WHEN 'Chrome' THEN regexp_extract(ua, 'Chrome/(\\d+)\\.', 1)
         WHEN 'Firefox' THEN regexp_extract(ua, 'Firefox/(\\d+)\\.', 1)
         WHEN 'curl' THEN regexp_extract(ua, 'curl/(\\d+)\\.', 1)
         WHEN 'python-requests' THEN regexp_extract(ua, 'python-requests/(\\d+)\\.', 1)
       END AS ua_major,
       CAST(count(*) AS BIGINT) AS n
FROM p GROUP BY 1, 2 ORDER BY 1, 2
""",
    )
    assert n >= 4


def test_decoded_path_counts_oracle(ray_session, tpath):
    from __ray_entry__ import _q_decoded_path_counts

    n = _cmp(
        _q_decoded_path_counts(SF),
        f"""
WITH p AS (
  SELECT nullif(regexp_extract(text, 'path=([^\\s"]+)', 1), '') AS path
  FROM read_parquet('{tpath}/*.parquet')
)
SELECT path, CAST(count(*) AS BIGINT) AS n
FROM p WHERE path IS NOT NULL GROUP BY 1 ORDER BY 1
""",
    )
    assert n == 4  # the four fixture paths


def test_clause_stats_oracle(ray_session, tpath):
    from __ray_entry__ import _q_clause_stats

    n = _cmp(
        _q_clause_stats(SF),
        f"""
WITH s AS (
  SELECT role, string_split(text, '; ') AS parts
  FROM read_parquet('{tpath}/*.parquet')
), e AS (
  SELECT role, unnest(parts) AS part,
         generate_subscripts(parts, 1) AS part_idx
  FROM s
)
SELECT role, CAST(part_idx AS BIGINT) AS part_idx,
       CAST(sum(length(part)) AS BIGINT) AS chars,
       CAST(count(*) AS BIGINT) AS n
FROM e GROUP BY 1, 2 ORDER BY 1, 2
""",
    )
    assert n >= 4  # clause index 2 exists only for the '; ' template rows


# -- clone --------------------------------------------------------------------


def test_clone_kernel():
    from logstash_filter_geoip_ray.stages.logfilters import make_clone

    c = make_clone(["shadow", "audit"])
    out = c(pa.table({"k": [1, 2]}))
    assert out["k"].to_pylist() == [1, 2, 1, 2, 1, 2]
    assert out["type"].to_pylist() == [None, None, "shadow", "shadow", "audit", "audit"]
    # an existing type column survives on the original, clones overwrite
    out = c(pa.table({"k": [9], "type": ["orig"]}))
    assert out["type"].to_pylist() == ["orig", "shadow", "audit"]


def test_cloned_type_counts_oracle(ray_session, tpath):
    from __ray_entry__ import _q_cloned_type_counts

    n = _cmp(
        _q_cloned_type_counts(SF),
        f"""
WITH c AS (
  SELECT '_original' AS type, tool FROM read_parquet('{tpath}/*.parquet')
  UNION ALL SELECT 'shadow', tool FROM read_parquet('{tpath}/*.parquet')
  UNION ALL SELECT 'audit', tool FROM read_parquet('{tpath}/*.parquet')
)
SELECT type, tool, CAST(count(*) AS BIGINT) AS n
FROM c GROUP BY 1, 2 ORDER BY 1, 2
""",
    )
    assert n % 3 == 0 and n >= 9  # every (tool) triple: original+2 clones


# -- syslog_pri ----------------------------------------------------------------


def test_syslog_pri_kernel():
    from logstash_filter_geoip_ray.stages.logfilters import make_syslog_pri

    sp = make_syslog_pri("pri")
    out = sp(
        pa.table({"pri": ["34", "13", "999", "x", None, "191", "0"]})
    ).to_pylist()
    assert [r["syslog_facility_code"] for r in out] == [4, 1, 1, 1, 1, 23, 0]
    assert [r["syslog_severity_code"] for r in out] == [2, 5, 5, 5, 5, 7, 0]
    assert out[0]["syslog_facility"] == "security/authorization"
    assert out[0]["syslog_severity"] == "critical"
    assert out[5]["syslog_facility"] == "local7"
    # 999 (out of RFC domain), 'x' and null all fail → default 13 + tag
    assert [r["syslog_tag"] for r in out] == [
        None, None, "_syslogpriparsefailure", "_syslogpriparsefailure",
        "_syslogpriparsefailure", None, None,
    ]
    # integer source column skips the regex but keeps the domain check
    out2 = sp(pa.table({"pri": pa.array([34, 200, None], pa.int64())})).to_pylist()
    assert [r["syslog_facility_code"] for r in out2] == [4, 1, 1]


def test_syslog_severity_counts_oracle(ray_session, tpath):
    from __ray_entry__ import _q_syslog_severity_counts

    n = _cmp(
        _q_syslog_severity_counts(SF),
        f"""
WITH p AS (
  SELECT CAST(turn_idx AS BIGINT) AS ti FROM read_parquet('{tpath}/*.parquet')
), d AS (
  SELECT CASE WHEN ti % 13 = 0 OR (ti*7+3) % 200 > 191
              THEN 13 ELSE (ti*7+3) % 200 END AS eff,
         (ti % 13 = 0 OR (ti*7+3) % 200 > 191) AS failed
  FROM p
)
SELECT (['kernel', 'user-level', 'mail', 'daemon', 'security/authorization',
         'syslogd', 'line printer', 'network news', 'uucp', 'clock',
         'security/authorization', 'ftp', 'ntp', 'log audit', 'log alert',
         'clock', 'local0', 'local1', 'local2', 'local3', 'local4', 'local5',
         'local6', 'local7'])[CAST(eff // 8 AS INT) + 1] AS syslog_facility,
       (['emergency', 'alert', 'critical', 'error', 'warning', 'notice',
         'informational', 'debug'])[CAST(eff % 8 AS INT) + 1] AS syslog_severity,
       failed,
       CAST(count(*) AS BIGINT) AS n
FROM d GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
""",
    )
    assert n >= 10  # several (facility, severity) cells + the failed=true row


# -- range ---------------------------------------------------------------------


def test_range_tag_kernel():
    from logstash_filter_geoip_ray.stages.logfilters import make_range_tag

    rt = make_range_tag([("v", 0, 10, "small"), ("v", 5, 100, "mid")])
    out = rt(pa.table({"v": [3.0, 7.0, 50.0, None, -1.0]}))
    assert out["range_tags"].to_pylist() == [
        ["small"], ["small", "mid"], ["mid"], [], []
    ]
    # negate fires OUTSIDE the range; nulls still never fire
    rn = make_range_tag([("v", 0, 10, "out")], negate=True)
    out2 = rn(pa.table({"v": [3.0, 50.0, None]}))
    assert out2["range_tags"].to_pylist() == [[], ["out"], []]


def test_range_violation_counts_oracle(ray_session):
    from __ray_entry__ import _q_range_violation_counts

    n = _cmp(
        _q_range_violation_counts(SF),
        f"""
WITH d AS (SELECT lang, n_chars FROM read_parquet('{SF}/documents.parquet')),
f AS (
  SELECT 'short' AS tag, lang FROM d WHERE n_chars BETWEEN 0 AND 200
  UNION ALL SELECT 'mid', lang FROM d WHERE n_chars BETWEEN 150 AND 800
  UNION ALL SELECT 'long', lang FROM d WHERE n_chars BETWEEN 500 AND 1000000000
)
SELECT tag, lang, CAST(count(*) AS BIGINT) AS n
FROM f GROUP BY 1, 2 ORDER BY 1, 2
""",
    )
    assert n >= 3


# -- tld -----------------------------------------------------------------------


def test_tld_kernel():
    from logstash_filter_geoip_ray.stages.logfilters import make_tld

    td = make_tld("h")
    out = td(
        pa.table(
            {
                "h": [
                    "www.example.co.uk",
                    "api.github.io",
                    "example.com",
                    "localhost",
                    None,
                    "a.b.c.example.com",
                    "co.uk",  # a bare public suffix: no registrable domain
                ]
            }
        )
    ).to_pylist()
    got = [(r["tld"], r["sld"], r["domain"], r["subdomain"]) for r in out]
    assert got == [
        ("co.uk", "example", "example.co.uk", "www"),
        ("github.io", "api", "api.github.io", None),
        ("com", "example", "example.com", None),
        ("localhost", None, None, None),
        (None, None, None, None),
        ("com", "example", "example.com", "a.b.c"),
        ("co.uk", None, None, None),
    ]


def test_domain_tld_counts_oracle(ray_session, tpath):
    from __ray_entry__ import _q_domain_tld_counts, oracle_sql

    sql = oracle_sql()["domain_tld_counts"].replace(
        "/tmp/graft_transcripts/v5_sf0.01_n60000_s42/transcripts", tpath
    )
    n = _cmp(_q_domain_tld_counts(SF), sql)
    assert n >= 12  # bases × suffixes × with/without www, collapsed by turn range


# -- prune / de_dot / truncate ---------------------------------------------------


def test_prune_de_dot_kernels():
    from logstash_filter_geoip_ray.stages.logfilters import make_de_dot, make_prune

    t = pa.table({"event.role": ["a"], "event.tool": ["b"], "msg.text": ["x"], "conv_id": ["c"]})
    dd = make_de_dot()(t)
    assert dd.column_names == ["event_role", "event_tool", "msg_text", "conv_id"]
    pr = make_prune(whitelist=[r"^event_", r"^msg_text$"])(dd)
    assert pr.column_names == ["event_role", "event_tool", "msg_text"]
    # blacklist mode; whitelist wins when both are given
    bl = make_prune(blacklist=[r"^conv"])(dd)
    assert bl.column_names == ["event_role", "event_tool", "msg_text"]
    both = make_prune(whitelist=[r"^conv"], blacklist=[r"^conv"])(dd)
    assert both.column_names == ["conv_id"]
    with pytest.raises(ValueError, match="whitelist or a blacklist"):
        make_prune()
    # de_dot rename collision fails loudly instead of silently merging
    with pytest.raises(ValueError, match="collision"):
        make_de_dot()(pa.table({"a.b": [1], "a_b": [2]}))


def test_truncate_bytes_kernel():
    from logstash_filter_geoip_ray.stages.logfilters import make_truncate_bytes

    tr = make_truncate_bytes(["s"], 5)
    out = tr(pa.table({"s": ["hello world", "héllo", "ab", None, "ééé", "a€€"]}))
    # bytes: héllo=6 → 'héll'(5); ééé=6 → 'éé'(4, mid-é dropped); a€€=7 → 'a€'(4)
    assert out["s"].to_pylist() == ["hello", "héll", "ab", None, "éé", "a€"]
    # exact-fit multibyte boundary survives; mid-char never splits
    tr4 = make_truncate_bytes(["s"], 4)
    assert tr4(pa.table({"s": ["a€€x", "aéxq", "€€"]}))["s"].to_pylist() == [
        "a€", "aéx", "€"
    ]
    # fast path: an untouched batch keeps the original array (zero-copy)
    t = pa.table({"s": ["ab", "cd"]})
    assert tr(t)["s"].to_pylist() == ["ab", "cd"]
    with pytest.raises(ValueError, match=">= 4"):
        make_truncate_bytes(["s"], 2)


def test_shaped_turns_oracle(ray_session, tpath):
    from __ray_entry__ import _q_shaped_turns

    n = _cmp(
        _q_shaped_turns(SF),
        f"""
SELECT role AS event_role,
       coalesce(tool, '_none') AS event_tool,
       CAST(sum(length(substr(text, 1, 40))) AS BIGINT) AS chars,
       CAST(count(*) AS BIGINT) AS n
FROM read_parquet('{tpath}/*.parquet')
GROUP BY 1, 2 ORDER BY 1, 2
""",
    )
    assert n >= 5


# -- extractnumbers -------------------------------------------------------------


def test_extractnumbers_kernel():
    from logstash_filter_geoip_ray.stages.logfilters import make_extractnumbers

    fn = make_extractnumbers("text", keep_cols=["rid"])
    t = pa.table(
        {
            "rid": pa.array([0, 1, 2, 3], pa.int64()),
            "text": [
                "client=::1 status=500 latency=3.5ms",
                "no numbers here",
                "ip 1.2.3.4 port -8080 rate 1e3",  # IP rejected WHOLE
                None,
            ],
        }
    )
    rows = [(r["rid"], r["num"], r["num_idx"], r["is_int"]) for r in fn(t).to_pylist()]
    assert rows == [
        (0, "1", 1, True),       # the ::1 tail digit is a valid int token
        (0, "500", 2, True),
        (0, "3.5", 3, False),
        (2, "-8080", 1, True),   # 1.2.3.4 fully rejected, not re-segmented
        (2, "1e3", 2, False),
    ]


def test_extracted_number_stats_oracle(ray_session, tpath):
    from __ray_entry__ import _q_extracted_number_stats, oracle_sql

    sql = oracle_sql()["extracted_number_stats"].replace(
        "/tmp/graft_transcripts/v5_sf0.01_n60000_s42/transcripts", tpath
    )
    n = _cmp(_q_extracted_number_stats(SF), sql)
    assert n >= 5


def test_aggregate_tasks_semantics(ray_session):
    """Aggregate-filter task correlation: end before start ignored, end
    after map expiry ignored (→ timeout flush), keys with no start emit
    nothing, null keys dropped, and the window sum counts every in-window
    event of the task regardless of type."""
    import ray.data

    from logstash_filter_geoip_ray.stages.logfilters import aggregate_tasks

    base = 1_700_000_000_000_000
    tbl = pa.table(
        {
            "user_id": pa.array(
                [1, 1, 1, 1,      # u1: completed; pre-start end ignored
                 2, 2,            # u2: end AFTER expiry → timeout
                 3,               # u3: end only → no map, no row
                 None],           # null key dropped
                pa.int64(),
            ),
            "ts": pa.array(
                [base - 5, base, base + 3, base + 10,
                 base, base + 200,
                 base,
                 base],
                pa.int64(),
            ).cast(pa.timestamp("us")),
            "event_type": pa.array(
                ["purchase", "signup", "view", "purchase",
                 "signup", "purchase",
                 "purchase",
                 "signup"]
            ),
            "value": pa.array(
                [9.0, 1.0, 2.0, 3.0, 1.0, 9.0, 9.0, 9.0], pa.float64()
            ),
        }
    )
    got = (
        aggregate_tasks(
            ray.data.from_arrow(tbl), "user_id", "ts", "event_type",
            start_type="signup", end_type="purchase",
            value_col="value", timeout_us=100, num_buckets=2,
        )
        .to_pandas()
        .set_index("user_id")
    )
    assert list(got.index) == [1, 2]
    # u1: window [base, base+10]; pre-start purchase at base-5 excluded
    assert got.loc[1, "status"] == "completed"
    assert got.loc[1, "t1"] == base + 10
    assert got.loc[1, "n_events"] == 3          # signup, view, purchase
    assert got.loc[1, "sum_value_milli"] == 6000  # 1+2+3
    # u2: purchase lands 200µs after start, past the 100µs expiry
    assert got.loc[2, "status"] == "timeout"
    assert pd.isna(got.loc[2, "t1"])
    assert got.loc[2, "n_events"] == 1           # only the signup in-window
    assert got.loc[2, "sum_value_milli"] == 1000

    from logstash_filter_geoip_ray.pipelines.data_ops import (
        DATA_ORACLES,
        q_aggregated_tasks,
    )

    sql = DATA_ORACLES["aggregated_tasks"].replace(
        "FROM events", f"FROM read_parquet('{SF}/events.parquet')"
    )
    _cmp(q_aggregated_tasks(SF), sql)


def test_xml_parse_kernel():
    """Entity unescape, attribute + element extraction, multi-root /
    empty / raw-text failure isolation on BOTH the marker-envelope path
    and the per-row fallback path."""
    from logstash_filter_geoip_ray.stages.logfilters import (
        make_xml_parse,
        xml_escape_array,
    )

    p = make_xml_parse("x", {"id": "@id", "st": "st", "note": "note"})
    # optimistic path: envelope parses, malformed rows isolated by marker
    t = pa.table(
        {
            "x": [
                '<o id="1"><st>A</st><note>a &amp; b &lt;tag&gt;</note></o>',
                "<a/><b/>",  # multi-root → fail, alignment preserved
                "",          # empty → fail
                '<o id="2"><st>B</st></o>',  # missing note → null extract
            ]
        }
    )
    r = p(t)
    assert r["id"].to_pylist() == ["1", None, None, "2"]
    assert r["note"].to_pylist() == ["a & b <tag>", None, None, None]
    assert r["xml_ok"].to_pylist() == [True, False, False, True]
    # pessimistic path: raw text breaks the envelope; good rows survive
    t2 = pa.table({"x": ["not xml & raw", '<o id="3"><st>C</st></o>', None]})
    r2 = p(t2)
    assert r2["id"].to_pylist() == [None, "3", None]
    assert r2["xml_ok"].to_pylist() == [False, True, False]
    assert xml_escape_array(pa.array(['a & "b" <x>'])).to_pylist() == [
        'a &amp; "b" &lt;x&gt;'
    ]


def test_xml_order_stats_oracle(ray_session):
    from logstash_filter_geoip_ray.pipelines.data_ops import (
        DATA_ORACLES,
        q_xml_order_stats,
    )

    sql = DATA_ORACLES["xml_order_stats"].replace(
        "FROM orders", f"FROM read_parquet('{SF}/orders.parquet')"
    )
    assert _cmp(q_xml_order_stats(SF), sql) == 3


def test_transliterate_kernel_mark_categories():
    """utf8proc-STRIPMARK parity across every mark class: Latin Mn,
    stacked Vietnamese marks, Devanagari Mc, enclosing Me, katakana
    voicing — plus non-Latin letters, ligatures and ß which must survive
    (strip_accents does NOT casefold or compatibility-decompose)."""
    from logstash_filter_geoip_ray.stages.logfilters import (
        transliterate_array,
    )

    got = transliterate_array(
        pa.array(
            ["café", "Dvořák", "ệ", "कि", "a⃐", "ド", "ß", "ﬁ", "北京",
             None, "", "naïve Ñoño"]
        )
    ).to_pylist()
    assert got == ["cafe", "Dvorak", "e", "क", "a", "ト", "ß", "ﬁ",
                   "北京", None, "", "naive Nono"]


def test_xml_parse_injection_and_tail_junk():
    """A row containing the literal marker markup must fail alone (never
    misalign its neighbors), and trailing top-level junk is rejected
    identically on the envelope and fallback paths."""
    from logstash_filter_geoip_ray.stages.logfilters import make_xml_parse

    p = make_xml_parse("x", {"id": "@id"})
    # marker injection: envelope parses but marker count exceeds rows →
    # per-row isolation; the injected row fails, its neighbor survives
    r = p(pa.table({"x": ['<a/></__r__><__r__><o id="9"/>', '<o id="1"/>']}))
    assert r["id"].to_pylist() == [None, "1"]
    assert r["xml_ok"].to_pylist() == [False, True]
    # tail junk after the root element: rejected on the envelope path...
    r2 = p(pa.table({"x": ['<o id="7"/>junk', '<o id="2"/>']}))
    assert r2["xml_ok"].to_pylist() == [False, True]
    # ...and identically when a neighbor forces the per-row fallback
    r3 = p(pa.table({"x": ['<o id="7"/>junk', "raw & broken"]}))
    assert r3["xml_ok"].to_pylist() == [False, False]


def test_aggregate_tasks_null_type_and_null_values(ray_session):
    """Null event_type is neither start nor end but still counts inside
    the window; null values skip like SQL SUM; an all-null window sums to
    null."""
    import ray.data

    from logstash_filter_geoip_ray.stages.logfilters import aggregate_tasks

    tbl = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "ts": pa.array([0, 1, 2, 0, 1], pa.int64()).cast(
                pa.timestamp("us")
            ),
            "et": pa.array(["start", None, "end", "start", None]),
            "v": pa.array([None, 5.0, None, None, None], pa.float64()),
        }
    )
    got = (
        aggregate_tasks(
            ray.data.from_arrow(tbl), "k", "ts", "et",
            start_type="start", end_type="end",
            value_col="v", timeout_us=10, num_buckets=2,
        )
        .to_pandas()
        .set_index("k")
    )
    # k=1: null-type event at ts=1 is in-window and counted; only its
    # value is non-null → sum 5000
    assert got.loc[1, "status"] == "completed"
    assert got.loc[1, "n_events"] == 3
    assert got.loc[1, "sum_value_milli"] == 5000
    # k=2: timeout, both in-window values null → SQL SUM semantics: null
    assert got.loc[2, "status"] == "timeout"
    assert got.loc[2, "n_events"] == 2
    assert pd.isna(got.loc[2, "sum_value_milli"])


def test_fingerprint_hmac_and_methods():
    """HMAC-SHA256 keyed digests differ from unkeyed; null values
    serialize as empty; unsupported method raises."""
    import hashlib
    import hmac

    import pyarrow as pa
    import pytest

    from logstash_filter_geoip_ray.stages.logfilters import make_fingerprint

    batch = pa.table(
        {
            "a": pa.array([1, None], type=pa.int64()),
            "b": pa.array(["x", "y"], type=pa.string()),
        }
    )
    plain = make_fingerprint(["a", "b"])(batch)["fingerprint"].to_pylist()
    assert plain[0] == hashlib.sha256(b"a=1|b=x").hexdigest()
    assert plain[1] == hashlib.sha256(b"a=|b=y").hexdigest()
    keyed = make_fingerprint(["a", "b"], key="s3cr3t")(batch)[
        "fingerprint"
    ].to_pylist()
    assert keyed[0] == hmac.new(b"s3cr3t", b"a=1|b=x", hashlib.sha256).hexdigest()
    assert keyed != plain
    md5 = make_fingerprint(["b"], method="MD5")(batch)["fingerprint"].to_pylist()
    assert md5[0] == hashlib.md5(b"b=x").hexdigest()
    with pytest.raises(ValueError, match="unsupported method"):
        make_fingerprint(["a"], method="CRC32")


def test_grok_compiler_and_filter():
    """%{PATTERN:field} expansion: literal escaping, unnamed refs,
    nested bank entries, unknown-name raise, end-to-end extraction."""
    import pyarrow as pa
    import pytest

    from logstash_filter_geoip_ray.stages.parse import compile_grok, make_grok

    rx = compile_grok("client=%{IPV4:ip} status=%{INT:status}")
    assert "(?P<ip>" in rx and "(?P<status>" in rx
    # literal regex metacharacters between refs must be escaped
    rx2 = compile_grok("a.b%{INT:n}")
    assert rx2.startswith("a\\.b")
    # unnamed reference: non-capturing
    assert "(?P<" not in compile_grok("x %{IPV4} y")
    with pytest.raises(KeyError, match="NOPE"):
        compile_grok("%{NOPE:x}")
    # nested bank entry expands recursively
    nested = compile_grok(
        "%{HOSTPORT:hp}", bank={"HOSTPORT": r"%{NOTSPACE}:%{INT}"}
    )
    assert "(?P<hp>" in nested
    # bank values are regexes: literal segments between refs must insert
    # RAW (e.g. \s+), only the top-level template escapes
    import re as _re

    mixed = compile_grok("%{HP:hp}", bank={"HP": r"%{WORD}\s+%{INT}"})
    assert _re.fullmatch(mixed, "abc   42")
    with pytest.raises(ValueError, match="duplicate capture"):
        make_grok("%{INT:n} %{INT:n}")
    with pytest.raises(ValueError, match="nesting"):
        compile_grok("%{A:x}", bank={"A": "%{A}"})

    batch = pa.table(
        {
            "text": [
                "client=1.2.3.4 status=200 tail",
                "no match here",
                "client=9.8.7.6 status=404",
            ]
        }
    )
    out = make_grok("client=%{IPV4:ip} status=%{INT:status}")(batch)
    assert out["ip"].to_pylist() == ["1.2.3.4", None, "9.8.7.6"]
    assert out["status"].to_pylist() == ["200", None, "404"]
    with pytest.raises(ValueError, match="captures no fields"):
        make_grok("%{IPV4} only")
