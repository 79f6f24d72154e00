"""Geohash encoding (Gustavo Niemeyer's public geohash scheme).

lat/lon → base32 cell id: each axis is quantized to its bit budget
(longitude gets ``ceil(5p/2)`` bits, latitude ``floor(5p/2)``), the bits
interleave MSB-first starting with longitude, and 5-bit groups map through
the geohash base32 alphabet. The numpy kernel is fully vectorized — at
precision 5 it is 25 masked shift/or passes over whole arrays, no row loop.

The ``*_sql`` helpers generate the SAME arithmetic as DuckDB expressions so
driver oracles compute geohashes through an INDEPENDENT engine (the bit
interleave is spelled out as a sum of shifts, like the zonemap Morton
oracle) — a bug in the numpy kernel cannot hide in the oracle.

Float parity contract: both sides quantize with the literal expression
``floor((coord + OFFSET) / RANGE * 2^bits)`` evaluated left-to-right in
IEEE doubles — one add, one divide, one multiply, one floor; each op is
correctly rounded and deterministic in both engines, so the integer cell
indices agree exactly.

This feeds the GeoIP pipeline's lat/lon output (E5/E12): the spatial
layout/rollup step a fleet-scale enrichment job runs downstream.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _bit_budget(precision: int) -> Tuple[int, int]:
    total = 5 * precision
    return total // 2, (total + 1) // 2  # (lat_bits, lon_bits)


def geohash_encode(
    lat: np.ndarray, lon: np.ndarray, precision: int = 5
) -> np.ndarray:
    """Vectorized geohash of float64 lat/lon arrays → unicode array.

    Callers mask out nulls/NaNs first (a NaN coordinate has no cell).
    Out-of-range coordinates clamp to the edge cell, matching the SQL twin.
    """
    if precision < 1 or precision > 12:
        raise ValueError("precision must be in 1..12 (60 bits max)")
    lat_bits, lon_bits = _bit_budget(precision)
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    lon_idx = np.clip(
        np.floor((lon + 180.0) / 360.0 * float(1 << lon_bits)).astype(np.int64),
        0,
        (1 << lon_bits) - 1,
    )
    lat_idx = np.clip(
        np.floor((lat + 90.0) / 180.0 * float(1 << lat_bits)).astype(np.int64),
        0,
        (1 << lat_bits) - 1,
    )
    g = np.zeros(lat_idx.shape, dtype=np.int64)
    for k in range(5 * precision):
        if k % 2 == 0:  # even positions: longitude, MSB first
            bit = (lon_idx >> (lon_bits - 1 - k // 2)) & 1
        else:
            bit = (lat_idx >> (lat_bits - 1 - k // 2)) & 1
        g = (g << 1) | bit
    chars = np.frombuffer(GEOHASH32.encode(), dtype=np.uint8)
    cols = [
        chars[(g >> (5 * (precision - 1 - c))) & 31]
        for c in range(precision)
    ]
    packed = np.stack(cols, axis=1).astype(np.uint8)
    return np.frombuffer(packed.tobytes(), dtype="S%d" % precision).astype(
        "U%d" % precision
    )


def geohash_idx_sql(lat_col: str, lon_col: str, precision: int = 5
                    ) -> Tuple[str, str]:
    """(lat_idx_sql, lon_idx_sql) expressions over DOUBLE columns — NULL
    coordinates propagate to NULL indices. DuckDB's GREATEST/LEAST SKIP
    nulls (they return the non-null argument), so the null must be
    re-asserted with an explicit CASE around the clamp."""
    lat_bits, lon_bits = _bit_budget(precision)
    lat_idx = (
        "CASE WHEN {lat} IS NULL THEN NULL ELSE "
        "LEAST(GREATEST(CAST(floor(({lat} + 90.0) / 180.0 * {m}.0) AS BIGINT),"
        " 0), {hi}) END"
    ).format(lat=lat_col, m=1 << lat_bits, hi=(1 << lat_bits) - 1)
    lon_idx = (
        "CASE WHEN {lon} IS NULL THEN NULL ELSE "
        "LEAST(GREATEST(CAST(floor(({lon} + 180.0) / 360.0 * {m}.0) AS BIGINT),"
        " 0), {hi}) END"
    ).format(lon=lon_col, m=1 << lon_bits, hi=(1 << lon_bits) - 1)
    return lat_idx, lon_idx


def geohash_interleave_sql(lat_idx_col: str, lon_idx_col: str,
                           precision: int = 5) -> str:
    """Bit-interleave expression over the integer index columns — the sum
    of explicit shifted bits (DuckDB has no loop; the Python generator IS
    the loop, exactly like the zonemap Morton oracle)."""
    lat_bits, lon_bits = _bit_budget(precision)
    total = 5 * precision
    terms = []
    for k in range(total):
        if k % 2 == 0:
            src, shift = lon_idx_col, lon_bits - 1 - k // 2
        else:
            src, shift = lat_idx_col, lat_bits - 1 - k // 2
        terms.append("(((%s >> %d) & 1) << %d)" % (src, shift, total - 1 - k))
    return " + ".join(terms)


def geohash_chars_sql(g_col: str, precision: int = 5) -> str:
    """base32 rendering of the interleaved integer column (substr is
    1-indexed in SQL)."""
    parts = [
        "substr('%s', CAST(((%s >> %d) & 31) AS INTEGER) + 1, 1)"
        % (GEOHASH32, g_col, 5 * (precision - 1 - c))
        for c in range(precision)
    ]
    return " || ".join(parts)
