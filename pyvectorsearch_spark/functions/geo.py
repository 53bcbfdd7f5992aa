"""Geohash encoding as a GENERATED SQL expression shared verbatim by the
Spark plan (``F.expr``) and the DuckDB oracle — one text, one IEEE
evaluation order, so the two engines agree bit-for-bit on every boundary.

Geohash (Niemeyer 2008; public domain spec): quantize lng to ceil(5p/2)
bits and lat to floor(5p/2) bits, interleave MSB-first starting with lng,
then base32-encode 5 bits per character with the geohash alphabet
(no a/i/l/o). Pure closed-form integer arithmetic — no UDF, no loop; the
whole encoder folds into one scan-stage projection (the 100 TB shape:
geo binning is free at read time, and the cell id is an equi-join /
GROUP BY key for spatial rollups and neighbor joins).
"""

from __future__ import annotations

B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_quant_sql(lat_sql: str, lng_sql: str, precision: int = 5) -> tuple[str, str]:
    """SQL fragments quantizing (lat, lng) doubles to the geohash bit
    grids. Clamped at the top edge so lat=90 / lng=180 stay in range."""
    total = 5 * precision
    nlng = (total + 1) // 2
    nlat = total // 2
    latq = (
        f"CAST(least(floor((({lat_sql}) + 90.0) / 180.0 * {1 << nlat}), "
        f"{(1 << nlat) - 1}) AS BIGINT)"
    )
    lngq = (
        f"CAST(least(floor((({lng_sql}) + 180.0) / 360.0 * {1 << nlng}), "
        f"{(1 << nlng) - 1}) AS BIGINT)"
    )
    return latq, lngq


def geohash_interleave_sql(latq_col: str, lngq_col: str, precision: int = 5) -> str:
    """Interleave the quantized bits MSB-first (lng first) into one BIGINT.
    25 constant-folded terms at p=5 — Catalyst/DuckDB fold the powers."""
    total = 5 * precision
    nlng = (total + 1) // 2
    nlat = total // 2
    terms = []
    for i in range(total):
        if i % 2 == 0:  # even interleave slot: longitude bit
            src, bit = lngq_col, nlng - 1 - i // 2
        else:
            src, bit = latq_col, nlat - 1 - i // 2
        terms.append(
            f"(CAST(floor({src} / {1 << bit}) AS BIGINT) % 2) * {1 << (total - 1 - i)}"
        )
    return " + ".join(terms)


def geohash_chars_sql(int_col: str, precision: int = 5) -> str:
    """Base32-encode the interleaved BIGINT, 5 bits per character."""
    parts = [
        f"substr('{B32}', CAST(CAST(floor({int_col} / {32 ** (precision - 1 - j)}) "
        f"AS BIGINT) % 32 + 1 AS INT), 1)"
        for j in range(precision)
    ]
    return " || ".join(parts)


def py_geohash(lat: float, lng: float, precision: int = 5) -> str:
    """Independent pure-Python reference (classic bisection form — a
    DIFFERENT algorithm than the SQL quantize-and-interleave, so the test
    cross-check is non-circular)."""
    lat_lo, lat_hi = -90.0, 90.0
    lng_lo, lng_hi = -180.0, 180.0
    bits, out, even = 0, [], True
    n = 0
    while len(out) < precision:
        if even:
            mid = (lng_lo + lng_hi) / 2
            if lng >= mid:
                bits = (bits << 1) | 1
                lng_lo = mid
            else:
                bits <<= 1
                lng_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits = (bits << 1) | 1
                lat_lo = mid
            else:
                bits <<= 1
                lat_hi = mid
        even = not even
        n += 1
        if n == 5:
            out.append(B32[bits])
            bits, n = 0, 0
    return "".join(out)
