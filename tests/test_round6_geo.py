"""Round-6: geohash encoder — generated-SQL quantize/interleave/base32 vs
the classic bisection algorithm (a different construction), plus the
published test vector and the registered rollup recomputed from parquet.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from pyvectorsearch_spark.functions.geo import py_geohash
from tests.conftest import SF_T2


def test_known_vector():
    # the canonical geohash test point (Ålborg lighthouse, wikipedia):
    assert py_geohash(57.64911, 10.40744, 11) == "u4pruydqqvj"
    assert py_geohash(57.64911, 10.40744, 5) == "u4pru"


# Coordinates are generated AWAY from cell boundaries BY CONSTRUCTION
# (round 9, VERDICT r8): v = (k + frac) * cell_width - lo with frac in
# [0.05, 0.95] at the finest grid (20 bits — p <= 8 quantizes at <= 20
# bits per axis). At any coarser level m bits below 20, the quantize
# input is (k + frac) / 2^(20-m), whose distance to the nearest integer
# is >= min(frac, 1-frac) / 2^(20-m) — boundary-adjacent only when
# k mod 2^(20-m) lands on the edge values, probability ~2^-17 at the
# worst level. The old strategy drew uniform floats and `assume`d away
# boundary hits, which rejected most of hypothesis's boundary-heavy
# corpus and tripped the filter_too_much health check under unlucky
# seeds (VERDICT r8 reproduced it seed-specifically).
_FINE_BITS = 20


def _off_boundary(lo: float, span: float):
    cell = span / (1 << _FINE_BITS)
    return st.tuples(
        st.integers(min_value=0, max_value=(1 << _FINE_BITS) - 1),
        st.floats(min_value=0.05, max_value=0.95),
    ).map(lambda t: (t[0] + t[1]) * cell - lo)


@settings(max_examples=200, deadline=None)
@given(
    lat=_off_boundary(90.0, 180.0),
    lng=_off_boundary(180.0, 360.0),
    p=st.integers(min_value=1, max_value=8),
)
def test_sql_form_equals_bisection(lat, lng, p):
    """The SQL closed form (quantize + interleave + base32) must agree with
    the bisection reference for any coordinate NOT sitting within an ulp
    of a cell boundary (there the two constructions may legitimately
    round opposite ways — e.g. lng = -2e-313 is west of the meridian to
    the bisection but 180+lng == 180.0 exactly to the closed form);
    evaluated via DuckDB so the check exercises the exact SQL text the
    oracle uses. The boundary-ulp exclusion is retained as a cheap guard
    but the strategy no longer relies on it (see ``_off_boundary``)."""
    import duckdb
    from hypothesis import assume

    total = 5 * p
    nlng, nlat = (total + 1) // 2, total // 2
    for v, lo, span, nbits in ((lat, 90.0, 180.0, nlat), (lng, 180.0, 360.0, nlng)):
        x = (v + lo) / span * (1 << nbits)
        assume(abs(x - round(x)) > 1e-6)

    from pyvectorsearch_spark.functions.geo import (
        geohash_chars_sql,
        geohash_interleave_sql,
        geohash_quant_sql,
    )

    # CAST the literals: DuckDB types long decimal literals as DECIMAL and
    # the +180.0 then overflows the inferred scale
    latq, lngq = geohash_quant_sql(
        f"CAST({lat!r} AS DOUBLE)", f"CAST({lng!r} AS DOUBLE)", p
    )
    ghi = geohash_interleave_sql("latq", "lngq", p)
    sql = (
        f"WITH q AS (SELECT {latq} AS latq, {lngq} AS lngq), "
        f"i AS (SELECT {ghi} AS ghi FROM q) "
        f"SELECT {geohash_chars_sql('ghi', p)} FROM i"
    )
    got = duckdb.sql(sql).fetchone()[0]
    assert got == py_geohash(lat, lng, p)


def test_geohash_agg_matches_pandas(spark):
    from pyvectorsearch_spark.queries.spatial_extra import (
        GEOHASH_P,
        q_spatial_geohash_agg,
    )

    got = {r.cell: r for r in q_spatial_geohash_agg(spark, SF_T2).collect()}
    emb = pd.read_parquet(f"{SF_T2}/embeddings.parquet")
    lat = emb["embedding"].str[1].astype("float64") * 90.0
    lng = emb["embedding"].str[0].astype("float64") * 180.0
    cells = [py_geohash(a, o, GEOHASH_P) for a, o in zip(lat, lng)]
    df = pd.DataFrame({"cell": cells, "lat": lat, "lng": lng})
    want = df.groupby("cell").agg(n=("cell", "size"), lat_c=("lat", "mean"),
                                  lng_c=("lng", "mean"))
    assert set(got) == set(want.index)
    for cell, row in want.iterrows():
        assert got[cell].n_points == row["n"]
        assert abs(got[cell].lat_c - round(row["lat_c"], 6)) < 1e-6
        assert abs(got[cell].lng_c - round(row["lng_c"], 6)) < 1e-6
