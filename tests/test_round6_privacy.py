"""Round-6: privacy additions — seeded Laplace DP counts and t-closeness.

Each registered query is recomputed here independently in pure
pandas/numpy from the parquet fixtures (no Spark, no DuckDB), the round-4+
three-implementations cadence.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from tests.conftest import SF_T2


def _lap_noise(key: str, b: float) -> float:
    h = int(hashlib.md5(key.encode()).hexdigest()[:12], 16)
    u = (h + 0.5) / 2**48
    p = u - 0.5
    return -b * math.copysign(1.0, p) * math.log(1.0 - 2.0 * abs(p))


def test_dp_counts_match_pandas(spark):
    from pyvectorsearch_spark.queries.audit_extra import (
        DP_EPSILON,
        q_privacy_dp_counts,
    )

    got = {r.nation: r for r in q_privacy_dp_counts(spark, SF_T2).collect()}
    cust = pd.read_parquet(f"{SF_T2}/customer.parquet")
    want = cust.groupby("c_nationkey").size()
    assert set(got) == set(want.index)
    b = 1.0 / DP_EPSILON
    for nation, n in want.items():
        noise = _lap_noise(f"dp:{nation}", b)
        assert got[nation].true_n == n
        assert abs(got[nation].noise - round(noise, 6)) < 1e-9
        assert abs(got[nation].noisy_n - round(n + noise, 6)) < 1e-9
    # the mechanism's shape: noise is centered and bounded in practice
    noises = [got[k].noise for k in got]
    assert min(noises) < 0 < max(noises)


def test_t_closeness_matches_pandas(spark):
    from pyvectorsearch_spark.queries.audit_extra import (
        TCLOSE_T,
        q_privacy_t_closeness,
    )

    got = {r.segment: r for r in q_privacy_t_closeness(spark, SF_T2).collect()}
    cust = pd.read_parquet(f"{SF_T2}/customer.parquet")
    cust["band"] = np.floor(cust["c_acctbal"] / 1000.0).astype("int64")
    bands = sorted(cust["band"].unique())
    g_frac = cust["band"].value_counts(normalize=True).reindex(bands).fillna(0)
    g_cum = g_frac.cumsum()
    for seg, grp in cust.groupby("c_mktsegment"):
        s_frac = grp["band"].value_counts(normalize=True).reindex(bands).fillna(0)
        s_cum = s_frac.cumsum()
        emd = float(np.abs(s_cum - g_cum).sum() / (len(bands) - 1))
        assert got[seg].n_rows == len(grp)
        assert abs(got[seg].emd - round(emd, 6)) < 1e-9
        assert got[seg].t_close == (emd <= TCLOSE_T)
