"""Round-6: banded Theil-Sen trend — pandas/numpy recompute of the median
slope and OLS comparison, plus the breakdown property that justifies the
estimator: planted outliers move OLS but not Theil-Sen.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_T2


def _banded_theilsen(y: np.ndarray, band: int) -> tuple[float, int]:
    slopes = []
    n = len(y)
    for i in range(n):
        for d in range(1, band + 1):
            j = i + d
            if j >= n:
                break
            slopes.append((y[j] - y[i]) / d)
    s = np.sort(np.array(slopes))
    m = len(s)
    lo = int(np.floor((m + 1) / 2.0)) - 1
    hi = int(np.floor((m + 2) / 2.0)) - 1
    return float((s[lo] + s[hi]) / 2.0), m


def test_theilsen_matches_pandas(spark):
    from pyvectorsearch_spark.queries.timeseries_extra import (
        TS_SEN_BAND,
        q_events_theilsen_trend,
    )

    got = {r.event_type: r
           for r in q_events_theilsen_trend(spark, SF_T2).collect()}
    ev = pd.read_parquet(f"{SF_T2}/events.parquet")
    ts_ns = ev["ts"].astype("datetime64[ns]").astype("int64")
    ev["be"] = (ts_ns // 10**9 // 3600) * 3600
    for et, grp in ev.groupby("event_type"):
        cnt = grp.groupby("be").size()
        idx = range(int(cnt.index.min()), int(cnt.index.max()) + 3600, 3600)
        y = cnt.reindex(idx, fill_value=0).to_numpy().astype(float)
        ts_slope, n_pairs = _banded_theilsen(y, TS_SEN_BAND)
        t = np.arange(len(y), dtype=float)
        n = len(y)
        ols = (n * (t * y).sum() - t.sum() * y.sum()) / (
            n * (t * t).sum() - t.sum() ** 2
        )
        r = got[et]
        assert r.n_points == n
        assert r.n_pairs == n_pairs
        assert abs(r.theilsen_slope_r - round(ts_slope, 6)) < 1e-6
        assert abs(r.ols_slope_r - round(ols, 6)) < 1e-6


def test_theilsen_breakdown_resists_outliers():
    """The point of the estimator: corrupt 10% of a clean linear series
    with huge spikes — OLS shifts by orders of magnitude more than
    Theil-Sen."""
    rng = np.random.RandomState(7)
    n, true_slope = 200, 0.5
    y = true_slope * np.arange(n) + rng.normal(0, 0.5, n)
    y_bad = y.copy()
    # asymmetric corruption (all spikes in the last quarter) gives the
    # outliers leverage — the regime where OLS visibly breaks
    bad = n - 1 - rng.choice(n // 4, 20, replace=False)
    y_bad[bad] += 500.0

    def ols(v):
        t = np.arange(n, dtype=float)
        return (n * (t * v).sum() - t.sum() * v.sum()) / (
            n * (t * t).sum() - t.sum() ** 2
        )

    ts_bad, _ = _banded_theilsen(y_bad, 50)
    assert abs(ts_bad - true_slope) < 0.1
    assert abs(ols(y_bad) - true_slope) > 1.0
