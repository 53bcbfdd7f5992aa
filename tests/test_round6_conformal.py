"""Round-6: split-conformal forecast intervals — independent pandas/numpy
recompute of the radius (exact order statistic) and held-out coverage, and
the distribution-free contract: empirical coverage >= 1 - alpha - slack on
every series.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from tests.conftest import SF_T2


def test_conformal_matches_pandas(spark):
    from pyvectorsearch_spark.queries.timeseries_extra import (
        CP_ALPHA,
        CP_CAL_FRAC,
        FC_SEASON,
        q_events_conformal_forecast,
    )

    got = {r.event_type: r
           for r in q_events_conformal_forecast(spark, SF_T2).collect()}

    ev = pd.read_parquet(f"{SF_T2}/events.parquet")
    # parquet timestamps are datetime64[us]; normalize to ns before epoch
    ts_ns = ev["ts"].astype("datetime64[ns]").astype("int64")
    ev["be"] = (ts_ns // 10**9 // 3600) * 3600
    for et, grp in ev.groupby("event_type"):
        cnt = grp.groupby("be").size()
        full = cnt.reindex(
            range(int(cnt.index.min()), int(cnt.index.max()) + 3600, 3600),
            fill_value=0,
        )
        y = full.to_numpy()
        res = np.abs(y[FC_SEASON:] - y[:-FC_SEASON])
        n_all = len(res)
        n_cal = int(math.floor(CP_CAL_FRAC * n_all))
        cal, test = res[:n_cal], res[n_cal:]
        k = min(int(math.ceil((n_cal + 1) * (1 - CP_ALPHA))), n_cal)
        q = int(np.sort(cal)[k - 1])
        r = got[et]
        assert r.n_cal == n_cal
        assert r.n_test == len(test)
        assert r.q_radius == q
        assert r.n_covered == int((test <= q).sum())
        cov = float((test <= q).mean())
        assert abs(r.coverage_r - round(cov, 6)) < 1e-9
        # the conformal contract (finite-sample, so allow sampling slack)
        assert cov >= 1 - CP_ALPHA - 0.05, (et, cov)
