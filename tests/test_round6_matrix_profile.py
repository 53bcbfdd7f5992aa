"""Round-6: banded exact matrix profile — brute-force numpy recompute
(z-normalized Euclidean over explicit windows, no sliding-sum algebra) of
the motif and profile stats, proving the integer sliding-sum construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_T2

import pytest
pytestmark = pytest.mark.slow  # soak/property tier: excluded from the default (driver-visible) run, see pytest.ini (r11)


def test_matrix_profile_matches_numpy(spark):
    from pyvectorsearch_spark.queries.timeseries_extra import (
        MP_BAND,
        MP_W,
        q_events_matrix_profile,
    )

    got = {r.event_type: r
           for r in q_events_matrix_profile(spark, SF_T2).collect()}

    ev = pd.read_parquet(f"{SF_T2}/events.parquet")
    ts_ns = ev["ts"].astype("datetime64[ns]").astype("int64")
    ev["be"] = (ts_ns // 10**9 // 3600) * 3600
    for et, grp in ev.groupby("event_type"):
        cnt = grp.groupby("be").size()
        idx = range(int(cnt.index.min()), int(cnt.index.max()) + 3600, 3600)
        y = cnt.reindex(idx, fill_value=0).to_numpy().astype(float)
        epochs = np.array(list(idx))
        n = len(y)
        best = (np.inf, None, None)
        dists = []
        for i in range(n - MP_W + 1):
            wi = y[i : i + MP_W]
            si = wi.std()
            if si == 0:
                continue
            for d in range(MP_W, MP_BAND + 1):
                j = i + d
                if j + MP_W > n:
                    break
                wj = y[j : j + MP_W]
                sj = wj.std()
                if sj == 0:
                    continue
                corr = ((wi * wj).mean() - wi.mean() * wj.mean()) / (si * sj)
                dist = float(np.sqrt(max(0.0, 2 * MP_W * (1 - corr))))
                dists.append(dist)
                key = (round(dist, 6), epochs[i], epochs[j])
                if key < (round(best[0], 6) if best[1] is not None else np.inf,
                          best[1] or 0, best[2] or 0):
                    best = (dist, epochs[i], epochs[j])
        r = got[et]
        assert r.n_pairs == len(dists)
        assert r.motif_i_epoch == best[1]
        assert r.motif_j_epoch == best[2]
        assert abs(r.motif_dist_r - round(best[0], 6)) < 2e-6
        assert abs(r.mean_dist_r - round(float(np.mean(dists)), 6)) < 1e-5
        # a motif means the closest repeated day-shape is much nearer than
        # the average pair
        assert r.motif_dist_r < r.mean_dist_r
