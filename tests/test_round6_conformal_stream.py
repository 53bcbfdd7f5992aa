"""Round-6: streamed conformal anomaly gate — pandas recompute of the
profile, radius, and flag counts (streaming drain == batch rollup is the
parity the oracle already proves; this pins the construction a third way).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from tests.conftest import SF_T2


def test_conformal_stream_matches_pandas(spark):
    from pyvectorsearch_spark.queries.streaming_drift import (
        CFS_ALPHA,
        CFS_CAL_FRAC,
        q_events_conformal_stream,
    )

    got = {r.event_type: r
           for r in q_events_conformal_stream(spark, SF_T2).collect()}

    ev = pd.read_parquet(f"{SF_T2}/events.parquet")
    ts_ns = ev["ts"].astype("datetime64[ns]").astype("int64")
    ev["be"] = (ts_ns // 10**9 // 3600) * 3600
    cnt = ev.groupby(["event_type", "be"]).size().reset_index(name="n")
    mn, mx = int(cnt["be"].min()), int(cnt["be"].max())
    cutoff = mn + int(math.floor(CFS_CAL_FRAC * ((mx - mn) / 3600.0))) * 3600
    cnt["hod"] = (cnt["be"] // 3600) % 24
    cal = cnt[cnt["be"] < cutoff]
    prof = cal.groupby(["event_type", "hod"])["n"].mean().round(6)
    for et in got:
        c = cal[cal["event_type"] == et]
        r = np.round(
            np.abs(c["n"].to_numpy()
                   - prof.loc[et].reindex(c["hod"]).to_numpy()), 6
        )
        n_cal = len(r)
        k = min(int(math.ceil((n_cal + 1) * (1 - CFS_ALPHA))), n_cal)
        q = float(np.sort(r)[k - 1])
        t = cnt[(cnt["event_type"] == et) & (cnt["be"] >= cutoff)]
        t = t[t["hod"].isin(prof.loc[et].index)]
        rt = np.round(
            np.abs(t["n"].to_numpy()
                   - prof.loc[et].reindex(t["hod"]).to_numpy()), 6
        )
        row = got[et]
        assert row.n_cal == n_cal
        assert row.n_test == len(t)
        assert abs(row.q_radius - round(q, 6)) < 1e-9
        assert row.n_flagged == int((rt > q).sum())
        # the gate flags a minority near alpha (the hour-of-day profile is
        # weaker than exchangeability, so slightly above 0.1 is expected)
        assert 0.0 < row.flag_rate < 0.35
