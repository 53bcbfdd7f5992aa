"""Round-6: IPF raking — numpy recompute of the alternating-scaling fit on
the contingency table, plus the convergence contract: after the final lang
scaling the lang margins are EXACTLY uniform, and the source margins are
within the one-half-round residual.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_T2


def test_raking_matches_numpy(spark):
    from pyvectorsearch_spark.queries.sampling_extra import (
        IPF_ROUNDS,
        q_sample_raking_weights,
    )

    got = {(r.source, r.lang): r
           for r in q_sample_raking_weights(spark, SF_T2).collect()}

    docs = pd.read_parquet(f"{SF_T2}/documents.parquet")
    tab = docs.groupby(["source", "lang"]).size().unstack(fill_value=0)
    W = tab.to_numpy().astype(float)
    total = W.sum()
    t_src = total / W.shape[0]
    t_lang = total / W.shape[1]
    for _ in range(IPF_ROUNDS):
        W = W * (t_src / W.sum(axis=1))[:, None]
        W = W * (t_lang / W.sum(axis=0))[None, :]

    for (src, lang), r in got.items():
        i = tab.index.get_loc(src)
        j = tab.columns.get_loc(lang)
        n = tab.iloc[i, j]
        assert r.n == n
        assert abs(r.cell_mass_r - round(float(W[i, j]), 6)) < 1e-5
        assert abs(r.doc_weight_r - round(float(W[i, j]) / n, 6)) < 1e-5

    # convergence: lang margins exactly uniform (last scaling), source
    # margins within the half-round residual
    lang_shares = W.sum(axis=0) / total
    assert np.allclose(lang_shares, 1.0 / W.shape[1], atol=1e-12)
    src_shares = W.sum(axis=1) / total
    assert np.abs(src_shares - 1.0 / W.shape[0]).max() < 0.01
    # and the fit actually moved mass: raw shares were NOT uniform
    raw_lang = tab.sum(axis=0).to_numpy() / total
    assert np.abs(raw_lang - 1.0 / W.shape[1]).max() > 0.05


def test_woe_iv_matches_pandas(spark):
    """WOE/IV recompute: rank-decile bins, smoothed shares, total IV."""
    import math

    from pyvectorsearch_spark.queries.quality_wave3 import (
        WOE_BINS,
        WOE_SMOOTH,
        q_feature_woe_iv,
    )

    got = {r.bin: r for r in q_feature_woe_iv(spark, SF_T2).collect()}
    o = pd.read_parquet(f"{SF_T2}/orders.parquet")
    o = o.sort_values(["o_totalprice", "o_orderkey"]).reset_index(drop=True)
    n = len(o)
    o["bin"] = (o.index * WOE_BINS) // n
    o["bad"] = (o["o_orderstatus"] == "F").astype(int)
    g = o.groupby("bin").agg(
        n=("bad", "size"), n_bad=("bad", "sum"),
        lo=("o_totalprice", "min"), hi=("o_totalprice", "max"),
    )
    tb, tg = int(g["n_bad"].sum()), int((g["n"] - g["n_bad"]).sum())
    k = WOE_BINS * WOE_SMOOTH
    iv = 0.0
    woes = {}
    for b, row in g.iterrows():
        bs = (row["n_bad"] + WOE_SMOOTH) / (tb + k)
        gs = (row["n"] - row["n_bad"] + WOE_SMOOTH) / (tg + k)
        woes[b] = math.log(bs / gs)
        iv += (bs - gs) * woes[b]
    for b, row in g.iterrows():
        r = got[b]
        assert r.n == row["n"]
        assert r.n_bad == row["n_bad"]
        assert abs(r.woe_r - round(woes[b], 6)) < 1e-9
        assert abs(r.iv_total - round(iv, 6)) < 1e-9
        assert abs(r.bin_lo - round(row["lo"], 2)) < 1e-9
    # the synthetic price is label-independent: IV must say "no signal"
    assert got[0].iv_total < 0.02
