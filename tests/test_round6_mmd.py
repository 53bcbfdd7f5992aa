"""Round-6: RFF-MMD drift test — numpy recompute of the linear-time MMD
estimator and the power property (planted shift dominates the null by an
order of magnitude).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_T2

import pytest
pytestmark = pytest.mark.slow  # soak/property tier: excluded from the default (driver-visible) run, see pytest.ini (r11)


def test_mmd_matches_numpy(spark):
    from pyvectorsearch_spark.queries.embedding_extra import (
        MMD_D,
        MMD_SHIFT,
        _mmd_rff_params,
        q_embedding_mmd_drift,
    )

    [row] = q_embedding_mmd_drift(spark, SF_T2).collect()
    emb = pd.read_parquet(f"{SF_T2}/embeddings.parquet")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    ws, bs = _mmd_rff_params()
    W = np.array(ws)  # (D, dim)
    B = np.array(bs)
    Z = np.cos(X @ W.T + B)  # (n, D)
    even, odd = Z[ids % 2 == 0], Z[ids % 2 == 1]
    Xs = X[ids % 2 == 1].copy()
    Xs[:, 0] += MMD_SHIFT
    odd_s = np.cos(Xs @ W.T + B)

    def mmd2(a, b):
        d = a.mean(axis=0) - b.mean(axis=0)
        return float((d * d).sum() * (2.0 / MMD_D))

    null, shift = mmd2(even, odd), mmd2(even, odd_s)
    assert row.n_x == len(even) and row.n_y == len(odd)
    assert abs(row.mmd2_null_r - round(null, 6)) < 1e-5
    assert abs(row.mmd2_shift_r - round(shift, 6)) < 1e-5
    # power: the planted shift dominates the same-distribution null
    assert shift > 10 * null


def test_mmd_by_source_matches_numpy(spark):
    from pyvectorsearch_spark.queries.embedding_extra import (
        MMD_D,
        _mmd_rff_params,
        q_embedding_mmd_by_source,
    )

    got = {r.source: r for r in q_embedding_mmd_by_source(spark, SF_T2).collect()}
    emb = pd.read_parquet(f"{SF_T2}/embeddings.parquet")
    docs = pd.read_parquet(f"{SF_T2}/documents.parquet")[["doc_id", "source"]]
    m = emb.merge(docs, left_on="vec_id", right_on="doc_id")
    X = np.stack(m["embedding"].to_numpy()).astype(np.float64)
    ws, bs = _mmd_rff_params()
    Z = np.cos(X @ np.array(ws).T + np.array(bs))
    src = m["source"].to_numpy()
    tot = Z.sum(axis=0)
    n_all = len(Z)
    for s in np.unique(src):
        sel = src == s
        n_s = int(sel.sum())
        ms = Z[sel].mean(axis=0)
        mr = (tot - Z[sel].sum(axis=0)) / (n_all - n_s)
        mmd2 = float(((ms - mr) ** 2).sum() * (2.0 / MMD_D))
        r = got[s]
        assert r.n_s == n_s
        assert abs(r.mmd2_vs_rest_r - round(mmd2, 6)) < 1e-5
    # same-distribution sources: every per-source MMD is small (no source
    # is planted off-distribution in the fixture)
    assert max(r.mmd2_vs_rest_r for r in got.values()) < 0.2
