"""Round-6: RFF-MMD drift test — numpy recompute of the linear-time MMD
estimator and the power property (planted shift dominates the null by an
order of magnitude).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_T2


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
