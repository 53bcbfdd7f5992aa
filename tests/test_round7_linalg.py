"""Round-7: covariance_matrix (whitening/PCA prep) — numpy recompute +
partition invariance for the partition-Gram kernel."""
from __future__ import annotations

import numpy as np

from pyvectorsearch_spark.operators.linalg import covariance_matrix


def _toy(spark, n=500, d=8, parts=7):
    rng = np.random.RandomState(42)
    X = rng.randn(n, d) * rng.uniform(0.5, 3.0, size=d) + rng.uniform(
        -2, 2, size=d
    )
    df = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(parts)
    return X, df


def test_covariance_matches_numpy(spark):
    X, df = _toy(spark)
    got = {
        (r.i, r.j): r.cov_r
        for r in covariance_matrix(df, vec_col="embedding", dim=8).collect()
    }
    C = np.cov(X, rowvar=False, bias=True)  # /n, matching Σxy/n − x̄ᵢx̄ⱼ
    assert len(got) == 8 * 9 // 2
    for (i, j), v in got.items():
        assert j >= i
        assert abs(v - round(C[i, j], 6)) <= 1e-6, (i, j, v, C[i, j])


def test_covariance_partition_invariant(spark):
    X, df = _toy(spark, parts=3)
    a = sorted(
        tuple(r) for r in covariance_matrix(df, vec_col="embedding", dim=8).collect()
    )
    b = sorted(
        tuple(r)
        for r in covariance_matrix(
            df.repartition(17), vec_col="embedding", dim=8
        ).collect()
    )
    assert a == b


def test_covariance_diagonal_is_variance(spark):
    X, df = _toy(spark)
    got = {
        (r.i, r.j): r.cov_r
        for r in covariance_matrix(df, vec_col="embedding", dim=8).collect()
    }
    for i in range(8):
        assert got[(i, i)] >= 0
        assert abs(got[(i, i)] - round(X[:, i].var(), 6)) <= 1e-6
