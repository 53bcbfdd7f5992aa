"""Distributed linear algebra: power-iteration PCA (top principal
direction) over an embedding column — the engine-side version of "what
single axis explains this embedding space" (drift direction, whitening
prep, 1-d projection for binning).

Method (von Mises power iteration, fixed rounds): v_{r+1} ∝ Xᵀ(X v_r) with
X the row matrix. Each round is two corpus passes expressed relationally —
a per-row projection s_i = ⟨x_i, v⟩ (zero-shuffle scan expression) and a
per-dimension weighted sum w_j = Σ_i x_ij · s_i (one explode +
map-side-combined groupBy(j) over dim-sized groups). Only the 64-float
direction vector ever reaches the driver (constant, like k-means
centroids).

Determinism contract (what makes the ORACLE possible): projections and
per-dimension sums are rounded to 6 dp before reuse, the normalization
ladder is `u_j = round(w_j / sqrt(round(Σ round(w_j², 6), 6)), 6)` from the
ROUNDED sums, and the round count is fixed — so the final direction is a
pure rounded-arithmetic function of the input that DuckDB replays exactly
(unrolled rounds, list-aggregated v between layers). Raw double sums agree
across engines to ≪ the rounding quantum at these magnitudes, the same
argument every sum-bearing oracle in this repo relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyvectorsearch_spark.functions.lits import lit_double_array


def power_iteration_top_component(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int,
    rounds: int = 3,
    round_dp: int = 6,
) -> DataFrame:
    """Top principal direction of the (uncentered) second-moment matrix
    XᵀX after ``rounds`` fixed power iterations from the deterministic
    start v₀ = e₁. Returns ``(j, loading)`` — one row per dimension, the
    final round's UNNORMALIZED per-dimension sums normalized in-engine
    (sign convention: whatever the fixed start yields — deterministic).

    Sign/degeneracy note: convergence speed depends on the spectral gap;
    with a fixed small ``rounds`` the result is a deterministic iterate,
    not a converged eigenvector — exactly what the oracle replays.
    """
    v = [0.0] * dim
    v[0] = 1.0
    for _ in range(rounds - 1):
        w_rows = _one_round(df, vec_col, dim, v, round_dp).collect()
        w = [0.0] * dim
        for r in w_rows:
            w[r["j"]] = r["w"]
        # driver-side normalization uses the IDENTICAL rounded ladder the
        # in-engine final round uses (and the oracle's CTE layers replay);
        # HALF_UP rounding to match Spark/DuckDB round() — Python's round()
        # is half-even and could diverge on an exact tie
        import math

        def _r(x: float) -> float:
            q = 10.0 ** round_dp
            return math.copysign(math.floor(abs(x) * q + 0.5), x) / q

        nrm = math.sqrt(_r(sum(_r(x * x) for x in w)))
        v = [_r(x / nrm) if nrm > 0 else 0.0 for x in w]
    last = _one_round(df, vec_col, dim, v, round_dp)
    norm_row = last.agg(
        F.sqrt(
            F.round(F.sum(F.round(F.col("w") * F.col("w"), round_dp)), round_dp)
        ).alias("_n")
    )
    return (
        last.crossJoin(F.broadcast(norm_row))
        .select(
            "j",
            F.when(
                F.col("_n") > 0, F.round(F.col("w") / F.col("_n"), round_dp)
            ).otherwise(F.lit(0.0)).alias("loading"),
        )
        .orderBy("j")
    )


def _one_round(
    df: DataFrame, vec_col: str, dim: int, v: list[float], round_dp: int
) -> DataFrame:
    """One power-iteration round against the literal direction ``v``:
    (j, w) per dimension, everything rounded per the contract."""
    vlit = lit_double_array(v)
    s = F.round(
        F.aggregate(
            F.zip_with(
                F.col(vec_col).cast("array<double>"), vlit, lambda x, y: x * y
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        round_dp,
    )
    rows = df.select(F.col(vec_col).cast("array<double>").alias("_x"), s.alias("_s"))
    ex = rows.select(F.posexplode("_x").alias("j", "_xj"), "_s")
    return ex.groupBy("j").agg(
        F.round(F.sum(F.col("_xj") * F.col("_s")), round_dp).alias("w")
    )


def covariance_matrix(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int,
    round_dp: int = 6,
) -> DataFrame:
    """Upper-triangle covariance matrix of an embedding column —
    whitening/PCA prep as one corpus pass. Returns ``(i, j, cov_r)`` with
    j ≥ i (dim·(dim+1)/2 rows).

    Scale shape (the partition-Gram pattern the GEMM kernels use): each
    partition reduces to ONE flattened d×d Gram block + d-vector sum +
    count via an Arrow-batched numpy kernel (X enters BLAS, never a
    per-element explode — the naive posexplode self-join would shuffle
    n·d² rows, 10¹² at 100 TB, vs ~partitions·d² here). The blocks sum
    element-wise in a dim²-keyed aggregate; cov_ij = Σxy/n − x̄ᵢx̄ⱼ is a
    final dim²-sized projection. Cross-partition float sums reassociate,
    so values round to ``round_dp`` — drift is ~1e-13 relative at any
    partitioning, the same argument every sum-bearing oracle here uses."""
    import pandas as pd

    d = int(dim)

    def gram(batches):
        import numpy as np

        G = np.zeros((d, d))
        s = np.zeros(d)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["_v"]]
            )
            G += X.T @ X
            s += X.sum(axis=0)
            n += len(X)
        if n:
            yield pd.DataFrame(
                {"g": [G.reshape(-1).tolist()], "s": [s.tolist()], "n": [n]}
            )

    parts = df.select(F.col(vec_col).cast("array<double>").alias("_v")).mapInPandas(
        gram, schema="g array<double>, s array<double>, n long"
    )
    gsum = (
        parts.select(F.posexplode("g").alias("idx", "val"))
        .groupBy("idx")
        .agg(F.sum("val").alias("gs"))
    )
    ssum = (
        parts.select(F.posexplode("s").alias("i", "val"))
        .groupBy("i")
        .agg(F.sum("val").alias("ss"))
    )
    ntot = parts.agg(F.sum("n").alias("nn"))
    ij = gsum.select(
        (F.col("idx") / d).cast("long").alias("i"),
        (F.col("idx") % d).cast("long").alias("j"),
        "gs",
    ).filter(F.col("j") >= F.col("i"))
    si = ssum.select(F.col("i").cast("long").alias("i"), F.col("ss").alias("si"))
    sj = ssum.select(F.col("i").cast("long").alias("j"), F.col("ss").alias("sj"))
    return (
        ij.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .crossJoin(F.broadcast(ntot))
        .select(
            "i",
            "j",
            F.round(
                F.col("gs") / F.col("nn")
                - (F.col("si") / F.col("nn")) * (F.col("sj") / F.col("nn")),
                round_dp,
            ).alias("cov_r"),
        )
        .orderBy("i", "j")
    )
