"""Round-6: KMV hash-sample quantiles — pandas/numpy recompute plus the two
properties the sketch's value rests on: mergeability (bottom-k of a union
== bottom-k of merged bottom-ks) and bounded relative error on this
fixture.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from tests.conftest import SF_T2


def _interp_quantile(vals: np.ndarray, p: float) -> float:
    """quantile_cont / Spark percentile semantics: linear interpolation at
    rank p*(n-1) over the sorted values."""
    s = np.sort(vals)
    pos = p * (len(s) - 1)
    lo = int(np.floor(pos))
    hi = int(np.ceil(pos))
    frac = pos - lo
    return float(s[lo] * (1 - frac) + s[hi] * frac)


def test_kmv_quantiles_match_pandas(spark):
    from pyvectorsearch_spark.queries.sketch_extra import (
        KMVQ_K,
        KMVQ_PS,
        q_sketch_kmv_quantiles,
    )

    [row] = q_sketch_kmv_quantiles(spark, SF_T2).collect()
    o = pd.read_parquet(f"{SF_T2}/orders.parquet")
    o["_h"] = [hashlib.md5(str(k).encode()).hexdigest() for k in o["o_orderkey"]]
    samp = o.sort_values("_h").head(KMVQ_K)["o_totalprice"].to_numpy()
    full = o["o_totalprice"].to_numpy()
    assert row.n_total == len(o)
    assert row.k == min(KMVQ_K, len(o))
    for p in KMVQ_PS:
        tag = str(p).replace("0.", "p")
        est = _interp_quantile(samp, p)
        exact = _interp_quantile(full, p)
        assert abs(getattr(row, f"{tag}_est") - round(est, 6)) < 1e-6, p
        assert abs(getattr(row, f"{tag}_exact") - round(exact, 6)) < 1e-6, p
        relerr = abs(est - exact) / exact
        assert abs(getattr(row, f"{tag}_relerr") - round(relerr, 6)) < 1e-6
        # k=256 uniform sample: relative error stays small on this fixture
        assert relerr < 0.15, (p, relerr)


def test_kmv_sample_is_mergeable():
    """bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B)) — the merge
    law that lets per-partition samples combine without coordination."""
    import random

    rng = random.Random(7)
    keys = [str(rng.randrange(10**9)) for _ in range(5000)]
    hashed = sorted((hashlib.md5(k.encode()).hexdigest(), k) for k in set(keys))
    k = 64
    a, b = hashed[::2], hashed[1::2]
    merged = sorted(sorted(a)[:k] + sorted(b)[:k])[:k]
    assert merged == hashed[:k]
