"""Round-5: temperature-scaled (T=1/2) mixture sampling.

Pure-Python recompute of the sqrt-share thresholds and the hash membership,
plus the policy property: relative to proportional (T=1) mixing, T=1/2 must
shift share from the largest source toward the smallest.
"""

from __future__ import annotations

import hashlib
import math

from tests.conftest import SF_T2

BUCKETS = 10_000
TARGET = 200


def _bucket(doc_id: int, salt: str = "tmix") -> int:
    return int(hashlib.md5(f"{salt}{doc_id}".encode()).hexdigest()[:12], 16) % BUCKETS


def _py_thresholds(n_by_source: dict) -> dict:
    # fold in sorted-source order, exactly like the engine
    sum_rt = 0.0
    for s in sorted(n_by_source):
        sum_rt += math.sqrt(float(n_by_source[s]))
    return {
        s: min(
            int(math.floor(TARGET * math.sqrt(float(n)) / sum_rt / float(n) * BUCKETS)),
            BUCKETS,
        )
        for s, n in n_by_source.items()
    }


def test_temperature_mixture_matches_python_recompute(spark):
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    rows = [(r.doc_id, r.source) for r in docs.select("doc_id", "source").collect()]
    n_by_source: dict = {}
    for _, s in rows:
        n_by_source[s] = n_by_source.get(s, 0) + 1
    thr = _py_thresholds(n_by_source)
    expect_kept: dict = {s: 0 for s in n_by_source}
    for d, s in rows:
        if _bucket(d) < thr[s]:
            expect_kept[s] += 1

    from pyvectorsearch_spark.queries.sampling_extra import (
        q_sample_temperature_mixture,
    )

    got = {r.source: r for r in q_sample_temperature_mixture(spark, SF_T2).collect()}
    assert set(got) == set(n_by_source)
    for s in n_by_source:
        assert got[s].n_source == n_by_source[s], s
        assert got[s].threshold == thr[s], s
        assert got[s].n_kept == expect_kept[s], s


def test_temperature_flattens_shares(spark):
    """√n shares sit between proportional and uniform: the biggest source's
    EXPECTED share under T=1/2 is below its proportional share, the smallest
    source's above (expected share ≈ threshold·n/BUCKETS/target)."""
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    n_by_source = {
        r.source: r.n
        for r in docs.groupBy("source").agg(
            __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
        ).collect()
    }
    thr = _py_thresholds(n_by_source)
    total = sum(n_by_source.values())
    big = max(n_by_source, key=lambda s: (n_by_source[s], s))
    small = min(n_by_source, key=lambda s: (n_by_source[s], s))
    if n_by_source[big] == n_by_source[small]:
        return  # degenerate fixture: all sources equal
    share = {s: thr[s] * n_by_source[s] / BUCKETS / TARGET for s in n_by_source}
    prop = {s: n_by_source[s] / total for s in n_by_source}
    assert share[big] / sum(share.values()) < prop[big]
    assert share[small] / sum(share.values()) > prop[small]
