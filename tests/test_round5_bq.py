"""Round-5: 1-bit binary quantization kNN (index/bq.py).

Independent numpy recompute of codes → Hamming shortlist → exact re-rank,
plus the lossless-limit property: with rerank covering the whole corpus the
BQ path must EQUAL exact brute force (quantization only prunes, never
re-orders the final exact ranking).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tests.conftest import SF_T2

import pytest
pytestmark = pytest.mark.slow  # soak/property tier: excluded from the default (driver-visible) run, see pytest.ini (r11)

DIM = 64
K = 5
N_PROBES = 4
RERANK = 20


def _np_bq(emb: np.ndarray, ids: np.ndarray, probes: np.ndarray, pids, k, rerank):
    bits = (emb > 0).astype(np.int8)
    qbits = (probes > 0).astype(np.int8)
    out = []
    for qi, pid in enumerate(pids):
        ham = (bits != qbits[qi]).sum(axis=1)
        order = np.lexsort((ids, ham))[:rerank]
        d = ((emb[order] - probes[qi]) ** 2).sum(axis=1)
        fin = np.lexsort((ids[order], d))[:k]
        for rank, j in enumerate(fin, 1):
            out.append((int(pid), int(ids[order][j]), float(d[j]), rank))
    return out


def _load(spark):
    emb = spark.read.parquet(f"{SF_T2}/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    return emb, ids, mat


def test_bq_knn_matches_numpy_recompute(spark):
    from pyvectorsearch_spark.index.bq import bq_knn

    emb, ids, mat = _load(spark)
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    got = sorted(
        (r.query_id, r.neighbor_id, round(r.dist, 6), r.rank)
        for r in bq_knn(emb, probes, K, dim=DIM, rerank=RERANK).collect()
    )
    sel = ids < N_PROBES
    expect = sorted(
        (q, n, round(d, 6), r)
        for q, n, d, r in _np_bq(mat, ids, mat[sel], ids[sel], K, RERANK)
    )
    assert got == expect


def test_bq_full_rerank_equals_bruteforce(spark):
    """rerank >= corpus size ⇒ the Hamming stage prunes nothing and BQ must
    reproduce exact kNN bit-for-bit."""
    from pyvectorsearch_spark.index.bq import bq_knn
    from pyvectorsearch_spark.operators.knn import knn_join

    emb, ids, _ = _load(spark)
    n = int(len(ids))
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    bq = sorted(
        (r.query_id, r.neighbor_id, round(r.dist, 9), r.rank)
        for r in bq_knn(emb, probes, K, dim=DIM, rerank=n).collect()
    )
    exact = sorted(
        (r.query_id, r.neighbor_id, round(r.dist, 9), r.rank)
        for r in knn_join(emb, probes, K).collect()
    )
    assert bq == exact


def test_bq_code_expr_matches_python_packing(spark):
    from pyvectorsearch_spark.index.bq import bq_code_expr

    vecs = [
        [1.0] * DIM,
        [-1.0] * DIM,
        [0.0] * DIM,  # zeros are NOT > 0 → bit 0
        [(1.0 if i % 3 == 0 else -1.0) for i in range(DIM)],
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "id long, v array<double>"
    )
    got = {r.id: r.c for r in df.select("id", bq_code_expr("v", DIM).alias("c")).collect()}

    def pack(v):
        code = 0
        for i, x in enumerate(v):
            if x > 0:
                code |= 1 << (DIM - 1 - i)
        # wrap to Java two's-complement long
        return code - (1 << 64) if code >= (1 << 63) else code

    for i, v in enumerate(vecs):
        assert got[i] == pack(v), i


def test_bq_recall_is_high_on_fixture(spark):
    """Sign-bit codes at 64 dims with a 4k shortlist should recover most of
    the exact top-k on the fixture — the report's reason to exist."""
    from pyvectorsearch_spark.queries.search_extra import q_bq_recall_report

    rep = q_bq_recall_report(spark, SF_T2).collect()
    avg = sum(r.recall for r in rep) / len(rep)
    assert avg >= 0.5
    assert all(0.0 <= r.recall <= 1.0 for r in rep)


def test_bq_rerank_curve_is_monotone(spark):
    """Deeper Hamming shortlists can only add candidates, so recall@k is
    non-decreasing in rerank depth."""
    from pyvectorsearch_spark.queries.search_extra import q_bq_rerank_curve

    rows = sorted(
        (r.rerank_depth, r.avg_recall)
        for r in q_bq_rerank_curve(spark, SF_T2).collect()
    )
    recalls = [rec for _, rec in rows]
    assert recalls == sorted(recalls)
    assert recalls[-1] >= recalls[0]
    assert 0.0 < recalls[-1] <= 1.0
