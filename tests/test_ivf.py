from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyvectorsearch_spark.index.ivf import IVFIndex
from pyvectorsearch_spark.operators.knn import knn_join
from pyvectorsearch_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings").cache()


@pytest.fixture(scope="module")
def probes(emb):
    return emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


@pytest.fixture(scope="module")
def idx(emb):
    return IVFIndex.build(emb, n_lists=16, seed=42)


def _pairs(rows):
    return {(r.query_id, r.neighbor_id) for r in rows}


def test_ivf_exhaustive_probe_is_exact(emb, probes, idx):
    exact = _pairs(knn_join(emb, probes, 10).collect())
    full = _pairs(idx.knn(probes, 10, nprobe=16).collect())
    assert full == exact


def test_ivf_partial_probe_recall(emb, probes, idx):
    exact = _pairs(knn_join(emb, probes, 10).collect())
    approx = _pairs(idx.knn(probes, 10, nprobe=4).collect())
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, f"recall {recall}"


def test_ivf_partial_probe_scans_fraction(idx, probes):
    total = idx.df.count()
    import numpy as np

    q = idx.df.sparkSession
    # lists probed for all 6 queries at nprobe=4 must cover < all rows
    rows = probes.collect()
    Q = np.asarray([list(r[1]) for r in rows])
    d2 = ((Q[:, None, :] - idx.centroids[None, :, :]) ** 2).sum(axis=2)
    lists = set()
    for row in d2:
        lists.update(np.argsort(row)[:4].tolist())
    scanned = idx.df.filter(F.col("list_id").isin([int(x) for x in lists])).count()
    assert scanned < total


def test_ivf_build_deterministic(emb):
    a = IVFIndex.build(emb, n_lists=8, seed=7)
    b = IVFIndex.build(emb, n_lists=8, seed=7)
    assert (a.centroids == b.centroids).all()


def test_ivf_write_load_roundtrip(tmp_path, spark, emb, probes, idx):
    path = str(tmp_path / "ivf")
    idx.write(path)
    loaded = IVFIndex.load(spark, path)
    a = _pairs(idx.knn(probes, 5, nprobe=16).collect())
    b = _pairs(loaded.knn(probes, 5, nprobe=16).collect())
    assert a == b


def test_ivf_distributed_candidates_exact_at_full_probe(spark):
    """candidates="distributed" with nprobe == n_lists is exact: equals
    brute force on a probe table, with no queries.collect() in the path."""
    from pyspark.sql import functions as F
    from pyvectorsearch_spark.index.ivf import IVFIndex
    from pyvectorsearch_spark.operators.knn import knn_join
    from pyvectorsearch_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings").cache()
    idx = IVFIndex.build(emb, n_lists=8, seed=42)
    probes = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    got = idx.knn(probes, 5, nprobe=8, candidates="distributed")
    want = knn_join(emb, probes, 5)
    g = {(r.query_id, r.neighbor_id, r.rank) for r in got.collect()}
    w = {(r.query_id, r.neighbor_id, r.rank) for r in want.collect()}
    assert g == w


def test_ivf_distributed_recall_at_partial_probe(spark):
    """Per-query-strict nprobe (distributed) still reaches the recall floor
    the driver path is held to."""
    from pyspark.sql import functions as F
    from pyvectorsearch_spark.index.ivf import IVFIndex
    from pyvectorsearch_spark.operators.knn import knn_join
    from pyvectorsearch_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings").cache()
    idx = IVFIndex.build(emb, n_lists=8, seed=42)
    probes = emb.filter(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    want = {(r.query_id, r.neighbor_id)
            for r in knn_join(emb, probes, 5).collect()}
    # Strict per-query lists (no cross-probe union): recall rises in nprobe.
    # Measured on this fixture: 0.85 @ 4/8, 0.96 @ 6/8, 1.0 @ 8/8.
    got4 = {(r.query_id, r.neighbor_id)
            for r in idx.knn(probes, 5, nprobe=4, candidates="distributed").collect()}
    got6 = {(r.query_id, r.neighbor_id)
            for r in idx.knn(probes, 5, nprobe=6, candidates="distributed").collect()}
    assert len(got4 & want) / len(want) >= 0.8
    assert len(got6 & want) / len(want) >= 0.9
