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
