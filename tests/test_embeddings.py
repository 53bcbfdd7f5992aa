"""Unit tests for label centroids / centroid outliers on planted fixtures
(sf-parity lives in test_oracle_parity.py::embedding_outliers)."""

from __future__ import annotations

import pytest

from pyvectorsearch_spark.operators.embeddings import centroid_outliers, label_centroids


@pytest.fixture(scope="module")
def emb(spark):
    # label 0: cluster near +x with one planted outlier near -x;
    # label 1: cluster near +y
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.9, 0.1], 0),
        (3, [1.1, -0.1], 0),
        (4, [-1.0, 0.0], 0),  # planted outlier
        (5, [0.0, 1.0], 1),
        (6, [0.1, 0.9], 1),
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<float>, label int")


def test_centroids_shape_and_counts(emb):
    cents = {r["label"]: r for r in label_centroids(emb).collect()}
    assert set(cents) == {0, 1}
    assert cents[0]["n_vectors"] == 4 and cents[1]["n_vectors"] == 2
    assert len(cents[0]["centroid"]) == 2
    # mean of x-components: (1 + 0.9 + 1.1 - 1)/4 = 0.5
    assert cents[0]["centroid"][0] == pytest.approx(0.5, abs=1e-6)


def test_planted_outlier_ranks_first(emb):
    out = centroid_outliers(emb, k=1).collect()
    by_label = {r["label"]: r for r in out}
    assert by_label[0]["vec_id"] == 4  # the -x vector is most outlying
    assert by_label[0]["rank"] == 1
    assert by_label[0]["cos_centroid"] < 0  # points away from the centroid


def test_k_bounds_rows_per_label(emb):
    out = centroid_outliers(emb, k=2).collect()
    assert len([r for r in out if r["label"] == 0]) == 2
    assert len([r for r in out if r["label"] == 1]) == 2


def test_power_iteration_approaches_top_eigenvector(spark):
    """The deterministic iterate aligns with numpy's top eigenvector of
    X^T X (|cos| grows with rounds; pinned loosely — the corpus spectrum
    is nearly flat so full convergence needs more rounds than the fixture
    runs)."""
    import numpy as np

    from pyvectorsearch_spark.operators.linalg import (
        power_iteration_top_component,
    )
    from pyvectorsearch_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    out = power_iteration_top_component(
        emb, vec_col="embedding", dim=64, rounds=10
    ).collect()
    v = np.array([r["loading"] for r in sorted(out, key=lambda r: r["j"])])
    X = np.array([list(r["embedding"]) for r in emb.collect()], dtype=np.float64)
    evals, evecs = np.linalg.eigh(X.T @ X)
    cos = abs(float(v @ evecs[:, -1]) / np.linalg.norm(v))
    assert cos > 0.7, cos
    assert abs(np.linalg.norm(v) - 1.0) < 1e-4  # unit output
