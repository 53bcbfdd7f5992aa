"""Unit tests for Efraimidis-Spirakis weighted sampling (sf-parity lives in
test_oracle_parity.py::sample_weighted_k)."""

from __future__ import annotations

import hashlib
import math

import pytest

from pyvectorsearch_spark.operators.sampling import sample_weighted_k
from pyvectorsearch_spark.operators.sketches import HEX_DIGITS


def _u(salt, i):
    h = hashlib.md5(f"{salt}{i}".encode()).hexdigest()[:HEX_DIGITS]
    return int(h, 16) / float(16**HEX_DIGITS)


def test_matches_python_twin(spark):
    rows = [(i, 0.5 + (i % 7) * 0.1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id int, w double")
    got = [
        r["doc_id"]
        for r in sample_weighted_k(df, k=10, weight_col="w").collect()
    ]
    keyed = sorted(
        ((round(math.log(_u("wsample", i)) / w, 9), i) for i, w in rows),
        key=lambda t: (-t[0], t[1]),
    )
    expect = [i for _, i in keyed[:10]]
    assert sorted(got) == sorted(expect)


def test_deterministic_and_salt_sensitive(spark):
    rows = [(i, 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id int, w double")
    a = sorted(r["doc_id"] for r in sample_weighted_k(df, k=5, weight_col="w").collect())
    b = sorted(r["doc_id"] for r in sample_weighted_k(df, k=5, weight_col="w").collect())
    c = sorted(
        r["doc_id"]
        for r in sample_weighted_k(df, k=5, weight_col="w", salt="other").collect()
    )
    assert a == b
    assert a != c


def test_heavy_weights_win_more_often(spark):
    # 50 heavy (w=50) vs 150 light (w=0.5): the 20-sample should be
    # dominated by heavy ids (deterministic fixture, stable assertion)
    rows = [(i, 50.0) for i in range(50)] + [(i, 0.5) for i in range(50, 200)]
    df = spark.createDataFrame(rows, "doc_id int, w double")
    got = [r["doc_id"] for r in sample_weighted_k(df, k=20, weight_col="w").collect()]
    heavy = sum(1 for i in got if i < 50)
    assert heavy >= 15


def test_nonpositive_weights_excluded(spark):
    rows = [(1, 0.0), (2, -1.0), (3, 2.0)]
    df = spark.createDataFrame(rows, "doc_id int, w double")
    got = [r["doc_id"] for r in sample_weighted_k(df, k=3, weight_col="w").collect()]
    assert got == [3]


def test_k_validation(spark):
    df = spark.createDataFrame([(1, 1.0)], "doc_id int, w double")
    with pytest.raises(ValueError):
        sample_weighted_k(df, k=0, weight_col="w")
