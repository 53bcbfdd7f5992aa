"""Unit tests for the KMV distinct sketch (sf-parity lives in
test_oracle_parity.py::sketch_kmv_users)."""

from __future__ import annotations

import pytest

from pyvectorsearch_spark.operators.sketches import kmv_distinct


def test_exact_below_capacity(spark):
    # 10 distinct values with heavy duplication, k=64 -> exact count, no u_k
    rows = [(i % 10, "g") for i in range(200)]
    df = spark.createDataFrame(rows, "v int, g string")
    r = kmv_distinct(df, by="g", value_col="v", k=64).collect()[0]
    assert r["n_distinct_exact"] == 10
    assert r["kmv_estimate"] == 10.0
    assert r["u_k"] is None


def test_estimate_accuracy_above_capacity(spark):
    # 2000 distinct values, k=64: KMV relative stderr ~ 1/sqrt(k-2) ~ 13%;
    # assert a loose 3-sigma band (deterministic: md5 is fixed)
    df = spark.createDataFrame([(i, "g") for i in range(2000)], "v int, g string")
    r = kmv_distinct(df, by="g", value_col="v", k=64).collect()[0]
    assert r["n_distinct_exact"] == 2000
    assert r["u_k"] is not None
    assert abs(r["kmv_estimate"] - 2000) / 2000 < 0.4


def test_duplicates_do_not_inflate(spark):
    # same 100 distinct values, once plain and once with 50x duplication:
    # identical sketch output (KMV is a function of the SET)
    a = spark.createDataFrame([(i, "g") for i in range(100)], "v int, g string")
    b = spark.createDataFrame(
        [(i, "g") for i in range(100) for _ in range(50)], "v int, g string"
    )
    ra = kmv_distinct(a, by="g", value_col="v", k=32).collect()[0]
    rb = kmv_distinct(b, by="g", value_col="v", k=32).collect()[0]
    assert ra == rb


def test_k_must_be_at_least_two(spark):
    df = spark.createDataFrame([(1, "g")], "v int, g string")
    with pytest.raises(ValueError):
        kmv_distinct(df, by="g", value_col="v", k=1)


def test_per_group_independence(spark):
    rows = [(i, "a") for i in range(500)] + [(i, "b") for i in range(5)]
    df = spark.createDataFrame(rows, "v int, g string")
    got = {r["g"]: r for r in kmv_distinct(df, by="g", value_col="v", k=16).collect()}
    assert got["b"]["kmv_estimate"] == 5.0  # below capacity: exact
    assert got["a"]["u_k"] is not None  # above capacity: estimated
