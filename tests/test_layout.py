"""Unit tests for zorder_key / zorder_layout_stats / shuffle_deterministic
(sf-parity lives in test_oracle_parity.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pyvectorsearch_spark.operators.layout import zorder_key, zorder_layout_stats
from pyvectorsearch_spark.operators.sampling import shuffle_deterministic


def _morton2(x: int, y: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_matches_python_twin(spark):
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zorder_key([F.col("x"), F.col("y")], bits=3).alias("z")
        ).collect()
    }
    for (x, y), z in got.items():
        assert z == _morton2(x, y, 3), (x, y)


def test_zorder_locality(spark):
    # consecutive z-keys differ in few dimensions: within any top-2-bit
    # z-range of an 8x8 grid, each dim spans at most half the domain
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x int, y int")
    stats = zorder_layout_stats(df, ["x", "y"], bits=3, file_bits=2).collect()
    assert len(stats) == 4
    for r in stats:
        assert r["n_rows"] == 16
        assert r["max_x"] - r["min_x"] <= 3
        assert r["max_y"] - r["min_y"] <= 3


def test_zorder_width_guard(spark):
    with pytest.raises(ValueError):
        zorder_key([F.lit(1), F.lit(2), F.lit(3)], bits=21)


def test_shuffle_deterministic_is_stable_permutation(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id int")
    a = [r["doc_id"] for r in shuffle_deterministic(df).collect()]
    b = [r["doc_id"] for r in shuffle_deterministic(df).collect()]
    assert a == b  # reproducible
    assert sorted(a) == list(range(100))  # a permutation
    assert a != list(range(100))  # and actually shuffled
    c = [r["doc_id"] for r in shuffle_deterministic(df, salt="epoch2").collect()]
    assert c != a  # new salt, new epoch order
