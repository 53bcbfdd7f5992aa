from __future__ import annotations

import math

from pyspark.sql import functions as F

from pyvectorsearch_spark.functions.vector import cosine_sim, dot, l2_dist, l2_sq, norm_l2


def _one(spark, col):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 6.0, 8.0])], "a array<float>, b array<float>"
    )
    return df.select(col.alias("v")).first().v


def test_l2_sq(spark):
    assert _one(spark, l2_sq("a", "b")) == 9 + 16 + 25


def test_l2_dist(spark):
    assert math.isclose(_one(spark, l2_dist("a", "b")), math.sqrt(50))


def test_dot(spark):
    assert _one(spark, dot("a", "b")) == 4 + 12 + 24


def test_norm(spark):
    assert math.isclose(_one(spark, norm_l2("a")), math.sqrt(14))


def test_cosine(spark):
    expect = 40 / (math.sqrt(14) * math.sqrt(116))
    assert math.isclose(_one(spark, cosine_sim("a", "b")), expect)


def test_duckdb_fragment_parity(spark, duck):
    """The SQL fragments used in oracles compute the same doubles."""
    from pyvectorsearch_spark.functions.vector import duckdb_dot, duckdb_l2_sq

    a = [0.1, -0.25, 3.75]
    b = [1.5, 0.5, -2.25]
    df = spark.createDataFrame([(a, b)], "a array<float>, b array<float>")
    s = df.select(l2_sq("a", "b").alias("d"), dot("a", "b").alias("p")).first()
    lit_a = "[" + ",".join(f"CAST({x} AS FLOAT)" for x in a) + "]"
    lit_b = "[" + ",".join(f"CAST({x} AS FLOAT)" for x in b) + "]"
    row = duck.sql(
        f"SELECT {duckdb_l2_sq('a', 'b', 3)} AS d, {duckdb_dot('a', 'b', 3)} AS p "
        f"FROM (SELECT {lit_a} AS a, {lit_b} AS b)"
    ).fetchone()
    assert s.d == row[0]
    assert s.p == row[1]
