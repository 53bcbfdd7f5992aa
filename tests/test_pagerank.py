"""Unit tests for the fixed-iteration PageRank (sf-parity lives in
test_oracle_parity.py::dedup_pagerank)."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pytest

from pyvectorsearch_spark.operators.graph import pagerank


def _r6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _twin(pairs, damping=0.85, iters=3):
    edges = set()
    for a, b in pairs:
        edges.add((a, b))
        edges.add((b, a))
    deg = {}
    for _, b in edges:
        deg[b] = deg.get(b, 0) + 1
    r = {n: 1.0 for n in deg}
    for _ in range(iters):
        acc = {}
        for a, b in edges:
            acc.setdefault(a, 0.0)
            acc[a] += _r6(r[b] / deg[b])
        r = {a: _r6((1 - damping) + damping * _r6(s)) for a, s in acc.items()}
    return r


@pytest.mark.parametrize(
    "pairs",
    [
        [(1, 2), (2, 3), (3, 1)],  # triangle: symmetric ranks
        [(1, 2), (1, 3), (1, 4)],  # star: hub outranks leaves
        [(1, 2), (3, 4)],  # two components
    ],
)
def test_pagerank_matches_python_twin(spark, pairs):
    df = spark.createDataFrame(pairs, "d1 int, d2 int")
    got = {r["node"]: r["pagerank"] for r in pagerank(df).collect()}
    assert got == _twin(pairs)


def test_pagerank_hub_ranks_highest(spark):
    df = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], "d1 int, d2 int")
    got = {r["node"]: r["pagerank"] for r in pagerank(df).collect()}
    assert got[1] > max(got[2], got[3], got[4])


def test_pagerank_symmetric_graph_uniform(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "d1 int, d2 int")
    vals = {r["pagerank"] for r in pagerank(df).collect()}
    assert vals == {1.0}  # regular graph: PageRank stays at the start value
