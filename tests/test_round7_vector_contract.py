"""Round-7: NaN/Inf/null contract on the vector search surface
(VERDICT r6 ask #6).

The reference cannot represent invalid states (raw C double arrays, dim
fixed at construction — pktree.hpp:1223-1250); Spark can, so the contract
is explicit: search raises on NULL-vector / NULL-element / NaN / ±Inf by
default, or drops the row under on_invalid="skip"; GridIndex.build
refuses dirty data outright. These tests pin both modes on every entry
point and prove the skip results equal brute force over the clean subset.
"""
from __future__ import annotations

import random

import pytest

from pyvectorsearch_spark.operators.knn import knn_join, knn_join_blocked, range_join

NAN = float("nan")
INF = float("inf")

BAD_VECTORS = {
    "nan_component": [1.0, NAN, 3.0],
    "pos_inf": [INF, 0.0, 0.0],
    "neg_inf": [0.0, -INF, 0.0],
    "null_element": [1.0, None, 3.0],
    "null_vector": None,
}


def _clean_data(spark, n=20, dim=3, seed=11):
    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-5, 5) for _ in range(dim)]) for i in range(n)]
    return rows, spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _queries(spark):
    return spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]), (1, [1.0, 1.0, 1.0])],
        "query_id long, qvec array<double>",
    )


def _expect_invalid_error(fn):
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as exc:
        fn()
    msg = str(exc.value)
    assert "invalid" in msg.lower() and (
        "NaN" in msg or "vector" in msg.lower()
    ), msg


@pytest.mark.parametrize("bad_name", sorted(BAD_VECTORS))
def test_knn_join_raises_on_bad_data(spark, bad_name):
    rows, clean = _clean_data(spark)
    dirty = spark.createDataFrame(
        rows + [(999, BAD_VECTORS[bad_name])],
        "vec_id long, embedding array<double>",
    )
    _expect_invalid_error(
        lambda: knn_join(dirty, _queries(spark), 3).collect()
    )


@pytest.mark.parametrize("bad_name", sorted(BAD_VECTORS))
def test_knn_join_skip_equals_clean_bruteforce(spark, bad_name):
    rows, clean = _clean_data(spark)
    dirty = spark.createDataFrame(
        rows + [(999, BAD_VECTORS[bad_name])],
        "vec_id long, embedding array<double>",
    )
    got = sorted(
        tuple(r)
        for r in knn_join(dirty, _queries(spark), 3, on_invalid="skip").collect()
    )
    want = sorted(tuple(r) for r in knn_join(clean, _queries(spark), 3).collect())
    assert got == want and len(want) == 6


@pytest.mark.parametrize("metric", ["cosine", "dot"])
def test_desc_metrics_cannot_rank_garbage_first(spark, metric):
    """NaN sorts as the LARGEST double in Spark — without the guard a NaN
    data row would be rank 1 for every query under desc metrics."""
    rows, clean = _clean_data(spark)
    dirty = spark.createDataFrame(
        rows + [(999, [NAN, NAN, NAN])], "vec_id long, embedding array<double>"
    )
    # non-zero probes: cosine of a zero-norm vector is a (pre-existing)
    # ANSI divide-by-zero, out of scope for the validity contract
    qs = spark.createDataFrame(
        [(0, [0.5, 0.25, 1.0]), (1, [1.0, 1.0, 1.0])],
        "query_id long, qvec array<double>",
    )
    got = knn_join(dirty, qs, 3, metric=metric, on_invalid="skip")
    assert 999 not in {r.neighbor_id for r in got.collect()}


def test_query_side_bad_vector_raises_and_skips(spark):
    _, clean = _clean_data(spark)
    qs = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]), (7, [NAN, 0.0, 0.0])],
        "query_id long, qvec array<double>",
    )
    _expect_invalid_error(lambda: knn_join(clean, qs, 3).collect())
    out = knn_join(clean, qs, 3, on_invalid="skip").collect()
    assert {r.query_id for r in out} == {0}


def test_dim_mismatch_still_raises_loud(spark):
    rows, clean = _clean_data(spark)
    qs = spark.createDataFrame(
        [(0, [0.0, 0.0])], "query_id long, qvec array<double>"
    )
    with pytest.raises(Exception, match="dim mismatch"):
        knn_join(clean, qs, 3).collect()


def test_blocked_kernel_matches_contract(spark):
    rows, clean = _clean_data(spark)
    dirty = spark.createDataFrame(
        rows + [(999, [1.0, NAN, 3.0])], "vec_id long, embedding array<double>"
    )
    _expect_invalid_error(
        lambda: knn_join_blocked(dirty, _queries(spark), 3).collect()
    )
    got = sorted(
        tuple(r)
        for r in knn_join_blocked(
            dirty, _queries(spark), 3, on_invalid="skip"
        ).collect()
    )
    want = sorted(
        tuple(r) for r in knn_join(clean, _queries(spark), 3).collect()
    )
    assert got == want
    # bad QUERY: raise by default, skip drops the probe
    qs = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]), (7, None)], "query_id long, qvec array<double>"
    )
    with pytest.raises(ValueError, match="invalid vector"):
        knn_join_blocked(clean, qs, 3)
    out = knn_join_blocked(clean, qs, 3, on_invalid="skip").collect()
    assert {r.query_id for r in out} == {0}


def test_range_join_contract(spark):
    rows, clean = _clean_data(spark)
    dirty = spark.createDataFrame(
        rows + [(999, [INF, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    _expect_invalid_error(
        lambda: range_join(dirty, _queries(spark), 4.0).collect()
    )
    got = sorted(
        tuple(r)
        for r in range_join(dirty, _queries(spark), 4.0, on_invalid="skip").collect()
    )
    want = sorted(tuple(r) for r in range_join(clean, _queries(spark), 4.0).collect())
    assert got == want


def test_grid_build_refuses_dirty_data(spark):
    from pyvectorsearch_spark.index.grid import GridIndex

    rows, _ = _clean_data(spark, n=50)
    for bad in [[NAN, 0.0, 0.0], [1.0, None, 2.0], None, [1.0, 2.0]]:
        dirty = spark.createDataFrame(
            rows + [(999, bad)], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError, match="invalid vector"):
            GridIndex.build(dirty, dim=3)


def test_grid_knn_probe_contract(spark):
    from pyvectorsearch_spark.index.grid import GridIndex

    rows, clean = _clean_data(spark, n=60)
    idx = GridIndex.build(clean, dim=3)
    qs = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]), (7, [NAN, 0.0, 0.0])],
        "query_id long, qvec array<double>",
    )
    for mode in ("driver", "distributed"):
        _expect_invalid_error(
            lambda m=mode: idx.knn(qs, 3, candidates=m).collect()
        )
        out = idx.knn(qs, 3, candidates=mode, on_invalid="skip").collect()
        assert {r.query_id for r in out} == {0}
        # skip results equal brute force on the clean probe
        want = sorted(
            (r.query_id, r.neighbor_id, r.rank)
            for r in knn_join(clean, _queries(spark).filter("query_id = 0"), 3).collect()
        )
        got = sorted((r.query_id, r.neighbor_id, r.rank) for r in out)
        assert got == want


def test_grid_range_probe_contract(spark):
    from pyvectorsearch_spark.index.grid import GridIndex

    rows, clean = _clean_data(spark, n=60)
    idx = GridIndex.build(clean, dim=3)
    qs = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]), (7, [None, 0.0, 0.0])],
        "query_id long, qvec array<double>",
    )
    for mode in ("driver", "distributed"):
        _expect_invalid_error(
            lambda m=mode: idx.range(qs, 3.0, candidates=m).collect()
        )
        out = idx.range(qs, 3.0, candidates=mode, on_invalid="skip").collect()
        assert {r.query_id for r in out} <= {0}
        want = sorted(
            (r.query_id, r.neighbor_id)
            for r in range_join(
                clean, _queries(spark).filter("query_id = 0"), 3.0
            ).collect()
        )
        got = sorted((r.query_id, r.neighbor_id) for r in out)
        assert got == want


def test_vec_is_finite_expression(spark):
    from pyspark.sql import functions as F

    from pyvectorsearch_spark.functions.vector import vec_is_finite

    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0]),
            (2, [NAN, 2.0]),
            (3, [INF, 2.0]),
            (4, [-INF, 2.0]),
            (5, [None, 2.0]),
            (6, None),
            (7, []),
        ],
        "id long, v array<double>",
    )
    got = {
        r.id: r.ok
        for r in df.select("id", vec_is_finite("v").alias("ok")).collect()
    }
    assert got == {1: True, 2: False, 3: False, 4: False, 5: False, 6: False, 7: True}
