"""Unit tests for select_token_budget (take-while prefix semantics; the
sf-parity single-window equivalence lives in
test_oracle_parity.py::sample_token_budget)."""

from __future__ import annotations

import pytest

from pyvectorsearch_spark.operators.sampling import select_token_budget


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, ntok bigint, qual double")


def _ids(df, **kw):
    return sorted(
        r["doc_id"]
        for r in select_token_budget(
            df, quality_col="qual", size_col="ntok", **kw
        ).collect()
    )


def test_quality_prefix_order(spark):
    df = _df(spark, [(1, 10, 0.9), (2, 10, 0.5), (3, 10, 0.7)])
    assert _ids(df, budget=20) == [1, 3]  # best two by quality


def test_take_while_not_knapsack(spark):
    # second-best doc overflows; the cheaper third doc must NOT be
    # back-filled (prefix stops at the first overflow)
    df = _df(spark, [(1, 10, 0.9), (2, 100, 0.8), (3, 5, 0.7)])
    assert _ids(df, budget=20) == [1]


def test_id_tiebreak_within_equal_quality(spark):
    df = _df(spark, [(3, 10, 0.5), (1, 10, 0.5), (2, 10, 0.5)])
    assert _ids(df, budget=20) == [1, 2]


def test_exact_fit_and_zero_budget(spark):
    df = _df(spark, [(1, 10, 0.9), (2, 10, 0.8)])
    assert _ids(df, budget=20) == [1, 2]
    assert _ids(df, budget=0) == []


def test_negative_budget_raises(spark):
    df = _df(spark, [(1, 10, 0.9)])
    with pytest.raises(ValueError):
        select_token_budget(df, budget=-1, quality_col="qual", size_col="ntok")
