"""Unit tests for funnel_conversion / retention_cohorts on hand-built event
fixtures where the correct answer is known by construction (the sf-parity
check lives in test_oracle_parity.py)."""

from __future__ import annotations

import datetime as dt

import pytest

from pyvectorsearch_spark.operators.funnel import funnel_conversion, retention_cohorts


def _ev(uid, typ, minute):
    return (uid, typ, dt.datetime(2024, 1, 1, 0, minute))


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # u1: full ordered funnel
        _ev(1, "view", 0), _ev(1, "click", 1), _ev(1, "purchase", 2),
        # u2: click BEFORE view — strict funnel must not count the click
        _ev(2, "click", 0), _ev(2, "view", 1), _ev(2, "purchase", 2),
        # u3: view only
        _ev(3, "view", 0),
        # u4: purchase with no view at all
        _ev(4, "purchase", 0),
        # u5: view + click, purchase between view and click (not after click)
        _ev(5, "view", 0), _ev(5, "purchase", 1), _ev(5, "click", 2),
    ]
    return spark.createDataFrame(rows, "user_id int, event_type string, ts timestamp")


def test_strict_sequential_funnel(events):
    row = funnel_conversion(events, ["view", "click", "purchase"]).collect()[0]
    assert row["n_users"] == 5
    assert row["n_view"] == 4  # u1,u2,u3,u5
    assert row["n_click"] == 2  # u1; u5 (click after view); NOT u2
    assert row["n_purchase"] == 1  # only u1 purchases after the click
    assert row["conv_view_click"] == round(2 / 4, 6)
    assert row["conv_click_purchase"] == round(1 / 2, 6)
    assert row["conv_overall"] == round(1 / 4, 6)


def test_same_timestamp_counts_as_reached(spark):
    # ts >= milestone: simultaneous events advance the funnel
    rows = [_ev(1, "view", 0), _ev(1, "click", 0)]
    df = spark.createDataFrame(rows, "user_id int, event_type string, ts timestamp")
    row = funnel_conversion(df, ["view", "click"]).collect()[0]
    assert row["n_view"] == 1 and row["n_click"] == 1


def test_empty_steps_raises(events):
    with pytest.raises(ValueError):
        funnel_conversion(events, [])


def test_retention_cohorts(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 5)),
        (1, dt.datetime(2024, 1, 2, 5)),
        (1, dt.datetime(2024, 1, 2, 9)),  # same (cohort, offset) cell as above
        (2, dt.datetime(2024, 1, 2, 1)),
        (2, dt.datetime(2024, 1, 4, 1)),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    got = {
        (str(r["cohort"]), r["day_offset"]): r["n_users"]
        for r in retention_cohorts(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-02", 0): 1,
        ("2024-01-02", 2): 1,
    }
