"""Unit tests for resample_counts / interpolate_gaps on planted fixtures
(sf-parity lives in test_oracle_parity.py)."""

from __future__ import annotations

import datetime as dt

from pyvectorsearch_spark.operators.timeseries import interpolate_gaps, resample_counts


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


def test_resample_fills_gaps_with_zero(spark):
    rows = [
        ("g", _ts(0), 1.0),
        ("g", _ts(1), 2.0),  # same 15-min bucket as above
        ("g", _ts(45), 4.0),  # buckets at 15 and 30 are EMPTY
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, value double")
    got = {
        r["bucket_epoch"]: (r["n"], r["total_value"])
        for r in resample_counts(
            df, by="g", ts_col="ts", value_col="value", width_s=900
        ).collect()
    }
    base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    assert got == {
        base: (2, 3.0),
        base + 900: (0, None),
        base + 1800: (0, None),
        base + 2700: (1, 4.0),
    }


def test_resample_without_value_col(spark):
    rows = [("g", _ts(0)), ("g", _ts(31))]
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    out = resample_counts(df, by="g", ts_col="ts", width_s=900).collect()
    assert sorted(r["n"] for r in out) == [0, 1, 1]
    assert "total_value" not in out[0].asDict()


def test_interpolate_linear_and_clamped(spark):
    rows = [
        ("g", 0, 10.0),
        ("g", 900, None),  # one-step gap: midpoint 20.0
        ("g", 1800, 30.0),
        ("g", 2700, None),  # trailing gap: clamps to 30.0
    ]
    df = spark.createDataFrame(
        rows, "g string, bucket_epoch bigint, total_value double"
    )
    got = {
        r["bucket_epoch"]: (r["filled"], r["was_gap"])
        for r in interpolate_gaps(df, by="g").collect()
    }
    assert got[0] == (10.0, 0)
    assert got[900] == (20.0, 1)
    assert got[1800] == (30.0, 0)
    assert got[2700] == (30.0, 1)


def test_interpolate_leading_gap_clamps_forward(spark):
    rows = [("g", 0, None), ("g", 900, 5.0)]
    df = spark.createDataFrame(
        rows, "g string, bucket_epoch bigint, total_value double"
    )
    got = {
        r["bucket_epoch"]: r["filled"] for r in interpolate_gaps(df, by="g").collect()
    }
    assert got[0] == 5.0 and got[900] == 5.0


def test_interpolate_weighted_by_distance(spark):
    # gap two steps wide: 1/3 and 2/3 weights
    rows = [("g", 0, 0.0), ("g", 900, None), ("g", 1800, None), ("g", 2700, 9.0)]
    df = spark.createDataFrame(
        rows, "g string, bucket_epoch bigint, total_value double"
    )
    got = {
        r["bucket_epoch"]: r["filled"] for r in interpolate_gaps(df, by="g").collect()
    }
    assert got[900] == 3.0 and got[1800] == 6.0
