"""Unit tests for psi_drift / profile_table on planted fixtures (sf-parity
lives in test_oracle_parity.py)."""

from __future__ import annotations

import math

import pytest

from pyvectorsearch_spark.operators.quality import profile_table, psi_drift


def test_psi_zero_for_identical_distributions(spark):
    rows = [("g", float(v), cur) for v in range(40) for cur in (False, True)]
    df = spark.createDataFrame(rows, "g string, value double, cur boolean")
    r = psi_drift(
        df, by="g", value_col="value", split_col="cur", bucket_width=10.0
    ).collect()[0]
    assert r["psi"] == 0.0
    assert r["n_base"] == 40 and r["n_cur"] == 40


def test_psi_flags_shift(spark):
    # baseline in [0, 10), current in [30, 40): complete mass shift
    rows = [("g", float(v), False) for v in range(10)] + [
        ("g", float(v), True) for v in range(30, 40)
    ]
    df = spark.createDataFrame(rows, "g string, value double, cur boolean")
    r = psi_drift(
        df, by="g", value_col="value", split_col="cur", bucket_width=10.0
    ).collect()[0]
    assert r["psi"] > 0.25  # conventional drift-alarm threshold


def test_psi_matches_python_twin(spark):
    vals_b = [1.0, 5.0, 12.0, 33.0, 47.0, 5.5]
    vals_c = [2.0, 18.0, 18.5, 44.0]
    rows = [("g", v, False) for v in vals_b] + [("g", v, True) for v in vals_c]
    df = spark.createDataFrame(rows, "g string, value double, cur boolean")
    got = psi_drift(
        df, by="g", value_col="value", split_col="cur", bucket_width=10.0,
        n_buckets=5,
    ).collect()[0]["psi"]

    def hist(vs):
        h = [0] * 5
        for v in vs:
            h[min(int(v // 10), 4)] += 1
        return h

    hb, hc = hist(vals_b), hist(vals_c)
    psi = 0.0
    for i in range(5):
        pb = max(hb[i] / len(vals_b), 1e-6)
        pc = max(hc[i] / len(vals_c), 1e-6)
        psi += round((pc - pb) * math.log(pc / pb), 6)
    assert got == pytest.approx(round(psi, 6), abs=2e-6)


def test_profile_table_cells(spark):
    rows = [(1, "a", 2.5, None), (2, "b", None, None), (2, None, 1.0, None)]
    df = spark.createDataFrame(rows, "k int, s string, v double, z string")
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert set(prof) == {"k", "s", "v", "z"}
    assert prof["k"]["n_rows"] == 3 and prof["k"]["n_distinct"] == 2
    assert prof["k"]["min_num"] == 1.0 and prof["k"]["max_num"] == 2.0
    assert prof["k"]["min_str"] is None
    assert prof["s"]["n_null"] == 1
    assert prof["s"]["min_str"] == "a" and prof["s"]["max_str"] == "b"
    assert prof["s"]["min_num"] is None
    assert prof["v"]["n_null"] == 1 and prof["v"]["max_num"] == 2.5
    assert prof["z"]["n_null"] == 3 and prof["z"]["n_distinct"] == 0
