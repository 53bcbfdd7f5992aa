"""Algebraic properties of the wave-3 statistical ladders — invariants the
example-based recompute tests can't pin."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings as hyp_settings, strategies as st

from tests.conftest import SF_SMOKE

_ints = st.lists(st.integers(min_value=-1000, max_value=1000),
                 min_size=1, max_size=60)


@given(vals=_ints)
@hyp_settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_histogram_rank_median_equals_sorted_median(spark, vals):
    """The histogram-rank ladder (smallest value whose cumulative count
    reaches floor((n+1)/2)) — the construction under MAD, winsorize, and
    the lead-time tails — must equal the lower median of the sorted
    list for ANY multiset, including duplicates and negatives."""
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    med = spark.sql(
        """
        WITH hist AS (SELECT v, COUNT(*) AS c FROM {df} GROUP BY v),
        cum AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cm,
                       (SELECT SUM(c) FROM hist) AS n FROM hist)
        SELECT MIN(v) AS med FROM cum WHERE cm >= CAST((n + 1) / 2 AS BIGINT)
        """,
        df=df,
    ).collect()[0]["med"]
    expected = int(np.sort(np.array(vals))[(len(vals) + 1) // 2 - 1])
    assert med == expected, (vals, med, expected)


@given(vals=st.lists(st.integers(min_value=0, max_value=50),
                     min_size=3, max_size=40))
@hyp_settings(max_examples=15, deadline=None)
def test_mann_kendall_antisymmetry(vals):
    """Reversing a series must flip S's sign exactly (and tie counts are
    order-free) — the pure-integer pair-count identity behind the MK
    query, checked on the same arithmetic the query uses."""
    def s_stat(y):
        s = 0
        for i in range(len(y)):
            for j in range(i + 1, len(y)):
                s += (y[j] > y[i]) - (y[j] < y[i])
        return s

    assert s_stat(vals) == -s_stat(vals[::-1])


def test_km_survival_monotone_in_horizon(spark):
    """Ŝ(t) is non-increasing in t by construction — the registered query
    must satisfy it at every reported horizon."""
    from pyvectorsearch_spark.queries.funnel_extra import q_customer_survival_km

    rows = q_customer_survival_km(spark, SF_SMOKE).collect()
    ss = [r["s_km_r"] for r in sorted(rows, key=lambda r: r["horizon_days"])]
    assert ss == sorted(ss, reverse=True)
    assert all(0.0 <= s <= 1.0 for s in ss)
