"""Property-based tests (hypothesis) for the curation operators added in
round 3: token-budget selection, KMV sketch, and funnel conversion — each
checked against an obviously-correct pure-Python twin on arbitrary inputs."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings, strategies as st

from pyvectorsearch_spark.operators.funnel import funnel_conversion
from pyvectorsearch_spark.operators.sampling import select_token_budget
from pyvectorsearch_spark.operators.sketches import HEX_DIGITS, kmv_distinct

PROP_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --- select_token_budget ≡ take-while walk ---------------------------------

doc_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=200),  # ntok
        st.integers(min_value=0, max_value=40),  # quality in units of 0.025
    ),
    min_size=0,
    max_size=30,
)


@given(rows=doc_rows, budget=st.integers(min_value=0, max_value=2000))
@PROP_SETTINGS
def test_token_budget_equals_takewhile(spark, rows, budget):
    fixture = [(i, n, q * 0.025) for i, (n, q) in enumerate(rows)]
    df = spark.createDataFrame(fixture, "doc_id int, ntok bigint, qual double")
    got = sorted(
        r["doc_id"]
        for r in select_token_budget(
            df, budget=budget, quality_col="qual", size_col="ntok"
        ).collect()
    )
    expect, acc = [], 0
    for i, n, q in sorted(fixture, key=lambda t: (-t[2], t[0])):
        if acc + n > budget:
            break
        expect.append(i)
        acc += n
    assert got == sorted(expect)


# --- kmv_distinct ≡ python twin --------------------------------------------


def _twin_kmv(values, k):
    us = sorted(
        {int(hashlib.md5(str(v).encode()).hexdigest()[:HEX_DIGITS], 16)
         / float(16**HEX_DIGITS)
         for v in values}
    )
    n = len(us)
    if n < k:
        return n, float(n), None
    return n, round((k - 1) / us[k - 1], 3), us[k - 1]


@given(
    values=st.lists(st.integers(min_value=-(10**6), max_value=10**6), min_size=1,
                    max_size=120),
    k=st.integers(min_value=2, max_value=32),
)
@PROP_SETTINGS
def test_kmv_matches_python_twin(spark, values, k):
    df = spark.createDataFrame([(v, "g") for v in values], "v long, g string")
    r = kmv_distinct(df, by="g", value_col="v", k=k).collect()[0]
    n, est, uk = _twin_kmv(values, k)
    assert r["n_distinct_exact"] == n
    assert r["kmv_estimate"] == est
    if uk is None:
        assert r["u_k"] is None
    else:
        assert r["u_k"] == round(uk, 9)


# --- funnel_conversion ≡ sequential-min walk -------------------------------

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),  # user
        st.sampled_from(["a", "b", "c"]),  # step type
        st.integers(min_value=0, max_value=50),  # minute
    ),
    min_size=1,
    max_size=40,
)


@given(evs=events_strategy)
@PROP_SETTINGS
def test_funnel_matches_python_twin(spark, evs):
    import datetime as dt

    fixture = [
        (u, t, dt.datetime(2024, 1, 1, 0, m)) for u, t, m in evs
    ]
    df = spark.createDataFrame(fixture, "user_id int, event_type string, ts timestamp")
    row = funnel_conversion(df, ["a", "b", "c"]).collect()[0]

    by_user: dict[int, list] = {}
    for u, t, ts in fixture:
        by_user.setdefault(u, []).append((ts, t))
    reach = [0, 0, 0]
    for u, items in by_user.items():
        prev = None
        for si, step in enumerate(["a", "b", "c"]):
            cands = [
                ts for ts, t in items
                if t == step and (prev is None or ts >= prev)
            ]
            if not cands:
                break
            prev = min(cands)
            reach[si] += 1
    assert row["n_users"] == len(by_user)
    assert (row["n_a"], row["n_b"], row["n_c"]) == tuple(reach)
