"""Independent-recomputation tests for the round-4 third-wave queries.

Oracle parity (tests/test_oracle_parity.py) proves Spark == DuckDB on the
same declared SQL; these tests recompute each statistic a THIRD way — plain
numpy/pandas over the raw parquet — so a shared misunderstanding between the
Spark plan and its SQL oracle cannot hide (the lesson of the r4 burst-detect
bug, where the oracle faithfully replayed a semantic error).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE


def _pq(table):
    return pd.read_parquet(f"{SF_SMOKE}/{table}.parquet")


def test_events_acf_matches_numpy(spark):
    from pyvectorsearch_spark.queries.timeseries_extra import q_events_acf

    got = {
        (r["event_type"], r["lag"]): (r["n"], r["acf_r"])
        for r in q_events_acf(spark, SF_SMOKE).collect()
    }
    ev = _pq("events")
    h = (ev["ts"].astype("datetime64[us]").astype("int64") // 10**6) // 3600
    for etype, grp in ev.groupby("event_type"):
        hh = h[grp.index]
        lo, hi = hh.min(), hh.max()
        y = np.zeros(hi - lo + 1, dtype=np.int64)
        np.add.at(y, (hh - lo).to_numpy(), 1)
        for lag in range(1, 7):
            x, z = y[: len(y) - lag].astype(float), y[lag:].astype(float)
            n, exp_r = len(x), 0.0
            den2 = (n * (x * x).sum() - x.sum() ** 2) * (
                n * (z * z).sum() - z.sum() ** 2
            )
            if den2 > 0:
                exp_r = (n * (x * z).sum() - x.sum() * z.sum()) / np.sqrt(den2)
            gn, gr = got[(etype, lag)]
            assert gn == n
            assert abs(gr - exp_r) < 1e-5, (etype, lag, gr, exp_r)


def test_cohort_ltv_matches_pandas(spark):
    from pyvectorsearch_spark.queries.funnel_extra import q_customer_cohort_ltv

    got = q_customer_cohort_ltv(spark, SF_SMOKE).toPandas()
    o = _pq("orders")
    o["yr"] = pd.to_datetime(o["o_orderdate"]).dt.year
    o["rc"] = (o["o_totalprice"] * 100).round().astype("int64")
    first = o.groupby("o_custkey")["yr"].min().rename("cohort")
    o = o.join(first, on="o_custkey")
    o["off"] = o["yr"] - o["cohort"]
    cells = o.groupby(["cohort", "off"]).agg(
        rev=("rc", "sum"), n_orders=("rc", "size"),
        n_active=("o_custkey", "nunique"),
    ).reset_index().sort_values(["cohort", "off"])
    cells["cum"] = cells.groupby("cohort")["rev"].cumsum()
    sz = first.value_counts().to_dict()
    assert len(got) == len(cells)
    for _, r in cells.iterrows():
        g = got[(got.cohort_year == r["cohort"]) & (got.year_offset == r["off"])]
        assert len(g) == 1
        g = g.iloc[0]
        assert g.n_orders == r["n_orders"] and g.n_active == r["n_active"]
        assert g.cohort_size == sz[r["cohort"]]
        assert abs(g.cum_revenue_r - r["cum"] / 100.0) < 0.011
        assert abs(g.ltv_per_customer_r - r["cum"] / (sz[r["cohort"]] * 100.0)) < 0.011


def test_ks_drift_matches_numpy(spark):
    from pyvectorsearch_spark.queries.quality_extra import (
        PSI_SPLIT_DAY,
        q_events_ks_drift,
    )

    got = {r["event_type"]: r for r in q_events_ks_drift(spark, SF_SMOKE).collect()}
    ev = _pq("events")
    ev["vc"] = (ev["value"] * 100).round().astype("int64")
    ev["cur"] = pd.to_datetime(ev["ts"]).dt.day >= PSI_SPLIT_DAY
    for etype, grp in ev.groupby("event_type"):
        a = np.sort(grp.loc[~grp.cur, "vc"].to_numpy())
        b = np.sort(grp.loc[grp.cur, "vc"].to_numpy())
        xs = np.unique(np.concatenate([a, b]))
        ca = np.searchsorted(a, xs, side="right")
        cb = np.searchsorted(b, xs, side="right")
        d = np.abs(ca / len(a) - cb / len(b)).max()
        r = got[etype]
        assert r["n_early"] == len(a) and r["n_late"] == len(b)
        assert abs(r["ks_d_r"] - d) < 1e-5, (etype, r["ks_d_r"], d)


def test_mad_outliers_matches_numpy(spark):
    from pyvectorsearch_spark.queries.skew_extra import q_orders_mad_outliers

    got = {r["o_orderpriority"]: r
           for r in q_orders_mad_outliers(spark, SF_SMOKE).collect()}
    o = _pq("orders")
    o["vc"] = (o["o_totalprice"] * 100).round().astype("int64")
    for prio, grp in o.groupby("o_orderpriority"):
        v = np.sort(grp["vc"].to_numpy())
        med = v[(len(v) + 1) // 2 - 1]  # lower median, rank floor((n+1)/2)
        dev = np.sort(np.abs(grp["vc"].to_numpy() - med))
        mad = dev[(len(dev) + 1) // 2 - 1]
        n_out = int((np.abs(grp["vc"] - med) > 3 * mad).sum())
        r = got[prio]
        assert r["n"] == len(v)
        assert abs(r["median_r"] - med / 100.0) < 1e-9
        assert abs(r["mad_r"] - mad / 100.0) < 1e-9
        assert r["n_outliers"] == n_out


def test_char_entropy_matches_numpy(spark):
    from pyvectorsearch_spark.queries.text_extra import (
        ENTROPY_ALPHABET,
        q_text_char_entropy,
    )

    got = {r["source"]: r for r in q_text_char_entropy(spark, SF_SMOKE).collect()}
    docs = _pq("documents")
    hs = {}
    for _, row in docs.iterrows():
        t = row["text"].lower()
        counts = np.array([t.count(s) for s in ENTROPY_ALPHABET], dtype=float)
        n = counts.sum()
        h = 0.0
        if n > 0:
            pos = counts[counts > 0]
            h = np.log2(n) - (pos * np.log2(pos)).sum() / n
        hs.setdefault(row["source"], []).append(h)
    for src, arr in hs.items():
        r = got[src]
        assert r["n_docs"] == len(arr)
        assert abs(r["avg_entropy_r"] - np.mean(arr)) < 1e-3
        assert abs(r["min_entropy_r"] - min(arr)) < 1e-4
        assert abs(r["max_entropy_r"] - max(arr)) < 1e-4


def test_assortativity_matches_pandas(spark):
    from pyvectorsearch_spark.operators.dedup import simhash_pairs
    from pyvectorsearch_spark.queries.dedup import MAX_HAMMING
    from pyvectorsearch_spark.queries.dedup_extra import q_dedup_assortativity
    from pyvectorsearch_spark.sources.tables import load_table, spread

    got = q_dedup_assortativity(spark, SF_SMOKE).collect()[0]
    docs = spread(load_table(spark, SF_SMOKE, "documents"))
    pairs = simhash_pairs(docs, max_hamming=MAX_HAMMING).toPandas()
    e = {tuple(sorted((a, b))) for a, b in zip(pairs.d1, pairs.d2) if a != b}
    deg = {}
    for a, b in e:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in e:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    x, y = np.array(xs, float), np.array(ys, float)
    m = len(x)
    den2 = (m * (x * x).sum() - x.sum() ** 2) * (m * (y * y).sum() - y.sum() ** 2)
    exp_r = 0.0
    if den2 > 0:
        exp_r = (m * (x * y).sum() - x.sum() * y.sum()) / np.sqrt(den2)
    assert got["n_edges"] == len(e)
    assert abs(got["assortativity_r"] - exp_r) < 1e-5


def test_rendezvous_matches_hashlib(spark):
    from pyvectorsearch_spark.queries.layout_extra import (
        HRW_NODES,
        HRW_SALT,
        q_layout_rendezvous,
    )

    got = q_layout_rendezvous(spark, SF_SMOKE).toPandas()
    docs = _pq("documents")
    counts = {n: 0 for n in range(HRW_NODES)}
    loads = {n: 0 for n in range(HRW_NODES)}
    for _, row in docs.iterrows():
        best, best_s = None, -1
        for node in range(HRW_NODES):
            key = f"{HRW_SALT}#{node}#{row['doc_id']}".encode()
            s = int(hashlib.md5(key).hexdigest()[:12], 16)
            if s > best_s:
                best, best_s = node, s
        counts[best] += 1
        loads[best] += int(row["n_chars"])
    for _, r in got.iterrows():
        assert counts[r["node"]] == r["n_keys"]
        assert loads[r["node"]] == r["bytes_load"]
    # every key assigned exactly once
    assert got["n_keys"].sum() == len(docs)


def test_chi2_matches_pandas(spark):
    from pyvectorsearch_spark.queries.audit_extra import q_audit_chi2_independence

    got = q_audit_chi2_independence(spark, SF_SMOKE).collect()[0]
    docs = _pq("documents")
    ct = pd.crosstab(docs["source"], docs["lang"])
    obs = ct.to_numpy().astype(float)
    n = obs.sum()
    exp = np.outer(obs.sum(axis=1), obs.sum(axis=0)) / n
    mask = obs > 0  # query iterates observed cells only
    chi2 = (((obs - exp) ** 2 / exp)[mask]).sum()
    assert got["n_cells"] == int(mask.sum())
    assert got["df"] == (obs.shape[0] - 1) * (obs.shape[1] - 1)
    assert abs(got["chi2_r"] - chi2) < 1e-3


@pytest.mark.parametrize(
    "mod,fn",
    [
        ("timeseries_extra", "q_events_acf"),
        ("funnel_extra", "q_customer_cohort_ltv"),
        ("quality_extra", "q_events_ks_drift"),
        ("skew_extra", "q_orders_mad_outliers"),
        ("text_extra", "q_text_char_entropy"),
        ("dedup_extra", "q_dedup_assortativity"),
        ("layout_extra", "q_layout_rendezvous"),
        ("audit_extra", "q_audit_chi2_independence"),
    ],
)
def test_wave3_schema_stable_across_sf(spark, mod, fn):
    """Schema must not depend on the data (the driver smoke-checks this)."""
    import importlib

    q = getattr(
        importlib.import_module(f"pyvectorsearch_spark.queries.{mod}"), fn
    )
    a = q(spark, SF_SMOKE).schema
    b = q(spark, "/root/testdata/sf0.01").schema
    assert a == b
