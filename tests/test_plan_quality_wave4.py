"""Plan-shape pins for the wave 4-16 analytics: no cartesian products
anywhere, aggregate-before-window where the docstrings promise it, and
broadcast-only literal fan-outs."""

from __future__ import annotations

import pytest

from pyvectorsearch_spark.plans import count_exchanges, explain_str
from tests.conftest import SF_SMOKE


def _q(mod, fn):
    import importlib

    return getattr(
        importlib.import_module(f"pyvectorsearch_spark.queries.{mod}"), fn
    )


# every query here promises: no CartesianProduct in the physical plan
NO_CARTESIAN = [
    ("timeseries_extra", "q_events_haar_energy"),
    ("timeseries_extra", "q_events_type_correlation"),
    ("timeseries_extra", "q_events_burstiness"),
    ("timeseries_extra", "q_events_mann_kendall"),
    ("timeseries_extra", "q_events_ccf_leadlag"),
    ("funnel_extra", "q_customer_survival_km"),
    ("funnel_extra", "q_events_transition_drift"),
    ("funnel_extra", "q_events_dau_mau"),
    ("skew_extra", "q_orders_bootstrap_ci"),
    ("analytic_extra", "q_orders_littles_law"),
    ("analytic_extra", "q_order_lifecycle"),
    ("analytic_extra", "q_orders_mom_growth"),
    ("analytic_extra", "q_part_abc_classes"),
    ("audit_extra", "q_audit_price_digits"),
    ("audit_extra", "q_audit_duplicate_invoices"),
    ("sampling_extra", "q_sample_neyman_allocation"),
    ("sampling_extra", "q_sample_mixture_ess"),
    ("quality_extra", "q_corpus_diversity"),
    ("quality_extra", "q_events_ab_test"),
    ("quality_extra", "q_documents_crosstab"),
    ("text_lm", "q_text_heaps_law"),
    ("text_lm", "q_text_yule_k"),
    ("text_lm", "q_text_loglikelihood_terms"),
    ("text_extra", "q_text_vocab_overlap"),
    ("relational", "customer_tree_depth"),
    ("relational", "status_unpivot_roundtrip"),
    ("sketch_extra", "q_sketch_ams_f2"),
    ("text_rank", "q_text_rbo_topterms"),
    ("quality_wave3", "q_events_ks_bh_fdr"),
    ("timeseries_extra", "q_events_periodogram"),
    ("text_extra", "q_text_lix"),
    ("scd_extra", "q_scd2_asof_enrich"),
    ("sampling_extra", "q_sample_group_kfold"),
]


@pytest.mark.parametrize("mod,fn", NO_CARTESIAN)
def test_no_cartesian_product(spark, mod, fn):
    df = _q(mod, fn)(spark, SF_SMOKE)
    s = explain_str(df)
    assert "CartesianProduct" not in s, s[:2000]


def test_burstiness_window_is_user_partitioned(spark):
    """The gap window must partition by (type, user) — bounded per-user
    state, never a global sort of events."""
    df = _q("timeseries_extra", "q_events_burstiness")(spark, SF_SMOKE)
    s = explain_str(df)
    assert "Window" in s
    # a global (unpartitioned) window over raw events would warn and show
    # 'Window [...]' without partition spec; pin the partitioned form
    assert "windowspecdefinition(event_type" in s.replace(" ", "") or \
        "partitionBy" in s or "event_type" in s[s.index("Window"):][:600]


def test_survival_km_windows_over_histogram(spark):
    """Risk sets come from the durations HISTOGRAM (aggregate feeds the
    ordered walk), never a per-customer sort."""
    df = _q("funnel_extra", "q_customer_survival_km")(spark, SF_SMOKE)
    s = explain_str(df)
    assert "partial_count" in s or "partial_sum" in s, s[:3000]
    assert "Window" in s


def test_bootstrap_replica_axis_is_broadcast(spark):
    """The 64-replica fan-out must be a broadcast nested-loop of a literal
    range, not a shuffled join."""
    df = _q("skew_extra", "q_orders_bootstrap_ci")(spark, SF_SMOKE)
    s = explain_str(df)
    assert "BroadcastNestedLoopJoin" in s, s[:2000]


def test_ams_f2_sketch_path_never_groups_by_user(spark):
    """The estimate branch must be a map-side sum per sketch id (16 rows),
    with the only per-user rollup in the exact-truth branch."""
    df = _q("sketch_extra", "q_sketch_ams_f2")(spark, SF_SMOKE)
    s = explain_str(df)
    assert "partial_sum" in s, s[:3000]


def test_dau_mau_range_join_is_on_cells(spark):
    """The WAU range join pairs the day spine with distinct (user, day)
    CELLS — the raw events table must collapse via HashAggregate first."""
    df = _q("funnel_extra", "q_events_dau_mau")(spark, SF_SMOKE)
    s = explain_str(df)
    assert "HashAggregate" in s
