"""Plan-shape pins for the round-4 wave-3 analytics: each docstring's scale
contract asserted on the optimized physical plan."""

from __future__ import annotations

from pyvectorsearch_spark.plans import count_exchanges, explain_str
from tests.conftest import SF_SMOKE


def test_char_entropy_single_rollup(spark):
    """Per-doc entropy is a scan-stage expression — the only exchange is
    the sources-sized rollup (partial+final aggregate pair)."""
    from pyvectorsearch_spark.queries.text_extra import q_text_char_entropy

    df = q_text_char_entropy(spark, SF_SMOKE)
    s = explain_str(df)
    # rollup exchange + the presentation-sort range exchange, nothing else
    assert count_exchanges(df) <= 2, s[:2000]
    assert "partial_count" in s or "partial_sum" in s, s[:3000]


def test_readability_single_rollup(spark):
    """Flesch scoring pipelines in the scan stage; one rollup exchange."""
    from pyvectorsearch_spark.queries.text_extra import q_text_readability

    df = q_text_readability(spark, SF_SMOKE)
    # rollup exchange + the presentation-sort range exchange, nothing else
    assert count_exchanges(df) <= 2, explain_str(df)[:2000]


def test_mad_outliers_windows_over_histogram(spark):
    """Both median ladders window over the (priority, cents) HISTOGRAM:
    the plan must aggregate (partial_count map-side) before every Window,
    and no Window may consume the raw orders scan directly."""
    from pyvectorsearch_spark.queries.skew_extra import q_orders_mad_outliers

    df = q_orders_mad_outliers(spark, SF_SMOKE)
    s = explain_str(df)
    assert "partial_count" in s, s[:3000]
    assert "Window" in s, s[:2000]


def test_ks_drift_aggregates_before_window(spark):
    """The ECDF window orders distinct (type, cent) cells, never raw
    events: a map-side-combined aggregate must sit below the Window."""
    from pyvectorsearch_spark.queries.quality_extra import q_events_ks_drift

    df = q_events_ks_drift(spark, SF_SMOKE)
    s = explain_str(df)
    assert "partial_sum" in s, s[:3000]
    assert "Window" in s, s[:2000]


def test_acf_no_cartesian_on_facts(spark):
    """The lag fan-out crossJoin pairs the HOURLY GRID with a 6-row
    broadcast literal — no cartesian/nested-loop join over raw events."""
    from pyvectorsearch_spark.queries.timeseries_extra import q_events_acf

    df = q_events_acf(spark, SF_SMOKE)
    s = explain_str(df)
    assert "CartesianProduct" not in s, s[:2000]
    assert "BroadcastNestedLoopJoin" in s, s[:2000]  # the 6-row lag table


def test_rendezvous_node_axis_is_broadcast(spark):
    """The HRW node fan-out must be a broadcast nested-loop of the 8-row
    node table, not a shuffled cartesian."""
    from pyvectorsearch_spark.queries.layout_extra import q_layout_rendezvous

    df = q_layout_rendezvous(spark, SF_SMOKE)
    s = explain_str(df)
    assert "CartesianProduct" not in s, s[:2000]
    assert "BroadcastNestedLoopJoin" in s, s[:2000]


def test_merkle_ranges_map_side_combine(spark):
    """One map-side-combined aggregate; the max-key lookup is a 1-row
    broadcast, so there is no extra fact-table shuffle."""
    from pyvectorsearch_spark.queries.audit_extra import q_audit_merkle_ranges

    df = q_audit_merkle_ranges(spark, SF_SMOKE)
    s = explain_str(df)
    assert "partial_count" in s, s[:3000]
    assert "CartesianProduct" not in s, s[:2000]


def test_cohort_ltv_window_over_cells(spark):
    """The cumulative-revenue window runs over cohort×offset CELLS (an
    aggregate feeds the Window), and the window partitions by cohort —
    no global single-partition sort."""
    from pyvectorsearch_spark.queries.funnel_extra import q_customer_cohort_ltv

    df = q_customer_cohort_ltv(spark, SF_SMOKE)
    s = explain_str(df)
    assert "Window" in s, s[:2000]
    assert "partial_sum" in s, s[:3000]


def test_heaps_law_single_global_window_over_doc_cells(spark):
    """Heaps: the ordered cumulative window consumes per-DOC cells (one
    row per doc), not per-token rows — token explode must collapse via a
    map-side-combined aggregate first."""
    from pyvectorsearch_spark.queries.text_lm import q_text_heaps_law

    df = q_text_heaps_law(spark, SF_SMOKE)
    s = explain_str(df)
    assert "Window" in s, s[:2000]
    assert "partial_min" in s or "partial_count" in s, s[:3000]


def test_chi2_margins_are_cell_sized(spark):
    """Chi-square: margins and the worst-cell argmax all derive from the
    contingency CELL table; the only fact-table exchange is the first
    contingency rollup."""
    from pyvectorsearch_spark.queries.audit_extra import (
        q_audit_chi2_independence,
    )

    df = q_audit_chi2_independence(spark, SF_SMOKE)
    s = explain_str(df)
    assert "CartesianProduct" not in s, s[:2000]
    assert "partial_count" in s, s[:3000]
