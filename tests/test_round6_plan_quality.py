"""Round-6 plan-shape pins: the 100 TB contracts of the new queries.

- geohash: the whole encoder folds into the scan-stage projection — the
  plan is scan -> partial agg -> ONE exchange -> final agg, no joins.
- seq rules: no cartesian product; the pattern join runs AFTER the
  per-(session, type) reduction, and the tiny 1-gram support tables
  broadcast.
- conformal: the seasonal lag, split ranking, and order statistic all
  ride event_type exchanges — bounded, and no cartesian.
- matrix profile: the d-expansion must NOT become a cartesian product —
  it is an equi-join on (type, be + d*3600).
- RAKE: word/phrase rollups are map-side combined (partial aggregates).
"""

from __future__ import annotations

from pyvectorsearch_spark.plans import count_exchanges, explain_str
from tests.conftest import SF_SMOKE


def _no_cartesian(df):
    s = explain_str(df)
    assert "CartesianProduct" not in s and "BroadcastNestedLoop" not in s, s[:2000]


def test_geohash_single_exchange_no_join(spark):
    from pyvectorsearch_spark.queries.spatial_extra import q_spatial_geohash_agg

    df = q_spatial_geohash_agg(spark, SF_SMOKE)
    s = explain_str(df)
    assert "Join" not in s, s[:2000]
    # one exchange for the groupBy, one for the final orderBy
    assert count_exchanges(df) <= 2, s[:2000]
    assert "HashAggregate" in s  # partial + final around the exchange


def test_seq_rules_no_cartesian_broadcast_supports(spark):
    from pyvectorsearch_spark.queries.funnel_extra import q_session_seq_rules

    df = q_session_seq_rules(spark, SF_SMOKE)
    _no_cartesian(df)
    assert "BroadcastHashJoin" in explain_str(df)


def test_conformal_no_cartesian(spark):
    from pyvectorsearch_spark.queries.timeseries_extra import (
        q_events_conformal_forecast,
    )

    df = q_events_conformal_forecast(spark, SF_SMOKE)
    _no_cartesian(df)


def test_matrix_profile_band_is_equijoin(spark):
    from pyvectorsearch_spark.queries.timeseries_extra import (
        q_events_matrix_profile,
    )

    df = q_events_matrix_profile(spark, SF_SMOKE)
    _no_cartesian(df)


def test_rake_mapside_combine(spark):
    from pyvectorsearch_spark.queries.text_extra import q_text_rake

    df = q_text_rake(spark, SF_SMOKE)
    _no_cartesian(df)
    assert "HashAggregate" in explain_str(df)


def test_privacy_tclose_frame_sized_joins(spark):
    from pyvectorsearch_spark.queries.audit_extra import q_privacy_t_closeness

    df = q_privacy_t_closeness(spark, SF_SMOKE)
    # the only cross join is segments x bands (both tiny dimension sets);
    # it must be a broadcast nested loop over dimension aggregates, never
    # over the fact table — assert the fact scan feeds an aggregate first
    s = explain_str(df)
    assert "HashAggregate" in s
