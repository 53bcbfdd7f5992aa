"""Event-sequence analytics queries: funnel conversion + cohort retention
(outside the driver's pinned 50-entry window; covered by
tests/test_oracle_parity.py against the same DuckDB oracles).

Operators exercised: `operators/funnel.py::funnel_conversion` /
`retention_cohorts` (north-star extensions — the reference has no event
processing; these are the product-analytics companions to `sessionize_events`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyvectorsearch_spark.operators.funnel import funnel_conversion, retention_cohorts
from pyvectorsearch_spark.sources.tables import load_table, spread

FUNNEL_STEPS = ["view", "click", "purchase"]


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase strict sequential funnel: per-step reach and
    conversion rates over the events stream."""
    ev = spread(load_table(spark, sf_dir, "events"))
    return funnel_conversion(ev, FUNNEL_STEPS)


ORACLE_EVENT_FUNNEL = """
WITH e1 AS (
  SELECT user_id, event_type, ts,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t0
  FROM events
),
e2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts >= t0 THEN ts END)
              OVER (PARTITION BY user_id) AS t1
  FROM e1
),
e3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= t1 THEN ts END)
              OVER (PARTITION BY user_id) AS t2
  FROM e2
),
u AS (SELECT DISTINCT user_id, t0, t1, t2 FROM e3),
agg AS (
  SELECT count(*)::BIGINT AS n_users,
         count(t0)::BIGINT AS n_view,
         count(t1)::BIGINT AS n_click,
         count(t2)::BIGINT AS n_purchase
  FROM u
)
SELECT n_users, n_view, n_click, n_purchase,
       round(n_click / greatest(n_view, 1)::DOUBLE, 6) AS conv_view_click,
       round(n_purchase / greatest(n_click, 1)::DOUBLE, 6) AS conv_click_purchase,
       round(n_purchase / greatest(n_view, 1)::DOUBLE, 6) AS conv_overall
FROM agg
"""


def q_event_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-cohort retention triangle: distinct active users per (first-event
    cohort date, day offset)."""
    from pyspark.sql import functions as F

    ev = spread(load_table(spark, sf_dir, "events"))
    # cohort as ISO string: DuckDB DATE surfaces as pandas Timestamp through
    # the driver's compare, Spark's as datetime.date — stringify both sides
    return (
        retention_cohorts(ev)
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort"),
            "day_offset",
            "n_users",
        )
        .orderBy("cohort", "day_offset")
    )


ORACLE_EVENT_RETENTION = """
WITH d AS (
  SELECT user_id, ts::DATE AS day,
         min(ts::DATE) OVER (PARTITION BY user_id) AS cohort
  FROM events
)
SELECT CAST(cohort AS VARCHAR) AS cohort,
       date_diff('day', cohort, day)::INT AS day_offset,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM d GROUP BY cohort, day_offset ORDER BY cohort, day_offset
"""


QUERIES = {
    "event_funnel": q_event_funnel,
    "event_retention": q_event_retention,
}
ORACLES = {
    "event_funnel": ORACLE_EVENT_FUNNEL,
    "event_retention": ORACLE_EVENT_RETENTION,
}
