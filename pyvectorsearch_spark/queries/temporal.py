"""Temporal-join queries: as-of enrichment over the events table, checked
against DuckDB's native ASOF JOIN (an independent implementation of the
semantics — strongest oracle in the suite)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.operators.temporal import asof_join
from pyvectorsearch_spark.sources.tables import load_table


def q_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich every purchase with the user's most recent prior-or-equal
    click (id and value); purchases with no prior click keep NULLs."""
    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"), "value"
    )
    out = asof_join(
        left, right, on="ts", by="user_id", right_cols=["click_id", "value"]
    )
    # no-match sentinels (not NULL): NULL floats hash engine-dependently
    return out.select(
        "event_id",
        "user_id",
        F.coalesce(F.col("click_id_right"), F.lit(-1)).alias("click_id"),
        F.coalesce(F.round("value_right", 6), F.lit(-1.0)).alias("click_value"),
    )


ORACLE_ASOF = """
SELECT l.event_id, l.user_id,
       coalesce(r.event_id, -1) AS click_id,
       coalesce(round(r.value, 6), -1.0) AS click_value
FROM (SELECT * FROM events WHERE event_type='purchase') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='click') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""

QUERIES = {"asof_purchase_click": q_asof_purchase_click}
ORACLES = {"asof_purchase_click": ORACLE_ASOF}
