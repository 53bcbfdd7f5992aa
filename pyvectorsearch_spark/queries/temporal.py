"""Temporal-join queries: as-of enrichment over the events table, checked
against DuckDB's native ASOF JOIN (an independent implementation of the
semantics — strongest oracle in the suite)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.operators.temporal import asof_join, interval_join
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



def q_interval_order_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join, bucketed (no nested loop): for each
    high-value order, how many lineitems (across ALL orders) shipped in the
    7 days starting at its order date, and their total quantity. The oracle
    is DuckDB's native inequality join (IEJoin) — an independent
    implementation of band-join semantics."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    intervals = orders.filter(F.col("o_totalprice") > 400000).select(
        "o_orderkey",
        F.col("o_orderdate").alias("start"),
        F.date_add("o_orderdate", 7).cast("timestamp").alias("end"),
    )
    # Aggregation pushdown BELOW the band join: shipdates and interval
    # bounds are both midnight-aligned, so summarizing lineitems per day
    # first is exact and shrinks the join from |lineitem|x(intervals/bucket)
    # pairs to 8 day-rows per interval (measured 11s -> ~1s at sf0.1).
    daily = lineitem.groupBy(F.col("l_shipdate").alias("ts")).agg(
        F.count("*").alias("n_day"), F.sum("l_quantity").alias("qty_day")
    )
    joined = interval_join(
        daily, intervals, point_ts="ts", bucket_seconds=7 * 86400.0
    )
    return joined.groupBy("o_orderkey").agg(
        F.sum("n_day").alias("n_shipped"),
        F.round(F.sum("qty_day"), 6).alias("total_qty"),
    )


ORACLE_INTERVAL = """
SELECT o.o_orderkey,
       count(*) AS n_shipped,
       round(sum(l.l_quantity), 6) AS total_qty
FROM (SELECT * FROM orders WHERE o_totalprice > 400000) o
JOIN lineitem l
  ON l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate <= o.o_orderdate + INTERVAL 7 DAY
GROUP BY o.o_orderkey
"""

QUERIES = {
    "asof_purchase_click": q_asof_purchase_click,
    "interval_order_shipments": q_interval_order_shipments,
}
ORACLES = {
    "asof_purchase_click": ORACLE_ASOF,
    "interval_order_shipments": ORACLE_INTERVAL,
}
