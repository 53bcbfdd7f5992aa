"""Sketch queries (outside the driver's pinned 50-entry window; covered by
tests/test_oracle_parity.py against the same DuckDB oracles).

Operators exercised: `operators/sketches.py::kmv_distinct` — the
deterministic KMV distinct-count sketch, which unlike HLL is bit-identical
across engines and therefore oracle-checkable end to end (estimate included).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyvectorsearch_spark.operators.sketches import duckdb_kmv_hash, kmv_distinct
from pyvectorsearch_spark.sources.tables import load_table, spread

KMV_K = 32


def q_sketch_kmv_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-user estimate per event type (k=32, under the true
    ~150-user cardinality, so the ESTIMATION path runs — not the
    exact-below-capacity fallback). Exact distinct rides along as the
    accuracy reference."""
    ev = spread(load_table(spark, sf_dir, "events"))
    return kmv_distinct(ev, by="event_type", value_col="user_id", k=KMV_K).orderBy(
        "event_type"
    )


_U = duckdb_kmv_hash("user_id")

ORACLE_SKETCH_KMV_USERS = f"""
WITH d AS (
  SELECT DISTINCT event_type, {_U} AS u FROM events
),
ranked AS (
  SELECT event_type, u,
         row_number() OVER (PARTITION BY event_type ORDER BY u) AS r
  FROM d
),
mins AS (
  SELECT event_type, max(CASE WHEN r = {KMV_K} THEN u END) AS u_k
  FROM ranked GROUP BY event_type
),
tot AS (
  SELECT event_type, count(*)::BIGINT AS n_distinct_exact FROM d
  GROUP BY event_type
)
SELECT event_type, n_distinct_exact,
       CASE WHEN u_k IS NOT NULL THEN round(({KMV_K} - 1) / u_k, 3)
            ELSE n_distinct_exact::DOUBLE END AS kmv_estimate,
       round(u_k, 9) AS u_k
FROM tot JOIN mins USING (event_type)
ORDER BY event_type
"""


QUERIES = {"sketch_kmv_users": q_sketch_kmv_users}
ORACLES = {"sketch_kmv_users": ORACLE_SKETCH_KMV_USERS}
