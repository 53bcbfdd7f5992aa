"""Spatial ε-distance join (outside the driver's pinned 50-entry window;
covered by tests/test_oracle_parity.py).

The reference's ``search_range`` (``/root/reference/include/pktree.hpp:
933-939``) answers one probe; the JOIN form — every pair of points within ε —
is the table-scale generalization (geo dedup, contact joins). Grid-bin
bucketing (``operators/spatial.py``) prunes physically; the exact fixed-fold
distance predicate decides, so the brute-force θ-join is a valid oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.functions.vector import duckdb_l2_sq
from pyvectorsearch_spark.operators.spatial import radius_self_join
from pyvectorsearch_spark.sources.tables import load_table

RADIUS = 0.02  # ~800 pairs at sf0.01 on the 2-d embedding projection


def q_spatial_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All unordered point pairs within L2 distance 0.02 on the first two
    embedding dims: one grid-bin equi-join (cells ≥ ε wide, 9× replication
    on one side), exact verify — no O(n²) pair enumeration anywhere."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .withColumn("p2", F.slice("embedding", 1, 2))
        .select("vec_id", "p2")
    )
    pairs = radius_self_join(emb, radius=RADIUS, dim=2, id_col="vec_id", vec_col="p2")
    return pairs.select(
        "d1", "d2", F.round("dist2", 9).alias("dist2_r")
    ).orderBy("d1", "d2")


_D2 = duckdb_l2_sq("a.embedding", "b.embedding", 2)

ORACLE_SPATIAL_RADIUS = f"""
SELECT a.vec_id AS d1, b.vec_id AS d2, round({_D2}, 9) AS dist2_r
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {_D2} <= {RADIUS * RADIUS!r}
ORDER BY d1, d2
"""


QUERIES = {"spatial_radius_join": q_spatial_radius_join}
ORACLES = {"spatial_radius_join": ORACLE_SPATIAL_RADIUS}


DBSCAN_EPS = 0.02
DBSCAN_MIN_PTS = 4


def q_spatial_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN (Ester et al. 1996) on the 2-d embedding projection — density
    clustering composed entirely from engine primitives (grid-bin ε-join +
    min-label components), every step an exact set-algebra predicate, so
    the FULL per-point labeling (core/border/noise + cluster id) is
    hash-checked against a recursive-CTE oracle."""
    from pyvectorsearch_spark.operators.clustering import dbscan

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .withColumn("p2", F.slice("embedding", 1, 2))
        .select("vec_id", "p2")
    )
    return dbscan(
        emb, eps=DBSCAN_EPS, min_pts=DBSCAN_MIN_PTS, dim=2,
        id_col="vec_id", vec_col="p2",
    ).orderBy("vec_id")


_DB_D2 = duckdb_l2_sq("a.embedding", "b.embedding", 2)

ORACLE_SPATIAL_DBSCAN = f"""
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS d1, b.vec_id AS d2
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE {_DB_D2} <= {DBSCAN_EPS * DBSCAN_EPS!r}
),
und AS (SELECT d1 AS p, d2 AS q FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
deg AS (SELECT p, count(*) AS d FROM und GROUP BY p),
cnt AS (
  SELECT e.vec_id AS p, coalesce(deg.d, 0) + 1 AS n_eps
  FROM embeddings e LEFT JOIN deg ON deg.p = e.vec_id
),
core AS (SELECT p FROM cnt WHERE n_eps >= {DBSCAN_MIN_PTS}),
ce AS (
  SELECT d1, d2 FROM pairs
  WHERE d1 IN (SELECT p FROM core) AND d2 IN (SELECT p FROM core)
),
ceund AS (SELECT d1 AS a, d2 AS b FROM ce UNION SELECT d2, d1 FROM ce),
reach(node, lbl) AS (
    SELECT a, a FROM ceund
  UNION
    SELECT e.a, r.lbl FROM ceund e JOIN reach r ON e.b = r.node
),
comp AS (SELECT node, min(lbl) AS cluster FROM reach GROUP BY node),
core_lbl AS (
  SELECT core.p, coalesce(comp.cluster, core.p) AS cluster
  FROM core LEFT JOIN comp ON comp.node = core.p
),
border AS (
  SELECT und.p, min(cl.cluster) AS cluster
  FROM und JOIN core_lbl cl ON cl.p = und.q
  WHERE und.p NOT IN (SELECT p FROM core)
  GROUP BY und.p
),
labeled AS (
  SELECT p, 'core' AS role, cluster FROM core_lbl
  UNION ALL
  SELECT p, 'border', cluster FROM border
)
SELECT e.vec_id, coalesce(l.role, 'noise') AS role, l.cluster
FROM embeddings e LEFT JOIN labeled l ON l.p = e.vec_id
ORDER BY e.vec_id
"""


QUERIES.update({"spatial_dbscan": q_spatial_dbscan})
ORACLES.update({"spatial_dbscan": ORACLE_SPATIAL_DBSCAN})
