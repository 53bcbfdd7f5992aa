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


CITIES_CSV = "/root/reference/example_cpp/dutch_cities.csv"
DELFT = (52.0117, 4.3592)
CITIES_K = 5
CITIES_R = 0.1


def q_cities_example(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE REFERENCE'S OWN EXAMPLE WORKLOAD as a registered query
    (`example_cpp/main.cpp:68-85`): read the Dutch-cities CSV, index the
    (lat, lng) points, and answer both probes from Delft's coordinates —
    the 5 nearest cities (kNN, sorted) and every city within radius 0.1
    (range) — in one result, tagged by probe kind. Grid-pruned search is
    exact, so the oracle brute-forces the same CSV in DuckDB. Ids derive
    from md5(city) so ranking tie-breaks are engine-stable (the example's
    row order is not a contract)."""
    from pyvectorsearch_spark.index.grid import GridIndex
    from pyvectorsearch_spark.sources.tables import load_cities_csv

    cities = (
        load_cities_csv(spark, CITIES_CSV)
        .withColumn(
            "pt_id",
            F.conv(F.substring(F.md5("city"), 1, 12), 16, 10).cast("bigint"),
        )
        .withColumn("pt", F.array(F.col("lat"), F.col("lng")).cast("array<double>"))
        .select("pt_id", "pt", "city")
    )
    idx = GridIndex.build(cities, vec_col="pt", id_col="pt_id", target_occupancy=8)
    probe = spark.createDataFrame(
        [(0, [float(DELFT[0]), float(DELFT[1])])], "query_id long, qvec array<double>"
    )
    knn = idx.knn(probe, CITIES_K, payload=["city"]).select(
        F.lit("knn").alias("probe"),
        "city",
        F.round("dist", 6).alias("dist_sq"),
        F.col("rank").cast("int").alias("rank"),
    )
    rng = idx.range(probe, CITIES_R, payload=["city"]).select(
        F.lit("range").alias("probe"),
        "city",
        F.round("dist", 6).alias("dist_sq"),
        F.lit(None).cast("int").alias("rank"),
    )
    return knn.unionByName(rng).orderBy("probe", "dist_sq", "city")


ORACLE_CITIES_EXAMPLE = f"""
WITH c AS (
  SELECT city,
         ('0x' || substr(md5(city), 1, 12))::BIGINT AS pt_id,
         CAST(lat AS DOUBLE) AS lat, CAST(lng AS DOUBLE) AS lng
  FROM read_csv('{CITIES_CSV}', header = true)
),
d AS (
  SELECT city, pt_id,
         (lat - {DELFT[0]!r}) ^ 2 + (lng - {DELFT[1]!r}) ^ 2 AS d2
  FROM c
),
knn AS (
  SELECT 'knn' AS probe, city, round(d2, 6) AS dist_sq,
         row_number() OVER (ORDER BY d2 ASC, pt_id ASC)::INT AS rank
  FROM d QUALIFY rank <= {CITIES_K}
),
rng AS (
  SELECT 'range' AS probe, city, round(d2, 6) AS dist_sq, NULL::INT AS rank
  FROM d WHERE d2 <= {CITIES_R * CITIES_R!r}
)
SELECT * FROM knn UNION ALL SELECT * FROM rng
ORDER BY probe, dist_sq, city
"""

QUERIES.update({"cities_example": q_cities_example})
ORACLES.update({"cities_example": ORACLE_CITIES_EXAMPLE})


# --- geohash cell rollup ----------------------------------------------------

GEOHASH_P = 2


def q_spatial_geohash_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash-cell rollup over the 2-d embedding projection mapped to
    (lat, lng) = (y*90, x*180): per precision-2 cell, point count and the
    centroid. The encoder (``functions/geo.py``) is ONE generated SQL
    expression — closed-form quantize + bit-interleave + base32, no UDF —
    evaluated verbatim by both engines, and it folds into the scan-stage
    projection: at 100 TB the cell id is a free GROUP BY / equi-join key
    (the geo twin of the grid index's cell labeling,
    ``/root/reference/include/pktree.hpp:418-511``'s level arithmetic)."""
    from pyvectorsearch_spark.functions.geo import (
        geohash_chars_sql,
        geohash_interleave_sql,
        geohash_quant_sql,
    )

    latq, lngq = geohash_quant_sql("lat", "lng", GEOHASH_P)
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            (F.element_at("embedding", 2).cast("double") * 90.0).alias("lat"),
            (F.element_at("embedding", 1).cast("double") * 180.0).alias("lng"),
        )
        .withColumn("latq", F.expr(latq))
        .withColumn("lngq", F.expr(lngq))
        .withColumn("ghi", F.expr(geohash_interleave_sql("latq", "lngq", GEOHASH_P)))
        .withColumn("cell", F.expr(geohash_chars_sql("ghi", GEOHASH_P)))
    )
    return (
        emb.groupBy("cell")
        .agg(
            F.count("*").cast("bigint").alias("n_points"),
            F.round(F.avg("lat"), 6).alias("lat_c"),
            F.round(F.avg("lng"), 6).alias("lng_c"),
        )
        .orderBy("cell")
    )


def _geohash_oracle() -> str:
    from pyvectorsearch_spark.functions.geo import (
        geohash_chars_sql,
        geohash_interleave_sql,
        geohash_quant_sql,
    )

    latq, lngq = geohash_quant_sql("lat", "lng", GEOHASH_P)
    return f"""
WITH pts AS (
  SELECT vec_id, CAST(embedding[2] AS DOUBLE) * 90.0 AS lat,
         CAST(embedding[1] AS DOUBLE) * 180.0 AS lng
  FROM embeddings
), q AS (
  SELECT vec_id, lat, lng, {latq} AS latq, {lngq} AS lngq FROM pts
), ileave AS (
  SELECT vec_id, lat, lng,
         {geohash_interleave_sql('latq', 'lngq', GEOHASH_P)} AS ghi
  FROM q
), cells AS (
  SELECT vec_id, lat, lng, {geohash_chars_sql('ghi', GEOHASH_P)} AS cell
  FROM ileave
)
SELECT cell, count(*)::BIGINT AS n_points,
       round(avg(lat), 6) AS lat_c, round(avg(lng), 6) AS lng_c
FROM cells GROUP BY cell ORDER BY cell
"""


QUERIES.update({"spatial_geohash_agg": q_spatial_geohash_agg})
ORACLES.update({"spatial_geohash_agg": _geohash_oracle()})
