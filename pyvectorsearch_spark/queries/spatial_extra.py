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
