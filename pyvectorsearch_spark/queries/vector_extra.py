"""Supplementary vector-search contract queries (registered past the
driver's 50-entry window; locally oracle-verified by test_oracle_parity).
Currently: the distributed-candidate RANGE path over a query table — the
ε-range twin of ``knn_grid_query_table``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.functions.vector import duckdb_l2_sq
from pyvectorsearch_spark.index.cache import build_or_load
from pyvectorsearch_spark.sources.tables import dataset_tag, load_table

RADIUS = 0.15
N_SHIFTS = 20


def q_range_grid_query_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-range search for a query TABLE through the grid index with
    DISTRIBUTED candidate selection (cells with min-distance ≤ r² picked per
    query inside the plan — the reject case of pktree.hpp:1161-1163 — never
    ``queries.collect()``). Probes: 20 shifted copies of every base vector
    (10,000 at sf0.01). Exact ⇒ brute-force SQL oracle."""
    from pyvectorsearch_spark.index.grid import GridIndex

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .withColumn("p2", F.slice("embedding", 1, 2))
        .select("vec_id", "p2")
    )
    probes = emb.crossJoin(
        spark.range(N_SHIFTS).select(F.col("id").alias("s"))
    ).select(
        (F.col("vec_id") * N_SHIFTS + F.col("s")).alias("query_id"),
        F.array(
            F.element_at("p2", 1).cast("double") + F.col("s") * F.lit(0.01),
            F.element_at("p2", 2).cast("double") - F.col("s") * F.lit(0.01),
        ).alias("qvec"),
    )
    idx = build_or_load(
        spark,
        f"grid2d_occ16_{dataset_tag(sf_dir, 'embeddings')}",
        load=GridIndex.load,
        build=lambda: GridIndex.build(
            emb, vec_col="p2", id_col="vec_id", target_occupancy=16
        ),
    )
    out = idx.range(probes, radius=RADIUS, candidates="distributed")
    return out.select(
        "query_id", "neighbor_id", F.round("dist", 6).alias("dist_sq")
    )


_D2 = duckdb_l2_sq("q.qvec", "e.p2", 2)

ORACLE_RANGE_GRID_QUERY_TABLE = f"""
WITH base AS (SELECT vec_id, embedding[1:2] AS p2 FROM embeddings),
q AS (
  SELECT vec_id * {N_SHIFTS} + s AS query_id,
         [CAST(p2[1] AS DOUBLE) + s * 0.01,
          CAST(p2[2] AS DOUBLE) - s * 0.01] AS qvec
  FROM base, (SELECT unnest(range(0, {N_SHIFTS})) AS s)
)
SELECT q.query_id, e.vec_id AS neighbor_id, round({_D2}, 6) AS dist_sq
FROM q CROSS JOIN base e
WHERE {_D2} <= {RADIUS} * {RADIUS}
"""


QUERIES = {"range_grid_query_table": q_range_grid_query_table}
ORACLES = {"range_grid_query_table": ORACLE_RANGE_GRID_QUERY_TABLE}
