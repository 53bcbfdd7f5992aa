"""Vector-search queries with DuckDB oracles — the reference's query surface
(exact kNN + ε-range, ``/root/reference/include/pktree.hpp:948-973,933-939``)
run as Spark DataFrame plans over the driver's ``embeddings`` table.

Probe set: the first ``N_PROBES`` vectors of the table itself (deterministic,
no synthesized data). Distances are double, computed with identical
accumulation order in Spark and DuckDB, rounded to 6 dp only in the projected
output (ordering uses full precision; ties broken by neighbor_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.functions.vector import duckdb_l2_sq
from pyvectorsearch_spark.operators.knn import knn_join_blocked, range_join, topk_global
from pyvectorsearch_spark.index.cache import build_or_load
from pyvectorsearch_spark.sources.tables import dataset_tag, load_table

DIM = 64
N_PROBES = 8
K = 5
RADIUS = 1.1  # Euclidean; reference squares it internally (pktree.hpp:938)


def _probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch exact kNN (search_knn analog, pktree.hpp:948-973) — blocked
    scale path (per-partition numpy top-k, window over candidates only)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = knn_join_blocked(emb, _probes(spark, sf_dir), K)
    return out.select(
        "query_id", "neighbor_id", F.round("dist", 6).alias("dist_sq"), "rank"
    )


def q_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ε-range search (search_range analog, pktree.hpp:933-939)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = range_join(emb, _probes(spark, sf_dir), RADIUS)
    return out.select("query_id", "neighbor_id", F.round("dist", 6).alias("dist_sq"))


def q_knn_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-probe top-k via TakeOrderedAndProject (example_cpp usage:
    one key, k=5, sorted — main.cpp:68-72). Probe = all-zeros vector."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = topk_global(emb, [0.0] * DIM, 10, payload=["label"])
    return out.select(
        "neighbor_id", F.round("dist", 6).alias("dist_sq"), "label"
    )


def q_vector_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label aggregate over a vector expression (norms) — exercises the
    array kernels inside groupBy/agg."""
    from pyvectorsearch_spark.functions.vector import dot

    emb = load_table(spark, sf_dir, "embeddings")
    norms = emb.withColumn("norm_sq", dot("embedding", "embedding"))
    return (
        norms.groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("norm_sq"), 6).alias("avg_norm_sq"),
            F.round(F.min("norm_sq"), 6).alias("min_norm_sq"),
            F.round(F.max("norm_sq"), 6).alias("max_norm_sq"),
        )
        .orderBy("label")
    )


def q_knn_grid_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-index-accelerated exact kNN on the first two embedding dims —
    the PK-tree path (cell pruning; results provably equal brute force, so
    the brute-force SQL is a valid oracle)."""
    from pyvectorsearch_spark.index.grid import GridIndex

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .withColumn("p2", F.slice("embedding", 1, 2))
        .select("vec_id", "p2")
    )
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("query_id"), F.col("p2").alias("qvec")
    )
    idx = build_or_load(
        spark,
        f"grid2d_occ16_{dataset_tag(sf_dir, 'embeddings')}",
        load=GridIndex.load,
        build=lambda: GridIndex.build(
            emb, vec_col="p2", id_col="vec_id", target_occupancy=16
        ),
    )
    out = idx.knn(probes, K)
    return out.select(
        "query_id", "neighbor_id", F.round("dist", 6).alias("dist_sq"), "rank"
    )


_D2 = duckdb_l2_sq("q.qvec", "e.p2", 2)

ORACLE_KNN_GRID_2D = f"""
WITH base AS (SELECT vec_id, embedding[1:2] AS p2 FROM embeddings),
q AS (SELECT vec_id AS query_id, p2 AS qvec FROM base WHERE vec_id < {N_PROBES}),
pairs AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, {_D2} AS d
  FROM q CROSS JOIN base e
), ranked AS (
  SELECT query_id, neighbor_id, d,
         row_number() OVER (PARTITION BY query_id ORDER BY d, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, round(d, 6) AS dist_sq, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {K}
"""

def q_range_grid_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-index-accelerated exact ε-range search on the first two embedding
    dims (search_range analog, pktree.hpp:933-939, with the fully-inside /
    partial cell classification of :1161-1171). Exact ⇒ brute-force oracle."""
    from pyvectorsearch_spark.index.grid import GridIndex

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .withColumn("p2", F.slice("embedding", 1, 2))
        .select("vec_id", "p2")
    )
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("query_id"), F.col("p2").alias("qvec")
    )
    idx = build_or_load(
        spark,
        f"grid2d_occ16_{dataset_tag(sf_dir, 'embeddings')}",
        load=GridIndex.load,
        build=lambda: GridIndex.build(
            emb, vec_col="p2", id_col="vec_id", target_occupancy=16
        ),
    )
    out = idx.range(probes, radius=0.15)
    return out.select(
        "query_id", "neighbor_id", F.round("dist", 6).alias("dist_sq")
    )


ORACLE_RANGE_GRID_2D = f"""
WITH base AS (SELECT vec_id, embedding[1:2] AS p2 FROM embeddings),
q AS (SELECT vec_id AS query_id, p2 AS qvec FROM base WHERE vec_id < {N_PROBES})
SELECT q.query_id, e.vec_id AS neighbor_id, round({_D2}, 6) AS dist_sq
FROM q CROSS JOIN base e
WHERE {_D2} <= 0.15 * 0.15
"""


def q_knn_grid_query_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-TABLE kNN through the grid index with fully DISTRIBUTED
    candidate selection: per-query cell pruning runs as a Spark plan (window
    over the broadcast stats), never ``queries.collect()`` — the path for
    10⁶-probe workloads. Probes: 20 deterministic shifted copies of every
    base vector (10,000 probes at sf0.01). Exact ⇒ brute-force SQL oracle."""
    from pyvectorsearch_spark.index.grid import GridIndex

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .withColumn("p2", F.slice("embedding", 1, 2))
        .select("vec_id", "p2")
    )
    probes = emb.crossJoin(spark.range(20).select(F.col("id").alias("s"))).select(
        (F.col("vec_id") * 20 + F.col("s")).alias("query_id"),
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
    out = idx.knn(probes, 3, candidates="distributed")
    return out.select(
        "query_id", "neighbor_id", F.round("dist", 6).alias("dist_sq"), "rank"
    )


ORACLE_KNN_GRID_QUERY_TABLE = f"""
WITH base AS (SELECT vec_id, embedding[1:2] AS p2 FROM embeddings),
q AS (
  SELECT vec_id * 20 + s AS query_id,
         [CAST(p2[1] AS DOUBLE) + s * 0.01,
          CAST(p2[2] AS DOUBLE) - s * 0.01] AS qvec
  FROM base, (SELECT unnest(range(0, 20)) AS s)
), pairs AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, {_D2} AS d
  FROM q CROSS JOIN base e
), ranked AS (
  SELECT query_id, neighbor_id, d,
         row_number() OVER (PARTITION BY query_id ORDER BY d, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, round(d, 6) AS dist_sq, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 3
"""


def q_knn_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN with payload pass-through — the ``pkmap`` analog
    (``/root/reference/include/pktree.hpp:1362-1416``: key→value search where
    the payload rides with the point; here payload columns ride in the row)."""
    from pyvectorsearch_spark.operators.knn import knn_join

    emb = load_table(spark, sf_dir, "embeddings")
    out = knn_join(emb, _probes(spark, sf_dir), K, payload=["label"])
    return out.select(
        "query_id",
        "neighbor_id",
        F.round("dist", 6).alias("dist_sq"),
        "rank",
        "label",
    )


def q_knn_ivf_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF in genuinely APPROXIMATE mode (nprobe=4 of 16 lists) — the 100 TB
    serving path. Recall has no SQL oracle (driver records rows-only; recall
    floors are asserted in tests/test_ivf.py)."""
    from pyvectorsearch_spark.index.ivf import IVFIndex

    emb = load_table(spark, sf_dir, "embeddings")
    idx = build_or_load(
        spark,
        f"ivf16_seed42_{dataset_tag(sf_dir, 'embeddings')}",
        load=IVFIndex.load,
        build=lambda: IVFIndex.build(emb, n_lists=16, seed=42),
    )
    out = idx.knn(_probes(spark, sf_dir), K, nprobe=4)
    return out.select(
        "query_id", "neighbor_id", F.round("dist", 6).alias("dist_sq"), "rank"
    )


def q_knn_ivf_query_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-TABLE kNN through the IVF index with fully DISTRIBUTED
    candidate selection: per-query nprobe lists are picked by a window over
    the broadcast centroid table — no ``queries.collect()`` — the path for
    10⁶-probe workloads. Probes: 2 deterministic shifted copies of every
    base vector (1,000 probes at sf0.01). nprobe == n_lists ⇒ exact ⇒ the
    brute-force SQL oracle applies."""
    from pyvectorsearch_spark.index.ivf import IVFIndex

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.crossJoin(spark.range(2).select(F.col("id").alias("s"))).select(
        (F.col("vec_id") * 2 + F.col("s")).alias("query_id"),
        F.transform(
            "embedding", lambda x: x.cast("double") + F.col("s") * F.lit(0.01)
        ).alias("qvec"),
    )
    idx = build_or_load(
        spark,
        f"ivf16_seed42_{dataset_tag(sf_dir, 'embeddings')}",
        load=IVFIndex.load,
        build=lambda: IVFIndex.build(emb, n_lists=16, seed=42),
    )
    out = idx.knn(probes, 3, nprobe=16, candidates="distributed")
    return out.select(
        "query_id", "neighbor_id", F.round("dist", 6).alias("dist_sq"), "rank"
    )


_DQ = duckdb_l2_sq("q.qvec", "e.embedding", DIM)

ORACLE_KNN_IVF_QUERY_TABLE = f"""
WITH q AS (
  SELECT vec_id * 2 + s AS query_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE) + s * 0.01) AS qvec
  FROM embeddings, (SELECT unnest(range(0, 2)) AS s)
), pairs AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, {_DQ} AS d
  FROM q CROSS JOIN embeddings e
), ranked AS (
  SELECT query_id, neighbor_id, d,
         row_number() OVER (PARTITION BY query_id ORDER BY d, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, round(d, 6) AS dist_sq, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 3
"""


def q_knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (product quantization + ADC) — the compressed-scan path for
    100 TB corpora: candidates are scored from m-byte codes (the float
    column never leaves parquet), then the shortlist is re-ranked with exact
    distances. Approximate ⇒ rows-only for the driver; recall floors and
    rerank exactness are pinned in tests/test_pq.py."""
    from pyvectorsearch_spark.index.pq import IVFPQIndex

    emb = load_table(spark, sf_dir, "embeddings")
    idx = build_or_load(
        spark,
        f"ivfpq8_m16_seed42_{dataset_tag(sf_dir, 'embeddings')}",
        load=IVFPQIndex.load,
        build=lambda: IVFPQIndex.build(emb, n_lists=8, m=16, ksub=32, seed=42),
    )
    out = idx.knn(_probes(spark, sf_dir), K, nprobe=4, rerank=64)
    return out.select(
        "query_id", "neighbor_id", F.round("dist", 6).alias("dist_sq"), "rank"
    )


def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-indexed kNN in exhaustive-probe mode (nprobe == n_lists ⇒ exact,
    so the brute-force SQL oracle applies; partial-probe recall is covered by
    tests/test_ivf.py). Exercises build → assignment → list-pruned search."""
    from pyvectorsearch_spark.index.ivf import IVFIndex

    emb = load_table(spark, sf_dir, "embeddings")
    idx = build_or_load(
        spark,
        f"ivf16_seed42_{dataset_tag(sf_dir, 'embeddings')}",
        load=IVFIndex.load,
        build=lambda: IVFIndex.build(emb, n_lists=16, seed=42),
    )
    out = idx.knn(_probes(spark, sf_dir), K, nprobe=16)
    return out.select(
        "query_id", "neighbor_id", F.round("dist", 6).alias("dist_sq"), "rank"
    )


_D = duckdb_l2_sq("q.qvec", "e.embedding", DIM)

ORACLE_KNN = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < {N_PROBES}
), pairs AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, {_D} AS d
  FROM q CROSS JOIN embeddings e
), ranked AS (
  SELECT query_id, neighbor_id, d,
         row_number() OVER (PARTITION BY query_id ORDER BY d, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, round(d, 6) AS dist_sq, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {K}
"""

ORACLE_KNN_PAYLOAD = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < {N_PROBES}
), pairs AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, {_D} AS d, e.label
  FROM q CROSS JOIN embeddings e
), ranked AS (
  SELECT query_id, neighbor_id, d, label,
         row_number() OVER (PARTITION BY query_id ORDER BY d, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, round(d, 6) AS dist_sq, CAST(rank AS INT) AS rank, label
FROM ranked WHERE rank <= {K}
"""

ORACLE_RANGE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < {N_PROBES}
)
SELECT q.query_id, e.vec_id AS neighbor_id, round({_D}, 6) AS dist_sq
FROM q CROSS JOIN embeddings e
WHERE {_D} <= {RADIUS} * {RADIUS}
"""

_DZ = (
    f"list_sum(list_transform(range(1, {DIM + 1}), i -> "
    f"CAST(e.embedding[i] AS DOUBLE) ^ 2))"
)

ORACLE_TOPK_GLOBAL = f"""
SELECT e.vec_id AS neighbor_id, round({_DZ}, 6) AS dist_sq, e.label
FROM embeddings e
ORDER BY {_DZ}, e.vec_id
LIMIT 10
"""

_NORM = (
    f"list_sum(list_transform(range(1, {DIM + 1}), i -> "
    f"CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))"
)

ORACLE_NORM_STATS = f"""
WITH n AS (SELECT label, {_NORM} AS norm_sq FROM embeddings)
SELECT label, count(*) AS n, round(avg(norm_sq), 6) AS avg_norm_sq,
       round(min(norm_sq), 6) AS min_norm_sq, round(max(norm_sq), 6) AS max_norm_sq
FROM n GROUP BY label ORDER BY label
"""

QUERIES = {
    "knn_bruteforce": q_knn_bruteforce,
    "knn_payload": q_knn_payload,
    "range_search": q_range_search,
    "range_grid_2d": q_range_grid_2d,
    "knn_topk_global": q_knn_topk_global,
    "knn_grid_2d": q_knn_grid_2d,
    "knn_grid_query_table": q_knn_grid_query_table,
    "knn_ivf": q_knn_ivf,
    "knn_ivf_query_table": q_knn_ivf_query_table,
    "knn_ivf_approx": q_knn_ivf_approx,
    "knn_ivfpq": q_knn_ivfpq,
    "vector_norm_stats": q_vector_norm_stats,
}

ORACLES = {
    "knn_ivf": ORACLE_KNN,
    "knn_bruteforce": ORACLE_KNN,
    "knn_payload": ORACLE_KNN_PAYLOAD,
    "range_search": ORACLE_RANGE,
    "range_grid_2d": ORACLE_RANGE_GRID_2D,
    "knn_topk_global": ORACLE_TOPK_GLOBAL,
    "knn_grid_2d": ORACLE_KNN_GRID_2D,
    "knn_grid_query_table": ORACLE_KNN_GRID_QUERY_TABLE,
    "knn_ivf_query_table": ORACLE_KNN_IVF_QUERY_TABLE,
    "vector_norm_stats": ORACLE_NORM_STATS,
}
