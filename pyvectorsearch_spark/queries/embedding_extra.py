"""Embedding-statistics queries (outside the driver's pinned 50-entry window;
covered by tests/test_oracle_parity.py against the same DuckDB oracles).

Operators exercised:
- per-label centroid build + bottom-k cosine outliers
  (`operators/embeddings.py` — the SemDeDup-companion curation signal;
  extension beyond the reference, whose only embedding op is spatial search,
  `/root/reference/include/pktree.hpp:948,933`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.functions.vector import duckdb_dot
from pyvectorsearch_spark.operators.embeddings import centroid_outliers
from pyvectorsearch_spark.sources.tables import load_table, spread

DIM = 64
OUT_K = 5
ROUND_DP = 6


def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-5 cosine-to-label-centroid vectors per label: the rows most
    likely mislabeled or off-distribution. Centroid components and cosines
    are rounded to 6 dp so the ranking is engine-stable."""
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    return centroid_outliers(
        emb, k=OUT_K, round_dp=ROUND_DP
    ).orderBy("label", "rank")


_DOT_EC = duckdb_dot("e.embedding", "c.centroid", DIM)
_DOT_EE = duckdb_dot("e.embedding", "e.embedding", DIM)
# centroid components are already double; plain in-order fold
_DOT_CC = (
    f"list_sum(list_transform(range(1, {DIM + 1}), i -> c.centroid[i] * c.centroid[i]))"
)

ORACLE_EMBEDDING_OUTLIERS = f"""
WITH u AS (
  SELECT label, generate_subscripts(embedding, 1) AS pos,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
comp AS (
  SELECT label, pos, round(avg(v), {ROUND_DP}) AS cv
  FROM u GROUP BY label, pos
),
c AS (
  SELECT label, list(cv ORDER BY pos) AS centroid FROM comp GROUP BY label
),
scored AS (
  SELECT e.vec_id, e.label,
         round(({_DOT_EC}) / (sqrt({_DOT_EE}) * sqrt({_DOT_CC})),
               {ROUND_DP}) AS cos_centroid
  FROM embeddings e JOIN c USING (label)
),
ranked AS (
  SELECT vec_id, label, cos_centroid,
         row_number() OVER (PARTITION BY label
                            ORDER BY cos_centroid ASC, vec_id ASC) AS rank
  FROM scored
)
SELECT vec_id, label, cos_centroid, rank
FROM ranked WHERE rank <= {OUT_K}
ORDER BY label, rank
"""


NEG_K = 5
NEG_ANCHORS = 8
NEG_SALT = "negatives"


def q_embedding_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive negatives: for the first 8 vectors, 5
    different-label pool rows each, drawn by md5 ranking (reproducible —
    and therefore oracle-checkable — pseudo-randomness)."""
    from pyvectorsearch_spark.operators.embeddings import negative_samples

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    anchors = emb.filter(F.col("vec_id") < NEG_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"), "label"
    )
    return negative_samples(anchors, emb, k=NEG_K, salt=NEG_SALT).orderBy(
        "anchor_id", "rank"
    )


ORACLE_EMBEDDING_NEGATIVES = f"""
WITH a AS (
  SELECT vec_id AS aid, label AS albl FROM embeddings WHERE vec_id < {NEG_ANCHORS}
),
pairs AS (
  SELECT a.aid, p.vec_id AS pid,
         md5('{NEG_SALT}' || a.aid::VARCHAR || '|' || p.vec_id::VARCHAR) AS key
  FROM a JOIN embeddings p ON p.label <> a.albl
),
r AS (
  SELECT aid, pid,
         row_number() OVER (PARTITION BY aid ORDER BY key, pid) AS rank
  FROM pairs
)
SELECT aid AS anchor_id, pid AS neg_id, rank FROM r WHERE rank <= {NEG_K}
ORDER BY anchor_id, rank
"""



def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding drift between two deterministic cohorts (even
    vs odd vec_id — standing in for yesterday-vs-today or
    pipeline-v1-vs-v2): cosine between cohort centroids, drift = 1 - cos.
    The embedding-space analog of `events_psi_drift`."""
    from pyvectorsearch_spark.operators.embeddings import centroid_drift

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    a = emb.filter(F.col("vec_id") % 2 == 0)
    b = emb.filter(F.col("vec_id") % 2 == 1)
    return centroid_drift(a, b, round_dp=ROUND_DP).orderBy("label")


_DOT_AB = (
    f"list_sum(list_transform(range(1, {DIM + 1}), i -> a.ca[i] * b.cb[i]))"
)
_DOT_AA = f"list_sum(list_transform(range(1, {DIM + 1}), i -> a.ca[i] * a.ca[i]))"
_DOT_BB = f"list_sum(list_transform(range(1, {DIM + 1}), i -> b.cb[i] * b.cb[i]))"

ORACLE_EMBEDDING_DRIFT = f"""
WITH u AS (
  SELECT label, vec_id % 2 AS cohort,
         generate_subscripts(embedding, 1) AS pos,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
comp AS (
  SELECT label, cohort, pos, round(avg(v), {ROUND_DP}) AS cv,
         count(*)::BIGINT AS n
  FROM u GROUP BY label, cohort, pos
),
cents AS (
  SELECT label, cohort, list(cv ORDER BY pos) AS c, max(n) AS n
  FROM comp GROUP BY label, cohort
),
a AS (SELECT label, c AS ca, n AS n_a FROM cents WHERE cohort = 0),
b AS (SELECT label, c AS cb, n AS n_b FROM cents WHERE cohort = 1),
j AS (
  SELECT a.label, a.n_a, b.n_b,
         round(({_DOT_AB}) / (sqrt({_DOT_AA}) * sqrt({_DOT_BB})),
               {ROUND_DP}) AS cos_r
  FROM a JOIN b USING (label)
)
SELECT label, n_a, n_b, cos_r, round(1.0 - cos_r, {ROUND_DP}) AS drift_r
FROM j ORDER BY label
"""


QUERIES = {
    "embedding_outliers": q_embedding_outliers,
    "embedding_negatives": q_embedding_negatives,
    "embedding_drift": q_embedding_drift,
}
ORACLES = {
    "embedding_outliers": ORACLE_EMBEDDING_OUTLIERS,
    "embedding_negatives": ORACLE_EMBEDDING_NEGATIVES,
    "embedding_drift": ORACLE_EMBEDDING_DRIFT,
}
