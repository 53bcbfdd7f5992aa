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

from pyvectorsearch_spark.functions.vector import (
    duckdb_cosine,
    duckdb_dot,
    duckdb_l2_sq,
)
from pyvectorsearch_spark.operators.embeddings import centroid_outliers
from pyvectorsearch_spark.sources.tables import load_table, spread
from pyvectorsearch_spark.functions.lits import lit_double_array

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


PIT_ROUNDS = 10


def q_embedding_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed power-iteration PCA: the top principal direction of the
    embedding second-moment matrix after 10 fixed von Mises rounds
    (deterministic start e1, rounded-arithmetic ladder) — per-round work is
    a zero-shuffle projection pass plus one dim-sized groupBy; only the
    64-float direction reaches the driver. The fixed round count and
    rounding contract make the ITERATE itself engine-exact, so the oracle
    unrolls the identical rounds with list-aggregated directions. (This
    corpus's spectrum is nearly flat — gap ratio ~0.93 — so 10
    rounds reach |cos| ≈ 0.85 with the true eigenvector; the contract is
    the deterministic iterate, and the round count is the knob.)"""
    from pyvectorsearch_spark.operators.linalg import power_iteration_top_component

    emb = load_table(spark, sf_dir, "embeddings")
    return power_iteration_top_component(
        emb, vec_col="embedding", dim=64, rounds=PIT_ROUNDS
    )


ORACLE_TOP_COMPONENT = """WITH s1 AS MATERIALIZED (
  SELECT e.vec_id, round(list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * (([1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]))[i])), 6) AS s FROM embeddings e
),
w1 AS MATERIALIZED (
  SELECT u.i - 1 AS j, round(sum(CAST(e.embedding[u.i] AS DOUBLE) * s.s), 6) AS w
  FROM embeddings e
  JOIN s1 s USING (vec_id)
  CROSS JOIN unnest(range(1, 65)) AS u(i)
  GROUP BY u.i - 1
),
n1 AS (SELECT sqrt(round(sum(round(w * w, 6)), 6)) AS n FROM w1),
v1 AS (SELECT list(round(w / n, 6) ORDER BY j) AS v FROM w1, n1),
s2 AS MATERIALIZED (
  SELECT e.vec_id, round(list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * (v.v)[i])), 6) AS s FROM embeddings e, v1 v
),
w2 AS MATERIALIZED (
  SELECT u.i - 1 AS j, round(sum(CAST(e.embedding[u.i] AS DOUBLE) * s.s), 6) AS w
  FROM embeddings e
  JOIN s2 s USING (vec_id)
  CROSS JOIN unnest(range(1, 65)) AS u(i)
  GROUP BY u.i - 1
),
n2 AS (SELECT sqrt(round(sum(round(w * w, 6)), 6)) AS n FROM w2),
v2 AS (SELECT list(round(w / n, 6) ORDER BY j) AS v FROM w2, n2),
s3 AS MATERIALIZED (
  SELECT e.vec_id, round(list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * (v.v)[i])), 6) AS s FROM embeddings e, v2 v
),
w3 AS MATERIALIZED (
  SELECT u.i - 1 AS j, round(sum(CAST(e.embedding[u.i] AS DOUBLE) * s.s), 6) AS w
  FROM embeddings e
  JOIN s3 s USING (vec_id)
  CROSS JOIN unnest(range(1, 65)) AS u(i)
  GROUP BY u.i - 1
),
n3 AS (SELECT sqrt(round(sum(round(w * w, 6)), 6)) AS n FROM w3),
v3 AS (SELECT list(round(w / n, 6) ORDER BY j) AS v FROM w3, n3),
s4 AS MATERIALIZED (
  SELECT e.vec_id, round(list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * (v.v)[i])), 6) AS s FROM embeddings e, v3 v
),
w4 AS MATERIALIZED (
  SELECT u.i - 1 AS j, round(sum(CAST(e.embedding[u.i] AS DOUBLE) * s.s), 6) AS w
  FROM embeddings e
  JOIN s4 s USING (vec_id)
  CROSS JOIN unnest(range(1, 65)) AS u(i)
  GROUP BY u.i - 1
),
n4 AS (SELECT sqrt(round(sum(round(w * w, 6)), 6)) AS n FROM w4),
v4 AS (SELECT list(round(w / n, 6) ORDER BY j) AS v FROM w4, n4),
s5 AS MATERIALIZED (
  SELECT e.vec_id, round(list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * (v.v)[i])), 6) AS s FROM embeddings e, v4 v
),
w5 AS MATERIALIZED (
  SELECT u.i - 1 AS j, round(sum(CAST(e.embedding[u.i] AS DOUBLE) * s.s), 6) AS w
  FROM embeddings e
  JOIN s5 s USING (vec_id)
  CROSS JOIN unnest(range(1, 65)) AS u(i)
  GROUP BY u.i - 1
),
n5 AS (SELECT sqrt(round(sum(round(w * w, 6)), 6)) AS n FROM w5),
v5 AS (SELECT list(round(w / n, 6) ORDER BY j) AS v FROM w5, n5),
s6 AS MATERIALIZED (
  SELECT e.vec_id, round(list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * (v.v)[i])), 6) AS s FROM embeddings e, v5 v
),
w6 AS MATERIALIZED (
  SELECT u.i - 1 AS j, round(sum(CAST(e.embedding[u.i] AS DOUBLE) * s.s), 6) AS w
  FROM embeddings e
  JOIN s6 s USING (vec_id)
  CROSS JOIN unnest(range(1, 65)) AS u(i)
  GROUP BY u.i - 1
),
n6 AS (SELECT sqrt(round(sum(round(w * w, 6)), 6)) AS n FROM w6),
v6 AS (SELECT list(round(w / n, 6) ORDER BY j) AS v FROM w6, n6),
s7 AS MATERIALIZED (
  SELECT e.vec_id, round(list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * (v.v)[i])), 6) AS s FROM embeddings e, v6 v
),
w7 AS MATERIALIZED (
  SELECT u.i - 1 AS j, round(sum(CAST(e.embedding[u.i] AS DOUBLE) * s.s), 6) AS w
  FROM embeddings e
  JOIN s7 s USING (vec_id)
  CROSS JOIN unnest(range(1, 65)) AS u(i)
  GROUP BY u.i - 1
),
n7 AS (SELECT sqrt(round(sum(round(w * w, 6)), 6)) AS n FROM w7),
v7 AS (SELECT list(round(w / n, 6) ORDER BY j) AS v FROM w7, n7),
s8 AS MATERIALIZED (
  SELECT e.vec_id, round(list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * (v.v)[i])), 6) AS s FROM embeddings e, v7 v
),
w8 AS MATERIALIZED (
  SELECT u.i - 1 AS j, round(sum(CAST(e.embedding[u.i] AS DOUBLE) * s.s), 6) AS w
  FROM embeddings e
  JOIN s8 s USING (vec_id)
  CROSS JOIN unnest(range(1, 65)) AS u(i)
  GROUP BY u.i - 1
),
n8 AS (SELECT sqrt(round(sum(round(w * w, 6)), 6)) AS n FROM w8),
v8 AS (SELECT list(round(w / n, 6) ORDER BY j) AS v FROM w8, n8),
s9 AS MATERIALIZED (
  SELECT e.vec_id, round(list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * (v.v)[i])), 6) AS s FROM embeddings e, v8 v
),
w9 AS MATERIALIZED (
  SELECT u.i - 1 AS j, round(sum(CAST(e.embedding[u.i] AS DOUBLE) * s.s), 6) AS w
  FROM embeddings e
  JOIN s9 s USING (vec_id)
  CROSS JOIN unnest(range(1, 65)) AS u(i)
  GROUP BY u.i - 1
),
n9 AS (SELECT sqrt(round(sum(round(w * w, 6)), 6)) AS n FROM w9),
v9 AS (SELECT list(round(w / n, 6) ORDER BY j) AS v FROM w9, n9),
s10 AS MATERIALIZED (
  SELECT e.vec_id, round(list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * (v.v)[i])), 6) AS s FROM embeddings e, v9 v
),
w10 AS MATERIALIZED (
  SELECT u.i - 1 AS j, round(sum(CAST(e.embedding[u.i] AS DOUBLE) * s.s), 6) AS w
  FROM embeddings e
  JOIN s10 s USING (vec_id)
  CROSS JOIN unnest(range(1, 65)) AS u(i)
  GROUP BY u.i - 1
),
n10 AS (SELECT sqrt(round(sum(round(w * w, 6)), 6)) AS n FROM w10),
v10 AS (SELECT list(round(w / n, 6) ORDER BY j) AS v FROM w10, n10)
SELECT j, CASE WHEN n.n > 0 THEN round(w.w / n.n, 6) ELSE 0.0 END AS loading
FROM w10 w, n10 n
ORDER BY j
"""

KM_K = 8
KM_ROUNDS = 2


def q_embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-2-round Lloyd k-means over the integer-quantized embeddings
    (k=8, init = the 8 smallest vec_ids): per-cluster sizes, exact bigint
    inertia, and the order-independent member-id XOR — the full partition is
    hash-checked because every round is engine-exact integer arithmetic
    (the unrolled-round oracle replays identical CTE layers)."""
    from pyvectorsearch_spark.operators.clustering import kmeans_fixed

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    return kmeans_fixed(
        emb, id_col="vec_id", vec_col="embedding", k=KM_K, rounds=KM_ROUNDS
    ).orderBy("cluster")


def _kmeans_oracle(k: int, rounds: int, dim: int) -> str:
    """Unrolled-round DuckDB twin of ``kmeans_fixed`` (same quantization,
    argmin tie-break, and integer round-half-up centroid update)."""
    d2 = (
        f"list_sum(list_transform(range(1, {dim + 1}), "
        "i -> (q.qv[i]-cc.cv[i])*(q.qv[i]-cc.cv[i])))"
    )
    parts = [f"""
q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS qv
  FROM embeddings
),
c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, qv AS cv
  FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT {k})
)"""]
    for r in range(rounds):
        parts.append(f"""
a{r} AS (
  SELECT vec_id, qv, c, d2 FROM (
    SELECT vec_id, qv, c, d2,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
    FROM (SELECT q.vec_id, q.qv, cc.c, {d2} AS d2 FROM q, c{r} cc)
  ) WHERE rn = 1
),
u{r} AS (
  SELECT c, t.i AS d, sum(qv[t.i])::BIGINT AS s, count(*)::BIGINT AS n
  FROM a{r}, range(1, {dim + 1}) t(i) GROUP BY c, t.i
),
c{r + 1} AS (
  SELECT cc.c,
         list(CASE WHEN u.s IS NULL THEN cc.cv[t.i]
              ELSE ((2*(u.s + u.n*100000) + u.n) // (2*u.n)) - 100000 END
              ORDER BY t.i) AS cv
  FROM c{r} cc CROSS JOIN range(1, {dim + 1}) t(i)
  LEFT JOIN u{r} u ON u.c = cc.c AND u.d = t.i
  GROUP BY cc.c
)""")
    parts.append(f"""
afin AS (
  SELECT vec_id, c, d2 FROM (
    SELECT vec_id, c, d2,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
    FROM (SELECT q.vec_id, cc.c, {d2} AS d2 FROM q, c{rounds} cc)
  ) WHERE rn = 1
)""")
    return ",".join(parts)


def _kmeans_oracle_final(k: int, rounds: int, dim: int) -> str:
    return f"""
WITH {_kmeans_oracle(k, rounds, dim)}
SELECT c AS cluster, count(*)::BIGINT AS n_members, sum(d2)::BIGINT AS inertia,
       bit_xor(('0x' || substr(md5(vec_id::VARCHAR), 1, 13))::BIGINT)::BIGINT
         AS members_xor
FROM afin GROUP BY c ORDER BY cluster
"""


ORACLE_EMBEDDING_KMEANS = _kmeans_oracle_final(KM_K, KM_ROUNDS, DIM)


MKNN_K = 5


def q_knn_mutual_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual (reciprocal) k=5 NN graph over the embeddings: symmetric
    high-precision edge set for kNN clustering; ranks are engine-exact
    ((dist, id) ordering over the fixed-fold l2_sq distance)."""
    from pyvectorsearch_spark.operators.graph import mutual_knn_pairs

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    return mutual_knn_pairs(
        emb, id_col="vec_id", vec_col="embedding", k=MKNN_K
    ).orderBy("d1", "d2")


_MK_L2 = duckdb_l2_sq("a.embedding", "b.embedding", DIM)

ORACLE_KNN_MUTUAL_GRAPH = f"""
WITH d AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib, {_MK_L2} AS dist
  FROM embeddings a, embeddings b WHERE a.vec_id != b.vec_id
),
e AS (
  SELECT ia, ib, dist,
         row_number() OVER (PARTITION BY ia ORDER BY dist, ib) AS rnk
  FROM d QUALIFY rnk <= {MKNN_K}
)
SELECT e1.ia AS d1, e1.ib AS d2, e1.rnk AS rank_ab, e2.rnk AS rank_ba,
       round(e1.dist, 6) AS dist_r
FROM e e1 JOIN e e2 ON e1.ia = e2.ib AND e1.ib = e2.ia
WHERE e1.ia < e1.ib
ORDER BY d1, d2
"""


SCB_M = 16


def q_sample_cluster_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced sampling (the DataComp/SemDeDup-style diversity
    lever): k-means-label the embedding space, then keep a fixed per-cluster
    quota ranked by deterministic md5 — so dense regions stop dominating the
    mixture. Per-cluster totals, sampled counts, and the sampled-id XOR are
    hash-checked; the sample itself is reproducible (same corpus -> same
    sample)."""
    from pyspark.sql import Window

    from pyvectorsearch_spark.operators.clustering import kmeans_assign

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    asg = kmeans_assign(
        emb, id_col="vec_id", vec_col="embedding", k=KM_K, rounds=KM_ROUNDS
    )
    h = F.md5(F.col("vec_id").cast("string"))
    w = Window.partitionBy("cluster").orderBy(h, F.col("vec_id"))
    ranked = asg.withColumn("_sr", F.row_number().over(w))
    return (
        ranked.groupBy("cluster")
        .agg(
            F.count("*").cast("bigint").alias("n_total"),
            F.sum((F.col("_sr") <= SCB_M).cast("bigint")).alias("n_sampled"),
            F.expr(
                f"bit_xor(CASE WHEN _sr <= {SCB_M} THEN "
                "conv(substring(md5(CAST(vec_id AS STRING)), 1, 13), 16, 10) "
                "ELSE 0 END)"
            ).cast("bigint").alias("sample_xor"),
        )
        .orderBy("cluster")
    )


ORACLE_SAMPLE_CLUSTER_BALANCED = f"""
WITH {_kmeans_oracle(KM_K, KM_ROUNDS, DIM)},
smp AS (
  SELECT c, vec_id,
         row_number() OVER (
           PARTITION BY c ORDER BY md5(vec_id::VARCHAR), vec_id) AS sr
  FROM afin
)
SELECT c AS cluster, count(*)::BIGINT AS n_total,
       sum(CASE WHEN sr <= {SCB_M} THEN 1 ELSE 0 END)::BIGINT AS n_sampled,
       bit_xor(CASE WHEN sr <= {SCB_M}
               THEN ('0x' || substr(md5(vec_id::VARCHAR), 1, 13))::BIGINT
               ELSE 0 END)::BIGINT AS sample_xor
FROM smp GROUP BY c ORDER BY cluster
"""


KC_K = 8


def q_sample_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset over the embeddings (k=8): the exact
    selection ORDER and each round's farthest squared distance are
    hash-checked against an oracle that unrolls the identical rounds."""
    from pyvectorsearch_spark.operators.clustering import kcenter_coreset

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    return kcenter_coreset(
        emb, id_col="vec_id", vec_col="embedding", k=KC_K
    ).orderBy("sel_order")


def _kcenter_oracle(k: int, dim: int) -> str:
    d2 = (
        f"list_sum(list_transform(range(1, {dim + 1}), "
        "i -> (q.qv[i]-cc.qv[i])*(q.qv[i]-cc.qv[i])))"
    )
    parts = [f"""
q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS qv
  FROM embeddings
),
cen1 AS (
  SELECT 1 AS ord, vec_id, qv, 0::BIGINT AS far
  FROM q ORDER BY vec_id LIMIT 1
)"""]
    for r in range(2, k + 1):
        parts.append(f"""
d{r} AS (
  SELECT q.vec_id, q.qv, min({d2})::BIGINT AS dmin
  FROM q, cen{r - 1} cc GROUP BY q.vec_id, q.qv
),
pick{r} AS (
  SELECT {r} AS ord, vec_id, qv, dmin AS far
  FROM d{r} ORDER BY dmin DESC, vec_id LIMIT 1
),
cen{r} AS (SELECT * FROM cen{r - 1} UNION ALL SELECT * FROM pick{r})""")
    body = ",".join(parts)
    return f"""
WITH {body}
SELECT ord AS sel_order, vec_id, far AS far_d2 FROM cen{k} ORDER BY ord
"""


ORACLE_SAMPLE_KCENTER = _kcenter_oracle(KC_K, DIM)


MKC_K = 2


def q_mutual_knn_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mutual-kNN graph's purpose: reciprocal-neighbor pairs fused into
    clusters by connected components (min-label propagation on the real
    engine; recursive-CTE oracle) — kNN-graph clustering with the
    hub-resistant edge set. Reports per-cluster size for every non-trivial
    cluster."""
    from pyvectorsearch_spark.operators.graph import (
        connected_components,
        mutual_knn_pairs,
    )

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    pairs = mutual_knn_pairs(emb, id_col="vec_id", vec_col="embedding", k=MKC_K)
    comp = connected_components(pairs)
    return (
        comp.groupBy("cluster")
        .agg(F.count("*").cast("bigint").alias("n_members"))
        .orderBy("cluster")
    )


ORACLE_MUTUAL_KNN_CLUSTERS = f"""
WITH RECURSIVE d AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib, {_MK_L2} AS dist
  FROM embeddings a, embeddings b WHERE a.vec_id != b.vec_id
),
e0 AS (
  SELECT ia, ib,
         row_number() OVER (PARTITION BY ia ORDER BY dist, ib) AS rnk
  FROM d QUALIFY rnk <= {MKC_K}
),
mk AS (
  SELECT e1.ia AS d1, e1.ib AS d2
  FROM e0 e1 JOIN e0 e2 ON e1.ia = e2.ib AND e1.ib = e2.ia
  WHERE e1.ia < e1.ib
),
edges AS (SELECT d1 AS a, d2 AS b FROM mk UNION SELECT d2, d1 FROM mk),
reach(node, lbl) AS (
    SELECT a, a FROM edges
  UNION
    SELECT e.a, r.lbl FROM edges e JOIN reach r ON e.b = r.node
),
comp AS (SELECT node, min(lbl) AS cluster FROM reach GROUP BY node)
SELECT cluster, count(*)::BIGINT AS n_members
FROM comp GROUP BY cluster ORDER BY cluster
"""


def q_embedding_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-quality eval: per k-means cluster, the majority true label
    and its purity share (argmax with label tie-break) — the standard
    "did unsupervised structure recover the labels?" readout over the same
    engine-exact assignment the other k-means queries share; the oracle
    reuses the unrolled-round CTE."""
    from pyspark.sql import Window

    from pyvectorsearch_spark.operators.clustering import kmeans_assign

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    asg = kmeans_assign(
        emb, id_col="vec_id", vec_col="embedding", k=KM_K, rounds=KM_ROUNDS
    )
    lab = emb.select("vec_id", "label")
    j = asg.join(lab, "vec_id")
    cell = j.groupBy("cluster", "label").agg(
        F.count("*").cast("bigint").alias("n")
    )
    tot = cell.groupBy("cluster").agg(F.sum("n").cast("bigint").alias("n_total"))
    w = Window.partitionBy("cluster").orderBy(F.desc("n"), F.asc("label"))
    top = cell.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") == 1)
    return (
        top.join(tot, "cluster")
        .select(
            "cluster",
            "n_total",
            F.col("label").alias("majority_label"),
            F.col("n").cast("bigint").alias("n_majority"),
            F.round(F.col("n") / F.col("n_total"), 6).alias("purity_r"),
        )
        .orderBy("cluster")
    )


ORACLE_EMBEDDING_CLUSTER_PURITY = f"""
WITH {_kmeans_oracle(KM_K, KM_ROUNDS, DIM)},
j AS (
  SELECT a.c AS cluster, e.label FROM afin a
  JOIN embeddings e ON e.vec_id = a.vec_id
),
cell AS (
  SELECT cluster, label, count(*)::BIGINT AS n FROM j GROUP BY cluster, label
),
tot AS (SELECT cluster, sum(n)::BIGINT AS n_total FROM cell GROUP BY cluster),
top AS (
  SELECT cluster, label, n,
         row_number() OVER (PARTITION BY cluster
                            ORDER BY n DESC, label ASC) AS r
  FROM cell
)
SELECT top.cluster, tot.n_total, top.label AS majority_label,
       top.n AS n_majority, round(top.n / CAST(tot.n_total AS DOUBLE), 6)
         AS purity_r
FROM top JOIN tot ON top.cluster = tot.cluster
WHERE top.r = 1 ORDER BY top.cluster
"""


QUERIES = {
    "embedding_top_component": q_embedding_top_component,
    "embedding_outliers": q_embedding_outliers,
    "embedding_negatives": q_embedding_negatives,
    "embedding_drift": q_embedding_drift,
    "embedding_kmeans": q_embedding_kmeans,
    "knn_mutual_graph": q_knn_mutual_graph,
    "sample_cluster_balanced": q_sample_cluster_balanced,
    "sample_kcenter_coreset": q_sample_kcenter_coreset,
    "mutual_knn_clusters": q_mutual_knn_clusters,
    "embedding_cluster_purity": q_embedding_cluster_purity,
}
ORACLES = {
    "embedding_top_component": ORACLE_TOP_COMPONENT,
    "embedding_outliers": ORACLE_EMBEDDING_OUTLIERS,
    "embedding_negatives": ORACLE_EMBEDDING_NEGATIVES,
    "embedding_drift": ORACLE_EMBEDDING_DRIFT,
    "embedding_kmeans": ORACLE_EMBEDDING_KMEANS,
    "knn_mutual_graph": ORACLE_KNN_MUTUAL_GRAPH,
    "sample_cluster_balanced": ORACLE_SAMPLE_CLUSTER_BALANCED,
    "sample_kcenter_coreset": ORACLE_SAMPLE_KCENTER,
    "mutual_knn_clusters": ORACLE_MUTUAL_KNN_CLUSTERS,
    "embedding_cluster_purity": ORACLE_EMBEDDING_CLUSTER_PURITY,
}


# --- TwoNN intrinsic dimensionality ------------------------------------------


def q_embedding_intrinsic_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TwoNN intrinsic-dimension estimate (Facco et al. 2017): using only
    each point's two nearest neighbors, ID ≈ n / Σ ln(r2/r1). Embeddings
    that nominally live in 64-d usually concentrate on a much lower-
    dimensional manifold — the number that says whether an IVF/PQ index
    will work (low ID ⇒ cells stay balanced) and how aggressively JL/SQ8
    can compress (`knn_jl_recall`'s shadow price).

    Determinism: neighbor ranks order by the fixed-fold l2_sq then id (the
    `knn_mutual_graph` ladder); ln(d2/d1) = ln of an exact double ratio,
    rounded to 6 dp and fixed to micro-units per point, so the sum is an
    exact bigint. Duplicate points (r1 = 0) are excluded and counted.

    Scale: the exhaustive self-join twin is the correctness anchor (the
    oracle replays it); at corpus scale the same per-point (d1, d2) pairs
    come from the blocked/IVF kNN at k=2 — everything downstream is one
    map-side-combined 1-row aggregate."""
    from pyspark.sql import Window

    from pyvectorsearch_spark.functions.vector import l2_sq

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    a = emb.select(F.col("vec_id").alias("_ia"), F.col("embedding").alias("_va"))
    b = emb.select(F.col("vec_id").alias("_ib"), F.col("embedding").alias("_vb"))
    d = (
        a.join(b, F.col("_ia") != F.col("_ib"))
        .withColumn("_d", l2_sq("_va", "_vb"))
        .select("_ia", "_ib", "_d")
    )
    w = Window.partitionBy("_ia").orderBy(F.asc("_d"), F.asc("_ib"))
    two = (
        d.withColumn("_rnk", F.row_number().over(w))
        .filter(F.col("_rnk") <= 2)
        .groupBy("_ia")
        .agg(
            F.min(F.when(F.col("_rnk") == 1, F.col("_d"))).alias("_d1"),
            F.min(F.when(F.col("_rnk") == 2, F.col("_d"))).alias("_d2"),
        )
    )
    # ln(r2/r1) = 0.5 * ln(d2_sq/d1_sq); micro-fix per point, exact sum
    mu = two.select(
        "_ia",
        F.when(
            F.col("_d1") > 0,
            F.round(F.log(F.col("_d2") / F.col("_d1")) * 500000).cast("bigint"),
        ).alias("_lu"),
    )
    agg = mu.agg(
        F.sum(F.when(F.col("_lu").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_points"),
        F.sum(F.when(F.col("_lu").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_degenerate"),
        F.sum("_lu").cast("bigint").alias("_slu"),
    )
    return agg.select(
        "n_points",
        "n_degenerate",
        F.round(
            F.col("n_points") * F.lit(1000000.0) / F.col("_slu").cast("double"),
            4,
        ).alias("intrinsic_dim_r"),
    )


_ID_L2 = duckdb_l2_sq("a.embedding", "b.embedding", DIM)

ORACLE_EMBEDDING_INTRINSIC_DIM = f"""
WITH d AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib, {_ID_L2} AS dist
  FROM embeddings a, embeddings b WHERE a.vec_id != b.vec_id
),
rk AS (
  SELECT ia, dist,
         row_number() OVER (PARTITION BY ia ORDER BY dist, ib) AS rnk
  FROM d
),
two AS (
  SELECT ia,
         min(CASE WHEN rnk = 1 THEN dist END) AS d1,
         min(CASE WHEN rnk = 2 THEN dist END) AS d2
  FROM rk WHERE rnk <= 2 GROUP BY ia
),
mu AS (
  SELECT ia, CASE WHEN d1 > 0
                  THEN CAST(round(ln(d2 / d1) * 500000) AS BIGINT)
             END AS lu
  FROM two
),
agg AS (
  SELECT sum(CASE WHEN lu IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_points,
         sum(CASE WHEN lu IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_degenerate,
         sum(lu)::BIGINT AS slu
  FROM mu
)
SELECT n_points, n_degenerate,
       round(n_points * 1000000.0 / CAST(slu AS DOUBLE), 4) AS intrinsic_dim_r
FROM agg
"""

QUERIES.update({"embedding_intrinsic_dim": q_embedding_intrinsic_dim})
ORACLES.update({"embedding_intrinsic_dim": ORACLE_EMBEDDING_INTRINSIC_DIM})


# --- simplified silhouette ----------------------------------------------------


def q_embedding_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster simplified silhouette over the shared engine-exact
    k-means assignment — the unsupervised companion to
    `embedding_cluster_purity`'s label-based readout: purity asks "did we
    recover the labels?", silhouette asks "are the clusters even separated?"
    (negative-s counts localize boundary confusion to specific clusters).
    The oracle replays the unrolled Lloyd rounds plus the two-distance
    scoring CTE."""
    from pyvectorsearch_spark.operators.clustering import kmeans_silhouette

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    return kmeans_silhouette(
        emb, id_col="vec_id", vec_col="embedding", k=KM_K, rounds=KM_ROUNDS
    ).orderBy("cluster")


def _silhouette_oracle() -> str:
    d2 = (
        f"list_sum(list_transform(range(1, {DIM + 1}), "
        "i -> (q.qv[i]-cc.cv[i])*(q.qv[i]-cc.cv[i])))"
    )
    return f"""
WITH {_kmeans_oracle(KM_K, KM_ROUNDS, DIM)},
alld AS (
  SELECT q.vec_id, cc.c, {d2} AS d2 FROM q, c{KM_ROUNDS} cc
),
own AS (SELECT vec_id, c AS oc, d2 AS da FROM afin),
sec AS (
  SELECT alld.vec_id, min(alld.d2) AS db
  FROM alld JOIN own ON alld.vec_id = own.vec_id AND alld.c <> own.oc
  GROUP BY alld.vec_id
),
s AS (
  SELECT own.oc AS c,
         CAST(round((CASE WHEN greatest(sqrt(own.da), sqrt(sec.db)) > 0
              THEN round((sqrt(sec.db) - sqrt(own.da))
                         / greatest(sqrt(own.da), sqrt(sec.db)), 6)
              ELSE 0.0 END) * 1000000) AS BIGINT) AS su
  FROM own JOIN sec ON own.vec_id = sec.vec_id
)
SELECT c AS cluster, count(*)::BIGINT AS n_members,
       round(sum(su) / (count(*) * 1000000.0), 4) AS mean_silhouette_r,
       sum(CASE WHEN su < 0 THEN 1 ELSE 0 END)::BIGINT AS n_negative
FROM s GROUP BY c ORDER BY cluster
"""


ORACLE_EMBEDDING_SILHOUETTE = _silhouette_oracle()

QUERIES.update({"embedding_silhouette": q_embedding_silhouette})
ORACLES.update({"embedding_silhouette": ORACLE_EMBEDDING_SILHOUETTE})


# --- Calinski–Harabasz variance-ratio index ---------------------------------------


def q_embedding_calinski_harabasz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-level cluster quality: the Calinski–Harabasz variance
    ratio over the shared engine-exact k-means assignment (within/between
    squared mass both exact integers; the global mean uses the identical
    round-half-up ladder as the centroid update, so the oracle replays
    everything bit-for-bit). The k-selection criterion beside
    `embedding_silhouette`'s per-cluster view."""
    from pyvectorsearch_spark.operators.clustering import (
        kmeans_calinski_harabasz,
    )

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    return kmeans_calinski_harabasz(
        emb, id_col="vec_id", vec_col="embedding", k=KM_K, rounds=KM_ROUNDS
    )


def _ch_oracle() -> str:
    d2g = (
        f"list_sum(list_transform(range(1, {DIM + 1}), "
        "i -> (cc.cv[i]-g.gv[i])*(cc.cv[i]-g.gv[i])))"
    )
    return f"""
WITH {_kmeans_oracle(KM_K, KM_ROUNDS, DIM)},
gm AS (
  SELECT t.i AS d, sum(qv[t.i])::BIGINT AS s, count(*)::BIGINT AS n
  FROM q, range(1, {DIM + 1}) t(i) GROUP BY t.i
),
g AS (
  SELECT list(((2*(s + n*100000) + n) // (2*n)) - 100000 ORDER BY d) AS gv,
         max(n)::BIGINT AS n_total
  FROM gm
),
per AS (
  SELECT c, count(*)::BIGINT AS nc, sum(d2)::BIGINT AS w FROM afin GROUP BY c
),
btw AS (
  SELECT sum(per.nc * {d2g})::BIGINT AS b
  FROM per JOIN c{KM_ROUNDS} cc ON per.c = cc.c CROSS JOIN g
),
agg AS (
  SELECT (SELECT n_total FROM g) AS n_points,
         (SELECT count(*) FROM per)::BIGINT AS k_clusters,
         (SELECT sum(w) FROM per)::BIGINT AS within_ss,
         (SELECT b FROM btw) AS between_ss
)
SELECT n_points, k_clusters, within_ss, between_ss,
       CASE WHEN k_clusters > 1 AND n_points > k_clusters AND within_ss > 0
            THEN round((between_ss / CAST(k_clusters - 1 AS DOUBLE))
                       / (within_ss / CAST(n_points - k_clusters AS DOUBLE)), 4)
            ELSE 0.0 END AS ch_index_r
FROM agg
"""


ORACLE_EMBEDDING_CH = _ch_oracle()

QUERIES.update({"embedding_calinski_harabasz": q_embedding_calinski_harabasz})
ORACLES.update({"embedding_calinski_harabasz": ORACLE_EMBEDDING_CH})


# --- hubness census -------------------------------------------------------------------

HUB_K = 5


def q_knn_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness census of the embedding space (Radovanović 2010): the
    k-occurrence N_k(x) = how many points count x among their k nearest
    neighbors. High-dimensional spaces grow HUBS (points in everyone's
    neighbor list — they poison kNN classification and graph clustering)
    and antihubs (in nobody's). Reports the N_k distribution's exact
    moments (mean is k by construction — a built-in self-check), its
    skewness (THE hubness indicator), the max hub, and the antihub count.
    Directly actionable for `knn_mutual_graph` (mutuality filters hubs)
    and IVF list balance.

    Determinism: N_k counts are integers from the (dist, id)-ordered kNN
    ranks; skewness uses exact DECIMAL/HUGEINT central-moment sums with
    one final double expression.

    Scale: the directed kNN is the exhaustive oracle-checkable twin (at
    corpus scale the same census reads the blocked/IVF kNN edge table);
    the census itself is one neighbor-keyed count."""
    from pyspark.sql import Window

    from pyvectorsearch_spark.functions.vector import l2_sq

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    a = emb.select(F.col("vec_id").alias("_ia"), F.col("embedding").alias("_va"))
    b = emb.select(F.col("vec_id").alias("_ib"), F.col("embedding").alias("_vb"))
    d = (
        a.join(b, F.col("_ia") != F.col("_ib"))
        .withColumn("_d", l2_sq("_va", "_vb"))
        .select("_ia", "_ib", "_d")
    )
    w = Window.partitionBy("_ia").orderBy(F.asc("_d"), F.asc("_ib"))
    e = d.withColumn("_rnk", F.row_number().over(w)).filter(
        F.col("_rnk") <= HUB_K
    )
    nk = e.groupBy("_ib").agg(F.count("*").cast("bigint").alias("_nk"))
    allp = emb.select(F.col("vec_id").alias("_ib")).join(
        nk, "_ib", "left"
    ).select(F.coalesce("_nk", F.lit(0)).cast("bigint").alias("_nk"))
    dd = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = allp.agg(
        F.count("*").cast("bigint").alias("n_points"),
        F.sum("_nk").cast("bigint").alias("_s1"),
        F.sum(dd(F.col("_nk")) * dd(F.col("_nk"))).alias("_s2"),
        F.sum(dd(F.col("_nk")) * dd(F.col("_nk")) * dd(F.col("_nk"))).alias(
            "_s3"
        ),
        F.max("_nk").cast("bigint").alias("max_k_occurrence"),
        F.sum(F.when(F.col("_nk") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_antihubs"),
    )
    # central moments from raw: m2 = s2/n - mu^2 ; m3 = s3/n - 3mu*s2/n + 2mu^3
    n = m["n_points"].cast("double")
    mu = m["_s1"].cast("double") / n
    m2 = m["_s2"].cast("double") / n - mu * mu
    m3 = (
        m["_s3"].cast("double") / n
        - 3.0 * mu * (m["_s2"].cast("double") / n)
        + 2.0 * mu * mu * mu
    )
    skew = F.when(m2 > 0, F.round(m3 / F.pow(F.sqrt(m2), 3.0), 6)).otherwise(
        F.lit(0.0)
    )
    return m.select(
        "n_points",
        F.round(mu, 6).alias("mean_k_occurrence_r"),  # == k, self-check
        skew.alias("skewness_r"),
        "max_k_occurrence",
        "n_antihubs",
    )


_HUB_L2 = duckdb_l2_sq("a.embedding", "b.embedding", DIM)

ORACLE_KNN_HUBNESS = f"""
WITH d AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib, {_HUB_L2} AS dist
  FROM embeddings a, embeddings b WHERE a.vec_id != b.vec_id
),
e AS (
  SELECT ia, ib,
         row_number() OVER (PARTITION BY ia ORDER BY dist, ib) AS rnk
  FROM d QUALIFY rnk <= {HUB_K}
),
nk AS (SELECT ib, count(*)::BIGINT AS nk FROM e GROUP BY ib),
allp AS (
  SELECT coalesce(nk.nk, 0)::BIGINT AS nk
  FROM embeddings emb LEFT JOIN nk ON emb.vec_id = nk.ib
),
m AS (
  SELECT count(*)::BIGINT AS n_points, sum(nk)::BIGINT AS s1,
         sum(nk::HUGEINT * nk::HUGEINT) AS s2,
         sum(nk::HUGEINT * nk::HUGEINT * nk::HUGEINT) AS s3,
         max(nk)::BIGINT AS max_k_occurrence,
         sum(CASE WHEN nk = 0 THEN 1 ELSE 0 END)::BIGINT AS n_antihubs
  FROM allp
)
SELECT n_points,
       round(s1 / CAST(n_points AS DOUBLE), 6) AS mean_k_occurrence_r,
       CASE WHEN CAST(s2 AS DOUBLE) / n_points
                 - (s1 / CAST(n_points AS DOUBLE))
                   * (s1 / CAST(n_points AS DOUBLE)) > 0
            THEN round((CAST(s3 AS DOUBLE) / n_points
                        - 3.0 * (s1 / CAST(n_points AS DOUBLE))
                              * (CAST(s2 AS DOUBLE) / n_points)
                        + 2.0 * (s1 / CAST(n_points AS DOUBLE))
                              * (s1 / CAST(n_points AS DOUBLE))
                              * (s1 / CAST(n_points AS DOUBLE)))
                       / power(sqrt(CAST(s2 AS DOUBLE) / n_points
                                    - (s1 / CAST(n_points AS DOUBLE))
                                      * (s1 / CAST(n_points AS DOUBLE))),
                               3.0), 6)
            ELSE 0.0 END AS skewness_r,
       max_k_occurrence, n_antihubs
FROM m
"""

QUERIES.update({"knn_hubness": q_knn_hubness})
ORACLES.update({"knn_hubness": ORACLE_KNN_HUBNESS})


# --- epsilon-radius pair curve ---------------------------------------------------------

EPS_LADDER = [1.0, 1.1, 1.2, 1.3, 1.4]


def q_embedding_radius_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-sensitivity curve for radius search / ε-graph construction:
    cumulative pair counts and touched-point counts at a ladder of L2
    radii spanning the corpus's near-neighbor band (1.0-1.4; the p0.1-p50
    percentiles of the pairwise-distance distribution, bracketing
    `range_search`'s 1.1) — the embedding-space twin of
    `dedup_threshold_curve` (that one
    tunes a Hamming cutoff; this tunes the ε behind `range_search`,
    `spatial_radius_join`, and any DBSCAN-style ε-graph: where does the
    pair graph percolate?).

    Determinism: exact fixed-fold squared distances compared to exact
    squared-radius literals; integer counts.

    Scale: ONE pair-distance pass (the expensive part) fans out over the
     5-radius broadcast ladder — the curve costs one radius join, not
    five; at corpus scale the same fan-out reads the grid/IVF candidate
    pairs instead of the exhaustive twin."""
    from pyvectorsearch_spark.functions.vector import l2_sq

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    a = emb.select(F.col("vec_id").alias("_ia"), F.col("embedding").alias("_va"))
    b = emb.select(F.col("vec_id").alias("_ib"), F.col("embedding").alias("_vb"))
    max_eps2 = max(EPS_LADDER) ** 2
    pairs = (
        a.join(b, F.col("_ia") < F.col("_ib"))
        .withColumn("_d", l2_sq("_va", "_vb"))
        .filter(F.col("_d") <= F.lit(max_eps2))
        .select("_ia", "_ib", "_d")
    )
    # lazy: lineage truncation still shares ONE distance pass across the
    # two branches, without running the O(n^2) job at plan-build time
    pairs = pairs.localCheckpoint(eager=False)
    eps = spark.createDataFrame(
        [(float(e),) for e in EPS_LADDER], "epsilon double"
    )
    fan = pairs.crossJoin(F.broadcast(eps)).filter(
        F.col("_d") <= F.col("epsilon") * F.col("epsilon")
    )
    cnt = fan.groupBy("epsilon").agg(
        F.count("*").cast("bigint").alias("n_pairs")
    )
    touched = (
        fan.select("epsilon", F.explode(F.array("_ia", "_ib")).alias("_p"))
        .groupBy("epsilon")
        .agg(F.countDistinct("_p").cast("bigint").alias("n_points_touched"))
    )
    return (
        eps.join(cnt, "epsilon", "left")
        .join(touched, "epsilon", "left")
        .select(
            F.round("epsilon", 2).alias("epsilon_r"),
            F.coalesce("n_pairs", F.lit(0)).cast("bigint").alias("n_pairs"),
            F.coalesce("n_points_touched", F.lit(0))
            .cast("bigint")
            .alias("n_points_touched"),
        )
        .orderBy("epsilon_r")
    )


_RC_L2 = duckdb_l2_sq("a.embedding", "b.embedding", DIM)
_EPS_LIST = ", ".join(repr(float(e)) for e in EPS_LADDER)

ORACLE_EMBEDDING_RADIUS_CURVE = f"""
WITH pairs AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib, {_RC_L2} AS d
  FROM embeddings a, embeddings b
  WHERE a.vec_id < b.vec_id
),
eps AS (SELECT unnest([{_EPS_LIST}])::DOUBLE AS epsilon),
fan AS (
  SELECT e.epsilon, p.ia, p.ib FROM pairs p
  JOIN eps e ON p.d <= e.epsilon * e.epsilon
),
cnt AS (SELECT epsilon, count(*)::BIGINT AS n_pairs FROM fan GROUP BY epsilon),
touched AS (
  SELECT epsilon, count(DISTINCT pt)::BIGINT AS n_points_touched
  FROM (SELECT epsilon, ia AS pt FROM fan
        UNION ALL SELECT epsilon, ib FROM fan)
  GROUP BY epsilon
)
SELECT round(e.epsilon, 2) AS epsilon_r,
       coalesce(c.n_pairs, 0)::BIGINT AS n_pairs,
       coalesce(t.n_points_touched, 0)::BIGINT AS n_points_touched
FROM eps e LEFT JOIN cnt c ON e.epsilon = c.epsilon
LEFT JOIN touched t ON e.epsilon = t.epsilon
ORDER BY epsilon_r
"""

QUERIES.update({"embedding_radius_curve": q_embedding_radius_curve})
ORACLES.update({"embedding_radius_curve": ORACLE_EMBEDDING_RADIUS_CURVE})


# --- anisotropy (mean pairwise cosine) ----------------------------------------------


def q_embedding_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anisotropy of the embedding space (Ethayarajh 2019): the mean
    cosine between ALL pairs of (unit-normalized) vectors — ≈0 for an
    isotropic cloud, ≫0 when everything shares a dominant direction (the
    'cone effect' that wrecks cosine-based retrieval and is why whitening
    exists). Computed by the CLOSED FORM (‖Σu‖² − Σ‖u‖²)/(n(n−1)) — one
    map-side pass over the corpus, NO pair enumeration at any scale: the
    n² statistic for the price of a sum.

    Determinism: each normalized coordinate rounds to 6 dp and micro-
    fixes; the coordinate sums and the Σ‖u‖² are exact bigints; squares
    accumulate in DECIMAL/HUGEINT; one final division.

    Scale: one aggregate producing dim+1 integers — the closed form IS
    the 100 TB design."""
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    nrm = F.sqrt(
        F.aggregate(
            F.transform(F.col("embedding"), lambda x: x.cast("double") * x),
            F.lit(0.0),
            lambda a, v: a + v,
        )
    )
    u = emb.select(
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") / nrm, 6),
        ).alias("_u")
    ).filter(nrm > 0)
    DIM_ = DIM
    cols = [
        F.sum(F.round(F.element_at("_u", i + 1) * 1000000).cast("bigint"))
        .cast("bigint")
        .alias(f"_s{i}")
        for i in range(DIM_)
    ]
    sq_norm_u = F.aggregate(
        F.transform(F.col("_u"), lambda x: F.round(x * 1000000).cast("bigint")
                    .cast("decimal(38,0)") * F.round(x * 1000000).cast("bigint")
                    .cast("decimal(38,0)")),
        F.lit(0).cast("decimal(38,0)"),
        lambda a, v: a + v,
    )
    m = u.agg(
        F.count("*").cast("bigint").alias("_n"),
        F.sum(sq_norm_u).alias("_snorm"),
        *cols,
    )
    dd = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    ssq = None
    for i in range(DIM_):
        term = dd(m[f"_s{i}"]) * dd(m[f"_s{i}"])
        ssq = term if ssq is None else ssq + term
    mean_cos = (ssq - m["_snorm"]).cast("double") / (
        F.lit(1e12) * m["_n"].cast("double") * (m["_n"] - 1).cast("double")
    )
    return m.select(
        F.col("_n").alias("n_vectors"),
        F.round(mean_cos, 6).alias("mean_pairwise_cosine_r"),
    )



def _anisotropy_oracle() -> str:
    s_cols = ", ".join(
        f"sum(CAST(round(u[{i + 1}] * 1000000) AS BIGINT))::BIGINT AS s{i}"
        for i in range(DIM)
    )
    ssq = " + ".join(f"s{i}::HUGEINT * s{i}::HUGEINT" for i in range(DIM))
    return f"""
WITH nu AS (
  SELECT list_transform(embedding,
           x -> round(CAST(x AS DOUBLE)
                / sqrt(list_sum(list_transform(embedding,
                        e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE)))), 6)) AS u
  FROM embeddings
  WHERE sqrt(list_sum(list_transform(embedding,
        e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE)))) > 0
),
m AS (
  SELECT count(*)::BIGINT AS n,
         sum(list_sum(list_transform(u,
             x -> CAST(round(x * 1000000) AS BIGINT)::HUGEINT
                  * CAST(round(x * 1000000) AS BIGINT)::HUGEINT))) AS snorm,
         {s_cols}
  FROM nu
)
SELECT n AS n_vectors,
       round(CAST(({ssq}) - snorm AS DOUBLE)
             / (1e12 * CAST(n AS DOUBLE) * (n - 1)), 6)
         AS mean_pairwise_cosine_r
FROM m
"""


ORACLE_EMBEDDING_ANISOTROPY = _anisotropy_oracle()

QUERIES.update({"embedding_anisotropy": q_embedding_anisotropy})
ORACLES.update({"embedding_anisotropy": ORACLE_EMBEDDING_ANISOTROPY})


# --- RFF-MMD kernel two-sample drift test ------------------------------------

MMD_DIM = 64  # embedding dimensionality (fixture)
MMD_D = 32  # random Fourier features
MMD_SHIFT = 0.6  # planted mean shift on dim 1 for the positive control


def _mmd_rff_params() -> tuple[list[list[float]], list[float]]:
    """Deterministic RFF frequencies/phases: Box-Muller gaussians and a
    uniform phase from md5-seeded uniforms — generated in Python once, so
    BOTH engines consume the same literal constants (no engine hash math
    in the hot expression at all)."""
    import hashlib
    import math

    def u(tag: str) -> float:
        h = int(hashlib.md5(tag.encode()).hexdigest()[:12], 16)
        return (h + 0.5) / 2**48

    ws, bs = [], []
    for j in range(MMD_D):
        row = []
        for k in range(MMD_DIM):
            u1, u2 = u(f"mmd:w:{j}:{k}:1"), u(f"mmd:w:{j}:{k}:2")
            row.append(
                round(math.sqrt(-2.0 * math.log(u1)) * math.cos(2 * math.pi * u2), 9)
            )
        ws.append(row)
        bs.append(round(2 * math.pi * u(f"mmd:b:{j}"), 9))
    return ws, bs


def q_embedding_mmd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kernel two-sample drift test via random Fourier features (Rahimi &
    Recht NIPS'07; MMD of Gretton et al. JMLR'12): z_j(x) =
    cos(w_j·x + b_j) with md5-seeded Gaussian frequencies, and MMD² =
    (2/D)·Σ_j (mean_X z_j − mean_Y z_j)² — the LINEAR-time, mergeable
    estimator of the RBF-kernel MMD (the quadratic pairwise form is the
    thing this replaces at scale: per-partition feature means combine by
    weighted average, so the test runs as ONE map-side-combined aggregate
    per sample). Reported twice: even-vs-odd vec_id (the null — same
    distribution) and even-vs-odd-with-a-planted-dim-1 mean shift (the
    positive control); the planted shift must dominate the null by an
    order of magnitude for the test to mean anything.

    The w/b constants are Python-generated literals shared verbatim with
    the oracle; floats meet only in cos/avg, so round-6 parity holds."""
    ws, bs = _mmd_rff_params()
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("x")
    )

    def feats(xcol):
        cols = []
        for j in range(MMD_D):
            warr = lit_double_array(ws[j])
            dot = F.aggregate(
                F.zip_with(xcol, warr, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            cols.append(F.cos(dot + F.lit(bs[j])).alias(f"z{j}"))
        return cols

    shifted = F.concat(
        F.array(F.element_at("x", 1) + F.lit(MMD_SHIFT)),
        F.slice("x", 2, MMD_DIM - 1),
    )
    even = emb.filter(F.col("vec_id") % 2 == 0).select(*feats(F.col("x")))
    odd = emb.filter(F.col("vec_id") % 2 == 1).select(*feats(F.col("x")))
    odd_shift = emb.filter(F.col("vec_id") % 2 == 1).select(
        *feats(shifted)
    )

    def mean_row(df, prefix):
        return df.agg(
            F.count("*").cast("bigint").alias(f"{prefix}_n"),
            *[F.avg(f"z{j}").alias(f"{prefix}{j}") for j in range(MMD_D)],
        )

    ex, od, osf = mean_row(even, "e"), mean_row(odd, "o"), mean_row(odd_shift, "s")
    j3 = ex.crossJoin(od).crossJoin(osf)
    mmd_null = sum(
        ((F.col(f"e{j}") - F.col(f"o{j}")) * (F.col(f"e{j}") - F.col(f"o{j}"))
         for j in range(MMD_D)),
        F.lit(0.0),
    ) * (2.0 / MMD_D)
    mmd_shift = sum(
        ((F.col(f"e{j}") - F.col(f"s{j}")) * (F.col(f"e{j}") - F.col(f"s{j}"))
         for j in range(MMD_D)),
        F.lit(0.0),
    ) * (2.0 / MMD_D)
    return j3.select(
        F.col("e_n").alias("n_x"),
        F.col("o_n").alias("n_y"),
        F.lit(MMD_D).cast("int").alias("n_features"),
        F.round(mmd_null, 6).alias("mmd2_null_r"),
        F.round(mmd_shift, 6).alias("mmd2_shift_r"),
        F.round(mmd_shift / F.greatest(mmd_null, F.lit(1e-12)), 2).alias(
            "shift_over_null_r"
        ),
    )


def _mmd_oracle() -> str:
    ws, bs = _mmd_rff_params()

    def z(j, xexpr):
        warr = "[" + ", ".join(repr(v) for v in ws[j]) + "]"
        return f"cos(list_dot_product({xexpr}, {warr}) + {bs[j]!r})"

    x = "CAST(embedding AS DOUBLE[])"
    xs = (f"list_prepend(CAST(embedding[1] AS DOUBLE) + {MMD_SHIFT}, "
          f"CAST(embedding[2:{MMD_DIM}] AS DOUBLE[]))")
    e_cols = ", ".join(f"avg({z(j, x)}) AS e{j}" for j in range(MMD_D))
    o_cols = ", ".join(f"avg({z(j, x)}) AS o{j}" for j in range(MMD_D))
    s_cols = ", ".join(f"avg({z(j, xs)}) AS s{j}" for j in range(MMD_D))
    null_sum = " + ".join(f"(e.e{j} - o.o{j}) * (e.e{j} - o.o{j})" for j in range(MMD_D))
    shift_sum = " + ".join(f"(e.e{j} - s.s{j}) * (e.e{j} - s.s{j})" for j in range(MMD_D))
    return f"""
WITH e AS (
  SELECT count(*)::BIGINT AS e_n, {e_cols} FROM embeddings WHERE vec_id % 2 = 0
),
o AS (
  SELECT count(*)::BIGINT AS o_n, {o_cols} FROM embeddings WHERE vec_id % 2 = 1
),
s AS (
  SELECT {s_cols} FROM embeddings WHERE vec_id % 2 = 1
)
SELECT e.e_n AS n_x, o.o_n AS n_y, {MMD_D}::INT AS n_features,
       round(({null_sum}) * {2.0 / MMD_D}, 6) AS mmd2_null_r,
       round(({shift_sum}) * {2.0 / MMD_D}, 6) AS mmd2_shift_r,
       round((({shift_sum}) * {2.0 / MMD_D})
             / greatest(({null_sum}) * {2.0 / MMD_D}, 1e-12), 2)
         AS shift_over_null_r
FROM e, o, s
"""


QUERIES.update({"embedding_mmd_drift": q_embedding_mmd_drift})
ORACLES.update({"embedding_mmd_drift": _mmd_oracle()})


def q_embedding_mmd_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution drift ranking: for every source, the
    RFF-MMD² between its documents' embeddings and the REST of the corpus
    — the "which ingest feeds changed under us" diagnostic a 100 TB
    curation pipeline runs nightly. Rest-of-corpus feature means come
    from the corpus totals (mean_rest = (N·mean_all − n_s·mean_s)/(N −
    n_s)), so the whole report is ONE grouped aggregate + one global
    aggregate — per-source MMD with a single corpus scan, no per-source
    reruns. Same md5-seeded literal frequencies as
    ``embedding_mmd_drift``."""
    ws, bs = _mmd_rff_params()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").cast("array<double>").alias("x"),
    )
    joined = emb.join(F.broadcast(docs), "doc_id")

    zcols = []
    for j in range(MMD_D):
        warr = lit_double_array(ws[j])
        dot = F.aggregate(
            F.zip_with(F.col("x"), warr, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        zcols.append(F.cos(dot + F.lit(bs[j])).alias(f"z{j}"))
    feat = joined.select("source", *zcols)

    per = feat.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_s"),
        *[F.sum(f"z{j}").alias(f"s{j}") for j in range(MMD_D)],
    )
    tot = feat.agg(
        F.count("*").cast("bigint").alias("n_all"),
        *[F.sum(f"z{j}").alias(f"t{j}") for j in range(MMD_D)],
    )
    j2 = per.crossJoin(F.broadcast(tot))
    mmd = sum(
        (
            (
                F.col(f"s{j}") / F.col("n_s")
                - (F.col(f"t{j}") - F.col(f"s{j}"))
                / (F.col("n_all") - F.col("n_s"))
            )
            * (
                F.col(f"s{j}") / F.col("n_s")
                - (F.col(f"t{j}") - F.col(f"s{j}"))
                / (F.col("n_all") - F.col("n_s"))
            )
            for j in range(MMD_D)
        ),
        F.lit(0.0),
    ) * (2.0 / MMD_D)
    return (
        j2.select("source", "n_s", F.round(mmd, 6).alias("mmd2_vs_rest_r"))
        .orderBy("source")
    )


def _mmd_by_source_oracle() -> str:
    ws, bs = _mmd_rff_params()
    x = "CAST(e.embedding AS DOUBLE[])"

    def z(j):
        warr = "[" + ", ".join(repr(v) for v in ws[j]) + "]"
        return f"cos(list_dot_product({x}, {warr}) + {bs[j]!r})"

    feat_cols = ", ".join(f"{z(j)} AS z{j}" for j in range(MMD_D))
    per_cols = ", ".join(f"sum(z{j}) AS s{j}" for j in range(MMD_D))
    tot_cols = ", ".join(f"sum(z{j}) AS t{j}" for j in range(MMD_D))
    mmd = " + ".join(
        f"(p.s{j} / p.n_s - (t.t{j} - p.s{j}) / (t.n_all - p.n_s))"
        f" * (p.s{j} / p.n_s - (t.t{j} - p.s{j}) / (t.n_all - p.n_s))"
        for j in range(MMD_D)
    )
    return f"""
WITH feat AS (
  SELECT d.source, {feat_cols}
  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
),
per AS (
  SELECT source, count(*)::BIGINT AS n_s, {per_cols} FROM feat GROUP BY source
),
tot AS (SELECT count(*)::BIGINT AS n_all, {tot_cols} FROM feat)
SELECT p.source, p.n_s,
       round(({mmd}) * {2.0 / MMD_D}, 6) AS mmd2_vs_rest_r
FROM per p CROSS JOIN tot t ORDER BY p.source
"""


QUERIES.update({"embedding_mmd_by_source": q_embedding_mmd_by_source})
ORACLES.update({"embedding_mmd_by_source": _mmd_by_source_oracle()})


# --- Margin-based pair mining (bitext-mining scorer) --------------------------

MINE_K = 4
MINE_X_BOUND = 200  # anchors: label-0 rows with vec_id < 200 (batch side)


def q_embedding_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based candidate-pair mining (Artetxe & Schwenk, ACL 2019):
    label-0 anchors vs the label-1 pool, each anchor matched to its best
    pool row by the ratio margin cos / (mean of both sides' local top-k
    cosines) — the CCMatrix/LASER mined-parallel-data filter, which demotes
    hub vectors that raw cosine over-selects. `mutual` marks pairs that are
    each other's best match (the paper's intersection criterion)."""
    from pyvectorsearch_spark.operators.embeddings import margin_mining

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    x = emb.filter((F.col("label") == 0) & (F.col("vec_id") < MINE_X_BOUND))
    y = emb.filter(F.col("label") == 1)
    return margin_mining(x, y, k=MINE_K, round_dp=ROUND_DP).orderBy("x_id")


_MINE_COS = duckdb_cosine("x.xv", "y.yv", DIM)

ORACLE_EMBEDDING_MARGIN_MINING = f"""
WITH x AS (
  SELECT vec_id AS xid, embedding AS xv FROM embeddings
  WHERE label = 0 AND vec_id < {MINE_X_BOUND}
),
y AS (SELECT vec_id AS yid, embedding AS yv FROM embeddings WHERE label = 1),
pairs AS (
  SELECT x.xid, y.yid, round({_MINE_COS}, {ROUND_DP}) AS c
  FROM x CROSS JOIN y
),
r AS (
  SELECT xid, yid, c,
         row_number() OVER (PARTITION BY xid ORDER BY c DESC, yid ASC) AS rf,
         row_number() OVER (PARTITION BY yid ORDER BY c DESC, xid ASC) AS rb
  FROM pairs
),
af AS (
  SELECT xid, round(list_sum(list(c ORDER BY c)) / {MINE_K}.0,
               {ROUND_DP}) AS af
  FROM r WHERE rf <= {MINE_K} GROUP BY xid
),
ab AS (
  SELECT yid, round(list_sum(list(c ORDER BY c)) / {MINE_K}.0,
               {ROUND_DP}) AS ab
  FROM r WHERE rb <= {MINE_K} GROUP BY yid
),
best AS (SELECT xid, yid, c, (rb = 1) AS mutual FROM r WHERE rf = 1)
SELECT b.xid AS x_id, b.yid AS y_id, b.c AS cos_r,
       round(b.c / ((af.af + ab.ab) / 2.0), {ROUND_DP}) AS margin_r,
       b.mutual
FROM best b JOIN af USING (xid) JOIN ab USING (yid)
ORDER BY x_id
"""

QUERIES.update({"embedding_margin_mining": q_embedding_margin_mining})
ORACLES.update({"embedding_margin_mining": ORACLE_EMBEDDING_MARGIN_MINING})
