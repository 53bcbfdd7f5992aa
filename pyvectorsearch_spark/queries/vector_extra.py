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
from pyvectorsearch_spark.functions.lits import lit_double_array

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


KNN_COS_K = 5
KNN_COS_PROBES = 8


def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k by COSINE similarity (the embedding-retrieval metric; the
    reference's tree only speaks L2 — `search_knn`, pktree.hpp:948-973 —
    so this is the north-star metric extension): per probe, the 5 most
    similar vectors, descending similarity, id tiebreak."""
    from pyvectorsearch_spark.operators.knn import knn_join

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < KNN_COS_PROBES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    out = knn_join(emb, probes, KNN_COS_K, metric="cosine")
    return out.filter(F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        F.round("dist", 6).alias("cos_r"),
        F.col("rank").cast("int").alias("rank"),
    )


def _oracle_knn_cosine() -> str:
    from pyvectorsearch_spark.functions.vector import duckdb_cosine

    cos = duckdb_cosine("d.embedding", "q.embedding", 64)
    return f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {KNN_COS_PROBES}),
p AS (
  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id, {cos} AS c
  FROM embeddings d, q
),
r AS (
  SELECT query_id, neighbor_id, round(c, 6) AS cos_r,
         row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id ASC)::INT AS rank
  FROM p
)
SELECT query_id, neighbor_id, cos_r, rank FROM r
WHERE rank <= {KNN_COS_K} AND neighbor_id <> query_id
"""


ORACLE_KNN_COSINE = _oracle_knn_cosine()


KNN_CLS_K = 5
KNN_CLS_PROBES = 20


def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN CLASSIFICATION on the labeled embeddings — the application
    layer over vector search (the reference stops at neighbor lists;
    `pkmap` carries payloads, main.cpp:63-95): per probe, the majority
    label among its 5 nearest non-self neighbors (L2; vote ties break to
    the smaller label), reported with the true label. Scale shape: one
    bounded top-k join + a probes×labels-sized vote aggregate."""
    from pyspark.sql import Window
    from pyvectorsearch_spark.operators.knn import knn_join

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < KNN_CLS_PROBES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    nn = (
        knn_join(emb, probes, KNN_CLS_K + 1)
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    wk = Window.partitionBy("query_id").orderBy(F.asc("rank"))
    nn = nn.withColumn("_r2", F.row_number().over(wk)).filter(
        F.col("_r2") <= KNN_CLS_K
    )
    lab = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("_nl"))
    votes = nn.join(lab, "neighbor_id").groupBy("query_id", "_nl").agg(
        F.count("*").cast("bigint").alias("n_votes")
    )
    wv = Window.partitionBy("query_id").orderBy(F.desc("n_votes"), F.asc("_nl"))
    pred = (
        votes.withColumn("_rv", F.row_number().over(wv))
        .filter(F.col("_rv") == 1)
        .select("query_id", F.col("_nl").alias("pred_label"), "n_votes")
    )
    truth = emb.select(F.col("vec_id").alias("query_id"), F.col("label").alias("true_label"))
    return (
        pred.join(truth, "query_id")
        .select(
            "query_id",
            "true_label",
            "pred_label",
            "n_votes",
            (F.col("pred_label") == F.col("true_label")).alias("correct"),
        )
        .orderBy("query_id")
    )


def _oracle_knn_classify() -> str:
    d2 = duckdb_l2_sq("d.embedding", "q.embedding", 64)
    return f"""
WITH q AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id < {KNN_CLS_PROBES}),
p AS (
  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id, d.label AS nl, {d2} AS dist
  FROM embeddings d, q
  WHERE d.vec_id <> q.vec_id
),
r AS (
  SELECT query_id, nl,
         row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, neighbor_id ASC) AS rnk
  FROM p
),
votes AS (
  SELECT query_id, nl, count(*)::BIGINT AS n_votes
  FROM r WHERE rnk <= {KNN_CLS_K}
  GROUP BY query_id, nl
),
pred AS (
  SELECT query_id, nl AS pred_label, n_votes,
         row_number() OVER (PARTITION BY query_id ORDER BY n_votes DESC, nl ASC) AS rv
  FROM votes
)
SELECT p.query_id, q.label AS true_label, p.pred_label, p.n_votes,
       p.pred_label = q.label AS correct
FROM pred p JOIN q ON q.vec_id = p.query_id
WHERE p.rv = 1
ORDER BY p.query_id
"""


ORACLE_KNN_CLASSIFY = _oracle_knn_classify()

QUERIES.update(
    {"knn_cosine": q_knn_cosine, "knn_classify": q_knn_classify}
)
ORACLES.update(
    {"knn_cosine": ORACLE_KNN_COSINE, "knn_classify": ORACLE_KNN_CLASSIFY}
)


GRID3_K = 5
GRID3_PROBES = 8


def q_knn_grid_3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-index exact kNN in THREE dims — the dimensional-generality
    check on the PK-tree analog (the reference's grid geometry slices axes
    round-robin, `pktree.hpp:357-363`; nothing in the Spark rebuild is
    2-d-specific: cell ids, coverage bounds, and the coarse pre-bound all
    derive from the closed-form geometry at any rank/dim). Exact ⇒
    brute-force oracle."""
    from pyvectorsearch_spark.index.cache import build_or_load
    from pyvectorsearch_spark.index.grid import GridIndex

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .withColumn("p3", F.slice("embedding", 1, 3))
        .select("vec_id", "p3")
    )
    probes = emb.filter(F.col("vec_id") < GRID3_PROBES).select(
        F.col("vec_id").alias("query_id"), F.col("p3").alias("qvec")
    )
    idx = build_or_load(
        spark,
        f"grid3d_occ16_{dataset_tag(sf_dir, 'embeddings')}",
        load=GridIndex.load,
        build=lambda: GridIndex.build(
            emb, vec_col="p3", id_col="vec_id", target_occupancy=16
        ),
    )
    out = idx.knn(probes, GRID3_K)
    return out.select(
        "query_id", "neighbor_id", F.round("dist", 6).alias("dist_sq"), "rank"
    )


_D3 = duckdb_l2_sq("q.qvec", "e.p3", 3)

ORACLE_KNN_GRID_3D = f"""
WITH base AS (SELECT vec_id, embedding[1:3] AS p3 FROM embeddings),
q AS (SELECT vec_id AS query_id, p3 AS qvec FROM base WHERE vec_id < {GRID3_PROBES}),
pairs AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, {_D3} AS d
  FROM q CROSS JOIN base e
), ranked AS (
  SELECT query_id, neighbor_id, d,
         row_number() OVER (PARTITION BY query_id ORDER BY d, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, round(d, 6) AS dist_sq, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {GRID3_K}
"""


NDCG_K = 10
NDCG_PROBES = 20


def q_ndcg_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality eval: nDCG@10 per probe where relevance = 1 iff
    the neighbor shares the probe's label (self excluded) — the graded
    companion to the recall report (`sq8_recall_report`); the METRIC itself
    is oracle-checked because the ranking (cosine desc, id tiebreak) and
    the log2 discount ladder (per-term rounding) are engine-exact. IDCG
    normalizes by the ideal top-k given each probe's relevant-total."""
    from pyspark.sql import Window
    from pyvectorsearch_spark.operators.knn import knn_join

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < NDCG_PROBES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        F.col("label").alias("_ql"),
    )
    nn = knn_join(
        emb, probes.select("query_id", "qvec"), NDCG_K + 1, metric="cosine"
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    wk = Window.partitionBy("query_id").orderBy(F.asc("rank"))
    nn = nn.withColumn("_r", F.row_number().over(wk)).filter(F.col("_r") <= NDCG_K)
    lab = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("_nl"))
    rel = (
        nn.join(lab, "neighbor_id")
        .join(probes.select("query_id", "_ql"), "query_id")
        .withColumn("_rel", (F.col("_nl") == F.col("_ql")).cast("int"))
        .withColumn("_gain", F.round(F.col("_rel") / F.log2(F.col("_r") + 1), 6))
    )
    # relevant-total per probe (for IDCG): same-label rows in the corpus
    totals = (
        emb.select(F.col("label").alias("_ql"), F.lit(1).alias("_one"))
        .groupBy("_ql")
        .agg(F.count("*").alias("_nlab"))
    )
    dcg = rel.groupBy("query_id", "_ql").agg(
        F.round(F.sum("_gain"), 6).alias("dcg"),
        F.sum("_rel").cast("bigint").alias("n_rel_at_k"),
    )
    # ideal DCG: min(n_relevant_excl_self, k) ones at the top
    idcg_terms = F.expr(
        f"round(aggregate(sequence(1, int(least(_nlab - 1, {NDCG_K}))), "
        "cast(0.0 as double), (a, i) -> a + round(1.0 / log2(i + 1), 6)), 6)"
    )
    out = (
        dcg.join(totals, "_ql")
        .withColumn("idcg", idcg_terms)
        .select(
            "query_id",
            F.col("_ql").alias("label"),
            "n_rel_at_k",
            "dcg",
            F.when(F.col("idcg") > 0, F.round(F.col("dcg") / F.col("idcg"), 6))
            .otherwise(F.lit(0.0))
            .alias("ndcg"),
        )
        .orderBy("query_id")
    )
    return out


def _oracle_ndcg() -> str:
    from pyvectorsearch_spark.functions.vector import duckdb_cosine

    cos = duckdb_cosine("d.embedding", "q.embedding", 64)
    return f"""
WITH q AS (
  SELECT vec_id, embedding, label FROM embeddings WHERE vec_id < {NDCG_PROBES}
),
p AS (
  SELECT q.vec_id AS query_id, q.label AS ql, d.vec_id AS neighbor_id,
         d.label AS nl, {cos} AS c
  FROM embeddings d, q
  WHERE d.vec_id <> q.vec_id
),
r AS (
  SELECT query_id, ql, nl,
         row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id ASC) AS rk
  FROM p
),
g AS (
  SELECT query_id, ql,
         round(sum(round((CASE WHEN nl = ql THEN 1 ELSE 0 END) / log2(rk + 1), 6)), 6) AS dcg,
         sum(CASE WHEN nl = ql THEN 1 ELSE 0 END)::BIGINT AS n_rel_at_k
  FROM r WHERE rk <= {NDCG_K}
  GROUP BY query_id, ql
),
tot AS (SELECT label AS ql, count(*) AS nlab FROM embeddings GROUP BY label),
ideal AS (
  SELECT g.query_id, g.ql, g.dcg, g.n_rel_at_k,
         (SELECT round(sum(round(1.0 / log2(i + 1), 6)), 6)
          FROM unnest(range(1, least(tot.nlab - 1, {NDCG_K}) + 1)) AS u(i)) AS idcg
  FROM g JOIN tot USING (ql)
)
SELECT query_id, ql AS label, n_rel_at_k, dcg,
       CASE WHEN idcg > 0 THEN round(dcg / idcg, 6) ELSE 0.0 END AS ndcg
FROM ideal ORDER BY query_id
"""


ORACLE_NDCG = _oracle_ndcg()

QUERIES.update({"knn_grid_3d": q_knn_grid_3d, "ndcg_report": q_ndcg_report})
ORACLES.update({"knn_grid_3d": ORACLE_KNN_GRID_3D, "ndcg_report": ORACLE_NDCG})


JL_OUT_DIM = 16
JL_K = 10
JL_PROBES = 10


def q_knn_jl_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss dimension reduction audited end to end:
    project 64-d embeddings to 16-d with a deterministic md5-derived
    ±1 sign matrix (Achlioptas 2003's database-friendly projection — the
    SRP hyperplane family reused), then per probe report (a) recall@10 of
    projected top-k vs full-dimension truth and (b) the JL guarantee
    itself — the distance-distortion band ‖Rx‖²/(m·‖x‖²) over the probe's
    true top-10 (this corpus is unstructured, near-equidistant neighbors,
    so recall is near zero while distortion stays in the JL band: the two
    columns together are the honest story). All deterministic ⇒ the whole
    evaluation is hash-checked. Scale shape: zero-shuffle literal-matrix
    projection; bounded brute top-k per space; distortion join touches
    k rows per probe."""
    from pyspark.sql import Window
    from pyvectorsearch_spark.functions.vector import l2_sq
    from pyvectorsearch_spark.operators.dedup import _srp_hyperplanes
    from pyvectorsearch_spark.operators.knn import knn_join

    H = _srp_hyperplanes(JL_OUT_DIM, 64, salt="jl")
    signs = [[1.0 if h >= 0 else -1.0 for h in row] for row in H]
    emb = load_table(spark, sf_dir, "embeddings")

    def project(col):
        comps = [
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col(col).cast("array<double>"),
                        lit_double_array(signs[j]),
                        lambda a, b: a * b,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            )
            for j in range(JL_OUT_DIM)
        ]
        return F.array(*comps)

    proj = emb.select("vec_id", project("embedding").alias("pvec"))
    probes_full = emb.filter(F.col("vec_id") < JL_PROBES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    probes_proj = proj.filter(F.col("vec_id") < JL_PROBES).select(
        F.col("vec_id").alias("query_id"), F.col("pvec").alias("qvec")
    )
    exact = knn_join(emb, probes_full, JL_K + 1).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    approx = knn_join(
        proj, probes_proj, JL_K + 1, data_vec="pvec"
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    wk = Window.partitionBy("query_id").orderBy(F.asc("rank"))

    def topk(df):
        return (
            df.withColumn("_r", F.row_number().over(wk))
            .filter(F.col("_r") <= JL_K)
            .select("query_id", "neighbor_id", "dist")
        )

    ex_k = topk(exact)
    hits = (
        ex_k.select("query_id", "neighbor_id")
        .intersect(topk(approx).select("query_id", "neighbor_id"))
        .groupBy("query_id")
        .agg(F.count("*").cast("bigint").alias("n_hit"))
    )
    # distortion of the true top-k pairs: ||R(q-x)||^2 / (m * ||q-x||^2)
    pd_ = proj.select(F.col("vec_id").alias("neighbor_id"), F.col("pvec").alias("_nv"))
    ratio = F.round(
        l2_sq(F.col("_qv"), F.col("_nv")) / (F.lit(float(JL_OUT_DIM)) * F.col("dist")),
        6,
    )
    dist_stats = (
        ex_k.join(pd_, "neighbor_id")
        .join(probes_proj.select("query_id", F.col("qvec").alias("_qv")), "query_id")
        .filter(F.col("dist") > 0)
        .withColumn("_ratio", ratio)
        .groupBy("query_id")
        .agg(
            F.round(F.min("_ratio"), 6).alias("distort_min"),
            F.round(F.max("_ratio"), 6).alias("distort_max"),
        )
    )
    base = probes_full.select("query_id")
    return (
        base.join(hits, "query_id", "left")
        .join(dist_stats, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_hit", F.lit(0)).cast("bigint").alias("n_hit"),
            F.round(F.coalesce("n_hit", F.lit(0)) / float(JL_K), 6).alias("recall"),
            "distort_min",
            "distort_max",
        )
        .orderBy("query_id")
    )


def _oracle_jl_recall() -> str:
    from pyvectorsearch_spark.operators.dedup import _srp_hyperplanes

    H = _srp_hyperplanes(JL_OUT_DIM, 64, salt="jl")
    signs = [[1.0 if h >= 0 else -1.0 for h in row] for row in H]
    proj_comps = ", ".join(
        "round(list_sum(list_transform(range(1, 65), i -> "
        f"CAST(embedding[i] AS DOUBLE) * ([{', '.join(repr(x) for x in row)}])[i])), 6)"
        for row in signs
    )
    d_full = duckdb_l2_sq("d.embedding", "q.embedding", 64)
    d_proj = (
        "list_sum(list_transform(range(1, 17), i -> "
        "(d.pvec[i] - q.pvec[i]) ^ 2))"
    )
    return f"""
WITH proj AS MATERIALIZED (
  SELECT vec_id, [{proj_comps}] AS pvec FROM embeddings
),
exact_d AS MATERIALIZED (
  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id, {d_full} AS d,
         row_number() OVER (PARTITION BY q.vec_id ORDER BY {d_full} ASC, d.vec_id ASC) AS rk
  FROM embeddings d, (SELECT * FROM embeddings WHERE vec_id < {JL_PROBES}) q
  WHERE d.vec_id <> q.vec_id
),
exact_r AS (SELECT query_id, neighbor_id, rk FROM exact_d),
approx_r AS (
  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY q.vec_id ORDER BY {d_proj} ASC, d.vec_id ASC) AS rk
  FROM proj d, (SELECT * FROM proj WHERE vec_id < {JL_PROBES}) q
  WHERE d.vec_id <> q.vec_id
),
hits AS (
  SELECT e.query_id, count(*)::BIGINT AS n_hit
  FROM (SELECT query_id, neighbor_id FROM exact_r WHERE rk <= {JL_K}) e
  JOIN (SELECT query_id, neighbor_id FROM approx_r WHERE rk <= {JL_K}) a
    USING (query_id, neighbor_id)
  GROUP BY e.query_id
),
ds AS (
  SELECT e.query_id,
         round(min(round(
           list_sum(list_transform(range(1, {JL_OUT_DIM + 1}),
             i -> (pq.pvec[i] - pn.pvec[i]) ^ 2))
           / ({float(JL_OUT_DIM)} * e.d), 6)), 6) AS distort_min,
         round(max(round(
           list_sum(list_transform(range(1, {JL_OUT_DIM + 1}),
             i -> (pq.pvec[i] - pn.pvec[i]) ^ 2))
           / ({float(JL_OUT_DIM)} * e.d), 6)), 6) AS distort_max
  FROM (SELECT query_id, neighbor_id, d FROM exact_d WHERE rk <= {JL_K} AND d > 0) e
  JOIN proj pq ON pq.vec_id = e.query_id
  JOIN proj pn ON pn.vec_id = e.neighbor_id
  GROUP BY e.query_id
)
SELECT q.vec_id AS query_id,
       coalesce(h.n_hit, 0)::BIGINT AS n_hit,
       round(coalesce(h.n_hit, 0) / {float(JL_K)}, 6) AS recall,
       ds.distort_min, ds.distort_max
FROM (SELECT vec_id FROM embeddings WHERE vec_id < {JL_PROBES}) q
LEFT JOIN hits h ON h.query_id = q.vec_id
LEFT JOIN ds ON ds.query_id = q.vec_id
ORDER BY query_id
"""


ORACLE_JL_RECALL = _oracle_jl_recall()

QUERIES.update({"knn_jl_recall": q_knn_jl_recall})
ORACLES.update({"knn_jl_recall": ORACLE_JL_RECALL})


RC_RADIUS = 0.15


def q_range_count_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT-only ε-range with aggregate pushdown into the grid index:
    wholly-inside cells answer from the stats table's per-cell counts (zero
    rows touched — the aggregate twin of the reference's whole-subtree
    emit, pktree.hpp:1080-1089); only boundary cells scan. Exact ⇒
    brute-force count oracle."""
    from pyvectorsearch_spark.index.cache import build_or_load
    from pyvectorsearch_spark.index.grid import GridIndex

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .withColumn("p2", F.slice("embedding", 1, 2))
        .select("vec_id", "p2")
    )
    probes = emb.filter(F.col("vec_id") < 8).select(
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
    return idx.range_count(probes, RC_RADIUS).orderBy("query_id")


_RC_D2 = duckdb_l2_sq("q.p2", "e.p2", 2)

ORACLE_RANGE_COUNT = f"""
WITH base AS (SELECT vec_id, embedding[1:2] AS p2 FROM embeddings),
q AS (SELECT vec_id AS query_id, p2 FROM base WHERE vec_id < 8)
SELECT q.query_id, count(*)::BIGINT AS n_in_range
FROM q JOIN base e ON {_RC_D2} <= {RC_RADIUS * RC_RADIUS!r}
GROUP BY q.query_id
HAVING count(*) > 0
ORDER BY q.query_id
"""

QUERIES.update({"range_count_grid": q_range_count_grid})
ORACLES.update({"range_count_grid": ORACLE_RANGE_COUNT})


SI_K = 5
SI_PROBES = 8


def q_knn_stream_ingested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INSERT path driven end to end BY THE STREAMING ENGINE: vectors
    arrive as a multi-file stream, every micro-batch is cell-assigned with
    the index's closed-form expression and appended to cell-partitioned
    parquet (`streaming/ingest.stream_index_ingest` — the streaming
    replacement for the reference's insert rebalancing cascade,
    pktree.hpp:1262-1355), and exact kNN then runs OVER THE INGESTED
    dataset with stats recomputed from what actually landed. Geometry
    (origin/width) comes from the cached batch index — the build-once
    model a production ingest pipeline would pin. Exact ⇒ the same
    brute-force oracle as the batch grid query proves the streamed index
    equals the batch-built one."""
    import os
    import shutil
    import tempfile
    import uuid

    from pyvectorsearch_spark.index.cache import build_or_load
    from pyvectorsearch_spark.index.grid import CELL_SEP, GridIndex
    from pyvectorsearch_spark.streaming.ingest import (
        INGEST_BATCH_COL,
        drain_complete,
        mark_drain_complete,
        stream_index_ingest,
    )

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .withColumn("p2", F.slice("embedding", 1, 2))
        .select("vec_id", "p2")
    )
    geom = build_or_load(
        spark,
        f"grid2d_occ16_{dataset_tag(sf_dir, 'embeddings')}",
        load=GridIndex.load,
        build=lambda: GridIndex.build(
            emb, vec_col="p2", id_col="vec_id", target_occupancy=16
        ),
    )
    base = dataset_tag(sf_dir, "embeddings")
    landing = os.path.join(tempfile.gettempdir(), f"pvs_emb_landing6_{base}")
    if not os.path.isdir(landing):
        tmp = f"{landing}.tmp-{uuid.uuid4().hex[:8]}"
        emb.repartition(6).write.parquet(tmp)
        try:
            os.rename(tmp, landing)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.isdir(landing):
                raise
    out = os.path.join(tempfile.gettempdir(), f"pvs_emb_ingested_{base}")
    ck = f"{out}.ck"
    # The sentinel (not mere dir existence) gates reuse: a crash or the
    # TimeoutError path leaves out/ck present but PARTIAL (ADVICE r7).
    if not drain_complete(out, ck):
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)
        schema = spark.read.parquet(landing).schema
        stream = spark.readStream.schema(schema).parquet(landing)
        assign = lambda df: df.withColumn(  # noqa: E731
            "cell",
            GridIndex._cell_expr(
                "p2", geom.origin, geom.width, geom.fine_level,
                geom.dim, geom.rr, geom.ratio,
                # pinned geometry + live arrivals: never clamp — an
                # out-of-box point must keep its honest (possibly
                # negative) coords or pruned search goes inexact
                clamp=False,
            ),
        )
        q = stream_index_ingest(
            stream, assign=assign, out_path=out, checkpoint=ck
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "availableNow drain exceeded 300 s; the memory sink "
                "would be partial — failing loud instead (ADVICE r6)"
            )
        mark_drain_complete(out)
    ingested = spark.read.parquet(out).drop(INGEST_BATCH_COL)
    parts = F.split("cell", CELL_SEP)
    stats = ingested.groupBy("cell").agg(F.count("*").cast("long").alias("count")).select(
        "cell",
        F.element_at(parts, 1).cast("int").alias("level"),
        F.slice(parts, 2, geom.dim).cast("array<long>").alias("coords"),
        "count",
    )
    idx = GridIndex(
        df=ingested,
        stats_df=stats,
        origin=geom.origin,
        width=geom.width,
        dim=geom.dim,
        rank=geom.rank,
        rr=geom.rr,
        ratio=geom.ratio,
        fine_level=geom.fine_level,
        id_col="vec_id",
        vec_col="p2",
    )
    probes = emb.filter(F.col("vec_id") < SI_PROBES).select(
        F.col("vec_id").alias("query_id"), F.col("p2").alias("qvec")
    )
    out_df = idx.knn(probes, SI_K)
    return out_df.select(
        "query_id", "neighbor_id", F.round("dist", 6).alias("dist_sq"), "rank"
    )


_SI_D2 = duckdb_l2_sq("q.qvec", "e.p2", 2)

ORACLE_KNN_STREAM_INGESTED = f"""
WITH base AS (SELECT vec_id, embedding[1:2] AS p2 FROM embeddings),
q AS (SELECT vec_id AS query_id, p2 AS qvec FROM base WHERE vec_id < {SI_PROBES}),
pairs AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, {_SI_D2} AS d
  FROM q CROSS JOIN base e
), ranked AS (
  SELECT query_id, neighbor_id, d,
         row_number() OVER (PARTITION BY query_id ORDER BY d, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, round(d, 6) AS dist_sq, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {SI_K}
"""

QUERIES.update({"knn_stream_ingested": q_knn_stream_ingested})
ORACLES.update({"knn_stream_ingested": ORACLE_KNN_STREAM_INGESTED})


# --- axis-aligned box search ----------------------------------------------

BOX_PROBES = 10
BOX_HALF = 0.12  # half-width of each probe's query box


def q_range_box_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Axis-aligned box search through the grid index (the rectangular
    companion the reference's ball-only API lacks; cells are boxes, so
    classification is per-axis interval overlap). Probes are boxes of
    half-width 0.12 centered on the first 10 vectors; exact ⇒ plain SQL
    containment oracle."""
    from pyvectorsearch_spark.index.grid import GridIndex

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .withColumn("p2", F.slice("embedding", 1, 2))
        .select("vec_id", "p2")
    )
    probes = emb.filter(F.col("vec_id") < BOX_PROBES).select(
        F.col("vec_id").alias("query_id"),
        F.transform("p2", lambda x: x - BOX_HALF).alias("qlo"),
        F.transform("p2", lambda x: x + BOX_HALF).alias("qhi"),
    )
    idx = build_or_load(
        spark,
        f"grid2d_occ16_{dataset_tag(sf_dir, 'embeddings')}",
        load=GridIndex.load,
        build=lambda: GridIndex.build(
            emb, vec_col="p2", id_col="vec_id", target_occupancy=16
        ),
    )
    return idx.box(probes).orderBy("query_id", "neighbor_id")


ORACLE_RANGE_BOX_GRID = f"""
WITH base AS (SELECT vec_id, embedding[1:2] AS p2 FROM embeddings),
q AS (
  SELECT vec_id AS query_id,
         list_transform(p2, x -> x - {BOX_HALF!r}) AS qlo,
         list_transform(p2, x -> x + {BOX_HALF!r}) AS qhi
  FROM base WHERE vec_id < {BOX_PROBES}
)
SELECT q.query_id, e.vec_id AS neighbor_id
FROM q CROSS JOIN base e
WHERE e.p2[1] >= q.qlo[1] AND e.p2[1] <= q.qhi[1]
  AND e.p2[2] >= q.qlo[2] AND e.p2[2] <= q.qhi[2]
ORDER BY query_id, neighbor_id
"""

QUERIES.update({"range_box_grid": q_range_box_grid})
ORACLES.update({"range_box_grid": ORACLE_RANGE_BOX_GRID})


# --- MRR (mean reciprocal rank) -------------------------------------------

MRR_K = 10
MRR_PROBES = 20


def q_mrr_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank eval: per probe, 1/rank of the FIRST same-label
    neighbor in the cosine top-10 (0 when none) — the navigational-search
    companion to nDCG/recall; ranking and reciprocal are engine-exact, so
    the metric itself is hash-checked. The cross-probe mean is one trivial
    aggregate away and deliberately left to the caller (per-probe rows are
    the auditable artifact)."""
    from pyspark.sql import Window

    from pyvectorsearch_spark.operators.knn import knn_join

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < MRR_PROBES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        F.col("label").alias("_ql"),
    )
    nn = knn_join(
        emb, probes.select("query_id", "qvec"), MRR_K + 1, metric="cosine"
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    wk = Window.partitionBy("query_id").orderBy(F.asc("rank"))
    nn = nn.withColumn("_r", F.row_number().over(wk)).filter(F.col("_r") <= MRR_K)
    lab = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("_nl"))
    rel = (
        nn.join(lab, "neighbor_id")
        .join(probes.select("query_id", "_ql"), "query_id")
        .filter(F.col("_nl") == F.col("_ql"))
        .groupBy("query_id", "_ql")
        .agg(F.min("_r").cast("int").alias("first_rel_rank"))
    )
    allq = probes.select("query_id", "_ql")
    return (
        allq.join(rel, ["query_id", "_ql"], "left")
        .select(
            "query_id",
            F.col("_ql").alias("label"),
            "first_rel_rank",
            F.when(
                F.col("first_rel_rank").isNotNull(),
                F.round(1.0 / F.col("first_rel_rank"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("rr"),
        )
        .orderBy("query_id")
    )


def _oracle_mrr() -> str:
    from pyvectorsearch_spark.functions.vector import duckdb_cosine

    cos = duckdb_cosine("d.embedding", "q.embedding", 64)
    return f"""
WITH q AS (
  SELECT vec_id, embedding, label FROM embeddings WHERE vec_id < {MRR_PROBES}
),
p AS (
  SELECT q.vec_id AS query_id, q.label AS ql, d.vec_id AS neighbor_id,
         d.label AS nl, {cos} AS c
  FROM embeddings d, q
  WHERE d.vec_id <> q.vec_id
),
r AS (
  SELECT query_id, ql, nl,
         row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id ASC) AS rk
  FROM p
),
fr AS (
  SELECT query_id, ql, CAST(min(rk) AS INT) AS first_rel_rank
  FROM r WHERE rk <= {MRR_K} AND nl = ql
  GROUP BY query_id, ql
)
SELECT q.vec_id AS query_id, q.label AS label, fr.first_rel_rank,
       CASE WHEN fr.first_rel_rank IS NOT NULL
            THEN round(1.0 / fr.first_rel_rank, 6) ELSE 0.0 END AS rr
FROM q LEFT JOIN fr ON q.vec_id = fr.query_id
ORDER BY query_id
"""


ORACLE_MRR = _oracle_mrr()

QUERIES.update({"mrr_report": q_mrr_report})
ORACLES.update({"mrr_report": ORACLE_MRR})
