"""Filtered and hybrid search queries (outside the driver's pinned 50-entry
window; covered by tests/test_oracle_parity.py against the same DuckDB
oracles).

Extensions of the reference's exact-search surface
(`/root/reference/include/pktree.hpp:948-973`) toward what vector-store users
actually run:
- metadata-FILTERED kNN (pre-filter semantics: the predicate restricts the
  candidate set before ranking — exact, unlike post-filtering a top-k list)
- hybrid lexical+vector retrieval fused with Reciprocal Rank Fusion
  (Cormack et al. 2009: score = sum 1/(C + rank) over the lists that
  returned the id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyvectorsearch_spark.functions.vector import (
    cosine_sim,
    duckdb_cosine,
    duckdb_l2_sq,
)
from pyvectorsearch_spark.operators.knn import knn_join
from pyvectorsearch_spark.operators.textops import bm25_rank
from pyvectorsearch_spark.queries.text_rank import (
    BM25_B,
    BM25_K1,
    BM25_TERMS,
    oracle_bm25,
)
from pyvectorsearch_spark.sources.tables import load_table, spread

DIM = 64
N_PROBES = 8
K = 5
ALLOWED_LABELS = (1, 3, 5, 7)
RRF_C = 60
RRF_DEPTH = 50
RRF_TOPK = 20


def q_knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered exact kNN: nearest neighbors among vectors whose
    label is in a fixed allow-set (pre-filter semantics). The predicate is a
    pushed-down parquet filter on the scan — the candidate set shrinks
    BEFORE any distance math or shuffle, which post-filtering a top-k list
    cannot guarantee (it returns < k rows when the filter bites)."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    data = emb.filter(F.col("label").isin(*ALLOWED_LABELS))
    out = knn_join(data, probes, K, payload=["label"])
    return out.select(
        "query_id", "neighbor_id", F.round("dist", 6).alias("dist_sq"), "rank", "label"
    )


_DF = duckdb_l2_sq("q.qvec", "e.embedding", DIM)
_LABELS_SQL = ", ".join(str(x) for x in ALLOWED_LABELS)

ORACLE_KNN_FILTERED = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
  WHERE vec_id < {N_PROBES}
),
pairs AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, e.label, {_DF} AS d
  FROM q CROSS JOIN embeddings e
  WHERE e.label IN ({_LABELS_SQL})
),
ranked AS (
  SELECT query_id, neighbor_id, label, d,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY d, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, round(d, 6) AS dist_sq, rank, label
FROM ranked WHERE rank <= {K}
"""


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 over `documents` fused with cosine-to-probe
    over `embeddings` (shared id space: doc_id = vec_id) via Reciprocal Rank
    Fusion. Each list is depth-50; rrf = sum over lists containing the id of
    1/(60 + rank); top-20 by (rrf desc, id asc).

    Scale shape: both branches end in bounded top-k (window / TakeOrdered);
    the fusion is an outer join of two 50-row lists — driver-scale work
    regardless of corpus size."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    lex = bm25_rank(
        docs, BM25_TERMS, k1=BM25_K1, b=BM25_B, topk=RRF_DEPTH
    ).select(
        F.col("doc_id").alias("id"),
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .alias("lex_rank"),
    )
    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    # bounded top-k FIRST (TakeOrderedAndProject — distributed partial
    # top-k per partition, merge on the driver-sized result), THEN the
    # rank window over the 50-row list. A row_number window over the full
    # table would single-task-sort the corpus.
    vec_top = (
        emb.crossJoin(F.broadcast(probe))
        .select(
            F.col("vec_id").alias("id"),
            F.round(cosine_sim("embedding", "qvec"), 6).alias("_cos"),
        )
        .orderBy(F.desc("_cos"), F.asc("id"))
        .limit(RRF_DEPTH)
    )
    vec = vec_top.withColumn(
        "vec_rank",
        F.row_number().over(Window.orderBy(F.desc("_cos"), F.asc("id"))),
    ).select("id", "vec_rank")
    fused = lex.join(vec, "id", "full").select(
        "id",
        F.coalesce("lex_rank", F.lit(0)).cast("int").alias("lex_rank"),
        F.coalesce("vec_rank", F.lit(0)).cast("int").alias("vec_rank"),
        F.round(
            F.when(
                F.col("lex_rank").isNotNull(), 1.0 / (RRF_C + F.col("lex_rank"))
            ).otherwise(F.lit(0.0))
            + F.when(
                F.col("vec_rank").isNotNull(), 1.0 / (RRF_C + F.col("vec_rank"))
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), F.asc("id")).limit(RRF_TOPK)


_COS = duckdb_cosine("e.embedding", "p.qvec", DIM)

ORACLE_HYBRID_RRF = f"""
WITH bm AS ({oracle_bm25(RRF_DEPTH)}),
lex AS (
  SELECT doc_id AS id,
         row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS lex_rank
  FROM bm
),
p AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id AS id, round({_COS}, 6) AS cos
  FROM embeddings e CROSS JOIN p
),
vec AS (
  SELECT id, vec_rank FROM (
    SELECT id, row_number() OVER (ORDER BY cos DESC, id ASC) AS vec_rank
    FROM scored
  ) WHERE vec_rank <= {RRF_DEPTH}
),
fused AS (
  SELECT coalesce(lex.id, vec.id) AS id,
         coalesce(lex_rank, 0)::INT AS lex_rank,
         coalesce(vec_rank, 0)::INT AS vec_rank,
         round(
           CASE WHEN lex_rank IS NOT NULL
                THEN 1.0 / ({RRF_C} + lex_rank) ELSE 0.0 END
           + CASE WHEN vec_rank IS NOT NULL
                  THEN 1.0 / ({RRF_C} + vec_rank) ELSE 0.0 END,
           6) AS rrf
  FROM lex FULL OUTER JOIN vec ON lex.id = vec.id
)
SELECT id, lex_rank, vec_rank, rrf FROM fused
ORDER BY rrf DESC, id ASC LIMIT {RRF_TOPK}
"""

# BM25's depth-50 list needs >= 50 scored docs to be rank-stable; true at
# every shipped SF (500+ docs, 4 common query terms). The fusion itself is
# robust to shorter lists (outer join).

SQ8_RERANK = 4 * K


def q_knn_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 approximate kNN with exact shortlist re-rank. Scalar
    quantization is a CLOSED-FORM function of the data (per-dim min/max +
    rounding), so unlike IVF/PQ the whole approximate path — codes,
    approximate distances, shortlist, re-rank — is replicated in the DuckDB
    oracle: the ANN result itself is hash-checked, not recall-floored."""
    from pyvectorsearch_spark.index.sq import SQ8Index

    emb = load_table(spark, sf_dir, "embeddings")
    # build is a single map-side-combined min/max pass (dim-sized result) —
    # cheap enough to run in-query, unlike the k-means index families
    idx = SQ8Index.build(emb)
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    out = idx.knn(probes, K, rerank=SQ8_RERANK)
    return out.select(
        "query_id", "neighbor_id", F.round("dist", 6).alias("dist_sq"), "rank"
    )


def _oracle_sq8(rerank: int = SQ8_RERANK) -> str:
    rng = f"range(1, {DIM + 1})"
    code = (
        f"list_transform({rng}, i -> least(greatest("
        f"round((CAST(e.embedding[i] AS DOUBLE) - lo[i]) / step[i]), 0), 255))"
    )
    ad = (
        f"list_sum(list_transform({rng}, i -> "
        f"(CAST(q.qvec[i] AS DOUBLE) - (lo[i] + code[i] * step[i])) ^ 2))"
    )
    exact = duckdb_l2_sq("q.qvec", "e.embedding", DIM)
    return f"""
WITH u AS (
  SELECT generate_subscripts(embedding, 1) AS pos,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
st AS (
  SELECT pos, min(v) AS lo_c,
         CASE WHEN max(v) = min(v) THEN 1.0
              ELSE (max(v) - min(v)) / 255.0 END AS step_c
  FROM u GROUP BY pos
),
arrs AS (
  SELECT list(lo_c ORDER BY pos) AS lo, list(step_c ORDER BY pos) AS step
  FROM st
),
q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings
  WHERE vec_id < {N_PROBES}
),
c AS (
  SELECT e.vec_id, {code} AS code FROM embeddings e CROSS JOIN arrs
),
a AS (
  SELECT q.qid, c.vec_id, {ad} AS ad
  FROM q CROSS JOIN c CROSS JOIN arrs
),
short AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid ORDER BY ad, vec_id) AS r1
    FROM a
  ) WHERE r1 <= {rerank}
),
ex AS (
  SELECT q.qid, e.vec_id, {exact} AS d
  FROM short s
  JOIN q ON q.qid = s.qid
  JOIN embeddings e ON e.vec_id = s.vec_id
),
ranked AS (
  SELECT qid, vec_id, d,
         row_number() OVER (PARTITION BY qid ORDER BY d, vec_id) AS rank
  FROM ex
)
SELECT qid AS query_id, vec_id AS neighbor_id, round(d, 6) AS dist_sq, rank
FROM ranked WHERE rank <= {K}
"""


ORACLE_KNN_SQ8 = _oracle_sq8()



MMR_DEPTH = 15
MMR_K = 5
MMR_LAM = 0.7


def q_knn_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-5 (Carbonell & Goldstein 1998) from a depth-15
    cosine candidate list for probe vec_id=0: greedy
    lam*rel - (1-lam)*max-sim-to-selected with engine-exact rounded scores.
    Candidates and their pairwise similarities are bounded (depth x depth);
    the oracle unrolls the identical greedy steps as CTE layers."""
    from pyvectorsearch_spark.operators.knn import mmr_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    cand = (
        emb.crossJoin(F.broadcast(probe))
        .select(
            F.col("vec_id").alias("id"),
            F.round(cosine_sim("embedding", "qvec"), 6).alias("rel_r"),
        )
        .orderBy(F.desc("rel_r"), F.asc("id"))
        .limit(MMR_DEPTH)
    )
    cemb = emb.join(
        F.broadcast(cand.select("id")), emb["vec_id"] == F.col("id")
    ).select("id", "embedding")
    x = cemb.alias("x")
    y = cemb.select(
        F.col("id").alias("b"), F.col("embedding").alias("_bemb")
    ).alias("y")
    sims = (
        x.join(y, F.col("x.id") != F.col("b"))
        .select(
            F.col("x.id").alias("a"),
            "b",
            F.round(cosine_sim("embedding", "_bemb"), 6).alias("sim_r"),
        )
    )
    out = mmr_rerank(cand, sims, k=MMR_K, lam=MMR_LAM)
    return out.select(
        F.col("id").alias("vec_id"), "mmr_rank", "score_r"
    ).orderBy("mmr_rank")


def _oracle_mmr() -> str:
    cos_q = duckdb_cosine("e.embedding", "q.qvec", DIM)
    cos_p = duckdb_cosine("x.embedding", "y.embedding", DIM)
    lam = f"CAST({MMR_LAM!r} AS DOUBLE)"
    one_minus = f"CAST({1.0 - MMR_LAM!r} AS DOUBLE)"
    steps = []
    prev = "sel1"
    for i in range(2, MMR_K + 1):
        steps.append(
            f"""cand{i} AS (
  SELECT c.id, round({lam} * c.rel - {one_minus} * max(s.sim), 6) AS score
  FROM cand c JOIN sims s
    ON s.a = c.id AND s.b IN (SELECT id FROM {prev})
  WHERE c.id NOT IN (SELECT id FROM {prev})
  GROUP BY c.id, c.rel
),
pick{i} AS (
  SELECT id, {i} AS mmr_rank, score FROM cand{i}
  ORDER BY score DESC, id LIMIT 1
),
sel{i} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM pick{i})"""
        )
        prev = f"sel{i}"
    steps_sql = ",\n".join(steps)
    return f"""
WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
cand AS (
  SELECT e.vec_id AS id, round({cos_q}, 6) AS rel
  FROM embeddings e, q ORDER BY rel DESC, id LIMIT {MMR_DEPTH}
),
ce AS (
  SELECT c.id, e.embedding FROM cand c JOIN embeddings e ON e.vec_id = c.id
),
sims AS (
  SELECT x.id AS a, y.id AS b, round({cos_p}, 6) AS sim
  FROM ce x JOIN ce y ON x.id <> y.id
),
sel1 AS (
  SELECT id, 1 AS mmr_rank, rel AS score FROM cand
  ORDER BY rel DESC, id LIMIT 1
),
{steps_sql}
SELECT id AS vec_id, mmr_rank, score AS score_r
FROM {prev} ORDER BY mmr_rank
"""


ORACLE_KNN_MMR = _oracle_mmr()



def q_sq8_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-CHECKED recall@5: the evaluation harness itself as an
    operator. The approximate list is SQ8 with rerank depth = k (so the
    result is exactly the ADC top-5 — the hardest setting the index
    exposes; at sf0.01 8-bit quantization still achieves recall 1.0, and
    the oracle proves THAT, miss or not); the truth list is brute-force
    top-5. Because SQ8 is closed-form,
    BOTH lists are SQL-expressible and the recall numbers are hash-checked
    — the one ANN family where even the eval metric has an oracle. The
    same `recall_report` operator evaluates the IVF/PQ families in
    tests/test_ivf.py-style recall floors where no oracle is possible."""
    from pyvectorsearch_spark.index.sq import SQ8Index
    from pyvectorsearch_spark.operators.knn import knn_join_blocked, recall_report

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    approx = SQ8Index.build(emb).knn(probes, K, rerank=K)
    exact = knn_join_blocked(emb, probes, K)
    return recall_report(approx, exact).orderBy("query_id")


def _oracle_sq8_recall() -> str:
    exact_d = duckdb_l2_sq("q.qvec", "e.embedding", DIM)
    return f"""
WITH approx AS ({_oracle_sq8(rerank=K)}),
q AS (
  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
  WHERE vec_id < {N_PROBES}
),
allp AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY {exact_d}, e.vec_id) AS rank
  FROM q CROSS JOIN embeddings e
),
exk AS (SELECT query_id, neighbor_id FROM allp WHERE rank <= {K}),
h AS (
  SELECT a.query_id, count(*)::BIGINT AS n_hits
  FROM approx a JOIN exk USING (query_id, neighbor_id)
  GROUP BY a.query_id
),
t AS (SELECT query_id, count(*)::BIGINT AS n_exact FROM exk GROUP BY query_id)
SELECT t.query_id, coalesce(h.n_hits, 0)::BIGINT AS n_hits, t.n_exact,
       round(coalesce(h.n_hits, 0) / CAST(t.n_exact AS DOUBLE), 6) AS recall_r
FROM t LEFT JOIN h USING (query_id) ORDER BY query_id
"""


ORACLE_SQ8_RECALL = _oracle_sq8_recall()



MS_TOKS = 4  # token vectors per synthetic multi-vector document
MS_QUERIES = 5
MS_K = 3


def q_knn_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction (ColBERT-style) MaxSim retrieval: embeddings group
    into multi-vector documents (4 token vectors each, doc = vec_id div 4);
    the first 5 docs query the rest. Per-token max cosine + per-pair summed
    score, top-3 per query — rankings engine-exact through the rounded
    ladder, so the multi-vector retrieval itself is hash-checked."""
    from pyvectorsearch_spark.operators.embeddings import maxsim_topk

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    toks = emb.select(
        F.expr(f"vec_id div {MS_TOKS}").alias("doc"),
        F.col("vec_id").alias("tok_id"),
        "embedding",
    )
    qt = toks.filter(F.col("doc") < MS_QUERIES)
    return maxsim_topk(toks, qt, k=MS_K).orderBy("query_doc", "rank")


def _oracle_maxsim() -> str:
    from pyvectorsearch_spark.functions.vector import duckdb_cosine

    cos = duckdb_cosine("d.embedding", "q.embedding", 64)
    return f"""
WITH t AS (
  SELECT vec_id // {MS_TOKS} AS doc, vec_id AS tok_id, embedding
  FROM embeddings
),
q AS (SELECT * FROM t WHERE doc < {MS_QUERIES}),
p AS (
  SELECT q.doc AS qd, q.tok_id AS qt, d.doc AS dd,
         round({cos}, 6) AS c
  FROM t d JOIN q ON q.doc != d.doc
),
m AS (SELECT qd, qt, dd, max(c) AS mc FROM p GROUP BY qd, qt, dd),
s AS (SELECT qd, dd, round(sum(mc), 6) AS sc FROM m GROUP BY qd, dd),
r AS (
  SELECT qd, dd, sc,
         row_number() OVER (PARTITION BY qd ORDER BY sc DESC, dd ASC) AS rk
  FROM s
)
SELECT qd AS query_doc, CAST(rk AS INT) AS rank, dd AS doc, sc AS maxsim_r
FROM r WHERE rk <= {MS_K} ORDER BY query_doc, rank
"""


ORACLE_KNN_MAXSIM = _oracle_maxsim()

QUERIES = {
    "knn_filtered": q_knn_filtered,
    "hybrid_rrf": q_hybrid_rrf,
    "knn_maxsim": q_knn_maxsim,
    "knn_sq8": q_knn_sq8,
    "knn_mmr": q_knn_mmr,
    "sq8_recall_report": q_sq8_recall_report,
}
ORACLES = {
    "knn_filtered": ORACLE_KNN_FILTERED,
    "hybrid_rrf": ORACLE_HYBRID_RRF,
    "knn_maxsim": ORACLE_KNN_MAXSIM,
    "knn_sq8": ORACLE_KNN_SQ8,
    "knn_mmr": ORACLE_KNN_MMR,
    "sq8_recall_report": ORACLE_SQ8_RECALL,
}


# --- three-stage retrieval pipeline: BM25 -> cosine re-rank -> MMR ---------

RP_DEPTH = 15
RP_K = 5
RP_LAM = 0.7


def q_pipeline_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production retrieval stack as ONE composed query: lexical recall
    (BM25 top-15 for the fixed term set) → semantic re-rank (cosine of each
    candidate's embedding against probe vec 0 over the doc_id = vec_id
    bridge) → MMR diversification (top-5, λ=0.7). Every stage is bounded
    after BM25 (depth × depth sims), every score goes through the rounded
    ladder, and the oracle replays the whole stack — recall CTEs, re-rank,
    and the unrolled greedy MMR steps — so the END-TO-END pipeline is
    hash-checked, not just its stages."""
    from pyvectorsearch_spark.operators.knn import mmr_rerank

    docs = spread(load_table(spark, sf_dir, "documents"))
    emb = load_table(spark, sf_dir, "embeddings")
    cand0 = bm25_rank(docs, BM25_TERMS, k1=BM25_K1, b=BM25_B, topk=RP_DEPTH)
    probe = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    cand = (
        cand0.join(emb, cand0["doc_id"] == emb["vec_id"])
        .crossJoin(F.broadcast(probe))
        .select(
            F.col("doc_id").alias("id"),
            F.round(cosine_sim("embedding", "qvec"), 6).alias("rel_r"),
        )
        # RP_DEPTH rows; checkpointed so the BM25 recall stage runs ONCE —
        # left lazy it re-evaluated under BOTH of mmr_rerank's input
        # checkpoints (once for cand, once inside sims via cemb) (r10
        # optimization round)
        .localCheckpoint(eager=True)
    )
    cemb = emb.join(
        F.broadcast(cand.select("id")), emb["vec_id"] == F.col("id")
    ).select("id", "embedding")
    x = cemb.alias("x")
    y = cemb.select(
        F.col("id").alias("b"), F.col("embedding").alias("_bemb")
    ).alias("y")
    sims = x.join(y, F.col("x.id") != F.col("b")).select(
        F.col("x.id").alias("a"),
        "b",
        F.round(cosine_sim("embedding", "_bemb"), 6).alias("sim_r"),
    )
    out = mmr_rerank(cand, sims, k=RP_K, lam=RP_LAM)
    return out.select(
        F.col("id").alias("doc_id"), "mmr_rank", "score_r"
    ).orderBy("mmr_rank")


def _oracle_pipeline_retrieval() -> str:
    from pyvectorsearch_spark.queries.text_rank import _ORACLE_BM25_BODY

    cos_q = duckdb_cosine("e.embedding", "q.qvec", DIM)
    cos_p = duckdb_cosine("x.embedding", "y.embedding", DIM)
    lam = f"CAST({RP_LAM!r} AS DOUBLE)"
    one_minus = f"CAST({1.0 - RP_LAM!r} AS DOUBLE)"
    steps = []
    prev = "sel1"
    for i in range(2, RP_K + 1):
        steps.append(
            f"""cand{i} AS (
  SELECT c.id, round({lam} * c.rel - {one_minus} * max(s.sim), 6) AS score
  FROM cand c JOIN sims s
    ON s.a = c.id AND s.b IN (SELECT id FROM {prev})
  WHERE c.id NOT IN (SELECT id FROM {prev})
  GROUP BY c.id, c.rel
),
pick{i} AS (
  SELECT id, {i} AS mmr_rank, score FROM cand{i}
  ORDER BY score DESC, id LIMIT 1
),
sel{i} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM pick{i})"""
        )
        prev = f"sel{i}"
    steps_sql = ",\n".join(steps)
    return f"""{_ORACLE_BM25_BODY},
cand0 AS (
  SELECT doc_id FROM scored ORDER BY bm25 DESC, doc_id LIMIT {RP_DEPTH}
),
q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
cand AS (
  SELECT c.doc_id AS id, round({cos_q}, 6) AS rel
  FROM cand0 c JOIN embeddings e ON e.vec_id = c.doc_id CROSS JOIN q
),
ce AS (
  SELECT c.id, e.embedding FROM cand c JOIN embeddings e ON e.vec_id = c.id
),
sims AS (
  SELECT x.id AS a, y.id AS b, round({cos_p}, 6) AS sim
  FROM ce x JOIN ce y ON x.id <> y.id
),
sel1 AS (
  SELECT id, 1 AS mmr_rank, rel AS score FROM cand
  ORDER BY rel DESC, id LIMIT 1
),
{steps_sql}
SELECT id AS doc_id, mmr_rank, score AS score_r
FROM {prev} ORDER BY mmr_rank
"""


ORACLE_PIPELINE_RETRIEVAL = _oracle_pipeline_retrieval()

QUERIES.update({"pipeline_retrieval": q_pipeline_retrieval})
ORACLES.update({"pipeline_retrieval": ORACLE_PIPELINE_RETRIEVAL})


# ---------------------------------------------------------------------------
# Binary quantization (1-bit) kNN: Hamming shortlist + exact re-rank, and the
# recall report of the BQ path against exact brute force. Like SQ8, the code
# is a closed-form function of the data, so the full approximate pipeline is
# hash-checked by the oracle (index/bq.py).

BQ_RERANK = 4 * K


def q_knn_bq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BQ approximate kNN: sign-bit codes (64 dims → one bigint), Hamming
    shortlist of depth 4k via ``bit_count(code XOR qcode)``, exact squared-L2
    re-rank to top-k. Deterministic end-to-end (integer Hamming ties broken
    by id), so the ANN result itself is the oracle contract."""
    from pyvectorsearch_spark.index.bq import bq_knn

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    out = bq_knn(emb, probes, K, dim=DIM, rerank=BQ_RERANK)
    return out.select(
        "query_id", "neighbor_id", F.round("dist", 6).alias("dist_sq"), "rank"
    )


_BQ_HAM = (
    f"list_sum(list_transform(range(1, {DIM + 1}), i -> "
    f"CASE WHEN (q.qvec[i] > 0) <> (e.embedding[i] > 0) THEN 1 ELSE 0 END))"
)

_BQ_SHORT = f"""
q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings
  WHERE vec_id < {N_PROBES}
),
h AS (
  SELECT q.qid, e.vec_id, {_BQ_HAM} AS ham, {duckdb_l2_sq("q.qvec", "e.embedding", DIM)} AS d
  FROM q CROSS JOIN embeddings e
),
short AS (
  SELECT qid, vec_id, d FROM (
    SELECT qid, vec_id, d,
           row_number() OVER (PARTITION BY qid ORDER BY ham, vec_id) AS r1
    FROM h
  ) WHERE r1 <= {BQ_RERANK}
),
bq AS (
  SELECT qid, vec_id, d,
         row_number() OVER (PARTITION BY qid ORDER BY d, vec_id) AS rank
  FROM short
)"""

ORACLE_KNN_BQ = f"""
WITH {_BQ_SHORT}
SELECT qid AS query_id, vec_id AS neighbor_id, round(d, 6) AS dist_sq, rank
FROM bq WHERE rank <= {K}
"""


def q_bq_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the BQ path against exact brute force, per probe — the
    quantization-quality audit a user runs before trusting 1-bit codes.
    Both lists are deterministic, so even the recall numbers hash-match."""
    from pyvectorsearch_spark.index.bq import bq_knn

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    bq = bq_knn(emb, probes, K, dim=DIM, rerank=BQ_RERANK).select(
        "query_id", "neighbor_id"
    )
    exact = knn_join(emb, probes, K).select(
        "query_id", F.col("neighbor_id").alias("_nb")
    )
    hits = bq.join(
        exact,
        (bq["query_id"] == exact["query_id"]) & (bq["neighbor_id"] == exact["_nb"]),
    ).groupBy(bq["query_id"]).agg(F.count("*").alias("n_hits"))
    return (
        probes.select("query_id")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            F.round(F.coalesce("n_hits", F.lit(0)) / K, 6).alias("recall"),
        )
        .orderBy("query_id")
    )


ORACLE_BQ_RECALL = f"""
WITH {_BQ_SHORT},
exact AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid ORDER BY d, vec_id) AS rank
    FROM h
  ) WHERE rank <= {K}
),
hits AS (
  SELECT b.qid, count(*) AS n_hits
  FROM (SELECT qid, vec_id FROM bq WHERE rank <= {K}) b
  JOIN exact x ON b.qid = x.qid AND b.vec_id = x.vec_id
  GROUP BY b.qid
)
SELECT q.qid AS query_id, coalesce(n_hits, 0)::BIGINT AS n_hits,
       round(coalesce(n_hits, 0) / {K}.0, 6) AS recall
FROM q LEFT JOIN hits ON q.qid = hits.qid
ORDER BY q.qid
"""

QUERIES.update(
    {"knn_bq_rerank": q_knn_bq_rerank, "bq_recall_report": q_bq_recall_report}
)
ORACLES.update(
    {"knn_bq_rerank": ORACLE_KNN_BQ, "bq_recall_report": ORACLE_BQ_RECALL}
)


BQ_CURVE_DEPTHS = (5, 10, 20, 40)


def q_bq_rerank_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the BQ path as a function of Hamming-shortlist depth —
    the rerank-budget curve a user reads to size the shortlist (house
    precedent: dedup_threshold_curve, embedding_radius_curve). One row per
    depth: mean recall over the probe set. Every point is deterministic, so
    the whole curve hash-matches the oracle."""
    from pyvectorsearch_spark.index.bq import bq_knn

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    exact = knn_join(emb, probes, K).select(
        "query_id", F.col("neighbor_id").alias("_nb")
    )
    curves = []
    for d in BQ_CURVE_DEPTHS:
        bq = bq_knn(emb, probes, K, dim=DIM, rerank=d).select(
            "query_id", "neighbor_id"
        )
        hits = bq.join(
            exact,
            (bq["query_id"] == exact["query_id"])
            & (bq["neighbor_id"] == exact["_nb"]),
        ).agg(F.count("*").alias("n_hits"))
        curves.append(
            hits.select(
                F.lit(d).cast("int").alias("rerank_depth"),
                F.col("n_hits").cast("bigint").alias("n_hits"),
                F.round(F.col("n_hits") / (N_PROBES * K), 6).alias("avg_recall"),
            )
        )
    out = curves[0]
    for c in curves[1:]:
        out = out.unionByName(c)
    return out.orderBy("rerank_depth")


def _oracle_bq_curve() -> str:
    pieces = []
    for d in BQ_CURVE_DEPTHS:
        pieces.append(f"""
SELECT {d} AS rerank_depth, count(*)::BIGINT AS n_hits,
       round(count(*) / {N_PROBES * K}.0, 6) AS avg_recall
FROM (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid ORDER BY d, vec_id) AS rank
    FROM (
      SELECT qid, vec_id, d FROM (
        SELECT qid, vec_id, d,
               row_number() OVER (PARTITION BY qid ORDER BY ham, vec_id) AS r1
        FROM h
      ) WHERE r1 <= {d}
    )
  ) WHERE rank <= {K}
) b
JOIN (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid ORDER BY d, vec_id) AS rank
    FROM h
  ) WHERE rank <= {K}
) x ON b.qid = x.qid AND b.vec_id = x.vec_id""")
    union = "\nUNION ALL\n".join(pieces)
    return f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings
  WHERE vec_id < {N_PROBES}
),
h AS (
  SELECT q.qid, e.vec_id, {_BQ_HAM} AS ham,
         {duckdb_l2_sq("q.qvec", "e.embedding", DIM)} AS d
  FROM q CROSS JOIN embeddings e
)
SELECT * FROM ({union}) ORDER BY rerank_depth
"""


ORACLE_BQ_CURVE = _oracle_bq_curve()

QUERIES.update({"bq_rerank_curve": q_bq_rerank_curve})
ORACLES.update({"bq_rerank_curve": ORACLE_BQ_CURVE})
