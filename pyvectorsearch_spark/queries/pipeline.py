"""End-to-end training-data curation pipeline as ONE composed query:
quality-filter → exact dedup (keep first) → deterministic train split →
sequence packing → per-source pack stats. This is the workload the engine
exists for — every stage is an operator from this repo, the whole chain is
lazy (one Spark plan, stages fuse where Catalyst allows), and the DuckDB
oracle recomputes the identical chain as CTEs, so the COMPOSITION — not
just each stage — is hash-verified.

Scale shape of the composed plan: quality scoring and split assignment are
zero-shuffle projections fused into the scan; dedup is one digest groupBy +
semi join; packing is one window per source shard. Nothing collects.

FP note: the quality threshold compares the ROUNDED score (6 dp) on both
sides — the same precision the standalone text_quality oracle pins — so no
document can flip across the filter between engines."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.functions.text import tokens
from pyvectorsearch_spark.operators.dedup import exact_dedup
from pyvectorsearch_spark.operators.sampling import BUCKETS, assign_split, pack_chunked
from pyvectorsearch_spark.operators.textops import quality_score_col
from pyvectorsearch_spark.sources.tables import load_table

QUALITY_MIN = 0.5
PACK_BUDGET = 2048
SPLIT_FRACTIONS = {"train": 0.9, "holdout": 0.1}


def q_pipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → quality ≥ 0.5 → first-id-per-digest dedup → 90/10 hash
    split → keep train → 2048-char chunked packs per source → per-(source,
    pack) doc/char counts."""
    docs = load_table(spark, sf_dir, "documents")
    # The quality score is a pure projection, so filter INLINE on the scan —
    # no join, and certainly no broadcast of a per-document table (the exact
    # corpus-sized-broadcast trap round 2 removed from the dedup joins).
    kept = docs.filter(
        quality_score_col(F.col("text"), tokens("text")) >= QUALITY_MIN
    )
    deduped = exact_dedup(kept)
    train = assign_split(deduped, fractions=SPLIT_FRACTIONS, salt="split").filter(
        F.col("split") == "train"
    )
    packed = pack_chunked(
        train, by="source", budget=PACK_BUDGET, size_col="n_chars"
    )
    return (
        packed.groupBy("source", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("source", "pack_id")
    )


def _oracle() -> str:
    """CTE chain mirroring the exact expressions of the stage oracles
    (quality formula copied from queries.text.ORACLE_QUALITY; split bucket
    from queries.sampling; packing window from sample_pack_chunked)."""
    from pyvectorsearch_spark.functions.text import duckdb_tokens
    from pyvectorsearch_spark.operators.textops import STOPWORDS
    from pyvectorsearch_spark.queries.sampling import _bucket_sql

    tok = duckdb_tokens("text")
    stops = "[" + ", ".join(f"'{w}'" for ws in STOPWORDS.values() for w in ws) + "]"
    thr = int(round(SPLIT_FRACTIONS["train"] * BUCKETS))
    return f"""
WITH t0 AS (SELECT doc_id, text AS raw, source, n_chars, {tok} AS t
            FROM documents),
m AS (
  SELECT doc_id, raw, source, n_chars,
         len(t) AS n_tokens,
         CAST(len(list_filter(t, x -> list_contains({stops}, x))) AS DOUBLE)
           / greatest(len(t), 1) AS stopword_ratio,
         CAST(length(raw) - length(regexp_replace(lower(raw), '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
           / greatest(length(raw), 1) AS nonalnum_ratio
  FROM t0
),
kept AS (
  SELECT doc_id, raw AS text, source, n_chars FROM m
  WHERE round(least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * 0.4
              + (1.0 - nonalnum_ratio) * 0.3
              + least(stopword_ratio * 4.0, 1.0) * 0.3, 6) >= {QUALITY_MIN}
),
dedup AS (
  SELECT * FROM kept
  WHERE doc_id IN (SELECT min(doc_id) FROM kept GROUP BY md5(text))
),
train AS (
  SELECT * FROM dedup WHERE {_bucket_sql("split")} < {thr}
),
s AS (
  SELECT source, n_chars,
         coalesce(sum(n_chars) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
  FROM train
)
SELECT source, (start // {PACK_BUDGET})::BIGINT AS pack_id,
       count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
FROM s GROUP BY source, pack_id ORDER BY source, pack_id
"""


ORACLE_PIPELINE_CURATE = _oracle()


def q_pipeline_semantic_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-MODAL curation: semantic (embedding-space) dedup survivors
    joined back onto their documents (shared id space: vec_id = doc_id),
    then the text-quality gate, reported per source. The modality bridge
    is one equi-join of the survivor id set onto the document scan; the
    embedding side never moves text, the text side never moves vectors.
    The oracle recomputes the survivor set brute-force (lossless bucketed
    path == O(n^2) truth) and replays the identical quality expression."""
    from pyvectorsearch_spark.index.cache import build_or_load
    from pyvectorsearch_spark.operators.dedup import (
        AngularModel,
        angular_bucket_model,
        embedding_dup_pairs_bucketed,
    )
    from pyvectorsearch_spark.queries.dedup import MIN_COSINE
    from pyvectorsearch_spark.sources.tables import dataset_tag

    emb = load_table(spark, sf_dir, "embeddings")
    model = build_or_load(
        spark,
        f"angular16_seed42_{dataset_tag(sf_dir, 'embeddings')}",
        load=AngularModel.load,
        build=lambda: angular_bucket_model(emb, n_lists=16, seed=42),
    )
    pairs = embedding_dup_pairs_bucketed(emb, min_cosine=MIN_COSINE, model=model)
    drop = pairs.select(F.col("d2").alias("doc_id")).distinct()
    docs = load_table(spark, sf_dir, "documents")
    survivors = docs.join(drop, "doc_id", "left_anti")
    kept = survivors.filter(
        quality_score_col(F.col("text"), tokens("text")) >= QUALITY_MIN
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("source")
    )


def _oracle_semantic() -> str:
    from pyvectorsearch_spark.functions.text import duckdb_tokens
    from pyvectorsearch_spark.functions.vector import duckdb_cosine
    from pyvectorsearch_spark.operators.textops import STOPWORDS
    from pyvectorsearch_spark.queries.dedup import MIN_COSINE

    cos = duckdb_cosine("a.embedding", "b.embedding", 64)
    tok = duckdb_tokens("text")
    stops = "[" + ", ".join(f"'{w}'" for ws in STOPWORDS.values() for w in ws) + "]"
    return f"""
WITH drop_set AS (
  SELECT DISTINCT b.vec_id FROM embeddings a JOIN embeddings b
    ON a.vec_id < b.vec_id
  WHERE {cos} >= {MIN_COSINE}
),
surv AS (
  SELECT * FROM documents
  WHERE doc_id NOT IN (SELECT vec_id FROM drop_set)
),
m AS (
  SELECT doc_id, text AS raw, source, n_chars, {tok} AS t FROM surv
),
sc AS (
  SELECT doc_id, source, n_chars,
         len(t) AS n_tokens,
         CAST(len(list_filter(t, x -> list_contains({stops}, x))) AS DOUBLE)
           / greatest(len(t), 1) AS stopword_ratio,
         CAST(length(raw) - length(regexp_replace(lower(raw), '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
           / greatest(length(raw), 1) AS nonalnum_ratio
  FROM m
),
kept AS (
  SELECT source, n_chars FROM sc
  WHERE round(least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * 0.4
              + (1.0 - nonalnum_ratio) * 0.3
              + least(stopword_ratio * 4.0, 1.0) * 0.3, 6) >= {QUALITY_MIN}
)
SELECT source, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS total_chars
FROM kept GROUP BY source ORDER BY source
"""


ORACLE_PIPELINE_SEMANTIC = _oracle_semantic()


QUERIES = {"pipeline_curate": q_pipeline_curate}
ORACLES = {"pipeline_curate": ORACLE_PIPELINE_CURATE}
