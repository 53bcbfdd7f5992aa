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

QUERIES = {"pipeline_curate": q_pipeline_curate}
ORACLES = {"pipeline_curate": ORACLE_PIPELINE_CURATE}
