"""Contract queries for the deterministic sampling / splitting / mixing /
packing operators (operators/sampling.py), each with a bit-exact DuckDB
oracle — the hash, threshold, and packing arithmetic is integer-only on both
sides, so no FP boundary can flip membership between engines."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.operators.sampling import (
    BUCKETS,
    assign_split,
    pack_chunked,
    pack_greedy,
    sample_flag,
    weighted_mixture_flag,
)
from pyvectorsearch_spark.sources.tables import load_table

# DuckDB twin of operators.sampling.hash_bucket
def _bucket_sql(salt: str, id_expr: str = "doc_id") -> str:
    return (
        f"('0x' || substr(md5('{salt}' || {id_expr}::VARCHAR), 1, 12))::BIGINT"
        f" % {BUCKETS}"
    )


SPLIT_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}
STRATA_FRACTIONS = {"en": 0.5, "de": 0.25, "es": 0.75, "fr": 0.1}  # zh absent
MIX_WEIGHTS = {f"src{i}": 1 + (i % 3) for i in range(20)}
MIX_TARGET = 200
PACK_BUDGET = 4096


def q_sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split of documents; per-split
    doc and char counts audit that membership is hash-stable."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        assign_split(docs, fractions=SPLIT_FRACTIONS)
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split")
    )


ORACLE_HASH_SPLIT = f"""
SELECT split, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
FROM (
  SELECT CASE WHEN b < 8000 THEN 'train'
              WHEN b < 9000 THEN 'val'
              WHEN b < 10000 THEN 'test' END AS split, n_chars
  FROM (SELECT {_bucket_sql("split")} AS b, n_chars FROM documents)
)
GROUP BY split ORDER BY split
"""


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified hash sampling with per-language rates (zh deliberately
    absent → kept 0): kept/total per language in ONE pass over the scan via
    the sample flag (no second scan for the denominators)."""
    docs = load_table(spark, sf_dir, "documents")
    flagged = sample_flag(
        docs, strata_col="lang", fractions=STRATA_FRACTIONS, salt="strat"
    )
    return (
        flagged.groupBy("lang")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.when(F.col("sampled"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
        )
        .orderBy("lang")
    )


def _strata_case() -> str:
    arms = " ".join(
        f"WHEN lang = '{k}' THEN {int(round(v * BUCKETS))}"
        for k, v in STRATA_FRACTIONS.items()
    )
    return f"CASE {arms} ELSE 0 END"


ORACLE_STRATIFIED = f"""
SELECT lang, count(*) AS n_total,
       sum(CASE WHEN {_bucket_sql("strat")} < {_strata_case()}
                THEN 1 ELSE 0 END)::BIGINT AS n_kept
FROM documents
GROUP BY lang ORDER BY lang
"""


def q_sample_weighted_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted multi-source mixture: each source's kept count approximates
    target * w_s / Σw (integer-threshold arithmetic, capped by source size).
    The per-source threshold table broadcasts; the scan shuffles only for
    the final audit aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    flagged = weighted_mixture_flag(
        docs, weights=MIX_WEIGHTS, target_rows=MIX_TARGET, salt="mix"
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.when(F.col("sampled"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
        )
        .orderBy("source")
    )


def _weights_values() -> str:
    return ", ".join(f"('{k}', {v})" for k, v in MIX_WEIGHTS.items())


ORACLE_WEIGHTED_MIXTURE = f"""
WITH w(source, wt) AS (VALUES {_weights_values()}),
c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
t AS (
  SELECT c.source,
         least({BUCKETS},
               ({MIX_TARGET} * coalesce(wt, 0) * {BUCKETS})
               // ((SELECT sum(wt) FROM w) * n)) AS thr
  FROM c LEFT JOIN w USING (source)
)
SELECT d.source, count(*) AS n_total,
       sum(CASE WHEN {_bucket_sql("mix")} < coalesce(thr, 0) THEN 1 ELSE 0 END)::BIGINT
         AS n_kept
FROM documents d LEFT JOIN t ON d.source = t.source
GROUP BY d.source ORDER BY d.source
"""


def q_sample_pack_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing of each source's documents (doc_id order)
    into 4096-char packs: per-pack doc counts, char totals, and the last
    start offset — one window shuffle per shard."""
    docs = load_table(spark, sf_dir, "documents")
    packed = pack_chunked(
        docs, by="source", budget=PACK_BUDGET, size_col="n_chars"
    )
    return (
        packed.groupBy("source", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.max("pack_offset").cast("bigint").alias("last_offset"),
        )
        .orderBy("source", "pack_id")
    )


ORACLE_PACK_CHUNKED = f"""
WITH s AS (
  SELECT source, doc_id, n_chars,
         coalesce(sum(n_chars) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
  FROM documents
)
SELECT source, (start // {PACK_BUDGET})::BIGINT AS pack_id,
       count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars,
       max(start % {PACK_BUDGET})::BIGINT AS last_offset
FROM s GROUP BY source, pack_id ORDER BY source, pack_id
"""


def q_sample_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy whole-document packing per source (no doc split across packs):
    per-pack doc counts and fill. The oracle replays the same walk as a
    recursive CTE — row-at-a-time per source, which DuckDB iterates
    set-wise, one step per row rank."""
    docs = load_table(spark, sf_dir, "documents")
    packed = pack_greedy(
        docs, by="source", budget=PACK_BUDGET, size_col="n_chars"
    )
    return (
        packed.groupBy("source", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("source", "pack_id")
    )


ORACLE_PACK_GREEDY = f"""
WITH RECURSIVE ordered AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
), walk AS (
  SELECT source, doc_id, n_chars, rn, 0 AS pack_id, n_chars AS fill
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.source, o.doc_id, o.n_chars, o.rn,
         CASE WHEN w.fill + o.n_chars <= {PACK_BUDGET}
              THEN w.pack_id ELSE w.pack_id + 1 END,
         CASE WHEN w.fill + o.n_chars <= {PACK_BUDGET}
              THEN w.fill + o.n_chars ELSE o.n_chars END
  FROM walk w JOIN ordered o ON o.source = w.source AND o.rn = w.rn + 1
)
SELECT source, pack_id::BIGINT AS pack_id, count(*) AS n_docs,
       sum(n_chars)::BIGINT AS total_chars
FROM walk GROUP BY source, pack_id ORDER BY source, pack_id
"""


QUERIES = {
    "sample_hash_split": q_sample_hash_split,
    "sample_stratified": q_sample_stratified,
    "sample_weighted_mixture": q_sample_weighted_mixture,
    "sample_pack_chunked": q_sample_pack_chunked,
    "sample_pack_greedy": q_sample_pack_greedy,
}
ORACLES = {
    "sample_hash_split": ORACLE_HASH_SPLIT,
    "sample_stratified": ORACLE_STRATIFIED,
    "sample_weighted_mixture": ORACLE_WEIGHTED_MIXTURE,
    "sample_pack_chunked": ORACLE_PACK_CHUNKED,
    "sample_pack_greedy": ORACLE_PACK_GREEDY,
}
