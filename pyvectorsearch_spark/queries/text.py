"""Text-analysis queries over ``documents`` with exact DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.functions.text import duckdb_tokens
from pyvectorsearch_spark.operators.textops import (
    BPE_RE,
    LANGS,
    STOPWORDS,
    doc_fingerprint,
    language_id,
    text_quality,
    token_counts,
)
from pyvectorsearch_spark.sources.tables import load_table, spread

_TOK = duckdb_tokens("text")


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: labeled lang × predicted lang."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    pred = language_id(docs)
    return (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n"), F.round(F.avg("score"), 6).alias("avg_score"))
        .orderBy("lang", "pred_lang")
    )


def _lang_oracle() -> str:
    scores = ", ".join(
        f"CAST(len(list_filter(t, x -> list_contains({_sql_list(STOPWORDS[lang])}, x))) AS DOUBLE)"
        f" / greatest(len(t), 1) AS s_{lang}"
        for lang in LANGS
    )
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in LANGS) + ")"
    chain = " ".join(
        f"WHEN s_{lang} = best THEN '{lang}'" for lang in LANGS
    )
    return f"""
WITH toks AS (SELECT doc_id, lang, {_TOK} AS t FROM documents),
scored AS (SELECT doc_id, lang, {scores} FROM toks),
pred AS (
  SELECT doc_id, lang, {best} AS best,
         CASE WHEN {best} <= 0.0 THEN 'und' {chain} END AS pred_lang
  FROM scored
)
SELECT lang, pred_lang, count(*) AS n, round(avg(best), 6) AS avg_score
FROM pred GROUP BY lang, pred_lang ORDER BY lang, pred_lang
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    return text_quality(docs)


_ALL_STOPS = _sql_list([w for ws in STOPWORDS.values() for w in ws])

ORACLE_QUALITY = f"""
WITH t AS (SELECT doc_id, text AS raw, {_TOK} AS t FROM documents),
m AS (
  SELECT doc_id,
         len(t) AS n_tokens,
         length(raw) AS n_chars,
         CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE)
           / greatest(len(t), 1) AS avg_token_len,
         CAST(len(list_filter(t, x -> list_contains({_ALL_STOPS}, x))) AS DOUBLE)
           / greatest(len(t), 1) AS stopword_ratio,
         CAST(length(raw) - length(regexp_replace(lower(raw), '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
           / greatest(length(raw), 1) AS nonalnum_ratio
  FROM t
)
SELECT doc_id, n_tokens, n_chars,
       round(avg_token_len, 6) AS avg_token_len,
       round(stopword_ratio, 6) AS stopword_ratio,
       round(nonalnum_ratio, 6) AS nonalnum_ratio,
       round(least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * 0.4
             + (1.0 - nonalnum_ratio) * 0.3
             + least(stopword_ratio * 4.0, 1.0) * 0.3, 6) AS quality_score
FROM m
"""


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    return token_counts(docs)


ORACLE_TOKENS = f"""
SELECT doc_id,
       len({_TOK}) AS n_ws_tokens,
       len(regexp_extract_all(lower(text), '{BPE_RE}')) AS n_bpe_tokens,
       length(array_to_string({_TOK}, ' ')) AS n_norm_chars
FROM documents
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    return doc_fingerprint(docs)


ORACLE_FINGERPRINT = f"""
WITH n AS (SELECT doc_id, array_to_string({_TOK}, ' ') AS nt FROM documents)
SELECT doc_id,
       list_aggregate(list_transform(range(1, greatest(length(nt) - 7, 1) + 1),
                      i -> md5(substr(nt, CAST(i AS INT), 8))), 'min') AS fingerprint,
       length(nt) AS n_norm_chars
FROM n
"""


N_DECONTAM_PROBES = 5
DECONTAM_N = 8


def q_text_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing ≥ 1 distinct word
    8-gram with a probe "benchmark" set (here: the first 5 documents). The
    probe side broadcasts after exploding to (probe, gram); the corpus side
    never shuffles whole documents — only matched gram hits."""
    from pyvectorsearch_spark.operators.textops import ngram_contamination

    docs = spread(load_table(spark, sf_dir, "documents"))
    probes = docs.filter(F.col("doc_id") < N_DECONTAM_PROBES).select(
        F.col("doc_id").alias("probe_id"), "text"
    )
    out = ngram_contamination(docs, probes, n=DECONTAM_N)
    return out.orderBy("doc_id", "probe_id")


def _decontam_oracle() -> str:
    from pyvectorsearch_spark.functions.text import duckdb_shingles

    sh = duckdb_shingles("t", DECONTAM_N)
    return f"""
WITH toks AS (SELECT doc_id, {duckdb_tokens("text")} AS t FROM documents),
grams AS (
  SELECT doc_id, CASE WHEN len(t) >= {DECONTAM_N} THEN {sh}
                      ELSE [] END AS gr
  FROM toks
),
d AS (SELECT doc_id, len(gr) AS n_doc_grams, unnest(gr) AS g FROM grams),
p AS (SELECT doc_id AS probe_id, unnest(gr) AS g FROM grams
      WHERE doc_id < {N_DECONTAM_PROBES})
SELECT d.doc_id, p.probe_id, count(*)::BIGINT AS n_matched,
       d.n_doc_grams::BIGINT AS n_doc_grams,
       round(count(*) / greatest(d.n_doc_grams, 1)::DOUBLE, 6) AS overlap_frac
FROM d JOIN p ON d.g = p.g
GROUP BY d.doc_id, p.probe_id, d.n_doc_grams
ORDER BY d.doc_id, p.probe_id
"""


QUERIES = {
    "text_lang_confusion": q_lang_confusion,
    "text_quality": q_text_quality,
    "text_token_counts": q_token_counts,
    "text_fingerprint": q_doc_fingerprint,
    "text_decontamination": q_text_decontamination,
}

ORACLES = {
    "text_lang_confusion": _lang_oracle(),
    "text_quality": ORACLE_QUALITY,
    "text_token_counts": ORACLE_TOKENS,
    "text_fingerprint": ORACLE_FINGERPRINT,
    "text_decontamination": _decontam_oracle(),
}
