"""Web-corpus curation queries (outside the driver's pinned 50-entry window;
covered by tests/test_oracle_parity.py against the same DuckDB oracles).

Operators exercised (`operators/textops.py`):
- `html_clean` — HTML-to-text extraction (script/style drop, tag strip,
  entity decode, whitespace collapse), the step every Common-Crawl-derived
  pipeline runs before any quality/dedup signal.
- `url_stats` — per-domain URL census + blocklist flag (C4 badlist /
  RefinedWeb domain-rule input).

The corpus is plain word salad, so both queries PLANT deterministic
markup/URLs around each document (the `text_pii_redact` pattern) and the
oracle constructs the identical string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.operators.textops import (
    _HTML_TAG_RE,
    duckdb_html_clean_sql,
    html_clean,
    url_stats,
)
from pyvectorsearch_spark.sources.tables import load_table, spread


def _html_wrapped() -> F.Column:
    did = F.col("doc_id").cast("string")
    return F.concat(
        F.lit('<html><head><style>p{color:#777}</style><title>D'),
        did,
        F.lit('</title></head><body><h1 class="t">Doc '),
        did,
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit(" &amp; tail</p><script>var x=1;</script></body></html>"),
    )


_HTML_WRAP_SQL = (
    "'<html><head><style>p{color:#777}</style><title>D' || doc_id || "
    "'</title></head><body><h1 class=\"t\">Doc ' || doc_id || '</h1><p>' || "
    "text || ' &amp; tail</p><script>var x=1;</script></body></html>'"
)


def q_text_html_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML extraction over markup-wrapped documents: per-doc removed-tag
    count, clean length, and the md5 of the extracted text (pins the exact
    strip/decode/collapse semantics, order included)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    wrapped = docs.select("doc_id", _html_wrapped().alias("text"))
    out = html_clean(wrapped)
    return out.select(
        "doc_id",
        "n_tags",
        F.length("clean").alias("clean_len"),
        F.md5("clean").alias("clean_digest"),
    ).orderBy("doc_id")


def _oracle_html() -> str:
    clean = duckdb_html_clean_sql("txt")
    noscript = (
        "regexp_replace(regexp_replace(txt, '(?s)<script[^>]*>.*?</script>',"
        " ' ', 'g'), '(?s)<style[^>]*>.*?</style>', ' ', 'g')"
    )
    return f"""
WITH en AS (SELECT doc_id, {_HTML_WRAP_SQL} AS txt FROM documents),
cl AS (
  SELECT doc_id,
         len(regexp_extract_all({noscript}, '{_HTML_TAG_RE}'))::INT AS n_tags,
         {clean} AS clean
  FROM en
)
SELECT doc_id, n_tags, length(clean)::INT AS clean_len,
       md5(clean) AS clean_digest
FROM cl ORDER BY doc_id
"""


ORACLE_TEXT_HTML_CLEAN = _oracle_html()


BLOCKED_SUFFIX = ".bad-ads.net"


def _url_enriched() -> F.Column:
    did = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.lit(" see https://cdn"),
        (did % 7).cast("string"),
        F.lit(".example-site.org/p/"),
        did.cast("string"),
        F.lit(" and http://t"),
        (did % 3).cast("string"),
        F.lit(BLOCKED_SUFFIX + "/x?q=1 end"),
    )


_URL_ENRICH_SQL = (
    "text || ' see https://cdn' || (doc_id % 7) || '.example-site.org/p/' || "
    f"doc_id || ' and http://t' || (doc_id % 3) || '{BLOCKED_SUFFIX}/x?q=1 end'"
)


def q_text_url_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain URL census over URL-enriched documents: 7 CDN domains +
    3 blocked ad domains, with the blocklist flag compiled into the
    projection."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    enriched = docs.select("doc_id", _url_enriched().alias("text"))
    return url_stats(enriched, blocked_suffixes=[BLOCKED_SUFFIX]).orderBy("domain")


ORACLE_TEXT_URL_STATS = f"""
WITH en AS (SELECT doc_id, {_URL_ENRICH_SQL} AS txt FROM documents),
ex AS (
  SELECT doc_id,
         unnest(regexp_extract_all(txt, 'https?://([A-Za-z0-9.-]+)', 1))
           AS domain
  FROM en
),
u AS (SELECT domain, count(*)::BIGINT AS n_urls FROM ex GROUP BY domain),
d AS (
  SELECT domain, count(*)::BIGINT AS n_docs
  FROM (SELECT DISTINCT doc_id, domain FROM ex) GROUP BY domain
)
SELECT u.domain, n_urls, n_docs,
       (u.domain LIKE '%{BLOCKED_SUFFIX}') AS blocked
FROM u JOIN d ON u.domain = d.domain
ORDER BY u.domain
"""


FH_DIM = 32


def q_text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization of every document (32 buckets, signed):
    nnz, L1 mass, and a digest pinning every component in bucket order —
    the vocabulary-free fixed-width featurizer, hash-checked end to end."""
    from pyvectorsearch_spark.operators.textops import feature_hash

    docs = spread(load_table(spark, sf_dir, "documents"))
    return feature_hash(docs, dim=FH_DIM).orderBy("doc_id")


def _fh_oracle() -> str:
    from pyvectorsearch_spark.functions.text import duckdb_tokens

    h = "('0x' || substr(md5(t), 1, 13))::BIGINT"
    return f"""
WITH e AS (
  SELECT doc_id, unnest({duckdb_tokens("text")}) AS t FROM documents
),
hb AS (
  SELECT doc_id, {h} % {FH_DIM} AS b,
         CASE WHEN ({h} // {FH_DIM}) % 2 = 0 THEN 1 ELSE -1 END AS sgn
  FROM e
),
cells AS (
  SELECT doc_id, b, sum(sgn)::BIGINT AS c FROM hb GROUP BY doc_id, b
),
nz AS (SELECT * FROM cells WHERE c != 0)
SELECT doc_id, count(*)::BIGINT AS nnz, sum(abs(c))::BIGINT AS l1_norm,
       md5(string_agg(b || ':' || c, ',' ORDER BY b)) AS vec_digest
FROM nz GROUP BY doc_id ORDER BY doc_id
"""


ORACLE_TEXT_FEATURE_HASHING = _fh_oracle()


def _planted_url() -> F.Column:
    """Four surface variants per (g, k) group — case, fragment, tracking
    params, default port + trailing slash — all canonicalizing to
    https://site{g}.example.org/p/{k}."""
    q = F.expr("doc_id div 4")
    m = F.col("doc_id") % 4
    g = (q % 20).cast("string")
    k = (q % 50).cast("string")
    lo = F.concat(F.lit("https://site"), g, F.lit(".example.org/p/"), k)
    up = F.concat(F.lit("HTTPS://SITE"), g, F.lit(".EXAMPLE.ORG/p/"), k)
    return (
        F.when(m == 0, lo)
        .when(m == 1, F.concat(up, F.lit("#frag")))
        .when(m == 2, F.concat(lo, F.lit("?utm_source=news&utm_id=7")))
        .otherwise(
            F.concat(
                F.lit("https://site"), g, F.lit(".example.org:443/p/"), k, F.lit("/")
            )
        )
    )


_PLANTED_URL_SQL = """CASE doc_id % 4
  WHEN 0 THEN 'https://site' || ((doc_id // 4) % 20) || '.example.org/p/'
              || ((doc_id // 4) % 50)
  WHEN 1 THEN 'HTTPS://SITE' || ((doc_id // 4) % 20) || '.EXAMPLE.ORG/p/'
              || ((doc_id // 4) % 50) || '#frag'
  WHEN 2 THEN 'https://site' || ((doc_id // 4) % 20) || '.example.org/p/'
              || ((doc_id // 4) % 50) || '?utm_source=news&utm_id=7'
  ELSE 'https://site' || ((doc_id // 4) % 20) || '.example.org:443/p/'
       || ((doc_id // 4) % 50) || '/'
END"""


def q_dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup (the pre-fetch dedup key of every web
    crawl): four surface variants per group — case, #fragment, utm_*
    params, :443 + trailing slash — collapse to one canonical URL; per
    canonical: doc count, distinct raw variants, keeper (min doc id)."""
    from pyvectorsearch_spark.operators.textops import url_canonical

    docs = spread(load_table(spark, sf_dir, "documents"))
    u = docs.select("doc_id", _planted_url().alias("url"))
    c = u.select(
        "doc_id", "url", url_canonical(F.col("url")).alias("canonical")
    )
    return (
        c.groupBy("canonical")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.countDistinct("url").cast("bigint").alias("n_raw_variants"),
            F.min("doc_id").alias("keep_doc"),
        )
        .orderBy("canonical")
    )


def _url_canonical_oracle() -> str:
    from pyvectorsearch_spark.operators.textops import duckdb_url_canonical_sql

    return f"""
WITH u AS (SELECT doc_id, {_PLANTED_URL_SQL} AS url FROM documents),
c AS (SELECT doc_id, url, {duckdb_url_canonical_sql("url")} AS canonical FROM u)
SELECT canonical, count(*)::BIGINT AS n_docs,
       count(DISTINCT url)::BIGINT AS n_raw_variants,
       min(doc_id) AS keep_doc
FROM c GROUP BY canonical ORDER BY canonical
"""


ORACLE_DEDUP_URL_CANONICAL = _url_canonical_oracle()


QUERIES = {
    "text_html_clean": q_text_html_clean,
    "text_url_stats": q_text_url_stats,
    "text_feature_hashing": q_text_feature_hashing,
    "dedup_url_canonical": q_dedup_url_canonical,
}
ORACLES = {
    "text_html_clean": ORACLE_TEXT_HTML_CLEAN,
    "text_url_stats": ORACLE_TEXT_URL_STATS,
    "text_feature_hashing": ORACLE_TEXT_FEATURE_HASHING,
    "dedup_url_canonical": ORACLE_DEDUP_URL_CANONICAL,
}
