"""Text retrieval / encoding / span-dedup / PII queries (outside the driver's
pinned 50-entry window; covered by tests/test_oracle_parity.py against the
same bit-exact DuckDB oracles).

Operators exercised (SURVEY.md §2.4 north-star extensions — the reference has
no text processing):
- BM25 ranking (`operators/textops.py::bm25_rank`)
- vocabulary build + token-id encoding (`vocab_encode`)
- cross-document duplicated-span detection (`dup_span_stats`, Lee et al. 2022
  substring-dedup analog)
- PII redaction (`pii_redact`)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyvectorsearch_spark.functions.text import duckdb_tokens, tokens
from pyvectorsearch_spark.operators.textops import (
    PII_EMAIL_RE,
    PII_IP_RE,
    PII_PHONE_RE,
    bm25_rank,
    dup_span_stats,
    pii_redact,
    vocab_encode,
)
from pyvectorsearch_spark.sources.tables import load_table, spread

_TOK = duckdb_tokens("text")

BM25_TERMS = ["spark", "hash", "merge", "window"]
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20
VOCAB_SIZE = 24
SPAN_N = 8
SPAN_MIN_DOCS = 2


def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by BM25 for a fixed query-term set."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return bm25_rank(
        docs, BM25_TERMS, k1=BM25_K1, b=BM25_B, topk=BM25_TOPK
    )


_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)


def oracle_bm25(topk: int) -> str:
    """The BM25 oracle with a parameterized list depth (hybrid RRF reuses it
    at depth 50)."""
    return _ORACLE_BM25_BODY + f"\nSELECT doc_id, bm25 FROM scored ORDER BY bm25 DESC, doc_id LIMIT {topk}\n"


_ORACLE_BM25_BODY = f"""
WITH d AS (
  SELECT doc_id, len({_TOK}) AS dl, {_TOK} AS t FROM documents
),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM d),
e AS (SELECT doc_id, dl, unnest(t) AS term FROM d),
tf AS (
  SELECT doc_id, term, dl, count(*)::DOUBLE AS tf
  FROM e WHERE term IN ({_TERMS_SQL}) GROUP BY doc_id, term, dl
),
dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         round(sum(round(
           ln(1.0 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * tf.tf * ({BM25_K1} + 1.0)
           / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * tf.dl / stats.avgdl))
         , 6)), 6) AS bm25
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
  GROUP BY tf.doc_id
)"""

ORACLE_BM25 = oracle_bm25(BM25_TOPK)


def q_text_vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ranked 24-word vocabulary + per-doc token-id encoding; the
    digest pins every encoded id in document order (OOV -> 0)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return vocab_encode(docs, vocab_size=VOCAB_SIZE).orderBy("doc_id")


ORACLE_VOCAB = f"""
WITH tokd AS (SELECT doc_id, {_TOK} AS t FROM documents),
e AS (
  SELECT doc_id, unnest(t) AS term, generate_subscripts(t, 1) AS pos FROM tokd
),
cnt AS (SELECT term, count(*) AS c FROM e GROUP BY term),
vocab AS (
  SELECT term, row_number() OVER (ORDER BY c DESC, term) AS tid FROM cnt
  QUALIFY tid <= {VOCAB_SIZE}
),
enc AS (
  SELECT e.doc_id, e.pos,
         coalesce(v.tid, 0) AS tid,
         CASE WHEN v.tid IS NULL THEN 1 ELSE 0 END AS oov
  FROM e LEFT JOIN vocab v USING (term)
)
SELECT doc_id,
       count(*)::BIGINT AS n_tokens,
       sum(oov)::BIGINT AS n_oov,
       md5(string_agg(tid::VARCHAR, ',' ORDER BY pos)) AS ids_digest
FROM enc GROUP BY doc_id ORDER BY doc_id
"""


def q_text_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplicated-span coverage: which sources carry the most
    cross-document repeated 8-gram content (exact-dup and near-dup docs light
    up every position)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    spans = dup_span_stats(docs, n=SPAN_N, min_docs=SPAN_MIN_DOCS)
    return (
        spans.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_grams").cast("bigint").alias("n_grams"),
            F.sum("n_dup_positions").cast("bigint").alias("n_dup_positions"),
            F.sum((F.col("dup_frac") >= 0.5).cast("int")).cast("bigint").alias(
                "n_docs_half_dup"
            ),
        )
        .orderBy("source")
    )


def _duck_gram(n: int) -> str:
    parts = " || ' ' || ".join(f"t[i+{j}]" if j else "t[i]" for j in range(n))
    return f"list_transform(range(1, len(t) - {n - 2}), i -> md5({parts}))"


ORACLE_DUP_SPANS = f"""
WITH tokd AS (SELECT doc_id, {_TOK} AS t FROM documents),
g AS (SELECT doc_id, {_duck_gram(SPAN_N)} AS gs FROM tokd),
pos AS (SELECT doc_id, unnest(gs) AS gh FROM g),
dup AS (
  SELECT gh FROM (SELECT DISTINCT doc_id, gh FROM pos)
  GROUP BY gh HAVING count(*) >= {SPAN_MIN_DOCS}
),
dupcnt AS (
  SELECT pos.doc_id, count(*)::BIGINT AS n_dup FROM pos JOIN dup USING (gh)
  GROUP BY pos.doc_id
),
per_doc AS (
  SELECT g.doc_id, len(gs)::BIGINT AS n_grams,
         coalesce(dupcnt.n_dup, 0)::BIGINT AS n_dup_positions,
         round(coalesce(dupcnt.n_dup, 0)
               / greatest(len(gs), 1)::DOUBLE, 6) AS dup_frac
  FROM g LEFT JOIN dupcnt USING (doc_id)
)
SELECT d.source, count(*)::BIGINT AS n_docs,
       sum(p.n_grams)::BIGINT AS n_grams,
       sum(p.n_dup_positions)::BIGINT AS n_dup_positions,
       sum(CASE WHEN p.dup_frac >= 0.5 THEN 1 ELSE 0 END)::BIGINT
         AS n_docs_half_dup
FROM per_doc p JOIN documents d USING (doc_id)
GROUP BY d.source ORDER BY d.source
"""


def _enriched_text() -> F.Column:
    """Deterministic synthetic PII appended to each doc (the corpus itself is
    PII-free word salad, so the redaction paths need planted targets; the
    oracle constructs the identical string)."""
    did = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.lit(" contact user"),
        did.cast("string"),
        F.lit("@example.com or +31"),
        F.lpad((did % 1000000000).cast("string"), 9, "0"),
        F.lit(" at 10.0."),
        F.expr("(doc_id div 256) % 256").cast("string"),
        F.lit("."),
        (did % 256).cast("string"),
    )


def q_text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over PII-enriched documents: per-doc match counts by
    type plus the md5 of the redacted text (pins exact replacement
    semantics, order included)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    enriched = docs.select("doc_id", _enriched_text().alias("text"))
    red = pii_redact(enriched)
    return red.select(
        "doc_id",
        "n_emails",
        "n_phones",
        "n_ips",
        F.md5("redacted").alias("red_digest"),
    ).orderBy("doc_id")


_ENRICH_SQL = (
    "text || ' contact user' || doc_id || '@example.com or +31' || "
    "lpad((doc_id % 1000000000)::VARCHAR, 9, '0') || ' at 10.0.' || "
    "((doc_id // 256) % 256) || '.' || (doc_id % 256)"
)

ORACLE_PII = f"""
WITH en AS (SELECT doc_id, {_ENRICH_SQL} AS txt FROM documents),
red AS (
  SELECT doc_id, txt,
         regexp_replace(txt, '{PII_EMAIL_RE}', '[EMAIL]', 'g') AS t_email,
         regexp_replace(regexp_replace(txt,
           '{PII_EMAIL_RE}', '[EMAIL]', 'g'),
           '{PII_PHONE_RE}', '[PHONE]', 'g') AS t_phone,
         regexp_replace(regexp_replace(regexp_replace(txt,
           '{PII_EMAIL_RE}', '[EMAIL]', 'g'),
           '{PII_PHONE_RE}', '[PHONE]', 'g'),
           '{PII_IP_RE}', '[IP]', 'g') AS redacted
  FROM en
)
SELECT doc_id,
       len(regexp_extract_all(txt, '{PII_EMAIL_RE}'))::INT AS n_emails,
       len(regexp_extract_all(t_email, '{PII_PHONE_RE}'))::INT AS n_phones,
       len(regexp_extract_all(t_phone, '{PII_IP_RE}'))::INT AS n_ips,
       md5(redacted) AS red_digest
FROM red ORDER BY doc_id
"""




PHRASE = "slow hash batch"  # a recurring corpus trigram (8 hits / 5 docs at sf0.01)


def q_text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search (order-sensitive full-text match, the quote-search
    primitive BM25 cannot express): per-document occurrence counts of a
    3-token phrase — a zero-shuffle scan projection; position matching is a
    native array expression inside the scan stage (overlap-counting
    position semantics)."""
    from pyvectorsearch_spark.operators.textops import phrase_match

    docs = spread(load_table(spark, sf_dir, "documents"))
    hits = phrase_match(docs, PHRASE)
    src = docs.select("doc_id", "source")
    return hits.join(src, "doc_id").select(
        "doc_id", "source", "n_matches"
    ).orderBy("doc_id")


_PTOK = duckdb_tokens("text")
_PW = PHRASE.split()

ORACLE_PHRASE = f"""
WITH toks AS (SELECT doc_id, source, {_PTOK} AS t FROM documents),
hits AS (
  SELECT doc_id, source,
         CASE WHEN len(t) >= {len(_PW)} THEN len(list_filter(
            range(1, len(t) - {len(_PW) - 2}),
            i -> {" AND ".join(f"t[i+{j}] = '{w}'" if j else f"t[i] = '{w}'" for j, w in enumerate(_PW))}
         )) ELSE 0 END AS n_matches
  FROM toks
)
SELECT doc_id, source, n_matches::BIGINT AS n_matches
FROM hits WHERE n_matches > 0 ORDER BY doc_id
"""


QUERIES = {
    "text_bm25": q_text_bm25,
    "text_vocab_encode": q_text_vocab_encode,
    "text_dup_spans": q_text_dup_spans,
    "text_pii_redact": q_text_pii_redact,
    "text_phrase_search": q_text_phrase_search,
}
ORACLES = {
    "text_bm25": ORACLE_BM25,
    "text_vocab_encode": ORACLE_VOCAB,
    "text_dup_spans": ORACLE_DUP_SPANS,
    "text_pii_redact": ORACLE_PII,
    "text_phrase_search": ORACLE_PHRASE,
}


# --- rank-biased overlap (RBO) ------------------------------------------------------

RBO_P = 0.9
RBO_DEPTH = 10


def q_text_rbo_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber 2010) between the top-10 term rankings
    of two deterministic corpus halves (even vs odd doc_id): RBO@10 with
    p=0.9 — the top-weighted list-similarity metric behind "did the
    ranking change?" monitoring (Kendall/Spearman need identical item
    sets; RBO handles disjoint tails, which is what real top-k lists
    have). One number per depth prefix plus the final score.

    Determinism: rankings order by (count DESC, term ASC); prefix-overlap
    sizes are integers; each depth's weight p^(d−1) is a fixed literal, so
    the weighted sum is exact arithmetic on integers times constants,
    rounded once.

    Scale: two frequency rollups and a depth×top-k fan-out over two
    10-row lists — nothing corpus-sized past the first rollup."""
    docs = load_table(spark, sf_dir, "documents")
    st = docs.select(
        (F.col("doc_id") % 2 == 0).alias("_even"),
        F.explode(tokens(F.col("text"))).alias("t"),
    )
    freq = st.groupBy("_even", "t").agg(
        F.count("*").cast("bigint").alias("_n")
    )
    w = Window.partitionBy("_even").orderBy(F.desc("_n"), F.asc("t"))
    top = freq.withColumn("_rk", F.row_number().over(w)).filter(
        F.col("_rk") <= RBO_DEPTH
    )
    a = top.filter(F.col("_even")).select(
        F.col("t").alias("_ta"), F.col("_rk").alias("_ra")
    )
    b = top.filter(~F.col("_even")).select(
        F.col("t").alias("_tb"), F.col("_rk").alias("_rb")
    )
    depths = spark.range(1, RBO_DEPTH + 1).select(
        F.col("id").cast("int").alias("depth")
    )
    inter = (
        depths.join(
            a.join(b, a._ta == b._tb),
            (F.col("_ra") <= F.col("depth")) & (F.col("_rb") <= F.col("depth")),
            "left",
        )
        .groupBy("depth")
        .agg(F.count("_ta").cast("bigint").alias("n_overlap"))
    )
    weighted = inter.select(
        "depth",
        "n_overlap",
        F.round(
            F.lit(1.0 - RBO_P)
            * F.pow(F.lit(RBO_P), F.col("depth") - 1)
            * F.col("n_overlap")
            / F.col("depth"),
            8,
        ).alias("_wterm"),
    )
    tot = weighted.agg(
        F.round(F.sum("_wterm"), 6).alias("_rbo")
    )
    return (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            "depth",
            "n_overlap",
            F.round(F.col("n_overlap") / F.col("depth").cast("double"), 6).alias(
                "prefix_agreement_r"
            ),
            F.col("_rbo").alias("rbo_at_10_r"),
        )
        .orderBy("depth")
    )


_RBO_TOK = duckdb_tokens("text")

ORACLE_TEXT_RBO = f"""
WITH st AS (
  SELECT (doc_id % 2 = 0) AS even, unnest({_RBO_TOK}) AS t FROM documents
),
freq AS (SELECT even, t, count(*)::BIGINT AS n FROM st GROUP BY even, t),
top AS (
  SELECT even, t,
         row_number() OVER (PARTITION BY even ORDER BY n DESC, t ASC) AS rk
  FROM freq QUALIFY rk <= {RBO_DEPTH}
),
depths AS (SELECT unnest(range(1, {RBO_DEPTH + 1}))::INT AS depth),
inter AS (
  SELECT d.depth, count(j.ta)::BIGINT AS n_overlap
  FROM depths d LEFT JOIN (
    SELECT a.t AS ta, a.rk AS ra, b.rk AS rb
    FROM top a JOIN top b ON a.t = b.t AND a.even AND NOT b.even
  ) j ON j.ra <= d.depth AND j.rb <= d.depth
  GROUP BY d.depth
),
weighted AS (
  SELECT depth, n_overlap,
         round({1.0 - RBO_P!r} * power({RBO_P!r}, depth - 1)
               * n_overlap / depth, 8) AS wterm
  FROM inter
),
tot AS (SELECT round(sum(wterm), 6) AS rbo FROM weighted)
SELECT w.depth, w.n_overlap,
       round(w.n_overlap / CAST(w.depth AS DOUBLE), 6) AS prefix_agreement_r,
       t.rbo AS rbo_at_10_r
FROM weighted w CROSS JOIN tot t ORDER BY w.depth
"""

QUERIES.update({"text_rbo_topterms": q_text_rbo_topterms})
ORACLES.update({"text_rbo_topterms": ORACLE_TEXT_RBO})
