"""Text queries registered OUTSIDE the driver's pinned 50-entry window
(queries/__init__.py); covered by tests/test_oracle_parity.py against the
same bit-exact DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.functions.text import duckdb_tokens
from pyvectorsearch_spark.operators.textops import chunk_text, tfidf_top_terms
from pyvectorsearch_spark.sources.tables import load_table, spread

CHUNK_SIZE = 200
CHUNK_STRIDE = 150

_TOK = duckdb_tokens("text")


def q_text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping character-window chunking (200-char windows every 150):
    per-doc chunk count, covered chars, and the md5 of the concatenated
    chunk stream — pins every chunk's exact content, not just the counts."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    chunks = chunk_text(docs, size=CHUNK_SIZE, stride=CHUNK_STRIDE)
    return (
        chunks.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("n_chunk_chars").cast("bigint").alias("total_chunk_chars"),
            F.max("chunk_start").cast("bigint").alias("last_start"),
            F.md5(
                F.concat_ws("\x1f", F.array_sort(F.collect_list(
                    F.struct("chunk_idx", "chunk_text")
                )).getField("chunk_text"))
            ).alias("chunks_digest"),
        )
        .orderBy("doc_id")
    )


ORACLE_TEXT_CHUNKS = f"""
WITH n AS (
  SELECT doc_id, array_to_string({_TOK}, ' ') AS nt FROM documents
),
c AS (
  SELECT doc_id,
         unnest(range(1, greatest(length(nt), 1) + 1, {CHUNK_STRIDE})) AS start,
         nt
  FROM n
),
ch AS (
  SELECT doc_id, start, substr(nt, CAST(start AS INT), {CHUNK_SIZE}) AS chunk
  FROM c
)
SELECT doc_id, count(*) AS n_chunks,
       sum(length(chunk))::BIGINT AS total_chunk_chars,
       max(start)::BIGINT AS last_start,
       md5(string_agg(chunk, chr(31) ORDER BY start)) AS chunks_digest
FROM ch GROUP BY doc_id ORDER BY doc_id
"""


TFIDF_K = 3


def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: top-3 terms per document under the
    smoothed sklearn-style idf, restricted to every 10th document so the
    output stays bounded while the idf statistics still come from the FULL
    corpus (df/N are corpus-level — that is the point of the operator)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    scored = tfidf_top_terms(docs, k=TFIDF_K)
    return scored.filter(F.col("doc_id") % 10 == 0).orderBy("doc_id", "rank")


ORACLE_TEXT_TFIDF = f"""
WITH e AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM e GROUP BY doc_id, term
),
n AS (SELECT count(DISTINCT doc_id)::BIGINT AS nd FROM documents),
s AS (
  SELECT doc_id, term, tf,
         count(*) OVER (PARTITION BY term)::BIGINT AS df
  FROM tf
),
scored AS (
  SELECT doc_id, term, tf, df,
         round(tf * (ln((nd + 1) / CAST(df + 1 AS DOUBLE)) + 1.0), 6)
           AS tfidf_r
  FROM s, n
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf_r DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, term, tf, df, tfidf_r, rank
FROM r WHERE rank <= {TFIDF_K} AND doc_id % 10 = 0
ORDER BY doc_id, rank
"""


LEN_BIN_W = 10  # 10-token-wide bins


def q_text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length histogram over whitespace token counts (10-token
    bins) with cumulative document share — the planning input for sequence
    packing (`sample_pack_*`): which context length covers what fraction
    of the corpus. One map-side-combined shuffle of (bin, count) rows; the
    cumulative window runs over the bins table only."""
    from pyspark.sql import Window

    from pyvectorsearch_spark.functions.text import tokens

    docs = spread(load_table(spark, sf_dir, "documents"))
    binned = docs.select(
        (F.floor(F.size(tokens("text")) / F.lit(float(LEN_BIN_W))))
        .cast("bigint")
        .alias("bin")
    )
    hist = binned.groupBy("bin").agg(F.count("*").cast("bigint").alias("n_docs"))
    # bins-sized table: the unpartitioned cumulative window is bounded
    wb = Window.orderBy("bin")
    tot = hist.agg(F.sum("n_docs").cast("bigint").alias("_t"))
    return (
        hist.withColumn("cum_docs", F.sum("n_docs").over(wb).cast("bigint"))
        .crossJoin(F.broadcast(tot))
        .select(
            "bin",
            (F.col("bin") * LEN_BIN_W).alias("min_tokens"),
            "n_docs",
            "cum_docs",
            F.round(F.col("cum_docs") / F.col("_t"), 6).alias("cum_share_r"),
        )
        .orderBy("bin")
    )


ORACLE_TEXT_LENGTH_HISTOGRAM = f"""
WITH b AS (
  SELECT CAST(floor(len({_TOK}) / {float(LEN_BIN_W)!r}) AS BIGINT) AS bin
  FROM documents
),
h AS (SELECT bin, count(*)::BIGINT AS n_docs FROM b GROUP BY bin),
t AS (SELECT sum(n_docs)::BIGINT AS tt FROM h)
SELECT bin, bin * {LEN_BIN_W} AS min_tokens, n_docs,
       sum(n_docs) OVER (ORDER BY bin)::BIGINT AS cum_docs,
       round(sum(n_docs) OVER (ORDER BY bin) / CAST(tt AS DOUBLE), 6)
         AS cum_share_r
FROM h, t ORDER BY bin
"""



def q_vocab_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary drift between two deterministic cohorts (even vs odd
    doc_id — standing in for yesterday-vs-today): how many of the new
    batch's distinct terms were never seen in the established corpus. The
    text analog of `embedding_drift`. Novel-set identity is pinned by an
    order-independent XOR of 52-bit term hashes (the `audit_checksums`
    trick), so the check scales without sorting or collecting the
    vocabulary."""
    from pyvectorsearch_spark.functions.text import tokens
    from pyvectorsearch_spark.operators.sketches import HEX_DIGITS

    docs = spread(load_table(spark, sf_dir, "documents"))
    terms = docs.select(
        (F.col("doc_id") % 2).alias("_c"), F.explode(tokens("text")).alias("term")
    ).distinct()
    va = terms.filter(F.col("_c") == 0).select("term")
    vb = terms.filter(F.col("_c") == 1).select("term")
    novel = vb.join(va, "term", "left_anti")
    h = F.conv(F.substring(F.md5("term"), 1, HEX_DIGITS), 16, 10).cast("bigint")
    na = va.agg(F.count("*").cast("bigint").alias("n_terms_a"))
    nb = vb.agg(F.count("*").cast("bigint").alias("n_terms_b"))
    nv = novel.select(h.alias("_h")).agg(
        F.count("*").cast("bigint").alias("n_novel"),
        F.coalesce(F.expr("bit_xor(_h)"), F.lit(0)).cast("bigint").alias(
            "novel_checksum"
        ),
    )
    return (
        na.crossJoin(nb)
        .crossJoin(nv)
        .select(
            "n_terms_a",
            "n_terms_b",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_terms_b").cast("double"), 6).alias(
                "novelty_rate_r"
            ),
            "novel_checksum",
        )
    )


ORACLE_VOCAB_NOVELTY = f"""
WITH t AS (
  SELECT DISTINCT doc_id % 2 AS c, unnest({_TOK}) AS term FROM documents
),
va AS (SELECT term FROM t WHERE c = 0),
vb AS (SELECT term FROM t WHERE c = 1),
novel AS (SELECT term FROM vb WHERE term NOT IN (SELECT term FROM va)),
na AS (SELECT count(*)::BIGINT AS n_terms_a FROM va),
nb AS (SELECT count(*)::BIGINT AS n_terms_b FROM vb),
nv AS (
  SELECT count(*)::BIGINT AS n_novel,
         coalesce(bit_xor(('0x' || substr(md5(term), 1, 13))::BIGINT),
                  0)::BIGINT AS novel_checksum
  FROM novel
)
SELECT n_terms_a, n_terms_b, n_novel,
       round(n_novel / CAST(n_terms_b AS DOUBLE), 6) AS novelty_rate_r,
       novel_checksum
FROM na, nb, nv
"""


QUERIES = {
    "text_chunks": q_text_chunks,
    "text_tfidf": q_text_tfidf,
    "text_length_histogram": q_text_length_histogram,
    "vocab_novelty": q_vocab_novelty,
}
ORACLES = {
    "text_chunks": ORACLE_TEXT_CHUNKS,
    "text_tfidf": ORACLE_TEXT_TFIDF,
    "text_length_histogram": ORACLE_TEXT_LENGTH_HISTOGRAM,
    "vocab_novelty": ORACLE_VOCAB_NOVELTY,
}
