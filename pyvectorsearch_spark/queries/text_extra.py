"""Text queries registered OUTSIDE the driver's pinned 50-entry window
(queries/__init__.py); covered by tests/test_oracle_parity.py against the
same bit-exact DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.functions.text import duckdb_tokens, tokens
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


# --- stemming + class-based TF-IDF ----------------------------------------


def q_text_stem_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary reduction from the fixed-rule stemmer (Porter step-1
    style): per source, token count, distinct raw terms, distinct stems,
    and the reduction ratio — the normalization step between tokenization
    and indexing; stemming is a zero-shuffle projection on the exploded
    token stream, the rollup is one map-side-combined aggregate."""
    from pyvectorsearch_spark.operators.textops import stem_token
    from pyvectorsearch_spark.functions.text import tokens

    docs = spread(load_table(spark, sf_dir, "documents"))
    e = docs.select("source", F.explode(tokens("text")).alias("w"))
    s = e.select("source", "w", stem_token(F.col("w")).alias("st"))
    return (
        s.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.countDistinct("w").cast("bigint").alias("n_raw_terms"),
            F.countDistinct("st").cast("bigint").alias("n_stems"),
        )
        .select(
            "source",
            "n_tokens",
            "n_raw_terms",
            "n_stems",
            F.round(1.0 - F.col("n_stems") / F.col("n_raw_terms"), 6).alias(
                "reduction_r"
            ),
        )
        .orderBy("source")
    )


def _stem_oracle() -> str:
    from pyvectorsearch_spark.operators.textops import duckdb_stem_sql

    return f"""
WITH e AS (
  SELECT source, unnest({duckdb_tokens("text")}) AS w FROM documents
),
s AS (SELECT source, w, {duckdb_stem_sql("w")} AS st FROM e)
SELECT source, count(*)::BIGINT AS n_tokens,
       count(DISTINCT w)::BIGINT AS n_raw_terms,
       count(DISTINCT st)::BIGINT AS n_stems,
       round(1.0 - count(DISTINCT st) / CAST(count(DISTINCT w) AS DOUBLE), 6)
         AS reduction_r
FROM s GROUP BY source ORDER BY source
"""


ORACLE_TEXT_STEM_VOCAB = _stem_oracle()


CTFIDF_K = 5


def q_text_ctfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-based TF-IDF (the BERTopic topic-labeling score): per source
    class c and term t, ctfidf = (tf_tc / w_c) * ln(1 + A / f_t) with w_c
    the class token count, A the mean class size, f_t the corpus term
    frequency — the per-CLASS keyword extractor (vs `text_tfidf`'s
    per-document one). Top-5 terms per source, rounded ladder throughout.
    Scale shape: the corpus reduces once to (class, term, tf) map-side;
    everything after is vocabulary-sized."""
    from pyvectorsearch_spark.functions.text import tokens

    docs = spread(load_table(spark, sf_dir, "documents"))
    e = docs.select("source", F.explode(tokens("text")).alias("w"))
    tfc = e.groupBy("source", "w").agg(F.count("*").cast("bigint").alias("tf"))
    wc = tfc.groupBy("source").agg(F.sum("tf").cast("bigint").alias("wc"))
    ft = tfc.groupBy("w").agg(F.sum("tf").cast("bigint").alias("ft"))
    a = wc.agg(
        (F.sum("wc") / F.count("*")).alias("a")
    )
    from pyspark.sql import Window

    scored = (
        tfc.join(wc, "source")
        .join(ft, "w")
        .crossJoin(F.broadcast(a))
        .select(
            "source",
            "w",
            "tf",
            F.round(
                (F.col("tf") / F.col("wc"))
                * F.log(1.0 + F.col("a") / F.col("ft")),
                9,
            ).alias("ctfidf_r"),
        )
    )
    win = Window.partitionBy("source").orderBy(F.desc("ctfidf_r"), F.asc("w"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= CTFIDF_K)
        .select("source", F.col("rank").cast("int").alias("rank"), "w", "ctfidf_r")
        .orderBy("source", "rank")
    )


ORACLE_TEXT_CTFIDF = f"""
WITH e AS (
  SELECT source, unnest({duckdb_tokens("text")}) AS w FROM documents
),
tfc AS (SELECT source, w, count(*)::BIGINT AS tf FROM e GROUP BY source, w),
wc AS (SELECT source, sum(tf)::BIGINT AS wc FROM tfc GROUP BY source),
ft AS (SELECT w, sum(tf)::BIGINT AS ft FROM tfc GROUP BY w),
a AS (SELECT sum(wc) / CAST(count(*) AS DOUBLE) AS a FROM wc),
sc AS (
  SELECT tfc.source, tfc.w, tfc.tf,
         round((tfc.tf / CAST(wc.wc AS DOUBLE))
               * ln(1.0 + a.a / ft.ft), 9) AS ctfidf_r
  FROM tfc JOIN wc ON tfc.source = wc.source
  JOIN ft ON tfc.w = ft.w CROSS JOIN a
),
r AS (
  SELECT source, w, ctfidf_r,
         row_number() OVER (PARTITION BY source
                            ORDER BY ctfidf_r DESC, w ASC) AS rank
  FROM sc
)
SELECT source, CAST(rank AS INT) AS rank, w, ctfidf_r
FROM r WHERE rank <= {CTFIDF_K} ORDER BY source, rank
"""

QUERIES.update({
    "text_stem_vocab": q_text_stem_vocab,
    "text_ctfidf": q_text_ctfidf,
})
ORACLES.update({
    "text_stem_vocab": ORACLE_TEXT_STEM_VOCAB,
    "text_ctfidf": ORACLE_TEXT_CTFIDF,
})


# --- KWIC concordance ------------------------------------------------------

KWIC_CTX = 3  # context words either side


def q_text_kwic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context concordance for the corpus trigger phrase: every
    match with 3 words of context either side, all snippets per document
    joined in position order — the human-review surface behind phrase
    search (matches alone don't show HOW a phrase is used). Zero-shuffle
    scan projection like `phrase_match`; snippets are pure array slices."""
    from pyvectorsearch_spark.functions.text import tokens
    from pyvectorsearch_spark.queries.text_rank import PHRASE

    words = PHRASE.split()
    L = len(words)
    docs = spread(load_table(spark, sf_dir, "documents"))
    t = tokens("text")

    def is_match(i):
        conds = None
        for j, w in enumerate(words):
            c = F.element_at(F.col("_t"), (i + j).cast("int")) == w
            conds = c if conds is None else (conds & c)
        return conds

    d = docs.select("doc_id", t.alias("_t"))
    pos = F.filter(
        F.sequence(F.lit(1), F.greatest(F.size("_t") - (L - 1), F.lit(1))),
        is_match,
    )
    snip = lambda i: F.concat_ws(  # noqa: E731
        " ",
        F.slice(
            F.col("_t"),
            F.greatest(i - KWIC_CTX, F.lit(1)),
            F.least(i + L - 1 + KWIC_CTX, F.size("_t"))
            - F.greatest(i - KWIC_CTX, F.lit(1))
            + 1,
        ),
    )
    out = d.select(
        "doc_id",
        F.transform(pos, snip).alias("_snips"),
    ).filter(F.size("_snips") > 0)
    return out.select(
        "doc_id",
        F.size("_snips").alias("n_matches"),
        F.array_join("_snips", " | ").alias("kwic"),
    ).orderBy("doc_id")


def _kwic_oracle() -> str:
    from pyvectorsearch_spark.queries.text_rank import PHRASE

    words = PHRASE.split()
    L = len(words)
    conds = " AND ".join(f"t[i + {j}] = '{w}'" for j, w in enumerate(words))
    return f"""
WITH d AS (SELECT doc_id, {duckdb_tokens("text")} AS t FROM documents),
p AS (
  SELECT doc_id, t,
         list_filter(range(1, greatest(len(t) - {L - 1}, 1) + 1),
                     i -> {conds}) AS pos
  FROM d
),
s AS (
  SELECT doc_id, len(pos)::INT AS n_matches,
         array_to_string(
           list_transform(pos, i -> array_to_string(
             t[greatest(i - {KWIC_CTX}, 1):least(i + {L - 1 + KWIC_CTX}, len(t))],
             ' ')),
           ' | ') AS kwic
  FROM p WHERE len(pos) > 0
)
SELECT doc_id, n_matches, kwic FROM s ORDER BY doc_id
"""


ORACLE_TEXT_KWIC = _kwic_oracle()

QUERIES.update({"text_kwic": q_text_kwic})
ORACLES.update({"text_kwic": ORACLE_TEXT_KWIC})


# --- character-entropy quality signal ----------------------------------------

from pyvectorsearch_spark.operators.textops import (  # single source
    ENTROPY_ALPHABET,
    char_entropy_col,
)


def q_text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document, rolled up per source —
    the cheap gibberish/boilerplate screen: natural prose sits near ~4.1
    bits over [a-z ]; keyboard mash, base64 blobs, and repeated padding
    fall far outside the band. Complements `text_quality`'s ratio
    heuristics with an information-theoretic one.

    Zero-shuffle design: each symbol's count is a pure scan-stage
    expression (length minus length-after-replace over a FIXED 27-symbol
    alphabet — no per-character explode, which at 100 TB would be a
    row-per-byte blow-up), per-doc H = log2(n) − Σ c·log2(c)/n with the
    per-term 6-dp round, then H is fixed to integer micro-bits so the
    per-source mean is an exact bigint sum. The only shuffle is the final
    sources-sized rollup.

    Determinism: counts are integers; log2 terms round to 6 dp before any
    sum; per-doc entropy rounds to micro-bits (bigint) before the group
    mean — engine-exact end-to-end."""
    h = char_entropy_col(F.col("text"))
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.round(h * 1000000).cast("bigint").alias("_hu")
    )
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(F.sum("_hu") / (F.count("*") * F.lit(1000000.0)), 4).alias(
                "avg_entropy_r"
            ),
            F.round(F.min("_hu") / 1000000.0, 4).alias("min_entropy_r"),
            F.round(F.max("_hu") / 1000000.0, 4).alias("max_entropy_r"),
        )
        .orderBy("source")
    )


def _entropy_oracle() -> str:
    cnts = [
        f"(length(lt) - length(replace(lt, '{s}', '')))::BIGINT"
        for s in ENTROPY_ALPHABET
    ]
    cols = ",\n         ".join(
        f"{c} AS c{i}" for i, c in enumerate(cnts)
    )
    nsum = " + ".join(f"c{i}" for i in range(len(cnts)))
    tsum = " + ".join(
        f"(CASE WHEN c{i} > 0 THEN round(c{i} * log2(c{i}), 6) ELSE 0.0 END)"
        for i in range(len(cnts))
    )
    return f"""
WITH lt AS (SELECT source, lower(text) AS lt FROM documents),
c AS (
  SELECT source,
         {cols}
  FROM lt
),
h AS (
  SELECT source,
         CAST(round((CASE WHEN ({nsum}) > 0
              THEN round(log2(({nsum})::DOUBLE) - ({tsum}) / ({nsum})::DOUBLE, 6)
              ELSE 0.0 END) * 1000000) AS BIGINT) AS hu
  FROM c
)
SELECT source, count(*)::BIGINT AS n_docs,
       round(sum(hu) / (count(*) * 1000000.0), 4) AS avg_entropy_r,
       round(min(hu) / 1000000.0, 4) AS min_entropy_r,
       round(max(hu) / 1000000.0, 4) AS max_entropy_r
FROM h GROUP BY source ORDER BY source
"""


ORACLE_TEXT_CHAR_ENTROPY = _entropy_oracle()

QUERIES.update({"text_char_entropy": q_text_char_entropy})
ORACLES.update({"text_char_entropy": ORACLE_TEXT_CHAR_ENTROPY})


# --- Flesch reading-ease score -----------------------------------------------


def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per source: 206.835 − 1.015·(words/sentences) −
    84.6·(syllables/words), with syllables approximated by vowel-group
    runs ([aeiouy]+ — the standard cheap estimator) and sentences by
    terminal-punctuation runs. Prose-quality screen #3 beside
    `text_quality`'s ratios and `text_char_entropy`'s information rate:
    this one catches wall-of-text run-ons (no sentence breaks) and
    syllable-dense jargon.

    Determinism: the three counts are integers from scan-stage regexes
    (plain character classes — identical RE2/Java semantics); the score is
    ONE final double expression rounded to 6 dp, fixed to micro-units so
    the per-source mean is an exact bigint sum.

    Scale: zero-shuffle per-doc scoring in the scan stage; one
    sources-sized rollup — the `text_quality` plan shape."""
    from pyvectorsearch_spark.operators.textops import flesch_col

    lower = F.lower(F.col("text"))
    words = F.size(tokens(F.col("text"))).cast("bigint")
    sents = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), 0)),
        F.lit(1),
    ).cast("bigint")
    sylls = F.greatest(
        F.size(F.regexp_extract_all(lower, F.lit("[aeiouy]+"), 0)), F.lit(1)
    ).cast("bigint")
    score = flesch_col(F.col("text"), tokens(F.col("text")))
    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        F.round(score * 1000000).cast("bigint").alias("_fu"),
        words.alias("_w"),
        sents.alias("_s"),
        sylls.alias("_y"),
    )
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(F.sum("_fu") / (F.count("*") * F.lit(1000000.0)), 4).alias(
                "avg_flesch_r"
            ),
            F.round(
                F.sum("_w") / F.sum("_s").cast("double"), 4
            ).alias("words_per_sentence_r"),
            F.round(
                F.sum("_y") / F.sum("_w").cast("double"), 4
            ).alias("syllables_per_word_r"),
        )
        .orderBy("source")
    )


_READ_TOK = duckdb_tokens("text")

ORACLE_TEXT_READABILITY = f"""
WITH c AS (
  SELECT source,
         len({_READ_TOK})::BIGINT AS w,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::BIGINT AS s,
         greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)::BIGINT
           AS y
  FROM documents
),
h AS (
  SELECT source, w, s, y,
         CAST(round((CASE WHEN w > 0
              THEN round(206.835 - 1.015 * (w / s::DOUBLE)
                         - 84.6 * (y / w::DOUBLE), 6)
              ELSE 0.0 END) * 1000000) AS BIGINT) AS fu
  FROM c
)
SELECT source, count(*)::BIGINT AS n_docs,
       round(sum(fu) / (count(*) * 1000000.0), 4) AS avg_flesch_r,
       round(sum(w) / CAST(sum(s) AS DOUBLE), 4) AS words_per_sentence_r,
       round(sum(y) / CAST(sum(w) AS DOUBLE), 4) AS syllables_per_word_r
FROM h GROUP BY source ORDER BY source
"""

QUERIES.update({"text_readability": q_text_readability})
ORACLES.update({"text_readability": ORACLE_TEXT_READABILITY})


# --- source vocabulary-overlap matrix ------------------------------------------


def q_text_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary Jaccard between every pair of sources: |V_a ∩ V_b| /
    |V_a ∪ V_b| over distinct token sets — the corpus-mixture diagnostic
    that says which crawls are stylistic near-clones (merge their quotas)
    and which bring genuinely new language (`dedup_source_matrix` compares
    DOCUMENT overlap; this compares the LANGUAGE itself, which catches
    same-register-different-pages sources document dedup misses).

    Determinism: pure integer set sizes — intersection from a term
    equi-join, union by inclusion–exclusion; one rounded division.

    Scale: the corpus reduces once to distinct (source, term); the pair
    intersection is a term-keyed equi-join of that reduced table (shuffle
    bounded by vocabulary, not corpus); sources² stays tiny."""
    docs = load_table(spark, sf_dir, "documents")
    st = docs.select(
        "source", F.explode(F.array_distinct(tokens(F.col("text")))).alias("t")
    ).distinct()
    v = st.groupBy("source").agg(F.count("*").cast("bigint").alias("_v"))
    a = st.select(F.col("source").alias("source_a"), "t")
    b = st.select(F.col("source").alias("source_b"), "t")
    inter = (
        a.join(b, "t")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
    )
    va = v.select(F.col("source").alias("source_a"), F.col("_v").alias("_va"))
    vb = v.select(F.col("source").alias("source_b"), F.col("_v").alias("_vb"))
    return (
        inter.join(va, "source_a")
        .join(vb, "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            F.round(
                F.col("n_shared")
                / (F.col("_va") + F.col("_vb") - F.col("n_shared")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard_r"),
        )
        .orderBy("source_a", "source_b")
    )


_VOC_TOK = duckdb_tokens("text")

ORACLE_TEXT_VOCAB_OVERLAP = f"""
WITH st AS (
  SELECT DISTINCT source, unnest(list_distinct({_VOC_TOK})) AS t
  FROM documents
),
v AS (SELECT source, count(*)::BIGINT AS v FROM st GROUP BY source),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*)::BIGINT AS n_shared
  FROM st a JOIN st b ON a.t = b.t AND a.source < b.source
  GROUP BY 1, 2
)
SELECT i.source_a, i.source_b, i.n_shared,
       round(i.n_shared / CAST(va.v + vb.v - i.n_shared AS DOUBLE), 6)
         AS jaccard_r
FROM inter i
JOIN v va ON i.source_a = va.source
JOIN v vb ON i.source_b = vb.source
ORDER BY i.source_a, i.source_b
"""

QUERIES.update({"text_vocab_overlap": q_text_vocab_overlap})
ORACLES.update({"text_vocab_overlap": ORACLE_TEXT_VOCAB_OVERLAP})


# --- deflate compression-ratio quality signal ------------------------------------

ZLIB_LEVEL = 6


def q_text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deflate compression ratio per document (zlib level 6), rolled up per
    source — the classic cheap redundancy detector (CCNet/Gopher-style
    filters): boilerplate and repeated templates compress far below
    natural prose; random gibberish barely compresses at all. The
    dictionary-based signal `text_repetition`'s n-gram rules and
    `text_char_entropy`'s order-0 rate both miss long-range repeats on.

    NO SQL ORACLE (DuckDB has no deflate) — the driver records a
    rows-only check; the golden test recomputes every ratio with the same
    zlib from the raw parquet, and the per-source means are integer
    micro-fixed so the rollup is order-free.

    Scale: an Arrow-batched mapInPandas over the scan (zlib releases the
    GIL; bytes never shuffle — only (source, ratio-micro) cells do)."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("source", "text")

    def score(batches):
        import zlib

        for pdf in batches:
            raw = pdf["text"].str.encode("utf-8")
            n = raw.str.len().astype("int64")
            comp = raw.map(lambda b: len(zlib.compress(b, ZLIB_LEVEL)))
            ratio = (comp / n.clip(lower=1) * 1000000).round().astype("int64")
            yield pd.DataFrame({"source": pdf["source"], "_ru": ratio})

    cells = docs.mapInPandas(score, schema="source string, _ru long")
    return (
        cells.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(F.sum("_ru") / (F.count("*") * F.lit(1000000.0)), 4).alias(
                "avg_ratio_r"
            ),
            F.round(F.min("_ru") / 1000000.0, 4).alias("min_ratio_r"),
            F.round(F.max("_ru") / 1000000.0, 4).alias("max_ratio_r"),
        )
        .orderBy("source")
    )


QUERIES.update({"text_compression_ratio": q_text_compression_ratio})
# no ORACLES entry: deflate is not SQL-expressible; rows-only driver check +
# the zlib golden test in tests/test_round4_wave3.py


# --- LIX readability ------------------------------------------------------------------

from pyvectorsearch_spark.operators.textops import (  # single source
    LIX_LONG_CHARS,
    lix_col,
)


def q_text_lix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIX readability per source (Björnsson 1968): words/sentences +
    100·(long words)/words with long = more than 6 characters — the
    language-agnostic index used across Nordic/European corpora where
    Flesch's syllable counting misfires (`text_readability` is the
    English-tuned twin; disagreement between the two flags odd prose).

    Determinism: three integer counts per doc in the scan stage, one
    rounded expression, micro-fixed per-source means.

    Scale: the `text_quality` zero-extra-shuffle shape."""
    words_arr = tokens(F.col("text"))
    words = F.size(words_arr).cast("bigint")
    longw = F.size(
        F.filter(words_arr, lambda t: F.length(t) > LIX_LONG_CHARS)
    ).cast("bigint")
    lix = lix_col(F.col("text"), words_arr)
    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        F.round(lix * 1000000).cast("bigint").alias("_lu"),
        longw.alias("_lw"),
        words.alias("_w"),
    )
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(F.sum("_lu") / (F.count("*") * F.lit(1000000.0)), 4).alias(
                "avg_lix_r"
            ),
            F.round(F.sum("_lw") / F.sum("_w").cast("double"), 6).alias(
                "long_word_ratio_r"
            ),
        )
        .orderBy("source")
    )


_LIX_TOK = duckdb_tokens("text")

ORACLE_TEXT_LIX = f"""
WITH c AS (
  SELECT source,
         len({_LIX_TOK})::BIGINT AS w,
         len(list_filter({_LIX_TOK}, t -> length(t) > {LIX_LONG_CHARS}))::BIGINT
           AS lw,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::BIGINT AS s
  FROM documents
),
h AS (
  SELECT source, w, lw,
         CAST(round((CASE WHEN w > 0
              THEN round(w / s::DOUBLE + 100.0 * lw / w::DOUBLE, 6)
              ELSE 0.0 END) * 1000000) AS BIGINT) AS lu
  FROM c
)
SELECT source, count(*)::BIGINT AS n_docs,
       round(sum(lu) / (count(*) * 1000000.0), 4) AS avg_lix_r,
       round(sum(lw) / CAST(sum(w) AS DOUBLE), 6) AS long_word_ratio_r
FROM h GROUP BY source ORDER BY source
"""

QUERIES.update({"text_lix": q_text_lix})
ORACLES.update({"text_lix": ORACLE_TEXT_LIX})


# --- quality-signal redundancy matrix ---------------------------------------------------


def q_text_signal_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signal-redundancy audit over the quality screens: the Pearson
    correlation between every PAIR of per-doc signals — composite quality
    score, char entropy, Flesch, and LIX. Two screens that correlate at
    0.95 are one screen paid for twice; a negative pair flags signals
    pulling filtering decisions in opposite directions. The meta-analysis
    that decides which screens earn a slot in `pipeline_curate`.

    Determinism: each signal is its existing engine-exact micro-fixed
    ladder; the correlations use the DECIMAL(38,0) moment construction on
    the micro integers.

    Scale: all four signals are scan-stage expressions computed in ONE
    pass over the corpus; the moment rollup is 6 pairs × one row."""
    from pyvectorsearch_spark.operators.textops import (
        flesch_col,
        quality_score_col,
    )

    entropy = char_entropy_col(F.col("text"))
    words_arr = tokens(F.col("text"))
    flesch = flesch_col(F.col("text"), words_arr)
    lix = lix_col(F.col("text"), words_arr)
    quality = quality_score_col(F.col("text"), words_arr)

    sig = load_table(spark, sf_dir, "documents").select(
        F.round(quality * 1000000).cast("bigint").alias("quality"),
        F.round(entropy * 1000000).cast("bigint").alias("entropy"),
        F.round(flesch * 1000000).cast("bigint").alias("flesch"),
        F.round(lix * 1000000).cast("bigint").alias("lix"),
    )
    names = ["quality", "entropy", "flesch", "lix"]
    dd = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    aggs = [F.count("*").cast("bigint").alias("_n")]
    for a in names:
        aggs.append(F.sum(a).cast("bigint").alias(f"_s_{a}"))
        for b in names:
            if a <= b:
                aggs.append(
                    F.sum(dd(F.col(a)) * dd(F.col(b))).alias(f"_p_{a}_{b}")
                )
    m = sig.agg(*aggs)
    out = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            key = f"_p_{a}_{b}" if a <= b else f"_p_{b}_{a}"
            num = dd(m["_n"]) * m[key] - dd(m[f"_s_{a}"]) * dd(m[f"_s_{b}"])
            va = dd(m["_n"]) * m[f"_p_{a}_{a}"] - dd(m[f"_s_{a}"]) * dd(
                m[f"_s_{a}"]
            )
            vb = dd(m["_n"]) * m[f"_p_{b}_{b}"] - dd(m[f"_s_{b}"]) * dd(
                m[f"_s_{b}"]
            )
            r = F.when(
                (va > 0) & (vb > 0),
                F.round(
                    num.cast("double")
                    / (F.sqrt(va.cast("double")) * F.sqrt(vb.cast("double"))),
                    6,
                ),
            ).otherwise(F.lit(0.0))
            out.append(
                m.select(
                    F.lit(a).alias("signal_a"),
                    F.lit(b).alias("signal_b"),
                    F.col("_n").alias("n_docs"),
                    r.alias("corr_r"),
                )
            )
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res.orderBy("signal_a", "signal_b")


def _signal_corr_oracle() -> str:
    from pyvectorsearch_spark.functions.text import duckdb_quality

    # the per-doc entropy ladder is rebuilt inline (same construction as
    # _entropy_oracle, which emits a full rollup query rather than a fragment)
    cnts = [
        f"(length(lt) - length(replace(lt, '{s}', '')))::BIGINT"
        for s in ENTROPY_ALPHABET
    ]
    cols = ",\n         ".join(f"{c} AS c{i}" for i, c in enumerate(cnts))
    nsum = " + ".join(f"c{i}" for i in range(len(cnts)))
    tsum = " + ".join(
        f"(CASE WHEN c{i} > 0 THEN round(c{i} * log2(c{i}), 6) ELSE 0.0 END)"
        for i in range(len(cnts))
    )
    q = duckdb_quality("raw", "tk")
    tok = duckdb_tokens("raw")
    names = ["quality", "entropy", "flesch", "lix"]
    sums = ["count(*)::BIGINT AS n"]
    for a in names:
        sums.append(f"sum({a})::BIGINT AS s_{a}")
        for b in names:
            if a <= b:
                sums.append(f"sum({a}::HUGEINT * {b}::HUGEINT) AS p_{a}_{b}")
    pairs_sql = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            key = f"p_{a}_{b}" if a <= b else f"p_{b}_{a}"
            num = f"(n::HUGEINT * {key} - s_{a}::HUGEINT * s_{b}::HUGEINT)"
            va = f"(n::HUGEINT * p_{a}_{a} - s_{a}::HUGEINT * s_{a}::HUGEINT)"
            vb = f"(n::HUGEINT * p_{b}_{b} - s_{b}::HUGEINT * s_{b}::HUGEINT)"
            pairs_sql.append(f"""
SELECT '{a}' AS signal_a, '{b}' AS signal_b, n AS n_docs,
       CASE WHEN {va} > 0 AND {vb} > 0
            THEN round(CAST({num} AS DOUBLE)
                       / (sqrt(CAST({va} AS DOUBLE))
                          * sqrt(CAST({vb} AS DOUBLE))), 6)
            ELSE 0.0 END AS corr_r
FROM m""")
    return f"""
WITH base AS (
  SELECT text AS raw, lower(text) AS lt, {tok} AS tk FROM documents
),
c AS (
  SELECT raw, tk,
         {cols}
  FROM base
),
sig AS (
  SELECT
    CAST(round({q} * 1000000) AS BIGINT) AS quality,
    CAST(round((CASE WHEN ({nsum}) > 0
         THEN round(log2(({nsum})::DOUBLE) - ({tsum}) / ({nsum})::DOUBLE, 6)
         ELSE 0.0 END) * 1000000) AS BIGINT) AS entropy,
    CAST(round((CASE WHEN len(tk) > 0
         THEN round(206.835
              - 1.015 * (len(tk) / greatest(len(regexp_extract_all(raw, '[.!?]+')), 1)::DOUBLE)
              - 84.6 * (greatest(len(regexp_extract_all(lower(raw), '[aeiouy]+')), 1) / len(tk)::DOUBLE), 6)
         ELSE 0.0 END) * 1000000) AS BIGINT) AS flesch,
    CAST(round((CASE WHEN len(tk) > 0
         THEN round(len(tk) / greatest(len(regexp_extract_all(raw, '[.!?]+')), 1)::DOUBLE
              + 100.0 * len(list_filter(tk, t -> length(t) > {LIX_LONG_CHARS})) / len(tk)::DOUBLE, 6)
         ELSE 0.0 END) * 1000000) AS BIGINT) AS lix
  FROM c
),
m AS (SELECT {", ".join(sums)} FROM sig)
{" UNION ALL ".join(pairs_sql)}
ORDER BY signal_a, signal_b
"""


ORACLE_TEXT_SIGNAL_CORR = _signal_corr_oracle()

QUERIES.update({"text_signal_correlation": q_text_signal_correlation})
ORACLES.update({"text_signal_correlation": ORACLE_TEXT_SIGNAL_CORR})


# --- quality-vs-length bias check --------------------------------------------------------


def q_quality_length_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bias audit of the quality screen: mean quality score per
    document-length decile (equal-count bins by n_chars rank) — the check
    that catches a filter which SAYS it selects quality but actually
    selects length (the composite score's token-count term makes this a
    real risk; Gopher/C4 pipelines audit exactly this before trusting a
    threshold). A flat profile = unbiased screen; a monotone ramp = your
    quality cut is a length cut in disguise.

    Determinism: deciles by integer rank over (n_chars, doc_id); quality
    micro-fixed so decile means are exact integer sums.

    Scale: one window over docs (id-tiebroken rank), one decile rollup."""
    from pyspark.sql import Window

    from pyvectorsearch_spark.operators.textops import quality_score_col

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.round(
            quality_score_col(F.col("text"), tokens(F.col("text"))) * 1000000
        )
        .cast("bigint")
        .alias("_qu"),
    )
    w = Window.orderBy(F.asc("n_chars"), F.asc("doc_id"))
    return (
        docs.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
            F.round(
                F.sum("_qu") / (F.count("*") * F.lit(1000000.0)), 4
            ).alias("avg_quality_r"),
        )
        .orderBy("decile")
    )


def _quality_length_oracle() -> str:
    from pyvectorsearch_spark.functions.text import duckdb_quality

    q = duckdb_quality("text", duckdb_tokens("text"))
    return f"""
WITH s AS (
  SELECT doc_id, n_chars,
         CAST(round({q} * 1000000) AS BIGINT) AS qu,
         ntile(10) OVER (ORDER BY n_chars, doc_id) AS decile
  FROM documents
)
SELECT decile, count(*)::BIGINT AS n_docs,
       min(n_chars)::BIGINT AS min_chars, max(n_chars)::BIGINT AS max_chars,
       round(sum(qu) / (count(*) * 1000000.0), 4) AS avg_quality_r
FROM s GROUP BY decile ORDER BY decile
"""


ORACLE_QUALITY_LENGTH_BIAS = _quality_length_oracle()

QUERIES.update({"quality_length_bias": q_quality_length_bias})
ORACLES.update({"quality_length_bias": ORACLE_QUALITY_LENGTH_BIAS})


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003)

WINNOW_K = 8
WINNOW_W = 4
WINNOW_MIN_SHARED = 8


def q_text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc winnowing fingerprint profile: count + an md5 digest of the
    sorted fingerprint list, pinning exact SELECTION (which window minima
    survive), not just how many — the guarantee the MOSS scheme is used
    for."""
    from pyvectorsearch_spark.functions.text import winnow_hashes, winnow_select

    docs = spread(load_table(spark, sf_dir, "documents"))
    # two-step: hashes materialize as their own projection (see winnow_hashes)
    with_fp = docs.withColumn(
        "_hs", winnow_hashes("text", k=WINNOW_K)
    ).withColumn("fp", winnow_select("_hs", w=WINNOW_W))
    return with_fp.select(
        "doc_id",
        F.size("fp").cast("bigint").alias("n_fingerprints"),
        F.md5(
            F.concat_ws(",", F.transform("fp", lambda x: x.cast("string")))
        ).alias("fp_digest"),
    ).orderBy("doc_id")


def _oracle_winnowing() -> str:
    from pyvectorsearch_spark.functions.text import (
        duckdb_winnow_hashes,
        duckdb_winnow_select,
    )

    hs = duckdb_winnow_hashes("text", k=WINNOW_K)
    fp = duckdb_winnow_select("hs", w=WINNOW_W)
    return f"""
SELECT doc_id, len(fp)::BIGINT AS n_fingerprints,
       md5(array_to_string(list_transform(fp, x -> x::VARCHAR), ',')) AS fp_digest
FROM (
  SELECT doc_id, {fp} AS fp
  FROM (SELECT doc_id, {hs} AS hs FROM documents)
)
ORDER BY doc_id
"""


ORACLE_TEXT_WINNOWING = _oracle_winnowing()

QUERIES.update({"text_winnowing": q_text_winnowing})
ORACLES.update({"text_winnowing": ORACLE_TEXT_WINNOWING})


WINNOW_MAX_DF = 100


def q_dedup_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style near-dup detection: document pairs sharing ≥ 8 winnowing
    fingerprints, with the containment fraction n_shared/min(|fp|).

    Scale shape: fingerprint inverted-index equi-join (candidates only —
    the same posture as the shingle/minhash/simhash dedup family), with
    MOSS's boilerplate elimination: fingerprints appearing in more than
    ``WINNOW_MAX_DF`` documents are dropped before pairing (Schleimer et
    al. §5 discard matches occurring in many documents as common code/
    boilerplate). Besides the semantics (boilerplate isn't plagiarism
    signal), this bounds the join's Σ df² candidate cost — without the cap
    the hot postings of a dup-dense corpus approach the full pair space
    (measured 82× for 10× docs on the sf1.0 fixture; 3.8× with it:
    3.65 s → 13.86 s).
    The containment denominator stays the FULL fingerprint-set size, so
    scores only ever shrink when boilerplate is dropped."""
    from pyvectorsearch_spark.functions.text import winnow_hashes, winnow_select

    docs = spread(load_table(spark, sf_dir, "documents"))
    base = (
        docs.withColumn("_hs", winnow_hashes("text", k=WINNOW_K))
        .withColumn("fp", winnow_select("_hs", w=WINNOW_W))
        .select(F.col("doc_id").alias("doc"), "fp", F.size("fp").alias("n_fp"))
    )
    # explode_OUTER, then drop the null row: InferFiltersFromGenerate turns a
    # plain explode into a `size(fp) > 0` filter and pushes the ENTIRE
    # fingerprint expression (with the hash list re-inlined, quadratic) into
    # the scan stage — 90s+ where the projection pair takes 4s. The rule
    # exempts outer generates; the post-generate null filter is on the
    # generated attribute, so nothing can push it below the projections.
    ex = base.select("doc", "n_fp", F.explode_outer("fp").alias("f")).filter(
        F.col("f").isNotNull()
    )
    # df attaches in the same exchange as a window count (the jaccard
    # pattern); the cap then filters before any pairing
    from pyspark.sql import Window as _W

    ex = ex.withColumn("_df", F.count("*").over(_W.partitionBy("f"))).filter(
        F.col("_df") <= WINNOW_MAX_DF
    )
    a, b = ex.alias("a"), ex.alias("b")
    shared = (
        a.join(b, (F.col("a.f") == F.col("b.f")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(
            F.col("a.doc").alias("d1"),
            F.col("b.doc").alias("d2"),
            F.col("a.n_fp").alias("n1"),
            F.col("b.n_fp").alias("n2"),
        )
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= WINNOW_MIN_SHARED)
    )
    return shared.select(
        "d1",
        "d2",
        F.col("n_shared").cast("bigint").alias("n_shared"),
        F.round(F.col("n_shared") / F.least("n1", "n2"), 6).alias("containment"),
    ).orderBy("d1", "d2")


def _oracle_winnowing_pairs() -> str:
    from pyvectorsearch_spark.functions.text import (
        duckdb_winnow_hashes,
        duckdb_winnow_select,
    )

    hs = duckdb_winnow_hashes("text", k=WINNOW_K)
    fp = duckdb_winnow_select("hs", w=WINNOW_W)
    return f"""
WITH hsrc AS (SELECT doc_id AS doc, {hs} AS hs FROM documents),
base AS (SELECT doc, {fp} AS fp FROM hsrc),
ex0 AS (SELECT doc, len(fp) AS n_fp, unnest(fp) AS f FROM base),
ex AS (
  SELECT doc, n_fp, f FROM (
    SELECT doc, n_fp, f, count(*) OVER (PARTITION BY f) AS df FROM ex0
  ) WHERE df <= {WINNOW_MAX_DF}
),
shared AS (
  SELECT a.doc AS d1, b.doc AS d2, a.n_fp AS n1, b.n_fp AS n2,
         count(*) AS n_shared
  FROM ex a JOIN ex b ON a.f = b.f AND a.doc < b.doc
  GROUP BY 1, 2, 3, 4
)
SELECT d1, d2, n_shared::BIGINT AS n_shared,
       round(n_shared / least(n1, n2)::DOUBLE, 6) AS containment
FROM shared WHERE n_shared >= {WINNOW_MIN_SHARED}
ORDER BY d1, d2
"""


ORACLE_DEDUP_WINNOWING_PAIRS = _oracle_winnowing_pairs()

QUERIES.update({"dedup_winnowing_pairs": q_dedup_winnowing_pairs})
ORACLES.update({"dedup_winnowing_pairs": ORACLE_DEDUP_WINNOWING_PAIRS})


# ---------------------------------------------------------------------------
# Content-defined chunking (LBFS, Muthitacharoen et al. SOSP'01): the
# storage-dedup primitive — chunk boundaries follow CONTENT, so shared
# passages align to identical chunks no matter where they sit in a doc.


def q_text_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc CDC profile: chunk count, mean chunk length, and the md5
    digest of the chunk-digest stream (pins every boundary decision)."""
    from pyvectorsearch_spark.functions.text import (
        cdc_boundaries,
        cdc_chunks,
        cdc_normalized,
    )

    docs = spread(load_table(spark, sf_dir, "documents"))
    with_chunks = (
        docs.withColumn("_s", cdc_normalized("text"))
        .withColumn("_bnd", cdc_boundaries("_s"))
        .withColumn("_ch", cdc_chunks("_s", "_bnd"))
    )
    return with_chunks.select(
        "doc_id",
        F.size("_ch").cast("bigint").alias("n_chunks"),
        F.round(
            F.aggregate("_ch", F.lit(0), lambda a, c: a + F.length(c))
            / F.greatest(F.size("_ch"), F.lit(1)),
            6,
        ).alias("avg_chunk_len"),
        F.md5(
            F.concat_ws(",", F.transform("_ch", lambda c: F.md5(c)))
        ).alias("chunks_digest"),
    ).orderBy("doc_id")


def _oracle_cdc_chunks() -> str:
    from pyvectorsearch_spark.functions.text import duckdb_cdc

    s, bnd, chunks = duckdb_cdc("text")
    return f"""
WITH n AS (SELECT doc_id, {s} AS s FROM documents),
b AS (SELECT doc_id, s, {bnd} AS bnd FROM n),
c AS (SELECT doc_id, {chunks} AS ch FROM b)
SELECT doc_id, len(ch)::BIGINT AS n_chunks,
       round(list_sum(list_transform(ch, x -> length(x)))
             / greatest(len(ch), 1), 6) AS avg_chunk_len,
       md5(array_to_string(list_transform(ch, x -> md5(x)), ',')) AS chunks_digest
FROM c ORDER BY doc_id
"""


ORACLE_TEXT_CDC_CHUNKS = _oracle_cdc_chunks()

QUERIES.update({"text_cdc_chunks": q_text_cdc_chunks})
ORACLES.update({"text_cdc_chunks": ORACLE_TEXT_CDC_CHUNKS})


def q_dedup_cdc_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level CDC storage-dedup report: total vs distinct chunks and
    chars, and the dedup ratio 1 − distinct_chars/total_chars — the number
    a content-addressed store would save. One explode → two bounded
    aggregates; chunk identity travels as an md5 digest (chunks themselves
    never shuffle twice)."""
    from pyvectorsearch_spark.functions.text import (
        cdc_boundaries,
        cdc_chunks,
        cdc_normalized,
    )

    docs = spread(load_table(spark, sf_dir, "documents"))
    ch = (
        docs.withColumn("_s", cdc_normalized("text"))
        .withColumn("_bnd", cdc_boundaries("_s"))
        .withColumn("_ch", cdc_chunks("_s", "_bnd"))
        .select(F.explode_outer("_ch").alias("c"))
        .filter(F.col("c").isNotNull())
        .select(F.md5("c").alias("d"), F.length("c").alias("len"))
    )
    per = ch.groupBy("d").agg(
        F.count("*").alias("cnt"), F.first("len").alias("len")
    )
    return per.agg(
        F.sum("cnt").cast("bigint").alias("total_chunks"),
        F.count("*").cast("bigint").alias("distinct_chunks"),
        F.sum(F.col("cnt") * F.col("len")).cast("bigint").alias("total_chars"),
        F.sum("len").cast("bigint").alias("distinct_chars"),
        F.round(
            F.lit(1.0)
            - F.sum("len") / F.sum(F.col("cnt") * F.col("len")).cast("double"),
            6,
        ).alias("dedup_ratio"),
    )


def _oracle_cdc_ratio() -> str:
    from pyvectorsearch_spark.functions.text import duckdb_cdc

    s, bnd, chunks = duckdb_cdc("text")
    return f"""
WITH n AS (SELECT doc_id, {s} AS s FROM documents),
b AS (SELECT doc_id, s, {bnd} AS bnd FROM n),
c AS (SELECT doc_id, {chunks} AS ch FROM b),
e AS (SELECT md5(unnest(ch)) AS d, length(unnest(ch)) AS len FROM c),
per AS (SELECT d, count(*) AS cnt, min(len) AS len FROM e GROUP BY d)
SELECT sum(cnt)::BIGINT AS total_chunks, count(*)::BIGINT AS distinct_chunks,
       sum(cnt * len)::BIGINT AS total_chars, sum(len)::BIGINT AS distinct_chars,
       round(1.0 - sum(len) / CAST(sum(cnt * len) AS DOUBLE), 6) AS dedup_ratio
FROM per
"""


ORACLE_DEDUP_CDC_RATIO = _oracle_cdc_ratio()

QUERIES.update({"dedup_cdc_ratio": q_dedup_cdc_ratio})
ORACLES.update({"dedup_cdc_ratio": ORACLE_DEDUP_CDC_RATIO})


def q_dedup_cdc_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document copy-containment under CDC: the fraction of a doc's
    chunk BYTES whose chunk content also occurs elsewhere in the corpus —
    the doc-level "how much of this is copied" diagnostic that decides
    between dropping a whole doc and trimming its duplicated passages.
    Shape: one explode, one digest-level df aggregate joined back on the
    digest (map-side combined; chunk bytes shuffle once as digests)."""
    from pyspark.sql import Window as _W

    from pyvectorsearch_spark.functions.text import (
        cdc_boundaries,
        cdc_chunks,
        cdc_normalized,
    )

    docs = spread(load_table(spark, sf_dir, "documents"))
    ch = (
        docs.withColumn("_s", cdc_normalized("text"))
        .withColumn("_bnd", cdc_boundaries("_s"))
        .withColumn("_ch", cdc_chunks("_s", "_bnd"))
        .select("doc_id", F.explode_outer("_ch").alias("c"))
        .filter(F.col("c").isNotNull())
        .select("doc_id", F.md5("c").alias("d"), F.length("c").alias("len"))
    )
    # corpus-wide occurrence count per digest, attached in one window pass
    ch = ch.withColumn("_df", F.count("*").over(_W.partitionBy("d")))
    per_doc = ch.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_chunks"),
        F.sum("len").cast("bigint").alias("n_chars"),
        F.sum(F.when(F.col("_df") > 1, F.col("len")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("shared_chars"),
    )
    return per_doc.select(
        "doc_id",
        "n_chunks",
        "n_chars",
        "shared_chars",
        F.round(
            F.col("shared_chars") / F.greatest("n_chars", F.lit(1)).cast("double"), 6
        ).alias("containment"),
    ).orderBy("doc_id")


def _oracle_cdc_containment() -> str:
    from pyvectorsearch_spark.functions.text import duckdb_cdc

    s, bnd, chunks = duckdb_cdc("text")
    return f"""
WITH n AS (SELECT doc_id, {s} AS s FROM documents),
b AS (SELECT doc_id, s, {bnd} AS bnd FROM n),
c AS (SELECT doc_id, {chunks} AS ch FROM b),
e AS (
  SELECT doc_id, md5(unnest(ch)) AS d, length(unnest(ch)) AS len FROM c
),
w AS (SELECT doc_id, d, len, count(*) OVER (PARTITION BY d) AS df FROM e),
per AS (
  SELECT doc_id, count(*)::BIGINT AS n_chunks, sum(len)::BIGINT AS n_chars,
         sum(CASE WHEN df > 1 THEN len ELSE 0 END)::BIGINT AS shared_chars
  FROM w GROUP BY doc_id
)
SELECT doc_id, n_chunks, n_chars, shared_chars,
       round(shared_chars / greatest(n_chars, 1)::DOUBLE, 6) AS containment
FROM per ORDER BY doc_id
"""


ORACLE_DEDUP_CDC_CONTAINMENT = _oracle_cdc_containment()

QUERIES.update({"dedup_cdc_containment": q_dedup_cdc_containment})
ORACLES.update({"dedup_cdc_containment": ORACLE_DEDUP_CDC_CONTAINMENT})


# --- RAKE keyword extraction -------------------------------------------------

RAKE_TOP_K = 20


def q_text_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    maximal stopword-free token runs; each word scores deg(w)/freq(w)
    (deg = sum of lengths of phrases containing it, freq = occurrence
    count, both CORPUS-level); a phrase scores the sum of its words'
    scores. Top-K distinct phrases by score. Every quantity is an exact
    integer ratio, so the extracted keyword list is hash-checked.

    Shape: posexplode -> one window per doc for the phrase ids (rides the
    same doc partitioning), two corpus rollups (word stats are
    vocab-sized, phrase rollup is phrase-sized), one bounded top-k."""
    from pyspark.sql import Window

    from pyvectorsearch_spark.operators.textops import STOPWORDS

    docs = spread(load_table(spark, sf_dir, "documents"))
    stops = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    toks = F.split(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " ")
    pos = docs.select(
        "doc_id", F.posexplode(toks).alias("pos", "w")
    ).filter(F.col("w") != "")
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    marked = pos.withColumn("_stop", F.array_contains(stops, F.col("w")).cast("int"))
    phr = (
        marked.withColumn(
            "_pid",
            F.sum("_stop").over(
                wdoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .filter(F.col("_stop") == 0)
        .groupBy("doc_id", "_pid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
                " ",
            ).alias("phrase"),
            F.count("*").cast("bigint").alias("plen"),
            F.collect_list("w").alias("_ws"),
        )
    )
    members = phr.select("doc_id", "_pid", "plen", F.explode("_ws").alias("w"))
    wstats = members.groupBy("w").agg(
        F.count("*").cast("bigint").alias("freq"),
        F.sum("plen").cast("bigint").alias("deg"),
    )
    scored = (
        members.join(wstats, "w")
        .groupBy("doc_id", "_pid")
        .agg(F.sum(F.col("deg") / F.col("freq")).alias("_score"))
        .join(phr.select("doc_id", "_pid", "phrase", "plen"), ["doc_id", "_pid"])
        .groupBy("phrase")
        .agg(
            F.max("plen").alias("n_words"),
            F.count("*").cast("bigint").alias("n_occ"),
            F.round(F.max("_score"), 6).alias("score_r"),
        )
    )
    return scored.orderBy(
        F.desc("score_r"), F.asc("phrase")
    ).limit(RAKE_TOP_K)


def _rake_oracle() -> str:
    from pyvectorsearch_spark.operators.textops import STOPWORDS

    stops = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    return f"""
WITH toks AS (
  SELECT doc_id,
         str_split(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' ')
           AS ts
  FROM documents
),
pos AS (
  SELECT doc_id, unnest(ts) AS w,
         unnest(range(1, len(ts) + 1)) AS p
  FROM toks
),
marked AS (
  SELECT doc_id, w, p,
         CASE WHEN list_contains([{stops}], w) THEN 1 ELSE 0 END AS st
  FROM pos WHERE w <> ''
),
pid AS (
  SELECT doc_id, w, p, st,
         sum(st) OVER (PARTITION BY doc_id ORDER BY p
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
  FROM marked
),
phr AS (
  SELECT doc_id, g, string_agg(w, ' ' ORDER BY p) AS phrase,
         count(*)::BIGINT AS plen
  FROM pid WHERE st = 0 GROUP BY doc_id, g
),
members AS (
  SELECT p.doc_id, p.g, ph.plen, p.w
  FROM pid p JOIN phr ph ON ph.doc_id = p.doc_id AND ph.g = p.g
  WHERE p.st = 0
),
wstats AS (
  SELECT w, count(*)::BIGINT AS freq, sum(plen)::BIGINT AS deg
  FROM members GROUP BY w
),
scored AS (
  SELECT m.doc_id, m.g, sum(s.deg * 1.0 / s.freq) AS sc
  FROM members m JOIN wstats s ON s.w = m.w
  GROUP BY m.doc_id, m.g
)
SELECT ph.phrase, max(ph.plen)::BIGINT AS n_words,
       count(*)::BIGINT AS n_occ, round(max(sc.sc), 6) AS score_r
FROM phr ph JOIN scored sc ON sc.doc_id = ph.doc_id AND sc.g = ph.g
GROUP BY ph.phrase
ORDER BY score_r DESC, phrase ASC LIMIT {RAKE_TOP_K}
"""


QUERIES.update({"text_rake": q_text_rake})
ORACLES.update({"text_rake": _rake_oracle()})


def q_dedup_cdc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedupe-on-ingest against the content-addressed store: docs with
    doc_id % 10 == 0 are the INCOMING BATCH, the rest are the existing
    corpus store. For each batch doc, the fraction of its chunk BYTES
    whose content already exists in the store (upload-skippable), rolled
    up to the ingest report: batch size, new-vs-present chunk and byte
    counts, and the transfer-savings ratio — the nightly number an
    incremental ingest pipeline reports. Chunk identity travels as an
    md5 digest; the store side reduces to its distinct digest set before
    the probe join (batch-sized, broadcastable at any corpus scale)."""
    from pyvectorsearch_spark.functions.text import (
        cdc_boundaries,
        cdc_chunks,
        cdc_normalized,
    )

    docs = spread(load_table(spark, sf_dir, "documents"))
    ch = (
        docs.withColumn("_s", cdc_normalized("text"))
        .withColumn("_bnd", cdc_boundaries("_s"))
        .withColumn("_ch", cdc_chunks("_s", "_bnd"))
        .select(
            "doc_id",
            (F.col("doc_id") % 10 == 0).alias("_batch"),
            F.explode_outer("_ch").alias("c"),
        )
        .filter(F.col("c").isNotNull())
        .select(
            "doc_id", "_batch", F.md5("c").alias("d"), F.length("c").alias("len")
        )
    )
    store = ch.filter(~F.col("_batch")).select("d").distinct()
    batch = ch.filter(F.col("_batch"))
    probed = batch.join(
        store.withColumn("_present", F.lit(1)), "d", "left"
    ).withColumn("_present", F.coalesce("_present", F.lit(0)))
    return probed.agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_batch_docs"),
        F.count("*").cast("bigint").alias("batch_chunks"),
        F.sum("_present").cast("bigint").alias("chunks_present"),
        F.sum("len").cast("bigint").alias("batch_bytes"),
        F.sum(F.col("len") * F.col("_present")).cast("bigint").alias(
            "bytes_present"
        ),
        F.round(
            F.sum(F.col("len") * F.col("_present"))
            / F.sum("len").cast("double"),
            6,
        ).alias("transfer_saving_r"),
    )


def _oracle_cdc_ingest() -> str:
    from pyvectorsearch_spark.functions.text import duckdb_cdc

    s, bnd, chunks = duckdb_cdc("text")
    return f"""
WITH t0 AS (SELECT doc_id, {s} AS s FROM documents),
t1 AS (SELECT doc_id, s, {bnd} AS bnd FROM t0),
t2 AS (SELECT doc_id, {chunks} AS ch FROM t1),
ex AS (
  SELECT doc_id, (doc_id % 10 = 0) AS batch,
         md5(unnest(ch)) AS d, length(unnest(ch)) AS len
  FROM t2
),
store AS (SELECT DISTINCT d FROM ex WHERE NOT batch),
probed AS (
  SELECT e.doc_id, e.d, e.len,
         CASE WHEN s.d IS NULL THEN 0 ELSE 1 END AS present
  FROM ex e LEFT JOIN store s ON s.d = e.d
  WHERE e.batch
)
SELECT count(DISTINCT doc_id)::BIGINT AS n_batch_docs,
       count(*)::BIGINT AS batch_chunks,
       sum(present)::BIGINT AS chunks_present,
       sum(len)::BIGINT AS batch_bytes,
       sum(len * present)::BIGINT AS bytes_present,
       round(sum(len * present) / CAST(sum(len) AS DOUBLE), 6)
         AS transfer_saving_r
FROM probed
"""


QUERIES.update({"dedup_cdc_ingest": q_dedup_cdc_ingest})
ORACLES.update({"dedup_cdc_ingest": _oracle_cdc_ingest()})


# --- ROUGE-N over near-dup candidate pairs ------------------------------------

ROUGE_N = 2


def q_text_rouge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-2 (Lin 2004) over the Jaccard near-dup candidate pairs:
    clipped bigram-multiset overlap grading each candidate pair by CONTENT
    overlap, where set-Jaccard saturates — the pair-level quality metric a
    curation pipeline attaches to its dedup candidates (and the standard
    summarization metric, reused). recall/precision/F1 are ratios of
    integer counts, engine-exact before one final rounded division."""
    from pyvectorsearch_spark.operators.dedup import jaccard_similarity_pairs
    from pyvectorsearch_spark.operators.textops import rouge_n_pairs
    from pyvectorsearch_spark.queries.dedup import JACCARD_THRESHOLD

    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs = jaccard_similarity_pairs(docs, threshold=JACCARD_THRESHOLD)
    return rouge_n_pairs(docs, pairs, n=ROUGE_N).orderBy("d1", "d2")


def _oracle_rouge_pairs() -> str:
    from pyvectorsearch_spark.functions.text import duckdb_word_ngrams
    from pyvectorsearch_spark.queries.dedup import _JACCARD_CTES

    ng = duckdb_word_ngrams("t", ROUGE_N)
    return f"""
WITH {_JACCARD_CTES},
p AS (SELECT d1, d2 FROM jpairs),
ids AS (SELECT d1 AS doc FROM p UNION SELECT d2 FROM p),
g AS (
  SELECT doc_id AS doc, unnest({ng}) AS gr
  FROM toks WHERE doc_id IN (SELECT doc FROM ids)
),
gc AS (SELECT doc, gr, count(*)::BIGINT AS c FROM g GROUP BY doc, gr),
tot AS (SELECT doc, sum(c)::BIGINT AS t FROM gc GROUP BY doc),
clip AS (
  SELECT p.d1, p.d2, sum(least(a.c, b.c))::BIGINT AS cl
  FROM p
  JOIN gc a ON a.doc = p.d1
  JOIN gc b ON b.doc = p.d2 AND b.gr = a.gr
  GROUP BY p.d1, p.d2
)
SELECT p.d1, p.d2,
       coalesce(cl, 0)::BIGINT AS clip,
       round(coalesce(cl, 0) / CAST(t1.t AS DOUBLE), 6) AS rouge_recall_r,
       round(coalesce(cl, 0) / CAST(t2.t AS DOUBLE), 6) AS rouge_precision_r,
       round(2.0 * coalesce(cl, 0) / CAST(t1.t + t2.t AS DOUBLE), 6)
         AS rouge_f1_r
FROM p
LEFT JOIN clip ON clip.d1 = p.d1 AND clip.d2 = p.d2
JOIN tot t1 ON t1.doc = p.d1
JOIN tot t2 ON t2.doc = p.d2
ORDER BY p.d1, p.d2
"""


QUERIES.update({"text_rouge_pairs": q_text_rouge_pairs})
ORACLES.update({"text_rouge_pairs": _oracle_rouge_pairs()})


# --- self-BLEU over near-dup candidate pairs ----------------------------------

BLEU_MAX_N = 2


def q_text_bleu_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-BLEU (Zhu et al. SIGIR'18; BLEU per Papineni et al. ACL'02)
    over the Jaccard near-dup candidate pairs: clipped 1/2-gram precisions
    against the candidate side, geometric-mean combined under the brevity
    penalty. High BLEU against a sibling document = templated/boilerplate
    text — the diversity down-weighting signal for corpus curation. All
    precisions are ratios of INTEGER counts; sqrt/mul/div are correctly
    rounded IEEE, and exp()'s last-ulp wobble is absorbed by the 9-dp
    rounding ladder on BP."""
    from pyvectorsearch_spark.operators.dedup import jaccard_similarity_pairs
    from pyvectorsearch_spark.operators.textops import bleu_n_pairs
    from pyvectorsearch_spark.queries.dedup import JACCARD_THRESHOLD

    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs = jaccard_similarity_pairs(docs, threshold=JACCARD_THRESHOLD)
    return bleu_n_pairs(docs, pairs, max_n=BLEU_MAX_N).orderBy("d1", "d2")


def _oracle_bleu_pairs() -> str:
    from pyvectorsearch_spark.functions.text import duckdb_word_ngrams
    from pyvectorsearch_spark.queries.dedup import _JACCARD_CTES

    ng1 = duckdb_word_ngrams("t", 1)
    ng2 = duckdb_word_ngrams("t", 2)
    return f"""
WITH {_JACCARD_CTES},
p AS (SELECT d1, d2 FROM jpairs),
ids AS (SELECT d1 AS doc FROM p UNION SELECT d2 FROM p),
tk AS (SELECT doc_id AS doc, t FROM toks WHERE doc_id IN (SELECT doc FROM ids)),
g1 AS (SELECT doc, unnest({ng1}) AS gr FROM tk),
g2 AS (SELECT doc, unnest({ng2}) AS gr FROM tk),
gc1 AS (SELECT doc, gr, count(*)::BIGINT AS c FROM g1 GROUP BY doc, gr),
gc2 AS (SELECT doc, gr, count(*)::BIGINT AS c FROM g2 GROUP BY doc, gr),
tot1 AS (SELECT doc, sum(c)::BIGINT AS t FROM gc1 GROUP BY doc),
tot2 AS (SELECT doc, sum(c)::BIGINT AS t FROM gc2 GROUP BY doc),
cl1 AS (
  SELECT p.d1, p.d2, sum(least(a.c, b.c))::BIGINT AS cl
  FROM p JOIN gc1 a ON a.doc = p.d1
  JOIN gc1 b ON b.doc = p.d2 AND b.gr = a.gr
  GROUP BY 1, 2
),
cl2 AS (
  SELECT p.d1, p.d2, sum(least(a.c, b.c))::BIGINT AS cl
  FROM p JOIN gc2 a ON a.doc = p.d1
  JOIN gc2 b ON b.doc = p.d2 AND b.gr = a.gr
  GROUP BY 1, 2
),
j AS (
  SELECT p.d1, p.d2,
         coalesce(cl1.cl, 0)::BIGINT AS c1,
         coalesce(cl2.cl, 0)::BIGINT AS c2,
         coalesce(ra.t, 0)::BIGINT AS r,
         coalesce(d1u.t, 0)::BIGINT AS den1,
         coalesce(d2b.t, 0)::BIGINT AS den2
  FROM p
  LEFT JOIN cl1 ON cl1.d1 = p.d1 AND cl1.d2 = p.d2
  LEFT JOIN cl2 ON cl2.d1 = p.d1 AND cl2.d2 = p.d2
  LEFT JOIN tot1 ra ON ra.doc = p.d1
  LEFT JOIN tot1 d1u ON d1u.doc = p.d2
  LEFT JOIN tot2 d2b ON d2b.doc = p.d2
),
b AS (
  SELECT *,
         CASE WHEN den1 > r THEN 1.0
              ELSE round(exp(1.0 - r / CAST(den1 AS DOUBLE)), 9) END AS bp
  FROM j
)
SELECT d1, d2,
       c1 AS clip_1,
       CASE WHEN den1 > 0
            THEN round(c1 / CAST(den1 AS DOUBLE), 6) ELSE 0.0 END AS p_1_r,
       c2 AS clip_2,
       CASE WHEN den2 > 0
            THEN round(c2 / CAST(den2 AS DOUBLE), 6) ELSE 0.0 END AS p_2_r,
       CASE WHEN den1 > 0 THEN round(bp, 6) ELSE 0.0 END AS bp_r,
       CASE WHEN c1 > 0 AND c2 > 0 AND den1 > 0 AND den2 > 0
            THEN round(bp * sqrt((c1 / CAST(den1 AS DOUBLE))
                               * (c2 / CAST(den2 AS DOUBLE))), 6)
            ELSE 0.0 END AS bleu_r
FROM b
ORDER BY d1, d2
"""


QUERIES.update({"text_bleu_pairs": q_text_bleu_pairs})
ORACLES.update({"text_bleu_pairs": _oracle_bleu_pairs()})


# --- chrF over near-dup candidate pairs ---------------------------------------

CHRF_MAX_N = 6
CHRF_BETA = 2.0


def q_text_chrf_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """chrF (Popović WMT'15) over the Jaccard near-dup candidate pairs: the
    character-n-gram F2 that stays informative where word-gram metrics
    fracture on tokenization/morphology drift. Pure add/mul/div ladder —
    no exp/log — so cross-engine parity is exact by construction."""
    from pyvectorsearch_spark.operators.dedup import jaccard_similarity_pairs
    from pyvectorsearch_spark.operators.textops import chrf_pairs
    from pyvectorsearch_spark.queries.dedup import JACCARD_THRESHOLD

    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs = jaccard_similarity_pairs(docs, threshold=JACCARD_THRESHOLD)
    return chrf_pairs(docs, pairs, max_n=CHRF_MAX_N, beta=CHRF_BETA).orderBy(
        "d1", "d2"
    )


def _oracle_chrf_pairs() -> str:
    from pyvectorsearch_spark.functions.text import duckdb_chargrams
    from pyvectorsearch_spark.queries.dedup import _JACCARD_CTES

    ns = list(range(1, CHRF_MAX_N + 1))
    b2 = CHRF_BETA * CHRF_BETA
    g_union = "\n  UNION ALL ".join(
        f"SELECT doc, {n} AS n, unnest({duckdb_chargrams('txt', n)}) AS gr FROM tk"
        for n in ns
    )
    tp_cols = ",\n         ".join(
        f"max(CASE WHEN n = {n} THEN t END) AS t{n}" for n in ns
    )
    cp_cols = ",\n         ".join(
        f"max(CASE WHEN n = {n} THEN cl END) AS cl{n}" for n in ns
    )
    def ratio(n: int, side: str) -> str:
        return (
            f"CASE WHEN coalesce({side}.t{n}, 0) > 0 "
            f"THEN coalesce(cp.cl{n}, 0) / CAST({side}.t{n} AS DOUBLE) "
            f"ELSE 0.0 END"
        )
    P = "(" + " + ".join(ratio(n, "tc") for n in ns) + f") / {float(CHRF_MAX_N)}"
    R = "(" + " + ".join(ratio(n, "tr") for n in ns) + f") / {float(CHRF_MAX_N)}"
    return f"""
WITH {_JACCARD_CTES},
p AS (SELECT d1, d2 FROM jpairs),
ids AS (SELECT d1 AS doc FROM p UNION SELECT d2 FROM p),
tk AS (SELECT doc_id AS doc, text AS txt FROM documents
       WHERE doc_id IN (SELECT doc FROM ids)),
g AS (
  {g_union}
),
gc AS (SELECT doc, n, gr, count(*)::BIGINT AS c FROM g GROUP BY 1, 2, 3),
tot AS (SELECT doc, n, sum(c)::BIGINT AS t FROM gc GROUP BY 1, 2),
tp AS (SELECT doc,
         {tp_cols}
       FROM tot GROUP BY doc),
cl AS (
  SELECT p.d1, p.d2, a.n, sum(least(a.c, b.c))::BIGINT AS cl
  FROM p JOIN gc a ON a.doc = p.d1
  JOIN gc b ON b.doc = p.d2 AND b.n = a.n AND b.gr = a.gr
  GROUP BY 1, 2, 3
),
cp0 AS (SELECT d1, d2,
         {cp_cols}
       FROM cl GROUP BY d1, d2),
f AS (
  SELECT p.d1, p.d2,
         {P} AS pp,
         {R} AS rr
  FROM p
  LEFT JOIN cp0 cp ON cp.d1 = p.d1 AND cp.d2 = p.d2
  LEFT JOIN tp tr ON tr.doc = p.d1
  LEFT JOIN tp tc ON tc.doc = p.d2
)
SELECT d1, d2,
       round(pp, 6) AS chrf_p_r,
       round(rr, 6) AS chrf_r_r,
       CASE WHEN {b2} * pp + rr > 0.0
            THEN round({1.0 + b2} * pp * rr / ({b2} * pp + rr), 6)
            ELSE 0.0 END AS chrf_r
FROM f
ORDER BY d1, d2
"""


QUERIES.update({"text_chrf_pairs": q_text_chrf_pairs})
ORACLES.update({"text_chrf_pairs": _oracle_chrf_pairs()})


# --- corpus diversity report (self-BLEU rollup) --------------------------------

DIVERSITY_HIGH = 0.5


def q_text_diversity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level self-BLEU rollup (Zhu et al. SIGIR'18 report over the
    candidate pairs): pair count, mean self-BLEU, and the high-similarity
    share. Order-independence trick: the mean is computed from the SUM of
    the 6-dp-rounded scores scaled to INTEGERS (round(bleu·1e6) as bigint)
    — an exact, commutative bigint sum — then one IEEE division; no float
    accumulation, so the rollup hash-checks like the per-pair rows."""
    from pyvectorsearch_spark.operators.dedup import jaccard_similarity_pairs
    from pyvectorsearch_spark.operators.textops import bleu_n_pairs
    from pyvectorsearch_spark.queries.dedup import JACCARD_THRESHOLD

    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs = jaccard_similarity_pairs(docs, threshold=JACCARD_THRESHOLD)
    b = bleu_n_pairs(docs, pairs, max_n=BLEU_MAX_N)
    scaled = F.round(F.col("bleu_r") * 1e6).cast("bigint")
    return b.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum(scaled).alias("bleu_sum_scaled"),
        F.sum((F.col("bleu_r") >= DIVERSITY_HIGH).cast("bigint")).alias(
            "n_high_sim"
        ),
    ).select(
        "n_pairs",
        "bleu_sum_scaled",
        "n_high_sim",
        F.when(
            F.col("n_pairs") > 0,
            F.round(
                F.col("bleu_sum_scaled")
                / (F.col("n_pairs").cast("double") * 1e6),
                6,
            ),
        ).otherwise(F.lit(0.0)).alias("mean_self_bleu_r"),
        F.when(
            F.col("n_pairs") > 0,
            F.round(F.col("n_high_sim") / F.col("n_pairs").cast("double"), 6),
        ).otherwise(F.lit(0.0)).alias("high_sim_share_r"),
    )


def _oracle_diversity_report() -> str:
    inner = _oracle_bleu_pairs()
    return f"""
WITH bleu AS ({inner}),
agg AS (
  SELECT count(*)::BIGINT AS n_pairs,
         sum(CAST(round(bleu_r * 1e6) AS BIGINT))::BIGINT AS bleu_sum_scaled,
         sum(CASE WHEN bleu_r >= {DIVERSITY_HIGH} THEN 1 ELSE 0 END)::BIGINT
           AS n_high_sim
  FROM bleu
)
SELECT n_pairs, bleu_sum_scaled, n_high_sim,
       CASE WHEN n_pairs > 0
            THEN round(bleu_sum_scaled / (CAST(n_pairs AS DOUBLE) * 1e6), 6)
            ELSE 0.0 END AS mean_self_bleu_r,
       CASE WHEN n_pairs > 0
            THEN round(n_high_sim / CAST(n_pairs AS DOUBLE), 6)
            ELSE 0.0 END AS high_sim_share_r
FROM agg
"""


QUERIES.update({"text_diversity_report": q_text_diversity_report})
ORACLES.update({"text_diversity_report": _oracle_diversity_report()})
