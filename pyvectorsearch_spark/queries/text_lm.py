"""Language-model / frequency / line-cleaning text queries (outside the
driver's pinned 50-entry window; covered by tests/test_oracle_parity.py
against the same bit-exact DuckDB oracles).

Operators exercised (SURVEY.md §2.4 north-star extensions):
- per-source exact heavy hitters (`operators/textops.py::top_terms`)
- corpus-trained bigram LM quality scoring (`bigram_lm_score`, the
  CCNet/KenLM-style perplexity filter signal)
- C4-style line-level cleaning (`c4_line_filter`, Raffel et al. 2020 §2.2).
  The corpus is newline-free word salad, so the query PLANTS deterministic
  lines (10-token lines; punctuation and a blacklist word injected by
  doc_id/line arithmetic — same construction in the oracle), the same
  pattern `text_pii_redact` uses for planted PII.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.functions.text import duckdb_tokens, tokens
from pyvectorsearch_spark.operators.textops import (
    C4_BLACKLIST,
    bigram_lm_score,
    c4_line_filter,
    top_terms,
)
from pyvectorsearch_spark.sources.tables import load_table, spread

_TOK = duckdb_tokens("text")

TOP_K = 10
LM_SMOOTH = 0.5
C4_LINE_WORDS = 10
C4_MIN_WORDS = 3


def q_text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most frequent tokens per source (exact two-phase heavy
    hitters: map-side-combined counts, then a vocabulary-sized top-k
    window)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return top_terms(docs, by="source", k=TOP_K).orderBy("source", "rank")


ORACLE_TOP_TERMS = f"""
WITH e AS (SELECT source, unnest({_TOK}) AS term FROM documents),
cnt AS (
  SELECT source, term, count(*)::BIGINT AS n FROM e GROUP BY source, term
),
r AS (
  SELECT source, term, n,
         row_number() OVER (PARTITION BY source
                            ORDER BY n DESC, term ASC) AS rank
  FROM cnt
)
SELECT source, term, n, rank FROM r WHERE rank <= {TOP_K}
ORDER BY source, rank
"""


def q_text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean bigram log-probability per document under the corpus-trained
    add-0.5-smoothed bigram LM — the perplexity-style quality signal."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return bigram_lm_score(docs, smooth=LM_SMOOTH).orderBy("doc_id")


_BIGRAM_LM_CTES = f"""tokd AS (SELECT doc_id, {_TOK} AS t FROM documents),
v AS (
  SELECT count(DISTINCT term)::DOUBLE AS v
  FROM (SELECT unnest(t) AS term FROM tokd)
),
pos AS (SELECT doc_id, unnest(range(1, len(t))) AS i, t FROM tokd),
b AS (
  SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i + 1] AS gram FROM pos
),
tf AS (
  SELECT doc_id, w1, gram, count(*)::BIGINT AS tf FROM b GROUP BY ALL
),
att AS (
  SELECT doc_id, tf,
         sum(tf) OVER (PARTITION BY gram)::DOUBLE AS cbg,
         sum(tf) OVER (PARTITION BY w1)::DOUBLE AS cuni
  FROM tf
),
sc AS (
  SELECT doc_id, tf,
         tf * round(ln((cbg + {LM_SMOOTH}) / (cuni + {LM_SMOOTH} * v.v)), 6) AS c
  FROM att CROSS JOIN v
)"""

ORACLE_BIGRAM_LM = f"""
WITH {_BIGRAM_LM_CTES}
SELECT doc_id, sum(tf)::BIGINT AS n_bigrams,
       round(round(sum(c), 6) / sum(tf), 6) AS avg_logprob
FROM sc GROUP BY doc_id ORDER BY doc_id
"""


def _planted_lines() -> F.Column:
    """Deterministic line structure over the newline-free corpus: 10-token
    lines; line j of doc d gets terminal '.' unless (d + j) % 5 == 0 and a
    planted 'cookie' prefix when (d + j) % 7 == 0 — so the C4 rules have
    real work (short last lines, missing punctuation, blacklist hits)."""
    t = tokens("text")
    did = F.col("doc_id")
    nlines = F.greatest(F.ceil(F.size(t) / 10), F.lit(1))

    def line(j):
        base = F.concat_ws(" ", F.slice(t, j * 10 + 1, C4_LINE_WORDS))
        inj = F.when((did + j) % 7 == 0, F.concat(F.lit("cookie "), base)).otherwise(
            base
        )
        return F.when((did + j) % 5 != 0, F.concat(inj, F.lit("."))).otherwise(inj)

    return F.array_join(F.transform(F.sequence(F.lit(0), nlines - 1), line), "\n")


def q_text_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line cleaning over the planted-line corpus: per-doc line counts and
    the md5 of the cleaned text (pins exact kept-line content and order)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    planted = docs.select("doc_id", _planted_lines().alias("text"))
    out = c4_line_filter(planted, min_words=C4_MIN_WORDS)
    return out.select(
        "doc_id",
        "n_lines",
        "n_kept",
        "n_kept_chars",
        F.md5("cleaned").alias("clean_digest"),
    ).orderBy("doc_id")


_BL_SQL = ", ".join(f"'{w}'" for w in C4_BLACKLIST)
_TOKL = duckdb_tokens("l")

ORACLE_C4_CLEAN = f"""
WITH tokd AS (SELECT doc_id, {_TOK} AS t FROM documents),
planted AS (
  SELECT doc_id,
         array_to_string(
           list_transform(
             range(0, greatest(CAST(ceil(len(t) / 10) AS BIGINT), 1)),
             j -> CASE WHEN (doc_id + j) % 5 <> 0 THEN
                    CASE WHEN (doc_id + j) % 7 = 0
                         THEN 'cookie ' || array_to_string(t[j*10+1 : j*10+{C4_LINE_WORDS}], ' ')
                         ELSE array_to_string(t[j*10+1 : j*10+{C4_LINE_WORDS}], ' ')
                    END || '.'
                  ELSE
                    CASE WHEN (doc_id + j) % 7 = 0
                         THEN 'cookie ' || array_to_string(t[j*10+1 : j*10+{C4_LINE_WORDS}], ' ')
                         ELSE array_to_string(t[j*10+1 : j*10+{C4_LINE_WORDS}], ' ')
                    END
                  END
           ), chr(10)) AS text
  FROM tokd
),
lined AS (
  SELECT doc_id, string_split(text, chr(10)) AS lines FROM planted
),
cleaned AS (
  SELECT doc_id, lines,
         list_filter(lines, l ->
           regexp_matches(l, '[.!?]$')
           AND len({_TOKL}) >= {C4_MIN_WORDS}
           AND NOT list_has_any({_TOKL}, [{_BL_SQL}])
         ) AS kept
  FROM lined
)
SELECT doc_id,
       len(lines)::BIGINT AS n_lines,
       len(kept)::BIGINT AS n_kept,
       -- array_to_string of an empty list is NULL in DuckDB, '' in Spark
       length(coalesce(array_to_string(kept, chr(10)), ''))::BIGINT AS n_kept_chars,
       md5(coalesce(array_to_string(kept, chr(10)), '')) AS clean_digest
FROM cleaned ORDER BY doc_id
"""


ZIPF_TOP_N = 50


def q_text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS Zipf fit over the top-50 term frequency spectrum — slope near -1
    is healthy natural text; the whole fit is deterministic (rounding
    ladder) and oracle-checked."""
    from pyvectorsearch_spark.operators.textops import zipf_fit

    docs = spread(load_table(spark, sf_dir, "documents"))
    return zipf_fit(docs, top_n=ZIPF_TOP_N)


ORACLE_TEXT_ZIPF = f"""
WITH e AS (SELECT unnest({_TOK}) AS t FROM documents),
cnt AS (SELECT t, count(*)::BIGINT AS c FROM e GROUP BY t),
ranked AS (
  SELECT t, c, row_number() OVER (ORDER BY c DESC, t ASC) AS r FROM cnt
  QUALIFY r <= {ZIPF_TOP_N}
),
v AS (
  SELECT t, c, r, round(ln(r::DOUBLE), 6) AS x, round(ln(c::DOUBLE), 6) AS y
  FROM ranked
),
s AS (
  SELECT count(*)::DOUBLE AS n,
         round(sum(x), 6) AS sx, round(sum(y), 6) AS sy,
         round(sum(x * y), 6) AS sxy, round(sum(x * x), 6) AS sxx,
         max(CASE WHEN r = 1 THEN t END) AS top_term,
         max(CASE WHEN r = 1 THEN c END) AS top_count
  FROM v
)
SELECT n::BIGINT AS n_terms,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
         AS intercept,
       top_term, top_count::BIGINT AS top_count
FROM s
"""


BP_HEADER = "subscribe to our newsletter for weekly updates"
BP_MIN_DOCS = 5


def q_text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-template detection: every doc with doc_id % 3 == 0 gets a
    planted per-source banner prepended (the corpus itself is boilerplate-
    free — same planted-fixture pattern as the PII and C4 queries), then the
    detector reports the k-token prefixes shared by >= 5 docs per source.
    The planted banner must surface for every source; organic prefixes
    (random vocab) stay below the threshold."""
    from pyvectorsearch_spark.operators.textops import boilerplate_prefixes

    docs = spread(load_table(spark, sf_dir, "documents"))
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(BP_HEADER + " "), F.col("text")),
        ).otherwise(F.col("text")),
    )
    out = boilerplate_prefixes(planted, k=6, min_docs=BP_MIN_DOCS)
    return out.orderBy("source", "prefix")


def _oracle_boilerplate() -> str:
    tok = duckdb_tokens(
        f"(CASE WHEN doc_id % 3 = 0 THEN '{BP_HEADER} ' || text ELSE text END)"
    )
    return f"""
WITH t AS (SELECT source, {tok} AS tk FROM documents),
p AS (
  SELECT source, array_to_string(tk[1:6], ' ') AS prefix FROM t
  WHERE len(tk) > 0
)
SELECT source, prefix, count(*)::BIGINT AS n_docs
FROM p
WHERE prefix <> ''
GROUP BY source, prefix
HAVING count(*) >= {BP_MIN_DOCS}
ORDER BY source, prefix
"""


ORACLE_TEXT_BOILERPLATE = _oracle_boilerplate()


BPE_ROUNDS = 6


def q_text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training: the 6 most frequent
    symbol-pair merges learned over the corpus vocabulary (Sennrich 2016)
    — the canonical subword-vocabulary construction. The corpus collapses
    once to the (word, count) table; every round runs on that
    vocabulary-sized table with a 1-row argmax. Integer counts, total
    tie-break, and engine-identical replace semantics make the learned
    merge table hash-checkable; the oracle unrolls the same rounds as CTE
    layers."""
    from pyvectorsearch_spark.operators.textops import bpe_learn

    docs = spread(load_table(spark, sf_dir, "documents"))
    return bpe_learn(docs, rounds=BPE_ROUNDS).orderBy("merge_rank")


ORACLE_TEXT_BPE = f"""
WITH words AS MATERIALIZED (
  SELECT w, count(*)::BIGINT AS cnt FROM (
    SELECT unnest({_TOK}) AS w FROM documents
  ) GROUP BY w
),
w0 AS MATERIALIZED (
  SELECT cnt,
         ' ' || array_to_string(list_transform(range(1, length(w) + 1), i -> w[i]), ' ') || ' ' AS s
  FROM words
),
p1 AS MATERIALIZED (
  SELECT pair, sum(cnt)::BIGINT AS n FROM (
    SELECT cnt, unnest(list_transform(range(1, len(sy) - 0), i -> sy[i] || ' ' || sy[i + 1])) AS pair
    FROM (SELECT cnt, string_split(trim(s), ' ') AS sy FROM w0)
    WHERE len(sy) >= 2
  ) GROUP BY pair
),
b1 AS MATERIALIZED (SELECT pair, n FROM p1 ORDER BY n DESC, pair ASC LIMIT 1),
w1 AS MATERIALIZED (
  SELECT cnt, replace(s, ' ' || b1.pair || ' ', ' ' || replace(b1.pair, ' ', '') || ' ') AS s
  FROM w0, b1
),
p2 AS MATERIALIZED (
  SELECT pair, sum(cnt)::BIGINT AS n FROM (
    SELECT cnt, unnest(list_transform(range(1, len(sy) - 0), i -> sy[i] || ' ' || sy[i + 1])) AS pair
    FROM (SELECT cnt, string_split(trim(s), ' ') AS sy FROM w1)
    WHERE len(sy) >= 2
  ) GROUP BY pair
),
b2 AS MATERIALIZED (SELECT pair, n FROM p2 ORDER BY n DESC, pair ASC LIMIT 1),
w2 AS MATERIALIZED (
  SELECT cnt, replace(s, ' ' || b2.pair || ' ', ' ' || replace(b2.pair, ' ', '') || ' ') AS s
  FROM w1, b2
),
p3 AS MATERIALIZED (
  SELECT pair, sum(cnt)::BIGINT AS n FROM (
    SELECT cnt, unnest(list_transform(range(1, len(sy) - 0), i -> sy[i] || ' ' || sy[i + 1])) AS pair
    FROM (SELECT cnt, string_split(trim(s), ' ') AS sy FROM w2)
    WHERE len(sy) >= 2
  ) GROUP BY pair
),
b3 AS MATERIALIZED (SELECT pair, n FROM p3 ORDER BY n DESC, pair ASC LIMIT 1),
w3 AS MATERIALIZED (
  SELECT cnt, replace(s, ' ' || b3.pair || ' ', ' ' || replace(b3.pair, ' ', '') || ' ') AS s
  FROM w2, b3
),
p4 AS MATERIALIZED (
  SELECT pair, sum(cnt)::BIGINT AS n FROM (
    SELECT cnt, unnest(list_transform(range(1, len(sy) - 0), i -> sy[i] || ' ' || sy[i + 1])) AS pair
    FROM (SELECT cnt, string_split(trim(s), ' ') AS sy FROM w3)
    WHERE len(sy) >= 2
  ) GROUP BY pair
),
b4 AS MATERIALIZED (SELECT pair, n FROM p4 ORDER BY n DESC, pair ASC LIMIT 1),
w4 AS MATERIALIZED (
  SELECT cnt, replace(s, ' ' || b4.pair || ' ', ' ' || replace(b4.pair, ' ', '') || ' ') AS s
  FROM w3, b4
),
p5 AS MATERIALIZED (
  SELECT pair, sum(cnt)::BIGINT AS n FROM (
    SELECT cnt, unnest(list_transform(range(1, len(sy) - 0), i -> sy[i] || ' ' || sy[i + 1])) AS pair
    FROM (SELECT cnt, string_split(trim(s), ' ') AS sy FROM w4)
    WHERE len(sy) >= 2
  ) GROUP BY pair
),
b5 AS MATERIALIZED (SELECT pair, n FROM p5 ORDER BY n DESC, pair ASC LIMIT 1),
w5 AS MATERIALIZED (
  SELECT cnt, replace(s, ' ' || b5.pair || ' ', ' ' || replace(b5.pair, ' ', '') || ' ') AS s
  FROM w4, b5
),
p6 AS MATERIALIZED (
  SELECT pair, sum(cnt)::BIGINT AS n FROM (
    SELECT cnt, unnest(list_transform(range(1, len(sy) - 0), i -> sy[i] || ' ' || sy[i + 1])) AS pair
    FROM (SELECT cnt, string_split(trim(s), ' ') AS sy FROM w5)
    WHERE len(sy) >= 2
  ) GROUP BY pair
),
b6 AS MATERIALIZED (SELECT pair, n FROM p6 ORDER BY n DESC, pair ASC LIMIT 1),
w6 AS MATERIALIZED (
  SELECT cnt, replace(s, ' ' || b6.pair || ' ', ' ' || replace(b6.pair, ' ', '') || ' ') AS s
  FROM w5, b6
)
SELECT * FROM (SELECT 1 AS merge_rank, pair, replace(pair, ' ', '') AS merged, n AS n_occurrences FROM b1 UNION ALL SELECT 2 AS merge_rank, pair, replace(pair, ' ', '') AS merged, n AS n_occurrences FROM b2 UNION ALL SELECT 3 AS merge_rank, pair, replace(pair, ' ', '') AS merged, n AS n_occurrences FROM b3 UNION ALL SELECT 4 AS merge_rank, pair, replace(pair, ' ', '') AS merged, n AS n_occurrences FROM b4 UNION ALL SELECT 5 AS merge_rank, pair, replace(pair, ' ', '') AS merged, n AS n_occurrences FROM b5 UNION ALL SELECT 6 AS merge_rank, pair, replace(pair, ' ', '') AS merged, n AS n_occurrences FROM b6) ORDER BY merge_rank
"""


def q_text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING — the application half of `text_bpe_merges`: the
    learned merge rules (collected once, 6 literal constants)
    rewrite the vocabulary in rank order, and the corpus subword spectrum
    falls out as a frequency-weighted rollup of the encoded symbols — the
    top-15 subwords by corpus occurrences. Encoding happens on the
    VOCABULARY (one row per distinct word), never per document occurrence;
    document frequencies re-weight via the word counts."""
    from pyvectorsearch_spark.operators.textops import bpe_learn

    docs = spread(load_table(spark, sf_dir, "documents"))
    merges = [
        (r["pair"], r["merged"])
        for r in bpe_learn(docs, rounds=BPE_ROUNDS).orderBy("merge_rank").collect()
    ]
    words = (
        docs.select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    sym = F.concat(
        F.lit(" "),
        F.concat_ws(" ", F.filter(F.split("w", ""), lambda x: x != "")),
        F.lit(" "),
    )
    for pair, merged in merges:
        sym = F.replace(sym, F.lit(f" {pair} "), F.lit(f" {merged} "))
    enc = words.select(
        "cnt", F.explode(F.split(F.trim(sym), " ")).alias("subword")
    )
    freq = enc.groupBy("subword").agg(
        F.sum("cnt").cast("bigint").alias("n_occurrences")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("n_occurrences"), F.asc("subword"))
    return (
        freq.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 15)
        .select("rnk", "subword", "n_occurrences")
        .orderBy("rnk")
    )


ORACLE_TEXT_BPE_ENCODE = f"""
WITH words AS MATERIALIZED (
  SELECT w, count(*)::BIGINT AS cnt FROM (
    SELECT unnest({_TOK}) AS w FROM documents
  ) GROUP BY w
),
w0 AS MATERIALIZED (
  SELECT cnt,
         ' ' || array_to_string(list_transform(range(1, length(w) + 1), i -> w[i]), ' ') || ' ' AS s
  FROM words
),
p1 AS MATERIALIZED (
  SELECT pair, sum(cnt)::BIGINT AS n FROM (
    SELECT cnt, unnest(list_transform(range(1, len(sy) - 0), i -> sy[i] || ' ' || sy[i + 1])) AS pair
    FROM (SELECT cnt, string_split(trim(s), ' ') AS sy FROM w0)
    WHERE len(sy) >= 2
  ) GROUP BY pair
),
b1 AS MATERIALIZED (SELECT pair, n FROM p1 ORDER BY n DESC, pair ASC LIMIT 1),
w1 AS MATERIALIZED (
  SELECT cnt, replace(s, ' ' || b1.pair || ' ', ' ' || replace(b1.pair, ' ', '') || ' ') AS s
  FROM w0, b1
),
p2 AS MATERIALIZED (
  SELECT pair, sum(cnt)::BIGINT AS n FROM (
    SELECT cnt, unnest(list_transform(range(1, len(sy) - 0), i -> sy[i] || ' ' || sy[i + 1])) AS pair
    FROM (SELECT cnt, string_split(trim(s), ' ') AS sy FROM w1)
    WHERE len(sy) >= 2
  ) GROUP BY pair
),
b2 AS MATERIALIZED (SELECT pair, n FROM p2 ORDER BY n DESC, pair ASC LIMIT 1),
w2 AS MATERIALIZED (
  SELECT cnt, replace(s, ' ' || b2.pair || ' ', ' ' || replace(b2.pair, ' ', '') || ' ') AS s
  FROM w1, b2
),
p3 AS MATERIALIZED (
  SELECT pair, sum(cnt)::BIGINT AS n FROM (
    SELECT cnt, unnest(list_transform(range(1, len(sy) - 0), i -> sy[i] || ' ' || sy[i + 1])) AS pair
    FROM (SELECT cnt, string_split(trim(s), ' ') AS sy FROM w2)
    WHERE len(sy) >= 2
  ) GROUP BY pair
),
b3 AS MATERIALIZED (SELECT pair, n FROM p3 ORDER BY n DESC, pair ASC LIMIT 1),
w3 AS MATERIALIZED (
  SELECT cnt, replace(s, ' ' || b3.pair || ' ', ' ' || replace(b3.pair, ' ', '') || ' ') AS s
  FROM w2, b3
),
p4 AS MATERIALIZED (
  SELECT pair, sum(cnt)::BIGINT AS n FROM (
    SELECT cnt, unnest(list_transform(range(1, len(sy) - 0), i -> sy[i] || ' ' || sy[i + 1])) AS pair
    FROM (SELECT cnt, string_split(trim(s), ' ') AS sy FROM w3)
    WHERE len(sy) >= 2
  ) GROUP BY pair
),
b4 AS MATERIALIZED (SELECT pair, n FROM p4 ORDER BY n DESC, pair ASC LIMIT 1),
w4 AS MATERIALIZED (
  SELECT cnt, replace(s, ' ' || b4.pair || ' ', ' ' || replace(b4.pair, ' ', '') || ' ') AS s
  FROM w3, b4
),
p5 AS MATERIALIZED (
  SELECT pair, sum(cnt)::BIGINT AS n FROM (
    SELECT cnt, unnest(list_transform(range(1, len(sy) - 0), i -> sy[i] || ' ' || sy[i + 1])) AS pair
    FROM (SELECT cnt, string_split(trim(s), ' ') AS sy FROM w4)
    WHERE len(sy) >= 2
  ) GROUP BY pair
),
b5 AS MATERIALIZED (SELECT pair, n FROM p5 ORDER BY n DESC, pair ASC LIMIT 1),
w5 AS MATERIALIZED (
  SELECT cnt, replace(s, ' ' || b5.pair || ' ', ' ' || replace(b5.pair, ' ', '') || ' ') AS s
  FROM w4, b5
),
p6 AS MATERIALIZED (
  SELECT pair, sum(cnt)::BIGINT AS n FROM (
    SELECT cnt, unnest(list_transform(range(1, len(sy) - 0), i -> sy[i] || ' ' || sy[i + 1])) AS pair
    FROM (SELECT cnt, string_split(trim(s), ' ') AS sy FROM w5)
    WHERE len(sy) >= 2
  ) GROUP BY pair
),
b6 AS MATERIALIZED (SELECT pair, n FROM p6 ORDER BY n DESC, pair ASC LIMIT 1),
w6 AS MATERIALIZED (
  SELECT cnt, replace(s, ' ' || b6.pair || ' ', ' ' || replace(b6.pair, ' ', '') || ' ') AS s
  FROM w5, b6
),
enc AS (
  SELECT subword, sum(cnt)::BIGINT AS n_occurrences
  FROM (SELECT cnt, unnest(string_split(trim(s), ' ')) AS subword FROM w6)
  GROUP BY subword
),
r AS (
  SELECT subword, n_occurrences,
         row_number() OVER (ORDER BY n_occurrences DESC, subword ASC)::INT AS rnk
  FROM enc
)
SELECT rnk, subword, n_occurrences FROM r WHERE rnk <= 15 ORDER BY rnk
"""


PMI_MIN_DF = 20
PMI_MAX_DF = 400
PMI_MIN_PAIR = 30
PMI_TOP = 20


def q_text_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top document-level PMI term pairs (Church &
    Hanks 1990) — which words co-occur in documents far more than their
    marginals predict, the query-expansion / phrase-lexicon signal.
    Scale levers stated in the plan: terms prefilter to a df band
    (stopword-ish ubiquity and rare noise both drop — the pair fan-out is
    quadratic in per-doc DISTINCT band terms, so the band IS the cost
    bound), pairs below a support floor drop before any scoring, and PMI's
    ln-ladder is rounded for engine parity. Returns the top-20 by
    (pmi desc, pair asc)."""
    from pyspark.sql import Window

    docs = spread(load_table(spark, sf_dir, "documents"))
    dt = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("t")
    )
    df_tab = dt.groupBy("t").agg(F.count("*").cast("bigint").alias("df"))
    band = df_tab.filter(
        (F.col("df") >= PMI_MIN_DF) & (F.col("df") <= PMI_MAX_DF)
    )
    dtb = dt.join(band, "t")
    a = dtb.select("doc_id", F.col("t").alias("ta"), F.col("df").alias("dfa"))
    b = dtb.select("doc_id", F.col("t").alias("tb"), F.col("df").alias("dfb"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb", "dfa", "dfb")
        .agg(F.count("*").cast("bigint").alias("n_pair"))
        .filter(F.col("n_pair") >= PMI_MIN_PAIR)
    )
    nd = docs.agg(F.count("*").cast("bigint").alias("nd"))
    pmi = F.round(
        F.log(
            (F.col("n_pair") * F.col("nd")).cast("double")
            / (F.col("dfa") * F.col("dfb")).cast("double")
        ),
        6,
    )
    w = Window.orderBy(F.desc("pmi"), F.asc("ta"), F.asc("tb"))
    return (
        pairs.crossJoin(F.broadcast(nd))
        .withColumn("pmi", pmi)
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= PMI_TOP)
        .select("rnk", "ta", "tb", "n_pair", "pmi")
        .orderBy("rnk")
    )


ORACLE_TEXT_PMI = f"""
WITH dt AS (
  SELECT DISTINCT doc_id, unnest({_TOK}) AS t FROM documents
),
dfs AS (SELECT t, count(*)::BIGINT AS df FROM dt GROUP BY t),
band AS (SELECT t, df FROM dfs WHERE df BETWEEN {PMI_MIN_DF} AND {PMI_MAX_DF}),
dtb AS (SELECT dt.doc_id, dt.t, band.df FROM dt JOIN band USING (t)),
p AS (
  SELECT a.t AS ta, b.t AS tb, a.df AS dfa, b.df AS dfb, count(*)::BIGINT AS n_pair
  FROM dtb a JOIN dtb b ON a.doc_id = b.doc_id AND a.t < b.t
  GROUP BY 1, 2, 3, 4
  HAVING count(*) >= {PMI_MIN_PAIR}
),
nd AS (SELECT count(*)::BIGINT AS nd FROM documents),
sc AS (
  SELECT ta, tb, n_pair,
         round(ln(CAST(n_pair * nd.nd AS DOUBLE) / CAST(dfa * dfb AS DOUBLE)), 6) AS pmi
  FROM p, nd
),
r AS (
  SELECT ta, tb, n_pair, pmi,
         row_number() OVER (ORDER BY pmi DESC, ta ASC, tb ASC)::INT AS rnk
  FROM sc
)
SELECT rnk, ta, tb, n_pair, pmi FROM r WHERE rnk <= {PMI_TOP} ORDER BY rnk
"""



def q_text_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): per source,
    split documents into head/middle/tail thirds by the corpus-trained
    bigram-LM score (best scores first; ntile ties follow the engine-exact
    (score, doc_id) order), reporting per-bucket counts, score band, and the
    member-id XOR. Head buckets feed training mixtures at full weight,
    tails get downsampled — the standard quality-mixture lever.

    Scale note: ntile ranks per source (one ordered partition per source,
    the bounded-cardinality caveat documented on ``hist_quantiles``); at
    petabyte scale swap the rank for a histogram cut over the same scores.
    """
    from pyspark.sql import Window

    docs = spread(load_table(spark, sf_dir, "documents"))
    lm = bigram_lm_score(docs, smooth=LM_SMOOTH)
    src = docs.select("doc_id", "source")
    joined = lm.join(src, "doc_id")
    w = Window.partitionBy("source").orderBy(
        F.desc("avg_logprob"), F.asc("doc_id")
    )
    tiled = joined.withColumn("bucket", F.ntile(3).over(w))
    return (
        tiled.groupBy("source", "bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.max("avg_logprob").alias("best_logprob"),
            F.min("avg_logprob").alias("worst_logprob"),
            F.expr(
                "bit_xor(CAST(conv(substring(md5(CAST(doc_id AS STRING)),"
                " 1, 13), 16, 10) AS BIGINT))"
            ).cast("bigint").alias("members_xor"),
        )
        .orderBy("source", "bucket")
    )


ORACLE_CCNET_BUCKETS = f"""
WITH {_BIGRAM_LM_CTES},
lm AS (
  SELECT doc_id, sum(tf)::BIGINT AS n_bigrams,
         round(round(sum(c), 6) / sum(tf), 6) AS avg_logprob
  FROM sc GROUP BY doc_id
),
tiled AS (
  SELECT d.source, lm.doc_id, lm.avg_logprob,
         ntile(3) OVER (PARTITION BY d.source
                        ORDER BY lm.avg_logprob DESC, lm.doc_id ASC) AS bucket
  FROM lm JOIN documents d USING (doc_id)
)
SELECT source, bucket, count(*)::BIGINT AS n_docs,
       max(avg_logprob) AS best_logprob,
       min(avg_logprob) AS worst_logprob,
       bit_xor(('0x' || substr(md5(doc_id::VARCHAR), 1, 13))::BIGINT)::BIGINT
         AS members_xor
FROM tiled GROUP BY source, bucket ORDER BY source, bucket
"""


def q_text_nb_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive-Bayes language classification confusion matrix: the model
    trains on the corpus's own lang labels (add-1 smoothing) and classifies
    every document back; (true, predicted, count) cells are hash-checked
    because the whole train+apply pipeline is engine-exact rounded
    arithmetic (a trained ML model as an oracle-checkable query)."""
    from pyvectorsearch_spark.operators.textops import nb_classify

    docs = spread(load_table(spark, sf_dir, "documents"))
    pred = nb_classify(docs)
    return (
        pred.groupBy("true_label", "pred_label")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy("true_label", "pred_label")
    )


ORACLE_TEXT_NB_CONFUSION = f"""
WITH base AS (SELECT doc_id, lang, {_TOK} AS t FROM documents),
tf AS (
  SELECT doc_id, lang, w, count(*)::BIGINT AS tf FROM (
    SELECT doc_id, lang, unnest(t) AS w FROM base
  ) GROUP BY doc_id, lang, w
),
nwl AS (SELECT w, lang AS ml, sum(tf)::BIGINT AS nwl FROM tf GROUP BY w, ml),
ct AS (SELECT lang AS ml, sum(tf)::BIGINT AS ct FROM tf GROUP BY ml),
vocab AS (SELECT DISTINCT w FROM tf),
v AS (SELECT count(*)::BIGINT AS v FROM vocab),
grid AS (
  SELECT vocab.w, ct.ml,
         round(ln((coalesce(nwl.nwl, 0) + 1)
                  / CAST(ct.ct + v.v AS DOUBLE)), 6) AS lnp
  FROM vocab CROSS JOIN ct
  LEFT JOIN nwl ON nwl.w = vocab.w AND nwl.ml = ct.ml
  CROSS JOIN v
),
nd AS (SELECT lang AS ml, count(*)::BIGINT AS nd FROM base GROUP BY ml),
tot AS (SELECT count(*)::BIGINT AS n FROM base),
prior AS (
  SELECT ml, round(ln(nd / CAST(n AS DOUBLE)), 6) AS lnprior
  FROM nd CROSS JOIN tot
),
sc AS (
  SELECT tf.doc_id, tf.lang AS tl, grid.ml,
         round(round(sum(tf.tf * grid.lnp), 6) + any_value(prior.lnprior), 6)
           AS score
  FROM tf JOIN grid ON tf.w = grid.w
  JOIN prior ON prior.ml = grid.ml
  GROUP BY tf.doc_id, tf.lang, grid.ml
),
best AS (
  SELECT doc_id, tl, ml,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, ml ASC) AS r
  FROM sc
)
SELECT tl AS true_label, ml AS pred_label, count(*)::BIGINT AS n
FROM best WHERE r = 1
GROUP BY tl, ml ORDER BY true_label, pred_label
"""

QUERIES = {
    "text_pmi_pairs": q_text_pmi_pairs,
    "text_bpe_encode": q_text_bpe_encode,
    "text_bpe_merges": q_text_bpe_merges,
    "text_boilerplate": q_text_boilerplate,
    "text_top_terms": q_text_top_terms,
    "text_bigram_lm": q_text_bigram_lm,
    "text_ccnet_buckets": q_text_ccnet_buckets,
    "text_nb_confusion": q_text_nb_confusion,
    "text_c4_clean": q_text_c4_clean,
    "text_zipf": q_text_zipf,
}
ORACLES = {
    "text_pmi_pairs": ORACLE_TEXT_PMI,
    "text_bpe_encode": ORACLE_TEXT_BPE_ENCODE,
    "text_bpe_merges": ORACLE_TEXT_BPE,
    "text_boilerplate": ORACLE_TEXT_BOILERPLATE,
    "text_top_terms": ORACLE_TOP_TERMS,
    "text_bigram_lm": ORACLE_BIGRAM_LM,
    "text_ccnet_buckets": ORACLE_CCNET_BUCKETS,
    "text_nb_confusion": ORACLE_TEXT_NB_CONFUSION,
    "text_c4_clean": ORACLE_C4_CLEAN,
    "text_zipf": ORACLE_TEXT_ZIPF,
}


# --- Heaps'-law vocabulary growth fit ----------------------------------------


def q_text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit of vocabulary growth: V(N) ≈ K·N^β from a log–log OLS
    over the per-document cumulative (tokens seen, distinct terms seen)
    curve in doc_id order. β tells a pipeline how fast NEW vocabulary
    keeps arriving as the corpus grows — the capacity-planning twin of
    `text_zipf` (Zipf fits the frequency ladder at a fixed size; Heaps
    extrapolates the vocabulary AT 100× the size) and the curve behind
    `vocab_novelty`'s single delta point.

    Determinism ladder: each term's first document is an integer min;
    per-doc token counts and cumulative sums are bigints; ln(N)/ln(V)
    round to 6 dp and fix to integer micro-units; the OLS moments multiply
    as DECIMAL(38,0) (DuckDB HUGEINT — the Spearman overflow lesson:
    micro-unit squares pass 2^63 at ~10⁴ points), so slope and intercept
    are engine-exact.

    Scale: one explode → (term, first-doc) min rollup; everything after is
    docs-sized (the cumulative window orders per-DOC cells, never tokens).
    At 100 TB the doc_id order key would be ingest time — same plan."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("_t")
    )
    ntok = docs.select("doc_id", F.size("_t").cast("bigint").alias("_k"))
    first = (
        docs.select("doc_id", F.explode(F.array_distinct("_t")).alias("term"))
        .groupBy("term")
        .agg(F.min("doc_id").alias("_fd"))
    )
    new = first.groupBy(F.col("_fd").alias("doc_id")).agg(
        F.count("*").cast("bigint").alias("_v")
    )
    cells = ntok.join(new, "doc_id", "left").withColumn(
        "_v", F.coalesce("_v", F.lit(0)).cast("bigint")
    )
    w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pts = (
        cells.withColumn("_N", F.sum("_k").over(w).cast("bigint"))
        .withColumn("_V", F.sum("_v").over(w).cast("bigint"))
        .filter((F.col("_N") > 0) & (F.col("_V") > 0))
        .select(
            F.round(F.log(F.col("_N").cast("double")) * 1000000)
            .cast("bigint")
            .alias("_xu"),
            F.round(F.log(F.col("_V").cast("double")) * 1000000)
            .cast("bigint")
            .alias("_yu"),
        )
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = pts.agg(
        F.count("*").cast("bigint").alias("n_points"),
        F.sum("_xu").cast("bigint").alias("_sx"),
        F.sum("_yu").cast("bigint").alias("_sy"),
        F.sum(d(F.col("_xu")) * d(F.col("_yu"))).alias("_sxy"),
        F.sum(d(F.col("_xu")) * d(F.col("_xu"))).alias("_sxx"),
    )
    num = d(m["n_points"]) * m["_sxy"] - d(m["_sx"]) * d(m["_sy"])
    den = d(m["n_points"]) * m["_sxx"] - d(m["_sx"]) * d(m["_sx"])
    beta = F.when(
        den != 0, F.round(num.cast("double") / den.cast("double"), 6)
    ).otherwise(F.lit(0.0))
    return (
        m.withColumn("beta_r", beta)
        .withColumn(
            "ln_k_r",
            F.round(
                (F.col("_sy") - F.col("beta_r") * F.col("_sx"))
                / (F.col("n_points") * F.lit(1000000.0)),
                6,
            ),
        )
        .select("n_points", "beta_r", "ln_k_r")
    )


_HEAPS_TOK = duckdb_tokens("text")

ORACLE_TEXT_HEAPS = f"""
WITH toks AS (SELECT doc_id, {_HEAPS_TOK} AS t FROM documents),
ntok AS (SELECT doc_id, len(t)::BIGINT AS k FROM toks),
first AS (
  SELECT term, min(doc_id) AS fd
  FROM (SELECT doc_id, unnest(list_distinct(t)) AS term FROM toks)
  GROUP BY term
),
nw AS (SELECT fd AS doc_id, count(*)::BIGINT AS v FROM first GROUP BY fd),
cells AS (
  SELECT ntok.doc_id, ntok.k, coalesce(nw.v, 0)::BIGINT AS v
  FROM ntok LEFT JOIN nw ON ntok.doc_id = nw.doc_id
),
cum AS (
  SELECT sum(k) OVER (ORDER BY doc_id)::BIGINT AS N,
         sum(v) OVER (ORDER BY doc_id)::BIGINT AS V
  FROM cells
),
pts AS (
  SELECT CAST(round(ln(N::DOUBLE) * 1000000) AS BIGINT) AS xu,
         CAST(round(ln(V::DOUBLE) * 1000000) AS BIGINT) AS yu
  FROM cum WHERE N > 0 AND V > 0
),
m AS (
  SELECT count(*)::BIGINT AS n_points,
         sum(xu)::BIGINT AS sx, sum(yu)::BIGINT AS sy,
         sum(xu::HUGEINT * yu::HUGEINT) AS sxy,
         sum(xu::HUGEINT * xu::HUGEINT) AS sxx
  FROM pts
),
b AS (
  SELECT n_points, sx, sy,
         CASE WHEN n_points::HUGEINT * sxx - sx::HUGEINT * sx::HUGEINT <> 0
              THEN round(CAST(n_points::HUGEINT * sxy
                              - sx::HUGEINT * sy::HUGEINT AS DOUBLE)
                         / CAST(n_points::HUGEINT * sxx
                                - sx::HUGEINT * sx::HUGEINT AS DOUBLE), 6)
              ELSE 0.0 END AS beta_r
  FROM m
)
SELECT n_points, beta_r,
       round((sy - beta_r * sx) / (n_points * 1000000.0), 6) AS ln_k_r
FROM b
"""

QUERIES.update({"text_heaps_law": q_text_heaps_law})
ORACLES.update({"text_heaps_law": ORACLE_TEXT_HEAPS})


# --- Dunning log-likelihood keyness -------------------------------------------

LLR_TOP_K = 3
LLR_MIN_COUNT = 5


def q_text_loglikelihood_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive terms per source by Dunning's log-likelihood ratio
    (G², 1993): for each (source, term), contrast the term's in-source
    rate against the rest of the corpus via G² = 2·Σ obs·ln(obs/exp) over
    the 2×2 contingency — the statistically-grounded keyness measure
    beside `text_ctfidf`'s heuristic (G² knows a 10× rate bump on 3
    occurrences is noise; tf-idf doesn't). Top-3 per source, min count 5.

    Determinism: all four cells and margins are bigints; each obs·ln(obs/
    exp) term rounds to 6 dp and micro-fixes; ranking orders by the exact
    micro integer with a term tie-break.

    Scale: one (source, term) rollup + a terms-sized margin rollup —
    corpus touched once; the 2×2 algebra runs on cells."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    st = docs.select("source", F.explode(tokens(F.col("text"))).alias("t"))
    cell = st.groupBy("source", "t").agg(
        F.count("*").cast("bigint").alias("a")
    )
    tm = cell.groupBy("t").agg(F.sum("a").cast("bigint").alias("_tt"))
    sm = cell.groupBy("source").agg(F.sum("a").cast("bigint").alias("_ts"))
    n = cell.agg(F.sum("a").cast("bigint").alias("_n"))
    j = (
        cell.join(tm, "t")
        .join(sm, "source")
        .crossJoin(F.broadcast(n))
        .filter(F.col("a") >= LLR_MIN_COUNT)
    )
    # 2x2: a = in-source count, b = elsewhere count, c = other terms in
    # source, d = other terms elsewhere
    b = F.col("_tt") - F.col("a")
    c = F.col("_ts") - F.col("a")
    d = F.col("_n") - F.col("_tt") - F.col("_ts") + F.col("a")

    def term(obs, row_m, col_m):
        e = row_m.cast("double") * col_m.cast("double") / F.col("_n")
        return F.when(
            obs > 0, F.round(obs.cast("double") * F.log(obs / e), 6)
        ).otherwise(F.lit(0.0))

    g2 = 2.0 * (
        term(F.col("a"), F.col("_ts"), F.col("_tt"))
        + term(b, F.col("_n") - F.col("_ts"), F.col("_tt"))
        + term(c, F.col("_ts"), F.col("_n") - F.col("_tt"))
        + term(d, F.col("_n") - F.col("_ts"), F.col("_n") - F.col("_tt"))
    )
    scored = j.select(
        "source",
        "t",
        "a",
        F.round(g2 * 1000000).cast("bigint").alias("_gu"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("_gu"), F.asc("t"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= LLR_TOP_K)
        .select(
            "source",
            F.col("_rk").cast("int").alias("rank"),
            F.col("t").alias("term"),
            F.col("a").alias("n_in_source"),
            F.round(F.col("_gu") / 1000000.0, 4).alias("g2_r"),
        )
        .orderBy("source", "rank")
    )


ORACLE_TEXT_LLR = f"""
WITH st AS (SELECT source, unnest({_TOK}) AS t FROM documents),
cell AS (SELECT source, t, count(*)::BIGINT AS a FROM st GROUP BY source, t),
tm AS (SELECT t, sum(a)::BIGINT AS tt FROM cell GROUP BY t),
sm AS (SELECT source, sum(a)::BIGINT AS ts FROM cell GROUP BY source),
n AS (SELECT sum(a)::BIGINT AS n FROM cell),
j AS (
  SELECT cell.source, cell.t, cell.a, tm.tt, sm.ts, n.n
  FROM cell JOIN tm ON cell.t = tm.t JOIN sm ON cell.source = sm.source
  CROSS JOIN n
  WHERE cell.a >= {LLR_MIN_COUNT}
),
g AS (
  SELECT source, t, a,
    CAST(round(2.0 * (
      (CASE WHEN a > 0 THEN round(a * ln(a / (ts * CAST(tt AS DOUBLE) / n)), 6) ELSE 0.0 END)
    + (CASE WHEN tt - a > 0 THEN round((tt - a) * ln((tt - a) / ((n - ts) * CAST(tt AS DOUBLE) / n)), 6) ELSE 0.0 END)
    + (CASE WHEN ts - a > 0 THEN round((ts - a) * ln((ts - a) / (ts * CAST(n - tt AS DOUBLE) / n)), 6) ELSE 0.0 END)
    + (CASE WHEN n - tt - ts + a > 0 THEN round((n - tt - ts + a) * ln((n - tt - ts + a) / ((n - ts) * CAST(n - tt AS DOUBLE) / n)), 6) ELSE 0.0 END)
    ) * 1000000) AS BIGINT) AS gu
  FROM j
),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY gu DESC, t ASC) AS rnk
  FROM g
)
SELECT source, rnk::INT AS rank, t AS term, a AS n_in_source,
       round(gu / 1000000.0, 4) AS g2_r
FROM rk WHERE rnk <= {LLR_TOP_K} ORDER BY source, rank
"""

QUERIES.update({"text_loglikelihood_terms": q_text_loglikelihood_terms})
ORACLES.update({"text_loglikelihood_terms": ORACLE_TEXT_LLR})


# --- Yule's K lexical richness ---------------------------------------------------


def q_text_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's K lexical-richness characteristic per source: K = 10⁴·(Σf² −
    N)/N² over term frequencies, plus vocabulary size and the hapax-
    legomenon share — K is length-invariant where a raw type/token ratio
    is not, so sources of different sizes compare honestly (repetitive
    template text scores high K; rich prose low). Completes the lexical
    profile beside Zipf (shape), Heaps (growth), and entropy (rate).

    Determinism: N, V, Σf², and hapax counts are exact bigints; two final
    rounded divisions.

    Scale: one (source, term) frequency rollup, then a sources-sized
    moment rollup — map-side combined, corpus touched once."""
    docs = load_table(spark, sf_dir, "documents")
    st = docs.select("source", F.explode(tokens(F.col("text"))).alias("t"))
    f = st.groupBy("source", "t").agg(F.count("*").cast("bigint").alias("_f"))
    return (
        f.groupBy("source")
        .agg(
            F.sum("_f").cast("bigint").alias("n_tokens"),
            F.count("*").cast("bigint").alias("vocabulary"),
            F.sum(F.col("_f") * F.col("_f")).cast("bigint").alias("_sf2"),
            F.sum(F.when(F.col("_f") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_hapax"),
        )
        .select(
            "source",
            "n_tokens",
            "vocabulary",
            "n_hapax",
            F.round(
                F.lit(10000.0)
                * (F.col("_sf2") - F.col("n_tokens"))
                / (F.col("n_tokens") * F.col("n_tokens")).cast("double"),
                4,
            ).alias("yule_k_r"),
            F.round(
                F.col("n_hapax") / F.col("vocabulary").cast("double"), 6
            ).alias("hapax_ratio_r"),
        )
        .orderBy("source")
    )


ORACLE_TEXT_YULE_K = f"""
WITH st AS (SELECT source, unnest({_TOK}) AS t FROM documents),
f AS (SELECT source, t, count(*)::BIGINT AS f FROM st GROUP BY source, t)
SELECT source, sum(f)::BIGINT AS n_tokens, count(*)::BIGINT AS vocabulary,
       sum(CASE WHEN f = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax,
       round(10000.0 * (sum(f * f) - sum(f))
             / CAST(sum(f) * sum(f) AS DOUBLE), 4) AS yule_k_r,
       round(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS hapax_ratio_r
FROM f GROUP BY source ORDER BY source
"""

QUERIES.update({"text_yule_k": q_text_yule_k})
ORACLES.update({"text_yule_k": ORACLE_TEXT_YULE_K})


# --- char-n-gram Naive Bayes language ID (round 5) ---------------------------


def q_text_lang_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-TRIGRAM Naive Bayes language ID (Cavnar & Trenkle 1994), the
    upgrade over the stopword-ratio `language_id` baseline (VERDICT r4
    item 6): train on the corpus's own lang labels with add-1 smoothing,
    classify every document back, and report the confusion matrix — all in
    engine-exact rounded arithmetic, so a trained classifier is a
    hash-checked query. On this fixture it scores ~58% accuracy vs the
    stopword baseline's ~40% (`tests/test_round5_textops.py` pins the
    beat): sub-word orthography separates labels that whole-word stopword
    hits cannot.

    Scale shape: identical to `text_nb_confusion` — one (doc, gram, tf)
    reduction, a (vocab x labels) model table joined on gram, one
    (doc, label) rollup, a labels-sized argmax window; chargram vocab is
    SMALLER than word vocab (<= 37^3), so the model table is broadcastable
    at any corpus size."""
    from pyvectorsearch_spark.functions.text import chargrams
    from pyvectorsearch_spark.operators.textops import nb_classify

    docs = spread(load_table(spark, sf_dir, "documents"))
    pred = nb_classify(docs, features=lambda c: chargrams(c, 3))
    return (
        pred.groupBy("true_label", "pred_label")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy("true_label", "pred_label")
    )


from pyvectorsearch_spark.functions.text import duckdb_chargrams as _dd_cg  # noqa: E402

_CG = _dd_cg("text", 3)

_LANG_NB_CTES = f"""base AS (SELECT doc_id, lang, {_CG} AS t FROM documents),
tf AS (
  SELECT doc_id, lang, w, count(*)::BIGINT AS tf FROM (
    SELECT doc_id, lang, unnest(t) AS w FROM base
  ) GROUP BY doc_id, lang, w
),
nwl AS (SELECT w, lang AS ml, sum(tf)::BIGINT AS nwl FROM tf GROUP BY w, ml),
ct AS (SELECT lang AS ml, sum(tf)::BIGINT AS ct FROM tf GROUP BY ml),
vocab AS (SELECT DISTINCT w FROM tf),
v AS (SELECT count(*)::BIGINT AS v FROM vocab),
grid AS (
  SELECT vocab.w, ct.ml,
         round(ln((coalesce(nwl.nwl, 0) + 1)
                  / CAST(ct.ct + v.v AS DOUBLE)), 6) AS lnp
  FROM vocab CROSS JOIN ct
  LEFT JOIN nwl ON nwl.w = vocab.w AND nwl.ml = ct.ml
  CROSS JOIN v
),
nd AS (SELECT lang AS ml, count(*)::BIGINT AS nd FROM base GROUP BY ml),
tot AS (SELECT count(*)::BIGINT AS n FROM base),
prior AS (
  SELECT ml, round(ln(nd / CAST(n AS DOUBLE)), 6) AS lnprior
  FROM nd CROSS JOIN tot
),
sc AS (
  SELECT tf.doc_id, tf.lang AS tl, grid.ml,
         round(round(sum(tf.tf * grid.lnp), 6) + any_value(prior.lnprior), 6)
           AS score
  FROM tf JOIN grid ON tf.w = grid.w
  JOIN prior ON prior.ml = grid.ml
  GROUP BY tf.doc_id, tf.lang, grid.ml
),
best AS (
  SELECT doc_id, tl, ml,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, ml ASC) AS r
  FROM sc
)
"""

ORACLE_TEXT_LANG_NB = f"""
WITH {_LANG_NB_CTES}
SELECT tl AS true_label, ml AS pred_label, count(*)::BIGINT AS n
FROM best WHERE r = 1
GROUP BY tl, ml ORDER BY true_label, pred_label
"""

QUERIES.update({"text_lang_nb": q_text_lang_nb})
ORACLES.update({"text_lang_nb": ORACLE_TEXT_LANG_NB})


def q_text_lang_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-to-head language-ID evaluation, hash-checked: accuracy of the
    char-trigram Naive Bayes classifier vs the stopword-ratio baseline on
    the corpus's own labels — one row per method. Every step of BOTH
    predictors is engine-exact (the `text_lang_nb` / `text_lang_confusion`
    machinery), so even the model-evaluation numbers are oracle-checkable.
    On the fixture: NB ~0.576, stopword ~0.396 — the measured upgrade of
    VERDICT r4 item 6, as a registered query rather than a test claim."""
    from pyvectorsearch_spark.functions.text import chargrams
    from pyvectorsearch_spark.operators.textops import language_id, nb_classify

    docs = spread(load_table(spark, sf_dir, "documents"))
    nb = nb_classify(docs, features=lambda c: chargrams(c, 3)).select(
        F.lit("nb_chargram").alias("method"),
        (F.col("pred_label") == F.col("true_label")).cast("int").alias("_ok"),
    )
    sw = (
        language_id(docs)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select(
            F.lit("stopword").alias("method"),
            (F.col("pred_lang") == F.col("lang")).cast("int").alias("_ok"),
        )
    )
    return (
        nb.unionByName(sw)
        .groupBy("method")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("_ok").cast("bigint").alias("n_correct"),
            F.round(F.avg("_ok"), 6).alias("accuracy"),
        )
        .orderBy("method")
    )


def _lang_accuracy_oracle() -> str:
    from pyvectorsearch_spark.queries.text import LANGS, STOPWORDS, _sql_list

    scores = ", ".join(
        f"CAST(len(list_filter(t, x -> list_contains({_sql_list(STOPWORDS[lang])}, x))) AS DOUBLE)"
        f" / greatest(len(t), 1) AS s_{lang}"
        for lang in LANGS
    )
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in LANGS) + ")"
    chain = " ".join(f"WHEN s_{lang} = best THEN '{lang}'" for lang in LANGS)
    return f"""
WITH {_LANG_NB_CTES},
nb_ok AS (
  SELECT 'nb_chargram' AS method, (ml = tl)::INT AS ok
  FROM best WHERE r = 1
),
sw_toks AS (SELECT doc_id, lang, {duckdb_tokens('text')} AS t FROM documents),
sw_scored AS (SELECT doc_id, lang, {scores} FROM sw_toks),
sw_pred AS (
  SELECT lang, CASE WHEN {best} <= 0.0 THEN 'und' {chain} END AS pred
  FROM (SELECT doc_id, lang, {best} AS best, s_de, s_en, s_es, s_fr FROM sw_scored)
),
sw_ok AS (SELECT 'stopword' AS method, (pred = lang)::INT AS ok FROM sw_pred),
u AS (SELECT * FROM nb_ok UNION ALL SELECT * FROM sw_ok)
SELECT method, count(*)::BIGINT AS n_docs, sum(ok)::BIGINT AS n_correct,
       round(avg(ok), 6) AS accuracy
FROM u GROUP BY method ORDER BY method
"""


ORACLE_TEXT_LANG_ACCURACY = _lang_accuracy_oracle()

QUERIES.update({"text_lang_accuracy": q_text_lang_accuracy})
ORACLES.update({"text_lang_accuracy": ORACLE_TEXT_LANG_ACCURACY})
