"""Text-analysis operators for training-data pipelines (north-star extensions;
the reference has no text processing — SURVEY.md §2.4 'string fns: absent').

All operators are pure columnar expressions (no UDFs): language-ID via
stopword-hit ratios, quality scoring from surface statistics, token counting
(whitespace + a BPE-ish regex), and fingerprinting via min-hashed character
8-grams. Each has an exact DuckDB oracle (same regexes, same md5 hashing).

At 100 TB these are embarrassingly parallel single-pass projections — no
shuffle at all; they pipeline inside the same stage as the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from pyvectorsearch_spark.functions.text import tokens

# Deterministic mini stopword lists (public common function words).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den"],
    "es": ["el", "la", "los", "y", "en", "que", "un", "se"],
    "fr": ["le", "les", "des", "et", "une", "est", "dans", "pour"],
}
LANGS = sorted(STOPWORDS)  # de, en, es, fr — CASE chains use this order
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"  # over normalized lowercase text


def _stop_hits(tok: Column, lang: str) -> Column:
    arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tok, lambda t: F.array_contains(arr, t)))


def language_id(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-ratio language ID. Scores = hits/n_tokens per language;
    prediction = first language (in sorted order) achieving the max score,
    'und' (undetermined) when no stopword hits at all. Deterministic CASE
    chain — identical tie-breaking in the oracle."""
    t = df.select(F.col(id_col), tokens(text_col).alias("t"))
    n = F.greatest(F.size("t"), F.lit(1))
    scored = t.select(
        id_col,
        F.size("t").alias("n_tokens"),
        *[(_stop_hits(F.col("t"), lang) / n).alias(f"s_{lang}") for lang in LANGS],
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in LANGS])
    pred = F.when(best <= 0.0, F.lit("und"))
    for lang in LANGS:
        pred = pred.when(F.col(f"s_{lang}") == best, F.lit(lang))
    return scored.select(
        id_col,
        "n_tokens",
        pred.alias("pred_lang"),
        F.round(best, 6).alias("score"),
    )


def quality_score_col(raw: Column, tok: Column) -> Column:
    """The bounded quality composite as a bare Column (rounded to 6 dp, the
    precision every oracle pins) — usable as a zero-shuffle projection on
    any table without joining ``text_quality``'s output back."""
    n_tok = F.size(tok)
    stop_all = F.array(*[F.lit(w) for ws in STOPWORDS.values() for w in ws])
    stop_ratio = F.size(
        F.filter(tok, lambda x: F.array_contains(stop_all, x))
    ).cast("double") / F.greatest(n_tok, F.lit(1))
    n_chars = F.length(raw)
    nonalnum = n_chars - F.length(F.regexp_replace(F.lower(raw), "[^a-z0-9 ]", ""))
    nonalnum_ratio = nonalnum.cast("double") / F.greatest(n_chars, F.lit(1))
    return F.round(
        F.least(n_tok.cast("double") / 50.0, F.lit(1.0)) * 0.4
        + (1.0 - nonalnum_ratio) * 0.3
        + F.least(stop_ratio * 4.0, F.lit(1.0)) * 0.3,
        6,
    )


def text_quality(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Surface-statistics quality score: token count, mean token length,
    stopword ratio, non-alphanumeric ratio, and a bounded composite."""
    t = df.select(F.col(id_col), F.col(text_col).alias("raw"), tokens(text_col).alias("t"))
    n_tok = F.size("t")
    n_chars = F.length("raw")
    sum_tok_len = F.aggregate(
        F.transform("t", lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    avg_tok_len = sum_tok_len.cast("double") / F.greatest(n_tok, F.lit(1))
    stop_all = F.array(*[F.lit(w) for ws in STOPWORDS.values() for w in ws])
    stop_ratio = (
        F.size(F.filter("t", lambda x: F.array_contains(stop_all, x))).cast("double")
        / F.greatest(n_tok, F.lit(1))
    )
    nonalnum = n_chars - F.length(F.regexp_replace(F.lower("raw"), "[^a-z0-9 ]", ""))
    nonalnum_ratio = nonalnum.cast("double") / F.greatest(n_chars, F.lit(1))
    return t.select(
        id_col,
        n_tok.alias("n_tokens"),
        n_chars.alias("n_chars"),
        F.round(avg_tok_len, 6).alias("avg_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(nonalnum_ratio, 6).alias("nonalnum_ratio"),
        # bounded composite: long-enough docs with low punctuation and
        # moderate stopword density score high (shared with pipeline uses)
        quality_score_col(F.col("raw"), F.col("t")).alias("quality_score"),
    )


def token_counts(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    (letter runs / digit runs / single symbols over normalized text)."""
    norm = F.concat_ws(" ", tokens(text_col))
    return df.select(
        F.col(id_col),
        F.size(tokens(text_col)).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.lower(text_col), F.lit(BPE_RE), 0)).alias(
            "n_bpe_tokens"
        ),
        F.length(norm).alias("n_norm_chars"),
    )


def doc_fingerprint(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text", gram: int = 8
) -> DataFrame:
    """Rolling-hash document fingerprint: md5 over each character 8-gram of
    the normalized text, keep the minimum digest (winnowing with one band).
    Equal fingerprints ⇒ near-identical normalized content prefix sets."""
    norm = F.concat_ws(" ", tokens(text_col))
    d = df.select(F.col(id_col), norm.alias("nt"))
    grams = F.expr(
        f"transform(sequence(1, greatest(length(nt) - {gram - 1}, 1)), "
        f"i -> md5(substr(nt, i, {gram})))"
    )
    return d.select(
        id_col,
        F.array_min(grams).alias("fingerprint"),
        F.length("nt").alias("n_norm_chars"),
    )


def repetition_stats(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """Within-document repetition signals (Gopher-style quality rules over
    word n-grams): total/distinct n-gram counts, the top n-gram's share, and
    the duplicate-gram fraction. Highly repetitive machine-generated text
    scores high on both fractions.

    Zero-shuffle: the n-gram multiset never leaves the row — duplicate
    counting is a single-pass run-length scan over the SORTED gram array via
    ``F.aggregate`` carrying (prev, current-run, max-run, distinct-runs)
    struct state. At 100 TB this pipelines inside the scan stage like every
    other textop; the oracle recomputes the same values relationally
    (unnest → GROUP BY) in DuckDB."""
    tok = tokens(text_col)
    joined = F.transform(
        F.sequence(F.lit(1), F.size(tok) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(tok, i + j) for j in range(n)]),
    )
    grams = F.when(F.size(tok) >= n, joined).otherwise(
        F.array().cast("array<string>")
    )
    g = F.array_sort(grams)
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("cur"),
        F.lit(0).alias("maxrun"),
        F.lit(0).alias("runs"),
    )

    def step(s, x):
        same = x == s["prev"]
        cur2 = F.when(same, s["cur"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            cur2.alias("cur"),
            F.greatest(s["maxrun"], cur2).alias("maxrun"),
            (s["runs"] + F.when(same, F.lit(0)).otherwise(F.lit(1))).alias("runs"),
        )

    scan = F.aggregate(g, init, step)
    total = F.size(g)
    d = df.select(
        F.col(id_col),
        F.size(tok).alias("n_tokens"),
        total.cast("bigint").alias("n_grams"),
        scan["runs"].cast("bigint").alias("n_distinct"),
        scan["maxrun"].cast("bigint").alias("top_count"),
    )
    safe = F.greatest(F.col("n_grams"), F.lit(1)).cast("double")
    return d.select(
        id_col,
        "n_tokens",
        "n_grams",
        "n_distinct",
        "top_count",
        F.round(F.col("top_count") / safe, 6).alias("top_gram_frac"),
        F.round(
            (F.col("n_grams") - F.col("n_distinct")) / safe, 6
        ).alias("dup_gram_frac"),
    )


def chunk_text(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 256,
    stride: int = 192,
) -> DataFrame:
    """Overlapping character-window chunking of the normalized text — the
    standard embedding/RAG prep step (size-char windows every stride chars;
    stride < size ⇒ overlap, last window may be shorter; an empty doc yields
    one empty chunk so no document silently disappears).

    Zero shuffle: start offsets are a per-row ``sequence`` exploded in the
    scan stage; at 100 TB this pipelines like every other textop and the
    output is ~len/stride rows per doc. Returns
    (id, chunk_idx, chunk_start, chunk_text, n_chunk_chars)."""
    if stride < 1 or size < 1:
        raise ValueError(f"size and stride must be >= 1, got {size=} {stride=}")
    norm = F.concat_ws(" ", tokens(text_col))
    d = df.select(F.col(id_col), norm.alias("_nt"))
    starts = F.sequence(
        F.lit(1), F.greatest(F.length("_nt"), F.lit(1)), F.lit(stride)
    )
    return (
        d.select(
            F.col(id_col),
            "_nt",
            F.posexplode(starts).alias("chunk_idx", "chunk_start"),
        )
        .withColumn("chunk_text", F.expr(f"substr(_nt, chunk_start, {size})"))
        .select(
            id_col,
            "chunk_idx",
            "chunk_start",
            "chunk_text",
            F.length("chunk_text").alias("n_chunk_chars"),
        )
    )


def bm25_rank(
    docs: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 20,
) -> DataFrame:
    """BM25 document ranking (Robertson–Spärck Jones; the Lucene
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` idf variant) for a fixed term set.

    Scale shape: the exploded token stream is filtered to the query terms
    BEFORE any shuffle, so only matched postings move — the corpus never
    shuffles whole documents. Document frequency rides a window over the tf
    table (single evaluation of the postings pipeline, no join-back); the
    (N, avgdl) corpus stats are a scalar aggregate attached by broadcast.
    Per-term contributions are rounded to 6 dp before the per-doc sum so the
    sum is order-independent (each addend is within 1 ulp of a multiple of
    1e-6), making the oracle comparison exact.

    Returns the top-``topk`` (id, bm25) rows, score-descending with id
    tiebreak.
    """
    tok = tokens(text_col)
    d = docs.select(F.col(id_col), tok.alias("_t")).select(
        id_col, F.size("_t").alias("_dl"), F.col("_t")
    )
    stats = d.agg(
        F.count("*").cast("double").alias("_n"), F.avg("_dl").alias("_avgdl")
    )
    qset = F.array(*[F.lit(t) for t in query_terms])
    posting = d.select(
        id_col, "_dl", F.explode(F.filter("_t", lambda x: F.array_contains(qset, x))).alias("_term")
    )
    tf = posting.groupBy(id_col, "_term", "_dl").agg(
        F.count("*").cast("double").alias("_tf")
    )
    # Per-term document frequency via a window over the tf table — attaches
    # df in the SAME evaluation of the postings pipeline (a groupBy + join
    # back would re-derive the whole scan+explode subtree a second time).
    from pyspark.sql import Window

    wdf = tf.withColumn(
        "_df", F.count("*").over(Window.partitionBy("_term")).cast("double")
    )
    idf = F.log(1.0 + (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5))
    contrib = idf * (
        F.col("_tf") * (k1 + 1.0)
        / (F.col("_tf") + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl")))
    )
    scored = (
        wdf.crossJoin(F.broadcast(stats))
        .select(id_col, F.round(contrib, 6).alias("_c"))
        .groupBy(id_col)
        .agg(F.round(F.sum("_c"), 6).alias("bm25"))
    )
    return scored.orderBy(F.desc("bm25"), id_col).limit(topk)


def vocab_encode(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 1 << 15,
) -> DataFrame:
    """Frequency-ranked vocabulary build + token-id encoding (the word-level
    analog of tokenizer-vocab construction for a training corpus): term id =
    rank by (count desc, term asc), ids 1..vocab_size, OOV -> 0.

    Scale shape: the term-count table is vocabulary-sized (millions of rows
    at 100 TB, not corpus-sized) — its global rank is a single-partition
    window over that small table only; the corpus-side encode is a broadcast
    left join on the exploded (id, pos, term) stream followed by one
    groupBy(id) to reassemble positional id arrays. Documents with zero
    tokens are excluded (explode of an empty array yields no rows — mirrored
    in the oracle).

    Returns (id, n_tokens, n_oov, ids_digest) where ids_digest is the md5 of
    the comma-joined id sequence in document order — pinning every token id,
    not just the counts.
    """
    from pyspark.sql import Window

    e = docs.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("_pos", "_term")
    )
    cnt = e.groupBy("_term").agg(F.count("*").alias("_c"))
    w = Window.orderBy(F.desc("_c"), "_term")
    vocab = cnt.select("_term", F.row_number().over(w).alias("_tid")).filter(
        F.col("_tid") <= vocab_size
    )
    enc = e.join(F.broadcast(vocab), "_term", "left").select(
        id_col,
        "_pos",
        F.coalesce("_tid", F.lit(0)).alias("_id"),
        F.col("_tid").isNull().cast("int").alias("_oov"),
    )
    return enc.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum("_oov").cast("bigint").alias("n_oov"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_id"))),
                    lambda s: s["_id"].cast("string"),
                ),
            )
        ).alias("ids_digest"),
    )


def dup_span_stats(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document duplicated-span detection — the distributed analog of
    suffix-array substring dedup (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better"): a token position is *duplicated*
    when its word ``n``-gram also occurs in >= ``min_docs`` distinct
    documents. Reports, per document, how much of it is covered by
    cross-document repeated spans.

    Scale shape: positional n-grams are hashed map-side (16-byte md5 — only
    hashes shuffle, never text); the duplicated-gram set is a
    distinct + groupBy(hash) count with map-side partial aggregation, and
    the position stream joins it on the hash key. Documents shorter than
    ``n`` tokens are kept with zero grams via the totals-side left join.

    Returns (id, n_grams, n_dup_positions, dup_frac).
    """
    tok = tokens(text_col)
    grams = F.when(
        F.size(tok) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tok) - (n - 1)),
            lambda i: F.md5(
                F.concat_ws(" ", *[F.element_at(tok, i + j) for j in range(n)])
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    d = docs.select(F.col(id_col), grams.alias("_g"))
    pos = d.select(id_col, F.explode("_g").alias("_gh"))
    dup = (
        pos.distinct()
        .groupBy("_gh")
        .agg(F.count("*").alias("_ndocs"))
        .filter(F.col("_ndocs") >= min_docs)
        .select("_gh")
    )
    dup_cnt = (
        pos.join(dup, "_gh")
        .groupBy(id_col)
        .agg(F.count("*").cast("bigint").alias("n_dup_positions"))
    )
    totals = d.select(id_col, F.size("_g").cast("bigint").alias("n_grams"))
    out = totals.join(dup_cnt, id_col, "left").select(
        id_col,
        "n_grams",
        F.coalesce("n_dup_positions", F.lit(0)).cast("bigint").alias("n_dup_positions"),
    )
    return out.withColumn(
        "dup_frac",
        F.round(
            F.col("n_dup_positions")
            / F.greatest(F.col("n_grams"), F.lit(1)).cast("double"),
            6,
        ),
    )


PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+[0-9]{7,15}"  # E.164: country code + subscriber, max 15 digits
PII_IP_RE = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"


def pii_redact(
    df: DataFrame,
    *,
    text_col: str = "text",
    out_col: str = "redacted",
) -> DataFrame:
    """PII redaction over a text column: emails, international-format phone
    numbers, and IPv4 addresses are counted then replaced with typed
    placeholder tags, in a fixed order (email first — an all-digit domain
    must not be half-eaten by the IP rule).

    The patterns are RE2-compatible (no backrefs/lookaround), so the DuckDB
    oracle runs the identical regexes. Pure columnar ``regexp_count`` /
    ``regexp_replace`` projections — zero shuffle; at 100 TB this pipelines
    inside the parquet scan stage.

    Adds (n_emails, n_phones, n_ips, ``out_col``) to the input frame.
    """
    c = F.col(text_col)
    # Counts follow the same sequential order as the replacements: phones are
    # counted on the email-redacted text and IPs on the phone-redacted text,
    # so a phone-shaped substring inside an email local part (e.g.
    # 'a+12345678@x.com') is not double-counted as a phone after the email
    # rule already consumed it — counts always agree with the output tags.
    after_email = F.regexp_replace(c, PII_EMAIL_RE, "[EMAIL]")
    after_phone = F.regexp_replace(after_email, PII_PHONE_RE, "[PHONE]")
    red = F.regexp_replace(after_phone, PII_IP_RE, "[IP]")
    return df.select(
        "*",
        F.regexp_count(c, F.lit(PII_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(after_email, F.lit(PII_PHONE_RE)).alias("n_phones"),
        F.regexp_count(after_phone, F.lit(PII_IP_RE)).alias("n_ips"),
        red.alias(out_col),
    )


def top_terms(
    df: DataFrame,
    *,
    by: str = "source",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """Exact per-group heavy hitters: the ``k`` most frequent tokens per
    ``by`` group, count-desc with term-asc tiebreak.

    Scale shape: the token stream collapses map-side in the
    ``groupBy(by, term)`` partial aggregate (the only corpus-sized shuffle
    moves (group, term, partial-count) rows, not tokens); the top-k window
    then sorts the vocabulary-x-groups table only. Exact — no sketch — which
    is the right default when the group-term table fits a shuffle; a
    count-min/TopN sketch trades that exactness for a smaller shuffle and is
    deliberately not the default.

    Returns (``by``, term, n, rank)."""
    from pyspark.sql import Window

    e = df.select(F.col(by), F.explode(tokens(text_col)).alias("term"))
    cnt = e.groupBy(by, "term").agg(F.count("*").cast("bigint").alias("n"))
    w = Window.partitionBy(by).orderBy(F.desc("n"), F.asc("term"))
    return (
        cnt.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(by, "term", "n", "rank")
    )


def tfidf_top_terms(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Per-document TF-IDF keyword extraction: the ``k`` highest-scoring
    terms per document, score = tf * (ln((N+1)/(df+1)) + 1) (the smoothed
    sklearn-style idf), rounded to 6 so the ranking and the score are
    engine-exact.

    Scale shape: tokens collapse map-side into the (doc, term, tf) partial
    aggregate — the only corpus-sized shuffle. Document frequency attaches
    via a count window over the term partition of that SAME reduced table
    (one extra exchange of doc-x-vocab rows, never raw tokens, and the tf
    table is provably evaluated once — the window-attach trick from
    `bigram_lm_score`). N rides in from a 1-row aggregate broadcast. The
    final top-k window sorts each document's distinct-term list only.

    Returns (``id_col``, term, tf, df, tfidf_r, rank)."""
    from pyspark.sql import Window

    e = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = e.groupBy(id_col, "term").agg(F.count("*").cast("bigint").alias("tf"))
    n_docs = df.agg(F.countDistinct(id_col).cast("bigint").alias("_n"))
    wt = Window.partitionBy("term")
    scored = (
        tf.withColumn("df", F.count("*").over(wt).cast("bigint"))
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf_r",
            F.round(
                F.col("tf")
                * (F.log((F.col("_n") + 1) / (F.col("df") + 1)) + F.lit(1.0)),
                6,
            ),
        )
    )
    wd = Window.partitionBy(id_col).orderBy(F.desc("tfidf_r"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(wd))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "tfidf_r", "rank")
    )


def bigram_lm_score(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    smooth: float = 0.5,
) -> DataFrame:
    """Corpus-trained bigram language-model scoring — the classic
    perplexity-style quality signal (KenLM-style filtering a la CCNet, Wenzek
    et al. 2020, with the LM trained on the corpus itself): each document's
    mean log P(w_i | w_{i-1}) under add-``smooth`` smoothing,

        P(w2 | w1) = (C(w1 w2) + a) / (C(w1) + a * V),

    where C counts bigram/context occurrences over the whole corpus and V is
    the corpus vocabulary size (distinct tokens). Low scores flag
    out-of-distribution / noisy documents.

    Scale shape: per-doc bigram term frequencies collapse map-side
    (``groupBy(id, gram)``), so the corpus-sized position stream never
    shuffles raw — only (doc, distinct-gram, tf) rows move. The global
    bigram count C(w1 w2) attaches via a window over that tf table (single
    evaluation — no join-back re-derivation), the context count C(w1) via a
    second window on the same reduced table, and the scalar (V) rides a
    broadcast cross join like ``bm25_rank``'s stats. Per-position log
    contributions are rounded to 6 dp before the per-doc sum so summation
    order cannot perturb the oracle comparison.

    Returns (id, n_bigrams, avg_logprob), docs with < 2 tokens excluded
    (they have no bigrams — mirrored in the oracle)."""
    from pyspark.sql import Window

    tok = tokens(text_col)
    d = docs.select(F.col(id_col), tok.alias("_t"))
    # scalar V: distinct tokens corpus-wide (separate tiny-result aggregation)
    vocab = d.select(F.explode("_t").alias("_w")).agg(
        F.count_distinct("_w").cast("double").alias("_v")
    )
    pairs = d.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size("_t") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("_t") - 1),
                    lambda i: F.struct(
                        F.element_at("_t", i).alias("w1"),
                        F.concat_ws(
                            " ", F.element_at("_t", i), F.element_at("_t", i + 1)
                        ).alias("gram"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,gram:string>>"))
        ).alias("_p"),
    ).select(id_col, F.col("_p.w1").alias("_w1"), F.col("_p.gram").alias("_gram"))
    tf = pairs.groupBy(id_col, "_w1", "_gram").agg(
        F.count("*").cast("bigint").alias("_tf")
    )
    c_bg = F.sum("_tf").over(Window.partitionBy("_gram")).cast("double")
    c_uni = F.sum("_tf").over(Window.partitionBy("_w1")).cast("double")
    attached = tf.withColumn("_cbg", c_bg).withColumn("_cuni", c_uni)
    contrib = F.round(
        F.log((F.col("_cbg") + smooth) / (F.col("_cuni") + smooth * F.col("_v"))), 6
    )
    return (
        attached.crossJoin(F.broadcast(vocab))
        .select(id_col, "_tf", (F.col("_tf") * contrib).alias("_c"))
        .groupBy(id_col)
        .agg(
            F.sum("_tf").cast("bigint").alias("n_bigrams"),
            F.round(F.round(F.sum("_c"), 6) / F.sum("_tf"), 6).alias("avg_logprob"),
        )
    )


def zipf_fit(
    df: DataFrame,
    *,
    text_col: str = "text",
    top_n: int = 50,
) -> DataFrame:
    """Zipf's-law fit over the corpus frequency spectrum — the corpus-health
    metric (natural text fits log(freq) ~ a - s*log(rank) with s near 1;
    boilerplate-heavy or templated corpora deviate): ordinary least squares
    on (ln rank, ln count) over the ``top_n`` most frequent terms.

    Distributed shape: term counts collapse map-side; only the
    vocabulary-sized count table ranks (top_n window) and the regression
    sums reduce top_n rows. Determinism ladder: ln values rounded to 6 dp,
    the five OLS sums rounded to 6 dp, slope/intercept rounded to 6 dp —
    every stage is engine-stable.

    Returns one row (n_terms, slope, intercept, top_term, top_count)."""
    from pyspark.sql import Window

    cnt = (
        df.select(F.explode(tokens(text_col)).alias("t"))
        .groupBy("t")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    # bounded top-n FIRST (TakeOrderedAndProject, distributed) — a raw
    # row_number window would single-task-sort the whole vocabulary table;
    # the rank window then runs over top_n rows only
    top = cnt.orderBy(F.desc("c"), F.asc("t")).limit(top_n)
    w = Window.orderBy(F.desc("c"), F.asc("t"))
    ranked = top.withColumn("r", F.row_number().over(w))
    x = F.round(F.log(F.col("r").cast("double")), 6)
    y = F.round(F.log(F.col("c").cast("double")), 6)
    sums = ranked.agg(
        F.count("*").cast("double").alias("n"),
        F.round(F.sum(x), 6).alias("sx"),
        F.round(F.sum(y), 6).alias("sy"),
        F.round(F.sum(x * y), 6).alias("sxy"),
        F.round(F.sum(x * x), 6).alias("sxx"),
        F.max(F.when(F.col("r") == 1, F.col("t"))).alias("top_term"),
        F.max(F.when(F.col("r") == 1, F.col("c"))).alias("top_count"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        F.col("n").cast("bigint").alias("n_terms"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
        "top_term",
        F.col("top_count").cast("bigint").alias("top_count"),
    )


C4_BLACKLIST = ("cookie", "javascript", "lorem")
C4_TERMINAL_RE = r"[.!?]$"


def c4_line_filter(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 3,
    blacklist: tuple[str, ...] = C4_BLACKLIST,
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2): split on
    newlines and keep only lines that (a) end in terminal punctuation,
    (b) contain at least ``min_words`` word tokens, and (c) contain no
    blacklisted token. Documents keep their identity even when every line is
    dropped (empty cleaned text).

    Zero shuffle: the line array never leaves the row — split, per-line
    token checks, filter, and re-join are a single columnar projection that
    pipelines inside the scan stage at any scale.

    Returns (id, n_lines, n_kept, n_kept_chars, cleaned)."""
    bl = F.array(*[F.lit(w) for w in blacklist])

    def _keep(line):
        ltok = tokens(line)
        return (
            line.rlike(C4_TERMINAL_RE)
            & (F.size(ltok) >= min_words)
            & ~F.exists(ltok, lambda t: F.array_contains(bl, t))
        )

    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(lines, _keep)
    cleaned = F.array_join(kept, "\n")
    return df.select(
        F.col(id_col),
        F.size(lines).cast("bigint").alias("n_lines"),
        F.size(kept).cast("bigint").alias("n_kept"),
        F.length(cleaned).cast("bigint").alias("n_kept_chars"),
        cleaned.alias("cleaned"),
    )


def ngram_contamination(
    docs: DataFrame,
    probes: DataFrame,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_id: str = "probe_id",
    probe_text: str = "text",
    min_matched: int = 1,
) -> DataFrame:
    """Benchmark decontamination: find corpus documents sharing ≥
    ``min_matched`` distinct word ``n``-grams with any probe document (the
    standard eval-set contamination test for training corpora).

    Scale shape: the probe side (an eval benchmark — thousands of rows, not
    corpus-sized) explodes to (probe_id, gram) and BROADCASTS; the corpus
    explodes its distinct grams map-side and the gram equi-join + per-pair
    count collapse with map-side partial aggregation. The corpus never
    shuffles whole documents — only matched (doc, probe, gram) hits.

    Returns (doc_id, probe_id, n_matched, n_doc_grams, overlap_frac).
    """
    from pyvectorsearch_spark.functions.text import shingles, tokens

    d_grams = docs.select(
        F.col(id_col).alias("_did"),
        shingles(tokens(text_col), n).alias("_gr"),
    ).withColumn("_ng", F.size("_gr"))
    d = d_grams.select("_did", "_ng", F.explode("_gr").alias("_g"))
    p = probes.select(
        F.col(probe_id).alias("_pid"),
        F.explode(shingles(tokens(probe_text), n)).alias("_g"),
    )
    hits = (
        d.join(F.broadcast(p), "_g")
        .groupBy("_did", "_pid", "_ng")
        .agg(F.count("*").cast("bigint").alias("n_matched"))
        .filter(F.col("n_matched") >= min_matched)
    )
    return hits.select(
        F.col("_did").alias(id_col),
        F.col("_pid").alias(probe_id),
        "n_matched",
        F.col("_ng").cast("bigint").alias("n_doc_grams"),
        F.round(
            F.col("n_matched") / F.greatest(F.col("_ng"), F.lit(1)).cast("double"), 6
        ).alias("overlap_frac"),
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    candidates: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    round_dp: int = 6,
) -> DataFrame:
    """Soft lexical similarity verify: cosine over L2-normalized TF-IDF
    vectors for a pre-blocked candidate pair list — the weighted
    alternative to set-Jaccard verification (rare shared terms count more
    than stopwords), i.e. the classic sparse-vector near-dup scorer.

    Determinism ladder (the `bm25_rank` pattern): weights, squared terms,
    per-doc norms, normalized components, and per-pair products are each
    rounded to ``round_dp`` before any float sum, so every aggregate is
    order-independent to the rounded precision and the DuckDB oracle can
    replay the chain exactly.

    Scale shape: the corpus reduces once to the (doc, term, weight) table
    (map-side-combined tf + window-attached df — raw tokens never
    shuffle); norms are one more groups-sized aggregate joined back on the
    doc key. The pair scorer joins CANDIDATES (already blocked, pairs-
    sized) to that table twice — per-pair fan-out is bounded by document
    vocabulary, never the corpus.

    Returns (d1, d2, cos_r) for pairs with cos_r >= ``threshold``."""
    from pyspark.sql import Window

    e = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = e.groupBy(id_col, "term").agg(F.count("*").cast("double").alias("_tf"))
    n_docs = docs.agg(F.countDistinct(id_col).cast("double").alias("_n"))
    wt = Window.partitionBy("term")
    w = (
        tf.withColumn("_df", F.count("*").over(wt).cast("double"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            F.round(
                F.col("_tf")
                * (F.log((F.col("_n") + 1.0) / (F.col("_df") + 1.0)) + 1.0),
                round_dp,
            ).alias("_w"),
        )
    )
    norms = w.groupBy(id_col).agg(
        F.sqrt(F.round(F.sum(F.round(F.col("_w") * F.col("_w"), round_dp)), round_dp)).alias("_norm")
    )
    u = w.join(norms, id_col).select(
        id_col, "term", F.round(F.col("_w") / F.col("_norm"), round_dp).alias("_u")
    )
    c = candidates.select("d1", "d2")
    t1 = u.select(F.col(id_col).alias("d1"), "term", F.col("_u").alias("_u1"))
    t2 = u.select(F.col(id_col).alias("d2"), "term", F.col("_u").alias("_u2"))
    prods = (
        c.join(t1, "d1")
        .join(t2, ["d2", "term"])
        .select("d1", "d2", F.round(F.col("_u1") * F.col("_u2"), round_dp).alias("_p"))
    )
    out = prods.groupBy("d1", "d2").agg(
        F.round(F.sum("_p"), round_dp).alias("cos_r")
    )
    return out.filter(F.col("cos_r") >= float(threshold))


def phrase_match(
    df: DataFrame,
    phrase: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase search: per-document occurrence count of a consecutive
    token sequence — distributed grep over the normalized token stream (the
    full-text primitive under quote-search / boolean retrieval; BM25 next
    door ranks bags of words, this matches ORDER).

    The phrase is normalized with the SAME tokenizer as the corpus
    (``functions.text.tokens``), so matching is case/punctuation-insensitive
    exactly like every other text operator.

    Scale shape: a ZERO-SHUFFLE scan projection — matching is ONE
    ``aggregate`` left fold over the token array (state = the last k−1
    tokens + running count), so the token array is referenced exactly once
    and each token costs a constant handful of comparisons. (The obvious
    ``filter(sequence(1, n−k+1), i -> tok[i+j] = w_j ∀j)`` form re-touches
    the array k times per position and measured ~6× slower — interpreted
    higher-order lambdas get no codegen CSE.) A one-off phrase query
    touches each row once and moves nothing; an amortized many-query
    deployment would persist a positional posting-list artifact instead.
    Overlapping occurrences count individually (position semantics, not
    non-overlapping string replace).

    Returns (``id_col``, n_matches) for documents with ≥ 1 occurrence."""
    import re as _re

    words = [w for w in _re.sub("[^a-z0-9]+", " ", phrase.lower()).split() if w]
    if not words:
        raise ValueError(f"phrase has no tokens after normalization: {phrase!r}")
    k = len(words)
    # fold state: (prev_1, ..., prev_{k-1}, n) where prev_j is the token j
    # positions back; a match completes when the incoming token is w_k and
    # the buffered history spells w_1..w_{k-1}.
    prevs = [f"p{j}" for j in range(1, k)]
    init = F.struct(
        *[F.lit("\u0000").alias(p) for p in prevs], F.lit(0).cast("long").alias("n")
    )

    def step(acc, x):
        if k == 1:
            hit = x == F.lit(words[0])
            return F.struct((acc["n"] + hit.cast("long")).alias("n"))
        conds = [acc[f"p{k - 1 - j}"] == F.lit(words[j]) for j in range(k - 1)]
        conds.append(x == F.lit(words[k - 1]))
        hit = conds[0]
        for c in conds[1:]:
            hit = hit & c
        shifted = [x.alias("p1")] + [
            acc[f"p{j}"].alias(f"p{j + 1}") for j in range(1, k - 1)
        ]
        return F.struct(*shifted, (acc["n"] + hit.cast("long")).alias("n"))

    n_matches = F.aggregate(tokens(text_col), init, step, lambda acc: acc["n"])
    return (
        df.select(F.col(id_col), n_matches.alias("n_matches"))
        .filter(F.col("n_matches") > 0)
    )


def boilerplate_prefixes(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    by: str = "source",
    k: int = 6,
    min_docs: int = 3,
) -> DataFrame:
    """Boilerplate TEMPLATE detection: per ``by`` group, the exact
    ``k``-token document prefixes shared by ≥ ``min_docs`` documents — the
    header/banner/navigation detector of web-corpus cleaning (C4's line
    rules drop bad LINES; this finds the repeated OPENINGS that survive
    them, so a downstream strip can remove the template once per group).

    Scale shape: one projection reduces every doc to a (group, prefix)
    row; one map-side-combined groupBy counts them — the shuffle carries
    one short row per document, never text bodies. Returns
    (``by``, prefix, n_docs) for qualifying prefixes."""
    t = tokens(text_col)
    prefix = F.concat_ws(" ", F.slice(t, 1, k))
    d = df.select(F.col(by), prefix.alias("prefix")).filter(
        F.length("prefix") > 0
    )
    return (
        d.groupBy(by, "prefix")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def bpe_learn(
    df: DataFrame,
    *,
    text_col: str = "text",
    rounds: int = 6,
) -> DataFrame:
    """Distributed BPE tokenizer training (Sennrich et al. 2016): learn the
    ``rounds`` most frequent symbol-pair merges over the corpus vocabulary.
    Each round counts adjacent symbol pairs (weighted by word frequency),
    promotes the most frequent pair to a merged symbol (ties → lexically
    smallest pair), and rewrites the vocabulary — the canonical subword-
    vocabulary construction of LLM data pipelines.

    Scale shape: the corpus collapses ONCE to the (word, count) vocabulary
    table (map-side combined — the only corpus-sized pass); every round
    then runs on that vocabulary-sized table: one pair explode + count, a
    1-row argmax collect (constant driver footprint, like k-means
    centroids), and a projection rewrite. Lineage is checkpointed per round.

    Determinism contract: pair counts are exact integers, the argmax
    tie-break is total, and the merge rewrite is one left-to-right
    non-overlapping ``replace`` pass over the space-joined symbol string —
    Spark and DuckDB implement identical resume-after-replacement
    semantics (verified), so an immediately repeated symbol run merges
    once per pass rather than cascading within the round (a documented,
    engine-stable simplification of the classic in-word fixpoint; rule
    LEARNING — the interesting output — is unaffected on natural text).

    Returns the learned merge table (merge_rank, pair, merged,
    n_occurrences)."""
    spark = df.sparkSession
    words = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    sym0 = F.concat(
        F.lit(" "),
        F.concat_ws(" ", F.filter(F.split("w", ""), lambda x: x != "")),
        F.lit(" "),
    )
    cur = words.select("cnt", sym0.alias("s")).localCheckpoint(eager=True)
    merges = []
    for r in range(rounds):
        syms = F.split(F.trim("s"), " ")
        pair_arr = F.when(
            F.size(syms) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(syms) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(syms, i), F.element_at(syms, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        counts = (
            cur.select("cnt", F.explode(pair_arr).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("cnt").cast("bigint").alias("n"))
        )
        best = counts.orderBy(F.desc("n"), F.asc("pair")).first()
        if best is None:
            break
        pair, n = best["pair"], int(best["n"])
        merged = pair.replace(" ", "")
        merges.append((r + 1, pair, merged, n))
        cur = cur.select(
            "cnt",
            F.replace(
                F.col("s"), F.lit(f" {pair} "), F.lit(f" {merged} ")
            ).alias("s"),
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "merge_rank int, pair string, merged string, n_occurrences long"
    )


# -- web-corpus cleaning ----------------------------------------------------

_HTML_SCRIPT_RE = r"(?s)<script[^>]*>.*?</script>"
_HTML_STYLE_RE = r"(?s)<style[^>]*>.*?</style>"
_HTML_TAG_RE = r"<[^>]+>"
# fixed entity ladder; &amp; decodes LAST so '&amp;lt;' yields the literal
# '&lt;' instead of double-decoding to '<'
_HTML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def html_clean(
    df: DataFrame,
    *,
    text_col: str = "text",
    out_col: str = "clean",
) -> DataFrame:
    """Common-Crawl-style HTML-to-text extraction: drop <script>/<style>
    blocks (content included), strip remaining tags, decode the basic
    entities, collapse whitespace. All patterns are RE2-compatible
    (non-greedy + (?s), no lookaround), so the DuckDB oracle runs the
    identical regexes.

    Pure columnar ``regexp_replace`` projections — zero shuffle; at 100 TB
    this pipelines inside the scan stage (the same shape as ``pii_redact``/
    ``c4_line_filter``: cleaning costs no data movement at all).

    Adds (n_tags, ``out_col``) — ``n_tags`` counts markup tags removed
    (script/style content is part of its enclosing tag pair's removal)."""
    c = F.col(text_col)
    noscript = F.regexp_replace(
        F.regexp_replace(c, _HTML_SCRIPT_RE, " "), _HTML_STYLE_RE, " "
    )
    notags = F.regexp_replace(noscript, _HTML_TAG_RE, " ")
    dec = notags
    for ent, ch in _HTML_ENTITIES:
        dec = F.regexp_replace(dec, re_escape_literal(ent), ch)
    clean = F.trim(F.regexp_replace(dec, r"\s+", " "))
    return df.select(
        "*",
        F.regexp_count(noscript, F.lit(_HTML_TAG_RE)).alias("n_tags"),
        clean.alias(out_col),
    )


def re_escape_literal(s: str) -> str:
    """Escape a literal for use in a regex (both Java and RE2)."""
    import re as _re

    return _re.escape(s)


def duckdb_html_clean_sql(text_expr: str) -> str:
    """DuckDB twin of ``html_clean``'s clean column (identical regex chain)."""
    e = f"regexp_replace(regexp_replace({text_expr}, '{_HTML_SCRIPT_RE}', ' ', 'g'), '{_HTML_STYLE_RE}', ' ', 'g')"
    e = f"regexp_replace({e}, '{_HTML_TAG_RE}', ' ', 'g')"
    for ent, ch in _HTML_ENTITIES:
        ch_sql = ch.replace("'", "''")
        e = f"regexp_replace({e}, '{re_escape_literal(ent)}', '{ch_sql}', 'g')"
    return f"trim(regexp_replace({e}, '\\s+', ' ', 'g'))"


URL_RE = r"https?://[A-Za-z0-9.-]+(/[A-Za-z0-9./_%?=&+-]*)?"
URL_DOMAIN_GROUP_RE = r"https?://([A-Za-z0-9.-]+)"


def url_stats(
    df: DataFrame,
    *,
    text_col: str = "text",
    blocked_suffixes: list[str] | None = None,
) -> DataFrame:
    """Per-domain URL census over a text corpus: extract every http(s) URL,
    roll up to (domain, n_urls, n_docs, blocked) — the input for the
    URL-blocklist / per-domain-cap filters web-scale curation runs before
    anything else (C4 badlist, RefinedWeb domain rules).

    Scale shape: extraction is a zero-shuffle scan projection
    (``regexp_extract_all``); only (doc, domain) pairs shuffle into the
    domain rollup (map-side combined). The blocklist is a literal suffix
    test compiled into the projection — no blocklist join for a list this
    size; a million-entry blocklist would become a broadcast join instead.
    """
    blocked = blocked_suffixes or []
    doms = F.expr(
        f"regexp_extract_all({text_col}, '{URL_DOMAIN_GROUP_RE}', 1)"
    )
    per_doc = df.select(F.explode(doms).alias("domain"))
    is_blocked = F.lit(False)
    for suf in blocked:
        is_blocked = is_blocked | F.col("domain").endswith(suf)
    n_docs_src = df.select(F.explode(F.array_distinct(doms)).alias("domain"))
    urls = per_doc.groupBy("domain").agg(F.count("*").cast("bigint").alias("n_urls"))
    docs = n_docs_src.groupBy("domain").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    return urls.join(docs, "domain").select(
        "domain", "n_urls", "n_docs", is_blocked.alias("blocked")
    )


def feature_hash(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 32,
) -> DataFrame:
    """Hashing-trick vectorizer (Weinberger et al. 2009): each token hashes
    to one of ``dim`` buckets with a ± sign drawn from the next hash bit (the
    unbiasing trick), per-doc signed counts summed per bucket — the fixed-
    width featurizer for linear probes over unbounded vocabularies (no
    vocabulary table, no OOV).

    Determinism: bucket and sign come from the 52-bit md5, so the vector is
    a pure function of the token multiset; the digest pins every component
    in bucket order. Scale shape: explode → map-side-combined
    groupBy(doc, bucket) → per-doc assembly; the shuffle carries (doc,
    bucket, partial-count) rows, never raw tokens twice.

    Returns (``id_col``, nnz, l1_norm, vec_digest)."""
    h = F.conv(F.substring(F.md5(F.col("_t")), 1, 13), 16, 10).cast("bigint")
    e = df.select(F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("_t"))
    hb = e.select(
        "_id",
        (h % dim).alias("_b"),
        F.when((h / dim).cast("bigint") % 2 == 0, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("_sgn"),
    )
    cells = hb.groupBy("_id", "_b").agg(F.sum("_sgn").cast("bigint").alias("_c"))
    nz = cells.filter(F.col("_c") != 0)
    vec_str = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_b", "_c"))),
            lambda s: F.concat(s["_b"].cast("string"), F.lit(":"), s["_c"].cast("string")),
        ),
        ",",
    )
    return nz.groupBy("_id").agg(
        F.count("*").cast("bigint").alias("nnz"),
        F.sum(F.abs("_c")).cast("bigint").alias("l1_norm"),
        F.md5(vec_str).alias("vec_digest"),
    ).select(F.col("_id").alias(id_col), "nnz", "l1_norm", "vec_digest")


# URL canonicalization — the dedup key web crawls use BEFORE fetching:
# fragment and tracking params stripped, scheme/host lowercased, default
# ports and trailing slashes dropped. Pure RE2-compatible regex chain, so
# the DuckDB oracle replays it verbatim.
_URL_FRAG_RE = r"#.*$"
# anchored to a parameter delimiter (kept via group 1) so a non-tracking
# param whose NAME merely contains 'utm_' (e.g. ?xutm_a=1) is untouched;
# case-insensitive name, delimiter runs collapsed by _URL_DELIM_RE after
_URL_UTM_RE = r"([?&])[uU][tT][mM]_[A-Za-z]+=[^&#]*"
_URL_DELIM_RE = r"([?&])[?&]+"
_URL_TIDY_RE = r"[?&]+$"
_URL_PREFIX_RE = r"^[A-Za-z]+://[^/?#]+"
_URL_PORT_RE = r":(443|80)$"
_URL_SLASH_RE = r"/$"


def url_canonical(col: Column | str) -> Column:
    """Canonical form of a URL column (see module constant chain)."""
    u = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(u, _URL_FRAG_RE, "")
    u = F.regexp_replace(u, _URL_UTM_RE, "$1")
    u = F.regexp_replace(u, _URL_DELIM_RE, "$1")
    u = F.regexp_replace(u, _URL_TIDY_RE, "")
    prefix = F.regexp_replace(
        F.lower(F.regexp_extract(u, _URL_PREFIX_RE, 0)), _URL_PORT_RE, ""
    )
    rest = F.regexp_replace(u, _URL_PREFIX_RE, "")
    return F.regexp_replace(F.concat(prefix, rest), _URL_SLASH_RE, "")


def duckdb_url_canonical_sql(expr: str) -> str:
    """DuckDB twin of ``url_canonical`` (identical regex chain)."""
    u = f"regexp_replace({expr}, '{_URL_FRAG_RE}', '')"
    u = f"regexp_replace({u}, '{_URL_UTM_RE}', '\\1', 'g')"
    u = f"regexp_replace({u}, '{_URL_DELIM_RE}', '\\1', 'g')"
    u = f"regexp_replace({u}, '{_URL_TIDY_RE}', '')"
    prefix = (
        f"regexp_replace(lower(regexp_extract({u}, '{_URL_PREFIX_RE}')), "
        f"'{_URL_PORT_RE}', '')"
    )
    rest = f"regexp_replace({u}, '{_URL_PREFIX_RE}', '')"
    return f"regexp_replace({prefix} || {rest}, '{_URL_SLASH_RE}', '')"


def nb_score_table(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    round_dp: int = 6,
    features=None,
) -> DataFrame:
    """The Naive Bayes (doc, label, score) table behind ``nb_classify`` —
    exposed so downstream consumers (argmax classification in
    ``nb_classify``, margin calibration in ``queries/ml_extra.py``) share
    one model build. Same engine-exact rounding ladder as ``nb_classify``;
    returns (_id, _lbl, _ml, _score)."""
    feat = features if features is not None else tokens
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("_lbl"),
        feat(text_col).alias("_t"),
    )
    tf = (
        base.select("_id", "_lbl", F.explode("_t").alias("_w"))
        .groupBy("_id", "_lbl", "_w")
        .agg(F.count("*").cast("bigint").alias("_tf"))
    )
    # persist: the (doc, term, tf) reduction feeds FOUR legs (n_wl, ct,
    # vocab, and the scoring join); without it each leg re-runs the
    # featurize+explode+rollup subtree — measured 4x the whole query
    # (36 s -> ~12 s at sf0.1). This is the "model build is an
    # artifact" rule the grid/IVF indexes already follow. Pooled so
    # long-lived sessions (parity sweep, repeated bench) don't accumulate
    # one cached table per invocation (ADVICE r6).
    from pyvectorsearch_spark.plans.cachepool import pooled_persist

    tf = pooled_persist(tf)
    # model: n_wl per (term, label); ct_l total tokens per label; V vocab
    n_wl = tf.groupBy("_w", F.col("_lbl").alias("_ml")).agg(
        F.sum("_tf").cast("bigint").alias("_nwl")
    )
    ct = tf.groupBy(F.col("_lbl").alias("_ml")).agg(
        F.sum("_tf").cast("bigint").alias("_ct")
    )
    vocab = tf.select("_w").distinct()
    v = vocab.agg(F.count("*").cast("bigint").alias("_v"))
    # full (term x label) grid with smoothing default for unseen pairs
    grid = (
        vocab.crossJoin(ct)
        .join(n_wl, ["_w", "_ml"], "left")
        .crossJoin(F.broadcast(v))
        .select(
            "_w",
            "_ml",
            F.round(
                F.log(
                    (F.coalesce("_nwl", F.lit(0)) + 1).cast("double")
                    / (F.col("_ct") + F.col("_v")).cast("double")
                ),
                round_dp,
            ).alias("_lnp"),
        )
    )
    n_docs = base.groupBy(F.col("_lbl").alias("_ml")).agg(
        F.count("*").cast("bigint").alias("_nd")
    )
    tot = base.agg(F.count("*").cast("bigint").alias("_n"))
    prior = n_docs.crossJoin(F.broadcast(tot)).select(
        "_ml",
        F.round(F.log(F.col("_nd").cast("double") / F.col("_n")), round_dp).alias(
            "_lnprior"
        ),
    )
    scores = (
        tf.join(grid, "_w")
        .groupBy("_id", "_lbl", "_ml")
        .agg(F.round(F.sum(F.col("_tf") * F.col("_lnp")), round_dp).alias("_s"))
        .join(prior, "_ml")
        .select(
            "_id",
            "_lbl",
            "_ml",
            F.round(F.col("_s") + F.col("_lnprior"), round_dp).alias("_score"),
        )
    )
    return scores


def nb_classify(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    round_dp: int = 6,
    features=None,
) -> DataFrame:
    """Multinomial Naive Bayes trained on the corpus's own labels and
    applied back to every document (add-1 smoothing) — the classic
    supervised lang-ID / topical classifier, done entirely in engine-exact
    arithmetic: per-(term, label) log-likelihoods and per-label priors are
    rounded to ``round_dp`` before use, per-doc scores are rounded sums of
    rounded tf-weighted contributions (the `bigram_lm_score` ladder), and
    the argmax tie-breaks on label ascending — so the trained model AND
    every prediction are oracle-checkable.

    Scale shape: the corpus reduces once to (doc, term, tf) map-side; the
    model is a (vocabulary × labels) table built from the same reduction
    (never broadcast — it joins on term); scoring is one term-keyed join +
    one (doc, label) rollup + a labels-sized argmax window per doc.

    ``features`` swaps the featurizer: any ``text_col -> array<string>``
    column function (default: word ``tokens``; pass
    ``functions.text.chargrams`` for the char-n-gram langid variant —
    Cavnar & Trenkle 1994 — which on domain-skewed corpora beats both the
    stopword baseline and word-token features because it sees sub-word
    orthography, not just whole-word hits).

    Returns (``id_col``, true_label, pred_label)."""
    from pyspark.sql import Window

    scores = nb_score_table(
        df,
        id_col=id_col,
        text_col=text_col,
        label_col=label_col,
        round_dp=round_dp,
        features=features,
    )
    w = Window.partitionBy("_id").orderBy(F.desc("_score"), F.asc("_ml"))
    best = scores.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") == 1)
    return best.select(
        F.col("_id").alias(id_col),
        F.col("_lbl").alias("true_label"),
        F.col("_ml").alias("pred_label"),
    )


# Porter-step-1-style suffix stemming as a fixed regex chain (sses->ss,
# ies->i, drop trailing s unless -ss/-us, strip -ing/-ed from stems >= 3
# chars). Replacement group syntax differs per engine ($1 Java, \1 RE2)
# but semantics are identical; the rule ORDER is part of the contract.


def stem_token(col: Column) -> Column:
    """Apply the fixed stemming rule chain to a (lowercase) token column."""
    c = F.regexp_replace(col, "sses$", "ss")
    c = F.regexp_replace(c, "ies$", "i")
    c = F.regexp_replace(c, "([^su])s$", "$1")
    c = F.regexp_replace(c, "(.{3,})ing$", "$1")
    c = F.regexp_replace(c, "(.{3,})ed$", "$1")
    return c


def duckdb_stem_sql(expr: str) -> str:
    """DuckDB twin of ``stem_token`` (same rules, RE2 replacement syntax)."""
    c = f"regexp_replace({expr}, 'sses$', 'ss')"
    c = f"regexp_replace({c}, 'ies$', 'i')"
    c = f"regexp_replace({c}, '([^su])s$', '\\1')"
    c = f"regexp_replace({c}, '(.{{3,}})ing$', '\\1')"
    c = f"regexp_replace({c}, '(.{{3,}})ed$', '\\1')"
    return c


# --- shared per-doc signal column builders (single source of truth for the
# --- quality screens AND the redundancy matrix that audits them) -------------

ENTROPY_ALPHABET = list("abcdefghijklmnopqrstuvwxyz") + [" "]
LIX_LONG_CHARS = 6


def char_entropy_col(raw: Column) -> Column:
    """Per-doc character-level Shannon entropy over the fixed 27-symbol
    alphabet as ONE scan-stage expression (length-minus-replace counts,
    per-term 6-dp rounds) — shared by `text_char_entropy` and
    `text_signal_correlation` so the audit can never drift from the
    screen."""
    lower = F.lower(raw)

    def cnt(sym: str) -> Column:
        return (
            F.length(lower) - F.length(F.replace(lower, F.lit(sym), F.lit("")))
        ).cast("bigint")

    counts = [cnt(s) for s in ENTROPY_ALPHABET]
    n = sum(counts[1:], counts[0])
    terms = [
        F.when(c > 0, F.round(c.cast("double") * F.log2(c.cast("double")), 6))
        .otherwise(F.lit(0.0))
        for c in counts
    ]
    ssum = sum(terms[1:], terms[0])
    return F.when(
        n > 0, F.round(F.log2(n.cast("double")) - ssum / n.cast("double"), 6)
    ).otherwise(F.lit(0.0))


def _sentence_count(raw: Column) -> Column:
    return F.greatest(
        F.size(F.regexp_extract_all(raw, F.lit(r"[.!?]+"), 0)), F.lit(1)
    ).cast("bigint")


def flesch_col(raw: Column, tok: Column) -> Column:
    """Per-doc Flesch reading ease (vowel-group syllables, terminal-
    punctuation sentences), rounded 6 dp."""
    words = F.size(tok).cast("bigint")
    sylls = F.greatest(
        F.size(F.regexp_extract_all(F.lower(raw), F.lit("[aeiouy]+"), 0)),
        F.lit(1),
    ).cast("bigint")
    return F.when(
        words > 0,
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * (words / _sentence_count(raw).cast("double"))
            - F.lit(84.6) * (sylls / words.cast("double")),
            6,
        ),
    ).otherwise(F.lit(0.0))


def lix_col(raw: Column, tok: Column) -> Column:
    """Per-doc LIX readability (long word = more than 6 chars), rounded
    6 dp."""
    words = F.size(tok).cast("bigint")
    longw = F.size(
        F.filter(tok, lambda t: F.length(t) > LIX_LONG_CHARS)
    ).cast("bigint")
    return F.when(
        words > 0,
        F.round(
            words / _sentence_count(raw).cast("double")
            + 100.0 * longw / words.cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))


def rouge_n_pairs(
    df: DataFrame,
    pairs: DataFrame,
    *,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_col: str = "d1",
    cand_col: str = "d2",
    round_dp: int = 6,
) -> DataFrame:
    """ROUGE-N between candidate document pairs (Lin 2004): clipped n-gram
    overlap — Σ_g min(count_ref(g), count_cand(g)) — normalized by each
    side's total gram count. The standard summarization/overlap metric, used
    in data pipelines to grade near-dup candidates and retrieval answers by
    CONTENT overlap (multiset counts), where Jaccard-on-sets saturates.

    recall = clip / |ref grams|, precision = clip / |cand grams|, and the
    F1 reduces to 2·clip / (|ref| + |cand|) — all three are ratios of
    INTEGER counts, so the only rounding is the final division (no float
    accumulation anywhere; engine-exact by construction).

    Scale shape: gram counting is one map-side-combined aggregate over the
    corpus; the pair evaluation SEMI-joins the gram table down to docs that
    appear in ``pairs`` first (candidate pairs are sparse output of an
    LSH/inverted-index stage, orders of magnitude smaller than the corpus),
    then equi-joins ref-grams to cand-grams on (pair, gram). Nothing
    touches the raw text after the first scan.

    Returns (``ref_col``, ``cand_col``, clip, rouge_recall_r,
    rouge_precision_r, rouge_f1_r) — pairs with zero overlap keep a row
    (clip = 0) via the left join from ``pairs``."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    from pyvectorsearch_spark.functions.text import word_ngrams

    p = pairs.select(F.col(ref_col).alias("_d1"), F.col(cand_col).alias("_d2"))
    ids = (
        p.select(F.col("_d1").alias("_doc"))
        .unionByName(p.select(F.col("_d2").alias("_doc")))
        .distinct()
    )
    g = (
        df.select(
            F.col(id_col).alias("_doc"),
            F.explode(word_ngrams(tokens(text_col), n)).alias("_g"),
        )
        .join(ids, "_doc", "left_semi")
        .groupBy("_doc", "_g")
        .agg(F.count("*").alias("_c"))
    )
    tot = g.groupBy("_doc").agg(F.sum("_c").alias("_tot"))
    ga = g.select(F.col("_doc").alias("_d1"), "_g", F.col("_c").alias("_c1"))
    gb = g.select(F.col("_doc").alias("_d2"), "_g", F.col("_c").alias("_c2"))
    clip = (
        p.join(ga, "_d1")
        .join(gb, ["_d2", "_g"])
        .groupBy("_d1", "_d2")
        .agg(F.sum(F.least("_c1", "_c2")).alias("_clip"))
    )
    t1 = tot.select(F.col("_doc").alias("_d1"), F.col("_tot").alias("_t1"))
    t2 = tot.select(F.col("_doc").alias("_d2"), F.col("_tot").alias("_t2"))
    out = (
        p.join(clip, ["_d1", "_d2"], "left")
        .join(t1, "_d1")
        .join(t2, "_d2")
        .select(
            F.col("_d1").alias(ref_col),
            F.col("_d2").alias(cand_col),
            F.coalesce("_clip", F.lit(0)).cast("bigint").alias("clip"),
            F.round(
                F.coalesce("_clip", F.lit(0)) / F.col("_t1").cast("double"),
                round_dp,
            ).alias("rouge_recall_r"),
            F.round(
                F.coalesce("_clip", F.lit(0)) / F.col("_t2").cast("double"),
                round_dp,
            ).alias("rouge_precision_r"),
            F.round(
                2.0 * F.coalesce("_clip", F.lit(0))
                / (F.col("_t1") + F.col("_t2")).cast("double"),
                round_dp,
            ).alias("rouge_f1_r"),
        )
    )
    return out


def bleu_n_pairs(
    df: DataFrame,
    pairs: DataFrame,
    *,
    max_n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_col: str = "d1",
    cand_col: str = "d2",
    round_dp: int = 6,
) -> DataFrame:
    """Sentence-BLEU (Papineni et al. ACL'02) between candidate document
    pairs, orders 1..``max_n`` — the self-BLEU diversity statistic (Zhu et
    al. SIGIR'18) when run over a corpus's own near-dup candidate pairs:
    high BLEU against another corpus document = low diversity / templated
    text, the signal a curation pipeline uses to down-weight boilerplate.

    Per pair (ref, cand): p_n = clipped n-gram matches / cand n-gram count
    (both INTEGER counts — Σ_g min(cnt_ref(g), cnt_cand(g)) like ROUGE's
    clip); brevity penalty BP = 1 if c > r else exp(1 - r/c) with r/c the
    ref/cand unigram counts; BLEU = BP · (Π p_n)^(1/max_n), 0 when any
    p_n = 0 (unsmoothed, the reference definition). For max_n = 2 the
    geometric mean is sqrt(p1·p2): IEEE sqrt/·// are correctly rounded, so
    the only cross-engine wobble is exp()'s final ulp, absorbed by rounding
    BP to 9 dp before the product (the repo's rounding-ladder rule).

    Scale shape: identical to ``rouge_n_pairs`` — gram counting is one
    map-side-combined aggregate SEMI-joined down to the docs that appear in
    ``pairs``; the per-order gram streams union into ONE shuffle keyed
    (doc, order, gram); nothing touches raw text after the first scan.

    Returns (``ref_col``, ``cand_col``, clip_1..clip_N, p_1_r..p_N_r,
    bp_r, bleu_r); zero-overlap pairs keep a row with bleu_r = 0."""
    if max_n < 1:
        raise ValueError(f"max_n must be >= 1, got {max_n}")
    from pyvectorsearch_spark.functions.text import tokens, word_ngrams

    ns = list(range(1, max_n + 1))
    p = pairs.select(F.col(ref_col).alias("_d1"), F.col(cand_col).alias("_d2"))
    ids = (
        p.select(F.col("_d1").alias("_doc"))
        .unionByName(p.select(F.col("_d2").alias("_doc")))
        .distinct()
    )
    tk = df.select(
        F.col(id_col).alias("_doc"), tokens(text_col).alias("_tok")
    ).join(ids, "_doc", "left_semi")
    grams = None
    for n in ns:
        gn = tk.select(
            "_doc",
            F.lit(n).alias("_n"),
            F.explode(word_ngrams(F.col("_tok"), n)).alias("_g"),
        )
        grams = gn if grams is None else grams.unionByName(gn)
    gc = grams.groupBy("_doc", "_n", "_g").agg(F.count("*").alias("_c"))
    tot = gc.groupBy("_doc", "_n").agg(F.sum("_c").alias("_tot"))
    clip = (
        p.join(
            gc.select(
                F.col("_doc").alias("_d1"), "_n", "_g", F.col("_c").alias("_c1")
            ),
            "_d1",
        )
        .join(
            gc.select(
                F.col("_doc").alias("_d2"), "_n", "_g", F.col("_c").alias("_c2")
            ),
            ["_d2", "_n", "_g"],
        )
        .groupBy("_d1", "_d2", "_n")
        .agg(F.sum(F.least("_c1", "_c2")).alias("_clip"))
        .groupBy("_d1", "_d2")
        .pivot("_n", ns)
        .agg(F.first("_clip"))
    )
    clip = clip.select(
        "_d1", "_d2", *[F.col(str(n)).alias(f"_clip{n}") for n in ns]
    )
    # cand-side denominators per order + ref/cand unigram counts
    out = p.join(clip, ["_d1", "_d2"], "left")
    for n in ns:
        tn = tot.filter(F.col("_n") == n).select(
            F.col("_doc").alias("_d2"), F.col("_tot").alias(f"_den{n}")
        )
        out = out.join(tn, "_d2", "left")
    r1 = tot.filter(F.col("_n") == 1).select(
        F.col("_doc").alias("_d1"), F.col("_tot").alias("_r")
    )
    out = out.join(r1, "_d1", "left")
    c = F.coalesce(F.col("_den1"), F.lit(0)).cast("double")
    r = F.coalesce(F.col("_r"), F.lit(0)).cast("double")
    bp = F.when(c > r, F.lit(1.0)).otherwise(F.round(F.exp(1.0 - r / c), 9))
    pcols = [
        F.coalesce(F.col(f"_clip{n}"), F.lit(0))
        / F.coalesce(F.col(f"_den{n}"), F.lit(0)).cast("double")
        for n in ns
    ]
    geo = pcols[0]
    for pc in pcols[1:]:
        geo = geo * pc
    geo = F.pow(geo, 1.0 / max_n) if max_n > 2 else (
        F.sqrt(geo) if max_n == 2 else geo
    )
    all_pos = F.lit(True)
    for n in ns:
        all_pos = all_pos & (
            F.coalesce(F.col(f"_clip{n}"), F.lit(0)) > 0
        ) & (F.coalesce(F.col(f"_den{n}"), F.lit(0)) > 0)
    sel = [
        F.col("_d1").alias(ref_col),
        F.col("_d2").alias(cand_col),
    ]
    for n in ns:
        sel.append(
            F.coalesce(F.col(f"_clip{n}"), F.lit(0)).cast("bigint").alias(f"clip_{n}")
        )
        sel.append(
            F.when(
                F.coalesce(F.col(f"_den{n}"), F.lit(0)) > 0,
                F.round(
                    F.coalesce(F.col(f"_clip{n}"), F.lit(0))
                    / F.col(f"_den{n}").cast("double"),
                    round_dp,
                ),
            ).otherwise(F.lit(0.0)).alias(f"p_{n}_r")
        )
    sel.append(F.when(c > 0, F.round(bp, round_dp)).otherwise(F.lit(0.0)).alias("bp_r"))
    sel.append(
        F.when(all_pos, F.round(bp * geo, round_dp)).otherwise(F.lit(0.0)).alias("bleu_r")
    )
    return out.select(*sel)


def chrf_pairs(
    df: DataFrame,
    pairs: DataFrame,
    *,
    max_n: int = 6,
    beta: float = 2.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_col: str = "d1",
    cand_col: str = "d2",
    round_dp: int = 6,
) -> DataFrame:
    """chrF (Popović, WMT'15) between candidate document pairs: clipped
    CHARACTER n-gram precision/recall for n = 1..``max_n``, arithmetic-mean
    combined, F-beta'd (β = 2 weights recall double — the WMT standard).
    Char grams make the score robust to tokenization/morphology drift where
    the word-gram metrics (ROUGE/BLEU) fracture — the third pair-grading
    lens a curation pipeline attaches to its near-dup candidates.

    Per pair and order n: clip_n = Σ_g min(cnt_ref(g), cnt_cand(g)) over
    char n-grams WITH multiplicity (``chargrams`` normalization: lowercase,
    [^a-z0-9 ] stripped); p_n = clip_n/|cand grams_n|, r_n =
    clip_n/|ref grams_n| (0 when the side has no grams of that order).
    P = (p_1 + ... + p_N)/N summed in WRITTEN order (fixed-order IEEE adds,
    bit-identical across engines — no aggregate over the orders), R
    likewise, chrF = (1+β²)·P·R / (β²·P + R), 0 when the denominator is 0.
    Unlike BLEU there is NO exp/log anywhere: every operation is a
    correctly-rounded IEEE add/mul/div, so parity is exact by construction.

    Scale shape: identical to ``rouge_n_pairs``/``bleu_n_pairs`` — one
    gram-count aggregate SEMI-joined to the paired docs, all orders riding
    ONE shuffle keyed (doc, order, gram); raw text is touched once.

    Returns (``ref_col``, ``cand_col``, chrf_p_r, chrf_r_r, chrf_r);
    zero-overlap pairs keep a row (score 0) via the left join."""
    if max_n < 1:
        raise ValueError(f"max_n must be >= 1, got {max_n}")
    from pyvectorsearch_spark.functions.text import chargrams

    ns = list(range(1, max_n + 1))
    b2 = beta * beta
    p = pairs.select(F.col(ref_col).alias("_d1"), F.col(cand_col).alias("_d2"))
    ids = (
        p.select(F.col("_d1").alias("_doc"))
        .unionByName(p.select(F.col("_d2").alias("_doc")))
        .distinct()
    )
    tk = df.select(F.col(id_col).alias("_doc"), F.col(text_col).alias("_t")).join(
        ids, "_doc", "left_semi"
    )
    grams = None
    for n in ns:
        gn = tk.select(
            "_doc",
            F.lit(n).alias("_n"),
            F.explode(chargrams(F.col("_t"), n)).alias("_g"),
        )
        grams = gn if grams is None else grams.unionByName(gn)
    gc = grams.groupBy("_doc", "_n", "_g").agg(F.count("*").alias("_c"))
    tot = (
        gc.groupBy("_doc", "_n")
        .agg(F.sum("_c").alias("_tot"))
        .groupBy("_doc")
        .pivot("_n", ns)
        .agg(F.first("_tot"))
        .select("_doc", *[F.col(str(n)).alias(f"_t{n}") for n in ns])
    )
    clip = (
        p.join(
            gc.select(F.col("_doc").alias("_d1"), "_n", "_g", F.col("_c").alias("_c1")),
            "_d1",
        )
        .join(
            gc.select(F.col("_doc").alias("_d2"), "_n", "_g", F.col("_c").alias("_c2")),
            ["_d2", "_n", "_g"],
        )
        .groupBy("_d1", "_d2", "_n")
        .agg(F.sum(F.least("_c1", "_c2")).alias("_clip"))
        .groupBy("_d1", "_d2")
        .pivot("_n", ns)
        .agg(F.first("_clip"))
        .select("_d1", "_d2", *[F.col(str(n)).alias(f"_cl{n}") for n in ns])
    )
    tref = tot.select(
        F.col("_doc").alias("_d1"), *[F.col(f"_t{n}").alias(f"_tr{n}") for n in ns]
    )
    tcand = tot.select(
        F.col("_doc").alias("_d2"), *[F.col(f"_t{n}").alias(f"_tc{n}") for n in ns]
    )
    out = (
        p.join(clip, ["_d1", "_d2"], "left")
        .join(tref, "_d1", "left")
        .join(tcand, "_d2", "left")
    )

    def _ratio(n: int, side: str) -> Column:
        den = F.coalesce(F.col(f"_t{side}{n}"), F.lit(0))
        return F.when(
            den > 0,
            F.coalesce(F.col(f"_cl{n}"), F.lit(0)) / den.cast("double"),
        ).otherwise(F.lit(0.0))

    P = _ratio(1, "c")
    R = _ratio(1, "r")
    for n in ns[1:]:
        P = P + _ratio(n, "c")
        R = R + _ratio(n, "r")
    P = P / float(max_n)
    R = R / float(max_n)
    den = b2 * P + R
    return out.select(
        F.col("_d1").alias(ref_col),
        F.col("_d2").alias(cand_col),
        F.round(P, round_dp).alias("chrf_p_r"),
        F.round(R, round_dp).alias("chrf_r_r"),
        F.when(den > 0.0, F.round((1.0 + b2) * P * R / den, round_dp))
        .otherwise(F.lit(0.0))
        .alias("chrf_r"),
    )
