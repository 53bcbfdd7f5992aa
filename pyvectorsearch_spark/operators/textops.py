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
