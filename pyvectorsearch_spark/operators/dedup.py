"""Deduplication operators for large-scale training-data pipelines.

North-star extensions beyond the reference surface (BASELINE.json): the
reference library has no text processing at all; these are designed
Spark-first for 100 TB corpora.

Scale design notes (per operator):

- ``exact_dedup``: hash-groupBy. One shuffle on a 128-bit digest; row payload
  never shuffles twice (window-free min-id keep rule via groupBy + semi join).
- ``jaccard_similarity_pairs``: exact n-gram Jaccard via shingle inverted
  index (explode + equi-join). Cost is Σ_shingle df(s)² — fine after stopword
  pruning / as a verification stage, but quadratic on hot shingles; at corpus
  scale run it only on LSH candidates.
- ``minhash_lsh_pairs``: the scale path. Signatures are one projection
  (no shuffle); banding explodes to ``bands`` rows/doc; the band equi-join
  finds candidates without comparing all pairs. Verification recomputes the
  signature-agreement estimate only for candidates.
- ``simhash_64``: per-token digests → 60-bit sign fingerprint; near-dup =
  small Hamming distance. Integer-only math → deterministic across engines.
- ``embedding_dup_pairs``: brute-force cosine self-join (exact); at scale,
  bucket by LSH/IVF first (see index.grid) and join within buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pyvectorsearch_spark.functions.text import (
    lsh_band_keys,
    minhash_signature,
    shingles,
    tokens,
)
from pyvectorsearch_spark.functions.vector import cosine_sim

SIMHASH_BITS = 60  # 15 md5 hex nibbles → signed-long safe (< 2^62)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row (min id) per exact text digest."""
    digests = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("_digest"))
    keep = digests.groupBy("_digest").agg(F.min(id_col).alias(id_col))
    return df.join(keep.select(id_col), id_col, "left_semi")


def jaccard_similarity_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity join: pairs with J ≥ threshold.

    Returns ``(d1, d2, n_common, jaccard)`` with d1 < d2.
    """
    sh = df.select(
        F.col(id_col).alias("doc"), shingles(tokens(text_col), n).alias("sh")
    ).filter(F.size("sh") > 0)
    sizes = sh.select("doc", F.size("sh").alias("n_sh"))
    ex = sh.select("doc", F.explode("sh").alias("s"))
    a, b = ex.alias("a"), ex.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("d1"), F.col("b.doc").alias("d2"))
        .agg(F.count("*").alias("n_common"))
    )
    s1 = sizes.select(F.col("doc").alias("d1"), F.col("n_sh").alias("n1"))
    s2 = sizes.select(F.col("doc").alias("d2"), F.col("n_sh").alias("n2"))
    jac = F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common"))
    return (
        common.join(F.broadcast(s1), "d1")
        .join(F.broadcast(s2), "d2")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("d1", "d2", "n_common", "jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH near-duplicate candidates with signature-estimated
    Jaccard. shingle→minhash→band→bucket-join; only bucket collisions are
    compared. Returns ``(d1, d2, est_jaccard)``, d1 < d2, est ≥ threshold."""
    rows = n_hashes // bands
    sig = df.select(
        F.col(id_col).alias("doc"),
        minhash_signature(shingles(tokens(text_col), n), n_hashes).alias("sig"),
    ).filter(~F.array_contains(F.transform("sig", lambda x: x.isNull()), True))
    banded = sig.select(
        "doc", F.explode(lsh_band_keys(F.col("sig"), bands, rows)).alias("bk")
    ).select("doc", "bk.band", "bk.bkey")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("d1"), F.col("b.doc").alias("d2"))
        .distinct()
    )
    s1 = sig.select(F.col("doc").alias("d1"), F.col("sig").alias("sig1"))
    s2 = sig.select(F.col("doc").alias("d2"), F.col("sig").alias("sig2"))
    est = F.expr(
        "aggregate(zip_with(sig1, sig2, (x, y) -> IF(x = y, 1, 0)), 0, "
        "(acc, v) -> acc + v)"
    ) / float(n_hashes)
    return (
        cand.join(F.broadcast(s1), "d1")
        .join(F.broadcast(s2), "d2")
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("d1", "d2", "est_jaccard")
    )


def simhash_64(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """60-bit frequency-weighted SimHash per document (integer-only math,
    md5-derived — the canonical Charikar scheme: each term votes ±term_count
    per bit; the fingerprint is the per-bit sign).

    Token digest → 15 hex nibbles → per-bit ±count votes → sign bits packed
    into a bigint. Returns ``(id_col, simhash)``. Weighting by frequency
    (not distinct sets) is what separates corpora with small shared
    vocabularies. All-integer math → deterministic across engines.
    """
    tok = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("cnt"))
    )
    nibs = tok.withColumn(
        "nibs",
        F.expr(
            "transform(sequence(1, 15), p -> "
            "cast(conv(substr(md5(tok), p, 1), 16, 10) as int))"
        ),
    )
    contribs = [
        (
            F.col("cnt")
            * (2 * ((F.element_at("nibs", j // 4 + 1).bitwiseAND(F.lit(8 >> (j % 4))) != 0).cast("int")) - 1)
        ).alias(f"c{j}")
        for j in range(SIMHASH_BITS)
    ]
    votes = nibs.select(id_col, *contribs)
    sums = votes.groupBy(id_col).agg(
        *[F.sum(f"c{j}").alias(f"s{j}") for j in range(SIMHASH_BITS)]
    )
    packed = sums.select(
        F.col(id_col),
        sum(
            [
                F.when(F.col(f"s{j}") > 0, F.lit(1 << (SIMHASH_BITS - 1 - j)).cast("long")).otherwise(F.lit(0).cast("long"))
                for j in range(SIMHASH_BITS)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return packed


def simhash_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 12,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance ≤ max_hamming.

    Brute self-join here (500-doc oracle scale); at corpus scale split the
    fingerprint into (max_hamming+1) chunks and equi-join on chunks (pigeonhole)
    before verifying — same output, no quadratic pass."""
    sh = simhash_64(df, id_col=id_col, text_col=text_col)
    a = sh.select(F.col(id_col).alias("d1"), F.col("simhash").alias("h1"))
    b = sh.select(F.col(id_col).alias("d2"), F.col("simhash").alias("h2"))
    ham = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return (
        a.join(b, F.col("d1") < F.col("d2"))
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("d1", "d2", "hamming")
    )


def embedding_dup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.95,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ min_cosine, d1 < d2 (exact
    brute-force self-join)."""
    a = df.select(F.col(id_col).alias("d1"), F.col(vec_col).alias("v1"))
    b = df.select(F.col(id_col).alias("d2"), F.col(vec_col).alias("v2"))
    return (
        a.join(b, F.col("d1") < F.col("d2"))
        .withColumn("cosine", cosine_sim(F.col("v1"), F.col("v2")))
        .filter(F.col("cosine") >= min_cosine)
        .select("d1", "d2", "cosine")
    )
