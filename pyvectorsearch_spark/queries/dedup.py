"""Dedup queries over the ``documents``/``embeddings`` tables, each with a
DuckDB oracle computing the identical md5-based pipeline (same tokenization,
same hashing, integer-only fingerprint math → exact cross-engine equality)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.functions.text import duckdb_minhash64, duckdb_shingles, duckdb_tokens
from pyvectorsearch_spark.functions.vector import duckdb_cosine
from pyvectorsearch_spark.operators.dedup import (
    SIMHASH_BITS,
    exact_dedup,
    jaccard_similarity_pairs,
    minhash_lsh_pairs,
    simhash_pairs_auto,
    simhash_pairs_bucketed,
)
from pyvectorsearch_spark.operators.graph import dup_clusters
from pyvectorsearch_spark.sources.tables import load_table, spread

JACCARD_THRESHOLD = 0.8
LSH_THRESHOLD = 0.5
MAX_HAMMING = 9  # planted near-dups reach 9; the small shared vocabulary keeps random pairs close
MIN_COSINE = 0.4  # calibrated: driver embeddings have no planted near-dups; 0.4 keeps a nonempty tail
N_HASHES = 16
BANDS = 4


def q_dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup summary per source: docs vs distinct digests.

    No ``spread()``: md5-per-row is too light to repay a full-row
    repartition — the map-side partial (source, digest) aggregate reduces
    before the only shuffle anyway (measured 0.72 s with the repartition
    vs 0.42 s without at sf0.1, r10 optimization round; tokenizer-heavy
    queries keep spread, where the same A/B favors it)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct(F.md5("text")).alias("n_unique"),
            (F.count("*") - F.countDistinct(F.md5("text"))).alias("n_dups"),
        )
        .orderBy("source")
    )


ORACLE_EXACT = """
SELECT source, count(*) AS n_docs,
       count(DISTINCT md5(text)) AS n_unique,
       count(*) - count(DISTINCT md5(text)) AS n_dups
FROM documents GROUP BY source ORDER BY source
"""


def q_dedup_exact_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep-rule itself: one surviving row (min doc_id) per exact text
    digest — returns the kept ids with their source. No ``spread()`` —
    see q_dedup_exact_stats."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs).select("doc_id", "source")


ORACLE_EXACT_KEEP = """
SELECT doc_id, source FROM documents
WHERE doc_id IN (
  SELECT min(doc_id) FROM documents GROUP BY md5(text)
)
"""


def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    out = jaccard_similarity_pairs(docs, threshold=JACCARD_THRESHOLD)
    return out.select("d1", "d2", "n_common", F.round("jaccard", 6).alias("jaccard"))


_TOK = duckdb_tokens("text")
_SH = duckdb_shingles("t", 3)

_JACCARD_CTES = f"""toks AS (SELECT doc_id, {_TOK} AS t FROM documents),
sh AS (SELECT doc_id, {_SH} AS s FROM toks WHERE len({_SH}) > 0),
ex AS (SELECT doc_id, unnest(s) AS sgl FROM sh),
common AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_common
  FROM ex a JOIN ex b ON a.sgl = b.sgl AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, len(s) AS n_sh FROM sh),
jpairs AS (
  SELECT d1, d2, n_common,
         n_common::DOUBLE / (s1.n_sh + s2.n_sh - n_common) AS jaccard
  FROM common
  JOIN sizes s1 ON d1 = s1.doc_id
  JOIN sizes s2 ON d2 = s2.doc_id
  WHERE n_common::DOUBLE / (s1.n_sh + s2.n_sh - n_common) >= {JACCARD_THRESHOLD}
)"""

ORACLE_JACCARD = f"""
WITH {_JACCARD_CTES}
SELECT d1, d2, n_common, round(jaccard, 6) AS jaccard FROM jpairs
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: jaccard pairs → connected components → one
    cluster_id per document (own id when unpaired). The iterative
    min-label-propagation runs on the real engine; the oracle recomputes the
    transitive closure with a recursive CTE."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs = jaccard_similarity_pairs(docs, threshold=JACCARD_THRESHOLD)
    return dup_clusters(docs, pairs)


ORACLE_CLUSTERS = f"""
WITH RECURSIVE {_JACCARD_CTES},
edges AS (
  SELECT d1 AS a, d2 AS b FROM jpairs
  UNION
  SELECT d2, d1 FROM jpairs
),
reach(node, lbl) AS (
    SELECT a, a FROM edges
  UNION
    SELECT e.a, r.lbl FROM edges e JOIN reach r ON e.b = r.node
),
comp AS (SELECT node, min(lbl) AS cluster FROM reach GROUP BY node)
SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS cluster_id
FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
"""


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    out = minhash_lsh_pairs(
        docs, n_hashes=N_HASHES, bands=BANDS, threshold=LSH_THRESHOLD
    )
    return out.select("d1", "d2", F.round("est_jaccard", 6).alias("est_jaccard"))


_SIG = duckdb_minhash64("s", N_HASHES)
_ROWS = N_HASHES // BANDS
_BAND_KEY = " || '|' || ".join(f"sig[b*{_ROWS}+{r + 1}]" for r in range(_ROWS))

ORACLE_MINHASH = f"""
WITH toks AS (SELECT doc_id, {_TOK} AS t FROM documents),
sh AS (SELECT doc_id, {_SH} AS s FROM toks WHERE len({_SH}) > 0),
sig AS (SELECT doc_id, {_SIG} AS sig FROM sh),
banded AS (
  SELECT doc_id, b, md5({_BAND_KEY}) AS bkey
  FROM sig, unnest(range(0, {BANDS})) AS u(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM banded a JOIN banded b
    ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id
),
est AS (
  SELECT d1, d2,
         list_sum(list_transform(range(1, {N_HASHES + 1}),
                  i -> CASE WHEN s1.sig[i] = s2.sig[i] THEN 1 ELSE 0 END))
           / {float(N_HASHES)} AS est_jaccard
  FROM cand JOIN sig s1 ON d1 = s1.doc_id JOIN sig s2 ON d2 = s2.doc_id
)
SELECT d1, d2, round(est_jaccard, 6) AS est_jaccard
FROM est WHERE est_jaccard >= {LSH_THRESHOLD}
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density-adaptive since r7: `simhash_pairs_auto` prices the
    pigeonhole candidate join with one aggregate and dispatches
    exact-GEMM (this corpus is near-dup-dense → GEMM, the same plan as
    rounds 1-6) vs the distributed bucketed join (sparse/huge corpora).
    Both kernels are exact — the oracle is kernel-independent."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return simhash_pairs_auto(docs, max_hamming=MAX_HAMMING)


def _simhash_oracle() -> str:
    nib_list = (
        "list_transform(range(1, 16), p -> "
        "strpos('0123456789abcdef', substr(h, CAST(p AS INT), 1)) - 1)"
    )
    contribs = ", ".join(
        f"cnt * (CASE WHEN (nibs[{j // 4 + 1}] & {8 >> (j % 4)}) <> 0 THEN 1 ELSE -1 END) AS c{j}"
        for j in range(SIMHASH_BITS)
    )
    sums = ", ".join(f"sum(c{j}) AS s{j}" for j in range(SIMHASH_BITS))
    packed = " + ".join(
        f"CASE WHEN s{j} > 0 THEN CAST({1 << (SIMHASH_BITS - 1 - j)} AS BIGINT) ELSE 0 END"
        for j in range(SIMHASH_BITS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, tok, count(*) AS cnt FROM (
    SELECT doc_id, unnest({_TOK}) AS tok FROM documents
  ) GROUP BY doc_id, tok
),
h AS (SELECT doc_id, cnt, md5(tok) AS h FROM toks),
nib AS (SELECT doc_id, cnt, {nib_list} AS nibs FROM h),
contrib AS (SELECT doc_id, {contribs} FROM nib),
sums AS (SELECT doc_id, {sums} FROM contrib GROUP BY doc_id),
sh AS (SELECT doc_id, {packed} AS simhash FROM sums)
SELECT a.doc_id AS d1, b.doc_id AS d2,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {MAX_HAMMING}
"""


def q_dedup_simhash_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The beyond-broadcast SimHash path: pigeonhole chunk equi-join, no
    driver collect — identical output to ``dedup_simhash`` (same oracle)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return simhash_pairs_bucketed(docs, max_hamming=MAX_HAMMING)


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-scale embedding near-dup, size-dispatched (r11): vector
    tables provably under ``EMB_GEMM_MAX_BYTES`` take the broadcast
    blocked-GEMM kernel (one Python boundary, no shuffle); bigger corpora
    take the lossless angular IVF bucketing + within-bucket GEMM, whose
    vector table is never collected. The bucketing model (centroids +
    α_max) is a build-once artifact keyed to the corpus snapshot, like the
    search indexes, and is only loaded/built on the bucketed branch. Both
    kernels emit identical rows (pinned)."""
    from pyvectorsearch_spark.index.cache import build_or_load
    from pyvectorsearch_spark.sources.tables import dataset_tag
    from pyvectorsearch_spark.operators.dedup import (
        AngularModel,
        angular_bucket_model,
        embedding_dup_pairs_auto,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    out = embedding_dup_pairs_auto(
        emb,
        min_cosine=MIN_COSINE,
        model_fn=lambda: build_or_load(
            spark,
            f"angular16_seed42_{dataset_tag(sf_dir, 'embeddings')}",
            load=AngularModel.load,
            build=lambda: angular_bucket_model(emb, n_lists=16, seed=42),
        ),
    )
    return out.select("d1", "d2", F.round("cosine", 6).alias("cosine"))


_COS = duckdb_cosine("a.embedding", "b.embedding", 64)

ORACLE_EMB_COSINE = f"""
SELECT a.vec_id AS d1, b.vec_id AS d2, round({_COS}, 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {_COS} >= {MIN_COSINE}
"""


QUERIES = {
    "dedup_exact_stats": q_dedup_exact_stats,
    "dedup_exact_keep": q_dedup_exact_keep,
    "dedup_jaccard_pairs": q_dedup_jaccard,
    "dedup_clusters": q_dedup_clusters,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "dedup_simhash_bucketed": q_dedup_simhash_bucketed,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
}

ORACLES = {
    "dedup_exact_stats": ORACLE_EXACT,
    "dedup_exact_keep": ORACLE_EXACT_KEEP,
    "dedup_jaccard_pairs": ORACLE_JACCARD,
    "dedup_clusters": ORACLE_CLUSTERS,
    "dedup_minhash_lsh": ORACLE_MINHASH,
    "dedup_simhash": _simhash_oracle(),
    "dedup_simhash_bucketed": _simhash_oracle(),
    "dedup_embedding_cosine": ORACLE_EMB_COSINE,
}
