"""Embedding-space semantic dedup keep-set (outside the driver's pinned
50-entry window; covered by tests/test_oracle_parity.py).

SemDeDup-style (Abbas et al. 2023) survivor derivation: from the lossless
bucketed near-dup pair list (angular IVF bucketing + within-bucket GEMM,
`operators/dedup.py::embedding_dup_pairs_bucketed`), drop every vector that
appears as the HIGHER id of a near-dup pair — the deterministic keep-first
rule — and report per-label survivor counts with an id-set digest.

Scale shape: the drop set is pair-list-sized (not corpus-sized) and the
survivor derivation is one left-anti join; the vector table is never
collected. The oracle recomputes the pair list by brute-force O(n²) cosine in
DuckDB — tractable at sf0.01, and exact because the bucketed path is lossless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.functions.vector import duckdb_cosine
from pyvectorsearch_spark.operators.dedup import (
    AngularModel,
    angular_bucket_model,
    embedding_dup_pairs_bucketed,
)
from pyvectorsearch_spark.queries.dedup import BANDS, LSH_THRESHOLD, MIN_COSINE, N_HASHES
from pyvectorsearch_spark.sources.tables import dataset_tag, load_table, spread


def q_dedup_embedding_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-dedup survivors per label: drop the higher id of every
    cosine >= MIN_COSINE pair (same cached angular model as
    `dedup_embedding_cosine` — steady-state runs reuse the artifact)."""
    from pyvectorsearch_spark.index.cache import build_or_load

    emb = load_table(spark, sf_dir, "embeddings")
    model = build_or_load(
        spark,
        f"angular16_seed42_{dataset_tag(sf_dir, 'embeddings')}",
        load=AngularModel.load,
        build=lambda: angular_bucket_model(emb, n_lists=16, seed=42),
    )
    pairs = embedding_dup_pairs_bucketed(emb, min_cosine=MIN_COSINE, model=model)
    drop = pairs.select(F.col("d2").alias("vec_id")).distinct()
    kept = emb.join(drop, "vec_id", "left_anti")
    totals = emb.groupBy("label").agg(F.count("*").cast("bigint").alias("n_total"))
    kept_agg = kept.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list("vec_id")),
                    lambda x: x.cast("string"),
                ),
            )
        ).alias("kept_digest"),
    )
    return (
        totals.join(kept_agg, "label", "left")
        .select(
            "label",
            "n_total",
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.coalesce("kept_digest", F.md5(F.lit(""))).alias("kept_digest"),
        )
        .orderBy("label")
    )


_COS = duckdb_cosine("a.embedding", "b.embedding", 64)

ORACLE_EMB_KEEP = f"""
WITH drop_set AS (
  SELECT DISTINCT b.vec_id FROM embeddings a JOIN embeddings b
    ON a.vec_id < b.vec_id
  WHERE {_COS} >= {MIN_COSINE}
),
kept AS (
  SELECT * FROM embeddings WHERE vec_id NOT IN (SELECT vec_id FROM drop_set)
),
totals AS (
  SELECT label, count(*)::BIGINT AS n_total FROM embeddings GROUP BY label
),
ka AS (
  SELECT label, count(*)::BIGINT AS n_kept,
         md5(string_agg(vec_id::VARCHAR, ',' ORDER BY vec_id)) AS kept_digest
  FROM kept GROUP BY label
)
SELECT t.label, t.n_total,
       coalesce(ka.n_kept, 0)::BIGINT AS n_kept,
       coalesce(ka.kept_digest, md5('')) AS kept_digest
FROM totals t LEFT JOIN ka USING (label) ORDER BY t.label
"""


PR_DAMPING = 0.85
PR_ITERS = 3


def q_dedup_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the Jaccard near-dup graph (3 fixed rounds,
    deterministic rounding): high-rank nodes are the natural cluster
    representatives. The oracle unrolls the identical 3 rounds as CTE
    layers over the same brute-force pair derivation."""
    from pyvectorsearch_spark.operators.dedup import jaccard_similarity_pairs
    from pyvectorsearch_spark.operators.graph import pagerank
    from pyvectorsearch_spark.queries.dedup import JACCARD_THRESHOLD
    from pyvectorsearch_spark.sources.tables import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs = jaccard_similarity_pairs(docs, threshold=JACCARD_THRESHOLD)
    return pagerank(
        pairs, damping=PR_DAMPING, iters=PR_ITERS
    ).orderBy(F.desc("pagerank"), "node")


def _oracle_pagerank() -> str:
    # _JACCARD_CTES already ends with the thresholded `jpairs` CTE
    from pyvectorsearch_spark.queries.dedup import _JACCARD_CTES

    rounds = []
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        rounds.append(
            f"""r{i} AS (
  SELECT e.a AS node,
         round({1.0 - PR_DAMPING} + {PR_DAMPING}
               * round(sum(round({prev}.r / deg._deg, 6)), 6), 6) AS r
  FROM edges e
  JOIN deg ON deg.node = e.b
  JOIN {prev} ON {prev}.node = e.b
  GROUP BY e.a
)"""
        )
        prev = f"r{i}"
    rounds_sql = ",\n".join(rounds)
    return f"""
WITH {_JACCARD_CTES},
edges AS (
  SELECT d1 AS a, d2 AS b FROM jpairs
  UNION
  SELECT d2, d1 FROM jpairs
),
deg AS (SELECT b AS node, count(*) AS _deg FROM edges GROUP BY b),
r0 AS (SELECT node, 1.0 AS r FROM deg),
{rounds_sql}
SELECT node, r AS pagerank FROM {prev}
ORDER BY pagerank DESC, node
"""


ORACLE_DEDUP_PAGERANK = _oracle_pagerank()


ED_MAX_DIST = 30
ED_CAND_THRESHOLD = 0.3


def q_dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level near-dup pairs: LSH candidates verified by exact
    Levenshtein <= 30 on the normalized text (length-difference prefilter
    before the quadratic DP; Spark's thresholded levenshtein abandons the
    DP early)."""
    from pyvectorsearch_spark.operators.dedup import edit_distance_pairs
    from pyvectorsearch_spark.sources.tables import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    return edit_distance_pairs(
        docs, max_dist=ED_MAX_DIST, candidate_threshold=ED_CAND_THRESHOLD
    ).orderBy("d1", "d2")


def _oracle_edit_distance() -> str:
    from pyvectorsearch_spark.queries.dedup import (
        _BAND_KEY,
        _SH,
        _SIG,
        _TOK,
        BANDS,
        N_HASHES,
    )

    return f"""
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
),
texts AS (SELECT doc_id, array_to_string({_TOK}, ' ') AS nt FROM documents),
v AS (
  SELECT e.d1, e.d2, levenshtein(t1.nt, t2.nt) AS edit_dist
  FROM est e
  JOIN texts t1 ON t1.doc_id = e.d1
  JOIN texts t2 ON t2.doc_id = e.d2
  WHERE e.est_jaccard >= {ED_CAND_THRESHOLD}
    AND abs(length(t1.nt) - length(t2.nt)) <= {ED_MAX_DIST}
)
SELECT d1, d2, edit_dist::INT AS edit_dist FROM v
WHERE edit_dist <= {ED_MAX_DIST}
ORDER BY d1, d2
"""


ORACLE_DEDUP_EDIT_DISTANCE = _oracle_edit_distance()


def q_dedup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the SimHash near-dup graph (the densest pair
    source: ~1.7k edges at sf0.01): is the graph clique-like (high global
    clustering => LSH buckets are real duplicate groups) or chain-like
    (low => single-linkage clusters are gluing strangers through
    middlemen)?"""
    from pyvectorsearch_spark.operators.dedup import simhash_pairs
    from pyvectorsearch_spark.operators.graph import triangle_stats
    from pyvectorsearch_spark.queries.dedup import MAX_HAMMING
    from pyvectorsearch_spark.sources.tables import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs = simhash_pairs(docs, max_hamming=MAX_HAMMING)
    return triangle_stats(pairs)


def _oracle_triangles() -> str:
    from pyvectorsearch_spark.queries.dedup import _simhash_oracle

    # the full simhash pair query nests as a CTE body (DuckDB allows a
    # WITH-bearing subquery inside a CTE)
    return f"""
WITH pairs AS ({_simhash_oracle()}),
e AS (SELECT DISTINCT d1 AS a, d2 AS b FROM pairs),
tri AS (
  SELECT count(*)::BIGINT AS n_triangles
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
und AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
deg AS (SELECT a, count(*)::BIGINT AS d FROM und GROUP BY a),
ns AS (
  SELECT count(*)::BIGINT AS n_nodes,
         sum((d * (d - 1)) // 2)::BIGINT AS n_wedges
  FROM deg
),
es AS (SELECT count(*)::BIGINT AS n_edges FROM e)
SELECT n_nodes, n_edges, n_triangles, n_wedges,
       CASE WHEN n_wedges > 0
            THEN round(3.0 * n_triangles / n_wedges, 6)
            ELSE 0.0 END AS gcc_r
FROM ns, es, tri
"""


ORACLE_DEDUP_TRIANGLES = _oracle_triangles()


LPA_ITERS = 2


def q_dedup_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation community sizes over the SimHash near-dup graph —
    the finer-grained alternative to connected components when
    single-linkage over-merges (chain-shaped graphs split into locally
    dense communities). Fixed 2 rounds, deterministic tie-break; the
    oracle unrolls the identical rounds as CTE layers."""
    from pyvectorsearch_spark.operators.dedup import simhash_pairs
    from pyvectorsearch_spark.operators.graph import label_propagation
    from pyvectorsearch_spark.queries.dedup import MAX_HAMMING
    from pyvectorsearch_spark.sources.tables import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs = simhash_pairs(docs, max_hamming=MAX_HAMMING)
    labels = label_propagation(pairs, iters=LPA_ITERS)
    return (
        labels.groupBy("community")
        .agg(F.count("*").cast("bigint").alias("n_members"))
        .orderBy("community")
    )


def _oracle_lpa() -> str:
    from pyvectorsearch_spark.queries.dedup import _simhash_oracle

    rounds = []
    prev = "l0"
    for i in range(1, LPA_ITERS + 1):
        rounds.append(
            f"""c{i} AS (
  SELECT e.a, l.lbl, count(*)::BIGINT AS n
  FROM edges e JOIN {prev} l ON l.node = e.b
  GROUP BY e.a, l.lbl
),
l{i} AS (
  SELECT a AS node, lbl FROM (
    SELECT a, lbl,
           row_number() OVER (PARTITION BY a ORDER BY n DESC, lbl ASC) AS rn
    FROM c{i}
  ) WHERE rn = 1
)"""
        )
        prev = f"l{i}"
    return f"""
WITH pairs AS ({_simhash_oracle()}),
edges AS (
  SELECT DISTINCT a, b FROM (
    SELECT d1 AS a, d2 AS b FROM pairs
    UNION ALL SELECT d2, d1 FROM pairs
  )
),
l0 AS (SELECT DISTINCT b AS node, b AS lbl FROM edges),
{", ".join(rounds)}
SELECT lbl AS community, count(*)::BIGINT AS n_members
FROM {prev} GROUP BY lbl ORDER BY community
"""


ORACLE_DEDUP_LPA = _oracle_lpa()


def q_dedup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: MinHash-LSH near-dup pairs rolled
    up to (source, source) counts — which corpus slices copy from each
    other. The pair table is already reduced; attaching sources is two
    joins against the (doc_id, source) projection, and the unordered pair
    is normalized with least/greatest so each source pair counts once."""
    from pyvectorsearch_spark.operators.dedup import minhash_lsh_pairs
    from pyvectorsearch_spark.queries.dedup import (
        BANDS,
        LSH_THRESHOLD,
        N_HASHES,
    )
    from pyvectorsearch_spark.sources.tables import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs = minhash_lsh_pairs(
        docs, n_hashes=N_HASHES, bands=BANDS, threshold=LSH_THRESHOLD
    )
    src = docs.select("doc_id", "source")
    m = (
        pairs.join(
            src.withColumnRenamed("doc_id", "d1").withColumnRenamed(
                "source", "_s1"
            ),
            "d1",
        )
        .join(
            src.withColumnRenamed("doc_id", "d2").withColumnRenamed(
                "source", "_s2"
            ),
            "d2",
        )
        .select(
            F.least("_s1", "_s2").alias("source_a"),
            F.greatest("_s1", "_s2").alias("source_b"),
        )
    )
    return (
        m.groupBy("source_a", "source_b")
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
        .orderBy("source_a", "source_b")
    )


def _oracle_source_matrix() -> str:
    from pyvectorsearch_spark.queries.dedup import ORACLE_MINHASH

    return f"""
WITH pairs AS ({ORACLE_MINHASH}),
m AS (
  SELECT least(a.source, b.source) AS source_a,
         greatest(a.source, b.source) AS source_b
  FROM pairs
  JOIN documents a ON a.doc_id = pairs.d1
  JOIN documents b ON b.doc_id = pairs.d2
)
SELECT source_a, source_b, count(*)::BIGINT AS n_pairs
FROM m GROUP BY source_a, source_b ORDER BY source_a, source_b
"""


ORACLE_DEDUP_SOURCE_MATRIX = _oracle_source_matrix()



TFIDF_COS_THRESHOLD = 0.6


def q_dedup_tfidf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted lexical near-dup verify: MinHash-LSH candidates re-scored
    by cosine over L2-normalized TF-IDF vectors (rare shared terms count
    more than stopwords — the sparse-vector alternative to set-Jaccard
    verification). Full determinism ladder, so the score itself is
    hash-checked."""
    from pyvectorsearch_spark.operators.dedup import minhash_lsh_pairs
    from pyvectorsearch_spark.operators.textops import tfidf_cosine_pairs
    from pyvectorsearch_spark.queries.dedup import (
        BANDS,
        LSH_THRESHOLD,
        N_HASHES,
    )
    from pyvectorsearch_spark.sources.tables import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    cand = minhash_lsh_pairs(
        docs, n_hashes=N_HASHES, bands=BANDS, threshold=LSH_THRESHOLD
    )
    return tfidf_cosine_pairs(
        docs, cand, threshold=TFIDF_COS_THRESHOLD
    ).orderBy("d1", "d2")


def _oracle_tfidf_cosine() -> str:
    from pyvectorsearch_spark.queries.dedup import _TOK, ORACLE_MINHASH

    return f"""
WITH cand AS ({ORACLE_MINHASH}),
e AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM e GROUP BY doc_id, term
),
nd AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n FROM documents),
w AS (
  SELECT doc_id, term,
         round(tf * (ln((n + 1.0) / (df + 1.0)) + 1.0), 6) AS w
  FROM (
    SELECT doc_id, term, tf,
           count(*) OVER (PARTITION BY term)::DOUBLE AS df
    FROM tf
  ), nd
),
nrm AS (
  SELECT doc_id, sqrt(round(sum(round(w * w, 6)), 6)) AS norm
  FROM w GROUP BY doc_id
),
u AS (
  SELECT w.doc_id, term, round(w / norm, 6) AS u
  FROM w JOIN nrm ON nrm.doc_id = w.doc_id
),
p AS (
  SELECT c.d1, c.d2, round(u1.u * u2.u, 6) AS p
  FROM cand c
  JOIN u u1 ON u1.doc_id = c.d1
  JOIN u u2 ON u2.doc_id = c.d2 AND u2.term = u1.term
),
sc AS (SELECT d1, d2, round(sum(p), 6) AS cos_r FROM p GROUP BY d1, d2)
SELECT d1, d2, cos_r FROM sc
WHERE cos_r >= {TFIDF_COS_THRESHOLD}
ORDER BY d1, d2
"""


ORACLE_DEDUP_TFIDF_COSINE = _oracle_tfidf_cosine()


QUERIES = {
    "dedup_embedding_keep": q_dedup_embedding_keep,
    "dedup_pagerank": q_dedup_pagerank,
    "dedup_edit_distance": q_dedup_edit_distance,
    "dedup_triangles": q_dedup_triangles,
    "dedup_lpa_communities": q_dedup_lpa_communities,
    "dedup_source_matrix": q_dedup_source_matrix,
    "dedup_tfidf_cosine": q_dedup_tfidf_cosine,
}
ORACLES = {
    "dedup_embedding_keep": ORACLE_EMB_KEEP,
    "dedup_pagerank": ORACLE_DEDUP_PAGERANK,
    "dedup_edit_distance": ORACLE_DEDUP_EDIT_DISTANCE,
    "dedup_triangles": ORACLE_DEDUP_TRIANGLES,
    "dedup_lpa_communities": ORACLE_DEDUP_LPA,
    "dedup_source_matrix": ORACLE_DEDUP_SOURCE_MATRIX,
    "dedup_tfidf_cosine": ORACLE_DEDUP_TFIDF_COSINE,
}


SRP_BITS = 16
SRP_BANDS = 4
SRP_MIN_COSINE = MIN_COSINE  # same calibrated tail as dedup_embedding_cosine


def q_dedup_srp_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane (SRP) LSH near-dup candidates on the 64-d embeddings,
    verified by exact cosine — the model-free alternative to the angular
    IVF bucketing (no k-means artifact, probabilistic recall). Hyperplanes
    are md5-derived integers, the projection a fixed-order fold, so the
    candidate set — and therefore the verified OUTPUT — is engine-exact."""
    from pyvectorsearch_spark.operators.dedup import srp_lsh_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return srp_lsh_pairs(
        emb,
        dim=64,
        n_bits=SRP_BITS,
        bands=SRP_BANDS,
        min_cosine=SRP_MIN_COSINE,
    ).orderBy("d1", "d2")


def _oracle_srp() -> str:
    from pyvectorsearch_spark.operators.dedup import _srp_hyperplanes

    H = _srp_hyperplanes(SRP_BITS, 64)
    rows = SRP_BITS // SRP_BANDS

    def proj(j: int) -> str:
        lits = ", ".join(f"{float(h)!r}" for h in H[j])
        return (
            f"list_sum(list_transform(range(1, 65), i -> "
            f"CAST(embedding[i] AS DOUBLE) * ([{lits}])[i]))"
        )

    def band_key(b: int) -> str:
        cases = " || ".join(
            f"(CASE WHEN {proj(b * rows + r)} >= 0 THEN '1' ELSE '0' END)"
            for r in range(rows)
        )
        return cases

    keys = ", ".join(f"{band_key(b)} AS bk{b}" for b in range(SRP_BANDS))
    banded_rows = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, bk{b} AS bkey FROM sig"
        for b in range(SRP_BANDS)
    )
    cos = duckdb_cosine("e1.embedding", "e2.embedding", 64)
    return f"""
WITH sig AS (SELECT vec_id, {keys} FROM embeddings),
banded AS ({banded_rows}),
cand AS (
  SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id
),
v AS (
  SELECT d1, d2, round({cos}, 6) AS cosine
  FROM cand
  JOIN embeddings e1 ON e1.vec_id = d1
  JOIN embeddings e2 ON e2.vec_id = d2
)
SELECT d1, d2, cosine FROM v
WHERE cosine >= {SRP_MIN_COSINE}
ORDER BY d1, d2
"""


ORACLE_DEDUP_SRP = _oracle_srp()


CONTAINMENT_THRESHOLD = 0.8


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment join: d1's shingle set 0.8-contained in d2's
    (quote-inclusion / subset duplication — invisible to symmetric Jaccard
    when the container is much larger). Probe-prefix filtering, full
    postings on the indexed side, exact array_intersect verify."""
    from pyvectorsearch_spark.operators.dedup import containment_pairs
    from pyvectorsearch_spark.sources.tables import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    return containment_pairs(
        docs, threshold=CONTAINMENT_THRESHOLD
    ).orderBy("d1", "d2")


def _oracle_containment() -> str:
    from pyvectorsearch_spark.queries.dedup import _SH, _TOK

    return f"""
WITH toks AS (SELECT doc_id, {_TOK} AS t FROM documents),
sh AS (SELECT doc_id, {_SH} AS s FROM toks WHERE len({_SH}) > 0),
ex AS (SELECT doc_id, unnest(s) AS sgl FROM sh),
common AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_common
  FROM ex a JOIN ex b ON a.sgl = b.sgl AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, len(s) AS n_sh FROM sh),
c AS (
  SELECT d1, d2, n_common,
         round(n_common::DOUBLE / s1.n_sh, 6) AS containment
  FROM common JOIN sizes s1 ON d1 = s1.doc_id
)
SELECT d1, d2, n_common, containment FROM c
WHERE containment >= {CONTAINMENT_THRESHOLD}
ORDER BY d1, d2
"""


ORACLE_DEDUP_CONTAINMENT = _oracle_containment()

QUERIES.update(
    {
        "dedup_srp_lsh": q_dedup_srp_lsh,
        "dedup_containment": q_dedup_containment,
    }
)
ORACLES.update(
    {
        "dedup_srp_lsh": ORACLE_DEDUP_SRP,
        "dedup_containment": ORACLE_DEDUP_CONTAINMENT,
    }
)


def q_dedup_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-representative selection — the KEEP side of near-dup
    clustering: within every multi-doc Jaccard cluster keep the
    highest-quality member (tie → lowest id), not the arbitrary min-id.
    Output (cluster_id, rep_id, n_members, rep_quality) per cluster.

    Scale shape: the cluster table is pairs-sized; quality is a zero-shuffle
    projection on the scan; the argmax is one window over cluster-sized
    groups (bounded by near-dup group width, not the corpus)."""
    from pyspark.sql import Window

    from pyvectorsearch_spark.functions.text import tokens
    from pyvectorsearch_spark.operators.dedup import jaccard_similarity_pairs
    from pyvectorsearch_spark.operators.graph import connected_components
    from pyvectorsearch_spark.operators.textops import quality_score_col
    from pyvectorsearch_spark.queries.dedup import JACCARD_THRESHOLD
    from pyvectorsearch_spark.sources.tables import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs = jaccard_similarity_pairs(docs, threshold=JACCARD_THRESHOLD)
    comp = connected_components(pairs)
    q = docs.select(
        F.col("doc_id").alias("node"),
        quality_score_col(F.col("text"), tokens("text")).alias("_q"),
    )
    j = comp.join(q, "node")
    w = Window.partitionBy("cluster").orderBy(F.desc("_q"), F.asc("node"))
    reps = (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("cluster").alias("cluster_id"),
            F.col("node").alias("rep_id"),
            F.col("_q").alias("rep_quality"),
        )
    )
    sizes = comp.groupBy(F.col("cluster").alias("cluster_id")).agg(
        F.count("*").cast("bigint").alias("n_members")
    )
    return (
        reps.join(sizes, "cluster_id")
        .select("cluster_id", "rep_id", "n_members", "rep_quality")
        .orderBy("cluster_id")
    )


def _oracle_representatives() -> str:
    from pyvectorsearch_spark.functions.text import duckdb_quality, duckdb_tokens
    from pyvectorsearch_spark.queries.dedup import _JACCARD_CTES

    qual = duckdb_quality("d.text", duckdb_tokens("d.text"))
    return f"""
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
comp AS (SELECT node, min(lbl) AS cluster FROM reach GROUP BY node),
q AS (
  SELECT c.node, c.cluster, {qual} AS q
  FROM comp c JOIN documents d ON d.doc_id = c.node
),
r AS (
  SELECT cluster AS cluster_id, node AS rep_id, q AS rep_quality,
         row_number() OVER (PARTITION BY cluster ORDER BY q DESC, node ASC) AS rn
  FROM q
),
s AS (SELECT cluster AS cluster_id, count(*)::BIGINT AS n_members FROM comp GROUP BY cluster)
SELECT r.cluster_id, r.rep_id, s.n_members, r.rep_quality
FROM r JOIN s USING (cluster_id)
WHERE r.rn = 1
ORDER BY cluster_id
"""


ORACLE_DEDUP_REPRESENTATIVES = _oracle_representatives()

QUERIES.update({"dedup_representatives": q_dedup_representatives})
ORACLES.update({"dedup_representatives": ORACLE_DEDUP_REPRESENTATIVES})


KCORE_K = 3
KCORE_ROUNDS = 4


def q_dedup_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling of the SimHash near-dup graph (k=3, 4 simultaneous
    peel rounds): the dense backbone that survives after weakly-attached
    nodes drop — a stricter community signal than connected components
    (chains and pendants peel away). Fixed rounds keep the result a pure
    function of the input; the oracle unrolls the identical rounds."""
    from pyvectorsearch_spark.operators.dedup import simhash_pairs
    from pyvectorsearch_spark.operators.graph import kcore_peel
    from pyvectorsearch_spark.queries.dedup import MAX_HAMMING
    from pyvectorsearch_spark.sources.tables import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs = simhash_pairs(docs, max_hamming=MAX_HAMMING)
    return kcore_peel(pairs, k=KCORE_K, rounds=KCORE_ROUNDS).orderBy("node")


def _oracle_kcore() -> str:
    from pyvectorsearch_spark.queries.dedup import _simhash_oracle

    layers = []
    prev = "e0"
    for i in range(1, KCORE_ROUNDS + 1):
        # MATERIALIZED: each layer is referenced 3x downstream — without it
        # DuckDB may inline the whole chain repeatedly (measured ~50 s;
        # materialized ~1 s)
        layers.append(f"""k{i} AS MATERIALIZED (
  SELECT a FROM (SELECT a, count(*) AS d FROM {prev} GROUP BY a) WHERE d >= {KCORE_K}
),
e{i} AS MATERIALIZED (
  SELECT a, b FROM {prev}
  WHERE a IN (SELECT a FROM k{i}) AND b IN (SELECT a FROM k{i})
)""")
        prev = f"e{i}"
    return f"""
WITH pairs AS MATERIALIZED ({_simhash_oracle()}),
e0 AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT d1 AS a, d2 AS b FROM pairs
    UNION ALL SELECT d2, d1 FROM pairs
  )
),
{", ".join(layers)}
SELECT a AS node, count(*)::BIGINT AS deg FROM {prev}
GROUP BY a HAVING count(*) >= {KCORE_K} ORDER BY node
"""


ORACLE_DEDUP_KCORE = _oracle_kcore()

QUERIES.update({"dedup_kcore": q_dedup_kcore})
ORACLES.update({"dedup_kcore": ORACLE_DEDUP_KCORE})


# --- MinHash estimator accuracy -------------------------------------------

MH_ACC_THRESHOLD = 0.25  # low cut so genuinely-mid pairs are in the report


def q_dedup_minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-vs-truth accuracy report: for every LSH candidate pair at a
    low signature-estimate cut, the 16-component signature estimate, the
    EXACT shingle Jaccard, and the absolute error — the eval that tells you
    whether the (n_hashes, bands) operating point is trustworthy before you
    dedup 100 TB with it. The eval itself is hash-checked (the sq8-recall
    pattern: both the approximation and the truth are SQL-expressible).

    Scale shape: LSH candidates as usual; the exact side joins the pair
    list (candidates, not the corpus square) back to per-doc distinct
    shingle SETS, so exact verification touches only candidate pairs."""
    from pyvectorsearch_spark.functions.text import shingles, tokens
    from pyvectorsearch_spark.operators.dedup import minhash_lsh_pairs

    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs = minhash_lsh_pairs(
        docs, n_hashes=N_HASHES, bands=BANDS, threshold=MH_ACC_THRESHOLD
    )
    ss = docs.select(
        F.col("doc_id"),
        F.array_distinct(shingles(tokens("text"), 3)).alias("sset"),
    ).filter(F.size("sset") > 0)
    s1 = ss.select(F.col("doc_id").alias("d1"), F.col("sset").alias("ss1"))
    s2 = ss.select(F.col("doc_id").alias("d2"), F.col("sset").alias("ss2"))
    inter = F.size(F.array_intersect("ss1", "ss2")).cast("double")
    uni = (F.size("ss1") + F.size("ss2") - F.size(F.array_intersect("ss1", "ss2"))).cast(
        "double"
    )
    exact = inter / uni
    est = F.round("est_jaccard", 6)
    return (
        pairs.join(s1, "d1")
        .join(s2, "d2")
        .select(
            "d1",
            "d2",
            est.alias("est_jaccard"),
            F.round(exact, 6).alias("exact_jaccard"),
            F.round(F.abs(est - F.round(exact, 6)), 6).alias("abs_err"),
        )
        .orderBy("d1", "d2")
    )


def _minhash_accuracy_oracle() -> str:
    from pyvectorsearch_spark.queries.dedup import (
        _BAND_KEY,
        _SH,
        _SIG,
        _TOK,
    )

    rows = N_HASHES // BANDS  # noqa: F841 — _BAND_KEY already bakes it in
    return f"""
WITH toks AS (SELECT doc_id, {_TOK} AS t FROM documents),
sh AS (SELECT doc_id, {_SH} AS s FROM toks WHERE len({_SH}) > 0),
sig AS (SELECT doc_id, {_SIG} AS sig FROM sh),
sset AS (SELECT doc_id, list_distinct(s) AS ss FROM sh),
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
         round(list_sum(list_transform(range(1, {N_HASHES + 1}),
                  i -> CASE WHEN s1.sig[i] = s2.sig[i] THEN 1 ELSE 0 END))
           / {float(N_HASHES)}, 6) AS est_jaccard
  FROM cand JOIN sig s1 ON d1 = s1.doc_id JOIN sig s2 ON d2 = s2.doc_id
),
ex AS (
  SELECT d1, d2, est_jaccard,
         round(len(list_intersect(a.ss, b.ss))
               / (len(a.ss) + len(b.ss)
                  - len(list_intersect(a.ss, b.ss)))::DOUBLE, 6)
           AS exact_jaccard
  FROM est JOIN sset a ON d1 = a.doc_id JOIN sset b ON d2 = b.doc_id
  WHERE est_jaccard >= {MH_ACC_THRESHOLD}
)
SELECT d1, d2, est_jaccard, exact_jaccard,
       round(abs(est_jaccard - exact_jaccard), 6) AS abs_err
FROM ex ORDER BY d1, d2
"""


ORACLE_DEDUP_MINHASH_ACCURACY = _minhash_accuracy_oracle()

QUERIES.update({"dedup_minhash_accuracy": q_dedup_minhash_accuracy})
ORACLES.update({"dedup_minhash_accuracy": ORACLE_DEDUP_MINHASH_ACCURACY})


# --- incremental delta dedup ----------------------------------------------


def q_dedup_incremental_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental batch-vs-corpus dedup (the daily-ingest shape): corpus =
    doc_id % 5 != 0; delta = the % 5 == 0 slice plus re-keyed copies of the
    % 7 == 0 corpus docs (planted exact dups). Every delta doc gets a
    verdict (exact_dup / near_dup / unique) and its smallest matching corpus
    id; the corpus pair space is never touched. All three verdicts fire at
    sf0.01 (57 / 40 / 60)."""
    from pyvectorsearch_spark.operators.dedup import incremental_dedup_delta

    docs = spread(load_table(spark, sf_dir, "documents"))
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    nat = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id", "text")
    planted = corpus.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    delta = nat.unionByName(planted)
    return incremental_dedup_delta(corpus, delta, threshold=LSH_THRESHOLD).orderBy(
        "doc_id"
    )


def _incremental_delta_oracle() -> str:
    from pyvectorsearch_spark.queries.dedup import (
        _BAND_KEY,
        _SH,
        _SIG,
        _TOK,
        LSH_THRESHOLD,
    )

    return f"""
WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 != 0),
delta AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents
  WHERE doc_id % 5 != 0 AND doc_id % 7 = 0
),
cdig AS (SELECT md5(text) AS dg, min(doc_id) AS cid FROM corpus GROUP BY dg),
ex AS (
  SELECT d.doc_id AS did, min(c.cid) AS m
  FROM delta d JOIN cdig c ON md5(d.text) = c.dg GROUP BY did
),
surv AS (
  SELECT * FROM delta WHERE doc_id NOT IN (SELECT did FROM ex)
),
ctoks AS (SELECT doc_id, {_TOK} AS t FROM corpus),
csh AS (SELECT doc_id, {_SH} AS s FROM ctoks WHERE len({_SH}) > 0),
csig AS (SELECT doc_id, {_SIG} AS sig FROM csh),
dtoks AS (SELECT doc_id, {_TOK} AS t FROM surv),
dsh AS (SELECT doc_id, {_SH} AS s FROM dtoks WHERE len({_SH}) > 0),
dsig AS (SELECT doc_id, {_SIG} AS sig FROM dsh),
cband AS (
  SELECT doc_id AS cid, b, md5({_BAND_KEY}) AS bkey
  FROM csig, unnest(range(0, {BANDS})) AS u(b)
),
dband AS (
  SELECT doc_id AS did, b, md5({_BAND_KEY}) AS bkey
  FROM dsig, unnest(range(0, {BANDS})) AS u(b)
),
cand AS (
  SELECT DISTINCT d.did, c.cid
  FROM dband d JOIN cband c ON d.b = c.b AND d.bkey = c.bkey
),
est AS (
  SELECT did, cid,
         list_sum(list_transform(range(1, {N_HASHES + 1}),
                  i -> CASE WHEN s1.sig[i] = s2.sig[i] THEN 1 ELSE 0 END))
           / {float(N_HASHES)} AS e
  FROM cand JOIN dsig s1 ON did = s1.doc_id JOIN csig s2 ON cid = s2.doc_id
),
near AS (
  SELECT did, min(cid) AS m FROM est WHERE e >= {LSH_THRESHOLD} GROUP BY did
)
SELECT d.doc_id,
       CASE WHEN ex.m IS NOT NULL THEN 'exact_dup'
            WHEN near.m IS NOT NULL THEN 'near_dup'
            ELSE 'unique' END AS verdict,
       coalesce(ex.m, near.m) AS match_id
FROM delta d
LEFT JOIN ex ON d.doc_id = ex.did
LEFT JOIN near ON d.doc_id = near.did
ORDER BY d.doc_id
"""


ORACLE_DEDUP_INCREMENTAL_DELTA = _incremental_delta_oracle()

QUERIES.update({"dedup_incremental_delta": q_dedup_incremental_delta})
ORACLES.update({"dedup_incremental_delta": ORACLE_DEDUP_INCREMENTAL_DELTA})


# --- connected components, log-round algorithm ----------------------------


def q_dedup_clusters_twostar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same near-dup clustering contract as `dedup_clusters`, computed
    by the alternating large-star/small-star algorithm (Kiveris 2014) —
    O(log n) rounds regardless of graph diameter, the scale path when the
    similarity graph has long chains (min-label propagation needs diameter
    rounds). Same recursive-CTE oracle; the hypothesis property test pins
    algorithm equivalence on arbitrary graphs."""
    from pyvectorsearch_spark.operators.dedup import jaccard_similarity_pairs
    from pyvectorsearch_spark.operators.graph import connected_components_twostar
    from pyvectorsearch_spark.queries.dedup import JACCARD_THRESHOLD, ORACLE_CLUSTERS  # noqa: F401

    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs = jaccard_similarity_pairs(docs, threshold=JACCARD_THRESHOLD)
    comp = connected_components_twostar(pairs)
    return docs.join(comp, docs["doc_id"] == comp["node"], "left").select(
        docs["doc_id"],
        F.coalesce("cluster", docs["doc_id"]).alias("cluster_id"),
    )


def _twostar_oracle() -> str:
    from pyvectorsearch_spark.queries.dedup import ORACLE_CLUSTERS

    return ORACLE_CLUSTERS


ORACLE_DEDUP_CLUSTERS_TWOSTAR = _twostar_oracle()

QUERIES.update({"dedup_clusters_twostar": q_dedup_clusters_twostar})
ORACLES.update({"dedup_clusters_twostar": ORACLE_DEDUP_CLUSTERS_TWOSTAR})


# --- per-document novelty vs the corpus ------------------------------------


def q_delta_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-valuation companion to `dedup_incremental_delta`: for every
    delta document (the % 5 == 0 slice), the fraction of its DISTINCT word
    3-grams never seen in the corpus (% 5 != 0) — high-novelty docs are
    the ones worth paying for; near-zero novelty flags paraphrased or
    templated rehashes that exact/LSH screens miss. Scale shape: the
    corpus reduces to its distinct-shingle set once (reusable across
    batches, like the band table); the delta anti-joins it on the shingle
    key — no pair enumeration at all."""
    from pyvectorsearch_spark.functions.text import shingles, tokens

    docs = spread(load_table(spark, sf_dir, "documents"))
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    delta = docs.filter(F.col("doc_id") % 5 == 0)
    cs = corpus.select(
        F.explode(F.array_distinct(shingles(tokens("text"), 3))).alias("s")
    ).distinct()
    ds = delta.select(
        "doc_id", F.explode(F.array_distinct(shingles(tokens("text"), 3))).alias("s")
    )
    tot = ds.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("n_grams"))
    novel = (
        ds.join(cs, "s", "left_anti")
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_novel"))
    )
    return (
        tot.join(novel, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_novel", F.lit(0)).cast("bigint").alias("n_novel"),
            F.round(
                F.coalesce("n_novel", F.lit(0)) / F.col("n_grams"), 6
            ).alias("novelty_r"),
        )
        .orderBy("doc_id")
    )


def _delta_novelty_oracle() -> str:
    from pyvectorsearch_spark.queries.dedup import _SH, _TOK

    return f"""
WITH ctoks AS (
  SELECT doc_id, {_TOK} AS t FROM documents WHERE doc_id % 5 != 0
),
cs AS (
  SELECT DISTINCT unnest(list_distinct({_SH.replace("t", "t", 1)})) AS s
  FROM ctoks
),
dtoks AS (
  SELECT doc_id, {_TOK} AS t FROM documents WHERE doc_id % 5 = 0
),
ds AS (
  SELECT doc_id, unnest(list_distinct({_SH})) AS s FROM dtoks
),
tot AS (SELECT doc_id, count(*)::BIGINT AS n_grams FROM ds GROUP BY doc_id),
novel AS (
  SELECT doc_id, count(*)::BIGINT AS n_novel FROM ds
  WHERE s NOT IN (SELECT s FROM cs) GROUP BY doc_id
)
SELECT tot.doc_id, tot.n_grams,
       coalesce(novel.n_novel, 0)::BIGINT AS n_novel,
       round(coalesce(novel.n_novel, 0) / CAST(tot.n_grams AS DOUBLE), 6)
         AS novelty_r
FROM tot LEFT JOIN novel ON tot.doc_id = novel.doc_id
ORDER BY tot.doc_id
"""


ORACLE_DELTA_NOVELTY = _delta_novelty_oracle()

QUERIES.update({"delta_novelty": q_delta_novelty})
ORACLES.update({"delta_novelty": ORACLE_DELTA_NOVELTY})


SRP_MP_MIN_COSINE = 0.2  # low cut: multiprobe exists to catch mid-band pairs


def q_dedup_srp_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe SRP LSH (Lv et al. 2007 adapted to sign bits): the probe
    side also emits every band key with ONE bit flipped, so near-threshold
    pairs straddling a single hyperplane still collide — recall rises for a
    5x probe fan-out instead of more hash tables. Candidates stay
    deterministic, so the exact-cosine-verified output is hash-checked
    like `dedup_srp_lsh` despite probabilistic recall."""
    from pyvectorsearch_spark.operators.dedup import srp_lsh_pairs

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    return srp_lsh_pairs(
        emb,
        dim=64,
        n_bits=SRP_BITS,
        bands=SRP_BANDS,
        min_cosine=SRP_MP_MIN_COSINE,
        probe_flips=1,
    ).orderBy("d1", "d2")


def _oracle_srp_multiprobe() -> str:
    from pyvectorsearch_spark.operators.dedup import _srp_hyperplanes

    H = _srp_hyperplanes(SRP_BITS, 64)
    rows = SRP_BITS // SRP_BANDS

    def proj(j: int) -> str:
        lits = ", ".join(f"{float(h)!r}" for h in H[j])
        return (
            f"list_sum(list_transform(range(1, 65), i -> "
            f"CAST(embedding[i] AS DOUBLE) * ([{lits}])[i]))"
        )

    def band_key(b: int) -> str:
        return " || ".join(
            f"(CASE WHEN {proj(b * rows + r)} >= 0 THEN '1' ELSE '0' END)"
            for r in range(rows)
        )

    keys = ", ".join(f"{band_key(b)} AS bk{b}" for b in range(SRP_BANDS))
    banded_rows = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, bk{b} AS bkey FROM sig"
        for b in range(SRP_BANDS)
    )
    flips = " UNION ALL ".join(
        f"""SELECT vec_id, band,
       substr(bkey, 1, {p - 1})
       || (CASE substr(bkey, {p}, 1) WHEN '0' THEN '1' ELSE '0' END)
       || substr(bkey, {p + 1}) AS bkey
FROM banded"""
        for p in range(1, rows + 1)
    )
    cos = duckdb_cosine("e1.embedding", "e2.embedding", 64)
    return f"""
WITH sig AS (SELECT vec_id, {keys} FROM embeddings),
banded AS ({banded_rows}),
probe AS (SELECT * FROM banded UNION ALL {flips}),
cand AS (
  SELECT DISTINCT least(a.vec_id, b.vec_id) AS d1,
         greatest(a.vec_id, b.vec_id) AS d2
  FROM probe a JOIN banded b
    ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id != b.vec_id
),
v AS (
  SELECT d1, d2, round({cos}, 6) AS cosine
  FROM cand
  JOIN embeddings e1 ON e1.vec_id = d1
  JOIN embeddings e2 ON e2.vec_id = d2
)
SELECT d1, d2, cosine FROM v
WHERE cosine >= {SRP_MP_MIN_COSINE}
ORDER BY d1, d2
"""


ORACLE_DEDUP_SRP_MULTIPROBE = _oracle_srp_multiprobe()

QUERIES.update({"dedup_srp_multiprobe": q_dedup_srp_multiprobe})
ORACLES.update({"dedup_srp_multiprobe": ORACLE_DEDUP_SRP_MULTIPROBE})


# --- degree assortativity of the near-dup graph ------------------------------


def q_dedup_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the SimHash near-dup graph: the Pearson
    correlation between the degrees at the two ends of every edge (Newman
    2002). Positive ⇒ hubs link to hubs (template families chaining into
    one mega-cluster — single-linkage dedup will over-merge); negative ⇒
    hubs link to leaves (star-shaped boilerplate around a canonical doc).
    The structural companion to `dedup_triangles`' clustering coefficient.

    Determinism: degrees are integer counts, each undirected edge
    contributes both orientations (the standard symmetrization), and the
    correlation comes from exact bigint moment sums with one final rounded
    division — the `price_qty_corr` ladder on graph degrees.

    Scale: degrees come from one count per node over the edge list; the
    two degree joins are node-keyed equi-joins on the edges table (each a
    co-partitioned shuffle of edge-list size, never corpus size); moments
    collapse map-side to one row."""
    from pyvectorsearch_spark.operators.dedup import simhash_pairs
    from pyvectorsearch_spark.queries.dedup import MAX_HAMMING
    from pyvectorsearch_spark.sources.tables import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs = simhash_pairs(docs, max_hamming=MAX_HAMMING)
    e = pairs.select(
        F.least("d1", "d2").alias("a"), F.greatest("d1", "d2").alias("b")
    ).filter(F.col("a") != F.col("b")).distinct()
    # the SimHash pair generation above is the dominant cost and feeds
    # three plan branches (degrees + both degree joins): materialize once
    e = e.localCheckpoint(eager=True)
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = und.groupBy("a").agg(F.count("*").cast("bigint").alias("d"))
    xy = (
        und.join(deg.select(F.col("a"), F.col("d").alias("x")), "a")
        .join(
            deg.select(F.col("a").alias("b"), F.col("d").alias("y")), "b"
        )
        .select("x", "y")
    )
    m = xy.agg(
        F.count("*").cast("bigint").alias("m"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    # variance factors in DECIMAL(38,0): micro-unit moment products
    # pass 2^63 at realistic hourly magnitudes (the Spearman
    # overflow lesson) -- bigint would wrap silently with ANSI off
    dd = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    den2 = (
        (dd(m["m"]) * dd(m["sxx"]) - dd(m["sx"]) * dd(m["sx"]))
        * (dd(m["m"]) * dd(m["syy"]) - dd(m["sy"]) * dd(m["sy"]))
    )
    r = F.when(
        den2 > 0,
        F.round(
            (dd(m["m"]) * dd(m["sxy"])
             - dd(m["sx"]) * dd(m["sy"])).cast("double")
            / F.sqrt(den2.cast("double")),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return m.select(
        (F.col("m") / 2).cast("bigint").alias("n_edges"),
        r.alias("assortativity_r"),
    )


def _oracle_assortativity() -> str:
    from pyvectorsearch_spark.queries.dedup import _simhash_oracle

    return f"""
WITH pairs AS ({_simhash_oracle()}),
e AS (
  SELECT DISTINCT least(d1, d2) AS a, greatest(d1, d2) AS b
  FROM pairs WHERE d1 <> d2
),
und AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
deg AS (SELECT a, count(*)::BIGINT AS d FROM und GROUP BY a),
xy AS (
  SELECT dx.d AS x, dy.d AS y
  FROM und u
  JOIN deg dx ON dx.a = u.a
  JOIN deg dy ON dy.a = u.b
),
m AS (
  SELECT count(*)::BIGINT AS m, sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         sum(x * y)::BIGINT AS sxy,
         sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy
  FROM xy
)
SELECT (m // 2)::BIGINT AS n_edges,
       CASE WHEN (m::HUGEINT * sxx - sx::HUGEINT * sx) * (m::HUGEINT * syy - sy::HUGEINT * sy) > 0
            THEN round(CAST(m::HUGEINT * sxy - sx::HUGEINT * sy AS DOUBLE)
                       / sqrt(CAST((m::HUGEINT * sxx - sx::HUGEINT * sx)
                                   * (m::HUGEINT * syy - sy::HUGEINT * sy) AS DOUBLE)), 6)
            ELSE 0.0 END AS assortativity_r
FROM m
"""


ORACLE_DEDUP_ASSORTATIVITY = _oracle_assortativity()

QUERIES.update({"dedup_assortativity": q_dedup_assortativity})
ORACLES.update({"dedup_assortativity": ORACLE_DEDUP_ASSORTATIVITY})


# --- dedup threshold sensitivity curve -----------------------------------------


def q_dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-sensitivity curve for SimHash dedup: for every Hamming
    cutoff 0..MAX_HAMMING, the cumulative pair count and the number of
    documents swept into SOME pair — the tuning table that shows where the
    near-dup graph percolates (pairs explode, docs-involved jumps toward
    the corpus) so the cutoff is chosen from data, not folklore.

    Determinism: pure integer counts off the exact (d1, d2, hamming) pair
    table; doc involvement is a distinct count per threshold.

    Scale: one pair generation (the expensive part, shared across all
    thresholds), then a thresholds-sized broadcast fan-out over the pair
    list — the curve costs no more than one dedup run."""
    from pyvectorsearch_spark.operators.dedup import simhash_pairs
    from pyvectorsearch_spark.queries.dedup import MAX_HAMMING
    from pyvectorsearch_spark.sources.tables import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs = simhash_pairs(docs, max_hamming=MAX_HAMMING)
    # pair generation feeds both the cumulative-count and docs-involved
    # branches: materialize once instead of re-running the kernel per branch
    pairs = pairs.localCheckpoint(eager=True)
    th = spark.range(MAX_HAMMING + 1).select(
        F.col("id").cast("int").alias("threshold")
    )
    fan = pairs.crossJoin(F.broadcast(th)).filter(
        F.col("hamming") <= F.col("threshold")
    )
    cum = fan.groupBy("threshold").agg(
        F.count("*").cast("bigint").alias("n_pairs_cum")
    )
    docs_in = (
        fan.select(
            "threshold", F.explode(F.array("d1", "d2")).alias("_doc")
        )
        .groupBy("threshold")
        .agg(F.countDistinct("_doc").cast("bigint").alias("n_docs_involved"))
    )
    return (
        th.join(cum, "threshold", "left")
        .join(docs_in, "threshold", "left")
        .select(
            "threshold",
            F.coalesce("n_pairs_cum", F.lit(0)).cast("bigint").alias(
                "n_pairs_cum"
            ),
            F.coalesce("n_docs_involved", F.lit(0)).cast("bigint").alias(
                "n_docs_involved"
            ),
        )
        .orderBy("threshold")
    )


def _threshold_curve_oracle() -> str:
    from pyvectorsearch_spark.queries.dedup import MAX_HAMMING, _simhash_oracle

    return f"""
WITH pairs AS ({_simhash_oracle()}),
th AS (SELECT unnest(range({MAX_HAMMING + 1}))::INT AS threshold),
fan AS (
  SELECT t.threshold, p.d1, p.d2 FROM pairs p
  JOIN th t ON p.hamming <= t.threshold
),
cum AS (
  SELECT threshold, count(*)::BIGINT AS n_pairs_cum FROM fan GROUP BY threshold
),
di AS (
  SELECT threshold, count(DISTINCT doc)::BIGINT AS n_docs_involved
  FROM (SELECT threshold, d1 AS doc FROM fan
        UNION ALL SELECT threshold, d2 AS doc FROM fan)
  GROUP BY threshold
)
SELECT t.threshold, coalesce(c.n_pairs_cum, 0)::BIGINT AS n_pairs_cum,
       coalesce(di.n_docs_involved, 0)::BIGINT AS n_docs_involved
FROM th t LEFT JOIN cum c ON t.threshold = c.threshold
LEFT JOIN di ON t.threshold = di.threshold
ORDER BY t.threshold
"""


ORACLE_DEDUP_THRESHOLD_CURVE = _threshold_curve_oracle()

QUERIES.update({"dedup_threshold_curve": q_dedup_threshold_curve})
ORACLES.update({"dedup_threshold_curve": ORACLE_DEDUP_THRESHOLD_CURVE})


# --- BFS hop-distance profile ----------------------------------------------------

BFS_MAX_HOPS = 25


def q_dedup_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop-distance profile of the SimHash near-dup graph from its smallest
    doc id: how many documents sit 1, 2, 3… hops away, plus the unreached
    remainder — the chain-length evidence behind single-linkage
    over-merge (`dedup_clusters` links a hop-7 "duplicate" into the seed's
    cluster; this query shows the 7). Engine side is distributed unit-
    weight Bellman–Ford (co-partitioned edge joins, one job per round);
    the oracle recomputes distances with a recursive CTE.

    Scale: rounds = seed eccentricity (near-dup graphs: 2–4); each round
    is one equi-join on the pre-partitioned edge table."""
    from pyvectorsearch_spark.operators.dedup import simhash_pairs
    from pyvectorsearch_spark.operators.graph import bfs_hops
    from pyvectorsearch_spark.queries.dedup import MAX_HAMMING
    from pyvectorsearch_spark.sources.tables import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs = simhash_pairs(docs, max_hamming=MAX_HAMMING)
    pairs = pairs.localCheckpoint(eager=True)  # reused: seed scan + 2 passes
    seed = pairs.agg(F.min("d1")).collect()[0][0]
    reached = bfs_hops(pairs, seed=seed, max_iter=BFS_MAX_HOPS)
    nodes = (
        pairs.select(F.col("d1").alias("node"))
        .union(pairs.select(F.col("d2").alias("node")))
        .distinct()
    )
    unreached = nodes.join(reached, "node", "left_anti").agg(
        F.count("*").cast("bigint").alias("_n")
    )
    prof = reached.groupBy("hops").agg(
        F.count("*").cast("bigint").alias("n_nodes")
    )
    return (
        prof.select(F.col("hops").cast("int").alias("hops"), "n_nodes")
        .unionByName(
            unreached.select(
                F.lit(-1).cast("int").alias("hops"),
                F.col("_n").alias("n_nodes"),
            )
        )
        .filter(F.col("n_nodes") > 0)
        .orderBy("hops")
    )


def _bfs_oracle() -> str:
    from pyvectorsearch_spark.queries.dedup import _simhash_oracle

    return f"""
WITH RECURSIVE pairs AS ({_simhash_oracle()}),
e AS (
  SELECT d1 AS a, d2 AS b FROM pairs
  UNION
  SELECT d2, d1 FROM pairs
),
seed AS (SELECT min(a) AS s FROM e),
walk (node, hops) AS (
    SELECT s, 0 FROM seed
  UNION
    SELECT e.a, w.hops + 1
    FROM e JOIN walk w ON e.b = w.node
    WHERE w.hops < {BFS_MAX_HOPS}
),
reached AS (SELECT node, min(hops)::INT AS hops FROM walk GROUP BY node),
prof AS (
  SELECT hops, count(*)::BIGINT AS n_nodes FROM reached GROUP BY hops
),
nodes AS (SELECT DISTINCT a AS node FROM e),
unreached AS (
  SELECT -1::INT AS hops, count(*)::BIGINT AS n_nodes
  FROM nodes WHERE node NOT IN (SELECT node FROM reached)
)
SELECT hops, n_nodes FROM prof
UNION ALL
SELECT hops, n_nodes FROM unreached WHERE n_nodes > 0
ORDER BY hops
"""


ORACLE_DEDUP_BFS_HOPS = _bfs_oracle()

QUERIES.update({"dedup_bfs_hops": q_dedup_bfs_hops})
ORACLES.update({"dedup_bfs_hops": ORACLE_DEDUP_BFS_HOPS})


# --- modularity of the LPA partition ----------------------------------------------


def q_dedup_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity Q of the label-propagation communities over the
    SimHash graph — the number that says whether `dedup_lpa_communities`'
    partition actually carves the graph at its joints (Q≈0: no better
    than random; Q>0.3: real community structure worth trusting for
    finer-than-CC dedup groups).

    Exactness: Q = (4m·E_in − Σ_c d_c²)/(4m²) — every term an exact
    bigint (intra-community edges, per-community degree mass, edge
    count); ONE rounded division total.

    Scale: two label joins against the edge list (node-keyed equi-joins)
    and communities-sized rollups."""
    from pyvectorsearch_spark.operators.dedup import simhash_pairs
    from pyvectorsearch_spark.operators.graph import label_propagation
    from pyvectorsearch_spark.queries.dedup import MAX_HAMMING
    from pyvectorsearch_spark.sources.tables import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs = simhash_pairs(docs, max_hamming=MAX_HAMMING)
    e = pairs.select(
        F.least("d1", "d2").alias("a"), F.greatest("d1", "d2").alias("b")
    ).filter(F.col("a") != F.col("b")).distinct()
    e = e.localCheckpoint(eager=True)  # reused by labels + 3 passes below
    labels = label_propagation(e, src="a", dst="b", iters=LPA_ITERS)
    la = labels.select(F.col("node").alias("a"), F.col("community").alias("_ca"))
    lb = labels.select(F.col("node").alias("b"), F.col("community").alias("_cb"))
    m = e.count()
    e_in = (
        e.join(la, "a").join(lb, "b")
        .filter(F.col("_ca") == F.col("_cb"))
        .count()
    )
    und = e.select("a").union(e.select(F.col("b").alias("a")))
    deg = und.groupBy("a").agg(F.count("*").cast("bigint").alias("_d"))
    dc = (
        deg.join(la, "a")
        .groupBy("_ca")
        .agg(F.sum("_d").cast("bigint").alias("_dc"))
    )
    stats = dc.agg(
        F.count("*").cast("bigint").alias("n_communities"),
        F.sum(F.col("_dc") * F.col("_dc")).cast("bigint").alias("_sd2"),
    )
    return stats.select(
        "n_communities",
        F.lit(int(m)).cast("bigint").alias("n_edges"),
        F.lit(int(e_in)).cast("bigint").alias("n_intra_edges"),
        F.round(
            (4 * F.lit(int(m)) * F.lit(int(e_in)) - F.col("_sd2"))
            / (4.0 * F.lit(int(m)) * F.lit(int(m))),
            6,
        ).alias("q_modularity_r"),
    )


def _modularity_oracle() -> str:
    from pyvectorsearch_spark.queries.dedup import _simhash_oracle

    rounds = []
    prev = "l0"
    for i in range(1, LPA_ITERS + 1):
        rounds.append(
            f"""c{i} AS (
  SELECT e.a, l.lbl, count(*)::BIGINT AS n
  FROM edges e JOIN {prev} l ON l.node = e.b
  GROUP BY e.a, l.lbl
),
l{i} AS (
  SELECT a AS node, lbl FROM (
    SELECT a, lbl,
           row_number() OVER (PARTITION BY a ORDER BY n DESC, lbl ASC) AS rn
    FROM c{i}
  ) WHERE rn = 1
)"""
        )
        prev = f"l{i}"
    return f"""
WITH pairs AS ({_simhash_oracle()}),
ue AS (
  SELECT DISTINCT least(d1, d2) AS a, greatest(d1, d2) AS b
  FROM pairs WHERE d1 <> d2
),
edges AS (
  SELECT a, b FROM ue UNION ALL SELECT b AS a, a AS b FROM ue
),
l0 AS (SELECT DISTINCT b AS node, b AS lbl FROM edges),
{", ".join(rounds)},
m AS (SELECT count(*)::BIGINT AS m FROM ue),
ein AS (
  SELECT count(*)::BIGINT AS e_in
  FROM ue JOIN {prev} la ON ue.a = la.node
  JOIN {prev} lb ON ue.b = lb.node
  WHERE la.lbl = lb.lbl
),
deg AS (SELECT a, count(*)::BIGINT AS d FROM edges GROUP BY a),
dc AS (
  SELECT l.lbl, sum(deg.d)::BIGINT AS dc
  FROM deg JOIN {prev} l ON deg.a = l.node GROUP BY l.lbl
),
stats AS (
  SELECT count(*)::BIGINT AS n_communities, sum(dc * dc)::BIGINT AS sd2
  FROM dc
)
SELECT s.n_communities, m.m AS n_edges, ein.e_in AS n_intra_edges,
       round((4 * m.m * ein.e_in - s.sd2) / (4.0 * m.m * m.m), 6)
         AS q_modularity_r
FROM stats s CROSS JOIN m CROSS JOIN ein
"""


ORACLE_DEDUP_MODULARITY = _modularity_oracle()

QUERIES.update({"dedup_modularity": q_dedup_modularity})
ORACLES.update({"dedup_modularity": ORACLE_DEDUP_MODULARITY})
