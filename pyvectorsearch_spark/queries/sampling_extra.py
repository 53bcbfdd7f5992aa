"""Sampling variants registered OUTSIDE the driver's 50-entry window (the
window order is pinned — see queries/__init__.py); covered by
tests/test_oracle_parity.py against the same bit-exact DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.operators.sampling import BUCKETS, pack_greedy
from pyvectorsearch_spark.queries.sampling import PACK_BUDGET, _bucket_sql
from pyvectorsearch_spark.sources.tables import load_table, spread

PACK_SUB_SHARDS = 4


def q_sample_pack_greedy_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-sharded greedy packing: every source splits into 4 deterministic
    hash sub-shards that pack independently (>1 task per source — the
    100 TB posture for a low-cardinality shard key); pack ids carry the
    sub-shard in their high 32 bits."""
    docs = load_table(spark, sf_dir, "documents")
    packed = pack_greedy(
        docs, by="source", budget=PACK_BUDGET, size_col="n_chars",
        sub_shards=PACK_SUB_SHARDS,
    )
    return (
        packed.groupBy("source", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("source", "pack_id")
    )


ORACLE_PACK_GREEDY_SHARDED = f"""
WITH RECURSIVE ordered AS (
  SELECT source, doc_id, n_chars,
         ({_bucket_sql("packsub")} * {PACK_SUB_SHARDS}) // {BUCKETS} AS sub,
         row_number() OVER (
           PARTITION BY source,
                        ({_bucket_sql("packsub")} * {PACK_SUB_SHARDS}) // {BUCKETS}
           ORDER BY doc_id) AS rn
  FROM documents
), walk AS (
  SELECT source, sub, doc_id, n_chars, rn, 0 AS pack_id, n_chars AS fill
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.source, o.sub, o.doc_id, o.n_chars, o.rn,
         CASE WHEN w.fill + o.n_chars <= {PACK_BUDGET}
              THEN w.pack_id ELSE w.pack_id + 1 END,
         CASE WHEN w.fill + o.n_chars <= {PACK_BUDGET}
              THEN w.fill + o.n_chars ELSE o.n_chars END
  FROM walk w JOIN ordered o ON o.source = w.source AND o.sub = w.sub
                            AND o.rn = w.rn + 1
)
SELECT source, (sub * 4294967296 + pack_id)::BIGINT AS pack_id,
       count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
FROM walk GROUP BY source, sub, pack_id ORDER BY source, pack_id
"""


EXACT_K = 17


def q_sample_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-17-per-source deterministic sample: per-source counts, char
    totals, and an id-set digest pinning the exact membership (so the
    two-phase top-k must equal the oracle's single global rank)."""
    from pyvectorsearch_spark.operators.sampling import sample_exact_k

    docs = load_table(spark, sf_dir, "documents")
    s = sample_exact_k(docs, strata_col="source", k=EXACT_K)
    return (
        s.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_sampled"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list("doc_id")),
                        lambda x: x.cast("string"),
                    ),
                )
            ).alias("ids_digest"),
        )
        .orderBy("source")
    )


ORACLE_SAMPLE_EXACT_K = f"""
WITH r AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (
           PARTITION BY source ORDER BY {_bucket_sql("exactk")}, doc_id
         ) AS rk
  FROM documents
)
SELECT source, count(*)::BIGINT AS n_sampled,
       sum(n_chars)::BIGINT AS total_chars,
       md5(string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id)) AS ids_digest
FROM r WHERE rk <= {EXACT_K}
GROUP BY source ORDER BY source
"""


TOKEN_BUDGET = 15_000


def q_sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-bounded quality selection: highest-quality documents until a
    15k-token budget (take-while prefix). The bucket-decomposed operator
    must equal the oracle's single global cumulative-sum walk; membership is
    pinned by an order-independent id checksum."""
    from pyvectorsearch_spark.functions.text import tokens
    from pyvectorsearch_spark.operators.sampling import select_token_budget
    from pyvectorsearch_spark.operators.textops import quality_score_col

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(tokens("text")).cast("bigint").alias("ntok"),
        quality_score_col(F.col("text"), tokens("text")).alias("qual"),
    )
    sel = select_token_budget(
        docs, budget=TOKEN_BUDGET, quality_col="qual", size_col="ntok"
    )
    chk = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10)
        .cast("bigint")
        % 1_000_000_007
    )
    return sel.agg(
        F.count("*").cast("bigint").alias("n_selected"),
        F.coalesce(F.sum("ntok"), F.lit(0)).cast("bigint").alias("total_tokens"),
        F.coalesce(F.sum(chk), F.lit(0)).cast("bigint").alias("ids_checksum"),
    )


def _oracle_token_budget() -> str:
    from pyvectorsearch_spark.functions.text import duckdb_quality, duckdb_tokens

    tok = duckdb_tokens("text")
    qual = duckdb_quality("text", tok)
    return f"""
WITH q AS (
  SELECT doc_id, len({tok})::BIGINT AS ntok, {qual} AS qual FROM documents
),
w AS (
  SELECT doc_id, ntok,
         sum(ntok) OVER (ORDER BY qual DESC, doc_id ASC
                         ROWS UNBOUNDED PRECEDING) AS cum
  FROM q
),
sel AS (SELECT * FROM w WHERE cum <= {TOKEN_BUDGET})
SELECT count(*)::BIGINT AS n_selected,
       coalesce(sum(ntok), 0)::BIGINT AS total_tokens,
       coalesce(sum(('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT
                    % 1000000007), 0)::BIGINT AS ids_checksum
FROM sel
"""


ORACLE_SAMPLE_TOKEN_BUDGET = _oracle_token_budget()


WEIGHTED_K = 25
WS_SALT = "wsample"


def q_sample_weighted_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted sample of 25 documents without replacement
    (Efraimidis-Spirakis A-Res with md5 keys — deterministic, so even the
    'random' sample is oracle-checked)."""
    from pyvectorsearch_spark.functions.text import tokens
    from pyvectorsearch_spark.operators.sampling import sample_weighted_k
    from pyvectorsearch_spark.operators.textops import quality_score_col

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        quality_score_col(F.col("text"), tokens("text")).alias("w"),
    )
    out = sample_weighted_k(docs, k=WEIGHTED_K, weight_col="w", salt=WS_SALT)
    return out.select("doc_id", "w", "ws_key", "ws_rank").orderBy("ws_rank")


def _oracle_weighted_k() -> str:
    from pyvectorsearch_spark.functions.text import duckdb_quality, duckdb_tokens
    from pyvectorsearch_spark.operators.sketches import HEX_DIGITS

    tok = duckdb_tokens("text")
    qual = duckdb_quality("text", tok)
    scale = float(16**HEX_DIGITS)
    u = (
        f"('0x' || substr(md5('{WS_SALT}' || doc_id::VARCHAR), 1, {HEX_DIGITS}))"
        f"::BIGINT / {scale!r}"
    )
    return f"""
WITH d AS (SELECT doc_id, {qual} AS w FROM documents),
keyed AS (
  SELECT doc_id, w, round(ln({u}) / w, 9) AS ws_key
  FROM d WHERE w > 0
),
r AS (
  SELECT doc_id, w, ws_key,
         row_number() OVER (ORDER BY ws_key DESC, doc_id) AS ws_rank
  FROM keyed
)
SELECT doc_id, w, ws_key, ws_rank FROM r WHERE ws_rank <= {WEIGHTED_K}
ORDER BY ws_rank
"""


ORACLE_SAMPLE_WEIGHTED_K = _oracle_weighted_k()


FRAC_NUM, FRAC_DEN = 3, 10  # exact 30% per stratum


def q_sample_exact_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 30%-per-source stratified sample: per-source kept counts must
    equal floor(n_s * 3 / 10) exactly, with membership pinned by digest."""
    from pyvectorsearch_spark.operators.sampling import (
        sample_stratified_exact_frac,
    )

    docs = load_table(spark, sf_dir, "documents")
    s = sample_stratified_exact_frac(
        docs, strata_col="source", frac_num=FRAC_NUM, frac_den=FRAC_DEN
    )
    return (
        s.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_sampled"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list("doc_id")),
                        lambda x: x.cast("string"),
                    ),
                )
            ).alias("ids_digest"),
        )
        .orderBy("source")
    )


ORACLE_SAMPLE_EXACT_FRAC = f"""
WITH c AS (SELECT source, count(*) AS ns FROM documents GROUP BY source),
q AS (
  SELECT source, (ns * {FRAC_NUM} - (ns * {FRAC_NUM}) % {FRAC_DEN})
                 // {FRAC_DEN} AS k
  FROM c
),
r AS (
  SELECT d.source, d.doc_id, q.k,
         row_number() OVER (
           PARTITION BY d.source ORDER BY {_bucket_sql("exactfrac")}, d.doc_id
         ) AS rk
  FROM documents d JOIN q USING (source)
)
SELECT source, count(*)::BIGINT AS n_sampled,
       md5(string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id)) AS ids_digest
FROM r WHERE rk <= k
GROUP BY source ORDER BY source
"""




def q_sample_cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE train/val/test split: hash-split on the near-dup
    CLUSTER id, not the doc id — near-duplicate documents can never land in
    different splits (the eval-contamination failure mode of naive per-doc
    splitting). Composition: Jaccard pairs → connected components → every
    doc keyed by its cluster (own id when unpaired) → the standard
    deterministic hash split on that key. Report: per-split doc and cluster
    counts. Scale shape: the cluster table is pairs-sized; the split is a
    zero-shuffle projection; the rollup is group-count small."""
    from pyvectorsearch_spark.operators.dedup import jaccard_similarity_pairs
    from pyvectorsearch_spark.operators.graph import dup_clusters
    from pyvectorsearch_spark.operators.sampling import assign_split
    from pyvectorsearch_spark.queries.dedup import JACCARD_THRESHOLD
    from pyvectorsearch_spark.queries.sampling import SPLIT_FRACTIONS
    from pyvectorsearch_spark.sources.tables import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs = jaccard_similarity_pairs(docs, threshold=JACCARD_THRESHOLD)
    clustered = dup_clusters(docs, pairs)
    split = assign_split(
        clustered, id_col="cluster_id", fractions=SPLIT_FRACTIONS, salt="clsplit"
    )
    return (
        split.groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.countDistinct("cluster_id").cast("bigint").alias("n_clusters"),
        )
        .orderBy("split")
    )


def _oracle_cluster_split() -> str:
    from pyvectorsearch_spark.queries.dedup import _JACCARD_CTES

    b = _bucket_sql("clsplit", "c.cluster_id")
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
c AS (
  SELECT d.doc_id, coalesce(cp.cluster, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comp cp ON d.doc_id = cp.node
),
s AS (
  SELECT doc_id, cluster_id,
         CASE WHEN {b} < 8000 THEN 'train'
              WHEN {b} < 9000 THEN 'val'
              WHEN {b} < 10000 THEN 'test' END AS split
  FROM c
)
SELECT split, count(*)::BIGINT AS n_docs,
       count(DISTINCT cluster_id)::BIGINT AS n_clusters
FROM s GROUP BY split ORDER BY split
"""


ORACLE_CLUSTER_SPLIT = _oracle_cluster_split()



SHARD_PACKS = 8


def q_export_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard export manifest: concat-and-chunk packs roll up into
    fixed-size shards (8 packs/shard, ``shard_id = pack_id div 8``) and the
    dataset ACTUALLY LANDS hive-partitioned by (source, shard_id) — the
    data-loader handoff layout — then the manifest (docs/chars/pack span
    per shard) is computed from the read-back files, so a hash match proves
    both the deterministic shard assignment and the round trip. Scale
    shape: one pack window per source shard + a partitioned write; the
    manifest rollup reads only (source, shard_id, n_chars, pack_id)."""
    import os
    import shutil
    import tempfile
    import uuid

    from pyvectorsearch_spark.operators.sampling import pack_chunked
    from pyvectorsearch_spark.sources.tables import dataset_tag

    docs = load_table(spark, sf_dir, "documents")
    packed = pack_chunked(
        docs, by="source", budget=PACK_BUDGET, size_col="n_chars"
    ).withColumn(
        "shard_id",
        ((F.col("pack_id") - F.col("pack_id") % SHARD_PACKS) / SHARD_PACKS).cast(
            "bigint"
        ),
    )
    base = dataset_tag(sf_dir, "documents")
    path = os.path.join(tempfile.gettempdir(), f"pvs_docs_shards_{base}")
    if not os.path.isdir(path):
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        packed.select(
            "doc_id", "n_chars", "pack_id", "source", "shard_id"
        ).write.partitionBy("source", "shard_id").parquet(tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.isdir(path):
                raise
    back = spark.read.parquet(path)
    return (
        back.groupBy("source", "shard_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min("pack_id").cast("bigint").alias("first_pack"),
            F.max("pack_id").cast("bigint").alias("last_pack"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
        .orderBy("source", "shard_id")
    )


ORACLE_EXPORT_SHARDS = f"""
WITH s AS (
  SELECT source, doc_id, n_chars,
         coalesce(sum(n_chars) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
  FROM documents
),
p AS (
  SELECT source, doc_id, n_chars, (start // {PACK_BUDGET})::BIGINT AS pack_id
  FROM s
)
SELECT source, (pack_id // {SHARD_PACKS})::BIGINT AS shard_id,
       count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS total_chars,
       min(pack_id)::BIGINT AS first_pack, max(pack_id)::BIGINT AS last_pack,
       sum(doc_id)::BIGINT AS id_checksum
FROM p GROUP BY source, shard_id ORDER BY source, shard_id
"""


QUERIES = {
    "export_training_shards": q_export_training_shards,
    "sample_cluster_split": q_sample_cluster_split,
    "sample_pack_greedy_sharded": q_sample_pack_greedy_sharded,
    "sample_exact_k": q_sample_exact_k,
    "sample_token_budget": q_sample_token_budget,
    "sample_weighted_k": q_sample_weighted_k,
    "sample_exact_frac": q_sample_exact_frac,
}
ORACLES = {
    "export_training_shards": ORACLE_EXPORT_SHARDS,
    "sample_cluster_split": ORACLE_CLUSTER_SPLIT,
    "sample_pack_greedy_sharded": ORACLE_PACK_GREEDY_SHARDED,
    "sample_exact_k": ORACLE_SAMPLE_EXACT_K,
    "sample_token_budget": ORACLE_SAMPLE_TOKEN_BUDGET,
    "sample_weighted_k": ORACLE_SAMPLE_WEIGHTED_K,
    "sample_exact_frac": ORACLE_SAMPLE_EXACT_FRAC,
}


# --- weighted sampling WITH replacement ------------------------------------

SWR_TRIALS = 10


def q_sample_weighted_replacement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITH replacement (the independent-draws
    counterpart of `sample_weighted_k`'s A-Res without-replacement): each
    of 10 trials independently draws one order with probability
    proportional to its total price, via the Gumbel-max trick on the
    deterministic md5 uniform (argmax of w·u^... expressed as the exact
    comparable key ln(u)/w — rounded ladder, ties on key then id). The
    'random' draws are a pure function of (salt, trial, id), so the sample
    itself is hash-checked and reproducible; a new salt is a new epoch.

    Scale shape: trials broadcast onto the fact scan (one row per (trial,
    order) pair collapses immediately through the per-trial argmax
    window); at petabyte scale swap the window for per-trial TakeOrdered —
    same semantics, bounded memory."""
    from pyspark.sql import Window

    from pyvectorsearch_spark.operators.sketches import HEX_DIGITS

    o = spread(load_table(spark, sf_dir, "orders")).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("_wc"),
    )
    trials = spark.range(SWR_TRIALS).select(F.col("id").cast("int").alias("trial"))
    j = o.crossJoin(F.broadcast(trials))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit("swr1"), F.col("trial"), F.col("o_orderkey")
                    )
                ),
                1,
                HEX_DIGITS,
            ),
            16,
            10,
        ).cast("bigint")
        / F.lit(float(16**HEX_DIGITS))
    )
    # Gumbel-max comparable key: maximize ln(u)/w  (u in (0,1) => ln(u) < 0;
    # larger weight => key closer to 0 => more likely the max). Rounded so
    # the ordering is engine-exact.
    key = F.round(F.log(u) / F.col("_wc"), 18)
    w = Window.partitionBy("trial").orderBy(F.desc("_key"), F.asc("o_orderkey"))
    picked = (
        j.select("trial", "o_orderkey", "_wc", key.alias("_key"))
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
    )
    return picked.select(
        "trial",
        F.col("o_orderkey").alias("picked_key"),
        F.round(F.col("_wc") / 100.0, 2).alias("weight_r"),
    ).orderBy("trial")


ORACLE_SAMPLE_WEIGHTED_REPLACEMENT = f"""
WITH t AS (SELECT unnest(range(0, {SWR_TRIALS})) AS trial),
j AS (
  SELECT t.trial, o.o_orderkey,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS wc,
         ('0x' || substr(md5('swr1:' || t.trial || ':' || o.o_orderkey),
                         1, 13))::BIGINT / {float(16**13)!r} AS u
  FROM orders o CROSS JOIN t
),
keyed AS (
  SELECT trial, o_orderkey, wc, round(ln(u) / wc, 18) AS k FROM j
),
r AS (
  SELECT trial, o_orderkey, wc,
         row_number() OVER (PARTITION BY trial
                            ORDER BY k DESC, o_orderkey ASC) AS rn
  FROM keyed
)
SELECT CAST(trial AS INT) AS trial, o_orderkey AS picked_key,
       round(wc / 100.0, 2) AS weight_r
FROM r WHERE rn = 1 ORDER BY trial
"""

QUERIES.update({"sample_weighted_replacement": q_sample_weighted_replacement})
ORACLES.update({"sample_weighted_replacement": ORACLE_SAMPLE_WEIGHTED_REPLACEMENT})


# --- Neyman allocation report -------------------------------------------------

NEYMAN_BUDGET = 100


def q_sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified-sampling allocation over the document
    sources: n_h ∝ N_h·σ_h (stratum size × length std-dev) for a fixed
    budget of 100 — the design table that says WHERE a QA sample buys the
    most variance reduction, versus naive proportional allocation
    (`sample_stratified` executes a plan; this designs one).

    Determinism: per-stratum moments (N, Σx, Σx²) are exact bigints on
    integer char counts; N_h·σ_h = sqrt(N·Σx² − (Σx)²) — ONE sqrt of an
    exact integer, micro-fixed per stratum so the denominator sum is an
    exact bigint; allocations floor deterministically.

    Scale: one map-side moment rollup to sources-sized cells; everything
    after is arithmetic on that tiny table."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("bigint").alias("_x")
    )
    m = docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("_x").cast("bigint").alias("_sx"),
        F.sum(F.col("_x") * F.col("_x")).cast("bigint").alias("_sx2"),
    )
    # N_h * sigma_h = sqrt(N*Sx2 - Sx^2)  (population sigma), exact integer
    # under the sqrt; micro-fix so the cross-stratum sum is order-free
    ns = F.sqrt(
        (m["n_docs"] * m["_sx2"] - m["_sx"] * m["_sx"]).cast("double")
    )
    w = m.withColumn("_nsu", F.round(ns * 1000000).cast("bigint"))
    tot = w.agg(
        F.sum("_nsu").cast("bigint").alias("_tot"),
        F.sum("n_docs").cast("bigint").alias("_nall"),
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.round(
                F.sqrt(
                    (
                        (F.col("n_docs") * F.col("_sx2") - F.col("_sx") * F.col("_sx"))
                        / (F.col("n_docs") * F.col("n_docs"))
                    ).cast("double")
                ),
                4,
            ).alias("sigma_chars_r"),
            F.round(F.col("_nsu") / F.col("_tot").cast("double"), 6).alias(
                "neyman_share_r"
            ),
            F.floor(
                F.lit(NEYMAN_BUDGET) * F.col("_nsu") / F.col("_tot")
            )
            .cast("bigint")
            .alias("neyman_alloc"),
            F.floor(
                F.lit(NEYMAN_BUDGET) * F.col("n_docs") / F.col("_nall")
            )
            .cast("bigint")
            .alias("prop_alloc"),
        )
        .orderBy("source")
    )


ORACLE_SAMPLE_NEYMAN = f"""
WITH m AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         sum(n_chars)::BIGINT AS sx,
         sum(n_chars * n_chars)::BIGINT AS sx2
  FROM documents GROUP BY source
),
w AS (
  SELECT source, n_docs, sx, sx2,
         CAST(round(sqrt(CAST(n_docs * sx2 - sx * sx AS DOUBLE)) * 1000000)
              AS BIGINT) AS nsu
  FROM m
),
tot AS (SELECT sum(nsu)::BIGINT AS tot, sum(n_docs)::BIGINT AS nall FROM w)
SELECT w.source, w.n_docs,
       round(sqrt(CAST(w.n_docs * w.sx2 - w.sx * w.sx AS DOUBLE)
                  / (w.n_docs * w.n_docs)), 4) AS sigma_chars_r,
       round(w.nsu / CAST(t.tot AS DOUBLE), 6) AS neyman_share_r,
       CAST(floor({NEYMAN_BUDGET} * w.nsu / CAST(t.tot AS DOUBLE)) AS BIGINT)
         AS neyman_alloc,
       CAST(floor({NEYMAN_BUDGET} * w.n_docs / CAST(t.nall AS DOUBLE)) AS BIGINT)
         AS prop_alloc
FROM w CROSS JOIN tot t ORDER BY w.source
"""

QUERIES.update({"sample_neyman_allocation": q_sample_neyman_allocation})
ORACLES.update({"sample_neyman_allocation": ORACLE_SAMPLE_NEYMAN})


# --- effective sample size of a weighted design ---------------------------------


def q_sample_mixture_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective sample size (Kish 1965) of length-weighted sampling per
    source: ESS = (Σw)²/Σw² with w = n_chars — how many EQUAL-WEIGHT docs
    the weighted design is statistically worth. Efficiency = ESS/n exposes
    where heavy-tailed lengths make importance weighting wasteful (the
    diagnostic that says whether `sample_weighted_k`'s design needs weight
    clipping before it runs).

    Determinism: Σw is bigint; Σw² accumulates in DECIMAL(38,0)/HUGEINT
    (char-count squares overflow bigint near ~10⁹ docs); one rounded
    division per source.

    Scale: one map-side moment rollup to sources-sized cells."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("bigint").alias("_w")
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("_w").cast("bigint").alias("_sw"),
        F.sum(d(F.col("_w")) * d(F.col("_w"))).alias("_sw2"),
    )
    ess = (d(m["_sw"]) * d(m["_sw"])).cast("double") / m["_sw2"].cast("double")
    return m.select(
        "source",
        "n_docs",
        F.round(ess, 4).alias("ess_r"),
        F.round(ess / F.col("n_docs").cast("double"), 6).alias("efficiency_r"),
    ).orderBy("source")


ORACLE_SAMPLE_MIXTURE_ESS = """
WITH m AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         sum(n_chars)::BIGINT AS sw,
         sum(n_chars::HUGEINT * n_chars::HUGEINT) AS sw2
  FROM documents GROUP BY source
)
SELECT source, n_docs,
       round(CAST(sw::HUGEINT * sw::HUGEINT AS DOUBLE) / CAST(sw2 AS DOUBLE), 4)
         AS ess_r,
       round(CAST(sw::HUGEINT * sw::HUGEINT AS DOUBLE) / CAST(sw2 AS DOUBLE)
             / n_docs, 6) AS efficiency_r
FROM m ORDER BY source
"""

QUERIES.update({"sample_mixture_ess": q_sample_mixture_ess})
ORACLES.update({"sample_mixture_ess": ORACLE_SAMPLE_MIXTURE_ESS})


# --- near-dup-aware GroupKFold split ---------------------------------------------

GKF_FOLDS = 5
GKF_SALT = "gkf-v1"


def q_sample_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe K-fold assignment: folds hash the near-dup CLUSTER id
    (from the Jaccard connected components), so a document and its near-
    duplicates always land in the SAME fold — the eval-integrity rule
    naive per-doc splitting breaks (a test doc whose twin sits in train is
    a leaked answer; `text_decontamination` screens external benchmarks,
    this screens the split itself). The report quantifies the danger: how
    many multi-doc clusters the naive per-doc hash split would straddle
    across folds, and how many documents sit in those leaking clusters.

    Determinism: cluster ids are the engine-exact component minima the
    dedup family pins; both fold hashes are md5 mod K; all counts bigint.

    Scale: one extra md5 projection over the already-computed cluster
    assignment — the split costs nothing beyond the dedup pass it reuses."""
    from pyvectorsearch_spark.operators.dedup import jaccard_similarity_pairs
    from pyvectorsearch_spark.operators.graph import dup_clusters
    from pyvectorsearch_spark.queries.dedup import JACCARD_THRESHOLD

    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs = jaccard_similarity_pairs(docs, threshold=JACCARD_THRESHOLD)
    cl = dup_clusters(docs, pairs).select("doc_id", "cluster_id")

    def fold_of(col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(GKF_SALT + "#"), col.cast("string"))),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("bigint")
            % GKF_FOLDS
        ).cast("int")

    flagged = cl.select(
        "doc_id",
        "cluster_id",
        fold_of(F.col("cluster_id")).alias("_fg"),
        fold_of(F.col("doc_id")).alias("_fn"),
    )
    per_fold = flagged.groupBy(F.col("_fg").alias("fold")).agg(
        F.count("*").cast("bigint").alias("n_docs_group"),
        F.countDistinct("cluster_id").cast("bigint").alias("n_clusters_group"),
    )
    naive = flagged.groupBy(F.col("_fn").alias("fold")).agg(
        F.count("*").cast("bigint").alias("n_docs_naive")
    )
    leak = (
        flagged.groupBy("cluster_id")
        .agg(
            F.count("*").cast("bigint").alias("_sz"),
            F.countDistinct("_fn").cast("bigint").alias("_nf"),
        )
        .filter((F.col("_sz") > 1) & (F.col("_nf") > 1))
        .agg(
            F.count("*").cast("bigint").alias("leak_clusters"),
            F.coalesce(F.sum("_sz"), F.lit(0)).cast("bigint").alias("leak_docs"),
        )
    )
    return (
        per_fold.join(naive, "fold")
        .crossJoin(F.broadcast(leak))
        .select(
            "fold",
            "n_docs_group",
            "n_clusters_group",
            "n_docs_naive",
            "leak_clusters",
            "leak_docs",
        )
        .orderBy("fold")
    )


def _gkf_oracle() -> str:
    from pyvectorsearch_spark.queries.dedup import _JACCARD_CTES

    fold_c = (
        f"(('0x' || substr(md5('{GKF_SALT}#' || cluster_id::VARCHAR), 1, 12))"
        f"::BIGINT % {GKF_FOLDS})::INT"
    )
    fold_d = (
        f"(('0x' || substr(md5('{GKF_SALT}#' || doc_id::VARCHAR), 1, 12))"
        f"::BIGINT % {GKF_FOLDS})::INT"
    )
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
cl AS (
  SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
),
flagged AS (
  SELECT doc_id, cluster_id, {fold_c} AS fg, {fold_d} AS fn FROM cl
),
per_fold AS (
  SELECT fg AS fold, count(*)::BIGINT AS n_docs_group,
         count(DISTINCT cluster_id)::BIGINT AS n_clusters_group
  FROM flagged GROUP BY fg
),
naive AS (
  SELECT fn AS fold, count(*)::BIGINT AS n_docs_naive FROM flagged GROUP BY fn
),
leak AS (
  SELECT count(*)::BIGINT AS leak_clusters,
         coalesce(sum(sz), 0)::BIGINT AS leak_docs
  FROM (
    SELECT cluster_id, count(*)::BIGINT AS sz,
           count(DISTINCT fn)::BIGINT AS nf
    FROM flagged GROUP BY cluster_id
  ) WHERE sz > 1 AND nf > 1
)
SELECT p.fold, p.n_docs_group, p.n_clusters_group, n.n_docs_naive,
       l.leak_clusters, l.leak_docs
FROM per_fold p JOIN naive n ON p.fold = n.fold CROSS JOIN leak l
ORDER BY p.fold
"""


ORACLE_SAMPLE_GROUP_KFOLD = _gkf_oracle()

QUERIES.update({"sample_group_kfold": q_sample_group_kfold})
ORACLES.update({"sample_group_kfold": ORACLE_SAMPLE_GROUP_KFOLD})


# ---------------------------------------------------------------------------
# DSIR importance resampling (Xie et al., NeurIPS 2023)

DSIR_BUCKETS = 256
DSIR_TARGET_LANG = "en"


def q_sample_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR hashed-n-gram importance weights of every document against the
    English-language target domain: per-doc log importance, plus the
    resampling keep flag (log w > 0, decided on the 6-dp rounded value so
    both engines decide from the identical number). The weight machinery is
    ``operators.sampling.dsir_logweights``; the distributions, hashing, and
    smoothing are replayed exactly by the DuckDB oracle."""
    from pyvectorsearch_spark.operators.sampling import dsir_logweights

    docs = spread(load_table(spark, sf_dir, "documents"))
    w = dsir_logweights(
        docs, target=F.col("lang") == DSIR_TARGET_LANG, n_buckets=DSIR_BUCKETS
    )
    out = (
        docs.select("doc_id", "lang")
        .join(w, "doc_id", "left")
        .withColumn(
            "logweight", F.round(F.coalesce("logweight", F.lit(0.0)), 6)
        )
        .withColumn("keep", (F.col("logweight") > 0).cast("int"))
    )
    return out.select("doc_id", "lang", "logweight", "keep").orderBy("doc_id")


def _oracle_dsir() -> str:
    from pyvectorsearch_spark.functions.text import duckdb_tokens, duckdb_word_ngrams

    tok = duckdb_tokens("text")
    big = duckdb_word_ngrams("t", 2)
    b = DSIR_BUCKETS
    return f"""
WITH toks AS (SELECT doc_id, lang, {tok} AS t FROM documents),
grams AS (
  SELECT doc_id, lang, unnest(list_concat(t, {big})) AS g FROM toks
),
feats AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5('dsir:' || g), 1, 12))::BIGINT % {b} AS b,
         count(*) AS c
  FROM grams GROUP BY 1, 2, 3
),
bl AS (
  SELECT b, sum(c) AS rc,
         sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN c ELSE 0 END) AS tc
  FROM feats GROUP BY b
),
tot AS (SELECT sum(rc) AS r_tot, sum(tc) AS t_tot FROM bl),
w AS (
  SELECT b, ln((tc + 1) / (t_tot + {b}.0)) - ln((rc + 1) / (r_tot + {b}.0)) AS w
  FROM bl CROSS JOIN tot
),
docw AS (
  SELECT f.doc_id, sum(f.c * w.w) AS lw FROM feats f JOIN w USING (b) GROUP BY 1
)
SELECT d.doc_id, d.lang, round(coalesce(lw, 0.0), 6) AS logweight,
       (round(coalesce(lw, 0.0), 6) > 0)::INT AS keep
FROM documents d LEFT JOIN docw USING (doc_id)
ORDER BY d.doc_id
"""


ORACLE_SAMPLE_DSIR = _oracle_dsir()

QUERIES.update({"sample_dsir_weights": q_sample_dsir_weights})
ORACLES.update({"sample_dsir_weights": ORACLE_SAMPLE_DSIR})


def q_pipeline_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed DSIR curation: importance-weight the corpus against the
    English target, keep positive-weight docs, and report the per-source
    selection profile — kept count, kept chars, mean kept log-importance —
    as ONE lazy plan (weights never materialize). The shape a 100 TB
    curation run has: the bucket table stays a broadcast constant; only the
    per-source aggregate (≤ |sources| rows) leaves the cluster."""
    from pyvectorsearch_spark.operators.sampling import dsir_logweights

    docs = spread(load_table(spark, sf_dir, "documents"))
    w = dsir_logweights(
        docs, target=F.col("lang") == DSIR_TARGET_LANG, n_buckets=DSIR_BUCKETS
    )
    kept = (
        docs.join(w, "doc_id", "left")
        .withColumn("_lw", F.round(F.coalesce("logweight", F.lit(0.0)), 6))
        .filter(F.col("_lw") > 0)
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_kept"),
            F.sum("n_chars").cast("bigint").alias("kept_chars"),
            F.round(F.avg("_lw"), 6).alias("avg_logweight"),
        )
        .orderBy("source")
    )


def _oracle_dsir_select() -> str:
    from pyvectorsearch_spark.functions.text import duckdb_tokens, duckdb_word_ngrams

    tok = duckdb_tokens("text")
    big = duckdb_word_ngrams("t", 2)
    b = DSIR_BUCKETS
    return f"""
WITH toks AS (SELECT doc_id, {tok} AS t FROM documents),
grams AS (SELECT doc_id, unnest(list_concat(t, {big})) AS g FROM toks),
feats AS (
  SELECT f.doc_id, d.lang,
         ('0x' || substr(md5('dsir:' || f.g), 1, 12))::BIGINT % {b} AS b,
         count(*) AS c
  FROM grams f JOIN documents d USING (doc_id) GROUP BY 1, 2, 3
),
bl AS (
  SELECT b, sum(c) AS rc,
         sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN c ELSE 0 END) AS tc
  FROM feats GROUP BY b
),
tot AS (SELECT sum(rc) AS r_tot, sum(tc) AS t_tot FROM bl),
w AS (
  SELECT b, ln((tc + 1) / (t_tot + {b}.0)) - ln((rc + 1) / (r_tot + {b}.0)) AS w
  FROM bl CROSS JOIN tot
),
docw AS (
  SELECT f.doc_id, sum(f.c * w.w) AS lw FROM feats f JOIN w USING (b) GROUP BY 1
),
kept AS (
  SELECT d.source, d.n_chars, round(coalesce(lw, 0.0), 6) AS lw_r
  FROM documents d LEFT JOIN docw USING (doc_id)
  WHERE round(coalesce(lw, 0.0), 6) > 0
)
SELECT source, count(*)::BIGINT AS n_kept, sum(n_chars)::BIGINT AS kept_chars,
       round(avg(lw_r), 6) AS avg_logweight
FROM kept GROUP BY source ORDER BY source
"""


ORACLE_PIPELINE_DSIR_SELECT = _oracle_dsir_select()

QUERIES.update({"pipeline_dsir_select": q_pipeline_dsir_select})
ORACLES.update({"pipeline_dsir_select": ORACLE_PIPELINE_DSIR_SELECT})


TMIX_TARGET = 200


def q_sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (T=1/2) mixture of documents: per-source targets
    ∝ √n_s — big sources downsampled, tail sources upsampled relative to
    proportional mixing. Membership is hash-deterministic; the thresholds
    use only IEEE-exact ops (sqrt + a sorted-order fold), so the oracle
    reproduces them bit-for-bit (operators/sampling.py::
    temperature_mixture_thresholds)."""
    from pyvectorsearch_spark.operators.sampling import (
        hash_bucket,
        temperature_mixture_thresholds,
    )

    docs = load_table(spark, sf_dir, "documents")
    thr = temperature_mixture_thresholds(docs, target_rows=TMIX_TARGET)
    kept = docs.join(F.broadcast(thr), "source").filter(
        hash_bucket(F.col("doc_id"), "tmix") < F.col("threshold")
    )
    kstats = kept.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.sum("n_chars").cast("bigint").alias("kept_chars"),
    )
    return (
        thr.join(kstats, "source", "left")
        .select(
            "source",
            "n_source",
            "threshold",
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.coalesce("kept_chars", F.lit(0)).cast("bigint").alias("kept_chars"),
        )
        .orderBy("source")
    )


ORACLE_SAMPLE_TMIX = f"""
WITH c AS (
  SELECT source, count(*)::BIGINT AS n_source FROM documents GROUP BY source
),
rts AS (SELECT source, n_source, sqrt(n_source::DOUBLE) AS rt FROM c),
s AS (
  SELECT list_reduce(list(rt ORDER BY source), (a, b) -> a + b) AS sum_rt
  FROM rts
),
thr AS (
  SELECT source, n_source,
         least(floor({TMIX_TARGET}.0 * rt / sum_rt / n_source::DOUBLE
                     * {BUCKETS}.0)::BIGINT, {BUCKETS}) AS threshold
  FROM rts CROSS JOIN s
),
kept AS (
  SELECT d.source, d.n_chars
  FROM documents d JOIN thr USING (source)
  WHERE {_bucket_sql("tmix")} < threshold
),
ks AS (
  SELECT source, count(*)::BIGINT AS n_kept, sum(n_chars)::BIGINT AS kept_chars
  FROM kept GROUP BY source
)
SELECT t.source, t.n_source, t.threshold,
       coalesce(ks.n_kept, 0)::BIGINT AS n_kept,
       coalesce(ks.kept_chars, 0)::BIGINT AS kept_chars
FROM thr t LEFT JOIN ks USING (source)
ORDER BY t.source
"""

QUERIES.update({"sample_temperature_mixture": q_sample_temperature_mixture})
ORACLES.update({"sample_temperature_mixture": ORACLE_SAMPLE_TMIX})


# --- IPF raking: balance the corpus across two margins ----------------------

IPF_ROUNDS = 3


def q_sample_raking_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting (Deming & Stephan 1940 — "raking"):
    per-document sampling weights that simultaneously balance the corpus
    to UNIFORM source and lang margins — the two-constraint version of
    the per-source temperature mixtures, and the standard fix when a
    crawl is skewed on several axes at once. IPF factors depend only on
    the (source, lang) CELL, so the whole fit runs on the contingency
    table (sources x langs rows): IPF_ROUNDS alternating row/column
    scalings, each one margin rollup + one broadcast-back join of a
    margins-sized factor table. Everything is exact rational arithmetic
    until the final rounding, so the fitted weights hash-check.

    Output per cell: doc count, fitted per-doc weight, fitted cell mass,
    and the post-fit margin shares (the convergence evidence — source
    shares are exactly 1/|sources| after the last source scaling; lang
    shares are within the one-remaining-half-round residual)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    cells = docs.groupBy("source", "lang").agg(
        F.count("*").cast("bigint").alias("n")
    )
    w = cells.withColumn("wt", F.col("n").cast("double"))
    total = docs.count()
    n_src = w.select("source").distinct().count()
    n_lang = w.select("lang").distinct().count()
    t_src = float(total) / n_src  # uniform target mass per source
    t_lang = float(total) / n_lang
    for _ in range(IPF_ROUNDS):
        sm = w.groupBy("source").agg(F.sum("wt").alias("_sm")).select(
            F.col("source").alias("_s"), "_sm"
        )
        w = (
            w.join(F.broadcast(sm), F.col("source") == F.col("_s"))
            .withColumn("wt", F.col("wt") * F.lit(t_src) / F.col("_sm"))
            .drop("_s", "_sm")
        )
        lm = w.groupBy("lang").agg(F.sum("wt").alias("_lm")).select(
            F.col("lang").alias("_l"), "_lm"
        )
        w = (
            w.join(F.broadcast(lm), F.col("lang") == F.col("_l"))
            .withColumn("wt", F.col("wt") * F.lit(t_lang) / F.col("_lm"))
            .drop("_l", "_lm")
        )
    return w.select(
        "source",
        "lang",
        "n",
        F.round(F.col("wt") / F.col("n"), 6).alias("doc_weight_r"),
        F.round("wt", 6).alias("cell_mass_r"),
    ).orderBy("source", "lang")


def _raking_oracle() -> str:
    sql = ["""
WITH cells AS (
  SELECT source, lang, count(*)::BIGINT AS n FROM documents GROUP BY 1, 2
),
consts AS (
  SELECT (SELECT count(*) FROM documents) * 1.0
           / (SELECT count(DISTINCT source) FROM cells) AS t_src,
         (SELECT count(*) FROM documents) * 1.0
           / (SELECT count(DISTINCT lang) FROM cells) AS t_lang
),
w0 AS (SELECT source, lang, n, n * 1.0 AS wt FROM cells)"""]
    prev = "w0"
    for r in range(IPF_ROUNDS):
        sql.append(f""",
s{r} AS (
  SELECT w.source, w.lang, w.n,
         w.wt * c.t_src / sum(w.wt) OVER (PARTITION BY w.source) AS wt
  FROM {prev} w CROSS JOIN consts c
),
l{r} AS (
  SELECT w.source, w.lang, w.n,
         w.wt * c.t_lang / sum(w.wt) OVER (PARTITION BY w.lang) AS wt
  FROM s{r} w CROSS JOIN consts c
)""")
        prev = f"l{r}"
    sql.append(f"""
SELECT source, lang, n, round(wt / n, 6) AS doc_weight_r,
       round(wt, 6) AS cell_mass_r
FROM {prev} ORDER BY source, lang
""")
    return "".join(sql)


QUERIES.update({"sample_raking_weights": q_sample_raking_weights})
ORACLES.update({"sample_raking_weights": _raking_oracle()})
