"""Sketch queries (outside the driver's pinned 50-entry window; covered by
tests/test_oracle_parity.py against the same DuckDB oracles).

Operators exercised (`operators/sketches.py`):
- `kmv_distinct` — deterministic KMV distinct-count sketch; unlike HLL it is
  bit-identical across engines, so the estimate itself is oracle-checkable.
- `cms_build`/`cms_lookup` — count-min frequency sketch (Cormode &
  Muthukrishnan 2005) over the document term counts; the depth x width cell
  table and the min-over-rows point estimates are both hash-checked.
- `hist_quantiles` — fixed-bin histogram quantile estimator with the exact
  quantile riding along via a bounded single-bin sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.functions.text import duckdb_tokens, tokens
from pyvectorsearch_spark.operators.sketches import (
    cms_build,
    cms_lookup,
    duckdb_cms_bucket,
    duckdb_kmv_hash,
    hist_quantiles,
    kmv_distinct,
)
from pyvectorsearch_spark.sources.tables import load_table, spread

KMV_K = 32


def q_sketch_kmv_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-user estimate per event type (k=32, under the true
    ~150-user cardinality, so the ESTIMATION path runs — not the
    exact-below-capacity fallback). Exact distinct rides along as the
    accuracy reference."""
    ev = spread(load_table(spark, sf_dir, "events"))
    return kmv_distinct(ev, by="event_type", value_col="user_id", k=KMV_K).orderBy(
        "event_type"
    )


_U = duckdb_kmv_hash("user_id")

ORACLE_SKETCH_KMV_USERS = f"""
WITH d AS (
  SELECT DISTINCT event_type, {_U} AS u FROM events
),
ranked AS (
  SELECT event_type, u,
         row_number() OVER (PARTITION BY event_type ORDER BY u) AS r
  FROM d
),
mins AS (
  SELECT event_type, max(CASE WHEN r = {KMV_K} THEN u END) AS u_k
  FROM ranked GROUP BY event_type
),
tot AS (
  SELECT event_type, count(*)::BIGINT AS n_distinct_exact FROM d
  GROUP BY event_type
)
SELECT event_type, n_distinct_exact,
       CASE WHEN u_k IS NOT NULL THEN round(({KMV_K} - 1) / u_k, 3)
            ELSE n_distinct_exact::DOUBLE END AS kmv_estimate,
       round(u_k, 9) AS u_k
FROM tot JOIN mins USING (event_type)
ORDER BY event_type
"""


CMS_DEPTH = 4
CMS_WIDTH = 512
CMS_TOP = 20


def q_sketch_cms_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus term frequencies (depth 4, width
    512 — deliberately narrow so collisions actually occur and the
    overcount column exercises the min-over-rows estimate, not the trivial
    exact path). Probes are the exact top-20 terms; `overcount` =
    estimate - truth (always >= 0 for CMS). The term-count table is
    checkpointed once so the corpus is tokenized exactly once for both the
    sketch build and the probe ranking."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    tf = (
        docs.select(F.explode(tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("n_exact"))
        .localCheckpoint(eager=False)
    )
    sketch = cms_build(
        tf, term_col="term", count_col="n_exact", depth=CMS_DEPTH, width=CMS_WIDTH
    )
    probes = tf.orderBy(F.desc("n_exact"), "term").limit(CMS_TOP)
    return (
        cms_lookup(sketch, probes, term_col="term", depth=CMS_DEPTH, width=CMS_WIDTH)
        .select(
            "term",
            "n_exact",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("n_exact")).alias("overcount"),
        )
        .orderBy(F.desc("n_exact"), "term")
    )


_CMS_CELLS = " UNION ALL ".join(
    f"SELECT term, n_exact, {i} AS row, {duckdb_cms_bucket(i, 'term', CMS_WIDTH)}"
    f" AS bucket FROM tf"
    for i in range(CMS_DEPTH)
)

ORACLE_SKETCH_CMS_TERMS = f"""
WITH e AS (SELECT unnest({duckdb_tokens('text')}) AS term FROM documents),
tf AS (SELECT term, count(*)::BIGINT AS n_exact FROM e GROUP BY term),
cells AS ({_CMS_CELLS}),
cms AS (
  SELECT row, bucket, sum(n_exact)::BIGINT AS cnt FROM cells
  GROUP BY row, bucket
),
probes AS (
  SELECT term, n_exact FROM tf ORDER BY n_exact DESC, term LIMIT {CMS_TOP}
),
pcells AS (
  SELECT p.term, p.n_exact, c.row, c.bucket
  FROM probes p JOIN cells c USING (term)
),
est AS (
  SELECT p.term, p.n_exact, min(s.cnt) AS cms_estimate
  FROM pcells p JOIN cms s ON s.row = p.row AND s.bucket = p.bucket
  GROUP BY p.term, p.n_exact
)
SELECT term, n_exact, cms_estimate, cms_estimate - n_exact AS overcount
FROM est ORDER BY n_exact DESC, term
"""


HQ_BIN_CENTS = 10000  # $100-wide bins over l_extendedprice
HQ_QS = [0.5, 0.9, 0.99]


def q_sketch_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of lineitem extended price from a $100-bin histogram
    (integer-cents bucketing => engine-exact), with the true quantile
    alongside via the bounded containing-bin sort."""
    li = spread(load_table(spark, sf_dir, "lineitem"))
    return hist_quantiles(
        li, value_col="l_extendedprice", bin_cents=HQ_BIN_CENTS, qs=HQ_QS
    ).orderBy("q")


ORACLE_SKETCH_HIST_QUANTILES = f"""
WITH v AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS vc,
         CAST(floor(CAST(round(l_extendedprice * 100) AS BIGINT)
                    / {float(HQ_BIN_CENTS)!r}) AS BIGINT) AS bin
  FROM lineitem
),
h AS (SELECT bin, count(*)::BIGINT AS cnt FROM v GROUP BY bin),
c AS (
  SELECT bin, cnt,
         sum(cnt) OVER (ORDER BY bin)::BIGINT AS cum,
         (sum(cnt) OVER (ORDER BY bin) - cnt)::BIGINT AS cum_prev,
         (SELECT sum(cnt)::BIGINT FROM h) AS n
  FROM h
),
qs AS (
  -- cast to DOUBLE so q*n is double-by-double IEEE, matching Spark exactly
  -- (a DECIMAL q could ceil() differently on exact-integer boundaries)
  SELECT CAST(q AS DOUBLE) AS q FROM (VALUES (0.5), (0.9), (0.99)) t(q)
),
tgt AS (
  SELECT q, bin, cnt, cum_prev, n,
         CAST(ceil(q * n) AS BIGINT) AS r
  FROM qs JOIN c
    ON c.cum >= CAST(ceil(q * n) AS BIGINT)
   AND c.cum_prev < CAST(ceil(q * n) AS BIGINT)
),
ex AS (
  SELECT t.q, t.n, t.bin, t.cnt, t.cum_prev, t.r, v.vc,
         row_number() OVER (PARTITION BY t.q ORDER BY v.vc) AS rn
  FROM tgt t JOIN v ON v.bin = t.bin
)
SELECT q, n AS n_total,
       round((bin * {HQ_BIN_CENTS} + {HQ_BIN_CENTS} * (r - cum_prev)
              / CAST(cnt AS DOUBLE)) / 100.0, 3) AS est_quantile,
       round(vc / 100.0, 2) AS exact_quantile
FROM ex WHERE rn = r - cum_prev
ORDER BY q
"""



QB_N_BINS = 10
QB_BIN_CENTS = 10000


def q_price_decile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency decile binning of lineitem extended price — the
    quantile feature-bucketing step (boundaries from the histogram walk,
    assignment against a broadcast boundary array, per-bin occupancy and
    range). Bin populations are near-equal by construction; the exact
    counts, ranges, and sums are hash-checked."""
    from pyvectorsearch_spark.operators.sketches import quantile_bins

    li = spread(load_table(spark, sf_dir, "lineitem"))
    out = quantile_bins(
        li,
        value_col="l_extendedprice",
        n_bins=QB_N_BINS,
        bin_cents=QB_BIN_CENTS,
    )
    return out.select(
        F.col("bin_idx").cast("int").alias("bin_idx"),
        "n",
        "lo_r",
        "hi_r",
        "sum_cents",
    ).orderBy("bin_idx")


_QB_QS = ", ".join(f"({float(i) / QB_N_BINS!r})" for i in range(1, QB_N_BINS))

ORACLE_PRICE_DECILE_BINS = f"""
WITH v AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS vc,
         CAST(floor(CAST(round(l_extendedprice * 100) AS BIGINT)
                    / {float(QB_BIN_CENTS)!r}) AS BIGINT) AS bin
  FROM lineitem
),
h AS (SELECT bin, count(*)::BIGINT AS cnt FROM v GROUP BY bin),
c AS (
  SELECT bin, cnt,
         sum(cnt) OVER (ORDER BY bin)::BIGINT AS cum,
         (sum(cnt) OVER (ORDER BY bin) - cnt)::BIGINT AS cum_prev,
         (SELECT sum(cnt)::BIGINT FROM h) AS n
  FROM h
),
qs AS (SELECT CAST(q AS DOUBLE) AS q FROM (VALUES {_QB_QS}) t(q)),
tgt AS (
  SELECT q, bin, cnt, cum_prev, CAST(ceil(q * n) AS BIGINT) AS r
  FROM qs JOIN c
    ON c.cum >= CAST(ceil(q * n) AS BIGINT)
   AND c.cum_prev < CAST(ceil(q * n) AS BIGINT)
),
b AS (
  SELECT list(bound ORDER BY bound) AS bs FROM (
    SELECT bin * {QB_BIN_CENTS} + {QB_BIN_CENTS} * (r - cum_prev)
             / CAST(cnt AS DOUBLE) AS bound
    FROM tgt
  )
),
asg AS (
  SELECT vc, len(list_filter(bs, x -> vc > x))::INT AS bin_idx FROM v, b
)
SELECT bin_idx, count(*)::BIGINT AS n,
       round(min(vc) / 100.0, 2) AS lo_r,
       round(max(vc) / 100.0, 2) AS hi_r,
       sum(vc)::BIGINT AS sum_cents
FROM asg GROUP BY bin_idx ORDER BY bin_idx
"""


def q_sketch_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct estimates, both regimes in one result: per-type
    distinct USERS (~150 true << 2.5m — the linear-counting small-range
    branch fires) unioned with per-type distinct EVENT IDS (thousands — the
    raw harmonic estimator fires). The `harmonic_scaled` integer register
    checksum pins the full register state, so the hash match proves the
    sketch bit-identically, not just the rounded estimate."""
    from pyvectorsearch_spark.operators.sketches import hll_distinct

    ev = spread(load_table(spark, sf_dir, "events"))
    users = hll_distinct(ev, by="event_type", value_col="user_id").select(
        F.lit("users").alias("metric"), "*"
    )
    eids = hll_distinct(ev, by="event_type", value_col="event_id").select(
        F.lit("event_ids").alias("metric"), "*"
    )
    return users.unionByName(eids).orderBy("metric", "event_type")


def _hll_oracle() -> str:
    from pyvectorsearch_spark.operators.sketches import duckdb_hll_sql

    u = duckdb_hll_sql("events", "event_type", "user_id")
    e = duckdb_hll_sql("events", "event_type", "event_id")
    return f"""
WITH u AS ({u}), e AS ({e})
SELECT 'users' AS metric, grp AS event_type, n_distinct_exact, hll_estimate,
       n_empty_registers, harmonic_scaled FROM u
UNION ALL
SELECT 'event_ids' AS metric, grp AS event_type, n_distinct_exact,
       hll_estimate, n_empty_registers, harmonic_scaled FROM e
ORDER BY metric, event_type
"""


ORACLE_SKETCH_HLL_USERS = _hll_oracle()


QUERIES = {
    "sketch_kmv_users": q_sketch_kmv_users,
    "sketch_hll_users": q_sketch_hll_users,
    "sketch_cms_terms": q_sketch_cms_terms,
    "sketch_hist_quantiles": q_sketch_hist_quantiles,
    "price_decile_bins": q_price_decile_bins,
}
ORACLES = {
    "sketch_kmv_users": ORACLE_SKETCH_KMV_USERS,
    "sketch_hll_users": ORACLE_SKETCH_HLL_USERS,
    "sketch_cms_terms": ORACLE_SKETCH_CMS_TERMS,
    "sketch_hist_quantiles": ORACLE_SKETCH_HIST_QUANTILES,
    "price_decile_bins": ORACLE_PRICE_DECILE_BINS,
}


# --- AMS F2 (second frequency moment) sketch -----------------------------------

AMS_SKETCHES = 16


def q_sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alon–Matias–Szegedy F₂ sketch over user activity: 16 independent
    ±1-hash sketches X_i = Σ_u s_i(u)·f_u — each a plain map-side SUM over
    events (no per-user state at all!) — estimate F₂ = mean(X_i²) against
    the exact Σf². F₂ is the self-join size / skew second moment: the
    one-pass answer to "how bad is this key's skew" that
    `join_size_estimate` reads off exact histograms. The sketch is O(R)
    memory at ANY key cardinality and merges by addition across shards.

    Determinism: s_i(u) = parity of an md5 nibble of (i, u) — the shared
    engine-exact hash family; every X_i and the exact F₂ are bigints; one
    division at the end.

    Scale: the estimate path never groups by user — R partial sums in one
    map-side-combined aggregate; the exact path (for the report's truth
    column) is one user rollup."""
    ev = spread(load_table(spark, sf_dir, "events")).select("user_id")
    r = spark.range(AMS_SKETCHES).select(F.col("id").cast("int").alias("i"))
    sign = 1 - 2 * (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("i").cast("string"),
                        F.lit(":"),
                        F.col("user_id").cast("string"),
                    )
                ),
                1,
                1,
            ),
            16,
            10,
        ).cast("int")
        % 2
    )
    xs = (
        ev.crossJoin(F.broadcast(r))
        .groupBy("i")
        .agg(F.sum(sign).cast("bigint").alias("_x"))
    )
    est = xs.agg(
        F.count("*").cast("bigint").alias("_r"),
        F.sum(F.col("_x") * F.col("_x")).cast("bigint").alias("_sx2"),
    )
    true = (
        ev.groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("_f"))
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.sum(F.col("_f") * F.col("_f")).cast("bigint").alias("f2_true"),
        )
    )
    return (
        est.crossJoin(F.broadcast(true))
        .select(
            "n_users",
            "f2_true",
            F.round(F.col("_sx2") / F.col("_r").cast("double"), 2).alias(
                "f2_estimate_r"
            ),
            F.round(
                F.abs(
                    F.col("_sx2") / F.col("_r").cast("double")
                    - F.col("f2_true")
                )
                / F.col("f2_true").cast("double"),
                6,
            ).alias("rel_err_r"),
        )
    )


ORACLE_SKETCH_AMS = f"""
WITH r AS (SELECT unnest(range({AMS_SKETCHES}))::INT AS i),
xs AS (
  SELECT r.i,
         sum(1 - 2 * (('0x' || substr(md5(r.i::VARCHAR || ':'
                       || e.user_id::VARCHAR), 1, 1))::BIGINT % 2))::BIGINT
           AS x
  FROM events e CROSS JOIN r GROUP BY r.i
),
est AS (SELECT count(*)::BIGINT AS rr, sum(x * x)::BIGINT AS sx2 FROM xs),
tru AS (
  SELECT count(*)::BIGINT AS n_users, sum(f * f)::BIGINT AS f2_true
  FROM (SELECT user_id, count(*)::BIGINT AS f FROM events GROUP BY user_id)
)
SELECT t.n_users, t.f2_true,
       round(e.sx2 / CAST(e.rr AS DOUBLE), 2) AS f2_estimate_r,
       round(abs(e.sx2 / CAST(e.rr AS DOUBLE) - t.f2_true)
             / CAST(t.f2_true AS DOUBLE), 6) AS rel_err_r
FROM est e CROSS JOIN tru t
"""

QUERIES.update({"sketch_ams_f2": q_sketch_ams_f2})
ORACLES.update({"sketch_ams_f2": ORACLE_SKETCH_AMS})


# --- KMV hash-sample quantiles ----------------------------------------------

KMVQ_K = 256
KMVQ_PS = [0.25, 0.5, 0.75, 0.9, 0.99]


def q_sketch_kmv_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from the KMV hash-sample: the k rows with the
    smallest md5(key) are a DETERMINISTIC uniform sample (the same
    bottom-k-by-hash structure the KMV distinct-count sketch keeps), and
    bottom-k of a union is bottom-k of the merged bottom-ks — the sketch
    is mergeable across partitions/days with no coordination. Quantiles
    interpolated over the sample vs the exact distributed `percentile`
    aggregate, with absolute/relative error per p.

    Scale shape: the sample is ONE bounded TakeOrdered(k) — no full sort,
    no quantile state; the exact side (one sort-based aggregate) is the
    ground-truth leg of the error report, not the scale path."""
    o = spread(load_table(spark, sf_dir, "orders")).select(
        "o_orderkey", "o_totalprice"
    )
    samp = o.withColumn(
        "_h", F.md5(F.col("o_orderkey").cast("string"))
    ).orderBy("_h").limit(KMVQ_K)
    ps = F.lit(KMVQ_PS)
    est = samp.agg(
        F.percentile("o_totalprice", ps).alias("_est"),
        F.count("*").cast("bigint").alias("k"),
    )
    exact = o.agg(
        F.percentile("o_totalprice", ps).alias("_ex"),
        F.count("*").cast("bigint").alias("n_total"),
    )
    joined = est.crossJoin(exact)
    cols = [F.col("n_total"), F.col("k")]
    for i, p in enumerate(KMVQ_PS):
        e = F.element_at("_est", i + 1)
        x = F.element_at("_ex", i + 1)
        tag = str(p).replace("0.", "p")
        cols += [
            F.round(e, 6).alias(f"{tag}_est"),
            F.round(x, 6).alias(f"{tag}_exact"),
            F.round(F.abs(e - x) / x, 6).alias(f"{tag}_relerr"),
        ]
    return joined.select(*cols)


def _kmvq_oracle() -> str:
    parts = ["n_total", "k"]
    for p in KMVQ_PS:
        tag = str(p).replace("0.", "p")
        parts += [
            f"round(quantile_cont(s.o_totalprice, {p}), 6) AS {tag}_est",
            f"round((SELECT quantile_cont(o_totalprice, {p}) FROM orders), 6)"
            f" AS {tag}_exact",
            f"round(abs(quantile_cont(s.o_totalprice, {p})"
            f" - (SELECT quantile_cont(o_totalprice, {p}) FROM orders))"
            f" / (SELECT quantile_cont(o_totalprice, {p}) FROM orders), 6)"
            f" AS {tag}_relerr",
        ]
    sel = ", ".join(parts)
    return f"""
WITH s AS (
  SELECT o_totalprice FROM orders
  ORDER BY md5(CAST(o_orderkey AS VARCHAR)) LIMIT {KMVQ_K}
),
m AS (SELECT (SELECT count(*) FROM orders)::BIGINT AS n_total,
             count(*)::BIGINT AS k FROM s)
SELECT {sel} FROM s CROSS JOIN m GROUP BY n_total, k
"""


QUERIES.update({"sketch_kmv_quantiles": q_sketch_kmv_quantiles})
ORACLES.update({"sketch_kmv_quantiles": _kmvq_oracle()})
