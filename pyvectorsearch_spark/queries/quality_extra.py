"""Data-quality / monitoring queries (outside the driver's pinned 50-entry
window; covered by tests/test_oracle_parity.py against the same DuckDB
oracles).

Operators exercised: `operators/quality.py::psi_drift` (Population Stability
Index drift alarm) and `profile_table` (single-pass column profiler).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.operators.quality import profile_table, psi_drift
from pyvectorsearch_spark.sources.tables import load_table, spread

PSI_BUCKET_W = 25.0
PSI_BUCKETS = 20
PSI_EPS = 1e-6
PSI_SPLIT_DAY = 16


def q_events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type PSI between the first and second half of the month —
    the distribution-drift alarm over the `value` feature."""
    ev = spread(load_table(spark, sf_dir, "events")).withColumn(
        "_is_cur", F.dayofmonth("ts") >= PSI_SPLIT_DAY
    )
    return psi_drift(
        ev,
        by="event_type",
        value_col="value",
        split_col="_is_cur",
        bucket_width=PSI_BUCKET_W,
        n_buckets=PSI_BUCKETS,
        eps=PSI_EPS,
    ).orderBy("event_type")


ORACLE_EVENTS_PSI = f"""
WITH h AS (
  SELECT event_type,
         least(CAST(floor(value / {PSI_BUCKET_W}) AS INT), {PSI_BUCKETS - 1}) AS b,
         (date_part('day', ts) >= {PSI_SPLIT_DAY}) AS cur
  FROM events
),
g AS (
  SELECT event_type, b,
         sum(CASE WHEN NOT cur THEN 1 ELSE 0 END) AS nb,
         sum(CASE WHEN cur THEN 1 ELSE 0 END) AS nc
  FROM h GROUP BY event_type, b
),
t AS (
  SELECT *, sum(nb) OVER (PARTITION BY event_type) AS tb,
            sum(nc) OVER (PARTITION BY event_type) AS tc
  FROM g
),
c AS (
  SELECT event_type, tb, tc,
         round((greatest(nc / greatest(tc, 1), {PSI_EPS})
                - greatest(nb / greatest(tb, 1), {PSI_EPS}))
               * ln(greatest(nc / greatest(tc, 1), {PSI_EPS})
                    / greatest(nb / greatest(tb, 1), {PSI_EPS})), 6) AS contrib
  FROM t
)
SELECT event_type, max(tb)::BIGINT AS n_base, max(tc)::BIGINT AS n_cur,
       round(sum(contrib), 6) AS psi
FROM c GROUP BY event_type ORDER BY event_type
"""


def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile of `orders`: null counts, exact distincts,
    numeric/string min-max — the schema-drift monitor row set."""
    return profile_table(spread(load_table(spark, sf_dir, "orders")))


# (column, kind) — kind drives which min/max cells are non-NULL; must match
# operators.quality.profile_table's type dispatch on the parquet schema.
_ORDERS_COLS = [
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "other"),
    ("o_orderpriority", "str"),
]


def _profile_oracle() -> str:
    parts = []
    for c, kind in _ORDERS_COLS:
        min_num = f"round(min({c})::DOUBLE, 6)" if kind == "num" else "NULL::DOUBLE"
        max_num = f"round(max({c})::DOUBLE, 6)" if kind == "num" else "NULL::DOUBLE"
        min_str = f"min({c})" if kind == "str" else "NULL::VARCHAR"
        max_str = f"max({c})" if kind == "str" else "NULL::VARCHAR"
        parts.append(
            f"""SELECT '{c}' AS "column", count(*)::BIGINT AS n_rows,
  sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
  count(DISTINCT {c})::BIGINT AS n_distinct,
  {min_num} AS min_num, {max_num} AS max_num,
  {min_str} AS min_str, {max_str} AS max_str
FROM orders"""
        )
    return "\nUNION ALL\n".join(parts) + '\nORDER BY "column"'


ORACLE_PROFILE_ORDERS = _profile_oracle()


VALID_STATUSES = ("F", "O", "P")


def q_validate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation suite over orders: positive totals, non-null dates,
    status domain, and customer referential integrity (distributed
    anti-join against distinct customer keys)."""
    from pyvectorsearch_spark.operators.quality import expectation_report

    orders = spread(load_table(spark, sf_dir, "orders"))
    customer = load_table(spark, sf_dir, "customer")
    rules = [
        ("total_positive", F.col("o_totalprice") > 0),
        ("orderdate_not_null", F.col("o_orderdate").isNotNull()),
        ("status_in_domain", F.col("o_orderstatus").isin(*VALID_STATUSES)),
    ]
    fks = [("custkey_fk", "o_custkey", customer, "c_custkey")]
    return expectation_report(orders, rules, foreign_keys=fks)


_STATUS_IN = ", ".join(f"'{s}'" for s in VALID_STATUSES)

ORACLE_VALIDATE_ORDERS = f"""
WITH base AS (
  SELECT count(*)::BIGINT AS n,
         sum(CASE WHEN coalesce(o_totalprice > 0, FALSE) THEN 0 ELSE 1 END)
           ::BIGINT AS v_total,
         sum(CASE WHEN o_orderdate IS NOT NULL THEN 0 ELSE 1 END)
           ::BIGINT AS v_date,
         sum(CASE WHEN coalesce(o_orderstatus IN ({_STATUS_IN}), FALSE)
                  THEN 0 ELSE 1 END)::BIGINT AS v_status
  FROM orders
),
fk AS (
  SELECT count(*)::BIGINT AS v_fk FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
),
rows_out AS (
  SELECT 'total_positive' AS rule, n AS n_rows, v_total AS n_violations
  FROM base
  UNION ALL
  SELECT 'orderdate_not_null', n, v_date FROM base
  UNION ALL
  SELECT 'status_in_domain', n, v_status FROM base
  UNION ALL
  SELECT 'custkey_fk', base.n, fk.v_fk FROM base CROSS JOIN fk
)
SELECT rule, n_rows, n_violations,
       round(n_violations / greatest(n_rows, 1)::DOUBLE, 6) AS violation_frac
FROM rows_out ORDER BY rule
"""


def q_events_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and hour-of-day — the
    feature-dependency profile over the event stream."""
    from pyvectorsearch_spark.operators.quality import entropy_mi

    ev = spread(load_table(spark, sf_dir, "events")).select(
        "event_type", F.hour("ts").alias("hr")
    )
    return entropy_mi(ev, col_a="event_type", col_b="hr")


ORACLE_EVENTS_MI = """
WITH joint AS (
  SELECT event_type AS a, date_part('hour', ts)::INT AS b,
         count(*)::BIGINT AS c
  FROM events GROUP BY a, b
),
tot AS (SELECT sum(c)::BIGINT AS n FROM joint),
hab AS (
  SELECT round(sum(round(-(c / n::DOUBLE) * ln(c / n::DOUBLE), 6)), 6) AS h
  FROM joint CROSS JOIN tot
),
ma AS (SELECT a, sum(c)::BIGINT AS c FROM joint GROUP BY a),
ha AS (
  SELECT round(sum(round(-(c / n::DOUBLE) * ln(c / n::DOUBLE), 6)), 6) AS h
  FROM ma CROSS JOIN tot
),
mb AS (SELECT b, sum(c)::BIGINT AS c FROM joint GROUP BY b),
hb AS (
  SELECT round(sum(round(-(c / n::DOUBLE) * ln(c / n::DOUBLE), 6)), 6) AS h
  FROM mb CROSS JOIN tot
)
SELECT tot.n AS n_rows, ha.h AS h_a, hb.h AS h_b, hab.h AS h_ab,
       round(ha.h + hb.h - hab.h, 6) AS mi
FROM tot CROSS JOIN ha CROSS JOIN hb CROSS JOIN hab
"""




QUERIES = {
    "events_psi_drift": q_events_psi_drift,
    "profile_orders": q_profile_orders,
    "validate_orders": q_validate_orders,
    "events_mi": q_events_mi,
}
ORACLES = {
    "events_psi_drift": ORACLE_EVENTS_PSI,
    "profile_orders": ORACLE_PROFILE_ORDERS,
    "validate_orders": ORACLE_VALIDATE_ORDERS,
    "events_mi": ORACLE_EVENTS_MI,
}


# --- two-sample Kolmogorov–Smirnov drift -------------------------------------


def q_events_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov drift per event type: D = the
    largest ECDF gap of the `value` feature between the first and second
    half of the month (same split as `events_psi_drift`). PSI needs bins
    and an epsilon; KS is the bin-free companion — it catches a median
    shift that PSI's wide buckets smear away.

    Fully integer until display: values are cents, the ECDF gap is compared
    as |c1·N2 − c2·N1| (bigint cross-multiplied — no float ever enters the
    argmax), ties break to the smallest value, and only the final D and its
    location round for display. Engine-exact by construction.

    Scale: the fact table collapses to distinct (type, value-cent) cells in
    one map-side combine; the ECDF window orders THOSE cells per type — an
    aggregate-then-window over the value domain, never a sort of raw
    events."""
    from pyspark.sql import Window

    ev = spread(load_table(spark, sf_dir, "events")).select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("_vc"),
        (F.dayofmonth("ts") >= PSI_SPLIT_DAY).alias("_cur"),
    )
    cells = ev.groupBy("event_type", "_vc").agg(
        F.sum(F.when(~F.col("_cur"), 1).otherwise(0)).cast("bigint").alias("_a"),
        F.sum(F.when(F.col("_cur"), 1).otherwise(0)).cast("bigint").alias("_b"),
    )
    tot = cells.groupBy("event_type").agg(
        F.sum("_a").cast("bigint").alias("n_early"),
        F.sum("_b").cast("bigint").alias("n_late"),
    )
    w = Window.partitionBy("event_type").orderBy("_vc").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ecdf = (
        cells.withColumn("_ca", F.sum("_a").over(w).cast("bigint"))
        .withColumn("_cb", F.sum("_b").over(w).cast("bigint"))
        .join(tot, "event_type")
        .withColumn(
            "_gap",
            F.abs(F.col("_ca") * F.col("n_late") - F.col("_cb") * F.col("n_early")),
        )
    )
    wmax = Window.partitionBy("event_type").orderBy(
        F.desc("_gap"), F.asc("_vc")
    )
    return (
        ecdf.withColumn("_rk", F.row_number().over(wmax))
        .filter(F.col("_rk") == 1)
        .select(
            "event_type",
            "n_early",
            "n_late",
            F.round(
                F.col("_gap")
                / (F.col("n_early") * F.col("n_late")).cast("double"),
                6,
            ).alias("ks_d_r"),
            F.round(F.col("_vc") / 100.0, 2).alias("d_at_value_r"),
        )
        .orderBy("event_type")
    )


ORACLE_EVENTS_KS = f"""
WITH ev AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc,
         (day(CAST(ts AS TIMESTAMP)) >= {PSI_SPLIT_DAY}) AS cur
  FROM events
),
cells AS (
  SELECT event_type, vc,
         sum(CASE WHEN cur THEN 0 ELSE 1 END)::BIGINT AS a,
         sum(CASE WHEN cur THEN 1 ELSE 0 END)::BIGINT AS b
  FROM ev GROUP BY event_type, vc
),
tot AS (
  SELECT event_type, sum(a)::BIGINT AS n_early, sum(b)::BIGINT AS n_late
  FROM cells GROUP BY event_type
),
ecdf AS (
  SELECT c.event_type, c.vc, t.n_early, t.n_late,
         abs(sum(c.a) OVER (PARTITION BY c.event_type ORDER BY c.vc) * t.n_late
             - sum(c.b) OVER (PARTITION BY c.event_type ORDER BY c.vc)
               * t.n_early)::BIGINT AS gap
  FROM cells c JOIN tot t ON c.event_type = t.event_type
),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY gap DESC, vc ASC) AS rn
  FROM ecdf
)
SELECT event_type, n_early, n_late,
       round(gap / CAST(n_early * n_late AS DOUBLE), 6) AS ks_d_r,
       round(vc / 100.0, 2) AS d_at_value_r
FROM rk WHERE rn = 1 ORDER BY event_type
"""



# --- corpus composition diversity ---------------------------------------------


def q_corpus_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-composition diversity along each categorical axis (source,
    lang): Shannon entropy of the mix, the effective category count
    exp(H) ("20 sources that behave like 7.3"), and KL divergence from the
    uniform mix — the one-row summary a mixture rebalancer optimizes
    against (`sample_weighted_mixture` changes the mix; this scores it).

    Determinism: category counts are bigints; per-category p·ln(p) terms
    round to 6 dp and fix to micro-units so the entropy sum is exact; the
    KL-to-uniform identity ln(K) − H uses the same fixed value.

    Scale: one map-side rollup per axis over the corpus, then arithmetic
    on category-sized cells."""
    docs = load_table(spark, sf_dir, "documents")

    def axis(col: str) -> DataFrame:
        c = docs.groupBy(col).agg(F.count("*").cast("bigint").alias("_n"))
        tot = c.agg(
            F.sum("_n").cast("bigint").alias("_t"),
            F.count("*").cast("bigint").alias("_k"),
        )
        terms = c.crossJoin(F.broadcast(tot)).select(
            "_t",
            "_k",
            F.round(
                (F.col("_n") / F.col("_t").cast("double"))
                * F.log(F.col("_n") / F.col("_t").cast("double"))
                * -1000000
            )
            .cast("bigint")
            .alias("_hu"),
        )
        return terms.groupBy("_t", "_k").agg(
            F.sum("_hu").cast("bigint").alias("_h")
        ).select(
            F.lit(col).alias("axis"),
            F.col("_k").alias("n_categories"),
            F.round(F.col("_h") / 1000000.0, 4).alias("entropy_nats_r"),
            F.round(F.exp(F.col("_h") / 1000000.0), 4).alias(
                "effective_categories_r"
            ),
            (
                F.round(
                    F.log(F.col("_k").cast("double"))
                    - F.col("_h") / 1000000.0,
                    4,
                )
                + F.lit(0.0)  # normalize IEEE -0.0 (exact-uniform mixes)
            ).alias("kl_to_uniform_r"),
        )

    return axis("source").unionByName(axis("lang")).orderBy("axis")


def _diversity_oracle() -> str:
    def axis(col: str) -> str:
        return f"""
SELECT '{col}' AS axis, k AS n_categories,
       round(h / 1000000.0, 4) AS entropy_nats_r,
       round(exp(h / 1000000.0), 4) AS effective_categories_r,
       round(ln(k) - h / 1000000.0, 4) + 0.0 AS kl_to_uniform_r
FROM (
  SELECT max(k) AS k, sum(hu)::BIGINT AS h FROM (
    SELECT (SELECT count(DISTINCT {col}) FROM documents) AS k,
           CAST(round((n / t) * ln(n / t) * -1000000) AS BIGINT) AS hu
    FROM (
      SELECT count(*)::BIGINT AS n,
             (SELECT count(*) FROM documents)::DOUBLE AS t
      FROM documents GROUP BY {col}
    )
  )
)
"""

    return axis("source") + " UNION ALL " + axis("lang") + " ORDER BY axis"


ORACLE_CORPUS_DIVERSITY = _diversity_oracle()



# --- two-proportion z-test (A/B) -----------------------------------------------

AB_Z_CRIT = 1.959964


def q_events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on purchase conversion between a deterministic
    A/B split (even vs odd user_id standing in for control/treatment):
    per-arm converter shares, the pooled-variance z statistic, and the
    ±1.96 verdict — the experiment-readout primitive (`events_ks_drift`
    compares distributions; this tests ONE success rate the way an A/B
    dashboard does).

    Determinism: converters and arm sizes are exact distinct counts; z is
    a single closed-form expression of four bigints, rounded 6 dp.

    Scale: one distinct-user rollup (map-side combined) and a 1-row
    report."""
    ev = spread(load_table(spark, sf_dir, "events"))
    users = ev.groupBy((F.col("user_id") % 2 == 0).alias("_arm_a"),
                       "user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("_conv")
    )
    m = users.agg(
        F.sum(F.when(F.col("_arm_a"), 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(~F.col("_arm_a"), 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("_arm_a"), F.col("_conv")).otherwise(0))
        .cast("bigint")
        .alias("x_a"),
        F.sum(F.when(~F.col("_arm_a"), F.col("_conv")).otherwise(0))
        .cast("bigint")
        .alias("x_b"),
    )
    p1 = m["x_a"] / m["n_a"].cast("double")
    p2 = m["x_b"] / m["n_b"].cast("double")
    pp = (m["x_a"] + m["x_b"]) / (m["n_a"] + m["n_b"]).cast("double")
    se = F.sqrt(
        pp * (1.0 - pp) * (1.0 / m["n_a"].cast("double") + 1.0 / m["n_b"].cast("double"))
    )
    z = F.when(se > 0, F.round((p1 - p2) / se, 6)).otherwise(F.lit(0.0))
    return m.select(
        "n_a",
        "n_b",
        F.round(p1, 6).alias("conv_a_r"),
        F.round(p2, 6).alias("conv_b_r"),
        z.alias("z_r"),
        (F.abs(z) > AB_Z_CRIT).alias("significant"),
    )


ORACLE_EVENTS_AB = f"""
WITH users AS (
  SELECT (user_id % 2 = 0) AS arm_a, user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT sum(CASE WHEN arm_a THEN 1 ELSE 0 END)::BIGINT AS n_a,
         sum(CASE WHEN arm_a THEN 0 ELSE 1 END)::BIGINT AS n_b,
         sum(CASE WHEN arm_a THEN conv ELSE 0 END)::BIGINT AS x_a,
         sum(CASE WHEN arm_a THEN 0 ELSE conv END)::BIGINT AS x_b
  FROM users
)
SELECT n_a, n_b,
       round(x_a / CAST(n_a AS DOUBLE), 6) AS conv_a_r,
       round(x_b / CAST(n_b AS DOUBLE), 6) AS conv_b_r,
       CASE WHEN sqrt(((x_a + x_b) / CAST(n_a + n_b AS DOUBLE))
                      * (1.0 - (x_a + x_b) / CAST(n_a + n_b AS DOUBLE))
                      * (1.0 / n_a + 1.0 / n_b)) > 0
            THEN round((x_a / CAST(n_a AS DOUBLE) - x_b / CAST(n_b AS DOUBLE))
                       / sqrt(((x_a + x_b) / CAST(n_a + n_b AS DOUBLE))
                              * (1.0 - (x_a + x_b) / CAST(n_a + n_b AS DOUBLE))
                              * (1.0 / n_a + 1.0 / n_b)), 6)
            ELSE 0.0 END AS z_r,
       abs(CASE WHEN sqrt(((x_a + x_b) / CAST(n_a + n_b AS DOUBLE))
                      * (1.0 - (x_a + x_b) / CAST(n_a + n_b AS DOUBLE))
                      * (1.0 / n_a + 1.0 / n_b)) > 0
            THEN round((x_a / CAST(n_a AS DOUBLE) - x_b / CAST(n_b AS DOUBLE))
                       / sqrt(((x_a + x_b) / CAST(n_a + n_b AS DOUBLE))
                              * (1.0 - (x_a + x_b) / CAST(n_a + n_b AS DOUBLE))
                              * (1.0 / n_a + 1.0 / n_b)), 6)
            ELSE 0.0 END) > {AB_Z_CRIT} AS significant
FROM m
"""



# --- df.stat crosstab ---------------------------------------------------------------


def q_documents_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`DataFrame.stat.crosstab` — the contingency-table convenience API —
    pivots source×lang counts to a wide table; unpivoting it back to long
    form must equal the direct GROUP BY (same inverse-pair proof as
    `status_unpivot_roundtrip`, here covering the df.stat surface the
    chi-square test consumes as cells)."""
    docs = load_table(spark, sf_dir, "documents")
    ct = docs.stat.crosstab("source", "lang")
    langs = [c for c in ct.columns if c != "source_lang"]
    long = ct.unpivot(
        ids=["source_lang"],
        values=sorted(langs),
        variableColumnName="lang",
        valueColumnName="n_docs",
    )
    return (
        long.filter(F.col("n_docs") > 0)
        .select(
            F.col("source_lang").alias("source"),
            "lang",
            F.col("n_docs").cast("bigint").alias("n_docs"),
        )
        .orderBy("source", "lang")
    )


ORACLE_DOCUMENTS_CROSSTAB = """
SELECT source, lang, count(*)::BIGINT AS n_docs
FROM documents GROUP BY source, lang ORDER BY source, lang
"""



# --- Benjamini–Hochberg FDR over the KS drift family ---------------------------------

BH_ALPHA = 0.05


def q_events_ks_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple-testing control over the drift monitors: the per-type KS
    statistics get asymptotic p-values (p ≈ 2·exp(−2·D²·n_eff), n_eff =
    n₁n₂/(n₁+n₂)) and Benjamini–Hochberg picks which types genuinely
    drifted at FDR α=0.05 — five tests a month WILL produce false alarms
    at raw α; BH is the correction a fleet of drift monitors needs before
    paging anyone.

    Determinism: D comes from the exact integer ECDF ladder
    (`events_ks_drift`'s construction); p micro-fixes after one exp; BH's
    step-up rule is integer rank arithmetic on the micro p (reject rank ≤
    the largest k with p_(k) ≤ k·α/m — computed with a cross-multiplied
    integer comparison, no division).

    Scale: everything after the KS cells is an m-rows (event types)
    computation."""
    from pyspark.sql import Window

    ks = q_events_ks_drift(spark, sf_dir).select(
        "event_type", "n_early", "n_late", "ks_d_r"
    )
    ne = (F.col("n_early") * F.col("n_late")) / (
        F.col("n_early") + F.col("n_late")
    ).cast("double")
    p = F.least(
        F.lit(1.0),
        2.0 * F.exp(-2.0 * F.col("ks_d_r") * F.col("ks_d_r") * ne),
    )
    scored = ks.withColumn(
        "_pu", F.round(p * 1000000).cast("bigint")
    )
    m = scored.agg(F.count("*").cast("bigint").alias("_m"))
    w = Window.orderBy("_pu", "event_type")
    ranked = scored.crossJoin(F.broadcast(m)).withColumn(
        "_rk", F.row_number().over(w)
    )
    # step-up: flag ranks with p_(k) <= k*alpha/m  (micro-p * m <= k * alpha_u * 1)
    alpha_u = int(BH_ALPHA * 1000000)
    flagged = ranked.withColumn(
        "_ok", F.col("_pu") * F.col("_m") <= F.col("_rk") * F.lit(alpha_u)
    )
    kmax = flagged.agg(
        F.coalesce(
            F.max(F.when(F.col("_ok"), F.col("_rk"))), F.lit(0)
        ).alias("_kmax")
    )
    return (
        flagged.crossJoin(F.broadcast(kmax))
        .select(
            "event_type",
            F.col("ks_d_r"),
            F.round(F.col("_pu") / 1000000.0, 6).alias("p_value_r"),
            F.col("_rk").cast("int").alias("p_rank"),
            (F.col("_rk") <= F.col("_kmax")).alias("drift_detected"),
        )
        .orderBy("p_rank")
    )


ORACLE_EVENTS_KS_BH = f"""
WITH ks AS ({ORACLE_EVENTS_KS.replace(';', '')}),
scored AS (
  SELECT event_type, ks_d_r,
         CAST(round(least(1.0,
              2.0 * exp(-2.0 * ks_d_r * ks_d_r
                        * ((n_early * n_late)
                           / CAST(n_early + n_late AS DOUBLE))))
              * 1000000) AS BIGINT) AS pu
  FROM ks
),
m AS (SELECT count(*)::BIGINT AS m FROM scored),
ranked AS (
  SELECT s.*, m.m,
         row_number() OVER (ORDER BY s.pu, s.event_type) AS rk
  FROM scored s CROSS JOIN m
),
flagged AS (
  SELECT *, (pu * m <= rk * {int(BH_ALPHA * 1000000)}) AS ok FROM ranked
),
kmax AS (
  SELECT coalesce(max(CASE WHEN ok THEN rk END), 0) AS kmax FROM flagged
)
SELECT f.event_type, f.ks_d_r,
       round(f.pu / 1000000.0, 6) AS p_value_r,
       f.rk::INT AS p_rank,
       (f.rk <= k.kmax) AS drift_detected
FROM flagged f CROSS JOIN kmax k ORDER BY p_rank
"""



# NOTE: the round-4 additions in this file (KS drift, diversity, A/B, crosstab,
# BH-FDR) register via queries/quality_wave3.py, which sits AFTER the driver's
# pinned 50-entry window — keeping the window membership byte-stable across
# rounds (the round-2 verdict's "keep the window stable" directive).


# --- CUPED-adjusted A/B readout -----------------------------------------------------


def q_events_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013) on the A/B readout:
    per-user outcome y = second-half purchase count, covariate x =
    first-half total activity; the adjusted outcome y − θ·(x − x̄) with
    θ = cov(x,y)/var(x) removes the variance the pre-period already
    explains, shrinking the same experiment's confidence interval for
    free. Reports raw and CUPED z-statistics and the variance ratio
    (adjusted/raw pooled variance — the fraction of noise that REMAINS) —
    the production experimentation readout beside `events_ab_test`'s
    textbook one.

    Determinism: per-user integer counts; θ from exact DECIMAL moments;
    adjusted outcomes micro-fixed to bigints so arm sums are exact; the
    z's and ratio are final double expressions of those integers.

    Scale: one user rollup, one 1-row moment pass, one arm rollup."""
    ev = spread(load_table(spark, sf_dir, "events"))
    users = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                (F.dayofmonth("ts") >= PSI_SPLIT_DAY)
                & (F.col("event_type") == "purchase"),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("_y"),
        F.sum(F.when(F.dayofmonth("ts") < PSI_SPLIT_DAY, 1).otherwise(0))
        .cast("bigint")
        .alias("_x"),
    ).withColumn("_arm_a", F.col("user_id") % 2 == 0)
    dd = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = users.agg(
        F.count("*").cast("bigint").alias("_n"),
        F.sum("_x").cast("bigint").alias("_sx"),
        F.sum("_y").cast("bigint").alias("_sy"),
        F.sum(dd(F.col("_x")) * dd(F.col("_y"))).alias("_sxy"),
        F.sum(dd(F.col("_x")) * dd(F.col("_x"))).alias("_sxx"),
    )
    theta_num = dd(m["_n"]) * m["_sxy"] - dd(m["_sx"]) * dd(m["_sy"])
    theta_den = dd(m["_n"]) * m["_sxx"] - dd(m["_sx"]) * dd(m["_sx"])
    theta = F.when(
        theta_den != 0,
        F.round(theta_num.cast("double") / theta_den.cast("double"), 6),
    ).otherwise(F.lit(0.0))
    mt = m.select(
        theta.alias("_theta"),
        F.round(m["_sx"] / m["_n"].cast("double"), 6).alias("_xbar"),
    )
    adj = users.crossJoin(F.broadcast(mt)).select(
        "_arm_a",
        "_y",
        F.round(
            (
                F.col("_y").cast("double")
                - F.col("_theta")
                * (F.col("_x").cast("double") - F.col("_xbar"))
            )
            * 1000000
        )
        .cast("bigint")
        .alias("_yu"),
    )
    arm = adj.groupBy("_arm_a").agg(
        F.count("*").cast("bigint").alias("na"),
        F.sum("_y").cast("bigint").alias("sy"),
        F.sum(F.col("_y") * F.col("_y")).cast("bigint").alias("syy"),
        F.sum("_yu").cast("bigint").alias("su"),
        F.sum(dd(F.col("_yu")) * dd(F.col("_yu"))).alias("suu"),
    )
    a = arm.filter(F.col("_arm_a")).drop("_arm_a")
    b = arm.filter(~F.col("_arm_a")).drop("_arm_a")
    for c in list(a.columns):
        a = a.withColumnRenamed(c, c + "_a")
    for c in list(b.columns):
        b = b.withColumnRenamed(c, c + "_b")
    j = a.crossJoin(F.broadcast(b))

    def mean(s, n):
        return F.col(s).cast("double") / F.col(n)

    def var(s, ss, n):
        return F.col(ss).cast("double") / F.col(n) - mean(s, n) * mean(s, n)

    se_raw = F.sqrt(
        var("sy_a", "syy_a", "na_a") / F.col("na_a")
        + var("sy_b", "syy_b", "na_b") / F.col("na_b")
    )
    z_raw = F.when(
        se_raw > 0,
        (mean("sy_a", "na_a") - mean("sy_b", "na_b")) / se_raw,
    ).otherwise(F.lit(0.0))
    se_cuped = F.sqrt(
        var("su_a", "suu_a", "na_a") / F.col("na_a")
        + var("su_b", "suu_b", "na_b") / F.col("na_b")
    )
    z_cuped = F.when(
        se_cuped > 0,
        (mean("su_a", "na_a") - mean("su_b", "na_b")) / se_cuped,
    ).otherwise(F.lit(0.0))
    raw_pool = var("sy_a", "syy_a", "na_a") + var("sy_b", "syy_b", "na_b")
    adj_pool = (
        var("su_a", "suu_a", "na_a") + var("su_b", "suu_b", "na_b")
    ) / 1e12  # micro^2 -> y units
    vr = F.when(raw_pool > 0, adj_pool / raw_pool).otherwise(F.lit(0.0))
    return j.crossJoin(F.broadcast(mt)).select(
        F.col("na_a").alias("n_a"),
        F.col("na_b").alias("n_b"),
        F.round(F.col("_theta"), 6).alias("theta_r"),
        F.round(z_raw, 4).alias("z_raw_r"),
        F.round(z_cuped, 4).alias("z_cuped_r"),
        F.round(vr, 4).alias("variance_ratio_r"),
    )


ORACLE_EVENTS_AB_CUPED = f"""
WITH users AS (
  SELECT user_id,
         sum(CASE WHEN day(CAST(ts AS TIMESTAMP)) >= {PSI_SPLIT_DAY}
                   AND event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS y,
         sum(CASE WHEN day(CAST(ts AS TIMESTAMP)) < {PSI_SPLIT_DAY}
                  THEN 1 ELSE 0 END)::BIGINT AS x,
         (user_id % 2 = 0) AS arm_a
  FROM events GROUP BY user_id
),
m AS (
  SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         sum(x::HUGEINT * y::HUGEINT) AS sxy,
         sum(x::HUGEINT * x::HUGEINT) AS sxx
  FROM users
),
mt AS (
  SELECT CASE WHEN n::HUGEINT * sxx - sx::HUGEINT * sx <> 0
              THEN round(CAST(n::HUGEINT * sxy - sx::HUGEINT * sy AS DOUBLE)
                         / CAST(n::HUGEINT * sxx - sx::HUGEINT * sx
                                AS DOUBLE), 6)
              ELSE 0.0 END AS theta,
         round(sx / CAST(n AS DOUBLE), 6) AS xbar
  FROM m
),
adj AS (
  SELECT u.arm_a, u.y,
         CAST(round((u.y - mt.theta * (u.x - mt.xbar)) * 1000000) AS BIGINT)
           AS yu
  FROM users u CROSS JOIN mt
),
arm AS (
  SELECT arm_a, count(*)::BIGINT AS na, sum(y)::BIGINT AS sy,
         sum(y * y)::BIGINT AS syy,
         sum(yu)::BIGINT AS su, sum(yu::HUGEINT * yu::HUGEINT) AS suu
  FROM adj GROUP BY arm_a
),
j AS (
  SELECT a.na AS na_a, a.sy AS sy_a, a.syy AS syy_a, a.su AS su_a,
         a.suu AS suu_a,
         b.na AS na_b, b.sy AS sy_b, b.syy AS syy_b, b.su AS su_b,
         b.suu AS suu_b
  FROM arm a CROSS JOIN arm b WHERE a.arm_a AND NOT b.arm_a
),
z AS (
  SELECT na_a, na_b,
         (CAST(sy_a AS DOUBLE)/na_a) AS ma, (CAST(sy_b AS DOUBLE)/na_b) AS mb,
         (CAST(syy_a AS DOUBLE)/na_a
          - (CAST(sy_a AS DOUBLE)/na_a)*(CAST(sy_a AS DOUBLE)/na_a)) AS va,
         (CAST(syy_b AS DOUBLE)/na_b
          - (CAST(sy_b AS DOUBLE)/na_b)*(CAST(sy_b AS DOUBLE)/na_b)) AS vb,
         (CAST(su_a AS DOUBLE)/na_a) AS mua, (CAST(su_b AS DOUBLE)/na_b) AS mub,
         (CAST(suu_a AS DOUBLE)/na_a
          - (CAST(su_a AS DOUBLE)/na_a)*(CAST(su_a AS DOUBLE)/na_a)) AS vua,
         (CAST(suu_b AS DOUBLE)/na_b
          - (CAST(su_b AS DOUBLE)/na_b)*(CAST(su_b AS DOUBLE)/na_b)) AS vub
  FROM j
)
SELECT z.na_a AS n_a, z.na_b AS n_b,
       round(mt.theta, 6) AS theta_r,
       round(CASE WHEN sqrt(z.va/z.na_a + z.vb/z.na_b) > 0
                  THEN (z.ma - z.mb) / sqrt(z.va/z.na_a + z.vb/z.na_b)
                  ELSE 0.0 END, 4) AS z_raw_r,
       round(CASE WHEN sqrt(z.vua/z.na_a + z.vub/z.na_b) > 0
                  THEN (z.mua - z.mub) / sqrt(z.vua/z.na_a + z.vub/z.na_b)
                  ELSE 0.0 END, 4) AS z_cuped_r,
       round(CASE WHEN z.va + z.vb > 0
                  THEN ((z.vua + z.vub) / 1e12) / (z.va + z.vb)
                  ELSE 0.0 END, 4) AS variance_ratio_r
FROM z CROSS JOIN mt
"""

# registration lives in queries/quality_wave3.py (after the driver window)
