"""Event-sequence analytics queries: funnel conversion + cohort retention
(outside the driver's pinned 50-entry window; covered by
tests/test_oracle_parity.py against the same DuckDB oracles).

Operators exercised: `operators/funnel.py::funnel_conversion` /
`retention_cohorts` (north-star extensions — the reference has no event
processing; these are the product-analytics companions to `sessionize_events`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyvectorsearch_spark.operators.funnel import funnel_conversion, retention_cohorts
from pyvectorsearch_spark.sources.tables import load_table, spread

FUNNEL_STEPS = ["view", "click", "purchase"]


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase strict sequential funnel: per-step reach and
    conversion rates over the events stream."""
    ev = spread(load_table(spark, sf_dir, "events"))
    return funnel_conversion(ev, FUNNEL_STEPS)


ORACLE_EVENT_FUNNEL = """
WITH e1 AS (
  SELECT user_id, event_type, ts,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t0
  FROM events
),
e2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts >= t0 THEN ts END)
              OVER (PARTITION BY user_id) AS t1
  FROM e1
),
e3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= t1 THEN ts END)
              OVER (PARTITION BY user_id) AS t2
  FROM e2
),
u AS (SELECT DISTINCT user_id, t0, t1, t2 FROM e3),
agg AS (
  SELECT count(*)::BIGINT AS n_users,
         count(t0)::BIGINT AS n_view,
         count(t1)::BIGINT AS n_click,
         count(t2)::BIGINT AS n_purchase
  FROM u
)
SELECT n_users, n_view, n_click, n_purchase,
       round(n_click / greatest(n_view, 1)::DOUBLE, 6) AS conv_view_click,
       round(n_purchase / greatest(n_click, 1)::DOUBLE, 6) AS conv_click_purchase,
       round(n_purchase / greatest(n_view, 1)::DOUBLE, 6) AS conv_overall
FROM agg
"""


def q_event_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-cohort retention triangle: distinct active users per (first-event
    cohort date, day offset)."""
    from pyspark.sql import functions as F

    ev = spread(load_table(spark, sf_dir, "events"))
    # cohort as ISO string: DuckDB DATE surfaces as pandas Timestamp through
    # the driver's compare, Spark's as datetime.date — stringify both sides
    return (
        retention_cohorts(ev)
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort"),
            "day_offset",
            "n_users",
        )
        .orderBy("cohort", "day_offset")
    )


ORACLE_EVENT_RETENTION = """
WITH d AS (
  SELECT user_id, ts::DATE AS day,
         min(ts::DATE) OVER (PARTITION BY user_id) AS cohort
  FROM events
)
SELECT CAST(cohort AS VARCHAR) AS cohort,
       date_diff('day', cohort, day)::INT AS day_offset,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM d GROUP BY cohort, day_offset ORDER BY cohort, day_offset
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    P(next event type | current) with exact counts. The lag runs per user
    (one user-keyed exchange, the same shuffle any sequence model pays);
    the transition table is |types|^2 rows. Ties at identical timestamps
    break by event_id so the sequence order is engine-stable."""
    from pyspark.sql import Window, functions as F

    ev = spread(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    wtot = Window.partitionBy("prev_type")
    return (
        pairs.withColumn("row_total", F.sum("n").over(wtot))
        .select(
            "prev_type",
            "next_type",
            "n",
            F.round(F.col("n") / F.col("row_total"), 6).alias("p"),
        )
        .orderBy("prev_type", "next_type")
    )


ORACLE_EVENT_TRANSITIONS = """
WITH seq AS (
  SELECT user_id, event_type, ts,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
pairs AS (
  SELECT prev_type, event_type AS next_type, count(*)::BIGINT AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n,
       round(n / (sum(n) OVER (PARTITION BY prev_type))::DOUBLE, 6) AS p
FROM pairs ORDER BY prev_type, next_type
"""



PATH_LEN = 3
PATH_TOP = 10
SESSION_GAP_S = 1800.0


def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 session-opening paths: sessionize (30-min gap), take each
    session's first 3 event types in time order, count path strings — the
    multi-step generalization of the 1-step Markov `event_transitions`.

    Scale shape: ONE exchange on user_id serves the session window, the
    within-session ordering window (user_id is a prefix of the partition
    keys, so no re-exchange), and the map-side path concat; only (path,
    count) rows shuffle again for the final count + bounded top-k."""
    ev = spread(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    flagged = ev.withColumn(
        "_new", F.when(gap.isNull() | (gap > SESSION_GAP_S), 1).otherwise(0)
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = flagged.withColumn("_sess", F.sum("_new").over(wsum))
    ws = Window.partitionBy("user_id", "_sess").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    head = sess.withColumn("_rn", F.row_number().over(ws)).filter(
        F.col("_rn") <= PATH_LEN
    )
    paths = head.groupBy("user_id", "_sess").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_rn", "event_type"))),
                lambda x: x["event_type"],
            ),
        ).alias("path")
    )
    cnt = paths.groupBy("path").agg(F.count("*").cast("bigint").alias("n_sessions"))
    return cnt.orderBy(F.desc("n_sessions"), "path").limit(PATH_TOP)


ORACLE_SESSION_PATHS = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id)
                   > {SESSION_GAP_S!r}
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
sess AS (
  SELECT user_id, event_id, ts, event_type,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS s
  FROM flagged
),
head AS (
  SELECT user_id, s, event_type, ts, event_id,
         row_number() OVER (PARTITION BY user_id, s ORDER BY ts, event_id)
           AS rn
  FROM sess
),
paths AS (
  SELECT user_id, s,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM head WHERE rn <= {PATH_LEN} GROUP BY user_id, s
)
SELECT path, count(*)::BIGINT AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path LIMIT {PATH_TOP}
"""


def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: for every event-type pair, how many
    distinct users did BOTH, plus the Jaccard of the two audiences — the
    segment-intersection readout behind campaign planning. Scale shape:
    events collapse once to distinct (type, user) rows; the pair join runs
    on audience-sized sets (types × users, not raw events) keyed by user,
    and per-type totals attach from a types-sized aggregate."""
    ev = load_table(spark, sf_dir, "events")
    tu = ev.select("event_type", "user_id").distinct()
    tot = tu.groupBy("event_type").agg(F.count("*").cast("bigint").alias("n"))
    a = tu.withColumnRenamed("event_type", "type_a")
    b = tu.withColumnRenamed("event_type", "type_b")
    both = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").cast("bigint").alias("n_both"))
    )
    ta = tot.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    tb = tot.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        both.join(ta, "type_a")
        .join(tb, "type_b")
        .select(
            "type_a", "type_b", "n_a", "n_b", "n_both",
            F.round(
                F.col("n_both") / (F.col("n_a") + F.col("n_b") - F.col("n_both")), 6
            ).alias("aud_jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


ORACLE_AUDIENCE_OVERLAP = """
WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
tot AS (SELECT event_type, count(*)::BIGINT AS n FROM tu GROUP BY event_type),
ovl AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*)::BIGINT AS n_both
  FROM tu a JOIN tu b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, ta.n AS n_a, tb.n AS n_b, n_both,
       round(n_both / (ta.n + tb.n - n_both), 6) AS aud_jaccard
FROM ovl
JOIN tot ta ON ta.event_type = type_a
JOIN tot tb ON tb.event_type = type_b
ORDER BY type_a, type_b
"""


CEP_LAG_MIN = 360  # wide enough that the negative condition fires on this corpus (15 blocked pairs at sf0.01)


def q_cep_clean_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing pattern (the MATCH_RECOGNIZE shape Spark
    lacks natively): click FOLLOWED BY purchase within 30 minutes with NO
    error event in between for the same user — the negative condition is
    what separates CEP from a plain interval join. Physical shape: the
    click→purchase interval join (user-keyed, bounded lag), then ONE
    anti-join against errors with a between-bound — errors are filtered to
    the same bounded window, so the anti-join's right side is lag-bounded,
    never the full event history. Per-user rollup of clean vs blocked
    conversions."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("_pu"),
        F.col("ts").alias("p_ts"),
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("_eu"), F.col("ts").alias("e_ts")
    )
    pairs = c.join(
        p,
        (F.col("user_id") == F.col("_pu"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {CEP_LAG_MIN} MINUTES")),
    ).drop("_pu")
    blocked = pairs.join(
        e,
        (F.col("user_id") == F.col("_eu"))
        & (F.col("e_ts") > F.col("c_ts"))
        & (F.col("e_ts") < F.col("p_ts")),
        "left_semi",
    )
    clean = pairs.join(
        e,
        (F.col("user_id") == F.col("_eu"))
        & (F.col("e_ts") > F.col("c_ts"))
        & (F.col("e_ts") < F.col("p_ts")),
        "left_anti",
    )
    agg = lambda df, name: df.groupBy("user_id").agg(  # noqa: E731
        F.count("*").cast("bigint").alias(name)
    )
    return (
        agg(clean, "n_clean")
        .join(agg(blocked, "n_blocked"), "user_id", "full_outer")
        .select(
            "user_id",
            F.coalesce("n_clean", F.lit(0)).cast("bigint").alias("n_clean"),
            F.coalesce("n_blocked", F.lit(0)).cast("bigint").alias("n_blocked"),
        )
        .orderBy("user_id")
    )


ORACLE_CEP_CLEAN = f"""
WITH pairs AS (
  SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
         c.ts AS c_ts, p.ts AS p_ts
  FROM (SELECT * FROM events WHERE event_type = 'click') c
  JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
    ON c.user_id = p.user_id
   AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL {CEP_LAG_MIN} MINUTE
),
tagged AS (
  SELECT user_id,
         EXISTS (
           SELECT 1 FROM events e
           WHERE e.event_type = 'error' AND e.user_id = pairs.user_id
             AND e.ts > pairs.c_ts AND e.ts < pairs.p_ts
         ) AS blocked
  FROM pairs
)
SELECT user_id,
       sum(CASE WHEN blocked THEN 0 ELSE 1 END)::BIGINT AS n_clean,
       sum(CASE WHEN blocked THEN 1 ELSE 0 END)::BIGINT AS n_blocked
FROM tagged GROUP BY user_id ORDER BY user_id
"""


AOK_K = 32
AOK_CUTOFF = "2024-01-02 00:00:00"  # day-1 cohort window


def q_audience_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKETCH-ALGEBRA twin of the exact audience matrix: per-type KMV k-min
    sketches combined with the Beyer et al. set-operation estimators —
    union via (k−1)/θ on the merged sketch (merge = k smallest of the
    union, provably equal to the k smallest distinct hashes of the union
    itself), intersection via the K_ab/k Jaccard fraction of merge
    elements present in BOTH sketches. Per-type state is k hashes
    regardless of audience size; the estimators are pure integer/rounded
    arithmetic on md5 hashes, so every estimate is engine-exact and
    hash-checked, with the exact overlap riding along as the reference.
    Scale shape: the sketch build is the two-phase k-min of
    `operators/sketches.kmv_distinct`; the pair stage joins types×k rows."""
    from pyspark.sql import Window

    from pyvectorsearch_spark.operators.sketches import kmv_hash

    # day-1 cohorts: month-long audiences saturate (every user does every
    # type), so the window restriction is what makes overlap discriminative
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit(AOK_CUTOFF).cast("timestamp")
    )
    d = ev.select(
        "event_type", kmv_hash(F.col("user_id")).alias("_u")
    ).distinct()
    shard = (F.col("_u") * 16).cast("int")
    w1 = Window.partitionBy("event_type", shard).orderBy("_u")
    w2 = Window.partitionBy("event_type").orderBy("_u")
    sk = (
        d.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= AOK_K)
        .withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= AOK_K)
        .groupBy("event_type")
        .agg(F.array_sort(F.collect_list("_u")).alias("_sk"))
    )
    a = sk.select(F.col("event_type").alias("type_a"), F.col("_sk").alias("_sa"))
    b = sk.select(F.col("event_type").alias("type_b"), F.col("_sk").alias("_sb"))
    merged = F.slice(
        F.array_sort(F.array_distinct(F.concat("_sa", "_sb"))), 1, AOK_K
    )
    pairs = (
        a.crossJoin(b)
        .filter(F.col("type_a") < F.col("type_b"))
        .withColumn("_m", merged)
        .withColumn("_theta", F.try_element_at("_m", F.lit(AOK_K)))
        .withColumn(
            "_kab",
            F.size(
                F.filter(
                    F.col("_m"),
                    lambda h: F.array_contains("_sa", h)
                    & F.array_contains("_sb", h),
                )
            ),
        )
    )
    est_union = F.when(
        F.col("_theta").isNotNull(), F.round((AOK_K - 1) / F.col("_theta"), 3)
    ).otherwise(F.size("_m").cast("double"))
    est_j = F.round(F.col("_kab") / float(AOK_K), 6)
    exact = (
        d.withColumnRenamed("event_type", "type_a")
        .join(
            d.withColumnRenamed("event_type", "type_b").withColumnRenamed(
                "_u", "_u2"
            ),
            F.col("_u") == F.col("_u2"),
        )
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").cast("bigint").alias("n_both_exact"))
    )
    return (
        pairs.join(exact, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            F.coalesce("n_both_exact", F.lit(0)).cast("bigint").alias("n_both_exact"),
            F.col("_kab").cast("bigint").alias("k_ab"),
            est_j.alias("est_jaccard"),
            est_union.alias("est_union"),
        )
        .orderBy("type_a", "type_b")
    )


def _oracle_audience_kmv() -> str:
    from pyvectorsearch_spark.operators.sketches import duckdb_kmv_hash

    u = duckdb_kmv_hash("user_id")
    return f"""
WITH d AS (SELECT DISTINCT event_type, {u} AS u FROM events
           WHERE ts < TIMESTAMP '{AOK_CUTOFF}'),
sk AS (
  SELECT event_type, list_sort(list(u ORDER BY u))[1:{AOK_K}] AS s,
         list_sort(list(u ORDER BY u)) AS full_s
  FROM d GROUP BY event_type
),
p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         a.s AS sa, b.s AS sb,
         list_sort(list_distinct(a.full_s || b.full_s))[1:{AOK_K}] AS m
  FROM sk a, sk b WHERE a.event_type < b.event_type
),
c AS (
  SELECT type_a, type_b, m,
         CASE WHEN len(m) >= {AOK_K} THEN m[{AOK_K}] ELSE NULL END AS theta,
         len(list_filter(m, h -> list_contains(sa, h) AND list_contains(sb, h))) AS kab
  FROM p
),
ex AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*)::BIGINT AS n_both
  FROM d a JOIN d b ON a.u = b.u AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT c.type_a, c.type_b,
       coalesce(ex.n_both, 0)::BIGINT AS n_both_exact,
       c.kab::BIGINT AS k_ab,
       round(c.kab / {float(AOK_K)}, 6) AS est_jaccard,
       CASE WHEN c.theta IS NOT NULL THEN round({AOK_K - 1} / c.theta, 3)
            ELSE len(c.m)::DOUBLE END AS est_union
FROM c LEFT JOIN ex USING (type_a, type_b)
ORDER BY c.type_a, c.type_b
"""


ORACLE_AUDIENCE_KMV = _oracle_audience_kmv()


QUERIES = {
    "audience_overlap_kmv": q_audience_overlap_kmv,
    "cep_clean_conversions": q_cep_clean_conversions,
    "audience_overlap": q_audience_overlap,
    "event_funnel": q_event_funnel,
    "event_retention": q_event_retention,
    "event_transitions": q_event_transitions,
    "session_paths": q_session_paths,
}
ORACLES = {
    "audience_overlap_kmv": ORACLE_AUDIENCE_KMV,
    "cep_clean_conversions": ORACLE_CEP_CLEAN,
    "audience_overlap": ORACLE_AUDIENCE_OVERLAP,
    "event_funnel": ORACLE_EVENT_FUNNEL,
    "event_retention": ORACLE_EVENT_RETENTION,
    "event_transitions": ORACLE_EVENT_TRANSITIONS,
    "session_paths": ORACLE_SESSION_PATHS,
}


# --- cohort lifetime value (LTV) --------------------------------------------


def q_customer_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve: customers grouped by first-order YEAR, cumulative
    revenue per cohort by years-since-acquisition — the curve a data team
    reads to see whether newer cohorts monetize faster (`event_retention`
    counts who comes back; this prices what they spend).

    Determinism: revenue is exact integer cents end-to-end; the cumulative
    sum runs over the tiny (cohort × offset) cell table, ordered by the
    integer offset — no float enters until the final /100 display round.

    Scale: one map-side min() per customer for the cohort key (customer-
    partitioned), one rollup to cohort×offset cells (≤ years² rows), and
    the running sum windows over THAT — aggregate-then-window, never a
    window over raw orders."""
    o = spread(load_table(spark, sf_dir, "orders")).select(
        "o_custkey",
        F.year("o_orderdate").alias("_yr"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("_rc"),
    )
    first = o.groupBy("o_custkey").agg(F.min("_yr").alias("cohort_year"))
    cells = (
        o.join(first, "o_custkey")
        .groupBy("cohort_year", (F.col("_yr") - F.col("cohort_year")).alias("year_offset"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.countDistinct("o_custkey").cast("bigint").alias("n_active"),
            F.sum("_rc").cast("bigint").alias("_rev"),
        )
    )
    sz = first.groupBy("cohort_year").agg(
        F.count("*").cast("bigint").alias("cohort_size")
    )
    w = Window.partitionBy("cohort_year").orderBy("year_offset").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        cells.join(sz, "cohort_year")
        .withColumn("_cum", F.sum("_rev").over(w).cast("bigint"))
        .select(
            "cohort_year",
            "year_offset",
            "cohort_size",
            "n_active",
            "n_orders",
            F.round(F.col("_rev") / 100.0, 2).alias("revenue_r"),
            F.round(F.col("_cum") / 100.0, 2).alias("cum_revenue_r"),
            F.round(
                F.col("_cum") / (F.col("cohort_size") * F.lit(100.0)), 2
            ).alias("ltv_per_customer_r"),
        )
        .orderBy("cohort_year", "year_offset")
    )


ORACLE_COHORT_LTV = """
WITH o AS (
  SELECT o_custkey, year(CAST(o_orderdate AS DATE)) AS yr,
         CAST(round(o_totalprice * 100) AS BIGINT) AS rc
  FROM orders
),
first AS (
  SELECT o_custkey, min(yr) AS cohort_year FROM o GROUP BY o_custkey
),
cells AS (
  SELECT f.cohort_year, o.yr - f.cohort_year AS year_offset,
         count(*)::BIGINT AS n_orders,
         count(DISTINCT o.o_custkey)::BIGINT AS n_active,
         sum(o.rc)::BIGINT AS rev
  FROM o JOIN first f ON o.o_custkey = f.o_custkey
  GROUP BY 1, 2
),
sz AS (
  SELECT cohort_year, count(*)::BIGINT AS cohort_size
  FROM first GROUP BY cohort_year
),
cum AS (
  SELECT c.*, sz.cohort_size,
         sum(c.rev) OVER (PARTITION BY c.cohort_year
                          ORDER BY c.year_offset)::BIGINT AS cumrev
  FROM cells c JOIN sz ON c.cohort_year = sz.cohort_year
)
SELECT cohort_year, year_offset, cohort_size, n_active, n_orders,
       round(rev / 100.0, 2) AS revenue_r,
       round(cumrev / 100.0, 2) AS cum_revenue_r,
       round(cumrev / (cohort_size * 100.0), 2) AS ltv_per_customer_r
FROM cum ORDER BY cohort_year, year_offset
"""

QUERIES.update({"customer_cohort_ltv": q_customer_cohort_ltv})
ORACLES.update({"customer_cohort_ltv": ORACLE_COHORT_LTV})


# --- Kaplan-Meier customer survival -------------------------------------------

KM_CENSOR_DAYS = 90
KM_HORIZONS = [180, 365, 730, 1460]


def q_customer_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival of customer activity lifetime: duration =
    days from a customer's first to last order, with customers still
    ordering within 90 days of the dataset edge CENSORED (they may yet
    return — dropping them would bias lifetime downward, the mistake KM
    exists to fix). Reports Ŝ at fixed horizons — the retention curve
    (`event_retention` counts cohort comebacks; KM handles the
    right-censoring those counts ignore).

    Determinism: durations and risk-set sizes are exact integer counts
    (risk set at t = #{duration ≥ t}, the histogram-rank trick); each
    factor ln(1 − d/n) rounds to micro-units so the product is an exact
    bigint sum in log space; a risk set that empties (d = n) drops Ŝ to
    exactly 0 via a cumulative flag, never −inf.

    Scale: one per-customer rollup, one durations histogram, one
    horizons-sized broadcast fan-out — the curve aggregates cells, not
    customers."""
    o = spread(load_table(spark, sf_dir, "orders")).select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("_d")
    )
    cust = o.groupBy("o_custkey").agg(
        F.min("_d").alias("_f"), F.max("_d").alias("_l")
    )
    mx = o.agg(F.max("_d").alias("_mx"))
    base = cust.crossJoin(F.broadcast(mx)).select(
        F.datediff("_l", "_f").cast("bigint").alias("_t"),
        (F.datediff("_mx", "_l") < KM_CENSOR_DAYS).alias("_cens"),
    )
    hist = base.groupBy("_t").agg(
        F.count("*").cast("bigint").alias("_c"),
        F.sum(F.when(~F.col("_cens"), 1).otherwise(0))
        .cast("bigint")
        .alias("_d_ev"),
    )
    tot = base.agg(F.count("*").cast("bigint").alias("_n_all"))
    from pyspark.sql import Window

    w = Window.orderBy("_t").rowsBetween(Window.unboundedPreceding, -1)
    risk = (
        hist.withColumn(
            "_before", F.coalesce(F.sum("_c").over(w), F.lit(0)).cast("bigint")
        )
        .crossJoin(F.broadcast(tot))
        .withColumn("_n_risk", F.col("_n_all") - F.col("_before"))
        .filter(F.col("_d_ev") > 0)
    )
    terms = risk.select(
        "_t",
        "_d_ev",
        "_n_risk",
        F.when(F.col("_d_ev") < F.col("_n_risk"),
               F.round(
                   F.log(1.0 - F.col("_d_ev") / F.col("_n_risk").cast("double"))
                   * 1000000
               ).cast("bigint"))
        .otherwise(F.lit(None))
        .alias("_lu"),
        (F.col("_d_ev") >= F.col("_n_risk")).cast("int").alias("_zero"),
    )
    horizons = spark.createDataFrame(
        [(h,) for h in KM_HORIZONS], "horizon_days bigint"
    )
    fan = horizons.crossJoin(terms).filter(F.col("_t") <= F.col("horizon_days"))
    agg = fan.groupBy("horizon_days").agg(
        F.sum("_d_ev").cast("bigint").alias("n_events"),
        F.sum("_lu").cast("bigint").alias("_slu"),
        F.max("_zero").alias("_z"),
    )
    return (
        horizons.join(agg, "horizon_days", "left")
        .select(
            "horizon_days",
            F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
            F.when(F.coalesce(F.col("_z"), F.lit(0)) == 1, F.lit(0.0))
            .otherwise(
                F.round(
                    F.exp(
                        F.coalesce(F.col("_slu"), F.lit(0)) / 1000000.0
                    ),
                    4,
                )
            )
            .alias("s_km_r"),
        )
        .orderBy("horizon_days")
    )


def _km_survival_oracle() -> str:
    hz = ", ".join(str(h) for h in KM_HORIZONS)
    return f"""
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders
),
cust AS (
  SELECT o_custkey, min(d) AS f, max(d) AS l FROM o GROUP BY o_custkey
),
mx AS (SELECT max(d) AS mxd FROM o),
base AS (
  SELECT date_diff('day', f, l)::BIGINT AS t,
         (date_diff('day', l, mx.mxd) < {KM_CENSOR_DAYS}) AS cens
  FROM cust CROSS JOIN mx
),
hist AS (
  SELECT t, count(*)::BIGINT AS c,
         sum(CASE WHEN cens THEN 0 ELSE 1 END)::BIGINT AS d_ev
  FROM base GROUP BY t
),
tot AS (SELECT count(*)::BIGINT AS n_all FROM base),
risk AS (
  SELECT h.t, h.d_ev,
         (t2.n_all - coalesce(sum(h.c) OVER (ORDER BY h.t
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))::BIGINT
           AS n_risk
  FROM hist h CROSS JOIN tot t2
),
terms AS (
  SELECT t, d_ev, n_risk,
         CASE WHEN d_ev < n_risk
              THEN CAST(round(ln(1.0 - d_ev / CAST(n_risk AS DOUBLE))
                              * 1000000) AS BIGINT) END AS lu,
         CASE WHEN d_ev >= n_risk THEN 1 ELSE 0 END AS z
  FROM risk WHERE d_ev > 0
),
hzs AS (SELECT unnest([{hz}])::BIGINT AS horizon_days),
agg AS (
  SELECT hz.horizon_days, sum(t.d_ev)::BIGINT AS n_events,
         sum(t.lu)::BIGINT AS slu, max(t.z) AS z
  FROM hzs hz JOIN terms t ON t.t <= hz.horizon_days
  GROUP BY hz.horizon_days
)
SELECT h.horizon_days, coalesce(a.n_events, 0)::BIGINT AS n_events,
       CASE WHEN coalesce(a.z, 0) = 1 THEN 0.0
            ELSE round(exp(coalesce(a.slu, 0) / 1000000.0), 4) END AS s_km_r
FROM hzs h LEFT JOIN agg a ON h.horizon_days = a.horizon_days
ORDER BY h.horizon_days
"""


ORACLE_CUSTOMER_SURVIVAL_KM = _km_survival_oracle()

QUERIES.update({"customer_survival_km": q_customer_survival_km})
ORACLES.update({"customer_survival_km": ORACLE_CUSTOMER_SURVIVAL_KM})


# --- transition-matrix drift (sequence homogeneity) ----------------------------

TRANS_SPLIT_DAY = 16


def q_events_transition_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did user BEHAVIOR change, not just volumes? Chi-square homogeneity
    test per transition row: for each prev event type, compare the
    next-type distribution between the month's halves (the sequence-drift
    companion to `events_psi_drift`'s value drift — a bot wave changes
    WHERE users go, which volume monitors miss). Transitions that straddle
    the split boundary are attributed to the period of their FIRST event.

    Determinism: all cells/margins are bigints; per-cell chi² terms
    micro-fix; verdicts at the df-matched 95% cut.

    Scale: one user-keyed lag window (the sequence shuffle any Markov
    model pays), then types²-sized cells."""
    from pyspark.sql import Window

    ev = spread(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("_prev", F.lag("event_type").over(w))
        .withColumn("_prev_day", F.lag(F.dayofmonth("ts")).over(w))
        .filter(F.col("_prev").isNotNull())
        .select(
            F.col("_prev").alias("prev_type"),
            F.col("event_type").alias("next_type"),
            (F.col("_prev_day") >= TRANS_SPLIT_DAY).alias("_late"),
        )
    )
    cell = pairs.groupBy("prev_type", "next_type", "_late").agg(
        F.count("*").cast("bigint").alias("o")
    )
    rowm = cell.groupBy("prev_type", "_late").agg(
        F.sum("o").cast("bigint").alias("_rm")
    )
    colm = cell.groupBy("prev_type", "next_type").agg(
        F.sum("o").cast("bigint").alias("_cm")
    )
    tot = cell.groupBy("prev_type").agg(F.sum("o").cast("bigint").alias("_n"))
    terms = (
        cell.join(rowm, ["prev_type", "_late"])
        .join(colm, ["prev_type", "next_type"])
        .join(tot, "prev_type")
        .withColumn(
            "_e", F.col("_rm") * F.col("_cm") / F.col("_n").cast("double")
        )
        .withColumn(
            "_tu",
            F.round(
                (F.col("o") - F.col("_e"))
                * (F.col("o") - F.col("_e"))
                / F.col("_e")
                * 1000000
            ).cast("bigint"),
        )
    )
    k = cell.groupBy("prev_type").agg(
        F.countDistinct("next_type").cast("bigint").alias("_k")
    )
    return (
        terms.groupBy("prev_type")
        .agg(
            F.sum("o").cast("bigint").alias("n_transitions"),
            F.round(F.sum("_tu") / 1000000.0, 4).alias("chi2_r"),
        )
        .join(k, "prev_type")
        .select(
            "prev_type",
            "n_transitions",
            (F.col("_k") - 1).cast("bigint").alias("df"),
            "chi2_r",
        )
        .orderBy("prev_type")
    )


ORACLE_EVENTS_TRANSITION_DRIFT = f"""
WITH ev AS (
  SELECT user_id, event_type, ts, event_id, day(CAST(ts AS TIMESTAMP)) AS dd
  FROM events
),
pairs AS (
  SELECT lag(event_type) OVER w AS prev_type,
         event_type AS next_type,
         (lag(dd) OVER w >= {TRANS_SPLIT_DAY}) AS late
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
cell AS (
  SELECT prev_type, next_type, late, count(*)::BIGINT AS o
  FROM pairs WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type, late
),
rowm AS (
  SELECT prev_type, late, sum(o)::BIGINT AS rm FROM cell
  GROUP BY prev_type, late
),
colm AS (
  SELECT prev_type, next_type, sum(o)::BIGINT AS cm FROM cell
  GROUP BY prev_type, next_type
),
tot AS (SELECT prev_type, sum(o)::BIGINT AS n FROM cell GROUP BY prev_type),
terms AS (
  SELECT c.prev_type, c.o,
         CAST(round((c.o - r.rm * cm.cm / CAST(t.n AS DOUBLE))
                    * (c.o - r.rm * cm.cm / CAST(t.n AS DOUBLE))
                    / (r.rm * cm.cm / CAST(t.n AS DOUBLE)) * 1000000)
              AS BIGINT) AS tu
  FROM cell c
  JOIN rowm r ON c.prev_type = r.prev_type AND c.late = r.late
  JOIN colm cm ON c.prev_type = cm.prev_type AND c.next_type = cm.next_type
  JOIN tot t ON c.prev_type = t.prev_type
),
k AS (
  SELECT prev_type, count(DISTINCT next_type)::BIGINT AS k FROM cell
  GROUP BY prev_type
)
SELECT terms.prev_type, sum(terms.o)::BIGINT AS n_transitions,
       max(k.k - 1)::BIGINT AS df,
       round(sum(terms.tu) / 1000000.0, 4) AS chi2_r
FROM terms JOIN k ON terms.prev_type = k.prev_type
GROUP BY terms.prev_type ORDER BY terms.prev_type
"""

QUERIES.update({"events_transition_drift": q_events_transition_drift})
ORACLES.update({"events_transition_drift": ORACLE_EVENTS_TRANSITION_DRIFT})


# --- DAU / WAU / MAU engagement ---------------------------------------------------


def q_events_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The product-engagement staples: average DAU, average rolling-7-day
    WAU, MAU (distinct users over the whole month), and the DAU/MAU
    stickiness ratio — one row. Distinct-user counting at three horizons
    from ONE (user, day) dedup pass; WAU windows slide over the per-day
    user sets via a 7-day self-range join on the day spine (exact distinct
    per window, not an approximation).

    Determinism: pure integer distinct counts; two display divisions.

    Scale: the corpus collapses to distinct (user, day) once; WAU's
    window fan-out is 7× that cell table, never raw events."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("_d"),
    ).distinct()
    dau = ud.groupBy("_d").agg(F.count("*").cast("bigint").alias("_dau"))
    rng = ud.agg(F.min("_d").alias("_lo"), F.max("_d").alias("_hi"))
    days = rng.select(F.explode(F.sequence("_lo", "_hi")).alias("_day"))
    # exact rolling-7-day distinct users: day spine x (user, day) range join
    # (LEFT join: a >=7-day outage must contribute WAU = 0 to the average,
    # not vanish from it — the dense-grid principle)
    wau = (
        days.join(
            ud,
            (F.col("_d") > F.col("_day") - 7) & (F.col("_d") <= F.col("_day")),
            "left",
        )
        .groupBy("_day")
        .agg(F.countDistinct("user_id").cast("bigint").alias("_wau"))
    )
    mau = ud.agg(
        F.countDistinct("user_id").cast("bigint").alias("mau"),
        F.count("*").cast("bigint").alias("_user_days"),
    )
    davg = dau.agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum("_dau").cast("bigint").alias("_sdau"),
    )
    wavg = wau.agg(F.sum("_wau").cast("bigint").alias("_swau"),
                   F.count("*").cast("bigint").alias("_nw"))
    return (
        davg.crossJoin(F.broadcast(mau))
        .crossJoin(F.broadcast(wavg))
        .select(
            "n_days",
            "mau",
            F.round(F.col("_sdau") / F.col("n_days").cast("double"), 4).alias(
                "avg_dau_r"
            ),
            F.round(F.col("_swau") / F.col("_nw").cast("double"), 4).alias(
                "avg_wau_r"
            ),
            F.round(
                F.col("_sdau")
                / (F.col("n_days") * F.col("mau")).cast("double"),
                6,
            ).alias("stickiness_r"),
        )
    )


ORACLE_EVENTS_DAU_MAU = """
WITH ud AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))::BIGINT AS d
  FROM events
),
dau AS (SELECT d, count(*)::BIGINT AS dau FROM ud GROUP BY d),
rng AS (SELECT min(d) AS lo, max(d) AS hi FROM ud),
days AS (SELECT unnest(range(lo, hi + 1)) AS day FROM rng),
wau AS (
  SELECT days.day, count(DISTINCT ud.user_id)::BIGINT AS wau
  FROM days LEFT JOIN ud ON ud.d > days.day - 7 AND ud.d <= days.day
  GROUP BY days.day
),
mau AS (SELECT count(DISTINCT user_id)::BIGINT AS mau FROM ud),
davg AS (SELECT count(*)::BIGINT AS n_days, sum(dau)::BIGINT AS sdau FROM dau),
wavg AS (SELECT sum(wau)::BIGINT AS swau, count(*)::BIGINT AS nw FROM wau)
SELECT davg.n_days, mau.mau,
       round(davg.sdau / CAST(davg.n_days AS DOUBLE), 4) AS avg_dau_r,
       round(wavg.swau / CAST(wavg.nw AS DOUBLE), 4) AS avg_wau_r,
       round(davg.sdau / CAST(davg.n_days * mau.mau AS DOUBLE), 6)
         AS stickiness_r
FROM davg CROSS JOIN mau CROSS JOIN wavg
"""

QUERIES.update({"events_dau_mau": q_events_dau_mau})
ORACLES.update({"events_dau_mau": ORACLE_EVENTS_DAU_MAU})


# --- sequential-pattern rules (PrefixSpan-style subsequences) ---------------

SEQRULE_MINSUP = 0.02


def q_session_seq_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential association rules a => b (PrefixSpan family, Pei et al.
    ICDE 2001): a session SUPPORTS the pattern iff some occurrence of a
    precedes some occurrence of b — ANY gap, the subsequence semantics
    that distinguish this from the contiguous `session_paths` openings
    and the adjacent-step `event_transitions` Markov counts. Reports
    support / confidence / lift per rule above min-support.

    The scale trick: a-before-b existence collapses to
    min_rank(a) < max_rank(b), so each session first reduces to ONE row
    per distinct event type (min/max of the within-session rank) and the
    pattern join runs on that types-sized table — never on raw events.
    One exchange on user_id serves sessionization, ranking, AND the
    per-(session, type) rollup; only the tiny occurrence table shuffles
    again."""
    ev = spread(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    flagged = ev.withColumn(
        "_new", F.when(gap.isNull() | (gap > SESSION_GAP_S), 1).otherwise(0)
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = flagged.withColumn("_s", F.sum("_new").over(wsum))
    wr = Window.partitionBy("user_id", "_s").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    ranked = sess.withColumn("_rn", F.row_number().over(wr))
    # pattern mining is defined over MULTI-event sessions; singletons
    # (the bulk of the fixture) can't support any sequence
    occ_all = ranked.groupBy("user_id", "_s", "event_type").agg(
        F.min("_rn").alias("_mn"), F.max("_rn").alias("_mx")
    )
    sizes = occ_all.groupBy("user_id", "_s").agg(F.max("_mx").alias("_sz"))
    multi = sizes.filter(F.col("_sz") >= 2).select("user_id", "_s")
    occ = occ_all.join(multi, ["user_id", "_s"], "left_semi")
    n_sess = multi.count()
    supp1 = occ.groupBy(F.col("event_type").alias("etype")).agg(
        F.count("*").cast("bigint").alias("n1")
    )
    a = occ.select("user_id", "_s", F.col("event_type").alias("ante"),
                   F.col("_mn").alias("_amn"))
    b = occ.select("user_id", "_s", F.col("event_type").alias("cons"),
                   F.col("_mx").alias("_bmx"))
    ab = (
        a.join(b, ["user_id", "_s"])
        .filter((F.col("ante") != F.col("cons")) & (F.col("_amn") < F.col("_bmx")))
        .groupBy("ante", "cons")
        .agg(F.count("*").cast("bigint").alias("n_ab"))
    )
    sa = supp1.select(F.col("etype").alias("ante"), F.col("n1").alias("n_a"))
    sb = supp1.select(F.col("etype").alias("cons"), F.col("n1").alias("n_b"))
    out = (
        ab.join(F.broadcast(sa), "ante")
        .join(F.broadcast(sb), "cons")
        .withColumn("support", F.col("n_ab") / F.lit(float(n_sess)))
        .filter(F.col("support") >= SEQRULE_MINSUP)
        .select(
            "ante",
            "cons",
            "n_ab",
            F.round("support", 6).alias("support_r"),
            F.round(F.col("n_ab") / F.col("n_a"), 6).alias("confidence_r"),
            F.round(
                (F.col("n_ab") / F.col("n_a"))
                / (F.col("n_b") / F.lit(float(n_sess))),
                6,
            ).alias("lift_r"),
        )
        .orderBy("ante", "cons")
    )
    return out


ORACLE_SESSION_SEQ_RULES = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id)
                   > {SESSION_GAP_S!r}
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
sess AS (
  SELECT user_id, event_id, ts, event_type,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS s
  FROM flagged
),
ranked AS (
  SELECT user_id, s, event_type,
         row_number() OVER (PARTITION BY user_id, s ORDER BY ts, event_id)
           AS rn
  FROM sess
),
occ_all AS (
  SELECT user_id, s, event_type, min(rn) AS mn, max(rn) AS mx
  FROM ranked GROUP BY user_id, s, event_type
),
multi AS (
  SELECT user_id, s FROM occ_all GROUP BY user_id, s HAVING max(mx) >= 2
),
occ AS (
  SELECT o.* FROM occ_all o SEMI JOIN multi m
    ON o.user_id = m.user_id AND o.s = m.s
),
nsess AS (SELECT count(*)::BIGINT AS n FROM multi),
supp1 AS (SELECT event_type, count(*)::BIGINT AS n1 FROM occ GROUP BY event_type),
ab AS (
  SELECT a.event_type AS ante, b.event_type AS cons, count(*)::BIGINT AS n_ab
  FROM occ a JOIN occ b
    ON a.user_id = b.user_id AND a.s = b.s
   AND a.event_type <> b.event_type AND a.mn < b.mx
  GROUP BY ante, cons
)
SELECT ante, cons, n_ab,
       round(n_ab / CAST(n.n AS DOUBLE), 6) AS support_r,
       round(n_ab / CAST(sa.n1 AS DOUBLE), 6) AS confidence_r,
       round((n_ab / CAST(sa.n1 AS DOUBLE))
             / (sb.n1 / CAST(n.n AS DOUBLE)), 6) AS lift_r
FROM ab
JOIN supp1 sa ON sa.event_type = ab.ante
JOIN supp1 sb ON sb.event_type = ab.cons
CROSS JOIN nsess n
WHERE n_ab / CAST(n.n AS DOUBLE) >= {SEQRULE_MINSUP}
ORDER BY ante, cons
"""

QUERIES.update({"session_seq_rules": q_session_seq_rules})
ORACLES.update({"session_seq_rules": ORACLE_SESSION_SEQ_RULES})
