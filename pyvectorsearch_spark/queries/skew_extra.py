"""Skew diagnostics and robust-scaling queries (registered OUTSIDE the
driver's pinned 50-entry window; covered by tests/test_oracle_parity.py
against the same DuckDB oracles).

Operators exercised:
- `plans/scale.py::key_skew_report` — shuffle-key skew census (the
  salting/two-phase-agg decision input).
- `operators/quality.py::winsorize_stats` — per-group quantile-band
  clipping from an integer-cents histogram (robust feature scaling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.operators.quality import winsorize_stats
from pyvectorsearch_spark.sources.tables import load_table, spread


def q_skew_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic for orders-per-customer — the decision
    input for salting/two-phase aggregation on a prospective groupBy or
    join key (`plans/scale.py::key_skew_report`): key count, hottest-key
    share, p99 key size (from the count-of-counts histogram, no global
    sort), and the coefficient of variation of key sizes."""
    from pyvectorsearch_spark.plans.scale import key_skew_report

    orders = spread(load_table(spark, sf_dir, "orders"))
    return key_skew_report(orders, key="o_custkey")


ORACLE_SKEW_ORDERS = """
WITH cnt AS (
  SELECT o_custkey, count(*)::BIGINT AS n FROM orders GROUP BY o_custkey
),
stats AS (
  SELECT count(*)::BIGINT AS n_keys, sum(n)::BIGINT AS n_rows,
         max(n)::BIGINT AS max_n, sum(n * n)::BIGINT AS sum_n2
  FROM cnt
),
hist AS (SELECT n, count(*)::BIGINT AS k FROM cnt GROUP BY n),
cum AS (
  SELECT n, k, sum(k) OVER (ORDER BY n)::BIGINT AS c,
         (SELECT n_keys FROM stats) AS n_keys
  FROM hist
),
p99 AS (
  SELECT n AS p99_n FROM cum
  WHERE c >= CAST(ceil(CAST(0.99 AS DOUBLE) * n_keys) AS BIGINT)
    AND c - k < CAST(ceil(CAST(0.99 AS DOUBLE) * n_keys) AS BIGINT)
)
SELECT n_keys, n_rows, max_n,
       round(max_n / CAST(n_rows AS DOUBLE), 6) AS top1_share_r,
       p99_n,
       CASE WHEN n_rows > 0 THEN
         round(sqrt(greatest(
                 sum_n2 / CAST(n_keys AS DOUBLE)
                 - (n_rows / CAST(n_keys AS DOUBLE))
                   * (n_rows / CAST(n_keys AS DOUBLE)), 0.0))
               / (n_rows / CAST(n_keys AS DOUBLE)), 6)
       ELSE 0.0 END AS cv_r
FROM stats, p99
"""


WINS_LO = 0.05
WINS_HI = 0.95
WINS_BIN_CENTS = 100


def q_events_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type winsorization of `value` to the [p05, p95] band from
    a per-group integer-cents histogram: counts clipped on each side, the
    clip bounds, and the order-independent winsorized sum (exact integer
    mid-sum + count x bound products)."""
    ev = spread(load_table(spark, sf_dir, "events"))
    return winsorize_stats(
        ev,
        by="event_type",
        value_col="value",
        lo_q=WINS_LO,
        hi_q=WINS_HI,
        bin_cents=WINS_BIN_CENTS,
    ).orderBy("event_type")


ORACLE_EVENTS_WINSORIZE = f"""
WITH b AS (
  SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS vc,
         CAST(floor(CAST(round(value * 100) AS BIGINT)
                    / {float(WINS_BIN_CENTS)!r}) AS BIGINT) AS bin
  FROM events
),
h AS (SELECT g, bin, count(*)::BIGINT AS cnt FROM b GROUP BY g, bin),
c AS (
  SELECT g, bin, cnt,
         sum(cnt) OVER (PARTITION BY g ORDER BY bin)::BIGINT AS cum,
         (sum(cnt) OVER (PARTITION BY g ORDER BY bin) - cnt)::BIGINT AS cum_prev
  FROM h
),
t AS (SELECT g, sum(cnt)::BIGINT AS n FROM h GROUP BY g),
q AS (
  SELECT g, n,
         CAST(ceil(CAST({WINS_LO} AS DOUBLE) * n) AS BIGINT) AS r_lo,
         CAST(ceil(CAST({WINS_HI} AS DOUBLE) * n) AS BIGINT) AS r_hi
  FROM t
),
lo AS (
  SELECT q.g, bin * {WINS_BIN_CENTS} + {WINS_BIN_CENTS} * (r_lo - cum_prev)
           / CAST(cnt AS DOUBLE) AS lo_c
  FROM q JOIN c ON c.g = q.g AND c.cum >= r_lo AND c.cum_prev < r_lo
),
hi AS (
  SELECT q.g, bin * {WINS_BIN_CENTS} + {WINS_BIN_CENTS} * (r_hi - cum_prev)
           / CAST(cnt AS DOUBLE) AS hi_c
  FROM q JOIN c ON c.g = q.g AND c.cum >= r_hi AND c.cum_prev < r_hi
),
f AS (
  SELECT b.g, vc, lo_c, hi_c, n
  FROM b JOIN lo ON lo.g = b.g JOIN hi ON hi.g = b.g JOIN q ON q.g = b.g
),
agg AS (
  SELECT g, max(n) AS n,
         sum(CASE WHEN vc < lo_c THEN 1 ELSE 0 END)::BIGINT AS n_lo,
         sum(CASE WHEN vc > hi_c THEN 1 ELSE 0 END)::BIGINT AS n_hi,
         sum(CASE WHEN vc >= lo_c AND vc <= hi_c THEN vc ELSE 0 END)::BIGINT
           AS mid_sum,
         max(lo_c) AS lo_c, max(hi_c) AS hi_c
  FROM f GROUP BY g
)
SELECT g AS event_type, n, n_lo, n_hi,
       round(lo_c / 100.0, 3) AS lo_r,
       round(hi_c / 100.0, 3) AS hi_r,
       round((mid_sum + n_lo * lo_c + n_hi * hi_c) / 100.0, 2)
         AS winsorized_sum
FROM agg ORDER BY event_type
"""



def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planner-style join cardinality check: the EXACT output size of
    orders x lineitem on o_orderkey computed from the two per-key count
    tables (sum over keys of n_left * n_right) — the skew-census companion
    that answers "how big will this join be?" without running it. The
    count tables are keys-sized; the facts are scanned once each and never
    joined. `max_key_pairs` is the hottest key's contribution — the number
    that decides whether the join needs salting."""
    from pyspark.sql import functions as F

    orders = spread(load_table(spark, sf_dir, "orders"))
    li = spread(load_table(spark, sf_dir, "lineitem"))
    co = orders.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count("*").cast("bigint").alias("_no")
    )
    cl = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count("*").cast("bigint").alias("_nl")
    )
    j = co.join(cl, "k")
    return j.agg(
        F.count("*").cast("bigint").alias("n_join_keys"),
        F.sum(F.col("_no") * F.col("_nl")).cast("bigint").alias("est_join_rows"),
        F.max(F.col("_no") * F.col("_nl")).cast("bigint").alias("max_key_pairs"),
    )


ORACLE_JOIN_SIZE_ESTIMATE = """
WITH co AS (
  SELECT o_orderkey AS k, count(*)::BIGINT AS no FROM orders GROUP BY k
),
cl AS (
  SELECT l_orderkey AS k, count(*)::BIGINT AS nl FROM lineitem GROUP BY k
)
SELECT count(*)::BIGINT AS n_join_keys,
       sum(no * nl)::BIGINT AS est_join_rows,
       max(no * nl)::BIGINT AS max_key_pairs
FROM co JOIN cl USING (k)
"""



def q_price_qty_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of extended price vs quantity per return flag —
    the feature-dependency profile for numeric columns (the continuous
    companion of `events_mi`). All five moments accumulate as EXACT
    integer sums in one map-side-combined pass (price in cents, quantity
    as bigint); the correlation formula then runs in doubles on those
    sums, so the result is order-independent and engine-identical —
    no naive-vs-Welford variance drift, no float accumulation over the
    fact table."""
    from pyspark.sql import functions as F

    li = spread(load_table(spark, sf_dir, "lineitem")).select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("_x"),
        F.round(F.col("l_quantity")).cast("bigint").alias("_y"),
    )
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("_x").cast("bigint").alias("_sx"),
        F.sum("_y").cast("bigint").alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).cast("bigint").alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).cast("bigint").alias("_syy"),
        F.sum(F.col("_x") * F.col("_y")).cast("bigint").alias("_sxy"),
    )
    nD = F.col("n").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxx, syy = F.col("_sxx").cast("double"), F.col("_syy").cast("double")
    sxy = F.col("_sxy").cast("double")
    corr = (nD * sxy - sx * sy) / F.sqrt(
        (nD * sxx - sx * sx) * (nD * syy - sy * sy)
    )
    return agg.select(
        "l_returnflag", "n", F.round(corr, 6).alias("corr_r")
    ).orderBy("l_returnflag")


ORACLE_PRICE_QTY_CORR = """
WITH v AS (
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS x,
         CAST(round(l_quantity) AS BIGINT) AS y
  FROM lineitem
),
a AS (
  SELECT l_returnflag, count(*)::BIGINT AS n,
         sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy,
         sum(x * y)::BIGINT AS sxy
  FROM v GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS corr_r
FROM a ORDER BY l_returnflag
"""



def q_orders_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of order value per priority class — the
    inequality profile of a spend/size distribution (Lorenz form
    G = 2·Σ i·x_(i) / (n·Σx) − (n+1)/n over ascending ranks). Ranks are
    integer row_numbers on the engine-exact (cents, id) order and the two
    sums are exact bigints, so G is deterministic to the final rounded
    division. Per-group ranking sorts one partition per group — the same
    bounded-cardinality caveat as `hist_quantiles`; histogram-cut Lorenz
    is the unbounded-group path."""
    from pyspark.sql import Window

    o = spread(load_table(spark, sf_dir, "orders")).select(
        "o_orderpriority",
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("_vc"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy(F.asc("_vc"), F.asc("k"))
    r = o.withColumn("_i", F.row_number().over(w))
    return (
        r.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("_vc").cast("bigint").alias("_sx"),
            F.sum(F.col("_i") * F.col("_vc")).cast("bigint").alias("_six"),
        )
        .select(
            "o_orderpriority",
            "n",
            F.round(
                2.0 * F.col("_six") / (F.col("n") * F.col("_sx"))
                - (F.col("n") + 1.0) / F.col("n"),
                6,
            ).alias("gini_r"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE_ORDERS_GINI = """
WITH v AS (
  SELECT o_orderpriority, o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS vc
  FROM orders
),
r AS (
  SELECT o_orderpriority, vc,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY vc ASC, k ASC) AS i
  FROM v
),
g AS (
  SELECT o_orderpriority, count(*)::BIGINT AS n,
         sum(vc)::BIGINT AS sx, sum(i * vc)::BIGINT AS six
  FROM r GROUP BY o_orderpriority
)
SELECT o_orderpriority, n,
       round(2.0 * six / (n * CAST(sx AS DOUBLE))
             - (n + 1.0) / n, 6) AS gini_r
FROM g ORDER BY o_orderpriority
"""


def q_price_qty_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation of price vs quantity per return flag — the
    robust (monotone, outlier-proof) companion to `price_qty_corr`'s
    Pearson: both variables replace values with integer row_number ranks
    (deterministic (cents, id) tie order), then the Pearson formula runs on
    EXACT bigint rank moments — no float accumulation anywhere before the
    final division."""
    from pyspark.sql import Window

    li = spread(load_table(spark, sf_dir, "lineitem")).select(
        "l_returnflag",
        F.col("l_orderkey").alias("k1"),
        F.col("l_linenumber").alias("k2"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("_pc"),
        F.round(F.col("l_quantity") * 100).cast("bigint").alias("_qc"),
    )
    wp = Window.partitionBy("l_returnflag").orderBy("_pc", "k1", "k2")
    wq = Window.partitionBy("l_returnflag").orderBy("_qc", "k1", "k2")
    r = li.withColumn("_rp", F.row_number().over(wp)).withColumn(
        "_rq", F.row_number().over(wq)
    )
    # Distinct ranks (row_number, no ties) admit the closed form
    # rho = 1 - 6*sum(d^2) / (n*(n^2-1)); sum(d^2) accumulates in
    # DECIMAL(38,0) (DuckDB: HUGEINT), which stays exact to n ~ 10^12 rows
    # per group — the raw-moment form overflows bigint at n ~ 7*10^4.
    d2 = ((F.col("_rp") - F.col("_rq")) * (F.col("_rp") - F.col("_rq"))).cast(
        "decimal(38,0)"
    )
    agg = r.groupBy("l_returnflag").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(d2).alias("sd2"),
    )
    rho = 1.0 - 6.0 * F.col("sd2").cast("double") / (
        F.col("n").cast("double")
        * (F.col("n").cast("double") * F.col("n").cast("double") - 1.0)
    )
    return agg.select(
        "l_returnflag",
        "n",
        F.round(rho, 6).alias("spearman_r"),
    ).orderBy("l_returnflag")


ORACLE_PRICE_QTY_SPEARMAN = """
WITH v AS (
  SELECT l_returnflag, l_orderkey AS k1, l_linenumber AS k2,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
         CAST(round(l_quantity * 100) AS BIGINT) AS qc
  FROM lineitem
),
r AS (
  SELECT l_returnflag,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY pc, k1, k2) AS rp,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY qc, k1, k2) AS rq
  FROM v
),
g AS (
  SELECT l_returnflag, count(*)::BIGINT AS n,
         sum(CAST((rp - rq) * (rp - rq) AS HUGEINT)) AS sd2
  FROM r GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round(1.0 - 6.0 * CAST(sd2 AS DOUBLE)
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1.0)),
             6) AS spearman_r
FROM g ORDER BY l_returnflag
"""

QUERIES = {
    "skew_orders": q_skew_orders,
    "events_winsorize": q_events_winsorize,
    "join_size_estimate": q_join_size_estimate,
    "price_qty_corr": q_price_qty_corr,
    "orders_gini": q_orders_gini,
    "price_qty_spearman": q_price_qty_spearman,
}
ORACLES = {
    "skew_orders": ORACLE_SKEW_ORDERS,
    "events_winsorize": ORACLE_EVENTS_WINSORIZE,
    "join_size_estimate": ORACLE_JOIN_SIZE_ESTIMATE,
    "price_qty_corr": ORACLE_PRICE_QTY_CORR,
    "orders_gini": ORACLE_ORDERS_GINI,
    "price_qty_spearman": ORACLE_PRICE_QTY_SPEARMAN,
}


# --- robust outliers: median / MAD ------------------------------------------

MAD_K = 3


def q_orders_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen per order priority: exact median and MAD
    (median absolute deviation) of the order total, and the count of
    orders beyond median ± 3·MAD — the screen that survives the heavy
    tail that wrecks a z-score rule (`events_anomalies` z-scores a
    rolling window; MAD is its batch, distribution-robust sibling).

    Exactness: everything is integer cents. The median is the smallest
    cent value whose cumulative count reaches rank floor((n+1)/2) — the
    lower median, computed from a per-group value histogram, NOT a sort of
    raw rows; the MAD repeats the same ladder on integer deviations; the
    outlier rule compares bigints. Zero floats before the display round.

    Scale: two aggregate-then-window passes over distinct (priority, cents)
    cells — the value domain, not the row count — then one rollup. The
    same histogram-rank trick that makes `events_winsorize` exact."""
    from pyspark.sql import Window

    o = spread(load_table(spark, sf_dir, "orders")).select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("_vc"),
    )
    hist = o.groupBy("o_orderpriority", "_vc").agg(
        F.count("*").cast("bigint").alias("_c")
    )
    tot = hist.groupBy("o_orderpriority").agg(
        F.sum("_c").cast("bigint").alias("n")
    )
    w = Window.partitionBy("o_orderpriority").orderBy("_vc").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.withColumn("_cum", F.sum("_c").over(w).cast("bigint")).join(
        tot, "o_orderpriority"
    )
    rank = F.floor((F.col("n") + 1) / 2).cast("bigint")
    med = (
        cum.filter(F.col("_cum") >= rank)
        .groupBy("o_orderpriority", "n")
        .agg(F.min("_vc").cast("bigint").alias("_med"))
    )
    dev = (
        o.join(med, "o_orderpriority")
        .groupBy(
            "o_orderpriority",
            "n",
            "_med",
            F.abs(F.col("_vc") - F.col("_med")).alias("_d"),
        )
        .agg(F.count("*").cast("bigint").alias("_c"))
    )
    wd = Window.partitionBy("o_orderpriority").orderBy("_d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dcum = dev.withColumn("_cum", F.sum("_c").over(wd).cast("bigint"))
    mad = (
        dcum.filter(
            F.col("_cum") >= F.floor((F.col("n") + 1) / 2).cast("bigint")
        )
        .groupBy("o_orderpriority", "n", "_med")
        .agg(F.min("_d").cast("bigint").alias("_mad"))
    )
    out = (
        o.join(mad, "o_orderpriority")
        .groupBy("o_orderpriority", "n", "_med", "_mad")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("_vc") - F.col("_med"))
                    > F.lit(MAD_K) * F.col("_mad"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers")
        )
    )
    return out.select(
        "o_orderpriority",
        "n",
        F.round(F.col("_med") / 100.0, 2).alias("median_r"),
        F.round(F.col("_mad") / 100.0, 2).alias("mad_r"),
        "n_outliers",
    ).orderBy("o_orderpriority")


ORACLE_ORDERS_MAD = f"""
WITH o AS (
  SELECT o_orderpriority AS g,
         CAST(round(o_totalprice * 100) AS BIGINT) AS vc
  FROM orders
),
hist AS (SELECT g, vc, count(*)::BIGINT AS c FROM o GROUP BY g, vc),
tot AS (SELECT g, sum(c)::BIGINT AS n FROM hist GROUP BY g),
cum AS (
  SELECT h.g, h.vc, t.n,
         sum(h.c) OVER (PARTITION BY h.g ORDER BY h.vc)::BIGINT AS cm
  FROM hist h JOIN tot t ON h.g = t.g
),
med AS (
  SELECT g, n, min(vc)::BIGINT AS med FROM cum
  WHERE cm >= (n + 1) // 2 GROUP BY g, n
),
dev AS (
  SELECT o.g, m.n, m.med, abs(o.vc - m.med)::BIGINT AS d,
         count(*)::BIGINT AS c
  FROM o JOIN med m ON o.g = m.g GROUP BY 1, 2, 3, 4
),
dcum AS (
  SELECT g, n, med, d,
         sum(c) OVER (PARTITION BY g ORDER BY d)::BIGINT AS cm
  FROM dev
),
mad AS (
  SELECT g, n, med, min(d)::BIGINT AS mad FROM dcum
  WHERE cm >= (n + 1) // 2 GROUP BY g, n, med
)
SELECT o.g AS o_orderpriority, m.n,
       round(m.med / 100.0, 2) AS median_r,
       round(m.mad / 100.0, 2) AS mad_r,
       sum(CASE WHEN abs(o.vc - m.med) > {MAD_K} * m.mad
                THEN 1 ELSE 0 END)::BIGINT AS n_outliers
FROM o JOIN mad m ON o.g = m.g
GROUP BY o.g, m.n, m.med, m.mad ORDER BY o.g
"""

QUERIES.update({"orders_mad_outliers": q_orders_mad_outliers})
ORACLES.update({"orders_mad_outliers": ORACLE_ORDERS_MAD})


# --- deterministic bootstrap confidence interval --------------------------------

BOOT_B = 64
BOOT_LO_RANK = 2   # floor(0.025*64) + 1
BOOT_HI_RANK = 63  # ceil(0.975*64)


def q_orders_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap 95% confidence interval for the mean order total via 64
    DETERMINISTIC half-subsample replicas (replica b keeps order i iff the
    md5(b:i) 48-bit uniform falls below ½ — the subsample bootstrap,
    reproducible forever, no RNG): the uncertainty bar that turns
    `profile_orders`' point mean into an interval.

    Determinism: replica membership is a pure hash predicate; replica
    means come from exact integer-cent sums (one rounded division each,
    micro-fixed); the CI endpoints are exact order statistics (ranks 2 and
    63 of 64) with a replica-id tie-break.

    Scale: the B-way fan-out is a broadcast of 64 ints against the fact
    scan — one shuffle of B×priority-sized cells, never a row resample
    (classic resample-with-replacement would multiply the data; the
    hash-subsample form is the one that works at 100 TB)."""
    from pyspark.sql import Window

    o = spread(load_table(spark, sf_dir, "orders")).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("_rc"),
    )
    reps = spark.range(BOOT_B).select(F.col("id").cast("int").alias("b"))
    u = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("b").cast("string"),
                    F.lit(":"),
                    F.col("o_orderkey").cast("string"),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint")
    kept = o.crossJoin(F.broadcast(reps)).filter(u < F.lit(1 << 47))
    means = kept.groupBy("b").agg(
        F.round(
            (F.sum("_rc") / F.count("*").cast("double")) * 10000
        )
        .cast("bigint")
        .alias("_mu")
    )
    w = Window.orderBy("_mu", "b")
    ranked = means.withColumn("_rk", F.row_number().over(w))
    lo = ranked.filter(F.col("_rk") == BOOT_LO_RANK).select(
        F.round(F.col("_mu") / 1000000.0, 4).alias("ci_lo_r")
    )
    hi = ranked.filter(F.col("_rk") == BOOT_HI_RANK).select(
        F.round(F.col("_mu") / 1000000.0, 4).alias("ci_hi_r")
    )
    full = o.agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.round(F.sum("_rc") / (F.count("*") * F.lit(100.0)), 4).alias(
            "mean_full_r"
        ),
    )
    return (
        full.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            "n_orders",
            F.lit(BOOT_B).cast("int").alias("n_replicas"),
            "mean_full_r",
            "ci_lo_r",
            "ci_hi_r",
        )
    )


ORACLE_ORDERS_BOOTSTRAP = f"""
WITH o AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS rc
  FROM orders
),
reps AS (SELECT unnest(range({BOOT_B}))::INT AS b),
kept AS (
  SELECT r.b, o.rc FROM o CROSS JOIN reps r
  WHERE ('0x' || substr(md5(r.b::VARCHAR || ':' || o.o_orderkey::VARCHAR),
                        1, 12))::BIGINT < {1 << 47}
),
means AS (
  SELECT b, CAST(round((sum(rc) / CAST(count(*) AS DOUBLE)) * 10000)
                 AS BIGINT) AS mu
  FROM kept GROUP BY b
),
ranked AS (
  SELECT mu, row_number() OVER (ORDER BY mu, b) AS rk FROM means
),
lo AS (SELECT round(mu / 1000000.0, 4) AS ci_lo_r FROM ranked
       WHERE rk = {BOOT_LO_RANK}),
hi AS (SELECT round(mu / 1000000.0, 4) AS ci_hi_r FROM ranked
       WHERE rk = {BOOT_HI_RANK}),
fl AS (
  SELECT count(*)::BIGINT AS n_orders,
         round(sum(rc) / (count(*) * 100.0), 4) AS mean_full_r
  FROM o
)
SELECT fl.n_orders, CAST({BOOT_B} AS INT) AS n_replicas,
       fl.mean_full_r, lo.ci_lo_r, hi.ci_hi_r
FROM fl CROSS JOIN lo CROSS JOIN hi
"""

QUERIES.update({"orders_bootstrap_ci": q_orders_bootstrap_ci})
ORACLES.update({"orders_bootstrap_ci": ORACLE_ORDERS_BOOTSTRAP})
