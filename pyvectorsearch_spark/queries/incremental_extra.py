"""Incremental-maintenance, attribution, and skew-lever queries (registered
OUTSIDE the driver's pinned 50-entry window; covered by
tests/test_oracle_parity.py against the same DuckDB oracles).

Operators exercised:
- `operators/incremental.py::merge_rollups` — incremental aggregate
  maintenance: stored base rollup + delta rollup -> new rollup with one
  delta scan, base facts untouched. The oracle aggregates the FULL table
  directly, so the hash match proves incremental == from-scratch.
- linear multi-touch attribution over the event stream (every click in the
  lookback window shares the purchase's value equally) — the interval-join
  companion of the last-touch `asof_purchase_click`.
- `plans/scale.py::two_phase_agg` — the salted skew lever driven end to end
  against a plain-groupBy oracle (the plan-shape test lives in
  tests/test_scale_levers.py; this pins the VALUES).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.operators.incremental import merge_rollups
from pyvectorsearch_spark.sources.tables import load_table, spread

SPLIT_DATE = "1996-01-01"  # orders before this are the "stored" base rollup


def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance: per-priority order stats where the
    base segment (orders before SPLIT_DATE) is pre-aggregated and merged
    with the delta segment's rollup — the oracle aggregates the whole
    table, so parity proves the merge is exact."""
    orders = spread(load_table(spark, sf_dir, "orders")).withColumn(
        "_tc", F.round(F.col("o_totalprice") * 100).cast("bigint")
    )
    cut = F.col("o_orderdate") < F.lit(SPLIT_DATE).cast("date")

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum("_tc").cast("bigint").alias("sum_cents"),
            F.min("_tc").cast("bigint").alias("min_cents"),
            F.max("_tc").cast("bigint").alias("max_cents"),
        )

    merged = merge_rollups(
        rollup(orders.filter(cut)),
        rollup(orders.filter(~cut)),
        keys=["o_orderpriority"],
        add_cols=["n_orders", "sum_cents"],
        min_cols=["min_cents"],
        max_cols=["max_cents"],
    )
    return merged.orderBy("o_orderpriority")


ORACLE_INCREMENTAL_ROLLUP = """
SELECT o_orderpriority,
       count(*)::BIGINT AS n_orders,
       sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS sum_cents,
       min(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS min_cents,
       max(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS max_cents
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


ATTR_WINDOW_S = 3600  # credit clicks within 1 hour before the purchase


def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every click in the hour before a
    purchase (same user) shares the purchase value equally. User-keyed
    equi-join with a bounded time predicate — the shuffle key is user_id
    and the window bound caps per-purchase fan-out, so join state stays
    bounded at any scale (same shape as the stream-stream interval
    join)."""
    ev = spread(load_table(spark, sf_dir, "events"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("_pts"),
        F.round(F.col("value") * 100).cast("bigint").alias("_vc"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("_cts")
    )
    j = p.join(
        c,
        (p["user_id"] == c["user_id"])
        & (F.col("_cts") <= F.col("_pts"))
        & (F.col("_cts") >= F.col("_pts") - F.expr(f"INTERVAL {ATTR_WINDOW_S} SECOND")),
    ).drop(c["user_id"])
    return (
        j.groupBy("purchase_id", "user_id", "_vc")
        .agg(F.count("*").cast("bigint").alias("n_clicks"))
        .select(
            "purchase_id",
            "user_id",
            "n_clicks",
            F.round(F.col("_vc") / F.col("n_clicks") / 100.0, 4).alias(
                "credit_per_click_r"
            ),
        )
        .orderBy("purchase_id")
    )


ORACLE_ATTRIBUTION_LINEAR = f"""
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events WHERE event_type = 'purchase'
),
c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
SELECT p.purchase_id, p.user_id, count(*)::BIGINT AS n_clicks,
       round(vc / CAST(count(*) AS DOUBLE) / 100.0, 4) AS credit_per_click_r
FROM p JOIN c
  ON c.user_id = p.user_id
 AND c.ts <= p.ts
 AND c.ts >= p.ts - INTERVAL {ATTR_WINDOW_S} SECOND
GROUP BY p.purchase_id, p.user_id, p.vc
ORDER BY p.purchase_id
"""


def q_salted_agg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted two-phase aggregation lever producing real numbers: per
    event-type count/sum/max through phase-1 (key+salt) partials and a
    phase-2 combine — values must equal the plain groupBy the oracle
    runs."""
    from pyvectorsearch_spark.plans.scale import two_phase_agg

    ev = spread(load_table(spark, sf_dir, "events")).select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("_vc")
    )
    out = two_phase_agg(
        ev,
        ["event_type"],
        {
            "n_events": ("count", "_vc"),
            "sum_cents": ("sum", "_vc"),
            "max_cents": ("max", "_vc"),
        },
        n_salts=16,
        salt_on=["_vc"],
    )
    return out.select(
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("sum_cents").cast("bigint").alias("sum_cents"),
        F.col("max_cents").cast("bigint").alias("max_cents"),
    ).orderBy("event_type")


ORACLE_SALTED_AGG_EVENTS = """
SELECT event_type,
       count(CAST(round(value * 100) AS BIGINT))::BIGINT AS n_events,
       sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sum_cents,
       max(CAST(round(value * 100) AS BIGINT))::BIGINT AS max_cents
FROM events GROUP BY event_type ORDER BY event_type
"""


ASOF_TOL_S = 1800.0  # conversion counts only within 30 minutes


def q_asof_click_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of with tolerance (pandas merge_asof parity): for every
    click, the user's NEXT purchase — but only if it lands within 30
    minutes; a farther match reverts to the no-match sentinel. Same single
    union+window pass as the backward as-of (`operators/temporal.py`);
    tolerance is a post-projection. The oracle is DuckDB's native ASOF
    JOIN with the reversed inequality plus the same tolerance CASE."""
    from pyvectorsearch_spark.operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    out = asof_join(
        left,
        right,
        on="ts",
        by="user_id",
        right_cols=["purchase_id", "ts"],
        direction="forward",
        tolerance_s=ASOF_TOL_S,
    )
    return out.select(
        "click_id",
        "user_id",
        F.coalesce(F.col("purchase_id_right"), F.lit(-1)).alias("purchase_id"),
        F.coalesce(
            F.unix_micros(F.col("ts_right")) - F.unix_micros(F.col("ts")),
            F.lit(-1),
        ).alias("lag_us"),
    ).orderBy("click_id")


ORACLE_ASOF_CLICK_CONVERSION = f"""
WITH j AS (
  SELECT l.event_id AS click_id, l.user_id, l.ts AS cts,
         r.event_id AS pid, r.ts AS pts
  FROM (SELECT * FROM events WHERE event_type = 'click') l
  ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
    ON l.user_id = r.user_id AND r.ts >= l.ts
)
SELECT click_id, user_id,
       CASE WHEN pts IS NOT NULL
             AND abs(epoch_us(cts) / 1000000.0 - epoch_us(pts) / 1000000.0)
                 <= {ASOF_TOL_S!r}
            THEN pid ELSE -1 END AS purchase_id,
       CASE WHEN pts IS NOT NULL
             AND abs(epoch_us(cts) / 1000000.0 - epoch_us(pts) / 1000000.0)
                 <= {ASOF_TOL_S!r}
            THEN epoch_us(pts) - epoch_us(cts) ELSE -1 END AS lag_us
FROM j ORDER BY click_id
"""



LAG_BIN_CENTIS = 1000  # 10-second bins over conversion lag
LAG_QS = [0.5, 0.9]


def q_conversion_lag_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency percentiles: p50/p90 of the click->purchase lag
    (converted clicks only, 30-min tolerance) from a 10-second-bin
    histogram, exact quantile alongside — the funnel-latency SLA readout
    composed from the forward as-of join and the histogram-quantile
    sketch."""
    from pyvectorsearch_spark.operators.sketches import hist_quantiles
    from pyvectorsearch_spark.operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    j = asof_join(
        left,
        right,
        on="ts",
        by="user_id",
        right_cols=["purchase_id", "ts"],
        direction="forward",
        tolerance_s=ASOF_TOL_S,
    )
    lag_s = (
        (F.unix_micros(F.col("ts_right")) - F.unix_micros(F.col("ts"))).cast(
            "double"
        )
        / 1000000.0
    )
    lags = j.filter(F.col("ts_right").isNotNull()).select(lag_s.alias("lag_s"))
    return hist_quantiles(
        lags, value_col="lag_s", bin_cents=LAG_BIN_CENTIS, qs=LAG_QS
    ).orderBy("q")


ORACLE_CONVERSION_LAG_QUANTILES = f"""
WITH j AS (
  SELECT l.ts AS cts, r.ts AS pts
  FROM (SELECT * FROM events WHERE event_type = 'click') l
  ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
    ON l.user_id = r.user_id AND r.ts >= l.ts
),
lag AS (
  SELECT (epoch_us(pts) - epoch_us(cts)) / 1000000.0 AS lag_s
  FROM j
  WHERE pts IS NOT NULL
    AND abs(epoch_us(cts) / 1000000.0 - epoch_us(pts) / 1000000.0)
        <= {ASOF_TOL_S!r}
),
v AS (
  SELECT CAST(round(lag_s * 100) AS BIGINT) AS vc,
         CAST(floor(CAST(round(lag_s * 100) AS BIGINT)
                    / {float(LAG_BIN_CENTIS)!r}) AS BIGINT) AS bin
  FROM lag
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
  SELECT CAST(q AS DOUBLE) AS q FROM (VALUES (0.5), (0.9)) t(q)
),
tgt AS (
  SELECT q, bin, cnt, cum_prev, n, CAST(ceil(q * n) AS BIGINT) AS r
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
       round((bin * {LAG_BIN_CENTIS} + {LAG_BIN_CENTIS} * (r - cum_prev)
              / CAST(cnt AS DOUBLE)) / 100.0, 3) AS est_quantile,
       round(vc / 100.0, 2) AS exact_quantile
FROM ex WHERE rn = r - cum_prev
ORDER BY q
"""


def q_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-VIEW maintenance: the orders⋈customer revenue
    rollup refreshed from BOTH sides' deltas via the bilinearity identity
    ΔV = ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB (differential-dataflow's join rule) — the
    full join is never recomputed; parity against the from-scratch oracle
    proves incremental == batch. Splits are deterministic key rules
    (orders: o_orderkey % 5 = 0 is the delta; customers: c_custkey % 7 = 0
    is the delta)."""
    from pyvectorsearch_spark.operators.incremental import delta_join_counts

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"), "o_orderkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), "c_mktsegment"
    )
    a_base = orders.filter(F.col("o_orderkey") % 5 != 0)
    a_delta = orders.filter(F.col("o_orderkey") % 5 == 0)
    b_base = cust.filter(F.col("k") % 7 != 0)
    b_delta = cust.filter(F.col("k") % 7 == 0)
    out = delta_join_counts(
        a_base, a_delta, b_base, b_delta,
        key="k", group_cols=["c_mktsegment"], agg_col="o_totalprice",
    )
    return out.select(
        "c_mktsegment", "n_pairs", F.round("sum_val", 2).alias("rev")
    ).orderBy("c_mktsegment")


ORACLE_INCREMENTAL_JOIN = """
SELECT c.c_mktsegment, count(*)::BIGINT AS n_pairs,
       round(sum(o.o_totalprice), 2) AS rev
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
"""


QUERIES = {
    "incremental_join": q_incremental_join,
    "incremental_rollup": q_incremental_rollup,
    "attribution_linear": q_attribution_linear,
    "salted_agg_events": q_salted_agg_events,
    "asof_click_conversion": q_asof_click_conversion,
    "conversion_lag_quantiles": q_conversion_lag_quantiles,
}
ORACLES = {
    "incremental_join": ORACLE_INCREMENTAL_JOIN,
    "incremental_rollup": ORACLE_INCREMENTAL_ROLLUP,
    "attribution_linear": ORACLE_ATTRIBUTION_LINEAR,
    "salted_agg_events": ORACLE_SALTED_AGG_EVENTS,
    "asof_click_conversion": ORACLE_ASOF_CLICK_CONVERSION,
    "conversion_lag_quantiles": ORACLE_CONVERSION_LAG_QUANTILES,
}


def q_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: within each
    purchase's 1-hour click window, the FIRST and LAST clicks earn 40% of
    the purchase value each and the middles share the remaining 20% (one
    click -> 100%, two -> 50/50). Positions order by (click ts, click id) —
    engine-exact — and credits are integer-cents products rounded at the
    end. Same bounded user-keyed join shape as `attribution_linear`; only
    the credit rule differs, which is the point: the join is the operator,
    attribution rules are projections over it."""
    from pyspark.sql import Window

    ev = spread(load_table(spark, sf_dir, "events"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("_pts"),
        F.round(F.col("value") * 100).cast("bigint").alias("_vc"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("_cts"),
    )
    j = p.join(
        c,
        (p["user_id"] == c["user_id"])
        & (F.col("_cts") <= F.col("_pts"))
        & (F.col("_cts") >= F.col("_pts") - F.expr(f"INTERVAL {ATTR_WINDOW_S} SECOND")),
    ).drop(c["user_id"])
    w = Window.partitionBy("purchase_id").orderBy(F.asc("_cts"), F.asc("click_id"))
    pos = (
        j.withColumn("_pos", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(Window.partitionBy("purchase_id")))
    )
    share = (
        F.when(F.col("_n") == 1, F.lit(1.0))
        .when(F.col("_n") == 2, F.lit(0.5))
        .when(F.col("_pos") == 1, F.lit(0.4))
        .when(F.col("_pos") == F.col("_n"), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("_n") - 2))
    )
    return pos.select(
        "purchase_id",
        "click_id",
        F.col("_pos").alias("pos"),
        F.col("_n").cast("bigint").alias("n_clicks"),
        F.round(F.col("_vc") * share / 100.0, 4).alias("credit_r"),
    ).orderBy("purchase_id", "pos")


ORACLE_ATTRIBUTION_POSITION = f"""
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, event_id AS click_id, ts FROM events
  WHERE event_type = 'click'
),
j AS (
  SELECT p.purchase_id, p.vc, c.click_id, c.ts AS cts
  FROM p JOIN c
    ON c.user_id = p.user_id
   AND c.ts <= p.ts
   AND c.ts >= p.ts - INTERVAL {ATTR_WINDOW_S} SECOND
),
pos AS (
  SELECT purchase_id, vc, click_id,
         row_number() OVER (PARTITION BY purchase_id
                            ORDER BY cts ASC, click_id ASC) AS pos,
         count(*) OVER (PARTITION BY purchase_id) AS n
  FROM j
)
SELECT purchase_id, click_id, CAST(pos AS INT) AS pos, n::BIGINT AS n_clicks,
       round(vc * (CASE WHEN n = 1 THEN 1.0
                        WHEN n = 2 THEN 0.5
                        WHEN pos = 1 THEN 0.4
                        WHEN pos = n THEN 0.4
                        ELSE 0.2 / (n - 2) END) / 100.0, 4) AS credit_r
FROM pos ORDER BY purchase_id, pos
"""

QUERIES.update({"attribution_position": q_attribution_position})
ORACLES.update({"attribution_position": ORACLE_ATTRIBUTION_POSITION})
