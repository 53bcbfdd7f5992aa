"""Analytic-function coverage: window frames, ntile/percent_rank, lead/lag,
GROUPING SETS, and array-aggregation shapes.

The reference has no window machinery at all (SURVEY.md §2.4: the kNN
bounded-worst-replacement loop is its only "window"); these queries pin the
remaining analytic surface a Spark engine owes its users, each against a
DuckDB oracle.

Scale notes: every window here partitions by a key (customer/doc/order) so
state stays bounded per task; the two global-ORDER windows (deciles, moving
average) run over PRE-AGGREGATED inputs (1.5k customers / ~2.5k days), never
over the raw fact table — the pattern that survives 100 TB is
aggregate-then-window, not window-then-aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyvectorsearch_spark.sources.tables import load_table, spread


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def customer_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile + percent_rank over per-customer revenue: decile boundaries and
    totals. The window runs on the aggregated (one row per customer) side —
    a single-partition sort of 1.5k rows, not 60k lineitems."""
    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("o_custkey").asc())
    return (
        per_cust.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("revenue"), 2).alias("decile_revenue"),
            F.round(F.min("revenue"), 2).alias("min_revenue"),
            F.round(F.max("revenue"), 2).alias("max_revenue"),
        )
        .orderBy("decile")
    )


ORACLE_DECILES = """
SELECT decile, count(*) AS n_customers,
       round(sum(revenue), 2) AS decile_revenue,
       round(min(revenue), 2) AS min_revenue,
       round(max(revenue), 2) AS max_revenue
FROM (
  SELECT o_custkey, revenue,
         ntile(10) OVER (ORDER BY revenue DESC, o_custkey) AS decile
  FROM (
    SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue
    FROM orders GROUP BY o_custkey
  )
)
GROUP BY decile
ORDER BY decile
"""


def daily_volume_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ROWS frame: 7-row trailing moving average + day-over-day
    delta (lag) over the daily shipped-quantity series. Aggregate-then-
    window: the window input is one row per ship date. The series is
    integer-valued (quantities), so the oracle comparison is immune to FP
    summation-order noise — a revenue series can flip a cent at rounding
    boundaries between engines."""
    li = _t(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.to_date("l_shipdate").alias("ship_day")).agg(
        F.sum("l_quantity").cast("bigint").alias("day_qty"),
        F.count("*").alias("day_lines"),
    )
    w_ord = Window.orderBy("ship_day")
    w_ma = w_ord.rowsBetween(-6, 0)
    out = (
        daily.withColumn("ma7_qty", F.round(F.avg("day_qty").over(w_ma), 6))
        .withColumn("delta_qty", F.col("day_qty") - F.lag("day_qty", 1).over(w_ord))
        .orderBy("ship_day")
        .limit(400)
    )
    return out.select(
        F.col("ship_day").cast("timestamp").alias("ship_day"),
        "day_qty",
        "day_lines",
        "ma7_qty",
        "delta_qty",
    )


ORACLE_MOVING_AVG = """
SELECT ship_day::TIMESTAMP AS ship_day, day_qty, day_lines,
       round(avg(day_qty) OVER (ORDER BY ship_day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS ma7_qty,
       day_qty - lag(day_qty, 1) OVER (ORDER BY ship_day) AS delta_qty
FROM (
  SELECT CAST(l_shipdate AS DATE) AS ship_day,
         sum(l_quantity)::BIGINT AS day_qty,
         count(*) AS day_lines
  FROM lineitem GROUP BY ship_day
)
ORDER BY ship_day
LIMIT 400
"""


def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag with date arithmetic: days between consecutive orders per
    customer, summarized into a gap histogram (week buckets). Partitioned
    window — per-customer state only, shuffles once on o_custkey."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        o.withColumn("prev_date", F.lag("o_orderdate", 1).over(w))
        .filter(F.col("prev_date").isNotNull())
        .withColumn("gap_days", F.datediff("o_orderdate", "prev_date"))
    )
    return (
        gaps.groupBy((F.floor(F.col("gap_days") / 7)).cast("int").alias("gap_weeks"))
        .agg(
            F.count("*").alias("n_gaps"),
            F.round(F.avg("gap_days"), 6).alias("avg_gap_days"),
        )
        .orderBy("gap_weeks")
    )


ORACLE_ORDER_GAPS = """
SELECT (gap_days // 7)::INT AS gap_weeks, count(*) AS n_gaps,
       round(avg(gap_days), 6) AS avg_gap_days
FROM (
  SELECT date_diff('day', lag(o_orderdate, 1) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
         o_orderdate) AS gap_days
  FROM orders
)
WHERE gap_days IS NOT NULL
GROUP BY gap_weeks
ORDER BY gap_weeks
"""


def priority_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with grouping_id: (priority, year), (priority), (year),
    and grand total in one pass — Spark expands to a single Expand+Aggregate,
    one shuffle, no union of four scans."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderpriority AS priority,
               year(o_orderdate) AS order_year,
               grouping(o_orderpriority) AS g_priority,
               grouping(year(o_orderdate)) AS g_year,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders_gs
        GROUP BY GROUPING SETS (
          (o_orderpriority, year(o_orderdate)),
          (o_orderpriority),
          (year(o_orderdate)),
          ()
        )
        ORDER BY g_priority, g_year, priority, order_year
        """
    )


ORACLE_GROUPING_SETS = """
SELECT o_orderpriority AS priority,
       EXTRACT(year FROM o_orderdate)::INT AS order_year,
       grouping(o_orderpriority) AS g_priority,
       grouping(EXTRACT(year FROM o_orderdate)::INT) AS g_year,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY GROUPING SETS (
  (o_orderpriority, EXTRACT(year FROM o_orderdate)::INT),
  (o_orderpriority),
  (EXTRACT(year FROM o_orderdate)::INT),
  ()
)
ORDER BY g_priority, g_year, priority, order_year
"""


def doc_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode + per-group top-k: split documents into words, rank by count
    within each document, keep the top 3. The explode fans out BEFORE the
    shuffle, but the (doc_id, word) partial aggregate collapses it map-side;
    the window then sees one row per distinct word."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    words = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
        )
        .filter(F.length("word") >= 4)
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("n").desc(), F.col("word").asc())
    return (
        words.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "word", "n", "rk")
        .orderBy("doc_id", "rk")
    )


ORACLE_TOP_WORDS = """
SELECT doc_id, word, n, rk
FROM (
  SELECT doc_id, word, n,
         row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, word) AS rk
  FROM (
    SELECT doc_id, word, count(*) AS n
    FROM (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents WHERE doc_id % 10 = 0
    )
    WHERE length(word) >= 4
    GROUP BY doc_id, word
  )
)
WHERE rk <= 3
ORDER BY doc_id, rk
"""


def order_quantity_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: per-order quantity vector in line order, plus
    array kernels (size / max / sum-via-aggregate) — the same collect-sort-
    transform pattern the vector operators use, here oracle-checked against
    DuckDB's ordered list()."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    per_order = li.groupBy("l_orderkey").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("l_linenumber", "l_quantity"))),
            lambda s: s["l_quantity"].cast("int"),
        ).alias("qty_arr")
    )
    return per_order.select(
        "l_orderkey",
        F.array_join("qty_arr", ",").alias("qty_list"),
        F.size("qty_arr").alias("n_lines"),
        F.array_max("qty_arr").alias("max_qty"),
        F.aggregate("qty_arr", F.lit(0), lambda acc, x: acc + x).alias("total_qty"),
    ).orderBy("l_orderkey")


ORACLE_QTY_ARRAYS = """
SELECT l_orderkey,
       array_to_string(list(l_quantity::INT ORDER BY l_linenumber, l_quantity), ',')
         AS qty_list,
       count(*)::INT AS n_lines,
       max(l_quantity::INT) AS max_qty,
       sum(l_quantity::INT)::INT AS total_qty
FROM lineitem
WHERE l_orderkey % 100 = 0
GROUP BY l_orderkey
ORDER BY l_orderkey
"""


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition metrics over word 2-grams —
    the zero-shuffle run-length-scan operator
    (operators/textops.py::repetition_stats); the oracle recomputes the same
    values relationally (unnest → GROUP BY → per-doc rollup)."""
    from pyvectorsearch_spark.operators.textops import repetition_stats
    from pyvectorsearch_spark.sources.tables import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    return repetition_stats(docs, n=2).orderBy("doc_id")


def _repetition_oracle() -> str:
    from pyvectorsearch_spark.functions.text import duckdb_tokens

    tok = duckdb_tokens("text")
    return f"""
WITH toks AS (SELECT doc_id, {tok} AS t FROM documents),
g AS (
  SELECT doc_id, len(t) AS n_tokens,
         CASE WHEN len(t) >= 2
              THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
              ELSE [] END AS gr
  FROM toks
),
u AS (SELECT doc_id, unnest(gr) AS gram FROM g),
c AS (SELECT doc_id, gram, count(*) AS cnt FROM u GROUP BY doc_id, gram),
s AS (
  SELECT doc_id, sum(cnt)::BIGINT AS n_grams, count(*)::BIGINT AS n_distinct,
         max(cnt)::BIGINT AS top_count
  FROM c GROUP BY doc_id
)
SELECT g.doc_id, g.n_tokens::INT AS n_tokens,
       coalesce(s.n_grams, 0) AS n_grams,
       coalesce(s.n_distinct, 0) AS n_distinct,
       coalesce(s.top_count, 0) AS top_count,
       round(coalesce(s.top_count, 0)
             / greatest(coalesce(s.n_grams, 0), 1)::DOUBLE, 6) AS top_gram_frac,
       round((coalesce(s.n_grams, 0) - coalesce(s.n_distinct, 0))
             / greatest(coalesce(s.n_grams, 0), 1)::DOUBLE, 6) AS dup_gram_frac
FROM g LEFT JOIN s ON g.doc_id = s.doc_id
ORDER BY g.doc_id
"""


ORACLE_TEXT_REPETITION = _repetition_oracle()


def q_skyline_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto skyline over line items: cheapest-price / largest-quantity
    trade-off frontier (no other line item is both <= price and >= quantity
    with one strict) — the classic maximal-vector OLAP query, two-phase
    (per-partition lenient sweep, exact dominance anti-join over the
    bounded candidate set). Rows aggregated per (quantity) point for a
    stable compact result."""
    from pyvectorsearch_spark.operators.skyline import skyline_2d

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    sky = skyline_2d(li, minimize="price", maximize="qty")
    return (
        sky.groupBy("qty")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.round(F.min("price"), 2).alias("min_price"),
        )
        .orderBy("qty")
    )


# O(n log n) dominance test instead of the O(n²) NOT EXISTS anti-join the
# oracle used through r9 (r10 optimization round): a row survives the
# 2-criteria skyline iff (a) its price is the MINIMUM of its qty group — a
# same-qty dominator needs strictly lower price — and (b) that minimum is
# strictly below every higher-qty group's minimum — a higher-qty dominator
# needs price ≤. Ties on (price, qty) are mutually non-dominating and all
# kept, exactly as in the anti-join form. Verified equal to the old oracle
# on sf0.001/sf0.01 and 6 tie-heavy random tables (and the old form
# measured 106 s at sf0.01 in DuckDB — it dominated the driver's whole
# correctness sweep).
ORACLE_SKYLINE = """
WITH pts AS (
  SELECT l_extendedprice AS price, l_quantity::BIGINT AS qty FROM lineitem
), g AS (
  SELECT qty, min(price) AS mp FROM pts GROUP BY qty
), w AS (
  SELECT qty, mp,
         min(mp) OVER (ORDER BY qty DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         AS m_higher
  FROM g
), s AS (
  SELECT p.price, p.qty
  FROM pts p JOIN w ON p.qty = w.qty
  WHERE p.price = w.mp AND (w.m_higher IS NULL OR p.price < w.m_higher)
)
SELECT qty, count(*)::BIGINT AS n_rows, round(min(price), 2) AS min_price
FROM s GROUP BY qty ORDER BY qty
"""


QUERIES = {
    "skyline_lineitem": q_skyline_lineitem,
    "customer_revenue_deciles": customer_revenue_deciles,
    "daily_volume_moving_avg": daily_volume_moving_avg,
    "customer_order_gaps": customer_order_gaps,
    "priority_grouping_sets": priority_grouping_sets,
    "doc_top_words": doc_top_words,
    "order_quantity_arrays": order_quantity_arrays,
    "text_repetition": text_repetition,
}

ORACLES = {
    "skyline_lineitem": ORACLE_SKYLINE,
    "text_repetition": ORACLE_TEXT_REPETITION,
    "customer_revenue_deciles": ORACLE_DECILES,
    "daily_volume_moving_avg": ORACLE_MOVING_AVG,
    "customer_order_gaps": ORACLE_ORDER_GAPS,
    "priority_grouping_sets": ORACLE_GROUPING_SETS,
    "doc_top_words": ORACLE_TOP_WORDS,
    "order_quantity_arrays": ORACLE_QTY_ARRAYS,
}


# --- RFM customer segmentation ---------------------------------------------

RFM_SPLIT = "1996-01-01"  # recency reference: days before this anchor


def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic RFM segmentation: per customer, Recency (days from last
    order to the fixed anchor), Frequency (order count), Monetary (total
    spend in integer cents); each dimension scores 1-3 by fixed value
    bands (engine-exact integer thresholds — rank-based terciles would
    need a global sort; fixed bands are the unbounded-cardinality path),
    rolled up to segment counts and per-segment spend. The standard
    marketing-analytics shape, all-integer until the final rounded
    division."""
    o = spread(load_table(spark, sf_dir, "orders"))
    per = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit(RFM_SPLIT).cast("date"), F.max(F.col("o_orderdate").cast("date"))
        ).alias("_rec"),
        F.count("*").cast("bigint").alias("_freq"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("_mon"),
    )
    r = (
        F.when(F.col("_rec") <= 90, 3)
        .when(F.col("_rec") <= 365, 2)
        .otherwise(1)
    )
    f = F.when(F.col("_freq") >= 12, 3).when(F.col("_freq") >= 6, 2).otherwise(1)
    m = (
        F.when(F.col("_mon") >= 200_000_000, 3)
        .when(F.col("_mon") >= 100_000_000, 2)
        .otherwise(1)
    )
    seg = F.concat(r.cast("string"), f.cast("string"), m.cast("string"))
    return (
        per.select(seg.alias("segment"), "_mon")
        .groupBy("segment")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.round(F.sum("_mon") / 100.0, 2).alias("total_spend_r"),
        )
        .orderBy("segment")
    )


ORACLE_CUSTOMER_RFM = f"""
WITH per AS (
  SELECT o_custkey,
         date_diff('day', max(CAST(o_orderdate AS DATE)),
                   DATE '{RFM_SPLIT}') AS rec,
         count(*)::BIGINT AS freq,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS mon
  FROM orders GROUP BY o_custkey
),
sc AS (
  SELECT (CASE WHEN rec <= 90 THEN 3 WHEN rec <= 365 THEN 2 ELSE 1 END)
         || (CASE WHEN freq >= 12 THEN 3 WHEN freq >= 6 THEN 2 ELSE 1 END)
         || (CASE WHEN mon >= 200000000 THEN 3
                  WHEN mon >= 100000000 THEN 2 ELSE 1 END) AS segment,
         mon
  FROM per
)
SELECT segment, count(*)::BIGINT AS n_customers,
       round(sum(mon) / 100.0, 2) AS total_spend_r
FROM sc GROUP BY segment ORDER BY segment
"""

QUERIES.update({"customer_rfm": q_customer_rfm})
ORACLES.update({"customer_rfm": ORACLE_CUSTOMER_RFM})


# --- market concentration (HHI) --------------------------------------------


def q_brand_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman market-concentration index per part type
    prefix: each brand's revenue share of the segment, squared and summed
    (HHI in the standard 0–10000 points scale) plus the brand count and
    top-brand share — the antitrust-style concentration screen, and the
    supply-chain risk metric ('is this segment single-vendor?'). Exact
    integer cents until the share division; shares round to 6 dp before
    squaring so the index is engine-exact. Two map-side rollups
    (segment×brand, then segment); nothing row-sized shuffles twice."""
    li = spread(load_table(spark, sf_dir, "lineitem")).select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("_rc"),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.split(F.col("p_type"), " ").getItem(0).alias("segment"),
        F.col("p_brand").alias("brand"),
    )
    j = li.join(part, li.l_partkey == part.p_partkey)
    cell = j.groupBy("segment", "brand").agg(
        F.sum("_rc").cast("bigint").alias("_rev")
    )
    seg = cell.groupBy("segment").agg(
        F.sum("_rev").cast("bigint").alias("_tot"),
        F.count("*").cast("bigint").alias("n_brands"),
    )
    share = F.round(F.col("_rev") / F.col("_tot"), 6)
    scored = cell.join(seg, "segment").select(
        "segment", "n_brands", share.alias("_sh")
    )
    return (
        scored.groupBy("segment", "n_brands")
        .agg(
            F.round(F.sum(F.round(F.col("_sh") * F.col("_sh") * 10000, 6)), 2)
            .alias("hhi_r"),
            F.round(F.max("_sh"), 6).alias("top_share_r"),
        )
        .orderBy("segment")
    )


ORACLE_BRAND_HHI = """
WITH j AS (
  SELECT split_part(p.p_type, ' ', 1) AS segment, p.p_brand AS brand,
         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS rc
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
cell AS (
  SELECT segment, brand, sum(rc)::BIGINT AS rev FROM j GROUP BY segment, brand
),
seg AS (
  SELECT segment, sum(rev)::BIGINT AS tot, count(*)::BIGINT AS n_brands
  FROM cell GROUP BY segment
),
sc AS (
  SELECT cell.segment, seg.n_brands,
         round(cell.rev / CAST(seg.tot AS DOUBLE), 6) AS sh
  FROM cell JOIN seg ON cell.segment = seg.segment
)
SELECT segment, n_brands,
       round(sum(round(sh * sh * 10000, 6)), 2) AS hhi_r,
       round(max(sh), 6) AS top_share_r
FROM sc GROUP BY segment, n_brands ORDER BY segment
"""

QUERIES.update({"brand_hhi": q_brand_hhi})
ORACLES.update({"brand_hhi": ORACLE_BRAND_HHI})


# --- power-law tail index (Hill estimator) ---------------------------------

HILL_K = 50


def q_orders_hill_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the power-law tail index per order priority:
    alpha-hat = k / sum(ln(x_(i) / x_(k+1))) over each group's k=50 largest
    order totals — the heavy-tail diagnostic behind capacity planning and
    the Zipf fit's distributional cousin (`text_zipf` fits ranks; Hill fits
    the value tail). Order statistics come from a bounded per-group top-k
    window over integer cents (ties → key order), the ln ladder rounds per
    term, so the estimate is engine-exact. Only k+1 rows per group ever
    sort."""
    from pyspark.sql import Window

    o = spread(load_table(spark, sf_dir, "orders")).select(
        "o_orderpriority",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("_vc"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("_vc"), F.asc("o_orderkey")
    )
    top = o.withColumn("_r", F.row_number().over(w)).filter(
        F.col("_r") <= HILL_K + 1
    )
    xk1 = top.filter(F.col("_r") == HILL_K + 1).select(
        "o_orderpriority", F.col("_vc").alias("_xk1")
    )
    terms = (
        top.filter(F.col("_r") <= HILL_K)
        .join(xk1, "o_orderpriority")
        .select(
            "o_orderpriority",
            "_xk1",
            F.round(
                F.log(F.col("_vc").cast("double") / F.col("_xk1")), 6
            ).alias("_t"),
        )
    )
    return (
        terms.groupBy("o_orderpriority", "_xk1")
        .agg(F.round(F.sum("_t"), 6).alias("_s"))
        .select(
            "o_orderpriority",
            F.lit(HILL_K).cast("int").alias("k"),
            F.round(F.col("_xk1") / 100.0, 2).alias("x_threshold_r"),
            F.round(F.lit(float(HILL_K)) / F.col("_s"), 6).alias("alpha_r"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE_ORDERS_HILL = f"""
WITH v AS (
  SELECT o_orderpriority, o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS vc
  FROM orders
),
r AS (
  SELECT o_orderpriority, vc,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY vc DESC, o_orderkey ASC) AS rn
  FROM v
),
xk1 AS (
  SELECT o_orderpriority, vc AS xk1 FROM r WHERE rn = {HILL_K + 1}
),
terms AS (
  SELECT r.o_orderpriority, xk1.xk1,
         round(ln(r.vc / CAST(xk1.xk1 AS DOUBLE)), 6) AS t
  FROM r JOIN xk1 ON r.o_orderpriority = xk1.o_orderpriority
  WHERE r.rn <= {HILL_K}
)
SELECT o_orderpriority, CAST({HILL_K} AS INT) AS k,
       round(xk1 / 100.0, 2) AS x_threshold_r,
       round({float(HILL_K)!r} / round(sum(t), 6), 6) AS alpha_r
FROM terms GROUP BY o_orderpriority, xk1 ORDER BY o_orderpriority
"""

QUERIES.update({"orders_hill_tail": q_orders_hill_tail})
ORACLES.update({"orders_hill_tail": ORACLE_ORDERS_HILL})


# --- Pareto / ABC classification ---------------------------------------------

ABC_A_PCT = 80
ABC_B_PCT = 95


def q_part_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) inventory classification of parts by revenue: class A =
    the head parts covering the first 80% of cumulative revenue, B = to
    95%, C = the tail — the '20% of SKUs drive 80% of revenue' census
    behind stock-priority decisions (the classed, business-rule cousin of
    `customer_revenue_deciles`' equal-count bands).

    Determinism: revenue is integer cents; the cumulative-share class
    boundaries compare cum·100 ≤ pct·total as bigints (shares never become
    floats until display); ordering ties break on partkey.

    Scale: revenue-per-part is one map-side rollup of lineitem; the
    cumulative window orders the parts-sized aggregate, never lineitem —
    and the final report is 3 rows."""
    from pyspark.sql import Window

    li = spread(load_table(spark, sf_dir, "lineitem")).select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("_rc"),
    )
    per = li.groupBy("l_partkey").agg(F.sum("_rc").cast("bigint").alias("_rev"))
    tot = per.agg(F.sum("_rev").cast("bigint").alias("_tot"))
    w = Window.orderBy(F.desc("_rev"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    classed = (
        per.withColumn("_cum", F.sum("_rev").over(w).cast("bigint"))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "abc_class",
            F.when(F.col("_cum") * 100 <= F.col("_tot") * ABC_A_PCT, "A")
            .when(F.col("_cum") * 100 <= F.col("_tot") * ABC_B_PCT, "B")
            .otherwise("C"),
        )
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.round(F.sum("_rev") / 100.0, 2).alias("revenue_r"),
            F.round(
                F.sum("_rev") / F.max("_tot").cast("double"), 6
            ).alias("revenue_share_r"),
        )
        .orderBy("abc_class")
    )


ORACLE_PART_ABC = f"""
WITH per AS (
  SELECT l_partkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT AS rev
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT sum(rev)::BIGINT AS tot FROM per),
classed AS (
  SELECT p.rev, t.tot,
         sum(p.rev) OVER (ORDER BY p.rev DESC, p.l_partkey ASC)::BIGINT AS cum
  FROM per p CROSS JOIN tot t
),
lab AS (
  SELECT rev, tot,
         CASE WHEN cum * 100 <= tot * {ABC_A_PCT} THEN 'A'
              WHEN cum * 100 <= tot * {ABC_B_PCT} THEN 'B'
              ELSE 'C' END AS abc_class
  FROM classed
)
SELECT abc_class, count(*)::BIGINT AS n_parts,
       round(sum(rev) / 100.0, 2) AS revenue_r,
       round(sum(rev) / CAST(max(tot) AS DOUBLE), 6) AS revenue_share_r
FROM lab GROUP BY abc_class ORDER BY abc_class
"""

QUERIES.update({"part_abc_classes": q_part_abc_classes})
ORACLES.update({"part_abc_classes": ORACLE_PART_ABC})


# --- accumulating-snapshot order lifecycle ------------------------------------


def q_order_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accumulating-snapshot lifecycle rollup: per order, the milestone
    dates (order placed → first line shipped → last line shipped) collapse
    into stage durations; the report aggregates per order-year × priority —
    the classic warehouse accumulating-snapshot pattern (one row per
    process instance, milestones as columns) the star-schema queries here
    otherwise don't exercise.

    Determinism: milestones are integer date mins/maxes, durations exact
    day differences, averages exact integer sums divided once.

    Scale: one map-side milestone rollup of lineitem keyed by order, one
    broadcast-joinable orders probe, one years×priorities report rollup."""
    li = spread(load_table(spark, sf_dir, "lineitem")).select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("_sd")
    )
    miles = li.groupBy("l_orderkey").agg(
        F.min("_sd").alias("_first_ship"),
        F.max("_sd").alias("_last_ship"),
        F.count("*").cast("bigint").alias("_n_lines"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_orderdate").cast("date").alias("_od"),
        F.year("o_orderdate").alias("order_year"),
    )
    j = o.join(miles, o.o_orderkey == miles.l_orderkey)
    lead = F.datediff("_first_ship", "_od").cast("bigint")
    window_d = F.datediff("_last_ship", "_first_ship").cast("bigint")
    return (
        j.groupBy("order_year", "o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum("_n_lines").cast("bigint").alias("n_lines"),
            F.round(F.sum(lead) / F.count("*").cast("double"), 4).alias(
                "avg_days_to_first_ship_r"
            ),
            F.round(F.sum(window_d) / F.count("*").cast("double"), 4).alias(
                "avg_ship_window_days_r"
            ),
            F.max(lead).cast("bigint").alias("max_days_to_first_ship"),
        )
        .orderBy("order_year", "o_orderpriority")
    )


ORACLE_ORDER_LIFECYCLE = """
WITH miles AS (
  SELECT l_orderkey, min(CAST(l_shipdate AS DATE)) AS first_ship,
         max(CAST(l_shipdate AS DATE)) AS last_ship,
         count(*)::BIGINT AS n_lines
  FROM lineitem GROUP BY l_orderkey
),
j AS (
  SELECT year(CAST(o.o_orderdate AS DATE)) AS order_year,
         o.o_orderpriority,
         date_diff('day', CAST(o.o_orderdate AS DATE), m.first_ship)::BIGINT
           AS lead,
         date_diff('day', m.first_ship, m.last_ship)::BIGINT AS win,
         m.n_lines
  FROM orders o JOIN miles m ON o.o_orderkey = m.l_orderkey
)
SELECT order_year, o_orderpriority, count(*)::BIGINT AS n_orders,
       sum(n_lines)::BIGINT AS n_lines,
       round(sum(lead) / CAST(count(*) AS DOUBLE), 4)
         AS avg_days_to_first_ship_r,
       round(sum(win) / CAST(count(*) AS DOUBLE), 4)
         AS avg_ship_window_days_r,
       max(lead)::BIGINT AS max_days_to_first_ship
FROM j GROUP BY order_year, o_orderpriority
ORDER BY order_year, o_orderpriority
"""

QUERIES.update({"order_lifecycle": q_order_lifecycle})
ORACLES.update({"order_lifecycle": ORACLE_ORDER_LIFECYCLE})


# --- month-over-month growth ---------------------------------------------------


def q_orders_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth per order priority: monthly exact-
    cents revenue cells, the previous month's value by lag over the DENSE
    month sequence (a silent zero month must show as −100%, not be
    skipped), and the growth rate — the BI staple missing between the
    moving-average and trend queries.

    Determinism: integer cents everywhere; growth divides exact bigints
    once, rounded 6 dp. Scale: one map-side monthly rollup, then windows
    over priority×month cells only."""
    from pyspark.sql import Window

    o = spread(load_table(spark, sf_dir, "orders")).select(
        "o_orderpriority",
        F.trunc("o_orderdate", "month").alias("_m"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("_rc"),
    )
    cells = o.groupBy("o_orderpriority", "_m").agg(
        F.sum("_rc").cast("bigint").alias("_rev")
    )
    rng = cells.groupBy("o_orderpriority").agg(
        F.min("_m").alias("_lo"), F.max("_m").alias("_hi")
    )
    dense = rng.select(
        "o_orderpriority",
        F.explode(
            F.sequence("_lo", "_hi", F.expr("interval 1 month"))
        ).alias("_m"),
    )
    dn = dense.join(cells, ["o_orderpriority", "_m"], "left").withColumn(
        "_rev", F.coalesce("_rev", F.lit(0)).cast("bigint")
    )
    w = Window.partitionBy("o_orderpriority").orderBy("_m")
    g = dn.withColumn("_prev", F.lag("_rev", 1).over(w)).filter(
        F.col("_prev").isNotNull()
    )
    return g.select(
        "o_orderpriority",
        F.date_format("_m", "yyyy-MM").alias("month"),
        F.round(F.col("_rev") / 100.0, 2).alias("revenue_r"),
        F.when(
            F.col("_prev") > 0,
            F.round(
                (F.col("_rev") - F.col("_prev")) / F.col("_prev").cast("double"),
                6,
            ),
        ).alias("mom_growth_r"),
    ).orderBy("o_orderpriority", "month")


ORACLE_ORDERS_MOM = """
WITH cells AS (
  SELECT o_orderpriority, date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS rev
  FROM orders GROUP BY 1, 2
),
rng AS (
  SELECT o_orderpriority,
         unnest(generate_series(min(m), max(m), INTERVAL 1 MONTH)) AS m
  FROM cells GROUP BY o_orderpriority
),
dn AS (
  SELECT r.o_orderpriority, CAST(r.m AS DATE) AS m,
         coalesce(c.rev, 0)::BIGINT AS rev
  FROM rng r LEFT JOIN cells c
    ON r.o_orderpriority = c.o_orderpriority AND CAST(r.m AS DATE) = c.m
),
g AS (
  SELECT o_orderpriority, m, rev,
         lag(rev) OVER (PARTITION BY o_orderpriority ORDER BY m) AS prev
  FROM dn
)
SELECT o_orderpriority, strftime(m, '%Y-%m') AS month,
       round(rev / 100.0, 2) AS revenue_r,
       CASE WHEN prev > 0
            THEN round((rev - prev) / CAST(prev AS DOUBLE), 6)
       END AS mom_growth_r
FROM g WHERE prev IS NOT NULL
ORDER BY o_orderpriority, month
"""

QUERIES.update({"orders_mom_growth": q_orders_mom_growth})
ORACLES.update({"orders_mom_growth": ORACLE_ORDERS_MOM})


# --- Little's law WIP readout ----------------------------------------------------


def q_orders_littles_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's-law work-in-progress readout over order fulfillment
    intervals [order date, last ship date): arrival rate λ (orders/day),
    mean time-in-system W (days), average WIP L̄ = λ·W, plus the PEAK
    concurrent WIP and the peak-to-average burst factor — the capacity
    numbers behind `fulfillment_peak_monthly`'s per-month peaks (L̄ says
    what the steady state costs; peak/L̄ says how much headroom bursts
    demand).

    Determinism: all quantities derive from exact integer day sums — the
    delta-collapse running count weighted by the gap to the next boundary
    date gives Σ open·days exactly; three rounded divisions at the end.

    Scale: intervals collapse map-side to per-date (+open, −close) deltas;
    the ordered walk runs over the distinct-date table (calendar-bounded),
    never over orders."""
    from pyspark.sql import Window

    li = spread(load_table(spark, sf_dir, "lineitem")).select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("_sd")
    )
    ends = li.groupBy("l_orderkey").agg(F.max("_sd").alias("_end"))
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("_start")
    )
    iv = o.join(ends, o.o_orderkey == ends.l_orderkey).select(
        F.datediff(F.col("_start"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("_s"),
        F.datediff(F.col("_end"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("_e"),
    ).filter(F.col("_e") > F.col("_s"))
    deltas = (
        iv.select(F.col("_s").alias("_d"), F.lit(1).alias("_c"))
        .unionByName(iv.select(F.col("_e").alias("_d"), F.lit(-1).alias("_c")))
        .groupBy("_d")
        .agg(F.sum("_c").cast("bigint").alias("_delta"))
    )
    w = Window.orderBy("_d")
    walk = (
        deltas.withColumn("_open", F.sum("_delta").over(w).cast("bigint"))
        .withColumn("_next", F.lead("_d", 1).over(w))
        .withColumn(
            "_days",
            F.coalesce(F.col("_next") - F.col("_d"), F.lit(0)).cast("bigint"),
        )
    )
    sweep = walk.agg(
        F.sum(F.col("_open") * F.col("_days")).cast("bigint").alias("_open_days"),
        F.max("_open").cast("bigint").alias("peak_wip"),
        F.min("_d").cast("bigint").alias("_d0"),
        F.max("_d").cast("bigint").alias("_d1"),
    )
    n = iv.agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum(F.col("_e") - F.col("_s")).cast("bigint").alias("_dur_days"),
    )
    j = sweep.crossJoin(F.broadcast(n)).withColumn(
        "_window", F.col("_d1") - F.col("_d0")
    )
    return j.select(
        "n_orders",
        F.col("_window").alias("window_days"),
        "peak_wip",
        F.round(F.col("n_orders") / F.col("_window").cast("double"), 4).alias(
            "lambda_per_day_r"
        ),
        F.round(F.col("_dur_days") / F.col("n_orders").cast("double"), 4).alias(
            "w_days_r"
        ),
        F.round(F.col("_open_days") / F.col("_window").cast("double"), 4).alias(
            "l_avg_wip_r"
        ),
        F.round(
            F.col("peak_wip")
            * F.col("_window").cast("double")
            / F.col("_open_days"),
            4,
        ).alias("peak_to_avg_r"),
    )


ORACLE_ORDERS_LITTLES = """
WITH ends AS (
  SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS e FROM lineitem
  GROUP BY l_orderkey
),
iv AS (
  SELECT date_diff('day', DATE '1970-01-01',
                   CAST(o.o_orderdate AS DATE))::BIGINT AS s,
         date_diff('day', DATE '1970-01-01', ends.e)::BIGINT AS e
  FROM orders o JOIN ends ON o.o_orderkey = ends.l_orderkey
  WHERE date_diff('day', CAST(o.o_orderdate AS DATE), ends.e) > 0
),
deltas AS (
  SELECT d, sum(c)::BIGINT AS delta FROM (
    SELECT s AS d, 1 AS c FROM iv UNION ALL SELECT e AS d, -1 AS c FROM iv
  ) GROUP BY d
),
walk AS (
  SELECT d, sum(delta) OVER (ORDER BY d)::BIGINT AS open,
         coalesce(lead(d) OVER (ORDER BY d) - d, 0)::BIGINT AS days
  FROM deltas
),
sweep AS (
  SELECT sum(open * days)::BIGINT AS open_days, max(open)::BIGINT AS peak_wip,
         min(d)::BIGINT AS d0, max(d)::BIGINT AS d1
  FROM walk
),
n AS (
  SELECT count(*)::BIGINT AS n_orders, sum(e - s)::BIGINT AS dur_days FROM iv
)
SELECT n.n_orders, (s.d1 - s.d0) AS window_days, s.peak_wip,
       round(n.n_orders / CAST(s.d1 - s.d0 AS DOUBLE), 4) AS lambda_per_day_r,
       round(n.dur_days / CAST(n.n_orders AS DOUBLE), 4) AS w_days_r,
       round(s.open_days / CAST(s.d1 - s.d0 AS DOUBLE), 4) AS l_avg_wip_r,
       round(s.peak_wip * CAST(s.d1 - s.d0 AS DOUBLE) / s.open_days, 4)
         AS peak_to_avg_r
FROM sweep s CROSS JOIN n
"""

QUERIES.update({"orders_littles_law": q_orders_littles_law})
ORACLES.update({"orders_littles_law": ORACLE_ORDERS_LITTLES})


# --- order aging buckets ---------------------------------------------------------


def q_orders_aging_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Receivables-style aging report: orders not yet fully shipped as of
    the dataset's horizon (max ship date), bucketed by how long they have
    been open (0-30 / 31-60 / 61-90 / 90+ days) per priority with exact-
    cents value at risk — the finance staple beside the lifecycle
    averages (an average hides the 90+ tail; the bucket table IS the
    collections worklist).

    "Open" is deterministic here: an order whose LAST line ships after
    the horizon minus 30 days counts as in-flight at the horizon (a fixed
    business rule on the synthetic data — documented, not discovered).

    Determinism: integer day arithmetic, fixed bucket edges, exact cents.
    Scale: one milestone rollup + a buckets-sized report."""
    li = spread(load_table(spark, sf_dir, "lineitem")).select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("_sd")
    )
    miles = li.groupBy("l_orderkey").agg(F.max("_sd").alias("_last"))
    horizon = li.agg(F.max("_sd").alias("_hz"))
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_orderdate").cast("date").alias("_od"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("_rc"),
    )
    j = (
        o.join(miles, o.o_orderkey == miles.l_orderkey)
        .crossJoin(F.broadcast(horizon))
        .filter(F.datediff(F.col("_hz"), F.col("_last")) < 30)
        .withColumn("_age", F.datediff(F.col("_hz"), F.col("_od")))
    )
    bucket = (
        F.when(F.col("_age") <= 30, "00-30")
        .when(F.col("_age") <= 60, "31-60")
        .when(F.col("_age") <= 90, "61-90")
        .otherwise("90+")
    )
    return (
        j.groupBy("o_orderpriority", bucket.alias("age_bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(F.sum("_rc") / 100.0, 2).alias("value_r"),
            F.max("_age").cast("bigint").alias("max_age_days"),
        )
        .orderBy("o_orderpriority", "age_bucket")
    )


ORACLE_ORDERS_AGING = """
WITH miles AS (
  SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS last_ship
  FROM lineitem GROUP BY l_orderkey
),
hz AS (SELECT max(CAST(l_shipdate AS DATE)) AS hz FROM lineitem),
j AS (
  SELECT o.o_orderpriority,
         date_diff('day', CAST(o.o_orderdate AS DATE), hz.hz) AS age,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS rc
  FROM orders o JOIN miles m ON o.o_orderkey = m.l_orderkey
  CROSS JOIN hz
  WHERE date_diff('day', m.last_ship, hz.hz) < 30
)
SELECT o_orderpriority,
       CASE WHEN age <= 30 THEN '00-30' WHEN age <= 60 THEN '31-60'
            WHEN age <= 90 THEN '61-90' ELSE '90+' END AS age_bucket,
       count(*)::BIGINT AS n_orders,
       round(sum(rc) / 100.0, 2) AS value_r,
       max(age)::BIGINT AS max_age_days
FROM j GROUP BY 1, 2 ORDER BY o_orderpriority, age_bucket
"""

QUERIES.update({"orders_aging_buckets": q_orders_aging_buckets})
ORACLES.update({"orders_aging_buckets": ORACLE_ORDERS_AGING})


# --- lead-time tail percentiles ----------------------------------------------------

LEADTIME_PCTS = [50, 90, 99]


def q_orders_leadtime_tails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-time SLA tails per priority: exact p50/p90/p99 of days from
    order to FIRST shipment via the histogram-rank ladder (the
    `orders_mad_outliers` trick on day counts) — the tail the lifecycle
    AVERAGES hide, and the number an SLA is actually written against.

    Determinism: integer days, rank = ceil(q·n), smallest day value whose
    cumulative count reaches the rank. Scale: aggregate-then-window over
    distinct (priority, days) cells."""
    from pyspark.sql import Window

    li = spread(load_table(spark, sf_dir, "lineitem")).select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("_sd")
    )
    first = li.groupBy("l_orderkey").agg(F.min("_sd").alias("_first"))
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_orderdate").cast("date").alias("_od"),
    )
    lead = o.join(first, o.o_orderkey == first.l_orderkey).select(
        "o_orderpriority",
        F.datediff(F.col("_first"), F.col("_od")).cast("bigint").alias("_ld"),
    ).filter(F.col("_ld") >= 0)
    hist = lead.groupBy("o_orderpriority", "_ld").agg(
        F.count("*").cast("bigint").alias("_c")
    )
    tot = hist.groupBy("o_orderpriority").agg(
        F.sum("_c").cast("bigint").alias("_n")
    )
    w = Window.partitionBy("o_orderpriority").orderBy("_ld").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.withColumn("_cum", F.sum("_c").over(w).cast("bigint")).join(
        tot, "o_orderpriority"
    )
    pcts = spark.createDataFrame([(p,) for p in LEADTIME_PCTS], "pct int")
    fan = cum.crossJoin(F.broadcast(pcts)).filter(
        F.col("_cum") * 100 >= F.col("pct") * F.col("_n")
    )
    return (
        fan.groupBy("o_orderpriority", "pct", "_n")
        .agg(F.min("_ld").cast("bigint").alias("lead_days"))
        .select(
            "o_orderpriority",
            "pct",
            F.col("_n").alias("n_orders"),
            "lead_days",
        )
        .orderBy("o_orderpriority", "pct")
    )


_LT_PCTS = ", ".join(str(p) for p in LEADTIME_PCTS)

ORACLE_ORDERS_LEADTIME = f"""
WITH first AS (
  SELECT l_orderkey, min(CAST(l_shipdate AS DATE)) AS fs
  FROM lineitem GROUP BY l_orderkey
),
lead AS (
  SELECT o.o_orderpriority,
         date_diff('day', CAST(o.o_orderdate AS DATE), f.fs)::BIGINT AS ld
  FROM orders o JOIN first f ON o.o_orderkey = f.l_orderkey
  WHERE date_diff('day', CAST(o.o_orderdate AS DATE), f.fs) >= 0
),
hist AS (
  SELECT o_orderpriority, ld, count(*)::BIGINT AS c
  FROM lead GROUP BY o_orderpriority, ld
),
tot AS (
  SELECT o_orderpriority, sum(c)::BIGINT AS n FROM hist
  GROUP BY o_orderpriority
),
cum AS (
  SELECT h.o_orderpriority, h.ld, t.n,
         sum(h.c) OVER (PARTITION BY h.o_orderpriority
                        ORDER BY h.ld)::BIGINT AS cm
  FROM hist h JOIN tot t ON h.o_orderpriority = t.o_orderpriority
),
pcts AS (SELECT unnest([{_LT_PCTS}])::INT AS pct)
SELECT c.o_orderpriority, p.pct, max(c.n)::BIGINT AS n_orders,
       min(c.ld)::BIGINT AS lead_days
FROM cum c CROSS JOIN pcts p
WHERE c.cm * 100 >= p.pct * c.n
GROUP BY c.o_orderpriority, p.pct
ORDER BY c.o_orderpriority, p.pct
"""

QUERIES.update({"orders_leadtime_tails": q_orders_leadtime_tails})
ORACLES.update({"orders_leadtime_tails": ORACLE_ORDERS_LEADTIME})


# --- repeat-customer revenue share ---------------------------------------------------


def q_orders_repeat_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loyalty KPI: per order-year, the share of revenue from REPEAT
    customers (first order in a prior year) vs new ones, plus the repeat-
    customer count — the retention-economics readout on top of the cohort
    LTV table (LTV follows a cohort forward; this cuts each year between
    new and returning money).

    Determinism: the first-order year is an integer min per customer;
    revenue is exact cents; one rounded share per year.

    Scale: one customer-keyed min rollup broadcast back over the orders
    scan, then a years-sized report."""
    o = spread(load_table(spark, sf_dir, "orders")).select(
        "o_custkey",
        F.year("o_orderdate").alias("_yr"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("_rc"),
    )
    first = o.groupBy("o_custkey").agg(F.min("_yr").alias("_fy"))
    j = o.join(first, "o_custkey").withColumn(
        "_repeat", F.col("_yr") > F.col("_fy")
    )
    return (
        j.groupBy(F.col("_yr").alias("order_year"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.countDistinct(F.when(F.col("_repeat"), F.col("o_custkey")))
            .cast("bigint")
            .alias("n_repeat_customers"),
            F.round(
                F.sum(F.when(F.col("_repeat"), F.col("_rc")).otherwise(0))
                / 100.0,
                2,
            ).alias("repeat_revenue_r"),
            F.round(F.sum("_rc") / 100.0, 2).alias("total_revenue_r"),
            F.round(
                F.sum(F.when(F.col("_repeat"), F.col("_rc")).otherwise(0))
                / F.sum("_rc").cast("double"),
                6,
            ).alias("repeat_share_r"),
        )
        .orderBy("order_year")
    )


ORACLE_ORDERS_REPEAT_SHARE = """
WITH o AS (
  SELECT o_custkey, year(CAST(o_orderdate AS DATE)) AS yr,
         CAST(round(o_totalprice * 100) AS BIGINT) AS rc
  FROM orders
),
first AS (SELECT o_custkey, min(yr) AS fy FROM o GROUP BY o_custkey),
j AS (
  SELECT o.yr, o.rc, o.o_custkey, (o.yr > f.fy) AS rp
  FROM o JOIN first f ON o.o_custkey = f.o_custkey
)
SELECT yr AS order_year, count(*)::BIGINT AS n_orders,
       count(DISTINCT CASE WHEN rp THEN o_custkey END)::BIGINT
         AS n_repeat_customers,
       round(sum(CASE WHEN rp THEN rc ELSE 0 END) / 100.0, 2)
         AS repeat_revenue_r,
       round(sum(rc) / 100.0, 2) AS total_revenue_r,
       round(sum(CASE WHEN rp THEN rc ELSE 0 END) / CAST(sum(rc) AS DOUBLE), 6)
         AS repeat_share_r
FROM j GROUP BY yr ORDER BY order_year
"""

QUERIES.update({"orders_repeat_revenue_share": q_orders_repeat_revenue_share})
ORACLES.update({"orders_repeat_revenue_share": ORACLE_ORDERS_REPEAT_SHARE})


# --- revenue waterfall decomposition --------------------------------------------------


def q_orders_revenue_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue waterfall per order-year: gross (extended price), discount
    given back, tax collected, and the net charge — the finance
    decomposition of TPC-H Q1's one-line formula, with the accounting
    identity surfaced as a column (net − gross + discount − tax must be
    exactly 0.00 in rounded cents, making silent sign errors in ANY
    engine's money arithmetic impossible to miss).

    Determinism: each term rounds to cents per LINE then sums exactly —
    the order-independent money ladder.

    Scale: one map-side rollup of lineitem joined to order years via a
    broadcast-joinable (orderkey, year) projection."""
    li = spread(load_table(spark, sf_dir, "lineitem")).select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("_g"),
        F.round(F.col("l_extendedprice") * F.col("l_discount") * 100)
        .cast("bigint")
        .alias("_d"),
        F.round(
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * F.col("l_tax")
            * 100
        )
        .cast("bigint")
        .alias("_t"),
        F.round(
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax"))
            * 100
        )
        .cast("bigint")
        .alias("_n"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("order_year")
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    return (
        j.groupBy("order_year")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.round(F.sum("_g") / 100.0, 2).alias("gross_r"),
            F.round(F.sum("_d") / 100.0, 2).alias("discount_r"),
            F.round(F.sum("_t") / 100.0, 2).alias("tax_r"),
            F.round(F.sum("_n") / 100.0, 2).alias("net_charge_r"),
            # per-line rounding makes net != gross-discount+tax by a few
            # cents across millions of lines; surface the exact residual so
            # the tolerance is MEASURED, not assumed
            F.round(
                (F.sum("_n") - F.sum("_g") + F.sum("_d") - F.sum("_t"))
                / 100.0,
                2,
            ).alias("rounding_residual_r"),
        )
        .orderBy("order_year")
    )


ORACLE_ORDERS_WATERFALL = """
WITH li AS (
  SELECT l_orderkey,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS g,
         CAST(round(l_extendedprice * l_discount * 100) AS BIGINT) AS d,
         CAST(round(l_extendedprice * (1 - l_discount) * l_tax * 100)
              AS BIGINT) AS t,
         CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100)
              AS BIGINT) AS n
  FROM lineitem
)
SELECT year(CAST(o.o_orderdate AS DATE)) AS order_year,
       count(*)::BIGINT AS n_lines,
       round(sum(li.g) / 100.0, 2) AS gross_r,
       round(sum(li.d) / 100.0, 2) AS discount_r,
       round(sum(li.t) / 100.0, 2) AS tax_r,
       round(sum(li.n) / 100.0, 2) AS net_charge_r,
       round((sum(li.n) - sum(li.g) + sum(li.d) - sum(li.t)) / 100.0, 2)
         AS rounding_residual_r
FROM li JOIN orders o ON li.l_orderkey = o.o_orderkey
GROUP BY 1 ORDER BY order_year
"""

QUERIES.update({"orders_revenue_waterfall": q_orders_revenue_waterfall})
ORACLES.update({"orders_revenue_waterfall": ORACLE_ORDERS_WATERFALL})


# --- RFM segment migration matrix ------------------------------------------------------

MIG_SPLIT_YEAR = 1999


def q_customer_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer segment-migration matrix: frequency tier (1/2/3 by order
    count on fixed integer bands) in the era BEFORE 1999 vs FROM 1999 —
    who upgraded, who churned to zero, who entered. The dynamics view the
    static RFM snapshot (`customer_rfm`) can't show; the diagonal is
    loyalty, below-diagonal is decay, the '0' row is acquisition.

    Determinism: tiers are integer-band CASE expressions on exact counts.

    Scale: two customer rollups (one scan, conditional aggregation) and a
    4×4 report."""
    o = spread(load_table(spark, sf_dir, "orders")).select(
        "o_custkey",
        (F.year("o_orderdate") < MIG_SPLIT_YEAR).alias("_early"),
    )
    per = o.groupBy("o_custkey").agg(
        F.sum(F.when(F.col("_early"), 1).otherwise(0))
        .cast("bigint")
        .alias("_ne"),
        F.sum(F.when(~F.col("_early"), 1).otherwise(0))
        .cast("bigint")
        .alias("_nl"),
    )

    def tier(c):
        return (
            F.when(F.col(c) == 0, 0)
            .when(F.col(c) <= 3, 1)
            .when(F.col(c) <= 7, 2)
            .otherwise(3)
        ).cast("int")

    return (
        per.groupBy(
            tier("_ne").alias("tier_before"), tier("_nl").alias("tier_after")
        )
        .agg(F.count("*").cast("bigint").alias("n_customers"))
        .orderBy("tier_before", "tier_after")
    )


ORACLE_SEGMENT_MIGRATION = f"""
WITH per AS (
  SELECT o_custkey,
         sum(CASE WHEN year(CAST(o_orderdate AS DATE)) < {MIG_SPLIT_YEAR}
                  THEN 1 ELSE 0 END)::BIGINT AS ne,
         sum(CASE WHEN year(CAST(o_orderdate AS DATE)) >= {MIG_SPLIT_YEAR}
                  THEN 1 ELSE 0 END)::BIGINT AS nl
  FROM orders GROUP BY o_custkey
)
SELECT (CASE WHEN ne = 0 THEN 0 WHEN ne <= 3 THEN 1
             WHEN ne <= 7 THEN 2 ELSE 3 END)::INT AS tier_before,
       (CASE WHEN nl = 0 THEN 0 WHEN nl <= 3 THEN 1
             WHEN nl <= 7 THEN 2 ELSE 3 END)::INT AS tier_after,
       count(*)::BIGINT AS n_customers
FROM per GROUP BY 1, 2 ORDER BY tier_before, tier_after
"""

QUERIES.update({"customer_segment_migration": q_customer_segment_migration})
ORACLES.update({"customer_segment_migration": ORACLE_SEGMENT_MIGRATION})


# --- cross-supplier price dispersion ---------------------------------------------------

DISP_TOP = 10
DISP_MIN_SUPPLIERS = 3


def q_part_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Procurement price-dispersion screen: for parts sold by ≥3 distinct
    suppliers, the spread of per-supplier average unit prices (max/min
    ratio and coefficient of variation) — the 'we pay supplier A 30% more
    for the same part' report. Top-10 by CV with part keys for the
    follow-up.

    Determinism: per-(part, supplier) average prices are exact-cents sums
    divided once and micro-fixed; the CV ladder uses DECIMAL moments of
    those micro integers; ranking ties break on partkey.

    Scale: two rollups ((part, supplier) then part) + a bounded top-k."""
    from pyspark.sql import Window

    li = spread(load_table(spark, sf_dir, "lineitem")).select(
        "l_partkey",
        "l_suppkey",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("_rc"),
        F.col("l_quantity").cast("bigint").alias("_q"),
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(
            (F.sum("_rc") / F.sum("_q").cast("double")) * 10000
        )
        .cast("bigint")
        .alias("_pu")  # avg unit price in 1e-4-cent units
    )
    dd = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    per = ps.groupBy("l_partkey").agg(
        F.count("*").cast("bigint").alias("n_suppliers"),
        F.min("_pu").cast("bigint").alias("_mn"),
        F.max("_pu").cast("bigint").alias("_mx"),
        F.sum("_pu").cast("bigint").alias("_s"),
        F.sum(dd(F.col("_pu")) * dd(F.col("_pu"))).alias("_s2"),
    ).filter(F.col("n_suppliers") >= DISP_MIN_SUPPLIERS)
    n = per["n_suppliers"]
    var_num = dd(n) * per["_s2"] - dd(per["_s"]) * dd(per["_s"])
    cv = F.when(
        per["_s"] > 0,
        F.round(
            F.sqrt(var_num.cast("double")) / per["_s"].cast("double"), 6
        ),
    ).otherwise(F.lit(0.0))
    scored = per.select(
        "l_partkey",
        "n_suppliers",
        F.round(F.col("_mx") / F.col("_mn").cast("double"), 4).alias(
            "max_min_ratio_r"
        ),
        cv.alias("cv_r"),
    )
    w = Window.orderBy(
        F.desc(F.round(F.col("cv_r") * 1000000).cast("bigint")),
        F.asc("l_partkey"),
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= DISP_TOP)
        .select(
            F.col("_rk").cast("int").alias("rank"),
            "l_partkey",
            "n_suppliers",
            "max_min_ratio_r",
            "cv_r",
        )
        .orderBy("rank")
    )


ORACLE_PART_DISPERSION = f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         CAST(round((sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                     / CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE))
                    * 10000) AS BIGINT) AS pu
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
per AS (
  SELECT l_partkey, count(*)::BIGINT AS n_suppliers,
         min(pu)::BIGINT AS mn, max(pu)::BIGINT AS mx,
         sum(pu)::BIGINT AS s, sum(pu::HUGEINT * pu::HUGEINT) AS s2
  FROM ps GROUP BY l_partkey
  HAVING count(*) >= {DISP_MIN_SUPPLIERS}
),
sc AS (
  SELECT l_partkey, n_suppliers,
         round(mx / CAST(mn AS DOUBLE), 4) AS max_min_ratio_r,
         CASE WHEN s > 0
              THEN round(sqrt(CAST(n_suppliers::HUGEINT * s2
                                   - s::HUGEINT * s::HUGEINT AS DOUBLE))
                         / CAST(s AS DOUBLE), 6)
              ELSE 0.0 END AS cv_r
  FROM per
),
rk AS (
  SELECT *, row_number() OVER (
    ORDER BY CAST(round(cv_r * 1000000) AS BIGINT) DESC, l_partkey ASC) AS rn
  FROM sc
)
SELECT rn::INT AS rank, l_partkey, n_suppliers, max_min_ratio_r, cv_r
FROM rk WHERE rn <= {DISP_TOP} ORDER BY rank
"""

QUERIES.update({"part_price_dispersion": q_part_price_dispersion})
ORACLES.update({"part_price_dispersion": ORACLE_PART_DISPERSION})


# --- nation trade balance --------------------------------------------------------------


def q_nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade balance per nation: revenue where the nation SUPPLIES
    (exports) vs where its customers BUY (imports), and the net — the
    one-row-per-nation macro view over TPC-H Q7's pairwise trade flows.

    Determinism: exact cents; two conditional rollups of the same joined
    scan.

    Scale: lineitem joins the two broadcast-sized dimension chains once;
    nations-sized report."""
    li = spread(load_table(spark, sf_dir, "lineitem")).select(
        "l_orderkey",
        "l_suppkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("bigint")
        .alias("_rc"),
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_nationkey").alias("_cn")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_nationkey").alias("_sn")
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
    )
    exports = j.groupBy(F.col("_sn").alias("n_nationkey")).agg(
        F.sum("_rc").cast("bigint").alias("_exp")
    )
    imports = j.groupBy(F.col("_cn").alias("n_nationkey")).agg(
        F.sum("_rc").cast("bigint").alias("_imp")
    )
    return (
        n.join(exports, "n_nationkey", "left")
        .join(imports, "n_nationkey", "left")
        .select(
            "n_name",
            F.round(F.coalesce("_exp", F.lit(0)) / 100.0, 2).alias(
                "export_revenue_r"
            ),
            F.round(F.coalesce("_imp", F.lit(0)) / 100.0, 2).alias(
                "import_revenue_r"
            ),
            F.round(
                (F.coalesce("_exp", F.lit(0)) - F.coalesce("_imp", F.lit(0)))
                / 100.0,
                2,
            ).alias("balance_r"),
        )
        .orderBy("n_name")
    )


ORACLE_NATION_TRADE_BALANCE = """
WITH j AS (
  SELECT s.s_nationkey AS sn, c.c_nationkey AS cn,
         CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
           AS rc
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
),
exp AS (SELECT sn AS nk, sum(rc)::BIGINT AS e FROM j GROUP BY sn),
imp AS (SELECT cn AS nk, sum(rc)::BIGINT AS i FROM j GROUP BY cn)
SELECT n.n_name,
       round(coalesce(exp.e, 0) / 100.0, 2) AS export_revenue_r,
       round(coalesce(imp.i, 0) / 100.0, 2) AS import_revenue_r,
       round((coalesce(exp.e, 0) - coalesce(imp.i, 0)) / 100.0, 2)
         AS balance_r
FROM nation n
LEFT JOIN exp ON n.n_nationkey = exp.nk
LEFT JOIN imp ON n.n_nationkey = imp.nk
ORDER BY n.n_name
"""

QUERIES.update({"nation_trade_balance": q_nation_trade_balance})
ORACLES.update({"nation_trade_balance": ORACLE_NATION_TRADE_BALANCE})


# --- customer concentration ------------------------------------------------------------

CONC_TOP = 10


def q_customer_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-concentration risk per year: the revenue share of that
    year's top-10 customers — the 'how much of our business is ten
    phone calls' number (brand HHI measures market structure; this
    measures dependency). Deterministic top-k by (revenue, custkey).

    Determinism: exact cents; integer rank window over the per-customer
    yearly rollup.

    Scale: aggregate-then-window — the rank runs over customer-year
    cells, never raw orders."""
    from pyspark.sql import Window

    o = spread(load_table(spark, sf_dir, "orders")).select(
        "o_custkey",
        F.year("o_orderdate").alias("order_year"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("_rc"),
    )
    per = o.groupBy("order_year", "o_custkey").agg(
        F.sum("_rc").cast("bigint").alias("_rev")
    )
    w = Window.partitionBy("order_year").orderBy(
        F.desc("_rev"), F.asc("o_custkey")
    )
    ranked = per.withColumn("_rk", F.row_number().over(w))
    return (
        ranked.groupBy("order_year")
        .agg(
            F.countDistinct("o_custkey").cast("bigint").alias("n_customers"),
            F.sum("_rev").cast("bigint").alias("_tot"),
            F.sum(F.when(F.col("_rk") <= CONC_TOP, F.col("_rev")).otherwise(0))
            .cast("bigint")
            .alias("_top"),
        )
        .select(
            "order_year",
            "n_customers",
            F.round(F.col("_top") / 100.0, 2).alias("top10_revenue_r"),
            F.round(F.col("_top") / F.col("_tot").cast("double"), 6).alias(
                "top10_share_r"
            ),
        )
        .orderBy("order_year")
    )


ORACLE_CUSTOMER_CONCENTRATION = f"""
WITH per AS (
  SELECT year(CAST(o_orderdate AS DATE)) AS yr, o_custkey,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS rev
  FROM orders GROUP BY 1, 2
),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY yr
                               ORDER BY rev DESC, o_custkey ASC) AS rn
  FROM per
)
SELECT yr AS order_year, count(DISTINCT o_custkey)::BIGINT AS n_customers,
       round(sum(CASE WHEN rn <= {CONC_TOP} THEN rev ELSE 0 END) / 100.0, 2)
         AS top10_revenue_r,
       round(sum(CASE WHEN rn <= {CONC_TOP} THEN rev ELSE 0 END)
             / CAST(sum(rev) AS DOUBLE), 6) AS top10_share_r
FROM rk GROUP BY yr ORDER BY order_year
"""

QUERIES.update({"customer_concentration": q_customer_concentration})
ORACLES.update({"customer_concentration": ORACLE_CUSTOMER_CONCENTRATION})
