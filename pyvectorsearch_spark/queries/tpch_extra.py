"""Extended TPC-H-shaped relational coverage (Q7-Q22 adaptations).

The reference has no relational layer at all (SURVEY.md §2.4); these queries
pin the remaining classic TPC-H plan shapes the engine must execute well at
100 TB: multi-dim snowflake joins, conditional shares, scalar-subquery
thresholds, decorrelated correlated subqueries, disjunctive join predicates,
and anti-join + global-scalar filters.

Adaptations to the driver schema (no partsupp; lineitem lacks
shipmode/commitdate/receiptdate): supply cost is proxied by
``p_retailprice``; Q12's shipmode becomes a ship-delay bucket; Q21's
late-delivery test becomes "supplier owning the order's last shipment".

Scale notes are per-query docstrings; the common rules:
  - every dim table (nation/region/supplier/part/customer) is broadcast so
    the lineitem/orders side never shuffles for the join itself;
  - aggregations are keyed on low-cardinality columns so map-side partial
    aggregation collapses the shuffle;
  - global scalars (Q11/Q15/Q17/Q22 thresholds) are tiny one-row/small
    aggregates joined back via broadcast, never ``collect()``-ed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyvectorsearch_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the European supplier(s)
    offering the minimum unit cost — the classic correlated-MIN subquery,
    decorrelated into a window over the per-(part, supplier) aggregate.

    Driver schema has no partsupp, so unit cost is derived from lineitem as
    ``min(l_extendedprice / l_quantity)`` per (part, supplier). The division
    is computed per row (bitwise-identical in any engine) and MIN is
    order-insensitive, so the correlated comparison is FP-stable without
    rounding tricks.

    Scale: part filter + supplier→nation→region chain are all broadcast, so
    the lineitem scan shuffles exactly once — on (l_partkey, l_suppkey) for
    the cost aggregate; the min-cost window then re-partitions the (much
    smaller) per-pair aggregate by part only."""
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    )
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    re = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cost = (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy(
            "p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name"
        )
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        cost.withColumn("best_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("best_cost"))
        .select(
            F.round("s_acctbal", 2).alias("acctbal"),
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_name",
            F.round("unit_cost", 4).alias("unit_cost"),
        )
        .orderBy(F.col("acctbal").desc(), "nation", "s_name", "p_partkey")
        .limit(100)
    )


ORACLE_Q2 = """
WITH cost AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
         min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE' AND p_type = 'STANDARD' AND p_size <= 10
  GROUP BY p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
)
SELECT round(s_acctbal, 2) AS acctbal, s_name, n_name AS nation,
       p_partkey, p_name, round(unit_cost, 4) AS unit_cost
FROM cost c
WHERE unit_cost = (SELECT min(unit_cost) FROM cost c2
                   WHERE c2.p_partkey = c.p_partkey)
ORDER BY acctbal DESC, nation, s_name, p_partkey
LIMIT 100
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order count per priority for orders with at least one
    late line — an EXISTS whose predicate correlates on a non-key column
    (the line shipped > 60 days after the order date; the driver schema has
    no commit/receipt dates). Compiles to a left-semi join carrying the extra
    condition; the quarter filter prunes orders before the join and only
    (l_orderkey, l_shipdate) is read from lineitem."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


ORACLE_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND date_diff('day', o.o_orderdate, l.l_shipdate) > 60
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q20_heavy_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped more than a threshold quantity
    of any 'red' part in 1996 — the nested IN-IN subquery pair, compiled as
    broadcast-semi-join (part name filter) → partial-agg HAVING → semi join
    back to supplier. Quantities are integral-valued doubles, so the HAVING
    sum is FP-exact and the threshold cannot flip between engines.

    Scale: the part filter broadcasts into the lineitem scan; the only big
    shuffle is the (l_suppkey, l_partkey) aggregate, and the supplier probe
    is a broadcast semi join on the tiny qualifying-supplier set."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    pa = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("red"))
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    qualifying = (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    return (
        su.join(F.broadcast(qualifying), su.s_suppkey == qualifying.l_suppkey, "left_semi")
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .orderBy("s_name", "s_suppkey")
    )


ORACLE_Q20 = """
SELECT s_suppkey, s_name, n_name AS nation
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
  HAVING sum(l_quantity) > 50
)
ORDER BY s_name, s_suppkey
"""


def q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional trade volume between two nations by ship
    year. Supplier→nation and customer→nation are broadcast joins; the only
    shuffle is lineitem⋈orders on the order key, then a tiny 4-row agg."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    su = _t(spark, sf_dir, "supplier")
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    n1 = na.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = na.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    rpair = (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(cu), o.o_custkey == cu.c_custkey)
        .join(F.broadcast(n1), su.s_nationkey == n1.s_nkey)
        .join(F.broadcast(n2), cu.c_nationkey == n2.c_nkey)
        .filter(pair | rpair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(F.round(F.sum(_rev()), 2).alias("volume"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


ORACLE_Q7 = """
SELECT supp_nation, cust_nation, ship_year, round(sum(vol), 2) AS volume
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate)::INT AS ship_year,
         l_extendedprice * (1 - l_discount) AS vol
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
)
GROUP BY supp_nation, cust_nation, ship_year
ORDER BY supp_nation, cust_nation, ship_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's ECONOMY-part revenue
    per order year — conditional aggregation over a 6-way snowflake join.
    All five dims broadcast; lineitem⋈orders is the lone big shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    pa = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    su = _t(spark, sf_dir, "supplier")
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    re = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_s = na.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n_c = na.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    vol = _rev()
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(cu), o.o_custkey == cu.c_custkey)
        .join(F.broadcast(n_c), cu.c_nationkey == n_c.c_nkey)
        .join(F.broadcast(re), n_c.c_rkey == re.r_regionkey)
        .join(F.broadcast(n_s), su.s_nationkey == n_s.s_nkey)
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(
                        F.lit(0.0)
                    )
                )
                / F.sum(vol),
                6,
            ).alias("mkt_share"),
            F.round(F.sum(vol), 2).alias("total_volume"),
        )
        .orderBy("order_year")
    )


ORACLE_Q8 = """
SELECT order_year,
       round(sum(CASE WHEN supp_nation = 'NATION_5' THEN vol ELSE 0.0 END)
             / sum(vol), 6) AS mkt_share,
       round(sum(vol), 2) AS total_volume
FROM (
  SELECT EXTRACT(year FROM o_orderdate)::INT AS order_year,
         ns.n_name AS supp_nation,
         l_extendedprice * (1 - l_discount) AS vol
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN region    ON nc.n_regionkey = r_regionkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
)
GROUP BY order_year
ORDER BY order_year
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation × ship year for parts whose
    name contains 'red'. Supply cost proxied by ``p_retailprice`` (driver
    schema has no partsupp). part/supplier/nation broadcast; single shuffle
    for the final low-cardinality agg."""
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    profit = _rev() - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.01)
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("l_shipdate").alias("ship_year")
        )
        .agg(F.round(F.sum(profit), 2).alias("profit"))
        .orderBy("nation", F.col("ship_year").desc())
    )


ORACLE_Q9 = """
SELECT n_name AS nation, EXTRACT(year FROM l_shipdate)::INT AS ship_year,
       round(sum(l_extendedprice * (1 - l_discount)
                 - p_retailprice * l_quantity * 0.01), 2) AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, ship_year
ORDER BY nation, ship_year DESC
"""


def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by lost revenue from returned items
    in a half-year window. The selective orders filter runs before the join;
    customer+nation broadcast; `limit` after agg is TakeOrderedAndProject."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cu), o.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(_rev()), 2).alias("lost_revenue"),
            F.round(F.max("c_acctbal"), 2).alias("acctbal"),
        )
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


ORACLE_Q10 = """
SELECT c_custkey, c_name, n_name AS nation,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS lost_revenue,
       round(max(c_acctbal), 2) AS acctbal
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY lost_revenue DESC, c_custkey
LIMIT 20
"""


def q11_valuable_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose shipped value exceeds a global-fraction
    threshold. The scalar subquery (global sum) is a one-row aggregate
    cross-joined back — Spark broadcasts it; no collect, no second scan
    thanks to cache-free reuse of the same shuffle output under AQE."""
    li = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value")
    )
    total = per_part.agg(F.sum("value").alias("grand_total"))
    # Compare at cents precision on BOTH sides: Spark and DuckDB sum doubles
    # in different orders, so an unrounded threshold can flip membership of a
    # part sitting exactly at the boundary.
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.round(F.col("value"), 2)
            > F.round(F.col("grand_total") * 0.001, 2)
        )
        .select("l_partkey", F.round("value", 2).alias("part_value"))
        .orderBy(F.col("part_value").desc(), F.col("l_partkey").asc())
    )


ORACLE_Q11 = """
SELECT l_partkey, round(value, 2) AS part_value
FROM (
  SELECT l_partkey, sum(l_extendedprice * l_quantity) AS value
  FROM lineitem GROUP BY l_partkey
)
WHERE round(value, 2) >
      (SELECT round(sum(l_extendedprice * l_quantity) * 0.001, 2) FROM lineitem)
ORDER BY part_value DESC, l_partkey
"""


def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority mix per ship-delay bucket (driver schema has
    no shipmode; the bucket is days between order and ship date). Conditional
    counts via CASE-in-SUM; the join shuffles once on the order key."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay > 90, "LATE").when(delay > 30, "SLOW").otherwise("FAST")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .withColumn("delay_bucket", bucket)
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_lines"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_priority_lines"),
        )
        .orderBy("delay_bucket")
    )


ORACLE_Q12 = """
SELECT delay_bucket,
       -- ::BIGINT because DuckDB sum(int) is HUGEINT (pandas float64) while
       -- Spark's sum(int) is bigint — without the cast the value hash flips.
       sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)::BIGINT
         AS high_priority_lines,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END)::BIGINT
         AS low_priority_lines
FROM (
  SELECT o_orderpriority,
         CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90 THEN 'LATE'
              WHEN date_diff('day', o_orderdate, l_shipdate) > 30 THEN 'SLOW'
              ELSE 'FAST' END AS delay_bucket
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
GROUP BY delay_bucket
ORDER BY delay_bucket
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue — a
    max-of-aggregate scalar subquery, decorrelated to a rank-1 window over
    the (tiny, 100-row) per-supplier aggregate. Revenue compared at cents
    precision on both sides so FP summation order cannot flip the winner."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    su = _t(spark, sf_dir, "supplier")
    per_supp = li.groupBy("l_suppkey").agg(
        F.round(F.sum(_rev()), 2).alias("total_revenue")
    )
    w = Window.orderBy(F.col("total_revenue").desc())
    best = per_supp.withColumn("rk", F.rank().over(w)).filter(F.col("rk") == 1)
    return (
        best.join(F.broadcast(su), best.l_suppkey == su.s_suppkey)
        .select(
            F.col("s_suppkey").alias("suppkey"),
            "s_name",
            "total_revenue",
        )
        .orderBy("suppkey")
    )


ORACLE_Q15 = """
WITH revenue AS (
  SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey AS suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY suppkey
"""


def q16_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per (brand, size) for a
    filtered part family (supplier-part relation derived from lineitem; no
    partsupp in the driver schema). count_distinct forces a two-phase
    aggregate; the part filter is broadcast into the fact scan."""
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(1, 5, 9, 13, 17, 21))
    )
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), F.col("p_brand").asc(), F.col("p_size").asc()
        )
    )


ORACLE_Q16 = """
SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 5, 9, 13, 17, 21)
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems below half their part's
    average quantity, for one brand. The correlated AVG decorrelates into a
    groupBy + broadcast join back to the fact rows — one pass over lineitem
    for the averages (brand-filtered, tiny) and one for the probe."""
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    li_b = li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_q = li_b.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li_b.join(F.broadcast(avg_q), li_b.l_partkey == avg_q.ap_key)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


ORACLE_Q17 = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
       count(*) AS n_lines
FROM lineitem l
JOIN part ON l.l_partkey = p_partkey
WHERE p_brand = 'Brand#3'
  AND l.l_quantity < (
    SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
  )
"""


def q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: a join whose residual predicate is an OR of three
    conjunct groups spanning both sides. The equi-key (partkey) still drives
    a broadcast hash join; the disjunction stays a post-join filter — never
    a nested-loop join."""
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
    c1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 15)
    )
    c2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(11, 20)
        & F.col("l_quantity").between(10, 25)
    )
    c3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(21, 30)
        & F.col("l_quantity").between(20, 35)
    )
    return j.filter(c1 | c2 | c3).agg(
        F.round(F.sum(_rev()), 2).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


ORACLE_Q19 = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 20
       AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 21 AND 30
       AND l_quantity BETWEEN 20 AND 35)
"""


def q21_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers owning the LAST shipment of multi-supplier
    orders (the schema has no commit/receipt dates, so "kept the order
    waiting" becomes "shipped last where others had already shipped").
    One shuffle on l_orderkey computes both the per-order supplier count and
    the max ship date via a window, replacing Q21's EXISTS/NOT-EXISTS pair."""
    li = _t(spark, sf_dir, "lineitem")
    su = _t(spark, sf_dir, "supplier")
    w = Window.partitionBy("l_orderkey")
    marked = li.select("l_orderkey", "l_suppkey", "l_shipdate").withColumn(
        "max_ship", F.max("l_shipdate").over(w)
    ).withColumn("n_supps", F.size(F.collect_set("l_suppkey").over(w)))
    blame = (
        marked.filter((F.col("n_supps") >= 2) & (F.col("l_shipdate") == F.col("max_ship")))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        blame.join(F.broadcast(su), blame.l_suppkey == su.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(10)
    )


ORACLE_Q21 = """
SELECT s_name, count(*) AS numwait
FROM (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM (
    SELECT l_orderkey, l_suppkey, l_shipdate,
           max(l_shipdate) OVER (PARTITION BY l_orderkey) AS max_ship,
           count(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey) AS n_supps
    FROM lineitem
  )
  WHERE n_supps >= 2 AND l_shipdate = max_ship
)
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: wealthy customers with no orders, grouped by a
    derived country code (nation bucket — the schema has no phone column).
    Global positive-balance average broadcast as a one-row scalar; the
    no-orders test is a left-anti join (no row explosion, one shuffle)."""
    cu = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    # Average rounded to cents on both sides so FP summation order cannot
    # flip membership of a customer whose balance ~equals the average.
    avg_bal = cu.filter(F.col("c_acctbal") > 0.0).agg(
        F.round(F.avg("c_acctbal"), 2).alias("avg_bal")
    )
    return (
        cu.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, cu["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy((F.col("c_nationkey") % 5).cast("int").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


ORACLE_Q22 = """
SELECT (c_nationkey % 5)::INT AS cntrycode, count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c_acctbal >
      (SELECT round(avg(c_acctbal), 2) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY cntrycode
ORDER BY cntrycode
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q4_order_priority": q4_order_priority,
    "q20_heavy_shippers": q20_heavy_shippers,
    "q7_nation_trade": q7_nation_trade,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q10_returned_revenue": q10_returned_revenue,
    "q11_valuable_parts": q11_valuable_parts,
    "q12_late_shipments": q12_late_shipments,
    "q15_top_supplier": q15_top_supplier,
    "q16_part_variety": q16_part_variety,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q19_disjunctive_join": q19_disjunctive_join,
    "q21_blame_supplier": q21_blame_supplier,
    "q22_idle_customers": q22_idle_customers,
}

ORACLES = {
    "q2_min_cost_supplier": ORACLE_Q2,
    "q4_order_priority": ORACLE_Q4,
    "q20_heavy_shippers": ORACLE_Q20,
    "q7_nation_trade": ORACLE_Q7,
    "q8_market_share": ORACLE_Q8,
    "q9_product_profit": ORACLE_Q9,
    "q10_returned_revenue": ORACLE_Q10,
    "q11_valuable_parts": ORACLE_Q11,
    "q12_late_shipments": ORACLE_Q12,
    "q15_top_supplier": ORACLE_Q15,
    "q16_part_variety": ORACLE_Q16,
    "q17_small_quantity_revenue": ORACLE_Q17,
    "q19_disjunctive_join": ORACLE_Q19,
    "q21_blame_supplier": ORACLE_Q21,
    "q22_idle_customers": ORACLE_Q22,
}
