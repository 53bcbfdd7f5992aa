"""Market-basket co-occurrence queries (registered OUTSIDE the driver's
pinned 50-entry window; covered by tests/test_oracle_parity.py).

Frequent-itemset mining at the 2-itemset level (the support/lift core of
Agrawal-Srikant association rules): which part brands ship together in the
same order more often than chance?

Scale shape: the fact table reduces to the DISTINCT (order, brand) table
first (facts-sized shuffle, map-side combined); the pair generator is a
self-join on the order key where per-order fan-out is bounded by the
brand-per-order count (itemset width), not the catalog; supports and lift
come from that pair table plus a brands-sized marginal table. Nothing
quadratic in the catalog ever materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.sources.tables import load_table, spread

BASKET_TOP = 15


def q_basket_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 brand pairs by co-occurrence support across orders, with
    lift = P(b1,b2) / (P(b1) P(b2)) — lift > 1 means the pair ships
    together more than independence predicts."""
    li = spread(load_table(spark, sf_dir, "lineitem"))
    part = load_table(spark, sf_dir, "part")
    ob = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("b"))
        .distinct()
    )
    x, y = ob.alias("x"), ob.alias("y")
    pairs = x.join(
        y, (F.col("x.o") == F.col("y.o")) & (F.col("x.b") < F.col("y.b"))
    ).select(F.col("x.o").alias("o"), F.col("x.b").alias("b1"), F.col("y.b").alias("b2"))
    sup = pairs.groupBy("b1", "b2").agg(F.count("*").cast("bigint").alias("n_pair"))
    marg = ob.groupBy("b").agg(F.count("*").cast("bigint").alias("n_b"))
    n_orders = ob.agg(F.countDistinct("o").cast("bigint").alias("_n"))
    out = (
        sup.join(F.broadcast(marg.withColumnRenamed("b", "b1").withColumnRenamed("n_b", "_n1")), "b1")
        .join(F.broadcast(marg.withColumnRenamed("b", "b2").withColumnRenamed("n_b", "_n2")), "b2")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "b1",
            "b2",
            "n_pair",
            F.round(
                F.col("n_pair") * F.col("_n") / (F.col("_n1") * F.col("_n2")), 6
            ).alias("lift_r"),
        )
    )
    return out.orderBy(F.desc("n_pair"), "b1", "b2").limit(BASKET_TOP)


ORACLE_BASKET_BRAND_PAIRS = f"""
WITH ob AS (
  SELECT DISTINCT l_orderkey AS o, p_brand AS b
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
pairs AS (
  SELECT x.o, x.b AS b1, y.b AS b2
  FROM ob x JOIN ob y ON x.o = y.o AND x.b < y.b
),
sup AS (
  SELECT b1, b2, count(*)::BIGINT AS n_pair FROM pairs GROUP BY b1, b2
),
marg AS (SELECT b, count(*)::BIGINT AS n_b FROM ob GROUP BY b),
n AS (SELECT count(DISTINCT o)::BIGINT AS nn FROM ob)
SELECT b1, b2, n_pair,
       round(n_pair * nn / CAST(m1.n_b * m2.n_b AS DOUBLE), 6) AS lift_r
FROM sup JOIN marg m1 ON m1.b = b1 JOIN marg m2 ON m2.b = b2, n
ORDER BY n_pair DESC, b1, b2 LIMIT {BASKET_TOP}
"""


QUERIES = {"basket_brand_pairs": q_basket_brand_pairs}
ORACLES = {"basket_brand_pairs": ORACLE_BASKET_BRAND_PAIRS}
