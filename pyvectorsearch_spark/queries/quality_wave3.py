"""Registration shim for the round-4 quality/statistics additions that live
in ``quality_extra.py`` (KS drift, corpus diversity, A/B z-test, crosstab,
BH-FDR). They register HERE — after the driver's pinned 50-entry window —
so the window's membership stays identical to rounds 1-3 (the round-2
verdict: "keep the window stable"); tests/test_oracle_parity.py covers them
against the same oracles regardless of position."""

from __future__ import annotations

from pyvectorsearch_spark.queries.quality_extra import (
    ORACLE_CORPUS_DIVERSITY,
    ORACLE_EVENTS_AB_CUPED,
    ORACLE_DOCUMENTS_CROSSTAB,
    ORACLE_EVENTS_AB,
    ORACLE_EVENTS_KS,
    ORACLE_EVENTS_KS_BH,
    q_corpus_diversity,
    q_events_ab_cuped,
    q_documents_crosstab,
    q_events_ab_test,
    q_events_ks_bh_fdr,
    q_events_ks_drift,
)

QUERIES = {
    "events_ks_drift": q_events_ks_drift,
    "corpus_diversity": q_corpus_diversity,
    "events_ab_test": q_events_ab_test,
    "documents_crosstab": q_documents_crosstab,
    "events_ks_bh_fdr": q_events_ks_bh_fdr,
    "events_ab_cuped": q_events_ab_cuped,
}
ORACLES = {
    "events_ks_drift": ORACLE_EVENTS_KS,
    "corpus_diversity": ORACLE_CORPUS_DIVERSITY,
    "events_ab_test": ORACLE_EVENTS_AB,
    "documents_crosstab": ORACLE_DOCUMENTS_CROSSTAB,
    "events_ks_bh_fdr": ORACLE_EVENTS_KS_BH,
    "events_ab_cuped": ORACLE_EVENTS_AB_CUPED,
}


# --- WOE / IV supervised feature binning -------------------------------------

WOE_BINS = 10
WOE_SMOOTH = 0.5


def q_feature_woe_iv(spark, sf_dir):
    """Weight-of-evidence / information-value profile (the credit-scoring
    standard, Siddiqi 2006) of order price against the is-fulfilled
    label: rank-based decile bins (engine-exact — explicit row_number,
    not ntile, whose tie handling differs across engines), per bin the
    good/bad counts, WOE = ln(smoothed bad share / smoothed good share),
    and the total IV riding every row. The supervised twin of the
    unsupervised `price_decile_bins`: IV says whether the feature
    separates the label at all before anyone trains on it.

    Shape: one global sort-rank window (the only data-sized work; at
    100 TB the rank comes from a sampled range partitioner the same way
    orderBy does), one bins-sized rollup, arithmetic after that."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pyvectorsearch_spark.sources.tables import load_table, spread

    o = spread(load_table(spark, sf_dir, "orders")).select(
        "o_orderkey",
        "o_totalprice",
        (F.col("o_orderstatus") == "F").cast("int").alias("bad"),
    )
    n_tot = o.count()
    wr = Window.orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
    binned = o.withColumn(
        "bin",
        F.floor((F.row_number().over(wr) - 1) * WOE_BINS / F.lit(n_tot)).cast(
            "bigint"
        ),
    )
    g = binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("bad").cast("bigint").alias("n_bad"),
        (F.count("*") - F.sum("bad")).cast("bigint").alias("n_good"),
        F.round(F.min("o_totalprice"), 2).alias("bin_lo"),
        F.round(F.max("o_totalprice"), 2).alias("bin_hi"),
    )
    tot = g.agg(
        F.sum("n_bad").cast("bigint").alias("tb"),
        F.sum("n_good").cast("bigint").alias("tg"),
    )
    k = WOE_BINS * WOE_SMOOTH
    joined = g.crossJoin(F.broadcast(tot)).withColumn(
        "_bs", (F.col("n_bad") + WOE_SMOOTH) / (F.col("tb") + F.lit(k))
    ).withColumn(
        "_gs", (F.col("n_good") + WOE_SMOOTH) / (F.col("tg") + F.lit(k))
    ).withColumn("_woe", F.log(F.col("_bs") / F.col("_gs")))
    wall = Window.partitionBy(F.lit(1))
    return (
        joined.withColumn(
            "iv_total",
            F.round(
                F.sum((F.col("_bs") - F.col("_gs")) * F.col("_woe")).over(wall), 6
            ),
        )
        .select(
            "bin", "n", "n_good", "n_bad", "bin_lo", "bin_hi",
            F.round("_woe", 6).alias("woe_r"), "iv_total",
        )
        .orderBy("bin")
    )


ORACLE_FEATURE_WOE_IV = f"""
WITH o AS (
  SELECT o_orderkey, o_totalprice,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
  FROM orders
),
binned AS (
  SELECT *, CAST(floor((row_number() OVER (ORDER BY o_totalprice, o_orderkey)
                        - 1) * {WOE_BINS} / (SELECT count(*) FROM o))
                 AS BIGINT) AS bin
  FROM o
),
g AS (
  SELECT bin, count(*)::BIGINT AS n, sum(bad)::BIGINT AS n_bad,
         (count(*) - sum(bad))::BIGINT AS n_good,
         round(min(o_totalprice), 2) AS bin_lo,
         round(max(o_totalprice), 2) AS bin_hi
  FROM binned GROUP BY bin
),
tot AS (SELECT sum(n_bad)::BIGINT AS tb, sum(n_good)::BIGINT AS tg FROM g),
j AS (
  SELECT g.*, (n_bad + {WOE_SMOOTH}) / (t.tb + {WOE_BINS * WOE_SMOOTH}) AS bs,
         (n_good + {WOE_SMOOTH}) / (t.tg + {WOE_BINS * WOE_SMOOTH}) AS gs
  FROM g CROSS JOIN tot t
)
SELECT bin, n, n_good, n_bad, bin_lo, bin_hi,
       round(ln(bs / gs), 6) AS woe_r,
       round(sum((bs - gs) * ln(bs / gs)) OVER (), 6) AS iv_total
FROM j ORDER BY bin
"""

QUERIES.update({"feature_woe_iv": q_feature_woe_iv})
ORACLES.update({"feature_woe_iv": ORACLE_FEATURE_WOE_IV})
