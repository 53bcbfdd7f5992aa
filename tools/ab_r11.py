#!/usr/bin/env python
"""Interleaved A/B harness for the r11 changes whose old form is expressible
inline (guide §1: decide only on interleaved runs).

Pairs:
  pq      — price_quantiles: F.percentile object aggregate (old) vs the
            distributed range-partition + global-rank form (new, shipped)
  mmd     — embedding_mmd_drift literal build: per-element F.array(*lit)
            (old) vs one-call lit(ndarray) (new, shipped); build+exec timed
  grid    — knn_grid_query_table: qs re-attach SMJ (old, forced via
            QS_BROADCAST_MAX_BYTES=0) vs broadcast (new default)

Usage: python tools/ab_r11.py [rounds] [pq|mmd|grid ...]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    which = sys.argv[2:] or ["pq", "mmd", "grid"]
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-r11")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyvectorsearch_spark.queries.relational import _t, price_quantiles

    def pq_old():
        li = _t(spark, sf_dir, "lineitem")
        pct = F.percentile("l_extendedprice", F.lit([0.25, 0.5, 0.75]))
        noop(
            li.groupBy("l_returnflag").agg(
                F.count("*").alias("n"),
                F.round(F.element_at(pct, 1), 6).alias("p25"),
                F.round(F.element_at(pct, 2), 6).alias("p50"),
                F.round(F.element_at(pct, 3), 6).alias("p75"),
                F.round(F.avg("l_extendedprice"), 6).alias("mean_price"),
            )
        )

    def pq_new():
        noop(price_quantiles(spark, sf_dir))

    from pyvectorsearch_spark.queries.embedding_extra import (
        q_embedding_mmd_drift,
        _mmd_rff_params,
        MMD_D,
        MMD_DIM,
        MMD_SHIFT,
    )
    from pyvectorsearch_spark.sources.tables import load_table, spread

    def mmd_old():
        ws, bs = _mmd_rff_params()
        emb = spread(load_table(spark, sf_dir, "embeddings")).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("x")
        )

        def feats(xcol):
            cols = []
            for j in range(MMD_D):
                warr = F.array(*[F.lit(v) for v in ws[j]])
                dot = F.aggregate(
                    F.zip_with(xcol, warr, lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                cols.append(F.cos(dot + F.lit(bs[j])).alias(f"z{j}"))
            return cols

        shifted = F.concat(
            F.array(F.element_at("x", 1) + F.lit(MMD_SHIFT)),
            F.slice("x", 2, MMD_DIM - 1),
        )
        even = emb.filter(F.col("vec_id") % 2 == 0).select(*feats(F.col("x")))
        odd = emb.filter(F.col("vec_id") % 2 == 1).select(*feats(F.col("x")))
        odd_shift = emb.filter(F.col("vec_id") % 2 == 1).select(*feats(shifted))

        def mean_row(df, prefix):
            return df.agg(
                F.count("*").cast("bigint").alias(f"{prefix}_n"),
                *[F.avg(f"z{j}").alias(f"{prefix}{j}") for j in range(MMD_D)],
            )

        ex, od, osf = mean_row(even, "e"), mean_row(odd, "o"), mean_row(odd_shift, "s")
        j3 = ex.crossJoin(od).crossJoin(osf)
        mmd_null = sum(
            ((F.col(f"e{j}") - F.col(f"o{j}")) * (F.col(f"e{j}") - F.col(f"o{j}"))
             for j in range(MMD_D)),
            F.lit(0.0),
        ) * (2.0 / MMD_D)
        mmd_shift = sum(
            ((F.col(f"e{j}") - F.col(f"s{j}")) * (F.col(f"e{j}") - F.col(f"s{j}"))
             for j in range(MMD_D)),
            F.lit(0.0),
        ) * (2.0 / MMD_D)
        noop(j3.select(
            F.col("e_n").alias("n_x"),
            F.col("o_n").alias("n_y"),
            F.lit(MMD_D).cast("int").alias("n_features"),
            F.round(mmd_null, 6).alias("mmd2_null_r"),
            F.round(mmd_shift, 6).alias("mmd2_shift_r"),
            F.round(mmd_shift / F.greatest(mmd_null, F.lit(1e-12)), 2).alias(
                "shift_over_null_r"
            ),
        ))

    def mmd_new():
        noop(q_embedding_mmd_drift(spark, sf_dir))

    from pyvectorsearch_spark.queries.vector import QUERIES as VQ
    from pyvectorsearch_spark.index.grid import GridIndex

    def grid_old():
        prev = GridIndex.QS_BROADCAST_MAX_BYTES
        GridIndex.QS_BROADCAST_MAX_BYTES = 0
        try:
            noop(VQ["knn_grid_query_table"](spark, sf_dir))
        finally:
            GridIndex.QS_BROADCAST_MAX_BYTES = prev

    def grid_new():
        noop(VQ["knn_grid_query_table"](spark, sf_dir))

    pairs = {
        "pq": (pq_old, pq_new),
        "mmd": (mmd_old, mmd_new),
        "grid": (grid_old, grid_new),
    }
    for key in which:
        old_f, new_f = pairs[key]
        olds, news = [], []
        for r in range(rounds):
            t0 = time.time(); old_f(); olds.append(time.time() - t0)
            t0 = time.time(); new_f(); news.append(time.time() - t0)
            print(f"{key} round {r}: old={olds[-1]:.3f}  new={news[-1]:.3f}", flush=True)
        print(
            f"{key}: old min={min(olds):.3f} median={statistics.median(olds):.3f} | "
            f"new min={min(news):.3f} median={statistics.median(news):.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
