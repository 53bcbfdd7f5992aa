#!/usr/bin/env python
"""Stage decomposition of jaccard_similarity_pairs (v0) and v4 at sf0.1."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from pyvectorsearch_spark.operators.dedup import _shingle_rows


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("decomp-jaccard")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyvectorsearch_spark.sources.tables import load_table, spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    threshold = 0.8

    def build(stage: str, anchor: bool):
        ex = _shingle_rows(docs, "doc_id", "text", 3)
        if anchor:
            ex = ex.repartition("s")
        exdf = ex.withColumn("df", F.count("*").over(Window.partitionBy("s")))
        if stage == "ex":
            return ex
        if stage == "exdf":
            return exdf
        ranked = exdf.groupBy("doc").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "s"))), lambda t: t["s"]
            ).alias("sh"),
        )
        ranked = ranked.withColumn("n_sh", F.size("sh")).withColumn(
            "prefix",
            F.slice("sh", 1, F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1),
        )
        if stage == "ranked":
            return ranked
        pref = ranked.select("doc", "n_sh", F.explode("prefix").alias("s"))
        a, b = pref.alias("a"), pref.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.s") == F.col("b.s"))
                & (F.col("a.doc") < F.col("b.doc"))
                & (
                    F.least("a.n_sh", "b.n_sh")
                    >= F.lit(threshold) * F.greatest("a.n_sh", "b.n_sh")
                ),
            )
            .select(
                F.col("a.doc").alias("d1"),
                F.col("b.doc").alias("d2"),
                F.col("a.n_sh").alias("n1"),
                F.col("b.n_sh").alias("n2"),
            )
            .distinct()
        )
        if stage == "cand":
            return cand
        if stage == "full_v0":
            arr1 = ranked.select(F.col("doc").alias("d1"), F.col("sh").alias("sh1"), F.col("n_sh").alias("n1x"))
            arr2 = ranked.select(F.col("doc").alias("d2"), F.col("sh").alias("sh2"), F.col("n_sh").alias("n2x"))
            n_common = F.size(F.array_intersect("sh1", "sh2"))
            return (
                cand.select("d1", "d2").join(arr1, "d1").join(arr2, "d2")
                .withColumn("n_common", n_common)
                .withColumn("jaccard", F.col("n_common") / (F.col("n1x") + F.col("n2x") - F.col("n_common")))
                .filter(F.col("jaccard") >= threshold)
                .select("d1", "d2", "n_common", "jaccard")
            )
        # full_v4: posting verify
        e1 = ex.select(F.col("doc").alias("d1"), "s")
        e2 = ex.select(F.col("doc").alias("d2"), "s")
        hits = cand.join(e1, "d1").join(e2, ["d2", "s"])
        out = hits.groupBy("d1", "d2", "n1", "n2").agg(F.count("*").alias("n_common"))
        return (
            out.withColumn("jaccard", F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common")))
            .filter(F.col("jaccard") >= threshold)
            .select("d1", "d2", "n_common", "jaccard")
        )

    stages = [
        ("ex", False), ("exdf", False), ("ranked", False), ("cand", False),
        ("full_v0", False), ("full_v4", True), ("cand", True),
    ]
    # warmup
    for st, anc in stages:
        build(st, anc).write.mode("overwrite").format("noop").save()
    results = {f"{st}|anchor={anc}": [] for st, anc in stages}
    for r in range(4):
        for st, anc in stages:
            t0 = time.perf_counter()
            build(st, anc).write.mode("overwrite").format("noop").save()
            results[f"{st}|anchor={anc}"].append(time.perf_counter() - t0)
    for k, ts in results.items():
        ts = sorted(ts)
        print(f"{k}: min={ts[0]:.3f} median={ts[len(ts)//2]:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
