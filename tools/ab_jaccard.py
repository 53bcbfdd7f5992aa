#!/usr/bin/env python
"""Interleaved A/B harness for jaccard_similarity_pairs variants (r11 opt).

Variants (all must produce IDENTICAL (d1,d2,n_common,jaccard) rows):
  v0: current operator (collect_list prefix + array_intersect verify)
  v1: collect_list prefix + POSTING-LIST verify (no arr1/arr2 consumers)
  v2: v1 + posting-list pair GENERATION (groupBy(s) + pair explode, no self-join)
  v3: window-rank prefix (no collect_list anywhere) + posting-list verify

Usage: python tools/ab_jaccard.py [rounds] [variants...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyvectorsearch_spark.operators.dedup import _shingle_rows, jaccard_similarity_pairs

THRESHOLD = 0.8
N = 3


def _prefix_ranked(df, id_col, text_col, n, threshold):
    """Current prefix machinery: returns (ranked, pref, exdf)."""
    ex = _shingle_rows(df, id_col, text_col, n)
    exdf = ex.withColumn("df", F.count("*").over(Window.partitionBy("s")))
    ranked = exdf.groupBy("doc").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("df", "s"))), lambda t: t["s"]
        ).alias("sh"),
    )
    ranked = ranked.withColumn("n_sh", F.size("sh")).withColumn(
        "prefix",
        F.slice("sh", 1, F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1),
    )
    pref = ranked.select("doc", "n_sh", F.explode("prefix").alias("s"))
    return ranked, pref, exdf


def _posting_verify(cand, exdf, threshold):
    """cand(d1,d2,n1,n2) -> exact (d1,d2,n_common,jaccard) via shared-shingle
    counts off the exploded table (no per-doc arrays materialized)."""
    e1 = exdf.filter(F.col("df") >= 1).select(F.col("doc").alias("d1"), "s")
    e2 = exdf.filter(F.col("df") >= 1).select(F.col("doc").alias("d2"), "s")
    hits = cand.join(e1, "d1").join(e2, ["d2", "s"])
    out = hits.groupBy("d1", "d2", "n1", "n2").agg(F.count("*").alias("n_common"))
    return (
        out.withColumn(
            "jaccard", F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("d1", "d2", "n_common", "jaccard")
    )


def v1(df, *, id_col="doc_id", text_col="text", n=N, threshold=THRESHOLD):
    ranked, pref, exdf = _prefix_ranked(df, id_col, text_col, n, threshold)
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
    return _posting_verify(cand, exdf, threshold)


def _pairs_from_postings(pref, threshold):
    """cand(d1,d2,n1,n2) via ONE consumer: group prefix rows by shingle,
    explode ordered pairs from each (short, rare-first) posting list."""
    plist = pref.groupBy("s").agg(
        F.collect_list(F.struct("doc", "n_sh")).alias("ps")
    )
    pair = F.filter(
        F.flatten(
            F.transform(
                F.col("ps"),
                lambda x, i: F.transform(
                    F.slice(F.col("ps"), i + 2, F.size("ps")), lambda y: F.struct(
                        F.least(x["doc"], y["doc"]).alias("d1"),
                        F.greatest(x["doc"], y["doc"]).alias("d2"),
                        F.when(x["doc"] < y["doc"], x["n_sh"]).otherwise(y["n_sh"]).alias("n1"),
                        F.when(x["doc"] < y["doc"], y["n_sh"]).otherwise(x["n_sh"]).alias("n2"),
                    )
                ),
            )
        ),
        lambda p: (p["d1"] != p["d2"])
        & (F.least(p["n1"], p["n2"]) >= F.lit(threshold) * F.greatest(p["n1"], p["n2"])),
    )
    return (
        plist.select(F.explode(pair).alias("p"))
        .select("p.d1", "p.d2", "p.n1", "p.n2")
        .distinct()
    )


def v2(df, *, id_col="doc_id", text_col="text", n=N, threshold=THRESHOLD):
    ranked, pref, exdf = _prefix_ranked(df, id_col, text_col, n, threshold)
    cand = _pairs_from_postings(pref, threshold)
    return _posting_verify(cand, exdf, threshold)


def v3(df, *, id_col="doc_id", text_col="text", n=N, threshold=THRESHOLD):
    ex = _shingle_rows(df, id_col, text_col, n)
    exdf = ex.withColumn("df", F.count("*").over(Window.partitionBy("s")))
    wdoc = Window.partitionBy("doc")
    worder = wdoc.orderBy("df", "s")
    rk = exdf.select(
        "doc",
        "s",
        F.row_number().over(worder).alias("r"),
        F.count("*").over(wdoc).alias("n_sh"),
    )
    pref = rk.filter(
        F.col("r") <= F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
    ).select("doc", "n_sh", "s")
    cand = _pairs_from_postings(pref, threshold)
    return _posting_verify(cand, exdf, threshold)


def v4(df, *, id_col="doc_id", text_col="text", n=N, threshold=THRESHOLD):
    """Posting-list verify anchored on an explicit repartition(s): the
    window adds no exchange of its own, so e1/e2 reuse the SAME exchange
    with no Sort/Window recompute."""
    ex = _shingle_rows(df, id_col, text_col, n).repartition("s")
    exdf = ex.withColumn("df", F.count("*").over(Window.partitionBy("s")))
    ranked = exdf.groupBy("doc").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("df", "s"))), lambda t: t["s"]
        ).alias("sh"),
    )
    ranked = ranked.withColumn("n_sh", F.size("sh")).withColumn(
        "prefix",
        F.slice("sh", 1, F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1),
    )
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
    e1 = ex.select(F.col("doc").alias("d1"), "s")
    e2 = ex.select(F.col("doc").alias("d2"), "s")
    hits = cand.join(e1, "d1").join(e2, ["d2", "s"])
    out = hits.groupBy("d1", "d2", "n1", "n2").agg(F.count("*").alias("n_common"))
    return (
        out.withColumn(
            "jaccard", F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("d1", "d2", "n_common", "jaccard")
    )


def _v0_tail(ranked, threshold):
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
        .select(F.col("a.doc").alias("d1"), F.col("b.doc").alias("d2"))
        .distinct()
    )
    arr1 = ranked.select(F.col("doc").alias("d1"), F.col("sh").alias("sh1"), F.col("n_sh").alias("n1"))
    arr2 = ranked.select(F.col("doc").alias("d2"), F.col("sh").alias("sh2"), F.col("n_sh").alias("n2"))
    n_common = F.size(F.array_intersect("sh1", "sh2"))
    return (
        cand.join(arr1, "d1")
        .join(arr2, "d2")
        .withColumn("n_common", n_common)
        .withColumn(
            "jaccard", F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("d1", "d2", "n_common", "jaccard")
    )


def v5(df, *, id_col="doc_id", text_col="text", n=N, threshold=THRESHOLD, strip=True):
    """Packed-string sort: collect_list of lpad(df)||\\x01||s, flat string
    sort_array instead of the struct comparator. strip=True unpacks after
    the sort; strip=False keeps packed keys everywhere (equality on packed
    == equality on s because df is a function of s)."""
    ex = _shingle_rows(df, id_col, text_col, n)
    exdf = ex.withColumn("df", F.count("*").over(Window.partitionBy("s")))
    packed = F.concat(F.lpad(F.col("df").cast("string"), 19, "0"), F.lit("\x01"), F.col("s"))
    agg = F.array_sort(F.collect_list(packed))
    if strip:
        agg = F.transform(agg, lambda x: F.substring(x, 21, 1 << 30))
    ranked = exdf.groupBy("doc").agg(agg.alias("sh"))
    ranked = ranked.withColumn("n_sh", F.size("sh")).withColumn(
        "prefix",
        F.slice("sh", 1, F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1),
    )
    return _v0_tail(ranked, threshold)


def v6(df, *, id_col="doc_id", text_col="text", n=N, threshold=THRESHOLD):
    """v0 array verify, but pair GENERATION from groupBy(s) posting lists
    (one ranked consumer fewer than the self-join)."""
    ranked, pref, exdf = _prefix_ranked(df, id_col, text_col, n, threshold)
    cand = _pairs_from_postings(pref, threshold).select("d1", "d2")
    arr1 = ranked.select(F.col("doc").alias("d1"), F.col("sh").alias("sh1"), F.col("n_sh").alias("n1"))
    arr2 = ranked.select(F.col("doc").alias("d2"), F.col("sh").alias("sh2"), F.col("n_sh").alias("n2"))
    n_common = F.size(F.array_intersect("sh1", "sh2"))
    return (
        cand.join(arr1, "d1")
        .join(arr2, "d2")
        .withColumn("n_common", n_common)
        .withColumn(
            "jaccard", F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("d1", "d2", "n_common", "jaccard")
    )


def v7(df, *, id_col="doc_id", text_col="text", n=N, threshold=THRESHOLD):
    """df(s) via groupBy(s).count() + join instead of the Window: no Sort,
    no window buffers; AQE broadcasts the df map when it fits and
    shuffle-joins when it doesn't (scale-safe, no hint)."""
    ex = _shingle_rows(df, id_col, text_col, n)
    dfmap = ex.groupBy("s").agg(F.count("*").alias("df"))
    exdf = ex.join(dfmap, "s")
    ranked = exdf.groupBy("doc").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("df", "s"))), lambda t: t["s"]
        ).alias("sh"),
    )
    ranked = ranked.withColumn("n_sh", F.size("sh")).withColumn(
        "prefix",
        F.slice("sh", 1, F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1),
    )
    return _v0_tail(ranked, threshold)


VARIANTS = {
    "v0": lambda df: jaccard_similarity_pairs(df, threshold=THRESHOLD),
    "v7": lambda df: v7(df),
    "v1": lambda df: v1(df),
    "v2": lambda df: v2(df),
    "v3": lambda df: v3(df),
    "v4": lambda df: v4(df),
    "v5": lambda df: v5(df),
    "v5b": lambda df: v5(df, strip=False),
    "v6": lambda df: v6(df),
}


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    names = sys.argv[2:] or list(VARIANTS)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-jaccard")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=512m")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyvectorsearch_spark.sources.tables import load_table, spread

    docs = spread(load_table(spark, sf_dir, "documents"))

    def run(name):
        df = VARIANTS[name](docs).select(
            "d1", "d2", "n_common", F.round("jaccard", 6).alias("jaccard")
        )
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    # equivalence check first (exact row sets)
    base = VARIANTS["v0"](docs).select("d1", "d2", "n_common", F.round("jaccard", 6).alias("j"))
    for name in names:
        if name == "v0":
            continue
        other = VARIANTS[name](docs).select("d1", "d2", "n_common", F.round("jaccard", 6).alias("j"))
        diff = base.exceptAll(other).count() + other.exceptAll(base).count()
        print(f"equivalence {name}: diff_rows={diff}")
        assert diff == 0, f"{name} NOT equivalent"

    for name in names:  # warm-up
        run(name)
    times = {n: [] for n in names}
    for r in range(rounds):
        for name in names:
            times[name].append(run(name))
        print(f"round {r}: " + "  ".join(f"{n}={times[n][-1]:.3f}" for n in names))
    print("--- min/median over", rounds, "rounds")
    for name in names:
        ts = sorted(times[name])
        print(f"{name}: min={ts[0]:.3f} median={ts[len(ts)//2]:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
