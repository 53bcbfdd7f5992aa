#!/usr/bin/env python
"""Deterministic scale-up of the driver's sf0.1 testdata for scaling-curve
benchmarks (VERDICT r4 item 1: "scale-proof the headline set at sf1.0").

/root/testdata is read-only and driver-owned; this script derives larger
SFs from sf0.1 under the REPO (default ``.scaledata/sfX``, gitignored) by
unioning K perturbed copies. The perturbations are pure column expressions
of (input row, copy index) — no randomness — chosen so per-query work
scales the way a natively-generated larger SF would:

- ``region``/``nation``: fixed (TPC-H dimension semantics).
- ``customer``/``supplier``/``part``: keys offset by ``copy * STRIDE``;
  names suffixed per copy so distinct-counts scale.
- ``orders``/``lineitem``: keys AND foreign keys offset by the same copy
  stride, so every FK lands in its own copy's dimension rows — join
  fan-outs and group sizes are copy-invariant (a 10x corpus has 10x
  groups of the same size, not 10x-bigger groups).
- ``events``: event_id/user_id offset per copy; timestamps unchanged, so
  per-user session density is constant and sessionization scales linearly.
- ``documents``: word-rotate the text by (copy) positions and append a
  per-copy salt token. Rotation preserves the word multiset (quality /
  lang-id / token-count distributions are copy-invariant) and within-copy
  similarity structure (identical texts stay identical), while killing
  cross-copy shingle overlap — without it every doc would gain K-1 exact
  twins and pair-generating dedup queries would scale ~K^2, polluting the
  scaling measurement with a data artifact.
- ``embeddings``: cyclically roll the vector by ``copy`` positions — an
  orthogonal permutation, so within-copy distances/cosines are EXACTLY
  preserved (cluster structure intact) while cross-copy cosine collapses
  to near-random; near-dup pair counts scale ~K, not K^2.

Usage: python tools/make_scale.py [--factor 10] [--out .scaledata/sf1.0]
"""

from __future__ import annotations

import argparse
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STRIDE = 10_000_000  # clear of every sf0.1 key space (max key 149_999)

SRC_DEFAULT = "/root/testdata/sf0.1"


def _copies(df: DataFrame, factor: int, fn) -> DataFrame:
    out = fn(df, 0)
    for i in range(1, factor):
        out = out.unionByName(fn(df, i))
    return out


def _off(col: str, i: int):
    return (F.col(col) + F.lit(i * STRIDE)).alias(col)


def scale_tables(spark: SparkSession, src: str, factor: int) -> dict[str, DataFrame]:
    t = {
        name: spark.read.parquet(f"{src}/{name}.parquet")
        for name in [
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        ]
    }

    def cust(df, i):
        name = F.col("c_name") if i == 0 else F.concat_ws("-", "c_name", F.lit(i))
        return df.select(
            _off("c_custkey", i), name.alias("c_name"),
            "c_nationkey", "c_acctbal", "c_mktsegment",
        )

    def supp(df, i):
        name = F.col("s_name") if i == 0 else F.concat_ws("-", "s_name", F.lit(i))
        return df.select(
            _off("s_suppkey", i), name.alias("s_name"), "s_nationkey", "s_acctbal"
        )

    def part(df, i):
        name = F.col("p_name") if i == 0 else F.concat_ws("-", "p_name", F.lit(i))
        return df.select(
            _off("p_partkey", i), name.alias("p_name"),
            "p_brand", "p_type", "p_size", "p_retailprice",
        )

    def orders(df, i):
        return df.select(
            _off("o_orderkey", i), _off("o_custkey", i),
            "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
        )

    def lineitem(df, i):
        return df.select(
            _off("l_orderkey", i), _off("l_partkey", i), _off("l_suppkey", i),
            "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
            "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
        )

    def events(df, i):
        return df.select(
            _off("event_id", i), "ts", _off("user_id", i),
            "event_type", "value", "props",
        )

    def documents(df, i):
        if i == 0:
            return df
        arr = F.split(F.col("text"), " ")
        # Rename ~30% of word TYPES per copy (selection keyed on
        # md5(word:copy), so each copy renames a different subset, and the
        # SAME subset for every doc within the copy). Rotation alone kills
        # shingle/MinHash overlap but PRESERVES the token multiset, so
        # order-invariant fingerprints (SimHash) collided across copies and
        # near-dup pair counts scaled ~quadratically — a data artifact that
        # polluted the first sf1.0 scaling run (88.6x pair growth for 10x
        # docs). Renaming changes the multiset itself; within-copy
        # similarity structure is untouched (same deterministic mapping).
        renamed = F.transform(
            arr,
            lambda w: F.when(
                F.conv(
                    F.substring(F.md5(F.concat(w, F.lit(f":{i}"))), 1, 4),
                    16, 10,
                ).cast("long") % 10 < 3,
                F.concat(w, F.lit(f"q{i}")),
            ).otherwise(w),
        )
        n = F.size(renamed)
        # rotate by i % 10 (every doc has >= 10 words at sf0.1, so r < n
        # always — including factor > 10, r7). Copies sharing a rotation
        # (i, i+10, ...) still diverge: the 30% word-type rename is keyed
        # per copy (shared-shingle rate ~(0.7²)³ ≈ 12% → Jaccard ~0.06,
        # far under every threshold) and the zq{i} salt token differs, so
        # no cross-copy exact/near twins appear as a data artifact.
        # Identical to the r4 transform for factor <= 10 (i % 10 == i).
        r = F.lit(i % 10)
        rotated = F.concat(
            F.slice(renamed, r + 1, n - r),
            F.slice(renamed, F.lit(1), r),
            F.array(F.concat(F.lit("zq"), F.lit(str(i)))),
        )
        text = F.array_join(rotated, " ")
        return df.select(
            _off("doc_id", i), text.alias("text"), "lang", "source",
            F.length(text).cast("bigint").alias("n_chars"),
        )

    def embeddings(df, i):
        if i == 0:
            return df
        a = F.col("embedding")
        n = F.size(a)
        # (roll by i % 50, negate for i >= 50): both orthogonal, so
        # within-copy distances/cosines are EXACTLY preserved; the (roll,
        # sign) pair is unique per copy up to factor 100, so no two copies
        # apply the same transform (a plain roll wraps at dim=64 and would
        # plant exact cross-copy twins — r7 fix). Identical to the r4
        # transform for factor <= 10.
        r = F.lit(i % 50)
        rolled = F.concat(F.slice(a, r + 1, n - r), F.slice(a, F.lit(1), r))
        if i >= 50:
            rolled = F.transform(rolled, lambda x: -x)
        return df.select(
            _off("vec_id", i), rolled.alias("embedding"), "label"
        )

    return {
        "region": t["region"],
        "nation": t["nation"],
        "customer": _copies(t["customer"], factor, cust),
        "supplier": _copies(t["supplier"], factor, supp),
        "part": _copies(t["part"], factor, part),
        "orders": _copies(t["orders"], factor, orders),
        "lineitem": _copies(t["lineitem"], factor, lineitem),
        "events": _copies(t["events"], factor, events),
        "documents": _copies(t["documents"], factor, documents),
        "embeddings": _copies(t["embeddings"], factor, embeddings),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=SRC_DEFAULT)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    sf = 0.1 * args.factor
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scaledata", f"sf{sf:g}",
    )
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("make-scale")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # factor-100 plans are 100-way unions of wide projections — the 1g
        # default driver heap OOMs compiling/collecting them (r7)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tables = scale_tables(spark, args.src, args.factor)
    for name, df in tables.items():
        # match the driver layout: one parquet dir per table; coalesce the
        # small dims so file counts stay sane, keep facts multi-file
        parts = 1 if name in ("region", "nation") else min(16, args.factor * 2)
        df.repartition(parts).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
        print(name, spark.read.parquet(f"{out}/{name}.parquet").count())
    spark.stop()
    print("wrote", out)


if __name__ == "__main__":
    main()
