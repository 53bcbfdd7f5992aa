"""Deterministic sketch operators (north-star extensions; the reference has
no aggregation surface at all).

KMV (k-minimum-values) distinct-count sketch — Bar-Yossef et al. 2002: hash
every value to (0,1); the k-th smallest hash u_k of D distinct values sits
near k/D, so D-hat = (k-1)/u_k. Unlike HyperLogLog implementations (whose
register layouts differ per engine), KMV over an md5 hash is a DETERMINISTIC
function of the value set — Spark and DuckDB compute bit-identical estimates,
so the sketch itself is oracle-checkable.

Hash: first 13 hex chars of md5 (52 bits) — exact in BIGINT and in double,
in both engines (the same trick as ``sampling.hash_bucket``'s 48-bit bucket).

Scale shape: the per-(group, hash) dedupe is a map-side-combined groupBy (the
only corpus-sized shuffle moves distinct (group, 52-bit-hash) pairs, like any
exact distinct); ranking is two-phase (sub-shard k-min first, then k-min of
the ≤ k·shards survivors), so a billion-distinct group never sorts in one
task. The summary itself (k values per group) is mergeable: union two groups'
k-min lists and re-take the k smallest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HEX_DIGITS = 13  # 52 bits: exact in bigint AND double, both engines
_SCALE = float(16**HEX_DIGITS)


def kmv_hash(col: Column) -> Column:
    """Deterministic uniform hash in [0, 1): first 52 bits of md5, scaled.
    DuckDB twin: ``('0x' || substr(md5(x), 1, 13))::BIGINT / 16.0^13``."""
    h = F.md5(col.cast("string"))
    return (
        F.conv(F.substring(h, 1, HEX_DIGITS), 16, 10).cast("bigint") / F.lit(_SCALE)
    )


def duckdb_kmv_hash(expr: str) -> str:
    return (
        f"('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, {HEX_DIGITS}))::BIGINT"
        f" / {_SCALE!r}"
    )


def kmv_distinct(
    df: DataFrame,
    *,
    by: str,
    value_col: str,
    k: int = 64,
    sub_shards: int = 16,
) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Returns (``by``, n_distinct_exact, kmv_estimate, u_k) where
    ``kmv_estimate`` = round((k-1)/u_k, 3) when the group has >= k distinct
    values, else the exact count (the sketch is exact below capacity);
    ``u_k`` is the k-th smallest normalized hash (NULL below capacity).
    ``n_distinct_exact`` rides along free — the dedupe needed for the
    sketch IS an exact distinct — and doubles as the accuracy reference.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    u = kmv_hash(F.col(value_col))
    # dedupe: map-side combined; the shuffle moves distinct (group, u) pairs
    d = df.select(F.col(by), u.alias("_u")).distinct()
    # two-phase k-min so one giant group cannot serialize into a single sort
    shard = (F.col("_u") * sub_shards).cast("int")
    w1 = Window.partitionBy(by, shard).orderBy("_u")
    cand = d.withColumn("_r1", F.row_number().over(w1))
    w2 = Window.partitionBy(by).orderBy("_u")
    ranked = cand.filter(F.col("_r1") <= k).withColumn("_r2", F.row_number().over(w2))
    mins = ranked.groupBy(by).agg(
        F.max(F.when(F.col("_r2") == k, F.col("_u"))).alias("u_k")
    )
    totals = d.groupBy(by).agg(F.count("*").cast("bigint").alias("n_distinct_exact"))
    est = F.when(
        F.col("u_k").isNotNull(), F.round((k - 1) / F.col("u_k"), 3)
    ).otherwise(F.col("n_distinct_exact").cast("double"))
    return totals.join(mins, by).select(
        by,
        "n_distinct_exact",
        est.alias("kmv_estimate"),
        F.round("u_k", 9).alias("u_k"),
    )
