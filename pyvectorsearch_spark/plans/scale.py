"""Scale levers that are layout decisions, not query decisions: bucketing
(co-located joins — the shuffle happens once at write time, never again) and
salted two-phase aggregation (hot-key skew spreads over ``n_salts`` partial
groups before the real combine).

At 100 TB: bucket the fact tables on their join keys at ingest; every
subsequent equi-join on those keys is Exchange-free (verified by
``tests/test_scale_levers.py`` on the physical plan). For skewed group-bys
where AQE can't help (single hot key inside one task), the salted two-phase
shape bounds any task's group size by ``group/n_salts``.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_write(
    df: DataFrame,
    table: str,
    *,
    keys: Iterable[str],
    n_buckets: int,
    sort_by: Iterable[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) table. Joins and
    aggregations on ``keys`` between tables bucketed the same way need no
    Exchange — and with ``sort_by``, no Sort either (sort-merge join reads
    both sides pre-sorted)."""
    keys = list(keys)
    w = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort_by:
        w = w.sortBy(*list(sort_by))
    w.saveAsTable(table)


def salt_column(n_salts: int, *cols: str | Column) -> Column:
    """Deterministic salt in [0, n_salts): hash of the given columns (NOT
    rand() — retried tasks must produce identical rows)."""
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int")


def two_phase_agg(
    df: DataFrame,
    keys: Iterable[str],
    aggs: dict[str, tuple[str, str]],
    *,
    n_salts: int = 16,
    salt_on: Iterable[str] | None = None,
) -> DataFrame:
    """Skew-proof groupBy: phase 1 aggregates (keys + salt) — the hot key
    splits across ``n_salts`` groups in different tasks — phase 2 combines
    the tiny partials per key.

    ``aggs`` maps output column → (function, input column) with function in
    {sum, count, min, max}; these are the re-aggregable ones (avg = sum/count
    composed by the caller).

    Results are identical to ``df.groupBy(keys).agg(...)`` — integer-exact
    for count/min/max/integral sums; float sums may reassociate (as any
    parallel aggregation already does).
    """
    keys = list(keys)
    phase2_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for out, (fn, _) in aggs.items():
        if fn not in phase2_fn:
            raise ValueError(f"{out}: {fn} is not re-aggregable")
    salt_cols = list(salt_on) if salt_on else df.columns
    salted = df.withColumn("_salt", salt_column(n_salts, *salt_cols))
    p1 = salted.groupBy(*keys, "_salt").agg(
        *[getattr(F, fn)(col).alias(out) for out, (fn, col) in aggs.items()]
    )
    return p1.groupBy(*keys).agg(
        *[
            getattr(F, phase2_fn[fn])(out).alias(out)
            for out, (fn, _) in aggs.items()
        ]
    )


def key_skew_report(df: DataFrame, *, key: str) -> DataFrame:
    """One-row skew diagnostic for a prospective shuffle key — the
    "should I salt this groupBy/join?" decision input (pairs with
    `salt_column`/`two_phase_agg`, which are the remedies).

    Everything derives from two bounded aggregations: the per-key count
    table (the same map-side-combined reduction the real groupBy would do)
    and its count-of-counts histogram, so the p99 of the key-size
    distribution comes from a histogram walk, never a global sort — the
    report itself stays cheap on exactly the skewed inputs it exists to
    diagnose.

    Returns (n_keys, n_rows, max_n, top1_share_r, p99_n, cv_r):
    `top1_share_r` = largest key's share of all rows; `p99_n` = 99th
    percentile key size; `cv_r` = coefficient of variation of key sizes
    (0 = perfectly uniform)."""
    from pyspark.sql import Window

    cnt = df.groupBy(key).agg(F.count("*").cast("bigint").alias("_n"))
    stats = cnt.agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum("_n").cast("bigint").alias("n_rows"),
        F.max("_n").cast("bigint").alias("max_n"),
        F.sum(F.col("_n") * F.col("_n")).cast("bigint").alias("_sum_n2"),
    )
    # count-of-counts histogram: one row per distinct key size (tiny), so
    # the unpartitioned cumulative window is deliberate and bounded
    hist = cnt.groupBy("_n").agg(F.count("*").cast("bigint").alias("_k"))
    wb = Window.orderBy("_n")
    cum = hist.withColumn("_cum", F.sum("_k").over(wb)).crossJoin(
        F.broadcast(stats.select("n_keys"))
    )
    r = F.ceil(0.99 * F.col("n_keys")).cast("bigint")
    p99 = (
        cum.filter((F.col("_cum") >= r) & ((F.col("_cum") - F.col("_k")) < r))
        .select(F.col("_n").alias("p99_n"))
    )
    mean = F.col("n_rows") / F.col("n_keys")
    var = F.col("_sum_n2") / F.col("n_keys") - mean * mean
    cv = F.when(
        F.col("n_rows") > 0, F.round(F.sqrt(F.greatest(var, F.lit(0.0))) / mean, 6)
    ).otherwise(F.lit(0.0))
    return stats.crossJoin(F.broadcast(p99)).select(
        "n_keys",
        "n_rows",
        "max_n",
        F.round(F.col("max_n") / F.col("n_rows"), 6).alias("top1_share_r"),
        "p99_n",
        cv.alias("cv_r"),
    )
