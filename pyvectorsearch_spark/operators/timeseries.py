"""Time-series operators: dense resampling (gap-fill) and linear
interpolation — the event-stream analytics companions to ``sessionize`` and
the drift monitor (north-star extensions; the reference has no temporal
surface).

Engine-parity contract: buckets are EPOCH-SECOND INTEGERS (floor(unix/width)
* width), never timestamps — integer arithmetic is bit-identical across
engines and immune to timezone/representation drift; callers render
timestamps at the edge if needed.

Scale shape: the measurement aggregation collapses map-side to (group,
bucket) rows; the dense grid is a per-group ``sequence`` explode whose size
is groups x buckets (the OUTPUT size — nothing bigger exists at any point);
interpolation is two window passes over that same grid partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_counts(
    df: DataFrame,
    *,
    by: str,
    ts_col: str,
    value_col: str | None = None,
    width_s: int = 900,
) -> DataFrame:
    """Dense fixed-width resampling with zero-filled gaps: one row per
    (group, bucket) for EVERY bucket between the group's first and last
    event — the regular grid downstream rolling/forecast code requires.

    Returns (``by``, bucket_epoch, n, total_value?) with n = 0 (and
    total_value NULL) for empty buckets."""
    b = (F.floor(F.unix_timestamp(F.col(ts_col)) / width_s) * width_s).cast("bigint")
    cols = [F.col(by), b.alias("_be")]
    aggs = [F.count("*").cast("bigint").alias("_n")]
    if value_col is not None:
        cols.append(F.col(value_col))
        aggs.append(F.round(F.sum(value_col), 6).alias("_tv"))
    hist = df.select(*cols).groupBy(by, "_be").agg(*aggs)
    grid = (
        hist.groupBy(by)
        .agg(F.min("_be").alias("_mn"), F.max("_be").alias("_mx"))
        .select(
            by,
            F.explode(
                F.sequence(F.col("_mn"), F.col("_mx"), F.lit(width_s))
            ).alias("_be"),
        )
    )
    out = grid.join(hist, [by, "_be"], "left").select(
        by,
        F.col("_be").alias("bucket_epoch"),
        F.coalesce("_n", F.lit(0)).cast("bigint").alias("n"),
        *([F.col("_tv").alias("total_value")] if value_col is not None else []),
    )
    return out


def interpolate_gaps(
    grid: DataFrame,
    *,
    by: str,
    bucket_col: str = "bucket_epoch",
    value_col: str = "total_value",
    round_dp: int = 6,
) -> DataFrame:
    """Linear interpolation over NULL cells of a dense grid (the standard
    sensor/metric in-fill): a missing value between two observed neighbors
    gets the time-weighted average; leading/trailing gaps clamp to the
    nearest observation.

    Two window passes over the (``by``) partitioning ordered by bucket:
    last-non-null before (value + its bucket) and first-non-null after.
    The interpolation weight is integer bucket arithmetic; the result is
    rounded to ``round_dp`` for engine parity.

    Adds ``filled`` (double) and ``was_gap`` (int)."""
    v = F.col(value_col)
    t = F.col(bucket_col).cast("double")
    wb = (
        Window.partitionBy(by)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(by)
        .orderBy(bucket_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    pv = F.last(v, ignorenulls=True).over(wb)
    pt = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(wb)
    nv = F.first(v, ignorenulls=True).over(wf)
    nt = F.first(F.when(v.isNotNull(), t), ignorenulls=True).over(wf)
    interp = F.when(v.isNotNull(), v).otherwise(
        F.when(pv.isNull(), nv)
        .when(nv.isNull(), pv)
        .otherwise(pv + (nv - pv) * (t - pt) / (nt - pt))
    )
    return grid.select(
        "*",
        F.round(interp, round_dp).alias("filled"),
        v.isNull().cast("int").alias("was_gap"),
    )


def sweep_peak_concurrency(
    intervals: DataFrame,
    *,
    start_col: str,
    end_col: str,
    bucket_col_fn=None,
) -> DataFrame:
    """Sweep-line peak concurrency over [start, end) intervals: how many are
    simultaneously open at each boundary date, rolled up to the per-bucket
    (e.g. monthly) peak and its earliest attainment date.

    Scale shape: the classic delta-collapse — intervals reduce map-side to
    per-date (+opens, -closes) deltas BEFORE any ordered scan, so the
    running-sum window orders the distinct-date table only (dates-sized,
    thousands of rows for years of data), never the fact table. The single-
    partition window over that tiny table is deliberate and bounded — the
    same shape as ``hist_quantiles``'s cumulative walk.

    Returns (bucket, peak_concurrent, peak_date) with
    bucket = ``bucket_col_fn(date)`` (default: month truncation).
    """
    from pyspark.sql import Window

    if bucket_col_fn is None:
        bucket_col_fn = lambda c: F.date_trunc("month", c).cast("date")  # noqa: E731
    opens = intervals.select(F.col(start_col).alias("d"), F.lit(1).alias("delta"))
    closes = intervals.select(F.col(end_col).alias("d"), F.lit(-1).alias("delta"))
    deltas = (
        opens.unionByName(closes)
        .groupBy("d")
        .agg(F.sum("delta").cast("bigint").alias("net"))
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = deltas.select("d", F.sum("net").over(w).alias("open_now"))
    bucketed = cum.select(bucket_col_fn(F.col("d")).alias("bucket"), "d", "open_now")
    peak = bucketed.groupBy("bucket").agg(F.max("open_now").alias("peak_concurrent"))
    first = (
        bucketed.join(peak, "bucket")
        .filter(F.col("open_now") == F.col("peak_concurrent"))
        .groupBy("bucket", "peak_concurrent")
        .agg(F.min("d").alias("peak_date"))
    )
    return first.select("bucket", "peak_concurrent", "peak_date")
