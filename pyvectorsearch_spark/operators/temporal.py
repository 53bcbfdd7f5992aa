"""Temporal joins the reference lacks and Spark has no built-in for:
as-of join (each left row ↔ the latest right row at-or-before it, per key).

Scale design: NO range/nested-loop join. Both sides are tagged and unioned,
then one window per key ordered by (ts, side) carries the most recent right
row forward (``last(..., ignorenulls=True)``) onto every left row — a single
shuffle on the key, map-side combinable, AQE-skew-splittable. This is the
classic log-enrichment shape (trades join for union+window) and holds at any
scale where a window on (key, time) holds — i.e. the same envelope as
sessionization.

DuckDB's native ``ASOF JOIN`` is the oracle, so semantics are pinned to an
independent implementation.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "ts",
    by: str | None = None,
    right_cols: Iterable[str] = (),
    direction: str = "backward",
    suffix: str = "_right",
    strict: bool = False,
    tolerance_s: float | None = None,
    allow_single_partition: bool = False,
) -> DataFrame:
    """For every left row, attach ``right_cols`` from the single right row
    with the greatest ``on`` ≤ left.``on`` (direction="backward"; "forward"
    = smallest ≥), matching within ``by`` groups. Unmatched left rows keep
    NULLs — left-join semantics, like DuckDB ``ASOF LEFT JOIN``.

    ``strict=True`` uses < instead of ≤ (excludes simultaneous rows).

    ``tolerance_s`` (pandas ``merge_asof``-style): a match farther than this
    many seconds from the left row reverts to NULL — the attach itself is
    unchanged (same single window pass); tolerance is a post-projection.

    ``by`` is REQUIRED for scale: without it the carry-forward window has no
    partition key, so Spark funnels both tables through ONE task — a driver
    for a 100 TB join to stall on. A keyless as-of over a small reference
    table (calibration curves, rate tables) is legitimate; opt in explicitly
    with ``allow_single_partition=True``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if by is None and not allow_single_partition:
        raise ValueError(
            "asof_join without `by` runs the whole join in a single task "
            "(keyless global window); pass by=<key> or, for deliberately "
            "small inputs, allow_single_partition=True"
        )
    right_cols = list(right_cols) or [
        c for c in right.columns if c not in {on, by}
    ]

    ron_type = dict(right.dtypes)[on]
    l_tag = left.withColumn("_side", F.lit(1)).select(
        *left.columns,
        "_side",
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"{c}{suffix}") for c in right_cols],
        F.lit(None).cast(ron_type).alias("_asof_ron"),
    )
    r_tag = right.select(
        *[
            F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c)
            if c not in ([by] if by else []) + [on]
            else F.col(c)
            for c in left.columns
        ],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        F.col(on).alias("_asof_ron"),
    )
    u = l_tag.unionByName(r_tag)

    # Order so the candidate right row sorts before the left row it serves:
    # backward+≤ : right first at equal ts (side 0 < 1) → window ends at
    # current row. strict (<) : left first at equal ts.
    side_order = F.col("_side").asc() if not strict else F.col("_side").desc()
    if direction == "backward":
        w = Window.orderBy(F.col(on).asc(), side_order)
    else:
        w = Window.orderBy(F.col(on).desc(), side_order)
    if by is not None:
        w = w.partitionBy(by)
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    carried = u.select(
        *left.columns,
        "_side",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_cols
        ],
        F.last("_asof_ron", ignorenulls=True).over(w).alias("_asof_ron"),
    )
    out = carried.filter(F.col("_side") == 1).drop("_side")
    if tolerance_s is not None:
        # distance of the matched right row; a stale/far match reverts to NULL
        dist = F.abs(
            F.col(on).cast("double") - F.col("_asof_ron").cast("double")
        )
        ok = F.col("_asof_ron").isNotNull() & (dist <= F.lit(float(tolerance_s)))
        out = out.select(
            *left.columns,
            *[
                F.when(ok, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}")
                for c in right_cols
            ],
        )
    return out.drop("_asof_ron")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str = "ts",
    start: str = "start",
    end: str = "end",
    bucket_seconds: float = 604800.0,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join: every (point, interval) pair with
    ``start <= point_ts <= end`` (bounds inclusive) — WITHOUT a nested-loop
    or broadcast-range join.

    Scale design: both sides are mapped onto fixed-width time buckets —
    points to one bucket, intervals exploded across every bucket they
    overlap — then equi-joined on the bucket and filtered by the exact
    predicate. Shuffle is hash-partitioned on bucket (ordinary exchange, AQE
    skew-splittable); cost is |points| + Σ_interval ceil(len/bucket)+1 join
    rows instead of |points| × |intervals|. Choose ``bucket_seconds`` near
    the typical interval length: wider buckets explode intervals less but
    put more points per bucket.

    The bucket seam is exact: a point and interval land in a shared bucket
    iff the interval overlaps the point's bucket, which interval-covering
    guarantees; the residual predicate removes same-bucket non-matches.
    """
    w = F.lit(float(bucket_seconds))

    def _epoch(c: str):
        # NTZ timestamps reject a direct double cast; route through LTZ
        # (session TZ) — only bucket arithmetic uses it, the exact predicate
        # compares the original columns
        return F.col(c).cast("timestamp_ltz").cast("double")

    p = points.withColumn("_bucket", F.floor(_epoch(point_ts) / w).cast("long"))
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(_epoch(start) / w).cast("long"),
                F.floor(_epoch(end) / w).cast("long"),
            )
        ),
    )
    cond = (
        (p["_bucket"] == iv["_bucket"])
        & (p[point_ts] >= iv[start])
        & (p[point_ts] <= iv[end])
    )
    return p.join(iv, cond, how).drop("_bucket")
