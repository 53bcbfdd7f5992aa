"""Incremental aggregate maintenance: merge a pre-computed base rollup with
a delta's rollup instead of rescanning the base facts.

The 100 TB pattern this encodes: a stored rollup (groups-sized, cheap to
keep) plus yesterday's delta partition produce today's rollup with ONE scan
of the delta — the base fact table is never touched. Works for any
re-aggregable measure (sum/count via addition, min/max via least/greatest);
avg is sum/count composed by the caller. The companion of the snapshot-diff
CDC operator (`queries/scd_extra.py::snapshot_diff_stats`), which derives
the delta when the source cannot provide one.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_rollups(
    base: DataFrame,
    delta: DataFrame,
    *,
    keys: Iterable[str],
    add_cols: Iterable[str] = (),
    min_cols: Iterable[str] = (),
    max_cols: Iterable[str] = (),
) -> DataFrame:
    """Combine two rollups with identical schemas into one: full-outer join
    on ``keys`` (groups-sized on both sides — this never touches facts),
    additive measures add with null→0, min/max take least/greatest with
    null-skip via coalesce."""
    keys = list(keys)
    b = base.select(*keys, *add_cols, *min_cols, *max_cols)
    d = delta.select(*keys, *add_cols, *min_cols, *max_cols)
    bb, dd = b.alias("b"), d.alias("d")
    joined = bb.join(dd, keys, "full_outer")
    out = [F.coalesce(*[F.col(f"{s}.{k}") for s in ("b", "d")]).alias(k) for k in keys]
    for c in add_cols:
        out.append(
            (
                F.coalesce(F.col(f"b.{c}"), F.lit(0))
                + F.coalesce(F.col(f"d.{c}"), F.lit(0))
            ).alias(c)
        )
    for c in min_cols:
        out.append(
            F.least(
                F.coalesce(F.col(f"b.{c}"), F.col(f"d.{c}")),
                F.coalesce(F.col(f"d.{c}"), F.col(f"b.{c}")),
            ).alias(c)
        )
    for c in max_cols:
        out.append(
            F.greatest(
                F.coalesce(F.col(f"b.{c}"), F.col(f"d.{c}")),
                F.coalesce(F.col(f"d.{c}"), F.col(f"b.{c}")),
            ).alias(c)
        )
    return joined.select(*out)


def delta_join_counts(
    a_base: DataFrame,
    a_delta: DataFrame,
    b_base: DataFrame,
    b_delta: DataFrame,
    *,
    key: str,
    group_cols: Iterable[str],
    agg_col: str,
) -> DataFrame:
    """Incremental JOIN-VIEW maintenance — the bilinearity identity behind
    differential/streaming join engines: for a view V = A ⋈ B,

        ΔV = ΔA ⋈ B₀  ∪  A₀ ⋈ ΔB  ∪  ΔA ⋈ ΔB

    so the refreshed rollup is base-view ⊎ rollup(ΔV) and the FULL A ⋈ B
    is never recomputed. This operator materializes the three delta terms,
    aggregates each (map-side combined), and merges with the stored
    base-view rollup via ``merge_rollups`` — base FACTS are touched only by
    the two cross terms keyed against the (small) deltas, and the merge
    itself joins groups-sized tables.

    Returns the refreshed rollup: ``group_cols`` + (n_pairs, sum_val) —
    provably equal to rolling up (A₀∪ΔA) ⋈ (B₀∪ΔB) from scratch, which is
    exactly what the oracle computes.
    """
    gcols = list(group_cols)

    def roll(j: DataFrame) -> DataFrame:
        return j.groupBy(*gcols).agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum(agg_col).alias("sum_val"),
        )

    base_view = roll(a_base.join(b_base, key))
    d1 = roll(a_delta.join(b_base, key))
    d2 = roll(a_base.join(b_delta, key))
    d3 = roll(a_delta.join(b_delta, key))
    out = base_view
    for d in (d1, d2, d3):
        out = merge_rollups(out, d, keys=gcols, add_cols=("n_pairs", "sum_val"))
    return out
