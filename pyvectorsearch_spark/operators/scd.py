"""Dimension-maintenance operators: Type-2 slowly-changing-dimension merge
(Kimball SCD2) — the warehouse-side companion the analytics queries assume
exists upstream (north-star extension; the reference has no mutation surface
beyond insert, `/root/reference/include/pktree.hpp:1262`).

Scale shape: one key-partitioned full-outer join between the OPEN slice of
the dimension and the incoming snapshot; closed history never joins
(filtered out before the shuffle and unioned back untouched). Change
detection is a null-safe column comparison compiled into the join output —
no hashing round-trips, no Python.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    key: str,
    tracked: list[str],
) -> DataFrame:
    """Change-data-capture between two table snapshots: one row per key
    that was added, removed, or changed (null-safe attribute comparison —
    the batch CDC primitive feeding incremental downstream refreshes).

    One key-partitioned full-outer join; unchanged keys drop out before any
    further processing. Returns (key, change_type, *old_/new_ tracked
    columns)."""
    o = old.select(
        F.col(key).alias("_k"),
        *[F.col(c).alias(f"_o_{c}") for c in tracked],
        F.lit(True).alias("_in_o"),
    )
    n = new.select(
        F.col(key).alias("_k"),
        *[F.col(c).alias(f"_n_{c}") for c in tracked],
        F.lit(True).alias("_in_n"),
    )
    j = o.join(n, "_k", "full")
    same = reduce(
        lambda a, b: a & b,
        [F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")) for c in tracked],
        F.lit(True),
    )
    in_o = F.coalesce(F.col("_in_o"), F.lit(False))
    in_n = F.coalesce(F.col("_in_n"), F.lit(False))
    change = (
        F.when(in_o & ~in_n, F.lit("removed"))
        .when(~in_o & in_n, F.lit("added"))
        .when(~same, F.lit("changed"))
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            F.col("_k").alias(key),
            "change_type",
            *[F.col(f"_o_{c}").alias(f"old_{c}") for c in tracked],
            *[F.col(f"_n_{c}").alias(f"new_{c}") for c in tracked],
        )
    )


def scd2_merge(
    current: DataFrame,
    snapshot: DataFrame,
    *,
    key: str,
    tracked: list[str],
    batch_ts: int,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Merge a full ``snapshot`` (key + tracked attributes, observed at
    integer time ``batch_ts``) into an SCD2 ``current`` table
    (key + tracked + [valid_from, valid_to]; ``valid_to`` NULL = open row).

    Semantics (standard Kimball Type 2):
    - unchanged open rows stay open;
    - changed keys: the open row closes at ``batch_ts`` and a new open row
      with the snapshot attributes begins at ``batch_ts``;
    - brand-new keys insert an open row at ``batch_ts``;
    - keys absent from the snapshot are deletions: the open row closes;
    - already-closed history rows pass through untouched (and never enter
      the join).

    Times are integers (engine-exact). Returns the new SCD2 table.
    """
    open_rows = current.filter(F.col(to_col).isNull())
    closed_rows = current.filter(F.col(to_col).isNotNull())
    cur = open_rows.select(
        F.col(key).alias("_k"),
        *[F.col(c).alias(f"_c_{c}") for c in tracked],
        F.col(from_col).cast("bigint").alias("_vf"),
    )
    new = snapshot.select(
        F.col(key).alias("_k"), *[F.col(c).alias(f"_n_{c}") for c in tracked]
    )
    # presence markers rather than attribute-null checks, so nullable
    # tracked columns cannot fake an absent side
    cur_m = cur.withColumn("_in_cur", F.lit(True))
    new_m = new.withColumn("_in_new", F.lit(True))
    j = cur_m.join(new_m, "_k", "full")
    same: Column = reduce(
        lambda a, b: a & b,
        [F.col(f"_c_{c}").eqNullSafe(F.col(f"_n_{c}")) for c in tracked],
        F.lit(True),
    )
    in_cur = F.coalesce(F.col("_in_cur"), F.lit(False))
    in_new = F.coalesce(F.col("_in_new"), F.lit(False))

    unchanged = j.filter(in_cur & in_new & same).select(
        F.col("_k").alias(key),
        *[F.col(f"_c_{c}").alias(c) for c in tracked],
        F.col("_vf").alias(from_col),
        F.lit(None).cast("bigint").alias(to_col),
    )
    closed_changed = j.filter(in_cur & ((in_new & ~same) | ~in_new)).select(
        F.col("_k").alias(key),
        *[F.col(f"_c_{c}").alias(c) for c in tracked],
        F.col("_vf").alias(from_col),
        F.lit(batch_ts).cast("bigint").alias(to_col),
    )
    opened = j.filter(in_new & (~in_cur | ~same)).select(
        F.col("_k").alias(key),
        *[F.col(f"_n_{c}").alias(c) for c in tracked],
        F.lit(batch_ts).cast("bigint").alias(from_col),
        F.lit(None).cast("bigint").alias(to_col),
    )
    passthrough = closed_rows.select(
        key,
        *tracked,
        F.col(from_col).cast("bigint").alias(from_col),
        F.col(to_col).cast("bigint").alias(to_col),
    )
    return (
        passthrough.unionByName(unchanged)
        .unionByName(closed_changed)
        .unionByName(opened)
    )
