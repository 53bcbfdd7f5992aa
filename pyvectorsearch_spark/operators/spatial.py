"""Spatial ε-distance joins — the reference's range search generalized to a
table×table join.

The reference answers one ε-range probe at a time (``search_range``,
``/root/reference/include/pktree.hpp:933-939``; the example loops probes,
``example_cpp/main.cpp:68-85``). A pipeline-scale engine needs the JOIN form:
"every pair (a, b) within distance ε" between two point sets (or within one)
— spatial self-joins power geo dedup, trajectory contact tracing, and the
2-d/low-d analog of embedding near-dup mining.

Physical strategy — grid-bin bucketing (the classic ε-join; same geometry
family as the PK-tree's grid, but one fixed level whose cell width ≥ ε):

1. every point gets an integer HOME cell ``floor(x_i / w)`` per axis, with
   ``w = ε · 1.001`` (the 0.1% slack absorbs FP division rounding at the
   ``|Δx| = ε`` boundary, so a qualifying pair can never straddle two
   non-adjacent cells);
2. the RIGHT side is replicated to its home cell plus all 3^d − 1 neighbor
   cells; the LEFT side stays in its home cell only — any pair within ε has
   per-axis cell offsets in {−1, 0, +1}, so it meets in the left point's
   home cell EXACTLY ONCE (no post-join dedup);
3. one equi-join on the cell key, then the exact predicate
   ``l2_sq(a, b) ≤ ε²`` with the fixed-fold distance expression — identical
   accumulation order in Spark and DuckDB, so the join is engine-exact and
   fully oracle-checkable (bucketing is physical pruning only, never
   semantic; same contract as GridIndex searches).

Scale shape: each side shuffles once on the cell key; replication is 3^d on
one side only (9× at d=2 — constant, not data-dependent). Dense cells are
the skew hazard exactly as hot grid cells are for the index; AQE skew-join
splits them. No broadcast, no collect, no windows — works at any corpus
size on both sides.
"""

from __future__ import annotations

from itertools import product

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyvectorsearch_spark.functions.vector import l2_sq

CELL_SLACK = 1.001  # cell width = radius * CELL_SLACK (see module docstring)


def _cell_key(vec: Column, dim: int, cell_w: float, offsets: tuple[int, ...]) -> Column:
    """String cell key "c0|c1|..." for the point's home cell shifted by
    ``offsets`` (one integer per axis)."""
    parts = [
        (
            F.floor(F.element_at(vec, i + 1).cast("double") / F.lit(cell_w))
            + F.lit(offsets[i])
        ).cast("string")
        for i in range(dim)
    ]
    return F.concat_ws("|", *parts)


def radius_join(
    left: DataFrame,
    right: DataFrame,
    *,
    radius: float,
    dim: int,
    left_id: str = "l_id",
    left_vec: str = "l_vec",
    right_id: str = "r_id",
    right_vec: str = "r_vec",
) -> DataFrame:
    """All (left, right) pairs with L2 distance ≤ ``radius`` (inclusive,
    matching the reference's ``dist ≤ range²`` predicate,
    ``pktree.hpp:1116-1123``). Returns
    ``(left_id, right_id, dist2)`` with ``dist2`` the exact squared distance.

    ``dim`` is the vector length (replication factor is 3^dim — intended for
    low-d spatial data, the reference's domain; for high-d embeddings use
    the angular bucketing in ``operators.dedup`` instead)."""
    if radius <= 0:
        raise ValueError(f"radius must be > 0, got {radius}")
    if dim < 1 or 3**dim > 768:
        raise ValueError(
            f"radius_join replicates 3^dim; dim={dim} is out of the low-d "
            "regime this operator is for (use angular bucketing for high-d)"
        )
    cell_w = float(radius) * CELL_SLACK
    l = left.select(
        F.col(left_id).alias("_lid"),
        F.col(left_vec).alias("_lv"),
        _cell_key(F.col(left_vec), dim, cell_w, (0,) * dim).alias("_cell"),
    )
    offs = list(product((-1, 0, 1), repeat=dim))
    r = right.select(
        F.col(right_id).alias("_rid"),
        F.col(right_vec).alias("_rv"),
        F.explode(
            F.array(
                *[_cell_key(F.col(right_vec), dim, cell_w, o) for o in offs]
            )
        ).alias("_cell"),
    )
    d2 = l2_sq(F.col("_lv"), F.col("_rv"))
    return (
        l.join(r, "_cell")
        .withColumn("dist2", d2)
        .filter(F.col("dist2") <= F.lit(float(radius) * float(radius)))
        .select(
            F.col("_lid").alias(left_id),
            F.col("_rid").alias(right_id),
            "dist2",
        )
    )


def radius_self_join(
    df: DataFrame,
    *,
    radius: float,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All unordered point pairs within ``radius`` of each other:
    ``(d1, d2, dist2)`` with d1 < d2. One grid-bin join of the table against
    itself; the ``d1 < d2`` filter keeps each pair once (each unordered pair
    meets twice — once per orientation — in the underlying join)."""
    right = df.select(
        F.col(id_col).alias("_rsj_id"), F.col(vec_col).alias("_rsj_v")
    )
    out = radius_join(
        df,
        right,
        radius=radius,
        dim=dim,
        left_id=id_col,
        left_vec=vec_col,
        right_id="_rsj_id",
        right_vec="_rsj_v",
    )
    return out.filter(F.col(id_col) < F.col("_rsj_id")).select(
        F.col(id_col).alias("d1"),
        F.col("_rsj_id").alias("d2"),
        "dist2",
    )
