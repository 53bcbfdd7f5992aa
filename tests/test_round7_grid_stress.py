"""Round-7: grid-build stress at >= 1e5 cells (VERDICT r6 ask #4).

Deep indexes at 100 TB mean fine-cell tables far beyond the driver: this
pins that (a) the auto strategy probe engages the DISTRIBUTED coalesce
cascade when the cell table overflows the driver bound, (b) the build
never collects more than that bound, (c) the K-instantiation occupancy
invariant (count >= rank or root) holds over ~1e5 instantiated cells,
and (d) kNN and range search over the result stay brute-force-exact.
Data is generated distributed-side (pure column expressions of
spark.range) — no driver-side point list ever exists.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from pyvectorsearch_spark.index.grid import GridIndex
from pyvectorsearch_spark.operators.knn import knn_join, range_join

import pytest
pytestmark = pytest.mark.slow  # soak/property tier: excluded from the default (driver-visible) run, see pytest.ini (r11)

N = 300_000          # 100k clusters x 3 points
GRID = 320           # 320x320 = 102_400 cluster centers on [0, 8000)^2
LIMIT = 20_000       # driver bound far below the ~1e5 fine cells


def _clustered(spark):
    """3 points per lattice center, jitter << fine cell width, built from
    spark.range — fully distributed, deterministic."""
    base = spark.range(N).select(
        F.col("id").alias("vec_id"),
        (F.col("id") / 3).cast("long").alias("_c"),
        (F.col("id") % 3).cast("double").alias("_j"),
    )
    cx = (F.col("_c") % GRID).cast("double") * 25.0
    cy = ((F.col("_c") / GRID).cast("long") % GRID).cast("double") * 25.0
    # jitter 1e-4 spread: triplets stay inside one fine cell almost always;
    # stragglers exercise the dissolve cascade instead of breaking it
    return base.select(
        "vec_id",
        F.array(cx + F.col("_j") * 1e-4, cy + F.col("_j") * 1e-4).alias(
            "embedding"
        ),
    )


def test_grid_build_1e5_cells_distributed(spark):
    pts = _clustered(spark)
    idx = GridIndex.build(
        pts, dim=2, target_occupancy=1, driver_cell_limit=LIMIT
    )
    # (a) the distributed path engaged: the driver build path would have
    # populated _local_stats from its collected cell list; the distributed
    # constructor leaves it None (nothing was collected)
    assert idx._local_stats is None
    # (c) ~1e5 instantiated cells, occupancy invariant holds everywhere
    agg = idx.stats_df.agg(
        F.count("*").alias("n_cells"),
        F.sum(
            ((F.col("count") < idx.rank) & (F.col("level") > 0)).cast("long")
        ).alias("n_underfull"),
        F.sum("count").alias("n_points"),
    ).first()
    assert agg["n_cells"] >= 90_000, agg
    assert agg["n_underfull"] == 0
    assert agg["n_points"] == N

    # (d) search exactness against brute force, distributed candidates
    qs = spark.createDataFrame(
        [
            (0, [0.0, 0.0]),
            (1, [4000.0, 4000.0]),
            (2, [25.0, 50.0]),
            (3, [7975.0, 7975.0]),
            (4, [1234.5, 6789.0]),
        ],
        "query_id long, qvec array<double>",
    )
    got_knn = sorted(
        (r.query_id, r.neighbor_id, round(r.dist, 9), r.rank)
        for r in idx.knn(qs, 5, candidates="distributed").collect()
    )
    want_knn = sorted(
        (r.query_id, r.neighbor_id, round(r.dist, 9), r.rank)
        for r in knn_join(pts, qs, 5).collect()
    )
    assert got_knn == want_knn

    got_rng = sorted(
        (r.query_id, r.neighbor_id, round(r.dist, 9))
        for r in idx.range(qs, 30.0, candidates="distributed").collect()
    )
    want_rng = sorted(
        (r.query_id, r.neighbor_id, round(r.dist, 9))
        for r in range_join(pts, qs, 30.0).collect()
    )
    assert got_rng == want_rng and len(want_rng) > 0


def test_auto_probe_collects_at_most_the_bound(spark):
    """(b) the strategy probe is the ONLY collect in the auto build, and it
    is limit()-bounded: pin by building with a tiny bound and checking the
    dispatch flips (driver path when under, distributed when over)."""
    pts = _clustered(spark).limit(3000)  # ~1000 fine cells
    small = GridIndex.build(pts, dim=2, target_occupancy=1, driver_cell_limit=200_000)
    assert small._local_stats is not None  # under the bound -> driver path
    big = GridIndex.build(pts, dim=2, target_occupancy=1, driver_cell_limit=100)
    assert big._local_stats is None  # over the bound -> distributed path
    # both paths index every point and agree on search
    qs = spark.createDataFrame([(0, [30.0, 10.0])], "query_id long, qvec array<double>")
    a = sorted(
        (r.neighbor_id, r.rank)
        for r in small.knn(qs, 4, candidates="distributed").collect()
    )
    b = sorted(
        (r.neighbor_id, r.rank)
        for r in big.knn(qs, 4, candidates="distributed").collect()
    )
    assert a == b
