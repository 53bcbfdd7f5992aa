#!/usr/bin/env python
"""Round-8: grid capacity row at ~1e6 instantiated cells (VERDICT r7 #3).

Round 7 proved the build + search at ~1e5 cells; this is the next decade:
a 1000x1000 lattice (one point per fine cell, occupancy 1) forces ~1e6
cells through the DISTRIBUTED coalesce cascade, then runs the descent-
ladder kNN in auto mode (which must pick distributed candidates — the
stats table is 5x past the driver bound) and checks exactness against a
blocked brute force on a probe sample.

Measures: build wall, cells, ladder shape, level-hist cost, search wall
for |Q| probes, exactness. One JSON line to stdout.

Usage: PYTHONPATH=/root/repo python tools/stress_grid_1e6.py \
    [n_probes] [grid] [pts_per_center]

With pts_per_center=1 the dissolve cascade coalesces the lattice ~4:1
(every fine cell is under rank); pts_per_center=rank (3) makes each
center self-sufficient, so instantiated cells ≈ grid² — use grid=1024
ppc=3 for the true 1e6-cell row.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    n_probes = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    grid = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    ppc = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyvectorsearch_spark.index.grid import GridIndex
    from pyvectorsearch_spark.operators.knn import knn_join_blocked

    GRID = grid  # grid² lattice centers at spacing 8 on [0, 8·GRID)^2
    pts = spark.range(GRID * GRID * ppc).select(
        F.col("id").alias("vec_id"),
        (F.col("id") / ppc).cast("long").alias("_c"),
        (F.col("id") % ppc).cast("double").alias("_j"),
    ).select(
        "vec_id",
        F.array(
            (F.col("_c") % GRID).cast("double") * 8.0 + F.col("_j") * 1e-4,
            (F.col("_c") / GRID).cast("long").cast("double") * 8.0
            + F.col("_j") * 1e-4,
        ).alias("embedding"),
    )

    t0 = time.time()
    idx = GridIndex.build(
        pts, dim=2, target_occupancy=1, driver_cell_limit=200_000
    )
    agg = idx.stats_df.agg(
        F.count("*").alias("n_cells"),
        F.sum(
            ((F.col("count") < idx.rank) & (F.col("level") > 0)).cast("long")
        ).alias("n_underfull"),
        F.sum("count").alias("n_points"),
    ).first()
    build_wall = time.time() - t0

    t1 = time.time()
    hist = idx._level_hist()
    hist_wall = time.time() - t1
    ladder = idx._descent_ladder()

    # probes: distributed-generated shifted lattice points (never collected)
    qs = spark.range(n_probes).select(
        F.col("id").alias("query_id"),
        F.array(
            ((F.col("id") * 37) % GRID).cast("double") * 8.0 + 3.0,
            ((F.col("id") * 101) % GRID).cast("double") * 8.0 + 2.0,
        ).alias("qvec"),
    )
    t2 = time.time()
    got = idx.knn(qs, 5, candidates="auto").collect()
    search_wall = time.time() - t2

    exp = knn_join_blocked(pts, qs, 5).collect()
    key = lambda rows: sorted(  # noqa: E731
        (r.query_id, r.neighbor_id, round(r.dist, 9), r.rank) for r in rows
    )
    print(json.dumps({
        "n_points": int(agg["n_points"]),
        "n_cells": int(agg["n_cells"]),
        "n_underfull": int(agg["n_underfull"]),
        "build_sec": round(build_wall, 1),
        "level_hist_sec": round(hist_wall, 2),
        "levels": {str(k): v for k, v in sorted(hist.items())},
        "descent_ladder": ladder,
        "n_probes": n_probes,
        "knn_auto_sec": round(search_wall, 1),
        "driver_stats_collected": idx._local_stats is not None,
        "exact_vs_bruteforce": key(got) == key(exp),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
