"""Density-based clustering (DBSCAN) composed from the engine's own
primitives — the spatial ε-join (``operators/spatial.py``) supplies the
neighborhood graph and min-label propagation (``operators/graph.py``)
supplies the connectivity, so the classic algorithm (Ester et al., KDD'96)
falls out of two operators that already have 100 TB shapes.

Determinism: every step is set-algebra over exact integer/threshold
predicates (neighbor counts, core tests, min-label components, min-cluster
border attachment) — no seeds, no iteration-order sensitivity — so the full
labeling is engine-exact and a recursive-CTE oracle can replay it.

Scale shape: one grid-bin ε-join (each side shuffles once, 3^d replication
on one side), one neighbor-count aggregate (pairs → per-point counts,
map-side combined), connected components over CORE-CORE edges only (the
near-dup CC loop, checkpointed per round), and one join attaching border
points to their minimum adjacent core cluster. Nothing is collected; the
densest cell is the skew hazard exactly as in the ε-join itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dbscan(
    df: DataFrame,
    *,
    eps: float,
    min_pts: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """DBSCAN labels for every point: ``(id_col, role, cluster)`` with role
    ``core`` / ``border`` / ``noise``.

    - core: ≥ ``min_pts`` points within ``eps`` (count INCLUDES the point
      itself — the classic formulation);
    - cluster id: minimum core-point id reachable through core-core ε-links
      (single-linkage over cores — deterministic, order-free);
    - border: non-core within ``eps`` of ≥ 1 core; attaches to the MINIMUM
      adjacent core cluster (the deterministic tie-break for the
      border-of-two-clusters ambiguity the original paper leaves open);
    - noise: everything else (cluster NULL).
    """
    from pyvectorsearch_spark.operators.graph import connected_components
    from pyvectorsearch_spark.operators.spatial import radius_self_join

    pairs = radius_self_join(
        df, radius=eps, dim=dim, id_col=id_col, vec_col=vec_col
    ).select("d1", "d2")
    und = pairs.union(pairs.select(F.col("d2"), F.col("d1"))).toDF("p", "q")
    deg = und.groupBy("p").agg(F.count("*").alias("_deg"))
    ids = df.select(F.col(id_col).alias("p"))
    counts = ids.join(deg, "p", "left").select(
        "p", (F.coalesce("_deg", F.lit(0)) + 1).alias("n_eps")
    )
    core = counts.filter(F.col("n_eps") >= min_pts).select("p")

    core_edges = (
        pairs.join(core.withColumnRenamed("p", "d1"), "d1", "left_semi")
        .join(core.withColumnRenamed("p", "d2"), "d2", "left_semi")
    )
    comp = connected_components(core_edges)  # (node, cluster) — paired cores only
    # isolated cores (no core neighbor) form singleton clusters of themselves
    core_lbl = (
        core.join(comp, core["p"] == comp["node"], "left")
        .select("p", F.coalesce("cluster", F.col("p")).alias("cluster"))
    )

    border_lbl = (
        und.join(core_lbl.withColumnRenamed("p", "q"), "q")
        .join(core, "p", "left_anti")
        .groupBy("p")
        .agg(F.min("cluster").alias("cluster"))
    )

    out_core = core_lbl.select("p", F.lit("core").alias("role"), "cluster")
    out_border = border_lbl.select("p", F.lit("border").alias("role"), "cluster")
    labeled = out_core.unionByName(out_border)
    out_noise = ids.join(labeled.select("p"), "p", "left_anti").select(
        "p", F.lit("noise").alias("role"), F.lit(None).cast("long").alias("cluster")
    )
    return labeled.unionByName(out_noise).select(
        F.col("p").alias(id_col), "role", "cluster"
    )
