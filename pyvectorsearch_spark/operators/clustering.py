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
from pyvectorsearch_spark.functions.lits import lit_long_array


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

    # one eager checkpoint: the ε-join is the only expensive intermediate
    # and it feeds FOUR legs (degree census, core semi-joins, border
    # attach, components) — left lazy it re-evaluated per leg (r10
    # optimization round: 12.1 → 10.3 s at sf0.01 from the checkpoint
    # alone, then 10.3 → ~2 s from the driver union-find below: the
    # core-core ε-graph is chain-like, so min-label stalled through all 8
    # rounds and REstarted in two-star; census-bounded union-find answers
    # a ≤64k-edge graph in milliseconds, and bigger graphs keep the
    # distributed two-star path)
    pairs = radius_self_join(
        df, radius=eps, dim=dim, id_col=id_col, vec_col=vec_col
    ).select("d1", "d2").localCheckpoint(eager=True)
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
    # (node, cluster) — paired cores only; ≤64k-edge graphs take the
    # census-bounded driver union-find (see the checkpoint comment above)
    comp = connected_components(core_edges, driver_max_edges=65_536)
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


# ---------------------------------------------------------------------------
# Fixed-round Lloyd k-means over integer-quantized vectors — the canonical
# curation clustering (cluster-balanced sampling, semantic sharding,
# SemDeDup's first stage). Determinism ladder: (1) vectors quantize to
# integer milli-units up front, so every distance is an EXACT bigint;
# (2) argmin ties break on the smaller centroid id; (3) centroid updates
# round half-up via pure integer arithmetic ((2S'+N) div (2N) on an
# offset-shifted positive numerator), so every round is a bit-exact function
# of the previous one in any engine — the oracle replays identical rounds as
# CTE layers (the power-iteration-PCA pattern).
#
# Scale shape: per round, ONE zero-shuffle assignment pass (distances
# against k*dim literal centroids inside the scan stage) and one
# map-side-combined groupBy to k*dim sum cells; only those k*dim integers
# reach the driver (constant footprint, the IVF-centroid pattern — at
# k*dim beyond driver comfort, swap the collect for a broadcast-joined
# centroid table without touching the round structure).
# ---------------------------------------------------------------------------

KM_SCALE = 1000  # milli-unit quantization
KM_OFFSET = 100_000  # shifts update numerators positive (|q| << OFFSET)


def _km_quantize(vec_col: str) -> F.Column:
    return F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * KM_SCALE, 0).cast("bigint"),
    )


def _km_assign(
    base: DataFrame, cents: list[list[int]], *, keep_distances: bool = False
) -> DataFrame:
    """Append (_c, _d2): nearest centroid id and its exact integer squared
    distance. Centroids are literals — the pass is a scan-stage projection.
    ``keep_distances`` also keeps every per-centroid ``_d2_{ci}`` column
    (silhouette needs the second-nearest; recomputing them would double the
    k×dim scan-stage arithmetic)."""
    d2s = []
    for ci, cv in enumerate(cents):
        arr = lit_long_array(cv)
        d2s.append(
            F.aggregate(
                F.zip_with(F.col("_q"), arr, lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("bigint"),
                lambda a, v: a + v,
            ).alias(f"_d2_{ci}")
        )
    withd = base.select("*", *d2s)
    best = F.least(*[F.col(f"_d2_{ci}") for ci in range(len(cents))])
    c = F.lit(None).cast("int")
    # first centroid achieving the min wins (ids ascend) — build the CASE
    # from the last id backwards so earlier WHENs take precedence
    for ci in reversed(range(len(cents))):
        c = F.when(F.col(f"_d2_{ci}") == best, F.lit(ci)).otherwise(c)
    keep = [f"_d2_{ci}" for ci in range(len(cents))] if keep_distances else []
    return withd.select(
        "_id", "_q", c.alias("_c"), best.alias("_d2"), *keep
    )


def _km_train(base: DataFrame, k: int, rounds: int) -> list[list[int]]:
    """Run the Lloyd rounds, returning the final centroids (k x dim ints).
    Each round collects only the k*dim sum cells (constant footprint)."""
    init = base.orderBy("_id").limit(k).collect()
    if not init:
        raise ValueError("kmeans: input has no rows (cannot seed centroids)")
    cents = [list(r["_q"]) for r in init]
    dim = len(cents[0])
    for _ in range(rounds):
        assigned = _km_assign(base, cents)
        sums = (
            assigned.select("_c", F.posexplode("_q").alias("_d", "_v"))
            .groupBy("_c", "_d")
            .agg(
                F.sum("_v").cast("bigint").alias("_s"),
                F.count("*").cast("bigint").alias("_n"),
            )
            .collect()
        )
        cell = {(r["_c"], r["_d"]): (r["_s"], r["_n"]) for r in sums}
        new_cents = []
        for ci in range(k):
            cv = []
            for d in range(dim):
                if (ci, d) in cell:
                    s, n = cell[(ci, d)]
                    sp = s + n * KM_OFFSET  # positive numerator
                    cv.append((2 * sp + n) // (2 * n) - KM_OFFSET)
                else:  # empty cluster: keep previous centroid
                    cv.append(cents[ci][d])
            new_cents.append(cv)
        cents = new_cents
    return cents


def kmeans_assign(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int = 8,
    rounds: int = 2,
    _internal: bool = False,
) -> DataFrame:
    """Per-point cluster labels from the same fixed-round Lloyd training as
    ``kmeans_fixed``: returns (``_id``, ``_q``, ``_c``, ``_d2``) when
    ``_internal`` (for the rollup) else (``id_col``, cluster, d2) — the
    assignment surface cluster-balanced sampling / semantic sharding builds
    on. The final labeling pass is a zero-shuffle projection against k*dim
    literal centroids."""
    base = df.select(
        F.col(id_col).alias("_id"), _km_quantize(vec_col).alias("_q")
    )
    cents = _km_train(base, k, rounds)
    final = _km_assign(base, cents)
    if _internal:
        return final
    return final.select(
        F.col("_id").alias(id_col),
        F.col("_c").alias("cluster"),
        F.col("_d2").alias("d2"),
    )


def kmeans_fixed(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int = 8,
    rounds: int = 2,
) -> DataFrame:
    """Fixed-``rounds`` Lloyd k-means, engine-exact end to end.

    Init: the quantized vectors of the ``k`` smallest ids. Each round:
    exact-integer argmin assignment, then integer round-half-up centroid
    means (empty clusters keep their previous centroid). After the last
    update a final assignment labels every point.

    Returns one row per cluster: (cluster, n_members, inertia,
    members_xor) — ``inertia`` the exact bigint sum of squared quantized
    distances, ``members_xor`` the order-independent 52-bit-md5 XOR of the
    member ids (pins the exact partition, the ``audit_checksums`` trick).
    """
    final = kmeans_assign(
        df, id_col=id_col, vec_col=vec_col, k=k, rounds=rounds, _internal=True
    )
    h = F.conv(F.substring(F.md5(F.col("_id").cast("string")), 1, 13), 16, 10).cast(
        "bigint"
    )
    return (
        final.select("_c", "_d2", h.alias("_h"))
        .groupBy("_c")
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.sum("_d2").cast("bigint").alias("inertia"),
            F.expr("bit_xor(_h)").cast("bigint").alias("members_xor"),
        )
        .select(F.col("_c").alias("cluster"), "n_members", "inertia", "members_xor")
    )


def kcenter_coreset(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int = 8,
) -> DataFrame:
    """Greedy k-center selection (Gonzalez 1985, the 2-approximation): start
    from the smallest id; each round add the point FARTHEST from its nearest
    already-chosen center (ties → smallest id). The classic coreset /
    data-pruning selector — maximal coverage of the embedding space with k
    exemplars, the diversity-first dual of ``sample_cluster_balanced``.

    Engine-exact via the same milli-unit quantization as ``kmeans_fixed``:
    every min-distance is an exact bigint, every argmax tie-breaks on id, so
    the full selection ORDER is deterministic and the oracle unrolls the k
    rounds as CTE layers.

    Scale shape: k-1 rounds of one zero-shuffle distance projection against
    ≤ k literal centers + one TakeOrdered(1) job (the global argmax); only
    the k chosen rows ever reach the driver.

    Returns (sel_order, ``id_col``, far_d2) — ``far_d2`` the exact squared
    quantized distance that made the point the farthest (0 for the seed).
    """
    base = df.select(
        F.col(id_col).alias("_id"), _km_quantize(vec_col).alias("_q")
    )
    seed_rows = base.orderBy("_id").limit(1).collect()
    if not seed_rows:
        raise ValueError("kcenter: input has no rows (cannot seed selection)")
    seed = seed_rows[0]
    chosen = [(1, seed["_id"], list(seed["_q"]), 0)]
    taken = {seed["_id"]}
    for r in range(2, k + 1):
        d2s = []
        for _, _, cv, _ in chosen:
            arr = lit_long_array(cv)
            d2s.append(
                F.aggregate(
                    F.zip_with(F.col("_q"), arr, lambda x, y: (x - y) * (x - y)),
                    F.lit(0).cast("bigint"),
                    lambda a, v: a + v,
                )
            )
        dmin = d2s[0] if len(d2s) == 1 else F.least(*d2s)
        far = (
            base.select("_id", "_q", dmin.alias("_dmin"))
            .orderBy(F.desc("_dmin"), F.asc("_id"))
            .limit(1)
            .collect()[0]
        )
        if far["_id"] in taken:
            break  # k > n: every remaining point IS a center (dmin 0)
        taken.add(far["_id"])
        chosen.append((r, far["_id"], list(far["_q"]), int(far["_dmin"])))
    spark = df.sparkSession
    return spark.createDataFrame(
        [(o, i, d) for (o, i, _, d) in chosen],
        f"sel_order int, {id_col} bigint, far_d2 bigint",
    )


def kmeans_silhouette(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int = 8,
    rounds: int = 2,
) -> DataFrame:
    """Simplified (centroid-based) silhouette per cluster over the same
    fixed-round Lloyd training as ``kmeans_fixed``: for each point,
    a = distance to its own centroid, b = distance to the nearest OTHER
    centroid, s = (b − a) / max(a, b) — the O(n·k) silhouette variant
    (Hruschka 2004) that scales where the classic O(n²) pairwise form
    cannot. Returns (cluster, n_members, mean_silhouette_r,
    n_negative) — negative s = points sitting closer to a foreign
    centroid, the "wrong side of the boundary" census.

    Determinism: squared distances are exact integers on the quantized
    grid; each point's s rounds to 6 dp and fixes to integer micro-units,
    so cluster means are exact bigint sums. The scoring pass is zero-
    shuffle (k×dim literal centroids in the scan stage), the rollup
    map-side combined."""
    base = df.select(
        F.col(id_col).alias("_id"), _km_quantize(vec_col).alias("_q")
    )
    cents = _km_train(base, k, rounds)
    wide = _km_assign(base, cents, keep_distances=True)
    second = F.least(
        *[
            F.when(F.col("_c") != ci, F.col(f"_d2_{ci}"))
            for ci in range(len(cents))
        ]
    )
    a = F.sqrt(F.col("_d2").cast("double"))
    b = F.sqrt(second.cast("double"))
    s = F.when(
        F.greatest(a, b) > 0, F.round((b - a) / F.greatest(a, b), 6)
    ).otherwise(F.lit(0.0))
    su = wide.select(
        "_c", F.round(s * 1000000).cast("bigint").alias("_su")
    )
    return (
        su.groupBy("_c")
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.round(
                F.sum("_su") / (F.count("*") * F.lit(1000000.0)), 4
            ).alias("mean_silhouette_r"),
            F.sum(F.when(F.col("_su") < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_negative"),
        )
        .select(
            F.col("_c").alias("cluster"),
            "n_members",
            "mean_silhouette_r",
            "n_negative",
        )
    )


def kmeans_calinski_harabasz(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int = 8,
    rounds: int = 2,
) -> DataFrame:
    """Calinski–Harabasz variance-ratio index over the fixed-round Lloyd
    partition: CH = (B/(k−1)) / (W/(n−k)) with W = within-cluster and B =
    between-cluster squared distance mass — the cluster-count selection
    criterion beside the per-cluster silhouette (CH compares PARTITIONS;
    silhouette localizes boundary trouble).

    Engine-exact: W is the exact bigint inertia; the global mean uses the
    SAME integer round-half-up as the centroid update; B = Σ n_c·‖c_c−g‖²
    is pure integer arithmetic on the collected (constant-size) centroids;
    CH divides once at the end.

    Scale: one assignment pass (zero-shuffle literal centroids), a k-sized
    rollup, and one dim-sized global-sum aggregate."""
    base = df.select(
        F.col(id_col).alias("_id"), _km_quantize(vec_col).alias("_q")
    )
    cents = _km_train(base, k, rounds)
    dim = len(cents[0])
    assigned = _km_assign(base, cents)
    per = (
        assigned.groupBy("_c")
        .agg(
            F.count("*").cast("bigint").alias("_n"),
            F.sum("_d2").cast("bigint").alias("_w"),
        )
        .collect()
    )
    gsums = (
        base.select(F.posexplode("_q").alias("_d", "_v"))
        .groupBy("_d")
        .agg(F.sum("_v").cast("bigint").alias("_s"), F.count("*").alias("_n"))
        .collect()
    )
    n_total = int(gsums[0]["_n"])
    g = [0] * dim
    for r in gsums:
        sp = int(r["_s"]) + n_total * KM_OFFSET
        g[int(r["_d"])] = (2 * sp + n_total) // (2 * n_total) - KM_OFFSET
    counts = {int(r["_c"]): int(r["_n"]) for r in per}
    w = sum(int(r["_w"]) for r in per)
    b = sum(
        counts.get(ci, 0)
        * sum((cv[d] - g[d]) * (cv[d] - g[d]) for d in range(dim))
        for ci, cv in enumerate(cents)
    )
    k_eff = len(counts)
    spark = df.sparkSession
    ch = 0.0
    if k_eff > 1 and n_total > k_eff and w > 0:
        ch = round((b / (k_eff - 1)) / (w / (n_total - k_eff)), 4)
    return spark.createDataFrame(
        [(n_total, k_eff, w, b, ch)],
        "n_points long, k_clusters long, within_ss long, between_ss long, "
        "ch_index_r double",
    )
