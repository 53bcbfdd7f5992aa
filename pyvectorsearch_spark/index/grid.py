"""GridIndex — the Spark-native PK-tree.

The reference's index (``/root/reference/include/pktree.hpp``) is a pointer
tree over a deterministic grid decomposition: axis ``c`` at level ``l`` has
been sliced ``floor((l*rr + dim - c - 1)/dim)`` times (``pktree.hpp:357-363``),
each slice dividing cell width by ``ratio`` (``:373-379``); a node exists only
while it would own ≥ ``rank`` occupants (K-instantiation, ``:587-635``).

Because the geometry is closed-form, the Spark index needs **no tree at all**
(SURVEY.md §1.3): any executor computes any cell id with pure arithmetic.

- **Build** = one min/max aggregation (origin/extent — the batch analog of
  ``grow_root_to_cover_point``, ``pktree.hpp:841-929``) + one fine-level
  ``groupBy(cell).count()`` + a bottom-up coalesce of under-full cells into
  parents over the tiny stats table (the batch analog of the insert-time
  rebalancing cascade, ``pktree.hpp:587-929,1288-1354`` — ~420 LoC of pointer
  surgery replaced by a loop of small aggregations).
- **Search** = candidate-cell selection against the stats table (the
  branch-and-bound of ``recursive_add_points``, ``pktree.hpp:1048-1064``,
  restated as point-to-box distance bounds), then ONE pruned scan + exact
  distance + window top-k. Results are exactly equal to brute force — the
  PK-tree is an exact index; pruning is physical, not semantic.

Scale notes: the data shuffles once (by cell, at write time); the stats table
is ~n/occupancy rows and is the only thing the planner touches; candidate
selection is vectorized numpy over that table. Hot cells (skew) are exactly
the cells K-instantiation keeps subdividing — the fine level bounds occupancy;
AQE skew-join handles the residue.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Iterable, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

CELL_SEP = "_"

STATS_SCHEMA = "cell string, level int, coords array<long>, count long"


def _slices(level: int, dim: int, rr: int) -> list[int]:
    """Per-axis slice count at ``level`` (pktree.hpp:357-363)."""
    return [(level * rr + dim - c - 1) // dim for c in range(dim)]


def _slices_expr(level_col, c: int, dim: int, rr: int):
    """Column twin of ``_slices`` for one axis — whole-stage-codegen safe."""
    return F.floor(
        (level_col.cast("long") * rr + dim - c - 1) / float(dim)
    ).cast("double")


def _kinstantiate_driver(
    counts: dict[str, int],
    *,
    fine_level: int,
    dim: int,
    rr: int,
    ratio: int,
    rank: int,
) -> tuple[dict[str, str], list[tuple[str, int, tuple[int, ...], int]]]:
    """The bottom-up K-instantiation cascade over a collected fine-cell
    count table (reference dissolve cascade, pktree.hpp:587-738): an
    under-full cell dissolves into its parent until the merged cell owns
    ≥ ``rank`` points (or level 0). Pure function of the counts — shared by
    the batch build and the streaming incremental rebalance, which is the
    point: rebalancing never needs the data, only this table.

    Returns (fine-cell → instantiated-cell assignment, stats rows)."""
    coords_of = {
        cid: tuple(int(x) for x in cid.split(CELL_SEP)[1:]) for cid in counts
    }
    assign: dict[str, str] = {}
    stats: list[tuple[str, int, tuple[int, ...], int]] = []
    pending: dict[tuple[int, ...], tuple[int, list[str]]] = {}
    for cid, cnt in counts.items():
        coords = coords_of[cid]
        pc, pm = pending.get(coords, (0, []))
        pending[coords] = (pc + cnt, pm + [cid])
    level = fine_level
    while pending and level > 0:
        nxt: dict[tuple[int, ...], tuple[int, list[str]]] = {}
        s_cur = _slices(level, dim, rr)
        s_par = _slices(level - 1, dim, rr)
        for coords, (cnt, members) in pending.items():
            if cnt >= rank:
                cid = CELL_SEP.join([str(level)] + [str(c) for c in coords])
                stats.append((cid, level, coords, cnt))
                for m in members:
                    assign[m] = cid
            else:
                parent = tuple(
                    c // (ratio ** (s_cur[i] - s_par[i]))
                    for i, c in enumerate(coords)
                )
                pc, pm = nxt.get(parent, (0, []))
                nxt[parent] = (pc + cnt, pm + members)
        pending = nxt
        level -= 1
    for coords, (cnt, members) in pending.items():
        cid = CELL_SEP.join(["0"] + [str(c) for c in coords])
        stats.append((cid, 0, coords, cnt))
        for m in members:
            assign[m] = cid
    return assign, stats


def _kinstantiate_distributed(
    fine_counts: DataFrame,
    *,
    fine_level: int,
    dim: int,
    rr: int,
    ratio: int,
    rank: int,
    with_state: bool = False,
) -> tuple[DataFrame, DataFrame] | tuple[DataFrame, DataFrame, DataFrame]:
    """The distributed twin of ``_kinstantiate_driver`` — the cascade as
    DataFrame aggregations over a (``_fine``, ``count``) table, for cell
    tables too large to collect (the 100 TB path). Per level, cells with
    ≥ ``rank`` accumulated points instantiate; under-full cells re-key to
    their parent and re-sum; a fine cell's final home is its deepest
    INSTANTIATED ancestor, recovered with one explode + join + max_by.
    Nothing is ever collected to the driver. Shared by the batch build and
    the streaming incremental rebalance.

    ``fine_counts`` should be checkpointed by the caller (it feeds both the
    cascade seed and the ancestor-explode join). Returns
    (mapping ``(_fine, cell)``, stats ``(cell, level, coords, count)``);
    with ``with_state=True`` additionally returns the full node-state table
    ``(cell, level, pending)`` — every node that owns rolled-up mass,
    instantiated or not — which seeds the streaming sidecar's incremental
    maintenance (``index/incremental.py``)."""
    s_fine = _slices(fine_level, dim, rr)
    cds = F.transform(
        F.slice(F.split("_fine", CELL_SEP), 2, dim), lambda x: x.cast("long")
    )
    pending = fine_counts.select(
        cds.alias("cds"), F.col("count").alias("cnt")
    ).groupBy("cds").agg(F.sum("cnt").alias("cnt"))

    def cell_id(level: int):
        return F.concat_ws(
            CELL_SEP,
            F.lit(str(level)),
            F.array_join(F.transform("cds", lambda x: x.cast("string")), CELL_SEP),
        )

    inst_parts = []
    state_parts = []
    for l in range(fine_level, 0, -1):
        # eager localCheckpoint, not persist: each round's table is tiny
        # (shrinking n/occupancy rows) but a LAZY chain keeps the full
        # 19-deep plan alive in every union branch — plan-size blowup,
        # not data, was the deep-index bottleneck (see the caller's
        # fine_counts checkpoint note)
        pending = pending.localCheckpoint(eager=True)
        if with_state:
            state_parts.append(
                pending.select(
                    cell_id(l).alias("cell"),
                    F.lit(l).cast("int").alias("level"),
                    F.col("cnt").cast("long").alias("pending"),
                )
            )
        inst_parts.append(
            pending.filter(F.col("cnt") >= rank).select(
                F.lit(l).alias("lvl"), cell_id(l).alias("anc"), "cds", "cnt"
            )
        )
        s_cur, s_par = _slices(l, dim, rr), _slices(l - 1, dim, rr)
        divs = F.array(
            *[F.lit(ratio ** (s_cur[c] - s_par[c])).cast("long") for c in range(dim)]
        )
        pending = (
            pending.filter(F.col("cnt") < rank)
            .select(
                F.zip_with("cds", divs, lambda x, d: x.cast("long") / d).alias(
                    "_d"
                ),
                "cnt",
            )
            .select(
                F.transform("_d", lambda x: F.floor(x).cast("long")).alias("cds"),
                "cnt",
            )
            .groupBy("cds")
            .agg(F.sum("cnt").alias("cnt"))
        )
    inst_parts.append(
        pending.select(F.lit(0).alias("lvl"), cell_id(0).alias("anc"), "cds", "cnt")
    )
    instantiated = inst_parts[0]
    for p in inst_parts[1:]:
        instantiated = instantiated.unionByName(p)

    def anc_id(level: int):
        s_l = _slices(level, dim, rr)
        parts = [F.lit(str(level))]
        for c in range(dim):
            shrink = ratio ** (s_fine[c] - s_l[c])
            parts.append(
                F.floor(
                    F.element_at(F.split("_fine", CELL_SEP), c + 2).cast("long")
                    / shrink
                ).cast("string")
            )
        return F.concat_ws(CELL_SEP, *parts)

    ancs = fine_counts.select(
        "_fine",
        "count",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(l).alias("lvl"), anc_id(l).alias("anc"))
                    for l in range(fine_level + 1)
                ]
            )
        ).alias("a"),
    ).select("_fine", "count", "a.lvl", "a.anc")

    chosen = (
        ancs.join(instantiated.select("lvl", "anc"), ["lvl", "anc"])
        .groupBy("_fine")
        .agg(F.max_by("anc", "lvl").alias("cell"))
    )

    # Cell stats stay a DataFrame — NOTHING is collected to the driver
    # (the point of this path; at 100 TB the stats table is millions of
    # rows). The driver-side search path collects lazily if ever asked;
    # the distributed search path joins against this directly.
    stats_df = instantiated.select(
        F.col("anc").alias("cell"),
        F.col("lvl").cast("int").alias("level"),
        F.transform("cds", lambda x: x.cast("long")).alias("coords"),
        F.col("cnt").cast("long").alias("count"),
    )
    if not with_state:
        return chosen, stats_df
    state_parts.append(
        pending.select(
            cell_id(0).alias("cell"),
            F.lit(0).cast("int").alias("level"),
            F.col("cnt").cast("long").alias("pending"),
        )
    )
    state_df = state_parts[0]
    for p in state_parts[1:]:
        state_df = state_df.unionByName(p)
    return chosen, stats_df, state_df


@dataclass
class GridIndex:
    """A built grid index: cell assignment per row + cell statistics.

    ``df`` carries the source rows plus a ``cell`` string column
    (``"level_c0_c1_..."``); ``stats_df`` is the cell table — a DataFrame
    ``(cell, level, coords, count)`` that is NEVER collected by the build
    (at 100 TB it is ~n/occupancy rows). The driver-side candidate path
    collects it lazily, on first use, only when small (``stats`` property);
    the distributed candidate path (``candidates="distributed"``) joins
    against it instead. ``origin``/``width`` define the root box (reference
    ``_O``/``_width``, pktree.hpp:307-309).
    """

    df: DataFrame
    stats_df: DataFrame
    origin: list[float]
    width: float
    dim: int
    rank: int
    rr: int
    ratio: int
    fine_level: int
    id_col: str
    vec_col: str
    _local_stats: list[tuple[str, int, tuple[int, ...], int]] | None = field(
        default=None, repr=False
    )
    _stats_count: int | None = field(default=None, repr=False)

    @property
    def stats(self) -> list[tuple[str, int, tuple[int, ...], int]]:
        """Driver-side cell list, collected lazily and cached. Only the
        small-probe-set search path and tests touch this; the build and the
        distributed search path never do."""
        if self._local_stats is None:
            self._local_stats = [
                (r["cell"], int(r["level"]), tuple(int(x) for x in r["coords"]), int(r["count"]))
                for r in self.stats_df.collect()
            ]
        return self._local_stats

    # ---------------- build ----------------

    @staticmethod
    def build(
        df: DataFrame,
        *,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        dim: int | None = None,
        rank: int = 3,
        rr: int = 2,
        ratio: int = 2,
        target_occupancy: int = 64,
        fine_level: int | None = None,
        coalesce_strategy: str = "auto",
        driver_cell_limit: int = 200_000,
    ) -> "GridIndex":
        spark = df.sparkSession
        if dim is None:
            first = df.select(F.size(vec_col)).first()
            if first is None:
                raise ValueError("cannot build index over an empty DataFrame")
            dim = first[0]

        # Root box: one global min/max pass (batch grow_root_to_cover_point).
        # The row count rides the same aggregate — no separate count job.
        # try_element_at, not element_at: a short (dim-mismatched) vector
        # must surface as the census's ValueError below, not an ANSI
        # INVALID_ARRAY_INDEX from the same aggregate racing it
        mins = [
            F.min(F.try_element_at(F.col(vec_col), F.lit(c + 1))).alias(f"mn{c}")
            for c in range(dim)
        ]
        maxs = [
            F.max(F.try_element_at(F.col(vec_col), F.lit(c + 1))).alias(f"mx{c}")
            for c in range(dim)
        ]
        # Validity census rides the SAME scan (r7 contract): the index's
        # internal invariant is the reference's — fixed dim, finite doubles
        # (pktree.hpp:1223-1250 fixes dim; raw C arrays cannot hold NULLs).
        # One NaN would silently poison the root box (min/max propagate it)
        # and floor() every cell id to null, so build fails loud instead.
        from pyvectorsearch_spark.functions.vector import vec_is_finite

        invalid = F.coalesce(
            F.col(vec_col).isNull()
            | (F.size(F.col(vec_col)) != F.lit(dim))
            | ~vec_is_finite(F.col(vec_col)),
            F.lit(True),
        )
        row = df.agg(
            *mins,
            *maxs,
            F.count("*").alias("_n"),
            F.sum(invalid.cast("long")).alias("_bad"),
        ).first()
        if row["_n"] == 0:
            raise ValueError("cannot build index over an empty DataFrame")
        if row["_bad"]:
            raise ValueError(
                f"cannot build index: {row['_bad']} row(s) have an invalid "
                f"vector (NULL / NaN / Inf component or dim != {dim}); "
                "clean or filter the column first"
            )
        origin = [float(row[f"mn{c}"]) for c in range(dim)]
        extent = max(
            max(float(row[f"mx{c}"]) - origin[c] for c in range(dim)), 1e-12
        )
        width = extent * (1 + 1e-9)  # open upper edge: max point stays inside

        n = row["_n"]
        if fine_level is None:
            # enough total slices that average occupancy ≈ target if uniform
            cells_needed = max(n / max(target_occupancy, 1), 1.0)
            total_slices = max(int(math.ceil(math.log(cells_needed, ratio))), 0)
            fine_level = int(math.ceil(total_slices * dim / rr)) if total_slices else 0

        cell_expr = GridIndex._cell_expr(vec_col, origin, width, fine_level, dim, rr, ratio)
        fine = df.withColumn("_fine", cell_expr)

        if coalesce_strategy not in ("auto", "driver", "distributed"):
            raise ValueError(f"unknown coalesce_strategy {coalesce_strategy!r}")
        fine_stats = None
        if coalesce_strategy == "auto":
            # One job decides the strategy AND (when the cell table is small
            # enough) already supplies the driver path's stats: collect at
            # most driver_cell_limit+1 grouped rows — the driver's footprint
            # stays bounded whatever the corpus size, and overflow routes to
            # the distributed cascade without a separate countDistinct job.
            fine_stats = (
                fine.groupBy("_fine").count().limit(driver_cell_limit + 1).collect()
            )
            if len(fine_stats) > driver_cell_limit:
                fine_stats = None
                coalesce_strategy = "distributed"
            else:
                coalesce_strategy = "driver"
        if coalesce_strategy == "distributed":
            return GridIndex._build_distributed(
                fine, origin, width, dim, rank, rr, ratio, fine_level,
                id_col, vec_col,
            )

        # Stats at the fine level (small: ≤ n/1 rows, typically n/occupancy).
        if fine_stats is None:
            fine_stats = fine.groupBy("_fine").count().collect()
        counts = {r["_fine"]: r["count"] for r in fine_stats}

        # Bottom-up K-instantiation (shared with the streaming incremental
        # rebalance — the cascade is a pure function of the count table).
        assign, stats = _kinstantiate_driver(
            counts, fine_level=fine_level, dim=dim, rr=rr, ratio=ratio,
            rank=rank,
        )

        mapping = spark.createDataFrame(
            [(k, v) for k, v in assign.items()], "_fine string, cell string"
        )
        indexed = fine.join(F.broadcast(mapping), "_fine").drop("_fine")
        stats_df = spark.createDataFrame(
            [(cid, lvl, list(coords), cnt) for cid, lvl, coords, cnt in stats],
            STATS_SCHEMA,
        )
        return GridIndex(
            df=indexed,
            stats_df=stats_df,
            _local_stats=stats,
            origin=origin,
            width=width,
            dim=dim,
            rank=rank,
            rr=rr,
            ratio=ratio,
            fine_level=fine_level,
            id_col=id_col,
            vec_col=vec_col,
        )

    @staticmethod
    def _build_distributed(
        fine: DataFrame,
        origin: list[float],
        width: float,
        dim: int,
        rank: int,
        rr: int,
        ratio: int,
        fine_level: int,
        id_col: str,
        vec_col: str,
    ) -> "GridIndex":
        """Coalesce without the driver: the 100 TB path.

        The driver variant replays the reference's dissolve cascade over a
        collected cell list — impossible when the fine-cell table itself is
        billions of rows. This path runs the SAME cascade as DataFrame
        aggregations: per level, cells with ≥ rank accumulated points
        instantiate; under-full cells re-key to their parent and re-sum —
        ``fine_level`` iterations over a shrinking ~n/occupancy-row table,
        nothing per-cell ever collected. A fine cell's final home is then its
        deepest INSTANTIATED ancestor (the dissolve process assigns exactly
        there), recovered with one explode + join + max_by. Search results
        are identical to the driver path (exactness never depended on tree
        shape, SURVEY.md §7) and the occupancy invariant (≥ rank or root)
        holds by construction.
        """
        # eager checkpoint: fine_counts feeds BOTH the cascade seed and the
        # ancestor-explode join — and, critically, truncates lineage so the
        # per-level loop below starts from a shallow plan (r7: at
        # fine_level ≈ 19, a lazy 19-deep persist chain under a 20-part
        # union made Catalyst optimize O(levels²) nested subplans — the
        # build stalled minutes in planning/codegen before any data moved)
        fine_counts = fine.groupBy("_fine").count().localCheckpoint(eager=True)
        chosen, stats_df = _kinstantiate_distributed(
            fine_counts, fine_level=fine_level, dim=dim, rr=rr, ratio=ratio,
            rank=rank,
        )
        indexed = fine.join(chosen, "_fine").drop("_fine")
        return GridIndex(
            df=indexed,
            stats_df=stats_df,
            origin=origin,
            width=width,
            dim=dim,
            rank=rank,
            rr=rr,
            ratio=ratio,
            fine_level=fine_level,
            id_col=id_col,
            vec_col=vec_col,
        )
    @staticmethod
    def _cell_expr(
        vec_col: str,
        origin: Sequence[float],
        width: float,
        level: int,
        dim: int,
        rr: int,
        ratio: int,
        clamp: bool = True,
    ):
        """Closed-form cell id at ``level``: per-axis
        floor((p_c − O_c) / w_c) with w_c = width·ratio^(−slices_c)
        (pktree.hpp:373-379,538-580) — a pure Catalyst expression.

        ``clamp=True`` (the batch-build path, where the data DEFINED the
        box) folds numeric edge cases onto the boundary cells. Streamed
        ingest against pinned geometry must pass ``clamp=False``: a point
        OUTSIDE the root box then gets honest negative/oversized coords —
        the integer lattice simply extends beyond the box, ``_cell_box``
        is closed-form in the coords, and the pruning bounds stay lossless.
        This replaces the reference's incremental root surgery
        (``grow_root_to_cover_point``, pktree.hpp:841-929): no rebuild, no
        pointer cascade — an out-of-box arrival is just a new cell id.
        (Clamping such a point instead would file it under a boundary
        cell whose box doesn't contain it, and pruned search could then
        discard the cell holding the true nearest neighbor.)"""
        s = _slices(level, dim, rr)
        parts = [F.lit(str(level))]
        for c in range(dim):
            w_c = width * (ratio ** -s[c])
            coord = F.floor(
                (F.element_at(F.col(vec_col), c + 1).cast("double") - float(origin[c]))
                / float(w_c)
            )
            if clamp:
                # open-upper-edge numeric guard (in-box data only)
                coord = F.greatest(
                    F.least(coord, F.lit((ratio ** s[c]) - 1)), F.lit(0)
                )
            parts.append(coord.cast("string"))
        return F.concat_ws(CELL_SEP, *parts)

    # ---------------- geometry ----------------

    def _cell_box(self, level: int, coords: tuple[int, ...]) -> tuple[np.ndarray, np.ndarray]:
        s = _slices(level, self.dim, self.rr)
        w = np.array([self.width * (self.ratio ** -s[c]) for c in range(self.dim)])
        lo = np.asarray(self.origin) + np.asarray(coords) * w
        return lo, lo + w

    def _bounds(self, q: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """min/max squared point-to-box distance per cell (the pruning bounds
        of pktree.hpp:1048-1061 and :1129-1162), vectorized over the stats."""
        mins = np.empty(len(self.stats))
        maxs = np.empty(len(self.stats))
        cnts = np.empty(len(self.stats), dtype=np.int64)
        for i, (_, level, coords, cnt) in enumerate(self.stats):
            lo, hi = self._cell_box(level, coords)
            d_min = np.clip(lo - q, 0, None) + np.clip(q - hi, 0, None)
            d_max = np.maximum((q - lo) ** 2, (hi - q) ** 2)
            mins[i] = float((d_min**2).sum())
            maxs[i] = float(d_max.sum())
            cnts[i] = cnt
        return mins, maxs, cnts

    # ---------------- candidate selection (distributed) ----------------

    def _stats_is_small(self, limit: int = 200_000) -> bool:
        """True when the cell table can sit on the driver (cached count)."""
        if self._local_stats is not None:
            return True
        if self._stats_count is None:
            self._stats_count = self.stats_df.count()
        return self._stats_count <= limit

    def _box_bounds_expr(self, qvec: Column) -> tuple[Column, Column]:
        """Min/max squared point-to-box distance between a query-vector
        column and a stats row (``level``, ``coords``) as pure Catalyst
        expressions — the distributed twin of ``_bounds`` (the pruning
        bounds of pktree.hpp:1048-1061 and :1129-1162). Evaluates in
        whole-stage codegen; no UDF, no driver."""
        min_terms: list[Column] = []
        max_terms: list[Column] = []
        for c in range(self.dim):
            s_c = F.floor(
                (F.col("level").cast("long") * self.rr + self.dim - c - 1)
                / float(self.dim)
            ).cast("double")
            w_c = F.lit(float(self.width)) * F.pow(F.lit(float(self.ratio)), -s_c)
            lo = (
                F.lit(float(self.origin[c]))
                + F.element_at("coords", c + 1).cast("double") * w_c
            )
            hi = lo + w_c
            qc = F.element_at(qvec, c + 1).cast("double")
            dmin = F.greatest(lo - qc, F.lit(0.0)) + F.greatest(qc - hi, F.lit(0.0))
            min_terms.append(dmin * dmin)
            max_terms.append(
                F.greatest((qc - lo) * (qc - lo), (hi - qc) * (hi - qc))
            )
        add = lambda a, b: a + b  # noqa: E731
        import functools

        return (
            functools.reduce(add, min_terms),
            functools.reduce(add, max_terms),
        )

    # Evaluate the CELL-ONLY geometry (per-level width = w·ratio^-floor(…),
    # box lo/hi per dim) once per cell on the broadcast side instead of
    # inside every |Q|·|cells| pair row (r11): the per-pair math drops from
    # pow/floor/element_at chains to two array reads + add/mul per dim.
    # Identical doubles — the same expressions over the same inputs, just
    # hoisted below the BroadcastExchange. Flag kept as the A/B kill switch.
    BOX_COLS = True

    def _with_box_cols(self, stats_df: DataFrame) -> DataFrame:
        """stats rows + (_blo, _bhi) per-dim box-bound arrays."""
        los, his = [], []
        for c in range(self.dim):
            s_c = F.floor(
                (F.col("level").cast("long") * self.rr + self.dim - c - 1)
                / float(self.dim)
            ).cast("double")
            w_c = F.lit(float(self.width)) * F.pow(F.lit(float(self.ratio)), -s_c)
            lo = (
                F.lit(float(self.origin[c]))
                + F.element_at("coords", c + 1).cast("double") * w_c
            )
            los.append(lo)
            his.append(lo + w_c)
        return stats_df.withColumn("_blo", F.array(*los)).withColumn(
            "_bhi", F.array(*his)
        )

    def _box_bounds_from_cols(self, qvec: Column) -> tuple[Column, Column]:
        """The `_box_bounds_expr` arithmetic over precomputed (_blo, _bhi)
        columns — bit-identical terms, cell geometry not re-derived."""
        import functools

        min_terms: list[Column] = []
        max_terms: list[Column] = []
        for c in range(self.dim):
            lo = F.element_at("_blo", c + 1)
            hi = F.element_at("_bhi", c + 1)
            qc = F.element_at(qvec, c + 1).cast("double")
            dmin = F.greatest(lo - qc, F.lit(0.0)) + F.greatest(qc - hi, F.lit(0.0))
            min_terms.append(dmin * dmin)
            max_terms.append(
                F.greatest((qc - lo) * (qc - lo), (hi - qc) * (hi - qc))
            )
        add = lambda a, b: a + b  # noqa: E731
        return (
            functools.reduce(add, min_terms),
            functools.reduce(add, max_terms),
        )

    def _scored_pairs(self, qs: DataFrame, stats_df: DataFrame | None = None) -> DataFrame:
        """(query × cell) with distance bounds: queries joined against the
        broadcast stats table. The stats side is ~n/occupancy rows — the
        only table small enough to pair with every query; the data itself
        is never cross-joined.

        The queries are hash-partitioned on ``_qid`` FIRST: the |Q|·|cells|
        bound expressions then evaluate across every core instead of on the
        query table's few source partitions, and the downstream per-query
        window reuses the same partitioning (no second exchange of the big
        pair table). Measured 4x on a 40k-probe batch."""
        spread = qs.repartition(
            qs.sparkSession.sparkContext.defaultParallelism, "_qid"
        )
        stats = stats_df if stats_df is not None else self.stats_df
        if self.BOX_COLS:
            mn, mx = self._box_bounds_from_cols(F.col("_qvec"))
            return (
                spread.crossJoin(F.broadcast(self._with_box_cols(stats)))
                .withColumn("_min_d2", mn)
                .withColumn("_max_d2", mx)
                .drop("_blo", "_bhi")
            )
        mn, mx = self._box_bounds_expr(F.col("_qvec"))
        return (
            spread.crossJoin(F.broadcast(stats))
            .withColumn("_min_d2", mn)
            .withColumn("_max_d2", mx)
        )

    # Above this many cells the |Q|x|cells| scored cross-join becomes the
    # dominant quadratic (both |Q| and |cells| grow with the data), so the
    # distributed searches descend through a COARSE ancestor level first —
    # the reference's recursive tree descent (pktree.hpp:978-1072 prunes
    # subtrees before visiting children) restated as two plan stages.
    COARSE_THRESHOLD = 2048
    # max survivor fan-out per descent stage (see _descent_ladder)
    DESCENT_BRANCH = 16
    COARSE_TARGET = 320
    # max fan-in of the implicit FINAL (fine) stage on deep grids; past the
    # driver-stats bound the ladder appends tail stages until the last
    # grouped level is within this factor of the fine count (r9 — the r8
    # capacity run measured the 1.05M-cell search paying 6.6× wall for 4×
    # cells because the schedule left a ~13× tail expansion)
    TAIL_FAN = 4
    TAIL_GATE_CELLS = 200_000
    # broadcast the per-query kth-distance cap (b0) in _prune_pairs instead
    # of sort-merge-joining it back into the pair table (r10 optimization
    # round; see _prune_pairs). One row per capped query — only probe tables
    # big enough to threaten the 8 GB broadcast-relation cap (≳5×10⁸ capped
    # probes at 16 B/row) must not take it, and _b0_broadcast_ok gates on
    # Catalyst's probe-table size estimate at plan time (ADVICE r10); this
    # class attribute is the manual override (False = never hint).
    B0_BROADCAST = True
    # Plan-size gate for the hint: a KNOWN probe-table estimate above this
    # disables the broadcast and lets AQE choose. 16 GiB of probe rows at
    # the narrowest (id, 2-d vec) layout ≈ 4×10⁸ probes — b0 would then be
    # ~6.4 GB framed, at the broadcast-relation cap.
    B0_BROADCAST_MAX_PROBE_BYTES = 16 << 30

    def _b0_broadcast_ok(self, qs: DataFrame) -> bool:
        """Cheap runtime gate for the b0 broadcast hint (ADVICE r10): read
        Catalyst's sizeInBytes estimate for the probe table — no job, just
        the already-optimized logical plan. Unknown/sentinel estimates
        (driver-parallelized probe tables report the defaultSizeInBytes
        sentinel) keep the hint: those tables were built by a driver that
        held them, so they cannot approach 5×10⁸ rows."""
        if not self.B0_BROADCAST:
            return False
        try:
            size = qs._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            size = int(size if isinstance(size, int) else size.toString())
        except Exception:
            return True
        if size <= 0 or size >= (1 << 60):  # absent / Long.Max-class sentinel
            return True
        return size < self.B0_BROADCAST_MAX_PROBE_BYTES

    # Plan-size gate for broadcasting the probe table ITSELF (id + vector
    # per row — heavier than b0's 16 B/row, so a tighter bound): the
    # candidate re-attach join keep⋈qs otherwise plans a sort-merge that
    # re-sorts the pruned pair table just to put the query vector back
    # (r11; AQE's runtime SMJ→BHJ rewrite fires after the sorts are
    # planned). 1 GiB of ESTIMATED probe bytes is ≲100 MB real here
    # (estimates inflate across the probe-expansion joins) — far under the
    # 8 GB broadcast-relation cap; bigger known tables keep the SMJ.
    QS_BROADCAST_MAX_BYTES = 1 << 30

    def _qs_broadcast_ok(self, qs: DataFrame) -> bool:
        """Like :meth:`_b0_broadcast_ok` but for the probe table itself.
        Unknown estimates broadcast (driver-built probe tables were held in
        driver memory, so they are bounded by construction)."""
        try:
            size = qs._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            size = int(size if isinstance(size, int) else size.toString())
        except Exception:
            return True
        if size <= 0 or size >= (1 << 60):
            return True
        return size < self.QS_BROADCAST_MAX_BYTES

    def _n_cells(self) -> int:
        """Stats-row count, cached; never collects the stats themselves."""
        if self._local_stats is not None:
            return len(self._local_stats)
        if self._stats_count is None:
            self._stats_count = self.stats_df.count()
        return self._stats_count

    def _level_hist(self) -> dict[int, int]:
        """(level -> cell count) histogram of the stats table; one tiny
        cells-sized aggregate for distributed stats, cached."""
        if getattr(self, "_lvl_hist", None) is None:
            if self._local_stats is not None:
                hist: dict[int, int] = {}
                for _, lvl, _, _ in self._local_stats:
                    hist[lvl] = hist.get(lvl, 0) + 1
            else:
                hist = {
                    int(r["level"]): int(r["n"])
                    for r in self.stats_df.groupBy("level")
                    .agg(F.count("*").alias("n"))
                    .collect()
                }
            self._lvl_hist = hist
        return self._lvl_hist

    def _coarse_level(self) -> int:
        """Ancestor level whose GROUPED cell count lands near COARSE_TARGET.

        K-instantiation leaves a level PYRAMID, not a flat fine layer
        (measured at sf1.0: 5362 cells spread over levels 0-11, bulk at
        7-8), and grouping maps each cell to its ancestor at
        ``min(level, lc)`` — cells already at or above lc stay themselves.
        So the lc that actually contracts is found from the level
        histogram: the deepest lc whose estimate (shallow cells kept +
        deeper cells divided by ratio^(rr·gap)) fits the target. A
        max-occupied-level heuristic picked lc=9 there and contracted
        NOTHING (5323 of 5362 cells sat at levels ≤ 9)."""
        hist = self._level_hist()
        if not hist:
            return 0
        top = max(hist)
        for lc in range(top - 1, 0, -1):
            if self._grouped_est(lc) <= self.COARSE_TARGET:
                return lc
        return 0

    def _grouped_est(self, lc: int) -> int:
        """Estimated cell count after grouping the stats pyramid to
        ancestor level ``lc`` (shallow cells stay themselves; deeper cells
        contract by ratio^(rr·gap)) — the sizing input for the descent."""
        hist = self._level_hist()
        shrink = self.ratio ** self.rr
        return sum(
            n if lvl <= lc else max(1, n // (shrink ** (lvl - lc)))
            for lvl, n in hist.items()
        )

    def _descent_ladder(self) -> list[int]:
        """Strictly-increasing coarse levels whose grouped-cell estimates
        grow ~DESCENT_BRANCH× per stage, COARSE_TARGET upward. The round-5
        two-stage descent expanded surviving ancestors straight to their
        FINE members — a fan-out of n_cells/COARSE_TARGET per ancestor,
        which is where the quadratic reappeared at sf10 (4M probes ×
        ~39 members × qvec bytes ground one stage for 30+ minutes). Each
        ladder stage now expands survivors by at most ~DESCENT_BRANCH, so
        every stage's pair table stays O(|Q| · survivors · branch) whatever
        the index depth; stage count grows only logarithmically in the
        cell count. The final (fine) stage is implicit — callers descend
        ladder stages then finish on the true stats table."""
        hist = self._level_hist()
        if not hist:
            return [0]
        n = sum(hist.values())
        top = max(hist)
        ladder: list[int] = []
        target = self.COARSE_TARGET
        lc_prev = 0
        # a stage earns its window sort only while it still CONTRACTS the
        # next stage ~BRANCH-fold: once the schedule target is within 2× of
        # the fine count, expanding straight to fine is the same work the
        # extra stage would cost (measured: a 5.1k mid stage under a 5.4k
        # fine table added +44 % at sf1.0 for nothing)
        while target * 2 < n:
            lc = lc_prev
            for cand in range(top - 1, lc_prev, -1):
                if self._grouped_est(cand) <= target:
                    lc = cand
                    break
            if lc <= lc_prev and ladder:
                # no deeper level fits this target: the pyramid is shallow
                # enough that the previous stage already covers it
                target *= self.DESCENT_BRANCH
                continue
            if lc >= top or self._grouped_est(lc) >= n:
                break
            ladder.append(lc)
            lc_prev = lc
            target *= self.DESCENT_BRANCH
        # Tail gate (r9, VERDICT r8 #3): the absolute-target schedule bounds
        # every MIDDLE stage, but on deep pyramids it can leave the implicit
        # final fine expansion at up to ~32× the last grouped level
        # (measured ~13× at 1.05M cells → 607 s for 1000 probes, 6.6× wall
        # for 4× cells). Past the driver-stats bound, append the deepest
        # levels that still contract ≥2× vs fine until the tail fan-in is
        # ≤ TAIL_FAN — the reference's recursion is node-bounded at EVERY
        # step (pktree.hpp:1048-1064), including the last. Below the gate
        # the r7/r8 measured floors (11.75× at sf10) already carry the
        # regime and an extra window would tax the headline queries.
        if ladder and n > self.TAIL_GATE_CELLS:
            while True:
                est_last = self._grouped_est(ladder[-1])
                if n <= est_last * self.TAIL_FAN:
                    break
                cand_lv = None
                for cand in range(top - 1, ladder[-1], -1):
                    e = self._grouped_est(cand)
                    if e * 2 < n and e > est_last:
                        cand_lv = cand
                        break
                if cand_lv is None:
                    break
                ladder.append(cand_lv)
        return ladder or [self._coarse_level()]

    def _coarse_stats(self, coarse_level: int) -> DataFrame:
        """Aggregate the stats table to ancestor cells at ``coarse_level``:
        (cell, level, coords, count) rows whose box CONTAINS every member
        cell's box (cells already at or above the coarse level group as
        themselves), so every point-to-box bound computed on a coarse row
        is a valid bound for all its members — the losslessness invariant
        of the two-stage descent. One cells-sized shuffle, done once per
        search plan."""
        lvl = F.col("level").cast("int")
        eff = F.least(lvl, F.lit(int(coarse_level)))
        coarse_coords = F.array(
            *[
                F.floor(
                    F.element_at("coords", c + 1).cast("double")
                    / F.pow(
                        F.lit(float(self.ratio)),
                        _slices_expr(lvl, c, self.dim, self.rr)
                        - _slices_expr(eff, c, self.dim, self.rr),
                    )
                ).cast("long")
                for c in range(self.dim)
            ]
        )
        return (
            self.stats_df.select(
                eff.alias("level"),
                coarse_coords.alias("coords"),
                F.col("count"),
            )
            .groupBy("level", "coords")
            .agg(F.sum("count").cast("long").alias("count"))
            .withColumn(
                "cell",
                F.concat_ws(
                    CELL_SEP,
                    F.col("level").cast("string"),
                    *[
                        F.element_at("coords", c + 1).cast("string")
                        for c in range(self.dim)
                    ],
                ),
            )
        )

    def _coarse_key_expr(self, coarse_level: int):
        """Coarse ancestor key of a fine stats row — the join key that
        expands surviving coarse cells back to their member cells."""
        lvl = F.col("level").cast("int")
        eff = F.least(lvl, F.lit(int(coarse_level)))
        parts = [eff.cast("string")]
        for c in range(self.dim):
            parts.append(
                F.floor(
                    F.element_at("coords", c + 1).cast("double")
                    / F.pow(
                        F.lit(float(self.ratio)),
                        _slices_expr(lvl, c, self.dim, self.rr)
                        - _slices_expr(eff, c, self.dim, self.rr),
                    )
                ).cast("long").cast("string")
            )
        return F.concat_ws(CELL_SEP, *parts)

    def _prune_pairs(
        self, pairs: DataFrame, k: int, broadcast_b0: bool | None = None
    ) -> DataFrame:
        """The exact two-phase candidate prune over a scored (query, cell)
        pair table with (_qid, cell, count, _min_d2, _max_d2): returns the
        surviving (_qid, cell) pairs. Lossless for ANY pair table whose
        per-query rows partition ≥ the true top-k points with valid
        point-to-box bounds (fine cells, or coarse ancestors)."""
        # Coarse pre-bound BEFORE the window: any single cell holding ≥ k
        # points caps the kth distance by its max-distance, and the min of
        # those caps per query comes from a map-side-combined aggregate —
        # |Q| rows cross the wire instead of the full |Q|·|cells| pair table
        # through the window sort (543 cells × 40k probes = 21.7M rows at
        # sf0.1; the prune leaves ~the near ring per query). Lossless: the
        # cap ≥ the true kth distance, every cell that could hold a top-k
        # point has _min_d2 ≤ cap, and the capping cell itself survives
        # (its _min_d2 ≤ its _max_d2 = cap), so the exact prefix logic below
        # still reaches ≥ k cumulative points. Queries with no ≥k cell
        # (k > occupancy) keep every cell via the null coalesce.
        b0 = (
            pairs.filter(F.col("count") >= k)
            .groupBy("_qid")
            .agg(F.min("_max_d2").alias("_b0"))
        )
        # b0 is ≤ 16 bytes per query (one (long, double) row for queries
        # that have a ≥k cell) — broadcast it instead of letting the planner
        # sort-merge: the pair table is already hash-partitioned on _qid for
        # the windows below, and an SMJ here inserts a full extra sort of
        # the |Q|·|cells| pair table just to attach one scalar (measured
        # 2.37 s → 2.05 s median on the 120k-probe sf0.1 bench row; AQE's
        # runtime SMJ→BHJ rewrite fires too late to skip that sort). The
        # hint is probe-bounded, not data-bounded: 10⁶ probes ≈ 16 MB.
        # Callers pass broadcast_b0 from _b0_broadcast_ok(qs) (a plan-size
        # gate against the 8 GB broadcast-relation cap); GridIndex.B0_BROADCAST
        # is the manual kill switch.
        if self.B0_BROADCAST if broadcast_b0 is None else broadcast_b0:
            b0 = F.broadcast(b0)
        pairs = pairs.join(b0, "_qid", "left").filter(
            F.col("_min_d2") <= F.coalesce(F.col("_b0"), F.lit(float("inf")))
        )
        # Tie order matters: a query's whole ancestor chain has _min_d2 = 0
        # (nested boxes), and coarse ancestors have domain-sized _max_d2 —
        # letting one into the prefix inflates the bound to cover everything.
        # Ascending _max_d2 puts the TIGHTEST covering cells first.
        w_pref = (
            Window.partitionBy("_qid")
            .orderBy(
                F.col("_min_d2").asc(), F.col("_max_d2").asc(), F.col("cell").asc()
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # The kth-neighbor bound is a SECOND window over the same (_qid)
        # partitioning — one shuffle + one sort total, no self-join (a
        # pref⋈bound join would evaluate the scored cross-join twice).
        w_all = Window.partitionBy("_qid")
        pref = pairs.withColumn("_cum", F.sum("count").over(w_pref))
        in_prefix = F.col("_cum") - F.col("count") < k
        bounded = pref.withColumn(
            "_bound", F.max(F.when(in_prefix, F.col("_max_d2"))).over(w_all)
        )
        return bounded.filter(F.col("_min_d2") <= F.col("_bound")).select(
            "_qid", "cell"
        )

    def _two_phase_keep(self, qs: DataFrame, k: int) -> DataFrame:
        """Surviving (_qid, cell) per query — one- or two-STAGE descent.

        Small index: score every (query, fine cell) pair and prune (the
        round-2 plan). Large index (> COARSE_THRESHOLD cells): the
        |Q|·|cells| pair table is quadratic when probes and cells both
        scale with the data (measured 71× runtime for 10× data at sf1.0
        before this stage), so FIRST run the same exact prune against
        ~COARSE_TARGET ancestor cells, then score only the member cells of
        surviving ancestors — the reference's recursive subtree prune
        (pktree.hpp:978-1072) as two plan stages. Lossless at both stages:
        coarse boxes contain their members' boxes, so the coarse bound ≥
        the true kth distance and every ancestor holding a top-k point
        survives; the fine stage then sees every top-k candidate cell."""
        # The (query × cell) table is the big intermediate (|Q|·|cells|);
        # keep its rows NARROW — scores only, no vectors/coords — so the
        # window shuffle+sort moves a fraction of the bytes. The query
        # vector is re-attached to the ~|Q|·(cells/query) candidates after
        # pruning (measured 3-4x faster than carrying it through the sort).
        b0_ok = self._b0_broadcast_ok(qs)
        if self._n_cells() <= self.COARSE_THRESHOLD:
            pairs = self._scored_pairs(qs).select(
                "_qid", "cell", "count", "_min_d2", "_max_d2"
            )
            return self._prune_pairs(pairs, k, broadcast_b0=b0_ok)
        ladder = self._descent_ladder()
        coarse = self._coarse_stats(ladder[0]).localCheckpoint(eager=False)
        cpairs = self._scored_pairs(qs, coarse).select(
            "_qid", "cell", "count", "_min_d2", "_max_d2"
        )
        keep = self._prune_pairs(cpairs, k, broadcast_b0=b0_ok)
        mn, mx = self._box_bounds_expr(F.col("_qvec"))
        # descend: each stage expands survivors only to the NEXT ladder
        # level's grouped cells (fan-out ≤ ~DESCENT_BRANCH), finishing on
        # the true stats table — never straight from COARSE_TARGET
        # ancestors to fine members (see _descent_ladder)
        stages = [
            self._coarse_stats(lv).localCheckpoint(eager=False)
            for lv in ladder[1:]
        ] + [self.stats_df]
        qs_b = F.broadcast(qs) if self._qs_broadcast_ok(qs) else qs
        for prev_lv, stats_lv in zip(ladder, stages):
            member = stats_lv.withColumn("_ckey", self._coarse_key_expr(prev_lv))
            fpairs = (
                keep.withColumnRenamed("cell", "_ckey")
                .join(qs_b, "_qid")
                .join(F.broadcast(member), "_ckey")
                .select(
                    "_qid", "cell", "count",
                    mn.alias("_min_d2"), mx.alias("_max_d2"),
                )
            )
            keep = self._prune_pairs(fpairs, k, broadcast_b0=b0_ok)
        return keep

    def _knn_distributed(
        self,
        queries: DataFrame,
        k: int,
        query_id: str,
        query_vec: str,
        payload: Iterable[str],
    ) -> DataFrame:
        """Exact kNN for a query TABLE: candidate selection runs as a plan,
        not a driver loop, so 10⁶ probes scale the same as 10.

        Phase 1 (per query, window over the scored stats): accumulate cells
        by ascending min-distance until ≥ k points are covered; the max of
        their max-distances bounds the kth neighbor. Phase 2: keep cells
        with min-distance ≤ that bound → (query, cell) pairs. Then one join
        against the indexed data on ``cell`` (dynamic partition pruning on a
        partitioned index) + exact distance + window top-k."""
        qs = queries.select(
            F.col(query_id).alias("_qid"), F.col(query_vec).alias("_qvec")
        )
        keep = self._two_phase_keep(qs, k)
        # re-attach the query vector to the pruned (query, cell) survivors:
        # broadcast the per-probe table when the plan-size gate allows it —
        # the default SMJ pays an exchange + two sorts of the survivor
        # table to attach one vector per probe (r11)
        cand = keep.join(
            F.broadcast(qs) if self._qs_broadcast_ok(qs) else qs, "_qid"
        )

        from pyvectorsearch_spark.functions.vector import l2_sq

        d = self.df.select(
            "cell",
            F.col(self.id_col).alias("neighbor_id"),
            F.col(self.vec_col).alias("_dvec"),
            *[F.col(c) for c in payload],
        )
        scored = d.join(cand, "cell").withColumn(
            "dist", l2_sq(F.col("_dvec"), F.col("_qvec"))
        )
        w = Window.partitionBy("_qid").orderBy(
            F.col("dist").asc(), F.col("neighbor_id").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                F.col("_qid").alias("query_id"),
                "neighbor_id",
                "dist",
                "rank",
                *payload,
            )
        )

    def _range_distributed(
        self,
        queries: DataFrame,
        radius: float,
        query_id: str,
        query_vec: str,
        payload: Iterable[str],
    ) -> DataFrame:
        """Exact ε-range for a query TABLE: cells with min-distance ≤ r²
        selected per query in the plan (reject case of pktree.hpp:1161-1163),
        then one cell join + exact distance filter."""
        r2 = float(radius) ** 2
        qs = queries.select(
            F.col(query_id).alias("_qid"), F.col(query_vec).alias("_qvec")
        )
        if self._n_cells() <= self.COARSE_THRESHOLD:
            cand = (
                self._scored_pairs(qs)
                .filter(F.col("_min_d2") <= F.lit(r2))
                .select("_qid", "cell", "_qvec")
            )
        else:
            # ladder descent (see _descent_ladder): reject whole ancestors
            # with min-dist > r² before expanding to the next level —
            # trivially lossless (ancestor box contains member boxes, so
            # member min-dist ≥ ancestor min-dist); per-stage fan-out is
            # bounded by ~DESCENT_BRANCH instead of n_cells/COARSE_TARGET
            ladder = self._descent_ladder()
            keep = (
                self._scored_pairs(qs, self._coarse_stats(ladder[0]))
                .filter(F.col("_min_d2") <= F.lit(r2))
                .select("_qid", "cell")
            )
            mn, _ = self._box_bounds_expr(F.col("_qvec"))
            stages = [self._coarse_stats(lv) for lv in ladder[1:]] + [
                self.stats_df
            ]
            cand = None
            for prev_lv, stats_lv in zip(ladder, stages):
                member = stats_lv.withColumn(
                    "_ckey", self._coarse_key_expr(prev_lv)
                )
                cand = (
                    keep.withColumnRenamed("cell", "_ckey")
                    .join(qs, "_qid")
                    .join(F.broadcast(member), "_ckey")
                    .withColumn("_min_d2", mn)
                    .filter(F.col("_min_d2") <= F.lit(r2))
                )
                keep = cand.select("_qid", "cell")
            cand = cand.select("_qid", "cell", "_qvec")

        from pyvectorsearch_spark.functions.vector import l2_sq

        d = self.df.select(
            "cell",
            F.col(self.id_col).alias("neighbor_id"),
            F.col(self.vec_col).alias("_dvec"),
            *[F.col(c) for c in payload],
        )
        return (
            d.join(cand, "cell")
            .withColumn("dist", l2_sq(F.col("_dvec"), F.col("_qvec")))
            .filter(F.col("dist") <= F.lit(r2))
            .select(F.col("_qid").alias("query_id"), "neighbor_id", "dist", *payload)
        )

    # ---------------- queries ----------------

    @staticmethod
    def _guard_queries(
        queries: DataFrame, query_id: str, query_vec: str, on_invalid: str
    ) -> DataFrame:
        """Query-side validity contract (r7): ``on_invalid="error"``
        (default) makes any NULL/NaN/Inf probe raise with its id —
        compiled into the projection, zero extra jobs; ``"skip"`` filters
        invalid probes out. Without this, a NaN probe makes every cell
        bound comparison false and the search silently returns nothing."""
        from pyvectorsearch_spark.functions.vector import vec_is_finite
        from pyvectorsearch_spark.operators.knn import ON_INVALID

        if on_invalid not in ON_INVALID:
            raise ValueError(
                f"unknown on_invalid {on_invalid!r}; "
                f"expected one of {sorted(ON_INVALID)}"
            )
        ok = vec_is_finite(F.col(query_vec))
        if on_invalid == "skip":
            return queries.filter(ok)
        guarded = F.when(ok, F.col(query_vec)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("invalid query vector (NULL / NaN / Inf component) id="),
                    F.coalesce(F.col(query_id).cast("string"), F.lit("NULL")),
                    F.lit("; pass on_invalid='skip' to drop such probes"),
                )
            )
        )
        return queries.withColumn(query_vec, guarded)

    def knn(
        self,
        queries: DataFrame,
        k: int,
        *,
        query_id: str = "query_id",
        query_vec: str = "qvec",
        payload: Iterable[str] = (),
        candidates: str = "auto",
        on_invalid: str = "error",
    ) -> DataFrame:
        """Exact kNN with cell pruning (search_knn analog, pktree.hpp:948-973).

        Two-phase candidate selection per query over the cell stats: (1) take
        cells by ascending min-distance until they hold ≥ k points → the max
        of their max-distances upper-bounds the kth neighbor; (2) keep every
        cell whose min-distance ≤ that bound. One pruned scan + window top-k.

        ``candidates``: "driver" runs selection as a numpy loop over the
        collected stats (right for a handful of probes); "distributed" runs
        it as a Spark plan (right for a query TABLE — 10⁴+ probes — or an
        index whose stats table is too big to collect); "auto" picks driver
        only when the stats table is driver-sized.
        """
        if candidates not in ("auto", "driver", "distributed"):
            raise ValueError(f"unknown candidates mode {candidates!r}")
        queries = self._guard_queries(queries, query_id, query_vec, on_invalid)
        if candidates == "auto":
            candidates = "driver" if self._stats_is_small() else "distributed"
        if candidates == "distributed":
            return self._knn_distributed(queries, k, query_id, query_vec, payload)
        q_rows = queries.select(query_id, query_vec).collect()
        wanted: set[str] = set()
        cells = [s[0] for s in self.stats]
        for r in q_rows:
            q = np.asarray(list(r[1]), dtype=np.float64)
            mins, maxs, cnts = self._bounds(q)
            # The numpy TWIN of _prune_pairs (r10 optimization round — the
            # driver loop used to order by min-distance alone, so a query's
            # domain-sized covering ancestor could lead the prefix and blow
            # the bound up to cover everything: measured 487 of 543 cells
            # surviving for the sf0.1 probes, i.e. no pruning at all, plus
            # a 487-literal isin() at ~1 ms of py4j per literal):
            # (1) any single cell holding ≥ k points caps the kth distance
            #     by its max-distance (b0);
            # (2) prefix by (min, max, cell) — tightest covering cells
            #     first — until ≥ k cumulative points;
            # (3) keep cells with min ≤ both bounds. Lossless for the same
            #     reasons as the distributed form (see _prune_pairs).
            heavy = cnts >= k
            b0 = float(maxs[heavy].min()) if heavy.any() else np.inf
            live = np.where(mins <= b0)[0]
            order = live[
                np.lexsort(
                    (np.asarray(cells, dtype=object)[live], maxs[live], mins[live])
                )
            ]
            cum = 0
            bound = np.inf
            for pos, i in enumerate(order):
                cum += cnts[i]
                if cum >= k:
                    bound = float(maxs[order[: pos + 1]].max())
                    break
            sel = [cells[i] for i in live if mins[i] <= bound]
            wanted.update(sel)

        from pyvectorsearch_spark.operators.knn import knn_join

        # skip the cell filter when it would not prune (a near-full isin
        # list costs ~1 ms of py4j per literal and saves nothing at scan)
        if len(wanted) >= 0.5 * len(cells):
            pruned = self.df
        else:
            pruned = self.df.filter(F.col("cell").isin(list(wanted)))
        return knn_join(
            pruned,
            queries,
            k,
            data_id=self.id_col,
            data_vec=self.vec_col,
            query_id=query_id,
            query_vec=query_vec,
            payload=payload,
        )

    def range(
        self,
        queries: DataFrame,
        radius: float,
        *,
        query_id: str = "query_id",
        query_vec: str = "qvec",
        payload: Iterable[str] = (),
        candidates: str = "auto",
        on_invalid: str = "error",
    ) -> DataFrame:
        """Exact ε-range with the reference's 3-way cell classification
        (pktree.hpp:1161-1171): reject min>r², accept-whole max≤r², else scan
        and filter. (The accepted-whole cells still evaluate the distance
        expression so the output carries ``dist`` — correctness-neutral.)

        ``candidates`` as in :meth:`knn`."""
        if candidates not in ("auto", "driver", "distributed"):
            raise ValueError(f"unknown candidates mode {candidates!r}")
        queries = self._guard_queries(queries, query_id, query_vec, on_invalid)
        if candidates == "auto":
            candidates = "driver" if self._stats_is_small() else "distributed"
        if candidates == "distributed":
            return self._range_distributed(
                queries, radius, query_id, query_vec, payload
            )
        r2 = float(radius) ** 2
        q_rows = queries.select(query_id, query_vec).collect()
        wanted: set[str] = set()
        for r in q_rows:
            q = np.asarray(list(r[1]), dtype=np.float64)
            mins, _, _ = self._bounds(q)
            wanted.update(self.stats[i][0] for i in np.where(mins <= r2)[0])

        from pyvectorsearch_spark.operators.knn import range_join

        # near-full isin lists cost ~1 ms of py4j per literal and prune
        # nothing — skip the filter when it would keep most cells anyway
        if len(wanted) >= 0.5 * len(self.stats):
            pruned = self.df
        else:
            pruned = self.df.filter(F.col("cell").isin(list(wanted)))
        return range_join(
            pruned,
            queries,
            radius,
            data_id=self.id_col,
            data_vec=self.vec_col,
            query_id=query_id,
            query_vec=query_vec,
            payload=payload,
        )

    def range_count(
        self,
        queries: DataFrame,
        radius: float,
        *,
        query_id: str = "query_id",
        query_vec: str = "qvec",
    ) -> DataFrame:
        """COUNT-only ε-range with aggregate pushdown into the index: cells
        wholly inside the ball (max-corner distance ≤ r²) are answered from
        the stats table's per-cell COUNTS — zero rows touched — and only
        BOUNDARY cells (min ≤ r² < max) scan and filter. This is the
        aggregate twin of the reference's whole-subtree emit
        (pktree.hpp:1080-1089): where the row query emits a covered
        subtree's points verbatim, the count query emits just its size.

        At 100 TB the difference is the workload: a dense ball answered
        mostly from the (n/occupancy)-row stats table costs a broadcast
        join, not a scan. Returns (query_id, n_in_range) for probes with
        ≥ 1 match — exact, same contract as :meth:`range`."""
        r2 = float(radius) ** 2
        qs = queries.select(
            F.col(query_id).alias("_qid"), F.col(query_vec).alias("_qvec")
        )
        sp = self._scored_pairs(qs)
        inside = (
            sp.filter(F.col("_max_d2") <= F.lit(r2))
            .groupBy("_qid")
            .agg(F.sum("count").cast("bigint").alias("_n_inside"))
        )
        boundary = sp.filter(
            (F.col("_min_d2") <= F.lit(r2)) & (F.col("_max_d2") > F.lit(r2))
        ).select("_qid", "cell", "_qvec")

        from pyvectorsearch_spark.functions.vector import l2_sq

        d = self.df.select("cell", F.col(self.vec_col).alias("_dvec"))
        scanned = (
            d.join(boundary, "cell")
            .filter(l2_sq(F.col("_dvec"), F.col("_qvec")) <= F.lit(r2))
            .groupBy("_qid")
            .agg(F.count("*").cast("bigint").alias("_n_scan"))
        )
        merged = inside.join(scanned, "_qid", "full_outer").select(
            F.col("_qid").alias(query_id),
            (
                F.coalesce("_n_inside", F.lit(0)) + F.coalesce("_n_scan", F.lit(0))
            ).cast("bigint").alias("n_in_range"),
        )
        return merged.filter(F.col("n_in_range") > 0)

    def box(
        self,
        queries: DataFrame,
        *,
        query_id: str = "query_id",
        lo_col: str = "qlo",
        hi_col: str = "qhi",
        payload: Iterable[str] = (),
    ) -> DataFrame:
        """Axis-aligned box search: every point with qlo_c <= x_c <= qhi_c
        on all axes — the rectangular companion the reference's ball-only
        API lacks (its geometry supports it directly: cells are boxes, so
        classification is per-axis interval overlap instead of the
        point-to-box distance of pktree.hpp:1129-1162).

        Driver-mode candidate selection (same regime as :meth:`range`'s
        driver path): per-query overlapping cells from the stats table,
        then ONE partition-pruned scan + containment filter; cells wholly
        inside every query box could skip the filter (the accept-whole
        shortcut) — kept filtered for a single plan shape, correctness-
        neutral. A distributed twin would swap the numpy classification for
        per-axis interval predicates on the broadcast stats join, exactly
        as ``_box_bounds_expr`` does for balls.

        Returns (query_id, neighbor_id, *payload)."""
        q_rows = queries.select(query_id, lo_col, hi_col).collect()
        wanted: set[str] = set()
        for r in q_rows:
            qlo = np.asarray(list(r[1]), dtype=np.float64)
            qhi = np.asarray(list(r[2]), dtype=np.float64)
            for cell, level, coords, _cnt in self.stats:
                clo, chi = self._cell_box(level, coords)
                if bool(np.all(clo <= qhi) and np.all(qlo <= chi)):
                    wanted.add(cell)
        if len(wanted) >= 0.5 * len(self.stats):
            pruned = self.df  # the isin would not prune (see knn)
        else:
            pruned = self.df.filter(F.col("cell").isin(list(wanted)))
        qs = queries.select(
            F.col(query_id).alias("_qid"),
            F.col(lo_col).alias("_qlo"),
            F.col(hi_col).alias("_qhi"),
        )
        inside = F.forall(
            F.zip_with(F.col(self.vec_col), F.col("_qlo"), lambda x, l: x >= l),
            lambda b: b,
        ) & F.forall(
            F.zip_with(F.col(self.vec_col), F.col("_qhi"), lambda x, h: x <= h),
            lambda b: b,
        )
        cols = [
            F.col("_qid").alias(query_id),
            F.col(self.id_col).alias("neighbor_id"),
            *[F.col(c) for c in payload],
        ]
        return pruned.crossJoin(F.broadcast(qs)).filter(inside).select(*cols)

    # ---------------- persistence ----------------

    def write(
        self,
        path: str,
        mode: str = "overwrite",
        *,
        partition_rows_threshold: int = 100_000,
        target_file_rows: int = 4_000_000,
    ) -> None:
        """Persist as parquet + a stats/descriptor table — the durable index
        the reference never had (its tree dies with the process,
        pktree.hpp:1211-1214).

        Layout adapts to cell size: big cells (≥ ``partition_rows_threshold``
        rows on average — the 100 TB regime) get directory partitioning so
        ``cell`` filters become partition pruning; small cells get a handful
        of range-partitioned files SORTED by cell, so the same filters prune
        via parquet row-group min/max stats without drowning the filesystem
        in per-cell directories (a 543-cell index over 2000 rows measured
        4.3 s just to LIST when dir-partitioned)."""
        agg = self.stats_df.agg(
            F.sum("count").alias("n"), F.count("*").alias("n_cells")
        ).first()
        n = int(agg["n"] or 0)
        n_cells = max(int(agg["n_cells"]), 1)
        if n and n / n_cells >= partition_rows_threshold:
            self.df.repartition("cell").write.mode(mode).partitionBy(
                "cell"
            ).parquet(f"{path}/data")
        else:
            files = max(1, math.ceil(n / max(target_file_rows, 1)))
            (
                self.df.repartitionByRange(files, "cell")
                .sortWithinPartitions("cell")
                .write.mode(mode)
                .parquet(f"{path}/data")
            )
        # Stats written straight from the DataFrame — never collected. The
        # index parameters (a dozen scalars) ride on every row as literals;
        # the table stays one file per ~hundred MB of cells.
        meta = (
            self.stats_df.withColumn(
                "origin", F.array(*[F.lit(float(x)) for x in self.origin])
            )
            .withColumn("width", F.lit(float(self.width)))
            .withColumn("dim", F.lit(int(self.dim)))
            .withColumn("rank", F.lit(int(self.rank)))
            .withColumn("rr", F.lit(int(self.rr)))
            .withColumn("ratio", F.lit(int(self.ratio)))
            .withColumn("fine_level", F.lit(int(self.fine_level)))
            .withColumn("id_col", F.lit(self.id_col))
            .withColumn("vec_col", F.lit(self.vec_col))
        )
        files = max(1, math.ceil(n_cells / 2_000_000))
        meta.coalesce(files).write.mode(mode).parquet(f"{path}/stats")

    @staticmethod
    def load(spark: SparkSession, path: str) -> "GridIndex":
        data = spark.read.parquet(f"{path}/data")
        stats_src = spark.read.parquet(f"{path}/stats")
        # params ride on every row; grab one row WITHOUT a Spark job when
        # the artifact is local (read_sidecar_head) — the old .first() paid
        # a full job per query invocation (r10 optimization round)
        from pyvectorsearch_spark.index.cache import (
            read_sidecar_head,
            read_small_sidecar,
            sidecar_num_rows,
        )

        head = read_sidecar_head(
            f"{path}/stats",
            columns=[
                "origin", "width", "dim", "rank", "rr", "ratio",
                "fine_level", "id_col", "vec_col",
            ],
        ) or stats_src.first()
        # Pre-populate the driver-side cell list when the stats table is
        # driver-sized (the _stats_is_small bound, checked against FOOTER
        # metadata only): the driver candidate path otherwise pays a count
        # job + a collect job per QUERY invocation for a table we already
        # have locally. Bigger artifacts keep the lazy distributed stats
        # exactly as before (r10 optimization round).
        local_stats = None
        n_stats = sidecar_num_rows(f"{path}/stats")
        if n_stats is not None and n_stats <= 200_000:
            cell_rows = read_small_sidecar(
                f"{path}/stats",
                columns=["cell", "level", "coords", "count"],
            )
            if cell_rows is not None:
                local_stats = [
                    (
                        r["cell"],
                        int(r["level"]),
                        tuple(int(x) for x in r["coords"]),
                        int(r["count"]),
                    )
                    for r in cell_rows
                ]
        stats_df = stats_src.select(
            "cell",
            F.col("level").cast("int").alias("level"),
            F.transform("coords", lambda x: x.cast("long")).alias("coords"),
            F.col("count").cast("long").alias("count"),
        )
        return GridIndex(
            df=data,
            stats_df=stats_df,
            origin=list(head["origin"]),
            width=head["width"],
            dim=head["dim"],
            rank=head["rank"],
            rr=head["rr"],
            ratio=head["ratio"],
            fine_level=head["fine_level"],
            id_col=head["id_col"],
            vec_col=head["vec_col"],
            _local_stats=local_stats,
            _stats_count=n_stats,
        )
