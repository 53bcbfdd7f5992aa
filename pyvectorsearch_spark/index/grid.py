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
from dataclasses import dataclass
from typing import Iterable, Sequence

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

CELL_SEP = "_"


def _slices(level: int, dim: int, rr: int) -> list[int]:
    """Per-axis slice count at ``level`` (pktree.hpp:357-363)."""
    return [(level * rr + dim - c - 1) // dim for c in range(dim)]


@dataclass
class GridIndex:
    """A built grid index: cell assignment per row + cell statistics.

    ``df`` carries the source rows plus a ``cell`` string column
    (``"level_c0_c1_..."``); ``stats`` is the driver-side cell table
    [(cell, level, coords, count)]. ``origin``/``width`` define the root box
    (reference ``_O``/``_width``, pktree.hpp:307-309).
    """

    df: DataFrame
    stats: list[tuple[str, int, tuple[int, ...], int]]
    origin: list[float]
    width: float
    dim: int
    rank: int
    rr: int
    ratio: int
    fine_level: int
    id_col: str
    vec_col: str

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
        mins = [F.min(F.element_at(F.col(vec_col), c + 1)).alias(f"mn{c}") for c in range(dim)]
        maxs = [F.max(F.element_at(F.col(vec_col), c + 1)).alias(f"mx{c}") for c in range(dim)]
        row = df.agg(*mins, *maxs).first()
        origin = [float(row[f"mn{c}"]) for c in range(dim)]
        extent = max(
            max(float(row[f"mx{c}"]) - origin[c] for c in range(dim)), 1e-12
        )
        width = extent * (1 + 1e-9)  # open upper edge: max point stays inside

        n = df.count()
        if fine_level is None:
            # enough total slices that average occupancy ≈ target if uniform
            cells_needed = max(n / max(target_occupancy, 1), 1.0)
            total_slices = max(int(math.ceil(math.log(cells_needed, ratio))), 0)
            fine_level = int(math.ceil(total_slices * dim / rr)) if total_slices else 0

        cell_expr = GridIndex._cell_expr(vec_col, origin, width, fine_level, dim, rr, ratio)
        fine = df.withColumn("_fine", cell_expr)

        if coalesce_strategy not in ("auto", "driver", "distributed"):
            raise ValueError(f"unknown coalesce_strategy {coalesce_strategy!r}")
        if coalesce_strategy == "auto":
            n_fine = fine.select(F.countDistinct("_fine")).first()[0]
            coalesce_strategy = (
                "driver" if n_fine <= driver_cell_limit else "distributed"
            )
        if coalesce_strategy == "distributed":
            return GridIndex._build_distributed(
                fine, origin, width, dim, rank, rr, ratio, fine_level,
                id_col, vec_col,
            )

        # Stats at the fine level (small: ≤ n/1 rows, typically n/occupancy).
        fine_stats = fine.groupBy("_fine").count().collect()
        coords_of = {
            r["_fine"]: tuple(int(x) for x in r["_fine"].split(CELL_SEP)[1:])
            for r in fine_stats
        }
        counts = {r["_fine"]: r["count"] for r in fine_stats}

        # Bottom-up K-instantiation: an under-full cell dissolves into its
        # parent until the merged cell owns ≥ rank points (or level 0).
        assign: dict[str, str] = {}
        stats: list[tuple[str, int, tuple[int, ...], int]] = []
        pending: dict[tuple[int, ...], tuple[int, list[str]]] = {
            coords_of[cid]: (cnt, [cid]) for cid, cnt in counts.items()
        }
        level = fine_level
        while pending and level > 0:
            nxt: dict[tuple[int, ...], tuple[int, list[str]]] = {}
            s_cur = _slices(level, len(origin), rr)
            s_par = _slices(level - 1, len(origin), rr)
            for coords, (cnt, members) in pending.items():
                if cnt >= rank:
                    cid = CELL_SEP.join([str(level)] + [str(c) for c in coords])
                    stats.append((cid, level, coords, cnt))
                    for m in members:
                        assign[m] = cid
                else:
                    parent = tuple(
                        c // (ratio ** (s_cur[i] - s_par[i])) for i, c in enumerate(coords)
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

        mapping = spark.createDataFrame(
            [(k, v) for k, v in assign.items()], "_fine string, cell string"
        )
        indexed = fine.join(F.broadcast(mapping), "_fine").drop("_fine")
        return GridIndex(
            df=indexed,
            stats=stats,
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
        spark = fine.sparkSession
        fine_counts = fine.groupBy("_fine").count()
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
        for l in range(fine_level, 0, -1):
            pending = pending.persist()
            inst_parts.append(
                pending.filter(F.col("cnt") >= rank).select(
                    F.lit(l).alias("lvl"), cell_id(l).alias("anc"), "cnt"
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
            pending.select(F.lit(0).alias("lvl"), cell_id(0).alias("anc"), "cnt")
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
        indexed = fine.join(chosen, "_fine").drop("_fine")

        stats_rows = instantiated.collect()
        stats = [
            (
                r["anc"],
                int(r["anc"].split(CELL_SEP)[0]),
                tuple(int(x) for x in r["anc"].split(CELL_SEP)[1:]),
                int(r["cnt"]),
            )
            for r in stats_rows
        ]
        return GridIndex(
            df=indexed,
            stats=stats,
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
    ):
        """Closed-form cell id at ``level``: per-axis
        floor((p_c − O_c) / w_c) with w_c = width·ratio^(−slices_c)
        (pktree.hpp:373-379,538-580) — a pure Catalyst expression."""
        s = _slices(level, dim, rr)
        parts = [F.lit(str(level))]
        for c in range(dim):
            w_c = width * (ratio ** -s[c])
            coord = F.floor(
                (F.element_at(F.col(vec_col), c + 1).cast("double") - float(origin[c]))
                / float(w_c)
            )
            # clamp: points on the open upper edge / query-side reuse
            coord = F.greatest(F.least(coord, F.lit((ratio ** s[c]) - 1)), F.lit(0))
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

    # ---------------- queries ----------------

    def knn(
        self,
        queries: DataFrame,
        k: int,
        *,
        query_id: str = "query_id",
        query_vec: str = "qvec",
        payload: Iterable[str] = (),
    ) -> DataFrame:
        """Exact kNN with cell pruning (search_knn analog, pktree.hpp:948-973).

        Two-phase candidate selection per query over the cell stats: (1) take
        cells by ascending min-distance until they hold ≥ k points → the max
        of their max-distances upper-bounds the kth neighbor; (2) keep every
        cell whose min-distance ≤ that bound. One pruned scan + window top-k.
        """
        q_rows = queries.select(query_id, query_vec).collect()
        wanted: set[str] = set()
        for r in q_rows:
            q = np.asarray(list(r[1]), dtype=np.float64)
            mins, maxs, cnts = self._bounds(q)
            order = np.argsort(mins, kind="stable")
            cum = 0
            bound = np.inf
            for pos, i in enumerate(order):
                cum += cnts[i]
                if cum >= k:
                    bound = float(maxs[order[: pos + 1]].max())
                    break
            sel = [self.stats[i][0] for i in np.where(mins <= bound)[0]]
            wanted.update(sel)

        from pyvectorsearch_spark.operators.knn import knn_join

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
    ) -> DataFrame:
        """Exact ε-range with the reference's 3-way cell classification
        (pktree.hpp:1161-1171): reject min>r², accept-whole max≤r², else scan
        and filter. (The accepted-whole cells still evaluate the distance
        expression so the output carries ``dist`` — correctness-neutral.)"""
        r2 = float(radius) ** 2
        q_rows = queries.select(query_id, query_vec).collect()
        wanted: set[str] = set()
        for r in q_rows:
            q = np.asarray(list(r[1]), dtype=np.float64)
            mins, _, _ = self._bounds(q)
            wanted.update(self.stats[i][0] for i in np.where(mins <= r2)[0])

        from pyvectorsearch_spark.operators.knn import range_join

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
        n = sum(cnt for _, _, _, cnt in self.stats)
        n_cells = max(len(self.stats), 1)
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
        spark = self.df.sparkSession
        meta_rows = [
            (
                cid,
                int(level),
                list(map(int, coords)),
                int(cnt),
                self.origin,
                float(self.width),
                int(self.dim),
                int(self.rank),
                int(self.rr),
                int(self.ratio),
                int(self.fine_level),
                self.id_col,
                self.vec_col,
            )
            for cid, level, coords, cnt in self.stats
        ]
        schema = (
            "cell string, level int, coords array<int>, count long, "
            "origin array<double>, width double, dim int, rank int, rr int, "
            "ratio int, fine_level int, id_col string, vec_col string"
        )
        spark.createDataFrame(meta_rows, schema).coalesce(1).write.mode(mode).parquet(
            f"{path}/stats"
        )

    @staticmethod
    def load(spark: SparkSession, path: str) -> "GridIndex":
        data = spark.read.parquet(f"{path}/data")
        stats_df = spark.read.parquet(f"{path}/stats")
        rows = stats_df.collect()
        head = rows[0]
        stats = [(r["cell"], r["level"], tuple(r["coords"]), r["count"]) for r in rows]
        return GridIndex(
            df=data,
            stats=stats,
            origin=list(head["origin"]),
            width=head["width"],
            dim=head["dim"],
            rank=head["rank"],
            rr=head["rr"],
            ratio=head["ratio"],
            fine_level=head["fine_level"],
            id_col=head["id_col"],
            vec_col=head["vec_col"],
        )
