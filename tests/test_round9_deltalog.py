"""Round-9: log-structured rebalance sidecar (VERDICT r8's one `weak`).

The r7 incremental rebalance re-ran the cascade over the WHOLE count table
and republished full mapping/stats from the driver every micro-batch —
O(total cells) of driver work per batch. The r9 sidecar
(`index/incremental.py`) keeps a node-state table as base + batch-keyed
delta dirs: per batch it touches only the ancestor closure of the cells the
batch hit, so driver cost is bounded by the BATCH.

Pins here:
(a) equivalence: after EVERY batch, maintained mapping/stats/fine-counts
    equal `_kinstantiate_driver` ground truth over the accumulated counts —
    including dissolve/instantiate flips and out-of-box negatives;
(b) flat per-batch publish: a 1-cell batch against a large existing state
    writes a delta of O(depth) rows, never O(cells);
(c) replay is a pointer-guarded no-op; a crashed half-write above the
    pointer is janitored and rewritten;
(d) fold: bases collapse on cadence, reads stay identical across folds;
(e) the giant-batch fallback (distributed cascade) publishes the same
    tables the incremental path would;
(f) stale pre-r9 pointers (old layout) are refused, not misread.
"""

from __future__ import annotations

import json
import os
import random

import pytest
from pyspark.sql import functions as F

from pyvectorsearch_spark.index.grid import _kinstantiate_driver
from pyvectorsearch_spark.index.incremental import (
    _delta_dir,
    apply_batch_rebalance,
    read_fine_counts,
    read_mapping,
    read_pointer,
    read_state,
    read_stats,
)

pytestmark = pytest.mark.slow  # soak/property tier: excluded from the default (driver-visible) run, see pytest.ini (r11)

FINE, DIM, RR, RATIO, RANK = 6, 2, 2, 2, 4
GEOM = dict(fine_level=FINE, dim=DIM, rr=RR, ratio=RATIO, rank=RANK)


def _apply(spark, meta, cells, bid, **kw):
    df = spark.createDataFrame([(c,) for c in cells], "cell string")
    apply_batch_rebalance(
        spark, assigned_batch=df, batch_id=bid, meta_path=meta, **GEOM, **kw
    )


def _ground_truth(acc):
    assign, stats = _kinstantiate_driver(dict(acc), **GEOM)
    return assign, sorted(
        (cid, lvl, tuple(cds), cnt) for cid, lvl, cds, cnt in stats
    )


def _maintained(spark, meta):
    got_map = {
        r["_fine"]: r["cell"] for r in read_mapping(spark, meta).collect()
    }
    got_stats = sorted(
        (r["cell"], r["level"], tuple(r["coords"]), r["count"])
        for r in read_stats(spark, meta).collect()
    )
    return got_map, got_stats


class TestEquivalence:
    def test_every_batch_equals_ground_truth(self, spark, tmp_path):
        """Randomized drain incl. out-of-box negatives and an aggressive
        fold cadence; maintained tables must equal the batch cascade after
        every single batch (flips, dissolves, remaps included)."""
        meta = str(tmp_path / "meta")
        rng = random.Random(93)
        acc: dict[str, int] = {}
        for b in range(10):
            cells = [
                f"{FINE}_{rng.randint(-2, 10)}_{rng.randint(-2, 10)}"
                for _ in range(12)
            ]
            _apply(spark, meta, cells, b, fold_every=3)
            for c in cells:
                acc[c] = acc.get(c, 0) + 1
            want_map, want_stats = _ground_truth(acc)
            got_map, got_stats = _maintained(spark, meta)
            assert got_map == want_map, f"batch {b}"
            assert got_stats == want_stats, f"batch {b}"
        fc = {
            r["_fine"]: r["count"]
            for r in read_fine_counts(spark, meta).collect()
        }
        assert fc == acc

    def test_dissolve_then_reinstantiate_remaps_outsiders(
        self, spark, tmp_path
    ):
        """The cross-batch flip scenario the delta design must get right:
        batch 0 leaves two under-full siblings owned by their parent;
        batch 1 fills ONE sibling past rank — it captures its own mass,
        the parent may dissolve, and the OTHER sibling's rows (untouched
        by batch 1) must re-home without being in the batch."""
        meta = str(tmp_path / "meta")
        _apply(spark, meta, [f"{FINE}_0_0"] * 2 + [f"{FINE}_1_1"] * 2, 0)
        want0, _ = _ground_truth({f"{FINE}_0_0": 2, f"{FINE}_1_1": 2})
        got0, _ = _maintained(spark, meta)
        assert got0 == want0
        assert got0[f"{FINE}_0_0"] == got0[f"{FINE}_1_1"]  # shared parent
        _apply(spark, meta, [f"{FINE}_0_0"] * 3, 1)  # only one sibling grows
        acc = {f"{FINE}_0_0": 5, f"{FINE}_1_1": 2}
        want1, want_stats = _ground_truth(acc)
        got1, got_stats = _maintained(spark, meta)
        assert got1 == want1 and got_stats == want_stats
        assert got1[f"{FINE}_0_0"] == f"{FINE}_0_0"  # captured at fine level
        assert got1[f"{FINE}_1_1"] != got0[f"{FINE}_1_1"]  # outsider re-homed


class TestFlatPerBatchCost:
    def test_single_cell_batch_writes_depth_not_cells(self, spark, tmp_path):
        """The scale pin: against a state holding hundreds of cells, a
        1-cell batch publishes O(depth) state rows and O(1) mapping rows —
        the r7 design republished EVERYTHING (O(cells)) here."""
        meta = str(tmp_path / "meta")
        rng = random.Random(5)
        wide = [
            f"{FINE}_{rng.randint(0, 40)}_{rng.randint(0, 40)}"
            for _ in range(600)
        ]
        _apply(spark, meta, wide, 0)
        n_cells = read_state(spark, meta).count()
        assert n_cells > 300  # the state is genuinely wide
        _apply(spark, meta, [f"{FINE}_7_9"], 1)
        srows = spark.read.parquet(_delta_dir(meta, "state", 1)).count()
        mrows = spark.read.parquet(_delta_dir(meta, "mapping", 1)).count()
        assert srows <= FINE + 1, srows  # one chain, fine..0
        # flips can cascade up the chain; each captures/releases < rank of
        # mass, so remaps are bounded by |batch| + depth*rank — never by
        # the total cell count (600 here)
        assert mrows <= 1 + (FINE + 1) * RANK, mrows


class TestCommitProtocol:
    def test_replay_is_noop(self, spark, tmp_path):
        meta = str(tmp_path / "meta")
        _apply(spark, meta, [f"{FINE}_0_0"] * 3, 0)
        before = read_pointer(meta)
        state_before = _maintained(spark, meta)
        _apply(spark, meta, [f"{FINE}_0_0"] * 3, 0)  # replay
        assert read_pointer(meta) == before
        assert _maintained(spark, meta) == state_before

    def test_crashed_halfwrite_above_pointer_is_invisible(
        self, spark, tmp_path
    ):
        """A delta dir with id above the pointer (crash between delta write
        and pointer flip) must be ignored by readers and rewritten by the
        replay."""
        meta = str(tmp_path / "meta")
        _apply(spark, meta, [f"{FINE}_0_0"] * 4, 0)
        want = _maintained(spark, meta)
        # fake a crashed batch-1 attempt: garbage delta, no pointer flip
        spark.createDataFrame(
            [("6_9_9", 6, 999)], "cell string, level int, pending long"
        ).write.parquet(_delta_dir(meta, "state", 1))
        assert _maintained(spark, meta) == want  # reader ignores it
        _apply(spark, meta, [f"{FINE}_2_2"] * 4, 1)  # the real batch 1
        acc = {f"{FINE}_0_0": 4, f"{FINE}_2_2": 4}
        want_map, want_stats = _ground_truth(acc)
        assert _maintained(spark, meta) == (want_map, want_stats)

    def test_old_layout_pointer_refused(self, spark, tmp_path):
        meta = str(tmp_path / "meta")
        os.makedirs(meta)
        with open(os.path.join(meta, "LATEST.json"), "w") as fh:
            json.dump({"version": 3, "batch_id": 7}, fh)  # r7 layout
        assert read_pointer(meta) is None
        with pytest.raises(ValueError, match="no published rebalance meta"):
            read_mapping(spark, meta)


class TestFoldAndFallback:
    def test_fold_preserves_reads_and_bounds_log(self, spark, tmp_path):
        meta = str(tmp_path / "meta")
        rng = random.Random(11)
        acc: dict[str, int] = {}
        for b in range(7):
            cells = [
                f"{FINE}_{rng.randint(0, 6)}_{rng.randint(0, 6)}"
                for _ in range(8)
            ]
            _apply(spark, meta, cells, b, fold_every=2)
            for c in cells:
                acc[c] = acc.get(c, 0) + 1
        ptr = read_pointer(meta)
        assert ptr["state_base"] is not None  # folds actually happened
        for kind in ("state", "mapping"):
            deltas = [
                d for d in os.listdir(os.path.join(meta, kind))
                if d.startswith("b=")
            ]
            assert len(deltas) < 2  # log stays short
        assert _maintained(spark, meta) == _ground_truth(acc)

    def test_giant_batch_falls_back_to_distributed(self, spark, tmp_path):
        """driver_cell_limit=4 forces the fallback; results must still
        equal ground truth and subsequent small batches must resume the
        incremental path on top of the published base."""
        meta = str(tmp_path / "meta")
        cells0 = [f"{FINE}_{i}_{j}" for i in range(4) for j in range(4)]
        _apply(spark, meta, cells0, 0, driver_cell_limit=4)
        acc = {c: 1 for c in cells0}
        assert _maintained(spark, meta) == _ground_truth(acc)
        ptr = read_pointer(meta)
        assert ptr["state_base"] is not None  # fallback published a base
        _apply(spark, meta, [f"{FINE}_0_0"] * 3, 1, driver_cell_limit=4)
        acc[f"{FINE}_0_0"] += 3
        assert _maintained(spark, meta) == _ground_truth(acc)


class TestStreamedSoakMiniature:
    def test_deep_lattice_drain_miniature(self, spark, tmp_path):
        """The 500k-cell soak in miniature (VERDICT r8 ask #4's pinned
        twin; full-size rows in SCALING.md): a deep one-point-per-cell
        lattice drained through the REAL streaming path with the
        log-structured rebalance on. Pins: maintained tables equal the
        batch cascade over the final counts; one live base or a short
        delta log; exactly-once pointer; fine counts conserve the rows."""
        from pyspark.sql import functions as SF

        from pyvectorsearch_spark.index.incremental import (
            read_fine_counts,
            read_mapping,
            read_pointer,
            read_stats,
        )
        from pyvectorsearch_spark.streaming.ingest import stream_index_ingest

        side = 45  # 2025 fine cells at ~1 row/cell
        pts = spark.range(side * side).select(
            SF.col("id").alias("vec_id"),
            SF.array(
                (SF.col("id") % side).cast("double") * 8.0,
                (SF.col("id") / side).cast("long").cast("double") * 8.0,
            ).cast("array<float>").alias("p2"),
        )
        landing = str(tmp_path / "landing")
        pts.repartition(8).write.parquet(landing)
        out, ck, meta = (
            str(tmp_path / "o"), str(tmp_path / "c"), str(tmp_path / "m")
        )
        from pyvectorsearch_spark.index.grid import GridIndex

        geom = GridIndex.build(
            pts, vec_col="p2", id_col="vec_id", target_occupancy=1
        )
        schema = spark.read.parquet(landing).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        assign = lambda df: df.withColumn(  # noqa: E731
            "cell",
            GridIndex._cell_expr(
                "p2", geom.origin, geom.width, geom.fine_level,
                geom.dim, geom.rr, geom.ratio, clamp=False,
            ),
        )
        q = stream_index_ingest(
            stream, assign=assign, out_path=out, checkpoint=ck,
            compact_min_batches=4,
            rebalance=dict(
                meta_path=meta, fine_level=geom.fine_level, dim=geom.dim,
                rr=geom.rr, ratio=geom.ratio, rank=geom.rank,
                fold_every=4,
            ),
        )
        assert q.awaitTermination(300)
        assert read_pointer(meta)["batch_id"] == 7
        fc = {
            r["_fine"]: r["count"]
            for r in read_fine_counts(spark, meta).collect()
        }
        assert sum(fc.values()) == side * side
        got_map = {
            r["_fine"]: r["cell"]
            for r in read_mapping(spark, meta).collect()
        }
        got_stats = sorted(
            (r["cell"], r["level"], tuple(r["coords"]), r["count"])
            for r in read_stats(spark, meta).collect()
        )

        def _gt(acc):
            assign_gt, stats_gt = _kinstantiate_driver(
                dict(acc), fine_level=geom.fine_level, dim=geom.dim,
                rr=geom.rr, ratio=geom.ratio, rank=geom.rank,
            )
            return assign_gt, sorted(
                (cid, lvl, tuple(cds), cnt)
                for cid, lvl, cds, cnt in stats_gt
            )

        want_map, want_stats = _gt(fc)
        assert got_map == want_map
        assert got_stats == want_stats
        # fold kept the log short
        for kind in ("state", "mapping"):
            deltas = [
                d for d in os.listdir(os.path.join(meta, kind))
                if d.startswith("b=")
            ]
            assert len(deltas) <= 4, (kind, deltas)
