"""Round-10 pins for the four ADVICE r9 findings on the rebalance sidecar
(`index/incremental.py`):

1. (medium) A pre-r9 (old-layout) pointer must make the WRITER fail loud —
   the reader-side None would silently restart the sidecar from
   batch_id=-1 and orphan every pre-upgrade row behind the mapping join.
2. (low) Caller geometry that disagrees with the pointer's recorded
   geometry must raise up front, never silently overwrite the stored
   geometry / mix ranks between cascade and remap.
3. (low) The janitor is DEFERRED: a fold must leave the superseded base
   and folded deltas on disk until the NEXT apply, so a reader holding a
   pre-fold lazy DataFrame can still execute; the next apply cleans them.
4. (low) The in-memory maintenance cache cap is GLOBAL across meta_paths
   (LRU eviction), not per-entry — several concurrent sidecars cannot
   accumulate multiple near-cap caches.
"""

from __future__ import annotations

import json
import os

import pytest

import pyvectorsearch_spark.index.incremental as inc
from pyvectorsearch_spark.index.grid import _kinstantiate_driver
from pyvectorsearch_spark.index.incremental import (
    apply_batch_rebalance,
    read_mapping,
    read_pointer,
    read_stats,
)

FINE, DIM, RR, RATIO, RANK = 6, 2, 2, 2, 4
GEOM = dict(fine_level=FINE, dim=DIM, rr=RR, ratio=RATIO, rank=RANK)


def _apply(spark, meta, cells, bid, **kw):
    df = spark.createDataFrame([(c,) for c in cells], "cell string")
    merged = {**GEOM, **kw}
    apply_batch_rebalance(
        spark, assigned_batch=df, batch_id=bid, meta_path=meta, **merged
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


class TestWriterRefusesOldLayout:
    def test_writer_raises_on_old_layout_pointer(self, spark, tmp_path):
        meta = str(tmp_path / "meta")
        os.makedirs(meta)
        with open(os.path.join(meta, "LATEST.json"), "w") as fh:
            json.dump({"version": 3, "batch_id": 7}, fh)  # r7 layout
        # reader behavior unchanged: None / loud downstream
        assert read_pointer(meta) is None
        with pytest.raises(ValueError, match="layout"):
            _apply(spark, meta, [f"{FINE}_0_0"] * 4, 8)
        # and the refused apply must not have touched the artifact: the
        # old pointer file is intact, no sidecar dirs were created
        with open(os.path.join(meta, "LATEST.json")) as fh:
            assert json.load(fh) == {"version": 3, "batch_id": 7}
        assert not os.path.isdir(os.path.join(meta, "state"))

    def test_no_pointer_at_all_still_bootstraps(self, spark, tmp_path):
        meta = str(tmp_path / "meta")  # absent dir != incompatible layout
        _apply(spark, meta, [f"{FINE}_0_0"] * 4, 0)
        assert read_pointer(meta)["batch_id"] == 0


class TestGeometryValidation:
    def test_mismatched_rank_raises(self, spark, tmp_path):
        meta = str(tmp_path / "meta")
        _apply(spark, meta, [f"{FINE}_0_0"] * 4, 0)
        with pytest.raises(ValueError, match="rank: recorded 4 != caller 5"):
            _apply(spark, meta, [f"{FINE}_1_1"] * 4, 1, rank=5)
        # the failed apply committed nothing
        assert read_pointer(meta)["batch_id"] == 0
        acc = {f"{FINE}_0_0": 4}
        assert _maintained(spark, meta) == _ground_truth(acc)

    def test_mismatched_fine_level_raises(self, spark, tmp_path):
        meta = str(tmp_path / "meta")
        _apply(spark, meta, [f"{FINE}_0_0"] * 4, 0)
        with pytest.raises(ValueError, match="fine_level"):
            _apply(spark, meta, ["7_0_0"] * 4, 1, fine_level=7)

    def test_matching_geometry_proceeds(self, spark, tmp_path):
        meta = str(tmp_path / "meta")
        _apply(spark, meta, [f"{FINE}_0_0"] * 4, 0)
        _apply(spark, meta, [f"{FINE}_2_2"] * 4, 1)  # same GEOM: fine
        acc = {f"{FINE}_0_0": 4, f"{FINE}_2_2": 4}
        assert _maintained(spark, meta) == _ground_truth(acc)


class TestDeferredJanitor:
    def test_fold_retains_superseded_dirs_for_one_apply(
        self, spark, tmp_path
    ):
        meta = str(tmp_path / "meta")
        _apply(spark, meta, [f"{FINE}_0_0"] * 4, 0, fold_every=2)
        # a reader captures the pointer (and its file set) pre-fold
        pre_fold_map = read_mapping(spark, meta)
        b0 = os.path.join(meta, "state", "b=0")
        assert os.path.isdir(b0)
        # batch 1 folds (live deltas {0,1} >= fold_every=2)
        _apply(spark, meta, [f"{FINE}_2_2"] * 4, 1, fold_every=2)
        ptr = read_pointer(meta)
        assert ptr["state_base"] is not None  # the fold happened
        # superseded folded deltas are STILL on disk (deferred janitor) …
        assert os.path.isdir(b0)
        # … so the pre-fold lazy reader still executes correctly
        got = {r["_fine"]: r["cell"] for r in pre_fold_map.collect()}
        want, _ = _ground_truth({f"{FINE}_0_0": 4})
        assert got == want
        # the NEXT apply's opening janitor retires them
        _apply(spark, meta, [f"{FINE}_4_4"] * 4, 2, fold_every=2)
        assert not os.path.isdir(b0)
        acc = {f"{FINE}_0_0": 4, f"{FINE}_2_2": 4, f"{FINE}_4_4": 4}
        assert _maintained(spark, meta) == _ground_truth(acc)

    def test_full_rebuild_also_defers(self, spark, tmp_path):
        """The giant-batch fallback publishes fresh bases; the old delta
        dirs must survive until the next apply too."""
        meta = str(tmp_path / "meta")
        _apply(spark, meta, [f"{FINE}_0_0"] * 4, 0)
        b0 = os.path.join(meta, "state", "b=0")
        assert os.path.isdir(b0)
        cells = [f"{FINE}_{i}_{j}" for i in range(4) for j in range(4)]
        _apply(spark, meta, cells, 1, driver_cell_limit=4)  # forces rebuild
        assert read_pointer(meta)["state_base"] is not None
        assert os.path.isdir(b0)  # deferred
        _apply(spark, meta, [f"{FINE}_0_0"] * 2, 2, driver_cell_limit=4)
        assert not os.path.isdir(b0)  # next apply cleaned
        acc = {c: 1 for c in cells}
        acc[f"{FINE}_0_0"] += 6
        assert _maintained(spark, meta) == _ground_truth(acc)


class TestGlobalCacheCap:
    def test_lru_eviction_across_meta_paths(
        self, spark, tmp_path, monkeypatch
    ):
        """Two sidecars under a tiny global cap: the LRU one's cache is
        evicted when the second fills, total cached rows stay bounded, and
        BOTH sidecars remain ground-truth correct (the evicted one rebuilds
        its view from disk on its next batch)."""
        monkeypatch.setattr(inc, "_CACHE_MAX_ROWS", 40)
        monkeypatch.setattr(inc, "_CACHE", {})
        meta_a = str(tmp_path / "a")
        meta_b = str(tmp_path / "b")
        acc_a: dict[str, int] = {}
        acc_b: dict[str, int] = {}
        for bid in range(4):
            cells_a = [f"{FINE}_{bid}_{j}" for j in range(3)]
            cells_b = [f"{FINE}_{j}_{bid}" for j in range(3)]
            _apply(spark, meta_a, cells_a, bid)
            _apply(spark, meta_b, cells_b, bid)
            for c in cells_a:
                acc_a[c] = acc_a.get(c, 0) + 1
            for c in cells_b:
                acc_b[c] = acc_b.get(c, 0) + 1
            total = sum(len(c["state"]) for c in inc._CACHE.values())
            assert total <= 40, f"global cap violated at batch {bid}"
        # with each sidecar's closure well past 20 rows by batch 3, both
        # cannot be cached at once under cap 40
        assert len(inc._CACHE) <= 1
        assert _maintained(spark, meta_a) == _ground_truth(acc_a)
        assert _maintained(spark, meta_b) == _ground_truth(acc_b)

    def test_recent_entry_survives_eviction(
        self, spark, tmp_path, monkeypatch
    ):
        monkeypatch.setattr(inc, "_CACHE_MAX_ROWS", 60)
        monkeypatch.setattr(inc, "_CACHE", {})
        meta_a = str(tmp_path / "a")
        meta_b = str(tmp_path / "b")
        _apply(spark, meta_a, [f"{FINE}_0_{j}" for j in range(4)], 0)
        rows_a = (
            len(inc._CACHE[meta_a]["state"]) if meta_a in inc._CACHE else 0
        )
        _apply(spark, meta_b, [f"{FINE}_{j}_0" for j in range(4)], 0)
        if meta_b in inc._CACHE and rows_a and (
            rows_a + len(inc._CACHE[meta_b]["state"]) > 60
        ):
            # eviction picked the LRU (meta_a), kept the fresh entry
            assert meta_a not in inc._CACHE
        # single-entry overflow is dropped outright, never kept over-cap
        total = sum(len(c["state"]) for c in inc._CACHE.values())
        assert total <= 60
