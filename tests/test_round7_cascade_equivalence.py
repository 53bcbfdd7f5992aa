"""Round-7: the two K-instantiation cascade implementations are one
algorithm. `_kinstantiate_driver` (collected dict) and
`_kinstantiate_distributed` (DataFrame loop) were factored out of
GridIndex.build for the streaming incremental rebalance; this pins that
they produce IDENTICAL mapping + stats on the same count table — including
out-of-box (negative-coord) fine cells and cells already at level 0 scale.
"""
from __future__ import annotations

import random

from pyspark.sql import functions as F

from pyvectorsearch_spark.index.grid import (
    CELL_SEP,
    _kinstantiate_distributed,
    _kinstantiate_driver,
    _slices,
)


def _fine_id(level, coords):
    return CELL_SEP.join([str(level)] + [str(c) for c in coords])


def _run_both(spark, counts, fine_level, dim, rr=2, ratio=2, rank=3):
    assign_d, stats_d = _kinstantiate_driver(
        counts, fine_level=fine_level, dim=dim, rr=rr, ratio=ratio, rank=rank
    )
    fc = spark.createDataFrame(
        [(k, v) for k, v in counts.items()], "_fine string, count long"
    ).localCheckpoint(eager=True)
    mapping_df, stats_df = _kinstantiate_distributed(
        fc, fine_level=fine_level, dim=dim, rr=rr, ratio=ratio, rank=rank
    )
    assign_x = {r["_fine"]: r["cell"] for r in mapping_df.collect()}
    stats_x = sorted(
        (r["cell"], r["level"], tuple(r["coords"]), r["count"])
        for r in stats_df.collect()
    )
    stats_dd = sorted((c, l, tuple(cd), n) for c, l, cd, n in stats_d)
    return assign_d, stats_dd, assign_x, stats_x


class TestCascadeEquivalence:
    def test_random_counts(self, spark):
        rng = random.Random(7)
        fine_level, dim, rr = 5, 2, 2
        s = _slices(fine_level, dim, rr)
        counts = {}
        for _ in range(120):
            coords = tuple(rng.randrange(0, 2 ** s[c]) for c in range(dim))
            counts[_fine_id(fine_level, coords)] = rng.randrange(1, 6)
        a_d, s_d, a_x, s_x = _run_both(spark, counts, fine_level, dim)
        assert a_d == a_x
        assert s_d == s_x

    def test_negative_coords_out_of_box(self, spark):
        fine_level, dim = 4, 2
        counts = {
            _fine_id(fine_level, (-3, -7)): 1,
            _fine_id(fine_level, (-3, -6)): 1,
            _fine_id(fine_level, (2, 3)): 5,
            _fine_id(fine_level, (9, -1)): 2,
        }
        a_d, s_d, a_x, s_x = _run_both(spark, counts, fine_level, dim)
        assert a_d == a_x
        assert s_d == s_x
        # the two singleton outlier cells share ancestors -> must merge
        assert len({a_d[_fine_id(fine_level, (-3, -7))],
                    a_d[_fine_id(fine_level, (-3, -6))]}) == 1

    def test_all_cells_full_no_dissolve(self, spark):
        fine_level, dim = 3, 3
        counts = {
            _fine_id(fine_level, (i, j, k)): 10
            for i in range(2) for j in range(2) for k in range(2)
        }
        a_d, s_d, a_x, s_x = _run_both(spark, counts, fine_level, dim)
        assert a_d == a_x and s_d == s_x
        assert all(lvl == fine_level for _, lvl, _, _ in s_d)

    def test_everything_dissolves_to_root(self, spark):
        fine_level, dim = 4, 2
        counts = {_fine_id(fine_level, (0, 0)): 1,
                  _fine_id(fine_level, (5, 9)): 1}
        a_d, s_d, a_x, s_x = _run_both(
            spark, counts, fine_level, dim, rank=50
        )
        assert a_d == a_x and s_d == s_x
        assert all(lvl == 0 for _, lvl, _, _ in s_d)
