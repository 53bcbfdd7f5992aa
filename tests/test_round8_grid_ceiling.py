"""Round-8: the grid driver-stats ceiling (VERDICT r7 ask #3).

`GridIndex` holds two driver-side conveniences: the lazily-collected
`stats` list (driver candidate selection) and `_level_hist`. Both are
bounded by `_stats_is_small(limit=200_000)`: past the limit the AUTO mode
must route search through the distributed candidate path and never
collect the stats table. These pins make that dispatch a contract, not a
habit; the 1e6-cell capacity row itself is measured by
`tools/stress_grid_1e6.py` and recorded in SCALING.md.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyvectorsearch_spark.index.grid import GridIndex


@pytest.fixture(scope="module")
def small_idx(spark):
    pts = spark.range(2000).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 50).cast("double"),
            (F.col("id") / 50).cast("double"),
        ).alias("embedding"),
    )
    return GridIndex.build(pts, dim=2, target_occupancy=4)


def _probes(spark):
    return spark.createDataFrame(
        [(0, [10.0, 10.0]), (1, [40.0, 3.0])],
        "query_id long, qvec array<double>",
    )


class TestAutoModeCeiling:
    def test_auto_picks_driver_under_limit(self, spark, small_idx,
                                           monkeypatch):
        calls = []
        orig = GridIndex._knn_distributed

        def spy(self, *a, **kw):
            calls.append("distributed")
            return orig(self, *a, **kw)

        monkeypatch.setattr(GridIndex, "_knn_distributed", spy)
        small_idx.knn(_probes(spark), 3, candidates="auto").collect()
        assert calls == [], "small index routed to distributed under auto"

    def test_auto_flips_to_distributed_over_limit(self, spark, small_idx,
                                                  monkeypatch):
        """Simulate a 1e6-cell stats table via the cached count — the auto
        dispatch must go distributed WITHOUT collecting stats."""
        idx = GridIndex(
            df=small_idx.df, stats_df=small_idx.stats_df,
            origin=small_idx.origin, width=small_idx.width,
            dim=small_idx.dim, rank=small_idx.rank, rr=small_idx.rr,
            ratio=small_idx.ratio, fine_level=small_idx.fine_level,
            id_col=small_idx.id_col, vec_col=small_idx.vec_col,
        )
        idx._stats_count = 1_000_000  # what a deep 100 TB index reports
        calls = []
        orig = GridIndex._knn_distributed

        def spy(self, *a, **kw):
            calls.append("distributed")
            return orig(self, *a, **kw)

        monkeypatch.setattr(GridIndex, "_knn_distributed", spy)
        idx.knn(_probes(spark), 3, candidates="auto").collect()
        assert calls == ["distributed"]
        assert idx._local_stats is None, (
            "distributed search collected the stats table"
        )

    def test_range_auto_flips_too(self, spark, small_idx, monkeypatch):
        idx = GridIndex(
            df=small_idx.df, stats_df=small_idx.stats_df,
            origin=small_idx.origin, width=small_idx.width,
            dim=small_idx.dim, rank=small_idx.rank, rr=small_idx.rr,
            ratio=small_idx.ratio, fine_level=small_idx.fine_level,
            id_col=small_idx.id_col, vec_col=small_idx.vec_col,
        )
        idx._stats_count = 1_000_000
        calls = []
        orig = GridIndex._range_distributed

        def spy(self, *a, **kw):
            calls.append("distributed")
            return orig(self, *a, **kw)

        monkeypatch.setattr(GridIndex, "_range_distributed", spy)
        idx.range(_probes(spark), 2.0, candidates="auto").collect()
        assert calls == ["distributed"]
        assert idx._local_stats is None

    def test_level_hist_never_collects_stats(self, spark, small_idx):
        """The ladder sizing input is a (level -> count) aggregate, cells
        -> ~depth rows; it must not materialize the stats list."""
        idx = GridIndex(
            df=small_idx.df, stats_df=small_idx.stats_df,
            origin=small_idx.origin, width=small_idx.width,
            dim=small_idx.dim, rank=small_idx.rank, rr=small_idx.rr,
            ratio=small_idx.ratio, fine_level=small_idx.fine_level,
            id_col=small_idx.id_col, vec_col=small_idx.vec_col,
        )
        hist = idx._level_hist()
        assert sum(hist.values()) == small_idx.stats_df.count()
        assert idx._local_stats is None

    def test_driver_and_distributed_agree(self, spark, small_idx):
        a = sorted(
            (r.query_id, r.neighbor_id, r.rank)
            for r in small_idx.knn(
                _probes(spark), 4, candidates="driver"
            ).collect()
        )
        b = sorted(
            (r.query_id, r.neighbor_id, r.rank)
            for r in small_idx.knn(
                _probes(spark), 4, candidates="distributed"
            ).collect()
        )
        assert a == b
