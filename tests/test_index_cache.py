"""build_or_load: miss builds + publishes atomically, hit never rebuilds."""

from __future__ import annotations

import os

from pyvectorsearch_spark.index.cache import build_or_load, cache_path
from pyvectorsearch_spark.index.grid import GridIndex
from pyvectorsearch_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_build_or_load_miss_then_hit(tmp_path, spark, monkeypatch):
    monkeypatch.setenv("PYVECTORSEARCH_INDEX_CACHE", str(tmp_path))
    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    )
    calls = {"n": 0}

    def builder():
        calls["n"] += 1
        return GridIndex.build(
            emb, vec_col="embedding", id_col="vec_id", target_occupancy=16
        )

    idx1 = build_or_load(
        spark, "t_grid", load=GridIndex.load, build=builder
    )
    assert calls["n"] == 1
    assert os.path.isdir(cache_path("t_grid"))

    idx2 = build_or_load(
        spark, "t_grid", load=GridIndex.load, build=builder
    )
    assert calls["n"] == 1, "cache hit must not rebuild"
    assert idx2.dim == idx1.dim and idx2.width == idx1.width
    assert idx2.df.count() == idx1.df.count()

    # no leftover temp dirs from the atomic publish
    assert not [d for d in os.listdir(tmp_path) if ".tmp-" in d]
