"""Round-7: per-batch incremental K-instantiation for streamed ingest.

VERDICT r6 residual gap #1: streamed appends previously restored the
K-instantiation invariant only when the periodic compactor re-ran the batch
build over the accumulated DATA. `index/incremental.py` closes the gap: the
cascade is a pure function of the fine-cell COUNT table, so every
micro-batch merges its count delta and re-runs the cascade — O(#cells),
data files never move, and the maintained mapping/stats must equal a batch
build's EXACTLY (same code path: `_kinstantiate_driver`/`_distributed`).

Pins: (a) streamed meta == batch-built index, cell-for-cell and row-for-row;
(b) the invariant (count ≥ rank or level 0) holds after EVERY batch, not
just after the final one; (c) out-of-box arrivals cascade with honest
negative coords and search stays exact; (d) batch replay is a no-op.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyvectorsearch_spark.index.grid import GridIndex
from pyvectorsearch_spark.index.incremental import (
    apply_batch_rebalance,
    load_rebalanced_index,
    read_pointer,
)
from pyvectorsearch_spark.operators.knn import knn_join
from pyvectorsearch_spark.streaming.ingest import stream_index_ingest

pytestmark = pytest.mark.slow  # soak/property tier: excluded from the default (driver-visible) run, see pytest.ini (r11)


def _clustered(spark, n_clusters=6, per_cluster=40, spread=0.004):
    # tight clusters + sparse stragglers: the cascade must both KEEP fine
    # cells (clusters exceed rank) and DISSOLVE under-full straggler cells
    rows = []
    vid = 0
    for c in range(n_clusters):
        cx, cy = (c % 3) / 3.0 + 0.05, (c // 3) / 2.0 + 0.05
        for k in range(per_cluster):
            rows.append(
                (vid, [cx + spread * (k % 7), cy + spread * (k // 7)])
            )
            vid += 1
    for s in range(25):  # stragglers scattered on a coarse lattice
        rows.append((vid, [(s % 5) / 5.0 + 0.013, (s // 5) / 5.0 + 0.017]))
        vid += 1
    return spark.createDataFrame(rows, "vec_id long, p2 array<float>")


def _geom_kwargs(geom):
    return dict(
        fine_level=geom.fine_level, dim=geom.dim, rr=geom.rr,
        ratio=geom.ratio, rank=geom.rank,
    )


def _ingest(spark, data, geom, root, n_files=5, out_name="out"):
    landing = str(root / "landing")
    data.repartition(n_files).write.parquet(landing)
    out, ck = str(root / out_name), str(root / (out_name + ".ck"))
    meta = str(root / (out_name + ".meta"))
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
        rebalance=dict(meta_path=meta, **_geom_kwargs(geom)),
    )
    assert q.awaitTermination(300), "availableNow drain exceeded 300 s"
    return out, meta


@pytest.fixture(scope="module")
def built_and_streamed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("inc_rebalance")
    data = _clustered(spark)
    batch = GridIndex.build(
        data, vec_col="p2", id_col="vec_id", target_occupancy=4
    )
    out, meta = _ingest(spark, data, batch, root)
    streamed = load_rebalanced_index(
        spark, data_path=out, meta_path=meta,
        origin=batch.origin, width=batch.width, dim=batch.dim,
        rank=batch.rank, rr=batch.rr, ratio=batch.ratio,
        fine_level=batch.fine_level, id_col="vec_id", vec_col="p2",
    )
    return data, batch, streamed, meta


class TestStreamedEqualsBatch:
    def test_multiple_batches_ran(self, built_and_streamed):
        _, _, _, meta = built_and_streamed
        assert read_pointer(meta)["batch_id"] >= 4  # 5 files, 1 per batch

    def test_coalescing_actually_happened(self, built_and_streamed):
        _, batch, streamed, _ = built_and_streamed
        levels = {r["level"] for r in streamed.stats_df.collect()}
        assert len(levels) > 1, "fixture never dissolved a cell"
        assert batch.fine_level in levels or max(levels) > 0

    def test_stats_equal_batch_build(self, built_and_streamed):
        _, batch, streamed, _ = built_and_streamed
        key = lambda df: sorted(  # noqa: E731
            (r["cell"], r["level"], tuple(r["coords"]), r["count"])
            for r in df.collect()
        )
        assert key(streamed.stats_df) == key(batch.stats_df)

    def test_row_assignment_equals_batch_build(self, built_and_streamed):
        _, batch, streamed, _ = built_and_streamed
        b = {r["vec_id"]: r["cell"] for r in batch.df.collect()}
        s = {r["vec_id"]: r["cell"] for r in streamed.df.collect()}
        assert s == b

    def test_invariant_every_cell(self, built_and_streamed):
        _, _, streamed, _ = built_and_streamed
        for r in streamed.stats_df.collect():
            assert r["count"] >= streamed.rank or r["level"] == 0

    @pytest.mark.parametrize("mode", ["driver", "distributed"])
    def test_knn_exact(self, spark, built_and_streamed, mode):
        data, _, streamed, _ = built_and_streamed
        probes = spark.createDataFrame(
            [(0, [0.06, 0.06]), (1, [0.8, 0.9]), (2, [0.4, 0.2])],
            "query_id long, qvec array<float>",
        )
        got = streamed.knn(probes, 5, candidates=mode).collect()
        exact = knn_join(
            data, probes, 5, data_id="vec_id", data_vec="p2"
        ).collect()
        key = lambda rows: sorted(  # noqa: E731
            (r.query_id, r.neighbor_id, round(r.dist, 9)) for r in rows
        )
        assert key(got) == key(exact)


class TestPerBatchInvariant:
    def test_invariant_holds_after_every_batch(self, spark, tmp_path):
        data = _clustered(spark).collect()
        df = spark.createDataFrame(data, "vec_id long, p2 array<float>")
        geom = GridIndex.build(
            df, vec_col="p2", id_col="vec_id", target_occupancy=4
        )
        meta = str(tmp_path / "meta")
        chunk = len(data) // 4 + 1
        for bid in range(4):
            rows = data[bid * chunk:(bid + 1) * chunk]
            if not rows:
                continue
            batch_df = spark.createDataFrame(
                rows, "vec_id long, p2 array<float>"
            ).withColumn(
                "cell",
                GridIndex._cell_expr(
                    "p2", geom.origin, geom.width, geom.fine_level,
                    geom.dim, geom.rr, geom.ratio, clamp=False,
                ),
            )
            apply_batch_rebalance(
                spark, assigned_batch=batch_df, batch_id=bid,
                meta_path=meta, **_geom_kwargs(geom),
            )
            # invariant after EVERY batch — the whole point vs compaction
            from pyvectorsearch_spark.index.incremental import read_stats

            for r in read_stats(spark, meta).collect():
                assert r["count"] >= geom.rank or r["level"] == 0
        # total count conservation across all batches
        from pyvectorsearch_spark.index.incremental import read_fine_counts

        total = read_fine_counts(spark, meta).agg(F.sum("count")).first()[0]
        assert total == len(data)

    def test_replay_is_noop(self, spark, tmp_path):
        df = _clustered(spark, n_clusters=2, per_cluster=10)
        geom = GridIndex.build(
            df, vec_col="p2", id_col="vec_id", target_occupancy=4
        )
        meta = str(tmp_path / "meta")
        assigned = df.withColumn(
            "cell",
            GridIndex._cell_expr(
                "p2", geom.origin, geom.width, geom.fine_level,
                geom.dim, geom.rr, geom.ratio, clamp=False,
            ),
        )
        apply_batch_rebalance(
            spark, assigned_batch=assigned, batch_id=0,
            meta_path=meta, **_geom_kwargs(geom),
        )
        before = read_pointer(meta)
        apply_batch_rebalance(  # replayed batch must not double-count
            spark, assigned_batch=assigned, batch_id=0,
            meta_path=meta, **_geom_kwargs(geom),
        )
        assert read_pointer(meta) == before
        from pyvectorsearch_spark.index.incremental import read_fine_counts

        total = read_fine_counts(spark, meta).agg(F.sum("count")).first()[0]
        assert total == df.count()


class TestOutOfBoxRebalance:
    def test_outliers_cascade_and_search_exact(self, spark, tmp_path_factory):
        root = tmp_path_factory.mktemp("inc_oob")
        inbox = _clustered(spark, n_clusters=3, per_cluster=30)
        geom = GridIndex.build(
            inbox, vec_col="p2", id_col="vec_id", target_occupancy=4
        )
        outliers = spark.createDataFrame(
            [(90_000, [-4.0, -2.0]), (90_001, [8.0, 11.0]),
             (90_002, [-3.9, -2.1])],
            "vec_id long, p2 array<float>",
        )
        data = inbox.unionByName(outliers)
        out, meta = _ingest(spark, data, geom, root, n_files=3)
        idx = load_rebalanced_index(
            spark, data_path=out, meta_path=meta,
            origin=geom.origin, width=geom.width, dim=geom.dim,
            rank=geom.rank, rr=geom.rr, ratio=geom.ratio,
            fine_level=geom.fine_level, id_col="vec_id", vec_col="p2",
        )
        coords = [tuple(r["coords"]) for r in idx.stats_df.collect()]
        assert any(min(c) < 0 for c in coords), "no negative-coord cell"
        probes = spark.createDataFrame(
            [(0, [-4.0, -2.0]), (1, [0.5, 0.5])],
            "query_id long, qvec array<float>",
        )
        for mode in ("driver", "distributed"):
            got = idx.knn(probes, 4, candidates=mode).collect()
            exact = knn_join(
                data, probes, 4, data_id="vec_id", data_vec="p2"
            ).collect()
            key = lambda rows: sorted(  # noqa: E731
                (r.query_id, r.neighbor_id, round(r.dist, 9)) for r in rows
            )
            assert key(got) == key(exact)
