"""Round-8: ingest compaction (`compact_ingest`) — the small-files answer
for long-running streamed index ingest (VERDICT r7 ask #1).

The batch-keyed layout (`ingest_batch=<id>/cell=*`) accretes O(batches ×
cells-touched-per-batch) files; compaction folds everything into a
one-file-per-cell consolidated base at `ingest_batch=-1` without changing
a single row. Pins: (a) rows and search results are invariant under
compaction; (b) the file count actually drops to one per cell; (c) the
size-based auto-trigger keeps the live batch-dir count bounded during a
drain; (d) the crash-recovery janitor completes/rolls back every
interrupted protocol state; (e) re-compaction with nothing new is a no-op.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from pyvectorsearch_spark.sources.tables import load_table
from pyvectorsearch_spark.streaming.ingest import (
    _COMPACT_MANIFEST,
    _COMPACT_TMP_PREFIX,
    _COMPACT_TRASH_PREFIX,
    COMPACT_BASE_ID,
    INGEST_BATCH_COL,
    _compact_janitor,
    compact_ingest,
    stream_index_ingest,
)
from tests.conftest import SF_SMOKE

pytestmark = pytest.mark.slow  # soak/property tier: excluded from the default (driver-visible) run, see pytest.ini (r11)


def _assign(df):
    return df.withColumn(
        "cell", F.floor(F.element_at("embedding", 1) * 4).cast("long")
    )


def _drain(spark, landing, out, ck, **kw):
    schema = spark.read.parquet(landing).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    q = stream_index_ingest(
        stream, assign=_assign, out_path=out, checkpoint=ck, **kw
    )
    assert q.awaitTermination(120), "drain exceeded 120 s"


def _batch_dirs(out):
    return sorted(glob.glob(os.path.join(out, f"{INGEST_BATCH_COL}=*")))


def _data_files(out):
    return glob.glob(os.path.join(out, "*", "cell=*", "part-*"))


@pytest.fixture()
def ingested(spark, tmp_path):
    # "cells" layout: these tests pin the per-cell-directory regime and
    # its one-file-per-cell compaction floor (the "sorted" default has
    # its own class below)
    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    )
    landing = str(tmp_path / "landing")
    emb.repartition(6).write.parquet(landing)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _drain(spark, landing, out, ck, layout="cells")
    return emb, landing, out, ck


class TestCompactIngest:
    def test_rows_invariant_and_one_file_per_cell(self, spark, ingested):
        emb, _, out, _ = ingested
        before = spark.read.parquet(out)
        rows_before = sorted(
            (r["vec_id"], r["cell"]) for r in before.select("vec_id", "cell").collect()
        )
        n_cells = before.select("cell").distinct().count()
        assert len(_batch_dirs(out)) >= 6

        stats = compact_ingest(spark, out)
        assert stats["merged_batches"] >= 6
        assert stats["files_after"] == n_cells, "not one file per cell"
        assert stats["files_after"] < stats["files_before"]
        assert _batch_dirs(out) == [
            os.path.join(out, f"{INGEST_BATCH_COL}={COMPACT_BASE_ID}")
        ]
        after = spark.read.parquet(out)
        rows_after = sorted(
            (r["vec_id"], r["cell"]) for r in after.select("vec_id", "cell").collect()
        )
        assert rows_after == rows_before

    def test_recompaction_is_noop(self, spark, ingested):
        _, _, out, _ = ingested
        compact_ingest(spark, out)
        again = compact_ingest(spark, out)
        assert again["merged_batches"] == 0

    def test_compact_then_more_batches_then_compact(
        self, spark, ingested, tmp_path
    ):
        emb, landing, out, ck = ingested
        compact_ingest(spark, out)
        # second landing wave: new files → new batch ids via the SAME
        # checkpoint → fresh batch dirs beside the base
        extra = emb.filter(F.col("vec_id") < 50).withColumn(
            "vec_id", F.col("vec_id") + 1_000_000
        )
        extra.repartition(2).write.mode("append").parquet(landing)
        _drain(spark, landing, out, ck, layout="cells")
        assert len(_batch_dirs(out)) >= 3  # base + >=2 new
        stats = compact_ingest(spark, out)
        assert stats["merged_batches"] >= 2
        n = spark.read.parquet(out).count()
        assert n == emb.count() + 50

    def test_search_equals_batch_build_after_compaction(self, spark, tmp_path):
        """The rebalanced-index pipeline with auto-compaction ON must stay
        row-for-row equal to a batch build — compaction moves files, never
        rows, and the sidecar never notices."""
        from pyvectorsearch_spark.index.grid import GridIndex
        from pyvectorsearch_spark.index.incremental import (
            load_rebalanced_index,
        )
        from pyvectorsearch_spark.operators.knn import knn_join

        emb = (
            load_table(spark, SF_SMOKE, "embeddings")
            .withColumn("p2", F.slice("embedding", 1, 2))
            .select("vec_id", "p2")
        )
        geom = GridIndex.build(
            emb, vec_col="p2", id_col="vec_id", target_occupancy=8
        )
        landing = str(tmp_path / "landing2")
        emb.repartition(5).write.parquet(landing)
        out, ck, meta = (
            str(tmp_path / "o2"), str(tmp_path / "c2"), str(tmp_path / "m2")
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
            compact_min_batches=2,
            rebalance=dict(
                meta_path=meta, fine_level=geom.fine_level, dim=geom.dim,
                rr=geom.rr, ratio=geom.ratio, rank=geom.rank,
            ),
        )
        assert q.awaitTermination(300)
        idx = load_rebalanced_index(
            spark, data_path=out, meta_path=meta,
            origin=geom.origin, width=geom.width, dim=geom.dim,
            rank=geom.rank, rr=geom.rr, ratio=geom.ratio,
            fine_level=geom.fine_level, id_col="vec_id", vec_col="p2",
        )
        probes = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), F.col("p2").alias("qvec")
        )
        got = sorted(
            map(tuple, idx.knn(probes, 5).select(
                "query_id", "neighbor_id", "rank").collect())
        )
        exp = sorted(
            map(tuple, knn_join(emb, probes, 5, data_id="vec_id",
                                data_vec="p2").select(
                "query_id", "neighbor_id", "rank").collect())
        )
        assert got == exp

    def test_auto_trigger_bounds_live_batch_dirs(self, spark, ingested,
                                                 tmp_path):
        emb, _, _, _ = ingested
        landing = str(tmp_path / "landing3")
        emb.repartition(8).write.parquet(landing)
        out, ck = str(tmp_path / "o3"), str(tmp_path / "c3")
        _drain(spark, landing, out, ck, compact_min_batches=3)
        live = [
            d for d in _batch_dirs(out)
            if not d.endswith(f"={COMPACT_BASE_ID}")
        ]
        assert len(live) < 3, f"trigger never fired: {live}"
        assert spark.read.parquet(out).count() == emb.count()


class TestSortedLayout:
    """The r8 soak finding: on a deep fine grid (~1 row/cell) the per-cell
    directory layout IS the small-files explosion (415 files per 417-row
    batch; a 19.8k-dir base for 20k rows), so "sorted" — a few cell-range-
    sorted plain files per batch, row-group pruning instead of dirs — is
    the default. Pins: bounded files per batch, compaction to ~1 file,
    rows invariant, and layout auto-detection in the compactor."""

    @pytest.fixture()
    def sorted_ingested(self, spark, tmp_path):
        emb = load_table(spark, SF_SMOKE, "embeddings").select(
            "vec_id", "embedding"
        )
        landing = str(tmp_path / "landing_s")
        emb.repartition(6).write.parquet(landing)
        out, ck = str(tmp_path / "out_s"), str(tmp_path / "ck_s")
        _drain(spark, landing, out, ck)  # default layout="sorted"
        return emb, out

    def test_bounded_files_per_batch(self, spark, sorted_ingested):
        emb, out = sorted_ingested
        for d in _batch_dirs(out):
            files = glob.glob(os.path.join(d, "part-*"))
            assert 1 <= len(files) <= 4, d  # files_per_batch default
            assert not glob.glob(os.path.join(d, "cell=*")), d
        assert spark.read.parquet(out).count() == emb.count()

    def test_compaction_autodetects_and_merges_to_few_files(
        self, spark, sorted_ingested
    ):
        emb, out = sorted_ingested
        rows_before = sorted(
            (r["vec_id"], r["cell"])
            for r in spark.read.parquet(out).select("vec_id", "cell").collect()
        )
        stats = compact_ingest(spark, out)  # layout auto-detected
        assert stats["merged_batches"] >= 6
        base = os.path.join(out, f"{INGEST_BATCH_COL}={COMPACT_BASE_ID}")
        files = glob.glob(os.path.join(base, "part-*"))
        assert len(files) == 1  # well under target_file_rows
        assert not glob.glob(os.path.join(base, "cell=*"))
        rows_after = sorted(
            (r["vec_id"], r["cell"])
            for r in spark.read.parquet(out).select("vec_id", "cell").collect()
        )
        assert rows_after == rows_before

    def test_cell_column_rides_in_data(self, spark, sorted_ingested):
        _, out = sorted_ingested
        df = spark.read.parquet(out)
        # cell is a DATA column (row-group-prunable), ingest_batch the
        # only discovered partition column
        assert "cell" in df.columns
        one = df.filter(F.col("cell") == df.select("cell").first()[0])
        assert one.count() > 0


class TestCompactJanitor:
    def test_tmp_without_manifest_is_dropped(self, spark, ingested):
        _, _, out, _ = ingested
        junk = os.path.join(out, _COMPACT_TMP_PREFIX + "deadbeef")
        os.makedirs(junk)
        _compact_janitor(out)
        assert not os.path.isdir(junk)

    def test_tmp_with_manifest_completes_swap(self, spark, ingested):
        """Crash between base→trash and tmp→dest: the janitor promotes the
        manifested tmp to the base and finishes deleting merged dirs."""
        emb, _, out, _ = ingested
        n = emb.count()
        compact_ingest(spark, out)
        dest = os.path.join(out, f"{INGEST_BATCH_COL}={COMPACT_BASE_ID}")
        tmp = os.path.join(out, _COMPACT_TMP_PREFIX + "crashed1")
        os.rename(dest, tmp)  # simulate: tmp written, dest never created
        with open(os.path.join(tmp, _COMPACT_MANIFEST), "w") as fh:
            json.dump({"upto": 99}, fh)
        _compact_janitor(out)
        assert os.path.isdir(dest)
        assert not os.path.exists(os.path.join(dest, _COMPACT_MANIFEST))
        assert spark.read.parquet(out).count() == n

    def test_trash_restored_when_no_dest(self, spark, ingested):
        """Crash right after base→trash with the tmp lost: roll back."""
        emb, _, out, _ = ingested
        n = emb.count()
        compact_ingest(spark, out)
        dest = os.path.join(out, f"{INGEST_BATCH_COL}={COMPACT_BASE_ID}")
        trash = os.path.join(out, _COMPACT_TRASH_PREFIX + "crashed2")
        os.rename(dest, trash)
        _compact_janitor(out)
        assert os.path.isdir(dest)
        assert spark.read.parquet(out).count() == n

    def test_dest_manifest_deletes_merged_dirs(self, spark, ingested):
        """Crash between tmp→dest and merged-dir deletion: the stale batch
        dirs ≤ upto are removed so rows are not double-counted."""
        emb, _, out, _ = ingested
        n = emb.count()
        compact_ingest(spark, out)
        dest = os.path.join(out, f"{INGEST_BATCH_COL}={COMPACT_BASE_ID}")
        # resurrect a stale "already folded" batch dir + the manifest state
        stale = os.path.join(out, f"{INGEST_BATCH_COL}=3")
        shutil.copytree(dest, stale)
        with open(os.path.join(dest, _COMPACT_MANIFEST), "w") as fh:
            json.dump({"upto": 5}, fh)
        _compact_janitor(out)
        assert not os.path.isdir(stale)
        assert spark.read.parquet(out).count() == n


class TestSoakPin:
    def test_long_drain_bounded_files_single_meta_version(
        self, spark, tmp_path
    ):
        """The round-8 soak contract in miniature (the full-size numbers
        live in SCALING.md / tools/soak_ingest.py): a 16-micro-batch
        rebalanced drain with the size trigger must end with (a) live
        batch dirs below the trigger, (b) exactly ONE live sidecar version
        triple (pointer GC), (c) the pointer at the last batch id, and
        (d) a served index equal to a batch build."""
        from pyvectorsearch_spark.index.grid import GridIndex
        from pyvectorsearch_spark.index.incremental import (
            load_rebalanced_index,
            read_pointer,
        )

        emb = (
            load_table(spark, SF_SMOKE, "embeddings")
            .withColumn("p2", F.slice("embedding", 1, 2))
            .select("vec_id", "p2")
        )
        geom = GridIndex.build(
            emb, vec_col="p2", id_col="vec_id", target_occupancy=8
        )
        landing = str(tmp_path / "soak_landing")
        emb.repartition(16).write.parquet(landing)
        out, ck, meta = (
            str(tmp_path / "so"), str(tmp_path / "sc"), str(tmp_path / "sm")
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
            compact_min_batches=5,
            rebalance=dict(
                meta_path=meta, fine_level=geom.fine_level, dim=geom.dim,
                rr=geom.rr, ratio=geom.ratio, rank=geom.rank,
            ),
        )
        assert q.awaitTermination(600), "soak drain exceeded 600 s"

        live = [
            d for d in _batch_dirs(out)
            if not d.endswith(f"={COMPACT_BASE_ID}")
        ]
        assert len(live) < 5, live
        # r9 log-structured sidecar: at 16 batches the default fold_every=16
        # fires on the last batch, so the pointer references exactly one
        # folded base and zero unfolded deltas. r10 deferred janitor: the
        # just-folded delta dirs may LINGER unreferenced until a next apply
        # (so pre-fold readers keep their files) — they must all be at or
        # below the fold watermark and bounded by one fold's worth.
        ptr = read_pointer(meta)
        assert ptr["batch_id"] == 15
        for kind in ("state", "mapping"):
            entries = os.listdir(os.path.join(meta, kind))
            bases = [e for e in entries if e.startswith("base_v")]
            deltas = [e for e in entries if e.startswith("b=")]
            base_key, upto_key = (
                ("state_base", "state_upto") if kind == "state"
                else ("map_base", "map_upto")
            )
            assert bases == [f"base_v{ptr[base_key]:09d}"], (kind, entries)
            assert ptr[upto_key] == 15  # everything folded into the base
            assert len(deltas) <= 16 and all(
                int(d[2:]) <= ptr[upto_key] for d in deltas
            ), (kind, entries)

        streamed = load_rebalanced_index(
            spark, data_path=out, meta_path=meta,
            origin=geom.origin, width=geom.width, dim=geom.dim,
            rank=geom.rank, rr=geom.rr, ratio=geom.ratio,
            fine_level=geom.fine_level, id_col="vec_id", vec_col="p2",
        )
        key = lambda df: sorted(  # noqa: E731
            (r["cell"], r["level"], tuple(r["coords"]), r["count"])
            for r in df.collect()
        )
        assert key(streamed.stats_df) == key(geom.stats_df)
