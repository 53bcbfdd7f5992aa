"""Round-8 pins for the ADVICE r7 findings.

1. (medium) Cached-drain reuse must be gated on a success sentinel, not
   mere dir existence — a crash/timeout mid-stream leaves out/ck/meta
   present but PARTIAL, and silent reuse serves wrong results.
2. (low) The ingest DATA write must be idempotent under foreachBatch
   replay, matching the rebalance sidecar's exactly-once pointer guard:
   each batch lands under its own ``ingest_batch=<id>`` dir in overwrite
   mode, so a full checkpoint-loss replay leaves the dataset row-for-row
   identical instead of doubled.
3. (low) The fp32 GEMM candidate slack in the bucketed embedding dedup
   scales with dimension (the fixed 1e-4 was only justified for d=64).
4. (low) ``kmeans_fixedpoint(k=1)`` is a valid degenerate clustering
   (``F.least`` needs two args; the single-struct case is special-cased).
5. (low) Centroid update mirrors the oracle's CAST-to-double-first
   rounding order (``floor(float(s)/n + 0.5)``).
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from pyvectorsearch_spark.streaming.ingest import (
    DRAIN_SENTINEL,
    drain_complete,
    mark_drain_complete,
    stream_index_ingest,
)


def _run_ingest(spark, landing, out, ck):
    schema = spark.read.parquet(landing).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    assign = lambda df: df.withColumn(  # noqa: E731
        "cell", F.floor(F.element_at("embedding", 1) * 4).cast("long")
    )
    q = stream_index_ingest(stream, assign=assign, out_path=out, checkpoint=ck)
    assert q.awaitTermination(120), "drain exceeded 120 s"


class TestDrainSentinel:
    def test_dirs_alone_are_not_complete(self, tmp_path):
        out, ck, meta = (str(tmp_path / d) for d in ("out", "ck", "meta"))
        for d in (out, ck, meta):
            os.makedirs(d)
        # the pre-fix trap: all three dirs exist (crash/timeout leaves
        # exactly this state) yet no drain ever completed
        assert not drain_complete(out, ck, meta)
        mark_drain_complete(out)
        assert drain_complete(out, ck, meta)
        assert os.path.exists(os.path.join(out, DRAIN_SENTINEL))

    def test_missing_extra_dir_is_not_complete(self, tmp_path):
        out = str(tmp_path / "out")
        os.makedirs(out)
        mark_drain_complete(out)
        assert drain_complete(out)
        assert not drain_complete(out, str(tmp_path / "never_made"))


class TestIngestReplayIdempotent:
    def test_checkpoint_loss_replay_does_not_duplicate(self, spark, tmp_path):
        """Worst-case replay: lose the WHOLE checkpoint and re-drain the
        same landing. Every batch id re-fires and overwrites its own
        ``ingest_batch=<id>`` dir — with the pre-fix append mode this
        doubled every row."""
        from tests.conftest import SF_SMOKE
        from pyvectorsearch_spark.sources.tables import load_table

        emb = load_table(spark, SF_SMOKE, "embeddings").select(
            "vec_id", "embedding"
        )
        landing = str(tmp_path / "landing")
        emb.repartition(4).write.parquet(landing)
        out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

        _run_ingest(spark, landing, out, ck)
        n = emb.count()
        assert spark.read.parquet(out).count() == n

        shutil.rmtree(ck)  # simulate total checkpoint loss → full replay
        _run_ingest(spark, landing, out, ck)
        back = spark.read.parquet(out)
        assert back.count() == n, "replayed batches duplicated rows"
        assert sorted(
            r["vec_id"] for r in back.select("vec_id").distinct().collect()
        ) == sorted(r["vec_id"] for r in emb.select("vec_id").collect())

    def test_batch_dirs_are_keyed(self, spark, tmp_path):
        import glob

        from tests.conftest import SF_SMOKE
        from pyvectorsearch_spark.sources.tables import load_table

        emb = load_table(spark, SF_SMOKE, "embeddings").select(
            "vec_id", "embedding"
        )
        landing = str(tmp_path / "landing")
        emb.repartition(3).write.parquet(landing)
        out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
        _run_ingest(spark, landing, out, ck)
        batch_dirs = glob.glob(os.path.join(out, "ingest_batch=*"))
        assert len(batch_dirs) >= 2, "expected one dir per micro-batch"
        for d in batch_dirs:
            # default "sorted" layout: a few plain cell-sorted files, no
            # per-cell directory sprawl (r8 soak finding)
            assert glob.glob(os.path.join(d, "part-*")), d
            assert not glob.glob(os.path.join(d, "cell=*")), d


class TestHighDimSlack:
    def test_bucketed_dedup_finds_high_dim_duplicates(self, spark):
        """d=512 exact duplicates sit exactly AT the threshold (cosine =
        min_cosine = 1.0 is unreachable; use 0.999 with near-identical
        vectors): the dimension-scaled slack must keep them as candidates
        through the fp32 GEMM."""
        import random

        from pyvectorsearch_spark.operators.dedup import (
            embedding_dup_pairs_bucketed,
        )

        rng = random.Random(7)
        d = 512
        base = [rng.uniform(-1, 1) for _ in range(d)]
        rows = []
        for i in range(40):
            v = [rng.uniform(-1, 1) for _ in range(d)]
            rows.append((i, v))
        # three exact copies of `base` → three near-dup pairs at cosine 1.0
        for j, vid in enumerate((100, 101, 102)):
            rows.append((vid, list(base)))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = {
            (r["d1"], r["d2"])
            for r in embedding_dup_pairs_bucketed(
                df, min_cosine=0.999, n_lists=4
            ).collect()
        }
        assert {(100, 101), (100, 102), (101, 102)} <= got


class TestKmeansEdgeCases:
    def test_k1_runs_and_covers_everything(self, spark):
        from pyvectorsearch_spark.operators.embeddings import kmeans_fixedpoint

        df = spark.createDataFrame(
            [(i, [float(i), float(2 * i)]) for i in range(10)],
            "vec_id long, embedding array<float>",
        )
        out = kmeans_fixedpoint(df, k=1, iters=2).collect()
        assert {r["cluster_id"] for r in out} == {0}
        assert all(r["n_points"] == 10 for r in out)

    def test_centroid_update_casts_sum_to_double_first(self):
        """The 1-ulp divergence ADVICE r7 flagged: exact-rational s/n vs
        the oracle's double(s)/n flips floor(x+0.5) for this constructed
        (s, n). Pin that the implementation uses the oracle's order."""
        import math

        n = 3
        # s chosen so float(s)/n rounds DOWN across .5 while exact s/n
        # stays >= .5: search a band above 2^53 for a witness
        witness = None
        for s in range(2 ** 53 + 1, 2 ** 53 + 20000):
            exact = math.floor(s / n + 0.5)  # old behavior (exact rational)
            mirrored = math.floor(float(s) / n + 0.5)  # oracle order
            if exact != mirrored:
                witness = s
                break
        assert witness is not None, "no divergence witness in band"
        # and the shipped code uses the mirrored form
        import inspect

        from pyvectorsearch_spark.operators import embeddings

        src = inspect.getsource(embeddings.kmeans_fixedpoint)
        assert 'float(r["_s"]) / r["_n"]' in src
