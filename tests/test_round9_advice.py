"""Round-9 pins for the ADVICE r8 findings:

1. (high) ``compact_ingest`` auto-trigger must never fold the in-flight
   batch: a ``foreachBatch`` replay after a crash-before-commit would
   recreate ``ingest_batch=<id>`` whose rows are already in the base.
2. (medium) compaction on an already-drained artifact must invalidate the
   ``_DRAIN_SUCCESS`` sentinel while the layout is torn and republish it
   only after the fold commits.
3. (low) ``encode_jpeg`` clamps quantized magnitudes to the baseline
   Huffman range (AC size <= 10, DC diff size <= 11).
4. (low) the decoder's marker walk accepts 0xFF fill bytes and standalone
   TEM/RSTn markers between segments.
5. (low) the round-5 crossformat query is back to its stable Hamming-0
   form; the lossy-JPEG regime is a separate round-9 query whose FULL
   expected pair set is pinned here.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyvectorsearch_spark.streaming.ingest import (
    COMPACT_BASE_ID,
    DRAIN_SENTINEL,
    INGEST_BATCH_COL,
    compact_ingest,
    mark_drain_complete,
)


def _write_batches(spark, out: str, rows_per_batch: int, n_batches: int):
    """Lay down sorted-layout batch dirs the way ``stream_index_ingest``
    does (plain part files, cell as a data column)."""
    for b in range(n_batches):
        df = spark.range(rows_per_batch).select(
            (F.col("id") + b * rows_per_batch).alias("vec_id"),
            F.concat(F.lit("3_"), (F.col("id") % 7).cast("string")).alias(
                "cell"
            ),
        )
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, f"{INGEST_BATCH_COL}={b}")
        )


class TestInflightBatchExcluded:
    def test_fold_stops_below_exclusive_bound(self, spark, tmp_path):
        out = str(tmp_path / "a")
        _write_batches(spark, out, 10, 4)
        stats = compact_ingest(spark, out, max_batch_exclusive=3)
        assert stats["merged_batches"] == 3 and stats["upto"] == 2
        # the in-flight dir survived untouched; the base holds 0..2 only
        assert os.path.isdir(os.path.join(out, f"{INGEST_BATCH_COL}=3"))
        base = os.path.join(out, f"{INGEST_BATCH_COL}={COMPACT_BASE_ID}")
        assert spark.read.parquet(base).count() == 30
        assert spark.read.parquet(out).count() == 40

    def test_replayed_inflight_batch_is_not_doubled(self, spark, tmp_path):
        """The ADVICE r8 failure mode, replayed end to end: fold while
        batch 2 is in flight, then 'crash' and replay batch 2 (foreachBatch
        re-runs it in overwrite mode), then fold again — total rows must
        equal the input exactly."""
        out = str(tmp_path / "b")
        _write_batches(spark, out, 10, 3)
        compact_ingest(spark, out, max_batch_exclusive=2)
        # replay of the in-flight batch: same rows, overwrite same dir
        df = spark.range(10).select(
            (F.col("id") + 20).alias("vec_id"),
            F.concat(F.lit("3_"), (F.col("id") % 7).cast("string")).alias(
                "cell"
            ),
        )
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, f"{INGEST_BATCH_COL}=2")
        )
        compact_ingest(spark, out)  # post-drain: fold everything
        got = spark.read.parquet(out)
        assert got.count() == 30
        assert got.select("vec_id").distinct().count() == 30

    def test_exclusive_bound_none_folds_all(self, spark, tmp_path):
        out = str(tmp_path / "c")
        _write_batches(spark, out, 5, 3)
        stats = compact_ingest(spark, out)
        assert stats["merged_batches"] == 3
        assert spark.read.parquet(out).count() == 15


class TestSentinelInvalidation:
    def test_sentinel_removed_while_layout_moves(self, spark, tmp_path):
        """A crash mid-compaction must not leave a success-marked torn
        artifact: the sentinel goes away BEFORE any layout mutation. The
        bogus-layout error fires after sentinel removal, standing in for a
        crash at the worst point."""
        out = str(tmp_path / "d")
        _write_batches(spark, out, 5, 2)
        mark_drain_complete(out)
        with pytest.raises(ValueError, match="unknown layout"):
            compact_ingest(spark, out, layout="bogus")
        assert not os.path.exists(os.path.join(out, DRAIN_SENTINEL))

    def test_sentinel_republished_after_success(self, spark, tmp_path):
        out = str(tmp_path / "e")
        _write_batches(spark, out, 5, 2)
        mark_drain_complete(out)
        compact_ingest(spark, out)
        assert os.path.exists(os.path.join(out, DRAIN_SENTINEL))
        assert spark.read.parquet(out).count() == 10

    def test_noop_compact_keeps_sentinel(self, spark, tmp_path):
        out = str(tmp_path / "f")
        _write_batches(spark, out, 5, 1)
        compact_ingest(spark, out)  # everything folded into the base
        mark_drain_complete(out)
        stats = compact_ingest(spark, out)  # nothing left to fold
        assert stats["merged_batches"] == 0
        assert os.path.exists(os.path.join(out, DRAIN_SENTINEL))


class TestJpegClamp:
    def test_encode_block_clamps_oversized_coefficients(self):
        """With a sub-unit quantization table (unreachable via the public
        API, which floors divisors at 1) an unclamped encoder would look
        up AC size 12 and crash; the clamp keeps every symbol inside the
        baseline tables."""
        from pyvectorsearch_spark.operators.jpeg import (
            _AC_LUM,
            _DC_LUM,
            _BitWriter,
            _canonical_codes,
            _encode_block,
        )

        block = np.zeros((8, 8))
        block[::2, ::2] = 255.0  # high-frequency, near-basis-aligned
        bw = _BitWriter()
        qtab = np.full(64, 0.25)
        pred = _encode_block(
            bw,
            block,
            qtab,
            _canonical_codes(*_DC_LUM),
            _canonical_codes(*_AC_LUM),
            0,
        )
        assert abs(pred) <= 2047  # DC diff clamped into the 11-bit range

    def test_quality_100_worst_case_roundtrips(self):
        from pyvectorsearch_spark.operators.jpeg import decode_jpeg, encode_jpeg

        w, h = 16, 16
        px = np.zeros((h, w, 3), dtype=np.uint8)
        px[::2, ::2] = 255  # checkerboard maximizes AC energy
        for ss in ("444", "420"):
            blob = encode_jpeg(w, h, px.tobytes(), quality=100, subsampling=ss)
            got = decode_jpeg(blob)
            assert got is not None and got[0] == w and got[1] == h


class TestMarkerWalk:
    def _base(self):
        from pyvectorsearch_spark.operators.jpeg import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(9)
        w, h = 24, 16
        rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8).tobytes()
        blob = encode_jpeg(w, h, rgb, quality=90)
        return blob, decode_jpeg(blob)

    def test_fill_bytes_between_segments(self):
        from pyvectorsearch_spark.operators.jpeg import decode_jpeg

        blob, want = self._base()
        assert want is not None
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        dqt = blob.index(b"\xff\xdb")
        padded = blob[:dqt] + b"\xff\xff\xff" + blob[dqt:]
        assert decode_jpeg(padded) == want

    def test_tem_and_stray_rst_before_sos(self):
        from pyvectorsearch_spark.operators.jpeg import decode_jpeg

        blob, want = self._base()
        dqt = blob.index(b"\xff\xdb")
        with_tem = blob[:dqt] + b"\xff\x01" + blob[dqt:]
        assert decode_jpeg(with_tem) == want
        with_rst = blob[:dqt] + b"\xff\xd3" + blob[dqt:]
        assert decode_jpeg(with_rst) == want


# The FULL expected pair sets (ADVICE r8: pin them so fixture drift is
# caught, not absorbed). Planted twin id offsets: bmp=+300000, aiff=+400000,
# png=+500000, jpeg=+600000 on bases 0,3,...,21 (images) / 1,4,...,22
# (audio). In the Hamming-0 query a JPEG pair appears only when the q95
# re-encode's dHash is bit-identical (5 of the 8 twins); the lossy query
# carries all 8 with their distances and, at this fixture, NO incidental
# near-pairs.
_J0 = (0, 6, 9, 12, 21)  # twins whose jpeg dHash is exact
_JH = {0: 0, 3: 2, 6: 0, 9: 0, 12: 0, 15: 1, 18: 4, 21: 0}

_STABLE_EXPECTED = (
    [("audio", b, b + 400000, "wav", "aiff") for b in range(1, 23, 3)]
    + [("image", b, b + 300000, "ppm", "bmp") for b in range(0, 22, 3)]
    + [("image", b, b + 500000, "ppm", "png") for b in range(0, 22, 3)]
    + [("image", b, b + 600000, "ppm", "jpeg") for b in _J0]
    + [("image", b + 300000, b + 500000, "bmp", "png") for b in range(0, 22, 3)]
    + [("image", b + 300000, b + 600000, "bmp", "jpeg") for b in _J0]
    + [("image", b + 500000, b + 600000, "png", "jpeg") for b in _J0]
)

_LOSSY_EXPECTED = (
    [("audio", b, b + 400000, "wav", "aiff", 0) for b in range(1, 23, 3)]
    + [("image", b, b + 300000, "ppm", "bmp", 0) for b in range(0, 22, 3)]
    + [("image", b, b + 500000, "ppm", "png", 0) for b in range(0, 22, 3)]
    + [("image", b, b + 600000, "ppm", "jpeg", _JH[b]) for b in _JH]
    + [
        ("image", b + 300000, b + 500000, "bmp", "png", 0)
        for b in range(0, 22, 3)
    ]
    + [("image", b + 300000, b + 600000, "bmp", "jpeg", _JH[b]) for b in _JH]
    + [("image", b + 500000, b + 600000, "png", "jpeg", _JH[b]) for b in _JH]
)


class TestCrossformatSplit:
    def test_stable_query_schema_and_full_pair_set(self, spark):
        from pyvectorsearch_spark.queries.multimodal_extra import (
            q_multimodal_crossformat_pairs,
        )

        df = q_multimodal_crossformat_pairs(spark, "unused")
        assert df.columns == ["modality", "d1", "d2", "fmt1", "fmt2"]
        assert sorted(map(tuple, df.collect())) == sorted(_STABLE_EXPECTED)

    def test_lossy_query_full_pair_set(self, spark):
        from pyvectorsearch_spark.queries.multimodal_extra import (
            q_multimodal_crossformat_lossy,
        )

        df = q_multimodal_crossformat_lossy(spark, "unused")
        assert df.columns == [
            "modality", "d1", "d2", "fmt1", "fmt2", "hamming",
        ]
        assert sorted(map(tuple, df.collect())) == sorted(_LOSSY_EXPECTED)

    def test_lossy_query_registered_after_window(self):
        from pyvectorsearch_spark.queries import all_queries

        keys = list(all_queries())
        assert "multimodal_crossformat_lossy" in keys
        assert keys.index("multimodal_crossformat_lossy") >= 50
