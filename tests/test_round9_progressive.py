"""Round-9: progressive (SOF2) JPEG — VERDICT r8 ask #6.

Progressive streams carry the SAME quantized coefficients as baseline,
split by spectral selection and successive approximation (T.81 Annex G).
That gives the decisive oracle: a progressive encode at quality q must
decode PIXEL-IDENTICAL to the baseline 4:4:4 encode at quality q — both
sides built by this repo's own codec, so no third-party files are needed,
and the decoder's refinement logic is checked bit-for-bit against the
sequential path rather than eyeballed.

Covers: DC first + refinement (point transform), AC first + refinement
(EOB runs, buffered correction bits, ZRL inside refinement), custom scan
scripts, non-multiple-of-8 geometry, flat images (maximal EOB runs), and
the multimodal dispatch (`_decode_rgb` now decodes SOF2 for real).
"""

from __future__ import annotations

import numpy as np
import pytest

from pyvectorsearch_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)


def _noise(w: int, h: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8).tobytes()


class TestProgressiveEqualsBaseline:
    @pytest.mark.parametrize("wh", [(8, 8), (24, 17), (33, 9), (64, 48)])
    @pytest.mark.parametrize("q", [75, 90, 95])
    def test_roundtrip_pixel_identical(self, wh, q):
        w, h = wh
        rgb = _noise(w, h, w * 1000 + h * 10 + q)
        base = decode_jpeg(encode_jpeg(w, h, rgb, quality=q, subsampling="444"))
        prog = decode_jpeg(encode_jpeg_progressive(w, h, rgb, quality=q))
        assert base is not None and prog == base

    def test_quality_sweep_random_geometry(self):
        rng = np.random.default_rng(11)
        for _ in range(12):
            w = int(rng.integers(8, 60))
            h = int(rng.integers(8, 60))
            q = int(rng.integers(5, 101))
            rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8).tobytes()
            base = decode_jpeg(
                encode_jpeg(w, h, rgb, quality=q, subsampling="444")
            )
            prog = decode_jpeg(encode_jpeg_progressive(w, h, rgb, quality=q))
            assert prog == base, (w, h, q)

    def test_simple_scan_script_no_successive_approximation(self):
        # spectral selection only: DC then one full-band AC scan per comp
        simple = [
            ((0, 1, 2), 0, 0, 0, 0),
            ((0,), 1, 63, 0, 0),
            ((1,), 1, 63, 0, 0),
            ((2,), 1, 63, 0, 0),
        ]
        rgb = _noise(40, 24, 3)
        base = decode_jpeg(encode_jpeg(40, 24, rgb, quality=88, subsampling="444"))
        prog = decode_jpeg(
            encode_jpeg_progressive(40, 24, rgb, quality=88, scans=simple)
        )
        assert prog == base

    @pytest.mark.parametrize("val", [0, 128, 255])
    def test_flat_image_maximal_eob_runs(self, val):
        w, h = 48, 40
        rgb = bytes([val]) * (w * h * 3)
        base = decode_jpeg(encode_jpeg(w, h, rgb, quality=90, subsampling="444"))
        prog = decode_jpeg(encode_jpeg_progressive(w, h, rgb, quality=90))
        assert prog == base

    def test_gradient_long_eob_runs_with_refinement(self):
        w, h = 40, 32
        g = np.zeros((h, w, 3), dtype=np.uint8)
        for y in range(h):
            g[y, :, 0] = (np.arange(w) * 4) % 256
            g[y, :, 1] = (y * 6) % 256
            g[y, :, 2] = 128
        base = decode_jpeg(
            encode_jpeg(w, h, g.tobytes(), quality=85, subsampling="444")
        )
        prog = decode_jpeg(encode_jpeg_progressive(w, h, g.tobytes(), quality=85))
        assert prog == base


class TestProgressiveStreamShape:
    def test_sof2_marker_and_multi_scan(self):
        blob = encode_jpeg_progressive(16, 16, _noise(16, 16, 5), quality=90)
        assert b"\xff\xc2" in blob  # SOF2
        assert blob.count(b"\xff\xda") == 10  # default 10-scan script
        assert decode_jpeg(blob) is not None

    def test_fill_bytes_and_tem_between_scans(self):
        blob = encode_jpeg_progressive(16, 16, _noise(16, 16, 6), quality=90)
        want = decode_jpeg(blob)
        dqt = blob.index(b"\xff\xdb")
        padded = blob[:dqt] + b"\xff\xff\x01" + blob[dqt:]
        assert decode_jpeg(padded) == want

    def test_arithmetic_still_refused(self):
        blob = bytearray(encode_jpeg_progressive(8, 8, _noise(8, 8, 7)))
        i = blob.index(b"\xff\xc2")
        blob[i + 1] = 0xCA  # SOF10: progressive arithmetic
        assert decode_jpeg(bytes(blob)) is None

    def test_truncated_progressive_fails_closed(self):
        blob = encode_jpeg_progressive(16, 16, _noise(16, 16, 8), quality=90)
        assert decode_jpeg(blob[: len(blob) // 2]) is None


class TestMultimodalDispatch:
    def test_decode_rgb_handles_sof2(self):
        from pyvectorsearch_spark.operators.multimodal import _decode_rgb

        w, h = 16, 8
        rgb = _noise(w, h, 9)
        prog = encode_jpeg_progressive(w, h, rgb, quality=95)
        base = encode_jpeg(w, h, rgb, quality=95, subsampling="444")
        a = _decode_rgb(prog, 8, 8)
        b = _decode_rgb(base, 8, 8)
        assert a == b  # same pixels → same normalized grid
