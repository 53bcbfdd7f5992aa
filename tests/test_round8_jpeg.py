"""Round-8: pure-stdlib baseline JPEG codec (VERDICT r7 ask #4).

Follows the r7 PNG-codec test playbook: spec-built golden streams
(hand-assembled marker segments + hand-computed Huffman bits decoded
against T.81 semantics — NOT the encoder, so the two directions don't
share a bug), encoder/decoder round trips across subsampling, quality,
odd sizes and restart intervals, rejection of out-of-scope modes
(progressive, 12-bit, big sampling factors), and the cross-container
dedup contract extended to the lossy re-encode regime (JPEG twins inside
the default Hamming-6 dHash radius on the worst-case noise fixture).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pyvectorsearch_spark.operators.jpeg import (
    ZIGZAG,
    _extend,
    _magnitude,
    decode_jpeg,
    encode_jpeg,
)
from pyvectorsearch_spark.operators.multimodal import (
    _chain_bytes,
    _decode_rgb,
    _media_rows,
    _parse_ppm,
    encode_ppm,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10 * np.log10(255**2 / mse) if mse else float("inf")


def _noise(w: int, h: int, seed: bytes = b"jpg") -> np.ndarray:
    return np.frombuffer(
        _chain_bytes(seed, w * h * 3), dtype=np.uint8
    ).reshape(h, w, 3)


class TestGolden:
    def test_hand_assembled_solid_gray(self):
        """Spec-built stream, no encoder involved: one 8x8 single-component
        block, all-ones quant table, custom 2-symbol Huffman tables, DC
        coefficient hand-computed (solid v → DC = 8·(v−128), here 576 =
        size-10 amplitude 1001000000), EOB, 1-padding. T.81 F.2 decode
        must yield a solid gray 200 image."""
        # DC table: symbol 0 at (len 1, code 0) unused filler; symbol 10
        # ("size 10") at (len 2, code 10b)
        dc_bits = [1, 1] + [0] * 14
        dc_vals = [0, 10]
        # AC table: EOB (0x00) at (len 1, code 0)
        ac_bits = [1] + [0] * 15
        ac_vals = [0x00]

        def seg(marker, payload):
            return struct.pack(">HH", marker, len(payload) + 2) + payload

        qt = bytes([0]) + bytes([1] * 64)  # table 0, all ones (zigzag)
        sof = seg(0xFFC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        dht_dc = seg(0xFFC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
        dht_ac = seg(0xFFC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
        sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
        # scan bits: DC code "10", amplitude 576 = "1001000000", EOB "0"
        # → 10 1001000000 0 + 3 pad ones = 1010 0100 0000 0111
        scan = bytes([0b10100100, 0b00000111])
        blob = (
            b"\xff\xd8" + seg(0xFFDB, qt) + sof + dht_dc + dht_ac + sos
            + scan + b"\xff\xd9"
        )
        out = decode_jpeg(blob)
        assert out is not None
        w, h, rgb = out
        assert (w, h) == (8, 8)
        px = np.frombuffer(rgb, dtype=np.uint8).reshape(8, 8, 3)
        assert px.min() == px.max() == 200

    def test_magnitude_extend_roundtrip(self):
        for v in list(range(-40, 41)) + [255, -255, 1023, -1023]:
            size, amp = _magnitude(v)
            assert _extend(amp, size) == v

    def test_zigzag_is_the_standard_sequence(self):
        assert ZIGZAG[:16] == [
            0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5
        ]
        assert sorted(ZIGZAG) == list(range(64))
        assert ZIGZAG[-4:] == [47, 55, 62, 63]


class TestRoundTrip:
    @pytest.mark.parametrize("size", [(16, 16), (24, 17), (33, 22), (8, 8)])
    @pytest.mark.parametrize("ss", ["444", "420"])
    def test_smooth_gradient(self, size, ss):
        w, h = size
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        img = np.stack(
            [
                xx * 255 / max(w - 1, 1),
                yy * 255 / max(h - 1, 1),
                (xx + yy) * 255 / max(w + h - 2, 1),
            ],
            axis=-1,
        ).astype(np.uint8)
        blob = encode_jpeg(w, h, img.tobytes(), quality=90, subsampling=ss)
        out = decode_jpeg(blob)
        assert out is not None
        ww, hh, rgb = out
        assert (ww, hh) == (w, h)
        dec = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
        # 4:2:0 on a full-range gradient is genuinely chroma-lossy, and
        # the smallest frame (8x8 → 4x4 chroma) loses the most
        floor = 40 if ss == "444" else (26 if min(w, h) <= 8 else 30)
        assert _psnr(img, dec) > floor

    def test_quality_ladder_monotone(self):
        img = _noise(24, 32)
        last = 0.0
        for q in (25, 50, 75, 95, 100):
            blob = encode_jpeg(24, 32, img.tobytes(), quality=q)
            dec = np.frombuffer(decode_jpeg(blob)[2], np.uint8).reshape(32, 24, 3)
            p = _psnr(img, dec)
            assert p > last, (q, p, last)
            last = p
        assert last > 50  # q100 all-ones tables ≈ lossless on 4:4:4

    def test_restart_interval_decodes_identically(self):
        img = _noise(33, 40)
        base = decode_jpeg(
            encode_jpeg(33, 40, img.tobytes(), quality=95)
        )[2]
        for ri in (1, 2, 7):
            blob = encode_jpeg(
                33, 40, img.tobytes(), quality=95, restart_interval=ri
            )
            assert blob.count(b"\xff\xdd") == 1
            assert any(
                blob.count(bytes([0xFF, 0xD0 + i])) for i in range(8)
            )
            assert decode_jpeg(blob)[2] == base

    def test_420_restart(self):
        img = _noise(48, 32)
        base = decode_jpeg(
            encode_jpeg(48, 32, img.tobytes(), quality=95, subsampling="420")
        )[2]
        for ri in (1, 3):
            blob = encode_jpeg(
                48, 32, img.tobytes(), quality=95, subsampling="420",
                restart_interval=ri,
            )
            assert decode_jpeg(blob)[2] == base


class TestRejection:
    def test_not_a_jpeg(self):
        assert decode_jpeg(b"") is None
        assert decode_jpeg(b"plain text") is None
        assert decode_jpeg(b"\x89PNG\r\n\x1a\n") is None
        assert decode_jpeg(b"\xff\xd8\xff\xd9") is None

    def test_progressive_rejected(self):
        img = _noise(16, 16)
        blob = bytearray(encode_jpeg(16, 16, img.tobytes()))
        i = blob.find(b"\xff\xc0")
        blob[i + 1] = 0xC2  # SOF0 → SOF2 (progressive)
        assert decode_jpeg(bytes(blob)) is None

    def test_truncated_scan_is_none_not_crash(self):
        img = _noise(16, 16)
        blob = encode_jpeg(16, 16, img.tobytes())
        assert decode_jpeg(blob[: len(blob) // 2]) is None

    def test_other_parsers_refuse_jpeg(self):
        from pyvectorsearch_spark.operators.multimodal import (
            _parse_bmp,
            _parse_png,
        )

        img = _noise(16, 16)
        blob = encode_jpeg(16, 16, img.tobytes())
        assert _parse_ppm(blob) is None
        assert _parse_bmp(blob) is None
        assert _parse_png(blob) is None


class TestCrossFormat:
    def test_decode_rgb_dispatches_jpeg(self):
        w, h = 16, 24
        rgb = _chain_bytes(b"img", w * h * 3)
        jb = encode_jpeg(w, h, rgb, quality=100)
        dec = _decode_rgb(jb, w, h)
        ref = _decode_rgb(encode_ppm(w, h, rgb), w, h)
        a = np.asarray(dec).reshape(h, w, 3) * 255
        b = np.asarray(ref).reshape(h, w, 3) * 255
        assert _psnr(b, a) > 45  # near-lossless at q100 4:4:4

    def test_fixture_jpeg_twins_within_hamming_radius(self):
        """Pin the measured contract: q95 JPEG re-encodes of the noise
        fixture land within 4 dHash bits of their source in BOTH MCU
        layouts — inside the pair miners' default Hamming-6 radius."""
        def dhash(blob):
            px = np.asarray(_decode_rgb(bytes(blob), 9, 8)).reshape(8, 9, 3)
            gray = px @ np.array([0.299, 0.587, 0.114])
            bits = (gray[:, 1:] > gray[:, :-1]).reshape(-1)
            h = 0
            for b in bits:
                h = (h << 1) | int(b)
            return h

        worst = 0
        for mid, kind, blob, meta in _media_rows(72, 7):
            if kind != "image":
                continue
            w, h, rgb = _parse_ppm(blob)
            for ss in ("444", "420"):
                jb = encode_jpeg(w, h, rgb, quality=95, subsampling=ss)
                worst = max(
                    worst, bin(dhash(blob) ^ dhash(jb)).count("1")
                )
        assert worst <= 4, worst

    def test_crossformat_query_includes_jpeg_twins(self, spark):
        # round 9: the lossy-JPEG regime moved to its own query; the
        # round-5 Hamming-0 query is schema/rows-stable again (ADVICE r8)
        from pyvectorsearch_spark.queries.multimodal_extra import (
            q_multimodal_crossformat_lossy,
        )

        rows = q_multimodal_crossformat_lossy(spark, "unused").collect()
        ppm_jpeg = {
            (r.d1, r.d2): r.hamming
            for r in rows
            if {r.fmt1, r.fmt2} == {"ppm", "jpeg"}
        }
        assert len(ppm_jpeg) == 8
        for (d1, d2), ham in ppm_jpeg.items():
            assert d2 == d1 + 600000
            assert 0 <= ham <= 6
        # lossless twins still collide exactly
        for r in rows:
            if {r.fmt1, r.fmt2} in (
                {"ppm", "bmp"}, {"ppm", "png"}, {"bmp", "png"},
                {"wav", "aiff"},
            ):
                assert r.hamming == 0, (r.fmt1, r.fmt2, r.hamming)
