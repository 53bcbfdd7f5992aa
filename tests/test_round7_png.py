"""Round-7: pure-stdlib PNG decode (VERDICT r6 ask #3).

PNG = zlib-deflate scanlines behind a CRC'd chunk walk; python's zlib is
present, so 8-bit RGB PNG decode is REAL here — no PIL. Golden tests:
spec-built byte-level fixtures (filters hand-computed from the W3C spec
definitions, independently of the encoder), roundtrips over every filter
type, rejection of out-of-scope/corrupt blobs, cross-container twin
invariance (PPM == BMP == PNG after decode), and the extended
crossformat query."""
from __future__ import annotations

import struct
import zlib

from pyvectorsearch_spark.operators.multimodal import (
    _chain_bytes,
    _decode_rgb,
    _paeth,
    _parse_png,
    _parse_ppm,
    _png_chunk,
    encode_bmp,
    encode_png,
    encode_ppm,
)

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _wrap_png(w, h, raw_scanlines, depth=8, color=2, interlace=0):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw_scanlines))
        + _png_chunk(b"IEND", b"")
    )


def test_spec_golden_all_filters():
    """Hand-filter a known 2x5 image per the W3C spec definitions (one row
    per filter type), wrap it, and require the decoder to reproduce the
    exact pixels — independent of encode_png."""
    w, h = 2, 5
    px = [
        [10, 20, 30, 40, 50, 60],       # row 0: filter 0 (None)
        [7, 14, 21, 28, 35, 42],        # row 1: filter 1 (Sub)
        [100, 110, 120, 130, 140, 150], # row 2: filter 2 (Up)
        [200, 50, 250, 3, 9, 27],       # row 3: filter 3 (Average)
        [255, 0, 128, 64, 32, 16],      # row 4: filter 4 (Paeth)
    ]
    raw = bytearray()
    raw += bytes([0]) + bytes(px[0])
    raw += bytes([1]) + bytes(
        (px[1][x] - (px[1][x - 3] if x >= 3 else 0)) & 0xFF for x in range(6)
    )
    raw += bytes([2]) + bytes((px[2][x] - px[1][x]) & 0xFF for x in range(6))
    raw += bytes([3]) + bytes(
        (px[3][x] - (((px[3][x - 3] if x >= 3 else 0) + px[2][x]) >> 1)) & 0xFF
        for x in range(6)
    )
    raw += bytes([4]) + bytes(
        (
            px[4][x]
            - _paeth(
                px[4][x - 3] if x >= 3 else 0,
                px[3][x],
                px[3][x - 3] if x >= 3 else 0,
            )
        )
        & 0xFF
        for x in range(6)
    )
    parsed = _parse_png(_wrap_png(w, h, bytes(raw)))
    assert parsed is not None
    pw, ph, rgb = parsed
    assert (pw, ph) == (w, h)
    assert list(rgb) == [v for row in px for v in row]


def test_roundtrip_every_filter_type():
    for ft in [0, 1, 2, 3, 4, "mixed"]:
        for w, h in [(16, 16), (5, 3), (1, 1), (7, 11)]:
            rgb = _chain_bytes(f"png:{ft}:{w}x{h}".encode(), w * h * 3)
            parsed = _parse_png(encode_png(w, h, rgb, filter_type=ft))
            assert parsed is not None, (ft, w, h)
            pw, ph, out = parsed
            assert (pw, ph, out) == (w, h, rgb), (ft, w, h)


def test_multi_idat_stream():
    """IDAT may be split arbitrarily; the decoder must concatenate."""
    w, h = 6, 4
    rgb = _chain_bytes(b"multi-idat", w * h * 3)
    raw = b"".join(
        bytes([0]) + rgb[y * w * 3 : (y + 1) * w * 3] for y in range(h)
    )
    z = zlib.compress(raw)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    blob = (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", z[:7])
        + _png_chunk(b"IDAT", z[7:])
        + _png_chunk(b"IEND", b"")
    )
    assert _parse_png(blob) == (w, h, rgb)


def test_rejects_out_of_scope_and_corrupt():
    w, h = 4, 4
    rgb = _chain_bytes(b"rej", w * h * 3)
    good = encode_png(w, h, rgb)
    # not a PNG at all
    assert _parse_png(b"P6\n4 4\n255\n" + rgb) is None
    assert _parse_png(good[:20]) is None  # truncated
    # corrupt one IDAT byte -> CRC check must reject
    bad = bytearray(good)
    bad[len(PNG_SIG) + 12 + 13 + 8 + 3] ^= 0xFF
    assert _parse_png(bytes(bad)) is None
    # out-of-scope shapes: 16-bit depth, RGBA, palette, interlaced
    raw = bytes([0]) + rgb[: w * 3]
    for depth, color, inter in [(16, 2, 0), (8, 6, 0), (8, 3, 0), (8, 2, 1)]:
        assert _parse_png(_wrap_png(w, 1, raw, depth, color, inter)) is None
    # undefined filter byte
    assert _parse_png(_wrap_png(w, 1, bytes([9]) + rgb[: w * 3])) is None


def test_cross_container_twin_invariance():
    """Same pixels in PPM / BMP / PNG decode to the identical resampled
    grid — the cross-container dedup contract now spans three formats."""
    w, h = 16, 24
    rgb = _chain_bytes(b"img", w * h * 3)
    ppm = _decode_rgb(encode_ppm(w, h, rgb), 8, 8)
    bmp = _decode_rgb(encode_bmp(w, h, rgb), 8, 8)
    png = _decode_rgb(encode_png(w, h, rgb, filter_type="mixed"), 8, 8)
    assert ppm == bmp == png
    # and the PPM parser still refuses a PNG blob (no dispatch bleed)
    assert _parse_ppm(encode_png(w, h, rgb)) is None
    assert _parse_png(encode_ppm(w, h, rgb)) is None


def test_crossformat_query_includes_png_twins(spark):
    from pyvectorsearch_spark.queries.multimodal_extra import (
        q_multimodal_crossformat_pairs,
    )

    rows = q_multimodal_crossformat_pairs(spark, "unused").collect()
    ppm_png = {
        (r.d1, r.d2) for r in rows if {r.fmt1, r.fmt2} == {"ppm", "png"}
    }
    bmp_png = {
        (r.d1, r.d2) for r in rows if {r.fmt1, r.fmt2} == {"bmp", "png"}
    }
    assert len(ppm_png) == 8 and len(bmp_png) == 8
    for d1, d2 in ppm_png:
        assert d2 == d1 + 500000  # png twin id offset
    # bmp twin (base+300000) pairs with png twin (base+500000)
    for d1, d2 in bmp_png:
        assert d2 - d1 == 200000
