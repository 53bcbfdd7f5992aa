"""Round-5: BMP + AIFF codec-free decode (VERDICT r4 item 5).

Golden tests for the two new pure-struct containers and the
cross-container twin invariant: the same pixels/samples in a different
container must decode identically and therefore fingerprint identically.
"""

from __future__ import annotations

from pyvectorsearch_spark.operators.multimodal import (
    _chain_bytes,
    _decode_pcm,
    _decode_rgb,
    _ext80_decode,
    _ext80_encode,
    _parse_aiff,
    _parse_bmp,
    _parse_ppm,
    _parse_wav,
    encode_aiff,
    encode_bmp,
    encode_ppm,
    encode_wav,
)


def test_bmp_roundtrip_exact():
    for w, h in [(16, 16), (5, 3), (7, 11), (1, 1)]:  # odd widths hit row pad
        rgb = _chain_bytes(f"bmp:{w}x{h}".encode(), w * h * 3)
        blob = encode_bmp(w, h, rgb)
        parsed = _parse_bmp(blob)
        assert parsed is not None
        pw, ph, out = parsed
        assert (pw, ph) == (w, h)
        assert out == rgb


def test_bmp_rejects_non_bmp_and_compressed():
    assert _parse_bmp(b"NOPE" + b"\x00" * 60) is None
    # flip the compression field of a valid header -> reject
    blob = bytearray(encode_bmp(4, 4, _chain_bytes(b"x", 48)))
    blob[30] = 1  # BI_RLE8
    assert _parse_bmp(bytes(blob)) is None


def test_ext80_sample_rates():
    for rate in [8000, 16000, 22050, 44100, 48000, 96000]:
        assert _ext80_decode(_ext80_encode(rate)) == rate


def test_aiff_roundtrip_exact():
    for n in [256, 511, 1024]:  # odd sample count hits the pad byte
        pcm = _chain_bytes(f"aiff:{n}".encode(), n * 2)
        blob = encode_aiff(pcm, 16000)
        parsed = _parse_aiff(blob)
        assert parsed is not None
        rate, samples = parsed
        assert rate == 16000
        import numpy as np

        want = np.frombuffer(pcm[: n * 2], dtype="<i2")
        assert np.array_equal(samples, want)


def test_aiff_rejects_wav_and_vice_versa():
    pcm = _chain_bytes(b"k", 512)
    assert _parse_aiff(encode_wav(pcm)) is None
    assert _parse_wav(encode_aiff(pcm)) is None


def test_cross_container_decode_identical():
    # image: same pixels, PPM vs BMP -> identical resampled decode
    w, h = 16, 24
    rgb = _chain_bytes(b"img", w * h * 3)
    assert _decode_rgb(encode_ppm(w, h, rgb), 8, 8) == _decode_rgb(
        encode_bmp(w, h, rgb), 8, 8
    )
    # audio: same samples, WAV vs AIFF -> identical float decode
    pcm = _chain_bytes(b"aud", 2048)
    assert _decode_pcm(encode_wav(pcm), 1024) == _decode_pcm(
        encode_aiff(pcm), 1024
    )


def test_ppm_still_parses_after_bmp_wiring():
    w, h = 9, 7
    rgb = _chain_bytes(b"p", w * h * 3)
    assert _parse_ppm(encode_ppm(w, h, rgb)) == (w, h, rgb)
    assert _parse_bmp(encode_ppm(w, h, rgb)) is None


def test_crossformat_pairs_query(spark):
    """Every planted twin collides at Hamming 0 and is reported with its
    two container formats; no false cross-format pair appears."""
    from pyvectorsearch_spark.queries.multimodal_extra import (
        q_multimodal_crossformat_pairs,
    )

    rows = q_multimodal_crossformat_pairs(spark, "unused").collect()
    cross = [
        r for r in rows if {r.fmt1, r.fmt2} in ({"ppm", "bmp"}, {"wav", "aiff"})
    ]
    # twin ids are base + 300000 (bmp) / + 400000 (aiff)
    img_twins = {(r.d1, r.d2) for r in cross if r.modality == "image"}
    aud_twins = {(r.d1, r.d2) for r in cross if r.modality == "audio"}
    assert {(d, d + 300000) for d, _ in img_twins} >= img_twins  # shape
    assert len(img_twins) == 8
    assert len(aud_twins) == 8
    for d1, d2 in img_twins:
        assert d2 == d1 + 300000
    for d1, d2 in aud_twins:
        assert d2 == d1 + 400000
