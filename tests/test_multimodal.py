"""Multimodal plumbing: schemas, batch shapes, determinism, and partition
spreading are real; the codec itself is a deterministic stub (see module
docstring of operators.multimodal)."""

from __future__ import annotations

from pyvectorsearch_spark.operators.multimodal import (
    audio_rms_features,
    image_resize_features,
    media_byte_stats,
    spread_media,
    synthetic_media,
    video_frame_sample,
)


def test_media_byte_stats_real_features(spark):
    media = synthetic_media(spark, 30)
    out = media_byte_stats(media).toPandas().sort_values("media_id")
    assert len(out) == 30
    assert (out["n_bytes"] > 0).all()
    assert ((out["entropy"] > 0) & (out["entropy"] <= 8.0)).all()
    # md5-chained blobs are incompressible: ratio ~1
    assert (out["compress_ratio"] > 0.9).all()


def test_image_resize_shape_and_determinism(spark):
    media = synthetic_media(spark, 30)
    out = image_resize_features(media, width=8, height=8).toPandas()
    n_images = media.filter("kind = 'image'").count()
    assert len(out) == n_images
    assert all(len(p) == 8 * 8 * 3 for p in out["pixels"])
    assert out["mean_r"].between(0, 1).all()
    # determinism: second run bit-identical
    out2 = image_resize_features(media, width=8, height=8).toPandas()
    a = out.sort_values("media_id").reset_index(drop=True)
    b = out2.sort_values("media_id").reset_index(drop=True)
    assert (a["mean_g"] == b["mean_g"]).all()


def test_audio_rms_frames(spark):
    media = synthetic_media(spark, 30)
    out = audio_rms_features(media, n_samples=1024, frame=256).toPandas()
    assert len(out) == media.filter("kind = 'audio'").count()
    assert all(len(r) == 1024 // 256 for r in out["rms"])
    assert (out["rms_mean"] > 0).all()


def test_video_frame_sampling(spark):
    media = synthetic_media(spark, 30)
    out = video_frame_sample(media, every_n=4).toPandas()
    vids = media.filter("kind = 'video'").select("media_id", "meta.n_frames").toPandas()
    expected = int(sum((nf + 3) // 4 for nf in vids["n_frames"]))
    assert len(out) == expected
    assert (out["frame_idx"] % 4 == 0).all()
    assert all(len(p) == 4 * 4 * 3 for p in out["pixels"])


def test_spread_media_partitioning(spark):
    media = synthetic_media(spark, 30)
    spread = spread_media(media, parts=6)
    assert spread.rdd.getNumPartitions() == 6
    assert spread.count() == 30


def test_ppm_decode_golden():
    """Hand-built 2x2 P6 image decodes to exact pixel values, including a
    header comment; nearest-neighbor downsample keeps the top-left pixel."""
    from pyvectorsearch_spark.operators.multimodal import _decode_rgb, _parse_ppm

    rgb = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255,  255, 255, 255])
    blob = b"P6\n# a comment\n2 2\n255\n" + rgb
    assert _parse_ppm(blob) == (2, 2, rgb)
    px = _decode_rgb(blob, 2, 2)
    assert px == [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0]
    assert _decode_rgb(blob, 1, 1) == [1.0, 0.0, 0.0]


def test_wav_roundtrip_golden():
    """encode_wav -> _decode_pcm is the identity on PCM16 samples (scaled),
    with zero-padding past the data chunk."""
    import struct

    from pyvectorsearch_spark.operators.multimodal import _decode_pcm, encode_wav

    samples = [0, 16384, -16384, 32767]
    blob = encode_wav(struct.pack("<4h", *samples), 8000)
    out = _decode_pcm(blob, 6)
    assert out[:4] == [0.0, 0.5, -0.5, 32767 / 32768]
    assert out[4:] == [0.0, 0.0]


def test_synthetic_media_blobs_are_real_containers(spark):
    """Image rows carry parseable PPM; audio rows parseable WAV at the
    declared rate/dims."""
    from pyvectorsearch_spark.operators.multimodal import (
        _parse_ppm,
        _parse_wav,
        synthetic_media,
    )

    rows = synthetic_media(spark, 12).collect()
    for r in rows:
        if r["kind"] == "image":
            parsed = _parse_ppm(bytes(r["blob"]))
            assert parsed is not None
            assert (parsed[0], parsed[1]) == (r["meta"]["width"], r["meta"]["height"])
        elif r["kind"] == "audio":
            parsed = _parse_wav(bytes(r["blob"]))
            assert parsed is not None and parsed[0] == 16000


def test_image_dhash_deterministic_and_separating(spark):
    """dHash is stable (same blob → same hash) and separates random images:
    no cross-image pair survives Hamming ≤ 6 on the md5-noise fixture."""
    from pyvectorsearch_spark.operators.multimodal import (
        image_dhash,
        synthetic_media,
    )

    media = synthetic_media(spark, 48).coalesce(2)
    h1 = {r["media_id"]: r["dhash"] for r in image_dhash(media).collect()}
    h2 = {r["media_id"]: r["dhash"] for r in image_dhash(media).collect()}
    assert h1 == h2 and len(h1) == 16  # every 3rd of 48 rows is an image


def test_image_dhash_pairs_finds_planted_dups_only(spark):
    """The planted patched copies pair with their originals (corner patch →
    Hamming 0, center patch → small nonzero) and nothing else collides."""
    from pyvectorsearch_spark.operators.multimodal import (
        image_dhash_pairs,
        synthetic_media_with_dups,
    )

    media = synthetic_media_with_dups(spark, 96, n_dups=6).coalesce(4)
    rows = image_dhash_pairs(media, max_hamming=6).collect()
    got = {(r["d1"], r["d2"]) for r in rows}
    assert got == {(i, i + 100000) for i in (0, 3, 6, 9, 12, 15)}
    assert all(0 <= r["hamming"] <= 6 for r in rows)
    assert any(r["hamming"] > 0 for r in rows)  # the center-patch regime


def test_audio_fingerprint_finds_planted_dups_only(spark):
    """The 64-PCM-byte mid-stream patches pair with their originals at small
    Hamming; random md5-noise audio never collides at <= 4."""
    from pyvectorsearch_spark.operators.multimodal import (
        audio_fingerprint_pairs,
        synthetic_media_with_dups,
    )

    media = synthetic_media_with_dups(spark, 96, n_dups=6).coalesce(4)
    rows = audio_fingerprint_pairs(media).collect()
    got = {(r["d1"], r["d2"]) for r in rows}
    assert got == {(i, i + 200000) for i in (1, 4, 7, 10, 13, 16)}
    assert all(0 <= r["hamming"] <= 4 for r in rows)


def test_binaryfile_ingest_all_match(spark):
    """Every blob landed as a file must read back byte-identical through
    the binaryFile source (the canonical multimodal ingestion path)."""
    from pyvectorsearch_spark.queries.multimodal_extra import (
        q_multimodal_binaryfile_ingest,
    )

    rows = q_multimodal_binaryfile_ingest(spark, "unused").collect()
    assert len(rows) == 3
    for r in rows:
        assert r["n_files"] == 16
        assert r["n_digest_match"] == r["n_files"]
        assert r["n_len_match"] == r["n_files"]
