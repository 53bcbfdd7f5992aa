"""Multimodal perceptual-fingerprint queries (outside the driver's pinned
50-entry window — the window is kept byte-stable for cross-round
comparability; these are covered by the rows-only driver check and the
golden pair tests in tests/test_multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def q_image_dhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup mining over the multimodal table: REAL PPM decode →
    perceptual dHash → generic pigeonhole Hamming join (blobs reduce to
    8-byte hashes before any shuffle). The fixture plants 6 patched-image
    duplicates; deterministic end to end, but binary decode is not
    SQL-expressible — rows-only check, like ``multimodal_byte_stats``
    (golden pair assertions live in tests/test_multimodal.py)."""
    from pyvectorsearch_spark.operators.multimodal import (
        image_dhash_pairs,
        synthetic_media_with_dups,
    )

    media = synthetic_media_with_dups(spark, 96, n_dups=6).coalesce(4)
    return image_dhash_pairs(media, max_hamming=6).orderBy("d1", "d2")


def q_audio_fingerprint_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup mining: REAL WAV decode → energy-gradient fingerprint
    → pigeonhole Hamming join (the audio analog of the image dHash path;
    same rows-only check — binary decode is not SQL-expressible; golden
    pair assertions in tests/test_multimodal.py)."""
    from pyvectorsearch_spark.operators.multimodal import (
        audio_fingerprint_pairs,
        synthetic_media_with_dups,
    )

    media = synthetic_media_with_dups(spark, 96, n_dups=6).coalesce(4)
    return audio_fingerprint_pairs(media).orderBy("d1", "d2")

QUERIES = {
    "multimodal_image_dhash": q_image_dhash_pairs,
    "multimodal_audio_fingerprint": q_audio_fingerprint_pairs,
}
ORACLES: dict[str, str] = {}
