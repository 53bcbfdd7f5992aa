"""Multimodal queries for the driver contract.

No DuckDB oracle: the pipeline is Arrow-batched Python (mapInPandas) over
binary blobs — not SQL-expressible — so the driver records the weaker
rows-only check (per the contract's escape hatch for non-SQL ops). The
deterministic synthetic media table keeps the result stable across runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.operators.multimodal import (
    media_byte_stats,
    synthetic_media,
)


def q_media_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level media features (size/crc/entropy/compressibility) per kind;
    deterministic synthetic blobs (sf-independent)."""
    # 96 rows: don't spin up 32 python workers for 3 rows each
    media = synthetic_media(spark, 96).coalesce(4)
    stats = media_byte_stats(media)
    return (
        stats.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("entropy"), 6).alias("avg_entropy"),
            F.round(F.avg("compress_ratio"), 6).alias("avg_compress_ratio"),
        )
        .orderBy("kind")
    )


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
    "multimodal_byte_stats": q_media_byte_stats,
    "multimodal_image_dhash": q_image_dhash_pairs,
    "multimodal_audio_fingerprint": q_audio_fingerprint_pairs,
}
ORACLES: dict[str, str] = {}
