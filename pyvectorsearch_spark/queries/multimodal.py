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


QUERIES = {"multimodal_byte_stats": q_media_byte_stats}
ORACLES: dict[str, str] = {}
