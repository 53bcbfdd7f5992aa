"""JSONL (newline-delimited JSON) source/sink — the lingua franca of LLM
training-data interchange (one document object per line, typically
gzip-sharded). The reference's only source is a CSV scan
(/root/reference/example_cpp/main.cpp:16-41); this extends the engine's
source surface the same way the CSV reader did: declared schema, never
inference, so a 100 TB read neither samples the input twice nor silently
drifts types between shards.

Scale notes: Spark's json reader is splittable per file (and per-block for
uncompressed input); sharded .jsonl.gz directories parallelize by file.
``mode=PERMISSIVE`` + ``columnNameOfCorruptRecord`` routes malformed lines
to a quarantine column instead of failing the job — at corpus scale there
are ALWAYS malformed lines."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    *,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read newline-delimited JSON with a DECLARED schema. Malformed lines
    land in ``_corrupt_record`` (dropped unless ``keep_corrupt`` — pass True
    to quarantine them for inspection instead of losing them silently)."""
    full = T.StructType(
        schema.fields + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    if keep_corrupt:
        return df
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    shards: int | None = None,
    compression: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write one JSON object per line, optionally re-sharded (a 100 TB
    export wants explicit shard counts so downstream loaders see uniform
    file sizes) and optionally gzip/zstd-compressed."""
    if shards:
        df = df.repartition(shards)
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
